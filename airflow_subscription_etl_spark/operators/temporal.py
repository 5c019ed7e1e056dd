"""Temporal join operators: as-of join and range-band join.

The reference has no temporal joins (SURVEY.md §2.3 — its joins are all
tiny equi lookups), but any analytics engine serving event data needs
them; they extend the J* family the same way §7.6 extends aggregations.

Scale posture:

- :func:`asof_join` is the union+window formulation — ONE shuffle on
  (keys, ts), no range-condition nested loop, no candidate explosion.
  This is how you as-of join two 10-TB tables: both sides partition by
  key, sort by time, and the window's ``last(..., ignorenulls=True)``
  carries the most recent right-side row forward. Skewed keys behave
  like any other window (AQE; or salt upstream).
- :func:`band_join` is a broadcast range join: the bands side is a
  tiny literal dimension, so Spark plans BroadcastNestedLoopJoin —
  O(|fact| · |bands|) with |bands| constant, map-only, no shuffle.
  For band tables too big to broadcast, pre-bucket both sides on a
  coarse equi key (e.g. floor(value / coarse_width)) and range-join
  within buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row
    with ``right.ts <= left.ts`` on the same key(s) (inclusive, like
    DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``). Left rows with no prior
    right row keep nulls (left-outer semantics).

    Implementation: tag and union both sides, then one window per key
    ordered by ``(ts, side)`` — right rows sort before left rows at
    equal ts so inclusive semantics hold — and ``last(ignorenulls)``
    carries right attributes forward. Right-side duplicate timestamps
    within a key are resolved by the LAST row in ``(ts)`` order after
    an arbitrary-but-deterministic input ordering is applied upstream;
    pre-aggregate the right side if tie identity matters.
    """
    keys = [on] if isinstance(on, str) else list(on)

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    left_cols = [c for c in left.columns if c != left_ts]
    l = left.select(  # noqa: E741
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    for c in right_cols:
        l = l.withColumn(f"{c}{suffix}", F.lit(None).cast(r.schema[f"{c}{suffix}"].dataType))
    unioned = l.select(
        *keys,
        "__ts",
        "__side",
        *[F.col(c) for c in left_cols if c not in keys],
        *[f"{c}{suffix}" for c in right_cols],
    ).unionByName(
        r.select(
            *keys,
            "__ts",
            "__side",
            *[F.lit(None).cast(l.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
            *[f"{c}{suffix}" for c in right_cols],
        )
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *keys,
        "__ts",
        "__side",
        *[F.col(c) for c in left_cols if c not in keys],
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side").withColumnRenamed(
        "__ts", left_ts
    )


def band_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "band_lo",
    hi_col: str = "band_hi",
) -> DataFrame:
    """Range-band join: attach the band whose ``[lo, hi)`` interval
    contains ``fact[value_col]``. The bands side MUST be small — it is
    broadcast and the join is a map-only BroadcastNestedLoopJoin.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, "left")


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    delta_seconds: int,
) -> DataFrame:
    """BIG-BIG interval join: pairs with equal ``key`` whose timestamps
    lie within ±``delta_seconds`` — via BIN EXPANSION, the standard
    trick that turns an inequality join into an equi-join so it scales
    as an ordinary shuffled hash/sort-merge join instead of a broadcast
    nested loop (which :func:`band_join` uses and which requires one
    tiny side).

    Each left row explodes to the 2–3 time bins its ±δ window can
    touch (bin width = δ); the right side maps to its single bin; the
    equi-join on ``(key, bin)`` produces every candidate exactly once
    per touched bin, and the exact interval filter keeps true pairs.
    Duplicate elimination is structural — a (left, right) pair is
    joined only in the right row's own bin — so no distinct is needed.
    Shuffle volume: 3×|left| + |right| rows keyed on (key, bin); both
    sides arbitrarily large.
    """
    w = int(delta_seconds)
    le = F.col(left_ts).cast("long")
    re_ = F.col(right_ts).cast("long")
    lb = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((le - F.lit(w)) / F.lit(w)),
                F.floor((le + F.lit(w)) / F.lit(w)),
            )
        ),
    )
    rb = right.withColumn("_bin", F.floor(re_ / F.lit(w)))
    lo = F.col(left_ts) - F.expr(f"INTERVAL {w} SECOND")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {w} SECOND")
    return (
        lb.join(rb, [key, "_bin"])
        .filter((F.col(right_ts) >= lo) & (F.col(right_ts) <= hi))
        .drop("_bin")
    )
