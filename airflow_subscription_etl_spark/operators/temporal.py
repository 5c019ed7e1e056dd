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
    over ONE struct packing all right attributes carries the most
    recent right ROW forward atomically. (Per-column last(ignorenulls)
    — the r12-review bug — skipped a NULL attribute of the newest
    right row and reached back to an older row for just that column,
    stitching together a right row that never existed; the struct is
    non-null for every right row, so a NULL attribute stays NULL, the
    documented row semantics and what DuckDB ASOF JOIN returns.)
    Right-side duplicate timestamps within a key are resolved by the
    LAST row in ``(ts)`` order after an arbitrary-but-deterministic
    input ordering is applied upstream; pre-aggregate the right side
    if tie identity matters.
    """
    keys = [on] if isinstance(on, str) else list(on)

    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in right_cols]
        ).alias("__rrow"),
    )
    rrow_type = r.schema["__rrow"].dataType
    left_cols = [c for c in left.columns if c != left_ts]
    l = left.select(  # noqa: E741
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    unioned = l.select(
        *keys,
        "__ts",
        "__side",
        *[F.col(c) for c in left_cols if c not in keys],
        "__rrow",
    ).unionByName(
        r.select(
            *keys,
            "__ts",
            "__side",
            *[F.lit(None).cast(l.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
            "__rrow",
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
        F.last("__rrow", ignorenulls=True).over(w).alias("__rrow"),
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *keys,
            F.col("__ts").alias(left_ts),
            *[F.col(c) for c in left_cols if c not in keys],
            *[
                F.col(f"__rrow.{c}{suffix}").alias(f"{c}{suffix}")
                for c in right_cols
            ],
        )
    )


def multi_touch_weights(
    pairs: DataFrame,
    group_col: str = "purchase_id",
    event_ts: str = "purchase_ts",
    touch_ts: str = "click_ts",
    half_life_minutes: int = 10,
) -> DataFrame:
    """Multi-touch attribution weights over (conversion, touch) pairs —
    the step after the interval join (streaming/events.py::
    purchase_attribution_join): split each conversion's credit across
    its touches, linearly and with exponential time decay.

    Determinism at scale: each touch's decay term ``0.5^(age/half_life)``
    is quantized to integer micros BEFORE the per-conversion sum, so the
    window aggregation is exact integer arithmetic — independent of
    partitioning/summation order on any cluster size — and the final
    shares are exact-int ÷ exact-int, reproducible bit-for-bit in any
    engine (same trick as text.py::bigram_lm_scores). One window shuffle
    keyed on the conversion id; no driver-side work.
    """
    w = Window.partitionBy(group_col)
    age_us = (F.unix_micros(F.col(event_ts)) - F.unix_micros(F.col(touch_ts))).alias(
        "age_us"
    )
    decay_micro = F.round(
        F.pow(
            F.lit(0.5),
            F.col("age_us") / F.lit(half_life_minutes * 60.0 * 1_000_000.0),
        )
        * F.lit(1_000_000.0)
    ).cast("bigint")
    return (
        pairs.withColumn("age_us", age_us)
        .withColumn("decay_micro", decay_micro)
        .withColumn("n_touches", F.count(F.lit(1)).over(w))
        .withColumn("decay_micro_sum", F.sum("decay_micro").over(w))
        .withColumn("w_linear", F.lit(1.0) / F.col("n_touches"))
        .withColumn(
            "w_decay",
            F.col("decay_micro").cast("double")
            / F.col("decay_micro_sum").cast("double"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC-style snapshot diff: classify every key as ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` between two table
    snapshots — the change-detection primitive behind incremental loads
    and SCD maintenance.

    One full-outer shuffled equi join on the key columns; change
    detection is column-wise null-safe equality (``eqNullSafe``), NOT a
    serialized-row hash, so it is engine-portable (no dependence on any
    engine's float/JSON formatting) and Catalyst prunes ``compare_cols``
    to exactly the columns compared. Both sides arbitrarily large: this
    is a plain sort-merge join at scale, AQE handles skew.
    """
    keys = list(keys)
    o = old.select(*keys, *compare_cols)
    n = new.select(*keys, *compare_cols)
    for c in compare_cols:
        o = o.withColumnRenamed(c, f"{c}_old")
        n = n.withColumnRenamed(c, f"{c}_new")
    # presence: "any compare col non-null" is not a safe presence test
    # (legitimately-null attributes); use a sentinel from each side.
    j = o.withColumn("_old_present", F.lit(True)).join(
        n.withColumn("_new_present", F.lit(True)), keys, "full_outer"
    )
    old_present = F.coalesce(F.col("_old_present"), F.lit(False))
    new_present = F.coalesce(F.col("_new_present"), F.lit(False))
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    change = (
        F.when(old_present & ~new_present, F.lit("removed"))
        .when(new_present & ~old_present, F.lit("added"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, *[f"{c}_old" for c in compare_cols],
                    *[f"{c}_new" for c in compare_cols],
                    change.alias("change_type"))


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
    if w <= 0:
        # div-by-zero bins: sequence() over NULL bounds silently
        # yielded an EMPTY result for delta_seconds=0 (r12 review) —
        # an exact-timestamp match is a plain equi-join, not this
        raise ValueError(
            f"delta_seconds must be positive, got {delta_seconds}; "
            "for exact-timestamp matches use a plain equi-join on "
            "(key, ts)"
        )
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


def next_event_examples(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    id_col: str = "event_id",
    history: int = 3,
    sep: str = ">",
) -> DataFrame:
    """Autoregressive training-example construction over event
    sequences: for every event with at least ``history`` predecessors,
    emit ``(id, user, context, label)`` where ``context`` is the
    previous ``history`` events joined oldest-first and ``label`` is
    the event itself — the (history → next-action) dataset a
    sequential recommender / next-event model trains on.

    Built as ``history`` LAG columns over ONE (user)-keyed window
    ordered by (ts, id) — a unique id in the order makes ties
    impossible, so the dataset is bit-reproducible across runs,
    partitionings, and engines (the determinism a training corpus
    needs; a collect_list frame would hide the ordering contract).
    One shuffle on the user key; per-user state is the window frame,
    never a materialized sequence array.
    """
    if history < 1:
        raise ValueError(f"need history >= 1, got {history}")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    lags = [
        F.lag(F.col(event_col), h).over(w).alias(f"_h{h}")
        for h in range(history, 0, -1)
    ]
    out = df.select(
        F.col(id_col), F.col(user_col), F.col(ts_col), F.col(event_col), *lags
    )
    ctx = F.concat_ws(sep, *[F.col(f"_h{h}") for h in range(history, 0, -1)])
    # EVERY lag must be non-null, not just the oldest: concat_ws drops
    # NULLs silently, so a NULL event_type mid-history would otherwise
    # emit a positionally-corrupted short context (and a NULL at the
    # oldest slot alone would drop an example that has enough
    # predecessors). An example = `history` consecutive NON-NULL events.
    complete = F.lit(True)
    for h in range(history, 0, -1):
        complete = complete & F.col(f"_h{h}").isNotNull()
    return out.filter(complete).select(
        F.col(id_col),
        F.col(user_col),
        ctx.alias("context"),
        F.col(event_col).alias("label"),
    )


def gaps_and_islands(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_col: str,
    max_gap: int = 1,
    order_tiebreak: str | None = None,
    out_col: str = "island",
) -> DataFrame:
    """Declarative gaps-and-islands: label each row with the maximal
    run ("island") of consecutive ``order_col`` values it belongs to,
    per partition — rows whose gap to the previous value exceeds
    ``max_gap`` start a new island. The classic SQL consolidation
    pattern (interval merging, occupied-bucket runs, streak/outage
    detection).

    When a graph's edges are KNOWN to come from adjacency along one
    ordered dimension, this is the right default over iterative
    connected components (VERDICT r7 #4): two window passes over ONE
    (partition-keys)-keyed shuffle — Catalyst reuses the sort between
    them — versus CC's O(log n) rounds of keyed shuffles with
    checkpointing (measured on the islands query at sf0.1:
    0.23s vs CC's 2.94s — ~13×). Two-star
    CC (graph.connected_components) remains the general-graph path;
    `doc_cc_islands` deliberately keeps exercising it against this
    formulation's SQL as its transitive-closure oracle.

    Island ids are 1-based positional indexes in partition order —
    deterministic given a total order (pass ``order_tiebreak``, e.g. a
    unique id, when ``order_col`` has duplicates: ties never break a
    run, but an undefined scan order would make the LAG value — hence
    the label boundary — nondeterministic for gap ties). NULL
    ``order_col`` rows sort first (Spark ASC default) and their gap
    comparison is null → each NULL row starts its own island,
    engine-uniform with the SQL CASE's ELSE branch.
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [F.col(order_col).asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    brk = (
        F.when(
            F.col(order_col) - F.lag(F.col(order_col)).over(w) <= F.lit(max_gap),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .cast("bigint")
    )
    island = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, island)
