"""Engine-portable distinct-count sketches (KMV / k-minimum-values).

Spark's native ``approx_count_distinct`` / ``hll_sketch_agg`` are
HyperLogLog sketches whose exact estimates are implementation-defined —
no other engine reproduces them bit-for-bit, so queries built on them
can only ever get a weak rows-only correctness check. This module
implements the classic KMV estimator (Bar-Yossef et al., "Counting
distinct elements in a data stream", RANDOM 2002; the θ-sketch family)
on top of a *portable* hash — md5, truncated to 60 bits — so the same
estimate is computable, bit-identically, in any engine with md5 and
integer arithmetic (DuckDB, Trino, Postgres, …):

- hash each value to a uniform 60-bit integer ``h``;
- per group keep the ``k`` smallest *distinct* hashes;
- if fewer than ``k`` distinct hashes exist the count is exact, else
  ``estimate = (k-1) * 2^60 / (h_k + 1)`` where ``h_k`` is the k-th
  smallest (expected relative error ≈ 1/sqrt(k-2), ~13% at k=64).

KMV sketches are MERGEABLE: the k smallest of a union equals the k
smallest of the union of each side's k smallest, so rollups touch the
raw data once and only k-element arrays move between levels — the same
re-aggregation contract as HLL, with ~4× the error per byte, bought
back by cross-engine determinism. All arithmetic is integer until one
final double division of identical operands, so the result is
bit-deterministic under any partitioning.

The hash is the repo-standard md5-prefix trick
(``conv(substring(md5(cast(v as string)), 1, 15), 16, 10)``), the same
construction the sampling operators use — DuckDB parity is
``CAST(('0x' || substring(md5(CAST(v AS VARCHAR)), 1, 15)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

#: 2^60 — the hash domain size; exact as a double (power of two).
_DOMAIN = float(1 << 60)

#: 2^31 − 1 (Mersenne prime) — modulus of the portable affine hash
#: family shared by MinHash (operators.dedup) and the count-min sketch
#: below. With x < 2^31 and a < 2^31, ``a*x + b`` stays under 2^62:
#: exact in int64 on every engine, no overflow, no HUGEINT promotion.
MERSENNE31 = (1 << 31) - 1


def hash60(col: Column) -> Column:
    """Uniform 60-bit hash of any value via md5 — portable across
    engines, unlike xxhash64 (whose seeds/finalization are
    Spark-specific). 15 hex chars = 60 bits keeps the value positive
    and well inside bigint range."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def portable_hash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) params for the portable affine family
    ``h_i(x) = (a_i·x + b_i) mod (2^31−1)``.

    Derived from fixed odd multiplicative constants (Knuth / splitmix
    mixers) — pure integer arithmetic, so the identical literals can be
    inlined into a DuckDB oracle and both engines replay the exact
    same permutations.
    """
    params = []
    for i in range(num_hashes):
        a = (i * 2654435761 + 2654435769) % MERSENNE31
        b = (i * 1779033703 + 1013904242) % MERSENNE31
        params.append((a or 1, b))
    return params


def _estimate(n_distinct: Column, h_k: Column, k: int) -> Column:
    """(k-1)·2^60/(h_k+1) when ≥k distinct hashes exist, exact count
    below that. ``(k-1)·2^60`` is a small-int × power-of-two product —
    exactly representable, so the single division is the only rounding
    step and both engines perform it on identical operands."""
    return F.when(
        n_distinct < k, n_distinct.cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_DOMAIN) / (h_k + F.lit(1)))


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct estimate of ``value_col``.

    Plan (r14, guide §2.3/§2.4): one shuffle to dedupe ``(group,
    value)`` — partial aggregation collapses repeats map-side, and the
    portable md5 hash is then computed once per DISTINCT value instead
    of once per row — then one group-keyed shuffle shared by the
    residual (group, hash) dedup AND the rank window (hash(group)
    satisfies the dedup's clustered distribution, so neither adds an
    exchange). Same two exchanges as the pre-r14 form, strictly fewer
    hash evaluations, same skew posture (the per-group window was
    always the funnel and it still reads deduped rows). At scale the
    rank-k truncation is what keeps sketch state at k values per
    group; the exact ``n_distinct`` column rides along for error
    visibility — drop it in a true 100 TB run, it is the expensive
    part. Output: ``group_cols…, n_distinct (hash-distinct, exact),
    kmv_estimate``.
    """
    ranked = _kmv_ranked(df, group_cols, value_col)
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.max(F.when(F.col("rn") <= k, F.col("h"))).alias("h_k"),
    )
    return agg.select(
        *group_cols,
        "n_distinct",
        _estimate(F.col("n_distinct"), F.col("h_k"), k).alias("kmv_estimate"),
    )


def _kmv_ranked(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Shared dedup + rank pipeline for the KMV family (see
    :func:`kmv_distinct`'s plan note): value-dedup first (md5 once per
    distinct value), then one group-keyed exchange shared by the
    residual hash-dedup and the rank window. With no group columns the
    rank is a global window — its input is already deduped, and the
    single-task stage is the caller's documented trade."""
    dd = (
        df.select(*group_cols, F.col(value_col))
        .dropDuplicates([*group_cols, value_col])
        .select(*group_cols, hash60(F.col(value_col)).alias("h"))
    )
    if group_cols:
        dd = dd.repartition(*[F.col(c) for c in group_cols])
    hashed = dd.dropDuplicates([*group_cols, "h"])
    w = Window.partitionBy(*group_cols).orderBy("h")
    return hashed.withColumn("rn", F.row_number().over(w))


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    sketch_col: str = "kmv_sketch",
    exact_col: str = "n_distinct",
) -> DataFrame:
    """Build a per-group KMV sketch: the sorted array of the k smallest
    distinct hashes (≤ k·8 bytes of state per group). Feed the result
    to :func:`kmv_merge` to roll groups up without re-reading data."""
    ranked = _kmv_ranked(df, group_cols, value_col)
    return ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(exact_col),
        F.sort_array(
            F.collect_list(F.when(F.col("rn") <= k, F.col("h")))
        ).alias(sketch_col),
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = 64,
    sketch_col: str = "kmv_sketch",
    estimate_col: str = "kmv_estimate",
) -> DataFrame:
    """Merge per-subgroup sketches up to ``group_cols`` and estimate.

    Correctness of the merge: every hash among the k smallest of the
    union is, within its own subgroup, also among that subgroup's k
    smallest (a subgroup's hash set is a subset of the union's), so
    truncated sketches lose nothing — the merged estimate equals the
    estimate computed directly from the raw data. Only k-element arrays
    shuffle here; the raw table is not touched.
    """
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(sketch_col)))),
        1,
        k,
    )
    agg = sketches.groupBy(*group_cols).agg(merged.alias("_m"))
    n = F.size(F.col("_m"))
    # F.get is 0-based and null (not ANSI error) when the merged array
    # is shorter than k — the exact-count branch of _estimate covers it
    return agg.select(
        *group_cols,
        _estimate(n, F.get(F.col("_m"), k - 1), k).alias(estimate_col),
    )


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 512,
    count_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of value
    frequencies per group, in rows-of-counters form:
    ``group_cols…, r, c, cnt`` with ``r < depth``, ``c < width``.

    Row r's column for a value is ``((a_r·x + b_r) mod (2^31−1)) mod
    width`` over ``x = hash60(value) mod 2^31`` — the repo's portable
    affine family, so any engine with md5 + int64 replays the sketch
    bit-for-bit. Counters are SUMS, so the sketch is (a) independent of
    row order and partitioning, and (b) MERGEABLE by plain addition
    (:func:`cms_merge`): per-source sketches roll up to the global
    sketch without re-reading data — depth·width bigints of state per
    group, however many distinct values stream through. That bounded,
    addable state is the 100 TB story: frequency tracking as a
    map-side-combinable groupBy on (group, r, c), never a per-value
    ledger.

    Estimates (:func:`cms_estimate`) are biased high (hash collisions
    only ever ADD) with the classic guarantee: overestimate ≤
    ``e·N/width`` with probability ``1 − e^(−depth)``.

    ``count_col`` (r14, guide §2.3 — aggregate before you shuffle):
    when the caller already holds PRE-COUNTED values (one row per
    distinct value with its occurrence count — e.g. the token
    histogram a heavy-hitters query needs anyway), pass the count
    column and the counters become ``sum(count_col)`` over the same
    addresses. Counter-for-counter identical to sketching the raw
    stream (each counter is Σ over its values of that value's
    occurrence count — sums commute), but the affine address family
    is evaluated once per DISTINCT value instead of once per
    occurrence, and the address shuffle carries the histogram, not
    the corpus.
    """
    params = portable_hash_params(depth)
    x = hash60(F.col(value_col)) % F.lit(1 << 31)
    rc = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    ((x * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31) % F.lit(width)).alias(
                        "c"
                    ),
                )
                for r, (a, b) in enumerate(params)
            ]
        )
    )
    weight = (
        F.count(F.lit(1))
        if count_col is None
        else F.sum(count_col).cast("bigint")
    )
    keep = [*group_cols] if count_col is None else [*group_cols, count_col]
    return (
        df.select(*keep, rc.alias("_rc"))
        .select(*keep, "_rc.r", "_rc.c")
        .groupBy(*group_cols, "r", "c")
        .agg(weight.alias("cnt"))
    )


def cms_merge(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll per-subgroup sketches up to ``group_cols`` — counter-wise
    addition, the defining mergeability of CMS. Only (r, c, cnt)
    triples shuffle; estimates after merging equal estimates from a
    direct sketch of the union (sums commute)."""
    return sketches.groupBy(*group_cols, "r", "c").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 512,
    out: str = "cms_count",
) -> DataFrame:
    """Point-query the sketch: for each item, min over the depth rows
    of the addressed counters (absent counter ⇒ 0 ⇒ estimate 0).

    Plan: map items to their depth (r, c) addresses, broadcast-join the
    (small, ≤ depth·width rows per group) sketch, min-agg back to one
    row per item — the item side is never shuffled on data size.
    """
    params = portable_hash_params(depth)
    x = hash60(F.col(item_col)) % F.lit(1 << 31)
    gcols = list(group_cols or [])
    addr = items.select(
        *gcols,
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            (x * F.lit(a) + F.lit(b))
                            % F.lit(MERSENNE31)
                            % F.lit(width)
                        ).alias("c"),
                    )
                    for r, (a, b) in enumerate(params)
                ]
            )
        ).alias("_rc"),
    ).select(*gcols, item_col, "_rc.r", "_rc.c")
    joined = addr.join(F.broadcast(sketch), [*gcols, "r", "c"], "left")
    return joined.groupBy(*gcols, item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(out)
    )


def sampled_quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    value_col: str,
    k: int = 256,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Bounded-memory quantile estimates per group from a k-min-hash
    UNIFORM SAMPLE — the same md5-rank device as the KMV distinct
    sketch, pointed at quantiles: the k rows with the smallest
    ``hash60(key)`` per group are a uniform without-replacement sample,
    so order statistics over them estimate the group's quantiles with
    O(1/sqrt(k)) error, at k values of state per group instead of a
    full sort (what an exact percentile costs at 100 TB).

    Mergeable like KMV (k smallest of a union == k smallest of the
    union of each side's k smallest) and engine-exact: the sample
    membership is determined by md5, the quantile rule is the
    deterministic lower order statistic ``sorted[floor(q·(m-1))]`` —
    no interpolation arithmetic to diverge.
    """
    hashed = df.select(
        *group_cols, F.col(value_col).alias("_v"), hash60(F.col(key_col)).alias("h")
    )
    w = Window.partitionBy(*group_cols).orderBy("h")
    sampled = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = sampled.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.array_sort(F.collect_list("_v")).alias("_vs"),
    )
    cols = [*group_cols, "n_sampled"]
    out = agg
    # positions index the NULL-FREE sorted array, so they come from
    # size(_vs), not the sampled row count (r12 review: collect_list
    # skips NULL values, so null-bearing groups shifted every quantile
    # and could index past the array — an ANSI-mode abort); an
    # all-null group yields NULL quantiles instead of element_at(0)
    for q in qs:
        m = F.size("_vs")
        idx = (
            F.floor(F.lit(float(q)) * (m - F.lit(1)).cast("double")).cast(
                "int"
            )
            + F.lit(1)
        )
        name = f"q{int(round(q * 100)):02d}"
        out = out.withColumn(
            name, F.when(m > 0, F.element_at("_vs", idx))
        )
        cols.append(name)
    return out.select(*cols)


def kmv_overlap_estimate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-overlap estimation between groups from KMV sketches
    — "how much does source A's vocabulary/url/doc-hash space overlap
    source B's?" without ever joining the raw sets (the cross-source
    contamination-screen shape at corpus scale).

    Per group: one KMV sketch (k smallest md5 hashes of distinct
    values). Per pair: Jaccard is estimated on the k smallest hashes
    of the UNION of the two sketches (the standard KMV-Jaccard
    estimator: |shared ∩ union-top-k| / k), and intersection size via
    J·(|A∪B| est). Everything downstream of the sketches touches
    k-element arrays only — pairwise work is |groups|² · k, independent
    of data size. Deterministic md5 hashing ⇒ engine-exact, fully
    oracle-checkable."""
    sk = kmv_sketch(df, [group_col], value_col, k=k)
    a = sk.select(
        F.col(group_col).alias("g_a"),
        F.col("kmv_sketch").alias("sk_a"),
        F.col("n_distinct").alias("nd_a"),
    )
    b = sk.select(
        F.col(group_col).alias("g_b"),
        F.col("kmv_sketch").alias("sk_b"),
        F.col("n_distinct").alias("nd_b"),
    )
    pairs = a.join(b, F.col("g_a") < F.col("g_b"))
    union_k = F.slice(
        F.array_sort(F.array_union(F.col("sk_a"), F.col("sk_b"))), 1, k
    )
    shared = F.size(
        F.array_intersect(
            union_k, F.array_intersect(F.col("sk_a"), F.col("sk_b"))
        )
    )
    jacc_micro = F.floor(
        shared * F.lit(1_000_000) / F.least(F.size(union_k), F.lit(k))
    ).cast("bigint")
    return pairs.select(
        "g_a",
        "g_b",
        F.col("nd_a").cast("bigint").alias("nd_a"),
        F.col("nd_b").cast("bigint").alias("nd_b"),
        shared.cast("bigint").alias("shared_in_topk"),
        jacc_micro.alias("jaccard_micro"),
    )
