"""Deterministic sampling / splitting / quota operators for training-data
pipelines.

The reference has no sampling surface (its tables are 2–3 rows), but a
100 TB corpus pipeline lives on these three ops: reproducible train/val/
test splits, per-domain quota caps, and stratified downsampling. All
three are built on a CONTENT-KEYED deterministic hash rather than
``rand()`` so that:

- re-running the pipeline (or re-running one failed partition — Spark
  task retries!) assigns every row the same bucket;
- the assignment survives repartitioning, cluster size changes, and
  engine swaps (the same md5 arithmetic runs in DuckDB for the oracle);
- dedup-then-split and split-then-dedup commute for exact duplicates.

Scale posture: every op here is embarrassingly parallel (a map over
rows) except :func:`quota_per_key`, which is one shuffle on the key —
identical to any groupBy, AQE-skew-safe, no driver participation.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Number of hash buckets used for split/sample decisions. 10_000 gives
#: basis-point resolution; md5's top 15 hex chars (60 bits) feed it.
BUCKETS = 10_000


def _micro_half_up(x: float) -> int:
    """Quantize to integer micro-units with HALF_UP rounding
    (floor(x·1e6 + 0.5)) — the repo-wide tie-break convention, matching
    DuckDB's round() (half away from zero for positives). Python's
    built-in round() is banker's half-even and would disagree with the
    oracle on an exact-.5 micro value."""
    return int(math.floor(x * 1_000_000 + 0.5))


def hash_bucket(col: Column | str, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in ``[0, buckets)`` from md5 of the column.

    Portable arithmetic: ``conv(substr(md5(x), 1, 15), 16, 10) % buckets``
    — 15 hex chars = 60 bits, exact in a bigint in both Spark and DuckDB
    (``('0x' || substr(md5(x),1,15))::BIGINT`` there). NULL input → NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")
        % buckets
    )


def hash_split(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Assign a reproducible train/val/test split from a hash of ``key``.

    ``weights`` maps split name → per-ten-thousand share (must sum to
    ``BUCKETS``); default 9000/500/500. Keying on document TEXT (not id)
    makes the split stable under re-ingestion and keeps exact duplicates
    in the same split — the property LLM data pipelines need so that
    near-identical eval rows can't leak into train via a different id.
    """
    weights = weights or {"train": 9000, "val": 500, "test": 500}
    if sum(weights.values()) != BUCKETS:
        raise ValueError(f"weights must sum to {BUCKETS}: {weights}")
    b = hash_bucket(key)
    expr: Column | None = None
    hi = 0
    for name, w in weights.items():
        hi += w
        expr = F.when(b < hi, F.lit(name)) if expr is None else expr.when(
            b < hi, F.lit(name)
        )
    return df.withColumn(split_col, expr)


def cluster_aware_split(
    df: DataFrame,
    components: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, int] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """NEAR-DUP-cluster-aware train/val/test split — the leakage guard
    :func:`hash_split` cannot give: hash_split keys on text, so EXACT
    duplicates co-split, but near-duplicates (paraphrases, boilerplate
    variants, the pairs MinHash/exact-Jaccard dedup finds) can still
    straddle train and eval, leaking eval content into training. Here
    every member of a near-dup cluster inherits the split decision of
    its CANONICAL member (min id — the connected_components label), so
    a cluster lands wholly in one split by construction.

    ``components`` is the (node, component) frame from
    ``graph.connected_components`` over any pair generator
    (exact_jaccard_pairs, minhash_pairs, all_pairs_ann). Docs absent
    from it are singletons (their own canonical). The split decision
    hashes the canonical member's TEXT (hash_split semantics, same
    ``weights`` contract) — content-derived, so singleton assignment
    is re-ingestion-stable; a multi-doc cluster's assignment is as
    stable as its min-id member, the standard CC-canonical trade.

    The canonical text is taken from the min-id member PRESENT in
    ``df`` (a per-cluster min-struct agg, not a join back on the CC
    label), so a components frame computed on a SUPERSET corpus — the
    common case after quality filtering removed some members,
    including possibly the old min-id canonical — still assigns every
    surviving row a split, and a cluster still never straddles. Rows
    with NULL ``key_col`` or NULL ``text_col`` are EXCLUDED
    (contract, the sibling-operator discipline).

    Scale: two ordinary key-equi shuffles (membership join, canonical
    min-agg + fetch-back) — no windows, no driver state. Returns
    ``df``'s rows plus ``cluster_id`` and ``split_col``."""
    membership = (
        df.filter(
            F.col(key_col).isNotNull() & F.col(text_col).isNotNull()
        )
        .join(
            components.select(
                F.col("node").alias(key_col),
                F.col("component").alias("_comp"),
            ),
            key_col,
            "left",
        )
        .withColumn(
            "cluster_id", F.coalesce(F.col("_comp"), F.col(key_col))
        )
        .drop("_comp")
    )
    # canonical = the min-id member PRESENT among df's rows of the
    # cluster — min over (key, text) structs, so the text rides along
    canon = membership.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                F.col(key_col).alias("k"), F.col(text_col).alias("t")
            )
        )["t"].alias("_canon_text")
    )
    joined = membership.join(canon, "cluster_id")
    return hash_split(joined, "_canon_text", weights, split_col).drop(
        "_canon_text"
    )


def stratified_sample(
    df: DataFrame,
    key: Column | str,
    fraction_bp: int,
) -> DataFrame:
    """Keep a deterministic ``fraction_bp``/10000 sample keyed on ``key``.

    Unlike ``df.sample()`` (seeded per-partition rand — NOT stable under
    repartitioning) this is a pure filter, so Catalyst pushes it down
    and retries/resizes can't change the sample.
    """
    return df.filter(hash_bucket(key) < fraction_bp)


def quota_per_key(
    df: DataFrame,
    key: Sequence[str] | str,
    n: int,
    order_by: Sequence[Column],
) -> DataFrame:
    """Cap the rows kept per ``key`` at ``n``, preferring ``order_by``.

    The domain-quota op of corpus curation ("at most N pages per host").
    One shuffle on ``key``; rank is computed with ``row_number`` so the
    cut is deterministic given a total ``order_by`` (include a unique id
    as the last sort key). For heavy-hitter keys at 100 TB this windows
    within each key partition only — no global sort — and AQE handles
    the skewed-host case; a pre-filter ``hash_bucket < p`` can shrink
    monster hosts before the shuffle when n ≪ key cardinality.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def negative_samples(
    positives: DataFrame,
    n_items: int,
    k: int = 2,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for contrastive/recommender
    training: for every positive (user, item) pair, emit ``k``
    pseudo-random candidate items drawn by hashing
    ``user#item#draw-index`` into the item-id space ``[1, n_items]`` —
    content-keyed like every sampler here, so the same positives yield
    the same negatives under any partitioning, retry, or engine (md5,
    not rand()). A drawn item that collides with the pair's own
    positive is flagged, not silently resampled — the training pipeline
    downstream decides (filter or keep), and the count stays exactly k
    per positive either way.

    Map-only: explode k draw indices per row, no shuffle, no join
    against the item catalog (the id space is dense here; a sparse
    catalog would add one broadcast join to map dense draws to ids).

    ``k`` and ``n_items`` must be positive (r13 review, the
    binned_interval_join precedent): Spark's ``sequence(0, k-1)``
    DESCENDS when k ≤ 0 — k=0 silently emitted TWO draws per positive
    (draw_idx 0 and −1) instead of zero, and ``% n_items`` with
    n_items ≤ 0 is a divide-by-zero/negative-id surprise.
    """
    if k <= 0:
        raise ValueError(
            f"k must be positive, got {k}: sequence(0, k-1) descends "
            "for k <= 0 and would emit |k|+2 draws per positive, not 0"
        )
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    draw = F.concat_ws(
        "#",
        F.col(user_col).cast("string"),
        F.col(item_col).cast("string"),
        F.col("_i").cast("string"),
    )
    h = F.conv(F.substring(F.md5(draw), 1, 15), 16, 10).cast("bigint")
    return (
        positives.select(
            user_col,
            item_col,
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
        )
        .select(
            user_col,
            item_col,
            F.col("_i").alias("draw_idx"),
            (h % F.lit(n_items) + F.lit(1)).alias("neg_item_id"),
        )
        .withColumn("collides_positive", F.col("neg_item_id") == F.col(item_col))
    )


def mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    target_rows: int | None = None,
) -> DataFrame:
    """Temperature-weighted source mixing — the corpus-mixing step of
    LLM data prep (GPT-3/Pile-style): sample source s at a rate
    ∝ count(s)^alpha, so alpha=1 preserves natural proportions, alpha=0
    equalizes sources, and 0<alpha<1 up-weights small high-quality
    sources without drowning in the big crawl.

    Plan: one tiny per-source count agg (broadcast back), per-source
    keep-probability = target·w_s/count_s clamped to 1, then the usual
    deterministic content-hash threshold filter — a pushdown-able,
    retry/repartition-stable predicate, no rand(). ``target_rows``
    defaults to the input size (pure re-weighting).

    Rates are micro-quantized (integer basis points of the hash-bucket
    space) so the SAME rows are kept in any engine.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    rows = counts.collect()  # |sources| rows — catalog-sized
    total_target = target_rows or sum(r["_n"] for r in rows)
    ns = {r[source_col]: int(r["_n"]) for r in rows}
    # micro-quantize each weight, then EVERYTHING downstream is exact
    # integer arithmetic (arbitrary-precision in Python, HUGEINT in the
    # DuckDB oracle) — no float-sum-order or ulp dependence anywhere
    w_micro = {s: _micro_half_up(math.pow(n, alpha)) for s, n in ns.items()}
    wsum_micro = sum(w_micro[s] for s in sorted(w_micro))
    thresholds = {
        s: min(
            BUCKETS,
            (BUCKETS * total_target * w_micro[s]) // (wsum_micro * ns[s]),
        )
        for s in w_micro
    }
    spark = df.sparkSession
    thr_df = F.broadcast(
        spark.createDataFrame(
            sorted(thresholds.items()),
            f"{source_col} string, _thr bigint",
        )
    )
    return (
        df.join(thr_df, source_col)
        .filter(hash_bucket(F.col(key_col)) < F.col("_thr"))
        .drop("_thr")
    )


def token_budget_mix(
    df: DataFrame,
    shares_bp: dict[str, int],
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = BUCKETS,
) -> DataFrame:
    """EXACT token-budget mixture assembly — the Pile/DoReMi-style
    mixing step done by TOKEN share, not document share: per source
    ``s`` with share ``shares_bp[s]``/10000 of ``budget_tokens``, keep
    the smallest content-ordered prefix of its documents whose token
    count reaches the source budget (greedy take-until-reached; the
    final document may overshoot — the standard assembler semantics).
    :func:`mixture_sample` re-weights by ROW probability; this op hits
    a token target exactly, which is what a training-run data budget
    is denominated in.

    Selection order within a source is (hash bucket, md5(text), id) —
    content-derived, so the assembled mix is stable under
    repartitioning, retries, re-ingestion, and replays identically in
    any engine. A document is selected iff the tokens of all docs
    strictly before it (in that order) are < the source's budget.

    Scale (the reason this is NOT one window): a per-source running
    sum would be a single task per source — the stride_schedule
    problem. Instead a two-level histogram cut:

    1. histogram — one corpus-scale (source, bucket) token-sum agg
       (map-side combined; ≤ |sources|·num_buckets rows);
    2. bucket classification — a catalog-sized per-source window over
       the histogram (partitions ≤ num_buckets rows) marks each bucket
       take-all / boundary / drop; at most ONE boundary bucket per
       source;
    3. take-all docs — map-side join (AQE broadcasts the histogram
       side when it fits; with very many sources lower num_buckets to
       keep it catalog-sized);
    4. boundary docs — ~1/num_buckets of each source shuffles for the
       fine window partitioned by (source, bucket); everything else
       never shuffles.

    Rows with NULL id/source/text are EXCLUDED (contract, mirrored in
    oracles); sources absent from ``shares_bp`` are dropped. Budgets
    are exact integers: floor(budget_tokens·bp/10000) per source;
    shares must sum to ≤ 10000 (they are fractions of ONE budget —
    the hash_split weights discipline; under-allocation is legal,
    over-allocation would silently assemble more than budget_tokens).
    Returns (id_col, source_col, n_tokens) of the selected documents.
    """
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    if not shares_bp:
        raise ValueError("shares_bp must name at least one source")
    if any(bp < 0 for bp in shares_bp.values()):
        raise ValueError(f"shares_bp values must be >= 0: {shares_bp}")
    if sum(shares_bp.values()) > 10_000:
        raise ValueError(
            f"shares_bp must sum to <= 10000 (fractions of one budget), "
            f"got {sum(shares_bp.values())}: {shares_bp}"
        )
    budgets = {
        s: (budget_tokens * bp) // 10_000 for s, bp in shares_bp.items()
    }
    return budget_cut(
        df, budgets, source_col, id_col, text_col, num_buckets
    )


def budget_cut(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = BUCKETS,
) -> DataFrame:
    """The assembler's cut by ABSOLUTE per-source token budgets — the
    layer under :func:`token_budget_mix` (which derives budgets from
    shares), exposed so callers holding their own budget arithmetic
    (e.g. the streaming admission controller's REMAINING budgets) run
    the identical two-level histogram cut. Same contract: strict-prefix
    < budget in (bucket, md5(text), id) order; NULL id/source/text
    excluded; sources absent from ``budgets`` dropped."""
    from .text import tokens  # noqa: PLC0415

    if any(b < 0 for b in budgets.values()):
        raise ValueError(f"budgets must be >= 0: {budgets}")
    spark = df.sparkSession
    bdg = spark.createDataFrame(
        sorted(budgets.items()), f"{source_col} string, _budget bigint"
    )
    d = df.filter(
        F.col(id_col).isNotNull()
        & F.col(source_col).isNotNull()
        & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col),
        F.col(source_col),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
        hash_bucket(F.col(text_col), num_buckets).alias("_bkt"),
        F.md5(F.col(text_col).cast("string")).alias("_h"),
    )
    hist = d.groupBy(source_col, "_bkt").agg(
        F.sum("n_tokens").alias("_btok")
    )
    w_cum = (
        Window.partitionBy(source_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cls = (
        hist.join(F.broadcast(bdg), source_col)
        .withColumn(
            "_before", F.coalesce(F.sum("_btok").over(w_cum), F.lit(0))
        )
        .withColumn(
            "_tag",
            F.when(
                F.col("_before") + F.col("_btok") <= F.col("_budget"),
                F.lit("all"),
            )
            .when(F.col("_before") < F.col("_budget"), F.lit("boundary"))
            .otherwise(F.lit("drop")),
        )
    )
    taken = d.join(
        cls.filter(F.col("_tag") == "all").select(source_col, "_bkt"),
        [source_col, "_bkt"],
    ).select(id_col, source_col, "n_tokens")
    # ≤ one boundary bucket per source — genuinely tiny, broadcast it
    bnd_meta = F.broadcast(
        cls.filter(F.col("_tag") == "boundary").select(
            source_col, "_bkt", "_before", "_budget"
        )
    )
    w_fine = (
        Window.partitionBy(source_col, "_bkt")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = (
        d.join(bnd_meta, [source_col, "_bkt"])
        .withColumn(
            "_run", F.coalesce(F.sum("n_tokens").over(w_fine), F.lit(0))
        )
        .filter(F.col("_before") + F.col("_run") < F.col("_budget"))
        .select(id_col, source_col, "n_tokens")
    )
    return taken.unionByName(boundary)


def weighted_reservoir(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement of exactly ``k`` rows
    (Efraimidis–Spirakis A-ES): each row draws key u^(1/w) with u
    uniform in (0,1]; the k largest keys are the sample. Inclusion
    probability is proportional to weight, jointly across the whole
    sample — the property per-row Bernoulli thresholding
    (:func:`mixture_sample` and the length-weighted filter) cannot
    give.

    Deterministic u from the content hash ((hash60+1)/2^60 ∈ (0,1]),
    scored as ln(u)/w nano-quantized to bigint (libm-ulp-proof), so
    the selected set is identical in any engine and across retries.
    Plan: map-only scoring + TakeOrdered(k) — no shuffle of the data,
    driver holds k rows only.

    Rows with ``weight_col`` <= 0 or NULL are EXPLICITLY excluded
    before scoring (A-ES is defined for positive weights only): weight
    0 would yield a NULL score silently dropped by nulls-last ordering,
    and a negative weight would flip the sign of ln(u)/w and invert the
    selection. The filter makes the exclusion a declared part of the
    operator contract, mirrored in oracles."""
    raw = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("double")
    u = (raw + F.lit(1.0)) / F.lit(float(1 << 60))
    score_nano = F.floor(
        F.log(u) / F.col(weight_col).cast("double") * F.lit(1_000_000_000.0)
    ).cast("bigint")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("score_nano", score_nano)
        .orderBy(F.col("score_nano").desc(), F.col(key_col).asc())
        .limit(k)
    )


def _ln_micro(x: Column) -> Column:
    """round(ln(x)·1e6) → bigint — the repo-wide micro-quantized log
    (vocab_zipf_fit precedent): every ln is quantized BEFORE any
    arithmetic so downstream sums/differences are exact integers and
    replay bit-identically in any engine."""
    return F.round(F.log(x.cast("double")) * F.lit(1_000_000.0)).cast("bigint")


def dsir_sample(
    df: DataFrame,
    target: Column,
    k: int,
    num_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.,
    NeurIPS 2023): pick ``k`` documents from a raw corpus so the
    selection is distributed like a small TARGET domain (the rows where
    ``target`` is true), using hashed-n-gram importance weights.

    Three-step pipeline; all corpus-scale work is two streaming passes
    (model fit, weight join), each one ordinary keyed shuffle, with
    the featurize shuffle paid once per pass:

    1. featurize — hashed unigram bag per doc (text.feature_hashing,
       portable md5 bucketing), with the target flag carried through
       the groupBy (no join-back shuffle);
    2. weight — two multinomial bag models with add-1 smoothing:
       p(b) on target docs, q(b) on the full corpus. Per-bucket
       log-ratio λ_b = ln p(b) − ln q(b) is assembled from FOUR
       individually micro-quantized lns (exact-integer algebra from
       there on); the ≤``num_buckets``-row λ table broadcasts onto the
       doc-bucket counts and the per-doc importance log-weight is the
       integer sum Σ_b n_b·λ_b (one doc-keyed shuffle);
    3. resample — Gumbel top-k: sampling WITHOUT replacement with
       inclusion probability ∝ exp(logw) is exactly "add standard
       Gumbel noise to each logw, keep the k largest keys". The noise
       is content-keyed (md5 of 'dsir|'+id → u = (hash60+0.5)/2^60,
       strictly inside (0,1) at BOTH ends so neither ln(0) endpoint is
       reachable and the Gumbel is the full standard distribution, not
       a truncated one), micro-quantized, and the final key is integer
       logw_micro + gumbel_micro → a map-only TakeOrdered(k); the
       driver holds k rows only.

    Deterministic across engines, retries, and repartitioning: bucket
    hash, every ln, and the Gumbel draw all replay in DuckDB. At 100 TB
    the λ table is ``num_buckets`` rows regardless of corpus size, the
    model fit is one pass, and nothing materializes more than the
    doc-bucket count matrix (≤ min(tokens, buckets) rows per doc).

    Rows where ``target`` is NULL count as non-target (coalesce to
    false) — the raw model q includes EVERY doc, matching the paper
    (target ⊆ raw)."""
    from .text import feature_hashing  # noqa: PLC0415

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    flagged = df.select(
        F.col(id_col),
        F.col(text_col),
        F.coalesce(target.cast("boolean"), F.lit(False)).alias("_is_t"),
    )
    feats = feature_hashing(
        flagged, id_col, text_col, num_buckets, carry_cols=["_is_t"]
    )
    # Cache the ≤num_buckets-row MODEL frame, not the corpus-scale
    # count matrix: its three consumers (totals + λ assembly) would
    # otherwise each re-run the featurize pass (differently-pruned
    # scans defeat ReuseExchange), while caching `feats` itself would
    # commit corpus-scale memory for a one-pass saving. Net: exactly
    # TWO streaming corpus passes (model fit, weight join) at any
    # scale. Pinned to the result — callers release when done.
    bstats = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_t"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("ct"),
        F.sum("cnt").cast("bigint").alias("cr"),
    ).persist()
    tot = bstats.agg(
        F.sum("ct").cast("bigint").alias("t_tot"),
        F.sum("cr").cast("bigint").alias("r_tot"),
    )
    alpha_b = float(num_buckets)  # add-1 smoothing over num_buckets cells
    lam = bstats.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            _ln_micro(F.col("ct") + F.lit(1.0))
            - _ln_micro(F.col("t_tot") + F.lit(alpha_b))
            - _ln_micro(F.col("cr") + F.lit(1.0))
            + _ln_micro(F.col("r_tot") + F.lit(alpha_b))
        ).alias("lam_micro"),
    )
    logw = (
        feats.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("lam_micro")).alias("logw_micro"))
    )
    from .sketch import hash60  # noqa: PLC0415

    # (hash60 + 0.5) / 2^60 keeps u strictly inside (0,1) — hash60=0
    # gives u=2^-61 > 0 and hash60=2^60-1 gives u<1 — so -ln(-ln(u))
    # draws the FULL standard Gumbel, not a right-truncated one (the
    # earlier /2^61 form capped u at 0.5, biasing inclusion toward the
    # highest-weight docs vs the claimed ∝ exp(logw) semantics).
    u = (
        hash60(F.concat(F.lit("dsir|"), F.col(id_col).cast("string")))
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    gumbel_micro = F.round(-F.log(-F.log(u)) * F.lit(1_000_000.0)).cast("bigint")
    from ..cache import pin  # noqa: PLC0415

    return pin(
        logw.withColumn("key_micro", F.col("logw_micro") + gumbel_micro)
        .orderBy(F.col("key_micro").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "logw_micro", "key_micro"),
        bstats,
    )


def exact_stratified_split(
    df: DataFrame,
    strata_col: str,
    test_frac: float = 0.1,
    key: Column | str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """EXACT per-stratum holdout: precisely ⌊n_s·frac + 0.5⌋ test rows
    in every stratum — what :func:`hash_split` (probabilistic shares)
    cannot promise for small strata, where binomial noise can leave a
    stratum's eval slice empty.

    Selection order inside a stratum is (md5(key), key) rank — content
    -derived, so the assignment survives repartitioning, retries and
    re-ingestion, and replays identically in any engine. One
    stratum-keyed window (count rides the same partition as the rank:
    a single shuffle); strata are assumed ≪ rows but each stratum's
    window parallelizes across... one task per stratum — fine while
    strata are MANY relative to rows-per-stratum; when a handful of
    huge strata dominate, use
    :func:`exact_stratified_split_scalable` (same exact-count
    guarantee through the grouped_exact_rank value histogram — no
    single-task stratum windows), or hash_split when exactness can be
    traded away entirely.
    """
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac must be in [0, 1], got {test_frac}")
    c = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(strata_col).orderBy(F.md5(c.cast("string")), c)
    wc = Window.partitionBy(strata_col)
    n_test = F.floor(
        F.count(F.lit(1)).over(wc) * F.lit(float(test_frac)) + F.lit(0.5)
    )
    return df.withColumn(
        split_col,
        F.when(F.row_number().over(w) <= n_test, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def exact_stratified_split_scalable(
    df: DataFrame,
    strata_col: str,
    test_bp: int = 1000,
    key_col: str = "doc_id",
    split_col: str = "split",
    nbins: int = 10_000,
) -> DataFrame:
    """The scale path :func:`exact_stratified_split`'s docstring
    points away from: the SAME exact per-stratum holdout guarantee —
    precisely ⌊n_s·test_bp/10000 + ½⌋ test rows per stratum — WITHOUT
    the one-task-per-stratum window, by ranking through
    :func:`..scale.grouped_exact_rank`'s two-level value histogram
    (the token_budget_mix machinery: catalog-sized classification +
    fine windows over ~1/nbins of each stratum).

    Selection order inside a stratum is (hash60(key), key) — the
    60-bit integer prefix of md5, content-derived like the original's
    (md5, key) order, so the assignment survives repartitioning,
    retries and re-ingestion and replays in any engine. (The two
    operators draw DIFFERENT test sets for the same data — a 60-bit
    hash prefix orders ties differently than the full hex string —
    so this is a sibling, not a drop-in; both contracts are exact.)
    ``test_bp`` is integer basis points so the cut replays exactly:
    n_test = (n·test_bp + 5000) div 10000. Rows with NULL
    key/strata are EXCLUDED (the grouped_exact_rank contract).

    Returns (key_col, strata_col, rank, n, split_col) — join back on
    ``key_col`` to carry other columns (one key-equi shuffle the
    caller pays only if needed)."""
    from .scale import grouped_exact_rank  # noqa: PLC0415
    from .sketch import hash60  # noqa: PLC0415

    if not 0 <= test_bp <= 10_000:
        raise ValueError(f"test_bp must be in [0, 10000], got {test_bp}")
    scored = df.select(
        F.col(key_col),
        F.col(strata_col),
        hash60(F.col(key_col).cast("string")).alias("_score"),
    )
    ranked = grouped_exact_rank(
        scored, strata_col, "_score", key_col, nbins=nbins
    )
    return ranked.select(
        key_col,
        strata_col,
        "rank",
        "n",
        F.when(
            F.col("rank") * 10_000 <= F.col("n") * test_bp + F.lit(5_000),
            F.lit("test"),
        )
        .otherwise(F.lit("train"))
        .alias(split_col),
    )


def temporal_holdout_split(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    cutoff,
    holdout_per_10k: int = 1000,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-guarded temporal split for per-user event data: a
    deterministic ``holdout_per_10k``/10k slice of USERS goes entirely
    to ``test`` (every event, both sides of the cutoff), and the rest
    split by time — ``train`` before ``cutoff``, ``valid`` at/after.

    The two standard eval protocols composed so neither leaks: the
    held-out users measure cold-start generalization (a plain temporal
    split leaks their history into train), while the time cutoff on
    remaining users measures forecasting without future leakage. The
    user assignment rides :func:`hash_bucket` (content-keyed md5), so
    it is reproducible across runs/retries/engines and every event of
    a user lands on the same side — the property a ``rand()`` split
    cannot give.

    Pure map over rows (no shuffle, no per-user state): the holdout
    decision is a hash of the user column, the rest a timestamp
    comparison. Pushdown-able: Catalyst folds the split predicate into
    the scan when a caller filters on one split value.
    """
    if not 0 <= holdout_per_10k <= BUCKETS:
        raise ValueError(f"holdout_per_10k must be in [0, {BUCKETS}]")
    u = F.col(user_col) if isinstance(user_col, str) else user_col
    t = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return df.withColumn(
        split_col,
        F.when(hash_bucket(u) < holdout_per_10k, F.lit("test"))
        .when(t < F.lit(cutoff), F.lit("train"))
        .otherwise(F.lit("valid")),
    )


def stride_schedule(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    n_shards: int = 8,
    num_partitions: int = 32,
) -> DataFrame:
    """Deterministic interleaved TRAINING ORDER for a multi-source
    corpus — the manifest-writing step after mixing: every document
    gets a global position and a shard, with sources interleaved
    proportionally to their temperature weight (w_s ∝ count_s^alpha)
    by STRIDE SCHEDULING (Waldspurger & Weihl, OSDI '94): document
    number ``i`` of source ``s`` runs at virtual time ``i / w_s``, and
    the global order is virtual time ascending. Within any prefix of
    the schedule each source appears ≈ its weight share — no long
    single-source runs (which bias SGD), no rand() (the order must be
    reproducible across retries, engines, and re-ingestion).

    Determinism end to end: within-source order is (md5(key), key) — a
    content-keyed shuffle, like every sampler here; virtual time is
    exact integer arithmetic, ``i·10^12 div w_micro`` evaluated in
    DECIMAL(38,0) so it cannot overflow at any corpus size a bigint
    index can address (w_micro ≥ 10^6 keeps the quotient inside int64);
    and ties break on (source, key).

    Plan at 100 TB: one source-keyed window shuffle for the per-source
    index, then ONE range-repartition for the global order via
    :func:`operators.scale.distributed_prefix_sum` — NOT a bare
    ``row_number() over (order by ...)``, which would funnel the corpus
    through a single task. Driver traffic: |sources| weight rows + one
    row per partition (both catalog-sized). Shard = (pos-1) % n_shards,
    so shards are balanced to ±1 row by construction.

    Returns the input columns plus ``global_pos`` (bigint, 1-based) and
    ``shard`` (int).

    Rows with a NULL ``source_col`` are EXPLICITLY rejected (a loud
    ValueError, driver-side, before any schedule math): a NULL source
    has no temperature weight, ``sorted()`` over a None key would
    TypeError, and the weight equi-join would silently drop the rows —
    violating the "every document gets a global position" contract.
    Route unattributed docs to a named bucket ('unknown') upstream.
    """
    from .scale import distributed_prefix_sum  # noqa: PLC0415

    counts = {
        r[source_col]: r["_n"]
        for r in df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()  # |sources| rows — catalog-sized
    }
    if None in counts:
        raise ValueError(
            f"stride_schedule: {counts[None]} rows have NULL "
            f"{source_col!r} — a NULL source has no weight and would "
            "silently drop from the schedule; map it to a named "
            "bucket (e.g. 'unknown') upstream"
        )
    w = {s: _micro_half_up(math.pow(n, alpha)) for s, n in counts.items()}
    spark = df.sparkSession
    w_df = F.broadcast(
        spark.createDataFrame(
            sorted(w.items()), f"{source_col} string, _w_micro bigint"
        )
    )
    k = F.col(key_col)
    iw = Window.partitionBy(source_col).orderBy(F.md5(k.cast("string")), k)
    d = (
        df.join(w_df, source_col)
        .withColumn("_i", F.row_number().over(iw))
        .withColumn(
            "_v",
            F.expr(
                "CAST(CAST(_i AS DECIMAL(38,0)) * 1000000000000"
                " div _w_micro AS BIGINT)"
            ),
        )
        .withColumn("_one", F.lit(1))
    )
    ranked = distributed_prefix_sum(
        d,
        [F.col("_v"), F.col(source_col), k],
        "_one",
        "global_pos",
        num_partitions=num_partitions,
    )
    return (
        ranked.withColumn(
            "shard", ((F.col("global_pos") - 1) % n_shards).cast("int")
        )
        .drop("_i", "_v", "_one", "_w_micro")
    )
