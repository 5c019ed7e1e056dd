"""Deduplication operators (north star; SURVEY.md §7.6).

Scale design notes (the point of each implementation):

- **Exact dedup** — hash-groupBy on ``md5(text)``: one shuffle keyed by
  a 128-bit digest (uniform → no skew), map-side partial agg. At
  100 TB this is the cheapest possible dedup: the shuffle carries
  (digest, doc_id), never the text.
- **MinHash + LSH** — shingles → k minhashes → b bands; candidate
  pairs come from an equi-join on (band, band_hash), i.e. a plain
  shuffled hash join on a uniform key instead of the O(n²) cross
  join. All hashing uses ``xxhash64`` (JVM, codegen) with per-row
  seeds — no Python.
- **SimHash** — 64-bit signature via per-token hash bit-voting;
  candidates by Hamming distance within banded prefix buckets.
- **N-gram Jaccard** — exact set similarity for candidate pairs;
  expressed as explode → distinct → self-join → count ratio, which is
  shuffle-heavy and therefore reserved for *verifying* LSH candidates,
  not the full corpus.
- **Embedding cosine near-dup** — see :mod:`.similarity`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import pin
from .sketch import MERSENNE31, hash60, portable_hash_params


def _check_banding(num_hashes: int, bands: int) -> int:
    """rows-per-band, validated (r12 review): a non-divisible
    (num_hashes, bands) pair silently dropped the trailing signature
    slots from every band key (unreported recall loss), and
    bands > num_hashes made rows_per_band 0 — every empty band slice
    hashed to ONE global bucket, turning the banded self-join into the
    O(n²) cross join it exists to avoid."""
    if bands < 1 or bands > num_hashes:
        raise ValueError(
            f"bands must be in [1, num_hashes={num_hashes}], got {bands}"
        )
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must divide evenly into bands "
            f"({bands}): a remainder would silently drop the trailing "
            "signature slots from every band key"
        )
    return num_hashes // bands


def normalized_text(col: Column) -> Column:
    return F.regexp_replace(F.lower(col), r"\s+", " ")


def norm_tokens(col: Column) -> Column:
    """Whitespace tokens of the lowercased text.

    ``split`` on ``\\s+`` already collapses whitespace runs, so the
    extra ``normalized_text`` regex pass is redundant for tokenization
    (one less full-text regex per row in every hot path).
    """
    return F.split(F.trim(F.lower(col)), r"\s+")


# --- exact -------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group identical texts, keep the min doc_id.

    Returns (text_hash, keep_id, dup_count).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep exactly one row per distinct text (the min doc_id one)."""
    keep = exact_dedup_groups(df, text_col).select("keep_id")
    return df.join(keep, df["doc_id"] == keep["keep_id"], "left_semi")


# --- shingling ---------------------------------------------------------------


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles of the normalized text → array<string> (distinct).

    Built from ``split`` + ``transform`` + ``slice`` — all JVM
    higher-order functions, no UDF. String shingles exist for the
    oracle-checkable exact-Jaccard path; the MinHash path uses
    :func:`with_shingle_hashes` (bigint shingles, ~5× cheaper).

    NOTE (r14): the transform lambda captures the token array, and a
    HOF lambda re-evaluates its captured expression tree per ELEMENT —
    passing raw text here re-tokenizes the document once per shingle.
    Prefer staging the tokens in their own projection and calling
    :func:`shingles_of_tokens` (what every in-repo caller now does);
    this wrapper remains for tiny/one-shot frames.
    """
    return shingles_of_tokens(norm_tokens(col), k)


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """K-shingles from an ALREADY-BOUND token-array column — the
    staged form of :func:`shingles` (see its r14 note; the
    with_shingle_hashes staging rationale applies verbatim)."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return F.array_distinct(sh)


def with_shingle_hashes(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    out: str = "_hs",
) -> DataFrame:
    """Distinct word-k-shingle *hashes* (array<bigint>) per row — the
    cheap substrate for MinHash.

    Two staged projections, and that staging is load-bearing: each
    intermediate column is referenced multiple times downstream, which
    stops Catalyst's CollapseProject from inlining (and thus
    re-evaluating) the expensive expression per reference:

    1. token hashes: one ``xxhash64`` per token *string* — the only
       string hashing anywhere in the MinHash pipeline;
    2. shingle hash: ``xxhash64`` over k consecutive 8-byte token
       hashes (fixed-width input, far cheaper than hashing k-word
       strings), then ``array_distinct`` on bigints.

    Measured at sf0.1 (50k docs): 0.4s vs 4.7s for string shingles.
    """
    th = df.select(
        "*", F.transform(norm_tokens(F.col(text_col)), lambda t: F.xxhash64(t)).alias("_th")
    )
    n = F.size(F.col("_th"))
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    # F.get (0-based), not element_at: for a sub-k-token doc the one
    # tail shingle reads past the array, and element_at ERRORS under
    # ANSI mode (Spark 4 default) where get yields NULL — which
    # xxhash64 skips, the semantics the reference oracle encodes
    sh = F.transform(
        idx,
        lambda i: F.xxhash64(*[F.get(F.col("_th"), i + j) for j in range(k)]),
    )
    return th.select("*", F.array_distinct(sh).alias(out)).drop("_th")


def _shingle_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int,
    max_df: int | None,
) -> DataFrame:
    """Shared inverted-index pair counter behind
    :func:`exact_jaccard_pairs` and :func:`containment_pairs` (r12
    review: the ~40-line shingle-explode / stop-shingle-cap /
    pair-count plan was byte-for-byte duplicated, so a fix to either
    could silently miss the other — the _chunk_frame precedent: parity
    hinges on every caller building the identical index). Returns
    ``(id_a, id_b, n_a, n_b, shared)`` with ``id_a < id_b``; the two
    callers derive their symmetric/asymmetric scores from it."""
    sh = df.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("_toks")
    ).select("id", shingles_of_tokens(F.col("_toks"), k_shingle).alias("sh"))
    ex = sh.select("id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s"))
    if max_df is not None:
        keep = (
            ex.groupBy("s")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("s")
        )
        ex = ex.join(keep, "s", "left_semi")
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )


def exact_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT Jaccard near-dup pairs via an inverted-index self-join —
    the deterministic, engine-portable counterpart to the probabilistic
    :func:`minhash_lsh_pairs` (candidate recall < 1) path.

    Plan: explode distinct word-shingles, equi-join on the shingle
    (ONE shuffle keyed on shingle — candidate pairs materialize only
    for documents that actually share a shingle, never all-pairs), then
    a (id_a, id_b) count-agg gives |A∩B| and Jaccard follows from the
    pre-computed set sizes. Cost is Σ_s df(s)², so frequent
    "stop-shingles" dominate at scale: pass ``max_df`` to drop shingles
    appearing in more than that many docs (the standard cap; it can
    only LOWER recall for pairs whose overlap is exclusively
    stop-shingles — at that point they are not near-dups worth finding,
    but the exactness claim then holds only for the capped index, which
    is why the oracle-checked query runs uncapped). Prefer the MinHash
    path when Σ df² is unaffordable.
    """
    pairs = _shingle_pair_counts(df, id_col, text_col, k_shingle, max_df)
    return pairs.select(
        "id_a",
        "id_b",
        (
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT shingle-containment pairs: C(A→B) = |A∩B| / |A| over word
    k-shingle sets — the ASYMMETRIC companion to
    :func:`exact_jaccard_pairs`. Jaccard misses the quote/sub-document
    case (a short doc wholly embedded in a long one scores |A|/|B| ≈ 0
    Jaccard but 1.0 containment), which is exactly the duplication mode
    corpus curation cares about for boilerplate and quoted articles.

    Identical plan shape to the Jaccard path (one shingle-keyed
    inverted-index shuffle, candidate pairs only for docs that share a
    shingle, optional ``max_df`` stop-shingle cap with the same
    exactness caveat); the pair agg emits BOTH directions' containment
    from the one shared count. Returns ``(id_a, id_b, containment_a,
    containment_b, jaccard)`` with id_a < id_b, keeping pairs where
    max(containment) ≥ threshold.
    """
    pairs = _shingle_pair_counts(df, id_col, text_col, k_shingle, max_df)
    shared = F.col("shared").cast("double")
    return pairs.select(
        "id_a",
        "id_b",
        (shared / F.col("n_a")).alias("containment_a"),
        (shared / F.col("n_b")).alias("containment_b"),
        (shared / (F.col("n_a") + F.col("n_b") - F.col("shared"))).alias("jaccard"),
    ).filter(
        F.greatest(F.col("containment_a"), F.col("containment_b")) >= threshold
    )


# --- minhash + LSH -----------------------------------------------------------


def _seeded_hash(i: int):
    # closure factory — a `lambda s, i=i:` default arg would change the
    # visible arity and make PySpark bind `i` to the element index
    return lambda s: F.xxhash64(s, F.lit(i))


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """k-permutation MinHash signature → array<bigint>.

    hash_i(s) = xxhash64(s, seed=i); signature[i] = min over shingles.
    Works over string or bigint shingles; re-hashing an 8-byte bigint
    per permutation is near-free compared to re-hashing strings, so
    feed it :func:`with_shingle_hashes` output.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, _seeded_hash(i)))
            for i in range(num_hashes)
        ]
    )


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Attach an ``minhash`` array<bigint> column.

    Staged as with_shingle_hashes → signature; the `_hs` column is
    referenced ``num_hashes`` times by the signature expression, which
    keeps the projection boundary (no re-evaluation per permutation).
    """
    hs = with_shingle_hashes(df, text_col, k_shingle)
    return hs.select(
        "*", minhash_signature(F.col("_hs"), num_hashes).alias("minhash")
    ).drop("_hs")


def banded_pairs_from_signatures(
    sig: DataFrame,
    num_hashes: int,
    bands: int,
    threshold: float,
    id_col: str = "doc_id",
    bucket_hash=F.xxhash64,
) -> DataFrame:
    """Banded-LSH candidate pairs from an ``(id, minhash)`` frame.

    Shared tail of every MinHash variant (fast xxhash64 and portable
    md5): band the signature, self-join on (band, bucket), estimate
    Jaccard from matching slots, threshold, de-duplicate across bands.
    ``bucket_hash`` maps the band-slice CSV string to the bucket key —
    callers pick the engine-specific (fast) or portable (oracle-able)
    hash.
    """
    rows_per_band = _check_banding(num_hashes, bands)
    banded = sig.select(
        id_col,
        "minhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        bucket_hash(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice(
                                        "minhash", b * rows_per_band + 1, rows_per_band
                                    ),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "minhash", "bb.band", "bb.bucket")

    a = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("minhash").alias("mh_a"),
        "band",
        "bucket",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("minhash").alias("mh_b"),
        "band",
        "bucket",
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    # estimate + threshold BEFORE the cross-band dropDuplicates: the
    # dedup shuffle then carries (id_a, id_b, est) — 3 narrow columns —
    # instead of two num_hashes-slot signature arrays per candidate,
    # and sub-threshold candidates never shuffle at all. Re-scoring a
    # pair once per shared band is 32 int compares — far cheaper than
    # the wider shuffle it avoids.
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, scored by
    signature-estimated Jaccard.

    Plan shape (scale rationale):
    1. signature per doc (map-only);
    2. explode to ``bands`` rows each, hash the band slice → bucket key
       (map-only; output is bands× ids, not texts);
    3. self-equi-join on (band, bucket) → candidates (one shuffle on a
       uniform 64-bit key — this is the step that replaces O(n²));
    4. estimate Jaccard as matching-minhash fraction; filter ≥ threshold.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, de-duplicated
    across bands.
    """
    # persist the signatures: they feed the banding stage, BOTH sides of
    # the self-join, and the Jaccard estimate — without a
    # materialization boundary the whole tokenize+hash+minhash pipeline
    # would re-run per consumer.
    sig = (
        with_minhash(df.select(F.col(id_col), F.col(text_col)), text_col, k_shingle, num_hashes)
        .select(id_col, "minhash")
        .persist()
    )
    return pin(
        banded_pairs_from_signatures(sig, num_hashes, bands, threshold, id_col),
        sig,
    )


def portable_shingle_coeffs(k: int) -> list[int]:
    """Deterministic per-position coefficients for the portable shingle
    hash ``s(t_1..t_k) = Σ_j (t_j·c_j mod M) mod M`` over 31-bit token
    hashes (M = 2^31−1). Position-dependent coefficients keep the
    combination non-commutative ("a b c" ≠ "c b a")."""
    return [((j + 1) * 2654435761 + 40503) % MERSENNE31 or 1 for j in range(k)]


def _affine_min(x_col: Column, a: int, b: int) -> Column:
    # closure-free form (the `lambda x, a=a:` default-arg arity trap
    # documented at _seeded_hash applies to transform callables)
    return F.array_min(
        F.transform(x_col, lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(MERSENNE31))
    )


def portable_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash LSH pairs with an ENGINE-PORTABLE hash family — the
    oracle-checkable twin of :func:`minhash_lsh_pairs`.

    The fast path seeds ``xxhash64``, whose constants are Spark-JVM
    internals no other engine reproduces, so its output can only be
    rows-checked. This variant hashes each shingle ONCE with md5
    (:func:`..sketch.hash60`, truncated to 31 bits) and derives the k
    permutations with the affine family ``h_i(x) = (a_i·x + b_i) mod
    (2^31−1)`` (:func:`portable_hash_params`); band buckets are
    ``hash60`` of the band-slice CSV. Everything is standardized md5 +
    int64 arithmetic, so DuckDB replays the entire pipeline —
    signature, banding, candidate join, Jaccard estimate — bit-for-bit
    in SQL, giving a full value-hash oracle for the LSH *algorithm*,
    not just its row count.

    Cost mirrors the fast path's shape (one string hash per TOKEN, then
    integer-only shingle/permutation math — the md5-per-(seed,shingle)
    form this replaced was ~7× slower at sf0.1):

    1. token hashes: one ``hash60`` (md5) per token, folded to 31 bits;
    2. shingle hash: position-weighted polynomial over k consecutive
       token hashes mod 2^31−1 (:func:`portable_shingle_coeffs`) —
       missing tail tokens contribute 0 via coalesce, matching DuckDB's
       out-of-range ``list[i] → NULL`` under the same COALESCE;
    3. k affine permutations, array_min each.

    Plan shape is identical: map-only signatures, one (band, bucket)
    shuffle, never all-pairs. ``F.get`` (not ``element_at``) keeps the
    tail-shingle access legal under ANSI mode.
    """
    sig = portable_signatures(df, text_col, k_shingle, num_hashes, id_col).persist()
    return pin(
        banded_pairs_from_signatures(
            sig, num_hashes, bands, threshold, id_col, bucket_hash=hash60
        ),
        sig,
    )


def portable_signatures(
    df: DataFrame,
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """The ``(id, minhash)`` signature stage of
    :func:`portable_minhash_pairs`, exposed on its own because it IS
    the dedup INDEX a deployment materializes: signatures are written
    once per corpus and reused by every later delta batch
    (:func:`incremental_minhash_pairs`), never recomputed."""
    th = df.select(
        F.col(id_col),
        F.transform(
            norm_tokens(F.col(text_col)), lambda t: hash60(t) % F.lit(1 << 31)
        ).alias("_th"),
    )
    n = F.size(F.col("_th"))
    idx = F.sequence(F.lit(0), F.greatest(n - k_shingle, F.lit(0)))
    coeffs = portable_shingle_coeffs(k_shingle)

    def shingle_hash(i: Column) -> Column:
        acc = F.lit(0).cast("bigint")
        for j, c in enumerate(coeffs):
            t = F.coalesce(F.get(F.col("_th"), i + j), F.lit(0).cast("bigint"))
            acc = acc + (t * F.lit(c)) % F.lit(MERSENNE31)
        return acc % F.lit(MERSENNE31)

    hx = th.select(id_col, F.transform(idx, shingle_hash).alias("_x"))
    return hx.select(
        id_col,
        F.array(
            *[_affine_min(F.col("_x"), a, b) for a, b in portable_hash_params(num_hashes)]
        ).alias("minhash"),
    )


def incremental_minhash_pairs(
    corpus_sigs: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    delta_sigs: DataFrame | None = None,
) -> DataFrame:
    """Dedup-INDEX maintenance: the near-dup pairs a delta batch
    introduces against an already-signed corpus — the MinHash analog of
    :func:`..scale.incremental_join_delta`'s delta algebra. Ingestion
    pipelines run this per batch; recomputing all-corpus pairs per
    batch is the history×history rescan IVM exists to avoid.

    ``corpus_sigs`` is the materialized ``(id, minhash)`` index
    (:func:`portable_signatures` output — in production a parquet table
    bucketed by band keys); ``delta`` is the new batch's raw text.
    Emitted pairs have ≥1 delta member — delta×corpus and delta×delta,
    never corpus×corpus (already known). Pairs are normalized id_a <
    id_b, so ``pairs(corpus ∪ Δ) = pairs(corpus) ∪ this`` exactly (the
    identity the oracle checks).

    Cost: signatures for |Δ| docs (map-only) + ONE (band, bucket)
    shuffle whose left side is the delta only — the corpus side
    re-shuffles its (bands × |corpus|) bucket keys but never re-hashes
    text; with the index pre-bucketed by (band, bucket) even that
    shuffle disappears into a co-located join. Callers that ALSO need
    the batch's signatures (e.g. the streaming index upsert) pass them
    precomputed via ``delta_sigs`` so the tokenize+hash pass runs once.

    Cache lifecycle: when ``delta_sigs`` is NOT passed, the
    internally-built signature frame is ``.persist()``-ed (the return
    value is lazy, so the function cannot unpersist it itself) and
    ``pin()``-ed to the result — consume under
    ``with cache.released(result):`` or call ``cache.release(result)``
    to free it scoped. Alternatives: pass ``delta_sigs`` with a
    caller-owned lifecycle (the streaming path's finally-unpersist) or
    ``spark.catalog.clearCache()`` between invocations (bench.py and
    tools/check_oracle.py do).
    """
    # persist only a frame WE created: a caller-passed delta_sigs owns
    # its own lifecycle (the streaming path persists per batch and
    # unpersists in a finally — pinning it here too would leak one
    # cached frame per micro-batch for the life of the application)
    own: list[DataFrame] = []
    if delta_sigs is None:
        delta_sigs = portable_signatures(
            delta, text_col, k_shingle, num_hashes, id_col
        ).persist()
        own.append(delta_sigs)
    all_sigs = corpus_sigs.select(id_col, "minhash").unionByName(delta_sigs)
    delta_b = banded_signature_keys(
        delta_sigs, num_hashes, bands, id_col, suffix="d"
    )
    corpus_b = banded_signature_keys(all_sigs, num_hashes, bands, id_col, suffix="c")
    return pin(_delta_band_join(delta_b, corpus_b, num_hashes, threshold), *own)


def banded_signature_keys(
    sigs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    suffix: str = "c",
) -> DataFrame:
    """Explode an ``(id, minhash)`` signature frame into its banded-LSH
    join keys: one row per (band, md5-bucket) with the id and signature
    carried along — the physical layout of the dedup INDEX. Columns are
    suffixed so both sides of a self/delta join can derive from it."""
    rows_per_band = _check_banding(num_hashes, bands)
    return sigs.select(
        F.col(id_col).alias(f"id_{suffix}"),
        F.col("minhash").alias(f"mh_{suffix}"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        hash60(
                            F.concat_ws(
                                ",",
                                F.transform(
                                    F.slice(
                                        "minhash",
                                        b * rows_per_band + 1,
                                        rows_per_band,
                                    ),
                                    lambda x: x.cast("string"),
                                ),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(f"id_{suffix}", f"mh_{suffix}", "bb.band", "bb.bucket")


def _delta_band_join(
    delta_b: DataFrame, corpus_b: DataFrame, num_hashes: int, threshold: float
) -> DataFrame:
    """Shared tail of the incremental variants: (band, bucket) equi-join
    of delta keys against corpus keys, pair normalization, estimated
    Jaccard, threshold, cross-band dedup."""
    est = (
        F.size(
            F.filter(
                F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return (
        delta_b.join(corpus_b, ["band", "bucket"])
        .filter(F.col("id_d") != F.col("id_c"))
        .select(
            F.least("id_d", "id_c").alias("id_a"),
            F.greatest("id_d", "id_c").alias("id_b"),
            F.when(F.col("id_d") < F.col("id_c"), F.col("mh_d"))
            .otherwise(F.col("mh_c"))
            .alias("mh_a"),
            F.when(F.col("id_d") < F.col("id_c"), F.col("mh_c"))
            .otherwise(F.col("mh_d"))
            .alias("mh_b"),
        )
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
        .dropDuplicates(["id_a", "id_b"])
    )


def write_banded_signature_index(
    sigs: DataFrame,
    table: str,
    num_hashes: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> None:
    """Materialize the dedup index in its JOIN layout: banded keys
    (:func:`banded_signature_keys`, suffix ``c``) written BUCKETED BY
    (band, bucket) — the write-once/probe-many deployment the
    incremental docstrings promise. Every later delta batch equi-joins
    on exactly the bucketing keys, so Spark trusts the on-disk hash
    distribution and the CORPUS SIDE JOINS WITHOUT AN EXCHANGE — only
    the (small) delta side shuffles, at any corpus size. Pinned by
    tests/test_round5_ops.py::test_indexed_incremental_corpus_side_has_no_exchange.
    """
    banded = banded_signature_keys(sigs, num_hashes, bands, id_col, suffix="c")
    banded.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, "band", "bucket"
    ).sortBy("band", "bucket").saveAsTable(table)


def incremental_minhash_pairs_indexed(
    spark,
    table: str,
    delta: DataFrame,
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    delta_sigs: DataFrame | None = None,
) -> DataFrame:
    """:func:`incremental_minhash_pairs` against a MATERIALIZED banded
    index (:func:`write_banded_signature_index`): the corpus side is
    read pre-bucketed on the join keys, so its (bands × |corpus|)
    banded rows never re-shuffle — the co-located join the plain
    variant's docstring costs out. Emits the same ≥1-delta-member pair
    set: delta×corpus from the index join plus delta×delta from a
    self-join of the batch's keys (the index does not contain the
    batch yet — its upsert happens after, exactly like the streaming
    path). Per-batch drivers pass ``delta_sigs`` precomputed and own
    its persist/unpersist lifecycle (the same escape hatch as
    :func:`incremental_minhash_pairs` — a per-call self-persist would
    pin one cached frame per batch for the life of the application);
    when it is NOT passed, the internal signature persist is
    ``pin()``-ed to the result for ``cache.released()`` scoping."""
    own: list[DataFrame] = []
    if delta_sigs is None:
        delta_sigs = portable_signatures(
            delta, text_col, k_shingle, num_hashes, id_col
        ).persist()
        own.append(delta_sigs)
    delta_d = banded_signature_keys(delta_sigs, num_hashes, bands, id_col, suffix="d")
    corpus_b = spark.table(table)
    vs_corpus = _delta_band_join(delta_d, corpus_b, num_hashes, threshold)
    # self-join side: RENAME the already-banded delta keys — a second
    # banded_signature_keys pass would re-hash every band slice
    delta_c = delta_d.select(
        F.col("id_d").alias("id_c"),
        F.col("mh_d").alias("mh_c"),
        "band",
        "bucket",
    )
    vs_self = _delta_band_join(delta_d, delta_c, num_hashes, threshold)
    return pin(
        vs_corpus.unionByName(vs_self).dropDuplicates(["id_a", "id_b"]), *own
    )


# --- simhash -----------------------------------------------------------------


def simhash_from_hashes(hashes: Column) -> Column:
    """64-bit SimHash from an array of token hashes.

    Each of the 64 bits votes +1/−1 per token hash; the signature bit
    is 1 where the vote sum is positive. Pure higher-order-function
    pipeline — no UDF, no shuffle. Pass a *materialized column* of
    token hashes: the expression references it 64 times, and a plain
    inline expression would be re-evaluated per vote.
    """

    def vote(i: int) -> Column:
        # shiftright requires a literal bit index, so unroll the 64 bits
        # in Python; the result is one wide codegen'd expression
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("bigint")
    for i in range(64):
        sig = sig + F.when(
            vote(i) > 0, F.shiftleft(F.lit(1).cast("bigint"), i)
        ).otherwise(F.lit(0).cast("bigint"))
    return sig


def simhash64(col: Column) -> Column:
    """64-bit SimHash of whitespace tokens (single-expression form).

    Correct but re-tokenizes per bit-vote if Catalyst inlines it; use
    :func:`with_simhash` (staged) in anything per-corpus.
    """
    return simhash_from_hashes(F.transform(norm_tokens(col), lambda t: F.xxhash64(t)))


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a ``simhash`` bigint column, staged so the token-hash
    array materializes once before the 64 bit-vote aggregates."""
    th = df.select(
        "*", F.transform(norm_tokens(F.col(text_col)), lambda t: F.xxhash64(t)).alias("_th")
    )
    return th.select("*", simhash_from_hashes(F.col("_th")).alias("simhash")).drop("_th")


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 16-bit signature prefixes
    (4 rotations — a pair within Hamming ≤ 3 shares at least one), then
    verify the full Hamming distance within buckets.

    The bucketing keeps the self-join keyed (no cross join); with
    ``max_hamming`` > 3 it is a recall-bounded approximation, the
    standard trade at corpus scale.
    """
    # persist: the 64-bit signature expression is wide (64 unrolled
    # aggregates); without a materialization boundary it would be
    # recomputed for all 4 chunk branches on both join sides
    sig = with_simhash(df, text_col).select(id_col, "simhash").persist()
    return pin(_simhash_band_pairs(sig, max_hamming, id_col), sig)


def portable_simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-dup pairs with the PORTABLE md5-based token hash
    (sketch.hash60) instead of xxhash64 — same votes/banding/Hamming
    pipeline as :func:`simhash_near_pairs`, but every intermediate is
    reproducible in any engine, so the WHOLE algorithm (not just row
    counts) is DuckDB-oracle-checkable. hash60 yields 60-bit values:
    bits 60–63 vote uniformly negative and stay 0 in every signature,
    leaving a 60-bit effective SimHash — identical discriminative
    behavior, chunk banding unchanged."""
    from .sketch import hash60  # noqa: PLC0415

    th = df.select(
        F.col(id_col),
        F.transform(norm_tokens(F.col(text_col)), lambda t: hash60(t)).alias("_th"),
    )
    sig = th.select(
        id_col, simhash_from_hashes(F.col("_th")).alias("simhash")
    ).persist()
    return pin(_simhash_band_pairs(sig, max_hamming, id_col), sig)


def _simhash_band_pairs(
    sig: DataFrame, max_hamming: int, id_col: str
) -> DataFrame:
    chunks = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("prefix"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.prefix")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "prefix"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "prefix"
    )
    # Hamming verify BEFORE the cross-chunk dropDuplicates (same
    # rationale as minhash_lsh_pairs: narrow, pre-filtered dedup shuffle)
    return (
        a.join(b, on=["chunk", "prefix"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


# --- exact n-gram Jaccard ----------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    k_shingle: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard over word k-shingles for given candidate (id_a, id_b)
    pairs — the verification stage behind MinHash/SimHash candidates.

    |A∩B| / |A∪B| via array_intersect / array_union on the (distinct)
    shingle arrays; the pair table is joined twice against the shingled
    docs (broadcast when small).
    """
    sh = df.select(
        F.col(id_col), norm_tokens(F.col(text_col)).alias("_toks")
    ).select(
        id_col, shingles_of_tokens(F.col("_toks"), k_shingle).alias("sh")
    ).persist()
    out = (
        pairs.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return pin(out, sh)


def span_dedup(
    df: DataFrame,
    span: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact SPAN dedup stats (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL'22 — their 50-token exact
    substring dedup, here over non-overlapping ``span``-word chunks):
    per document, how many of its chunks occur ≥2 times corpus-wide.
    Corpus curation drops or trims docs above a duplicated-span
    threshold; this operator computes the signal.

    Plan: map-only chunking (HOF slice — no Python), md5 per chunk, a
    per-digest COUNT aggregate joined back on the digest, then a
    doc-keyed re-agg. Both digest-keyed stages carry (digest, doc_id)
    only, never text. The digest key is HASH-uniform but
    occurrence-SKEWED — boilerplate chunks occur in millions of
    documents — which is exactly why the count is an aggregate (the
    hot digest's occurrences collapse map-side into partial counts)
    joined back (one row per digest on the build side — the shape
    AQE's skew-join split can fan out) rather than the r10 design's
    ``count().over(Window.partitionBy(digest))``, which funnels every
    occurrence of the hot digest through ONE window task (VERDICT
    r10). Output: ``doc_id, n_chunks, n_dup_chunks, dup_chunk_frac``.
    """
    # token array staged as a column: a HOF lambda re-evaluates its
    # captured expression tree per ELEMENT, so an unbound norm_tokens
    # would re-tokenize the doc once per chunk (see _chunk_frame)
    staged = df.select(
        F.col(id_col), norm_tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    n_chunks = F.floor((n + F.lit(span - 1)) / F.lit(span)).cast("int")
    chunks = staged.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * span + 1, span))),
            )
        ).alias("chunk_md5"),
    )
    occ = chunks.groupBy("chunk_md5", id_col).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    totals = occ.groupBy("chunk_md5").agg(
        F.sum("_cnt").alias("n_occurrences")
    )
    # shuffle_hash, not broadcast/SMJ: the totals side is one row per
    # DISTINCT digest — corpus-sized at 100 TB (never broadcastable)
    # — and both sides are already digest-keyed, so a hash build per
    # partition skips SMJ's two full sorts; AQE's skew-join split
    # still applies to SHJ
    counted = occ.join(totals.hint("shuffle_hash"), "chunk_md5")
    per_doc = counted.groupBy(id_col).agg(
        F.sum("_cnt").alias("n_chunks"),
        F.sum(
            F.when(F.col("n_occurrences") >= 2, F.col("_cnt")).otherwise(
                F.lit(0)
            )
        ).alias("n_dup_chunks"),
    )
    return per_doc.select(
        id_col,
        "n_chunks",
        "n_dup_chunks",
        (
            F.col("n_dup_chunks").cast("double") / F.col("n_chunks").cast("double")
        ).alias("dup_chunk_frac"),
    )


def _chunk_frame(
    df: DataFrame, span: int, key_col: str, text_col: str
) -> DataFrame:
    """Non-overlapping ``span``-word chunking shared by the span-dedup
    family (:func:`span_dedup_rewrite`, :func:`cross_source_duplication`,
    ``streaming.span_stream``): one row per (key, chunk position) with
    the chunk text and its md5 digest, NULL key/text rows excluded.
    Kept in ONE place because stream/batch parity and the dup-matrix
    accounting all hinge on every caller segmenting identically.

    The token array is STAGED as a column before the chunking explode
    (r14, guide §1.2 per-task work): a higher-order function's lambda
    body is an expression tree re-evaluated PER ELEMENT, so a lambda
    that captures ``split(trim(lower(text)))`` directly re-tokenizes
    the whole document once per chunk — O(len·chunks) per doc instead
    of O(len). Binding the split to an attribute makes each slice read
    the already-materialized array (measured 3.0→1.3s on the sf0.1
    chunk pass). CollapseProject keeps the stage boundary: the alias
    is non-cheap and referenced more than once."""
    staged = df.filter(
        F.col(key_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(F.col(key_col), norm_tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    n_chunks = F.floor((n + F.lit(span - 1)) / F.lit(span)).cast("int")
    return staged.select(
        F.col(key_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice(toks, i * span + 1, span)).alias(
                        "chunk"
                    ),
                ),
            )
        ).alias("c"),
    ).select(
        key_col,
        F.col("c.pos").alias("pos"),
        F.col("c.chunk").alias("chunk"),
        F.md5(F.col("c.chunk")).alias("chunk_digest"),
    )


def span_dedup_rewrite(
    df: DataFrame,
    span: int = 8,
    boilerplate_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact span dedup as an ACTION, not just a signal: REWRITE each
    document with repeated spans removed — the Lee et al. (ACL'22)
    exact-substring dedup step itself (their pipeline deletes all but
    one occurrence of every duplicated span), where :func:`span_dedup`
    only computes the per-doc statistics that decide whether to bother.
    The C4/CCNet boilerplate move composes in: a span occurring in
    ≥ ``boilerplate_df`` DISTINCT documents ("subscribe to our
    newsletter") is dropped from EVERY document, keeper included.

    Semantics (engine-uniform, fully oracle-able):

    - documents are segmented into non-overlapping ``span``-word
      chunks of their normalized tokens (identical segmentation to
      :func:`span_dedup`; the last chunk may be ragged);
    - per chunk digest, the single GLOBALLY-FIRST occurrence in
      (id, pos) order is the keeper; every other occurrence —
      including within-document repeats — is dropped as a duplicate;
    - if ``boilerplate_df`` is set, digests spanning ≥ that many
      distinct documents are dropped everywhere instead (boilerplate
      dominates the duplicate rule: such chunks count in
      ``n_boiler_dropped``, never ``n_dup_dropped``);
    - each document is reassembled from its surviving chunks in
      original order (single-space joined; '' when nothing survives).

    Rows with NULL id or text are EXCLUDED (contract, mirrored in the
    oracle). Output: ``(id, text_clean, n_chunks, n_kept,
    n_dup_dropped, n_boiler_dropped)``.

    Plan (100 TB, de-skewed r11 — VERDICT r10 "What's wrong"; hash-agg
    r14): the r10 design stacked three windows partitioned by the
    digest, and digests are HASH-uniform but occurrence-SKEWED — the
    exact chunks ``boilerplate_df`` targets ("subscribe to our
    newsletter") occur in millions of documents, so every occurrence
    of a viral chunk funneled through ONE window task with no recourse
    (AQE can split skewed join partitions, never window partitions).
    This formulation is pure partial-aggregatable AGGREGATES, and the
    keeper's chunk TEXT rides them, so no per-occurrence join-back is
    ever needed. Since r14 the chunk text is a GROUP KEY rather than
    an aggregated value: a chunk's digest determines its text, so
    grouping by (chunk, doc) produces exactly the md5-keyed groups —
    and with only count/min-of-bigint in the buffers, every aggregate
    on the hot path runs as HashAggregate. The r11–r13 form carried
    the text in ``min(string)`` / ``min(struct)`` buffers, which are
    not UnsafeRow-mutable, so BOTH corpus-sized aggregations silently
    planned as Sort + SortAggregate — two full sorts of every chunk
    row, twice each (partial+final), on the hottest path. Dropping
    the digest also removes an md5 per raw chunk row and narrows the
    shuffle key at small spans (the oracle keys on md5(chunk), which
    partitions identically to chunk absent a collision).

    - ``occ`` — per (chunk, doc): occurrence count + the doc's first
      position. Map-side combine collapses within-doc repeats before
      the one full-text shuffle (keyed (chunk, id) — a hot chunk
      spreads across its docs).
    - ``flags`` — per chunk: the global keeper ``min(id)`` (the
      keeper OCCURRENCE is then that doc's ``_minpos`` — already on
      the keeper's occ row, no join-back), the exact distinct-doc
      count (= COUNT of occ rows), and the boilerplate verdict.
      Partial min/count collapse the hot chunk map-side; the exchange
      is one narrow row per distinct chunk.
    - accounting — occ ⋈ flags on the chunk (one-row-per-chunk build
      side — the shape AQE's skew-join split CAN fan out), re-agged
      by doc: ``n_kept = Σ(keeper here)``, ``n_boiler = Σ(cnt |
      boiler)``, ``n_dup`` the remainder.
    - reassembly — the keeper's own occ row carries (minpos, chunk),
      so kept text shuffles once in the final doc-keyed re-agg. Docs
      whose every chunk dropped take '' via the coalesce.

    ONE corpus scan; full text shuffles once, kept text once; every
    aggregate HashAggregate; nothing quadratic, no single-task funnel
    on any input."""
    ch = _chunk_frame(df, span, id_col, text_col)
    occ = ch.groupBy("chunk", id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt"),
        F.min("pos").alias("_minpos"),
    )
    flags = occ.groupBy("chunk").agg(
        # min(id) IS the (id, pos)-lexicographic keeper doc: within a
        # chunk group occ holds one row per doc, so no pos tiebreak
        # can arise at the doc level; the keeper OCCURRENCE inside
        # that doc is its _minpos, read off the keeper's occ row at
        # the accounting join below
        F.min(F.col(id_col)).alias("_keeper_id"),
        # the doc count is sum(_cnt > 0 AND _minpos >= 0) — always
        # equal to count(1) since _cnt >= 1 and pos >= 0 — ON
        # PURPOSE: count(1) would let column pruning drop _cnt and
        # _minpos from this side's copy of occ, forking two DIFFERENT
        # occ subtrees that each rescan and re-chunk the corpus;
        # consuming both keeps the consumers' subtrees canonically
        # identical so exchange/stage reuse computes occ (and the
        # scan under it) exactly once
        F.sum(
            ((F.col("_cnt") > 0) & (F.col("_minpos") >= 0)).cast("bigint")
        ).alias("_docs"),
    )
    boiler = F.lit(boilerplate_df is not None) & (
        F.col("_docs") >= F.lit(boilerplate_df or 0)
    )
    # the keeper row within the keeper doc IS that doc's first
    # occurrence, so its (_minpos, chunk) is the kept chunk — no
    # per-occurrence join-back needed
    keep_row = ~boiler & (F.col(id_col) == F.col("_keeper_id"))
    # shuffle_hash: flags is one row per DISTINCT chunk (corpus-sized
    # at 100 TB, never broadcastable) and occ is already chunk-keyed —
    # a per-partition hash build skips SMJ's two full sorts, and AQE's
    # skew-join split still fans out a hot boilerplate chunk
    return (
        occ.join(flags.hint("shuffle_hash"), "chunk")
        .groupBy(id_col)
        .agg(
            F.coalesce(
                F.array_join(
                    F.transform(
                        # struct sort = (pos asc, chunk asc); pos is
                        # unique within a doc so the order is total
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    keep_row,
                                    F.struct(
                                        F.col("_minpos").alias("p"),
                                        F.col("chunk").alias("c"),
                                    ),
                                )
                            )
                        ),
                        lambda x: x.getField("c"),
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("text_clean"),
            F.sum("_cnt").alias("n_chunks"),
            F.sum(keep_row.cast("bigint")).alias("n_kept"),
            F.sum(
                F.when(boiler, F.col("_cnt")).otherwise(F.lit(0))
            ).alias("n_boiler_dropped"),
        )
        .select(
            id_col,
            "text_clean",
            "n_chunks",
            "n_kept",
            (
                F.col("n_chunks") - F.col("n_kept") - F.col("n_boiler_dropped")
            ).alias("n_dup_dropped"),
            "n_boiler_dropped",
        )
    )


def cross_source_duplication(
    df: DataFrame,
    span: int = 8,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source duplication MATRIX: for every ordered source pair
    (a < b), how many distinct ``span``-word chunks appear in BOTH —
    plus each side's distinct-chunk total and integer-micro containment
    fractions. This is the accounting a curation team runs before
    mixing overlapping crawls (two dumps of the same sites, a filtered
    subset shipped as a separate source, a mirror): ``span_dedup``
    says how duplicated the corpus is, :func:`span_dedup_rewrite`
    fixes it, THIS says which source pairs the duplication lives
    between, so you can drop or down-weight a redundant source outright
    instead of paying full dedup against it.

    Plan (100 TB): map-only chunking → distinct (digest, source) —
    ONE digest+source-keyed shuffle whose output is bounded by
    distinct (chunk, source) pairs; per-digest ``collect_set(source)``
    (bounded by |sources| — a catalog — per digest, never corpus
    rows); ordered pairs exploded MAP-SIDE from each set; and a final
    catalog²-bounded pair agg. No self-join of the corpus, nothing
    carries text past the first shuffle. Per-source totals reuse the
    same distinct frame (second agg over its lineage).

    Rows with NULL source or text are EXCLUDED (contract, mirrored in
    the oracle). Output: ``(source_a, source_b, shared_chunks,
    n_chunks_a, n_chunks_b, containment_a_micro, containment_b_micro)``
    with source_a < source_b; pairs sharing nothing are absent.
    ``containment_a_micro = (shared · 10^6) div n_chunks_a`` — the
    fraction of a's distinct chunks that also live in b, exact
    integer arithmetic in every engine. The ×10^6 bounds
    ``shared_chunks`` at ~9.2·10^12 before bigint overflow — ~7·10^13
    shared TOKENS at span 8 between one source pair, an order of
    magnitude past a 100 TB corpus; route through decimal arithmetic
    before that regime."""
    ds = (
        _chunk_frame(df, span, source_col, text_col)
        .select(F.col(source_col).alias("source"), F.col("chunk_digest").alias("digest"))
        .distinct()
    )
    totals = ds.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks")
    )
    # sorted per-digest source set (catalog-bounded), ordered pairs
    # exploded map-side: i < j preserves source_a < source_b
    sets = ds.groupBy("digest").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    pairs = (
        sets.filter(F.size("ss") >= 2)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(0), F.size("ss") - 2),
                        lambda i: F.transform(
                            F.sequence(i + 1, F.size("ss") - 1),
                            lambda j: F.struct(
                                F.col("ss")[i].alias("source_a"),
                                F.col("ss")[j].alias("source_b"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.source_a").alias("source_a"),
                 F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_chunks"))
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n_chunks").alias("n_chunks_a")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("n_chunks").alias("n_chunks_b")
    )
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_chunks",
            "n_chunks_a",
            "n_chunks_b",
            F.expr("(shared_chunks * 1000000) div n_chunks_a").alias(
                "containment_a_micro"
            ),
            F.expr("(shared_chunks * 1000000) div n_chunks_b").alias(
                "containment_b_micro"
            ),
        )
    )


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    frac_threshold: float = 0.2,
) -> DataFrame:
    """Benchmark-contamination screen: for every training document, the
    fraction of its distinct word-shingles that appear anywhere in the
    ``benchmark`` corpus (the eval set), plus a boolean flag at
    ``frac_threshold`` — the standard n-gram-overlap decontamination
    check run before pre-training (GPT-3 appendix C / PaLM §7 style).

    Plan: benchmark shingles are DISTINCT'd then broadcast (an eval set
    is KBs–MBs against a 100 TB corpus — always broadcast in practice);
    each training doc's distinct shingles LEFT-join the benchmark set
    map-side with a hit marker, and ONE per-doc aggregate counts both
    totals and hits — a separate totals branch would scan the corpus
    twice. Nothing quadratic, no shuffle of corpus text.
    """
    doc_sh = df.select(
        F.col(id_col), norm_tokens(F.col(text_col)).alias("_toks")
    ).select(
        id_col,
        F.explode(shingles_of_tokens(F.col("_toks"), k_shingle)).alias("s"),
    )
    bench_sh = (
        benchmark.select(norm_tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.explode(shingles_of_tokens(F.col("_toks"), k_shingle)).alias("s")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    marked = doc_sh.join(F.broadcast(bench_sh), "s", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_overlap"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_overlap",
            (
                F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")
            ).alias("contam_frac"),
        )
        .withColumn(
            "contaminated", (F.col("contam_frac") >= F.lit(frac_threshold))
        )
    )


# --- survivor selection (the "keep which copy?" half of dedup) ---------------


def survivor_selection(
    members: DataFrame,
    scores: DataFrame,
    cluster_col: str = "cluster_id",
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Canonical-representative choice per duplicate cluster: keep the
    highest-``score_col`` member (ties → lowest id), summarize the rest.

    Dedup pipelines end here — clustering says *what* is duplicated,
    survivorship decides *which copy ships* (quality-ranked, not
    "lowest id wins"). Input: ``members (id, cluster)`` — singletons
    included, self-clustered — and a ``(id, score)`` table.

    One join on ``id`` + one ``cluster``-keyed window: the shuffle
    carries (id, cluster, score) — never text — and cluster sizes are
    near-dup groups (small by construction), so the per-key window
    state is bounded. Returns one row per cluster:
    ``(cluster_id, keep_doc_id, keep_score, n_members,
    dropped_checksum)`` with the checksum = (Σ dropped ids) mod 2^62 —
    a portable membership fingerprint that needs no array column. The
    sum runs in decimal(38,0) and the mod folds it back to bigint, so
    hash-derived 64-bit ids near 2^63 can't overflow (bigint Σ would
    silently wrap non-ANSI and ABORT under ANSI — neither is a stable
    fingerprint across configs).
    """
    # LEFT join: a member without a score row must still count in
    # n_members / dropped_checksum (the "every doc accounted for"
    # invariant) — it just can't win unless every member is unscored.
    # Spark's desc() is NULLS LAST, so unscored members rank after any
    # scored one; any SQL oracle must say DESC NULLS LAST explicitly
    # (DuckDB defaults to NULLS FIRST on DESC).
    j = members.join(scores, id_col, "left")
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(id_col).asc()
    )
    keep_id = F.min(F.when(F.col("_rn") == 1, F.col(id_col)))
    ck = F.sum(F.col(id_col).cast("decimal(38,0)")) - keep_id.cast("decimal(38,0)")
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .groupBy(cluster_col)
        .agg(
            keep_id.alias("keep_doc_id"),
            F.min(F.when(F.col("_rn") == 1, F.col(score_col))).alias("keep_score"),
            F.count(F.lit(1)).alias("n_members"),
            F.pmod(ck, F.lit(1 << 62)).cast("bigint").alias("dropped_checksum"),
        )
    )
