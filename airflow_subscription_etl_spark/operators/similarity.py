"""Similarity search over embedding columns (north star; SURVEY.md §7.6).

Two tiers, same API:

- **Brute-force cosine top-k** — exact baseline. Dot products via
  ``zip_with`` + ``aggregate`` (JVM higher-order functions, codegen'd;
  no Python). Cost O(n·d) per query — fine for one query against any
  corpus size (it's a map + small top-k), wrong for all-pairs.
- **LSH-bucketed ANN (random hyperplanes)** — sign-of-projection bits
  against ``n_planes`` deterministic pseudo-random hyperplanes form a
  bucket key; candidates share a bucket (multi-probe via bands).
  Replaces the O(n²) all-pairs with an equi-join on bucket keys. The
  hyperplanes derive from ``xxhash64`` per (plane, dim) — deterministic
  across runs/executors, no state to ship.

Embeddings are ``array<float>``; arithmetic is cast to double for
stable accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — zip_with + aggregate, sequential order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of the corpus against one query vector.

    The query vector is a literal array (broadcast as part of the plan);
    the scan is map-only, then a k-row global sort — the canonical
    "cheap exact ANN baseline" at any scale.
    Deterministic order: (similarity desc, id asc).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), q).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    xxhash64(plane, dim) → int64 → scale. Same value on every executor,
    no RNG state, no broadcast variable needed.
    """
    h = F.xxhash64(F.lit(plane), F.lit(dim))
    return (h.cast("double") / F.lit(float(2**63)))


def lsh_bucket(vec_col: Column, n_planes: int, dims: int) -> Column:
    """Random-hyperplane signature → one bigint bucket id.

    bit_p = [ Σ_d vec[d] · plane_p[d] ≥ 0 ] ; bucket = Σ bit_p · 2^p.
    """
    def projection(p: int):
        # closure factory (a default-arg lambda would change the visible
        # arity PySpark uses to bind higher-order-function parameters)
        def merge(acc: Column, d: Column) -> Column:
            return acc + F.element_at(vec_col, d + 1).cast("double") * (
                F.xxhash64(F.lit(p), d).cast("double") / F.lit(float(2**63))
            )

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(dims - 1)), F.lit(0.0), merge
        )

    bits = [
        F.when(
            projection(p) >= 0,
            F.shiftleft(F.lit(1).cast("bigint"), p),
        ).otherwise(F.lit(0).cast("bigint"))
        for p in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def with_lsh_bucket(
    df: DataFrame,
    n_planes: int = 12,
    dims: int = 64,
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    return df.withColumn(out, lsh_bucket(F.col(vec_col), n_planes, dims))


def ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only rows whose LSH bucket matches the
    query's bucket.

    At 100 TB, `bucket` is a cheap persisted/bucketed-by column: the
    query prunes to ~n/2^planes of the corpus before any arithmetic.
    (Single-probe; recall grows with fewer planes or multi-probe.)
    """
    import math

    # driver-side replication of the deterministic hyperplane signature
    # for the query vector would need xxhash64; instead compute the
    # query bucket with a 1-row DataFrame — same codepath as the corpus.
    spark = df.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], f"{vec_col}: array<float>")
    qb = with_lsh_bucket(qdf, n_planes, dims, vec_col).collect()[0]["bucket"]
    candidates = with_lsh_bucket(df, n_planes, dims, vec_col).filter(
        F.col("bucket") == F.lit(qb)
    )
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def all_pairs_ann(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 12,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket join + exact cosine
    verify — the embedding analog of MinHash-LSH dedup.

    One shuffle on the bucket key; cosine runs only on intra-bucket
    pairs.
    """
    b = with_lsh_bucket(df, n_planes, dims, vec_col).select(id_col, vec_col, "bucket")
    a = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "bucket"
    )
    c = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "bucket"
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_sim", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
        .dropDuplicates(["id_a", "id_b"])
    )


def centroid_per_label(
    df: DataFrame,
    dims: int = 64,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mean embedding per label — posexplode → avg per (label, dim) →
    re-assemble. Shuffles (label, dim) partial sums only (map-side
    combine), never whole vectors."""
    exploded = df.select(
        label_col, F.posexplode(F.col(vec_col)).alias("dim", "val")
    )
    avg = exploded.groupBy(label_col, "dim").agg(F.avg("val").alias("avg_val"))
    return (
        avg.groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "avg_val"))
            ).alias("pairs")
        )
        .select(
            label_col,
            F.transform("pairs", lambda s: s["avg_val"]).alias("centroid"),
        )
    )
