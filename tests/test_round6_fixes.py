"""Round-6 fixes: the three ADVICE r5 findings. Each test pins the
failure mode the advice described, so a regression re-introducing it
is loud."""

from __future__ import annotations

import numpy as np
import pytest

from airflow_subscription_etl_spark.operators.clustering import (
    _round_like_spark,
    assign_clusters,
    assign_clusters_pandas,
)
from airflow_subscription_etl_spark.operators.scale import bitmap_distinct

# --- bitmap_distinct: NULL group VALUES (ADVICE scale.py:551) ---------------


def test_bitmap_distinct_null_group_value(spark):
    """A group whose group-column VALUE is NULL is a real group under
    GROUP BY; the re-attach join must be null-SAFE or that group
    reports 0 distinct keys even when it has non-null keys."""
    rows = [(None, 10), (None, 20), (None, 10), ("a", 1), ("b", None)]
    df = spark.createDataFrame(rows, "g string, k int")
    out = {r["g"]: r for r in bitmap_distinct(df, "k", ["g"]).collect()}
    assert out[None]["n_distinct"] == 2  # was 0 before the null-safe fix
    assert out[None]["n_buckets"] >= 1
    assert out["a"]["n_distinct"] == 1
    assert out["b"]["n_distinct"] == 0 and out["b"]["n_buckets"] == 0


def test_bitmap_distinct_null_group_multi_col(spark):
    """Composite group keys: every NULL/non-NULL combination must
    survive the null-safe re-attach with its own counts."""
    rows = [
        (None, "x", 1),
        (None, "x", 2),
        (None, None, 5),
        ("g", None, None),
        ("g", "x", 7),
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 string, k int")
    out = {
        (r["g1"], r["g2"]): r["n_distinct"]
        for r in bitmap_distinct(df, "k", ["g1", "g2"]).collect()
    }
    assert out == {
        (None, "x"): 2,
        (None, None): 1,
        ("g", None): 0,
        ("g", "x"): 1,
    }


def test_bitmap_distinct_matches_count_distinct_with_null_groups(spark):
    """Randomized cross-check vs Spark's own GROUP BY + COUNT(DISTINCT)
    on a frame where both group values and keys contain NULLs."""
    import pyspark.sql.functions as F

    df = (
        spark.range(500)
        .select(
            F.when(F.col("id") % 7 != 0, (F.col("id") % 5).cast("string")).alias("g"),
            F.when(F.col("id") % 11 != 0, F.col("id") % 37).alias("k"),
        )
    )
    got = {
        r["g"]: r["n_distinct"]
        for r in bitmap_distinct(df, "k", ["g"]).collect()
    }
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    assert got == want


# --- pandas twin HALF_UP boundary (ADVICE clustering.py:148) ----------------


def test_round_like_spark_boundary_class():
    """The 0.49999999999999994 class: fl(v+0.5) lands on the next
    integer while BigDecimal(Double.toString) HALF_UP stays below —
    the repaired path must side with Spark."""
    v = 0.49999999999999994  # largest double < 0.5
    assert np.floor(v + 0.5) == 1.0  # the bulk path alone would say 1
    raw = np.array([[v, 2.5, 0.5, 1.4999999999999998, 3.0, 0.123]])
    got = _round_like_spark(raw)
    # Spark F.round: 0 (decimal .4999... < .5), 3 (HALF_UP), 1, 1, 3, 0
    assert got.tolist() == [[0, 3, 1, 1, 3, 0]]


def test_round_like_spark_matches_decimal_reference_randomized():
    """Dense fuzz: every element must equal the exact Decimal replica,
    including values salted onto the ±5e-7 suspect band."""
    from airflow_subscription_etl_spark.oracles.lsh_ref import _round_half_up_spark

    rng = np.random.RandomState(42)
    vals = np.concatenate(
        [
            rng.uniform(0, 50, 500),
            np.arange(0, 20) + 0.5,  # exact .5 ties
            np.arange(0, 20) + 0.4999999,  # inside the suspect band
            np.arange(0, 20) + 0.5000001,
            np.array([0.49999999999999994, 1.4999999999999998]),
        ]
    )
    got = _round_like_spark(vals)
    want = np.array([_round_half_up_spark(float(v)) for v in vals])
    assert (got == want).all()


def test_assign_clusters_pandas_bit_identical_near_ties(spark):
    """End-to-end parity Spark HOF vs numpy twin on vectors engineered
    so squared-distance micros land as close to the .5 rounding grid
    as the expression chain allows."""
    dims = 4
    # distances whose (d²·1e6) sit near n+0.5 for small n
    import math

    cents = [[0.0] * dims, [1.0] * dims]
    rows = []
    for i, n in enumerate(range(8)):
        d = math.sqrt((n + 0.5) * 1e-6)
        rows.append((i, [d, -d, d, 0.25]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    a = sorted(map(tuple, assign_clusters(df, cents).collect()))
    b = sorted(map(tuple, assign_clusters_pandas(df, cents).collect()))
    assert a == b


# --- persist lifecycle (ADVICE similarity.py:350) ---------------------------


def test_harnesses_clear_sql_cache():
    """bench.py and tools/check_oracle.py must clear the SQL cache
    between queries — per-call .persist() inside operators (LSH
    signatures, IVF residuals) accumulates across multi-query sweeps
    in one shared session otherwise."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    for harness in ("bench.py", "tools/check_oracle.py"):
        text = (root / harness).read_text()
        assert "clearCache()" in text, f"{harness} lost its cache clearing"


@pytest.mark.usefixtures("spark")
def test_hard_negative_docstring_documents_cache_lifecycle():
    from airflow_subscription_etl_spark.operators import dedup, similarity

    for fn in (
        similarity.hard_negative_mining,
        similarity.ivfpq_topk,
        dedup.incremental_minhash_pairs,
    ):
        assert "Cache lifecycle" in fn.__doc__
