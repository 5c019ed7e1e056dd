"""Round-7 operator: Johnson–Lindenstrauss random-projection
prefilter retrieval (similarity.random_projection_topk)."""

from __future__ import annotations

import pytest

from airflow_subscription_etl_spark.operators.similarity import (
    brute_force_topk,
    random_projection_topk,
    random_projection_topk_pandas,
    rp_sign_matrix,
)


@pytest.fixture()
def emb(spark):
    rows = [
        (i, [float(((i * 13 + d * 7) % 29) - 14) / 14.0 for d in range(16)])
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sign_matrix_is_deterministic_and_pm1():
    a = rp_sign_matrix(16, 4)
    b = rp_sign_matrix(16, 4)
    assert a == b
    assert len(a) == 4 and all(len(row) == 16 for row in a)
    assert {v for row in a for v in row} <= {-1, 1}
    # rows differ (independent hash params per output dim)
    assert len({tuple(r) for r in a}) == 4


def test_rp_equals_brute_force_when_candidates_cover_corpus(spark, emb):
    """With candidates ≥ n the prefilter is a no-op: the result must
    EQUAL exact brute-force top-k, cosine values included."""
    qv = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    exact = brute_force_topk(emb, qv, k=10).collect()
    rp = random_projection_topk(emb, qv, k=10, r_dims=4, candidates=100).collect()
    assert [(r["vec_id"], r["cosine_sim"]) for r in rp] == [
        (r["vec_id"], r["cosine_sim"]) for r in exact
    ]


def test_rp_prefilter_is_deterministic_and_exact_on_survivors(spark, emb):
    """With a tight candidate budget the result is (a) stable across
    partitioning and (b) every returned cosine is the TRUE cosine (the
    rerank is exact — approximation affects only candidate recall)."""
    qv = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    r1 = random_projection_topk(emb, qv, k=5, r_dims=4, candidates=12).collect()
    r2 = random_projection_topk(
        emb.repartition(7), qv, k=5, r_dims=4, candidates=12
    ).collect()
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]
    truth = {
        r["vec_id"]: r["cosine_sim"] for r in brute_force_topk(emb, qv, k=60).collect()
    }
    for r in r1:
        assert r["cosine_sim"] == truth[r["vec_id"]]
    # scores come back best-first
    sims = [r["cosine_sim"] for r in r1]
    assert sims == sorted(sims, reverse=True)


def test_rp_pandas_twin_is_identical(spark, emb):
    """The Arrow/numpy twin must return EXACTLY the HOF reference's
    rows — the prefilter is int64-exact in both kernels (np.floor on
    identical IEEE doubles), so this is equality, not approximation.
    Checked at a tight candidate budget where any prefilter divergence
    would change the candidate set."""
    qv = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    for cand in (12, 100):
        hof = random_projection_topk(
            emb, qv, k=5, r_dims=4, candidates=cand
        ).collect()
        twin = random_projection_topk_pandas(
            emb, qv, k=5, r_dims=4, candidates=cand
        ).collect()
        assert [tuple(r) for r in twin] == [tuple(r) for r in hof]


def test_rp_pandas_plan_has_no_exchange(spark, emb):
    """Twin scale pin: one Arrow scan into TakeOrdered — no shuffle,
    no second scan / join back for the rerank."""
    qv = [0.1 * d for d in range(16)]
    plan = random_projection_topk_pandas(
        emb, qv, k=5, r_dims=4, candidates=12
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rp_dirty_rows_are_excluded_identically(spark, emb):
    """NULL, ragged, and NaN vectors are excluded up front by BOTH
    kernels (review r7: without the filter, null rows ate candidate
    slots and surfaced with None cosine in the HOF path, np.stack
    crashed the twin on ragged batches, and NaN ranked first with nan
    cosine) — the result must equal the clean-data result."""
    qv = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    dirty = emb.unionByName(
        spark.createDataFrame(
            [
                (997, None),
                (998, [1.0, 2.0]),
                (999, [float("nan")] * 16),
            ],
            "vec_id long, embedding array<float>",
        )
    )
    clean = random_projection_topk(emb, qv, k=5, r_dims=4, candidates=12).collect()
    for fn in (random_projection_topk, random_projection_topk_pandas):
        got = fn(dirty, qv, k=5, r_dims=4, candidates=12).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in clean], fn.__name__


def test_rp_out_of_envelope_handling(spark):
    """Magnitudes beyond the int64-exact envelope must never reach the
    integer fold (review r7: |x| ≳ 8.4 at 64 dims wraps
    two's-complement identically on Spark and numpy while DuckDB's
    HUGEINT doesn't — an undiagnosable mismatch). Corpus side: such
    rows are EXCLUDED by the shared validity filter, uniformly in both
    kernels and the oracle's WHERE clause. Query side: raises
    driver-side (actionable)."""
    qv_big = [50.0] * 64
    ok = spark.createDataFrame(
        [(i, [0.1 + 0.01 * i] * 64) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="envelope"):
        random_projection_topk_pandas(ok, qv_big, k=2, r_dims=8, candidates=3)
    with pytest.raises(ValueError, match="envelope"):
        random_projection_topk(ok, qv_big, k=2, r_dims=8, candidates=3)
    # out-of-envelope corpus rows (plus ±Inf and NULL-element rows —
    # the same predicate catches all of them) drop out identically
    rows = [(i, [0.1 + 0.01 * i] * 64) for i in range(6)]
    dirty = rows + [
        (97, [50.0] * 64),
        (98, [float("inf")] * 64),
        (99, [0.1] * 63 + [None]),
    ]
    dirty_df = spark.createDataFrame(
        dirty, "vec_id long, embedding array<float>"
    )
    clean_df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = [0.1] * 64
    want = random_projection_topk(clean_df, qv, k=3, r_dims=4, candidates=6).collect()
    for fn in (random_projection_topk, random_projection_topk_pandas):
        got = fn(dirty_df, qv, k=3, r_dims=4, candidates=6).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], fn.__name__


def test_rp_plan_is_map_only_takeordered(spark, emb):
    """Scale pin: the prefilter must compile to a map-side scan feeding
    TakeOrderedAndProject — no Exchange (shuffle) anywhere; both stages
    are bounded top-N merges."""
    qv = [0.1 * d for d in range(16)]
    plan = random_projection_topk(
        emb, qv, k=5, r_dims=4, candidates=12
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
