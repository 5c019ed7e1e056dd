"""Round-8 operator: materialized JL random-projection index
(similarity.write_rp_index / rp_topk_indexed) — the "project once,
probe many" deployment of the r7 one-shot prefilter (VERDICT r7 #3)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import pytest

from airflow_subscription_etl_spark.operators.similarity import (
    random_projection_topk,
    rp_index_candidates,
    rp_sign_matrix,
    rp_topk_indexed,
    write_rp_index,
)


@pytest.fixture()
def emb(spark):
    rows = [
        (i, [float(((i * 13 + d * 7) % 29) - 14) / 14.0 for d in range(16)])
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture()
def dirty(spark, emb):
    """The full r7 dirty-input zoo: NULL vector, ragged, NaN, +Inf,
    NULL element, out-of-envelope magnitude."""
    return emb.unionByName(
        spark.createDataFrame(
            [
                (994, None),
                (995, [1.0, 2.0]),
                (996, [float("nan")] * 16),
                (997, [float("inf")] * 16),
                (998, [0.1] * 15 + [None]),
                (999, [1e9] * 16),
            ],
            "vec_id long, embedding array<float>",
        )
    )


def test_indexed_probe_equals_oneshot(spark, emb, dirty, tmp_path):
    """The index just materializes the projection the one-shot operator
    computes inline, so the probe result must EQUAL
    random_projection_topk on the same corpus — including when the
    build input carries every class of invalid row (the validity
    envelope moves to build time, the exclusion set is identical).
    Checked at a tight candidate budget where any prefilter divergence
    would change the candidate set, and at covering budget where the
    result must equal brute force."""
    qv = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    path = str(tmp_path / "rp_idx")
    write_rp_index(dirty, path, dims=16, r_dims=4)
    for cand in (12, 100):
        want = random_projection_topk(
            dirty, qv, k=5, r_dims=4, candidates=cand
        ).collect()
        got = rp_topk_indexed(spark, path, qv, k=5, candidates=cand).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], cand


def test_index_stores_exact_projection_and_drops_invalid(spark, dirty, tmp_path):
    """Build-time pins: (a) every invalid row is absent from the
    materialized table, (b) rp_proj holds the EXACT integer projection
    (recomputed driver-side from the same sign matrix and quantization
    — the Arrow build kernel must be bit-identical to the reference
    arithmetic), (c) meta records (dims, r_dims)."""
    path = str(tmp_path / "rp_idx")
    write_rp_index(dirty, path, dims=16, r_dims=4)
    rows = {
        r["vec_id"]: (list(r["embedding"]), list(r["rp_proj"]))
        for r in spark.read.parquet(f"{path}/vectors").collect()
    }
    assert set(rows) == set(range(60))  # all dirty ids excluded
    signs = rp_sign_matrix(16, 4)
    for vid in (0, 7, 59):
        vec, proj = rows[vid]
        mic = [int(math.floor(float(x) * 1_000_000.0 + 0.5)) for x in vec]
        want = [sum(s * m for s, m in zip(srow, mic)) for srow in signs]
        assert proj == want, vid
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert (meta["dims"], meta["r_dims"]) == (16, 4)


def test_probe_plans_are_column_pruned_and_pushed_down(spark, emb, tmp_path):
    """Scale pins (VERDICT r7 #3), one per probe pass:

    pass 1 (prefilter): the plan must NOT re-project — no quantization
    (`floor`), no validity `forall` (both paid at build) — and its
    parquet scan must read ONLY (id, rp_proj): the wide vector column
    absent from ReadSchema means the heavy bytes are never bulk-read.
    TakeOrderedAndProject, zero Exchange.

    pass 2 (rerank): the candidate-id filter must reach the parquet
    scan as a pushed `In` filter, so row-group stats prune the vector
    read to the candidate rows; no Exchange either."""
    qv = [0.1 * d for d in range(16)]
    path = str(tmp_path / "rp_idx")
    write_rp_index(emb, path, dims=16, r_dims=4)

    pre = (
        rp_index_candidates(spark, path, qv, candidates=12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rp_proj" in pre
    assert "embedding" not in pre  # vector column pruned from the scan
    assert "floor" not in pre.lower().replace("takeordered", "")
    assert "forall" not in pre  # validity was paid at build
    assert "TakeOrderedAndProject" in pre
    assert "Exchange" not in pre

    rerank = (
        rp_topk_indexed(spark, path, qv, k=5, candidates=12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(vec_id" in rerank
    assert "rp_proj" not in rerank  # projection column pruned here
    assert "Exchange" not in rerank


def test_probe_guards_query_compatibility(spark, emb, tmp_path):
    """A probe against an incompatible query must fail loudly: wrong
    dimensionality (meta check) and out-of-envelope magnitude (the
    driver-side projection raises, same as the one-shot operators)."""
    path = str(tmp_path / "rp_idx")
    write_rp_index(emb, path, dims=16, r_dims=4)
    with pytest.raises(ValueError, match="dims"):
        rp_topk_indexed(spark, path, [0.1] * 8, k=3)
    with pytest.raises(ValueError, match="envelope"):
        rp_topk_indexed(spark, path, [1e9] * 16, k=3)


# --- gaps_and_islands (temporal.py) — the declarative islands default
# (VERDICT r7 #4) -------------------------------------------------------------


@pytest.fixture()
def bucketed(spark):
    """Chain-shaped runs with gaps, per source: A has runs {1,2,3} and
    {7,8}; B has singletons {1} and {5}; C has a duplicate-bucket tie
    (two rows in bucket 4) plus an adjacent 5."""
    rows = [
        (10, "A", 1), (11, "A", 2), (12, "A", 3),
        (13, "A", 7), (14, "A", 8),
        (20, "B", 1), (21, "B", 5),
        (30, "C", 4), (31, "C", 4), (32, "C", 5),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, b long")


def test_islands_labels_runs_and_breaks(spark, bucketed):
    from airflow_subscription_etl_spark.operators.temporal import (
        gaps_and_islands,
    )

    got = {
        r["doc_id"]: r["island"]
        for r in gaps_and_islands(
            bucketed, "source", "b", max_gap=1, order_tiebreak="doc_id"
        ).collect()
    }
    # runs share a label, breaks increment it; ties (C: two rows in
    # bucket 4) never break a run
    assert got[10] == got[11] == got[12]
    assert got[13] == got[14]
    assert got[13] != got[12]
    assert got[20] != got[21]
    assert got[30] == got[31] == got[32]


def test_islands_query_matches_cc_formulation(spark, bucketed, monkeypatch):
    """The window query and the two-star-CC query are two independent
    formulations of the same clustering — their (doc_id, cluster_id)
    output must be identical (both also satisfy SQL_DOC_CC_ISLANDS at
    the driver gate; this pins the equivalence on a shape with runs,
    gaps, ties, and singletons)."""
    from airflow_subscription_etl_spark import queries as Q

    docs = bucketed.withColumn("n_chars", (F.col("b") * 100 + 7).cast("int"))
    monkeypatch.setattr(
        Q, "_t", lambda spark_, sf_dir_, name_: docs.select(
            "doc_id", "source", "n_chars"
        )
    )
    cc = {tuple(r) for r in Q.q_doc_cc_islands(spark, "unused").collect()}
    win = {tuple(r) for r in Q.q_doc_islands_window(spark, "unused").collect()}
    assert win == cc


def test_islands_query_plan_has_single_exchange(spark, bucketed, monkeypatch):
    """Scale pin: one source-keyed Exchange total — the second window
    (min doc_id per (source, island)) must reuse the first's hash
    partitioning (subset clustering), adding only a sort."""
    from airflow_subscription_etl_spark import queries as Q

    docs = bucketed.withColumn("n_chars", (F.col("b") * 100 + 7).cast("int"))
    monkeypatch.setattr(
        Q, "_t", lambda spark_, sf_dir_, name_: docs.select(
            "doc_id", "source", "n_chars"
        )
    )
    plan = (
        Q.q_doc_islands_window(spark, "unused")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_empty_index_probe_returns_empty(spark, tmp_path):
    """A build whose every row is invalid still writes a schema-complete
    index, and probing it returns an EMPTY result frame with the result
    schema — not a crash (isin([]) is engine-ambiguous; the probe uses
    an explicit false predicate)."""
    all_bad = spark.createDataFrame(
        [(1, None), (2, [float("nan")] * 16)],
        "vec_id long, embedding array<float>",
    )
    path = str(tmp_path / "rp_idx_empty")
    write_rp_index(all_bad, path, dims=16, r_dims=4)
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    vectors = spark.read.schema(meta["vec_schema"]).parquet(f"{path}/vectors")
    assert vectors.count() == 0
    got = rp_topk_indexed(spark, path, [0.1] * 16, k=5, candidates=8)
    assert got.collect() == []
    assert [f.name for f in got.schema.fields] == ["vec_id", "cosine_sim"]


def test_shared_quantize_backstop_raises_before_cast():
    """_rp_quantize_batch is the ONE lossy step every RP kernel shares
    (one-shot twin AND the durable index build — review r8: the build
    path had its own copy WITHOUT the backstop, so a validity-filter
    drift would have been persisted as garbage). Pin that it raises on
    non-finite and out-of-envelope input BEFORE the int64 cast, and is
    exact inside the envelope."""
    import numpy as np

    from airflow_subscription_etl_spark.operators.similarity import (
        _rp_quantize_batch,
    )

    good = np.array([[0.5, -0.25], [1.0, 0.0]])
    out = _rp_quantize_batch(list(good), max_abs=8.0)
    assert out.dtype == np.int64
    assert out.tolist() == [[500_000, -250_000], [1_000_000, 0]]

    for bad in (
        [np.array([0.1, float("nan")])],
        [np.array([float("inf"), 0.1])],
        [np.array([9.0, 0.1])],  # over max_abs
    ):
        with pytest.raises(AssertionError, match="_rp_valid_rows"):
            _rp_quantize_batch(bad, max_abs=8.0)


def test_knn_join_equals_probe_loop(spark, emb, dirty, tmp_path):
    """rp_knn_join_indexed must equal a per-query rp_topk_indexed loop
    EXACTLY (same candidate sets, same cosines, same tiebreaks) — the
    batched join only shares the corpus work, it may not change any
    answer. Corpus carries the full dirty zoo (excluded at build);
    the query batch carries its own dirty rows (excluded by the same
    envelope) and valid queries absent from the corpus."""
    from airflow_subscription_etl_spark.operators.similarity import (
        rp_knn_join_indexed,
    )

    path = str(tmp_path / "rp_idx")
    write_rp_index(dirty, path, dims=16, r_dims=4)
    queries = spark.createDataFrame(
        [(0, [float(((0 * 13 + d * 7) % 29) - 14) / 14.0 for d in range(16)]),
         (7, [float(((7 * 13 + d * 7) % 29) - 14) / 14.0 for d in range(16)]),
         (333, [0.05 * d for d in range(16)]),  # not in the corpus
         (994, None),  # dirty queries: every envelope class
         (995, [1.0, 2.0]),
         (996, [float("nan")] * 16),
         (999, [1e9] * 16)],
        "query_id long, embedding array<float>",
    )
    got = rp_knn_join_indexed(
        spark, path, queries, k=5, candidates=12
    ).collect()
    assert {r["query_id"] for r in got} == {0, 7, 333}  # dirty excluded
    for qid in (0, 7, 333):
        stored = queries.filter(F.col("query_id") == qid).collect()[0][
            "embedding"
        ]
        want = rp_topk_indexed(
            spark, path, [float(x) for x in stored], k=5, candidates=12
        ).collect()
        mine = [
            (r["vec_id"], r["cosine_sim"]) for r in got
            if r["query_id"] == qid
        ]
        assert mine == [(r["vec_id"], r["cosine_sim"]) for r in want]


def test_knn_join_plan_shape(spark, emb, tmp_path):
    """Scale pins for the batched join: the prefilter stage
    (rp_knn_candidate_pairs) reads ONLY (id, rp_proj) — the heavy
    vector column absent from its scan — does not re-project (no
    floor/forall; paid at build), and shuffles exactly ONCE (the
    candidate-sized window on query_id). The join's final frame prunes
    the vector read to candidate rows via a pushed parquet In filter,
    like the single-query probe."""
    from airflow_subscription_etl_spark.operators.similarity import (
        rp_knn_candidate_pairs,
        rp_knn_join_indexed,
    )

    path = str(tmp_path / "rp_idx")
    write_rp_index(emb, path, dims=16, r_dims=4)
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    pre = (
        rp_knn_candidate_pairs(spark, path, queries, candidates=12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rp_proj" in pre
    assert "embedding" not in pre  # vector column pruned from the scan
    assert "floor" not in pre.lower()
    assert "forall" not in pre  # validity was paid at build
    assert pre.count("Exchange") == 1  # the candidate-sized window only

    final = (
        rp_knn_join_indexed(spark, path, queries, k=5, candidates=12)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(vec_id" in final
    assert "rp_proj" not in final  # projection column pruned at rerank


def test_knn_join_empty_cases(spark, emb, tmp_path):
    """Empty/all-invalid query batch and empty index both return an
    EMPTY frame with the result schema — never a crash."""
    from airflow_subscription_etl_spark.operators.similarity import (
        rp_knn_join_indexed,
    )

    path = str(tmp_path / "rp_idx")
    write_rp_index(emb, path, dims=16, r_dims=4)
    all_bad = spark.createDataFrame(
        [(1, None), (2, [float("nan")] * 16)],
        "query_id long, embedding array<float>",
    )
    got = rp_knn_join_indexed(spark, path, all_bad, k=5, candidates=12)
    assert got.collect() == []
    assert [f.name for f in got.schema.fields] == [
        "query_id", "vec_id", "cosine_sim",
    ]

    empty_idx = str(tmp_path / "rp_idx_empty")
    write_rp_index(
        spark.createDataFrame([], "vec_id long, embedding array<float>"),
        empty_idx, dims=16, r_dims=4,
    )
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = rp_knn_join_indexed(spark, empty_idx, queries, k=5, candidates=12)
    assert got.collect() == []


def test_knn_join_huge_regime_matches_pushdown_regime(spark, emb, tmp_path):
    """Above ``pushdown_limit`` the rerank switches from collect+pushed-
    In to a no-collect broadcast join over one shared vector scan
    (review r8: a 10⁵-query batch would otherwise collect ~10⁶ pairs
    and bloat the plan with a multi-million-literal In). Same semantics
    either way: forcing the huge regime (pushdown_limit=0) must return
    EXACTLY the small-regime answer, and the persisted pair frame must
    be released through the cache lifecycle."""
    from airflow_subscription_etl_spark.cache import release
    from airflow_subscription_etl_spark.operators.similarity import (
        rp_knn_join_indexed,
    )

    path = str(tmp_path / "rp_idx")
    write_rp_index(emb, path, dims=16, r_dims=4)
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    small = rp_knn_join_indexed(
        spark, path, queries, k=5, candidates=12
    ).collect()
    huge = rp_knn_join_indexed(
        spark, path, queries, k=5, candidates=12, pushdown_limit=0
    )
    assert [tuple(r) for r in huge.collect()] == [tuple(r) for r in small]
    assert release(huge) == 1  # the persisted pair frame was pinned


def test_knn_join_giant_regime_shuffles_instead_of_broadcasting(
    spark, emb, tmp_path
):
    """Past ``broadcast_limit`` a broadcast of the pair frame would
    itself collect all q·c pairs on the DRIVER to build the broadcast
    relation — the exact bloat the no-collect regime exists to avoid
    (review r8). The giant regime must drop the hint and shuffle-hash
    with the pair side as build (the plan's only broadcast is then the
    tiny query-vector frame), returning EXACTLY the same answer."""
    from airflow_subscription_etl_spark.cache import release
    from airflow_subscription_etl_spark.operators.similarity import (
        rp_knn_join_indexed,
    )

    path = str(tmp_path / "rp_idx")
    write_rp_index(emb, path, dims=16, r_dims=4)
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    small = rp_knn_join_indexed(
        spark, path, queries, k=5, candidates=12
    ).collect()
    giant = rp_knn_join_indexed(
        spark, path, queries, k=5, candidates=12,
        pushdown_limit=0, broadcast_limit=0,
    )
    plan = giant._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan  # pairs ⋈ vectors: no broadcast
    # the one remaining broadcast is the q-row query-vector frame
    assert plan.count("BroadcastHashJoin") == 1
    assert [tuple(r) for r in giant.collect()] == [tuple(r) for r in small]
    assert release(giant) == 1  # the persisted pair frame was pinned

    # clamp (review r8): in the SMALL regime the pairs are already
    # driver-local, so broadcast_limit must not push the join to a
    # pointless corpus shuffle — pushdown_limit > pair_bound with
    # broadcast_limit=0 still broadcasts both small sides
    clamped = rp_knn_join_indexed(
        spark, path, queries, k=5, candidates=12, broadcast_limit=0
    )
    cplan = clamped._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" not in cplan
    assert cplan.count("BroadcastHashJoin") == 2  # pairs + query vecs
    assert [tuple(r) for r in clamped.collect()] == [tuple(r) for r in small]
