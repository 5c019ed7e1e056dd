"""Materialized IVF index: parity with the rebuild-per-call path and
proof that probing prunes partitions at planning time."""

from __future__ import annotations

import pytest

from airflow_subscription_etl_spark.operators import similarity as S
from airflow_subscription_etl_spark.sources.io import read_star_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return read_star_table(spark, SF, "embeddings")


def _qv(emb):
    row = emb.orderBy("vec_id").first()
    return [float(x) for x in row["embedding"]]


def test_indexed_matches_rebuild(spark, emb, tmp_path):
    qv = _qv(emb)
    path = str(tmp_path / "ivf")
    S.build_ivf_index(emb, path, n_lists=8)
    indexed = S.ivf_topk_indexed(spark, path, qv, k=10, nprobe=3).collect()
    rebuilt = S.ivf_topk(emb, qv, k=10, n_lists=8, nprobe=3).collect()
    assert [r["vec_id"] for r in indexed] == [r["vec_id"] for r in rebuilt]


def test_probe_prunes_partitions(spark, emb, tmp_path):
    qv = _qv(emb)
    path = str(tmp_path / "ivf")
    S.build_ivf_index(emb, path, n_lists=8)
    plan = S.ivf_topk_indexed(spark, path, qv, k=10, nprobe=2)._jdf.queryExecution().executedPlan().toString()
    # the list_id isin filter must reach the scan as a partition filter,
    # not a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    assert "list_id" in plan.split("PartitionFilters")[1].split("]")[0]


def test_indexed_recall_vs_exact(spark, emb, tmp_path):
    qv = _qv(emb)
    path = str(tmp_path / "ivf")
    S.build_ivf_index(emb, path, n_lists=8)
    exact = {r["vec_id"] for r in S.brute_force_topk(emb, qv, k=10).collect()}
    approx = {
        r["vec_id"]
        for r in S.ivf_topk_indexed(spark, path, qv, k=10, nprobe=4).collect()
    }
    assert len(exact & approx) / 10.0 >= 0.5
