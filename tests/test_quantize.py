"""Int8 quantization fidelity: round-trip error and top-k recall vs the
exact float path on real testdata vectors."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airflow_subscription_etl_spark.operators import similarity as S
from airflow_subscription_etl_spark.sources.io import read_star_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return read_star_table(spark, SF, "embeddings")


def _query_vec(emb):
    row = emb.orderBy("vec_id").first()
    return [float(x) for x in row["embedding"]]


def test_quantize_bounds_and_roundtrip_error(emb):
    q = S.quantize_int8(emb.limit(50))
    rows = q.select("embedding", "q", "q_scale").collect()
    for r in rows:
        assert all(-127 <= int(v) <= 127 for v in r["q"])
        recon = [int(v) * r["q_scale"] for v in r["q"]]
        for orig, rec in zip(r["embedding"], recon):
            # max-abs/127 scheme: per-element error ≤ s/2 = max|x|/254
            assert abs(float(orig) - rec) <= r["q_scale"] / 2 + 1e-12


def test_quantized_topk_recall_vs_exact(emb):
    qv = _query_vec(emb)
    exact = [r["vec_id"] for r in S.brute_force_topk(emb, qv, k=10).collect()]
    quant = [r["vec_id"] for r in S.quantized_topk(emb, qv, k=10).collect()]
    overlap = len(set(exact) & set(quant)) / 10.0
    assert overlap >= 0.8, (exact, quant)
    # and the quantized scores stay close to exact on the shared ids
    es = {r["vec_id"]: r["cosine_sim"] for r in S.brute_force_topk(emb, qv, k=10).collect()}
    qs = {r["vec_id"]: r["cosine_sim"] for r in S.quantized_topk(emb, qv, k=10).collect()}
    for vid in set(es) & set(qs):
        assert abs(es[vid] - qs[vid]) < 0.02


def test_zero_vector_is_safe(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    q = S.quantize_int8(df)
    r = q.select("q", "q_scale").first()
    assert list(r["q"]) == [0, 0, 0] and r["q_scale"] > 0
    assert not any(
        v is None for v in r["q"]
    )
