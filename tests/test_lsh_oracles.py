"""The driver-side LSH/IVF reference implementations
(oracles/lsh_ref.py) must agree with the distributed Spark operators
EXACTLY — values included. This is the same comparison the generated
VALUES oracles give the driver, pinned in CI at sf0.001 so a drift in
either side (operator rework, tokenizer change, hash seed) is loud."""

from __future__ import annotations

from airflow_subscription_etl_spark.oracles import lsh_ref as R
from airflow_subscription_etl_spark.queries import (
    q_doc_minhash_pairs,
    q_doc_simhash_pairs,
    q_emb_ivf_topk,
)
from tests.conftest import SF_DIR


def test_minhash_reference_matches_spark(spark):
    got = sorted(tuple(r) for r in q_doc_minhash_pairs(spark, SF_DIR).collect())
    want = sorted(R.minhash_pairs_reference(SF_DIR))
    assert got == want
    assert len(got) > 0  # non-vacuous: threshold must catch real pairs


def test_simhash_reference_matches_spark(spark):
    got = sorted(tuple(r) for r in q_doc_simhash_pairs(spark, SF_DIR).collect())
    want = sorted(R.simhash_pairs_reference(SF_DIR))
    assert got == want
    assert len(got) > 0


def test_ivf_reference_matches_spark(spark):
    got = [tuple(r) for r in q_emb_ivf_topk(spark, SF_DIR).collect()]
    want = R.ivf_topk_reference(SF_DIR)
    assert got == want  # ordered: (cosine desc, vec_id asc) top-20


def test_generated_sql_is_cached_and_non_null(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
    a = R.sql_doc_minhash_pairs()
    b = R.sql_doc_minhash_pairs()
    assert a is b  # per-sf_dir cache: the reference runs once
    assert a is not None and "VALUES" in a
    assert R.sql_doc_simhash_pairs() is not None
    assert R.sql_emb_ivf_topk() is not None


def test_simhash_null_text_matches_spark(spark, tmp_path):
    """NULL-text docs carry signature 0 in Spark (per-bit otherwise(0)
    over a NULL vote) and so pair with each other at hamming 0 — the
    reference must emit them too, not skip nulls."""
    import pyspark.sql.functions as F

    from airflow_subscription_etl_spark.operators.dedup import simhash_near_pairs

    rows = [
        (1, "some real text content here"),
        (2, None),
        (3, None),
        (4, "entirely different words in this document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = sorted(
        tuple(r) for r in simhash_near_pairs(docs, max_hamming=16).collect()
    )
    want = sorted(R.simhash_pairs_reference(sf_dir, max_hamming=16))
    assert got == want
    assert (2, 3, 0) in want  # the null-null hamming-0 pair exists
    # and Spark really does assign signature 0 to null text
    from airflow_subscription_etl_spark.operators.dedup import with_simhash

    sig = {r["doc_id"]: r["simhash"] for r in with_simhash(docs).collect()}
    assert sig[2] == 0 and sig[3] == 0


def test_minhash_null_text_matches_spark(spark, tmp_path):
    """NULL-text docs get IDENTICAL non-null MinHash signatures in
    Spark (xxhash64 over all-NULL shingle args returns the seed), so
    they pair at est_jaccard 1.0 — the reference must emit them, not
    skip nulls."""
    from airflow_subscription_etl_spark.operators.dedup import minhash_lsh_pairs

    rows = [
        (1, None),
        (2, None),
        (3, "alpha beta gamma delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    got = sorted(tuple(r) for r in minhash_lsh_pairs(docs, threshold=0.4).collect())
    want = sorted(R.minhash_pairs_reference(sf_dir))
    assert got == want
    assert (1, 2, 1.0) in want  # the null-null est=1.0 pair exists
