"""Sequence packing / chunking (operators/packing.py) and portable
MinHash (operators/dedup.py::portable_minhash_pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_subscription_etl_spark.operators.dedup import portable_minhash_pairs
from airflow_subscription_etl_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_layout_invariants(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(5 + (i * 7) % 40))) for i in range(60)]
    out = pack_sequences(_docs(spark, rows), budget=64, n_shards=4).collect()
    assert len(out) == 60
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["seq_offset"] < 64
        assert r["shard"] == r["seq_id"] // 1_000_000
        by_shard.setdefault(r["shard"], []).append(r)
    for members in by_shard.values():
        members.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in members:
            # concat-and-split: placement is the exclusive running sum
            assert r["seq_id"] % 1_000_000 == cum // 64
            assert r["seq_offset"] == cum % 64
            cum += r["n_tokens"]


def test_pack_sequences_deterministic_under_repartition(spark):
    rows = [(i, f"a b c d e f g h {'x ' * (i % 9)}") for i in range(40)]
    df = _docs(spark, rows)
    a = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in pack_sequences(df).collect()}
    b = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df.repartition(7)).collect()
    }
    assert a == b


def test_chunk_documents_coverage_and_overlap(spark):
    text = " ".join(f"t{j}" for j in range(50))
    out = sorted(
        chunk_documents(_docs(spark, [(1, text)]), chunk_size=16, stride=12).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # 50 tokens, C=16, S=12 -> extra = ceil(34/12) = 3 -> 4 chunks
    assert [r["chunk_idx"] for r in out] == [0, 1, 2, 3]
    toks = text.split()
    for r in out:
        start = r["chunk_idx"] * 12
        expect = toks[start : start + 16]
        assert r["chunk_text"].split() == expect
        assert r["chunk_tokens"] == len(expect)
    # full coverage: last chunk reaches the final token
    assert out[-1]["chunk_idx"] * 12 + out[-1]["chunk_tokens"] == 50


def test_chunk_documents_short_doc_single_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(7, "only three tokens")]), chunk_size=32, stride=24
    ).collect()
    assert len(out) == 1
    assert out[0]["chunk_idx"] == 0
    assert out[0]["chunk_text"] == "only three tokens"
    assert out[0]["chunk_tokens"] == 3


def test_portable_minhash_finds_exact_dup_pair(spark):
    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, dup), (2, dup)] + [
        (i, f"completely different document number {i} with its own unique words {i * 3}")
        for i in range(3, 30)
    ]
    pairs = portable_minhash_pairs(_docs(spark, rows), threshold=0.5).collect()
    match = [p for p in pairs if (p["id_a"], p["id_b"]) == (1, 2)]
    assert match and match[0]["est_jaccard"] == 1.0
    # pairs are canonical (a < b) and unique
    keys = [(p["id_a"], p["id_b"]) for p in pairs]
    assert all(a < b for a, b in keys)
    assert len(keys) == len(set(keys))


def test_fast_and_portable_minhash_agree_on_strong_pairs(spark):
    from airflow_subscription_etl_spark.operators.dedup import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, base), (2, base), (3, base + " mu"), (4, "unrelated words entirely here")]
    df = _docs(spark, rows)
    fast = {(p["id_a"], p["id_b"]) for p in minhash_lsh_pairs(df, threshold=0.9).collect()}
    portable = {
        (p["id_a"], p["id_b"])
        for p in portable_minhash_pairs(df, threshold=0.9).collect()
    }
    assert (1, 2) in fast and (1, 2) in portable
