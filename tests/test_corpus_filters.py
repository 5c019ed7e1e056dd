"""Unit semantics for the round-2 corpus-filter operators: repetition
signals, span dedup, contamination screen, bigram-LM scoring — checked
on crafted documents where every expected number is hand-computable."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from airflow_subscription_etl_spark.operators.dedup import (
    contamination_check,
    span_dedup,
)
from airflow_subscription_etl_spark.operators.text import (
    bigram_lm_scores,
    repetition_signals,
)


def test_repetition_signals_crafted(spark):
    df = spark.createDataFrame(
        [(1, "a a a b c"), (2, "x y x y x y")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert r1["n_words"] == 5
    assert r1["top_word"] == "a" and r1["top_word_frac"] == pytest.approx(3 / 5)
    assert r1["max_word_run"] == 3
    assert r1["type_token_ratio"] == pytest.approx(3 / 5)
    # bigrams of doc1: "a a","a a","a b","b c" -> 4 total, 3 distinct
    assert r1["dup_bigram_frac"] == pytest.approx(1 - 3 / 4)
    r2 = out[2]
    assert r2["max_word_run"] == 1
    # "x y","y x" alternate: 5 bigrams, 2 distinct
    assert r2["dup_bigram_frac"] == pytest.approx(1 - 2 / 5)
    # tie at count 3: lexicographic min word wins
    assert r2["top_word"] == "x"


def test_span_dedup_crafted(spark):
    chunk = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (1, chunk + " " + "u1 u2 u3 u4 u5 u6 u7 u8"),
        (2, chunk + " " + "v1 v2 v3 v4 v5 v6 v7 v8"),
        (3, "solo only words here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(df, span=8).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 1
    assert out[1]["dup_chunk_frac"] == pytest.approx(0.5)
    assert out[2]["n_dup_chunks"] == 1
    assert out[3]["n_dup_chunks"] == 0


def test_contamination_crafted(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # fully contained
            (2, "zeta eta theta iota kappa lambda"),  # disjoint
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in contamination_check(corpus, bench).collect()}
    assert out[1]["contam_frac"] == pytest.approx(1.0) and out[1]["contaminated"]
    assert out[2]["n_overlap"] == 0 and not out[2]["contaminated"]


def test_bigram_lm_crafted(spark):
    # corpus: "a b" x3 in doc1, "a c" x1 in doc2 => c(a)=4 (plus others)
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a c")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    # doc2's single bigram: p(c|a) = c(a c)/c(a); c(a)=4 across corpus
    expected = round(math.log(1 / 4) * 1e6)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["logp_micro_sum"] == expected
    # frequent continuations score higher than rare ones
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


def test_bigram_lm_partitioning_invariant(spark):
    from airflow_subscription_etl_spark.sources.io import read_star_table

    docs = read_star_table(spark, "/root/testdata/sf0.001", "documents")
    a = {r["doc_id"]: r["logp_micro_sum"] for r in bigram_lm_scores(docs).collect()}
    b = {
        r["doc_id"]: r["logp_micro_sum"]
        for r in bigram_lm_scores(docs.repartition(7)).collect()
    }
    assert a == b


def test_bpe_ish_tokens_crafted(spark):
    from airflow_subscription_etl_spark.operators.text import with_bpe_token_stats

    df = spark.createDataFrame(
        [
            (1, "don't stop"),          # don + 't + stop
            (2, "abc123 x-y!!"),        # abc + 123 + x + - + y + !!
            (3, "hello"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in with_bpe_token_stats(df).collect()}
    assert got[1]["n_bpe_tokens"] == 3 and got[1]["n_words"] == 2
    assert got[2]["n_bpe_tokens"] == 6 and got[2]["n_words"] == 2
    assert got[3]["n_bpe_tokens"] == 1 and got[3]["fertility"] == 1.0


def test_scrub_text_idempotent(spark):
    """scrub(scrub(x)) == scrub(x): redaction placeholders must not
    themselves match the redaction patterns."""
    from airflow_subscription_etl_spark.operators.text import with_scrubbed

    docs = spark.createDataFrame(
        [
            (1, "mail me a@b.com or visit https://x.y/z call 555-123-4567"),
            (2, "plain text with no pii at all"),
            (3, "<EMAIL> already scrubbed and 555-123-4567 too"),
        ],
        "doc_id int, text string",
    )
    once = with_scrubbed(docs).select(
        "doc_id", F.col("scrubbed").alias("text")
    )
    twice = with_scrubbed(once).select("doc_id", "scrubbed")
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["scrubbed"] for r in twice.collect()}
    assert a == b


def test_char_entropy_bounds(spark):
    """0 ≤ H ≤ log2(n_distinct_chars) for every document."""
    import math

    from airflow_subscription_etl_spark.operators.text import char_entropy
    from airflow_subscription_etl_spark.sources.io import read_star_table

    docs = read_star_table(spark, "/root/testdata/sf0.001", "documents")
    for r in char_entropy(docs).collect():
        assert r["entropy_bits"] >= -1e-6
        assert r["entropy_bits"] <= math.log2(max(r["n_distinct_chars"], 1)) + 1e-6


def test_tfidf_topk_rank_and_cardinality(spark):
    from airflow_subscription_etl_spark.operators.text import tfidf_topk
    from airflow_subscription_etl_spark.sources.io import read_star_table

    docs = read_star_table(spark, "/root/testdata/sf0.001", "documents")
    out = tfidf_topk(docs, k=5).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for rows in by_doc.values():
        assert len(rows) <= 5
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        # ranks follow scores: lower rank ⇒ score not smaller
        srt = sorted(rows, key=lambda r: r["rank"])
        for a, b in zip(srt, srt[1:]):
            assert a["tfidf_micro"] >= b["tfidf_micro"]
