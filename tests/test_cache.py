"""cache.pin/release/released — the caller-owned lifecycle for
operator-internal persisted frames (r6 verdict #7). The harnesses
(bench.py, check_oracle) clear the whole SQL cache between queries;
library consumers instead release per-result, scoped."""

from __future__ import annotations

import gc

import pytest

from airflow_subscription_etl_spark import cache
from airflow_subscription_etl_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_lsh_pairs,
    portable_signatures,
    simhash_near_pairs,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"the quick brown fox jumps over dog number {i % 4} again and again")
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cached_level(df) -> bool:
    return df.storageLevel.useMemory or df.storageLevel.useDisk


def test_pin_release_roundtrip(spark):
    df = spark.range(10).persist()
    result = df.selectExpr("sum(id) as s")
    cache.pin(result, df)
    assert cache.pinned_count(result) == 1
    result.collect()
    assert _cached_level(df)
    assert cache.release(result) == 1
    assert not _cached_level(df)
    # idempotent / safe on unpinned frames
    assert cache.release(result) == 0
    assert cache.release(spark.range(1)) == 0


def test_released_context_frees_on_exit_and_error(spark):
    df = spark.range(10).persist()
    result = cache.pin(df.selectExpr("count(*) as n"), df)
    with cache.released(result) as r:
        assert r is result
        r.collect()
        assert _cached_level(df)
    assert not _cached_level(df)

    df2 = spark.range(10).persist()
    result2 = cache.pin(df2.selectExpr("count(*) as n"), df2)
    with pytest.raises(RuntimeError, match="boom"):
        with cache.released(result2):
            raise RuntimeError("boom")
    assert not _cached_level(df2)


def test_registration_is_weak(spark):
    """An un-released result must drop its registration when it goes
    out of scope — pin never extends any frame's lifetime."""
    df = spark.range(5).persist()
    before = len(cache._PINS)
    result = cache.pin(df.selectExpr("count(*) as n"), df)
    assert len(cache._PINS) == before + 1
    del result
    gc.collect()
    assert len(cache._PINS) == before
    df.unpersist()


def test_adopt_copies_pins(spark):
    """adopt COPIES (does not move): releasing through either handle
    must work — a move would strip the release path from a result the
    caller keeps using after summarizing it. Double release is safe
    because unpersist() is an idempotent no-op."""
    df = spark.range(5).persist()
    a = cache.pin(df.selectExpr("count(*) as c"), df)
    b = a.selectExpr("c + 1 as d")
    assert cache.adopt(b, a) is b
    assert cache.pinned_count(a) == 1  # still releasable via a
    assert cache.pinned_count(b) == 1
    cache.release(b)
    assert not _cached_level(df)
    assert cache.release(a) == 1  # harmless second unpersist
    # adopt from an unpinned source is a no-op
    c = b.selectExpr("d")
    cache.adopt(c, b)
    assert cache.pinned_count(c) == 0


def test_adopt_self_is_noop(spark):
    """adopt(x, x) must not duplicate the pin list (ADVICE r7) — a
    duplicated entry would make pinned_count lie and release() call
    unpersist twice per frame."""
    df = spark.range(5).persist()
    r = cache.pin(df.selectExpr("count(*) as n"), df)
    assert cache.adopt(r, r) is r
    assert cache.pinned_count(r) == 1
    assert cache.release(r) == 1
    df.unpersist()


def test_kmeans_results_carry_pins(spark):
    """The review-r7 gap: kmeans_fit's Lloyd-input .cache() must be
    releasable through every public result shape — the raw assignment,
    the cluster summary (adopting wrapper), and semantic_dedup."""
    from airflow_subscription_etl_spark.operators.clustering import (
        kmeans_cluster_summary,
        kmeans_fit_predict,
        semantic_dedup,
    )

    rows = [
        (i, [float((i * 5 + d) % 7) / 7.0 for d in range(4)]) for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    r = kmeans_fit_predict(emb, k=3, iters=2)
    assert cache.pinned_count(r) == 1
    summary = kmeans_cluster_summary(r)
    assert cache.pinned_count(summary) == 1  # adopted (copied) …
    assert cache.pinned_count(r) == 1  # … r stays releasable too
    with cache.released(summary) as s:
        s.collect()
        (lloyd_input,) = cache._PINS[s]
        assert _cached_level(lloyd_input)
    assert not _cached_level(lloyd_input)

    sd = semantic_dedup(emb, k=3, iters=2)
    assert cache.pinned_count(sd) == 1
    cache.release(sd)


def test_minhash_lsh_pairs_pins_its_signature_cache(spark, docs):
    result = minhash_lsh_pairs(docs, num_hashes=8, bands=4)
    assert cache.pinned_count(result) == 1
    with cache.released(result) as pairs:
        assert pairs.count() >= 0
        (sig,) = cache._PINS[pairs]
        assert _cached_level(sig)
    assert not _cached_level(sig)


def test_simhash_near_pairs_pins(spark, docs):
    result = simhash_near_pairs(docs)
    assert cache.pinned_count(result) == 1
    cache.release(result)


def test_incremental_pairs_pin_only_internal_sigs(spark, docs):
    """A caller-passed delta_sigs owns its own lifecycle — the operator
    must NOT pin it (the streaming path unpersists per batch; a pin
    would double-release or leak)."""
    corpus = portable_signatures(docs, num_hashes=8)
    delta = docs.filter("doc_id >= 8")
    internal = incremental_minhash_pairs(corpus, delta, num_hashes=8, bands=4)
    assert cache.pinned_count(internal) == 1
    cache.release(internal)

    own_sigs = portable_signatures(delta, num_hashes=8).persist()
    passed = incremental_minhash_pairs(
        corpus, delta, num_hashes=8, bands=4, delta_sigs=own_sigs
    )
    assert cache.pinned_count(passed) == 0
    own_sigs.unpersist()
