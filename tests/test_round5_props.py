"""Property tests for the round-5 operators: containment vs a
brute-force set model, holdout-split partition law, survivor-checksum
algebra over the full bigint domain, LPA structural invariants,
incremental-MinHash delta identity on random corpora."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_subscription_etl_spark.operators.dedup import (
    containment_pairs,
    incremental_minhash_pairs,
    portable_minhash_pairs,
    portable_signatures,
    survivor_selection,
)
from airflow_subscription_etl_spark.operators.graph import label_propagation
from airflow_subscription_etl_spark.operators.sampling import temporal_holdout_split

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _doc_texts():
    return st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=10).map(" ".join),
        min_size=2,
        max_size=8,
    )


def _shingle_set(text: str, k: int = 3) -> set[str]:
    toks = text.lower().split()
    idx = range(max(len(toks) - k, 0) + 1)
    return {" ".join(toks[i : i + k]) for i in idx}


@given(texts=_doc_texts())
@_SETTINGS
def test_containment_matches_set_model(spark, texts):
    """containment_pairs ≡ brute-force over Python shingle sets for
    every pair that shares a shingle (threshold 0 keeps them all)."""
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): (
            r["containment_a"],
            r["containment_b"],
            r["jaccard"],
        )
        for r in containment_pairs(docs, threshold=0.0).collect()
    }
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = _shingle_set(texts[a]), _shingle_set(texts[b])
            shared = len(sa & sb)
            if shared:
                want[(a, b)] = (
                    shared / len(sa),
                    shared / len(sb),
                    shared / len(sa | sb),
                )
    assert set(got) == set(want)
    for pair, (ca, cb, j) in want.items():
        ga, gb, gj = got[pair]
        assert math.isclose(ga, ca) and math.isclose(gb, cb) and math.isclose(gj, j)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 27)),
        min_size=1,
        max_size=30,
    ),
    holdout=st.sampled_from([0, 1000, 5000, 10000]),
)
@_SETTINGS
def test_holdout_split_partition_law(spark, rows, holdout):
    """Every event lands in exactly one split; held-out users
    contribute to test ONLY; non-held-out users never touch test; the
    cutoff separates train/valid exactly."""
    import datetime

    cutoff = datetime.datetime(2024, 1, 15)
    data = [
        (i, u, datetime.datetime(2024, 1, 1 + d)) for i, (u, d) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id bigint, user_id bigint, ts timestamp")
    out = temporal_holdout_split(df, "user_id", "ts", cutoff, holdout_per_10k=holdout)
    rows_out = out.collect()
    assert len(rows_out) == len(data)
    by_user: dict[int, set[str]] = {}
    for r in rows_out:
        by_user.setdefault(r["user_id"], set()).add(r["split"])
        if r["split"] == "train":
            assert r["ts"] < cutoff
        elif r["split"] == "valid":
            assert r["ts"] >= cutoff
    for splits in by_user.values():
        assert splits == {"test"} or "test" not in splits


@given(
    members=st.lists(
        st.tuples(st.integers(-(2**62), 2**62), st.integers(0, 3)),
        min_size=1,
        max_size=16,
        unique_by=lambda r: r[0],
    )
)
@_SETTINGS
def test_survivor_checksum_algebra(spark, members):
    """dropped_checksum == pmod(Σ ids − keep_id, 2^62) computed in
    unbounded Python ints — across the whole (even negative) id
    domain."""
    mdf = spark.createDataFrame(members, "doc_id bigint, cluster_id bigint")
    scores = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i, _ in members],
        "doc_id bigint, quality_score double",
    )
    out = {r["cluster_id"]: r for r in survivor_selection(mdf, scores).collect()}
    by_cluster: dict[int, list[int]] = {}
    for i, c in members:
        by_cluster.setdefault(c, []).append(i)
    for c, ids in by_cluster.items():
        keep = out[c]["keep_doc_id"]
        assert keep in ids
        expect = (sum(ids) - keep) % (1 << 62)
        assert out[c]["dropped_checksum"] == expect
        assert out[c]["n_members"] == len(ids)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=20,
    ),
    rounds=st.integers(1, 4),
)
@_SETTINGS
def test_lpa_structural_invariants(spark, edges, rounds):
    """Every graph node gets exactly one community; the community id is
    always some node's id; rerunning is deterministic."""
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = label_propagation(df, rounds=rounds).collect()
    nodes = {n for e in edges for n in e}
    got_nodes = [r["node"] for r in out]
    assert sorted(got_nodes) == sorted(nodes)
    assert {r["community"] for r in out} <= nodes
    again = label_propagation(df, rounds=rounds).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@given(texts=_doc_texts(), split=st.integers(1, 7))
@_SETTINGS
def test_incremental_minhash_identity_random(spark, texts, split):
    """pairs(full) == pairs(corpus) ∪ incremental(corpus, Δ) for random
    corpora and random split points; the two parts are disjoint."""
    docs = [(i, t) for i, t in enumerate(texts)]
    split = min(split, len(docs) - 1)
    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    corpus = ddf.filter(f"doc_id < {split}")
    delta = ddf.filter(f"doc_id >= {split}")
    full = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in portable_minhash_pairs(ddf, threshold=0.2).collect()
    }
    old = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in portable_minhash_pairs(corpus, threshold=0.2).collect()
    }
    inc = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in incremental_minhash_pairs(
            portable_signatures(corpus), delta, threshold=0.2
        ).collect()
    }
    assert not set(old) & set(inc)
    assert {**old, **inc} == full
