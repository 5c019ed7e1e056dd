"""Round-8 second wave: distributed BPE merge induction
(text.bpe_merges) and the stride-interleaved training schedule
(sampling.stride_schedule). Each is pinned against an independent
in-test reference implementation — the same strategy the kmeans /
LSH oracles use — plus plan/lifecycle checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from airflow_subscription_etl_spark.cache import pinned_count, release
from airflow_subscription_etl_spark.operators.sampling import stride_schedule
from airflow_subscription_etl_spark.operators.text import bpe_encode, bpe_merges


# --- reference BPE (independent row-at-a-time implementation) ---


def _ref_bpe(texts: list[str], top_words: int, n_merges: int):
    """Classic Sennrich-style BPE on the word-frequency dict, greedy
    leftmost merge, tiebreak (count desc, pair asc)."""
    import re
    from collections import Counter

    wc = Counter(
        w for t in texts for w in re.findall(r"[a-z]+", t.lower())
    )
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words]
    dict_ = [(tuple(w), c) for w, c in top]
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for syms, c in dict_:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))

        def merge_one(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return tuple(out)

        dict_ = [(merge_one(s), c) for s, c in dict_]
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_matches_reference_on_classic_corpus(spark):
    """The Sennrich paper's running example shape: low/lower/newest/
    widest families — merge order and weighted pair counts must equal
    the row-at-a-time reference."""
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    got = [
        tuple(r)
        for r in bpe_merges(_docs(spark, [" ".join(texts)]), n_merges=5)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _ref_bpe([" ".join(texts)], 200, 5)


def test_bpe_counts_overlapping_pairs_but_merges_greedily(spark):
    """'aaa' contributes TWO (a,a) occurrences to the count, yet the
    rewrite is greedy leftmost: 'a a a' -> 'aa a' (not 'a aa', not
    'aaa')."""
    # one word 'aaa' x 10 plus filler so (a,a) wins round 1
    texts = ["aaa " * 10 + "xy xz"]
    got = [
        tuple(r)
        for r in bpe_merges(_docs(spark, texts), n_merges=2)
        .orderBy("merge_rank")
        .collect()
    ]
    ref = _ref_bpe(texts, 200, 2)
    assert got == ref
    assert got[0][1:] == ("a", "a", "aa", 20)
    # round 2 sees the greedy rewrite 'aa a': pair (aa, a) x 10
    assert got[1][1:] == ("aa", "a", "aaa", 10)


def test_bpe_merges_back_to_back_occurrences(spark):
    """'abab' must become 'ab ab' after merging (a,b) — the doubled-
    space replace must not skip the second, boundary-sharing match."""
    texts = ["abab " * 7 + "qr qs"]
    got = [
        tuple(r)
        for r in bpe_merges(_docs(spark, texts), n_merges=2)
        .orderBy("merge_rank")
        .collect()
    ]
    ref = _ref_bpe(texts, 200, 2)
    assert got == ref
    assert got[0][1:] == ("a", "b", "ab", 14)
    # both 'ab's survived the rewrite: round 2's top pair is (ab, ab)
    assert got[1][1:] == ("ab", "ab", "abab", 7)


def test_bpe_top_words_boundary_is_deterministic(spark):
    """Dict truncation orders (count desc, word asc): with top_words=2
    over three words of counts 3,2,2, the lexicographically smaller of
    the tied pair is kept."""
    texts = ["foo foo foo bar bar baz baz"]
    got = [
        tuple(r)
        for r in bpe_merges(_docs(spark, texts), top_words=2, n_merges=1)
        .collect()
    ]
    assert got == _ref_bpe(texts, 2, 1)


def test_bpe_pins_dict_cache_for_caller_release(spark):
    # one pin per materialized dict: dict0 plus each intermediate
    # rewrite (n_merges - 1 of them) — all top_words-row bounded
    out = bpe_merges(_docs(spark, ["aa ab ac"]), n_merges=2)
    assert pinned_count(out) == 2
    out.collect()
    assert release(out) == 2


# --- driver-local induction twin (the production-vocab path) ---


def test_bpe_local_twin_equals_distributed_form(spark):
    """bpe_merges_local must reproduce the distributed merge table
    bit-for-bit — same dict boundary, same tie-breaks, same greedy
    rewrite — on corpora exercising every documented subtlety
    (overlapping pair counts, back-to-back rewrites, truncated dict,
    tie-broken argmax)."""
    from airflow_subscription_etl_spark.operators.text import (
        bpe_merges_local,
    )

    corpora = [
        (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3, 200, 5),
        (["aaa"] * 10 + ["xy", "xz"], 200, 3),
        (["abab"] * 7 + ["qr", "qs"], 200, 3),
        (["foo", "foo", "foo", "bar", "bar", "baz", "baz"], 2, 2),
    ]
    for words, top, n in corpora:
        docs = _docs(spark, [" ".join(words)])
        dist = bpe_merges(docs, top_words=top, n_merges=n)
        want = [tuple(r) for r in dist.orderBy("merge_rank").collect()]
        release(dist)
        got = [
            tuple(r)
            for r in bpe_merges_local(docs, top_words=top, n_merges=n)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == want, f"local/distributed divergence on {words[:3]}…"


def test_bpe_local_twin_runs_past_the_distributed_envelope(spark):
    """The local path's reason to exist: a merge count far beyond the
    ≲10² distributed envelope completes in one collect + an in-memory
    loop, still matching the row-at-a-time reference, and stops
    emitting rows once the pair supply is exhausted."""
    from airflow_subscription_etl_spark.operators.text import (
        bpe_merges_local,
    )

    texts = [
        "internationalization internationalization modernization "
        "modernization tokenization tokenization tokenizer vocabulary "
        "vocabulary merge merge merge rank symbol symbol pair corpus"
    ]
    got = [
        tuple(r)
        for r in bpe_merges_local(_docs(spark, texts), n_merges=500)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _ref_bpe(texts, 200, 500)
    # the corpus has far fewer than 500 learnable pairs: the table
    # ends when merges dry up, ranks stay dense 1..len
    assert 0 < len(got) < 500
    assert [r[0] for r in got] == list(range(1, len(got) + 1))


# --- BPE encode ---


def _ref_encode(texts: list[str], top_words: int, n_merges: int):
    """Per-doc (n_words, n_tokens, fertility_micro) under the learned
    merges, applied in rank order with greedy leftmost rewrite — the
    row-at-a-time reference for bpe_encode."""
    import re

    merges = _ref_bpe(texts, top_words, n_merges)

    def encode(word: str) -> int:
        syms = list(word)
        for _rank, l, r, _m, _c in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    rows = {}
    for doc_id, t in enumerate(texts):
        ws = re.findall(r"[a-z]+", t.lower())
        n_words = len(ws)
        n_tokens = sum(encode(w) for w in ws)
        fert = (n_tokens * 1_000_000) // n_words if n_words else None
        rows[doc_id] = (n_words, n_tokens, fert)
    return rows


def test_bpe_encode_matches_reference_including_oov(spark):
    """top_words=2 keeps 'zq' OUT of the training dict; the learned
    merges must still apply to it (real-tokenizer OOV behavior)."""
    texts = ["low low low lower", "lower lowest", "zq low"]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility_micro"])
        for r in bpe_encode(
            _docs(spark, texts), top_words=2, n_merges=3
        ).collect()
    }
    assert got == _ref_encode(texts, 2, 3)


def test_bpe_encode_merges_greedily_per_word(spark):
    """With merge (a,a) learned, 'aaa' is 2 tokens (aa+a) and 'aaaa'
    is 2 tokens (aa+aa) — greedy leftmost, non-overlapping."""
    texts = ["aa aa aa aa aaa aaaa"]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility_micro"])
        for r in bpe_encode(
            _docs(spark, texts), top_words=200, n_merges=1
        ).collect()
    }
    assert got == _ref_encode(texts, 200, 1)
    # 6 words -> aa x4 = 4 tokens, aaa = 2, aaaa = 2 -> 8 tokens
    assert got[0] == (6, 8, (8 * 1_000_000) // 6)


def test_bpe_encode_wordless_doc_is_zero_with_null_fertility(spark):
    texts = ["low lower", "12345 !!!"]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility_micro"])
        for r in bpe_encode(_docs(spark, texts), n_merges=2).collect()
    }
    assert got[1] == (0, 0, None)
    assert got == _ref_encode(texts, 200, 2)


def test_bpe_encode_releases_learner_cache(spark):
    from airflow_subscription_etl_spark.cache import pinned_count as pc

    out = bpe_encode(_docs(spark, ["aa ab ba bb"]), n_merges=2)
    # the learner's dict cache was released inside bpe_encode; the
    # result itself owns no pins
    assert pc(out) == 0
    out.collect()


# --- stride schedule ---


@pytest.fixture()
def corpus(spark):
    """Skewed sources: one dominant, two small."""
    rows = (
        [(i, "big") for i in range(160)]
        + [(1000 + i, "mid") for i in range(40)]
        + [(2000 + i, "tiny") for i in range(10)]
    )
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_schedule_is_a_balanced_permutation(spark, corpus):
    sched = stride_schedule(corpus, n_shards=8, num_partitions=4)
    rows = sched.collect()
    n = len(rows)
    assert sorted(r["global_pos"] for r in rows) == list(range(1, n + 1))
    per_shard = (
        sched.groupBy("shard").count().orderBy("shard").collect()
    )
    counts = [r["count"] for r in per_shard]
    # (pos-1) % n_shards balances to within one row by construction
    assert max(counts) - min(counts) <= 1


def test_schedule_is_deterministic_across_runs_and_partitioning(
    spark, corpus
):
    a = {
        r["doc_id"]: (r["global_pos"], r["shard"])
        for r in stride_schedule(corpus, num_partitions=4).collect()
    }
    b = {
        r["doc_id"]: (r["global_pos"], r["shard"])
        for r in stride_schedule(
            corpus.repartition(13), num_partitions=7
        ).collect()
    }
    assert a == b


def test_schedule_interleaves_small_sources(spark, corpus):
    """Stride scheduling's service guarantee: a source with weight
    share p appears in every schedule prefix within ±1 of p·L — no
    long single-source runs. Checked via max gap between consecutive
    appearances of each source: ≈ W/w_s, bounded here by 2·W/w_s + 2."""
    sched = stride_schedule(corpus, alpha=0.5, num_partitions=4)
    rows = sched.select("source", "global_pos").collect()
    w = {
        s: math.floor(math.sqrt(n) * 1e6 + 0.5)
        for s, n in {"big": 160, "mid": 40, "tiny": 10}.items()
    }
    wsum = sum(w.values())
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["global_pos"])
    for s, pos in by_src.items():
        pos.sort()
        stride = wsum / w[s]  # expected spacing in the interleave
        gaps = [b - a for a, b in zip(pos, pos[1:])]
        assert max(gaps) <= 2 * stride + 2, (s, max(gaps), stride)


def test_schedule_alpha_zero_round_robins_equally(spark, corpus):
    """alpha=0 gives every source weight 1e6 regardless of size: the
    schedule cycles through sources in blocks of equal index i (ties
    on virtual time break by source name), so among the first
    3 positions each source appears exactly once."""
    sched = stride_schedule(corpus, alpha=0.0, num_partitions=4)
    first3 = (
        sched.orderBy("global_pos").limit(3).select("source").collect()
    )
    assert sorted(r["source"] for r in first3) == ["big", "mid", "tiny"]


def test_schedule_keeps_input_columns(spark, corpus):
    cols = set(stride_schedule(corpus).columns)
    assert cols == {"doc_id", "source", "global_pos", "shard"}
