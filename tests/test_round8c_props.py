"""Property tests for the round-8 third-wave operators: DSIR, the NB
train/eval loop, MMR reranking, and Dunning keyness — each pinned
against a pure-Python reference model on hypothesis-generated corpora
(the strategy that keeps the oracle honest beyond the fixed-fixture
unit tests)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airflow_subscription_etl_spark.cache import release
from airflow_subscription_etl_spark.operators.sampling import dsir_sample
from airflow_subscription_etl_spark.operators.similarity import (
    brute_force_topk,
    mmr_rerank,
)
from airflow_subscription_etl_spark.operators.text import keyness_topk

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "join", "scan", "vote", "goal"]

_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join),
    min_size=2,
    max_size=12,
)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _half_up(v: float) -> int:
    # half-away-from-zero (Spark HALF_UP / DuckDB round), not Python's
    # banker's round() — exact-.5 micro values must not flake
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def _lnm(x: float) -> int:
    return _half_up(math.log(x) * 1_000_000.0)


def _dsir_model(docs, target_ids, k, buckets=256):
    from collections import Counter

    feats = {
        i: Counter(_h60(w) % buckets for w in t.split()) for i, t in docs
    }
    ct: Counter = Counter()
    cr: Counter = Counter()
    for i, c in feats.items():
        for b, n in c.items():
            cr[b] += n
            if i in target_ids:
                ct[b] += n
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    out = []
    for i, c in feats.items():
        logw = sum(
            n
            * (
                _lnm(ct.get(b, 0) + 1.0)
                - _lnm(t_tot + float(buckets))
                - _lnm(cr[b] + 1.0)
                + _lnm(r_tot + float(buckets))
            )
            for b, n in c.items()
        )
        u = (_h60(f"dsir|{i}") + 0.5) / float(1 << 60)
        g = _half_up(-math.log(-math.log(u)) * 1_000_000.0)
        out.append((i, logw, logw + g))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


@given(texts=_texts, kdraw=st.integers(1, 6), tmod=st.integers(2, 4))
@_SETTINGS
def test_dsir_matches_model_on_random_corpora(spark, texts, kdraw, tmod):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = dsir_sample(df, F.col("doc_id") % tmod == 0, k=kdraw)
    rows = [(r.doc_id, r.logw_micro, r.key_micro) for r in got.collect()]
    release(got)
    target = {i for i, _ in docs if i % tmod == 0}
    assert rows == _dsir_model(docs, target, kdraw)


def _keyness_model(rows, k):
    from collections import Counter, defaultdict

    gt: Counter = Counter()
    for g, t in rows:
        for w in t.split():
            gt[(g, w)] += 1
    ct: Counter = Counter()
    rt: Counter = Counter()
    for (g, w), a in gt.items():
        ct[w] += a
        rt[g] += a
    n = sum(ct.values())

    def cell(obs, row_tot, col_tot):
        if obs <= 0:
            return 0
        return obs * _lnm((obs * n) / (row_tot * col_tot))

    out = defaultdict(list)
    for (g, w), a in gt.items():
        if a * n <= rt[g] * ct[w]:
            continue
        g2 = 2 * (
            cell(a, rt[g], ct[w])
            + cell(ct[w] - a, n - rt[g], ct[w])
            + cell(rt[g] - a, rt[g], n - ct[w])
            + cell((n - rt[g]) - (ct[w] - a), n - rt[g], n - ct[w])
        )
        out[g].append((g2, w, a))
    want = []
    for g in out:
        for rank, (g2, w, a) in enumerate(
            sorted(out[g], key=lambda r: (-r[0], r[1]))[:k], 1
        ):
            want.append((g, w, a, g2, rank))
    return sorted(want)


@given(texts=_texts, k=st.integers(1, 4), groups=st.integers(2, 3))
@_SETTINGS
def test_keyness_matches_model_on_random_corpora(spark, texts, k, groups):
    rows = [(f"g{i % groups}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "source string, text string")
    got = sorted(
        (r.source, r.term, r.freq_in_group, r.g2_micro, r.rank)
        for r in keyness_topk(df, k=k).collect()
    )
    assert got == _keyness_model(rows, k)


# components from a coarse nonzero grid (i−20.5)/20 ∈ [−0.975, 0.975]:
# no filtering (hypothesis health), never a zero vector, and colinear
# duplicates still arise often enough to exercise the micro tiebreaks
_vecs = st.lists(
    st.lists(
        st.integers(0, 40).map(lambda i: (i - 20.5) / 20.0),
        min_size=4,
        max_size=4,
    ),
    min_size=3,
    max_size=10,
    unique_by=tuple,
)


@given(vecs=_vecs, k=st.integers(1, 3))
@_SETTINGS
def test_mmr_full_lambda_is_brute_force_on_random_vectors(spark, vecs, k):
    """λ = 1 disables the diversity penalty entirely, so MMR must equal
    exact cosine top-k (same micro tiebreaks) for ANY corpus."""
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    qv = vecs[0]
    got = mmr_rerank(df, qv, k=k, pool=len(vecs), lam_bp=10_000).collect()
    # expected order = brute force re-ranked at MMR's micro precision
    # (raw-double BF can split a micro tie that MMR deliberately
    # rounds away, e.g. colinear vectors)
    bf = brute_force_topk(df, qv, k=len(vecs)).collect()
    want = sorted(
        bf, key=lambda r: (-_half_up(r.cosine_sim * 1_000_000), r.vec_id)
    )[:k]
    assert [r.vec_id for r in got] == [r.vec_id for r in want]


@given(vecs=_vecs, lam=st.integers(0, 10_000))
@_SETTINGS
def test_mmr_output_contract_on_random_vectors(spark, vecs, lam):
    """Structural invariants at ANY λ: ranks are 1..k, ids unique and
    from the corpus, rank-1 is the pure-relevance argmax (empty penalty
    set) with score exactly λ·rel."""
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    k = min(3, len(vecs))
    got = mmr_rerank(df, vecs[0], k=k, pool=len(vecs), lam_bp=lam).collect()
    assert [r.rank for r in got] == list(range(1, k + 1))
    ids = [r.vec_id for r in got]
    assert len(set(ids)) == k and set(ids) <= {i for i, _ in rows}
    bf = brute_force_topk(df, vecs[0], k=len(vecs)).collect()
    top = sorted(
        bf, key=lambda r: (-_half_up(r.cosine_sim * 1_000_000), r.vec_id)
    )[0]
    assert got[0].vec_id == top.vec_id
    assert got[0].mmr_score == lam * got[0].rel_micro
