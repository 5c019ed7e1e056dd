"""Round-8 third wave: DSIR importance resampling
(sampling.dsir_sample), the in-engine Naive Bayes train/eval loop
(text.nb_classifier_eval), and MMR diversified reranking
(similarity.mmr_rerank). Each is pinned against an independent
in-test reference (the kmeans/LSH oracle strategy) plus contract and
degenerate-input checks."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from airflow_subscription_etl_spark.cache import released
from airflow_subscription_etl_spark.operators.sampling import dsir_sample
from airflow_subscription_etl_spark.operators.similarity import (
    brute_force_topk,
    mmr_rerank,
)
from airflow_subscription_etl_spark.operators.text import (
    feature_hashing,
    keyness_topk,
    nb_classifier_eval,
)

# --- shared reference helpers (independent row-at-a-time math) ---


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _half_up(v: float) -> int:
    # half-AWAY-FROM-ZERO like both engines' round() (Spark HALF_UP,
    # DuckDB round); Python's built-in round() is banker's half-even
    # and would flake on an exact-.5 micro value
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def _ln_micro(x: float) -> int:
    return _half_up(math.log(x) * 1_000_000.0)


def _ref_dsir(docs, target_ids, k, buckets=256):
    """docs: list[(id, text)]; returns [(id, logw, key)] desc."""
    from collections import Counter

    feats = {}
    for i, t in docs:
        c = Counter(
            _h60(w) % buckets for w in t.strip().split() or [""]
        )
        feats[i] = c
    ct: Counter = Counter()
    cr: Counter = Counter()
    for i, c in feats.items():
        for b, n in c.items():
            cr[b] += n
            if i in target_ids:
                ct[b] += n
    t_tot, r_tot = sum(ct.values()), sum(cr.values())
    lam = {
        b: _ln_micro(ct.get(b, 0) + 1.0)
        - _ln_micro(t_tot + float(buckets))
        - _ln_micro(cr[b] + 1.0)
        + _ln_micro(r_tot + float(buckets))
        for b in cr
    }
    out = []
    for i, c in feats.items():
        logw = sum(n * lam[b] for b, n in c.items())
        u = (_h60(f"dsir|{i}") + 0.5) / float(1 << 60)
        g = _half_up(-math.log(-math.log(u)) * 1_000_000.0)
        out.append((i, logw, logw + g))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


DOCS = [
    (1, "spark shuffle join broadcast join spark"),
    (2, "gradient descent loss epoch gradient"),
    (3, "spark partition scan filter spark spark"),
    (4, "loss epoch batch gradient descent descent"),
    (5, "join scan shuffle partition broadcast"),
    (6, "epoch epoch loss batch batch gradient"),
    (7, "spark scan spark filter shuffle"),
    (8, "descent loss gradient epoch batch"),
]


def test_dsir_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    with released(dsir_sample(df, F.col("doc_id") % 2 == 1, k=4)) as s:
        got = s.collect()
    target = {i for i, _ in DOCS if i % 2 == 1}
    want = _ref_dsir(DOCS, target, 4)
    assert [(r.doc_id, r.logw_micro, r.key_micro) for r in got] == want


def test_dsir_prefers_target_like_docs(spark):
    """Odd docs are 'spark' vocabulary, even docs are 'ML' vocabulary:
    with target = odd docs, every odd doc must out-weigh every even
    doc on logw (the importance weight, before Gumbel noise)."""
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    with released(dsir_sample(df, F.col("doc_id") % 2 == 1, k=len(DOCS))) as w:
        rows = {r.doc_id: r.logw_micro for r in w.collect()}
    assert min(rows[i] for i in (1, 3, 5, 7)) > max(
        rows[i] for i in (2, 4, 6, 8)
    )


def test_dsir_all_target_degenerates_to_uniform_gumbel(spark):
    """target == whole corpus → p == q → λ ≡ 0 → logw ≡ 0: the sample
    is a uniform draw (pure Gumbel keys)."""
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    with released(dsir_sample(df, F.lit(True), k=3)) as s:
        got = s.collect()
    assert all(r.logw_micro == 0 for r in got)
    assert len(got) == 3


def test_dsir_partitioning_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    with released(dsir_sample(df.coalesce(1), F.col("doc_id") <= 4, k=5)) as sa:
        a = sa.collect()
    with released(dsir_sample(df.repartition(7), F.col("doc_id") <= 4, k=5)) as sb:
        b = sb.collect()
    assert a == b


def test_dsir_rejects_nonpositive_k(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_sample(df, F.lit(True), k=0)


def test_feature_hashing_carry_cols_ride_the_groupby(spark):
    df = spark.createDataFrame(
        [(1, "a b a", "x"), (2, "b", "y")], "doc_id bigint, text string, lab string"
    )
    out = feature_hashing(df, carry_cols=["lab"]).collect()
    assert {r.lab for r in out} == {"x", "y"}
    # carried column is functionally dependent on doc_id: row count
    # identical to the uncarried call
    base = feature_hashing(df).collect()
    assert len(out) == len(base)


# --- Naive Bayes train/eval ---


def test_nb_separable_classes_score_diagonal(spark):
    """Two classes with disjoint vocabulary: every test doc must be
    classified correctly → the confusion matrix is purely diagonal."""
    rows = []
    for i in range(40):
        lab = "a" if i % 2 == 0 else "b"
        text = ("apple pie apple " if lab == "a" else "rust iron rust ") + f"w{i}"
        rows.append((i, text, lab))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    with released(nb_classifier_eval(df, label_col="lang")) as c:
        conf = c.collect()
    assert conf, "empty confusion matrix — test split produced no docs"
    assert all(r.true_label == r.pred_label for r in conf)


def test_nb_matches_reference_on_small_frame(spark):
    """Full integer replay of the train→score→argmax loop."""
    from collections import Counter, defaultdict

    rows = [
        (1, "dog cat dog", "pets"),
        (2, "cat cat fish", "pets"),
        (3, "stock bond stock", "fin"),
        (4, "bond bond trade", "fin"),
        (5, "dog fish trade", "pets"),
        (6, "stock trade trade", "fin"),
        (7, "dog stock cat", "pets"),
        (8, "bond trade fish", "fin"),
    ]
    B, train_bp = 256, 8000
    is_train = {
        i: (_h60(t) % 10_000) < train_bp for i, t, _ in rows
    }
    feats = {i: Counter(_h60(w) % B for w in t.split()) for i, t, _ in rows}
    lab = {i: c for i, _, c in rows}
    cb: dict = defaultdict(Counter)
    prior: Counter = Counter()
    for i, t, c in rows:
        if is_train[i]:
            prior[c] += 1
            cb[c].update(feats[i])
    n_docs, n_classes = sum(prior.values()), len(prior)
    want: Counter = Counter()
    for i, t, c in rows:
        if is_train[i]:
            continue
        best = None
        for cand in prior:
            tok_c = sum(cb[cand].values())
            score = (
                _ln_micro(prior[cand] + 1.0)
                - _ln_micro(float(n_docs + n_classes))
            )
            for b, n in feats[i].items():
                score += n * (
                    _ln_micro(cb[cand].get(b, 0) + 1.0)
                    - _ln_micro(tok_c + float(B))
                )
            key = (score, [-ord(ch) for ch in cand])
            if best is None or key > best[0]:
                best = (key, cand)
        want[(c, best[1])] += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    with released(nb_classifier_eval(df, label_col="lang")) as c:
        got = Counter(
            {(r.true_label, r.pred_label): r.n_docs for r in c.collect()}
        )
    assert got == want
    assert sum(got.values()) == sum(1 for i in is_train if not is_train[i])


def test_nb_unseen_true_class_still_scored(spark):
    """A test doc whose true label never appears in train must still be
    classified (among train classes) and show up as an off-diagonal
    confusion row — labels are assigned AFTER computing the content
    split, so 'ghost' exists only in the test slice by construction."""
    texts = [f"alpha beta w{i}" for i in range(40)]
    split = {t: (_h60(t) % 10_000) < 8000 for t in texts}
    assert any(not v for v in split.values()), "fixture: need a test doc"
    rows = [
        (i, t, "a" if split[t] else "ghost") for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    with released(nb_classifier_eval(df, label_col="lang")) as c:
        conf = c.collect()
    assert conf
    # every test doc's true label is ghost; every prediction must be a
    # TRAIN class — i.e. 'a' — so the matrix is exactly one row
    assert [(r.true_label, r.pred_label) for r in conf] == [("ghost", "a")]


# --- saved NB model (train-once / score-many) ---


def test_nb_saved_model_scores_new_corpus(spark, tmp_path):
    """write_nb_model + nb_score_indexed must classify a corpus the
    model was never fit on, prefer the matching vocabulary class, and
    agree with nb_classifier_eval's integer scoring math (checked via
    the separable-vocab construction: disjoint class vocabularies ⇒
    every prediction matches the vocabulary used)."""
    from airflow_subscription_etl_spark.operators.text import (
        nb_score_indexed,
        write_nb_model,
    )

    train = []
    for i in range(40):
        lab = "pets" if i % 2 == 0 else "fin"
        text = ("dog cat fish " if lab == "pets" else "stock bond trade ") + f"w{i}"
        train.append((i, text, lab))
    tdf = spark.createDataFrame(train, "doc_id bigint, text string, lang string")
    path = str(tmp_path / "nb")
    write_nb_model(tdf, path, label_col="lang")

    fresh = spark.createDataFrame(
        [
            (100, "dog dog cat"),
            (101, "bond stock stock"),
            (102, "fish cat dog dog"),
            (103, ""),  # wordless doc still scored (smoothed floor)
            (104, None),  # NULL text coalesces to '' — scored, not dropped
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in nb_score_indexed(spark, path, fresh).collect()}
    assert len(got) == 5
    assert got[100].pred_label == "pets"
    assert got[101].pred_label == "fin"
    assert got[102].pred_label == "pets"
    assert got[103].pred_label in ("pets", "fin")  # prior + floor decides
    # NULL text ≡ empty text: identical smoothed-floor score + label
    assert (got[104].pred_label, got[104].score_micro) == (
        got[103].pred_label,
        got[103].score_micro,
    )
    # model artifacts are catalog-sized: classes x buckets and classes
    assert spark.read.parquet(f"{path}/model").count() == 2 * 256
    assert spark.read.parquet(f"{path}/prior").count() == 2


# --- in-engine retrieval evaluation ---


def test_rp_recall_is_perfect_when_prefilter_cannot_prune(spark):
    """candidates ≥ corpus makes the RP prefilter a no-op, so the
    approximate set EQUALS exact top-k and the report must read
    recall 1.0 exactly (10^6 micro) — the eval harness's own
    correctness anchor."""
    from airflow_subscription_etl_spark.operators.similarity import (
        rp_recall_report,
    )

    rows = [
        (i, [float(((i * 13 + d * 7) % 29) - 14) / 14.0 for d in range(16)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = rp_recall_report(
        df, rows[0][1], k=5, r_dims=4, candidates=30
    ).collect()
    assert got == [(5, 5, 1_000_000)] or (
        got[0].k == 5 and got[0].n_hits == 5 and got[0].recall_micro == 1_000_000
    )


def test_rp_recall_bounded_and_consistent(spark):
    """With a tight candidate budget recall can drop below 1 but the
    report stays internally consistent: 0 ≤ n_hits ≤ k and
    recall_micro = n_hits·10^6 div k."""
    from airflow_subscription_etl_spark.operators.similarity import (
        rp_recall_report,
    )

    rows = [
        (i, [float(((i * 31 + d * 11) % 37) - 18) / 18.0 for d in range(16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = rp_recall_report(df, rows[0][1], k=10, r_dims=2, candidates=12).collect()[0]
    assert 0 <= r.n_hits <= 10
    assert r.recall_micro == (r.n_hits * 1_000_000) // 10


# --- saved BPE vocab (train-once / apply-many) ---


def test_bpe_saved_vocab_encodes_new_corpus_like_inline(spark, tmp_path):
    """write_bpe_vocab + bpe_encode_indexed must (a) reproduce
    bpe_encode exactly on the training corpus, and (b) encode a corpus
    the vocab was NEVER fit on — every word OOV — identically to
    applying the same rule list inline (the shipped-tokenizer story)."""
    from airflow_subscription_etl_spark.operators.text import (
        _encode_with_merges,
        bpe_encode,
        bpe_encode_indexed,
        bpe_merges,
        write_bpe_vocab,
    )
    from airflow_subscription_etl_spark.cache import released

    train = spark.createDataFrame(
        [(i, "low lower lowest newer newest wide wider") for i in range(4)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "vocab")
    write_bpe_vocab(train, path, top_words=50, n_merges=3)

    inline = sorted(
        map(tuple, bpe_encode(train, top_words=50, n_merges=3).collect())
    )
    indexed = sorted(
        map(tuple, bpe_encode_indexed(spark, path, train).collect())
    )
    assert indexed == inline

    fresh = spark.createDataFrame(
        [(1, "slower widest night"), (2, ""), (3, "lo we r")],
        "doc_id bigint, text string",
    )
    m = bpe_merges(train, top_words=50, n_merges=3)
    with released(m):
        rules = [
            (r["left_sym"], r["right_sym"])
            for r in m.orderBy("merge_rank").collect()
        ]
    want = sorted(map(tuple, _encode_with_merges(fresh, rules).collect()))
    got = sorted(map(tuple, bpe_encode_indexed(spark, path, fresh).collect()))
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[2][1] == 0 and by_id[2][3] is None  # wordless doc


# --- Dunning keyness ---


def _ref_keyness(rows, k=5):
    """rows: list[(group, text)]; Dunning G² over whitespace tokens,
    integer micro arithmetic mirroring the operator."""
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
        return obs * _half_up(math.log((obs * n) / (row_tot * col_tot)) * 1e6)

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


KEY_ROWS = [
    ("news", "election vote poll vote election result"),
    ("news", "vote poll turnout election"),
    ("sport", "goal match goal score match team"),
    ("sport", "team goal score match"),
    ("mixed", "vote goal result score team poll"),
]


def test_keyness_matches_reference(spark):
    df = spark.createDataFrame(KEY_ROWS, "source string, text string")
    got = sorted(
        (r.source, r.term, r.freq_in_group, r.g2_micro, r.rank)
        for r in keyness_topk(df, k=5).collect()
    )
    assert got == _ref_keyness(KEY_ROWS, k=5)


def test_keyness_exclusive_term_tops_its_group(spark):
    """'election' appears ONLY in news; it must be news's #1 key term,
    and no group may surface a term it under-uses vs the corpus."""
    df = spark.createDataFrame(KEY_ROWS, "source string, text string")
    got = keyness_topk(df, k=5).collect()
    news = [r for r in got if r.source == "news"]
    assert news[0].term == "election" and news[0].rank == 1
    # over-use filter: every surfaced term is over-represented
    from collections import Counter

    ct: Counter = Counter()
    rt: Counter = Counter()
    for g, t in KEY_ROWS:
        for w in t.split():
            ct[w] += 1
            rt[g] += 1
    n = sum(ct.values())
    for r in got:
        assert r.freq_in_group * n > rt[r.source] * ct[r.term]


def test_keyness_partitioning_invariant(spark):
    df = spark.createDataFrame(KEY_ROWS, "source string, text string")
    a = keyness_topk(df.coalesce(1), k=3).collect()
    b = keyness_topk(df.repartition(7), k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# --- MMR rerank ---


def _unit(vs):
    n = math.sqrt(sum(v * v for v in vs))
    return [v / n for v in vs]


EMB = [
    (1, _unit([0.95, 0.312, 0.0])),  # rel ≈ .950 — cluster
    (2, _unit([0.95, 0.311, 0.01])),  # rel ≈ .9503 — cluster, top hit
    (3, _unit([0.949, 0.315, 0.0])),  # rel ≈ .949 — cluster
    (4, _unit([0.8, -0.6, 0.0])),  # rel .8, far from the cluster
    (5, _unit([0.7, 0.0, -0.714])),  # rel ≈ .7, far from both
    (6, _unit([-1.0, 0.0, 0.0])),  # anti-relevant
]
QV = [1.0, 0.0, 0.0]


def test_mmr_full_lambda_equals_brute_force(spark):
    df = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    got = mmr_rerank(df, QV, k=4, pool=6, lam_bp=10_000).collect()
    bf = brute_force_topk(df, QV, k=4).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in bf]
    assert [r.rank for r in got] == [1, 2, 3, 4]


def test_mmr_diversifies_near_duplicates(spark):
    """ids 1/2/3 are one tight cluster of top hits; with diversity on,
    ranks 2–3 must leave that cluster (4 then 5 — each farther from
    everything already picked than another cluster copy would be),
    instead of returning three near-duplicates like pure top-k does."""
    df = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    bf = [r.vec_id for r in brute_force_topk(df, QV, k=3).collect()]
    assert set(bf) == {1, 2, 3}  # pure relevance returns the whole cluster
    got = mmr_rerank(df, QV, k=3, pool=6, lam_bp=5_000).collect()
    assert got[0].vec_id == 2  # pure relevance first pick (highest cos)
    assert [r.vec_id for r in got[1:]] == [4, 5]


def test_mmr_k_equals_pool_returns_everything_ranked(spark):
    df = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    got = mmr_rerank(df, QV, k=6, pool=6, lam_bp=7_000).collect()
    assert sorted(r.vec_id for r in got) == [1, 2, 3, 4, 5, 6]
    assert [r.rank for r in got] == [1, 2, 3, 4, 5, 6]


def test_mmr_first_rank_score_is_pure_relevance(spark):
    df = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    got = mmr_rerank(df, QV, k=2, pool=4, lam_bp=7_000).collect()
    assert got[0].mmr_score == 7_000 * got[0].rel_micro


def test_mmr_excludes_dirty_rows_instead_of_aborting(spark):
    """NULL / ragged / NaN / Inf / all-zero vectors must be EXCLUDED
    up front (engine-uniform validity, the RP discipline) — under
    Spark 4 ANSI a NaN cosine would otherwise abort the whole query
    at the micro cast."""
    dirty = EMB + [
        (90, None),
        (91, [1.0, 2.0]),  # ragged
        (92, [float("nan"), 0.0, 1.0]),
        (93, [float("inf"), 0.0, 1.0]),
        (94, [0.0, 0.0, 0.0]),
        (None, [0.5, 0.5, 0.5]),  # NULL id: non-nullable result schema
    ]
    df = spark.createDataFrame(
        dirty, "vec_id bigint, embedding array<double>"
    )
    clean = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    got = mmr_rerank(df, QV, k=4, pool=6, lam_bp=6_000).collect()
    want = mmr_rerank(clean, QV, k=4, pool=6, lam_bp=6_000).collect()
    assert got == want


def test_mmr_rejects_invalid_query_vector(spark):
    df = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="finite and nonzero"):
        mmr_rerank(df, [float("nan"), 0.0, 0.0])
    with pytest.raises(ValueError, match="finite and nonzero"):
        mmr_rerank(df, [0.0, 0.0, 0.0])


def test_stride_schedule_rejects_null_source(spark):
    from airflow_subscription_etl_spark.operators.sampling import (
        stride_schedule,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "doc_id bigint, source string"
    )
    with pytest.raises(ValueError, match="NULL 'source'"):
        stride_schedule(df)


def test_mmr_rejects_bad_params(spark):
    df = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="lam_bp"):
        mmr_rerank(df, QV, lam_bp=10_001)
    with pytest.raises(ValueError, match="pool >= k"):
        mmr_rerank(df, QV, k=5, pool=4)


def test_mmr_pool_cap_is_a_loud_error(spark):
    """pool drives an O(pool²) driver collect by design — past
    MMR_POOL_CAP the operator must refuse loudly instead of silently
    requesting a driver-OOM-sized collect."""
    from airflow_subscription_etl_spark.operators.similarity import (
        MMR_POOL_CAP,
    )

    df = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError, match="MMR_POOL_CAP"):
        mmr_rerank(df, QV, k=4, pool=MMR_POOL_CAP + 1)
    # the cap itself is legal (validation only; tiny corpus pads down)
    got = mmr_rerank(df, QV, k=2, pool=MMR_POOL_CAP).collect()
    assert [r.rank for r in got] == [1, 2]


def test_mmr_partitioning_invariant(spark):
    df = spark.createDataFrame(
        EMB, "vec_id bigint, embedding array<double>"
    )
    a = mmr_rerank(df.coalesce(1), QV, k=4, pool=6, lam_bp=6_000).collect()
    b = mmr_rerank(df.repartition(5), QV, k=4, pool=6, lam_bp=6_000).collect()
    assert a == b
