"""Round-9 operators: exact token-budget mixture assembly
(sampling.token_budget_mix) — reference parity of the two-level
histogram cut against a direct running-sum model, greedy-overshoot
semantics, contract checks, and partitioning invariance."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from airflow_subscription_etl_spark.operators.sampling import (
    token_budget_mix,
)

BUCKETS = 10_000


def _ref_mix(rows, shares, budget, buckets=BUCKETS):
    """Direct per-source running-sum model: select iff the tokens of
    all docs strictly before (in (bucket, md5, id) order) are under
    the integer source budget. Returns {(id, source, n_tokens)}."""
    budgets = {s: (budget * bp) // 10_000 for s, bp in shares.items()}
    per_src: dict = {}
    for i, s, t in rows:
        if i is None or s is None or t is None or s not in budgets:
            continue
        h = hashlib.md5(t.encode()).hexdigest()
        bkt = int(h[:15], 16) % buckets
        # Spark's split(trim(x), '\\s+'): '' -> [''] (size 1)
        n = len(re.split(r"\s+", t.strip()))
        per_src.setdefault(s, []).append((bkt, h, i, n))
    out = set()
    for s, docs in per_src.items():
        cum = 0
        for bkt, h, i, n in sorted(docs):
            if cum < budgets[s]:
                out.add((i, s, n))
            cum += n
    return out


ROWS = [
    (i, f"src{i % 3}", " ".join(f"w{(i * 7 + j) % 23}" for j in range(3 + i % 5)))
    for i in range(60)
]
SHARES = {"src0": 5000, "src1": 3000, "src2": 2000}


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


def test_mix_matches_direct_running_sum_model(spark):
    got = {
        (r.doc_id, r.source, r.n_tokens)
        for r in token_budget_mix(_df(spark, ROWS), SHARES, 100).collect()
    }
    assert got == _ref_mix(ROWS, SHARES, 100)
    assert got, "fixture selected nothing — budget too small to exercise"


def test_mix_hits_budget_with_at_most_one_overshoot_doc(spark):
    """Greedy take-until-reached: per source the selected total is
    >= budget (when supply allows) and removing the LAST selected doc
    (in selection order) drops it under — i.e. exactly one boundary
    overshoot, never more."""
    budget = 120
    sel = token_budget_mix(_df(spark, ROWS), SHARES, budget).collect()
    ref = _ref_mix(ROWS, SHARES, budget)
    assert {(r.doc_id, r.source, r.n_tokens) for r in sel} == ref
    budgets = {s: (budget * bp) // 10_000 for s, bp in SHARES.items()}
    for s in SHARES:
        picked = [r.n_tokens for r in sel if r.source == s]
        total = sum(picked)
        supply = sum(
            len(re.split(r"\s+", t.strip()))
            for _, src, t in ROWS
            if src == s
        )
        if total < budgets[s]:
            assert total == supply  # source exhausted under budget
        else:
            # strict-prefix rule: every selected doc started under
            # budget, so total minus ANY single doc ≥ ... the MAX
            # removable while staying ≥ budget is the boundary doc
            assert total - min(picked) < budgets[s] or total >= budgets[s]
            assert total < budgets[s] + max(picked) + 1


def test_mix_budget_zero_and_unknown_sources_select_nothing(spark):
    sel = token_budget_mix(
        _df(spark, ROWS), {"src0": 0, "srcX": 5000}, 1000
    ).collect()
    assert sel == []


def test_mix_excludes_null_rows_by_contract(spark):
    rows = ROWS + [(None, "src0", "a b"), (900, None, "a b"), (901, "src0", None)]
    got = {
        (r.doc_id, r.source, r.n_tokens)
        for r in token_budget_mix(_df(spark, rows), SHARES, 100).collect()
    }
    assert got == _ref_mix(ROWS, SHARES, 100)


def test_mix_partitioning_invariant(spark):
    a = sorted(
        tuple(r)
        for r in token_budget_mix(
            _df(spark, ROWS).coalesce(1), SHARES, 150
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in token_budget_mix(
            _df(spark, ROWS).repartition(7), SHARES, 150
        ).collect()
    )
    assert a == b


def test_mix_boundary_bucket_cut_is_exact(spark):
    """Force MANY docs into one hash bucket (tiny num_buckets) so the
    fine within-bucket window does real work, and check the cut against
    the model at the same bucket count."""
    got = {
        (r.doc_id, r.source, r.n_tokens)
        for r in token_budget_mix(
            _df(spark, ROWS), SHARES, 100, num_buckets=2
        ).collect()
    }
    assert got == _ref_mix(ROWS, SHARES, 100, buckets=2)


def test_mix_whole_corpus_budget_selects_everything(spark):
    sel = token_budget_mix(_df(spark, ROWS), SHARES, 10_000_000).collect()
    assert len(sel) == len(ROWS)


def test_mix_rejects_bad_params(spark):
    df = _df(spark, ROWS)
    with pytest.raises(ValueError, match="budget_tokens"):
        token_budget_mix(df, SHARES, -1)
    with pytest.raises(ValueError, match="at least one source"):
        token_budget_mix(df, {}, 100)
    with pytest.raises(ValueError, match=">= 0"):
        token_budget_mix(df, {"src0": -5}, 100)
    # shares are fractions of ONE budget: over-allocation must refuse
    # loudly, not silently assemble 1.6 budgets (hash_split discipline)
    with pytest.raises(ValueError, match="sum to <= 10000"):
        token_budget_mix(df, {"src0": 8000, "src1": 8000}, 100)


# --- grouped exact rank / CCNet tiers ---


def _ref_rank(rows, tiers=None):
    """Direct model: rank by (score, id) within group + optional
    head/middle/tail labels. rows: [(id, group, score)]."""
    clean = [(i, g, s) for i, g, s in rows if None not in (i, g, s)]
    out = {}
    by_g: dict = {}
    for i, g, s in clean:
        by_g.setdefault(g, []).append((s, i))
    for g, docs in by_g.items():
        docs.sort()
        n = len(docs)
        for rk, (s, i) in enumerate(docs, 1):
            row = (i, g, s, rk, n)
            if tiers is not None:
                h, m = tiers
                tier = (
                    "head"
                    if rk * 10_000 <= n * h
                    else "middle"
                    if rk * 10_000 <= n * (h + m)
                    else "tail"
                )
                row = (*row, tier)
            out[i] = row
    return set(out.values())


RANK_ROWS = [
    (i, f"g{i % 4}", ((i * 37) % 11) * 1_000_000 + (i % 3))
    for i in range(80)
]  # duplicate scores within groups exercise the id tiebreak


def _rdf(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, grp string, score bigint"
    )


def test_rank_matches_direct_window_model(spark):
    from airflow_subscription_etl_spark.operators.scale import (
        grouped_exact_rank,
    )

    got = {
        tuple(r)
        for r in grouped_exact_rank(
            _rdf(spark, RANK_ROWS), "grp", "score", "doc_id"
        ).collect()
    }
    assert got == _ref_rank(RANK_ROWS)


def test_rank_tiny_nbins_forces_fine_window_work(spark):
    """nbins=2 collapses most scores into shared bins, so the
    cumulative-offset + fine-window composition does real work — the
    result must be identical to the direct model."""
    from airflow_subscription_etl_spark.operators.scale import (
        grouped_exact_rank,
    )

    got = {
        tuple(r)
        for r in grouped_exact_rank(
            _rdf(spark, RANK_ROWS), "grp", "score", "doc_id", nbins=2
        ).collect()
    }
    assert got == _ref_rank(RANK_ROWS)


def test_rank_degenerate_all_equal_scores(spark):
    """All-equal scores land in ONE bin (documented limit): rank must
    fall back to the pure id order, still exact."""
    from airflow_subscription_etl_spark.operators.scale import (
        grouped_exact_rank,
    )

    rows = [(i, "g", 7) for i in range(20)]
    got = sorted(
        (r.doc_id, r.rank)
        for r in grouped_exact_rank(
            _rdf(spark, rows), "grp", "score", "doc_id"
        ).collect()
    )
    assert got == [(i, i + 1) for i in range(20)]


def test_rank_ccnet_tiers_and_null_contract(spark):
    from airflow_subscription_etl_spark.operators.scale import (
        grouped_exact_rank,
    )

    rows = RANK_ROWS + [(None, "g0", 5), (900, None, 5), (901, "g0", None)]
    got = {
        tuple(r)
        for r in grouped_exact_rank(
            _rdf(spark, rows), "grp", "score", "doc_id", tiers_bp=(3000, 4000)
        ).collect()
    }
    assert got == _ref_rank(RANK_ROWS, tiers=(3000, 4000))
    # every group has all three tiers at 20 rows per group
    by_tier = {t for *_, t in got}
    assert by_tier == {"head", "middle", "tail"}


def test_rank_extreme_score_range_does_not_overflow(spark):
    """A group spanning more than 2^63 (scores ±2^62) must rank
    correctly — the divide-first bin width avoids the (hi − lo)
    subtraction that would overflow bigint (abort under ANSI)."""
    from airflow_subscription_etl_spark.operators.scale import (
        grouped_exact_rank,
    )

    rows = [
        (1, "g", -(2**62)),
        (2, "g", 2**62),
        (3, "g", 0),
        (4, "g", -(2**62)),  # duplicate extreme → id tiebreak
    ]
    got = sorted(
        (r.doc_id, r.rank)
        for r in grouped_exact_rank(
            _rdf(spark, rows), "grp", "score", "doc_id"
        ).collect()
    )
    assert got == [(1, 1), (2, 4), (3, 3), (4, 2)]


def test_rank_partitioning_invariant(spark):
    from airflow_subscription_etl_spark.operators.scale import (
        grouped_exact_rank,
    )

    a = sorted(
        tuple(r)
        for r in grouped_exact_rank(
            _rdf(spark, RANK_ROWS).coalesce(1), "grp", "score", "doc_id"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in grouped_exact_rank(
            _rdf(spark, RANK_ROWS).repartition(9), "grp", "score", "doc_id"
        ).collect()
    )
    assert a == b


# --- cluster-aware split (near-dup leakage guard) ---


def test_cluster_split_never_straddles_a_cluster(spark):
    """THE property this operator exists for: every member of a
    near-dup cluster lands in the same split, even when their own
    text hashes would disagree."""
    from airflow_subscription_etl_spark.operators.dedup import (
        exact_jaccard_pairs,
    )
    from airflow_subscription_etl_spark.operators.graph import (
        connected_components,
    )
    from airflow_subscription_etl_spark.operators.sampling import (
        cluster_aware_split,
        hash_split,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, base + f" tail{i}") for i in range(12)]  # near-dup family
    rows += [(100 + i, f"unrelated u{i} v{i} w{i} x{i}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = exact_jaccard_pairs(docs, threshold=0.4)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    out = cluster_aware_split(docs, comp).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values()), by_cluster
    # the family really is one cluster, and its own-text hash splits
    # WOULD have straddled (otherwise the test proves nothing)
    fam = [r for r in out if r.doc_id < 100]
    assert len({r.cluster_id for r in fam}) == 1
    naive = {
        r.split
        for r in hash_split(docs.filter(F.col("doc_id") < 100), "text").collect()
    }
    if len(naive) > 1:  # expected with 12 distinct texts
        assert len({r.split for r in fam}) == 1


def test_cluster_split_singletons_degrade_to_hash_split(spark):
    """With an empty pair graph every doc is its own canonical, so the
    assignment must equal plain hash_split on the doc's own text."""
    from airflow_subscription_etl_spark.operators.sampling import (
        cluster_aware_split,
        hash_split,
    )

    rows = [(i, f"solo text number {i} quite distinct {i * 7}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    empty = spark.createDataFrame([], "node bigint, component bigint")
    got = {
        r.doc_id: (r.cluster_id, r.split)
        for r in cluster_aware_split(docs, empty).collect()
    }
    want = {r.doc_id: r.split for r in hash_split(docs, "text").collect()}
    assert {i: s for i, (c, s) in got.items()} == want
    assert all(c == i for i, (c, _) in got.items())


# --- scalable exact stratified split ---


def test_stratified_scalable_exact_counts_and_model_parity(spark):
    """The guarantee: exactly floor(n_s*bp/10000 + 0.5) test rows per
    stratum, membership identical to the direct (hash60, key) rank
    model — including odd strata sizes where half-up rounding bites."""
    from airflow_subscription_etl_spark.operators.sampling import (
        exact_stratified_split_scalable,
    )

    rows = (
        [(i, "a") for i in range(17)]
        + [(100 + i, "b") for i in range(3)]
        + [(200, "c")]  # n=1: n_test = (2000+5000)//10000 = 0
    )
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = exact_stratified_split_scalable(df, "source", test_bp=2000).collect()
    got = {r.doc_id: (r.source, r.rank, r.n, r.split) for r in out}
    assert len(got) == len(rows)

    def h60(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    for src, ids in (("a", range(17)), ("b", range(100, 103)), ("c", [200])):
        ordered = sorted(ids, key=lambda i: (h60(i), i))
        n = len(ordered)
        n_test = (n * 2000 + 5000) // 10000
        for rk, i in enumerate(ordered, 1):
            want = "test" if rk <= n_test else "train"
            assert got[i] == (src, rk, n, want), (i, got[i])
        assert sum(1 for i in ids if got[i][3] == "test") == n_test


def test_stratified_scalable_rejects_bad_bp(spark):
    from airflow_subscription_etl_spark.operators.sampling import (
        exact_stratified_split_scalable,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, source string")
    with pytest.raises(ValueError, match="test_bp"):
        exact_stratified_split_scalable(df, "source", test_bp=10_001)


def test_cluster_split_survives_superset_components(spark):
    """components computed BEFORE a quality filter removed the min-id
    canonical member: every surviving member must still get a split
    (no silent inner-join drop) and the cluster still never straddles
    — the canonical text comes from the min-id member PRESENT in df."""
    from airflow_subscription_etl_spark.operators.dedup import (
        exact_jaccard_pairs,
    )
    from airflow_subscription_etl_spark.operators.graph import (
        connected_components,
    )
    from airflow_subscription_etl_spark.operators.sampling import (
        cluster_aware_split,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, base + f" tail{i}") for i in range(6)]
    full = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = exact_jaccard_pairs(full, threshold=0.4)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    # the CC label is min id = 0; drop doc 0 from the corpus
    filtered = full.filter(F.col("doc_id") != 0)
    out = cluster_aware_split(filtered, comp).collect()
    assert {r.doc_id for r in out} == {1, 2, 3, 4, 5}  # nobody dropped
    assert len({r.split for r in out}) == 1  # still co-split
    # NULL-key/text rows excluded by contract, not crashed on
    dirty = filtered.unionByName(
        spark.createDataFrame(
            [(None, "x y z"), (99, None)], "doc_id bigint, text string"
        )
    )
    out2 = cluster_aware_split(dirty, comp).collect()
    assert {r.doc_id for r in out2} == {1, 2, 3, 4, 5}


# --- semantic contamination (two-frame embedding decontamination) ---


@pytest.fixture(scope="module")
def contamination_frames(spark):
    # eval = two benchmark vectors along distinct axes; train = one
    # near-copy of each, one moderate match, and one orthogonal doc
    eval_rows = [
        (100, [1.0, 0.0, 0.0, 0.0]),
        (200, [0.0, 1.0, 0.0, 0.0]),
    ]
    train_rows = [
        (1, [0.99, 0.01, 0.0, 0.0]),  # near-copy of eval 100
        (2, [0.02, 0.98, 0.0, 0.0]),  # near-copy of eval 200
        (3, [0.6, 0.0, 0.8, 0.0]),  # moderate match to 100 (cos 0.6)
        (4, [0.0, 0.0, 0.0, 1.0]),  # orthogonal to both
    ]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "vec_id bigint, embedding array<float>"
    ).cache()
    return mk(train_rows), mk(eval_rows)


def test_contamination_flags_near_copies_with_best_match(
    spark, contamination_frames
):
    from airflow_subscription_etl_spark.operators.similarity import (
        semantic_contamination,
    )

    train, ev = contamination_frames
    got = {
        r.train_id: r
        for r in semantic_contamination(
            train, ev, threshold=0.9, n_planes=4, bands=2, dims=4
        ).collect()
    }
    assert set(got) == {1, 2}
    assert got[1].eval_id == 100 and got[1].cosine_sim > 0.9
    assert got[2].eval_id == 200 and got[2].cosine_sim > 0.9


def test_contamination_threshold_and_orthogonal_exclusion(
    spark, contamination_frames
):
    from airflow_subscription_etl_spark.operators.similarity import (
        semantic_contamination,
    )

    train, ev = contamination_frames
    got = {
        r.train_id: r
        for r in semantic_contamination(
            train, ev, threshold=0.5, n_planes=4, bands=2, dims=4
        ).collect()
    }
    # vec 3 (cos 0.6 to eval 100) now crosses the bar; vec 4 never does
    assert 3 in got and got[3].eval_id == 100
    assert 4 not in got
    # one row per contaminated train doc — argmax, not all pairs
    assert all(
        len([r for r in got.values() if r.train_id == t]) == 1 for t in got
    )


def test_contamination_is_map_only_over_train(spark, contamination_frames):
    """Plan shape: the eval side is broadcast — no shuffle join, no
    cartesian; the only exchange is the per-train-doc argmax window
    over matches."""
    from airflow_subscription_etl_spark.operators.similarity import (
        semantic_contamination,
    )

    train, ev = contamination_frames
    plan = (
        semantic_contamination(train, ev, 0.5, n_planes=4, bands=2, dims=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_contamination_excludes_dirty_rows(spark, contamination_frames):
    """Zero-norm / NaN / ragged / NULL-id rows must be EXCLUDED, not
    flagged: a zero vector's NaN cosine would otherwise pass the
    threshold AND win the argmax under Spark's NaN-is-greatest
    ordering — poison for an operator that gates data removal."""
    from airflow_subscription_etl_spark.operators.similarity import (
        semantic_contamination,
    )

    train, ev = contamination_frames
    dirty = train.unionByName(
        spark.createDataFrame(
            [
                (50, [0.0, 0.0, 0.0, 0.0]),  # zero norm → NaN cosine
                (51, [float("nan"), 1.0, 0.0, 0.0]),
                (52, [1.0, 0.0]),  # ragged
                (53, None),
                (None, [1.0, 0.0, 0.0, 0.0]),  # NULL id
            ],
            "vec_id bigint, embedding array<float>",
        )
    )
    got = sorted(
        tuple(r)
        for r in semantic_contamination(
            dirty, ev, 0.9, n_planes=4, bands=2, dims=4
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in semantic_contamination(
            train, ev, 0.9, n_planes=4, bands=2, dims=4
        ).collect()
    )
    assert got == want
    assert all(r[0] not in (50, 51, 52, 53, None) for r in got)


def test_contamination_partitioning_invariant(spark, contamination_frames):
    from airflow_subscription_etl_spark.operators.similarity import (
        semantic_contamination,
    )

    train, ev = contamination_frames
    a = sorted(
        tuple(r)
        for r in semantic_contamination(
            train.coalesce(1), ev, 0.5, n_planes=4, bands=2, dims=4
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in semantic_contamination(
            train.repartition(5), ev, 0.5, n_planes=4, bands=2, dims=4
        ).collect()
    )
    assert a == b


def test_rank_rejects_bad_inputs(spark):
    from airflow_subscription_etl_spark.operators.scale import (
        grouped_exact_rank,
    )

    fdf = spark.createDataFrame(
        [(1, "g", 0.5)], "doc_id bigint, grp string, score double"
    )
    with pytest.raises(ValueError, match="integral"):
        grouped_exact_rank(fdf, "grp", "score", "doc_id")
    idf = _rdf(spark, RANK_ROWS)
    with pytest.raises(ValueError, match="nbins"):
        grouped_exact_rank(idf, "grp", "score", "doc_id", nbins=0)
    with pytest.raises(ValueError, match="tiers_bp"):
        grouped_exact_rank(
            idf, "grp", "score", "doc_id", tiers_bp=(8000, 8000)
        )
