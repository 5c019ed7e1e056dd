"""Round-4 operators: survivor selection, length-bucketed batching,
skew diagnostics, compaction planning — plus a partition-count
independence sweep over the layout-sensitive queries."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airflow_subscription_etl_spark.operators.dedup import survivor_selection
from airflow_subscription_etl_spark.operators.packing import (
    length_bucketed_batches,
)
from airflow_subscription_etl_spark.operators.scale import (
    compaction_plan,
    key_skew_report,
)

SF = "/root/testdata/sf0.001"


# --- survivor selection ------------------------------------------------------


def test_survivor_selection_picks_best_and_breaks_ties_low_id(spark):
    members = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40), (5, 50), (6, 50)],
        "doc_id bigint, cluster_id bigint",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (5, 0.7), (6, 0.7)],
        "doc_id bigint, quality_score double",
    )
    out = {
        r["cluster_id"]: r
        for r in survivor_selection(members, scores).collect()
    }
    assert out[10]["keep_doc_id"] == 2  # 0.9 tie between 2,3 -> lower id
    assert out[10]["n_members"] == 3
    assert out[10]["dropped_checksum"] == 1 + 3
    assert out[40]["keep_doc_id"] == 4 and out[40]["n_members"] == 1
    assert out[40]["dropped_checksum"] == 0
    assert out[50]["keep_doc_id"] == 5  # tie -> lower id
    assert out[50]["keep_score"] == 0.7


# --- length-bucketed batching ------------------------------------------------


def test_length_batches_bucket_formula_and_fill(spark):
    # token counts: 1 -> bucket 0; 2 -> 1; 3,4 -> 2; 5..8 -> 3
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([1, 2, 3, 4, 5, 8])]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = length_bucketed_batches(df, batch_size=2, n_shards=1).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    # bucket 2 holds docs of 3 and 4 tokens in ONE batch of 2
    (b2,) = by_bucket[2]
    assert b2["n_docs"] == 2 and b2["max_tokens"] == 4 and b2["sum_tokens"] == 7
    assert b2["pad_frac"] == pytest.approx(1.0 - 7 / 8)
    # total docs conserved
    assert sum(r["n_docs"] for r in out) == 6


def test_length_batches_total_and_padding_bound(spark):
    from airflow_subscription_etl_spark.sources.io import read_star_table

    docs = read_star_table(spark, SF, "documents")
    out = length_bucketed_batches(docs, batch_size=8, n_shards=4).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    # pow2 bucketing bounds padding: max <= 2*min within a bucket, so
    # even a pathological batch pads < 50%
    for r in out:
        assert 0.0 <= r["pad_frac"] < 0.5
        assert r["n_docs"] <= 8


# --- intra-doc repetition repair --------------------------------------------


def test_collapse_token_runs(spark):
    from airflow_subscription_etl_spark.operators.text import (
        collapse_token_runs,
    )

    df = spark.createDataFrame(
        [(1, "go go go stop go"), (2, "a b c"), (3, "x x x x")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in collapse_token_runs(df).collect()}
    assert out[1]["clean_text"] == "go stop go" and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "a b c" and out[2]["n_removed"] == 0
    assert out[3]["clean_text"] == "x" and out[3]["n_removed"] == 3
    assert all(r["n_tokens"] - r["n_removed"] >= 1 for r in out.values())


def test_collapse_token_runs_idempotent(spark):
    from airflow_subscription_etl_spark.operators.text import (
        collapse_token_runs,
    )
    from airflow_subscription_etl_spark.sources.io import read_star_table

    docs = read_star_table(spark, SF, "documents")
    once = collapse_token_runs(docs).select(
        F.col("doc_id"), F.col("clean_text").alias("text")
    )
    twice = collapse_token_runs(once)
    assert twice.filter(F.col("n_removed") > 0).count() == 0


# --- skew diagnostics --------------------------------------------------------


def test_key_skew_report_exact_counts_and_salt(spark):
    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, "k", top_n=2).collect()
    assert [r["key"] for r in out] == ["hot", "warm"]
    hot = out[0]
    assert hot["cnt"] == 60 and hot["n_keys"] == 4
    assert hot["share"] == pytest.approx(0.6)
    assert hot["skew_factor"] == pytest.approx(60 * 4 / 100)
    assert hot["rec_salt"] == 3  # ceil(60*4/100) = ceil(2.4)


def test_key_skew_report_uniform_is_one(spark):
    df = spark.createDataFrame([(i % 10,) for i in range(100)], "k int")
    out = key_skew_report(df, "k", top_n=1).collect()[0]
    assert out["skew_factor"] == pytest.approx(1.0)
    assert out["rec_salt"] == 1


# --- compaction planner ------------------------------------------------------


def test_compaction_plan_boundaries_and_overflow(spark):
    stats = spark.createDataFrame(
        [("a", 70), ("b", 50), ("c", 120), ("d", 10)],
        "file_key string, bytes long",
    )
    out = {r["file_key"]: r for r in compaction_plan(stats, 100).collect()}
    # key order a,b,c,d; starts 0,70,120,240
    assert (out["a"]["out_file"], out["a"]["out_offset"]) == (0, 0)
    assert (out["b"]["out_file"], out["b"]["out_offset"]) == (0, 70)
    assert (out["c"]["out_file"], out["c"]["out_offset"]) == (1, 20)
    assert (out["d"]["out_file"], out["d"]["out_offset"]) == (2, 40)


def test_compaction_plan_rejects_bad_target(spark):
    stats = spark.createDataFrame([("a", 1)], "file_key string, bytes long")
    with pytest.raises(ValueError):
        compaction_plan(stats, 0)


# --- partition-count independence -------------------------------------------

#: queries whose results depend on cumulative/layout-adjacent logic —
#: exactly the class a fixed shuffle-partition count could mask bugs in
#: (sampled range boundaries, per-partition offsets, window shards)
_SWEEP = [
    "compaction_plan",
    "doc_length_batches",
    "doc_pack_sequences",
    "doc_keep_best",
    "emb_pq_topk",
]


@pytest.mark.parametrize("name", _SWEEP)
def test_result_independent_of_shuffle_partitions(spark, name):
    from airflow_subscription_etl_spark.queries import REGISTRY

    fn, _ = REGISTRY[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(map(str, fn(spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        b = sorted(map(str, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


# --- MERGE upsert ------------------------------------------------------------


def test_merge_upsert_update_insert_delete(spark):
    from airflow_subscription_etl_spark.operators.mutations import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, v double",
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0, False), (3, "c", 30.0, True), (4, "d", 40.0, False)],
        "k bigint, name string, v double, _del boolean",
    )
    out = {r["k"]: r for r in merge_upsert(target, source, ["k"], delete_col="_del").collect()}
    assert set(out) == {1, 2, 4}  # 3 deleted
    assert out[1]["name"] == "a" and out[1]["v"] == 10.0  # untouched
    assert out[2]["name"] == "B" and out[2]["v"] == 99.0  # updated
    assert out[4]["name"] == "d" and out[4]["v"] == 40.0  # inserted


def test_merge_upsert_partial_update_cols_null_fill(spark):
    from airflow_subscription_etl_spark.operators.mutations import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        [(1, "a", 10.0)], "k bigint, name string, v double"
    )
    source = spark.createDataFrame([(1, 99.0), (5, 50.0)], "k bigint, v double")
    out = {
        r["k"]: r
        for r in merge_upsert(target, source, ["k"], update_cols=["v"]).collect()
    }
    assert out[1]["name"] == "a" and out[1]["v"] == 99.0
    assert out[5]["name"] is None and out[5]["v"] == 50.0  # ANSI null fill


def test_merge_upsert_missing_update_col_raises(spark):
    from airflow_subscription_etl_spark.operators.mutations import (
        merge_upsert,
    )

    target = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    source = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="update columns"):
        merge_upsert(target, source, ["k"])


# --- exact stratified split --------------------------------------------------


def test_exact_split_counts_per_stratum(spark):
    from airflow_subscription_etl_spark.operators.sampling import (
        exact_stratified_split,
    )

    rows = [(i, "s%d" % (i % 3)) for i in range(100)]  # strata of 34/33/33
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = exact_stratified_split(df, "source", test_frac=0.1)
    got = {
        (r["source"], r["split"]): r["cnt"]
        for r in out.groupBy("source", "split").agg(F.count("*").alias("cnt")).collect()
    }
    assert got[("s0", "test")] == 3  # floor(34*0.1+0.5)
    assert got[("s1", "test")] == 3  # floor(33*0.1+0.5)
    assert got[("s2", "test")] == 3
    # deterministic under repartition
    a = sorted(map(str, out.collect()))
    b = sorted(map(str, exact_stratified_split(df.repartition(7), "source", 0.1).collect()))
    assert a == b


# --- winsorization -----------------------------------------------------------


def test_winsorize_summary_bounds_and_counts(spark):
    from airflow_subscription_etl_spark.operators.scale import (
        winsorize_summary,
    )

    vals = [float(i) for i in range(1, 101)]  # 1..100 per group
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, value double")
    out = winsorize_summary(df, "value", "grp", 0.05, 0.95).collect()[0]
    # percentile(1..100, .05) = 5.95; .95 -> 95.05 (linear interpolation)
    assert out["lo_micro"] == 5_950_000
    assert out["hi_micro"] == 95_050_000
    assert out["n"] == 100
    assert out["n_clipped_low"] == 5 and out["n_clipped_high"] == 5
    expected = sum(round(min(max(v, 5.95), 95.05) * 1e6) for v in vals)
    assert out["sum_clipped_micro"] == expected


def test_winsorize_summary_rejects_bad_bounds(spark):
    from airflow_subscription_etl_spark.operators.scale import (
        winsorize_summary,
    )

    df = spark.createDataFrame([("g", 1.0)], "grp string, value double")
    with pytest.raises(ValueError):
        winsorize_summary(df, "value", "grp", 0.9, 0.1)


# --- review-hardening regressions -------------------------------------------


def test_merge_upsert_null_update_applies_null(spark):
    """ANSI MERGE: a matched source NULL must SET NULL (CDC erasure),
    not silently keep the stale target value."""
    from airflow_subscription_etl_spark.operators.mutations import (
        merge_upsert,
    )

    target = spark.createDataFrame(
        [(1, "pii", 10.0)], "k bigint, name string, v double"
    )
    source = spark.createDataFrame(
        [(1, None, 99.0)], "k bigint, name string, v double"
    )
    out = merge_upsert(target, source, ["k"]).collect()[0]
    assert out["name"] is None and out["v"] == 99.0


def test_merge_upsert_duplicate_source_keys_raise(spark):
    from airflow_subscription_etl_spark.operators.mutations import (
        merge_upsert,
    )

    target = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    source = spark.createDataFrame(
        [(2, 2.0), (2, 3.0)], "k bigint, v double"
    )
    with pytest.raises(Exception, match="duplicate source key"):
        merge_upsert(target, source, ["k"]).collect()


def test_survivor_selection_counts_unscored_members(spark):
    """A member missing from scores still counts toward n_members and
    the checksum, and can never beat a scored member."""
    members = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 30)], "doc_id bigint, cluster_id bigint"
    )
    scores = spark.createDataFrame(
        [(1, 0.5)], "doc_id bigint, quality_score double"
    )  # doc 2 and 3 unscored
    out = {
        r["cluster_id"]: r
        for r in survivor_selection(members, scores).collect()
    }
    assert out[10]["keep_doc_id"] == 1 and out[10]["n_members"] == 2
    assert out[10]["dropped_checksum"] == 2
    assert out[30]["keep_doc_id"] == 3 and out[30]["keep_score"] is None


def test_exact_split_rejects_bad_frac(spark):
    from airflow_subscription_etl_spark.operators.sampling import (
        exact_stratified_split,
    )

    df = spark.createDataFrame([(1, "s")], "doc_id bigint, source string")
    for frac in (-0.1, 1.5):
        with pytest.raises(ValueError, match="test_frac"):
            exact_stratified_split(df, "source", frac)


def test_length_batches_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    for bs, ns in ((0, 8), (8, 0)):
        with pytest.raises(ValueError, match="positive"):
            length_bucketed_batches(df, batch_size=bs, n_shards=ns)


def test_synth_stream_offset_never_regresses():
    from airflow_subscription_etl_spark.sources.synth import (
        SynthDocsStreamReader,
    )

    r = SynthDocsStreamReader({"rows": "50", "rowsPerBatch": "10"})
    it, off = r.read({"next": 120})  # checkpoint beyond a lowered cap
    assert off == {"next": 120} and list(it) == []
    with pytest.raises(ValueError, match="rows"):
        SynthDocsStreamReader({"rows": "-1"})


# --- incremental join maintenance -------------------------------------------


def test_incremental_join_delta_equals_recompute(spark):
    from airflow_subscription_etl_spark.operators.scale import (
        incremental_join_delta,
    )

    a = spark.createDataFrame(
        [(k, f"a{k}") for k in range(20)], "k bigint, av string"
    )
    b = spark.createDataFrame(
        [(k % 10, f"b{k}") for k in range(30)], "k bigint, bv string"
    )
    a_old, a_d = a.filter("k % 3 != 0"), a.filter("k % 3 = 0")
    b_old, b_d = b.filter("bv < 'b2'"), b.filter("bv >= 'b2'")
    view = a_old.join(b_old, ["k"]).unionByName(
        incremental_join_delta(a_old, a_d, b_old, b_d, ["k"])
    )
    got = sorted(map(str, view.collect()))
    want = sorted(map(str, a.join(b, ["k"]).collect()))
    assert got == want


def test_incremental_join_delta_empty_deltas_add_nothing(spark):
    from airflow_subscription_etl_spark.operators.scale import (
        incremental_join_delta,
    )

    a = spark.createDataFrame([(1, "x")], "k bigint, av string")
    b = spark.createDataFrame([(1, "y")], "k bigint, bv string")
    empty_a, empty_b = a.limit(0), b.limit(0)
    assert incremental_join_delta(a, empty_a, b, empty_b, ["k"]).count() == 0
