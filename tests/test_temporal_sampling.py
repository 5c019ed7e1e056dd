"""Unit tests: temporal joins (as-of / band) and deterministic
sampling / split / quota operators."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from airflow_subscription_etl_spark.operators.sampling import (
    hash_bucket,
    hash_split,
    quota_per_key,
    stratified_sample,
)
from airflow_subscription_etl_spark.operators.temporal import asof_join, band_join


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", ts("2025-01-01 10:00:00"), 100.0),
            ("A", ts("2025-01-01 10:05:00"), 101.0),
            ("A", ts("2025-01-01 10:10:00"), 102.0),
            ("B", ts("2025-01-01 10:02:00"), 50.0),
        ],
        "sym string, qts timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", ts("2025-01-01 10:04:59")),  # → 10:00 quote
            (2, "A", ts("2025-01-01 10:05:00")),  # tie: inclusive → 10:05
            (3, "A", ts("2025-01-01 11:00:00")),  # → latest (10:10)
            (4, "B", ts("2025-01-01 10:00:00")),  # before any quote → null
            (5, "C", ts("2025-01-01 10:00:00")),  # key with no quotes → null
        ],
        "trade_id int, sym string, tts timestamp",
    )


def test_asof_join_semantics(quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts", right_cols=["px"]
    )
    got = {r["trade_id"]: r["px_asof"] for r in out.collect()}
    assert got == {1: 100.0, 2: 101.0, 3: 102.0, 4: None, 5: None}


def test_asof_join_keeps_all_left_rows_and_columns(quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts", right_cols=["px"]
    )
    assert out.count() == trades.count()
    assert set(out.columns) == {"trade_id", "sym", "tts", "px_asof"}


def test_band_join_classifies_and_keeps_unmatched(spark):
    fact = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 99.0), (4, -1.0)], "id int, value double"
    )
    bands = spark.createDataFrame(
        [(0.0, 10.0, "lo"), (10.0, 100.0, "hi")],
        "band_lo double, band_hi double, band_label string",
    )
    got = {
        r["id"]: r["band_label"]
        for r in band_join(fact, bands, "value").collect()
    }
    # [lo, hi): 10.0 falls in "hi"; -1.0 matches nothing → null (left join)
    assert got == {1: "lo", 2: "hi", 3: "hi", 4: None}


def test_hash_bucket_deterministic_and_in_range(spark):
    df = spark.range(500).select(hash_bucket(F.col("id")).alias("b"))
    rows = [r["b"] for r in df.collect()]
    assert rows == [r["b"] for r in df.collect()]  # rerun → identical
    assert all(0 <= b < 10_000 for b in rows)


def test_hash_split_partitions_everything_exactly_once(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    out = hash_split(df, "k")
    by_split = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == 2000
    assert set(by_split) == {"train", "val", "test"}
    # 90/5/5 within loose tolerance on 2000 draws
    assert 1600 < by_split["train"] < 1950


def test_hash_split_rejects_bad_weights(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        hash_split(df, F.col("id"), weights={"a": 1, "b": 2})


def test_stratified_sample_is_a_stable_subset(spark):
    df = spark.range(1000)
    kept = stratified_sample(df, F.col("id"), 2000)
    ids = {r["id"] for r in kept.collect()}
    # stable across repartitioning (rand()-based sample would not be)
    ids2 = {r["id"] for r in stratified_sample(df.repartition(7), F.col("id"), 2000).collect()}
    assert ids == ids2
    assert 100 < len(ids) < 320  # ~20% of 1000


def test_quota_per_key_caps_and_prefers_order(spark):
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(10)] + [("b", 100, 1.0)],
        "k string, id long, score double",
    )
    kept = quota_per_key(df, "k", 3, [F.col("score").desc(), F.col("id").asc()])
    by_key = {
        r["k"]: sorted(x["id"] for x in kept.filter(F.col("k") == r["k"]).collect())
        for r in kept.select("k").distinct().collect()
    }
    assert by_key == {"a": [7, 8, 9], "b": [100]}


# --- hypothesis property tests ----------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                 max_size=40, unique=True)
)
def test_hash_split_is_total_and_disjoint(spark, ids):
    """Every row lands in exactly one split, regardless of id set."""
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    out = hash_split(df, F.col("id").cast("string")).collect()
    assert len(out) == len(ids)
    assert all(r["split"] in ("train", "val", "test") for r in out)
    # same key → same split on a rerun (determinism)
    again = {r["id"]: r["split"] for r in
             hash_split(df, F.col("id").cast("string")).collect()}
    assert {r["id"]: r["split"] for r in out} == again


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fraction_bp=st.integers(min_value=0, max_value=10_000),
)
def test_stratified_sample_is_monotone_in_fraction(spark, fraction_bp):
    """A smaller fraction's sample is a SUBSET of a larger fraction's —
    the property that makes hash sampling resumable/incremental."""
    df = spark.createDataFrame([(i,) for i in range(300)], "id long")
    small = {r["id"] for r in stratified_sample(df, F.col("id"), fraction_bp).collect()}
    large = {r["id"] for r in stratified_sample(
        df, F.col("id"), min(fraction_bp + 500, 10_000)).collect()}
    assert small <= large
    if fraction_bp == 0:
        assert small == set()
    if fraction_bp == 10_000:
        assert small == set(range(300))


def test_binned_interval_join_equals_direct(spark):
    import datetime as dt

    import pyspark.sql.functions as F

    from airflow_subscription_etl_spark.operators.temporal import (
        binned_interval_join,
    )

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    left = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=s)) for s in (0, 500, 1200, 3000)]
        + [(2, base)],
        ["k", "lts"],
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=s)) for s in (-700, -600, -1, 599, 600, 601, 1800)]
        + [(3, base)],
        ["k", "rts"],
    )
    got = binned_interval_join(left, right, "k", "lts", "rts", 600)
    direct = left.join(right, "k").filter(
        (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 600 SECOND"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 600 SECOND"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))
    # boundary inclusivity: |dt| == 600 included on both ends
    assert got.filter("lts = timestamp'2024-01-01 10:00:00' AND rts = timestamp'2024-01-01 09:50:00'").count() == 1
    # no duplicate pair emissions from bin expansion
    assert got.count() == got.distinct().count()
    # the plan is an equi-join shuffle, not a broadcast nested loop
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
