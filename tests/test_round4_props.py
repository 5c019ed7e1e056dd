"""Property tests for the round-4 operators: MERGE invariants,
compaction conservation, exact-split exactness, skew-report algebra."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airflow_subscription_etl_spark.operators.mutations import merge_upsert
from airflow_subscription_etl_spark.operators.sampling import (
    exact_stratified_split,
)
from airflow_subscription_etl_spark.operators.scale import (
    compaction_plan,
    key_skew_report,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _target(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double")


@given(
    tgt=st.lists(
        st.tuples(st.integers(0, 30), st.floats(0, 100, width=32)),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
    src=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.floats(0, 100, width=32),
            st.booleans(),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda r: r[0],
    ),
)
@_SETTINGS
def test_merge_upsert_matches_dict_semantics(spark, tgt, src):
    """MERGE over unique keys ≡ dict.update + del — on any input."""
    target = spark.createDataFrame(tgt, "k bigint, v double") if tgt else _target(spark, [(0, 0.0)]).limit(0)
    source = (
        spark.createDataFrame(src, "k bigint, v double, _del boolean")
        if src
        else spark.createDataFrame([], "k bigint, v double, _del boolean")
    )
    got = {
        r["k"]: r["v"]
        for r in merge_upsert(target, source, ["k"], delete_col="_del").collect()
    }
    want = dict(tgt)
    for k, v, dele in src:
        if dele:
            want.pop(k, None)
        else:
            want[k] = v
    assert got == pytest.approx(want)


@given(
    sizes=st.lists(st.integers(0, 500), min_size=1, max_size=12),
    target=st.integers(1, 300),
)
@_SETTINGS
def test_compaction_plan_conserves_and_orders(spark, sizes, target):
    rows = [(f"f{i:03d}", s) for i, s in enumerate(sizes)]
    stats = spark.createDataFrame(rows, "file_key string, bytes long")
    out = sorted(
        compaction_plan(stats, target).collect(), key=lambda r: r["file_key"]
    )
    # every input present, bytes unchanged
    assert [(r["file_key"], r["bytes"]) for r in out] == rows
    # out_file/offset replay the running sum exactly
    cum = 0
    for r in out:
        assert r["out_file"] == cum // target
        assert r["out_offset"] == cum % target
        cum += r["bytes"]


@given(
    counts=st.lists(st.integers(1, 40), min_size=1, max_size=6),
    frac=st.sampled_from([0.0, 0.1, 0.25, 0.5, 1.0]),
)
@_SETTINGS
def test_exact_split_is_exact_for_any_strata(spark, counts, frac):
    rows = [
        (sid * 1000 + i, f"s{sid}")
        for sid, n in enumerate(counts)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = {
        (r["source"], r["split"]): r["c"]
        for r in exact_stratified_split(df, "source", frac)
        .groupBy("source", "split")
        .count()
        .withColumnRenamed("count", "c")
        .collect()
    }
    import math

    for sid, n in enumerate(counts):
        want_test = math.floor(n * frac + 0.5)
        assert got.get((f"s{sid}", "test"), 0) == want_test
        assert got.get((f"s{sid}", "train"), 0) == n - want_test


@given(
    counts=st.lists(st.integers(1, 50), min_size=1, max_size=8),
)
@_SETTINGS
def test_skew_report_algebra(spark, counts):
    rows = [(f"k{i:02d}",) for i, n in enumerate(counts) for _ in range(n)]
    df = spark.createDataFrame(rows, "k string")
    top = key_skew_report(df, "k", top_n=len(counts)).collect()
    total, n_keys, mx = sum(counts), len(counts), max(counts)
    assert top[0]["cnt"] == mx
    for r in top:
        assert r["n_keys"] == n_keys
        assert r["skew_factor"] == pytest.approx(mx * n_keys / total)
        assert r["rec_salt"] == -(-mx * n_keys // total)  # ceil
        assert r["rec_salt"] >= 1
