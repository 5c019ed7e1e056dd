"""Streaming + windowed-aggregation tests.

One real Structured Streaming run (file source → memory sink) proves
the streaming path; the rest exercise the shared batch/stream
transform bodies on batch frames (the bodies are identical by
construction).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_subscription_etl_spark.schemas import EVENTS_SCHEMA
from airflow_subscription_etl_spark.streaming import events as EV


def _ts(minute: float, base_hour: int = 10) -> dt.datetime:
    whole = int(minute)
    return dt.datetime(2024, 1, 1, base_hour, whole, int((minute - whole) * 60))


@pytest.fixture()
def ev(spark):
    rows = [
        (1, _ts(0), 1, "click", 1.0, '{"k": 1}'),
        (2, _ts(4), 1, "click", 2.0, '{"k": 2}'),
        (3, _ts(11), 1, "view", 3.0, '{"k": 3}'),
        (4, _ts(50), 1, "click", 4.0, '{"k": 4}'),  # 39-min gap → new session
        (5, _ts(2), 2, "click", 5.0, '{"k": 5}'),
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_tumbling_counts_batch(ev):
    out = {
        (r["w_start"].minute, r["event_type"]): r["n_events"]
        for r in EV.tumbling_counts(ev, "10 minutes").collect()
    }
    assert out[(0, "click")] == 3  # events at :00, :04 (u1) and :02 (u2)
    assert out[(10, "view")] == 1
    assert out[(50, "click")] == 1


def test_sliding_counts_each_event_in_two_windows(ev):
    rows = EV.sliding_counts(ev, "10 minutes", "5 minutes").collect()
    total = sum(r["n_events"] for r in rows)
    assert total == 2 * ev.count()


def test_sessionize_batch_gap_splits(ev):
    out = EV.sessionize_batch(ev, gap_minutes=30)
    sessions = out.filter(F.col("user_id") == 1).orderBy("session_seq").collect()
    assert len(sessions) == 2
    assert sessions[0]["n_events"] == 3
    assert sessions[1]["n_events"] == 1


def test_stream_dedup_batch_path(spark, ev):
    dup = ev.union(ev.limit(2))
    assert EV.stream_dedup(dup).count() == ev.count()


def test_streaming_end_to_end_tumbling(spark, ev, tmp_path):
    """Real readStream → window agg with watermark → memory sink."""
    src = str(tmp_path / "events_parquet")
    ev.write.parquet(src)
    stream = EV.read_events_stream(spark, src)
    assert stream.isStreaming
    agg = EV.tumbling_counts(stream, "10 minutes", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["w_start"].minute, r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    assert got[(0, "click")] == 3
    q.stop()


def test_streaming_stateful_user_totals(spark, ev, tmp_path):
    """applyInPandasWithState accumulates per-user state ACROSS
    micro-batches (2 files × maxFilesPerTrigger=1 → 2 batches)."""
    src = str(tmp_path / "events_state")
    ev.repartition(2).write.parquet(src)
    stream = EV.read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        EV.stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT max(n_events) AS n FROM t_state WHERE user_id = 1"
    ).collect()
    assert rows[0]["n"] == 4  # all 4 user-1 events, accumulated across batches
    q.stop()
    # batch fallback: same logical result from a plain groupBy
    got = {
        r["user_id"]: r["n_events"] for r in EV.stateful_user_totals(ev).collect()
    }
    assert got == {1: 4, 2: 1}


def test_streaming_dedup_within_watermark(spark, ev, tmp_path):
    """dropDuplicatesWithinWatermark drops the cross-batch replay of the
    same event_ids (bounded state keyed by event_id)."""
    src = str(tmp_path / "events_dup")
    ev.write.parquet(src)
    ev.limit(3).write.mode("append").parquet(src)  # replay 3 event_ids
    stream = EV.read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        EV.stream_dedup(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(DISTINCT event_id) c, count(*) n FROM t_dedup").collect()[0]
    assert n["c"] == 5
    assert n["n"] == 5  # replayed ids were dropped, not re-emitted
    q.stop()


def test_streaming_session_window(spark, ev, tmp_path):
    src = str(tmp_path / "events_parquet2")
    ev.write.parquet(src)
    stream = EV.read_events_stream(spark, src)
    agg = EV.session_windows_stream(stream, gap="30 minutes", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_sessions WHERE user_id = 1").collect()
    assert len(rows) == 2  # 39-min gap splits user 1 into two sessions
    q.stop()


def test_stream_static_enrich_end_to_end(spark, ev, tmp_path):
    """Real readStream joined to a static dim == the batch join."""
    from airflow_subscription_etl_spark.sources.io import read_star_table

    src = str(tmp_path / "events_enrich")
    ev.write.parquet(src)
    dim = read_star_table(spark, "/root/testdata/sf0.001", "customer")
    stream = EV.read_events_stream(spark, src)
    out = EV.enrich_stream_with_dim(stream, dim)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(customer_name) AS named FROM t_enrich"
    ).collect()[0]
    q.stop()
    batch = EV.enrich_stream_with_dim(ev, dim)
    expect_n = batch.count()
    expect_named = batch.filter("customer_name IS NOT NULL").count()
    assert (got["n"], got["named"]) == (expect_n, expect_named)
    assert expect_named > 0


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def test_streaming_tws_user_totals(spark, ev, tmp_path):
    """transformWithStateInPandas (new-gen stateful API) accumulates
    per-user state across micro-batches and matches the
    applyInPandasWithState operator's semantics.

    The streaming leg needs the ``protobuf`` package (the TWS state
    server speaks protobuf to the Python worker); environments without
    it still verify the batch fallback below."""
    if not _has_protobuf():
        a = {r["user_id"]: r["n_events"] for r in EV.tws_user_totals(ev).collect()}
        b = {
            r["user_id"]: r["n_events"]
            for r in EV.stateful_user_totals(ev).collect()
        }
        assert a == b == {1: 4, 2: 1}
        pytest.skip("protobuf not installed — TWS streaming leg unavailable")
    src = str(tmp_path / "events_tws")
    ev.repartition(2).write.parquet(src)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = EV.read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            EV.tws_user_totals(stream)
            .writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT max(n_events) AS n FROM t_tws WHERE user_id = 1"
        ).collect()
        assert rows[0]["n"] == 4
        q.stop()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    # batch fallback mirrors the old-API operator exactly
    a = {r["user_id"]: r["n_events"] for r in EV.tws_user_totals(ev).collect()}
    b = {
        r["user_id"]: r["n_events"] for r in EV.stateful_user_totals(ev).collect()
    }
    assert a == b == {1: 4, 2: 1}


def test_streaming_checkpoint_restart_resumes_state(spark, ev, tmp_path):
    """A stateful streaming query stopped and RESTARTED from its
    checkpoint continues accumulating (state survives process
    boundaries) — the recovery contract a 1000-executor job relies on.
    Sink is the repo's foreachBatch snapshot (memory sinks don't
    support checkpoint recovery)."""
    from airflow_subscription_etl_spark.streaming import sinks as SK

    src = str(tmp_path / "events_ckpt_src")
    ckpt = str(tmp_path / "events_ckpt")
    root = str(tmp_path / "events_ckpt_snap")
    ev.filter(F.col("event_id") <= 3).write.parquet(src)

    def run_round():
        stream = EV.read_events_stream(spark, src, max_files_per_trigger=1)
        q = SK.start_keyed_snapshot_sink(
            EV.stateful_user_totals(stream),
            root,
            keys=["user_id"],
            order_col="n_events",
            checkpoint=ckpt,
        )
        q.awaitTermination(120)
        q.stop()

    run_round()
    first = {
        r["user_id"]: r["n_events"]
        for r in SK.read_snapshot(spark, root).collect()
    }
    # second batch of data lands AFTER the first query stopped
    ev.filter(F.col("event_id") > 3).write.mode("append").parquet(src)
    run_round()
    resumed = {
        r["user_id"]: r["n_events"]
        for r in SK.read_snapshot(spark, root).collect()
    }
    # user 1 had 3 events pre-stop; post-restart the 4th arrives and the
    # checkpointed state continues from 3 -> 4 (not a fresh 1); the
    # restarted source also does NOT re-emit already-committed files
    assert first[1] == 3
    assert resumed[1] == 4
    assert resumed[2] == first.get(2, resumed[2])
