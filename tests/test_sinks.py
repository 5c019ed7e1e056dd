"""foreachBatch keyed-snapshot sink: upsert semantics, retry
idempotence, and a real streaming run across micro-batches."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airflow_subscription_etl_spark.schemas import EVENTS_SCHEMA
from airflow_subscription_etl_spark.streaming import sinks as SK


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def _batch(spark, rows):
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_upsert_keeps_latest_per_key(spark, tmp_path):
    root = str(tmp_path / "snap")
    b0 = _batch(spark, [
        (1, _ts(0), 1, "click", 1.0, "{}"),
        (2, _ts(1), 2, "click", 2.0, "{}"),
    ])
    SK.upsert_batch(b0, root, keys=["user_id"], order_col="ts", batch_id=0)
    b1 = _batch(spark, [
        (3, _ts(5), 1, "purchase", 9.0, "{}"),   # newer → replaces user 1
        (4, _ts(0), 3, "view", 3.0, "{}"),       # new key
    ])
    SK.upsert_batch(b1, root, keys=["user_id"], order_col="ts", batch_id=1)
    snap = SK.read_snapshot(spark, root)
    got = {r["user_id"]: r["event_id"] for r in snap.collect()}
    assert got == {1: 3, 2: 2, 3: 4}


def test_upsert_is_idempotent_on_replay(spark, tmp_path):
    root = str(tmp_path / "snap")
    b = _batch(spark, [(1, _ts(0), 1, "click", 1.0, "{}")])
    SK.upsert_batch(b, root, keys=["user_id"], order_col="ts", batch_id=0)
    before = sorted(tuple(r) for r in SK.read_snapshot(spark, root).collect())
    # the REAL foreachBatch retry contract: the failed batch is
    # re-delivered under the SAME id (r12 review fixed both this
    # comment — it used to claim "a new batch id" — and the code,
    # which destroyed the snapshot it was reading on this path; the
    # AQE-off reproduction lives in test_round12_fixes)
    SK.upsert_batch(b, root, keys=["user_id"], order_col="ts", batch_id=0)
    after = sorted(tuple(r) for r in SK.read_snapshot(spark, root).collect())
    assert before == after
    # a re-delivery under a later id is equally a no-op
    SK.upsert_batch(b, root, keys=["user_id"], order_col="ts", batch_id=1)
    after2 = sorted(tuple(r) for r in SK.read_snapshot(spark, root).collect())
    assert before == after2


def test_streaming_snapshot_end_to_end(spark, tmp_path):
    """Two parquet files → maxFilesPerTrigger=1 → two micro-batches
    upserted in order; the snapshot holds the latest row per user."""
    src = str(tmp_path / "src")
    _batch(spark, [
        (1, _ts(0), 1, "click", 1.0, "{}"),
        (2, _ts(1), 2, "click", 2.0, "{}"),
    ]).coalesce(1).write.mode("append").parquet(src)
    _batch(spark, [
        (3, _ts(9), 1, "purchase", 5.0, "{}"),
    ]).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    root = str(tmp_path / "snap")
    q = SK.start_keyed_snapshot_sink(
        stream, root, keys=["user_id"], order_col="ts",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    snap = SK.read_snapshot(spark, root)
    got = {r["user_id"]: (r["event_id"], r["event_type"]) for r in snap.collect()}
    assert got[2] == (2, "click")
    assert got[1] == (3, "purchase")  # later batch won
    # snapshot history retained for time travel until compaction
    assert snap.count() == 2
