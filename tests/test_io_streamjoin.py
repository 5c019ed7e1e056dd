"""Source-format round-trips (CSV / NDJSON / partitioned parquet) and
the stream-stream attribution join (batch semantics + a real
two-watermark streaming run)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from airflow_subscription_etl_spark.schemas import EVENTS_SCHEMA
from airflow_subscription_etl_spark.sources import io as IO
from airflow_subscription_etl_spark.streaming.events import (
    purchase_attribution_join,
)


@pytest.fixture()
def part_df(spark):
    return IO.read_star_table(spark, "/root/testdata/sf0.001", "part").limit(200)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_round_trip_preserves_rows_and_schema(part_df, tmp_path):
    p = str(tmp_path / "part_csv")
    IO.write_csv_table(part_df, p)
    back = IO.read_csv_table(part_df.sparkSession, p, part_df.schema)
    assert back.schema == part_df.schema
    assert _sorted_rows(back) == _sorted_rows(part_df)


def test_ndjson_round_trip_preserves_rows(part_df, tmp_path):
    p = str(tmp_path / "part_ndjson")
    IO.write_ndjson_table(part_df, p)
    back = IO.read_ndjson_table(part_df.sparkSession, p, part_df.schema)
    assert _sorted_rows(back) == _sorted_rows(part_df)


def test_partitioned_parquet_layout_and_pruning(part_df, tmp_path):
    p = str(tmp_path / "part_parted")
    IO.write_parquet_table(part_df, p, partition_by=["p_brand"])
    # hive-style layout on disk
    assert any(d.startswith("p_brand=") for d in os.listdir(p))
    spark = part_df.sparkSession
    brand = part_df.select("p_brand").first()["p_brand"]
    pruned = spark.read.parquet(p).filter(F.col("p_brand") == brand)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan must carry a partition filter
    assert "PartitionFilters: [" in plan
    assert pruned.count() == part_df.filter(F.col("p_brand") == brand).count()


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


@pytest.fixture()
def attrib_events(spark):
    rows = [
        # user 1: clicks at :00 and :25, purchase at :30 → both attach
        (1, _ts(0), 1, "click", 0.0, "{}"),
        (2, _ts(25), 1, "click", 0.0, "{}"),
        (3, _ts(30), 1, "purchase", 99.0, "{}"),
        # user 2: click 40 min before purchase → outside window
        (4, _ts(0), 2, "click", 0.0, "{}"),
        (5, _ts(45), 2, "purchase", 10.0, "{}"),
        # user 3: click AFTER purchase → never attaches
        (6, _ts(50), 3, "purchase", 5.0, "{}"),
        (7, _ts(55), 3, "click", 0.0, "{}"),
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


def test_attribution_join_batch_semantics(attrib_events):
    out = purchase_attribution_join(attrib_events, "30 minutes")
    got = sorted(
        (r["purchase_id"], r["click_id"]) for r in out.collect()
    )
    assert got == [(3, 1), (3, 2)]  # inclusive 30-min band, same user only


def test_attribution_join_streaming_end_to_end(spark, attrib_events, tmp_path):
    """Real two-sided watermarked stream-stream join via availableNow."""
    src = str(tmp_path / "ev_src")
    attrib_events.write.parquet(src)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    joined = purchase_attribution_join(stream, "30 minutes")
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("t_attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM t_attrib").collect()
    )
    assert got == [(3, 1), (3, 2)]


def test_compact_parquet_reduces_files_preserves_rows(part_df, tmp_path):
    p = str(tmp_path / "frag")
    # fragment: 37 tiny files
    part_df.repartition(37).write.parquet(p)
    import glob
    assert len(glob.glob(p + "/*.parquet")) == 37
    n_files = IO.compact_parquet(part_df.sparkSession, p, target_files=3)
    assert n_files <= 3
    back = part_df.sparkSession.read.parquet(p)
    assert _sorted_rows(back) == _sorted_rows(part_df)


def test_orc_round_trip_preserves_rows_and_pushdown(part_df, tmp_path, spark):
    from airflow_subscription_etl_spark.sources.io import (
        read_orc_table,
        write_orc_table,
    )

    path = str(tmp_path / "part_orc")
    write_orc_table(part_df, path)
    back = read_orc_table(spark, path, part_df.schema)
    assert back.count() == part_df.count()
    assert {f.name for f in back.schema.fields} == {
        f.name for f in part_df.schema.fields
    }
    # predicate pushdown reaches the ORC scan
    plan = (
        back.filter(F.col("p_partkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "p_partkey" in plan.split(
        "PushedFilters"
    )[1][:120]


def test_ndjson_relaxed_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from airflow_subscription_etl_spark.sources.io import read_ndjson_relaxed

    p = tmp_path / "mixed.ndjson"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 3, "name": "fine"}\n'
        '{"id": "not-an-int", "name": "typed-wrong"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    df = read_ndjson_relaxed(spark, str(p), schema).cache()
    clean = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["id"] for r in clean.collect()} == {1, 3}
    # corrupt lines survive verbatim for quarantine/replay
    bad_lines = {r["_corrupt_record"] for r in bad.collect()}
    assert "{this is not json}" in bad_lines
    assert any("not-an-int" in line for line in bad_lines)
    df.unpersist()


def test_attribution_left_join_streaming_emits_unmatched(
    spark, attrib_events, tmp_path
):
    """Stream-stream LEFT OUTER interval join: organic purchases (no
    click in window) emit with null click columns — but ONLY once a
    LATER batch's watermark proves no matching click can still arrive.
    Two far-future heartbeat batches advance the watermark so the
    unmatched state flushes within the run (the latency-for-correctness
    trade outer stream joins make)."""
    import time as _time

    from airflow_subscription_etl_spark.streaming.events import (
        purchase_attribution_left,
        read_events_stream,
    )

    src = str(tmp_path / "events_left")
    attrib_events.coalesce(1).write.parquet(src)
    # heartbeats: watermark computed from batch N's max ts applies in
    # batch N+1 — two advancing batches flush all earlier state
    # each heartbeat advances BOTH sides: the global watermark is the
    # MIN over the two per-side watermarks, so a click-only heartbeat
    # would leave the purchase watermark (and thus eviction) stuck
    for i, hour in enumerate([13, 16]):
        _time.sleep(1.1)  # file-source batches follow modification time
        hb = spark.createDataFrame(
            [
                (100 + i, dt.datetime(2024, 1, 1, hour, 0), 99, "click", 0.0, "{}"),
                (200 + i, dt.datetime(2024, 1, 1, hour, 0), 99, "purchase", 0.0, "{}"),
            ],
            EVENTS_SCHEMA,
        )
        hb.coalesce(1).write.mode("append").parquet(src)
    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        purchase_attribution_left(stream, "30 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("t_left")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql("SELECT * FROM t_left WHERE user_id != 99").collect()
    batch = purchase_attribution_left(attrib_events, "30 minutes")
    got_matched = {
        (r["purchase_id"], r["click_id"]) for r in rows if r["click_id"] is not None
    }
    exp_matched = {
        (r["purchase_id"], r["click_id"])
        for r in batch.collect()
        if r["click_id"] is not None
    }
    assert got_matched == exp_matched
    exp_organic = {
        r["purchase_id"] for r in batch.collect() if r["click_id"] is None
    }
    got_organic = {r["purchase_id"] for r in rows if r["click_id"] is None}
    assert exp_organic and got_organic == exp_organic
