"""Event-stream operators (north star; SURVEY.md §2.8, §7.6).

The reference has no streaming surface; these are the Structured
Streaming extensions over the ``events`` table. Every transform is
written against a plain DataFrame, so the SAME function body serves
batch (testdata parquet — and the DuckDB oracle) and streaming
(``spark.readStream`` with EVENTS_SCHEMA) — the Structured Streaming
unification. Watermarks only apply on the streaming path.

State-store posture at scale: windowed aggs and
dropDuplicatesWithinWatermark key state by (window/key) in the state
store; watermarks bound state size. ``sessionize_batch`` is the
batch gaps-and-islands equivalent of ``F.session_window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    duration: str = "10 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.

    Batch: plain groupBy on the window struct. Streaming: add a
    watermark so late rows beyond it are dropped and state expires.
    """
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.window("ts", duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window event counts (each row lands in duration/slide
    windows)."""
    if watermark and events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows via F.session_window (streaming path).

    Session state merges as events arrive; the watermark closes
    sessions and evicts state.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization (gaps-and-islands), oracle-expressible.

    session break when the gap to the previous event of the same user
    exceeds ``gap_minutes``; session_id = cumulative count of breaks.
    Two window functions over one shuffle on user_id; deterministic
    order (ts, event_id).
    """
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    # microsecond-exact gap test (a plain timestamp→long cast truncates
    # to seconds and can misclassify borderline gaps)
    gap_us = gap_minutes * 60 * 1_000_000
    with_break = events.withColumn(
        "is_break",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > gap_us,
            1,
        )
        .otherwise(0),
    )
    with_sess = with_break.withColumn(
        "session_seq",
        F.sum("is_break").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-event-id dedup with bounded state.

    Streaming: dropDuplicatesWithinWatermark keeps only in-watermark
    keys in the state store. Batch: plain dropDuplicates.
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event count + value sum
    maintained across micro-batches via ``applyInPandasWithState``.

    The canonical "operator Spark lacks" escape hatch (SURVEY.md §2.8):
    arbitrary per-key state with explicit update semantics. State is one
    (count, sum) pair per user — O(keys) in the state store, bounded and
    skew-free; batches arrive Arrow-encoded (no per-row Python objects).

    Streaming only (state needs a state store); the batch equivalent of
    the same result is a plain groupBy — provided here as the fallback
    so the same call works in both modes.
    """
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")
        )

    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "sum_value": s}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        stateStructType="n bigint, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user totals on Spark 4's NEW-GENERATION stateful API
    (``transformWithStateInPandas`` + ``StatefulProcessor``) — the
    successor to ``applyInPandasWithState`` (kept above for parity):
    named state variables with independent schemas/TTL, explicit
    lifecycle (init/handleInputRows/close), timers, and RocksDB-backed
    state. Same semantics as :func:`stateful_user_totals`, so the two
    APIs are directly comparable in tests.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` Python package (the TWS state-server protocol) when
    streaming. Batch fallback: plain groupBy, same logical result.
    """
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value")
        )

    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, s DOUBLE")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].fillna(0.0).sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "sum_value": s}]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotals(),
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def read_events_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source streaming read of the events table (schema pinned —
    streaming sources cannot infer)."""
    from ..schemas import EVENTS_SCHEMA

    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def purchase_attribution_join(
    events: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the
    clicks of the SAME user in the preceding ``attribution_window``.

    The canonical stream-stream join shape: both sides watermarked (so
    the click-side state store can evict rows older than watermark +
    interval), equi key ``user_id`` plus a time-band condition. State
    stays bounded at |active users within the window| — the 100 TB
    posture is the watermark, not partition count.

    Works identically on a batch frame (watermarks become no-ops and
    the band condition is an ordinary range predicate on a shuffled
    equi join), which is how the DuckDB oracle checks the semantics.
    """
    return _attribution_join(events, attribution_window, watermark, "inner")


def _attribution_join(
    events: DataFrame,
    attribution_window: str,
    watermark: str,
    how: str,
) -> DataFrame:
    """Shared purchases⋈clicks interval-join body for the inner and
    left-outer faces (r12 review: the two were character-for-character
    copies apart from the join type, so a band/watermark fix could
    silently land in only one)."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user_id"),
        F.col("ts").alias("click_ts"),
    )
    if events.isStreaming:
        purchases = purchases.withWatermark("purchase_ts", watermark)
        clicks = clicks.withWatermark("click_ts", watermark)
    cond = (
        (purchases.user_id == clicks.click_user_id)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (
            clicks.click_ts
            >= purchases.purchase_ts - F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return purchases.join(clicks, cond, how).select(
        "purchase_id", "user_id", "purchase_ts", "purchase_value",
        "click_id", "click_ts",
    )


def purchase_attribution_left(
    events: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits,
    with click columns null when no click preceded it in the window —
    the semantics :func:`purchase_attribution_join` (inner) cannot
    give ("which conversions were organic?").

    The streaming-specific part: an outer stream-stream join REQUIRES
    both watermarks plus the time-band condition, because the engine
    can only emit the null-padded row once the watermark proves no
    matching click can still arrive — unmatched results are therefore
    delayed by the watermark, a correctness-for-latency trade inner
    joins don't make. Same batch/stream duality as the inner form
    (batch: ordinary left join), which is how the oracle checks it.
    """
    return _attribution_join(
        events, attribution_window, watermark, "left_outer"
    )


def enrich_stream_with_dim(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
) -> DataFrame:
    """STREAM-STATIC join: enrich each event with a slow-changing
    dimension (here customer attributes) — the remaining Structured
    Streaming join shape next to the stream-stream attribution join.

    The static side needs no watermark and holds no state: Spark
    re-plans the dim per micro-batch (so an updated snapshot table is
    picked up batch-over-batch) and broadcasts it when small — at
    100 TB of stream the dim is catalog-sized, so this stays a
    broadcast hash join in every micro-batch. Works identically on a
    batch frame, which is how the equivalence test checks it.
    """
    d = dim.select(
        F.col(dim_key).alias(stream_key),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )
    return events.join(F.broadcast(d), stream_key, "left")
