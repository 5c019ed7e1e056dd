"""Streaming maintenance for the materialized RP index: project each
arriving micro-batch once and append it as a new ``batch=<n>``
partition of the index — the streaming face of
:func:`..operators.similarity.write_rp_index`, completing the same
batch/stream symmetry the MinHash index has in :mod:`.dedup_stream`.

An ingestion pipeline serving "project once, probe many" retrieval
cannot rebuild the index per batch (that is the full-corpus rescan);
it projects ONLY the delta. The operator is stateless — validity
filter + one Arrow matmul per batch, no watermark, no keyed state —
so exactly-once reduces to idempotent output:

- each micro-batch writes ``vectors/batch=<epoch+1>`` with OVERWRITE,
  so a foreachBatch REPLAY of the same epoch rewrites the same
  directory, never double-appends (the ``pairs/batch_<id>`` discipline
  of dedup_stream); the base build owns ``batch=0``;
- probes (:func:`..operators.similarity.rp_topk_indexed`) discover new
  partition directories at the next read — index freshness with zero
  rewrite of existing data.

The index is an APPEND-ONLY vector log keyed by nothing: a document
re-ingested under the same id appears twice and scores twice
(identically). Streams that re-deliver ids should dedup upstream or
maintain the keyed pointer-swap snapshot (:mod:`.sinks`) instead —
last-writer-wins upsert is that sink's contract, at the cost of a
snapshot rewrite per batch that this log deliberately avoids.

At 100 TB the per-batch work is the delta's scan + matmul only;
periodic compaction of small ``batch=`` directories is the same
maintenance any streaming parquet sink needs (compaction_plan's cost
model applies unchanged).

The QUERY side streams too (:func:`process_rp_query_batch` /
:func:`start_rp_knn_stream`): each micro-batch of query vectors is
answered by the batched KNN join — one shared narrow index scan per
batch, never a per-query loop — and written to its own ``batch=<id>``
results directory under the same overwrite-own-directory idempotence
discipline as the append side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import rp_projected_frame


def process_rp_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Project one micro-batch against the index's recorded (dims,
    r_dims) and overwrite its own ``batch=<batch_id+1>`` directory.
    Exposed separately from the stream wiring so batch backfills drive
    the same code path (the dedup_stream convention). The meta read is
    1 row per batch — catalog-sized."""
    spark = batch.sparkSession
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    projected = rp_projected_frame(
        batch, int(meta["dims"]), int(meta["r_dims"]), id_col, vec_col
    )
    # overwrite (not append): a replayed epoch rewrites its own dir
    projected.write.mode("overwrite").parquet(
        f"{path}/vectors/batch={int(batch_id) + 1}"
    )


def start_rp_index_append(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
):
    """Wire a vector stream into the index: one ``process_rp_batch``
    per micro-batch. ``availableNow`` drains the backlog and stops
    (backfill shape); pass False for a continuous ingestion query."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, i: process_rp_batch(b, i, path, id_col, vec_col)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def process_rp_query_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    out_root: str,
    k: int = 10,
    candidates: int = 64,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pushdown_limit: int = 8192,
    broadcast_limit: int = 4_000_000,
) -> None:
    """One micro-batch of QUERIES answered against the index: the
    batched KNN join (:func:`..operators.similarity.rp_knn_join_indexed`
    — one shared narrow scan for the whole batch, results identical
    per query to a single-probe loop) written to the batch's OWN
    ``batch=<id>`` directory with OVERWRITE, so a replayed epoch
    rewrites the same rows — the module's idempotence discipline on
    the query side. Exposed separately from the stream wiring so batch
    backfills drive the same code path.

    Queries are independent of each other, so per-batch results equal
    a one-shot join over the union of all batches, restricted to that
    batch's queries (pinned by test). Results reflect the index at
    probe time: a CONCURRENT index-append stream may land rows between
    two query batches (each batch then sees the fresher index — the
    expected streaming semantics); for bit-stable replays across index
    growth, probe a quiesced or snapshot index."""
    from ..cache import released  # noqa: PLC0415
    from ..operators.similarity import rp_knn_join_indexed  # noqa: PLC0415

    res = rp_knn_join_indexed(
        batch.sparkSession, path, batch, k, candidates,
        query_id_col, id_col, vec_col,
        pushdown_limit=pushdown_limit, broadcast_limit=broadcast_limit,
    )
    # released(): huge-regime batches pin a persisted pair frame to
    # the result; a long-lived stream that never releases it leaks one
    # JVM cache block PER MICRO-BATCH (review r8) — scope it to the
    # batch's single write
    with released(res):
        res.write.mode("overwrite").parquet(
            f"{out_root}/batch={int(batch_id)}"
        )


def start_rp_knn_stream(
    stream: DataFrame,
    path: str,
    out_root: str,
    checkpoint: str,
    k: int = 10,
    candidates: int = 64,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_available_now: bool = True,
    pushdown_limit: int = 8192,
    broadcast_limit: int = 4_000_000,
):
    """Wire a query stream into continuous retrieval: one
    ``process_rp_query_batch`` per micro-batch, results landing as
    ``batch=<id>`` partitions under ``out_root``. ``availableNow``
    drains the backlog and stops (backfill shape); pass False for a
    continuous serving query. The rerank regime knobs pass through to
    :func:`..operators.similarity.rp_knn_join_indexed` — a serving
    stream sized for huge batches tunes them here."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, i: process_rp_query_batch(
                b, i, path, out_root, k, candidates,
                query_id_col, id_col, vec_col,
                pushdown_limit=pushdown_limit,
                broadcast_limit=broadcast_limit,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_rp_index(spark, path: str) -> int:
    """Offline compaction: fold the ``batch=<n>`` partitions into a
    single fresh ``batch=0`` — the periodic maintenance the append-only
    log needs once streaming has accumulated many small directories
    (each micro-batch is its own parquet dir; probes then pay one
    file-listing + footer read per batch, the exact small-files cost
    compaction_plan models for any streaming parquet sink).

    REPLAY SAFETY: the HIGHEST-numbered batch directory is preserved
    at its original number, never folded. Structured Streaming has at
    most one in-flight epoch (epoch N+1 starts only after N's commit),
    so only the latest directory can hold a written-but-uncommitted
    epoch; folding it would let the post-restart replay re-append rows
    already in ``batch=0``, duplicating them (review r8). Preserved at
    its original number, a replay OVERWRITES that same directory with
    identical rows — the module's idempotence contract holds across
    compaction. Every older directory is committed by that invariant
    and safe to fold.

    SINGLE-WRITER discipline: run only while no append stream is
    active, like any parquet-sink compaction. The rewrite is written
    ASIDE and swapped in with two renames (``vectors`` →
    ``vectors_old``, ``vectors_compacting`` → ``vectors``) before the
    old copy is deleted — a crash at any step leaves a full copy of
    the data on disk (delete-before-rename would not: review r8), and
    a stale ``vectors_old`` from a crashed run is recovered or cleaned
    on the next call. Directory discovery and the swap go through the
    Hadoop FileSystem API (:mod:`.fsio`), so the index may live on
    HDFS/object storage — on an object store the renames are
    copy+delete (slower, still crash-recoverable by the same
    invariant). Epoch numbering is unaffected: checkpointed
    epoch ids keep increasing, so post-compaction appends never
    collide with the new ``batch=0``. Returns the number of rows
    folded into ``batch=0`` (0 = nothing to fold; one 1-row meta read
    + one count — both bounded)."""
    import re  # noqa: PLC0415

    from . import fsio  # noqa: PLC0415

    vectors_dir = f"{path}/vectors"
    old_dir = f"{path}/vectors_old"
    new_dir = f"{path}/vectors_compacting"
    # recovery from a prior crashed swap: between the two renames the
    # full data sits in vectors_old — restore it; after both, it is a
    # leftover copy — drop it
    if not fsio.is_dir(spark, vectors_dir) and fsio.is_dir(spark, old_dir):
        fsio.rename(spark, old_dir, vectors_dir)
    fsio.delete(spark, old_dir)

    batches = sorted(
        int(m.group(1))
        for m in (
            re.fullmatch(r"batch=(\d+)", name)
            for name in fsio.list_names(spark, vectors_dir)
        )
        if m
    )
    # nothing to fold: base only, a single partition, or an
    # already-compacted layout ({0, tail} with nothing between) — a
    # rewrite would re-copy the whole corpus for zero consolidation
    # and report n>0 as if work was folded (review r8)
    if len(batches) <= 1 or batches[:-1] == [0]:
        return 0
    tail = batches[-1]

    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    vectors = spark.read.schema(meta["vec_schema"]).parquet(vectors_dir)
    data_cols = [f.name for f in vectors.schema.fields if f.name != "batch"]
    folded = (
        vectors.filter(F.col("batch") != tail)
        .select(*data_cols)
        .withColumn("batch", F.lit(0))
    )
    kept = (
        vectors.filter(F.col("batch") == tail)
        .select(*data_cols)
        .withColumn("batch", F.lit(tail))
    )
    folded.unionByName(kept).write.mode("overwrite").partitionBy(
        "batch"
    ).parquet(new_dir)
    n = (
        spark.read.schema(meta["vec_schema"])
        .parquet(new_dir)
        .filter(F.col("batch") != tail)
        .count()
    )
    fsio.rename(spark, vectors_dir, old_dir)
    fsio.rename(spark, new_dir, vectors_dir)
    fsio.delete(spark, old_dir)
    return n
