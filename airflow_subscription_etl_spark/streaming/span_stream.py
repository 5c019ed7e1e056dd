"""Streaming exact-span dedup: clean each arriving micro-batch of
documents against the spans already seen — the incremental face of
:func:`..operators.dedup.span_dedup_rewrite`, completing the same
batch/stream symmetry the MinHash index (:mod:`.dedup_stream`), the RP
index (:mod:`.rp_stream`), the drift monitor and the budget controller
already have.

An ingestion pipeline curating a GROWING corpus cannot re-run the
batch rewrite per epoch (that is the history rescan); it keeps the
chunk-digest catalog as state and cleans only the delta:

- ``cleaned/batch=<id>`` — this epoch's documents, rewritten: a chunk
  whose digest exists in the state (or earlier in this epoch, by
  (doc, pos) order) is a duplicate; a digest whose RUNNING distinct-doc
  count reaches ``boilerplate_df`` this epoch is dropped from this
  epoch's docs entirely. Written with OVERWRITE so a foreachBatch
  replay rewrites identical rows.
- ``state/batch=<id>/bucket=<b>`` — the digest catalog AFTER this
  epoch, ``(chunk_digest, n_docs)``, hash-partitioned into
  ``n_buckets`` digest buckets (``crc32(digest) mod n_buckets``,
  pinned per state root in ``state/_META``). An epoch writes ONLY the
  buckets its delta touched — delta-sized writes, not an O(corpus)
  catalog rewrite per micro-batch (VERDICT r10 #3; the r10 layout
  rewrote the full snapshot each epoch as a poor-man's-Delta trade).
  Each BUCKET's current content is its newest ``batch=<id>`` below
  the reader's epoch, so each epoch still derives its state from
  PREVIOUS epochs' snapshots only (never its own possibly-torn one —
  the budget_stream discipline) and replays stay idempotent by
  construction, per bucket. State discovery goes through :mod:`.fsio`
  (HDFS/object-storage safe).

**Greedy prefix semantics** (the admission-controller analogy):
decisions are FINAL at emission time. The keeper of a digest is its
ARRIVAL-first occurrence (epoch order, then (doc, pos) within the
epoch) — when epochs arrive in document order this equals the batch
operator's globally-first rule, and the per-epoch output is exactly
``span_dedup_rewrite(history ∪ epoch)`` restricted to the epoch's
docs (pinned by test). A digest crossing the boilerplate threshold in
a LATER epoch drops from that epoch onward; documents already emitted
are not retroactively re-cleaned (re-run the batch operator for a
full-corpus re-cure). Each document must be delivered once — epoch
REPLAYS are safe (same prior state → same rows), but delivering one
doc in two different epochs double-counts its digests.

At 100 TB the state is one row per distinct chunk digest — the same
asymptotics as the batch operator's shuffle — and the per-epoch cost
is the delta's chunking plus one digest-keyed join against the
TOUCHED buckets of the catalog (reads AND writes are both
delta-bucket-sized; a Delta/Iceberg MERGE slots in where even that is
too coarse). :func:`prune_span_state` keeps the directory count
bounded: a batch dir is deleted once EVERY bucket in it has
``keep_last`` newer versions, so at most ~``n_buckets + keep_last``
directories stay live."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import bucketed_state as bst

#: default digest-bucket count for the state catalog. 64 keeps listing
#: overhead trivial while a single-digest epoch rewrites 1/64th of the
#: catalog instead of all of it; raise for very large corpora (the
#: value is pinned per state root in ``state/_META`` — changing it on
#: an existing root raises, because the digest→bucket map would shift).
N_STATE_BUCKETS = bst.DEFAULT_BUCKETS

_STATE_SCHEMA = "chunk_digest string, n_docs bigint"


def process_span_batch(
    batch: DataFrame,
    batch_id: int,
    out_root: str,
    span: int = 8,
    boilerplate_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_STATE_BUCKETS,
) -> None:
    """Clean one micro-batch against the running digest catalog and
    advance it. Exposed separately from the stream wiring so batch
    backfills drive the same code path (the module convention).

    Output schema matches the batch operator:
    ``(id, text_clean, n_chunks, n_kept, n_dup_dropped,
    n_boiler_dropped)``."""
    from ..operators.dedup import _chunk_frame  # noqa: PLC0415

    spark = batch.sparkSession
    state_root = f"{out_root}/state"
    bst.check_meta(spark, state_root, n_buckets)

    # the SHARED chunker — stream/batch parity hinges on identical
    # segmentation, so there is exactly one implementation of it
    ch = _chunk_frame(batch, span, id_col, text_col)

    # within-epoch keeper + per-epoch distinct docs via per-digest
    # AGGREGATES (the r11 de-skew, mirroring the batch operator —
    # VERDICT r10: a boilerplate digest occurring in every doc of the
    # epoch collapses map-side instead of funneling one window task),
    # THEN fold in the prior catalog: an occurrence keeps only if its
    # digest is new to history AND it is the epoch's (id, pos)-first
    # AND the running doc count stays under the boilerplate threshold.
    # The doc's first occurrence is encoded '<pos lpad 10><chunk>' so
    # its min runs in HashAggregate (min(struct) would SortAggregate
    # — sort every chunk row); see span_dedup_rewrite.
    first_enc = F.concat(
        F.lpad(F.col("pos").cast("string"), 10, "0"), F.col("chunk")
    )
    # PERSISTED for the epoch (r12 review): every downstream job —
    # the touched-buckets collect, the cleaned write, the state write
    # — consumes occ, and without the cache each re-ran the batch's
    # chunking + md5 pass from scratch (3 passes per epoch). occ is
    # the smallest frame all three share (post the first aggregation),
    # so it is the one to pin; the in-plan subtree-reuse note below
    # only ever covered exchange reuse WITHIN one job.
    occ = ch.groupBy("chunk_digest", id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_cnt"),
        F.min(first_enc).alias("_first"),
    )
    occ = occ.persist()
    try:
        _span_epoch(
            spark,
            occ,
            out_root,
            state_root,
            batch_id,
            boilerplate_df,
            id_col,
            n_buckets,
        )
    finally:
        occ.unpersist()


def _span_epoch(
    spark,
    occ,
    out_root: str,
    state_root: str,
    batch_id: int,
    boilerplate_df: int | None,
    id_col: str,
    n_buckets: int,
) -> None:
    """One epoch's cleaning + state advance over the PERSISTED occ
    frame (split out so the persist/unpersist bracket in
    :func:`process_span_batch` wraps every action, including the
    touched-buckets collect)."""
    bucket = bst.bucket_expr("chunk_digest", n_buckets)
    snaps = bst.bucket_snapshots(spark, state_root, int(batch_id), n_buckets)
    if snaps:
        # the buckets this epoch's delta touches — the ONLY buckets
        # whose prior state the join needs. One extra pass over the
        # DELTA (≤ n_buckets driver-side values), never the catalog;
        # skipped entirely on a cold start (nothing to read anyway).
        touched = {
            r["b"]
            for r in occ.select(bucket.alias("b")).distinct().collect()
        }
        prior = bst.read_buckets(spark, snaps, _STATE_SCHEMA, touched)
    else:
        prior = None
    if prior is None:
        prior = spark.createDataFrame([], _STATE_SCHEMA)
    dig = occ.groupBy("chunk_digest").agg(
        F.min(F.struct(F.col(id_col), F.col("_first")))
        .getField(id_col)
        .alias("_keeper_id"),
        # sum(_cnt > 0) == count(1) here — deliberately consumes _cnt
        # so both occ consumers share one canonical subtree and the
        # epoch's chunking runs once (see span_dedup_rewrite)
        F.sum((F.col("_cnt") > 0).cast("bigint")).alias("_bdocs"),
    )
    flagged = (
        # shuffle_hash: dig is one row per distinct epoch digest and
        # occ is already digest-keyed — skip SMJ's sorts (see
        # span_dedup_rewrite); AQE may still broadcast a small epoch
        occ.join(dig.hint("shuffle_hash"), "chunk_digest")
        # plain digest-keyed join: the catalog is corpus-sized, so the
        # join strategy is AQE's call (broadcast only while it is small)
        .join(prior, "chunk_digest", "left")
        .withColumn("_hist", F.coalesce(F.col("n_docs"), F.lit(0)))
        .withColumn(
            "_boiler",
            F.lit(boilerplate_df is not None)
            & (
                F.col("_hist") + F.col("_bdocs")
                >= F.lit(boilerplate_df or 0)
            ),
        )
        .withColumn(
            "_keep",
            ~F.col("_boiler")
            & (F.col("_hist") == 0)
            & (F.col(id_col) == F.col("_keeper_id")),
        )
    )
    cleaned = (
        flagged.groupBy(id_col)
        .agg(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("_keep"), F.col("_first"))
                            )
                        ),
                        lambda x: x.substr(F.lit(11), F.length(x)),
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("text_clean"),
            F.sum("_cnt").alias("n_chunks"),
            F.sum(F.col("_keep").cast("bigint")).alias("n_kept"),
            F.sum(
                F.when(F.col("_boiler"), F.col("_cnt")).otherwise(F.lit(0))
            ).alias("n_boiler_dropped"),
        )
        .select(
            id_col,
            "text_clean",
            "n_chunks",
            "n_kept",
            (
                F.col("n_chunks") - F.col("n_kept") - F.col("n_boiler_dropped")
            ).alias("n_dup_dropped"),
            "n_boiler_dropped",
        )
    )
    cleaned.write.mode("overwrite").parquet(
        f"{out_root}/cleaned/batch={int(batch_id)}"
    )

    # next state: prior counts + this epoch's distinct docs per digest
    # (docs are delivered once, so cross-epoch sums stay exact);
    # reuses the per-digest agg the cleaning pass already defined
    batch_counts = dig.select("chunk_digest", F.col("_bdocs").alias("_bd"))
    new_state = prior.join(batch_counts, "chunk_digest", "full").select(
        "chunk_digest",
        (
            F.coalesce(F.col("n_docs"), F.lit(0))
            + F.coalesce(F.col("_bd"), F.lit(0))
        ).alias("n_docs"),
    )
    # prior was restricted to touched buckets, so this writes EXACTLY
    # the touched bucket dirs (delta-sized), leaving every other
    # bucket's newest snapshot where it is
    bst.write_buckets(
        new_state,
        "chunk_digest",
        n_buckets,
        f"{state_root}/batch={int(batch_id)}",
    )


def start_span_dedup_stream(
    stream: DataFrame,
    out_root: str,
    checkpoint: str,
    span: int = 8,
    boilerplate_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
    n_buckets: int = N_STATE_BUCKETS,
):
    """Wire a document stream into incremental span dedup: one
    ``process_span_batch`` per micro-batch. ``availableNow`` drains
    the backlog and stops (backfill shape); False for continuous."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, i: process_span_batch(
                b, i, out_root, span, boilerplate_df, id_col, text_col,
                n_buckets,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def prune_span_state(spark, out_root: str, keep_last: int = 2) -> int:
    """Bounded-directory maintenance for the bucketed snapshot chains —
    see :func:`bucketed_state.prune_bucketed_state` (a batch dir is
    deleted once EVERY bucket in it has ``keep_last`` newer versions).
    Returns the number of snapshot dirs removed."""
    return bst.prune_bucketed_state(spark, f"{out_root}/state", keep_last)
