"""Streaming sinks: idempotent foreachBatch upsert into a keyed
parquet snapshot.

Structured Streaming's file sink is append-only; maintaining a
CURRENT-STATE table (latest row per key — the streaming analog of the
reference's M2/M3 in-place updates, subscription_flow.py:232/:240)
needs ``foreachBatch``. Two scale-relevant guarantees:

- **Idempotent on retry**: foreachBatch can re-deliver a batch after a
  failure. The upsert is last-writer-wins per key, so replaying batch
  N over a snapshot that already absorbed batch N is a no-op.
- **Atomic swap**: each upsert writes a NEW snapshot directory then
  flips a pointer file — readers never see a half-written table, and
  the previous snapshot stays for time travel until compacted. This
  is poor-man's Delta (the container has no Delta dep); the interface
  is MERGE-shaped so a Delta writer can drop in.

All pointer/directory IO goes through the Hadoop FileSystem API
(:mod:`.fsio`), so ``root`` may be any filesystem URI the session's
Hadoop conf can resolve (``hdfs://``, ``s3a://``, bare local path) —
the pointer flip is POSIX-atomic locally and delete+rename elsewhere,
which the pointer READ absorbs with one retry (see fsio docstring).

At 100 TB the full-snapshot rewrite is the wrong physical plan —
that's what Delta/Iceberg MERGE with file skipping is for — but the
operator SEMANTICS (keyed last-writer-wins upsert of each micro-batch)
are exactly what those would run; document-and-swap, per SURVEY §7.4.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import fsio

_POINTER = "_CURRENT"


def _resolve_pointer_name(spark: SparkSession, root: str, name: str) -> str:
    """Resolve a pointer value to the directory it MEANS, absorbing the
    one crash window the batch-0 replay's write-aside leaves (ADVICE
    r13): the pointer parks on ``.snapshot_<id>.inprogress`` during the
    swap, and a crash between the aside's rename onto ``snapshot_<id>``
    and the final pointer flip leaves the pointer naming a directory
    the rename just moved away. The ONLY operation that removes the
    aside is that rename, so when the aside name's directory is gone
    the destination holds the identical, complete content — resolve
    there instead of dangling. While the aside still exists (crash
    before the rename) the name resolves to itself: the aside IS the
    complete snapshot then."""
    import re  # noqa: PLC0415

    m = re.fullmatch(r"\.snapshot_(\d+)\.inprogress", name)
    if m and not fsio.exists(spark, f"{root}/{name}"):
        return f"snapshot_{m.group(1)}"
    return name


def _current_dir(spark: SparkSession, root: str) -> str | None:
    name = fsio.read_text(spark, f"{root}/{_POINTER}")
    if not (name and name.strip()):
        # Distinguish a cold start from a mid-swap miss (ADVICE r10):
        # on HDFS the pointer swap is delete-then-rename, and a reader
        # landing inside that window would otherwise mistake existing
        # state for "no prior snapshot" — silently resetting the
        # dedup index / budget ledger. If snapshots exist, retry with
        # backoff and then REFUSE rather than return None.
        if not list_snapshots(spark, root):
            return None
        name = fsio.read_text(spark, f"{root}/{_POINTER}", retries=20)
        if not (name and name.strip()):
            newest = list_snapshots(spark, root)[-1]
            raise RuntimeError(
                f"snapshot pointer {root}/{_POINTER} is unreadable but "
                "snapshots exist on disk — a mid-swap read did not "
                "resolve; refusing to treat existing state as a cold "
                "start. Manual recovery: recreate the pointer with the "
                f"newest snapshot name, e.g. fsio.write_text_atomic("
                f"spark, '{root}/{_POINTER}', 'snapshot_{newest}'). "
                "(The WRITER self-heals without this: upsert_batch "
                "falls back to the newest snapshot below its replayed "
                "batch id.)"
            )
    return f"{root}/{_resolve_pointer_name(spark, root, name.strip())}"


def read_snapshot(spark: SparkSession, root: str) -> DataFrame | None:
    cur = _current_dir(spark, root)
    return spark.read.parquet(cur) if cur else None


def upsert_batch(
    batch: DataFrame,
    root: str,
    keys: list[str],
    order_col: str,
    batch_id: int,
) -> None:
    """Merge one micro-batch into the snapshot: per key keep the row
    with the greatest ``order_col`` (ties → incoming batch wins).

    The merge base is ID-BASED, never the pointer: the newest snapshot
    with id STRICTLY BELOW ``batch_id`` — exactly the state the batch's
    original attempt saw. Two failure modes force this (r12 review,
    REPRODUCED live):

    - **Same-id replay** (the real foreachBatch retry contract — a
      failed batch is re-delivered under the SAME id, not a new one):
      reading the pointer would read ``snapshot_<batch_id>`` itself
      and then OVERWRITE the directory being read mid-job — with AQE
      off the write job dies on FILE_NOT_EXIST after already deleting
      the committed parquet files, leaving ``_CURRENT`` pointing at a
      gutted directory. Strictly-below never reads the dir it writes.
    - **Pointer loss in the write/flip crash window** (ADVICE r11):
      the writer needs no pointer at all, so a missing ``_CURRENT``
      cannot wedge replays; the next upsert re-flips it.

    Requires monotonic batch ids per root (one checkpoint lineage —
    what foreachBatch provides). A fresh checkpoint pointed at an
    EXISTING root would restart ids at 0 and silently orphan the
    accumulated state, so ids from the root's future raise instead.

    On a COMPLETED-replay (``snapshot_<batch_id>`` already on disk —
    the prior attempt finished its write and possibly flipped the
    pointer before the batch failed), the rewrite goes WRITE-ASIDE
    (ADVICE r12): the merged result lands in a hidden
    ``.snapshot_<id>.inprogress`` dir and only then is the old
    directory swapped out by delete+rename, with the pointer kept on a
    READABLE directory throughout — the merge base when one exists
    (readers see the consistent pre-batch state for the whole merge
    job), else the COMPLETED aside itself (replay of batch 0 has no
    merge base; the aside holds the identical idempotent result, and
    parking the pointer there means no instant exists where readers
    see pointer-missing-and-no-snapshots, i.e. a silent cold start —
    the r13 review's window: the old delete-the-pointer scheme left
    ``list_snapshots`` empty between delete(dest) and rename, and a
    crash there made the cold start PERSISTENT). A reader that
    resolved the pointer just before the final swap and reads lazily
    across it can still hit FILE_NOT_EXIST — loud, retryable, and
    bounded by the delete+rename window, never a silent state reset.
    A crash mid-swap leaves the pointer RESOLVING to a complete
    directory (merge base or aside) and the next replay heals the
    layout: the one window where the pointer's raw VALUE dangles —
    between the aside's rename onto ``snapshot_<id>`` and the final
    flip — is absorbed at read time by :func:`_resolve_pointer_name`
    (ADVICE r13), which maps a gone aside name to its rename
    destination, the only place it can have moved.
    """
    if not keys:
        raise ValueError(
            "keys must be non-empty: an empty key list would collapse "
            "the whole keyed snapshot to a single row"
        )
    spark = batch.sparkSession
    ids = list_snapshots(spark, root)
    if ids and max(ids) > int(batch_id):
        raise RuntimeError(
            f"snapshot root {root} already holds snapshot_{max(ids)} — "
            f"newer than this batch id {batch_id}. Batch ids must be "
            "monotonic per root (same checkpoint lineage); a fresh "
            "checkpoint needs a fresh root (or start beyond the last "
            "snapshot id), otherwise the existing state would be "
            "silently orphaned"
        )
    # merge base from the ONE listing above (VERDICT r12 #6 — the
    # guard listed, then read_snapshot_at listed again): the newest
    # snapshot STRICTLY BELOW this batch id.
    below = [i for i in ids if i < int(batch_id)]
    prev = (
        spark.read.parquet(f"{root}/snapshot_{max(below)}")
        if below
        else None
    )
    prio = batch.withColumn("__new", F.lit(1))
    merged = (
        prev.withColumn("__new", F.lit(0)).unionByName(prio)
        if prev is not None
        else prio
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("__new").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__new")
    )
    dest = f"{root}/snapshot_{batch_id}"
    if int(batch_id) in ids:
        # completed-replay path (see docstring): keep the pointer on a
        # readable directory at every instant while swapping dest out.
        tmp = f"{root}/.snapshot_{batch_id}.inprogress"
        if below:
            # readers see the pre-batch state for the whole merge job
            fsio.write_text_atomic(
                spark, f"{root}/{_POINTER}", f"snapshot_{max(below)}"
            )
        else:
            # r14 review: a CRASHED prior replay attempt may have left
            # the pointer parked on the aside this rewrite is about to
            # mode("overwrite") — which deletes the dir at job START,
            # so readers would resolve into a half-written aside for
            # the whole write job (the silent-partial read this module
            # exists to prevent). Re-point at dest FIRST: it exists
            # (that is what routed us into this branch) and holds the
            # identical complete content by idempotence.
            fsio.write_text_atomic(
                spark, f"{root}/{_POINTER}", f"snapshot_{batch_id}"
            )
        latest.write.mode("overwrite").parquet(tmp)
        if not below:
            # no merge base (replay of the root's only snapshot): park
            # the pointer on the now-COMPLETE aside — identical content
            # by idempotence — so no reader ever sees pointer-missing
            # with zero snapshot dirs (a silent cold start, persistent
            # if we crash mid-swap). compact_snapshots never GCs an
            # aside the pointer names.
            fsio.write_text_atomic(
                spark,
                f"{root}/{_POINTER}",
                f".snapshot_{batch_id}.inprogress",
            )
        fsio.replace_dir(spark, tmp, dest)
    else:
        latest.write.mode("overwrite").parquet(dest)
    fsio.write_text_atomic(
        spark, f"{root}/{_POINTER}", f"snapshot_{batch_id}"
    )


def list_snapshots(spark: SparkSession, root: str) -> list[int]:
    """Batch ids of every snapshot still on disk, ascending — the
    time-travel index the pointer-swap sink accumulates (each upsert
    writes ``snapshot_<batch_id>`` and leaves the previous ones until
    :func:`compact_snapshots`)."""
    import re  # noqa: PLC0415

    return sorted(
        int(m.group(1))
        for m in (
            re.fullmatch(r"snapshot_(\d+)", name)
            for name in fsio.list_names(spark, root)
        )
        if m
    )


def read_snapshot_at(
    spark: SparkSession, root: str, batch_id: int
) -> DataFrame | None:
    """Time travel: the keyed state AS OF ``batch_id`` — the newest
    snapshot with id ≤ batch_id still on disk (None before the first
    batch, or when compaction already dropped that history). The
    poor-man's-Delta ``VERSION AS OF``; an audit of what the state
    looked like when batch N committed."""
    ids = [i for i in list_snapshots(spark, root) if i <= batch_id]
    return (
        spark.read.parquet(f"{root}/snapshot_{max(ids)}") if ids else None
    )


def compact_snapshots(
    spark: SparkSession, root: str, keep_last: int = 2
) -> int:
    """Drop all but the ``keep_last`` newest snapshot directories —
    the bounded-history maintenance the pointer-swap sink needs (every
    upsert adds a full snapshot; unpruned, disk grows with epoch
    count × state size). The CURRENT pointer's snapshot is always
    kept regardless of age (a reader resolving the pointer mid-prune
    must never lose its directory), and ``keep_last ≥ 2`` keeps the
    previous snapshot too, so an in-flight upsert's read side is
    never pruned under it. SINGLE-WRITER discipline: run between
    batches, like any compaction. Returns the number of snapshots
    removed."""
    import re  # noqa: PLC0415

    if keep_last < 2:
        raise ValueError(f"keep_last must be >= 2, got {keep_last}")
    # ONE root listing serves both the snapshot-id walk and the aside
    # GC below (the upsert_batch folded-listing discipline, r13)
    names = fsio.list_names(spark, root)
    ids = sorted(
        int(m.group(1))
        for m in (re.fullmatch(r"snapshot_(\d+)", n) for n in names)
        if m
    )
    cur = _current_dir(spark, root)
    keep = {f"{root}/snapshot_{i}" for i in ids[-keep_last:]}
    if cur:
        keep.add(cur)
    removed = 0
    for i in ids:
        path = f"{root}/snapshot_{i}"
        if path not in keep:
            fsio.delete(spark, path)
            removed += 1
    # a crash between upsert_batch's replay write-aside and its rename
    # leaves a hidden .snapshot_<id>.inprogress dir; it is invisible to
    # list_snapshots and every reader, so compaction is its only GC —
    # EXCEPT an aside the pointer currently names (the batch-0-replay
    # crash state: the aside IS the readable current state until the
    # next replay completes the swap)
    for name in names:
        path = f"{root}/{name}"
        if re.fullmatch(r"\.snapshot_\d+\.inprogress", name) and path != cur:
            fsio.delete(spark, path)
    return removed


# --------------------------------------------------------------------
# Unified keyed-state face (VERDICT r11 #5). upsert_batch (full
# snapshot + pointer) and bucketed_state.upsert_keyed_buckets (crc32
# bucket chains) share last-writer-wins semantics and idempotent
# replay; they differ only in IO shape, and callers previously chose
# by MODULE. One entry point, the trade documented once:
#
# - ``layout="snapshot"`` rewrites the FULL state per epoch behind an
#   atomic pointer, keeping history for time travel
#   (:func:`read_snapshot_at`). Right when the state is CATALOG-sized
#   — per-source totals, a pair matrix, anything whose row count is
#   bounded by a catalog, not the corpus — where a full rewrite is a
#   few MB and the pointer gives cheap audits.
# - ``layout="bucketed"`` rewrites only the bucket chains the batch's
#   keys hash into. Right when the state is CORPUS-KEYED — one row per
#   document (a MinHash signature index, a chunk-digest catalog) —
#   where a full rewrite per micro-batch is O(corpus) write
#   amplification and per-epoch IO must stay delta-sized.
#
# Rule of thumb: state that grows with the DATA → bucketed; state that
# grows with a CATALOG → snapshot.


def _validate_layout_args(
    keys: list[str], layout: str, n_buckets: int | None
) -> None:
    """Argument validation shared by the unified face and the sink
    starter — statically checkable, so the starter fails SYNCHRONOUSLY
    at wiring time instead of surfacing a ValueError as an async
    StreamingQueryException inside batch 0 (r12 review)."""
    if not keys:
        raise ValueError(
            "keys must be non-empty: an empty key list would put every "
            "row in one window partition and collapse the whole keyed "
            "snapshot to a single row"
        )
    if layout == "snapshot":
        if n_buckets is not None:
            raise ValueError("n_buckets only applies to layout='bucketed'")
    elif layout == "bucketed":
        if len(keys) != 1:
            raise ValueError(
                "layout='bucketed' supports exactly one key column "
                f"(got {keys!r}): its merge is keyed on that column, so "
                "a composite key would be collapsed per first component "
                "— use layout='snapshot' or a pre-concatenated key"
            )
    else:
        raise ValueError(f"unknown layout {layout!r}")


def upsert_keyed_state(
    batch: DataFrame,
    root: str,
    keys: list[str],
    order_col: str,
    batch_id: int,
    layout: str = "snapshot",
    n_buckets: int | None = None,
) -> None:
    """Last-writer-wins keyed upsert of one micro-batch, dispatching
    on ``layout`` (see the trade above). The bucketed layout requires
    exactly ONE key column (its merge window and crc32 bucket map are
    both keyed on that single column — silently bucketing a composite
    key by its first component would also DEDUP by that component
    alone, collapsing distinct composite keys); it defaults
    ``n_buckets`` to :data:`bucketed_state.DEFAULT_BUCKETS`."""
    from . import bucketed_state  # noqa: PLC0415 — avoid import cycle

    _validate_layout_args(keys, layout, n_buckets)
    if layout == "snapshot":
        upsert_batch(batch, root, keys, order_col, batch_id)
    else:
        bucketed_state.upsert_keyed_buckets(
            batch,
            root,
            keys[0],
            order_col,
            batch_id,
            n_buckets=n_buckets or bucketed_state.DEFAULT_BUCKETS,
        )


def read_keyed_state(
    spark: SparkSession,
    root: str,
    layout: str = "snapshot",
    before_batch: int | None = None,
) -> DataFrame | None:
    """Current keyed state under either layout; ``before_batch``
    bounds the read to snapshots with batch id STRICTLY below it (the
    in-epoch reader view — an epoch must never read its own possibly-
    torn write). None on a cold start."""
    from . import bucketed_state  # noqa: PLC0415

    if layout == "snapshot":
        if before_batch is None:
            return read_snapshot(spark, root)
        return read_snapshot_at(spark, root, int(before_batch) - 1)
    if layout == "bucketed":
        return bucketed_state.read_keyed_state(spark, root, before_batch)
    raise ValueError(f"unknown layout {layout!r}")


def start_keyed_snapshot_sink(
    stream: DataFrame,
    root: str,
    keys: list[str],
    order_col: str,
    checkpoint: str,
    trigger_available_now: bool = True,
    layout: str = "snapshot",
    n_buckets: int | None = None,
):
    """Wire a streaming DataFrame into the keyed upsert — either
    discipline, through the unified face (see the layout trade above).
    Returns the StreamingQuery; callers own awaitTermination/stop.
    Misconfiguration (unknown layout, composite bucketed key, stray
    n_buckets) raises HERE, before any checkpoint/root dir is
    created."""
    _validate_layout_args(keys, layout, n_buckets)
    fsio.mkdirs(stream.sparkSession, root)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        upsert_keyed_state(
            batch,
            root,
            keys,
            order_col,
            batch_id,
            layout=layout,
            n_buckets=n_buckets,
        )

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
