"""Digest-bucketed snapshot-chain state, shared by the streaming
maintainers that keep a corpus-scale KEYED catalog as out-of-band
state (:mod:`.span_stream`'s chunk-digest catalog, :mod:`.
source_matrix_stream`'s (digest, source) catalog).

Layout: ``<state_root>/batch=<id>/bucket=<b>`` with ``b =
crc32(key) mod n_buckets`` (the modulus pinned in
``<state_root>/_META`` — changing it on an existing root would
silently route keys to the wrong prior bucket, so it raises). An
epoch reads and REWRITES only the buckets its delta touches —
delta-sized IO, never an O(corpus) catalog rewrite per micro-batch —
and each BUCKET's current content is its newest ``batch=<id>`` below
the reader's epoch, so every epoch derives its state from PREVIOUS
epochs' snapshots only (never its own possibly-torn one — the
budget_stream discipline) and replays stay idempotent by
construction, per bucket.

All listing/pointer IO goes through :mod:`.fsio` (HDFS/object-store
safe). Everything here is driver-side control-plane work on ≤
``n_buckets × retained-epochs`` paths.

LAYERING (r13, closing VERDICT r12 #5): this module is the package's
INTERNAL storage layer, with exactly two supported caller styles:

- **Last-writer-wins keyed state** goes through the unified face
  :func:`.sinks.upsert_keyed_state` / :func:`.sinks.read_keyed_state`
  with ``layout="bucketed"`` — which dispatch to
  :func:`upsert_keyed_buckets` / :func:`read_keyed_state` here. No
  in-package caller invokes those two directly anymore
  (dedup_stream migrated in r13), and external callers shouldn't
  either: the face validates arguments synchronously and documents
  the snapshot-vs-bucketed trade in one place.
- **Custom-merge maintainers** whose per-epoch merge is NOT
  last-writer-wins (span_stream's additive chunk-digest catalog,
  source_matrix_stream's (digest, source) catalog + pair matrix)
  compose the bucket primitives directly — :func:`bucket_expr`,
  :func:`check_meta`, :func:`bucket_snapshots`, :func:`read_buckets`,
  :func:`write_buckets`, :func:`latest_plain_snapshot`,
  :func:`prune_bucketed_state`. These are deliberate building blocks,
  not a parallel face: a merge the LWW window can't express has to
  own its read-merge-write cycle.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import functions as F

from . import fsio

#: default bucket count — see span_stream.N_STATE_BUCKETS's rationale
DEFAULT_BUCKETS = 64


def bucket_expr(key_col: str, n_buckets: int):
    """The key→bucket map: ``crc32(string(key)) mod n_buckets`` as int
    (the cast makes integer keys bucketable; for string keys it is a
    no-op, so digest-keyed layouts are unchanged).

    NULL keys coalesce to '' BEFORE hashing (r12 review): crc32(NULL)
    is NULL, which partitionBy routes to ``bucket=__HIVE_DEFAULT_
    PARTITION__`` — a directory the ``bucket=(\\d+)`` snapshot walk
    never matches, so null-keyed rows would be written once and then
    SILENTLY DROPPED from every later read. Coalescing keeps them in a
    real numbered bucket and round-tripping (they merge as one key,
    since window partitionBy groups nulls together). Only the NULL
    mapping changes — non-null keys hash exactly as before, so
    existing state roots stay format-compatible. A '' key shares the
    null key's bucket, which is harmless: bucket placement is not
    identity, the merge window still keys on the real column."""
    return F.pmod(
        F.crc32(F.coalesce(F.col(key_col).cast("string"), F.lit(""))),
        F.lit(n_buckets),
    ).cast("int")


def check_meta(spark, state_root: str, n_buckets: int) -> None:
    """Pin ``n_buckets`` in ``state_root/_META`` on first use; refuse a
    mismatching value later."""
    txt = fsio.read_text(spark, f"{state_root}/_META")
    if txt is None:
        fsio.mkdirs(spark, state_root)
        fsio.write_text_atomic(
            spark, f"{state_root}/_META", json.dumps({"n_buckets": n_buckets})
        )
        return
    pinned = json.loads(txt)["n_buckets"]
    if pinned != n_buckets:
        raise ValueError(
            f"bucketed state at {state_root} was created with n_buckets="
            f"{pinned}; got {n_buckets} — the key->bucket map is part of "
            "the state format and cannot change on an existing root"
        )


def bucket_snapshots(
    spark, state_root: str, before_batch: int, n_buckets: int | None = None
) -> dict[int, str]:
    """bucket → path of its newest snapshot with batch id <
    ``before_batch``.

    Walks batch dirs NEWEST-FIRST and stops as soon as every bucket
    has found its newest snapshot (VERDICT r11 #4): with prune
    deferred, a long root's older dirs are never even listed, keeping
    the driver-side listing O(n_buckets) regardless of retained-epoch
    count. Maintainers that just ran :func:`check_meta` pass the
    pinned ``n_buckets`` to skip a second ``_META`` read (r12 review);
    external readers leave it None and it is read from ``_META``."""
    if n_buckets is None:
        meta = fsio.read_text(spark, f"{state_root}/_META")
        n_buckets = json.loads(meta)["n_buckets"] if meta else None
    ids = sorted(
        (
            int(m.group(1))
            for m in (
                re.fullmatch(r"batch=(\d+)", name)
                for name in fsio.list_names(spark, state_root)
            )
            if m and int(m.group(1)) < before_batch
        ),
        reverse=True,
    )
    chosen: dict[int, str] = {}
    for b_id in ids:
        if n_buckets is not None and len(chosen) >= n_buckets:
            break  # every bucket already has its newest snapshot
        for name in fsio.list_names(spark, f"{state_root}/batch={b_id}"):
            m = re.fullmatch(r"bucket=(\d+)", name)
            if m and int(m.group(1)) not in chosen:
                chosen[int(m.group(1))] = f"{state_root}/batch={b_id}/{name}"
    return chosen


def read_buckets(spark, snaps: dict[int, str], schema: str, buckets):
    """Union-read the chosen buckets' snapshots (all when ``buckets``
    is None); None when nothing matches."""
    paths = [p for b, p in snaps.items() if buckets is None or b in buckets]
    if not paths:
        return None
    return spark.read.schema(schema).parquet(*paths)


def write_buckets(df, key_col: str, n_buckets: int, path: str) -> None:
    """Write ``df`` bucket-partitioned under ``path`` — one file per
    bucket (the repartition collapses the write; partitionBy alone
    would cut every shuffle partition into every bucket dir).

    The overwrite is pinned STATIC (ADVICE r11): replay cleanup relies
    on mode("overwrite") clearing the whole replayed ``batch=<id>``
    dir. Under a session-level ``partitionOverwriteMode=dynamic``,
    only partitions present in the replay's df would be replaced — a
    failed attempt's stale bucket dirs would survive inside the
    replayed batch dir and become those buckets' "newest" snapshots."""
    (
        df.withColumn("bucket", bucket_expr(key_col, n_buckets))
        .repartition(F.col("bucket"))
        .write.partitionBy("bucket")
        .option("partitionOverwriteMode", "static")
        .mode("overwrite")
        .parquet(path)
    )


def prune_bucketed_state(spark, state_root: str, keep_last: int = 2) -> int:
    """Drop every ``batch=<id>`` dir in which EVERY bucket has
    ``keep_last`` newer versions. A dir holding ANY bucket's newest
    (or second-newest, at keep_last=2) snapshot is live data and
    stays, bounding retained dirs at ~``n_buckets + keep_last``.
    keep ≥ 2 so an in-flight epoch's predecessor is never pruned
    under it. SINGLE-WRITER discipline: run between epochs.

    Also GCs ``bucket=__HIVE_DEFAULT_PARTITION__`` dirs inside RETAINED
    batch dirs (ADVICE r12): roots written before the r12 null-key
    coalesce routed null-keyed rows there — a directory the
    ``bucket=(\\d+)`` snapshot walk never reads, so those rows were
    already lost to every reader at write time. Removing the dirs makes
    the invisibility explicit and keeps pre-fix roots from carrying
    dead data forever (dirs inside REMOVED batch dirs go with their
    parent). Post-fix writers never create them.

    Also GCs orphaned ``.batch=<id>.inprogress`` write-asides (r14):
    an aside exists only DURING a same-id replay swap, and prune's
    single-writer between-epochs contract means any aside it sees is
    the leftover of a crashed replay. Deleting it is always safe — the
    re-delivered replay re-derives the merge from strictly-below
    snapshots (which keep_last ≥ 2 retains) and rewrites the aside."""
    if keep_last < 2:
        raise ValueError(f"keep_last must be >= 2, got {keep_last}")
    # ONE root listing serves both the orphan-aside GC and the
    # batch-id walk (the r13 folded-listing discipline)
    root_names = fsio.list_names(spark, state_root)
    for name in root_names:
        if re.fullmatch(r"\.batch=\d+\.inprogress", name):
            fsio.delete(spark, f"{state_root}/{name}")
    ids = sorted(
        (
            int(m.group(1))
            for m in (
                re.fullmatch(r"batch=(\d+)", name)
                for name in root_names
            )
            if m
        ),
        reverse=True,
    )
    seen: dict[int, int] = {}
    removable: list[int] = []
    for b_id in ids:
        names = fsio.list_names(spark, f"{state_root}/batch={b_id}")
        buckets = [
            int(m.group(1))
            for m in (re.fullmatch(r"bucket=(\d+)", name) for name in names)
            if m
        ]
        # empty all() (a bucket-less dir — an empty epoch's _SUCCESS
        # shell) is removable too: the old `buckets and ...` guard made
        # such dirs permanently unprunable (r12 review), inflating
        # every listing walk past the documented ~n_buckets+keep_last
        # bound for the lifetime of the root
        if all(seen.get(b, 0) >= keep_last for b in buckets):
            removable.append(b_id)
        elif "bucket=__HIVE_DEFAULT_PARTITION__" in names:
            # retained dir from a pre-r12 root: drop the reader-invisible
            # null-key partition (see docstring); removed dirs take
            # theirs along wholesale
            fsio.delete(
                spark,
                f"{state_root}/batch={b_id}/bucket=__HIVE_DEFAULT_PARTITION__",
            )
        for b in buckets:
            seen[b] = seen.get(b, 0) + 1
    for b_id in removable:
        fsio.delete(spark, f"{state_root}/batch={b_id}")
    return len(removable)


def upsert_keyed_buckets(
    batch,
    root: str,
    key_col: str,
    order_col: str,
    batch_id: int,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Last-writer-wins keyed snapshot merge with DELTA-BUCKET writes —
    the bucketed alternative to :func:`sinks.upsert_batch`'s full
    snapshot rewrite, for CORPUS-sized keyed state (a MinHash
    signature index: one row per document) where rewriting everything
    per micro-batch is O(corpus) write amplification. Per key keep the
    row with the greatest ``order_col`` (ties → incoming batch wins);
    only the buckets the batch's keys hash into are read and
    rewritten. A replayed epoch re-merges against snapshots strictly
    below its id — idempotent by construction.

    Reader exposure during a same-id replay (decided r14, closing
    VERDICT r13 #5 with MITIGATE): the rewrite goes WRITE-ASIDE,
    mirroring :func:`sinks.upsert_batch`'s r13 fix — the merged result
    lands in a hidden ``.batch=<id>.inprogress`` dir and the existing
    ``batch=<id>`` is then swapped out by delete+rename. An EXTERNAL
    reader (``before_batch=None``) that resolved its bucket paths into
    that dir just before the swap can still hit FILE_NOT_EXIST, but the
    window is now the two metadata ops, not the whole Spark write job
    (the in-place ``mode("overwrite")`` deleted the dir at job START
    and left it partial for the job's duration). A reader resolving
    FRESH inside the delete+rename window sees each bucket's previous
    epoch — a consistent older state, never a torn one — because the
    snapshot walk only matches ``batch=(\\d+)`` and falls through to
    the next-newest dir. That same fullmatch makes the aside invisible
    to every reconciling walk, which voids the r12 objection that an
    aside would double the dirs walks reconcile; a crash mid-replay
    leaves at most one orphan aside, GC'd by
    :func:`prune_bucketed_state` and overwritten by the re-delivered
    replay. Epoch readers are immune throughout by contract
    (``before_batch`` excludes their own epoch)."""
    from pyspark.sql import Window  # noqa: PLC0415

    spark = batch.sparkSession
    check_meta(spark, root, n_buckets)
    snaps = bucket_snapshots(spark, root, int(batch_id), n_buckets)
    prior = None
    if snaps:
        touched = {
            r["b"]
            for r in batch.select(bucket_expr(key_col, n_buckets).alias("b"))
            .distinct()
            .collect()
        }
        paths = [p for b, p in snaps.items() if b in touched]
        if paths:
            # parquet self-describes; prior epochs wrote the same schema
            prior = spark.read.parquet(*paths)
    prio = batch.withColumn("__new", F.lit(1))
    merged = (
        prior.withColumn("__new", F.lit(0)).unionByName(prio)
        if prior is not None
        else prio
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).desc(), F.col("__new").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__new")
    )
    dest = f"{root}/batch={int(batch_id)}"
    tmp = f"{root}/.batch={int(batch_id)}.inprogress"
    if fsio.exists(spark, dest):
        # same-id replay: write-aside, then the shared whole-directory
        # swap (see docstring and fsio.replace_dir's nesting caveat)
        write_buckets(latest, key_col, n_buckets, tmp)
        fsio.replace_dir(spark, tmp, dest)
    else:
        write_buckets(latest, key_col, n_buckets, dest)
        # a crashed replay's orphan aside (aside written, dest deleted,
        # rename never ran) is superseded by this rewrite — GC it so
        # the healed root carries no hidden dirs (delete is a no-op
        # when absent)
        fsio.delete(spark, tmp)


def read_keyed_state(spark, root: str, before_batch: int | None = None):
    """Current keyed snapshot across bucket chains: each bucket's
    newest ``batch=<id>`` below ``before_batch`` (unbounded when None
    — the external-reader view). None on a cold start."""
    bound = 2**62 if before_batch is None else int(before_batch)
    snaps = bucket_snapshots(spark, root, bound)
    if not snaps:
        return None
    return spark.read.parquet(*snaps.values())


def latest_plain_snapshot(spark, root: str, before_batch: int, schema: str):
    """Newest UNBUCKETED ``batch=<id>`` snapshot below ``before_batch``
    (for catalog-sized side state — per-source totals, the pair
    matrix — where a full rewrite per epoch is the right trade);
    None on a cold start."""
    prev = [
        int(m.group(1))
        for m in (
            re.fullmatch(r"batch=(\d+)", name)
            for name in fsio.list_names(spark, root)
        )
        if m and int(m.group(1)) < before_batch
    ]
    if not prev:
        return None
    return spark.read.schema(schema).parquet(f"{root}/batch={max(prev)}")
