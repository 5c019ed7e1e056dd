"""Streaming corpus-drift monitor: score each arriving micro-batch of
documents against a FROZEN hashed-unigram baseline distribution and
append per-(batch, source) drift rows to a log — the continuous face
of the batch diagnostics (``sampling.dsir_sample``'s λ algebra,
``text.keyness_topk``'s fingerprinting). An ingestion pipeline uses
this to catch a source going off-distribution (scraper broke, new spam
campaign, language mix shift) WITHOUT re-scanning the corpus: the
baseline is fit once, each batch pays only its own featurize pass.

Drift score: the batch's total log-likelihood ratio under its own
(add-1 smoothed) bag model vs the baseline model,
``llr = Σ_b n_b · (ln p̂_batch(b) − ln q_base(b))`` — n·KL(p̂‖q) up to
smoothing, so per-token drift (``llr/tokens``) is comparable across
batch sizes. Every ln is micro-quantized at the leaf (the repo-wide
zipf-fit convention): scores are exact integers, and a replayed batch
reproduces them bit-for-bit.

Exactly-once follows the established discipline: each micro-batch
OVERWRITES its own ``batch=<id>`` directory of the output log (the
rp_stream / dedup_stream convention), so foreachBatch replays rewrite
rather than double-append. The baseline read is ≤ ``num_buckets`` + 1
meta rows per batch — catalog-sized. No watermark, no keyed state:
the operator is stateless by construction, so state never grows.

The baseline is frozen BY DESIGN (drift is measured against a fixed
reference), but corpora legitimately move (new quarter, new source
mix): :func:`refresh_drift_baseline` re-fits on a new corpus and swaps
the artifact in with the write-aside + two-rename convention
``rp_stream.compact_rp_index`` established, so rotation needs no
stop-the-world and a crash at any step leaves a complete baseline on
disk.

At 100 TB of HISTORY the monitor's cost is independent of history
size: the baseline is a fixed ``num_buckets``-row table and each
batch's work is one explode + one (group, bucket) agg over the batch
alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fit_counts(
    df: DataFrame, text_col: str, num_buckets: int
) -> DataFrame:
    """(bucket, cnt) hashed-unigram counts — ≤ num_buckets rows at any
    corpus size. One corpus pass (explode + partial-agg groupBy)."""
    from ..operators.sketch import hash60  # noqa: PLC0415
    from ..operators.text import tokens  # noqa: PLC0415

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .withColumn("bucket", (hash60(F.col("w")) % num_buckets).cast("int"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _write_baseline_dirs(
    df: DataFrame, path: str, text_col: str, num_buckets: int
) -> None:
    """Write ``<path>/counts`` + ``<path>/meta`` for one fitted
    baseline. The total is aggregated from the PERSISTED counts frame
    (≤ num_buckets rows) — one corpus job for the write, one
    cached-only agg for the meta; no durable read-back job."""
    spark = df.sparkSession
    counts = _fit_counts(df, text_col, num_buckets).persist()
    try:
        counts.write.mode("overwrite").parquet(f"{path}/counts")
        total = counts.agg(
            F.sum("cnt").cast("bigint").alias("total")
        ).collect()[0]["total"]
    finally:
        counts.unpersist()
    spark.createDataFrame(
        [(int(num_buckets), int(total or 0))], "num_buckets int, total bigint"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def write_drift_baseline(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    num_buckets: int = 256,
) -> None:
    """Fit and freeze the reference distribution: (bucket, cnt) counts
    over md5-hashed unigrams plus a 1-row meta (num_buckets, total).
    One corpus pass; the result is ≤ num_buckets rows at any scale."""
    _write_baseline_dirs(df, path, text_col, num_buckets)


def refresh_drift_baseline(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    num_buckets: int = 256,
) -> None:
    """Re-fit the baseline on a NEW reference corpus and swap it in —
    baseline rotation for a corpus that drifted ON PURPOSE (new
    quarter, new source mix) without a stop-the-world.

    Crash safety is the ``compact_rp_index`` convention: the new
    baseline is written ASIDE (``<path>_refitting``) and swapped in
    with two renames (``path`` → ``<path>_old``, aside → ``path``)
    before the old copy is deleted — a crash at any step leaves a
    complete baseline on disk, and a stale ``_old``/``_refitting``
    from a crashed run is recovered or cleaned on the next call.
    All directory ops go through the Hadoop FileSystem API
    (:mod:`.fsio`), so ``path`` may live on HDFS/object storage.
    SINGLE-WRITER discipline: don't race two refreshes. A concurrent
    monitor READ between the two renames no longer fails:
    :func:`score_drift_frame` falls back to the complete previous
    baseline sitting at ``<path>_old`` for exactly that window
    (ADVICE r9) — scheduling refreshes between micro-batches is still
    the tidy choice, just no longer a correctness requirement.
    On a path with no existing baseline this degrades to a plain
    :func:`write_drift_baseline`."""
    from . import fsio  # noqa: PLC0415

    spark = df.sparkSession
    old_dir = f"{path}_old"
    new_dir = f"{path}_refitting"
    # recovery from a prior crashed swap: between the two renames the
    # complete previous baseline sits in _old — restore it; after
    # both renames it is a leftover copy — drop it. A half-written
    # _refitting from a crashed fit is always safe to discard.
    if not fsio.is_dir(spark, path) and fsio.is_dir(spark, old_dir):
        fsio.rename(spark, old_dir, path)
    fsio.delete(spark, old_dir)
    fsio.delete(spark, new_dir)

    _write_baseline_dirs(df, new_dir, text_col, num_buckets)
    if fsio.is_dir(spark, path):
        fsio.rename(spark, path, old_dir)
    fsio.rename(spark, new_dir, path)
    fsio.delete(spark, old_dir)


def _drift_llr(
    batch: DataFrame,
    base: DataFrame,
    num_buckets: int,
    base_total: int,
    group_col: str,
    text_col: str,
    broadcast_groups: bool = True,
) -> DataFrame:
    """Per-group integer drift scores for one frame against a baseline
    counts frame (bucket, base_cnt): (group, n_tokens, llr_micro,
    llr_per_token_micro). All lns micro-quantized at the leaf, so both
    scores are exact integers and replay bit-for-bit in any engine.
    ``base`` is ≤ num_buckets rows — always broadcast. The per-group
    totals broadcast only when ``broadcast_groups`` (sources — a
    catalog); a DOCUMENT-grouped caller must pass False so the
    corpus-sized totals JOIN keyed instead of being shipped to every
    executor (both sides are already group-keyed — co-partitioned
    shuffle, no skew on uniform ids)."""
    from ..operators.sampling import _ln_micro  # noqa: PLC0415
    from ..operators.sketch import hash60  # noqa: PLC0415
    from ..operators.text import tokens  # noqa: PLC0415

    gb = (
        batch.select(
            F.col(group_col), F.explode(tokens(F.col(text_col))).alias("w")
        )
        .withColumn("bucket", (hash60(F.col("w")) % num_buckets).cast("int"))
        .groupBy(group_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    )
    gtot = gb.groupBy(group_col).agg(F.sum("nb").cast("bigint").alias("tg"))
    if broadcast_groups:
        gtot = F.broadcast(gtot)
    alpha_b = float(num_buckets)
    lam = (
        gb.join(F.broadcast(base), "bucket", "left")
        .join(gtot, group_col)
        .select(
            group_col,
            "nb",
            (
                _ln_micro(F.col("nb") + F.lit(1.0))
                - _ln_micro(F.col("tg") + F.lit(alpha_b))
                - _ln_micro(F.coalesce(F.col("base_cnt"), F.lit(0)) + F.lit(1.0))
                + _ln_micro(F.lit(float(base_total)) + F.lit(alpha_b))
            ).alias("lam_micro"),
        )
    )
    return (
        lam.groupBy(group_col)
        .agg(F.sum(F.col("nb") * F.col("lam_micro")).alias("llr_micro"))
        .join(gtot, group_col)
        .select(
            group_col,
            F.col("tg").alias("n_tokens"),
            "llr_micro",
            F.round(
                F.col("llr_micro").cast("double") / F.col("tg").cast("double")
            )
            .cast("bigint")
            .alias("llr_per_token_micro"),
        )
    )


def score_drift_frame(
    spark,
    baseline_path: str,
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Batch-mode face of the monitor: score ANY frame against the
    saved baseline and return the per-group drift rows as a DataFrame
    (no sink side effects) — the same integer llr math every streamed
    micro-batch pays, exposed for backfills, ad-hoc diagnostics, and
    the driver's oracle gate. Meta/counts reads are catalog-sized.

    A read that lands inside :func:`refresh_drift_baseline`'s
    rename window (``baseline_path`` momentarily absent) falls back
    to the complete PREVIOUS baseline at ``<baseline_path>_old`` —
    the rotation's invariant is that one of the two always exists
    whole, so a concurrent monitor batch scores against the old
    reference instead of crashing (ADVICE r9). Both frames (meta +
    counts) come from whichever root resolved, never a mix."""
    base, num_buckets, base_total = _read_baseline(spark, baseline_path)
    return _drift_llr(df, base, num_buckets, base_total, group_col, text_col)


def _is_missing_file_error(e: Exception) -> bool:
    """True when an exception is the file-went-missing shape a rotation
    swap produces (ADVICE r12 — the old bare ``except Exception``
    treated corrupt parquet / schema mismatch / permission errors as a
    swap race too, then after one retry raised a RuntimeError blaming
    the rotation and misleading diagnosis). Matches PATH_NOT_FOUND
    AnalysisExceptions at plan time and FILE_NOT_EXIST /
    FileNotFoundException shapes from mid-job disappearance; anything
    else propagates to the caller untouched.

    The AnalysisException branch checks the generic file-went-missing
    markers too (ADVICE r13): newer PySpark surfaces a mid-scan
    disappearance as an AnalysisException-typed [FAILED_READ_FILE]
    wrapping a FileNotFoundException, which a PATH_NOT_FOUND-only
    test would classify as "not a race" and propagate instead of
    taking the rotation retry."""
    from pyspark.errors import AnalysisException  # noqa: PLC0415

    msg = str(e)
    missing_markers = (
        "FILE_NOT_EXIST",
        "FileNotFoundException",
        "does not exist",
    )
    if isinstance(e, AnalysisException):
        return "PATH_NOT_FOUND" in msg or any(
            marker in msg for marker in missing_markers
        )
    return any(marker in msg for marker in missing_markers)


def _read_baseline(spark, baseline_path: str):
    """(counts frame, num_buckets, total) from the saved baseline,
    falling back to the rotation's ``_old`` copy inside the swap
    window (see :func:`score_drift_frame`).

    The counts are MATERIALIZED here (≤ num_buckets rows — bounded by
    construction, the module-doc contract) and returned as a
    driver-local frame: a lazy parquet frame pins its file paths at
    creation, so a refresh's rename/delete landing between this read
    and the scoring job's execution killed the monitor batch with
    FILE_NOT_EXIST — including a reader that resolved ``_old`` and
    then met the rotation's closing delete (r12 review). After
    materialization no filesystem reference survives, so the score is
    immune to any subsequent swap. The resolve+read itself retries
    once through a re-resolve if a swap lands mid-read."""
    from . import fsio  # noqa: PLC0415

    last_err: Exception | None = None
    for _attempt in range(2):
        root = baseline_path
        if not fsio.exists(spark, f"{root}/meta"):
            old = f"{baseline_path}_old"
            if fsio.exists(spark, f"{old}/meta"):
                root = old
        try:
            meta = spark.read.parquet(f"{root}/meta").collect()[0]
            rows = [
                (int(r["bucket"]), int(r["cnt"]))
                for r in spark.read.parquet(f"{root}/counts").collect()
            ]
        except Exception as e:  # noqa: BLE001 — inspected, not blanket
            if not _is_missing_file_error(e):
                raise  # corrupt parquet / schema / permissions: not a race
            last_err = e
            continue
        base = spark.createDataFrame(
            rows, "bucket int, base_cnt bigint"
        )
        return base, int(meta["num_buckets"]), int(meta["total"])
    raise RuntimeError(
        f"baseline at {baseline_path} unreadable after retry (a "
        "rotation may be racing this reader; rotations are "
        "single-writer, so two consecutive swaps inside one read "
        "means something else is wrong)"
    ) from last_err


def score_novelty_frame(
    spark,
    baseline_path: str,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-DOCUMENT novelty/outlier score against the frozen baseline —
    the document-grained twin of :func:`score_drift_frame` and a
    standard ingestion quality signal: a document whose hashed-unigram
    bag sits far from the reference distribution (high
    ``llr_per_token_micro``) is off-corpus content — spam, a language
    the baseline lacks, template/generated text — and a filter or
    review queue cuts on exactly this column. Same integer llr algebra
    (micro-quantized lns, bit-replayable in any engine), same ``_old``
    rotation fallback.

    Scale shape differs from the source-grained face in ONE deliberate
    way: the per-group token totals are CORPUS-sized here (one row per
    doc), so they join keyed on the doc id instead of broadcasting
    (``broadcast_groups=False``) — per-doc cost is the doc's own
    featurize plus two co-partitioned joins on uniform ids, history
    and corpus size never enter."""
    base, num_buckets, base_total = _read_baseline(spark, baseline_path)
    return _drift_llr(
        df, base, num_buckets, base_total, id_col, text_col,
        broadcast_groups=False,
    )


def process_novelty_batch(
    batch: DataFrame,
    batch_id: int,
    baseline_path: str,
    out_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Per-DOCUMENT novelty scores for one micro-batch vs the frozen
    baseline, written to the batch's own ``batch=<id>`` directory
    (replay-idempotent overwrite) — the continuous face of
    :func:`score_novelty_frame`, so an ingestion stream can quarantine
    off-distribution documents at arrival time instead of in a nightly
    batch. Stateless like the source-grained monitor: per-batch cost
    is the batch's own featurize + two doc-keyed joins; history never
    enters."""
    out = score_novelty_frame(
        batch.sparkSession, baseline_path, batch, id_col, text_col
    )
    out.write.mode("overwrite").parquet(f"{out_root}/batch={int(batch_id)}")


def start_novelty_monitor(
    stream: DataFrame,
    baseline_path: str,
    out_root: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Wire a document stream into per-doc novelty scoring: one
    ``process_novelty_batch`` per micro-batch. ``availableNow`` drains
    the backlog and stops (backfill shape); False for continuous."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, i: process_novelty_batch(
                b, i, baseline_path, out_root, id_col, text_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def process_drift_batch(
    batch: DataFrame,
    batch_id: int,
    baseline_path: str,
    out_root: str,
    group_col: str = "source",
    text_col: str = "text",
) -> None:
    """Score one micro-batch: per group, integer llr_micro vs the
    frozen baseline plus llr_per_token_micro, written to the batch's
    own ``batch=<id>`` directory (replay-idempotent overwrite).
    Exposed separately from the stream wiring so batch backfills drive
    the same code path (the dedup_stream convention)."""
    out = score_drift_frame(
        batch.sparkSession, baseline_path, batch, group_col, text_col
    )
    out.write.mode("overwrite").parquet(f"{out_root}/batch={int(batch_id)}")


def start_drift_monitor(
    stream: DataFrame,
    baseline_path: str,
    out_root: str,
    checkpoint: str,
    group_col: str = "source",
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Wire a document stream into the monitor: one
    ``process_drift_batch`` per micro-batch. ``availableNow`` drains
    the backlog and stops (backfill shape); False for continuous."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, i: process_drift_batch(
                b, i, baseline_path, out_root, group_col, text_col
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
