"""Streaming token-budget admission control — the continuous face of
``sampling.token_budget_mix``: documents arrive as micro-batches and
each source's admissions stop the moment its token budget fills, so a
training-mix assembly can run concurrently with ingestion instead of
as a stop-the-world batch job at the end.

Each micro-batch runs the SAME two-level histogram cut as the batch
assembler (``sampling.budget_cut``) against the source's REMAINING
budget, so the admitted set is the greedy strict-prefix-<-budget cut
in (epoch, bucket, md5(text), id) order — the batch assembler applied
sequentially per epoch (pinned by a sequential-replay parity test;
like the assembler, the final admitted document of a source may
overshoot, after which its remaining budget floors at 0 and every
later epoch admits nothing for it).

Exactly-once follows the module discipline (rp_stream / dedup_stream /
drift_stream): per epoch, the admitted rows land in their own
``admitted/batch=<id>`` directory with OVERWRITE, and the state
snapshot — per-source tokens admitted SO FAR, a ≤|sources|-row table —
lands in ``state/batch=<id>``. A replayed epoch re-reads the PREVIOUS
epoch's snapshot (never its own possibly-crash-torn one) and
overwrites both directories with identical rows. No keyed stream
state: the snapshot is catalog-sized and rebuilt per epoch, so state
never grows with history.

At 100 TB of arrivals the per-epoch cost is the batch assembler's:
one (source, bucket) histogram agg over the BATCH, a catalog-sized
classification window, and a fine window over boundary buckets only;
the state read/write is ≤|sources| rows."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import fsio


def _latest_state(
    spark, state_root: str, before_batch: int
) -> dict[str, int]:
    """Per-source admitted-token totals from the newest snapshot with
    batch id < ``before_batch`` (a replayed epoch must never read its
    own torn snapshot). Empty dict when no prior epoch exists.
    Discovery goes through the Hadoop FileSystem API (:mod:`.fsio`),
    so ``state_root`` on HDFS/object storage is listed for real —
    driver-local ``os.listdir`` would silently return nothing there
    and reset every source's remaining budget each epoch (ADVICE r9)."""
    prev = [
        int(m.group(1))
        for m in (
            re.fullmatch(r"batch=(\d+)", name)
            for name in fsio.list_names(spark, state_root)
        )
        if m and int(m.group(1)) < before_batch
    ]
    if not prev:
        return {}
    rows = spark.read.parquet(f"{state_root}/batch={max(prev)}").collect()
    return {r["source"]: int(r["admitted_tokens"]) for r in rows}


def process_budget_batch(
    batch: DataFrame,
    batch_id: int,
    out_root: str,
    budgets: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
) -> None:
    """Admit one micro-batch against the remaining budgets: the batch
    assembler's cut (``sampling.budget_cut``) with
    ``remaining_s = max(budget_s − admitted_so_far_s, 0)``, then
    overwrite this epoch's ``admitted/batch=<id>`` and
    ``state/batch=<id>`` (replay-idempotent). Exposed separately from
    the stream wiring so batch backfills drive the same code path."""
    from ..operators.sampling import budget_cut  # noqa: PLC0415

    spark = batch.sparkSession
    state_root = f"{out_root}/state"
    so_far = _latest_state(spark, state_root, int(batch_id))
    remaining = {
        s: max(b - so_far.get(s, 0), 0) for s, b in budgets.items()
    }
    admitted = budget_cut(
        batch, remaining, source_col, id_col, text_col, num_buckets
    ).persist()
    try:
        admitted.write.mode("overwrite").parquet(
            f"{out_root}/admitted/batch={int(batch_id)}"
        )
        batch_tokens = {
            r[source_col]: int(r["_t"])
            for r in admitted.groupBy(source_col)
            .agg(F.sum("n_tokens").alias("_t"))
            .collect()
        }
    finally:
        admitted.unpersist()
    new_state = [
        (s, so_far.get(s, 0) + batch_tokens.get(s, 0)) for s in sorted(budgets)
    ]
    spark.createDataFrame(
        new_state, "source string, admitted_tokens bigint"
    ).write.mode("overwrite").parquet(f"{state_root}/batch={int(batch_id)}")


def prune_budget_state(spark, out_root: str, keep_last: int = 2) -> int:
    """Drop all but the ``keep_last`` newest ``state/batch=<id>``
    snapshot dirs — the bounded-history maintenance every other state
    family ships (``sinks.compact_snapshots``, ``prune_bucketed_state``,
    the span/matrix prunes); budget_stream was the one without (r12
    review), so a continuous admission stream accumulated one
    ≤|sources|-row dir per micro-batch forever and ``_latest_state``'s
    listing walk grew O(epochs). ``keep_last ≥ 2`` keeps an in-flight
    epoch's predecessor readable under it; the ``admitted/batch=<id>``
    OUTPUT dirs are the operator's product, not state, and are never
    touched. SINGLE-WRITER discipline: run between epochs. Returns the
    number of snapshot dirs removed."""
    if keep_last < 2:
        raise ValueError(f"keep_last must be >= 2, got {keep_last}")
    state_root = f"{out_root}/state"
    ids = sorted(
        int(m.group(1))
        for m in (
            re.fullmatch(r"batch=(\d+)", name)
            for name in fsio.list_names(spark, state_root)
        )
        if m
    )
    removed = 0
    for b_id in ids[:-keep_last]:
        fsio.delete(spark, f"{state_root}/batch={b_id}")
        removed += 1
    return removed


def start_budget_admission(
    stream: DataFrame,
    out_root: str,
    checkpoint: str,
    budgets: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 10_000,
    trigger_available_now: bool = True,
):
    """Wire a document stream into admission control: one
    ``process_budget_batch`` per micro-batch. ``availableNow`` drains
    the backlog and stops (backfill shape); False for continuous."""
    writer = (
        stream.writeStream.foreachBatch(
            lambda b, i: process_budget_batch(
                b, i, out_root, budgets,
                source_col, id_col, text_col, num_buckets,
            )
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
