"""streaming/source_matrix_stream.py — incremental cross-source
duplication matrix: single-epoch equality with the batch operator,
ANY-split multi-epoch parity with batch-on-union (the increment
algebra is set-based, so unlike the span stream there is no in-order
requirement), replay idempotence, touched-bucket write sizing,
pruning, and batch/stream parity through a real readStream."""

from __future__ import annotations

import pytest

from airflow_subscription_etl_spark.operators.dedup import (
    cross_source_duplication,
)
from airflow_subscription_etl_spark.streaming import fsio
from airflow_subscription_etl_spark.streaming.source_matrix_stream import (
    process_source_matrix_batch,
    prune_source_matrix_state,
    start_source_matrix_stream,
)

# span=2 chunks; sources share digests across epochs in every direction:
# a digest's pair can form within one epoch (cc1/wiki share [a b] in
# epoch 0) or across epochs (cc2 arrives later; wiki gains [c d] later)
BATCH0 = [
    ("cc1", "a b c d"),
    ("cc1", "e f"),
    ("wiki", "a b x y"),
]
BATCH1 = [
    ("cc2", "a b c d e f"),
    ("wiki", "c d"),
]
BATCH2 = [
    ("books", "q r"),
    ("cc1", "a b q r"),
]
ALL = [BATCH0, BATCH1, BATCH2]


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _matrix(spark, root, batch_id):
    return _rows(spark.read.parquet(f"{root}/matrix/batch={batch_id}"))


def _batch_matrix(spark, rows):
    return _rows(cross_source_duplication(_df(spark, rows), span=2))


def test_single_epoch_equals_batch_operator(spark, tmp_path):
    root = str(tmp_path / "sm")
    process_source_matrix_batch(_df(spark, BATCH0), 0, root, span=2)
    assert _matrix(spark, root, 0) == _batch_matrix(spark, BATCH0)


def test_any_split_matches_batch_on_union(spark, tmp_path):
    """After every epoch, the maintained matrix equals the batch
    operator on the union so far — and a DIFFERENT split of the same
    documents converges to the same final matrix (set-based increment
    algebra: no arrival-order dependence)."""
    root = str(tmp_path / "sm")
    union: list = []
    for i, rows in enumerate(ALL):
        process_source_matrix_batch(_df(spark, rows), i, root, span=2)
        union.extend(rows)
        assert _matrix(spark, root, i) == _batch_matrix(spark, union), (
            f"epoch {i} diverged from batch-on-union"
        )
    # shuffled split: one doc per epoch, reversed
    root2 = str(tmp_path / "sm2")
    docs = [r for b in ALL for r in b][::-1]
    for i, row in enumerate(docs):
        process_source_matrix_batch(_df(spark, [row]), i, root2, span=2)
    assert _matrix(spark, root2, len(docs) - 1) == _batch_matrix(
        spark, union
    )


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running epoch 1 (a foreachBatch replay) derives every state
    family from epoch-0 snapshots — never its own — and rewrites
    identical matrix, pairs, totals and catalog."""
    root = str(tmp_path / "sm")
    process_source_matrix_batch(_df(spark, BATCH0), 0, root, span=2)
    process_source_matrix_batch(_df(spark, BATCH1), 1, root, span=2)
    first = {
        fam: _rows(spark.read.parquet(f"{root}/{fam}/batch=1"))
        for fam in ("matrix", "pairs", "totals", "state")
    }
    process_source_matrix_batch(_df(spark, BATCH1), 1, root, span=2)
    for fam, want in first.items():
        got = _rows(spark.read.parquet(f"{root}/{fam}/batch=1"))
        assert got == want, f"replay changed {fam}"


def test_epoch_rewrites_only_touched_buckets(spark, tmp_path):
    """A delta touching one digest writes one state bucket dir, not
    the catalog (the span-stream write-size pin, same shared layer)."""
    root = str(tmp_path / "sm")
    wide = [("s", f"w{i} x{i}") for i in range(30)]
    process_source_matrix_batch(_df(spark, wide), 0, root, span=2)
    n0 = len(
        [
            n
            for n in fsio.list_names(spark, f"{root}/state/batch=0")
            if n.startswith("bucket=")
        ]
    )
    assert n0 >= 2
    process_source_matrix_batch(_df(spark, [("t", "w1 x1")]), 1, root, span=2)
    b1 = [
        n
        for n in fsio.list_names(spark, f"{root}/state/batch=1")
        if n.startswith("bucket=")
    ]
    assert len(b1) == 1, f"single-digest epoch rewrote {len(b1)} buckets"
    # and the pair (s, t) materialized from the cross-epoch membership
    m = {
        (r["source_a"], r["source_b"]): r["shared_chunks"]
        for r in spark.read.parquet(f"{root}/matrix/batch=1").collect()
    }
    assert m[("s", "t")] == 1


def test_prune_and_continue(spark, tmp_path):
    root = str(tmp_path / "sm")
    for i, rows in enumerate(ALL):
        process_source_matrix_batch(_df(spark, rows), i, root, span=2)
    removed = prune_source_matrix_state(spark, root, keep_last=2)
    assert removed >= 3  # at least the three plain families' batch=0
    # the next epoch still sees full history
    process_source_matrix_batch(
        _df(spark, [("mirror", "a b e f")]), 3, root, span=2
    )
    union = [r for b in ALL for r in b] + [("mirror", "a b e f")]
    assert _matrix(spark, root, 3) == _batch_matrix(spark, union)
    with pytest.raises(ValueError, match="keep_last"):
        prune_source_matrix_state(spark, root, keep_last=1)


def test_real_readstream_parity(spark, tmp_path):
    """Three parquet files → three epochs via maxFilesPerTrigger=1 +
    availableNow; the streamed matrix must equal the batch operator on
    everything (any split converges, so file order is irrelevant)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i, rows in enumerate(ALL):
        _df(spark, rows).coalesce(1).write.parquet(f"{src}/f{i}")
    stream = (
        spark.readStream.schema("source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_source_matrix_stream(stream, out, ckpt, span=2)
    q.awaitTermination(120)
    import re

    last = max(
        int(m.group(1))
        for m in (
            re.fullmatch(r"batch=(\d+)", n)
            for n in fsio.list_names(spark, f"{out}/matrix")
        )
        if m
    )
    union = [r for b in ALL for r in b]
    assert _matrix(spark, out, last) == _batch_matrix(spark, union)
