"""streaming/budget_stream.py — streaming token-budget admission:
sequential-assembler parity, cross-epoch budget exhaustion, replay
idempotence (incl. the torn-snapshot rule), and batch/stream parity
through a real readStream."""

from __future__ import annotations

from airflow_subscription_etl_spark.operators.sampling import budget_cut
from airflow_subscription_etl_spark.streaming.budget_stream import (
    process_budget_batch,
    start_budget_admission,
)

BUDGETS = {"a": 12, "b": 6}

# each doc is 3 tokens; source a fills after 4 docs, b after 2
BATCH0 = [
    (1, "a", "w1 w2 w3"),
    (2, "a", "x1 x2 x3"),
    (3, "b", "y1 y2 y3"),
    (4, "b", "z1 z2 z3"),
    (5, "c", "c1 c2 c3"),  # unbudgeted source: never admitted
]
BATCH1 = [
    (6, "a", "p1 p2 p3"),
    (7, "a", "q1 q2 q3"),
    (8, "a", "r1 r2 r3"),  # a's budget (12) fills within this epoch
    (9, "b", "s1 s2 s3"),  # b already full (6 tokens admitted in e0)
]
BATCH2 = [
    (10, "a", "t1 t2 t3"),  # a full — nothing admitted
    (11, "b", "u1 u2 u3"),
]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )


def _admitted(spark, root):
    return sorted(
        (r.doc_id, r.source, r.n_tokens)
        for r in spark.read.option("basePath", root)
        .parquet(f"{root}/admitted/batch=*")
        .collect()
    )


def _drive(spark, root, batches):
    for i, rows in enumerate(batches):
        process_budget_batch(_df(spark, rows), i, root, BUDGETS)


def _ref_sequential(spark, batches):
    """The contract: the batch assembler applied sequentially per
    epoch with driver-tracked remaining budgets."""
    so_far = dict.fromkeys(BUDGETS, 0)
    out = []
    for rows in batches:
        remaining = {s: max(b - so_far[s], 0) for s, b in BUDGETS.items()}
        got = budget_cut(_df(spark, rows), remaining).collect()
        for r in got:
            out.append((r.doc_id, r.source, r.n_tokens))
            so_far[r.source] += r.n_tokens
    return sorted(out)


def test_admission_equals_sequential_assembler(spark, tmp_path):
    root = str(tmp_path / "adm")
    batches = [BATCH0, BATCH1, BATCH2]
    _drive(spark, root, batches)
    assert _admitted(spark, root) == _ref_sequential(spark, batches)


def test_budgets_exhaust_and_stay_exhausted(spark, tmp_path):
    root = str(tmp_path / "adm")
    _drive(spark, root, [BATCH0, BATCH1, BATCH2])
    rows = _admitted(spark, root)
    by_src: dict = {}
    for _, s, n in rows:
        by_src[s] = by_src.get(s, 0) + n
    # strict-prefix greedy: totals reach the budget, overshoot bounded
    # by one doc (3 tokens); the unbudgeted source admits nothing
    assert by_src["a"] >= BUDGETS["a"] and by_src["a"] < BUDGETS["a"] + 3
    assert by_src["b"] >= BUDGETS["b"] and by_src["b"] < BUDGETS["b"] + 3
    assert "c" not in by_src
    # epoch 2 admitted nothing for a (full since epoch 1)
    e2 = {
        r.doc_id
        for r in spark.read.parquet(f"{root}/admitted/batch=2").collect()
    }
    assert 10 not in e2


def test_replay_overwrites_and_reads_previous_snapshot(spark, tmp_path):
    """Replaying epoch 1 after epochs 0–2 ran must rebuild IDENTICAL
    admitted rows and state — it reads epoch 0's snapshot, never its
    own (possibly torn) one."""
    root = str(tmp_path / "adm")
    _drive(spark, root, [BATCH0, BATCH1, BATCH2])
    before_rows = _admitted(spark, root)
    before_state = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{root}/state/batch=1").collect()
    )
    process_budget_batch(_df(spark, BATCH1), 1, root, BUDGETS)  # replay
    assert _admitted(spark, root) == before_rows
    after_state = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{root}/state/batch=1").collect()
    )
    assert after_state == before_state


def test_real_readstream_parity(spark, tmp_path):
    """Three parquet files → three epochs via maxFilesPerTrigger=1 +
    availableNow; the streamed admissions must equal driving the SAME
    batches through process_budget_batch (modulo epoch numbering: the
    ROW MULTISET and per-source totals must match when file order is
    deterministic by name)."""
    src = str(tmp_path / "src")
    out_s = str(tmp_path / "out_stream")
    out_b = str(tmp_path / "out_batch")
    ckpt = str(tmp_path / "ckpt")
    for i, rows in enumerate([BATCH0, BATCH1, BATCH2]):
        _df(spark, rows).coalesce(1).write.parquet(f"{src}/f{i}")

    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_budget_admission(stream, out_s, ckpt, BUDGETS)
    q.awaitTermination(120)

    _drive(spark, out_b, [BATCH0, BATCH1, BATCH2])
    streamed, batched = _admitted(spark, out_s), _admitted(spark, out_b)
    assert streamed, "stream admitted nothing"
    # file ingestion order may differ from f0..f2 only if the source
    # listing reorders; per-source admitted TOTALS are order-dependent
    # only in WHICH docs get in, so pin the multiset when orders match
    # and always pin the budget envelope
    tot = lambda rows: {  # noqa: E731
        s: sum(n for _, s2, n in rows if s2 == s) for s in BUDGETS
    }
    assert tot(streamed) == tot(batched)
    assert streamed == batched
