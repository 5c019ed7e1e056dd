"""streaming/drift_stream.py — the streaming corpus-drift monitor:
reference-parity of the integer llr math, drift-direction sanity,
replay idempotence, batch/stream parity through a real readStream,
the pure batch-scoring face (score_drift_frame), and crash-safe
baseline rotation (refresh_drift_baseline)."""

from __future__ import annotations

import hashlib
import math

from airflow_subscription_etl_spark.streaming.drift_stream import (
    process_drift_batch,
    refresh_drift_baseline,
    score_drift_frame,
    start_drift_monitor,
    write_drift_baseline,
)

B = 256


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _half_up(v: float) -> int:
    # half-away-from-zero (Spark HALF_UP / DuckDB round), not Python's
    # banker's round()
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def _lnm(x: float) -> int:
    return _half_up(math.log(x) * 1_000_000.0)


def _ref_drift(baseline_texts, batch_rows):
    """Pure-Python replay: {group: (n_tokens, llr, llr_per_token)}."""
    from collections import Counter

    base: Counter = Counter()
    for t in baseline_texts:
        for w in t.split():
            base[_h60(w) % B] += 1
    base_total = sum(base.values())
    gb: dict = {}
    for g, t in batch_rows:
        c = gb.setdefault(g, Counter())
        for w in t.split():
            c[_h60(w) % B] += 1
    out = {}
    for g, c in gb.items():
        tg = sum(c.values())
        llr = sum(
            nb
            * (
                _lnm(nb + 1.0)
                - _lnm(tg + float(B))
                - _lnm(base.get(b, 0) + 1.0)
                + _lnm(base_total + float(B))
            )
            for b, nb in c.items()
        )
        out[g] = (tg, llr, _half_up(llr / tg))
    return out


BASELINE = [
    "spark shuffle join broadcast scan filter",
    "join scan shuffle partition broadcast spark",
    "spark partition filter scan join shuffle",
]
BATCH0 = [
    ("steady", "spark shuffle join scan"),
    ("steady", "broadcast partition filter spark"),
    ("drifted", "casino jackpot bonus casino jackpot"),
    ("drifted", "bonus spins jackpot casino"),
]
BATCH1 = [
    ("steady", "join broadcast scan shuffle spark"),
]


def test_drift_scores_match_reference_and_direction(spark, tmp_path):
    bl = str(tmp_path / "bl")
    out = str(tmp_path / "out")
    docs = spark.createDataFrame([(t,) for t in BASELINE], "text string")
    write_drift_baseline(docs, bl, num_buckets=B)
    batch = spark.createDataFrame(BATCH0, "source string, text string")
    process_drift_batch(batch, 0, bl, out)
    got = {
        r.source: (r.n_tokens, r.llr_micro, r.llr_per_token_micro)
        for r in spark.read.parquet(f"{out}/batch=0").collect()
    }
    assert got == _ref_drift(BASELINE, BATCH0)
    # the off-distribution source must drift harder per token
    assert (
        got["drifted"][2] > got["steady"][2]
    ), f"spam batch should out-drift in-distribution text: {got}"


def test_replay_overwrites_its_own_batch_dir(spark, tmp_path):
    bl, out = str(tmp_path / "bl"), str(tmp_path / "out")
    write_drift_baseline(
        spark.createDataFrame([(t,) for t in BASELINE], "text string"), bl
    )
    batch = spark.createDataFrame(BATCH0, "source string, text string")
    process_drift_batch(batch, 0, bl, out)
    before = sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/batch=0").collect()
    )
    process_drift_batch(batch, 0, bl, out)  # replay epoch 0
    after = sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/batch=0").collect()
    )
    assert after == before


def test_real_readstream_parity(spark, tmp_path):
    """Two parquet files → two epochs via maxFilesPerTrigger=1 +
    availableNow; the streamed log must equal driving the SAME batches
    through process_drift_batch directly."""
    bl = str(tmp_path / "bl")
    src = str(tmp_path / "src")
    out_s = str(tmp_path / "out_stream")
    out_b = str(tmp_path / "out_batch")
    ckpt = str(tmp_path / "ckpt")
    write_drift_baseline(
        spark.createDataFrame([(t,) for t in BASELINE], "text string"), bl
    )
    b0 = spark.createDataFrame(BATCH0, "source string, text string")
    b1 = spark.createDataFrame(BATCH1, "source string, text string")
    b0.coalesce(1).write.parquet(f"{src}/f0")
    b1.coalesce(1).write.parquet(f"{src}/f1")

    stream = (
        spark.readStream.schema("source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = start_drift_monitor(stream, bl, out_s, ckpt)
    q.awaitTermination(120)

    process_drift_batch(b0, 0, bl, out_b)
    process_drift_batch(b1, 1, bl, out_b)

    def rows(root):
        return sorted(
            (r.source, r.n_tokens, r.llr_micro, r.llr_per_token_micro)
            for r in spark.read.option("basePath", root)
            .parquet(f"{root}/batch=*")
            .collect()
        )

    streamed, batched = rows(out_s), rows(out_b)
    assert streamed, "stream produced no drift rows"
    # epoch numbering may differ only if file order differed; the ROW
    # MULTISET must match exactly
    assert streamed == batched


def test_score_drift_frame_equals_written_batch(spark, tmp_path):
    """The pure batch face (score_drift_frame, no sink) must return the
    SAME rows process_drift_batch writes — one code path, two exits."""
    bl, out = str(tmp_path / "bl"), str(tmp_path / "out")
    write_drift_baseline(
        spark.createDataFrame([(t,) for t in BASELINE], "text string"), bl
    )
    batch = spark.createDataFrame(BATCH0, "source string, text string")
    process_drift_batch(batch, 0, bl, out)
    written = sorted(
        (r.source, r.n_tokens, r.llr_micro, r.llr_per_token_micro)
        for r in spark.read.parquet(f"{out}/batch=0").collect()
    )
    pure = sorted(
        (r.source, r.n_tokens, r.llr_micro, r.llr_per_token_micro)
        for r in score_drift_frame(spark, bl, batch).collect()
    )
    assert pure == written


def test_refresh_swaps_baseline_and_changes_scores(spark, tmp_path):
    """After refreshing onto the spam corpus, the spam source must stop
    drifting (near-zero per-token llr vs the in-distribution source) —
    the rotation story: measure against the corpus you now expect."""
    bl = str(tmp_path / "bl")
    write_drift_baseline(
        spark.createDataFrame([(t,) for t in BASELINE], "text string"), bl
    )
    batch = spark.createDataFrame(BATCH0, "source string, text string")
    before = {
        r.source: r.llr_per_token_micro
        for r in score_drift_frame(spark, bl, batch).collect()
    }
    assert before["drifted"] > before["steady"]
    spam_corpus = [t for g, t in BATCH0 if g == "drifted"]
    refresh_drift_baseline(
        spark.createDataFrame([(t,) for t in spam_corpus], "text string"), bl
    )
    after = {
        r.source: r.llr_per_token_micro
        for r in score_drift_frame(spark, bl, batch).collect()
    }
    assert after["drifted"] < after["steady"]
    # and the new baseline is exactly a fresh fit on the new corpus
    want_bl = str(tmp_path / "bl_want")
    write_drift_baseline(
        spark.createDataFrame([(t,) for t in spam_corpus], "text string"),
        want_bl,
    )
    got = sorted(
        tuple(r) for r in spark.read.parquet(f"{bl}/counts").collect()
    )
    want = sorted(
        tuple(r) for r in spark.read.parquet(f"{want_bl}/counts").collect()
    )
    assert got == want


def test_refresh_recovers_from_crashed_swap(spark, tmp_path):
    """Crash between the two renames leaves the complete old baseline
    in <path>_old and nothing at <path>: the next refresh must restore
    it, then complete its own swap — never a window with no readable
    fit on disk after recovery."""
    import shutil

    bl = str(tmp_path / "bl")
    write_drift_baseline(
        spark.createDataFrame([(t,) for t in BASELINE], "text string"), bl
    )
    # simulate the crash window: first rename done, second not
    shutil.move(bl, f"{bl}_old")
    new_corpus = ["casino jackpot bonus spins", "jackpot casino bonus"]
    refresh_drift_baseline(
        spark.createDataFrame([(t,) for t in new_corpus], "text string"), bl
    )
    import os

    assert os.path.isdir(f"{bl}/counts") and os.path.isdir(f"{bl}/meta")
    assert not os.path.isdir(f"{bl}_old")
    assert not os.path.isdir(f"{bl}_refitting")
    # the refreshed fit is live: spam text now scores in-distribution
    batch = spark.createDataFrame(BATCH0, "source string, text string")
    got = {
        r.source: r.llr_per_token_micro
        for r in score_drift_frame(spark, bl, batch).collect()
    }
    assert got["drifted"] < got["steady"]


def test_refresh_on_empty_path_is_a_plain_write(spark, tmp_path):
    bl = str(tmp_path / "bl")
    refresh_drift_baseline(
        spark.createDataFrame([(t,) for t in BASELINE], "text string"), bl
    )
    batch = spark.createDataFrame(BATCH0, "source string, text string")
    got = {
        r.source: (r.n_tokens, r.llr_micro, r.llr_per_token_micro)
        for r in score_drift_frame(spark, bl, batch).collect()
    }
    assert got == _ref_drift(BASELINE, BATCH0)
