"""bench.py machine-line policy — the no-silent-deflation rule for
cross-round totals (ADVICE r7) and the pass-summary adjudication, both
pure functions testable without a SparkSession."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from bench import (
    BASELINE25,
    HEADLINE,
    MACHINE_LINE_BUDGET,
    detail_round,
    machine_line,
    machine_totals,
    noise_threshold,
    noisy_names,
    passes_settled,
    summarize_passes,
)


def test_totals_clean_run():
    total, base = machine_totals({"a": 1.0, "b": 2.5}, {}, ["a"])
    assert total == 3.5
    assert base == 1.0


def test_total_nulls_when_any_query_errored():
    """A query that errors on a LATER pass vanishes from timings — the
    headline total must become null, never a deflated partial sum that
    reads as a speedup; surviving timings are untouched."""
    timings = {"a": 1.0}
    total, base = machine_totals(timings, {"b": "KABOOM"}, ["a"])
    assert total is None
    assert base == 1.0  # baseline set itself is complete
    assert timings == {"a": 1.0}


def test_baseline_nulls_on_missing_member_independently():
    total, base = machine_totals({"a": 1.0}, {}, ["a", "gone"])
    assert total == 1.0  # no error recorded — total stands
    assert base is None


def test_baseline25_is_the_recorded_r1_prefix():
    """BASELINE25 must stay exactly the first 25 headline entries
    (through scd2_customer_orders) — the set BENCH_r01 recorded;
    reordering or removing any of them breaks the one-field
    cross-round comparison."""
    assert BASELINE25 == HEADLINE[:25]
    assert BASELINE25[-1] == "scd2_customer_orders"
    assert "doc_cc_islands" in BASELINE25


def test_sub_half_second_queries_never_stop_at_two_passes():
    """VERDICT r11 #2: a cheap query whose 2 passes agree within 30%
    still runs a 3rd pass — min-of-2 on a sub-0.5 s query wobbles 1.5x
    round-over-round (doc_collapse_runs 0.24→0.37 s at spread 0.204)."""
    # the exact r11 shape: 0.24 / 0.29 would have stopped at 2 passes
    assert not passes_settled([0.24, 0.29], 2)
    # a >=0.5 s query with the same relative agreement DOES stop at 2
    assert passes_settled([2.4, 2.9], 2)
    # after the 3rd pass, a cheap query with tight steady spread stops
    assert passes_settled([0.24, 0.25, 0.26], 3)
    # ...but the tighter 0.25 gate keeps escalating a 30% steady wobble
    # that the old 0.30 gate would have accepted
    assert not passes_settled([0.24, 0.20, 0.26], 3)
    # >=0.5 s queries keep the looser 0.30 gate at the same step: a
    # 28% steady wobble settles for them but not for a cheap query
    assert passes_settled([2.4, 2.0, 2.56], 3)
    assert not passes_settled([0.24, 0.20, 0.256], 3)


def test_noise_threshold_is_relative_to_query_cost():
    assert noise_threshold([0.3, 0.4]) == 0.25
    assert noise_threshold([0.6, 0.7]) == 0.30
    # boundary: exactly 0.5 s is "not cheap"
    assert noise_threshold([0.5]) == 0.30


def test_passes_settled_floor_and_ceiling():
    # pass 0 and 1 always run
    assert not passes_settled([], 0)
    assert not passes_settled([1.0], 1)
    # 4th+ pass checks the steady slice (pass 0 excluded): a slow
    # cache-build pass 0 must not force escalation by itself
    assert passes_settled([9.0, 1.0, 1.05, 1.1], 4)


def test_detail_round_case_table():
    """The BENCH_DETAIL round stamp's three cases (r12 review: the
    first ADVICE-r11 fix put the +1 on the wrong operand, degenerating
    to 'newest DETAIL + 1' and re-introducing the rerun mislabel)."""
    # normal first in-round run: both series closed at N-1 → N
    assert detail_round(11, 11) == 12
    # rerun after this round's detail was written, BENCH not yet
    # recorded → OVERWRITE the same round's detail
    assert detail_round(11, 12) == 12
    # harness recorded BENCH_rN but its detail is missing → FILL rN
    assert detail_round(12, 11) == 12
    # post-boundary: both at N → next round
    assert detail_round(12, 12) == 13
    # empty repo bootstrap
    assert detail_round(0, 0) == 1


def test_noisy_keyed_on_steady_slice_not_headline():
    """r12 review: a cheap query that exhausted all 6 passes without
    settling (steady min < 0.5 → 0.25 gate) must be listed noisy even
    when its trimmed-median HEADLINE lands above 0.5 s (which maps to
    the looser 0.30 gate)."""
    ts = [0.70, 0.45, 0.56, 0.55, 0.58, 0.57]
    headline, spread = summarize_passes(ts)
    assert headline >= 0.5  # the old keying would pick the 0.30 gate
    assert 0.25 < spread <= 0.30  # inside the gap the bug hid in
    assert noisy_names({"q": spread}, {"q": ts}) == ["q"]
    # an expensive query with the same relative spread is NOT noisy
    big = [t * 10 for t in ts]
    _, bspread = summarize_passes(big)
    assert noisy_names({"q": bspread}, {"q": big}) == []


def test_summarize_passes_min_vs_median():
    # 2 agreeing passes: min
    assert summarize_passes([1.0, 1.1])[0] == 1.0
    # 3 passes: steady slice drops pass 0, min of the rest
    assert summarize_passes([5.0, 1.2, 1.0])[0] == 1.0
    # 4 passes (adjudication ran): median of steady passes — a single
    # anomalous fast pass cannot anoint the headline number
    val, spread = summarize_passes([5.0, 2.0, 0.5, 2.2])
    assert val == 2.0
    assert spread > 0.30


def test_machine_line_fits_the_driver_tail():
    """VERDICT r12 #1: every BENCH_r8–r12 artifact recorded
    `parsed: null` because the per-query dict pushed the one stdout
    JSON line past the driver's ~2000-char tail capture. The line now
    carries summary fields only and must stay inside its 500-char
    budget even at twice the current headline count's worth of noisy
    names — growth headroom, not just today's size."""
    import json

    line = machine_line(
        58.004, 0.1, len(HEADLINE), 18.229,
        "BENCH_DETAIL_r13.json", ["doc_bm25_topk"], [],
    )
    assert len(line) <= MACHINE_LINE_BUDGET
    parsed = json.loads(line)
    # the fields a cross-round consumer needs are all present...
    assert parsed["value"] == 58.004
    assert parsed["baseline25_sec"] == 18.229
    assert parsed["n_queries"] == len(HEADLINE)
    assert parsed["detail"] == "BENCH_DETAIL_r13.json"
    # ...and the overflow culprit is gone
    assert "queries" not in parsed
    # null totals (errored run) and error names survive serialization
    err_line = machine_line(
        None, 0.1, 70, None, "BENCH_DETAIL_r13.json", [], ["q_bad"],
    )
    err = json.loads(err_line)
    assert err["value"] is None and err["errors"] == ["q_bad"]
    # headroom: a pathological run flagging several noisy + errored
    # queries still fits (names are the only unbounded-ish content)
    worst = machine_line(
        12345.678, 0.1, 999, 9999.999, "BENCH_DETAIL_r99.json",
        ["doc_bm25_topk", "doc_minhash_pairs", "emb_topk_cosine"],
        ["doc_span_rewrite", "ev_multi_touch"],
    )
    assert len(worst) <= MACHINE_LINE_BUDGET


def test_summarize_passes_trimmed_median_self_heals():
    """5–6 passes (spread stayed >0.30 after 4 — VERDICT r9 #6): the
    trimmed median drops the single outlier window entirely, so the
    doc_length_batches shape (one 1.2 s pass among ~0.4 s steadies)
    heads to ~0.4 s, not a median dragged by the outlier."""
    # 6 passes, one slow outlier in the steady slice: trim removes it
    val, spread = summarize_passes([0.489, 0.348, 1.219, 0.433, 0.41, 0.45])
    steady_trimmed = sorted([0.348, 1.219, 0.433, 0.41, 0.45])[1:-1]
    import statistics

    assert val == round(statistics.median(steady_trimmed), 3)
    assert val < 0.5  # the outlier no longer sits in the headline
    # spread stays the UNTRIMMED steady spread — evidence, not erased
    assert spread > 0.30
    # 5 passes: steady has 4 values, trim leaves 2, median = their mean
    val5, _ = summarize_passes([5.0, 1.0, 2.0, 3.0, 10.0])
    assert val5 == round(statistics.median([2.0, 3.0]), 3)
