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
    fit_machine_line,
    machine_line,
    machine_totals,
    noise_threshold,
    noisy_names,
    noisy_shape,
    normalized_fields,
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


def test_noisy_shape_identifies_the_host_stall_signature():
    """VERDICT r13 #6: the bm25-r12 pass vector — five agreeing passes
    and ONE stall — must come out stall_shaped, so future judges read
    a field instead of re-deriving the signature per query."""
    bm25_r12 = [0.81, 1.82, 0.85, 0.95, 0.84, 0.83]
    shape = noisy_shape(bm25_r12)
    assert shape["stall_shaped"] is True
    # steady median is ~0.85; the 1.82 stall is ~2.1x it
    assert shape["max_over_median"] > 2.0


def test_noisy_shape_multi_pass_disagreement_is_not_stall_shaped():
    """Several steady passes disagreeing with EACH OTHER is the vector
    worth a plan look — dropping the single max does not bring the
    rest inside the threshold."""
    shape = noisy_shape([1.0, 0.5, 1.4, 0.9, 0.6, 1.3])
    assert shape["stall_shaped"] is False


def test_noisy_shape_short_vector_guards():
    # 2-pass vector: steady == vector, rest has 1 element -> not
    # stall-shaped (no evidence either way), no crash
    shape = noisy_shape([1.0, 2.0])
    assert shape["stall_shaped"] is False
    assert shape["max_over_median"] is not None


def test_normalized_fields_r13_worked_example():
    """The r13 driver-vs-builder adjudication as arithmetic: raw
    baseline25 ratio 1.24x over host ratio 1.42x normalizes to ~0.87
    — i.e. the tree did not regress; the host did."""
    out = normalized_fields(
        total=66.825,
        baseline25=18.65,
        cal={"start": 0.71, "end": 0.58},
        prior_detail={
            "baseline25_sec": 15.08,
            "calibration_sec": {"start": 0.42, "end": 0.49},
        },
        prior_round=13,
    )
    assert out["calibration_mean_sec"] == 0.645
    assert out["baseline25_per_calibration"] == round(18.65 / 0.645, 3)
    p = out["prior"]
    assert p["round"] == 13
    assert p["host_ratio"] == round(0.645 / 0.455, 3)
    assert p["baseline25_ratio_raw"] == round(18.65 / 15.08, 3)
    # normalized = raw / host: the host more than covers the raw gap
    assert p["baseline25_ratio_normalized"] < 1.0


def test_normalized_fields_null_never_wrong():
    # no prior detail -> no prior block; bad calibration -> null ratios
    out = normalized_fields(10.0, 5.0, None, None, None)
    assert out["calibration_mean_sec"] is None
    assert out["baseline25_per_calibration"] is None
    assert "prior" not in out
    # prior present but missing its calibration -> ratios null, raw OK
    out = normalized_fields(
        10.0, 5.0, {"start": 1.0, "end": 1.0},
        {"baseline25_sec": 4.0}, 13,
    )
    assert out["prior"]["baseline25_ratio_raw"] == 1.25
    assert out["prior"]["host_ratio"] is None
    assert out["prior"]["baseline25_ratio_normalized"] is None


def test_fit_machine_line_degrades_names_to_counts():
    """ADVICE r13: the budget is now enforced, not advisory. A
    pathological noisy list degrades to a count (then errors would),
    and the result is always valid JSON with the summary fields."""
    import json

    # normal case: no degradation, identical to machine_line
    line, degr = fit_machine_line(
        58.0, 0.1, 72, 18.2, "BENCH_DETAIL_r14.json", ["a"], [],
    )
    assert degr == []
    assert line == machine_line(
        58.0, 0.1, 72, 18.2, "BENCH_DETAIL_r14.json", ["a"], [],
    )
    # pathological: every headline query noisy AND errored
    big = [f"doc_very_long_query_name_{i:03d}" for i in range(72)]
    line, degr = fit_machine_line(
        None, 0.1, 72, None, "BENCH_DETAIL_r14.json", big, big,
    )
    assert len(line) <= MACHINE_LINE_BUDGET
    assert degr == ["noisy->count", "errors->count"]
    parsed = json.loads(line)
    assert parsed["noisy_n"] == 72 and parsed["errors_n"] == 72
    assert "noisy" not in parsed and "errors" not in parsed
    assert parsed["detail"] == "BENCH_DETAIL_r14.json"
    # intermediate: big noisy list alone degrades only noisy
    line, degr = fit_machine_line(
        58.0, 0.1, 72, 18.2, "BENCH_DETAIL_r14.json", big, ["q_bad"],
    )
    assert len(line) <= MACHINE_LINE_BUDGET
    assert degr == ["noisy->count"]
    assert json.loads(line)["errors"] == ["q_bad"]
