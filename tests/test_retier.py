"""tools/retier.py — the diff-derived verification-priority tool
(VERDICT r5 #1). The static pieces are testable without git state:
registry parsing, the call graph, and transitive consumer search."""

from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

import retier  # noqa: E402


def test_registry_parse_complete():
    reg = retier.registry_queries()
    assert len(reg) >= 181
    fn, sql = reg["emb_kmeans"]
    assert fn == "q_emb_kmeans"
    assert reg["q1_pricing_summary"][0] == "q1_pricing_summary" or reg[
        "q1_pricing_summary"
    ][0].startswith("q")


def test_kmeans_seam_consumers_found():
    """The exact r5 miss: a change to kmeans_fit must flag emb_kmeans
    AND emb_semantic_dedup (transitive through semantic_dedup)."""
    hits = set(retier.transitive_consumers({"kmeans_fit"}))
    assert {"emb_kmeans", "emb_semantic_dedup"} <= hits


def test_leaf_operator_consumers_found():
    hits = set(retier.transitive_consumers({"bitmap_distinct"}))
    assert "orders_bitmap_distinct" in hits
    hits = set(retier.transitive_consumers({"minhash_lsh_pairs"}))
    assert "doc_minhash_pairs" in hits


def test_unrelated_change_flags_nothing():
    hits = retier.transitive_consumers({"a_symbol_that_does_not_exist_xyz"})
    assert hits == []


def test_never_checked_queries_lead_the_emitted_list(monkeypatch, capsys):
    """Mid-round, a freshly-registered query legitimately has no
    CORRECTNESS row yet — but then it MUST be emitted in tier 0 at the
    head of the priority list, or the driver never verifies it (the
    old form of this test asserted zero missing rows, which is only
    true between rounds)."""
    import sys as _sys

    ages = retier.latest_green_round()
    reg = retier.registry_queries()
    missing = [q for q in reg if q not in ages]
    # only this round's registrations may lack rows — never a backlog
    # (r8 registered thirteen: RP index + KNN join + recall report,
    # islands window, BPE merges, BPE encode + saved-vocab twin,
    # stride schedule, DSIR sample, NB confusion + saved-model twin,
    # MMR rerank, source keyness)
    assert len(missing) <= 13, f"stale unchecked backlog: {missing[:14]}"
    monkeypatch.setattr(retier, "changed_symbols", lambda base: set())
    monkeypatch.setattr(_sys, "argv", ["retier.py"])
    retier.main()
    names = _emitted_names(capsys.readouterr().out)
    assert names[: len(missing)] == missing


def test_cycle_does_not_poison_memo():
    """A False reached through cycle truncation must not be memoized:
    with graph A<->B, D->changed, B->A->? ... visiting order must not
    determine whether B's consumers are flagged (review finding r6)."""
    graph = {
        "A": {"B", "D"},
        "B": {"A"},
        "D": {"CHANGED"},
        "q_x": {"A"},
        "q_y": {"B"},
    }
    reg = {"qx": ("q_x", None), "qy": ("q_y", None)}
    orig_graph, orig_reg = retier.call_graph, retier.registry_queries
    retier.call_graph = lambda: graph
    retier.registry_queries = lambda: reg
    try:
        hits = set(retier.transitive_consumers({"CHANGED"}))
    finally:
        retier.call_graph, retier.registry_queries = orig_graph, orig_reg
    assert hits == {"qx", "qy"}


def test_slots_arg_forms(tmp_path, monkeypatch, capsys):
    """Both documented `--slots N` and `--slots=N` parse; N is not
    swallowed as a git base revision (review finding r6)."""
    import sys as _sys

    monkeypatch.setattr(
        retier, "changed_symbols", lambda base: set()
    )
    # tier 0 (never-checked registrations) occupies slots first, so
    # the fill count is 7 minus however many exist right now
    ages = retier.latest_green_round()
    tier0 = sum(1 for q in retier.registry_queries() if q not in ages)
    for argv in (["retier.py", "--slots", "7"], ["retier.py", "--slots=7"]):
        monkeypatch.setattr(_sys, "argv", argv)
        retier.main()
        out = capsys.readouterr()
        assert "_PRIORITY = [" in out.out
        assert out.out.count("#  tier") <= 2
        assert (
            sum(1 for line in out.out.splitlines() if "last row r" in line)
            == max(0, 7 - tier0)
        )


def test_deleted_method_lines_do_not_flood(monkeypatch):
    """Old-side scan counts only TOP-LEVEL '-def ' lines: a deleted
    METHOD named `read` would otherwise match every spark.read
    attribute and flood the consumer search (review finding r6)."""
    diff = (
        "--- a/airflow_subscription_etl_spark/sources/synth.py\n"
        "+++ b/airflow_subscription_etl_spark/sources/synth.py\n"
        "@@ -70,1 +70,0 @@\n"
        "-    def read(self, partition):\n"
        "@@ -90,1 +90,0 @@\n"
        "-def totally_gone_toplevel(x):\n"
    )
    monkeypatch.setattr(retier, "round_diff", lambda base: diff)
    syms = retier.changed_symbols("whatever")
    assert "read" not in syms
    assert "totally_gone_toplevel" in syms


def test_deleted_file_resets_fname(monkeypatch):
    """'+++ /dev/null' must reset the current file, or a deleted file's
    hunks attach spans to the PREVIOUS file (review finding r6)."""
    diff = (
        "--- a/airflow_subscription_etl_spark/operators/text.py\n"
        "+++ b/airflow_subscription_etl_spark/operators/text.py\n"
        "@@ -1,0 +1,1 @@\n"
        "+# touched\n"
        "--- a/airflow_subscription_etl_spark/operators/gone.py\n"
        "+++ /dev/null\n"
        "@@ -1,500 +0,0 @@\n"
    )
    spans = retier.changed_spans(diff)
    assert list(spans) == ["airflow_subscription_etl_spark/operators/text.py"]
    assert spans["airflow_subscription_etl_spark/operators/text.py"] == [(1, 1)]


def test_defs_seen_inside_toplevel_try_blocks():
    """synth.py assigns its Data Source API fallbacks inside a
    top-level try/except — those symbols must be attributable to a
    changed span (review finding r6)."""
    names = {
        n
        for n, _, _ in retier.defs_in_file(
            retier.PKG / "sources" / "synth.py"
        )
    }
    assert "DataSource" in names  # assigned in the except-ImportError arm
    assert "SynthDocsReader" in names


def _emitted_names(stdout: str) -> list[str]:
    """Query names from the printed _PRIORITY list body."""
    return [
        line.strip().strip(",").split(",")[0].strip('"')
        for line in stdout.splitlines()
        if line.strip().startswith('"')
    ]


def test_tier0_counts_against_slot_cap(monkeypatch, capsys):
    """The r6 off-by-one: a new query (no CORRECTNESS row) must be
    emitted as tier 0 BY THE TOOL and counted against the slot budget —
    r6 prepended it by hand on top of the tool's 50 and the 51st name
    (emb_quantized_topk's refresh) silently fell off the driver cap."""
    import sys as _sys

    monkeypatch.setattr(retier, "changed_symbols", lambda base: set())
    reg = retier.registry_queries()
    newbie = next(iter(reg))
    # controlled ages: EVERY query checked in r5 except the newbie —
    # the test must not depend on how many real tier-0 rows this round
    # happens to carry (mid-round that can legitimately exceed 10)
    fake_ages = {q: 5 for q in reg if q != newbie}
    monkeypatch.setattr(retier, "latest_green_round", lambda: fake_ages)
    monkeypatch.setattr(_sys, "argv", ["retier.py", "--slots", "10"])
    retier.main()
    out = capsys.readouterr().out
    names = _emitted_names(out)
    assert len(names) == 10, f"cap must hold WITH tier 0: {len(names)}"
    assert names[0] == newbie  # tier 0 leads
    assert "tier 0" in out


def test_emitted_list_never_exceeds_driver_slots(monkeypatch, capsys):
    """Against the live repo state (real ages, empty diff) the default
    emission must fit DRIVER_SLOTS exactly — the contract the driver's
    cap enforces silently."""
    import sys as _sys

    monkeypatch.setattr(retier, "changed_symbols", lambda base: set())
    monkeypatch.setattr(_sys, "argv", ["retier.py"])
    retier.main()
    names = _emitted_names(capsys.readouterr().out)
    assert len(names) <= retier.DRIVER_SLOTS


def test_slots_missing_value_is_usage_error(monkeypatch):
    import sys as _sys

    monkeypatch.setattr(_sys, "argv", ["retier.py", "--slots"])
    with pytest.raises(SystemExit, match="usage"):
        retier.main()


def test_rotation_invariant_arithmetic(monkeypatch, capsys):
    """The reconciled invariant (VERDICT r7 #2): a full rotation takes
    ceil(Q/S) rounds, so the steady-state age bound is ceil(Q/S) — NOT
    a fixed 3 — and tier-2 fill is oldest-first, so any slots consumed
    by tiers 0/1 displace the YOUNGEST eligible rows, never the
    oldest (the stale tail is always drained first)."""
    import math
    import sys as _sys

    reg = retier.registry_queries()
    bound = math.ceil(len(reg) / retier.DRIVER_SLOTS)
    assert bound == 5  # 201 queries / 50 slots — update if either moves

    monkeypatch.setattr(retier, "changed_symbols", lambda base: set())
    monkeypatch.setattr(_sys, "argv", ["retier.py"])
    retier.main()
    names = _emitted_names(capsys.readouterr().out)
    ages = retier.latest_green_round()
    emitted_ages = [ages.get(q, 0) for q in names]
    left_out = [ages.get(q, 0) for q in reg if q not in set(names)]
    # oldest-first: every emitted back-fill row is at least as old as
    # every row left out (tier 0 age=0 sorts oldest by construction)
    if left_out:
        assert max(emitted_ages) <= min(left_out)
