"""tools/retier.py — the diff-derived verification-priority tool
(VERDICT r5 #1). The static pieces are testable without git state:
registry parsing, the call graph, and transitive consumer search."""

from __future__ import annotations

import sys
import pathlib

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


def test_ages_cover_registry():
    ages = retier.latest_green_round()
    reg = retier.registry_queries()
    missing = [q for q in reg if q not in ages]
    assert not missing, f"queries with no CORRECTNESS row: {missing[:5]}"


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
    for argv in (["retier.py", "--slots", "7"], ["retier.py", "--slots=7"]):
        monkeypatch.setattr(_sys, "argv", argv)
        retier.main()
        out = capsys.readouterr()
        assert "_PRIORITY = [" in out.out
        assert out.out.count("#  tier") <= 2
        # 0 tier-1 + 7 fill slots
        assert sum(1 for line in out.out.splitlines() if "last row r" in line) == 7
