"""Derive the round's verification priority list from the git diff —
VERDICT r5 #1/#2.

The driver's correctness gate checks only the first ~50 entries of
``queries()`` per round, ordered by ``_PRIORITY_R{N}``. Round 5 curated
that list by hand and missed a transitive consumer: ``kmeans_fit``
gained a seam (clustering.py:168) but its consumers ``emb_kmeans`` /
``emb_semantic_dedup`` kept r3/r4 green rows. This tool closes that
gap mechanically:

  tier 0  queries with NO CORRECTNESS row in any round — new
          registrations that have never been driver-checked. Emitted by
          the tool itself (r6 prepended the new query by hand ON TOP of
          the tool's 50 and the 51st name silently fell off the
          driver's cap — the emb_quantized_topk miss).
  tier 1  queries whose implementation DIFF-transitively changed this
          round: any function/constant touched by the round's git diff
          → every REGISTRY query that transitively calls/uses it
          (static AST call graph over the package, bare-name matching —
          a deliberate OVER-approximation: a false positive costs one
          driver slot, a false negative is a stale green row)
  tier 2  oldest-green back-fill: remaining slots — i.e.
          DRIVER_SLOTS − len(tier0) − len(tier1) — go to queries whose
          latest CORRECTNESS_r*.json row is oldest (oldest-first, so
          truncation by tiers 0/1 always displaces the YOUNGEST rows)

Rotation invariant (reconciled r8 — VERDICT r7 #2): with Q registered
queries and S driver slots, a full verification rotation takes
⌈Q/S⌉ rounds even when tiers 0/1 are EMPTY — at 185/50 that is 4 —
so the steady-state guarantee is "every query's latest row is
≤ ⌈Q/S⌉ rounds old", tighter in rounds whose tiers 0/1 are small
and looser by exactly the slots those tiers consume. (The earlier
"≤3 rounds by r8" phrasing assumed Q ≤ 3·S, which the registry
outgrew.) tests/test_retier.py pins the arithmetic and the
oldest-first displacement order.

The emitted list NEVER exceeds the slot cap: tiers 0+1 are kept whole
(with a loud stderr warning if they alone exceed it — that means the
round genuinely touched more than a driver pass can verify) and tier 2
absorbs all the truncation.

Usage:
  python tools/retier.py [BASE_REV] [--slots N]

BASE_REV defaults to the last driver round-commit (``round N:`` in the
subject) so the diff covers exactly "this round so far". Prints the
ready-to-paste ``_PRIORITY_R{N}`` list plus a per-tier explanation to
stderr.
"""

from __future__ import annotations

import ast
import json
import pathlib
import re
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
PKG = ROOT / "airflow_subscription_etl_spark"
DRIVER_SLOTS = 50


def sh(*args: str) -> str:
    return subprocess.run(
        args, cwd=ROOT, check=True, capture_output=True, text=True
    ).stdout


def default_base() -> str:
    """Most recent commit whose subject starts with 'round N:' — the
    driver's round-boundary commit."""
    log = sh("git", "log", "--format=%H %s", "-200")
    for line in log.splitlines():
        sha, _, subj = line.partition(" ")
        if re.match(r"round \d+:", subj):
            return sha
    return "HEAD~20"  # fallback: a generous window


def round_diff(base: str) -> str:
    """One fetch of the round's diff, base → WORKING TREE (not ..HEAD):
    the tool's documented workflow runs it mid-round with uncommitted
    edits, and new-side line numbers must match the files
    ``defs_in_file`` parses from disk."""
    return sh("git", "diff", "--unified=0", base, "--", "*.py")


def changed_spans(diff: str) -> dict[str, list[tuple[int, int]]]:
    """file → [(start, end)] line spans changed on the NEW side, plus
    single-line anchors for pure deletions (the surrounding context
    still identifies the enclosing function)."""
    spans: dict[str, list[tuple[int, int]]] = {}
    fname = None
    for line in diff.splitlines():
        if line.startswith("+++ "):
            # "+++ /dev/null" (deleted file) must RESET fname, or the
            # deletion's hunk headers attach to the previous file
            fname = line[6:] if line.startswith("+++ b/") else None
        elif line.startswith("@@") and fname:
            m = re.match(r"@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@", line)
            if m:
                start = int(m.group(1))
                count = int(m.group(2) or "1")
                # count==0: pure deletion — anchor on the preceding line
                spans.setdefault(fname, []).append(
                    (max(start, 1), max(start + max(count, 1) - 1, 1))
                )
    return spans


def _toplevel_stmts(tree: ast.Module):
    """Module statements, looking THROUGH top-level try/if/with blocks
    (sources/synth.py defines its DataSource classes inside a
    try/except ImportError) but never into function/class bodies."""
    stack = list(tree.body)
    while stack:
        node = stack.pop(0)
        if isinstance(node, (ast.Try, ast.If, ast.With)):
            for field in ("body", "orelse", "finalbody"):
                stack.extend(getattr(node, field, []) or [])
            stack.extend(
                s2 for h in getattr(node, "handlers", []) or [] for s2 in h.body
            )
        else:
            yield node


def defs_in_file(path: pathlib.Path) -> list[tuple[str, int, int]]:
    """(name, start, end) for TOP-LEVEL function/class defs and
    module-level assignment targets only. Nested defs (methods,
    closures) are deliberately NOT recorded as their own symbols: a
    change inside one intersects the parent's span, and method names
    like ``read``/``__init__`` collide with universal attribute names
    (``spark.read``) — recording them floods the consumer search
    (observed: every one of 181 queries flagged)."""
    try:
        tree = ast.parse(path.read_text())
    except (OSError, SyntaxError):
        return []
    out: list[tuple[str, int, int]] = []
    for node in _toplevel_stmts(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.append((node.name, node.lineno, node.end_lineno or node.lineno))
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            for t in targets:
                if isinstance(t, ast.Name):
                    out.append((t.id, node.lineno, node.end_lineno or node.lineno))
    return out


def _in_scope(fname: str) -> bool:
    """Only files that can change QUERY BEHAVIOR count as changed:
    the package itself and the driver contract. Tests and tools share
    common bare names (main, SEED, fixtures) with package symbols;
    counting them floods tier 1 with every query (observed: a
    tests/tools-only diff marked all 181 queries changed)."""
    return fname.startswith("airflow_subscription_etl_spark/") or fname in (
        "__spark_entry__.py",
    )


def changed_symbols(base: str) -> set[str]:
    """Names of functions/classes/module constants whose span intersects
    the diff, on BOTH the old and new side of the range."""
    diff = round_diff(base)
    symbols: set[str] = set()
    for fname, spans in changed_spans(diff).items():
        if not fname.endswith(".py") or not _in_scope(fname):
            continue
        path = ROOT / fname
        if not path.exists():
            continue
        for name, s, e in defs_in_file(path):
            if any(a <= e and s <= b for a, b in spans):
                symbols.add(name)
    # old side: TOP-LEVEL functions deleted or renamed still invalidate
    # consumers. Only unindented "-def " lines count — a deleted METHOD
    # line would re-introduce the bare-name flooding (`read` matches
    # every spark.read) that defs_in_file/call_graph exclude.
    cur_file = None
    for line in diff.splitlines():
        if line.startswith("--- a/"):
            cur_file = line[6:]
        elif line.startswith("--- "):
            cur_file = None
        elif line.startswith("-def "):
            m = re.match(r"-def\s+(\w+)", line)
            if m and cur_file and cur_file.endswith(".py") and _in_scope(cur_file):
                symbols.add(m.group(1))
    return symbols


def call_graph() -> dict[str, set[str]]:
    """function name → bare names it references (calls AND loads, so a
    changed module constant like an SQL string propagates too). Bare
    names over-approximate (two modules sharing a name merge), which is
    the safe direction for verification priority."""
    graph: dict[str, set[str]] = {}
    files = list(PKG.rglob("*.py")) + [ROOT / "__spark_entry__.py"]

    def refs_of(node: ast.AST) -> set[str]:
        refs: set[str] = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.Name):
                refs.add(sub.id)
            elif isinstance(sub, ast.Attribute):
                refs.add(sub.attr)
        return refs

    for path in files:
        try:
            tree = ast.parse(path.read_text())
        except (OSError, SyntaxError):
            continue
        # Only TOP-LEVEL defs become graph nodes under their bare name.
        # Methods and closures are absorbed into their class/function
        # node (ast.walk covers the whole body): a separate bare-name
        # node for a method like `read` would be resolved by every
        # `spark.read` attribute in the codebase, flooding the search
        # (observed: 181/181 queries flagged through
        # q_* → _t → spark.read → SynthDocsReader.read → _doc_text).
        for node in _toplevel_stmts(tree):
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                graph.setdefault(node.name, set()).update(
                    refs_of(node) - {node.name}
                )
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                # module-level assignments that reference functions (e.g.
                # SQL built by helper calls) — attributed to the name
                targets = (
                    node.targets if isinstance(node, ast.Assign) else [node.target]
                )
                names = [t.id for t in targets if isinstance(t, ast.Name)]
                refs = refs_of(node)
                for n in names:
                    graph.setdefault(n, set()).update(refs - set(names))
    return graph


def registry_queries() -> dict[str, tuple[str, str | None]]:
    """query name → (query-fn name, oracle symbol name or None), parsed
    from the REGISTRY literal in queries.py without importing Spark."""
    tree = ast.parse((PKG / "queries.py").read_text())
    out: dict[str, tuple[str, str | None]] = {}
    for node in tree.body:
        targets = (
            node.targets
            if isinstance(node, ast.Assign)
            else [node.target]
            if isinstance(node, ast.AnnAssign)
            else []
        )
        if (
            any(isinstance(t, ast.Name) and t.id == "REGISTRY" for t in targets)
            and isinstance(getattr(node, "value", None), ast.Dict)
        ):
            for k, v in zip(node.value.keys, node.value.values):
                if not isinstance(k, ast.Constant) or not isinstance(v, ast.Tuple):
                    continue
                fn_el, sql_el = v.elts
                fn_name = fn_el.id if isinstance(fn_el, ast.Name) else None
                sql_name = sql_el.id if isinstance(sql_el, ast.Name) else None
                if fn_name:
                    out[k.value] = (fn_name, sql_name)
    return out


def transitive_consumers(
    changed: set[str], reg: dict[str, tuple[str, str | None]] | None = None
) -> list[str]:
    graph = call_graph()
    reg = reg if reg is not None else registry_queries()
    # reachability memo: does `name` reach a changed symbol? True is
    # always safe to memoize; False only when computed with an EMPTY
    # stack — a False found mid-cycle is truncated (the cycle check
    # cut off a path that may reach the change through an ancestor)
    # and memoizing it would silently drop consumers, the exact
    # stale-green failure this tool exists to prevent.
    memo: dict[str, bool] = {}

    def reaches(name: str, stack: frozenset[str] = frozenset()) -> bool:
        if name in changed:
            return True
        if name in memo:
            return memo[name]
        if name in stack or name not in graph:
            return False
        hit = any(
            reaches(ref, stack | {name})
            for ref in graph[name]
            if ref in graph or ref in changed
        )
        if hit or not stack:
            memo[name] = hit
        return hit

    hits = []
    for qname, (fn_name, sql_name) in reg.items():
        if reaches(fn_name) or (sql_name and reaches(sql_name)):
            hits.append(qname)
    return hits


def latest_green_round() -> dict[str, int]:
    """query → latest round with a CORRECTNESS row (any verdict)."""
    ages: dict[str, int] = {}
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.stem).group(1))
        for qname in json.loads(path.read_text()):
            ages[qname] = max(ages.get(qname, 0), rnd)
    return ages


def main() -> None:
    argv = sys.argv[1:]
    slots = DRIVER_SLOTS
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--slots":  # documented form: --slots N
            if i + 1 >= len(argv):
                raise SystemExit("usage: retier.py [BASE_REV] [--slots N]")
            slots = int(argv[i + 1])
            i += 2
        elif a.startswith("--slots="):
            slots = int(a.split("=", 1)[1])
            i += 1
        else:
            args.append(a)
            i += 1
    base = args[0] if args else default_base()
    print(f"# diff base: {base[:12]}", file=sys.stderr)

    changed = changed_symbols(base)
    print(f"# changed symbols ({len(changed)}): {sorted(changed)}", file=sys.stderr)

    reg = registry_queries()
    reg_order = list(reg)
    ages = latest_green_round()

    # tier 0: never driver-checked (no CORRECTNESS row in any round)
    tier0 = [q for q in reg_order if ages.get(q, 0) == 0]
    print(f"# tier 0 (never checked, {len(tier0)}): {tier0}", file=sys.stderr)

    tier1 = [q for q in transitive_consumers(changed, reg) if q not in tier0]
    tier1.sort(key=reg_order.index)
    print(f"# tier 1 (diff consumers, {len(tier1)}): {tier1}", file=sys.stderr)

    fixed = len(tier0) + len(tier1)
    if fixed > slots:
        print(
            f"# WARNING: tiers 0+1 alone hold {fixed} queries > {slots} "
            "slots — the driver will only check the first "
            f"{slots}; consider a narrower diff base",
            file=sys.stderr,
        )
    fill = [q for q in reg_order if q not in tier1 and q not in tier0]
    # oldest round first, stable by registry order
    fill.sort(key=lambda q: (ages.get(q, 0), reg_order.index(q)))
    tier2 = fill[: max(slots - fixed, 0)]
    print(f"# tier 2 (oldest-green fill, {len(tier2)})", file=sys.stderr)
    assert len(tier0) + len(tier1) + len(tier2) <= max(slots, fixed)

    print("_PRIORITY = [")
    if tier0:
        print("    # tier 0 — NEW registered queries (no CORRECTNESS row yet)")
        for q in tier0:
            print(f'    "{q}",')
    print("    # tier 1 — implementation diff-reachable this round")
    for q in tier1:
        print(f'    "{q}",')
    print("    # tier 2 — oldest-green driver rows, round-robin back-fill")
    for q in tier2:
        print(f'    "{q}",  # last row r{ages.get(q, 0)}')
    print("]")


if __name__ == "__main__":
    main()
