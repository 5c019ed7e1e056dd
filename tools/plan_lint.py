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
}


def render_plan(df) -> str:
    jdf = df._jdf  # noqa: SLF001 — explain text isn't exposed via API
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode  # noqa: SLF001
    return jdf.queryExecution().explainString(mode.fromString("formatted"))


def lint_plan(plan: str) -> dict[str, str]:
    flags: dict[str, str] = {}
    # single-partition exchange feeding a Window or Sort
    if re.search(r"Exchange SinglePartition", plan):
        # tolerate the final result collect of a 1-row aggregate:
        # a single-partition exchange straight into a final HashAggregate
        # with no Window/Sort above it is the normal global-agg plan
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            above = "\n".join(lines[max(0, i - 6) : i])
            if re.search(r"\bWindow\b|\bSort\b", above):
                flags["single-partition-window"] = line.strip()[:120]
                break
    if "CartesianProduct" in plan:
        flags["cartesian"] = "CartesianProduct node present"
    for m in re.finditer(r"PushedFilters: \[\]", plan):
        start = plan.rfind("\n", 0, m.start())
        ctx = plan[max(0, start - 400) : m.start()]
        if re.search(r"Filter \(", ctx):
            flags["full-scan-no-pushdown"] = "Filter over scan with no pushed filters"
            break
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
