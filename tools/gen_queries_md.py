"""Regenerate QUERIES.md from the query registry."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from airflow_subscription_etl_spark.queries import REGISTRY

lines = [
    "# QUERIES — the driver-checked surface",
    "",
    "Auto-generated from `airflow_subscription_etl_spark/queries.py::REGISTRY`",
    "(`tools/gen_queries_md.py` regenerates). Every entry runs as",
    "`queries()[name](spark, sf_dir)`; **oracled** entries are hash-compared",
    "against the DuckDB SQL in `oracle_sql()[name]` at sf0.01 (row count +",
    "schema + order-insensitive values); *rows-only* entries are",
    "non-SQL-expressible (iterative algorithms, LSH internals, pixel math)",
    "and get a weaker rows/schema check plus dedicated unit/recall tests.",
    "",
    "| # | query | check | what it exercises |",
    "|---|---|---|---|",
]
for i, (name, (fn, sql)) in enumerate(REGISTRY.items(), 1):
    doc = (fn.__doc__ or "").strip().splitlines()
    first = " ".join(ln.strip() for ln in doc[:2]).strip()
    if len(first) > 110:
        first = first[:107] + "..."
    kind = "oracled" if sql else "*rows-only*"
    lines.append(f"| {i} | `{name}` | {kind} | {first} |")
lines.append("")
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
open(out, "w").write("\n".join(lines))
print(f"wrote {out} ({len(REGISTRY)} entries)")
