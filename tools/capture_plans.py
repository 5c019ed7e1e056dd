"""Capture .explain("formatted") output for named headline queries.

Usage: python tools/capture_plans.py <out_dir> <query> [query ...]
       python tools/capture_plans.py <out_dir> --headline

Writes ``<out_dir>/<query>.txt`` per query. Round-14 optimization
deliverable: ``plans/r14/<query>_before.txt`` / ``..._after.txt`` —
run with out_dir=plans/r14 and rename, or pass names already suffixed
via --suffix.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_subscription_etl_spark import get_spark  # noqa: E402
from airflow_subscription_etl_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = ""
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    out_dir = args[0]
    names = args[1:]
    if names == ["--headline"]:
        import bench

        names = bench.HEADLINE
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange lines)")
    spark.stop()


if __name__ == "__main__":
    main()
