"""Focused per-query timing with bench.py's exact methodology (warm
session, sf0.001 warmup, noop sink, cache cleared between queries,
min of steady passes) for optimization iteration.

Usage: python tools/minibench.py <query> [query ...]   # 3 passes each
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_subscription_etl_spark import get_spark  # noqa: E402
from airflow_subscription_etl_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark("minibench")
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in names:
        fn, _ = REGISTRY[name]
        fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    for name in names:
        fn, _ = REGISTRY[name]
        times = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        steady = times[1:]
        print(f"{min(steady):7.3f}  {name}  passes={times}")
    spark.stop()


if __name__ == "__main__":
    main()
