"""Local replica of the driver's correctness gate.

Faithfulness rules (learned the hard way in round 1):

- The Spark session is built with DEFAULT semantic configs — NOT
  :func:`airflow_subscription_etl_spark.get_spark` — because the driver
  runs queries under its own session. Any query that silently depends on
  our session factory (nanosAsLong, UTC, ANSI, …) must fail HERE the
  same way it fails there. Only perf-only knobs (shuffle partitions,
  UI, driver memory) are set.
- Comparison mirrors the driver's ``_canon``: sort columns by name,
  sort rows by all columns on RAW values (so unhashable cells — arrays,
  maps — crash loudly, exactly like the driver), then stringify every
  cell and require EXACT string equality. No float tolerance: a float64
  ``506627.0`` vs int64 ``506627`` dtype divergence must be red here
  because it is red there.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from airflow_subscription_etl_spark.queries import REGISTRY  # noqa: E402
from airflow_subscription_etl_spark.schemas import STAR_TABLES  # noqa: E402


def driver_like_session() -> SparkSession:
    """Default-config session: semantic confs untouched (see module doc)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return (
        SparkSession.builder.appName("oracle-check-driverlike")
        .master(f"local[{cpus}]")
        # perf-only — but overridable (SPARK_GRAFT_SHUFFLE) so sweeps can
        # prove results are partition-count-INDEPENDENT (a class of bug
        # the fixed count would mask, e.g. sampled range boundaries)
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver: sort cols by name, sort rows on raw values
    (raises on unhashable cells — intentionally), then stringify."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df.astype(str)


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    try:
        a, b = canon(spark_pdf), canon(duck_pdf)
    except Exception as e:  # noqa: BLE001 — unhashable column = driver ERR
        return f"CANON-ERROR {type(e).__name__}: {e}"
    for c in a.columns:
        neq = a[c] != b[c]
        if neq.any():
            bad = neq.idxmax()
            return f"VALUES col={c} row={bad}: {a[c][bad]!r} vs {b[c][bad]!r}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # fixture-computed reference oracles must target the SAME scale
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = driver_like_session()
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        # per-call .persist() inside operators (LSH signatures, IVF
        # residuals) would otherwise accumulate across a 181-query
        # sweep in this one shared session (ADVICE r5 leak)
        spark.catalog.clearCache()
        if callable(sql):  # fixture-computed reference oracle
            sql = sql()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {msg}")
            failures += 1
            continue
        if sql is None:
            # driver still canonicalizes rows-only results — unhashable
            # output columns crash there, so they must crash here too
            try:
                canon(sdf)
                print(f"{name:28s} rows-only   n={len(sdf)}  ({time.time()-t0:.1f}s)")
            except Exception as e:  # noqa: BLE001
                print(f"{name:28s} ROWS-ONLY-CANON-ERROR {type(e).__name__}: {e}")
                failures += 1
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"{name:28s} DUCK-ERROR {type(e).__name__}: {msg}")
            failures += 1
            continue
        verdict = compare(sdf, ddf)
        if verdict != "OK":
            failures += 1
        print(f"{name:28s} {verdict}  n={len(sdf)}  ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"-- failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
