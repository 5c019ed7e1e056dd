"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (when present) its
``oracle_sql()`` on DuckDB over the same sf dir, then compares:
row count, sorted column names, and order-insensitive values
(exact match after canonicalization; floats compared exactly AND with
tolerance so we can see which mismatches are FP-noise vs real).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from airflow_subscription_etl_spark import get_spark  # noqa: E402
from airflow_subscription_etl_spark.queries import REGISTRY  # noqa: E402
from airflow_subscription_etl_spark.schemas import STAR_TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    exact = True
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                av_f = av.astype(float)
                bv_f = bv.astype(float)
                if not (av_f.fillna(-1e308) == bv_f.fillna(-1e308)).all():
                    exact = False
                    close = (
                        (av_f - bv_f).abs()
                        <= 1e-9 + 1e-9 * bv_f.abs()
                    ) | (av_f.isna() & bv_f.isna())
                    if not close.all():
                        bad = (~close).idxmax()
                        return (
                            f"VALUES col={c} row={bad}: "
                            f"{av_f[bad]!r} vs {bv_f[bad]!r}"
                        )
            else:
                if not (av.fillna("\0") == bv.fillna("\0")).all():
                    bad = (av.fillna("\0") != bv.fillna("\0")).idxmax()
                    return f"VALUES col={c} row={bad}: {av[bad]!r} vs {bv[bad]!r}"
        except Exception as e:  # noqa: BLE001
            return f"COMPARE-ERROR col={c}: {e}"
    return "OK" if exact else "OK(float-tol)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"{name:28s} rows-only   n={len(sdf)}  ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} DUCK-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        verdict = compare(name, sdf, ddf)
        status = "ok" if verdict.startswith("OK") else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:28s} {verdict}  n={len(sdf)}  ({time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
