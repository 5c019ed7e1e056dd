"""Driver-contract consistency: the __spark_entry__ surface must stay
well-formed (every oracle key has a query, callables are callable,
names are unique and stable-ish)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_every_oracle_key_has_a_query():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)


def test_queries_are_callables_and_nonempty():
    q = E.queries()
    assert len(q) >= 80
    assert all(callable(f) for f in q.values())


def test_oracle_sql_are_nonempty_strings():
    o = E.oracle_sql()
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_entry_returns_dataframe(spark):
    df = E.entry(spark)
    assert df.schema is not None
    assert df.count() > 0


def test_priority_list_names_all_registered():
    """The priority list silently skips unknown names (by design, so a
    removed query can't break import) — this test makes a typo loud.
    Resolves the CURRENT round's list by name pattern so the per-round
    rename (_PRIORITY_R5 → _PRIORITY_R6 → …) can't silently detach the
    guard from the live list (it did in round 6)."""
    import re

    from airflow_subscription_etl_spark import queries

    names = sorted(
        (n for n in dir(queries) if re.fullmatch(r"_PRIORITY_R\d+", n)),
        key=lambda n: int(n[len("_PRIORITY_R"):]),
    )
    assert names, "no _PRIORITY_R<N> list found"
    priority = getattr(queries, names[-1])
    missing = [n for n in priority if n not in queries.REGISTRY]
    assert not missing, missing
    assert len(set(priority)) == len(priority), "duplicates"
    # and the live ordering actually consumes that list
    assert list(queries.queries())[: len(priority)] == [
        n for n in priority if n in queries.REGISTRY
    ]


def test_ordered_registry_preserves_full_surface():
    from airflow_subscription_etl_spark.queries import REGISTRY, oracle_sql, queries

    q = queries()
    assert set(q) == set(REGISTRY)
    o = oracle_sql()
    assert set(o) <= set(q)
    # every oracled name has non-empty SQL
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_concurrent_queries_match_serial(spark):
    """Six queries run concurrently on ONE SparkSession (the FAIR-pool
    multi-tenant driver posture) must produce byte-identical results to
    their serial runs — no cross-query state leakage (temp views,
    confs, registered UDTFs are the risky shared surface)."""
    from concurrent.futures import ThreadPoolExecutor

    from airflow_subscription_etl_spark.queries import REGISTRY

    names = [
        "q1_pricing_summary",
        "doc_token_stats",
        "ev_user_totals",
        "p1_projection",
        "window_suite",
        "doc_term_vectors",  # uses a temp view + UDTF registration
    ]
    sf = "/root/testdata/sf0.001"

    def run(name):
        fn, _ = REGISTRY[name]
        rows = fn(spark, sf).collect()
        return sorted(tuple(str(v) for v in r) for r in rows)

    serial = {n: run(n) for n in names}
    with ThreadPoolExecutor(max_workers=6) as ex:
        futures = {n: ex.submit(run, n) for n in names}
        concurrent = {n: f.result(timeout=120) for n, f in futures.items()}
    assert concurrent == serial


def test_observe_metrics_match_direct_aggregate(spark):
    """df.observe(): metrics collected DURING an action (one pass, no
    second job) equal the same aggregates computed directly — the
    zero-extra-scan DQ counters pattern for production pipelines."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from airflow_subscription_etl_spark.sources.io import read_star_table

    orders = read_star_table(spark, "/root/testdata/sf0.001", "orders")
    obs = Observation("dq")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        F.max("o_orderdate").alias("max_date"),
    )
    n_out = observed.filter(F.col("o_totalprice") > 0).count()
    got = obs.get
    direct = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        F.max("o_orderdate").alias("max_date"),
    ).collect()[0]
    assert got["n_rows"] == direct["n_rows"] == n_out
    assert got["cents"] == direct["cents"]
    assert got["max_date"] == direct["max_date"]
