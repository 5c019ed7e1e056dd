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
    """_PRIORITY_R3 silently skips unknown names (by design, so a
    removed query can't break import) — this test makes a typo loud."""
    from airflow_subscription_etl_spark.queries import _PRIORITY_R3, REGISTRY

    missing = [n for n in _PRIORITY_R3 if n not in REGISTRY]
    assert not missing, missing
    assert len(set(_PRIORITY_R3)) == len(_PRIORITY_R3), "duplicates"


def test_ordered_registry_preserves_full_surface():
    from airflow_subscription_etl_spark.queries import REGISTRY, oracle_sql, queries

    q = queries()
    assert set(q) == set(REGISTRY)
    o = oracle_sql()
    assert set(o) <= set(q)
    # every oracled name has non-empty SQL
    assert all(isinstance(s, str) and s.strip() for s in o.values())
