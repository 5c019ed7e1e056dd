"""Plan-shape regression tests.

The 100 TB posture is a property of the PLAN, not the output: filters
must reach the parquet scan, catalog joins must broadcast, and nothing
may degenerate into a cartesian product. These assertions pin that.
"""

from __future__ import annotations

import pytest

from airflow_subscription_etl_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _formatted_plan(spark, name: str) -> str:
    fn, _ = REGISTRY[name]
    df = fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_volume",
        "q6_forecast_revenue",
        "q14_promo_share",
        "q18_large_orders",
        "anti_join_idle_customers",
        "j1_lookup",
        "j4_latest_enriched",
    ],
)
def test_no_cartesian_or_nested_loop(spark, name):
    plan = _formatted_plan(spark, name)
    assert "CartesianProduct" not in plan
    # BroadcastNestedLoopJoin is legitimate only for the deliberate
    # 1-row scalar-subquery cross joins, never in these equi-join plans
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    ("name", "fragment"),
    [
        # selective predicates must be pushed into the parquet scan
        ("q6_forecast_revenue", "GreaterThanOrEqual(l_shipdate"),
        ("q14_promo_share", "GreaterThanOrEqual(l_shipdate"),
        ("p3_filter", "EqualTo(o_orderstatus,O)"),
        ("anti_join_idle_customers", "EqualTo(o_orderpriority,1-URGENT)"),
    ],
)
def test_filter_pushdown(spark, name, fragment):
    plan = _formatted_plan(spark, name)
    assert fragment in plan, f"expected pushed filter {fragment!r} in {name} plan"


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q14_promo_share", "j1_lookup", "j4_latest_enriched"],
)
def test_catalog_joins_broadcast(spark, name):
    plan = _formatted_plan(spark, name)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # at test scale everything fits broadcast


def test_column_pruning_reaches_scan(spark):
    """A 3-column projection must not read the whole part table."""
    plan = _formatted_plan(spark, "p1_projection")
    assert "ReadSchema" in plan
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "p_retailprice" not in read_schema
    assert "p_size" not in read_schema
