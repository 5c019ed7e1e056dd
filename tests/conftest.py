from __future__ import annotations

import json
import os

import pytest

from airflow_subscription_etl_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def seed_tables(tmp_path):
    """Reference seed fixtures as JSON-array files (FIXTURES.md §1)."""
    plans = [
        {
            "subscription_plan_id": 1,
            "subscription_plan_name": "Free",
            "subscription_price": 0,
            "subscription_plan_start_date": "2025-01-01",
            "subscription_plan_end_date": "2025-12-31",
        },
        {
            "subscription_plan_id": 2,
            "subscription_plan_name": "Pro",
            "subscription_price": 29,
            "subscription_plan_start_date": "2025-01-01",
            "subscription_plan_end_date": "2025-12-31",
        },
        {
            "subscription_plan_id": 3,
            "subscription_plan_name": "Team",
            "subscription_price": 99,
            "subscription_plan_start_date": "2025-01-01",
            "subscription_plan_end_date": "2025-12-31",
        },
    ]
    subs = [
        {
            "subscription_id": 1001,
            "user_id": 101,
            "subscription_plan_id": 1,
            "subscription_status": "active",
            "start_date": "2025-01-01",
            "end_date": "2025-12-31",
        },
        {
            "subscription_id": 1002,
            "user_id": 102,
            "subscription_plan_id": 2,
            "subscription_status": "active",
            "start_date": "2025-02-01",
            "end_date": "2025-12-31",
        },
    ]
    plans_path = str(tmp_path / "plans.json")
    subs_path = str(tmp_path / "user_subscriptions.json")
    with open(plans_path, "w") as f:
        json.dump(plans, f, indent=2)
    with open(subs_path, "w") as f:
        json.dump(subs, f, indent=2)
    return plans_path, subs_path
