"""Golden lifecycle tests (SURVEY.md §5.2 item 2; FIXTURES.md §1)."""

from __future__ import annotations

import json

import pytest

from airflow_subscription_etl_spark.plans import run_intent

GOLDEN_CREATE = {
    "subscription_id": 1003,
    "user_id": 101,
    "subscription_plan_id": 2,
    "subscription_status": "active",
    "start_date": "2025-01-01",
    "end_date": "2025-12-31",
    "payment_status": "Paid",
}


def test_create_golden_record(spark, seed_tables):
    """The notify_logs.png golden run: user 101, plan defaults to Pro."""
    plans_path, subs_path = seed_tables
    res = run_intent(spark, {"user_id": 101, "intent": "create"}, plans_path, subs_path)
    assert res.result == GOLDEN_CREATE
    assert res.payment_status == "Success"
    assert res.notified
    table = json.load(open(subs_path))
    assert len(table) == 3 and table[2] == GOLDEN_CREATE


def test_create_free_plan_payment_status(spark, seed_tables):
    plans_path, subs_path = seed_tables
    res = run_intent(
        spark,
        {"user_id": 101, "intent": "create", "selected_plan_name": "Free"},
        plans_path,
        subs_path,
    )
    assert res.result["payment_status"] == "Free"


def test_change_updates_plan_and_price_diff(spark, seed_tables):
    plans_path, subs_path = seed_tables
    res = run_intent(
        spark,
        {"user_id": 102, "intent": "change", "selected_plan_name": "Team"},
        plans_path,
        subs_path,
    )
    assert res.price_difference == 70.0
    assert res.result["subscription_plan_id"] == 3
    table = json.load(open(subs_path))
    row = next(r for r in table if r["subscription_id"] == 1002)
    assert row["subscription_plan_id"] == 3
    # M2 invariant: only plan_id changed
    assert row["subscription_status"] == "active" and row["start_date"] == "2025-02-01"


def test_change_downgrade_negative_diff(spark, seed_tables):
    """D6: downgrades still route through payment, diff is negative."""
    plans_path, subs_path = seed_tables
    res = run_intent(
        spark,
        {"user_id": 102, "intent": "change", "selected_plan_name": "Free"},
        plans_path,
        subs_path,
    )
    assert res.price_difference == -29.0
    assert res.payment_status == "Success"


def test_cancel_soft_delete(spark, seed_tables):
    plans_path, subs_path = seed_tables
    res = run_intent(spark, {"user_id": 101, "intent": "cancel"}, plans_path, subs_path)
    assert res.result["subscription_status"] == "inactive"
    table = json.load(open(subs_path))
    row = next(r for r in table if r["subscription_id"] == 1001)
    assert row["subscription_status"] == "inactive"
    # M3 invariant: other columns unchanged
    assert row["subscription_plan_id"] == 1 and row["end_date"] == "2025-12-31"


def test_view_returns_latest_active(spark, seed_tables):
    plans_path, subs_path = seed_tables
    res = run_intent(spark, {"user_id": 101, "intent": "view"}, plans_path, subs_path)
    assert res.result["subscription_id"] == 1001
    # table untouched
    assert len(json.load(open(subs_path))) == 2


def test_view_unknown_user_null_no_error(spark, seed_tables):
    """D7: view path returns null result without raising."""
    plans_path, subs_path = seed_tables
    res = run_intent(spark, {"user_id": 999, "intent": "view"}, plans_path, subs_path)
    assert res.result is None
    assert res.notified


def test_change_unknown_user_raises(spark, seed_tables):
    plans_path, subs_path = seed_tables
    with pytest.raises(ValueError, match="No active subscription for user_id 999"):
        run_intent(spark, {"user_id": 999, "intent": "change"}, plans_path, subs_path)


def test_invalid_intent_raises(spark, seed_tables):
    plans_path, subs_path = seed_tables
    with pytest.raises(ValueError, match="Invalid intent"):
        run_intent(spark, {"intent": "refund"}, plans_path, subs_path)


def test_unknown_plan_raises(spark, seed_tables):
    plans_path, subs_path = seed_tables
    with pytest.raises(ValueError, match="Selected plan not found: Gold"):
        run_intent(
            spark,
            {"user_id": 101, "intent": "create", "selected_plan_name": "Gold"},
            plans_path,
            subs_path,
        )


def test_a1_tiebreak_subscription_id_desc(spark, seed_tables):
    """D2: equal start_date → higher subscription_id wins."""
    plans_path, subs_path = seed_tables
    # create adds id 1003 with start_date 2025-01-01 == seed row 1001's
    run_intent(spark, {"user_id": 101, "intent": "create"}, plans_path, subs_path)
    res = run_intent(spark, {"user_id": 101, "intent": "view"}, plans_path, subs_path)
    assert res.result["subscription_id"] == 1003
