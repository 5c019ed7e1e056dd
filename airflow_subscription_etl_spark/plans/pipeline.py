"""Lifecycle pipeline: the reference DAG's control flow as driver code.

Maps the Airflow layer (SURVEY.md §2.7, C1–C7) to plain Python
dispatch. The reference routes ``create | change | cancel | view``
through two ``BranchPythonOperator``s (subscription_flow.py:69–76,
258–267); here un-taken branches are never even *planned* — cheaper
than Airflow's skip propagation. The always-run ``notify_user``
finalizer (TriggerRule.ALL_DONE, :334) becomes try/finally (C4).

Error-message parity with the reference's ``ValueError``s:
- invalid intent            (:62–63)
- no active subscription    (:108–109)
- unknown selected plan     (:178–179, :208–209)

An Airflow deployment keeps orchestration upstream: a thin DAG shells
into :func:`run_intent` per run (see ``dags/subscription_flow_spark.py``),
retaining retries (C6) at the task level.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mutations import (
    cancel_subscription,
    change_subscription_plan,
    insert_subscription,
)
from ..operators.relational import (
    active_subs_for_user,
    lookup_join,
    price_difference,
    top1_per_key,
    validate_intent,
    with_label,
)
from ..sources.io import (
    read_plans,
    read_user_subscriptions,
    write_json_table,
)


@dataclass
class RunResult:
    """What the reference surfaces via XCom + notify_user (:248–256)."""

    intent: str
    user_id: int
    result: dict[str, Any] | None = None
    price_difference: float | None = None
    payment_status: str | None = None
    plan_labels: list[str] = field(default_factory=list)
    notified: bool = False

    def notify_json(self) -> str:
        """S5 log sink: pretty JSON (subscription_flow.py:256)."""
        return json.dumps(self.result, indent=2)


def _latest_active(subs: DataFrame, user_id: int) -> DataFrame:
    """P3 + A1 composition (subscription_flow.py:93–110)."""
    return active_subs_for_user(subs, user_id).transform(
        lambda d: top1_per_key(
            d, "user_id", [F.col("start_date").desc(), F.col("subscription_id").desc()]
        )
    )


def _selected_plan(plans: DataFrame, name: str) -> DataFrame:
    return plans.filter(F.col("subscription_plan_name") == name)


def run_intent(
    spark: SparkSession,
    conf: dict[str, Any],
    plans_path: str,
    subs_path: str,
) -> RunResult:
    """Execute one lifecycle run — the whole reference DAG in one job.

    ``conf`` mirrors ``dag_run.conf`` (subscription_flow.py:52–60):
    ``user_id`` (default 0), ``intent`` (default "view"),
    ``selected_plan_name`` (default "Pro", :157).
    """
    user_id = int(conf.get("user_id") or 0)
    intent = validate_intent(str(conf.get("intent") or "view"))
    selected_name = str(conf.get("selected_plan_name") or "Pro")

    res = RunResult(intent=intent, user_id=user_id)
    try:
        plans = read_plans(spark, plans_path)
        subs = read_user_subscriptions(spark, subs_path)

        if intent in ("create", "change"):
            # fetch_subscription_plans / fetch_available…: P1+P2 labels
            # (subscription_flow.py:84–91, 127–134).
            res.plan_labels = [
                r["label"]
                for r in with_label(
                    plans, "subscription_plan_name", "subscription_price"
                )
                .select("label")
                .collect()
            ]

        if intent == "create":
            sel = _selected_plan(plans, selected_name)
            if sel.isEmpty():
                raise ValueError(f"Selected plan not found: {selected_name}")
            res.payment_status = "Success"  # E4 (:186)
            new_subs = insert_subscription(subs, sel, user_id)
            # write_json_table materializes BEFORE overwriting; derive the
            # result from those rows — any later action on `new_subs`
            # would lazily re-read the mutated file (see sources.io).
            rows = write_json_table(new_subs, subs_path)
            res.result = max(rows, key=lambda r: r["subscription_id"])

        elif intent == "change":
            current = _latest_active(subs, user_id)
            if current.isEmpty():
                raise ValueError(f"No active subscription for user_id {user_id}")
            # J1/J4 enrichment (:118–125)
            cur_plan = lookup_join(current, plans, "subscription_plan_id")
            sel = _selected_plan(plans, selected_name)
            if sel.isEmpty():
                raise ValueError(f"Selected plan not found: {selected_name}")
            # E1 price diff (:170–182): 1-row × 1-row crossJoin, stays tiny.
            diff_row = (
                sel.select(F.col("subscription_price").alias("new_price"))
                .crossJoin(
                    cur_plan.select(F.col("subscription_price").alias("current_price"))
                )
                .select(price_difference(F.col("new_price"), F.col("current_price")))
                .collect()[0]
            )
            res.price_difference = float(diff_row["price_difference"])
            res.payment_status = "Success"  # E4 (:190) — downgrades too (D6)
            new_plan_id = sel.collect()[0]["subscription_plan_id"]
            # materialize the target id BEFORE the write mutates the file
            target_id = current.select("subscription_id").collect()[0][0]
            new_subs = change_subscription_plan(subs, user_id, int(new_plan_id))
            rows = write_json_table(new_subs, subs_path)
            res.result = next(r for r in rows if r["subscription_id"] == target_id)

        elif intent == "cancel":
            current = _latest_active(subs, user_id)
            if current.isEmpty():
                raise ValueError(f"No active subscription for user_id {user_id}")
            target_id = current.select("subscription_id").collect()[0][0]
            new_subs = cancel_subscription(subs, user_id)
            rows = write_json_table(new_subs, subs_path)
            res.result = next(r for r in rows if r["subscription_id"] == target_id)

        else:  # view — null result, NO error (decision D7, :245)
            current = _latest_active(subs, user_id)
            res.result = _collect_one(current)

        return res
    finally:
        # C4: notify always runs (TriggerRule.ALL_DONE, :334), even when a
        # branch raised above.
        res.notified = True


def _collect_one(df: DataFrame) -> dict[str, Any] | None:
    rows = df.limit(1).collect()
    if not rows:
        return None
    return {k: v for k, v in rows[0].asDict().items() if v is not None}
