"""Thin Airflow shell for the Spark subscription-lifecycle pipeline.

Orchestration stays in Airflow, data processing in Spark (SURVEY.md §0;
BASELINE.json "spark_approach"): every task here delegates to the pure
library `airflow_subscription_etl_spark.plans.pipeline.run_intent` —
there is no data logic in this file.

Control-flow parity with the reference DAG
(/root/reference/dags/subscription_flow.py:342–358, SURVEY.md §2.7):

- C1  intent branch (:69–76)            → `route_intent` BranchPythonOperator
- C2  post-bot branch (:258–267)        → collapsed: branch targets run the
      full intent path in one Spark-driver task each (unexecuted branches
      are never planned — cheaper than Airflow skip-propagation)
- C3  join-with-skips (:299…)           → NONE_FAILED_MIN_ONE_SUCCESS on `end`
- C4  always-run notify (:334)          → ALL_DONE on `notify_user`
- C5  no-op join node (:327–330)        → EmptyOperator `end`
- C6  retries=1 / 1 min (:18–19)        → default_args
- C7  the statically-declared but dynamically-dead edge
      route_bot >> process_sel (:348) needs no port (SURVEY.md §2.7 C7).

The import guard keeps the module importable (and testable) where
Airflow isn't installed; a real deployment parses this under the
scheduler as usual.
"""

from __future__ import annotations

import json
import os
from datetime import timedelta

try:
    from airflow import DAG
    from airflow.operators.empty import EmptyOperator
    from airflow.operators.python import BranchPythonOperator, PythonOperator
    from airflow.utils.trigger_rule import TriggerRule

    HAVE_AIRFLOW = True
except ImportError:  # pragma: no cover - CI container has no Airflow
    HAVE_AIRFLOW = False

INTENTS = ("create", "change", "cancel", "view")


def _conf(context) -> dict:
    dag_run = context.get("dag_run")
    return dict(getattr(dag_run, "conf", None) or {})


def route_intent(**context) -> str:
    """C1: validate the intent enum and return the branch task id."""
    intent = str(_conf(context).get("intent") or "view")
    if intent not in INTENTS:
        raise ValueError(f"Invalid intent: {intent}")
    return f"run_{intent}"


def run_intent_task(intent: str, **context):
    """One Spark-driver task per intent path: build the session, run the
    pure pipeline, log the result record (S5 notification parity)."""
    from airflow_subscription_etl_spark import get_spark
    from airflow_subscription_etl_spark.plans.pipeline import run_intent

    conf = _conf(context)
    conf["intent"] = intent
    plans_path = conf.get(
        "plans_path", os.environ.get("SUBSCRIPTION_PLANS_PATH", "data/plans.json")
    )
    subs_path = conf.get(
        "subs_path",
        os.environ.get("SUBSCRIPTION_SUBS_PATH", "data/user_subscriptions.json"),
    )
    spark = get_spark(f"subscription-{intent}")
    result = run_intent(spark, conf, plans_path=plans_path, subs_path=subs_path)
    payload = result.result if result.result is not None else None
    print(json.dumps(payload, indent=2))
    return payload


def notify_user(**context):
    """C4: always runs (ALL_DONE), mirroring the reference notify task."""
    print("subscription_flow_spark finished; see upstream task logs for the record")


if HAVE_AIRFLOW:
    with DAG(
        dag_id="subscription_flow_spark",
        schedule=None,  # manual trigger with conf, like the reference
        catchup=False,
        default_args={"retries": 1, "retry_delay": timedelta(minutes=1)},
    ) as dag:
        route = BranchPythonOperator(task_id="route_intent", python_callable=route_intent)
        runs = [
            PythonOperator(
                task_id=f"run_{intent}",
                python_callable=run_intent_task,
                op_kwargs={"intent": intent},
            )
            for intent in INTENTS
        ]
        end = EmptyOperator(
            task_id="end", trigger_rule=TriggerRule.NONE_FAILED_MIN_ONE_SUCCESS
        )
        notify = PythonOperator(
            task_id="notify_user",
            python_callable=notify_user,
            trigger_rule=TriggerRule.ALL_DONE,
        )
        route >> runs >> end >> notify
