"""CLI entry point — the reference's manual DAG trigger as a command.

The reference is driven by ``dag_run.conf`` on a manual Airflow trigger
(subscription_flow.py:52–60); this maps the same three parameters onto
argv so the engine runs standalone::

    python -m airflow_subscription_etl_spark \
        --intent create --user-id 101 --plan Pro \
        --plans-path data/plans.json --subs-path data/user_subscriptions.json

Prints the result record as indented JSON — the reference's
notify_user log sink (subscription_flow.py:256).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="airflow_subscription_etl_spark")
    p.add_argument(
        "--intent",
        default="view",
        help="create | change | cancel | view (default: view)",
    )
    p.add_argument("--user-id", type=int, default=0)
    p.add_argument("--plan", default=None, help="selected plan name")
    p.add_argument("--plans-path", required=True)
    p.add_argument("--subs-path", required=True)
    args = p.parse_args(argv)

    from . import get_spark  # noqa: PLC0415 — spark only after arg errors
    from .plans.pipeline import run_intent  # noqa: PLC0415

    conf = {"user_id": args.user_id, "intent": args.intent}
    if args.plan is not None:
        conf["selected_plan_name"] = args.plan

    spark = get_spark("cli")
    try:
        res = run_intent(
            spark, conf, plans_path=args.plans_path, subs_path=args.subs_path
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(res.notify_json())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
