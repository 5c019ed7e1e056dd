"""Mutations M1–M3 (SURVEY.md §2.6) as pure DataFrame→DataFrame transforms.

The reference mutates a list-of-dicts in place and rewrites the whole
file (subscription_flow.py:211–241). Here each mutation is a pure
transform ``subs -> new_subs``; the caller persists via sources.io
(JSON single-file for reference parity, parquet/Delta-style rewrite at
scale). Non-transactional read-modify-write semantics and the
single-writer constraint are documented in SURVEY.md §7.4.1.

Target-row selection for M2/M3 re-uses A1 (top-1 active sub per user),
exactly like the reference re-locates the row before each update
(subscription_flow.py:229, 237).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import (
    active_subs_for_user,
    coalesce_default,
    next_subscription_id,
    payment_status_for_price,
    top1_per_key,
)


def _target_subscription_id(subs: DataFrame, user_id: int) -> int | None:
    """A1: latest active subscription for the user; None if absent.

    Order: start_date (ISO string, lexicographic == chronological,
    decision D1) desc, subscription_id desc as deterministic tiebreak
    (decision D2 — the reference's Python ``max`` keeps file order,
    which is not a relational concept).
    """
    rows = (
        active_subs_for_user(subs, user_id)
        .transform(
            lambda d: top1_per_key(
                d,
                "user_id",
                [F.col("start_date").desc(), F.col("subscription_id").desc()],
            )
        )
        .select("subscription_id")
        .collect()
    )
    return int(rows[0]["subscription_id"]) if rows else None


def insert_subscription(
    subs: DataFrame,
    selected_plan: DataFrame,
    user_id: int,
) -> DataFrame:
    """M1: INSERT — append the new subscription row built from the
    selected plan (E5 row construction, subscription_flow.py:213–225).

    - new id = global max + 1, floor 1000 (A2, :214; decision D4)
    - dates default from the plan with literal fallbacks (P6, :220–221)
    - payment_status = Paid|Free by price (E2, :222)
    """
    new_id = next_subscription_id(subs)
    new_row = selected_plan.select(
        F.lit(new_id).cast("int").alias("subscription_id"),
        F.lit(user_id).cast("int").alias("user_id"),
        F.col("subscription_plan_id").cast("int").alias("subscription_plan_id"),
        F.lit("active").alias("subscription_status"),
        coalesce_default("subscription_plan_start_date", "2025-01-01").alias("start_date"),
        coalesce_default("subscription_plan_end_date", "2025-12-31").alias("end_date"),
        payment_status_for_price(F.col("subscription_price")).alias("payment_status"),
    )
    # allowMissingColumns absorbs the ragged payment_status column
    # (SURVEY.md §7.4.6).
    return subs.unionByName(new_row, allowMissingColumns=True)


def change_subscription_plan(
    subs: DataFrame, user_id: int, new_plan_id: int
) -> DataFrame:
    """M2: UPDATE subscription_plan_id on the A1-selected row
    (subscription_flow.py:228–234).

    Conditional ``withColumn`` over the full table — the Spark
    equivalent of the reference's in-place row edit + full-file save.
    At scale the same predicate drives a Delta ``MERGE WHEN MATCHED``.
    """
    target = _target_subscription_id(subs, user_id)
    if target is None:
        raise ValueError(f"No active subscription found for user_id {user_id}")
    is_target = F.col("subscription_id") == F.lit(target)
    return subs.withColumn(
        "subscription_plan_id",
        F.when(is_target, F.lit(new_plan_id)).otherwise(F.col("subscription_plan_id")),
    )


def cancel_subscription(subs: DataFrame, user_id: int) -> DataFrame:
    """M3: soft delete — status → "inactive" on the A1-selected row
    (subscription_flow.py:236–242)."""
    target = _target_subscription_id(subs, user_id)
    if target is None:
        raise ValueError(f"No active subscription found for user_id {user_id}")
    is_target = F.col("subscription_id") == F.lit(target)
    return subs.withColumn(
        "subscription_status",
        F.when(is_target, F.lit("inactive")).otherwise(F.col("subscription_status")),
    )
