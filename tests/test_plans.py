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


def _tree(plan: str) -> str:
    """Just the plan tree (formatted mode repeats node names in the
    per-node detail section, which would double-count)."""
    lines = []
    for line in plan.splitlines():
        if not line.strip():
            break
        lines.append(line)
    return "\n".join(lines)


def test_asof_join_is_join_free_single_window_shuffle(spark):
    """The union+window as-of formulation must plan NO join operator —
    that's the whole point (a range-condition join would nested-loop)."""
    tree = _tree(_formatted_plan(spark, "ev_asof_join"))
    assert "Join" not in tree
    assert "Window" in tree


def test_band_join_broadcasts_the_band_side(spark):
    """Range join against the tiny literal band table must be a
    broadcast nested loop (map-only), never a cartesian product."""
    tree = _tree(_formatted_plan(spark, "ev_band_join"))
    assert "BroadcastNestedLoopJoin" in tree
    assert "CartesianProduct" not in tree


def test_q2_broadcasts_all_dims(spark):
    # 3 dim joins + the p_size semi-join pushed ahead of the agg
    tree = _tree(_formatted_plan(spark, "q2_min_cost_supplier"))
    assert tree.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in tree
    # the semi-join must sit on the fact scan, BELOW the aggregate —
    # formatted plans print root-first, so deeper = later in the text
    assert tree.index("LeftSemi") > tree.index("HashAggregate")


def test_q11_scans_fact_once(spark):
    """The scalar-subquery threshold must NOT rescan lineitem: the
    global mean rides a window over the per-supplier aggregate."""
    tree = _tree(_formatted_plan(spark, "q11_important_suppliers"))
    assert tree.count("Scan parquet") == 1


def test_quota_agg_reuses_window_partitioning(spark):
    """quota_per_key windows on source and the follow-up agg groups on
    source — same key, so Catalyst must plan exactly ONE Exchange."""
    tree = _tree(_formatted_plan(spark, "doc_domain_quota"))
    assert tree.count("Exchange") == 1


@pytest.mark.parametrize(
    "name", ["doc_hash_split", "doc_stratified_sample"]
)
def test_sampling_is_map_plus_one_agg_shuffle(spark, name):
    """Hash split/sample are pure maps; only the summary agg shuffles."""
    tree = _tree(_formatted_plan(spark, name))
    assert tree.count("Exchange") == 1
    assert "Join" not in tree


def test_column_pruning_reaches_scan(spark):
    """A 3-column projection must not read the whole part table."""
    plan = _formatted_plan(spark, "p1_projection")
    assert "ReadSchema" in plan
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "p_retailprice" not in read_schema
    assert "p_size" not in read_schema


def test_join_strategy_hints_control_physical_plan(spark):
    """Join hints pick the physical strategy: SHUFFLE_HASH avoids the
    sort (build-side hash on shuffled partitions), MERGE forces
    sort-merge — the explicit controls for when AQE/statistics guess
    wrong at scale (e.g. a hash-build side that fits executor memory
    but exceeds the broadcast threshold)."""
    from airflow_subscription_etl_spark.sources.io import read_star_table

    orders = read_star_table(spark, "/root/testdata/sf0.001", "orders")
    customer = read_star_table(spark, "/root/testdata/sf0.001", "customer")

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    sh = orders.join(
        customer.hint("shuffle_hash"),
        orders["o_custkey"] == customer["c_custkey"],
    )
    assert "ShuffledHashJoin" in plan_of(sh)
    sm = orders.join(
        customer.hint("merge"),
        orders["o_custkey"] == customer["c_custkey"],
    )
    assert "SortMergeJoin" in plan_of(sm)


def test_plan_lint_whole_registry(spark):
    """Scale-hygiene lint over ALL registered queries, not just the
    bench headline: no single-partition windows, no cartesian products,
    no filter-over-scan without pushdown (tools/plan_lint.py). One test
    so a regression names every offending query at once."""
    from tools.plan_lint import EXEMPT, lint_plan, render_plan

    flagged: dict[str, dict[str, str]] = {}
    for name, (fn, _) in REGISTRY.items():
        plan = render_plan(fn(spark, SF))
        live = {
            k: v
            for k, v in lint_plan(plan).items()
            if k not in EXEMPT.get(name, {})
        }
        if live:
            flagged[name] = live
    assert not flagged, flagged


def test_pq_topk_is_map_only_plus_takeordered(spark):
    """PQ ADC scoring must be ONE map pass over the corpus (broadcast
    codebook) plus a global TakeOrdered — no shuffle of vector data.
    A Join/Exchange over the embeddings would mean the fused
    encode+lut projection regressed into a keyed plan."""
    tree = _tree(_formatted_plan(spark, "emb_pq_topk"))
    assert "TakeOrderedAndProject" in tree
    assert "SortMergeJoin" not in tree
    # the only exchange allowed is the one-row codebook broadcast
    assert tree.count("Exchange") == tree.count("BroadcastExchange")


def test_merge_upsert_joins_are_key_equi_not_nested(spark):
    """MERGE resolves via equi-joins on the key (update path + anti
    insert path) — a nested-loop or cartesian would mean the key
    condition was lost."""
    tree = _tree(_formatted_plan(spark, "orders_merge_upsert"))
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_skew_report_aggregates_before_topn(spark):
    """The diagnostic must reduce to counts BEFORE any top-n — a plan
    sorting raw events instead of per-key counts would be the exact
    funnel the operator warns about."""
    plan = _formatted_plan(spark, "key_skew_report")
    tree = _tree(plan)
    assert "TakeOrderedAndProject" in tree
    assert "HashAggregate" in tree


def test_length_batches_single_window_shuffle(spark):
    """Batch assembly: the per-batch aggregation must REUSE the fill
    window's (bucket, shard) partitioning — exactly one hash exchange
    over the token-counted rows."""
    tree = _tree(_formatted_plan(spark, "doc_length_batches"))
    assert tree.count("Exchange") == 1


# --- round-5 operator plan pins ---------------------------------------------


@pytest.mark.parametrize(
    "name",
    [
        "emb_hard_negatives",
        "doc_containment_pairs",
        "graph_lpa",
        "doc_minhash_incremental",
    ],
)
def test_round5_pair_ops_never_cartesian(spark, name):
    """Every round-5 pair/vote generator must stay keyed (bucket /
    shingle / node equi-joins) — a cartesian or non-broadcast nested
    loop would be the O(n²) plan these operators exist to avoid."""
    plan = _formatted_plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivfpq_scoring_is_takeordered_with_broadcast_sides(spark):
    """IVF-PQ: candidate scoring ends in a global TakeOrdered(k); the
    query-residual and codebook sides ride broadcasts (1-row / nprobe-
    row frames), never a shuffled join of the vector data."""
    tree = _tree(_formatted_plan(spark, "emb_ivfpq_topk"))
    assert "TakeOrderedAndProject" in tree
    assert "CartesianProduct" not in tree
    assert "SortMergeJoin" not in tree


def test_holdout_split_single_exchange(spark):
    """The split itself is a pure map (hash + timestamp compare); the
    only exchange in the whole rollup query is the final groupBy."""
    tree = _tree(_formatted_plan(spark, "ev_holdout_split"))
    assert tree.count("Exchange") == 1
