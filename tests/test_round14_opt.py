"""Round-14 optimization regression pins.

The optimization round restructures operator INTERNALS for plan shape
(fewer jobs/exchanges) while every declared query's output stays
oracle-identical. These tests pin the mechanisms the optimizations
rely on, so a future Spark upgrade or refactor that silently breaks
one fails here rather than as wrong output or a perf cliff.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from airflow_subscription_etl_spark.operators.scale import (
    distributed_prefix_sum,
)


def _executed_plan(df) -> str:
    # materialize THIS DataFrame's own QueryExecution (collect runs it;
    # a noop write would build a separate QueryExecution and leave this
    # one unexecuted), then read the FINAL adaptive plan
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    return plan


def test_prefix_sum_coincident_shape_reuses_one_range_exchange(spark):
    """Correctness hinges on BOTH consumers (the per-partition totals
    aggregate and the final window) reading the SAME materialized range
    shuffle — repartitionByRange's boundary sampling is seeded per RDD,
    so two independent materializations of the exchange hand the
    consumers different partitionings and corrupt the offsets. For an
    input whose columns are exactly order ∪ value (nothing prunable
    below the exchange, so the two subtrees are canonically identical)
    the r15 hybrid keeps the r14 single-plan form; executed-plan
    invariant: ONE range exchange, second consumer through reuse, no
    checkpoint RDD scan."""
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        F.lit(1).cast("bigint").alias("v"),
    )
    out = distributed_prefix_sum(
        df, [F.col("k").asc(), F.col("id").asc()], "v", num_partitions=8
    )
    plan = _executed_plan(out)
    n_range_exchanges = plan.count("rangepartitioning")
    assert "ReusedExchange" in plan or n_range_exchanges == 1, plan
    assert "ExistingRDD" not in plan, plan


def test_prefix_sum_passthrough_shape_pins_one_checkpointed_rdd(spark):
    """An input carrying a column beyond order ∪ value is the fork
    shape: column pruning would insert per-consumer Projects below the
    range exchange, defeat reuse, and corrupt the offsets (ADVICE r14 —
    reproduced as 84% wrong rows under the r14 form). The r15 hybrid
    must route this shape through the lazy-checkpointed shared RDD:
    both consumers scan the same RDD and no rangepartitioning exchange
    appears in the outer plan at all."""
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 97).alias("k"),
        F.lit(1).cast("bigint").alias("v"),
        F.md5(F.col("id").cast("string")).alias("extra"),
    )
    out = distributed_prefix_sum(
        df, [F.col("k").asc(), F.col("id").asc()], "v", num_partitions=8
    ).select("k", "id", "extra", "cum")
    plan = _executed_plan(out)
    assert "ExistingRDD" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_prefix_sum_correct_with_passthrough_columns(spark):
    """The r14 fork hazard, pinned end-to-end: a caller whose frame
    carries columns beyond order_cols ∪ value_col (the
    sampling.stride_schedule shape) must still get exact cums — under
    the r14 exchange-reuse design, column pruning forked the two range
    exchanges for exactly this shape and corrupted most rows."""
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.md5(F.col("id").cast("string")).alias("extra"),
    )
    out = distributed_prefix_sum(
        df, [F.col("k").asc()], "v", num_partitions=8
    ).select("k", "v", "extra", "cum")
    rows = sorted((r["k"], r["cum"]) for r in out.collect())
    acc = 0
    for k, c in rows:
        acc += k % 97
        assert c == acc, (k, c, acc)


def test_prefix_sum_segmented_matches_per_segment_calls(spark):
    """segment_cols (r15): one range exchange serving n independent
    prefix sums must produce exactly the ranks/cums of n separate
    distributed_prefix_sum calls — the doc_rrf_retrieval fusion
    contract."""
    df = spark.createDataFrame(
        [(i % 4, i, (i * 13) % 50, 1) for i in range(800)],
        "seg int, k int, score int, one int",
    ).select("seg", "k", "score", F.col("one").cast("bigint").alias("one"))
    fused = distributed_prefix_sum(
        df,
        [F.col("seg").asc(), F.col("score").desc(), F.col("k").asc()],
        "one",
        out_col="rank",
        segment_cols=["seg"],
        num_partitions=8,
    )
    got = {(r["seg"], r["k"]): r["rank"] for r in fused.collect()}
    for s in range(4):
        part = distributed_prefix_sum(
            df.filter(F.col("seg") == s),
            [F.col("score").desc(), F.col("k").asc()],
            "one",
            out_col="rank",
            num_partitions=8,
        )
        for r in part.collect():
            assert got[(s, r["k"])] == r["rank"], (s, r["k"])


def test_prefix_sum_exact_across_partition_counts(spark):
    """Offsets math is partition-layout-INDEPENDENT: the same input
    must produce identical cums at 1, 3, 8, 64 range partitions
    (boundary placement may differ; the total order may not)."""
    df = spark.createDataFrame(
        [(i, (i * 37) % 100, 1) for i in range(500)], "k int, g int, v long"
    ).select("k", "g", F.col("v").cast("bigint").alias("v"))
    expected = None
    for parts in (1, 3, 8, 64):
        out = distributed_prefix_sum(
            df,
            [F.col("g").desc(), F.col("k").asc()],
            "v",
            out_col="cum",
            num_partitions=parts,
        )
        got = {r["k"]: r["cum"] for r in out.collect()}
        if expected is None:
            expected = got
        assert got == expected, f"num_partitions={parts} diverged"


def test_prefix_sum_double_matches_sequential_accumulation(spark):
    """The in-plan exclusive-prefix window must accumulate partition
    totals in _pid order with the same left-to-right association the
    old driver-side Python loop used (bit-for-bit for doubles)."""
    df = spark.createDataFrame(
        [(i, float((i * 37) % 100) + 0.125) for i in range(300)],
        "k int, v double",
    )
    out = distributed_prefix_sum(
        df, [F.col("v").desc(), F.col("k").asc()], "v", out_col="cum",
        num_partitions=7,
    ).collect()
    rows = sorted(out, key=lambda r: (-r["v"], r["k"]))
    acc = 0.0
    for r in rows:
        acc += r["v"]
        assert math.isclose(r["cum"], acc, rel_tol=1e-12), (r, acc)


def test_cc_schedule_path_matches_signature_loop(spark):
    """r15: for catalog-bounded graphs, doc_cc_islands collects the
    cells-sized edge list, simulates the star rounds driver-side
    (simulate_star_rounds) and runs the distributed loop on that exact
    schedule with no per-round signature actions. The schedule path
    must label every graph identically to the signature loop —
    including chain graphs (many rounds), random graphs, an
    already-converged star (empty schedule) and duplicate edge input."""
    import random

    from airflow_subscription_etl_spark.operators.graph import (
        connected_components,
        simulate_star_rounds,
    )

    rng = random.Random(7)
    cases = [
        [(i, i + 1) for i in range(60)],                      # chain
        [(0, i) for i in range(1, 9)],                        # star: fixpoint
        [(1, 2), (2, 1), (1, 2), (5, 6)],                     # dup edges
        [(rng.randrange(40), rng.randrange(40)) for _ in range(30)],
    ]
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        want = {
            (r["node"], r["component"])
            for r in connected_components(df).collect()
        }
        sched = simulate_star_rounds(edges)
        got = {
            (r["node"], r["component"])
            for r in connected_components(df, schedule=sched).collect()
        }
        assert got == want, (edges[:5], sched)


def test_cms_sketch_weighted_equals_raw(spark):
    """cms_sketch(count_col=...) over a value histogram must produce
    counter-for-counter the SAME sketch as cms_sketch over the raw
    value stream (sums commute) — the r14 heavy-hitters path feeds the
    sketch from pre-counted tokens."""
    from airflow_subscription_etl_spark.operators import sketch as SK

    raw = spark.createDataFrame(
        [(w,) for w in ("a b a c a b d e a".split())], "v string"
    )
    hist = raw.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    direct = {
        (r["r"], r["c"]): r["cnt"]
        for r in SK.cms_sketch(raw, [], "v", depth=4, width=64).collect()
    }
    weighted = {
        (r["r"], r["c"]): r["cnt"]
        for r in SK.cms_sketch(
            hist, [], "v", depth=4, width=64, count_col="n"
        ).collect()
    }
    assert direct == weighted and direct


def test_kmv_value_dedup_first_matches_hash_dedup(spark):
    """kmv_distinct's r14 plan (value-dedup, then hash) must agree with
    ranking hashes of the raw stream — including duplicate-heavy input
    and a no-group (global) call."""
    from airflow_subscription_etl_spark.operators import sketch as SK

    df = spark.createDataFrame(
        [(i % 3, f"v{i % 40}") for i in range(400)], "g int, v string"
    )
    out = {
        r["g"]: (r["n_distinct"], r["kmv_estimate"])
        for r in SK.kmv_distinct(df, ["g"], "v", k=8).collect()
    }
    for g in (0, 1, 2):
        n, _ = out[g]
        # g=0 sees v0,v3,...v39 step3 overlap — exact distinct count of
        # the values that land in that residue stream
        expect = len({f"v{i % 40}" for i in range(400) if i % 3 == g})
        assert n == expect, (g, n, expect)
    glob = SK.kmv_distinct(df, [], "v", k=8).collect()[0]
    assert glob["n_distinct"] == 40


def test_plan_lint_partition_bounded_exemption_is_narrow(spark):
    """The r14 lint extension exempts ONLY the partition-count-bounded
    shape (single-partition window over an aggregate keyed solely by
    SPARK_PARTITION_ID()). A plain unpartitioned window over data
    rows must still flag, and distributed_prefix_sum's plan must not."""
    from pyspark.sql import Window as W

    from airflow_subscription_etl_spark.operators.scale import (
        distributed_prefix_sum,
    )
    from tools.plan_lint import lint_plan, render_plan

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"),
        F.lit(1).cast("bigint").alias("v"),
    )
    bad = df.withColumn(
        "rn", F.row_number().over(W.orderBy("k", "id"))
    )
    assert "single-partition-window" in lint_plan(render_plan(bad))
    good = distributed_prefix_sum(
        df, [F.col("k").asc(), F.col("id").asc()], "v", num_partitions=8
    )
    assert "single-partition-window" not in lint_plan(render_plan(good))
