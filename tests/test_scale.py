"""Scale-technique operators: correctness AND plan-shape guarantees."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from airflow_subscription_etl_spark.operators import scale


@pytest.fixture()
def skewed(spark):
    # 10k rows, 90% on one hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


@pytest.fixture()
def dim(spark):
    return spark.range(0, 10_000, 7).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )


def test_salted_join_matches_plain_join(skewed, dim):
    plain = skewed.join(dim, "k").groupBy("k").count()
    salted = scale.salted_join(skewed, dim, "k", salt=8).groupBy("k").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_salted_agg_matches_plain_agg(skewed):
    plain = {
        r["k"]: (r["n"], round(r["s"], 6))
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n_rows"], round(r["sum_v"], 6))
        for r in scale.salted_distribution_agg(skewed, "k", "v", salt=8).collect()
    }
    assert plain == salted


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """The whole point of bucketing: co-located join plans contain NO
    Exchange on either side."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{tmp_path}/wh'"
    )
    try:
        facts = spark.range(1000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
        dims = spark.range(50).select(
            F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
        )
        scale.write_bucketed(facts, "bucketdemo.facts", "k", num_buckets=8)
        scale.write_bucketed(dims, "bucketdemo.dims", "k", num_buckets=8)
        f = scale.read_bucketed(spark, "bucketdemo.facts")
        d = scale.read_bucketed(spark, "bucketdemo.dims")
        # disable broadcast so the join would normally shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = f.join(d, "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 1000
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")
