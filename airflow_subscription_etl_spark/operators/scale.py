"""Scale techniques as reusable operators (100 TB posture).

AQE (on in session.py) already re-plans skewed sort-merge joins at
runtime; these helpers cover the cases AQE cannot:

- ``salted_join`` — explicit key salting for joins AQE can't split
  (e.g. when the skewed side feeds a window, or on engines/stages where
  AQE skew handling doesn't apply).
- ``salted_distribution_agg`` — two-phase aggregation for hot grouping
  keys where a single reducer would own a mega-group.
- ``write_bucketed`` / ``read_bucketed`` — persistently co-located
  tables: repeated joins/aggregations on the bucket key run with NO
  shuffle at all (the classic "pay the shuffle once" move for fact
  tables that join on the same key every day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-mitigating equi-join: scatter the big side's hot keys over
    ``salt`` sub-keys and replicate the small side once per sub-key.

    Shuffle volume: big side unchanged (each row gets ONE salt), small
    side ×salt — the standard trade when `key` has heavy hitters. The
    output is exactly the plain join's output (salt columns dropped).
    """
    big_s = big.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_s.join(small_s, on=[key, "_salt"], how=how).drop("_salt")


def salted_distribution_agg(
    df: DataFrame,
    key: str,
    value_col: str,
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase count/sum for hot grouping keys.

    Phase 1 aggregates (key, salt) partials — hot keys split across
    ``salt`` reducers; phase 2 combines ``salt`` tiny rows per key.
    (Spark's hash aggregate already does map-side partials; this guards
    the REDUCE side when one key's partials alone overwhelm a task.)
    """
    partial = (
        df.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
        .groupBy(key, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(value_col).alias("_s"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_s").alias(f"sum_{value_col}"),
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 32,
    sort_key: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.

    Subsequent equi-joins/aggregations between tables bucketed the same
    way on the same key execute WITHOUT an Exchange: Spark trusts the
    on-disk hash distribution. This is the batch-pipeline answer to
    "this fact table joins on custkey every single run".
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_key)
    if sort_key:
        w = w.sortBy(sort_key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
