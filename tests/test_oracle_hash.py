"""oracles/xxh64.py must reproduce Spark's xxhash64 EXACTLY — this
test is the compatibility guarantee the LSH/IVF generated oracles rest
on. Covers every byte-length class of the algorithm (empty, <4, <8,
8..31, >=32, multi-stripe), longs, int literals, seed chaining, and
NULL skipping."""

from __future__ import annotations

import pyspark.sql.functions as F

from airflow_subscription_etl_spark.oracles import xxh64 as X

STRINGS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "hello",
    "1234567",
    "12345678",
    "123456789",
    "the quick brown fox jumps",  # 25: 8-byte words + 1 trailing byte
    "0123456789abcdef0123456789abcde",  # 31
    "0123456789abcdef0123456789abcdef",  # 32: one full stripe
    "the quick brown fox jumps over the lazy dog",  # 43
    "x" * 100,
    "héllo wörld ✓ ünïcode",  # multi-byte UTF-8
    "-42,9,0",  # the band-CSV shape the bucket hash sees
]

LONGS = [0, 1, -1, 42, -42, 2**31, -(2**31), 2**63 - 1, -(2**63), 123456789012345]


def test_string_hash_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    want = [X.spark_xxhash64(s) for s in STRINGS]
    assert got == want


def test_long_hash_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v bigint")
    got = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    want = [X.spark_xxhash64(v) for v in LONGS]
    assert got == want


def test_int_literal_seed_chain_matches_spark(spark):
    """The MinHash permutation shape: xxhash64(bigint_col, lit(i)) —
    a long hashed at seed 42, then a 4-byte int literal chained."""
    df = spark.createDataFrame([(v,) for v in LONGS], "v bigint")
    for i in (0, 1, 7, 31):
        got = [r[0] for r in df.select(F.xxhash64("v", F.lit(i))).collect()]
        want = [X.spark_xxhash64(v, ("int", i)) for v in LONGS]
        assert got == want, f"seed chain i={i}"


def test_three_long_chain_matches_spark(spark):
    """The shingle-hash shape: xxhash64(h1, h2, h3) over bigints."""
    rows = [(1, 2, 3), (-5, 10**12, -(10**18)), (0, 0, 0)]
    df = spark.createDataFrame(rows, "a bigint, b bigint, c bigint")
    got = [r[0] for r in df.select(F.xxhash64("a", "b", "c")).collect()]
    want = [X.spark_xxhash64(*t) for t in rows]
    assert got == want


def test_null_arg_skipped_like_spark(spark):
    df = spark.createDataFrame([(1, None)], "a bigint, b bigint")
    got = df.select(F.xxhash64("a", "b")).collect()[0][0]
    assert got == X.spark_xxhash64(1, None) == X.spark_xxhash64(1)


def test_string_then_long_chain_matches_spark(spark):
    df = spark.createDataFrame([("tok", 3)], "s string, v bigint")
    got = df.select(F.xxhash64("s", "v")).collect()[0][0]
    assert got == X.spark_xxhash64("tok", 3)
