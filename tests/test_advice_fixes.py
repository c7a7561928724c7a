"""Regression tests for the round-2 semantic fixes.

Each test pins down a behavior that was silently wrong (or silently
degenerate) in round 1:

- NULL string keys leaked into sketch builds as xxhash64's seed value and
  NULL probes answered TRUE instead of NULL (hashing.as_long_key).
- salted_agg's partition-id salt was constant on single-partition input,
  so the "spread the hot key" phase did nothing (operators/skew.py).
- bloom_prefilter_join emitted duplicate/ambiguous key columns when both
  sides share the key name, and paid a distinct().count() sizing pass
  (functions/bloom.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bloom_null_string_key_probe_is_null(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), (None,)], "s string"
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    bf = bloom_build(df, "s", expected_items=10, fpp=0.001)
    probe = spark.createDataFrame([("a",), ("zz",), (None,)], "s string")
    rows = {r["s"]: r["might_contain"] for r in bloom_might_contain(probe, "s", bf).collect()}
    assert rows["a"] is True
    assert rows[None] is None, "NULL probe must return NULL, not True"


def test_bloom_null_key_not_inserted_as_phantom(spark):
    """A build containing only NULLs must match nothing (round 1: NULLs
    entered the build as xxhash64(NULL)=seed, a phantom key)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    nulls_only = spark.createDataFrame([(None,), (None,)], "s string")
    bf = bloom_build(nulls_only, "s", expected_items=10, fpp=0.001)
    probe = spark.createDataFrame([(f"p{i}",) for i in range(200)], "s string")
    n_hits = (
        bloom_might_contain(probe, "s", bf)
        .filter(F.col("might_contain"))
        .count()
    )
    assert n_hits == 0, "empty (all-NULL) build must contain nothing"


def test_cms_null_string_key_estimate_is_null(spark):
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([("x",), ("x",), ("y",), (None,)], "s string")
    sk = cms_build(df, "s", eps=0.001, confidence=0.99, seed=7)
    rows = {r["s"]: r["cms_estimate"] for r in cms_estimate(df, "s", sk).collect()}
    assert rows["x"] == 2
    assert rows[None] is None


def test_salted_agg_spreads_on_single_partition(spark):
    """Salt must derive from row content, not partition id: on a 1-partition
    input the per-(key, salt) phase must still produce multiple groups for a
    hot key."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.skew import (
        salted_count,
    )

    df = (
        spark.range(0, 10_000)
        .select(F.lit("hot").alias("k"), F.col("id"))
        .coalesce(1)
    )
    out = salted_count(df, "k", out="cnt", salt_buckets=16)
    assert out.collect()[0]["cnt"] == 10_000  # identical to unsalted result

    # reproduce phase 1's grouping: the hot key must spread over >1 salt
    n_salts = (
        df.withColumn("_salt", F.pmod(F.xxhash64("k", "id"), F.lit(16)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts > 1, "content-hash salt must spread a single-partition hot key"


def test_bloom_prefilter_join_same_key_name_unambiguous(spark, sf_dir):
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        bloom_prefilter_join,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    joined = bloom_prefilter_join(li, orders, "k", "k", expected_items=2000)
    assert joined.columns.count("k") == 1, "same-name key must appear once"
    # exactness: bloom gate is a superset filter, so counts match plain join
    expected = li.join(orders, "k").count()
    assert joined.count() == expected
