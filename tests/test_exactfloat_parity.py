"""Bit-exactness of functions/exactfloat vs Catalyst (r13 optimization).

The bounded-graph driver peels (PageRank / HITS / LPA / TextRank) are
only legal because ``round_half_up`` and ``dec_sum_double`` reproduce
Catalyst's ``Round(double, s)`` and ``CAST(SUM(CAST(x AS DECIMAL(38,s)))
AS DOUBLE)`` bit-for-bit — those queries sit under the driver's value
hash. This sweep covers random magnitudes across the ranks' dynamic
range plus crafted half-up ties at the exact scales the peels use (12
and the output scale 8), where a wrong rounding rule (half-even, or
rounding the binary value instead of the shortest decimal repr) flips
the last digit.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.functions.exactfloat import (
    dec_sum_double,
    round_half_up,
)


def _cases() -> list[float]:
    rng = random.Random(1313)
    vals = [rng.random() * 10 ** rng.randint(-9, 3) for _ in range(20_000)]
    # exact .5 ties at scale 12 and 8 (the adversarial half-up cases)
    for _ in range(3_000):
        vals.append((rng.randint(0, 10**12) + 0.5) / 10**12)
        vals.append((rng.randint(0, 10**8) + 0.5) / 10**8)
        vals.append((rng.randint(0, 10**12) * 10 + 5) / 10**13)
    vals += [-v for v in vals[:5_000]]
    vals += [0.0, 1.0 / 3.0, 2.0 / 3.0, 1e-13, 5e-13, 1.5e-12]
    return vals


def test_round_half_up_matches_catalyst(spark):
    vals = _cases()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select("x", F.round("x", 12).alias("r12"), F.round("x", 8).alias("r8")).collect()
    for row in got:
        assert round_half_up(row["x"], 12) == row["r12"], repr(row["x"])
        assert round_half_up(row["x"], 8) == row["r8"], repr(row["x"])


def test_dec_sum_double_matches_catalyst(spark):
    rng = random.Random(99)
    terms = [round_half_up(rng.random() * 10 ** rng.randint(-6, 0), 12) for _ in range(4_000)]
    terms += [-t for t in terms[:1_000]]
    df = spark.createDataFrame([(t,) for t in terms], "t double")
    got = df.agg(
        F.sum(F.col("t").cast("decimal(38,12)")).cast("double").alias("s")
    ).collect()[0]["s"]
    assert dec_sum_double(terms, 12) == got
    # empty sum: the queries wrap Spark's NULL in COALESCE(..., 0.0)
    assert dec_sum_double([], 12) == 0.0
