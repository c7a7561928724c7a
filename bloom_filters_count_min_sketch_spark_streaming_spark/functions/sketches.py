"""Approximate-aggregate operators beyond Bloom/CMS (SURVEY §2.A A6-A12).

All of these are built-in Catalyst TypedImperativeAggregates, i.e. mergeable
partial aggregates: partial sketches are computed map-side and merged through
the shuffle, so each one runs unchanged from local[32] to a 1000-executor
cluster. We only add the missing Python plumbing:

- ``approx_top_k`` has no Python wrapper in PySpark 4.1 → exposed via
  ``F.expr`` and exploded into (item, est_count) rows.
- HLL sketches: ``hll_sketch_agg`` → binary, ``hll_union`` to merge,
  ``hll_sketch_estimate`` to read — sketches are first-class binary values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_top_k(df: DataFrame, col: str, k: int) -> DataFrame:
    """Approximate top-k heavy hitters: (item, est_count), highest first.

    Deterministic tie-break on the item value so results hash stably.
    """
    agg = df.agg(F.expr(f"approx_top_k({col}, {int(k)})").alias("topk"))
    return (
        agg.select(F.explode("topk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("item"))
    )


def exact_top_k(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact heavy hitters twin (the correctness oracle for approx_top_k).

    Plans as partial-agg -> shuffle by key -> final-agg -> TakeOrdered;
    no full sort at any scale.
    """
    return (
        df.groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("item"))
        .limit(k)
    )


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ approximate count-distinct."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def hll_sketch(df: DataFrame, col: str) -> bytes:
    """Build a mergeable Apache DataSketches HLL sketch (binary)."""
    return bytes(df.agg(F.hll_sketch_agg(col).alias("sk")).head()["sk"])


def hll_estimate(df: DataFrame, col: str) -> DataFrame:
    """Estimate distinct count by building + reading an HLL sketch."""
    return df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(col)).alias("hll_estimate")
    )


def approx_quantiles(df: DataFrame, col: str, probabilities: list[float], relative_error: float = 0.0) -> list[float]:
    """Greenwald-Khanna approximate quantiles (exact when relative_error=0)."""
    return df.stat.approxQuantile(col, list(probabilities), relative_error)


def freq_items(df: DataFrame, cols: list[str], support: float = 0.01) -> DataFrame:
    """Misra-Gries-style frequent items per column."""
    return df.stat.freqItems(cols, support)


def histogram(df: DataFrame, col: str, n_bins: int) -> DataFrame:
    """Numeric histogram aggregate: (bin_center x, height y) structs."""
    agg = df.agg(F.histogram_numeric(F.col(col), F.lit(int(n_bins))).alias("bins"))
    return agg.select(F.explode("bins").alias("b")).select(
        F.col("b.x").alias("bin_x"), F.col("b.y").alias("bin_y")
    )
