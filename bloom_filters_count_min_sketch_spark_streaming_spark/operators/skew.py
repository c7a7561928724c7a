"""Skew-mitigation operators.

AQE handles skewed *joins* automatically (skewJoin.enabled); heavy-hitter
*aggregations* and windowed top-k over skewed keys still benefit from
explicit salting: phase 1 aggregates (key, salt) so one hot key spreads
over N reducers; phase 2 merges the partials. Both phases are map-side
combinable, so the hot key's traffic is divided by the salt fanout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_col: str,
    agg_col: Column,
    merge_col,
    out: str,
    salt_buckets: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    agg_col: the phase-1 aggregate expression (e.g. F.count, F.sum(x)).
    merge_col: phase-2 merge fn over the phase-1 alias (e.g. F.sum).
    The result is identical to the unsalted aggregate — salting only
    changes the shuffle distribution.

    The salt is a deterministic hash of ``salt_col`` (default: every
    column), NOT spark_partition_id(): a partition-id salt is constant
    whenever the input arrives in one partition (single-file scans), which
    silently degenerates to the unsalted shuffle shape — the hot key lands
    on one reducer again.
    """
    salt_src = F.xxhash64(F.col(salt_col)) if salt_col else F.xxhash64(*df.columns)
    salt = F.pmod(salt_src, F.lit(salt_buckets)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(agg_col.alias("_partial"))
    )
    return partial.groupBy(key_col).agg(merge_col("_partial").alias(out))


def salted_count(
    df: DataFrame,
    key_col: str,
    out: str = "cnt",
    salt_buckets: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    return salted_agg(df, key_col, F.count(F.lit(1)), F.sum, out, salt_buckets, salt_col)
