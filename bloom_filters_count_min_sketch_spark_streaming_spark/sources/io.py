"""Table sources.

The fixture layout is one parquet file per table under a scale-factor
directory (TESTDATA.md). ``load`` is the single scan entry point so that
every query inherits the same reader behavior (vectorized parquet scan,
predicate pushdown, column pruning — all Catalyst defaults).

At 100 TB each "file" becomes a directory of many parquet files /
partitions; ``spark.read.parquet`` handles both shapes identically, so
nothing here changes at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Columnar vectorized read; filters and column
    pruning push into this scan automatically (verify with .explain).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    by default (PARQUET_TYPE_ILLEGAL). We read it as raw nanos
    (``nanosAsLong``) and convert to a microsecond TIMESTAMP with integer
    division — same truncation DuckDB applies, so oracles line up.
    """
    if name == "events":
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            # schema resolution happens eagerly here, so the conf can be
            # restored immediately — no session-wide side effect remains
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries work."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
