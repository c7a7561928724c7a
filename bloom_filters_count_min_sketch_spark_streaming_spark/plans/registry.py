"""Query registry.

Every operator the engine claims (SURVEY.md §2) is exposed as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL can express
the same computation, a DuckDB oracle SQL string. The driver harness compares
the two at sf0.01 (row count + schema + order-insensitive value hash), so:

- alias every computed column identically in both
- keep results deterministic (explicit seeds, explicit tie-breaks)
- round floating aggregates so cross-engine summation order can't flip bits
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Modules that register queries on import.
_QUERY_MODULES = [
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.relational",
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.relational_deep",
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.misc_queries",
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.semistructured_queries",
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.sketch_queries",
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.text_queries",
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.dedup_queries",
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.vector_queries",
    "bloom_filters_count_min_sketch_spark_streaming_spark.plans.streaming_queries",
]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_query_modules() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Module not built yet (incremental construction); only swallow
            # the *registry module itself* being absent, not its deps.
            if exc.name != mod:
                raise
