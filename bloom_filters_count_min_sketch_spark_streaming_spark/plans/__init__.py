from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
    load_all_query_modules,
)
