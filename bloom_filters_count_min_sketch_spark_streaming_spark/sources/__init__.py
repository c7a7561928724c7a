from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import (  # noqa: F401
    TABLES,
    load,
    load_all,
    register_views,
)
