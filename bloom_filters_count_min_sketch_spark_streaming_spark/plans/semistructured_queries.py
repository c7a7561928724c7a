"""Semi-structured (VariantType) and nested-collection coverage.

Spark 4's VARIANT is the engine's native semi-structured column type —
binary-encoded, shreddable, predicate-pushable. The fixture `events.props`
JSON strings parse into variants; these queries exercise parse/extract/
typeof plus ordered collection aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


@query(
    "variant_props_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
    FROM events GROUP BY event_type
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json -> VARIANT -> typed try_variant_get extraction + agg."""
    ev = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.min(k).alias("min_k")
    )


@query(
    "variant_schema_inference",
    oracle="""
    SELECT 'OBJECT<k: BIGINT>' AS props_schema, COUNT(*) AS n_rows FROM events
    """,
)
def variant_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema_of_variant over every row (the semi-structured schema probe);
    all fixture props share one shape, asserted via the aggregate."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.schema_of_variant(F.parse_json("props")).alias("props_schema")
    ).agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "array_agg_ordered_events",
    oracle="""
    SELECT user_id,
           array_to_string(list(event_type ORDER BY ts, event_id), '>') AS journey
    FROM events
    WHERE user_id < 10
    GROUP BY user_id
    """,
)
def array_agg_ordered_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collection aggregate: each user's event-type journey,
    deterministically ordered (sort_array over (ts, event_id, type) structs
    then projected — the order-stable array_agg pattern). Serialized to a
    '>'-joined string so the cross-engine hash sees one canonical form
    (list-vs-ndarray reprs differ between pandas conversions)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    collected = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("j")
    )
    return collected.select(
        "user_id",
        F.concat_ws(">", F.transform("j", lambda s: s["event_type"])).alias("journey"),
    )


@query(
    "struct_json_roundtrip",
    oracle="""
    SELECT event_type,
           MAX('{"t":"' || event_type || '","n":' || CAST(cnt AS VARCHAR) || '}') AS packed
    FROM (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type)
    GROUP BY event_type
    """,
)
def struct_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """struct construction + to_json serialization (nested type surface)."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    packed = F.to_json(F.struct(F.col("event_type").alias("t"), F.col("cnt").alias("n")))
    return agg.groupBy("event_type").agg(F.max(packed).alias("packed"))


@query(
    "quarantine_bad_records",
    oracle="""
    -- dead-letter routing: deterministically corrupt every 13th props
    -- payload, parse leniently, quarantine what fails — counts audit the
    -- split. Validity of the identical corrupted string is decided by
    -- each engine's own JSON parser (truncated '{\"k\":' is invalid JSON
    -- everywhere).
    WITH mutated AS (
      SELECT event_type,
             CASE WHEN event_id % 13 = 0 THEN substr(props, 1, 5)
                  ELSE props END AS payload
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN json_valid(payload) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_quarantined,
           CAST(SUM(CASE WHEN json_valid(payload)
                         THEN CAST(json_extract_string(payload, '$.k') AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS sum_k_ok
    FROM mutated GROUP BY event_type ORDER BY event_type
    """,
)
def quarantine_bad_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter / quarantine flow: lenient parse of a semi-structured
    payload, bad records counted into a quarantine bucket instead of
    failing the job (every 13th payload is deterministically truncated).
    try_parse_json returns NULL on garbage — the PERMISSIVE-mode pattern
    every production ingest needs; the oracle decides validity with its
    own parser on the identical bytes."""
    ev = load(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % 13 == 0, F.substring("props", 1, 5)
    ).otherwise(F.col("props"))
    m = ev.select("event_type", payload.alias("payload"))
    v = F.try_parse_json(F.col("payload"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        m.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(v.isNull().cast("long")).cast("long").alias("n_quarantined"),
            F.sum(F.coalesce(k, F.lit(0))).cast("long").alias("sum_k_ok"),
        )
        .orderBy("event_type")
    )
