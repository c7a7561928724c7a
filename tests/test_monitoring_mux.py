"""The keyspace-multiplexed monitoring operator must be OBSERVATIONALLY
IDENTICAL to the two standalone operators it fuses (r11: one streaming
query instead of two for stream_model_monitoring_funnel).

monitoring_mux_state dispatches each (mux, gkey) group to the exact fold
helpers the standalone operators use, so the muxed run's 'h' rows must
equal streaming_score_histogram's output and its 'p' rows must equal
streaming_page_hinkley's — same final state, same per-batch emissions."""

from __future__ import annotations

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.streaming import stateful
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
    events_stream_source,
    run_available_now,
)

LAM = 25.0


def test_mux_equals_standalone_operators(spark, sf_dir):
    enc = F.round(F.col("value") * 10).cast("long").cast("double")

    # standalone histogram run
    d = events_stream_source(spark, sf_dir).select(
        enc.alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    ).withColumn("shard", F.pmod(F.xxhash64("score"), F.lit(8)).cast("long"))
    hist = run_available_now(
        stateful.streaming_score_histogram(d, "score", "y"), "append"
    )
    hist_rows = {
        tuple(r) for r in hist.select("shard", "seq", "score", "c", "c1").collect()
    }

    # standalone Page-Hinkley run
    src2 = events_stream_source(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ph = run_available_now(
        stateful.streaming_page_hinkley(src2, "event_type", "day", LAM), "append"
    )
    ph_rows = {
        tuple(r)
        for r in ph.select("key", "seq", "n_days", "max_ph", "first_alarm_day").collect()
    }
    assert hist_rows and ph_rows

    # one muxed run over the union
    src = events_stream_source(spark, sf_dir)
    h_in = src.select(
        F.lit("h").alias("mux"),
        F.pmod(F.xxhash64(enc), F.lit(8)).cast("string").alias("gkey"),
        enc.alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
        F.lit(None).cast("string").alias("day"),
    )
    p_in = src.select(
        F.lit("p").alias("mux"),
        F.col("event_type").alias("gkey"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("long").alias("y"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    muxed = run_available_now(
        stateful.monitoring_mux_state(h_in.unionByName(p_in), LAM), "append"
    )
    mux_hist = {
        tuple(r)
        for r in muxed.filter(F.col("mux") == "h")
        .select(F.col("gkey").cast("long").alias("shard"), "seq", "score", "c", "c1")
        .collect()
    }
    mux_ph = {
        tuple(r)
        for r in muxed.filter(F.col("mux") == "p")
        .select(
            F.col("gkey").alias("key"), "seq", "n_days", "max_ph", "first_alarm_day"
        )
        .collect()
    }
    assert mux_hist == hist_rows
    assert mux_ph == ph_rows
