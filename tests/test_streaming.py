"""Streaming == batch equivalence tests (SURVEY §5.2.4) + late-data drop."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
    events_stream_source,
    run_available_now,
)


def test_stream_matches_batch_windowed_counts(spark, sf_dir):
    src = events_stream_source(spark, sf_dir)
    agg = src.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    streamed = run_available_now(agg, "complete").select(
        F.col("window.start").alias("h"), "event_type", "n"
    )
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_processes_multiple_batches(spark, sf_dir):
    from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
        run_foreach_batch,
    )

    src = events_stream_source(spark, sf_dir, n_files=4)
    seen = []
    n = run_foreach_batch(src, lambda df, bid: seen.append(df.count()))
    assert n == 4, f"expected 4 micro-batches, got {n}"
    assert sum(seen) == load(spark, sf_dir, "events").count()


def test_watermark_drops_late_rows(spark):
    """Append-mode windowed agg with watermark: a row arriving after the
    watermark evicted its window is dropped (C7).

    Note the spacer batch: eviction of the 10:00 window happens while
    processing batch 1 (watermark advanced to 11:50 by batch 0's max event
    time); a late row arriving in the same batch as the eviction still
    lands in state, so the drop is observable from the *next* batch on —
    that's Structured Streaming's documented lower-bound semantics."""
    src_dir = tempfile.mkdtemp(prefix="late_src_")

    def mk(rows):
        return spark.createDataFrame(rows, ["id", "ts_s"]).select(
            "id", F.col("ts_s").cast("timestamp").alias("ts")
        )

    mk([(1, "2024-01-01 10:00:05"), (2, "2024-01-01 12:00:00")]).coalesce(1).write.parquet(
        f"{src_dir}/b0"
    )
    mk([(9, "2024-01-01 12:00:01")]).coalesce(1).write.parquet(f"{src_dir}/b1")
    mk([(3, "2024-01-01 10:00:07")]).coalesce(1).write.parquet(f"{src_dir}/b2")  # late

    stream = (
        spark.readStream.schema(mk([(0, "2024-01-01 00:00:00")]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/b*")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_available_now(agg, "append")
    rows = {r["window"].start.isoformat(): r["n"] for r in out.collect()}
    assert rows.get("2024-01-01T10:00:00") == 1, f"late row not dropped: {rows}"


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart contract: a restarted query resumes from the
    checkpointed offsets (old files are NOT reprocessed) and the file
    sink's manifest keeps the output exactly-once; a restarted stateful
    aggregation resumes from checkpointed state, not from zero."""
    ev = load(spark, sf_dir, "events")
    half = ev.agg(F.expr("percentile(event_id, 0.5)")).collect()[0][0]
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ckpt2 = str(tmp_path / "ckpt_state")
    ev.filter(F.col("event_id") <= half).coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_to_sink():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .select("event_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    state = {}

    def run_stateful():
        def _capture(batch_df, batch_id):
            for r in batch_df.collect():
                state[r["event_type"]] = r["n"]

        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.foreachBatch(_capture)
            .outputMode("update")
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_to_sink()
    run_stateful()
    n_first = ev.filter(F.col("event_id") <= half).count()
    assert spark.read.parquet(out).count() == n_first

    # "new data arrives while the query is down"
    ev.filter(F.col("event_id") > half).coalesce(1).write.mode("append").parquet(src)
    run_to_sink()
    run_stateful()

    got = spark.read.parquet(out)
    total = ev.count()
    # resumed, not reprocessed: every input row exactly once
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total
    # stateful restart: counts include pre-restart batches via recovered
    # state even though the second run only read the new file
    exact = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert state == exact
