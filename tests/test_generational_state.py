"""Generational sharded-state operators under ADVERSE clocks: bucket jumps
(>1 generation at once) and shards whose last activity LAGS the global
stream clock — branches the dense fixture never exercises (every 6h
bucket is occupied there), pinned here with a synthetic replay source."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.streaming import stateful
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
    run_available_now,
)

W = 100  # window_us for the test: bucket = ts_us // 100


def _stream(spark, tmp_path, batches):
    """Deterministic micro-batch replay of hand-built rows (one parquet
    file per batch, ascending mtimes — same contract as table_stream_source)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = 1_600_000_000
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["shard", "event_id", "ts_us", "h"]).astype(
            "int64"
        )
        path = f"{src}/part-{i:05d}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (base + i, base + i))
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )


# shard 0: buckets 0, 1, then a JUMP to 5 (both generations must empty);
# shard 1: only bucket 4 (lags the final global clock G=5 by one);
# shard 2: only bucket 2 (lagged out of the window entirely)
BATCHES = [
    [  # batch 0
        (0, 1, 10, 101),
        (0, 2, 20, 101),   # same bucket, same h -> in-bucket duplicate
        (1, 3, 450, 201),  # shard 1, bucket 4
    ],
    [  # batch 1
        (0, 4, 110, 101),  # bucket 1: h seen in prev bucket -> duplicate
        (0, 5, 120, 102),  # new hash -> not a duplicate
        (2, 8, 250, 301),  # shard 2, bucket 2
    ],
    [  # batch 2
        (0, 6, 520, 101),  # bucket 5: JUMP of 4 -> filters emptied -> NOT dup
        (0, 7, 530, 102),
    ],
]


def test_generational_bloom_dedup_jump_empties_both_generations(spark, tmp_path):
    src = _stream(spark, tmp_path, BATCHES)
    flags = stateful.generational_bloom_dedup(src, window_us=W, expected_items=1000)
    out = run_available_now(flags, "append")
    flagged = sorted(r["event_id"] for r in out.collect())
    # e2 (in-bucket), e4 (previous bucket); e6/e7 NOT flagged despite their
    # hashes existing in generations that rotated out on the 1 -> 5 jump
    assert flagged == [2, 4]


def test_generational_kmv_distinct_aligns_lagging_shard_clocks(spark, tmp_path):
    src = _stream(spark, tmp_path, BATCHES)
    ests = stateful.generational_kmv_distinct(src, window_us=W)
    out = run_available_now(ests, "append")
    last = out.groupBy("shard").agg(
        F.max_by(F.struct("cur_gen", "n_window", "n_cur"), "seq").alias("s")
    )
    rows = {r["shard"]: r["s"] for r in last.collect()}
    # shard clocks: 0 at G=5, 1 at 4 (=G-1), 2 at 2 (out of window)
    assert rows[0]["cur_gen"] == 5 and rows[1]["cur_gen"] == 4 and rows[2]["cur_gen"] == 2
    g = max(s["cur_gen"] for s in rows.values())
    total = sum(
        s["n_window"] if s["cur_gen"] == g
        else (s["n_cur"] if s["cur_gen"] == g - 1 else 0)
        for s in rows.values()
    )
    # exact distinct h in buckets {4, 5}: shard0 {101,102} + shard1 {201} = 3.
    # A naive sum of n_window would wrongly count shard2's bucket-2 hash -> 4.
    assert total == 3
