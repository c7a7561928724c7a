"""String-bucket exactness for first_seen_flags (r10 verdict #7).

The r10 contract said "integer buckets only" because non-integer buckets
were identified by xxhash64 (a 2^-64 false-candidate per pair). The r11
path stores the EXACT length-prefixed utf-8 bytes in the sharded state
arrays — only shard routing hashes — so string buckets now satisfy the
same batch-SQL equivalence as integer ones:

    doc > MIN(doc) OVER (PARTITION BY band, bucket)

Adversarial cases covered: values that alias under NUL padding ("a" vs
"a\\x00"), width growth across micro-batches (forces the state-array
astype-widening path), multi-byte utf-8, and the empty string.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.streaming import stateful
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
    run_available_now,
)


def test_first_seen_string_buckets_match_batch_sql(spark, tmp_path):
    rows = [
        # batch 0: short keys, including the NUL-padding alias pair
        (0, [(0, "a", 1), (0, "a\x00", 2), (0, "a", 3), (1, "a", 4), (0, "", 5)]),
        # batch 1: same buckets re-hit + width growth + unicode
        (1, [(0, "a", 6), (0, "a\x00", 7), (0, "longer-bucket-key", 8),
             (1, "ümläut", 9), (0, "", 10)]),
        # batch 2: even wider keys, re-hits across every prior width
        (2, [(0, "longer-bucket-key", 11), (0, "the-widest-bucket-key-so-far", 12),
             (1, "ümläut", 13), (0, "a", 14), (0, "b", 15)]),
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    all_rows = []
    for i, batch in rows:
        pdf = spark.createDataFrame(batch, "band long, bucket string, doc long")
        path = os.path.join(src, f"part_{i}")
        pdf.coalesce(1).write.mode("overwrite").parquet(path)
        all_rows.extend(batch)
        # strictly ascending mtimes: FileStreamSource replays in mtime order
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (1_700_000_000 + i, 1_700_000_000 + i))
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(os.path.join(src, "part_0")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "part_*"))
    )
    flags = stateful.first_seen_flags(stream)
    got = run_available_now(flags, "append").select("band", "doc", "owner")

    batch = spark.createDataFrame(all_rows, "band long, bucket string, doc long")
    expected = batch.groupBy("band", "bucket").agg(F.min("doc").alias("owner")).join(
        batch, ["band", "bucket"]
    ).filter(F.col("doc") > F.col("owner")).select("band", "doc", "owner")

    got_set = {tuple(r) for r in got.collect()}
    exp_set = {tuple(r) for r in expected.collect()}
    assert got_set == exp_set, f"\ngot      {sorted(got_set)}\nexpected {sorted(exp_set)}"
    # the alias pair must NOT have merged: "a\x00" (first doc 2) owns its
    # own bucket, so doc 7 maps to owner 2, never to "a"'s owner 1
    assert (0, 7, 2) in got_set and (0, 7, 1) not in got_set
