"""Regression tests for the round-5 advice items (fixed in round 6):

- streaming_range_counts incremented open windows for EVERY non-probe
  kind, so an unfiltered stream (a third kind present) inflated counts.
- streaming_asof_last's same-timestamp tie rule depended on the match
  kind sorting lexically before the probe kind ('click' < 'error'); an
  inverted pair (probe 'error', match 'purchase') broke the inclusive
  >= ASOF convention.
- generational_kmv_distinct promised a KMV estimate beyond k but emitted
  raw truncated set sizes (saturating at k).
- cosine_topk_blocked_gemm's batch-local argpartition dropped exact-tie
  candidates with smaller neighbor_id at the batch boundary, diverging
  from cosine_topk_bruteforce on corpora with duplicate vectors.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.streaming import stateful
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
    run_available_now,
)


def _event_stream(spark, tmp_path, batches):
    """Micro-batch replay of hand-built (user_id, kind, event_id, ts_us)
    rows — one parquet file per batch, ascending mtimes (the repo's
    file-replay ordering contract)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = 1_600_000_000
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["user_id", "kind", "event_id", "ts_us"])
        pdf = pdf.astype({"user_id": "int64", "event_id": "int64", "ts_us": "int64"})
        path = f"{src}/part-{i:05d}.parquet"
        pq.write_table(pa.Table.from_pandas(pdf), path)
        os.utime(path, (base + i, base + i))
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )


def test_streaming_range_counts_ignores_unrelated_kinds(spark, tmp_path):
    """A third kind ('view') inside the open horizon must NOT increment the
    probe's window count."""
    batches = [
        [
            (1, "signup", 10, 100),
            (1, "view", 11, 150),  # inside horizon, wrong kind
            (1, "purchase", 12, 200),  # counts
        ],
        [
            (1, "view", 13, 250),  # wrong kind again
            (1, "purchase", 14, 300),  # counts
        ],
    ]
    src = _event_stream(spark, tmp_path, batches)
    out = run_available_now(
        stateful.streaming_range_counts(
            src, horizon_us=1_000, key_col="user_id", kind_col="kind"
        ),
        "append",
    )
    final = (
        out.groupBy("event_id")
        .agg(F.max("purchases_7d").alias("cnt"))
        .collect()
    )
    assert {r["event_id"]: r["cnt"] for r in final} == {10: 2}


def test_streaming_asof_inclusive_tie_with_inverted_kind_pair(spark, tmp_path):
    """probe='error' < match='purchase' lexically — the OPPOSITE of the
    click/error fixture pair. A match at the probe's exact timestamp must
    still win (inclusive >= ASOF convention)."""
    batches = [
        [
            (1, "purchase", 20, 500),
            (1, "error", 21, 500),  # same ts: inclusive -> sees 500
            (1, "error", 22, 600),  # later probe -> still 500
            (2, "error", 23, 700),  # no match ever -> NULL
        ]
    ]
    src = _event_stream(spark, tmp_path, batches)
    out = run_available_now(
        stateful.streaming_asof_last(
            src,
            key_col="user_id",
            kind_col="kind",
            match_kind="purchase",
            probe_kind="error",
        ),
        "append",
    )
    rows = {r["event_id"]: r["last_click_us"] for r in out.collect()}
    assert rows == {21: 500, 22: 500, 23: None}


def test_kmv_estimate_exact_below_k_and_calibrated_beyond():
    rng = np.random.RandomState(42)
    k = 256
    # below k and unsaturated: exact
    small = np.sort(rng.randint(-(2**62), 2**62, size=100).astype(np.int64))
    assert stateful._kmv_estimate(small, k, saturated=False) == 100
    # well beyond k: bottom-k estimate within KMV's ~1/sqrt(k) error band
    n = 50_000
    hs = np.unique(rng.randint(-(2**63), 2**63 - 1, size=n, dtype=np.int64))
    bottom = np.sort(hs)[:k]
    est = stateful._kmv_estimate(bottom, k, saturated=True)
    assert abs(est - len(hs)) / len(hs) < 5.0 / np.sqrt(k), (est, len(hs))


def test_blocked_gemm_keeps_tied_candidates(spark):
    """Duplicate corpus vectors (exact score ties) spread across batches:
    blocked GEMM must return exactly what brute force returns."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.similarity import (
        cosine_topk_blocked_gemm,
        cosine_topk_bruteforce,
    )

    # 30 corpus vectors, only 3 distinct directions -> massive tie groups
    dirs = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.5, 0.5, 0.0, 0.0]]
    corpus_rows = [(i, dirs[i % 3]) for i in range(100, 130)]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    ).repartition(8)  # force many batches so ties straddle batch cuts
    queries = spark.createDataFrame(
        [(1, [1.0, 0.1, 0.0, 0.0]), (2, [0.1, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    bf = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_bruteforce(corpus, queries, k=7).collect()
    }
    gm = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_blocked_gemm(corpus, queries, k=7).collect()
    }
    assert gm == bf
