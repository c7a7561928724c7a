"""Streaming fixed-cost decomposition (VERDICT r13 #8).

The streaming family is ~48 headline queries whose bench cost is dominated
by a per-query floor (r13: ~1.2 s fixed + ~0.45 s per micro-batch). This
probe answers whether any of that floor is SESSION cost a shared session
could amortize (it cannot be amortized further if bench already shares one
session — which it does), versus per-STREAM cost (checkpoint dir, offset/
commit log, state store init, incremental planning, memory sink) that is
paid per streaming query by construction.

Protocol:
  A. shared session — one SparkSession runs the trivial availableNow
     count query N times; per-run walls show the marginal per-stream cost
     once the session/JVM/python-worker warmup is paid.
  B. fresh session per query — each run in its own subprocess (what a
     per-query-teardown harness would pay), same query, same count.
  C. per-micro-batch increment — the shared session runs the same query
     at 1, 2 and 4 micro-batches.

Output: one JSON line with all samples. bench.py semantics are unchanged
by this tool; it exists to ground the "irreducible floor" claim in data.

Usage: python tools/streaming_floor_probe.py [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CHILD = """
import os, sys, time
sys.path.insert(0, {root!r})
from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
    get_spark, release_tmp_snapshots,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
    run_available_now, table_stream_source,
)
spark = get_spark("floor-probe-child")
spark.sparkContext.setLogLevel("ERROR")
# same warmup bench gives the FIRST streaming query of a session
run_available_now(
    table_stream_source(spark, {sf!r}, "nation", "n_nationkey", n_files=1)
    .groupBy("n_regionkey").count(), "complete").collect()
t0 = time.time()
run_available_now(
    table_stream_source(spark, {sf!r}, "nation", "n_nationkey", n_files=1)
    .groupBy("n_regionkey").count(), "complete").collect()
print("CHILD_WALL", time.time() - t0)
release_tmp_snapshots()
spark.stop()
"""


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
        get_spark,
        release_tmp_snapshots,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
        run_available_now,
        table_stream_source,
    )

    spark = get_spark("floor-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(n_files: int) -> float:
        t0 = time.time()
        run_available_now(
            table_stream_source(spark, SF_DIR, "nation", "n_nationkey", n_files=n_files)
            .groupBy("n_regionkey")
            .count(),
            "complete",
        ).collect()
        release_tmp_snapshots()
        return round(time.time() - t0, 3)

    # warm the streaming engine once (bench does the same)
    run_once(1)

    shared = [run_once(1) for _ in range(n)]
    batches = {nf: [run_once(nf) for _ in range(3)] for nf in (1, 2, 4)}
    spark.stop()

    fresh = []
    for _ in range(min(n, 3)):  # fresh JVMs are slow; 3 samples suffice
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.format(root=root, sf=SF_DIR)],
            capture_output=True,
            text=True,
            timeout=600,
        )
        total = round(time.time() - t0, 3)
        child_wall = None
        for line in out.stdout.splitlines():
            if line.startswith("CHILD_WALL"):
                child_wall = round(float(line.split()[1]), 3)
        fresh.append({"process_total": total, "warm_query_wall": child_wall})

    print(
        json.dumps(
            {
                "shared_session_per_query_sec": shared,
                "per_micro_batch": {str(k): v for k, v in batches.items()},
                "fresh_session_per_query": fresh,
            }
        )
    )


if __name__ == "__main__":
    main()
