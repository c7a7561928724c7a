"""One-pass profile sweep over headline queries (r13 measurement pass).

For each query: one untimed warm run + one timed run through the noop
sink, then per-query job/stage rollups from the UI REST API:

- wall: timed-run wall seconds
- jobs: number of Spark jobs the query launched
- jobw: sum of job wall seconds (> wall means concurrent jobs)
- gap:  wall - (time covered by jobs) proxy for driver/planning/Python
- 1task: largest single-task stage executorRunTime (ms) — the
  one-row-group-fixture CPU-serialization detector that found the
  bootstrap_mean_ci / cer_generation_eval wins

Usage: python tools/sweep_profile.py [names...]   (default: batch headliners)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("sweep-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "100000")
        .config("spark.ui.retainedStages", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui, app_id = spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId

    def rest(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = sys.argv[1:]
    if not names:
        import bench

        names = [q for q in bench.HEADLINE if not q.startswith("stream_")]

    # bench-style warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        load(spark, sf_dir, t).limit(1).collect()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _w(s):
        return s

    spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        _w(F.col("n_nationkey").cast("long"))
    ).collect()

    def ts(x):
        return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    print(f"# {'query':42s} {'wall':>7} {'jobs':>5} {'jobw':>7} {'1task(ms)':>9}")
    results = {}
    from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
        release_tmp_snapshots,
    )

    for name in names:
        fn = queries[name]
        # initialized before the try so the except path can't read a stale
        # or unbound `before` from the previous query (ADVICE r13 #4)
        before = max((j["jobId"] for j in rest("jobs")), default=-1)
        try:
            for i in range(2):
                before = max((j["jobId"] for j in rest("jobs")), default=-1)
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                wall = time.time() - t0
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for k in jmap.keySet().toArray():
                    jmap.get(k).unpersist()
                release_tmp_snapshots()
        except Exception as exc:  # noqa: BLE001
            print(f"# {name}: ERROR {type(exc).__name__}: {exc}"[:200])
            continue
        jobs = [j for j in rest("jobs") if j["jobId"] > before]
        stages = {s["stageId"]: s for s in rest("stages")}
        jobw = 0.0
        sids = set()
        for j in jobs:
            if j.get("completionTime"):
                jobw += ts(j["completionTime"]) - ts(j["submissionTime"])
            sids.update(j["stageIds"])
        one_task = 0
        for sid in sids:
            s = stages.get(sid)
            if s and s.get("status") != "SKIPPED" and s["numCompleteTasks"] == 1:
                one_task = max(one_task, s["executorRunTime"])
        results[name] = {
            "wall": round(wall, 3),
            "jobs": len(jobs),
            "jobw": round(jobw, 3),
            "one_task_ms": one_task,
        }
        print(f"  {name:42s} {wall:7.2f} {len(jobs):5d} {jobw:7.2f} {one_task:9d}")
    with open("/tmp/sweep_profile.json", "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
