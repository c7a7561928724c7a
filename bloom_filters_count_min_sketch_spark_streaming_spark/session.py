"""SparkSession factory with engine defaults.

Used by tests and bench. The driver harness passes its own session into
``queries()`` callables, so every query must also work on a vanilla session;
this factory only encodes the *preferred* configuration (AQE, Arrow,
right-sized shuffle partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bfcms-engine") -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale notes (100 TB mandate): on a real cluster the same config applies
    except ``master`` comes from the environment and shuffle partitions
    should be ~2-3x total cores; AQE coalesces them back down at runtime, so
    oversizing is safe while undersizing causes spill.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        # AQE: runtime partition coalescing + skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffle sizing for local[32]; AQE coalesces small stages.
        .config("spark.sql.shuffle.partitions", cpus)
        # Arrow for every JVM<->Python columnar hop (toPandas, pandas_udf).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp rendering regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    return builder.getOrCreate()


import atexit
import shutil
import tempfile
from contextlib import contextmanager

# Per-invocation stage-snapshot dirs (guide §3.3 lineage truncation: a
# multiply-referenced intermediate written once to tmp parquet so every
# consumer subtree is a cheap scan with real file statistics). The returned
# query plan lazily scans its snapshot, so the writing operator can never
# delete it synchronously; r13 leaked these dirs (ADVICE r13 #2). Every
# snapshot now registers here and the sweep harnesses (bench.py,
# tools/check_oracle.py, tools/retime.py) release between queries, with an
# atexit sweep catching one-shot sessions.
_TMP_SNAPSHOT_DIRS: list[str] = []


def tmp_snapshot_dir(prefix: str = "bfcms_snap_", dir: str | None = None) -> str:
    """A fresh tmp dir for a stage snapshot, registered for deferred cleanup.

    Written FRESH inside the calling query on every invocation — never keyed
    on input paths, never reused across runs (reuse would be result caching,
    which the bench contract forbids). Callers write parquet under the
    returned dir and return a plan scanning it; release_tmp_snapshots()
    reclaims the dirs once the consuming action is done.
    """
    d = tempfile.mkdtemp(prefix=prefix, dir=dir)
    _TMP_SNAPSHOT_DIRS.append(d)
    return d


# Streaming checkpoint dirs (streaming/runner._ephemeral_ckpt) are swept by
# GLOB + mtime guard instead of by registration: registering from inside
# runner.py would put the cleanup call into the implementation-fingerprint
# closure of every streaming query (plans/implfp.py) and flood the driver's
# r14 hash window with 48 re-checks for a harness-only change. The guard
# (only dirs this process could have created: mtime >= process start)
# keeps a concurrently running session's live checkpoints safe; harnesses
# here run queries serially.
_PROCESS_T0 = __import__("time").time()
_CKPT_GLOB_ROOTS = ["/dev/shm", tempfile.gettempdir()]


def release_tmp_snapshots() -> None:
    """Delete every registered snapshot dir (call AFTER the query's action:
    the lazily returned plan references the snapshot until materialized),
    plus this process's ephemeral streaming-checkpoint dirs."""
    while _TMP_SNAPSHOT_DIRS:
        shutil.rmtree(_TMP_SNAPSHOT_DIRS.pop(), ignore_errors=True)
    import glob

    for root in _CKPT_GLOB_ROOTS:
        for d in glob.glob(os.path.join(root, "bfcms_ckpt_*")):
            try:
                if os.stat(d).st_mtime >= _PROCESS_T0 - 1.0:
                    shutil.rmtree(d, ignore_errors=True)
            except OSError:
                pass


atexit.register(release_tmp_snapshots)


@contextmanager
def checkpoint_scope(spark: SparkSession):
    """Unpersist every RDD persisted inside the scope on exit.

    ``df.localCheckpoint(eager=True)`` persists the checkpointed RDD in
    executor storage for the REST OF THE SESSION (there is no DataFrame
    API to release it), so a query that checkpoints a bounded intermediate
    leaks it into every later query of a bench/correctness sweep. Wrap the
    checkpoint-and-consume region in this scope and materialize the result
    (collect a bounded report, or write at rest) BEFORE the scope closes —
    the lazily returned plan must not reference the checkpoint afterward.

    Diffing getPersistentRDDs before/after scopes the unpersist to RDDs
    created inside (queries run serially in every harness here, so the
    diff cannot catch another query's cache)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = {int(k) for k in jmap.keySet().toArray()}
    try:
        yield
    finally:
        jafter = spark.sparkContext._jsc.getPersistentRDDs()
        for k in jafter.keySet().toArray():
            if int(k) not in before:
                jafter.get(k).unpersist()
