"""Engine-level feature tests: RocksDB state store (C14), sampling (B23),
observe metrics (B34), parquet row-group bloom filters (write-side A1
analogue), streaming dropDuplicatesWithinWatermark (C9), streaming file
sink (C12/B3)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load
from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
    events_stream_source,
    run_available_now,
)


def test_rocksdb_state_store_provider(spark, sf_dir):
    """The 100 TB state path: RocksDB provider instead of the in-heap
    HDFS-backed default. Same query, same results."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = events_stream_source(spark, sf_dir)
        agg = src.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        out = run_available_now(agg, "complete")
        got = {r["event_type"]: r["n"] for r in out.collect()}
        exact = {
            r["event_type"]: r["n"]
            for r in load(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == exact
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_sampling(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    n = ev.count()
    s = ev.sample(fraction=0.2, seed=42)
    got = s.count()
    assert 0.1 * n < got < 0.3 * n
    # seeded sampling is reproducible
    assert s.count() == ev.sample(fraction=0.2, seed=42).count()


def test_stratified_sampling(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    s = ev.sampleBy("event_type", {"click": 0.5, "error": 0.1}, seed=42)
    by_type = {r["event_type"]: r["n"] for r in s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(by_type) <= {"click", "error"}
    assert by_type.get("click", 0) > by_type.get("error", 0)


def test_observe_metrics(spark, sf_dir):
    from pyspark.sql import Observation

    obs = Observation("stats")
    ev = load(spark, sf_dir, "events").observe(
        obs, F.count(F.lit(1)).alias("rows"), F.max("value").alias("max_v")
    )
    ev.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == load(spark, sf_dir, "events").count()
    assert obs.get["max_v"] > 0


def test_parquet_rowgroup_bloom_filter_roundtrip(spark, sf_dir):
    """Parquet-level Bloom filters (the storage-side sibling of the
    engine's Bloom operator): write with bloom enabled, read back with an
    equality predicate — results identical, file readable."""
    out = tempfile.mkdtemp(prefix="bloom_parquet_")
    ev = load(spark, sf_dir, "events")
    (
        ev.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#user_id", "true")
        .option("parquet.bloom.filter.expected.ndv#user_id", "1000")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("user_id") == 7)
    expect = ev.filter(F.col("user_id") == 7)
    assert back.count() == expect.count()


def test_streaming_dedup_within_watermark(spark, sf_dir):
    src = events_stream_source(spark, sf_dir)
    # watermark wider than the fixture's 30-day span: nothing is "late",
    # so the only row-dropping behavior left is true duplicate removal
    deduped = src.withWatermark("ts", "40 days").dropDuplicatesWithinWatermark(["event_id"])
    out = run_available_now(deduped.select("event_id"), "append")
    n_events = load(spark, sf_dir, "events").count()
    assert out.count() == n_events
    assert out.distinct().count() == n_events


def test_streaming_parquet_file_sink(spark, sf_dir):
    """Streaming parquet sink: append the raw stream to files, read back."""
    out = tempfile.mkdtemp(prefix="stream_sink_")
    ckpt = tempfile.mkdtemp(prefix="stream_sink_ckpt_")
    src = events_stream_source(spark, sf_dir)
    q = (
        src.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == load(spark, sf_dir, "events").count()


def test_registry_prefix_carries_identity_queries():
    """The driver verifies a prefix of queries() (r1: first 50). The
    r6 computed rotation (registry._apply_priority_order) must keep the
    engine's identity — sketches, dedup, ANN, streaming — pinned in that
    prefix via registry._PINS, and keep the prefix entirely oracle-backed
    (the fill stage only selects oracle-backed queries)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans import registry

    registry.load_all_query_modules()
    prefix = list(registry.QUERIES)[:50]
    for marker in registry.active_pins():
        assert marker in prefix, f"pin {marker} fell out of the driver prefix"
    # while any oracle-backed query is still never-driver-checked, retirement
    # must NOT have activated: the full pin set holds its slots
    checked = set(registry.driver_checked_rounds())
    tail = [n for n in registry.QUERIES if n in registry.ORACLES and n not in checked]
    if tail:
        assert registry.active_pins() == [
            n for n in registry._PINS if n in registry.QUERIES
        ], "pin retirement activated while the never-checked tail is non-empty"
    # the permanently-kept pin set must still span the identity families
    permanent = [n for n in registry._PINS if n not in registry._PIN_RETIRE_ELIGIBLE]
    families = ("bloom_", "cms_", "dedup_", "knn_", "stream_")
    for fam in families:
        assert any(p.startswith(fam) for p in permanent), f"no permanent {fam} pin"
    n_oracle = sum(1 for n in prefix if n in registry.ORACLES)
    assert n_oracle == 50, f"only {n_oracle}/50 prefix queries are oracle-backed"


def test_parquet_rowgroup_bloom_filter_written(spark, sf_dir, tmp_path):
    """Storage-layer Bloom filters (B1/B3 depth): Spark's parquet writer
    embeds per-row-group bloom filters for the flagged column, letting
    scans skip row groups on equality predicates — the at-rest counterpart
    of the engine's query-time Bloom operators.

    Two findings this test pins down (verified against parquet-java via
    the JVM footer reader; pyarrow 16 does not expose bloom metadata):
    - bloom filters are only materialized for columns that fall out of
      dictionary encoding (a fully dict-encoded chunk's dictionary is
      already an exact membership filter, so parquet-java skips the bloom);
    - unflagged columns never pay the bloom storage cost.
    """
    import glob

    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    out = str(tmp_path / "ev_bloom")
    (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#event_type", "true")
        .option("parquet.bloom.filter.expected.ndv#event_type", "100")
        .option("parquet.enable.dictionary", "false")
        .parquet(out)
    )
    [part] = glob.glob(f"{out}/part-*.parquet")
    jvm = spark._jvm  # noqa: SLF001
    conf = spark.sparkContext._jsc.hadoopConfiguration()  # noqa: SLF001
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(part), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    try:
        rg = reader.getFooter().getBlocks().get(0)
        offsets = {
            rg.getColumns().get(i).getPath().toDotString(): rg.getColumns()
            .get(i)
            .getBloomFilterOffset()
            for i in range(rg.getColumns().size())
        }
    finally:
        reader.close()
    assert offsets["event_type"] > 0, "flagged column must carry a bloom filter"
    assert offsets["user_id"] == -1, "unflagged columns must not pay the bloom cost"


def test_analyze_table_catalog_stats(spark, sf_dir):
    """CBO catalog statistics: ANALYZE TABLE writes row-count + column
    stats the optimizer reads for join sizing. Row count must be exact;
    column NDV exists (HLL-approximate, so only sanity-bounded)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    load(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "bfcms_stats_nation"
    )
    try:
        spark.sql(
            "ANALYZE TABLE bfcms_stats_nation COMPUTE STATISTICS "
            "FOR COLUMNS n_nationkey, n_regionkey"
        )
        stats = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED bfcms_stats_nation"
            ).collect()
            if r["col_name"] == "Statistics"
        }
        assert "rows" in stats.get("Statistics", ""), stats
        n = spark.table("bfcms_stats_nation").count()
        assert f"{n} rows" in stats["Statistics"]
        col = spark.sql(
            "DESCRIBE TABLE EXTENDED bfcms_stats_nation n_nationkey"
        ).collect()
        got = {r["info_name"]: r["info_value"] for r in col}
        assert int(got["distinct_count"]) > 0
        assert int(got["distinct_count"]) <= n
    finally:
        spark.sql("DROP TABLE IF EXISTS bfcms_stats_nation")


def test_declarative_pipelines_env_blocked():
    """Spark Declarative Pipelines (4.1): the API ships in this pyspark,
    but execution requires Spark Connect, whose python client needs
    protobuf — absent here (same blocker as transformWithStateInPandas).
    Record the state: decorators import, the Connect-side registry is the
    only execution path."""
    from pyspark import pipelines

    assert hasattr(pipelines, "materialized_view")
    assert hasattr(pipelines, "create_streaming_table")
    try:
        import google.protobuf  # noqa: F401

        blocked = False
    except ImportError:
        blocked = True
    assert blocked, "protobuf appeared — wire up a real SDP execution test"


def test_concurrent_queries_share_session(spark, sf_dir):
    """Thread-safety of one SparkSession under concurrent query
    submission (the shared-cluster reality): 8 queries race on a pool and
    must produce exactly their sequential results."""
    from concurrent.futures import ThreadPoolExecutor

    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import (
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    names = [
        "q1_pricing_summary",
        "events_hourly_counts",
        "cms_event_type_freq",
        "heavy_hitters_approx",
        "text_quality_by_source",
        "dedup_exact_docs",
        "mean_family",
        "argmax_family",
    ]

    def run(name):
        return name, [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]

    sequential = dict(run(n) for n in names)
    with ThreadPoolExecutor(max_workers=8) as pool:
        concurrent = dict(pool.map(run, names))
    for n in names:
        assert sorted(map(str, concurrent[n])) == sorted(map(str, sequential[n])), n


def test_timestamp_nanos_canary_all_surface_forms(spark, tmp_path):
    """Canary for the pyspark parquet-timestamp reader contract.

    The pyspark 4.1.2 upgrade silently broke 45 queries mid-round-3: the
    legacy ``parquet.nanosAsLong`` conf stopped applying and events.ts
    stopped surfacing as LONG. ``sources/io.load`` now branches on the
    surfaced dtype. This test fabricates every surface form the same
    instants can arrive in and pins today's contract per form:

    - raw-nanos LONG               -> load converts, micros TIMESTAMP
    - micros TIMESTAMP_NTZ         -> load casts, micros TIMESTAMP
      (this is what every current fixture stores)
    - micros TIMESTAMP (UTC)       -> passes through unchanged
    - parquet TIMESTAMP(NANOS)     -> pyspark 4.1.2 REFUSES the scan
      (PARQUET_TYPE_ILLEGAL); if a future runtime starts reading it, it
      must floor to the identical micros

    The next runtime upgrade that changes parquet timestamp inference
    fails this one test instead of 45 oracle checks.
    """
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.errors.exceptions.captured import AnalysisException
    from pyspark.sql.types import TimestampType

    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    # Instants with sub-micro nanos to pin the floor-to-micros truncation.
    nanos = [
        1_700_000_000_123_456_789,
        1_700_000_001_000_000_999,
        1_700_086_400_999_999_001,
    ]
    micros = [n // 1000 for n in nanos]
    ids = list(range(len(nanos)))

    def write(form, arr):
        d = tmp_path / form
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": pa.array(ids, pa.int64()), "ts": arr}),
            str(d / "events.parquet"),
        )
        return str(d)

    def read(d):
        df = load(spark, d, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema[
            "ts"
        ].dataType
        return [r["ts"] for r in df.orderBy("event_id").select("ts").collect()]

    expected = [
        datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=m)
        for m in micros
    ]

    got_long = read(write("long_nanos", pa.array(nanos, pa.int64())))
    assert got_long == expected, f"LONG nanos diverged: {got_long}"

    got_ntz = read(write("ts_ntz_micros", pa.array(micros, pa.timestamp("us"))))
    assert got_ntz == expected, f"TIMESTAMP_NTZ micros diverged: {got_ntz}"

    got_utc = read(
        write("ts_utc_micros", pa.array(micros, pa.timestamp("us", tz="UTC")))
    )
    assert got_utc == expected, f"TIMESTAMP micros diverged: {got_utc}"

    # parquet TIMESTAMP(NANOS): pyspark 4.1.2 refuses the scan outright.
    # Accept either today's refusal or a future runtime that reads it —
    # but a read MUST floor to the identical micros.
    nanos_dir = write("ts_nanos", pa.array(nanos, pa.timestamp("ns")))
    try:
        got_ns = read(nanos_dir)
    except AnalysisException as exc:
        assert "PARQUET_TYPE_ILLEGAL" in str(exc), str(exc)
    except Exception as exc:  # collect-time failure surfaces wrapped
        assert "PARQUET_TYPE_ILLEGAL" in str(exc), str(exc)
    else:
        assert got_ns == expected, f"TIMESTAMP(NANOS) diverged: {got_ns}"


def test_registry_prefix_rotates_driver_coverage():
    """The driver hash-checks only the first 50 registry entries per
    round. To keep driver-green coverage EXPANDING instead of re-proving
    a fixed set, the prefix is now COMPUTED (registry._apply_priority_order,
    VERDICT r5 item 6): pins first, then never-driver-checked oracle-backed
    queries in registration order. This test verifies the computed prefix
    actually delivers fresh coverage each round — capped by how many
    never-checked oracle-backed queries even remain."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans import registry

    seen = set(registry.driver_checked_rounds())
    if not seen:
        return  # no driver rounds recorded yet
    registry.load_all_query_modules()
    prefix = list(registry.QUERIES)[:50]
    fresh = [n for n in prefix if n not in seen]
    remaining = [
        n for n in registry.QUERIES if n in registry.ORACLES and n not in seen
    ]
    want = min(10, len(remaining))
    assert len(fresh) >= want, (
        f"only {len(fresh)} never-driver-checked queries in the prefix "
        f"({fresh}) with {len(remaining)} still unchecked; rotation broke"
    )
    # Active pins (the engine's identity queries, minus any retired once
    # the never-checked tail drains) must always stay in the prefix.
    for pin in registry.active_pins():
        assert pin in prefix, f"identity pin {pin} fell out of the prefix"


def test_pin_retirement_activates_only_when_tail_drained(monkeypatch):
    """r12 verdict #7: once every oracle-backed query has a driver-green
    record, long-proven retire-eligible pins demote to ordinary rotation
    members (freeing prefix slots for the least-recently-checked tail);
    until then the prefix is bit-identical to pre-retirement behavior."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans import registry

    registry.load_all_query_modules()
    all_pins = [n for n in registry._PINS if n in registry.QUERIES]

    # Real state today: tail non-empty -> no retirement.
    assert len(registry.active_pins()) == len(all_pins)

    try:
        # Simulate the drained-tail future: every oracle-backed query
        # checked green in some round, pins green in many rounds.
        fake_checked = {n: 12 for n in registry.QUERIES if n in registry.ORACLES}
        fake_counts = {n: 12 for n in registry._PINS}
        monkeypatch.setattr(registry, "driver_checked_rounds", lambda: fake_checked)
        monkeypatch.setattr(registry, "driver_green_counts", lambda: fake_counts)
        active = registry.active_pins()
        assert active == [
            n for n in all_pins if n not in registry._PIN_RETIRE_ELIGIBLE
        ], "retire-eligible pins should demote once the tail is drained"
        # A NEWLY-added pin (few green rounds) must keep its slot even if
        # listed retire-eligible.
        fake_counts2 = dict(fake_counts)
        victim = next(iter(registry._PIN_RETIRE_ELIGIBLE))
        fake_counts2[victim] = registry._PIN_RETIRE_MIN_GREEN_ROUNDS - 1
        monkeypatch.setattr(registry, "driver_green_counts", lambda: fake_counts2)
        assert victim in registry.active_pins(), (
            "a pin below the green-round floor must not retire"
        )
        # And the reordered prefix under retirement stays 50 oracle-backed
        # entries containing every still-active pin.
        registry._apply_priority_order()
        prefix = list(registry.QUERIES)[:50]
        for pin in registry.active_pins():
            assert pin in prefix
        assert sum(1 for n in prefix if n in registry.ORACLES) == 50
    finally:
        monkeypatch.undo()
        # restore the real computed order for any later test in the session
        registry._apply_priority_order()
