

def test_compression_ratio_matches_zlib(spark, sf_dir):
    """The Spark compression-ratio aggregate equals a direct python zlib
    computation over the same parquet — the rows-only query's exactness
    witness (zlib at a fixed level is bit-deterministic)."""
    import zlib
    from decimal import Decimal

    import pyarrow.parquet as pq

    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import (
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    got = {
        r["source"]: r
        for r in QUERIES["compression_ratio_quality"](spark, sf_dir).collect()
    }

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    acc: dict[str, list] = {}
    for source, text in zip(tbl["source"].to_pylist(), tbl["text"].to_pylist()):
        raw = text.encode("utf-8")
        ratio = round(len(zlib.compress(raw, 6)) / len(raw), 6) if raw else 1.0
        acc.setdefault(source, []).append(ratio)
    for source, ratios in acc.items():
        r = got[source]
        assert r["n_docs"] == len(ratios)
        want_avg = float(
            sum(Decimal(f"{x:.6f}") for x in ratios)
        ) / len(ratios)
        assert abs(r["avg_ratio"] - round(want_avg, 6)) < 1e-9
        assert r["n_repetitive"] == sum(1 for x in ratios if x < 0.35)


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    """Poisson-bootstrap CI sanity: lo <= hi, both bracket the point mean
    for every event type at fixture scale (thousands of rows per type →
    the resample means concentrate tightly around the population mean)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import (
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    rows = QUERIES["bootstrap_mean_ci"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["boot_lo"] <= r["boot_hi"]
        assert r["boot_lo"] <= r["point_mean"] <= r["boot_hi"]
        # a 95% CI from thousands of rows is narrow relative to the mean
        assert (r["boot_hi"] - r["boot_lo"]) < 0.5 * abs(r["point_mean"]) + 1.0


def test_release_e2e_unpersists_all_stages(spark, sf_dir):
    """llm_corpus_release_e2e persists 7 stage DataFrames to keep the
    cascade from recomputing its prefix; every one must be unpersisted by
    the time the funnel returns (r8 verdict: leftover stage caches held
    executor storage for the rest of a bench/correctness sweep)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import (
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    rows = QUERIES["llm_corpus_release_e2e"](spark, sf_dir).collect()
    assert len(rows) == 8  # 7 stages + packed_seqs
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), f"leaked persisted RDD ids: {after - before}"


def test_icws_audit_unpersists_checkpoint(spark, sf_dir):
    """dedup_icws_weighted_minhash localCheckpoints its scoped tf (the
    <=40-doc audit input); the checkpoint RDD must be released once the
    <=20 audit rows are materialized, not left in executor storage for
    the rest of a sweep (same leak class the release-e2e test guards)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import (
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    rows = QUERIES["dedup_icws_weighted_minhash"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), f"leaked persisted RDD ids: {after - before}"
