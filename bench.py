"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {family: sec, ...}, "sf": ..., "n_queries": ...,
"full": "BENCH_FULL.json"}. The per-query map outgrew the driver's output
tail window in round 3 (BENCH_r03.json parsed:null), so the final stdout
line now carries per-FAMILY rollups only and the complete per-query map
(plus per-query run spread) is written to BENCH_FULL.json at the repo
root.

Materialization is via the noop sink (full evaluation of every column, no
driver collect, no pruning shortcut), except streaming queries which
already run to completion internally (their cost is the stream run).
Streaming queries are timed min-of-3 (batch min-of-2): they dominate the
noisy tail on this shared host (+20-40% uniform drift r2->r3), and the
recorded spread lets a reader distinguish regression from host noise.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_top3_orders_per_customer",
    "events_hourly_counts",
    "asof_join_last_click_before_error",
    # probabilistic core (the reference's identity)
    "cms_event_type_freq",
    "bloom_membership",
    "heavy_hitters_approx",
    "hll_sketch_users",
    # LLM-pipeline extensions
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "knn_cosine_bruteforce",
    "ann_lsh_topk",
    "text_quality_by_source",
    "llm_corpus_pipeline",
    "sessionization_batch",
    "mergeable_topk_pipeline",
    "embedding_label_distances",
    # round-2 additions
    "cms_sketch_table_merge",
    "corpus_pack_sequences",
    "embedding_quantize_stats",
    "contamination_bloom_gate",
    "bm25_ranked_search",
    "doc_chunk_windows",
    "cms_join_size_estimate",
    # round-3 additions
    "text_repetition_stats",
    "pii_redaction_stats",
    "priority_sample_docs",
    "dedup_incremental_ingest",
    "bucketed_join_agg",
    "kmeans_embeddings",
    # round-3 second batch (corpus hygiene + CDC + outer stream join)
    "dataset_split_stats",
    "domain_frequency_caps",
    "language_balanced_resample",
    "bpe_pair_counts",
    "scd2_dimension_merge",
    "corpus_curation_e2e",
    "cms_dyadic_range_counts",
    "stream_stream_left_outer_join",
    # round-3 fourth pass (quality / curation)
    "semdedup_embeddings",
    "duplicate_ngram_spans",
    "data_quality_constraints",
    "dedup_incremental_minhash",
    "bpe_apply_fixed_merges",
    # round-3 eighth-tenth passes (KMV sketches, retrieval, curation, graph)
    "kmv_distinct_per_type",
    "kmv_sketch_table_merge",
    "hybrid_search_rrf",
    "pagerank_nation_trade",
    "corpus_divergence_kl",
    "quality_token_budget",
    "phrase_search_positions",
    # streaming
    "stream_chained_windows",
    "stream_windowed_counts",
    "stream_stateful_running_counts",
    "stream_stateful_cms_per_key",
    "stream_4batch_replay_trajectory",
    "stream_cms_running_freq",
    "stream_windowed_cms_freq",
    "stream_windowed_hll_distinct",
    "stream_foreachbatch_upsert",
    # round-3 (this session): graph, statistics, weighted similarity, PCA
    "triangle_count_trade",
    "sparse_cosine_topk_pairs",
    "bootstrap_mean_ci",
    "embedding_pca_variance",
    "ams_f2_estimate",
    "bigram_perplexity_scores",
    "entity_resolution_e2e",
    "ivm_join_delta_maintenance",
    "spatial_grid_join",
    "kaplan_meier_survival",
    "pareto_concentration_gini",
    # round-4: deletable membership, LSH exactness witness, FD matrix
    # sketch, streaming LSH dedup
    "counting_bloom_delete_membership",
    "ann_lsh_full_tables_exact",
    "frequent_directions_spectrum",
    "stream_minhash_lsh_dedup",
    # round-5: sharded-sketch streaming retraction, RocksDB provider,
    # real-codec multimodal decodes
    "stream_counting_bloom_retraction",
    "stream_rocksdb_stateful_counts",
    "multimodal_wav_decode",
    "multimodal_bmp_decode",
    "multimodal_png_decode",
    "knn_blocked_gemm_topk",
    "stream_generational_bloom_dedup",
    "cms_dyadic_quantiles",
    "cms_time_range_freq",
    "cms_heavy_change_detection",
    "cms_decayed_sketch_merge",
    # round-5 final pass: online enrichments, quality-aware dedup,
    # binaryFile media ingest
    "stream_asof_enrichment",
    "stream_range_count_enrichment",
    "dedup_keep_best_quality",
    "source_binaryfile_media",
    # round-6: real AVI demux + real image resize, lossless prefix-filter
    # similarity join, PQ/ADC search, mergeable + streaming Misra-Gries,
    # oracle-verified GD training loop
    "multimodal_frame_sample",
    "multimodal_resize_roundtrip",
    "dedup_prefix_filter_jaccard_join",
    "pq_adc_recall",
    "misra_gries_table_merge",
    "stream_misra_gries_topk",
    "logreg_gd_click_model",
    # round-6 continuation: ExactSubstr rewrite, sharded cuckoo membership,
    # KN LM, rank-map normalization, online SPRT/CUSUM/IBLT state
    "exact_substring_dedup_rewrite",
    "cuckoo_filter_membership",
    "kneser_ney_bigram_scores",
    "quantile_normalize_sources",
    "stream_sprt_early_stop",
    "stream_cusum_changepoint",
    "stream_iblt_replication_audit",
    # round-6 third pass: rank tests, governance/AQP, graph classics,
    # streaming counter/window/regression classics, coreset clustering
    "spearman_trend_by_type",
    "wasserstein_source_drift",
    "k_anonymity_ldiversity_audit",
    "ipf_mixture_raking",
    "aqp_sampled_groupby",
    "kmeans_coreset_fit",
    "fellegi_sunter_link_weights",
    "lpa_trade_communities",
    "hits_trade_hubs",
    "stream_spacesaving_topk",
    "stream_ols_trend",
    "stream_eh_window_sum",
    "stream_stable_bloom_dedup",
    "stream_dedup_within_watermark",
    # round-6 fourth pass: stdlib JPEG codec, KLL quantile family
    "multimodal_jpeg_decode",
    "kll_quantile_sketch_table",
    "stream_kll_quantiles",
    # round-7: model-eval stats, debiased sketches, graph/text ranking,
    # hash-checked trainers, calibration, sequence mining
    "roc_auc_doc_length",
    "logrank_test_user_parity",
    "cms_count_mean_min_debias",
    "adamic_adar_link_prediction",
    "textrank_keywords",
    "gopher_quality_rules",
    "als_rank1_factorization",
    "naive_bayes_langid",
    "isotonic_calibration_pava",
    "sequential_pattern_support",
    "stream_hierarchical_heavy_hitters",
    "stream_page_hinkley",
    "cox_one_step_hazard_ratio",
    "calibration_error_summary",
    "fleiss_kappa_weak_labelers",
    "knn_label_ndcg",
    "stream_roc_auc",
    "granger_causality_click_purchase",
    "mann_kendall_trend",
    "stream_lossy_counting_topk",
    "sink_python_datasource_write",
    "stream_python_datasource_sink",
    "udtf_analyze_dynamic_schema",
    "pandas_udaf_window_trailing_mean",
    # round-7 continuation additions
    "good_turing_vocab_coverage",
    "pmi_top_collocations",
    "brown_forsythe_variance_test",
    "winnowing_fingerprint_overlap",
    "padding_efficiency_audit",
    "stream_vocab_coverage",
    "stream_cms_join_size",
    "ktruss_trade_graph",
    "dedup_weighted_jaccard_pairs",
    "dedup_icws_weighted_minhash",
    "decision_stump_quality",
    "er_sorted_neighborhood_metrics",
    "trigram_fuzzy_vocab_search",
    "stream_winnowing_contamination",
    "ann_rptree_topk",
    "stream_decision_stump",
    "woe_information_value",
    "mondrian_k_anonymity",
    "krippendorff_alpha_labelers",
    "dunning_llr_collocations",
    "stream_priority_sample",
    "anderson_darling_two_sample",
    "energy_distance_embeddings",
    "shapley_source_vocab_value",
    "markov_removal_attribution",
    # round-8 additions
    "llm_corpus_release_e2e",
    "ann_rptree_full_spill_exact",
    "kmeans_coreset_full_exact",
    # round-9 additions
    "stream_corpus_release_funnel",
    # round-10 additions: EH saturated witness, IVF-int8 lossless witness,
    # online model-monitoring composite
    "stream_eh_saturated_exact",
    "ann_ivf_int8_lossless_exact",
    "stream_model_monitoring_funnel",
    "cms_conservative_exact",
    "count_sketch_exact",
    "voptimal_saturated_exact",
    "bloom_table_merge_exact",
    "stream_kll_saturated_exact",
    "stream_dgim_saturated_exact",
    "stream_sbf_decayless_exact",
    "kmeans_identity_exact",
    "embedding_pca_closed_form_exact",
    "fd_saturated_spectrum_exact",
    "pca_project_closed_form_exact",
    "rouge_ngram_eval",
    "bleu_corpus_eval",
    "cer_generation_eval",
    "wer_generation_eval",
    "tdigest_quantile_sketch_table",
    "tdigest_saturated_exact",
    "stream_tdigest_quantiles",
    "stream_tdigest_saturated_exact",
    "stream_adwin_drift",
    "stream_adwin_stationary_exact",
    "xor_filter_membership",
    "stream_triest_triangles",
    "stream_triest_saturated_exact",
]


def _family(name: str) -> str:
    """Per-family rollup keys for the compact driver line. Prefix-based so
    new headline queries classify without maintenance."""
    if name.startswith("stream_"):
        return "streaming"
    if name.startswith(("dedup_", "semdedup", "duplicate_", "entity_resolution")):
        return "dedup"
    if name.startswith(
        ("ann_", "knn_", "embedding_", "kmeans", "sparse_cosine", "hybrid_search")
    ):
        return "vector"
    if name.startswith(
        (
            "cms_",
            "bloom_",
            "counting_bloom",
            "hll_",
            "kmv_",
            "heavy_hitters",
            "ams_",
            "mergeable_topk",
            "frequent_directions",
        )
    ):
        return "sketch"
    if name.startswith(
        (
            "text_",
            "bm25",
            "bpe_",
            "llm_",
            "corpus_",
            "doc_",
            "pii_",
            "phrase_",
            "bigram_",
            "quality_",
            "language_",
            "contamination",
            "dataset_split",
            "domain_frequency",
            "priority_sample",
            "data_quality",
            "multimodal",
        )
    ):
        return "text_pipeline"
    return "relational"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from bloom_filters_count_min_sketch_spark_streaming_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    queries = entrymod.queries()

    # Warm every engine component the measured queries rely on, so the
    # first headline query isn't charged for one-time JVM/codegen/worker
    # startup: codegen + shuffle, the vectorized parquet reader, and the
    # Arrow python-worker pool (pandas UDFs reuse warm workers).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(f"{sf_dir}/nation.parquet")
    warm.groupBy("n_regionkey").count().collect()
    # Touch every fixture's parquet footer (schema inference + OS page
    # cache) so the sweep's FIRST queries aren't charged the one-time
    # cold-read cost: r10's q3 ran 2.4s in-sweep (2nd position, tight
    # spread) vs 0.9s warm-isolated with identical code.
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    for _tbl in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        load(spark, sf_dir, _tbl).limit(1).collect()
    import pandas as pd
    from pyspark.sql import functions as F

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf can't evaluate
    @F.pandas_udf("long")
    def _warm_udf(s):
        return s

    warm.select(_warm_udf(F.col("n_nationkey").cast("long"))).collect()

    # Warm the streaming engine too (micro-batch executor, state-store
    # machinery, memory sink): the first streaming headliner otherwise
    # pays ~2s of one-time init that belongs to the harness, not the plan.
    from bloom_filters_count_min_sketch_spark_streaming_spark.streaming.runner import (
        run_available_now,
        table_stream_source,
    )

    run_available_now(
        table_stream_source(spark, sf_dir, "nation", "n_nationkey", n_files=1)
        .groupBy("n_regionkey")
        .count(),
        "complete",
    ).collect()

    # Host-speed calibration: a fixed reference workload (pure JVM
    # hash-agg over a generated range, no I/O, engine-version-stable)
    # timed min-of-3. The shared host's speed varies ±3x between rounds;
    # dividing the headline total by this figure separates "the code got
    # slower" from "the host got slower" when comparing BENCH_r{N} files.
    cal = []
    for _ in range(3):
        t0 = time.time()
        spark.range(50_000_000).selectExpr("id % 97 AS k").groupBy(
            "k"
        ).count().collect()
        cal.append(time.time() - t0)
    calibration = round(min(cal), 3)
    print(f"# calibration (fixed 50M-row hash-agg): {calibration}s", file=sys.stderr)

    # The host is shared and noisy (observed ±3x run-to-run on identical
    # plans): time each query twice and keep the min — the standard way to
    # report the plan's cost rather than the scheduler's mood.
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = queries[name]
        # Streaming runs carry state-store + micro-batch scheduling
        # overhead that the shared host perturbs far more than batch plans:
        # min-of-3 for streams, min-of-2 for batch.
        runs = 3 if name.startswith("stream_") else 2
        samples = []
        try:
            for _ in range(runs):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
        except Exception as exc:  # noqa: BLE001 — one broken query must not
            # destroy the whole bench record (the driver keeps only this
            # run's output); record the error and keep timing the rest.
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        finally:
            # release persist()/localCheckpoint caches the query's lazy
            # plan kept alive — they're dead once the noop sink ran, and
            # across 174 headliners x2-3 runs they otherwise accumulate
            # in executor storage for the whole sweep
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for k in jmap.keySet().toArray():
                jmap.get(k).unpersist()
            # ...and the per-invocation tmp-parquet stage snapshots some
            # operators write (dead once the noop sink ran; r13 leaked
            # them — cleanup is outside the timed region)
            from bloom_filters_count_min_sketch_spark_streaming_spark.session import (
                release_tmp_snapshots,
            )

            release_tmp_snapshots()
        best = min(samples)
        timings[name] = round(best, 3)
        # spread = worst/best across this invocation's runs — >1.5 means
        # the host was noisy while this query ran; read its timing softly.
        spreads[name] = round(max(samples) / best, 2) if best > 0 else 1.0
        print(
            f"# {name}: {timings[name]}s (spread x{spreads[name]})",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)

    # Regression check vs the most recent driver-recorded round (stderr
    # only — the stdout contract stays one JSON line). Ratios > 3x are
    # flagged; the host's observed run-to-run noise is ±3x, so anything
    # beyond that is likely a real plan regression, not scheduler mood.
    prev = _latest_round_bench()
    if prev:
        prev_q = prev.get("queries", {})
        prev_s = prev.get("spreads", {})
        flagged = []
        for name, t in timings.items():
            p = prev_q.get(name)
            if p and p > 0:
                ps = prev_s.get(name, 1.0) or 1.0
                base = _regression_baseline(p, ps)
                ratio = t / base
                if ratio > 3.0:
                    flagged.append(
                        f"{name}: {p}s (spread x{ps}) -> {t}s ({ratio:.1f}x)"
                    )
        print(
            f"# vs {prev['file']}: total {prev.get('value')}s -> {total}s; "
            + (f"REGRESSIONS: {'; '.join(flagged)}" if flagged else "no query >3x slower"),
            file=sys.stderr,
        )

    # Full per-query record (the r1-r3 format plus spreads) goes to a
    # file; the driver's tail window only needs the compact line below.
    root = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(root, "BENCH_FULL.json"), "w") as fh:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spreads": spreads,
                "errors": errors,
                "sf": sf,
                "calibration_sec": calibration,
            },
            fh,
            indent=1,
        )
        fh.write("\n")

    fam: dict[str, float] = {}
    for name, t in timings.items():
        key = _family(name)
        fam[key] = round(fam.get(key, 0.0) + t, 3)

    # The driver parses the TAIL of combined stdout+stderr, so the JSON
    # line must be the LAST thing emitted. JVM teardown used to spew a
    # state-store RPC stack to stderr *after* the line (BENCH_r03/r04
    # parsed:null): silence logging, stop the session first, and print
    # the JSON only once teardown noise is done.
    spark.sparkContext.setLogLevel("OFF")
    sys.stderr.flush()
    try:
        spark.stop()
    except Exception:
        pass  # teardown noise must not eat the bench record
    time.sleep(1.0)  # let async maintenance threads finish their last gasp
    sys.stderr.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": fam,
                "sf": sf,
                "calibration_sec": calibration,
                "n_queries": len(timings),
                "n_errors": len(errors),
                "full": "BENCH_FULL.json",
            }
        ),
        flush=True,
    )


def _regression_baseline(committed_min: float, committed_spread: float) -> float:
    """Per-query baseline for the regression tripwire.

    A committed min whose own run spread exceeded x2 was a LUCKY run, not
    the plan's cost (the icws lesson: a committed 3.5s min at spread x4.12
    while typical runs were ~14s burned a round-9 investigation on a
    phantom regression). Discount such baselines by comparing against
    min*spread — the worst run actually observed when the baseline was
    recorded; stable baselines (spread <= x2) stay at the raw min."""
    if committed_spread > 2.0:
        return committed_min * committed_spread
    return committed_min


def _latest_round_bench() -> dict | None:
    """Most recent full per-query bench record for the regression check.

    The baseline is the COMMITTED BENCH_FULL.json (`git show
    HEAD:BENCH_FULL.json`), not the working-tree file: every bench run
    overwrites the working-tree copy, so an in-round rerun would otherwise
    compare against the run just before it instead of the prior round.
    Falls back to the working-tree file, then pre-r4 round files."""
    import glob
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    try:
        blob = subprocess.run(
            ["git", "-C", root, "show", "HEAD:BENCH_FULL.json"],
            capture_output=True,
            text=True,
            timeout=10,
        )
        if blob.returncode == 0:
            data = json.loads(blob.stdout)
            if isinstance(data, dict) and "queries" in data:
                return {**data, "file": "BENCH_FULL.json@HEAD"}
    except (OSError, json.JSONDecodeError, subprocess.SubprocessError):
        pass
    full = os.path.join(root, "BENCH_FULL.json")
    try:
        with open(full) as fh:
            data = json.load(fh)
        if isinstance(data, dict) and "queries" in data:
            return {**data, "file": "BENCH_FULL.json"}
    except (OSError, json.JSONDecodeError):
        pass
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    for path in reversed(paths):
        try:
            with open(path) as fh:
                data = json.load(fh)
            parsed = data.get("parsed", data)
            # pre-r4 rounds stored the per-query map in the parsed line;
            # r4+ family rollups are useless for per-query comparison
            if (
                isinstance(parsed, dict)
                and isinstance(parsed.get("queries"), dict)
                and "full" not in parsed
            ):
                return {**parsed, "file": os.path.basename(path)}
        except (OSError, json.JSONDecodeError):
            continue
    return None


if __name__ == "__main__":
    main()
