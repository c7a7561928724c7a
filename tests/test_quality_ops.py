"""Tests for the quality/ops-surface operators: SemDeDup, duplicate-n-gram
coverage, declarative constraint checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.operators import dedup, quality, similarity
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


def test_semdedup_partitions_rows(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    out = similarity.semdedup(emb, cluster_col="label", threshold=0.45)
    rows = out.collect()
    assert len(rows) == emb.count()  # one verdict per input row
    assert {r.vec_id for r in rows} == {r.vec_id for r in emb.select("vec_id").collect()}


def test_semdedup_threshold_extremes(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(100)
    # threshold above max possible cosine: nothing dropped
    all_kept = similarity.semdedup(emb, cluster_col="label", threshold=1.01)
    assert all_kept.filter(~F.col("kept")).count() == 0
    # threshold below min possible cosine: exactly one survivor per cluster,
    # and it is the min id (first-wins rule)
    one_per = similarity.semdedup(emb, cluster_col="label", threshold=-1.01)
    kept = one_per.filter(F.col("kept")).collect()
    mins = {
        r.label: r.m
        for r in emb.groupBy("label").agg(F.min("vec_id").alias("m")).collect()
    }
    assert {r.label: r.vec_id for r in kept} == mins


def test_semdedup_dropped_have_witness(spark, sf_dir):
    """Every dropped id must have a lower-id same-cluster neighbor with
    rounded cosine >= threshold (consistency with the pairwise scorer)."""
    emb = load(spark, sf_dir, "embeddings")
    thr = 0.3  # low enough to actually drop rows on the tiny fixture
    out = similarity.semdedup(emb, cluster_col="label", threshold=thr)
    dropped = {r.vec_id for r in out.filter(~F.col("kept")).collect()}
    if not dropped:  # fixture-dependent; the extremes test covers the rule
        return
    pairs = (
        similarity.cosine_near_dup_pairs(emb, threshold=thr)
        .join(
            emb.select(F.col("vec_id").alias("id_a"), F.col("label").alias("la")),
            "id_a",
        )
        .join(
            emb.select(F.col("vec_id").alias("id_b"), F.col("label").alias("lb")),
            "id_b",
        )
        .filter(F.col("la") == F.col("lb"))
    )
    witnessed = {r.id_b for r in pairs.collect()}
    assert dropped == witnessed


def test_duplicate_ngram_stats_bounds(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = dedup.duplicate_ngram_stats(docs, n=3).collect()
    assert len(out) == docs.count()
    for r in out:
        assert 0 <= r.dup_ngrams <= r.n_ngrams
        if r.n_ngrams > 0:
            assert 0.0 <= r.dup_frac <= 1.0
        else:
            assert r.dup_frac is None


def test_duplicate_ngram_stats_identical_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox jumps"),
            (3, "completely different words here now"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup.duplicate_ngram_stats(df, n=3).collect()}
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    assert out[3].dup_ngrams == 0 and out[3].dup_frac == 0.0


def test_quality_checks_detect_violations(spark):
    df = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 500.0), (2, None, 7.0)],
        ["id", "status", "qty"],
    )
    audit = {
        r.constraint: r
        for r in quality.run_checks(
            df,
            [
                quality.row_count("rc"),
                quality.completeness("status"),
                quality.uniqueness("id"),
                quality.domain("status", ["A"]),
                quality.in_range("qty", 0, 100),
            ],
        ).collect()
    }
    assert audit["rc"].passed and audit["rc"].metric_value == 3.0
    assert not audit["completeness_status"].passed
    assert not audit["uniqueness_id"].passed  # id=2 twice
    assert not audit["domain_status"].passed  # B not allowed
    assert not audit["range_qty"].passed  # 500 out of range
    # and a fully-clean column passes
    clean = {
        r.constraint: r
        for r in quality.run_checks(df, [quality.in_range("qty", 0, 1000)]).collect()
    }
    assert clean["range_qty"].passed


def test_referential_integrity_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], ["k"])
    parent = spark.createDataFrame([(1,), (2,)], ["p"])
    row = quality.referential_integrity(child, "k", parent, "p", "ref").collect()[0]
    assert row.metric_value == 1.0 and not row.passed


def test_duplicate_ngram_stats_matches_bruteforce(spark):
    """Distributed result == per-doc brute force on a seeded corpus."""
    import random

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r.doc_id: (r.n_ngrams, r.dup_ngrams)
        for r in dedup.duplicate_ngram_stats(df, n=3).collect()
    }

    def grams(text):
        ws = [w for w in text.lower().split(" ") if w]
        return [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]

    from collections import defaultdict

    holders = defaultdict(set)
    for i, t in docs:
        for g in grams(t):
            holders[g].add(i)
    for i, t in docs:
        gs = grams(t)
        dup = sum(1 for g in gs if len(holders[g]) >= 2)
        assert got[i] == (len(gs), dup), f"doc {i}"


def test_v_optimal_partition_matches_bruteforce():
    """The DP must be EXACTLY optimal: compare against brute-force
    enumeration of all split placements on small series, including tied
    and skewed inputs."""
    from itertools import combinations

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.quality import (
        v_optimal_partition,
    )

    def brute(freqs, k):
        n = len(freqs)

        def sse(seg):
            s, ss = sum(seg), sum(x * x for x in seg)
            return ss - s * s / len(seg)

        best = None
        for cuts in combinations(range(1, n), k - 1):
            bounds = list(cuts) + [n]
            start, tot = 0, 0.0
            for e in bounds:
                tot += sse(freqs[start:e])
                start = e
            if best is None or tot < best:
                best = tot
        return best

    cases = [
        ([10, 10, 10, 50, 50, 50, 1, 1, 1], 3),
        ([1, 2, 3, 4, 5, 6, 7, 8], 3),
        ([5, 5, 5, 5], 2),
        ([100, 1, 1, 1, 1, 1, 1, 90], 4),
        ([3, 1, 4, 1, 5, 9, 2, 6, 5, 3], 4),
    ]
    for freqs, k in cases:
        bounds, got = v_optimal_partition(freqs, k)
        assert len(bounds) == k and bounds[-1] == len(freqs)
        assert abs(got - brute(freqs, k)) < 1e-9, (freqs, k, got)


def test_v_optimal_beats_or_ties_equal_width(spark, sf_dir):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["voptimal_histogram_stats"](spark, sf_dir).collect()
    assert len(rows) == 8
    assert rows[0]["sse_voptimal"] <= rows[0]["sse_equal_width"] + 1e-9
    assert sum(r["n_docs"] for r in rows) > 0


def test_grouped_cosine_candidates_matches_pair_join(spark):
    """The blocked-GEMM candidate stage must agree with the explicit
    pair-join reference on random vectors: same (id_a, id_b) set above the
    rounded threshold, and the incremental new_col form must emit exactly
    the pairs whose HIGHER id is new."""
    import numpy as np

    rng = np.random.RandomState(7)
    n, d, thr = 120, 16, 0.45
    rows = [
        (int(i), int(i % 4), [float(x) for x in rng.normal(size=d)], bool(i >= 80))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>, is_new boolean"
    )

    def ref_pairs(restrict_new):
        out = set()
        by_label = {}
        for i, lab, v, new in rows:
            by_label.setdefault(lab, []).append((i, np.array(v), new))
        for members in by_label.values():
            for ia, va, _ in members:
                for ib, vb, newb in members:
                    if ia >= ib or (restrict_new and not newb):
                        continue
                    c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                    if round(c, 6) >= thr:
                        out.add((ia, ib))
        return out

    got = {
        (r.id_a, r.id_b)
        for r in similarity.grouped_cosine_candidates(
            df, "label", threshold=thr
        )
        .filter(F.round("cos", 6) >= thr)
        .collect()
    }
    assert got == ref_pairs(restrict_new=False)

    got_new = {
        (r.id_a, r.id_b)
        for r in similarity.grouped_cosine_candidates(
            df, "label", threshold=thr, new_col="is_new"
        )
        .filter(F.round("cos", 6) >= thr)
        .collect()
    }
    assert got_new == ref_pairs(restrict_new=True)
    assert got_new == {(a, b) for a, b in got if b >= 80}


def test_v_optimal_exactness_guard_dispatch():
    """ADVICE r13 #1: the numpy DP is bit-identical to the exact-int scalar
    DP only while the total frequency mass keeps every prefix-sum square
    exact in float64 (total <= 94906265). Above the bound (and on negative
    inputs) v_optimal_partition must dispatch to the exact scalar path; at
    the bound both paths must agree bit-for-bit."""
    import random

    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.quality import (
        _VOPT_EXACT_SUM_BOUND,
        _v_optimal_scalar,
        v_optimal_partition,
    )

    rng = random.Random(1414)
    # Just below the bound: vectorized path runs and must equal the scalar.
    base = [_VOPT_EXACT_SUM_BOUND // 8] * 7 + [rng.randrange(1000)]
    assert sum(base) <= _VOPT_EXACT_SUM_BOUND
    for k in (2, 3, 5):
        assert v_optimal_partition(base, k) == _v_optimal_scalar(base, k)

    # Above the bound: s*s exceeds 2^53; the dispatcher must return the
    # scalar result exactly (the vectorized double-rounding would diverge).
    big = [3_000_000_000, 7, 3_000_000_000, 11, 3_000_000_000, 5, 13, 2]
    assert sum(big) > _VOPT_EXACT_SUM_BOUND
    for k in (2, 3, 4):
        assert v_optimal_partition(big, k) == _v_optimal_scalar(big, k)

    # Scalar path stays exact where float64 squares would round: the SSE of
    # a window whose sum s has s*s > 2^53 must use the exact integer square.
    s = 94906266  # smallest int whose square exceeds 2^53
    freqs = [s, 0]
    bounds, sse = _v_optimal_scalar(freqs, 1)
    exact = (s * s + 0) - (s * s) / 2  # ss - s^2/len with exact int square
    assert sse == exact

    # Negative inputs (not a frequency series, but guard anyway).
    neg = [5, -3, 8, 1]
    for k in (1, 2):
        assert v_optimal_partition(neg, k) == _v_optimal_scalar(neg, k)
