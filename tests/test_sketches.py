"""approx_top_k / HLL / quantiles property tests on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.functions import sketches


def test_approx_top_k_covers_true_head(spark):
    # Zipf-ish: key k appears ~ n/k times
    df = spark.range(1, 200).select(F.col("id").alias("k"), F.sequence(F.lit(1), (F.lit(2000) / F.col("id")).cast("int")).alias("reps"))
    df = df.select(F.explode("reps").alias("_"), "k").select("k")
    approx = {r["item"] for r in sketches.approx_top_k(df, "k", 10).collect()}
    exact = {r["item"] for r in sketches.exact_top_k(df, "k", 5).collect()}
    assert exact <= approx, "approx top-10 must contain the true top-5"


def test_hll_error_bound(spark):
    n = 100_000
    df = spark.range(0, n).withColumnRenamed("id", "k")
    est = sketches.approx_distinct(df, "k", rsd=0.05).head()[0]
    assert abs(est - n) / n <= 0.15, f"HLL estimate {est} too far from {n}"


def test_hll_sketch_merge_pipeline(spark):
    a = spark.range(0, 5000).withColumnRenamed("id", "k")
    b = spark.range(2500, 7500).withColumnRenamed("id", "k")
    union_est = (
        a.agg(F.hll_sketch_agg("k").alias("sk"))
        .union(b.agg(F.hll_sketch_agg("k").alias("sk")))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .head()["est"]
    )
    assert abs(union_est - 7500) / 7500 <= 0.1


def test_quantiles_exact_mode(spark):
    df = spark.range(0, 10001).select(F.col("id").cast("double").alias("v"))
    q = sketches.approx_quantiles(df, "v", [0.0, 0.5, 1.0], relative_error=0.0)
    assert q[0] == 0.0 and q[2] == 10000.0
    assert abs(q[1] - 5000.0) <= 1.0


def test_histogram_mass_conserved(spark, sf_dir):
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    ev = load(spark, sf_dir, "events")
    bins = sketches.histogram(ev, "value", 8)
    total = bins.agg(F.sum("bin_y")).head()[0]
    assert total == ev.count()


def test_hll_inclusion_exclusion_approximate_regime(spark):
    """|A n B| via HLL inclusion-exclusion in the dense (approximate)
    regime: error of the intersection estimate is bounded by the union's
    relative error times |A u B| (~2% at lgK=12), well under 10% of the
    true intersection here."""
    a = spark.range(0, 60_000).select(F.col("id").alias("u"))
    b = spark.range(40_000, 100_000).select(F.col("id").alias("u"))
    row = (
        a.agg(F.hll_sketch_agg("u", F.lit(12)).alias("sa"))
        .crossJoin(b.agg(F.hll_sketch_agg("u", F.lit(12)).alias("sb")))
        .select(
            F.hll_sketch_estimate("sa").alias("ea"),
            F.hll_sketch_estimate("sb").alias("eb"),
            F.hll_sketch_estimate(F.hll_union("sa", "sb")).alias("eu"),
        )
        .collect()[0]
    )
    est = row["ea"] + row["eb"] - row["eu"]
    assert abs(est - 20_000) / 20_000 < 0.10, f"intersection estimate {est} off by >10%"


def test_cms_dyadic_range_bounds(spark):
    """Dyadic range estimates with a deliberately NARROW sketch (so
    collisions actually occur): est >= exact always, and est - exact is
    within the CM 2005 §4.3 bound 2 * levels * eps * N at the sketch
    confidence (asserted with slack: deterministic seed, fixed data)."""
    import numpy as np

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        cms_build_dyadic,
        cms_range_estimate,
        dyadic_decompose,
    )

    levels = 11
    # decomposition invariants on random ranges
    rng = np.random.default_rng(7)
    for _ in range(200):
        lo, hi = sorted(rng.integers(0, 1024, size=2).tolist())
        cover = dyadic_decompose(lo, hi, levels)
        assert len(cover) <= 2 * levels
        covered = sorted(
            x
            for j, p in cover
            for x in range(p << j, ((p + 1) << j))
        )
        assert covered == list(range(lo, hi + 1)), (lo, hi)

    n = 20_000
    vals = rng.integers(0, 1024, size=n)
    df = spark.createDataFrame([(int(v),) for v in vals], "iv LONG")
    eps = 0.01  # width 201 vs 1024 live keys -> real collisions
    sketches = cms_build_dyadic(df, "iv", levels=levels, eps=eps, confidence=0.99, seed=5)
    for lo, hi in [(0, 1023), (10, 17), (100, 900), (512, 513)]:
        exact = int(((vals >= lo) & (vals <= hi)).sum())
        est = cms_range_estimate(sketches, lo, hi)
        assert est >= exact, (lo, hi, est, exact)
        assert est - exact <= 2 * levels * eps * n, (lo, hi, est, exact)


def test_cms_dyadic_quantile_bias_bound(spark):
    """Quantiles from a NARROW dyadic CMS (real collisions): rank
    estimates only OVERestimate, so the binary search can only stop at or
    BEFORE the true quantile, and the returned point's overestimated rank
    still clears the target. Bound: the true rank it is short by is at
    most the range-estimate error 2*levels*eps*N."""
    import math

    import numpy as np

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        cms_build_dyadic,
        cms_range_estimate,
    )

    levels = 11
    rng = np.random.default_rng(11)
    n = 20_000
    vals = np.sort(rng.integers(0, 1024, size=n))
    df = spark.createDataFrame([(int(v),) for v in vals], "iv LONG")
    eps = 0.01
    sketches = cms_build_dyadic(df, "iv", levels=levels, eps=eps, confidence=0.99, seed=5)
    n_est = cms_range_estimate(sketches, 0, (1 << levels) - 1)
    assert n_est >= n
    for p in (0.5, 0.9, 0.99):
        target = math.ceil(p * n_est)
        lo, hi = 0, (1 << levels) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cms_range_estimate(sketches, 0, mid) >= target:
                hi = mid
            else:
                lo = mid + 1
        exact_q = int(vals[min(math.ceil(p * n), n) - 1])
        # overestimated ranks stop the search at or before the exact quantile
        assert lo <= exact_q, (p, lo, exact_q)
        true_rank_at_lo = int((vals <= lo).sum())
        assert target - true_rank_at_lo <= 2 * levels * eps * n + (n_est - n), (
            p, lo, true_rank_at_lo, target,
        )


def test_iblt_recovers_exact_symmetric_difference(spark):
    """IBLT reconciliation: two overlapping key sets with a known
    symmetric difference must peel back EXACTLY — keys and sides."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import iblt

    m, k = 256, 3
    common = list(range(1000, 1400))
    only_a = [7, 13, 99, 4242, 90210]
    only_b = [55_555, 123_456_789]
    a = spark.createDataFrame([(x,) for x in common + only_a], "key long")
    b = spark.createDataFrame([(x,) for x in common + only_b], "key long")
    residual = iblt.iblt_subtract(
        iblt.iblt_table(a, "key", m=m, k=k), iblt.iblt_table(b, "key", m=m, k=k)
    ).collect()
    got = iblt.iblt_peel(residual, m=m, k=k)
    want = sorted([(x, 1) for x in only_a] + [(x, -1) for x in only_b])
    assert got == want


def test_iblt_identical_sets_peel_empty(spark):
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import iblt

    a = spark.createDataFrame([(x,) for x in range(500)], "key long")
    residual = iblt.iblt_subtract(
        iblt.iblt_table(a, "key", m=128), iblt.iblt_table(a, "key", m=128)
    ).collect()
    assert iblt.iblt_peel(residual, m=128) == []


def test_iblt_over_capacity_fails_loudly(spark):
    """A difference far beyond m must raise, not silently truncate."""
    import pytest

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import iblt

    m = 16
    a = spark.createDataFrame([(x,) for x in range(200)], "key long")
    b = spark.createDataFrame([(x,) for x in range(200, 400)], "key long")
    residual = iblt.iblt_subtract(
        iblt.iblt_table(a, "key", m=m), iblt.iblt_table(b, "key", m=m)
    ).collect()
    with pytest.raises(ValueError, match="capacity"):
        iblt.iblt_peel(residual, m=m)
