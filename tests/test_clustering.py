"""K-means invariants (operators/clustering.py) + bucketed-join plan shape.

kmeans_embeddings has no SQL oracle (iterative); these properties carry its
correctness claim instead:
- determinism: identical output across runs (hash-min init + decimal sums)
- partition invariance: assignments don't depend on input partitioning
- Lloyd monotonicity: total inertia never increases with more iterations
- completeness: every vector is assigned, cluster ids in [0, k)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.operators.clustering import (
    kmeans_cluster_profile,
    kmeans_fit,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

K = 8


def _profile_rows(spark, sf_dir, n_iter=3):
    emb = load(spark, sf_dir, "embeddings")
    df = kmeans_cluster_profile(emb, "vec_id", "embedding", k=K, n_iter=n_iter)
    return sorted((r["cluster"], r["n_points"], r["inertia"]) for r in df.collect())


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    assert _profile_rows(spark, sf_dir) == _profile_rows(spark, sf_dir)


def test_kmeans_partition_invariant(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    base = sorted(
        (r["cluster"], r["n_points"], r["inertia"])
        for r in kmeans_cluster_profile(emb, k=K, n_iter=2).collect()
    )
    shuffled = sorted(
        (r["cluster"], r["n_points"], r["inertia"])
        for r in kmeans_cluster_profile(emb.repartition(7), k=K, n_iter=2).collect()
    )
    assert base == shuffled


def test_kmeans_inertia_monotone_nonincreasing(spark, sf_dir):
    totals = []
    for it in (1, 3, 5):
        rows = _profile_rows(spark, sf_dir, n_iter=it)
        totals.append(sum(r[2] for r in rows))
    # exact Lloyd never increases inertia; allow float slack from the
    # deterministic per-term rounding
    assert totals[1] <= totals[0] + 1e-3
    assert totals[2] <= totals[1] + 1e-3


def test_kmeans_assignment_complete(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    _, assigned = kmeans_fit(emb, k=K, n_iter=1)
    rows = assigned.groupBy("cluster").count().collect()
    assert sum(r["count"] for r in rows) == n
    assert all(0 <= r["cluster"] < K for r in rows)
    assert assigned.select("vec_id").distinct().count() == n


def test_bucketed_join_no_shuffle_on_join_key(spark, sf_dir):
    """The bucketed layout must remove the join-key exchange entirely."""
    import __spark_entry__ as entrymod

    # at fixture scale Catalyst would broadcast the small side (also fine);
    # disable broadcast to surface the bucketed sort-merge path under test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = entrymod.queries()["bucketed_join_agg"](spark, sf_dir)
        df.collect()
        # AQE finalizes per-execution: read the plan from the SAME DataFrame
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Bucketed: true" in plan
    assert "hashpartitioning(c_custkey" not in plan, "join-side exchange present"
    assert "hashpartitioning(o_custkey" not in plan, "join-side exchange present"


def test_lightweight_coreset_unbiased_and_competent(spark, sf_dir):
    """Lightweight-coreset guarantees on the fixture embeddings:
    (1) unbiasedness — the total coreset weight estimates n (within a
    generous sampling tolerance) and is deterministic across builds;
    (2) cost competence — for the CORESET-trained centroids, the
    weighted coreset inertia estimates the full-data inertia within a
    modest factor (the paper's eps at this m is small; we assert 35%)."""
    import __spark_entry__ as entrymod
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators.clustering import (
        lightweight_coreset,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    core = lightweight_coreset(emb, m=128).collect()
    core2 = lightweight_coreset(emb, m=128).collect()
    assert [r["cid"] for r in core] == [r["cid"] for r in core2], "deterministic"
    w_tot = sum(r["w"] for r in core)
    assert 0.6 * n <= w_tot <= 1.4 * n, (w_tot, n)
    assert len(core) <= 3 * 128, "expected-size bound blown"

    prof = entrymod.queries()["kmeans_coreset_fit"](spark, sf_dir).collect()
    full = sum(r["full_inertia"] for r in prof)
    est = sum(r["coreset_inertia"] for r in prof)
    assert full > 0 and est > 0
    assert abs(est - full) / full <= 0.35, (est, full)
    # weighted sizes estimate full sizes in total
    assert abs(sum(r["coreset_weight"] for r in prof) - n) / n <= 0.4
