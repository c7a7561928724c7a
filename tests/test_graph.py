"""PageRank invariants: probability mass conservation + rank permutation."""

from __future__ import annotations


def test_pagerank_mass_and_ranks(spark, sf_dir):
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import (
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    rows = QUERIES["pagerank_nation_trade"](spark, sf_dir).collect()
    n = len(rows)
    assert n == 25
    # every nation has out-edges in the fixtures, so no dangling mass is
    # lost: total mass stays 1 up to the per-term 1e-12 rounding
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 1e-5
    assert sorted(r["rnk"] for r in rows) == list(range(1, n + 1))
    assert all(r["pagerank"] > 0 for r in rows)
