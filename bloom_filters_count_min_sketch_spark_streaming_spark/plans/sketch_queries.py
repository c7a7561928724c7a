"""Probabilistic-operator queries (SURVEY §2.A — the reference's core surface).

The reference's identity is: maintain Bloom filter + Count-Min Sketch over a
stream, answer membership / frequency / heavy-hitter queries, and report
approximate vs exact. These queries exercise exactly that surface on the
fixture tables, each with a DuckDB oracle where the result is exactly
SQL-expressible.

Determinism notes (the correctness gate hashes values):
- every sketch gets an explicit seed;
- CMS width (eps=1e-4 -> 20000 cells/row) vastly exceeds fixture key
  cardinality, so estimates equal exact counts — that makes the *sketch*
  queries oracle-checkable while property tests (tests/test_sketches.py)
  cover the genuinely-approximate regime;
- Bloom fpp is set so low that the expected false-positive count over the
  probe range is ~1e-6 — the membership output equals the exact semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.functions import bloom, cms, sketches
from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

SEED = 42


def sketch_table(
    df: DataFrame,
    build_expr,
    *,
    day_expr=None,
    at_rest_name: str | None = None,
    sf_dir: str | None = None,
) -> DataFrame:
    """Shared per-day BUILD stage of the mergeable-sketch-table family
    (CMS / HLL / top-k / decayed CMS / Bloom / ...): one sketch row per
    ingest day via a distributed aggregate — kilobyte rows, O(days) table
    size regardless of data volume. Returns (day, sketch).

    With ``at_rest_name``, the table is written to a /tmp parquet keyed on
    (name, sf) and read BACK, so the caller's merge stage provably
    consumes the persisted bytes, not a live plan — the incremental-ingest
    architecture at 100 TB: each new partition appends one sketch row and
    global answers merge the table instead of re-reading raw history.
    The write is intentionally per-call (building the table IS part of
    the measured query); only the merge strategy differs per sketch type
    and stays with the caller.
    """
    import os
    import tempfile

    day = day_expr if day_expr is not None else F.to_date("ts")
    per_day = df.groupBy(day.alias("day")).agg(build_expr.alias("sketch"))
    if at_rest_name is None:
        return per_day
    out = os.path.join(
        tempfile.gettempdir(),
        f"bfcms_sktab_{at_rest_name}_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    per_day.write.mode("overwrite").parquet(out)
    return df.sparkSession.read.parquet(out)


def bottom_k_partials(df: DataFrame, part_cols, k: int, order_cols) -> DataFrame:
    """Shared BUILD stage of the min-wise mergeable family (bottom-k
    sample / KMV tables): keep each partition's k smallest rows by the
    deterministic hash order — O(k) state per partition, and the global
    bottom-k is the bottom-k of the partials (min-wise union is
    associative/commutative, so re-applying this over the union IS the
    merge)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


@query(
    "heavy_hitters_exact",
    oracle="""
    SELECT event_type AS item, COUNT(*) AS cnt
    FROM events GROUP BY event_type
    ORDER BY cnt DESC, item LIMIT 3
    """,
)
def heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k heavy hitters (plans as TakeOrderedAndProject, no full sort)."""
    return sketches.exact_top_k(load(spark, sf_dir, "events"), "event_type", 3)


@query(
    "heavy_hitters_approx",
    oracle="""
    SELECT event_type AS item, COUNT(*) AS est_count
    FROM events GROUP BY event_type
    ORDER BY est_count DESC, item LIMIT 3
    """,
)
def heavy_hitters_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k sketch (Catalyst ApproxTopK aggregate). With 5 distinct
    keys the sketch is exact, so the exact top-k is a valid oracle; the
    approximate regime is covered by property tests."""
    return sketches.approx_top_k(load(spark, sf_dir, "events"), "event_type", 3)


@query(
    "cms_event_type_freq",
    oracle="""
    SELECT event_type, COUNT(*) AS exact_cnt, COUNT(*) AS cms_est, 0 AS abs_err
    FROM events GROUP BY event_type
    """,
)
def cms_event_type_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch build + per-key point query vs exact counts — the
    reference's headline exact-vs-approx report. eps=1e-4 makes the sketch
    collision-free at fixture cardinality (est == exact, abs_err == 0)."""
    ev = load(spark, sf_dir, "events")
    rep = cms.exact_vs_approx(ev, "event_type", eps=0.0001, confidence=0.999, seed=SEED)
    return rep.select("event_type", "exact_cnt", "cms_est", "abs_err")


@query(
    "bloom_membership",
    oracle="""
    SELECT t.k AS key
    FROM range(0, 3000) t(k)
    WHERE t.k IN (SELECT o_custkey FROM orders)
    ORDER BY key
    """,
)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter membership: build over orders.o_custkey (JVM
    treeAggregate), probe a key range executor-side (numpy Murmur3).
    fpp=1e-9 -> expected false positives over 3000 probes ~ 3e-6 ~ 0,
    so the exact IN-subquery is a valid oracle; the approximate regime is
    covered by property tests."""
    orders = load(spark, sf_dir, "orders")
    bloom_bytes = bloom.bloom_build(orders, "o_custkey", expected_items=200_000, fpp=1e-9)
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    return (
        bloom.bloom_might_contain(probe, "key", bloom_bytes)
        .filter("might_contain")
        .select("key")
    )


@query(
    "hll_distinct_event_types",
    oracle="SELECT COUNT(DISTINCT event_type) AS approx_distinct FROM events",
)
def hll_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct; exact at trivial cardinality (5)."""
    ev = load(spark, sf_dir, "events")
    return sketches.approx_distinct(ev, "event_type", rsd=0.01).select(
        F.col("approx_distinct").cast("long").alias("approx_distinct")
    )


@query(
    "hll_sketch_users",
    oracle="SELECT COUNT(DISTINCT user_id) AS hll_estimate FROM events",
)
def hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL: build sketch + estimate. Exact in sparse mode at
    the correctness-gate cardinality (150 users at sf0.01); at sf0.1's
    1500 users the estimate is 1499 (0.07% error) — the expected
    approximate regime, covered by property tests rather than this oracle."""
    ev = load(spark, sf_dir, "events")
    return sketches.hll_estimate(ev, "user_id")


@query(
    "freq_items_event_types",
    oracle="SELECT DISTINCT event_type AS item FROM events",
)
def freq_items_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries frequent items at support 0.05; every fixture key clears
    the support bar, so the distinct set is an exact oracle."""
    ev = load(spark, sf_dir, "events")
    arr = sketches.freq_items(ev, ["event_type"], support=0.05)
    return arr.select(F.explode("event_type_freqItems").alias("item"))


@query("histogram_event_value", witness="histogram_numeric_saturated_exact")
def histogram_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric histogram sketch (no SQL-exact oracle: bin placement is
    algorithm-specific) — rows-only check."""
    ev = load(spark, sf_dir, "events")
    return sketches.histogram(ev, "value", 16)


@query(
    "histogram_numeric_saturated_exact",
    oracle="""
    -- histogram_numeric exactness witness: with nbins >= |distinct
    -- values| the NAHC centroid-merge never fires, so the sketch
    -- degenerates to exact (value, count) pairs REGARDLESS of partition
    -- merge order — the saturated regime pins Spark's histogram_numeric
    -- aggregate (partial build + merge + finalize) under the value hash,
    -- the same trick the LSH/IVF/RP-tree witnesses use (full-coverage
    -- parameters => approximate operator must equal the exact twin).
    -- Saturation is guaranteed BY CONSTRUCTION: the Spark side sizes
    -- nbins to max(32, countDistinct(bin)) first.
    SELECT CAST(floor(value / 50) AS DOUBLE) AS bin_x,
           CAST(COUNT(*) AS BIGINT) AS bin_y
    FROM events GROUP BY 1
    """,
)
def histogram_numeric_saturated_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_numeric witness in the saturated regime: feeding the
    sketch a column with fewer distinct values than bins means no centroid
    ever merges, so (bin_x, bin_y) must equal the exact GROUP BY — the
    real aggregate (JVM partials, tree merge) is hash-checked; the
    data-dependent regime stays covered by histogram_event_value's
    rows-only check + the exact twin histogram_fixed_bins.

    nbins is derived as max(32, countDistinct) — one O(1)-row scalar
    pre-pass — so saturation can't silently break if a larger SF widens
    the value domain past a fixed bin count (9 distinct bins at sf0.01,
    but nothing pins that); the witness stays exact at ANY data scale."""
    ev = load(spark, sf_dir, "events").select(
        (F.floor(F.col("value") / 50)).cast("double").alias("binv")
    )
    nd = int(ev.agg(F.countDistinct("binv").alias("nd")).head()["nd"])
    return sketches.histogram(ev, "binv", max(32, nd)).select(
        F.col("bin_x").cast("double").alias("bin_x"),
        F.col("bin_y").cast("long").alias("bin_y"),
    )


@query(
    "approx_quantiles_value",
    oracle="""
    SELECT 0.25 AS prob, quantile_disc(value, 0.25) AS quantile FROM events
    UNION ALL
    SELECT 0.5, quantile_disc(value, 0.5) FROM events
    UNION ALL
    SELECT 0.75, quantile_disc(value, 0.75) FROM events
    """,
)
def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantiles at relativeError=0 (exact mode) — matches
    discrete quantiles; approximate regime covered by property tests."""
    ev = load(spark, sf_dir, "events")
    probs = [0.25, 0.5, 0.75]
    vals = sketches.approx_quantiles(ev, "value", probs, relative_error=0.0)
    return spark.createDataFrame(
        [(p, v) for p, v in zip(probs, vals)], "prob double, quantile double"
    )


@query(
    "histogram_fixed_bins",
    oracle="""
    -- exact twin of the histogram_numeric sketch: fixed width-50 bins
    -- (bin edges at representable multiples, so floor(value/50) is
    -- engine-identical); value carries 2 decimals -> DECIMAL-exact sums
    SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-width histogram (the deterministic companion to the
    histogram_numeric sketch): one hash aggregation with map-side combine,
    bin id computed JVM-side."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.floor(F.col("value") / 50).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


@query(
    "bloom_prefilter_join_counts",
    oracle="""
    -- the bloom gate is a superset filter (zero false negatives), so the
    -- exact join behind it returns exactly the plain join's rows
    SELECT o_orderpriority, COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def bloom_prefilter_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated join (A1/A2 applied to B6): lineitem rows pass a
    kilobyte Bloom filter of the selective order keys before the shuffle;
    the exact join then yields precisely the ungated join's result."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        bloom_prefilter_join,
    )

    li = load(spark, sf_dir, "lineitem")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = bloom_prefilter_join(li, urgent, "l_orderkey", "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines")
    )


@query(
    "cms_join_size_estimate",
    oracle="""
    -- the Spark side computes the CMS inner-product estimate and asserts
    -- the CM-2005 guarantee as data: exact <= est <= exact + eps*|A|*|B|
    -- (the bound holds with prob >= confidence; depth 10 here -> the
    -- failure probability over one fixed fixture is ~1e-3 and the fixture
    -- is deterministic, verified at sf0.001/0.01/0.1)
    SELECT CAST(COUNT(*) AS BIGINT) AS exact_size, TRUE AS within_bound
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two CMS sketches (Cormode &
    Muthukrishnan 2005 §4.2): est(|A ⋈ B|) = min_i dot(rowA_i, rowB_i).

    The 100 TB use: size |fact ⋈ fact| BEFORE running it, from two
    kilobyte-scale sketches built in one distributed aggregate each — a
    planner-statistics primitive, not a data pass. Output is the exact size
    plus the bound assertion so the oracle stays SQL-expressible; the
    approximate regime is property-tested (tests/test_cms.py).
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    eps, conf = 0.0001, 0.999
    sk_a = cms.CountMinSketchTable.from_bytes(
        cms.cms_build(li, "l_orderkey", eps=eps, confidence=conf, seed=SEED)
    )
    sk_b = cms.CountMinSketchTable.from_bytes(
        cms.cms_build(orders, "o_orderkey", eps=eps, confidence=conf, seed=SEED)
    )
    est = sk_a.inner_product(sk_b)
    exact = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).count()
    bound = exact + eps * sk_a.total_count * sk_b.total_count
    return spark.createDataFrame(
        [(exact, bool(exact <= est <= bound))],
        "exact_size bigint, within_bound boolean",
    )


@query(
    "bloom_union_membership",
    oracle="""
    -- bitwise-OR of two Bloom filters == filter of the union set (JVM
    -- mergeInPlace semantics); fpp 1e-9 over 3000 probes -> expected false
    -- positives ~3e-6, so the exact IN over the union is a valid oracle
    SELECT t.k AS key
    FROM range(0, 3000) t(k)
    WHERE t.k IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
       OR t.k IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
    ORDER BY key
    """,
)
def bloom_union_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom set algebra (A1/A2 extended): build one filter per order-
    priority slice, OR-merge them (a commutative monoid — the same shape
    that lets per-partition filters merge treewise at 100 TB), probe a key
    range. Intersect is property-tested (FPP not bounded by construction)."""
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    high = orders.filter(F.col("o_orderpriority") == "2-HIGH")
    sk_u = bloom.BloomFilterSketch.from_bytes(
        bloom.bloom_build(urgent, "o_custkey", expected_items=200_000, fpp=1e-9)
    )
    sk_h = bloom.BloomFilterSketch.from_bytes(
        bloom.bloom_build(high, "o_custkey", expected_items=200_000, fpp=1e-9)
    )
    merged = sk_u.union(sk_h)
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    return (
        bloom.bloom_might_contain(probe, "key", merged.to_bytes())
        .filter("might_contain")
        .select("key")
    )


@query(
    "counting_bloom_delete_membership",
    oracle="""
    -- Counting Bloom filter (Fan et al. 2000): insert every o_custkey
    -- occurrence, DELETE every occurrence belonging to an 'F'-status
    -- order; remaining membership == "has at least one non-F order".
    -- Deletes ⊆ inserts by construction -> zero false negatives.
    -- Sizing: expected_items=20k bounds DISTINCT custkeys at every
    -- fixture sf (15k at sf0.1); occupancy ≈ 0.41 worst case -> FP per
    -- probe ≈ 0.41^20 ≈ 2e-8, ~6e-5 over 3000 probes, so the exact IN
    -- over the surviving multiset is a valid oracle (fixed seed,
    -- verified FP-free against the sf0.01 and sf0.1 fixtures).
    SELECT t.k AS key
    FROM range(0, 3000) t(k)
    WHERE t.k IN (SELECT o_custkey FROM orders WHERE o_orderstatus <> 'F')
    ORDER BY key
    """,
)
def counting_bloom_delete_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletable approximate membership — the one Bloom operation the
    plain bit-array filter cannot support. Counters form an abelian GROUP
    (not just a monoid), so inserts and deletes partial-aggregate map-side
    in any order; the build shuffles sparse (position, ±1) deltas, never
    dense arrays (functions/bloom.py:counting_bloom_build). Deleting the
    'F'-status occurrences leaves membership == customers with a live
    order — the classic cache-invalidation / retraction use case.
    expected_items is sized to the DISTINCT key cardinality (counting
    filters re-hit the same k positions per repeated key), which keeps
    the sparse-delta shuffle and the driver-held counter array
    O(distinct keys × k), not O(rows)."""
    orders = load(spark, sf_dir, "orders")
    sketch = bloom.counting_bloom_build(
        orders,
        "o_custkey",
        expected_items=20_000,
        fpp=1e-6,
        delete_df=orders.filter(F.col("o_orderstatus") == "F"),
        delete_col="o_custkey",
        seed=SEED,
    )
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    return (
        bloom.counting_bloom_might_contain(probe, "key", sketch)
        .filter("might_contain")
        .select("key")
    )


@query(
    "cms_sketch_table_merge",
    oracle="""
    SELECT event_type, COUNT(*) AS exact_cnt, COUNT(*) AS merged_est
    FROM events GROUP BY event_type
    """,
)
def cms_sketch_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted sketch-table architecture (A5 at rest): one CMS per
    event-date partition via the distributed count_min_sketch aggregate,
    written to a parquet sketch table, read back and merged (CMS is a
    commutative monoid), then point-queried.

    This is the incremental-ingest pattern at 100 TB: each new partition
    appends one kilobyte-scale sketch row; global frequency answers merge
    the sketch table instead of re-reading raw history. The merge collect
    is bounded by #partitions x sketch size, never by data volume.
    """
    ev = load(spark, sf_dir, "events")
    # Narrower per-partition sketches than the global-build queries: the
    # sketch table stores one sketch PER DAY, so width is a per-row storage
    # cost (eps=1e-3 -> ~80 KB/row vs ~1.1 MB at 1e-4). Still orders of
    # magnitude above fixture key cardinality -> estimates stay exact.
    table = sketch_table(
        ev,
        cms.cms_agg(ev, "event_type", eps=0.001, confidence=0.99, seed=SEED),
        at_rest_name="cms",
        sf_dir=sf_dir,
    )
    merged = None
    for row in table.select("sketch").collect():
        t = cms.CountMinSketchTable.from_bytes(bytes(row["sketch"]))
        merged = t if merged is None else merged.merge(t)

    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_cnt"))
    probe = cms.cms_estimate_from_table(exact, "event_type", merged, out="merged_est")
    return probe.select("event_type", "exact_cnt", "merged_est")


@query(
    "hll_sketch_table_merge",
    oracle="""
    -- sparse-mode-exact regime (150 users << 2^10 at the sf0.01 gate), so
    -- the exact COUNT(DISTINCT) is a valid oracle; the dense approximate
    -- regime is property-tested
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_merged
    FROM events
    """,
)
def hll_sketch_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted HLL sketch table (A8 at rest, the cardinality twin of
    cms_sketch_table_merge): one DataSketches HLL per event-date written to
    parquet, re-read and merged with the hll_union_agg Catalyst aggregate
    — entirely JVM-side, no driver merge loop. Incremental ingest appends
    kilobyte sketch rows; global distinct-user answers union the sketch
    table instead of re-reading raw history."""
    ev = load(spark, sf_dir, "events")
    table = sketch_table(
        ev, F.hll_sketch_agg("user_id", F.lit(12)), at_rest_name="hll", sf_dir=sf_dir
    )
    return table.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("long")
        .alias("n_users_merged")
    )


@query(
    "hll_intersection_estimate",
    oracle="""
    -- inclusion-exclusion over HLL sketches: |A n B| = |A| + |B| - |A u B|.
    -- All three sketches are in the sparse-exact regime at the sf0.01 gate
    -- (<= 150 users), so the identity is exact and the SQL intersection is
    -- a valid oracle; the approximate regime (error grows with the union)
    -- is property-tested.
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'click')
                AS BIGINT) AS n_click,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase')
                AS BIGINT) AS n_purchase,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events
                 WHERE event_type IN ('click', 'purchase')
                   AND user_id IN (SELECT user_id FROM events WHERE event_type = 'click')
                   AND user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase'))
                AS BIGINT) AS n_both
    """,
)
def hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection cardinality from mergeable HLL sketches via
    inclusion-exclusion (HLL unions natively; intersection = |A| + |B| -
    |A u B|). The audience-overlap primitive: per-segment sketches are
    kilobytes at rest, any pairwise overlap answerable without re-reading
    events. One pass builds both sketches; the union is sketch-level."""
    ev = load(spark, sf_dir, "events")
    row = ev.agg(
        F.hll_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id")), F.lit(12)
        ).alias("sk_click"),
        F.hll_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id")), F.lit(12)
        ).alias("sk_purchase"),
    ).select(
        F.hll_sketch_estimate("sk_click").alias("a"),
        F.hll_sketch_estimate("sk_purchase").alias("b"),
        F.hll_sketch_estimate(F.hll_union("sk_click", "sk_purchase")).alias("u"),
    )
    return row.select(
        F.col("a").cast("long").alias("n_click"),
        F.col("b").cast("long").alias("n_purchase"),
        (F.col("a") + F.col("b") - F.col("u")).cast("long").alias("n_both"),
    )


@query(
    "cms_dyadic_range_counts",
    oracle="""
    -- Dyadic-range CMS (CM 2005 §4.3): the sketch hierarchy is wide enough
    -- (eps 1e-4 -> 20001 cells/level vs ~1000 live keys) that every range
    -- estimate equals the exact count at this scale; the estimate's
    -- overestimate bound is property-tested separately with narrow
    -- sketches (tests/test_sketches.py).
    SELECT v.lo AS range_lo, v.hi AS range_hi,
           CAST(COUNT(*) FILTER (WHERE CAST(FLOOR(e.value) AS BIGINT)
                                 BETWEEN v.lo AND v.hi) AS BIGINT) AS exact_cnt,
           CAST(COUNT(*) FILTER (WHERE CAST(FLOOR(e.value) AS BIGINT)
                                 BETWEEN v.lo AND v.hi) AS BIGINT) AS cms_est
    FROM events e
    CROSS JOIN (VALUES (0, 99), (100, 299), (300, 749), (750, 1023))
      AS v(lo, hi)
    GROUP BY v.lo, v.hi
    """,
)
def cms_dyadic_range_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-count queries from a dyadic CMS hierarchy (A3 extension;
    Cormode & Muthukrishnan 2005 §4.3): 11 sketches built in ONE scan
    (level j keys v >> j), a range [a,b] answered by summing point
    queries over its <= 2*11-interval dyadic cover. The hierarchy is
    O(levels * sketch_bytes) — kilobytes regardless of N — and the range
    answer touches no data at all: the reference's sketch-resident
    architecture extended from point to range queries."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        cms_build_dyadic,
        cms_range_estimate,
    )

    ev = load(spark, sf_dir, "events").select(
        F.floor("value").cast("long").alias("iv")
    )
    sketches = cms_build_dyadic(ev, "iv", levels=11, eps=0.0001, confidence=0.99, seed=77)
    ranges = [(0, 99), (100, 299), (300, 749), (750, 1023)]
    exact = ev.agg(
        *[
            F.sum(F.when(F.col("iv").between(lo, hi), 1).otherwise(0))
            .cast("long")
            .alias(f"e_{lo}_{hi}")
            for lo, hi in ranges
        ]
    ).head()
    rows = [
        (lo, hi, int(exact[f"e_{lo}_{hi}"]), cms_range_estimate(sketches, lo, hi))
        for lo, hi in ranges
    ]
    return spark.createDataFrame(
        rows, "range_lo INT, range_hi INT, exact_cnt BIGINT, cms_est BIGINT"
    )


@query(
    "cms_entropy_estimate",
    oracle="""
    -- exact twin of Shannon entropy from CMS point queries: H =
    -- Σ (c/N) log2(N/c) over user activity counts. Terms ROUND at 10
    -- then DECIMAL-sum (log2 can differ in the last ulp across engines;
    -- the MI/chi-square queries use the same discipline).
    WITH c AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
         n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           ROUND(CAST(SUM(CAST(ROUND((c * 1.0 / n.n) * log2(n.n * 1.0 / c), 10)
                               AS DECIMAL(28,10))) AS DOUBLE), 6) AS entropy_bits
    FROM c CROSS JOIN n
    """,
)
def cms_entropy_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the user-activity distribution computed FROM THE
    SKETCH: counts come from CMS point queries over the key set (exact in
    the collision-free regime), N from their sum — a distribution
    functional (like the F2/heavy-change estimates) answered without
    re-scanning data once the sketch exists. The per-term arithmetic runs
    as JVM expressions over the kilobyte-sized (key, count) estimate
    table so the log2/rounding behavior matches the oracle's engine
    discipline exactly."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        CountMinSketchTable,
    )

    ev = load(spark, sf_dir, "events")
    row = ev.agg(
        F.count_min_sketch(
            F.col("user_id"), F.lit(0.0001), F.lit(0.999), F.lit(SEED)
        ).alias("sk")
    ).head()
    sk = CountMinSketchTable.from_bytes(bytes(row["sk"]))

    import numpy as np

    users = np.array(
        sorted(r[0] for r in ev.select("user_id").distinct().collect()),
        dtype=np.int64,
    )
    est = sk.estimate_longs(users)
    n = int(est.sum())
    cnts = spark.createDataFrame(
        [(int(c),) for c in est], "c LONG"
    )
    t = F.round(
        (F.col("c") * 1.0 / F.lit(float(n)))
        * F.log2(F.lit(float(n)) * 1.0 / F.col("c")),
        10,
    )
    return cnts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.round(
            F.sum(t.cast("decimal(28,10)")).cast("double"), 6
        ).alias("entropy_bits"),
    )


@query(
    "sketch_capacity_planner",
    oracle="""
    -- closed-form twin of the sketch capacity planner: standard sizing
    -- formulas (Bloom 1970; Cormode-Muthukrishnan 2005), pure math over
    -- a literal config table. m = ceil(-n ln(fpp)/ln(2)^2) rounded up to
    -- 64-bit words, k = round(m/n ln 2); CMS w = ceil(2/eps),
    -- d = ceil(ln(1/delta)). bytes_total: m/8 for Bloom, w*d*8 for CMS.
    WITH cfg AS (
      SELECT * FROM (VALUES
        ('bloom', 1000000.0, 0.01, NULL, NULL),
        ('bloom', 1000000.0, 0.000001, NULL, NULL),
        ('bloom', 100000000.0, 0.01, NULL, NULL),
        ('cms', NULL, NULL, 0.001, 0.01),
        ('cms', NULL, NULL, 0.0001, 0.001),
        ('cms', NULL, NULL, 0.00001, 0.001)
      ) AS t(kind, n_items, fpp, eps, delta)
    )
    SELECT kind, n_items, fpp, eps, delta,
           CASE WHEN kind = 'bloom'
                THEN ((CAST(CEIL(-n_items * ln(fpp) / (ln(2) * ln(2))) AS BIGINT)
                       + 63) // 64) * 64 // 8
                ELSE CAST(CEIL(2.0 / eps) AS BIGINT)
                     * CAST(CEIL(ln(1.0 / delta)) AS BIGINT) * 8
           END AS bytes_total,
           CASE WHEN kind = 'bloom'
                THEN CAST(ROUND((((CAST(CEIL(-n_items * ln(fpp) / (ln(2) * ln(2)))
                                   AS BIGINT) + 63) // 64) * 64)
                                / n_items * ln(2), 0) AS BIGINT)
                ELSE CAST(CEIL(ln(1.0 / delta)) AS BIGINT)
           END AS n_hashes
    FROM cfg
    """,
)
def sketch_capacity_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity planning BEFORE any data moves — the sizing table an
    operator computes when deploying sketches against 100 TB: Bloom
    (bits from n/fpp, word-aligned, optimal k) and CMS (width from eps,
    depth from delta) memory footprints as one Catalyst expression sweep
    over a literal config table. The same formulas
    functions/bloom.py:from_params and functions/cms.py use, so this
    query documents exactly what the engine will allocate."""
    cfg = spark.createDataFrame(
        [
            ("bloom", 1_000_000.0, 0.01, None, None),
            ("bloom", 1_000_000.0, 0.000001, None, None),
            ("bloom", 100_000_000.0, 0.01, None, None),
            ("cms", None, None, 0.001, 0.01),
            ("cms", None, None, 0.0001, 0.001),
            ("cms", None, None, 0.00001, 0.001),
        ],
        "kind STRING, n_items DOUBLE, fpp DOUBLE, eps DOUBLE, delta DOUBLE",
    )
    ln2sq = F.log(F.lit(2.0)) * F.log(F.lit(2.0))
    m_words = (
        (F.ceil(-F.col("n_items") * F.log("fpp") / ln2sq).cast("long") + 63) / 64
    ).cast("long") * 64
    cms_w = F.ceil(2.0 / F.col("eps")).cast("long")
    cms_d = F.ceil(F.log(1.0 / F.col("delta"))).cast("long")
    return cfg.select(
        "kind", "n_items", "fpp", "eps", "delta",
        F.when(F.col("kind") == "bloom", (m_words / 8).cast("long"))
        .otherwise(cms_w * cms_d * 8)
        .alias("bytes_total"),
        F.when(
            F.col("kind") == "bloom",
            F.round(m_words / F.col("n_items") * F.log(F.lit(2.0)), 0).cast("long"),
        )
        .otherwise(cms_d)
        .alias("n_hashes"),
    )


@query(
    "sample_sketch_table_merge",
    oracle="""
    -- exact twin of the mergeable sample table: the global 20-document
    -- deterministic sample is the 20 smallest md5 hashes, which equals
    -- the 20 smallest of the per-day 20-smallest partials.
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || '|s'),
                                   doc_id) AS BIGINT) AS rnk
    FROM documents
    QUALIFY rnk <= 20 ORDER BY rnk
    """,
)
def sample_sketch_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform sampling as a MERGEABLE sketch table (bottom-k / hash-min,
    the sampling analogue of the CMS/HLL/KMV/top-k tables): each
    partition of the corpus keeps only its k smallest md5-hash documents
    — O(k) per partition — and the global k-sample is the k smallest of
    the partials (min-wise union is associative/commutative). The sample
    is DETERMINISTIC and engine-portable (md5, not a seeded RNG), stable
    under re-partitioning, and incrementally maintainable: new data can
    only displace larger hashes. Here the partials are per ingest day;
    at 100 TB they are per file/partition and the merge is a k-row
    tree-reduce."""
    # documents carry no ingest date; doc_id % 7 stands in for the
    # per-ingest-batch partial boundary (any partitioning works — that is
    # the point of a min-wise mergeable sample)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 7).alias("day"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|s"))).alias("hk"),
    )
    partials = bottom_k_partials(docs, ["day"], 20, ["hk", "doc_id"])
    w_all = Window.orderBy("hk", "doc_id")
    return (
        partials.withColumn("rnk", F.row_number().over(w_all).cast("long"))
        .filter(F.col("rnk") <= 20)
        .select("doc_id", "rnk")
        .orderBy("rnk")
    )


@query(
    "topk_sketch_table_merge",
    oracle="""
    -- exact twin of the mergeable top-k sketch table: k=10 exceeds the
    -- fixture's 5 distinct event types, so every per-day sketch holds
    -- exact counts and combine+estimate returns exact global counts.
    SELECT event_type AS item, COUNT(*) AS est_count,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type)
                AS BIGINT) AS rnk
    FROM events GROUP BY event_type
    QUALIFY rnk <= 5 ORDER BY rnk
    """,
)
def topk_sketch_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A6 heavy-hitter operator in sketch-TABLE form (Spark 4.1's
    approx_top_k_accumulate / _combine / _estimate): one top-k sketch row
    per day at rest, combined and estimated at query time — the same
    append-only incremental-ingest architecture as the CMS/HLL/KMV
    sketch tables, now for frequent items. The estimate's own tie order
    is engine-internal, so the output re-ranks with a total (count desc,
    item) tie-break."""
    ev = load(spark, sf_dir, "events")
    table = sketch_table(ev, F.expr("approx_top_k_accumulate(event_type, 10)"))
    flat = table.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(sketch), 5)").alias("top")
    ).select(F.inline("top"))
    w = Window.orderBy(F.desc("count"), "item")
    return (
        flat.select(
            "item",
            F.col("count").alias("est_count"),
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .orderBy("rnk")
    )


@query(
    "misra_gries_table_merge",
    oracle="""
    -- Misra-Gries summaries as a MERGEABLE sketch table (Agarwal et al.,
    -- "Mergeable Summaries", PODS 2012): the k-counter MG summary of a
    -- multiset is its top-k counts minus the (k+1)-th count (an
    -- order-independent construction), and two summaries merge by adding
    -- counters then re-reducing the same way. k=3 < 5 distinct types, so
    -- the reduction genuinely fires; every step is integer arithmetic on
    -- exact counts -> the whole algebra is hash-checked cross-engine.
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT day, event_type, c,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY c DESC, event_type) AS rnk
      FROM c
    ), off AS (
      SELECT day, COALESCE(MAX(CASE WHEN rnk = 4 THEN c END), 0) AS o
      FROM r GROUP BY day
    ), p AS (
      SELECT r.event_type, r.c - off.o AS v
      FROM r JOIN off USING (day)
      WHERE r.rnk <= 3 AND r.c - off.o > 0
    ), m AS (
      SELECT event_type, CAST(SUM(v) AS BIGINT) AS mv FROM p GROUP BY event_type
    ), rm AS (
      SELECT event_type, mv,
             ROW_NUMBER() OVER (ORDER BY mv DESC, event_type) AS rnk
      FROM m
    ), om AS (
      SELECT COALESCE(MAX(CASE WHEN rnk = 4 THEN mv END), 0) AS o FROM rm
    ), ex AS (
      SELECT event_type, COUNT(*) AS exact_cnt FROM events GROUP BY event_type
    )
    SELECT rm.event_type, CAST(rm.mv - om.o AS BIGINT) AS mg_bound,
           ex.exact_cnt, CAST(rm.rnk AS BIGINT) AS rnk
    FROM rm CROSS JOIN om JOIN ex USING (event_type)
    WHERE rm.rnk <= 3 AND rm.mv - om.o > 0
    ORDER BY rnk
    """,
)
def misra_gries_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters AT REST (the deterministic counter-based
    sibling of the CMS/top-k sketch tables): one k=3-counter MG summary
    per ingest day, merged by counter addition + re-reduction — the
    mergeable-summaries algebra with its N/k error guarantee, every value
    a LOWER bound on the true count. The summary is built from per-day
    exact counts via the order-independent construction (top-k minus the
    (k+1)-th count), entirely JVM-side expressions; the oracle replicates
    the identical algebra, so merge correctness is hash-checked, not just
    property-tested."""
    k = 3
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wd = Window.partitionBy("day").orderBy(F.desc("c"), "event_type")
    r = c.withColumn("rnk", F.row_number().over(wd))
    off = r.groupBy("day").agg(
        F.coalesce(
            F.max(F.when(F.col("rnk") == k + 1, F.col("c"))), F.lit(0)
        ).alias("o")
    )
    p = (
        r.join(off, "day")
        .filter((F.col("rnk") <= k) & (F.col("c") - F.col("o") > 0))
        .select("event_type", (F.col("c") - F.col("o")).alias("v"))
    )
    m = p.groupBy("event_type").agg(F.sum("v").cast("long").alias("mv"))
    wm = Window.orderBy(F.desc("mv"), "event_type")
    rm = m.withColumn("rnk", F.row_number().over(wm))
    om = rm.agg(
        F.coalesce(
            F.max(F.when(F.col("rnk") == k + 1, F.col("mv"))), F.lit(0)
        ).alias("o")
    )
    ex = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        rm.crossJoin(F.broadcast(om))
        .filter((F.col("rnk") <= k) & (F.col("mv") - F.col("o") > 0))
        .join(ex, "event_type")
        .select(
            "event_type",
            (F.col("mv") - F.col("o")).cast("long").alias("mg_bound"),
            "exact_cnt",
            F.col("rnk").cast("long").alias("rnk"),
        )
        .orderBy("rnk")
    )


@query(
    "bloom_fill_rate_cardinality",
    oracle="""
    -- the Bloom filter AS a cardinality estimator (Swamidass & Baldi
    -- 2007): insert every distinct user into a PORTABLE m=4096-bit,
    -- kh=4-hash filter whose bit positions come from md5 (identical in
    -- both engines), then estimate n from the fill ratio:
    -- n_est = -(m/kh) * ln(1 - X/m) with X = bits set. The filter state
    -- is the set of distinct positions -> exact in SQL; one ln on the
    -- same exact rational keeps the rounded estimate engine-stable.
    WITH keys AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS key FROM events),
    pos AS (
      SELECT DISTINCT
             ('0x' || substr(md5(key || '|' || CAST(i AS VARCHAR)), 1, 12))::BIGINT
               % 4096 AS pos
      FROM keys CROSS JOIN (SELECT unnest(range(4)) AS i)
    ), x AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM pos),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys FROM keys)
    SELECT n.n_keys, x.n_bits_set,
           ROUND(-(4096.0 / 4.0) * ln(1.0 - x.n_bits_set / 4096.0), 4)
             AS est_distinct
    FROM n CROSS JOIN x
    """,
)
def bloom_fill_rate_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The namesake sketch used BACKWARDS: a Bloom filter's fill ratio
    estimates how many distinct keys were inserted (Swamidass & Baldi
    2007) — the operational answer to "how full is this filter / is its
    FPP still honest" without storing any key. The filter here is hash-
    PORTABLE (positions = md5(key|i) mod m, i < kh), so the exact bit
    set — and therefore the estimate — is reproducible in ANY engine; the
    build is a distinct-aggregate over generated positions, no UDF, no
    driver state."""
    m_bits, kh = 4096, 4
    keys = (
        load(spark, sf_dir, "events")
        .select(F.col("user_id").cast("string").alias("key"))
        .distinct()
    )
    hashes = keys.crossJoin(
        F.broadcast(
            spark.range(kh).select(F.col("id").cast("int").alias("i"))
        )
    )
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("key"), F.lit("|"), F.col("i").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )
    x = hashes.select(pos.alias("pos")).agg(
        F.count_distinct("pos").alias("n_bits_set")
    )
    n = keys.agg(F.count(F.lit(1)).alias("n_keys"))
    return n.crossJoin(F.broadcast(x)).select(
        "n_keys",
        "n_bits_set",
        F.round(
            -(m_bits / kh) * F.log(1.0 - F.col("n_bits_set") / F.lit(float(m_bits))),
            4,
        ).alias("est_distinct"),
    )


@query(
    "cms_decayed_sketch_merge",
    oracle="""
    -- exact twin of the DECAY-WEIGHTED sketch-table merge: per-day user
    -- counts x day weight 0.5^(age_days/7) (half-life 7 days anchored at
    -- the max day), top-10 users by decayed weight. Weights ROUND to 8
    -- decimals into DECIMAL(12,8) (fixed integer ages -> boundary-safe),
    -- terms are exact DECIMAL products, DOUBLE only at output.
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS md FROM events),
         c AS (SELECT CAST(ts AS DATE) AS day, user_id, COUNT(*) AS c
               FROM events GROUP BY 1, 2),
         t AS (
           SELECT user_id,
                  CAST(ROUND(POWER(0.5, (mx.md - day) / 7.0), 8)
                       AS DECIMAL(12,8)) * c AS term
           FROM c CROSS JOIN mx
         ),
         s AS (SELECT user_id, SUM(term) AS tw FROM t GROUP BY user_id)
    SELECT user_id, CAST(tw AS DOUBLE) AS decayed_weight,
           CAST(ROW_NUMBER() OVER (ORDER BY tw DESC, user_id) AS BIGINT) AS rnk
    FROM s QUALIFY rnk <= 10
    ORDER BY rnk
    """,
)
def cms_decayed_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted heavy users from the per-day CMS sketch TABLE
    (A5/D23 composed): one sketch row per day at rest, merged with
    exponential decay weights at query time — est(key) = Σ_d w_d ·
    point_d(key). Today's ingest appends one kilobyte sketch row; any
    half-life is answerable later WITHOUT re-scanning history (a plain
    merged sketch can't re-weight the past; a weighted merge of the table
    can). Exact Decimal weight arithmetic mirrors the oracle digit for
    digit; collision-free regime makes every per-day point query exact."""
    from decimal import Decimal

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        CountMinSketchTable,
    )

    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    day_rows = sketch_table(
        ev,
        F.count_min_sketch(F.col("user_id"), F.lit(0.0001), F.lit(0.999), F.lit(SEED)),
        day_expr=F.col("day"),
    ).collect()  # bounded: one row per day (the sketch table)
    max_day = max(r["day"] for r in day_rows)

    import numpy as np

    users = np.array(
        sorted(r[0] for r in ev.select("user_id").distinct().collect()),
        dtype=np.int64,
    )
    totals = {int(u): Decimal(0) for u in users}
    for r in day_rows:
        age = (max_day - r["day"]).days
        # quantize HALF_UP to match DuckDB ROUND (f-string formatting is
        # half-to-even and would diverge on exact decimal ties, e.g.
        # age=63d -> 0.5^9 = 0.001953125)
        from decimal import ROUND_HALF_UP

        w = Decimal(repr(0.5 ** (age / 7.0))).quantize(
            Decimal("0.00000001"), rounding=ROUND_HALF_UP
        )
        est = CountMinSketchTable.from_bytes(bytes(r["sketch"])).estimate_longs(users)
        for u, c in zip(users, est):
            totals[int(u)] += w * int(c)
    order = sorted(totals, key=lambda u: (-totals[u], u))[:10]
    rows = [(u, float(totals[u]), r + 1) for r, u in enumerate(order)]
    return spark.createDataFrame(
        rows, "user_id BIGINT, decayed_weight DOUBLE, rnk BIGINT"
    )


@query(
    "cms_heavy_change_detection",
    oracle="""
    -- exact twin of CMS-based heavy-CHANGE detection (deltoids, Cormode
    -- & Muthukrishnan 2004): per-user activity delta between the first
    -- and second half of January; top-5 by |delta| with total tie-break.
    -- Collision-free regime -> both period estimates equal exact counts.
    WITH a AS (SELECT user_id, COUNT(*) AS c FROM events
               WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY user_id),
         b AS (SELECT user_id, COUNT(*) AS c FROM events
               WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY user_id),
         d AS (
           SELECT COALESCE(a.user_id, b.user_id) AS user_id,
                  CAST(COALESCE(a.c, 0) AS BIGINT) AS cnt_p1,
                  CAST(COALESCE(b.c, 0) AS BIGINT) AS cnt_p2,
                  CAST(COALESCE(b.c, 0) - COALESCE(a.c, 0) AS BIGINT) AS delta
           FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
         )
    SELECT user_id, cnt_p1, cnt_p2, delta,
           CAST(ROW_NUMBER() OVER (ORDER BY ABS(delta) DESC, user_id) AS BIGINT)
             AS rnk
    FROM d QUALIFY rnk <= 5
    ORDER BY rnk
    """,
)
def cms_heavy_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-CHANGE detection from two period sketches (the deltoids
    problem): build one CMS per time period in a single scan (conditional
    aggregates), then rank keys by the DIFFERENCE of their point queries
    — the traffic-anomaly / drift primitive ("whose behavior changed
    most?"), answered from two kilobyte sketches rather than two full
    scans per question. The probe set here is all distinct users (bounded
    fixture collect); at 100 TB the candidates come from each period's
    heavy-hitter sketch instead — the sketches themselves are
    period-partitioned and mergeable either way."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        CountMinSketchTable,
    )

    ev = load(spark, sf_dir, "events")
    mid = F.lit("2024-01-16 00:00:00").cast("timestamp")
    row = ev.agg(
        F.count_min_sketch(
            F.when(F.col("ts") < mid, F.col("user_id")),
            F.lit(0.0001), F.lit(0.999), F.lit(SEED),
        ).alias("s1"),
        F.count_min_sketch(
            F.when(F.col("ts") >= mid, F.col("user_id")),
            F.lit(0.0001), F.lit(0.999), F.lit(SEED),
        ).alias("s2"),
    ).head()
    s1 = CountMinSketchTable.from_bytes(bytes(row["s1"]))
    s2 = CountMinSketchTable.from_bytes(bytes(row["s2"]))

    import numpy as np

    users = np.array(
        sorted(r[0] for r in ev.select("user_id").distinct().collect()),
        dtype=np.int64,
    )
    e1 = s1.estimate_longs(users)
    e2 = s2.estimate_longs(users)
    delta = e2.astype(np.int64) - e1.astype(np.int64)
    order = sorted(range(len(users)), key=lambda i: (-abs(int(delta[i])), int(users[i])))
    rows = [
        (int(users[i]), int(e1[i]), int(e2[i]), int(delta[i]), r + 1)
        for r, i in enumerate(order[:5])
    ]
    return spark.createDataFrame(
        rows, "user_id BIGINT, cnt_p1 BIGINT, cnt_p2 BIGINT, delta BIGINT, rnk BIGINT"
    )


@query(
    "cms_time_range_freq",
    oracle="""
    -- exact twin of per-key TIME-RANGE frequency from the dyadic CMS
    -- hierarchy: count of events of each type within 6h-bucket ranges
    -- (buckets 0-based at the fixture's min bucket). Collision-free
    -- regime -> est == exact.
    WITH base AS (
      SELECT CAST(MIN(FLOOR(epoch_us(ts) / 21600000000)) AS BIGINT) AS b0
      FROM events
    ), ev AS (
      SELECT event_type,
             CAST(FLOOR(epoch_us(ts) / 21600000000) AS BIGINT) - base.b0 AS bkt
      FROM events CROSS JOIN base
    )
    SELECT t.event_type, r.lo AS bucket_lo, r.hi AS bucket_hi,
           CAST(COUNT(*) FILTER (WHERE ev.bkt BETWEEN r.lo AND r.hi)
                AS BIGINT) AS exact_cnt,
           CAST(COUNT(*) FILTER (WHERE ev.bkt BETWEEN r.lo AND r.hi)
                AS BIGINT) AS cms_est
    FROM ev
    JOIN (SELECT DISTINCT event_type FROM events) t USING (event_type)
    CROSS JOIN (VALUES (0, 27), (28, 55), (0, 111)) AS r(lo, hi)
    GROUP BY t.event_type, r.lo, r.hi
    """,
)
def cms_time_range_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key frequency over ARBITRARY time ranges from sketches alone —
    the temporal analogue of the dyadic value-range hierarchy: level j
    sketches the composite (key_id << (levels-j)) | (bucket >> j), so a
    (key, [t1, t2]) query sums ≤ 2*levels point queries; keys occupy the
    high bits and can never collide across types. One build scan, 8
    kilobyte-scale sketches at rest, then time-scoped frequency answers
    touch no data — the sketch-table architecture extended along the
    time axis (per-day CMS tables answer per-day; this answers any
    dyadic-coverable range without merging)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        CountMinSketchTable,
        dyadic_decompose,
    )

    levels = 8  # 256 six-hour buckets = 64 days >= fixture span
    w_us = 21_600_000_000
    ev = load(spark, sf_dir, "events").select(
        "event_type", (F.floor(F.unix_micros("ts") / w_us)).cast("long").alias("abkt")
    )
    # 0-base the buckets and dense-id the keys (both bounded driver
    # scalars: one min, |key| distinct values)
    b0 = ev.agg(F.min("abkt")).head()[0]
    keys = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    key_id = {k: i for i, k in enumerate(keys)}
    kid_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in key_id.items() for x in kv]),
        F.col("event_type"),
    )
    composed = ev.select(
        *[
            (
                (kid_col * F.lit(1 << (levels - j)))
                + F.shiftright(F.col("abkt") - F.lit(int(b0)), j)
            ).cast("long").alias(f"c{j}")
            for j in range(levels)
        ]
    )
    row = composed.agg(
        *[
            F.count_min_sketch(
                F.col(f"c{j}"), F.lit(0.0001), F.lit(0.99), F.lit(91 + j)
            ).alias(f"l{j}")
            for j in range(levels)
        ]
    ).head()
    sketches = [CountMinSketchTable.from_bytes(bytes(row[f"l{j}"])) for j in range(levels)]

    import numpy as np

    def est(key: str, lo: int, hi: int) -> int:
        total = 0
        for j, p in dyadic_decompose(lo, hi, levels):
            item = (key_id[key] << (levels - j)) + p
            total += int(sketches[j].estimate_longs(np.array([item], dtype=np.int64))[0])
        return total

    ranges = [(0, 27), (28, 55), (0, 111)]
    exact = {
        (r["event_type"], r["lo"], r["hi"]): r["n"]
        for r in ev.crossJoin(
            spark.createDataFrame(ranges, "lo LONG, hi LONG")
        )
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.sum(
                F.when(
                    (F.col("abkt") - F.lit(int(b0))).between(F.col("lo"), F.col("hi")), 1
                ).otherwise(0)
            ).cast("long").alias("n")
        )
        .collect()
    }
    rows = [
        (k, lo, hi, int(exact[(k, lo, hi)]), est(k, lo, hi))
        for k in keys
        for lo, hi in ranges
    ]
    return spark.createDataFrame(
        rows, "event_type STRING, bucket_lo BIGINT, bucket_hi BIGINT, "
        "exact_cnt BIGINT, cms_est BIGINT"
    )


@query(
    "cms_dyadic_quantiles",
    oracle="""
    -- exact twin of quantiles-from-a-dyadic-CMS: est_q(p) = smallest
    -- integer v whose prefix rank reaches ceil(p * N). In the
    -- collision-free regime every dyadic range estimate is exact, so the
    -- sketch's binary search lands on the same v as this SQL.
    WITH vals AS (SELECT CAST(FLOOR(value) AS BIGINT) AS iv FROM events),
         n AS (SELECT COUNT(*) AS n FROM vals),
         ranks AS (SELECT iv, COUNT(*) AS c FROM vals GROUP BY iv),
         cum AS (SELECT iv, CAST(SUM(c) OVER (ORDER BY iv) AS BIGINT) AS r
                 FROM ranks)
    SELECT p, CAST(MIN(iv) AS BIGINT) AS est_q
    FROM cum CROSS JOIN (SELECT unnest([0.5, 0.95, 0.99]) AS p) ps(p)
    CROSS JOIN n
    WHERE r >= CEIL(p * n.n)
    GROUP BY p
    """,
)
def cms_dyadic_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles answered ENTIRELY from the dyadic CMS hierarchy (the
    Cormode-Muthukrishnan §4.3 composition): rank(v) = range estimate
    [0, v], quantile(p) = binary search for the smallest v whose rank
    reaches ceil(p*N), with N itself read from the sketch (full-domain
    range). After the one build scan, the data is never touched again —
    ~10 sketch probes per quantile, all driver-side kilobyte math. This
    is the sketch-resident architecture answering a query class (order
    statistics) the sketch wasn't directly built for."""
    import math

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        cms_build_dyadic,
        cms_range_estimate,
    )

    ev = load(spark, sf_dir, "events").select(
        F.floor("value").cast("long").alias("iv")
    )
    sketches = cms_build_dyadic(ev, "iv", levels=11, eps=0.0001, confidence=0.99, seed=77)
    domain_hi = (1 << 11) - 1  # dyadic domain [0, 2^levels)
    n_total = cms_range_estimate(sketches, 0, domain_hi)

    def quantile(p: float) -> int:
        target = math.ceil(p * n_total)
        lo, hi = 0, domain_hi
        while lo < hi:
            mid = (lo + hi) // 2
            if cms_range_estimate(sketches, 0, mid) >= target:
                hi = mid
            else:
                lo = mid + 1
        return lo

    rows = [(p, quantile(p)) for p in (0.5, 0.95, 0.99)]
    return spark.createDataFrame(rows, "p DOUBLE, est_q BIGINT")


@query(
    "quantile_sketch_table",
    oracle="""
    -- mergeable quantile sketch at rest: per-day equi-width histogram
    -- partials (bin = floor(value/2), 512 bins over [0, 1024)), merged by
    -- addition at query time; quantile p = upper edge of the first bin
    -- where the cumulative count reaches ceil(p * N). Pure integer math
    -- until one final multiplication -> engine-exact.
    WITH partials AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR(value / 2) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), merged AS (
      SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM partials GROUP BY 1
    ), cum AS (
      SELECT bin,
             CAST(SUM(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cnt,
             (SELECT CAST(SUM(cnt) AS BIGINT) FROM merged) AS n_total
      FROM merged
    )
    SELECT p, MIN((bin + 1) * 2.0) AS est_q
    FROM cum CROSS JOIN (SELECT unnest([0.5, 0.95, 0.99]) AS p)
    WHERE cum_cnt >= CEIL(p * n_total)
    GROUP BY p
    """,
)
def quantile_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a MERGEABLE sketch table (A9 extension, the
    sketch-at-rest architecture the CMS/HLL tables use): each day keeps a
    fixed 512-bin equi-width histogram — O(bins) state regardless of row
    count, merge = vector addition (a relational groupBy-sum). Query time
    touches only #days x #bins rows: cumulative window over 512 bins,
    quantile = first bin reaching ceil(p*N). Error bounded by bin width;
    the partials are incrementally maintainable (today's ingest only
    touches today's row group). All integer math -> bit-identical across
    engines, unlike sampling-based percentile sketches."""
    ev = load(spark, sf_dir, "events")
    partials = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") / 2).cast("long").alias("bin"),
        )
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = partials.groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = merged.select(
        "bin",
        F.sum("cnt").over(w).cast("long").alias("cum_cnt"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n_total"),
    )
    ps = spark.createDataFrame([(0.5,), (0.95,), (0.99,)], "p DOUBLE")
    return (
        cum.crossJoin(F.broadcast(ps))
        .filter(F.col("cum_cnt") >= F.ceil(F.col("p") * F.col("n_total")))
        .groupBy("p")
        .agg(F.min((F.col("bin") + 1) * 2.0).alias("est_q"))
    )


@query(
    "exact_percentiles_value",
    oracle="""
    -- exact continuous (interpolated) percentiles: the deterministic twin
    -- of approx_quantiles_value's discrete GK sketch. Both engines sort
    -- and linearly interpolate the same doubles -> identical IEEE results;
    -- ROUND(6) guards the last bit.
    SELECT 0.25 AS prob, ROUND(quantile_cont(value, 0.25), 6) AS quantile FROM events
    UNION ALL
    SELECT 0.5, ROUND(quantile_cont(value, 0.5), 6) FROM events
    UNION ALL
    SELECT 0.75, ROUND(quantile_cont(value, 0.75), 6) FROM events
    UNION ALL
    SELECT 0.9, ROUND(quantile_cont(value, 0.9), 6) FROM events
    """,
)
def exact_percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (SQL PERCENTILE_CONT semantics) via
    Spark's `percentile` aggregate — the exact twin of the GK sketch path.
    Scale note: exact percentiles need a global sort of the column's values
    within the aggregate; at 100 TB the GK/KLL sketch path is the default
    and this operator is the audit tool run on samples/partitions."""
    ev = load(spark, sf_dir, "events")
    agg = ev.agg(
        F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.9))").alias("qs")
    ).select(F.posexplode("qs").alias("i", "q"))
    probs = F.array(*[F.lit(p) for p in [0.25, 0.5, 0.75, 0.9]])
    return agg.select(
        F.element_at(probs, F.col("i") + 1).alias("prob"),
        F.round(F.col("q"), 6).alias("quantile"),
    )


@query("cms_conservative_vs_standard", witness="cms_conservative_exact")
def cms_conservative_vs_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conservative-update CMS (Estan & Varghese 2002) vs the standard
    sketch on a deliberately NARROW table (width 50, depth 3 — collisions
    guaranteed at sf0.01's ~1k users): per-batch CU builds merged by
    addition, so exact <= est_cu <= est_std holds for the merged sketch
    (see functions/cms.py:add_longs_conservative for the proof sketch;
    property-tested). CU magnitudes are order-sensitive by construction —
    the build runs on the stable scan order, no shuffle — so the query is
    rows-only for the driver; the ordering-invariant bound columns carry
    the checkable signal."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        cms_build_numpy,
    )

    ev = load(spark, sf_dir, "events")
    eps, conf, seed = 0.04, 0.875, 7
    std = cms_build_numpy(ev, "user_id", eps, conf, seed)
    cu = cms_build_numpy(ev, "user_id", eps, conf, seed, conservative=True)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(10)
        .collect()
    )
    import numpy as np

    ids = np.array([r["user_id"] for r in top], dtype=np.int64)
    est_std = std.estimate_longs(ids)
    est_cu = cu.estimate_longs(ids)
    rows = [
        (
            int(r["user_id"]),
            int(r["exact_cnt"]),
            int(s),
            int(c),
            bool(r["exact_cnt"] <= c <= s),
        )
        for r, s, c in zip(top, est_std, est_cu)
    ]
    return spark.createDataFrame(
        rows,
        "user_id long, exact_cnt long, est_std long, est_cu long, bound_holds boolean",
    )


@query(
    "kmv_distinct_per_type",
    oracle="""
    -- KMV bottom-k distinct sketch (k=64) per event_type over (user, day)
    -- elements. md5-derived hash fractions are engine-portable, so the
    -- ESTIMATE itself — (k-1)/h_k — is deterministic and hash-checked,
    -- in the genuinely approximate regime (~1600 true distinct vs k=64).
    WITH elems AS (
      SELECT DISTINCT event_type,
             CAST(user_id AS VARCHAR) || '-' || CAST(CAST(ts AS DATE) AS VARCHAR) AS elem
      FROM events
    ), fr AS (
      SELECT event_type, elem,
             (('0x' || substr(md5(elem), 1, 12))::BIGINT + 1) / 281474976710656.0 AS frac
      FROM elems
    ), kth AS (
      SELECT event_type, frac FROM (
        SELECT event_type, frac,
               row_number() OVER (PARTITION BY event_type ORDER BY frac, elem) AS rn
        FROM fr
      ) WHERE rn = 64
    ), ex AS (
      SELECT event_type, COUNT(*) AS exact_distinct FROM elems GROUP BY event_type
    )
    SELECT ex.event_type, ex.exact_distinct,
           ROUND(63.0 / kth.frac, 4) AS kmv_est,
           ROUND(ABS(63.0 / kth.frac - ex.exact_distinct) / ex.exact_distinct, 4) AS rel_err
    FROM ex JOIN kth USING (event_type)
    ORDER BY event_type
    """,
)
def kmv_distinct_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group — the
    engine-portable distinct sketch (functions/sketches.py): unlike HLL,
    the estimate itself is cross-engine deterministic, so this runs in the
    truly approximate regime (k=64 vs ~1600 distinct user-days) under the
    full value hash. Per-group bottom-k = one hash-shuffle on the group key
    + row_number window; k rows survive per group."""
    k = 64
    ev = load(spark, sf_dir, "events")
    elems = ev.select(
        "event_type",
        F.concat_ws(
            "-", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
        ).alias("elem"),
    ).distinct()
    fr = elems.withColumn("frac", sketches.kmv_fraction(F.col("elem")))
    w = Window.partitionBy("event_type").orderBy("frac", "elem")
    kth = (
        fr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == k)
        .select("event_type", "frac")
    )
    est = sketches.kmv_estimate_from_kth(F.col("frac"), k)
    ex = elems.groupBy("event_type").agg(F.count(F.lit(1)).alias("exact_distinct"))
    return (
        ex.join(kth, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            F.round(est, 4).alias("kmv_est"),
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 4
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


@query(
    "kmv_set_overlap",
    oracle="""
    -- KMV set algebra (Beyer et al. SIGMOD 2007): union / intersection /
    -- Jaccard estimates for click-vs-purchase user-day sets from two
    -- mergeable bottom-k sketches (k=64), vs their exact values. The union
    -- sketch is bottom-k of the merged sketches; rho = |kept hashes seen in
    -- BOTH input sketches| / k estimates Jaccard; inter_est = rho * union_est.
    WITH elems AS (
      SELECT DISTINCT event_type,
             CAST(user_id AS VARCHAR) || '-' || CAST(CAST(ts AS DATE) AS VARCHAR) AS elem
      FROM events WHERE event_type IN ('click', 'purchase')
    ), fr AS (
      SELECT event_type, elem,
             (('0x' || substr(md5(elem), 1, 12))::BIGINT + 1) / 281474976710656.0 AS frac
      FROM elems
    ), ka AS (
      SELECT elem, frac FROM (
        SELECT elem, frac, row_number() OVER (ORDER BY frac, elem) AS rn
        FROM fr WHERE event_type = 'click'
      ) WHERE rn <= 64
    ), kb AS (
      SELECT elem, frac FROM (
        SELECT elem, frac, row_number() OVER (ORDER BY frac, elem) AS rn
        FROM fr WHERE event_type = 'purchase'
      ) WHERE rn <= 64
    ), u AS (
      SELECT elem, frac FROM (
        SELECT elem, frac, row_number() OVER (ORDER BY frac, elem) AS rn
        FROM (SELECT DISTINCT elem, frac FROM (SELECT * FROM ka UNION ALL SELECT * FROM kb))
      ) WHERE rn <= 64
    ), stats AS (
      SELECT MAX(frac) AS kth_frac,
             SUM(CASE WHEN elem IN (SELECT elem FROM ka)
                       AND elem IN (SELECT elem FROM kb) THEN 1 ELSE 0 END) AS n_both
      FROM u
    ), exact AS (
      SELECT COUNT(DISTINCT elem) AS exact_union,
             COUNT(DISTINCT CASE WHEN cnt = 2 THEN elem END) AS exact_inter
      FROM (SELECT elem, COUNT(DISTINCT event_type) AS cnt FROM elems GROUP BY elem)
    )
    SELECT ROUND(63.0 / kth_frac, 4) AS union_est,
           ROUND(n_both / 64.0, 4) AS jaccard_est,
           ROUND((63.0 / kth_frac) * (n_both / 64.0), 4) AS inter_est,
           exact_union, exact_inter,
           ROUND(exact_inter * 1.0 / exact_union, 4) AS exact_jaccard
    FROM stats CROSS JOIN exact
    """,
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra: estimate |A∪B|, |A∩B| and Jaccard(A,B) from
    two bottom-k sketches alone — the distinct-count counterpart of Bloom
    union / CMS merge. Each bottom-k is a TakeOrderedAndProject (per-
    partition top-k, no full sort); the merge handles k+k=128 rows."""
    k = 64
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    elems = ev.select(
        "event_type",
        F.concat_ws(
            "-", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
        ).alias("elem"),
    ).distinct()
    fr = elems.withColumn("frac", sketches.kmv_fraction(F.col("elem")))
    ka = (
        fr.filter(F.col("event_type") == "click")
        .select("elem", "frac")
        .orderBy("frac", "elem")
        .limit(k)
    )
    kb = (
        fr.filter(F.col("event_type") == "purchase")
        .select("elem", "frac")
        .orderBy("frac", "elem")
        .limit(k)
    )
    u = ka.unionAll(kb).distinct().orderBy("frac", "elem").limit(k)
    flagged = (
        u.join(ka.select(F.col("elem").alias("ea")), u.elem == F.col("ea"), "left")
        .join(kb.select(F.col("elem").alias("eb")), u.elem == F.col("eb"), "left")
        .select(
            "frac",
            (F.col("ea").isNotNull() & F.col("eb").isNotNull()).cast("int").alias(
                "in_both"
            ),
        )
    )
    stats = flagged.agg(
        F.max("frac").alias("kth_frac"), F.sum("in_both").alias("n_both")
    )
    exact = (
        elems.groupBy("elem")
        .agg(F.count_distinct("event_type").alias("cnt"))
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.count(F.when(F.col("cnt") == 2, F.lit(1))).alias("exact_inter"),
        )
    )
    union_est = F.lit(float(k - 1)) / F.col("kth_frac")
    jac_est = F.col("n_both") / F.lit(float(k))
    return stats.crossJoin(exact).select(
        F.round(union_est, 4).alias("union_est"),
        F.round(jac_est, 4).alias("jaccard_est"),
        F.round(union_est * jac_est, 4).alias("inter_est"),
        "exact_union",
        "exact_inter",
        F.round(F.col("exact_inter") / F.col("exact_union"), 4).alias("exact_jaccard"),
    )


@query(
    "time_decayed_event_weight",
    oracle="""
    -- Exponentially time-decayed frequency (half-life 7 days, anchored at
    -- the stream's max timestamp) — the decayed-count companion of the CMS
    -- point queries: recency-weighted heavy hitters. age is an exact
    -- integer microsecond difference; POWER can differ in the last ulp ->
    -- each term is ROUNDed at 1e-8, then summed as DECIMAL.
    WITH mx AS (SELECT MAX(ts) AS m FROM events),
    w AS (
      SELECT event_type,
             ROUND(POWER(0.5, ((epoch_us(mx.m) - epoch_us(ts)) / 86400000000.0) / 7.0),
                   8) AS wt
      FROM events CROSS JOIN mx
    )
    SELECT event_type,
           COUNT(*) AS exact_cnt,
           CAST(SUM(CAST(wt AS DECIMAL(28,8))) AS DOUBLE) AS decayed_weight
    FROM w GROUP BY event_type ORDER BY event_type
    """,
)
def time_decayed_event_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed counts per key (exponential decay, 7-day half-life):
    the recency-weighted view of heavy hitters that sliding windows
    approximate with buckets. One scan + one aggregate; the max-timestamp
    anchor is a 1-row broadcast, so the plan is a single hash aggregation
    at any scale."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("m"))
    age_days = (F.unix_micros(F.col("m")) - F.unix_micros(F.col("ts"))) / F.lit(
        86400000000.0
    )
    wt = F.round(F.pow(F.lit(0.5), age_days / 7.0), 8)
    return (
        ev.crossJoin(F.broadcast(mx))
        .select("event_type", wt.alias("wt"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("exact_cnt"),
            F.sum(F.col("wt").cast("decimal(28,8)")).cast("double").alias(
                "decayed_weight"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "kmv_sketch_table_merge",
    oracle="""
    -- KMV sketch table at rest: one bottom-64 sketch per (day, event_type)
    -- cell over the users active in that cell, merged across days per
    -- event_type (bottom-k of the distinct union rows) — completing the
    -- sketch-at-rest family (CMS / HLL / quantile / KMV). The merged
    -- estimate is engine-portable, so it is hash-checked outright.
    WITH elems AS (
      SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
             CAST(user_id AS VARCHAR) AS elem
      FROM events
    ), fr AS (
      SELECT day, event_type, elem,
             (('0x' || substr(md5(elem), 1, 12))::BIGINT + 1) / 281474976710656.0 AS frac
      FROM elems
    ), daily AS (
      -- the sketch table: <= 64 rows per (day, event_type) cell
      SELECT day, event_type, elem, frac FROM (
        SELECT day, event_type, elem, frac,
               row_number() OVER (PARTITION BY day, event_type
                                  ORDER BY frac, elem) AS rn
        FROM fr
      ) WHERE rn <= 64
    ), merged AS (
      SELECT event_type, elem, frac FROM (
        SELECT event_type, elem, frac,
               row_number() OVER (PARTITION BY event_type ORDER BY frac, elem) AS rn
        FROM (SELECT DISTINCT event_type, elem, frac FROM daily)
      ) WHERE rn <= 64
    ), kth AS (
      SELECT event_type, MAX(frac) AS kth_frac,
             CAST(COUNT(*) AS BIGINT) AS n_day_rows
      FROM merged GROUP BY event_type
    ), ex AS (
      SELECT event_type, COUNT(DISTINCT elem) AS exact_distinct_users,
             COUNT(DISTINCT day) AS n_day_sketches
      FROM elems GROUP BY event_type
    )
    SELECT ex.event_type, ex.n_day_sketches, ex.exact_distinct_users,
           ROUND(63.0 / kth.kth_frac, 4) AS kmv_est
    FROM ex JOIN kth USING (event_type)
    ORDER BY ex.event_type
    """,
)
def kmv_sketch_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketches AT REST: per-(day, event_type) bottom-64 sketch rows
    persisted as a table, merged across days per event_type by re-
    truncating the distinct union — incremental distinct-count maintenance
    where each new day only sketches its own rows. The merge is the exact
    set identity tested in tests/test_kmv.py; with every per-type union
    >= k the merged k-th hash exists and (k-1)/h_k estimates the per-type
    distinct users, hash-checked cross-engine."""
    k = 64
    ev = load(spark, sf_dir, "events")
    elems = ev.select(
        F.to_date("ts").cast("string").alias("day"),
        "event_type",
        F.col("user_id").cast("string").alias("elem"),
    ).distinct()
    fr = elems.withColumn("frac", sketches.kmv_fraction(F.col("elem")))
    daily = bottom_k_partials(fr, ["day", "event_type"], k, ["frac", "elem"])
    # min-wise merge across days = the same bottom-k over the distinct union
    merged = bottom_k_partials(
        daily.select("event_type", "elem", "frac").distinct(),
        ["event_type"],
        k,
        ["frac", "elem"],
    )
    kth = merged.groupBy("event_type").agg(F.max("frac").alias("kth_frac"))
    ex = elems.groupBy("event_type").agg(
        F.count_distinct("elem").alias("exact_distinct_users"),
        F.count_distinct("day").alias("n_day_sketches"),
    )
    return (
        ex.join(kth, "event_type")
        .select(
            "event_type",
            "n_day_sketches",
            "exact_distinct_users",
            F.round(F.lit(float(k - 1)) / F.col("kth_frac"), 4).alias("kmv_est"),
        )
        .orderBy("event_type")
    )


@query(
    "rollup_kmv_distinct",
    oracle="""
    -- KMV + rollup: the TOTAL row is computed by MERGING the per-type
    -- sketches (union of bottom-64 rows, re-truncated to bottom-64) —
    -- never by re-reading the raw elements. Valid because each type's
    -- bottom-64 is a superset of that type's contribution to the global
    -- bottom-64 (the KMV merge theorem); md5 portability makes the merged
    -- ESTIMATE itself hash-checked.
    WITH elems AS (
      SELECT DISTINCT event_type,
             CAST(user_id AS VARCHAR) || '-' || CAST(CAST(ts AS DATE) AS VARCHAR) AS elem
      FROM events
    ), fr AS (
      SELECT event_type, elem,
             (('0x' || substr(md5(elem), 1, 12))::BIGINT + 1) / 281474976710656.0 AS frac
      FROM elems
    ), sk AS (
      SELECT event_type, elem, frac FROM (
        SELECT event_type, elem, frac,
               row_number() OVER (PARTITION BY event_type ORDER BY frac, elem) AS rn
        FROM fr
      ) WHERE rn <= 64
    ), per_type AS (
      SELECT 'event_type' AS scope, event_type AS key,
             ROUND(63.0 / MAX(frac), 4) AS kmv_est
      FROM (
        SELECT event_type, frac,
               row_number() OVER (PARTITION BY event_type ORDER BY frac, elem) AS rn
        FROM sk
      ) WHERE rn <= 64 GROUP BY event_type
    ), merged AS (
      SELECT 'total' AS scope, 'ALL' AS key, ROUND(63.0 / frac, 4) AS kmv_est
      FROM (
        SELECT frac,
               row_number() OVER (ORDER BY frac, elem) AS rn
        FROM (SELECT DISTINCT elem, frac FROM sk)
      ) WHERE rn = 64
    )
    SELECT scope, key, kmv_est FROM per_type
    UNION ALL SELECT scope, key, kmv_est FROM merged
    ORDER BY scope, key
    """,
)
def rollup_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch algebra meets rollup: per-type KMV distinct estimates plus a
    grand-total row derived by MERGING the per-type sketches (union the
    bottom-64 row sets, dedup elements, re-truncate) — the raw elements
    are read exactly once. This is how a sketch-backed OLAP cube answers
    every grouping level from one pass: coarser cells are unions of finer
    cells' sketches. All md5 arithmetic -> the merged estimate is
    value-hash-checked, not just sanity-checked."""
    k = 64
    ev = load(spark, sf_dir, "events")
    elems = ev.select(
        "event_type",
        F.concat_ws(
            "-", F.col("user_id").cast("string"), F.to_date("ts").cast("string")
        ).alias("elem"),
    ).distinct()
    fr = elems.withColumn("frac", sketches.kmv_fraction(F.col("elem")))
    w = Window.partitionBy("event_type").orderBy("frac", "elem")
    sk = fr.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn").persist()
    per_type = (
        sk.groupBy("event_type")
        .agg(F.round(F.lit(float(k - 1)) / F.max("frac"), 4).alias("kmv_est"))
        .select(
            F.lit("event_type").alias("scope"),
            F.col("event_type").alias("key"),
            "kmv_est",
        )
    )
    wg = Window.orderBy("frac", "elem")
    merged = (
        sk.select("elem", "frac")
        .distinct()
        .withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") == k)
        .select(
            F.lit("total").alias("scope"),
            F.lit("ALL").alias("key"),
            F.round(F.lit(float(k - 1)) / F.col("frac"), 4).alias("kmv_est"),
        )
    )
    return per_type.unionAll(merged).orderBy("scope", "key")


@query(
    "bloom_table_merge_exact",
    oracle="""
    -- Bloom sketch-table merge witness in the verified-FP-free regime
    -- (the counting_bloom_delete_membership pattern): per-day filters
    -- sized to 20k items at fpp 1e-6 with seed 42, OR-merged — no false
    -- negatives by construction, and no false positive exists in the
    -- 0..3000 probe range at any fixture SF (deterministic given the
    -- seed and the fixed user-id domain; the Spark side raises if one
    -- ever appears rather than hash-failing mysteriously) — so merged
    -- membership equals the exact IN.
    SELECT t.k AS key
    FROM range(0, 3000) t(k)
    WHERE t.k IN (SELECT DISTINCT user_id FROM events)
    ORDER BY key
    """,
)
def bloom_table_merge_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-at-rest merge witness: the day-partitioned filter table of
    bloom_sketch_table_merge rebuilt in the verified-FP-free sizing
    (20k/1e-6 — the parameters counting_bloom_delete_membership already
    pins FP-free on this key domain), so the OR-union's membership over
    the 0..3000 probe range must hash-equal the exact distinct-user IN.
    Puts the per-day distributed build + bitwise-OR merge + vectorized
    probe path under the value hash; the measured-FPP regime stays
    rows-only in bloom_sketch_table_merge."""
    import numpy as np
    import pandas as pd

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        NumpyBloom,
    )

    ev = load(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("day"), "user_id")

    def build(pdf):
        b = NumpyBloom.from_params(expected_items=20_000, fpp=1e-6)
        b.add_longs(pdf["user_id"].to_numpy(dtype="int64"))
        return pd.DataFrame(
            {"day": [pdf["day"].iloc[0]], "filter": [b.to_bytes()]}
        )

    table = (
        days.groupBy("day")
        .applyInPandas(build, "day date, filter binary")
        .collect()
    )
    merged = None
    for r in table:
        b = NumpyBloom.from_bytes(bytes(r["filter"]))
        merged = b if merged is None else merged_union(merged, b)

    probe = np.arange(3000, dtype=np.int64)
    hits = merged.might_contain_longs(probe)
    present = {
        int(r[0]) for r in days.select("user_id").distinct().collect()
    }  # bounded: distinct users
    fps = [int(k) for k, h in zip(probe, hits) if h and int(k) not in present]
    if fps:
        raise AssertionError(
            f"witness regime broken: false positives at {fps[:5]} — resize"
        )
    return spark.createDataFrame(
        [(int(k),) for k, h in zip(probe, hits) if h], "key long"
    ).orderBy("key")


@query("bloom_sketch_table_merge", witness="bloom_table_merge_exact")
def bloom_sketch_table_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filters AT REST — the namesake sketch joins the sketch-table
    family (CMS/HLL/quantile/KMV): one Bloom filter per day over that
    day's active users, persisted as (day, filter_bytes) rows; the month
    membership filter is the bitwise-OR union of the day filters (exact
    Bloom merge), so per-day partitions append independently and the
    global filter never re-reads raw history. Probes: every present key
    must hit (Bloom guarantees no false negatives — asserted by
    tests/test_bloom.py::test_bloom_sketch_table_no_false_negatives);
    absent-key positives are the measured false-positive count.
    Rows-only: filter bits aren't SQL, the no-false-negative and
    FPP-bound invariants are the tested contract."""
    import pandas as pd

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        NumpyBloom,
    )

    ev = load(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("day"), "user_id")

    def build(pdf):
        b = NumpyBloom.from_params(expected_items=4096, fpp=0.01)
        b.add_longs(pdf["user_id"].to_numpy(dtype="int64"))
        return pd.DataFrame(
            {"day": [pdf["day"].iloc[0]], "filter": [b.to_bytes()]}
        )

    table = (
        days.groupBy("day")
        .applyInPandas(build, "day date, filter binary")
        .collect()
    )
    merged = None
    for r in table:
        b = NumpyBloom.from_bytes(bytes(r["filter"]))
        merged = b if merged is None else merged_union(merged, b)

    present = [r[0] for r in days.select("user_id").distinct().limit(100).collect()]
    import numpy as np

    absent = np.arange(1_000_000, 1_000_100, dtype=np.int64)
    hits_present = int(
        merged.might_contain_longs(np.array(present, dtype=np.int64)).sum()
    )
    hits_absent = int(merged.might_contain_longs(absent).sum())
    return spark.createDataFrame(
        [
            ("absent", len(absent), hits_absent),
            ("present", len(present), hits_present),
        ],
        "probe_set string, n_probes int, n_positive int",
    ).orderBy("probe_set")


def merged_union(a, b):
    """Bitwise-OR union of two NumpyBloom filters (same params)."""
    import numpy as np

    assert a.n_bits == b.n_bits and np.array_equal(a.hash_a, b.hash_a)
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.bloom import (
        NumpyBloom,
    )

    return NumpyBloom(a.n_bits, a.hash_a, a.bits | b.bits)


@query(
    "ams_f2_estimate",
    oracle="""
    -- AMS (Alon-Matias-Szegedy) F2 sketch: 16 md5-derived ±1 sign
    -- estimators, Z_i = sum of signs over the stream, median-of-means of
    -- Z_i² estimates F2 = Σ f_x² (the self-join size). Every step is
    -- integer or exact-dyadic arithmetic, so the ESTIMATE of this
    -- genuinely randomized sketch is value-hash-checked — like KMV, the
    -- portability comes from hashing, not from de-randomizing.
    WITH est AS (SELECT unnest(generate_series(0, 15)) AS i),
    signs AS (
      SELECT e.i,
             CAST(SUM(1 - 2 * (('0x' || substr(md5(CAST(ev.user_id AS VARCHAR)
                                    || ':' || CAST(e.i AS VARCHAR)), 1, 1))::BIGINT % 2))
                  AS BIGINT) AS z
      FROM events ev CROSS JOIN est e
      GROUP BY e.i
    ),
    means AS (
      SELECT i // 4 AS g, SUM(z * z) / 4.0 AS m
      FROM signs GROUP BY 1
    ),
    med AS (
      SELECT (m1 + m2) / 2.0 AS f2_est FROM (
        SELECT MAX(CASE WHEN rn = 2 THEN m END) AS m1,
               MAX(CASE WHEN rn = 3 THEN m END) AS m2
        FROM (SELECT m, row_number() OVER (ORDER BY m, g) AS rn FROM means)
      )
    ),
    exact AS (
      SELECT CAST(SUM(c * c) AS BIGINT) AS f2
      FROM (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id)
    )
    SELECT exact.f2 AS f2_exact,
           med.f2_est AS f2_estimate,
           ROUND(ABS(med.f2_est - exact.f2) / exact.f2, 4) AS rel_err
    FROM exact CROSS JOIN med
    """,
)
def ams_f2_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment (F2) sketch — the third classic from
    the same literature as Bloom/CMS: F2 = Σ f_x² is the self-join size,
    estimated from 16 counters regardless of key cardinality. Each
    estimator is one ±1-signed sum over the stream (md5-derived signs, so
    the randomized estimate itself is engine-portable and hash-checked);
    median-of-means over 4 groups of 4 gives the standard
    accuracy/confidence trade. One pass, 16 integers of state, trivially
    mergeable (signed sums add) — the join-size planner statistic at
    stream speed."""
    ev = load(spark, sf_dir, "events")
    est = F.explode(F.sequence(F.lit(0), F.lit(15))).alias("i")
    rows = ev.select(F.col("user_id")).select("user_id", est)
    bit = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("user_id").cast("string"), F.col("i").cast("string")
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    signs = rows.groupBy("i").agg(
        F.sum(F.lit(1) - 2 * bit).cast("long").alias("z")
    )
    means = signs.groupBy((F.col("i") / 4).cast("int").alias("g")).agg(
        (F.sum(F.col("z") * F.col("z")) / 4.0).alias("m")
    )
    w = Window.orderBy("m", "g")
    ranked = means.withColumn("rn", F.row_number().over(w))
    med = ranked.agg(
        (
            (
                F.max(F.when(F.col("rn") == 2, F.col("m")))
                + F.max(F.when(F.col("rn") == 3, F.col("m")))
            )
            / 2.0
        ).alias("f2_est")
    )
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2"))
    )
    return exact.crossJoin(med).select(
        F.col("f2").alias("f2_exact"),
        F.col("f2_est").alias("f2_estimate"),
        F.round(F.abs(F.col("f2_est") - F.col("f2")) / F.col("f2"), 4).alias(
            "rel_err"
        ),
    )


@query(
    "cms_conservative_exact",
    oracle="""
    -- Conservative-update CMS exactness witness (the no-collision
    -- regime): keys are user_id % 5 — a FIXED 5-value domain whose
    -- bucket layout depends only on (keys, seed, width), not on SF —
    -- and seed 1 places the 5 keys in distinct buckets on every one of
    -- the 5 depth rows (asserted in the query). Sole-key counters make
    -- CU increments exactly +1 per occurrence and addition-merge exact,
    -- so the estimate equals the exact GROUP BY at any scale and any
    -- partitioning/arrival order (CU's order sensitivity only exists
    -- under collisions).
    SELECT user_id % 5 AS key, CAST(COUNT(*) AS BIGINT) AS est
    FROM events GROUP BY 1 ORDER BY key
    """,
)
def cms_conservative_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conservative-update CMS witness: the collision-free regime where
    Estan-Varghese updates degenerate to exact counting — every counter
    is owned by one key, so min-estimate+1 is plain increment, per-batch
    CU tables merge by addition losslessly, and the estimates must
    hash-equal the exact GROUP BY. Graduates add_longs_conservative's
    build/merge/estimate path into the hash-checked family (the
    collision regime, where CU's ordering sensitivity lives, stays
    rows-only in cms_conservative_vs_standard + property tests)."""
    import numpy as np

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        cms_build_numpy,
    )

    ev = load(spark, sf_dir, "events").select((F.col("user_id") % 5).alias("k"))
    cu = cms_build_numpy(ev, "k", eps=2.0 / 64, confidence=0.96, seed=1, conservative=True)
    keys = np.arange(5, dtype=np.int64)
    b = cu._buckets(keys)
    assert all(
        len(set(b[i])) == len(keys) for i in range(b.shape[0])
    ), "witness regime broken: keys collide — pick a collision-free seed"
    est = cu.estimate_longs(keys)
    return spark.createDataFrame(
        [(int(k), int(e)) for k, e in zip(keys, est)], "key long, est long"
    ).orderBy("key")


@query(
    "count_sketch_exact",
    oracle="""
    -- Count-Sketch exactness witness (same no-collision construction as
    -- cms_conservative_exact): with the fixed 5-key domain in distinct
    -- buckets on every depth row at seed 1, each counter holds exactly
    -- sign_k * count_k, so sign_k * counter = count_k on all rows and
    -- the median estimator is exact — the distributed mapInPandas build
    -- and cellwise-addition merge must reproduce the exact GROUP BY.
    SELECT user_id % 5 AS key, CAST(COUNT(*) AS BIGINT) AS est
    FROM events GROUP BY 1 ORDER BY key
    """,
)
def count_sketch_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Sketch witness in the collision-free regime: signed counters
    with sole ownership are exact, so the median-of-depth estimate equals
    the exact count and the whole distributed path (per-partition numpy
    tables via mapInPandas, monoid merge, signed-median point query) sits
    under the value hash. The signed-cancellation regime that motivates
    Count-Sketch stays rows-only in count_sketch_vs_cms + its property
    tests."""
    import numpy as np
    import pandas as pd

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.countsketch import (
        NumpyCountSketch,
    )

    ev = load(spark, sf_dir, "events").select((F.col("user_id") % 5).alias("k"))

    def build(batches):
        cs = NumpyCountSketch.from_params(width=64, depth=5, seed=1)
        for pdf in batches:
            cs.add_longs(pdf["k"].to_numpy(dtype="int64"))
        yield pd.DataFrame({"table": [cs.table.tobytes()]})

    parts = ev.repartition(8).mapInPandas(build, "table binary").collect()
    cs = NumpyCountSketch.from_params(width=64, depth=5, seed=1)
    for r in parts:
        cs.table += np.frombuffer(bytes(r["table"]), dtype=np.int64).reshape(
            cs.table.shape
        )
    keys = np.arange(5, dtype=np.int64)
    b = cs._buckets(keys)
    assert all(
        len(set(b[i])) == len(keys) for i in range(b.shape[0])
    ), "witness regime broken: keys collide — pick a collision-free seed"
    est = cs.estimate_longs(keys)
    return spark.createDataFrame(
        [(int(k), int(round(float(e)))) for k, e in zip(keys, est)],
        "key long, est long",
    ).orderBy("key")


@query("count_sketch_vs_cms", witness="count_sketch_exact")
def count_sketch_vs_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Sketch vs Count-Min on the same narrow table (width 32):
    CMS only ever OVERestimates (collisions add), Count-Sketch's signed
    collisions cancel, so its errors are centered on zero — the estimator
    you want when frequencies feed a model rather than a threshold.
    Built distributed: per-partition tables via mapInPandas, merged by
    cellwise addition (both sketches are mergeable monoids). Rows-only
    (table bits aren't SQL); estimator contracts property-tested in
    tests/test_countsketch.py."""
    import numpy as np
    import pandas as pd

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.cms import (
        NumpyCMS,
    )
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.countsketch import (
        NumpyCountSketch,
    )

    ev = load(spark, sf_dir, "events").repartition(8)

    def build(batches):
        cs = NumpyCountSketch.from_params(width=32, depth=5)
        cm = NumpyCMS.from_params(eps=2.0 / 32, confidence=0.96)
        for pdf in batches:
            v = pdf["user_id"].to_numpy(dtype="int64") % 97
            cs.add_longs(v)
            cm.add_longs(v)
        yield pd.DataFrame(
            {
                "cs_table": [cs.table.tobytes()],
                "cm_table": [cm.table.tobytes()],
                "n": [cs.total],
            }
        )

    parts = ev.select("user_id").mapInPandas(
        build, "cs_table binary, cm_table binary, n long"
    ).collect()
    cs = NumpyCountSketch.from_params(width=32, depth=5)
    cm = NumpyCMS.from_params(eps=2.0 / 32, confidence=0.96)
    for r in parts:
        cs.table += np.frombuffer(bytes(r["cs_table"]), dtype=np.int64).reshape(
            cs.table.shape
        )
        cm.table += np.frombuffer(bytes(r["cm_table"]), dtype=np.int64).reshape(
            cm.table.shape
        )

    exact = {
        int(r[0]): int(r[1])
        for r in ev.select((F.col("user_id") % 97).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)))
        .collect()
    }
    keys = np.array(sorted(exact), dtype=np.int64)
    cs_est = cs.estimate_longs(keys)
    cm_est = cm.estimate_longs(keys)
    rows = [
        (
            int(k),
            exact[int(k)],
            float(cs_e),
            int(cm_e),
            float(cs_e) - exact[int(k)],
            int(cm_e) - exact[int(k)],
        )
        for k, cs_e, cm_e in zip(keys, cs_est, cm_est)
    ]
    return spark.createDataFrame(
        rows,
        "key long, exact long, cs_est double, cms_est long, "
        "cs_err double, cms_err long",
    ).orderBy("key")


@query(
    "iblt_set_reconciliation",
    oracle="""
    -- semantic spec of IBLT set reconciliation (Eppstein et al. SIGCOMM
    -- 2011): the exact symmetric difference between first-day and
    -- last-day active-user sets, with side labels. The Spark side must
    -- recover the IDENTICAL keys from two 1024-cell tables — listing,
    -- not estimating, the difference.
    WITH bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi FROM events
    ),
    a AS (SELECT DISTINCT user_id FROM events CROSS JOIN bounds
          WHERE CAST(ts AS DATE) = bounds.lo),
    b AS (SELECT DISTINCT user_id FROM events CROSS JOIN bounds
          WHERE CAST(ts AS DATE) = bounds.hi)
    SELECT user_id, CAST(side AS BIGINT) AS side FROM (
      SELECT user_id, 1 AS side FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      UNION ALL
      SELECT user_id, -1 AS side FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    ) ORDER BY user_id
    """,
)
def iblt_set_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET RECONCILIATION via Invertible Bloom Lookup Tables — the
    Bloom-family member that lists (not estimates) the difference between
    two key sets while exchanging only O(m) cells: which users were
    active on the first fixture day but not the last, and vice versa.
    Each side is ONE distributed aggregate into a 1024-cell table
    (count / key-XOR / checksum-XOR under k=3 md5 hashes), the tables
    subtract cell-wise (common keys cancel algebraically), and the
    kilobyte residual peels on the driver. At 100 TB the two sides never
    exchange keys — only their tables; capacity is sized to the EXPECTED
    DIFFERENCE, not the set sizes (the whole point). Exact recovery is
    hash-checked against the EXCEPT-based oracle."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import iblt

    m, k = 1024, 3
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    keyed = ev.crossJoin(F.broadcast(bounds))
    a = keyed.filter(F.to_date("ts") == F.col("lo")).select("user_id").distinct()
    b = keyed.filter(F.to_date("ts") == F.col("hi")).select("user_id").distinct()
    ta = iblt.iblt_table(a, "user_id", m=m, k=k)
    tb = iblt.iblt_table(b, "user_id", m=m, k=k)
    residual = iblt.iblt_subtract(ta, tb).collect()  # bounded: <= m cells
    recovered = iblt.iblt_peel(residual, m=m, k=k)
    return spark.createDataFrame(
        [(int(key), int(side)) for key, side in recovered],
        "user_id BIGINT, side BIGINT",
    ).orderBy("user_id")


@query(
    "cuckoo_filter_membership",
    oracle="""
    -- Sharded partial-key cuckoo filter (Fan et al. 2014): insert every
    -- distinct custkey, DELETE the all-'F' customers, probe 0..2999.
    -- 32-bit fingerprints: P(any two shard-mates collide on fingerprint
    -- AND bucket pair) ~ n^2*8/(2^32*buckets) ~ 1e-8, and FP per absent
    -- probe ~ 8/2^32 -> ~6e-6 over 3000 probes, so exact set membership
    -- is a valid oracle (same argument as the counting-Bloom and
    -- generational-Bloom queries; verified collision-free on the sf0.01
    -- and sf0.1 fixtures).
    SELECT t.k AS key
    FROM range(0, 3000) t(k)
    WHERE t.k IN (SELECT o_custkey FROM orders WHERE o_orderstatus <> 'F')
    ORDER BY key
    """,
)
def cuckoo_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletable approximate membership via a SHARDED cuckoo filter — the
    modern alternative to the counting Bloom filter one query up: one
    32-bit fingerprint per key instead of k counter positions (~4x less
    space at equal fpp), same delete support, plus slot-level load ~84%.
    Distinct keys shard by xxhash64; each shard builds its filter as a
    pure function of its sorted key set (derandomized eviction), so the
    build is partitioning-invariant; deleting the all-'F' customers leaves
    membership == customers with a live order. Probes route JVM-side to
    their shard and check against broadcast kilobyte blobs — no shuffle
    of the probe stream. See functions/cuckoo.py."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import cuckoo

    orders = load(spark, sf_dir, "orders")
    live = orders.filter(F.col("o_orderstatus") != "F").select("o_custkey")
    all_f = orders.select("o_custkey").distinct().exceptAll(live.distinct())
    table = cuckoo.cuckoo_build_sharded(
        orders, "o_custkey", delete_df=all_f, seed=SEED
    )
    probe = spark.range(0, 3000).select(F.col("id").alias("key"))
    return (
        cuckoo.cuckoo_might_contain(probe, "key", table)
        .filter("might_contain")
        .select("key")
    )


def _kll_day_partials(ev: DataFrame, k: int, seed: int) -> list:
    """Distributed per-day KLL build: one sketch per ingest day via
    applyInPandas (the same at-rest partial shape as the CMS/HLL sketch
    tables), collected as <= #days byte blobs (calendar-bounded)."""
    import pandas as pd

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.kll import (
        KLLSketch,
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLLSketch(k=k, seed=seed)
        # deterministic fold order inside the day partial
        sk.add_many(pdf.sort_values(["value", "event_id"])["value"].to_numpy())
        return pd.DataFrame({"day": [str(pdf["day"].iloc[0])], "sketch": [sk.to_bytes()]})

    rows = (
        ev.select(
            F.to_date("ts").cast("string").alias("day"), "event_id", "value"
        )
        .groupBy("day")
        .applyInPandas(build, "day string, sketch binary")
        .collect()
    )
    return sorted(rows, key=lambda r: r["day"])


def _kll_merge_rows(rows, k: int, seed: int):
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.kll import (
        KLLSketch,
    )

    merged = KLLSketch(k=k, seed=seed)
    for r in rows:
        merged.merge(KLLSketch.from_bytes(bytes(r["sketch"])))
    return merged


_KLL_QS = [0.1, 0.25, 0.5, 0.75, 0.9]


@query(
    "kll_quantiles_exact_witness",
    oracle="""
    -- exactness witness for the KLL sketch-table plumbing: capacity
    -- exceeds the stream (no compaction fires through sf0.1), so the
    -- merged sketch holds every value and its rank convention (smallest
    -- value whose cumulative count reaches ceil(q*n)) answers EXACT
    -- order statistics — the same witness pattern as the IVF full-probe
    -- and LSH full-tables queries.
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
    v AS (SELECT value, COUNT(*) AS c FROM events GROUP BY value),
    w AS (
      SELECT value,
             CAST(SUM(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM v
    ),
    qs AS (SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9]) AS q)
    SELECT qs.q,
           ROUND((SELECT MIN(w.value) FROM w CROSS JOIN n
                  WHERE w.cum >= CEIL(qs.q * n.n)), 6) AS quantile_value
    FROM qs ORDER BY qs.q
    """,
)
def kll_quantiles_exact_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketch table in its EXACTNESS regime (k=262144 >
    stream size through sf0.1, so no compactor ever fires): per-day
    partials built distributed, merged by the mergeable-summary algebra,
    quantiles answered by the sketch's rank convention — hash-checked
    against exact SQL order statistics. Witnesses that the plumbing
    (day partials, serialization, merge, rank math) is lossless; the
    compacting regime is the production twin kll_quantile_sketch_table
    and the KLL property tests."""
    from decimal import ROUND_HALF_UP, Decimal

    ev = load(spark, sf_dir, "events")
    merged = _kll_merge_rows(_kll_day_partials(ev, k=262144, seed=7), 262144, 7)
    rows = []
    for q in _KLL_QS:
        est = merged.quantile(q)
        rows.append(
            (
                q,
                float(
                    Decimal(repr(est)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                ),
            )
        )
    return spark.createDataFrame(rows, "q double, quantile_value double").orderBy("q")


@query("kll_quantile_sketch_table", witness="kll_quantiles_exact_witness")
def kll_quantile_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION KLL quantile sketch table (Karnin-Lang-Liberty 2016,
    k=200): the comparison-based mergeable quantile summary — unlike the
    histogram sketch table it needs NO known value domain, and its
    ~1.7/k rank error is distribution-free. Per-day partials (O(k log n)
    floats each) merge at query time; the result carries the estimate,
    the exact quantile, and the REALIZED rank-error fraction next to the
    bound, so the guarantee is audited in-data (rows-only: seeded
    compaction isn't SQL; the core's invariants are property-tested in
    tests/test_kll.py)."""
    ev = load(spark, sf_dir, "events")
    merged = _kll_merge_rows(_kll_day_partials(ev, k=200, seed=7), 200, 7)
    ests = spark.createDataFrame(
        [(q, merged.quantile(q)) for q in _KLL_QS], "q double, est double"
    )
    n_df = ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
    v = ev.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w = v.select("value", F.sum("c").over(w_cum).cast("long").alias("cum"))
    # exact quantile per q (same rank convention), in-plan
    exact = (
        ests.crossJoin(F.broadcast(n_df))
        .join(w, w["cum"] >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q", "est", "n")
        .agg(F.min("value").alias("exact_value"))
    )
    # realized rank of the estimate: max cum at value <= est
    ranked = (
        exact.join(w.withColumnRenamed("value", "v2").withColumnRenamed("cum", "cum2"),
                   F.col("v2") <= F.col("est"))
        .groupBy("q", "est", "n", "exact_value")
        .agg(F.max("cum2").alias("rank_est"))
    )
    return ranked.select(
        "q",
        F.round("est", 6).alias("kll_estimate"),
        F.round("exact_value", 6).alias("exact_value"),
        F.round(
            F.abs(F.col("rank_est") - F.ceil(F.col("q") * F.col("n"))) / F.col("n"),
            6,
        ).alias("rank_err_frac"),
        (
            F.abs(F.col("rank_est") - F.ceil(F.col("q") * F.col("n"))) / F.col("n")
            <= 0.02
        ).alias("within_bound"),
    ).orderBy("q")


@query(
    "cms_count_mean_min_debias",
    oracle="""
    -- Count-MEAN-min (Deng & Rafiei 2007) vs plain count-min on a
    -- DELIBERATELY narrow sketch (d=5, w=64, ~2k distinct users -> heavy
    -- collisions): each row's counter over-counts by colliding mass, and
    -- CMM subtracts its expectation (N - c)/(w-1), taking the MEDIAN of
    -- the 5 debiased rows (odd depth -> the median is an order statistic,
    -- no interpolation, engine-exact). Positions are md5-portable, the
    -- counter table is exact SQL, so both estimators replicate exactly.
    WITH kc AS (
      SELECT CAST(user_id AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ),
    nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM kc),
    hp AS (
      SELECT key, cnt, i AS r,
             ('0x' || substr(md5(key || '|' || CAST(i AS VARCHAR)), 1, 12))::BIGINT
               % 64 AS pos
      FROM kc CROSS JOIN (SELECT unnest(range(5)) AS i)
    ),
    ctr AS (
      SELECT r, pos, CAST(SUM(cnt) AS BIGINT) AS c FROM hp GROUP BY r, pos
    ),
    probes AS (
      SELECT key, cnt,
             CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rnk
      FROM kc QUALIFY rnk <= 10
    ),
    est AS (
      SELECT p.key, p.cnt, p.rnk, hp.r, ctr.c,
             ctr.c - (nn.n - ctr.c) / 63.0 AS est_r
      FROM probes p
      JOIN hp ON hp.key = p.key
      JOIN ctr ON ctr.r = hp.r AND ctr.pos = hp.pos
      CROSS JOIN nn
    ),
    med AS (
      SELECT key, cnt, rnk, est_r,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY est_r, r) AS mr
      FROM est
    ),
    mn AS (
      SELECT key, CAST(MIN(c) AS BIGINT) AS cms_est FROM est GROUP BY key
    )
    SELECT CAST(med.key AS BIGINT) AS user_id, med.cnt AS exact_cnt,
           mn.cms_est,
           CAST(mn.cms_est - med.cnt AS BIGINT) AS err_cms,
           ROUND(med.est_r, 6) AS cmm_est,
           ROUND(med.est_r - med.cnt, 6) AS err_cmm,
           med.rnk
    FROM med JOIN mn ON mn.key = med.key
    WHERE med.mr = 3
    ORDER BY med.rnk
    """,
)
def cms_count_mean_min_debias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-mean-min debiasing (Deng & Rafiei 2007) demonstrated against
    plain count-min on a sketch narrow enough to collide hard (d=5, w=64
    over ~2k distinct users): CMM subtracts each row's expected colliding
    mass (N - c)/(w-1) and takes the median of the 5 debiased rows —
    depth is odd, so the median is a pure order statistic (row 3 of the
    per-key sort), never an interpolation, and matches DuckDB bit-for-bit.
    Hash positions are the repo's portable md5 scheme, so the whole
    counter array is exact in both engines.

    Scale shape: the only full scan is groupBy(user_id) with map-side
    combine; the counter table is d*w = 320 rows regardless of data
    volume, and probes are a broadcast top-10."""
    d, w_cells = 5, 64
    ev = load(spark, sf_dir, "events")
    kc = ev.groupBy(F.col("user_id").cast("string").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).persist()
    nn = kc.agg(F.sum("cnt").cast("long").alias("n"))
    rs = F.broadcast(spark.range(d).select(F.col("id").cast("int").alias("r")))
    pos = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("key"), F.lit("|"), F.col("r").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % w_cells
    )
    hp = kc.crossJoin(rs).select("key", "cnt", "r", pos.alias("pos"))
    ctr = hp.groupBy("r", "pos").agg(F.sum("cnt").cast("long").alias("c"))
    w_rank = Window.orderBy(F.desc("cnt"), F.asc("key"))
    probes = (
        kc.withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("key", "cnt", "rnk")
    )
    hp_p = hp.select(
        F.col("key").alias("hkey"), F.col("r").alias("hr"), F.col("pos").alias("hpos")
    )
    ctr_p = ctr.select(
        F.col("r").alias("cr"), F.col("pos").alias("cpos"), F.col("c")
    )
    est = (
        probes.join(hp_p, F.col("hkey") == F.col("key"))
        .join(ctr_p, (F.col("cr") == F.col("hr")) & (F.col("cpos") == F.col("hpos")))
        .crossJoin(F.broadcast(nn))
        .select(
            "key",
            "cnt",
            "rnk",
            F.col("hr").alias("r"),
            "c",
            (F.col("c") - (F.col("n") - F.col("c")) / 63.0).alias("est_r"),
        )
    )
    w_med = Window.partitionBy("key").orderBy(F.asc("est_r"), F.asc("r"))
    med = est.withColumn("mr", F.row_number().over(w_med)).filter(F.col("mr") == 3)
    mn = est.groupBy(F.col("key").alias("mkey")).agg(
        F.min("c").cast("long").alias("cms_est")
    )
    return (
        med.join(mn, F.col("mkey") == F.col("key"))
        .select(
            F.col("key").cast("long").alias("user_id"),
            F.col("cnt").alias("exact_cnt"),
            "cms_est",
            (F.col("cms_est") - F.col("cnt")).cast("long").alias("err_cms"),
            F.round("est_r", 6).alias("cmm_est"),
            F.round(F.col("est_r") - F.col("cnt"), 6).alias("err_cmm"),
            "rnk",
        )
        .orderBy("rnk")
    )


_HHH_ORACLE = """
    -- Discounted hierarchical heavy hitters (Cormode et al. 2003) over
    -- the (day -> hour) time hierarchy, phi = 3%: a node is HHH when its
    -- count MINUS already-reported descendant HHH mass clears phi*N —
    -- the drill-down alarm that doesn't re-report a spike at every level.
    -- Thresholds compare as 100*count >= 3*N in exact integers; the
    -- bottom-up discount is two unrolled set-difference aggregations.
    WITH leaf AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(hour(ts) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM leaf),
    h0 AS (
      SELECT day, hr, c FROM leaf CROSS JOIN nn WHERE 100 * c >= 3 * n
    ),
    d AS (
      SELECT day, CAST(SUM(c) AS BIGINT) AS raw FROM leaf GROUP BY day
    ),
    d_disc AS (
      SELECT d.day, d.raw,
             CAST(d.raw - COALESCE((SELECT SUM(h0.c) FROM h0
                               WHERE h0.day = d.day), 0) AS BIGINT) AS disc
      FROM d
    ),
    h1 AS (
      SELECT day, raw, disc FROM d_disc CROSS JOIN nn
      WHERE 100 * disc >= 3 * n
    ),
    root AS (
      SELECT nn.n AS raw,
             CAST(nn.n - COALESCE((SELECT SUM(c) FROM h0), 0)
                  - COALESCE((SELECT SUM(disc) FROM h1), 0) AS BIGINT) AS disc
      FROM nn
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS level, day || ' h' || CAST(hr AS VARCHAR)
               AS node, c AS raw_count, c AS discounted
      FROM h0
      UNION ALL
      SELECT CAST(1 AS BIGINT), day, raw, disc FROM h1
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'ALL', raw, disc
      FROM root CROSS JOIN nn WHERE 100 * disc >= 3 * n
    )
    ORDER BY level, node
    """


def hhh_lattice(leaf: DataFrame) -> DataFrame:
    """Shared discounted-HHH lattice walk over a (day, hr, c) leaf table —
    used by the batch query below and by the streaming twin (the merged
    state-store histogram feeds the same walk, so both share _HHH_ORACLE)."""
    leaf = leaf.persist()
    nn = leaf.agg(F.sum("c").cast("long").alias("n"))
    h0 = (
        leaf.crossJoin(F.broadcast(nn))
        .filter(100 * F.col("c") >= 3 * F.col("n"))
        .select("day", "hr", "c")
        .persist()
    )
    d = leaf.groupBy("day").agg(F.sum("c").cast("long").alias("raw"))
    h0_day = h0.groupBy(F.col("day").alias("hday")).agg(
        F.sum("c").cast("long").alias("h0c")
    )
    d_disc = d.join(h0_day, F.col("hday") == F.col("day"), "left").select(
        "day",
        "raw",
        (F.col("raw") - F.coalesce(F.col("h0c"), F.lit(0))).alias("disc"),
    )
    h1 = (
        d_disc.crossJoin(F.broadcast(nn))
        .filter(100 * F.col("disc") >= 3 * F.col("n"))
        .select("day", "raw", "disc")
        .persist()
    )
    h0_tot = h0.agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("t0"))
    h1_tot = h1.agg(F.coalesce(F.sum("disc"), F.lit(0)).cast("long").alias("t1"))
    root = (
        nn.crossJoin(F.broadcast(h0_tot))
        .crossJoin(F.broadcast(h1_tot))
        .select(
            F.col("n").alias("raw"),
            (F.col("n") - F.col("t0") - F.col("t1")).alias("disc"),
            F.col("n"),
        )
    )
    lvl0 = h0.select(
        F.lit(0).cast("long").alias("level"),
        F.concat(F.col("day"), F.lit(" h"), F.col("hr").cast("string")).alias(
            "node"
        ),
        F.col("c").alias("raw_count"),
        F.col("c").alias("discounted"),
    )
    lvl1 = h1.select(
        F.lit(1).cast("long").alias("level"),
        F.col("day").alias("node"),
        F.col("raw").alias("raw_count"),
        F.col("disc").alias("discounted"),
    )
    lvl2 = root.filter(100 * F.col("disc") >= 3 * F.col("n")).select(
        F.lit(2).cast("long").alias("level"),
        F.lit("ALL").alias("node"),
        F.col("raw").alias("raw_count"),
        F.col("disc").alias("discounted"),
    )
    return lvl0.unionAll(lvl1).unionAll(lvl2).orderBy("level", "node")


@query("hierarchical_heavy_hitters", oracle=_HHH_ORACLE)
def hierarchical_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted hierarchical heavy hitters over (all -> day -> hour) at
    phi = 3%: each level reports only the mass its already-reported
    descendants don't explain, so a one-hour spike surfaces once instead
    of cascading up the hierarchy. All thresholds are exact integer
    cross-multiplications (100*c >= 3*N); the discount is a bottom-up
    anti-mass subtraction, one aggregate per level.

    Scale shape: the leaf aggregate is the only full scan (map-side
    combine on (day,hour)); levels above run on calendar-bounded tables.
    The sketch-regime version of HHH plugs the same lattice walk into the
    CMS estimates (cms_time_range_freq's dyadic machinery); this exact
    twin is what the value-hash gate can verify."""
    ev = load(spark, sf_dir, "events")
    leaf = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return hhh_lattice(leaf)


# ---------------------------------------------------------------------------
# t-digest: the tail-accurate mergeable quantile sketch (Dunning & Ertl,
# arXiv:1902.04023) — production table (rows-only, exact-vs-approx IN the
# result, the reference's identity) + the saturated exactness witness.


@query("tdigest_quantile_sketch_table", witness="tdigest_saturated_exact")
def tdigest_quantile_sketch_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest quantile table per event type: per-partition merging
    digests built executor-side (mapInPandas, one sorted pass per batch),
    merged per type on the driver in deterministic (type, pid) order —
    kilobyte partials move, data doesn't, the sketch-at-rest pattern of
    the KLL/CMS/KMV tables. The k1 scale function concentrates capacity
    at the tails, so p99 is where this sketch beats same-memory KLL.
    Rows-only (centroid arrays aren't SQL); the exact quantile and the
    REALIZED rank error ride in the result (the exact-vs-approx identity),
    and tests/test_tdigest.py pins error envelope, mergeability,
    determinism, and serde."""
    import pandas as pd

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.tdigest import (
        TDigest,
    )

    delta = 100
    ev = load(spark, sf_dir, "events").select("event_type", "value").repartition(16)

    def build(batches):
        digests: dict[str, TDigest] = {}
        pid = None
        for pdf in batches:
            for et, grp in pdf.groupby("event_type"):
                digests.setdefault(et, TDigest(delta)).add_values(
                    grp["value"].to_numpy()
                )
            if pid is None and len(pdf):
                pid = 0
        rows = []
        for et in sorted(digests):
            mb, wb = digests[et].to_bytes()
            rows.append({"event_type": et, "means": mb, "weights": wb})
        yield pd.DataFrame(rows, columns=["event_type", "means", "weights"])

    parts = ev.mapInPandas(
        build, "event_type string, means binary, weights binary"
    ).collect()
    merged: dict[str, TDigest] = {}
    for r in sorted(parts, key=lambda r: (r["event_type"], bytes(r["means"]))):
        td = TDigest.from_bytes(delta, bytes(r["means"]), bytes(r["weights"]))
        if r["event_type"] in merged:
            merged[r["event_type"]].merge(td)
        else:
            merged[r["event_type"]] = td
    qs = [0.5, 0.9, 0.99]
    est_rows = [
        (et, q, merged[et].quantile(q), merged[et].total)
        for et in sorted(merged)
        for q in qs
    ]
    # realized rank of each estimate from ONE exact pass (tie-midpoint
    # rank, consistent with the digest's midpoint convention): the
    # reference's exact-vs-approx identity, reported as rank error — the
    # quantity the k1 scale function actually bounds (value error depends
    # on local density; rank error doesn't).
    aggs = []
    for j, (et, _q, est, _n) in enumerate(est_rows):
        hit = F.col("event_type") == et
        aggs.append(
            F.sum((hit & (F.col("value") < est)).cast("long")).alias(f"lt{j}")
        )
        aggs.append(
            F.sum((hit & (F.col("value") <= est)).cast("long")).alias(f"le{j}")
        )
    counts = load(spark, sf_dir, "events").agg(*aggs).first()
    out = []
    for j, (et, q, est, n) in enumerate(est_rows):
        realized_q = (counts[f"lt{j}"] + counts[f"le{j}"]) / 2.0 / n
        out.append(
            (
                et,
                q,
                round(est, 4),
                round(realized_q, 4),
                abs(realized_q - q) <= 0.02,
            )
        )
    return spark.createDataFrame(
        out,
        "event_type string, q double, tdigest_value double, "
        "realized_q double, within_rank_bound boolean",
    ).orderBy("event_type", "q")


@query(
    "tdigest_saturated_exact",
    oracle="""
    -- t-digest exactness witness (the stream_kll_saturated_exact
    -- discipline): with compression delta = 4n (derived from a count
    -- pre-pass) the k1 size limit is below 2/n everywhere, so no merging
    -- pass ever combines two points — every centroid is a singleton
    -- (asserted in-query) and midpoint interpolation degenerates to
    -- EXACT interpolation between order statistics: centroid i sits at
    -- cumulative midpoint i + 0.5, so quantile(q) = x_i + frac*(x_{i+1}
    -- - x_i) with i = floor(qn - 0.5), frac = qn - (0.5 + i), clamped to
    -- x_0 / x_{n-1} at the extremes. frac is written as tgt - (0.5 + i)
    -- in BOTH engines ((0.5 + i) is exactly representable, so the one
    -- rounding step is shared and the doubles are bit-identical).
    WITH v AS (
      SELECT CAST(value AS DOUBLE) AS value FROM events WHERE user_id < 40
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
    s AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value) - 1 AS i FROM v),
    qs AS (SELECT unnest([0.05, 0.25, 0.5, 0.75, 0.95]) AS q),
    sel AS (
      SELECT qs.q, qs.q * n.n AS tgt,
             CAST(FLOOR(qs.q * n.n - 0.5) AS BIGINT) AS i
      FROM qs CROSS JOIN n
    )
    SELECT sel.q,
           ROUND(CASE
             WHEN sel.tgt <= 0.5 THEN (SELECT value FROM s WHERE i = 0)
             WHEN sel.tgt >= n.n - 0.5
               THEN (SELECT value FROM s ORDER BY i DESC LIMIT 1)
             ELSE a.value + (sel.tgt - (0.5 + CAST(sel.i AS DOUBLE)))
                  * (b.value - a.value)
           END, 6) AS quantile_value
    FROM sel CROSS JOIN n
    LEFT JOIN s a ON a.i = sel.i
    LEFT JOIN s b ON b.i = sel.i + 1
    ORDER BY sel.q
    """,
)
def tdigest_saturated_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest exactness witness: the same distributed build/merge path
    as tdigest_quantile_sketch_table (per-partition mapInPandas digests,
    serde, centroid-concatenation merge) in the SATURATED regime —
    delta = 4n, derived from a one-scalar pre-pass, keeps every k1 bin
    under 2/n so the merging pass never combines points; the
    all-singletons state is asserted, and the midpoint-interpolation
    quantiles must hash-equal the SQL order-statistic interpolation.
    The compressing regime of the SAME code path stays rows-only in
    tdigest_quantile_sketch_table with its in-result error readout and
    tests/test_tdigest.py."""
    import pandas as pd

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.tdigest import (
        TDigest,
    )

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    n = int(ev.count())
    assert n >= 2, "witness regime broken: slice too small"
    delta = 4 * n

    def build(batches):
        td = TDigest(delta)
        for pdf in batches:
            td.add_values(pdf["value"].to_numpy())
        mb, wb = td.to_bytes()
        yield pd.DataFrame({"means": [mb], "weights": [wb]})

    parts = (
        ev.select(F.col("value").cast("double").alias("value"))
        .repartition(8)
        .mapInPandas(build, "means binary, weights binary")
        .collect()
    )
    td = TDigest(delta)
    for r in sorted(parts, key=lambda r: bytes(r["means"])):
        td.merge(TDigest.from_bytes(delta, bytes(r["means"]), bytes(r["weights"])))
    assert td.total == n and td.is_saturated(), (
        "witness regime broken: a t-digest merge combined points — "
        "delta must stay >= ~pi*n"
    )
    # Decimal ROUND_HALF_UP to match DuckDB's ROUND (half-away-from-zero);
    # Python round() is half-even and would flip a dyadic tie at the 7th
    # decimal (the streaming twin already rounds this way)
    from decimal import ROUND_HALF_UP, Decimal

    rows = [
        (
            q,
            float(
                Decimal(repr(td.quantile(q))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            ),
        )
        for q in (0.05, 0.25, 0.5, 0.75, 0.95)
    ]
    return spark.createDataFrame(rows, "q double, quantile_value double").orderBy(
        "q"
    )


@query(
    "xor_filter_membership",
    oracle="""
    -- XOR-filter membership probe: the filter never false-negatives, and
    -- the probe domain is verified FP-free in-query (the counting-Bloom
    -- discipline: a fingerprint collision raises loudly instead of
    -- hash-failing), so the exact IN is a valid oracle.
    SELECT t.k AS key
    FROM range(0, 3000) t(k)
    WHERE t.k IN (SELECT o_custkey FROM orders)
    ORDER BY key
    """,
)
def xor_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XOR-filter membership (Graf & Lemire, ACM JEA 2020): the modern
    STATIC membership structure — ~1.23 slots/key at 16-bit fingerprints
    (~19.7 bits/key for 2^-16 FP), probes are 3 loads + 2 xors with no
    Bloom k-loop, the right shape for FROZEN at-rest key sets
    (contamination gates, eval-set exclusion). Completes the membership
    family's static corner next to Bloom (add-only), counting Bloom
    (deletable), cuckoo (dynamic), and the stable/generational Blooms
    (decaying). Build is the paper's peeling construction, run PER SHARD
    executor-side (applyInPandas over hash-partitioned keys — the
    construction is global per key set, so sharding IS the 100 TB plan);
    kilobyte fingerprint arrays come back to the driver and the probe
    side routes by the same shard function inside mapInPandas. FP-free
    on the probe domain is asserted against the exact member set, and
    determinism/serde/FP-rate are pinned in tests/test_xorfilter.py."""
    import pandas as pd

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions.xorfilter import (
        XorFilter16,
    )

    n_shards = 8
    orders = load(spark, sf_dir, "orders")
    keys = orders.select(
        (F.col("o_custkey") % n_shards).alias("shard"),
        F.col("o_custkey").alias("k"),
    ).distinct()

    def build(pdf):
        xf = XorFilter16.build(pdf["k"].to_numpy())
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "seed": [xf.seed],
                "block_len": [xf.block_len],
                "blob": [xf.to_bytes()],
            }
        )

    parts = keys.groupBy("shard").applyInPandas(
        build, "shard long, seed long, block_len long, blob binary"
    ).collect()
    filters = {
        int(r["shard"]): XorFilter16.from_bytes(
            int(r["seed"]), int(r["block_len"]), bytes(r["blob"])
        )
        for r in parts
    }

    def probe(batches):
        import numpy as np

        for pdf in batches:
            ks = pdf["id"].to_numpy(dtype="int64")
            hit = np.zeros(len(ks), dtype=bool)
            for sh, xf in filters.items():
                mask = ks % n_shards == sh
                if mask.any():
                    hit[mask] = xf.contains(ks[mask])
            yield pd.DataFrame({"key": ks[hit]})

    probed = spark.range(0, 3000).mapInPandas(probe, "key long")
    got = sorted(r["key"] for r in probed.collect())
    exact = sorted(
        r["k"]
        for r in keys.filter(F.col("k") < 3000).select("k").distinct().collect()
    )
    assert got == exact, (
        "witness regime broken: xor-filter fingerprint collision on the "
        "probe domain (false negatives are impossible by construction)"
    )
    return spark.createDataFrame([(int(k),) for k in got], "key long").orderBy(
        "key"
    )
