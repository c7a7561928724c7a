"""Data-quality / ops-surface queries: declarative constraint audits,
embedding outlier ranking, shuffle-skew profiling.

These are the checks a production ingest runs *before* promoting a batch of
training data: schema-level invariants (Deequ-style constraint suites),
distribution-level anomalies (outliers vs the label centroid), and
infrastructure-level diagnostics (would a hash shuffle on this key balance?).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as _T
from bloom_filters_count_min_sketch_spark_streaming_spark.operators import quality
from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

_STOPS_SQL = "('" + "','".join(_T.EN_STOPWORDS) + "')"


@query(
    "data_quality_constraints",
    oracle="""
    -- one row per constraint; all orders-table checks share one scan in
    -- the engine (single agg pass), expressed here as UNION ALL branches
    SELECT 'orders_row_count' AS "constraint",
           CAST(COUNT(*) AS DOUBLE) AS metric_value,
           COUNT(*) > 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'completeness_o_custkey',
           ROUND(COUNT(o_custkey) * 1.0 / COUNT(*), 6),
           ROUND(COUNT(o_custkey) * 1.0 / COUNT(*), 6) = 1.0
    FROM orders
    UNION ALL
    SELECT 'uniqueness_o_orderkey',
           ROUND(COUNT(DISTINCT o_orderkey) * 1.0 / COUNT(o_orderkey), 6),
           ROUND(COUNT(DISTINCT o_orderkey) * 1.0 / COUNT(o_orderkey), 6) = 1.0
    FROM orders
    UNION ALL
    SELECT 'domain_o_orderstatus',
           ROUND(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(o_orderstatus), 6),
           ROUND(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(o_orderstatus), 6) = 1.0
    FROM orders
    UNION ALL
    SELECT 'range_l_quantity',
           ROUND(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(l_quantity), 6),
           ROUND(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(l_quantity), 6) = 1.0
    FROM lineitem
    UNION ALL
    SELECT 'ref_orders_custkey',
           CAST(COUNT(*) AS DOUBLE),
           COUNT(*) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def data_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative constraint suite: all constraints on a table
    are computed in ONE aggregation pass (scan sharing), the referential
    check is an anti-join count. Audit schema (constraint, metric_value,
    passed) — the gate a pipeline evaluates before promoting a batch.
    See operators/quality.py."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    orders_audit = quality.run_checks(
        orders,
        [
            quality.row_count("orders_row_count"),
            quality.completeness("o_custkey"),
            quality.uniqueness("o_orderkey"),
            quality.domain("o_orderstatus", ["O", "F", "P"]),
        ],
    )
    lineitem_audit = quality.run_checks(
        lineitem, [quality.in_range("l_quantity", 1, 50)]
    )
    ref_audit = quality.referential_integrity(
        orders, "o_custkey", customer, "c_custkey", "ref_orders_custkey"
    )
    return orders_audit.unionAll(lineitem_audit).unionAll(ref_audit)


@query(
    "embedding_outlier_scores",
    oracle="""
    -- top-3 per-label outliers by euclidean distance to the label centroid
    WITH e AS (
      SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS x,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ), c AS (
      SELECT label, dim, AVG(x) AS cx FROM e GROUP BY label, dim
    ), d AS (
      SELECT e.vec_id, e.label,
             ROUND(sqrt(SUM(POWER(e.x - c.cx, 2))), 4) AS dist
      FROM e JOIN c ON e.label = c.label AND e.dim = c.dim
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, dist, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY label ORDER BY dist DESC, vec_id) AS rank
      FROM d)
    WHERE rank <= 3
    """,
)
def embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-level anomaly ranking: euclidean distance of each vector
    to its label centroid, top-3 per label. Centroids via posexplode +
    (label, dim) scalar agg (never collects a vector); the centroid table is
    dims x labels rows — broadcast back to the exploded scalars, so the only
    wide shuffle is the per-(vec, label) sum. Rank orders by the ROUNDED
    distance with a vec_id tie-break (engine-stable)."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "dim", "x"
        ),
    )
    c = e.groupBy("label", "dim").agg(F.avg("x").alias("cx"))
    d = (
        e.join(F.broadcast(c), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(F.sqrt(F.sum(F.pow(F.col("x") - F.col("cx"), 2))), 4).alias("dist")
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist"), F.asc("vec_id"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("vec_id", "label", "dist", "rank")
    )


@query(
    "shuffle_skew_profile",
    oracle="""
    -- partition-balance profile of a hypothetical 32-way hash shuffle on
    -- user_id: per-bucket row counts + load factor vs the uniform share.
    -- bucket hash = first 15 hex chars of md5 (60 bits, engine-portable)
    WITH b AS (
      SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 32
               AS bucket
      FROM events
    ), pb AS (
      SELECT bucket, COUNT(*) AS cnt FROM b GROUP BY bucket
    )
    SELECT bucket, CAST(cnt AS BIGINT) AS cnt,
           ROUND(cnt * 32.0 / SUM(cnt) OVER (), 4) AS load_factor
    FROM pb
    """,
)
def shuffle_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Infrastructure diagnostic: would a 32-way hash shuffle on user_id
    balance? Buckets rows by an engine-portable md5-derived 60-bit hash,
    reports per-bucket counts and load factor (cnt / uniform share).
    load_factor >> 1 on any bucket predicts a straggler task — the signal
    that a groupBy/join on this key needs salting (operators/skew.py).
    One hash-agg on the bucket id; the window runs over 32 rows."""
    events = load(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 32
    )
    pb = events.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return pb.select(
        "bucket",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") * 32.0 / F.sum("cnt").over(Window.partitionBy()), 4).alias(
            "load_factor"
        ),
    )


@query(
    "split_leakage_audit",
    oracle="""
    -- Train/val/test leakage audit: near-duplicate pairs (exact Jaccard
    -- >= 0.9; LSH recovers every pair at this threshold — see
    -- dedup_minhash_lsh_pairs) classified by the hash-bucket split of each
    -- endpoint (same md5 80/10/10 rule as dataset_split_stats). Any pair
    -- whose endpoints land in different splits is leakage: the eval split
    -- contains a near-copy of a training document.
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ), sh AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                             for i in range(1, len(ws)-1)]) AS s
      FROM toks WHERE len(ws) >= 3
    ), sets AS (SELECT DISTINCT doc_id, s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sets a JOIN sets b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), dup AS (
      SELECT doc_a, doc_b FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.9
    ), sp AS (
      SELECT doc_id,
             CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100 AS bkt
        FROM documents
      )
    )
    SELECT LEAST(a.split, b.split) AS split_a,
           GREATEST(a.split, b.split) AS split_b,
           COUNT(*) AS n_pairs,
           (LEAST(a.split, b.split) <> GREATEST(a.split, b.split)) AS is_leakage
    FROM dup
    JOIN sp a ON a.doc_id = dup.doc_a
    JOIN sp b ON b.doc_id = dup.doc_b
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-contamination governance: near-dup pairs (MinHash-LSH
    candidates, exact-Jaccard-verified at 0.9) joined against the
    hash-bucket train/val/test assignment; cross-split pairs are leakage.

    Scale shape: the pair graph comes from the banded LSH equi-join (no
    all-pairs work); the split label is a pure projection recomputable from
    the id, so the classification is two broadcast-sized joins on the
    (small) pair set."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import dedup

    docs = load(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=64, bands=16, threshold=0.9)
    bkt = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    sp = docs.select(
        "doc_id",
        F.when(bkt < 80, "train").when(bkt < 90, "val").otherwise("test").alias(
            "split"
        ),
    )
    a = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    lo = F.least("sa", "sb")
    hi = F.greatest("sa", "sb")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(lo.alias("split_a"), hi.alias("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            (F.col("split_a") != F.col("split_b")).alias("is_leakage"),
        )
        .orderBy("split_a", "split_b")
    )


@query(
    "analyze_column_stats",
    oracle="""
    -- ANALYZE-style planner statistics per column in ONE scan-sharing
    -- pass: NDV, null count, numeric min/max (string columns carry min/max
    -- lexicographically in the *_str columns). These are the CBO inputs
    -- (join reordering, broadcast thresholds) every engine collects.
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(DISTINCT o_orderkey) AS ndv_ok, COUNT(o_orderkey) AS nn_ok,
             MIN(o_orderkey) AS mn_ok, MAX(o_orderkey) AS mx_ok,
             COUNT(DISTINCT o_custkey) AS ndv_ck, COUNT(o_custkey) AS nn_ck,
             MIN(o_custkey) AS mn_ck, MAX(o_custkey) AS mx_ck,
             COUNT(DISTINCT o_totalprice) AS ndv_tp, COUNT(o_totalprice) AS nn_tp,
             MIN(o_totalprice) AS mn_tp, MAX(o_totalprice) AS mx_tp,
             COUNT(DISTINCT o_orderstatus) AS ndv_os, COUNT(o_orderstatus) AS nn_os,
             MIN(o_orderstatus) AS mns_os, MAX(o_orderstatus) AS mxs_os,
             COUNT(DISTINCT o_orderpriority) AS ndv_op, COUNT(o_orderpriority) AS nn_op,
             MIN(o_orderpriority) AS mns_op, MAX(o_orderpriority) AS mxs_op
      FROM orders
    )
    SELECT 'o_orderkey' AS column_name, ndv_ok AS ndv, n_rows - nn_ok AS n_nulls,
           CAST(mn_ok AS DOUBLE) AS min_num, CAST(mx_ok AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
    FROM s
    UNION ALL
    SELECT 'o_custkey', ndv_ck, n_rows - nn_ck,
           CAST(mn_ck AS DOUBLE), CAST(mx_ck AS DOUBLE), NULL, NULL FROM s
    UNION ALL
    SELECT 'o_totalprice', ndv_tp, n_rows - nn_tp, mn_tp, mx_tp, NULL, NULL FROM s
    UNION ALL
    SELECT 'o_orderstatus', ndv_os, n_rows - nn_os, NULL, NULL, mns_os, mxs_os FROM s
    UNION ALL
    SELECT 'o_orderpriority', ndv_op, n_rows - nn_op, NULL, NULL, mns_op, mxs_op FROM s
    ORDER BY column_name
    """,
)
def analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE-style column statistics (NDV / nulls / min / max) for
    five orders columns in a single shared scan — one wide aggregate, then
    a stack() unpivot to one row per column. At scale NDV would come from
    the HLL sketches (hll_sketch_table_merge); here exact NDV keeps the
    oracle exact."""
    o = load(spark, sf_dir, "orders")
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols + str_cols:
        aggs += [
            F.count_distinct(F.col(c)).alias(f"ndv_{c}"),
            F.count(F.col(c)).alias(f"nn_{c}"),
            F.min(F.col(c)).alias(f"mn_{c}"),
            F.max(F.col(c)).alias(f"mx_{c}"),
        ]
    s = o.agg(*aggs)
    parts = []
    # bare column refs inside stack() would carry their own struct field
    # names (STACK_COLUMN_DIFF_TYPES); CASTs normalize them
    for c in num_cols:
        parts.append(
            f"'{c}', CAST(ndv_{c} AS BIGINT), n_rows - nn_{c}, "
            f"CAST(mn_{c} AS DOUBLE), CAST(mx_{c} AS DOUBLE), "
            f"CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in str_cols:
        parts.append(
            f"'{c}', CAST(ndv_{c} AS BIGINT), n_rows - nn_{c}, "
            f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
            f"CAST(mn_{c} AS STRING), CAST(mx_{c} AS STRING)"
        )
    stacked = s.selectExpr(
        f"stack({len(parts)}, {', '.join(parts)}) AS "
        "(column_name, ndv, n_nulls, min_num, max_num, min_str, max_str)"
    )
    return stacked.orderBy("column_name")


@query(
    "parquet_footer_stats",
    oracle="""
    -- Both engines decode the SAME parquet footer bytes, so every count
    -- is exact. (The oracle harness runs at sf0.01 — the literal path
    -- mirrors the view registration; queries() stays sf-parametric.)
    SELECT path_in_schema AS col,
           CAST(SUM(num_values) AS BIGINT) AS n_values,
           CAST(SUM(stats_null_count) AS BIGINT) AS null_count,
           CAST(SUM(total_compressed_size) AS BIGINT) AS compressed_bytes,
           CAST(SUM(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes
    FROM parquet_metadata('/root/testdata/sf0.01/lineitem.parquet')
    GROUP BY path_in_schema
    ORDER BY compressed_bytes DESC, col
    """,
)
def parquet_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage introspection from parquet footers — which columns dominate
    the table's bytes, what compresses well, where the nulls are. The
    footer is O(KB) regardless of table size, so reading it driver-side
    (pyarrow) is the legitimately-cheap path; at 100 TB the same audit
    maps this per-file over the file listing. The DuckDB oracle decodes
    the identical footer via parquet_metadata(), making the decode itself
    the thing under test."""
    import os as _os

    import pyarrow.parquet as pq

    md = pq.read_metadata(_os.path.join(sf_dir, "lineitem.parquet"))
    acc: dict[str, list[int]] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            c = g.column(ci)
            name = c.path_in_schema
            a = acc.setdefault(name, [0, 0, 0, 0])
            a[0] += c.num_values
            a[1] += (c.statistics.null_count or 0) if c.statistics else 0
            a[2] += c.total_compressed_size
            a[3] += c.total_uncompressed_size
    rows = [(k, *v) for k, v in acc.items()]
    return spark.createDataFrame(
        rows,
        "col string, n_values long, null_count long, "
        "compressed_bytes long, uncompressed_bytes long",
    ).orderBy(F.desc("compressed_bytes"), "col")


@query(
    "quality_logistic_score",
    oracle="""
    -- fixed-weight logistic quality classifier: the linear combination is
    -- ONE elementwise expression (no float aggregation), textually
    -- identical in both engines, so the doubles agree bit-for-bit through
    -- exp(); the per-source means are rounded-term DECIMAL sums
    WITH f AS (
      SELECT source,
             len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
               AS n_tok,
             len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains(
                               ['the','a','of','and','to','in','is','it','that','for'],
                               w)))
               AS n_stop,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM documents
    ),
    s AS (
      SELECT source,
             ROUND(1.0 / (1.0 + exp(-(
               -1.5
               + 4.0 * (n_stop * 1.0 / n_tok)
               - 6.0 * (n_punct * 1.0 / n_chars)
               + 0.004 * n_tok
             ))), 6) AS score
      FROM f WHERE n_tok > 0 AND n_chars > 0
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score,
           CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep
    FROM s GROUP BY source ORDER BY source
    """,
)
def quality_logistic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, engine-native: a fixed-weight
    logistic classifier over cheap text features (stopword density,
    punctuation density, length) evaluated as ONE whole-stage-codegen'd
    expression — the shape of fastText-style quality scoring when the
    model is distilled to a linear scorer, with zero Python in the hot
    path. Per-source keep rates audit the gate before it drops data."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as T

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(T.word_tokens(F.col("text")))
    n_chars = F.length("text")
    lin = T.logistic_quality_linear(F.col("text"))
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-lin)), 6)
    s = docs.filter((n_tok > 0) & (n_chars > 0)).select(
        "source", score.alias("score")
    )
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
            F.sum((F.col("score") >= 0.5).cast("long")).cast("long").alias("n_keep"),
        )
        .orderBy("source")
    )


@query(
    "ab_test_zscore",
    oracle="""
    -- Welch two-sample z-test between every pair of event types: moments
    -- from rounded-term DECIMAL sums (order-independent), then a pure
    -- elementwise IEEE chain for variance / standard error / z
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE)
               AS s2
      FROM events GROUP BY event_type
    ),
    st AS (
      SELECT event_type, n,
             s1 / n AS mean,
             (s2 - s1 * s1 / n) / (n - 1) AS var
      FROM m
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           ROUND(a.mean, 6) AS mean_a, ROUND(b.mean, 6) AS mean_b,
           ROUND((a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n), 4) AS z,
           CAST(CASE WHEN abs((a.mean - b.mean)
                              / sqrt(a.var / a.n + b.var / b.n)) > 1.96
                     THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM st a JOIN st b ON a.event_type < b.event_type
    ORDER BY type_a, type_b
    """,
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test machinery: Welch z-scores for the difference in mean value
    between every pair of event types. One moment-aggregation pass
    (count / sum / sum-of-squares as rounded-term DECIMAL sums — the same
    order-independence contract every float aggregate here uses), then a
    |types|² broadcast self-join of 5 rows. The distributed shape of
    experiment scorecards: moments shuffle once, pair arithmetic is free."""
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("value", 6).cast("decimal(28,6)")).cast("double").alias("s1"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("s2"),
    )
    st = m.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var"
        ),
    )
    a = st.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("na"),
        F.col("mean").alias("ma"),
        F.col("var").alias("va"),
    )
    b = st.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("nb"),
        F.col("mean").alias("mb"),
        F.col("var").alias("vb"),
    )
    z = (F.col("ma") - F.col("mb")) / F.sqrt(
        F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.round("ma", 6).alias("mean_a"),
            F.round("mb", 6).alias("mean_b"),
            F.round(z, 4).alias("z"),
            (F.abs(z) > 1.96).cast("long").alias("significant"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "mutual_information_lang_source",
    oracle="""
    -- MI(lang; source) in bits from exact joint/marginal counts: each
    -- cell's p*log2 term is an exact-int-ratio double, ROUNDed, then
    -- DECIMAL-summed — the KL-machinery determinism contract
    WITH j AS (
      SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM j),
    ml AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl FROM j GROUP BY lang),
    ms AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM j GROUP BY source),
    terms AS (
      SELECT ROUND(
               (j.c * 1.0 / n.n)
               * log2((j.c * 1.0 * n.n) / (ml.cl * 1.0 * ms.cs)), 10) AS t
      FROM j JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN n
    )
    SELECT ROUND(CAST(SUM(CAST(t AS DECIMAL(28,10))) AS DOUBLE), 6)
             AS mi_bits,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM j) AS n_cells
    FROM terms
    """,
)
def mutual_information_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source in bits —
    the dependence/feature-relevance audit (high MI between a metadata
    column and the content source flags collection bias). One joint-count
    pass; marginals re-aggregate the |lang|x|source| cell table; per-cell
    terms are exact int ratios through log2, rounded then DECIMAL-summed."""
    docs = load(spark, sf_dir, "documents")
    j = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c")).persist()
    # grand total as a broadcast 1-row crossJoin, not a driver collect —
    # construction stays lazy, one job materializes everything
    tot = j.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    ml = j.groupBy("lang").agg(F.sum("c").cast("long").alias("cl"))
    ms = j.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    t = F.round(
        (F.col("c") * 1.0 / F.col("n"))
        * F.log2(
            (F.col("c") * 1.0 * F.col("n"))
            / (F.col("cl") * 1.0 * F.col("cs"))
        ),
        10,
    )
    return (
        j.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .select(t.alias("t"), "n_cells")
        .agg(
            F.round(
                F.sum(F.col("t").cast("decimal(28,10)")).cast("double"), 6
            ).alias("mi_bits"),
            F.max("n_cells").alias("n_cells"),
        )
    )


@query(
    "score_threshold_sweep",
    oracle="""
    -- classifier-gate evaluation: confusion counts and precision/recall
    -- at five thresholds in ONE pass (scores computed once, thresholds a
    -- broadcast cross join); label = doc is English. Counts are exact
    -- ints; ratios are exact-int divisions rounded at the end.
    WITH f AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             ROUND(1.0 / (1.0 + exp(-(
               -1.5
               + 4.0 * (len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains(
                               ['the','a','of','and','to','in','is','it','that','for'],
                               w))) * 1.0
                        / len(list_filter(string_split(lower(text), ' '),
                                          w -> w <> '')))
               - 6.0 * (length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
                        / length(text))
               + 0.004 * len(list_filter(string_split(lower(text), ' '),
                                         w -> w <> ''))
             ))), 6) AS score
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
        AND length(text) > 0
    ),
    th AS (SELECT unnest([0.3, 0.4, 0.5, 0.6, 0.7]) AS threshold)
    SELECT th.threshold,
           CAST(SUM(CASE WHEN score >= threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN score >= threshold AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN score < threshold AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           ROUND(SUM(CASE WHEN score >= threshold AND y = 1 THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN score >= threshold THEN 1 ELSE 0 END), 0), 6)
             AS precision,
           ROUND(SUM(CASE WHEN score >= threshold AND y = 1 THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(y), 0), 6) AS recall
    FROM f CROSS JOIN th
    GROUP BY th.threshold ORDER BY th.threshold
    """,
)
def score_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold sweep for the logistic quality gate (ROC/PR points):
    confusion counts, precision, recall at five cutoffs against an
    is-English proxy label — the eval harness you run before trusting a
    filter to drop data. Scores are computed ONCE; the threshold table
    cross-joins (5 broadcast rows), so the sweep costs one scan
    regardless of how many operating points are evaluated."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as T

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(T.word_tokens(F.col("text")))
    lin = T.logistic_quality_linear(F.col("text"))
    f = docs.filter((n_tok > 0) & (F.length("text") > 0)).select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-lin)), 6).alias("score"),
    )
    th = spark.createDataFrame([(t,) for t in (0.3, 0.4, 0.5, 0.6, 0.7)], "threshold double")
    j = f.crossJoin(F.broadcast(th))
    pred = (F.col("score") >= F.col("threshold")).cast("long")
    return (
        j.groupBy("threshold")
        .agg(
            F.sum(pred * F.col("y")).cast("long").alias("tp"),
            F.sum(pred * (1 - F.col("y"))).cast("long").alias("fp"),
            F.sum((1 - pred) * F.col("y")).cast("long").alias("fn"),
            F.round(
                F.sum(pred * F.col("y")) * 1.0 / F.nullif(F.sum(pred), F.lit(0)), 6
            ).alias("precision"),
            F.round(
                F.sum(pred * F.col("y")) * 1.0 / F.nullif(F.sum("y"), F.lit(0)), 6
            ).alias("recall"),
        )
        .orderBy("threshold")
    )


@query(
    "chi_square_lang_source",
    oracle="""
    -- chi-square independence test for (lang, source): expected counts
    -- are exact int ratios, per-cell terms ROUND -> DECIMAL-summed; df =
    -- (|lang|-1)(|source|-1). The frequentist twin of the MI audit.
    WITH j AS (
      SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM j),
    ml AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl FROM j GROUP BY lang),
    ms AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM j GROUP BY source),
    cells AS (
      SELECT l.lang, s.source,
             COALESCE(j.c, 0) AS o,
             ml.cl * 1.0 * ms.cs / n.n AS e
      FROM (SELECT DISTINCT lang FROM j) l
      CROSS JOIN (SELECT DISTINCT source FROM j) s
      LEFT JOIN j ON j.lang = l.lang AND j.source = s.source
      JOIN ml ON ml.lang = l.lang
      JOIN ms ON ms.source = s.source
      CROSS JOIN n
    )
    SELECT ROUND(CAST(SUM(CAST(ROUND((o - e) * (o - e) / e, 8)
                               AS DECIMAL(28,8))) AS DOUBLE), 4) AS chi2,
           CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1)
                AS BIGINT) AS dof,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cells) AS n_cells
    FROM cells
    """,
)
def chi_square_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between document language and
    source — the frequentist counterpart of the MI audit, including the
    zero-observed cells a naive join drops (full lang × source grid via
    cross join). Expected counts are exact int ratios; the statistic is a
    rounded-term DECIMAL sum."""
    docs = load(spark, sf_dir, "documents")
    j = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c")).persist()
    # grand total via broadcast 1-row crossJoin (no eager driver collect)
    tot = j.agg(F.sum("c").cast("long").alias("n"))
    ml = j.groupBy("lang").agg(F.sum("c").cast("long").alias("cl"))
    ms = j.groupBy("source").agg(F.sum("c").cast("long").alias("cs"))
    langs = j.select("lang").distinct()
    sources = j.select("source").distinct()
    cells = (
        langs.crossJoin(sources)
        .join(j, ["lang", "source"], "left")
        .join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            F.coalesce("c", F.lit(0)).alias("o"),
            (F.col("cl") * 1.0 * F.col("cs") / F.col("n")).alias("e"),
        )
    )
    term = F.round((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 8)
    return cells.agg(
        F.round(F.sum(term.cast("decimal(28,8)")).cast("double"), 4).alias("chi2"),
        (
            (F.count_distinct("lang") - 1) * (F.count_distinct("source") - 1)
        ).cast("long").alias("dof"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )


@query(
    "score_calibration_bins",
    oracle="""
    -- reliability diagram for the logistic gate: score-decile bins vs
    -- observed is-English rate per bin. Bin edges are fixed (0.1 grid) so
    -- binning is exact; rates are exact-int ratios.
    WITH f AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             ROUND(1.0 / (1.0 + exp(-(
               -1.5
               + 4.0 * (len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains(
                               ['the','a','of','and','to','in','is','it','that','for'],
                               w))) * 1.0
                        / len(list_filter(string_split(lower(text), ' '),
                                          w -> w <> '')))
               - 6.0 * (length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
                        / length(text))
               + 0.004 * len(list_filter(string_split(lower(text), ' '),
                                         w -> w <> ''))
             ))), 6) AS score
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
        AND length(text) > 0
    )
    SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(ROUND(score, 6) AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score,
           ROUND(SUM(y) * 1.0 / COUNT(*), 6) AS observed_rate
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability diagram) of the logistic quality gate:
    decile score bins vs the observed positive rate — a well-calibrated
    gate has mean_score ≈ observed_rate per bin, and miscalibration is
    what turns a threshold into a silent over/under-filter. Completes the
    gate-evaluation pair next to score_threshold_sweep."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as T

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(T.word_tokens(F.col("text")))
    lin = T.logistic_quality_linear(F.col("text"))
    f = docs.filter((n_tok > 0) & (F.length("text") > 0)).select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-lin)), 6).alias("score"),
    )
    bin_ = F.least(F.floor(F.col("score") * 10).cast("long"), F.lit(9))
    return (
        f.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round("score", 6).cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_score"),
            F.round(F.sum("y") * 1.0 / F.count(F.lit(1)), 6).alias("observed_rate"),
        )
        .orderBy("bin")
    )


@query(
    "psi_feature_drift",
    oracle="""
    -- Population Stability Index between the first and second half of the
    -- event stream: bins = the reference half's own deciles
    -- (percentile_cont on identical doubles), PSI = sum (p - q) ln(p/q)
    -- with per-bin ROUND -> DECIMAL sum. PSI > 0.2 is the classic
    -- retrain/investigate trigger.
    WITH b AS (
      SELECT epoch_us(MIN(ts))
             + CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 2) AS BIGINT)
               AS cut_us
      FROM events
    ),
    halves AS (
      SELECT CASE WHEN epoch_us(ts) < b.cut_us THEN 0 ELSE 1 END AS h, value
      FROM events CROSS JOIN b
    ),
    edges AS (
      SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
               AS e
      FROM halves WHERE h = 0
    ),
    binned AS (
      SELECT h,
             1 + CAST(
               (value > e[1])::INT + (value > e[2])::INT + (value > e[3])::INT
               + (value > e[4])::INT + (value > e[5])::INT + (value > e[6])::INT
               + (value > e[7])::INT + (value > e[8])::INT + (value > e[9])::INT
               AS BIGINT) AS bin
      FROM halves CROSS JOIN edges
    ),
    dist AS (
      SELECT bin,
             SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) * 1.0
               / (SELECT COUNT(*) FROM binned WHERE h = 0) AS p,
             SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) * 1.0
               / (SELECT COUNT(*) FROM binned WHERE h = 1) AS q
      FROM binned GROUP BY bin
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(CAST(SUM(CAST(ROUND((p - q) * ln(p / q), 10)
                               AS DECIMAL(28,10))) AS DOUBLE), 6) AS psi
    FROM dist
    """,
)
def psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution between
    the stream's first and second half — THE production drift metric for
    deployed models (PSI > 0.2 = investigate, > 0.25 = retrain). Bin
    edges are the reference period's own deciles, so the reference
    distribution is uniform by construction and PSI measures pure shift.
    One percentile pass on the reference half, one binned count pass, a
    10-term decimal sum. Every scalar constant (time cut, decile edges,
    half sizes) stays IN the plan as a broadcast 1-row cross join — no
    driver job runs at query-construction time."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.floor((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 2)
        ).alias("cut")
    )
    halves = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            (F.unix_micros("ts") >= F.col("cut")).cast("int").alias("h"), "value"
        )
        .persist()
    )
    probs = [i / 10 for i in range(1, 10)]
    edges = halves.filter(F.col("h") == 0).agg(
        *[
            F.expr(f"percentile_cont({p}) WITHIN GROUP (ORDER BY value)").alias(
                f"e{i}"
            )
            for i, p in enumerate(probs, 1)
        ]
    )
    bin_expr = F.lit(1)
    for i in range(1, 10):
        bin_expr = bin_expr + (F.col("value") > F.col(f"e{i}")).cast("int")
    binned = halves.crossJoin(F.broadcast(edges)).select(
        "h", bin_expr.cast("long").alias("bin")
    )
    sizes = binned.agg(
        F.sum((F.col("h") == 0).cast("long")).alias("n0"),
        F.sum((F.col("h") == 1).cast("long")).alias("n1"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).alias("c1"),
    )
    dist = per_bin.crossJoin(F.broadcast(sizes)).select(
        "bin",
        (F.col("c0") * 1.0 / F.col("n0")).alias("p"),
        (F.col("c1") * 1.0 / F.col("n1")).alias("q"),
    )
    term = F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 10)
    return dist.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.round(
            F.sum(term.cast("decimal(28,10)")).cast("double"), 6
        ).alias("psi"),
    )


@query(
    "ks_test_two_sample",
    oracle="""
    -- exact two-sample Kolmogorov-Smirnov statistic between the stream's
    -- halves: D = max |ECDF1 - ECDF2| over the pooled sample. ECDFs are
    -- exact-int running counts over a totally ordered pooled sort; the
    -- critical value at alpha=0.05 is the closed form 1.358*sqrt((n+m)/nm).
    WITH b AS (
      SELECT epoch_us(MIN(ts))
             + CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 2) AS BIGINT)
               AS cut_us
      FROM events
    ),
    pooled AS (
      SELECT CASE WHEN epoch_us(ts) < b.cut_us THEN 0 ELSE 1 END AS h,
             value, event_id
      FROM events CROSS JOIN b
    ),
    n AS (
      SELECT CAST(SUM(CASE WHEN h = 0 THEN 1 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN h = 1 THEN 1 END) AS BIGINT) AS n1
      FROM pooled
    ),
    walk AS (
      SELECT SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY value, event_id ROWS UNBOUNDED PRECEDING) AS c0,
             SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END)
               OVER (ORDER BY value, event_id ROWS UNBOUNDED PRECEDING) AS c1
      FROM pooled
    )
    SELECT n.n0, n.n1,
           ROUND(MAX(ABS(c0 * 1.0 / n.n0 - c1 * 1.0 / n.n1)), 6) AS ks_d,
           ROUND(1.358 * sqrt((n.n0 + n.n1) * 1.0 / (n.n0 * n.n1)), 6)
             AS crit_05
    FROM walk CROSS JOIN n
    GROUP BY n.n0, n.n1
    """,
)
def ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the stream's
    halves — the nonparametric companion to the PSI drift metric (PSI
    needs bins; KS sees every quantile). One pooled sort (single window
    over a total order), running ECDF counts, max gap; the alpha=0.05
    critical value comes from the asymptotic closed form. At 100 TB you'd
    run this on a uniform sample — the statistic converges at sqrt(n).
    All scalar constants (time cut, half sizes, critical value) stay IN
    the plan as broadcast 1-row cross joins — no driver job runs at
    query-construction time."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.floor((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 2)
        ).alias("cut")
    )
    pooled = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            (F.unix_micros("ts") >= F.col("cut")).cast("int").alias("h"),
            "value",
            "event_id",
        )
        .persist()
    )
    sizes = pooled.agg(
        F.sum((F.col("h") == 0).cast("long")).alias("n0"),
        F.sum((F.col("h") == 1).cast("long")).alias("n1"),
    )
    w = Window.orderBy("value", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = pooled.select(
        F.sum((F.col("h") == 0).cast("long")).over(w).alias("c0"),
        F.sum((F.col("h") == 1).cast("long")).over(w).alias("c1"),
    )
    return (
        walk.crossJoin(F.broadcast(sizes))
        .groupBy("n0", "n1")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("c0") * 1.0 / F.col("n0")
                        - F.col("c1") * 1.0 / F.col("n1")
                    )
                ),
                6,
            ).alias("ks_d"),
            F.round(
                F.lit(1.358)
                * F.sqrt(
                    (F.first("n0") + F.first("n1"))
                    * 1.0
                    / (F.first("n0") * F.first("n1"))
                ),
                6,
            ).alias("crit_05"),
        )
        .select("n0", "n1", "ks_d", "crit_05")
    )


@query(
    "experiment_sample_size",
    oracle="""
    -- sample-size calculator from the metric's own observed variance:
    -- n per arm = 2 * (z_alpha/2 + z_beta)^2 * var / mde^2 for a 5%/80%
    -- test at several minimum-detectable relative effects. Variance from
    -- rounded-term DECIMAL moments; z constants are exact literals.
    WITH m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE)
               AS s2
      FROM events
    ),
    st AS (
      SELECT s1 / n AS mean, (s2 - s1 * s1 / n) / (n - 1) AS var FROM m
    ),
    mde AS (SELECT unnest([0.01, 0.02, 0.05, 0.10]) AS rel)
    SELECT mde.rel AS relative_mde,
           ROUND(st.mean, 6) AS metric_mean,
           CAST(CEIL(2 * POWER(1.959963985 + 0.8416212336, 2) * st.var
                     / POWER(mde.rel * st.mean, 2)) AS BIGINT) AS n_per_arm
    FROM st CROSS JOIN mde
    ORDER BY relative_mde
    """,
)
def experiment_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size planning from the metric's own variance: users per arm
    to detect 1/2/5/10% relative effects at alpha=0.05, power=0.80 — the
    'can we even run this test' table computed before any experiment
    ships. One decimal-moment pass; the z constants are exact literals so
    the closed form is an identical double chain."""
    ev = load(spark, sf_dir, "events")
    m = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("value", 6).cast("decimal(28,6)")).cast("double").alias("s1"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("s2"),
    ).collect()[0]
    n, s1, s2 = int(m["n"]), float(m["s1"]), float(m["s2"])
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    mdes = spark.createDataFrame([(r,) for r in (0.01, 0.02, 0.05, 0.10)], "rel double")
    z2 = (1.959963985 + 0.8416212336) ** 2
    return mdes.select(
        F.col("rel").alias("relative_mde"),
        F.round(F.lit(mean), 6).alias("metric_mean"),
        F.ceil(
            F.lit(2.0) * F.lit(z2) * F.lit(var) / F.pow(F.col("rel") * F.lit(mean), 2)
        )
        .cast("long")
        .alias("n_per_arm"),
    ).orderBy("relative_mde")


@query(
    "mann_whitney_u_halves",
    oracle="""
    -- Mann-Whitney U rank-sum test between the stream's time halves (the
    -- nonparametric mean-shift companion of ks_test_two_sample): average
    -- ranks over the pooled sort kept EXACT by working with 2*rank sums
    -- (each tied block of c rows starting after s rows contributes
    -- avg rank (2s+c+1)/2 per row), tie-corrected normal approximation.
    WITH b AS (
      SELECT epoch_us(MIN(ts))
             + CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 2) AS BIGINT)
               AS cut_us
      FROM events
    ),
    pooled AS (
      SELECT CASE WHEN epoch_us(ts) >= b.cut_us THEN 1 ELSE 0 END AS h, value
      FROM events CROSS JOIN b
    ),
    n AS (
      SELECT CAST(SUM(CASE WHEN h = 0 THEN 1 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN h = 1 THEN 1 END) AS BIGINT) AS n1
      FROM pooled
    ),
    v AS (
      SELECT value, COUNT(*) AS c,
             CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM pooled GROUP BY value
    ),
    w AS (
      SELECT c, c1,
             CAST(COALESCE(SUM(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS s
      FROM v
    ),
    agg AS (
      SELECT CAST(SUM(c1 * (2 * s + c + 1)) AS BIGINT) AS two_r1,
             CAST(SUM(c * c * c - c) AS BIGINT) AS tie_sum
      FROM w
    )
    SELECT n.n0, n.n1,
           CAST(agg.two_r1 - n.n1 * (n.n1 + 1) AS BIGINT) AS two_u1,
           ROUND(((agg.two_r1 - n.n1 * (n.n1 + 1)) / 2.0 - n.n0 * n.n1 / 2.0)
                 / sqrt(n.n0 * n.n1 / 12.0
                        * ((n.n0 + n.n1 + 1)
                           - agg.tie_sum * 1.0
                             / ((n.n0 + n.n1) * (n.n0 + n.n1 - 1)))), 6) AS z
    FROM agg CROSS JOIN n
    """,
)
def mann_whitney_u_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the stream's first and second time halves —
    the rank-based companion of ks_test_two_sample (KS sees any
    distributional change; U targets location shift, robust to outliers).
    All rank arithmetic stays in exact integers (2*rank-sums over tied
    blocks), one grouped pass over distinct values + a window for the
    preceding-count; the tie-corrected z is a single closed-form
    expression on exact integers."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.floor((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 2)
        ).alias("cut")
    )
    pooled = ev.crossJoin(F.broadcast(bounds)).select(
        (F.unix_micros("ts") >= F.col("cut")).cast("int").alias("h"), "value"
    )
    n = pooled.agg(
        F.sum((F.col("h") == 0).cast("long")).alias("n0"),
        F.sum((F.col("h") == 1).cast("long")).alias("n1"),
    )
    v = pooled.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum((F.col("h") == 1).cast("long")).alias("c1"),
    )
    w_prev = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    w = v.select(
        "c",
        "c1",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0)).cast("long").alias("s"),
    )
    agg = w.agg(
        F.sum(F.col("c1") * (2 * F.col("s") + F.col("c") + 1))
        .cast("long")
        .alias("two_r1"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_sum"),
    )
    nn = F.col("n0") + F.col("n1")
    u1_x2 = F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)
    z = F.round(
        (u1_x2 / 2.0 - F.col("n0") * F.col("n1") / 2.0)
        / F.sqrt(
            F.col("n0")
            * F.col("n1")
            / 12.0
            * ((nn + 1) - F.col("tie_sum") * 1.0 / (nn * (nn - 1)))
        ),
        6,
    )
    return agg.crossJoin(F.broadcast(n)).select(
        "n0", "n1", u1_x2.cast("long").alias("two_u1"), z.alias("z")
    )


@query(
    "anova_f_oneway_value_by_type",
    oracle="""
    -- one-way ANOVA of event value across event types: per-group decimal
    -- moments (terms rounded before the sum — the repo's float-agg rule),
    -- then the closed-form F from exact-identical doubles. The moment
    -- pass is the same single-scan shape the experiment scorecards use.
    WITH g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s_g,
             CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE)
               AS ss_g
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(s_g AS DECIMAL(28,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(ss_g AS DECIMAL(28,6))) AS DOUBLE) AS ss
      FROM g
    ),
    parts AS (
      SELECT tot.k, tot.n,
             CAST(SUM(CAST(ROUND(g.s_g * g.s_g / g.n_g, 6)
                           AS DECIMAL(28,6))) AS DOUBLE)
               - tot.s * tot.s / tot.n AS ssb,
             tot.ss - CAST(SUM(CAST(ROUND(g.s_g * g.s_g / g.n_g, 6)
                                    AS DECIMAL(28,6))) AS DOUBLE) AS ssw
      FROM g CROSS JOIN tot
      GROUP BY tot.k, tot.n, tot.s, tot.ss
    )
    SELECT k, n, ROUND(ssb, 4) AS ss_between, ROUND(ssw, 4) AS ss_within,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat
    FROM parts
    """,
)
def anova_f_oneway_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic of event value across the 5 event types —
    the k-group generalization of the scorecards' pairwise z-tests: one
    moment pass per group (count / decimal sum / decimal sum of squares),
    closed-form SSB/SSW, no second scan. Group moments travel as decimal
    partials, so F is bit-identical cross-engine."""
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("s_g"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("ss_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("s_g").cast("decimal(28,6)")).cast("double").alias("s"),
        F.sum(F.col("ss_g").cast("decimal(28,6)")).cast("double").alias("ss"),
    )
    parts = (
        g.crossJoin(F.broadcast(tot))
        .groupBy("k", "n", "s", "ss")
        .agg(
            F.sum(
                F.round(F.col("s_g") * F.col("s_g") / F.col("n_g"), 6).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("between_raw")
        )
        .select(
            "k",
            "n",
            (F.col("between_raw") - F.col("s") * F.col("s") / F.col("n")).alias("ssb"),
            (F.col("ss") - F.col("between_raw")).alias("ssw"),
        )
    )
    return parts.select(
        "k",
        "n",
        F.round(F.col("ssb"), 4).alias("ss_between"),
        F.round(F.col("ssw"), 4).alias("ss_within"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1)) / (F.col("ssw") / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@query(
    "cusum_changepoint_daily",
    oracle="""
    -- CUSUM changepoint detection on the daily event-count series: the
    -- cumulative deviation from the global daily mean, kept EXACT by the
    -- integer rescale S'_d = D * cumsum(c) - d * N (= D * classic CUSUM);
    -- the argmax |S'| day is the level-shift candidate. All integers ->
    -- hash-exact.
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_days,
                 CAST(SUM(c) AS BIGINT) AS n_total FROM daily),
    walk AS (
      SELECT day,
             CAST(SUM(c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS d_idx
      FROM daily
    )
    SELECT walk.day AS changepoint_day,
           CAST(t.d_days * walk.cum - walk.d_idx * t.n_total AS BIGINT)
             AS cusum_scaled,
           t.d_days, t.n_total
    FROM walk CROSS JOIN t
    ORDER BY ABS(t.d_days * walk.cum - walk.d_idx * t.n_total) DESC, walk.day
    LIMIT 1
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily event-count series — the
    level-shift detector that complements anomaly_seasonal_days (which
    flags single days; CUSUM localizes WHERE the mean moved). The classic
    statistic S_d = sum(c_i - mean) is rescaled by D (days) into pure
    integers, so both the walk and the argmax are hash-exact; one window
    over O(days) rows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").cast("string").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    t = daily.agg(
        F.count(F.lit(1)).cast("long").alias("d_days"),
        F.sum("c").cast("long").alias("n_total"),
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    walk = daily.select(
        "day",
        F.sum("c").over(w_cum).cast("long").alias("cum"),
        F.row_number().over(Window.orderBy("day")).cast("long").alias("d_idx"),
    )
    scored = walk.crossJoin(F.broadcast(t)).select(
        F.col("day").alias("changepoint_day"),
        (F.col("d_days") * F.col("cum") - F.col("d_idx") * F.col("n_total"))
        .cast("long")
        .alias("cusum_scaled"),
        "d_days",
        "n_total",
    )
    return scored.orderBy(
        F.abs(F.col("cusum_scaled")).desc(), "changepoint_day"
    ).limit(1)


@query(
    "conformal_interval_coverage",
    oracle="""
    -- split-conformal prediction intervals (Vovk/Shafer; the
    -- distribution-free ML-eval standard): fit OLS value ~ hour on the
    -- md5-even calibration split, take the ceil((n+1)*0.9)-th smallest
    -- absolute residual as the 90% conformal radius q, and measure
    -- empirical coverage on the held-out split — which is guaranteed
    -- >= 0.9 - 1/(n_cal+1) regardless of the model being right. Moments
    -- are decimal-summed rounded terms; q and the coverage comparisons
    -- run on bit-identical doubles in both engines.
    WITH d AS (
      SELECT value AS y, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
             ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::BIGINT % 2
               AS split
      FROM events
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxy
      FROM d WHERE split = 0
    ),
    fit AS (
      SELECT n, (sxy - sx * sy / n) / (sxx - sx * 1.0 * sx / n) AS b,
             sy / n - (sxy - sx * sy / n) / (sxx - sx * 1.0 * sx / n) * sx / n
               AS a
      FROM m
    ),
    cal AS (
      SELECT ABS(d.y - fit.a - fit.b * d.x) AS r,
             row_number() OVER (ORDER BY ABS(d.y - fit.a - fit.b * d.x)) AS rk,
             fit.n
      FROM d CROSS JOIN fit WHERE d.split = 0
    ),
    q AS (
      SELECT r AS radius FROM cal WHERE rk = CAST(CEIL((n + 1) * 0.9) AS BIGINT)
    )
    SELECT fit.n AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(q.radius, 6) AS q_radius,
           ROUND(SUM(CASE WHEN ABS(d.y - fit.a - fit.b * d.x) <= q.radius
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS coverage
    FROM d CROSS JOIN fit CROSS JOIN q
    WHERE d.split = 1
    GROUP BY fit.n, q.radius
    """,
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals — the distribution-free
    uncertainty wrapper production models ship with: whatever the model
    (here OLS value ~ hour-of-day, from one decimal-moment pass), the
    ceil((n+1)(1-alpha))-th smallest calibration residual is a radius
    whose held-out coverage is guaranteed >= 1 - alpha - 1/(n+1). The
    md5 split, the moment fit, the order statistic, and the coverage
    comparisons are all engine-portable, so the entire eval pipeline is
    value-hash-checked."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        F.col("value").alias("y"),
        F.hour("ts").cast("long").alias("x"),
        (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 12), 16, 10)
            .cast("long")
            % 2
        ).alias("split"),
    ).persist()
    m = d.filter(F.col("split") == 0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.round(F.col("y"), 6).cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxy"),
    )
    b = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n")
    )
    fit = m.select("n", b.alias("b"), (F.col("sy") / F.col("n") - b * F.col("sx") / F.col("n")).alias("a"))
    resid = F.abs(F.col("y") - F.col("a") - F.col("b") * F.col("x"))
    cal = (
        d.filter(F.col("split") == 0)
        .crossJoin(F.broadcast(fit))
        .select(resid.alias("r"), "n")
        .withColumn("rk", F.row_number().over(Window.orderBy("r")))
    )
    q = cal.filter(
        F.col("rk") == F.ceil((F.col("n") + 1) * 0.9).cast("long")
    ).select(F.col("r").alias("radius"))
    test = (
        d.filter(F.col("split") == 1)
        .crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(q))
    )
    return test.groupBy("n", "radius").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(
            F.sum((resid <= F.col("radius")).cast("int")) * 1.0 / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
    ).select(
        F.col("n").alias("n_cal"),
        "n_test",
        F.round(F.col("radius"), 6).alias("q_radius"),
        "coverage",
    )


@query(
    "welch_t_test_halves",
    oracle="""
    -- Welch's unequal-variance t between the stream's time halves — the
    -- parametric member of the halves-comparison family (KS sees shape,
    -- Mann-Whitney sees location ranks, Welch sees means with its own
    -- variance per arm). Per-half decimal moments (terms rounded before
    -- the sum, the repo's float-agg rule) collapse to bit-identical
    -- doubles; t and the Welch-Satterthwaite df are closed forms on those.
    WITH b AS (
      SELECT epoch_us(MIN(ts))
             + CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 2) AS BIGINT)
               AS cut_us
      FROM events
    ),
    halves AS (
      SELECT CASE WHEN epoch_us(ts) >= b.cut_us THEN 1 ELSE 0 END AS h, value
      FROM events CROSS JOIN b
    ),
    m AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(28,6))) AS DOUBLE)
               AS ss
      FROM halves GROUP BY h
    ),
    w AS (
      SELECT m0.n AS n0, m1.n AS n1,
             m0.s / m0.n AS mean0, m1.s / m1.n AS mean1,
             (m0.ss - m0.s * m0.s / m0.n) / (m0.n - 1) AS v0,
             (m1.ss - m1.s * m1.s / m1.n) / (m1.n - 1) AS v1
      FROM (SELECT * FROM m WHERE h = 0) m0
      CROSS JOIN (SELECT * FROM m WHERE h = 1) m1
    )
    SELECT n0, n1, ROUND(mean0, 6) AS mean0, ROUND(mean1, 6) AS mean1,
           ROUND((mean1 - mean0) / sqrt(v0 / n0 + v1 / n1), 6) AS t_stat,
           ROUND(pow(v0 / n0 + v1 / n1, 2)
                 / (pow(v0 / n0, 2) / (n0 - 1) + pow(v1 / n1, 2) / (n1 - 1)),
                 4) AS welch_df
    FROM w
    """,
)
def welch_t_test_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between the stream's first and second time
    halves — completes the halves-comparison family (ks_test_two_sample:
    any distributional change; mann_whitney_u_halves: rank location shift;
    Welch: mean shift without assuming equal variances). One grouped
    decimal-moment pass, then the t statistic and Welch-Satterthwaite
    degrees of freedom as closed forms on bit-identical doubles."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.floor((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 2)
        ).alias("cut")
    )
    m = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            (F.unix_micros("ts") >= F.col("cut")).cast("int").alias("h"), "value"
        )
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("s"),
            F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("ss"),
        )
    )
    m0 = m.filter(F.col("h") == 0).select(
        F.col("n").alias("n0"), F.col("s").alias("s0"), F.col("ss").alias("ss0")
    )
    m1 = m.filter(F.col("h") == 1).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    w = m0.crossJoin(F.broadcast(m1)).select(
        "n0",
        "n1",
        (F.col("s0") / F.col("n0")).alias("mean0"),
        (F.col("s1") / F.col("n1")).alias("mean1"),
        ((F.col("ss0") - F.col("s0") * F.col("s0") / F.col("n0")) / (F.col("n0") - 1)).alias("v0"),
        ((F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1")) / (F.col("n1") - 1)).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    return w.select(
        "n0",
        "n1",
        F.round(F.col("mean0"), 6).alias("mean0"),
        F.round(F.col("mean1"), 6).alias("mean1"),
        F.round((F.col("mean1") - F.col("mean0")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
                + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
            ),
            4,
        ).alias("welch_df"),
    )


# SPRT constants, computed ONCE in Python and embedded as identical double
# literals in both engines: ln() differs in the last bit across engines, so
# the walk must never call ln at query time (same discipline as the CUSUM
# integer rescale, solved here by sharing literals instead).
_SPRT_P0, _SPRT_P1 = 0.18, 0.22
_SPRT_C1 = __import__("math").log(_SPRT_P1 / _SPRT_P0)       # per-success LLR
_SPRT_C0 = __import__("math").log((1 - _SPRT_P1) / (1 - _SPRT_P0))  # per-failure
_SPRT_A = __import__("math").log(0.95 / 0.05)                # accept-H1 bound
_SPRT_B = -_SPRT_A                                           # accept-H0 bound


@query(
    "sprt_ab_early_stop",
    oracle=f"""
    -- Wald's SPRT over the purchase-conversion stream (H0: p={_SPRT_P0} vs
    -- H1: p={_SPRT_P1}, alpha=beta=0.05): the cumulative log-likelihood
    -- ratio walk in event order, stopped at the first boundary crossing.
    -- The experiment-scorecard family's sequential member: instead of a
    -- fixed-n z-test, the test can stop as soon as the evidence suffices.
    -- LLR coefficients are SHARED double literals (python-computed), so
    -- the walk is bit-identical cross-engine.
    WITH ordered AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER (ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS k
      FROM events
    ),
    walk AS (
      SELECT n, k, k * {_SPRT_C1!r} + (n - k) * {_SPRT_C0!r} AS llr
      FROM ordered
    ),
    crossed AS (
      SELECT 1 AS pri, n, k, llr FROM walk
      WHERE llr >= {_SPRT_A!r} OR llr <= {_SPRT_B!r}
      ORDER BY n LIMIT 1
    ),
    last AS (
      SELECT 2 AS pri, n, k, llr FROM walk ORDER BY n DESC LIMIT 1
    ),
    pick AS (
      SELECT * FROM (SELECT * FROM crossed UNION ALL SELECT * FROM last)
      ORDER BY pri LIMIT 1
    )
    SELECT CASE WHEN llr >= {_SPRT_A!r} THEN 'accept_h1'
                WHEN llr <= {_SPRT_B!r} THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           n AS n_decided, k AS k_decided, ROUND(llr, 6) AS llr
    FROM pick
    """,
)
def sprt_ab_early_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the purchase-conversion
    stream: walk the cumulative LLR in event order and stop at the first
    boundary crossing (or report 'continue' at stream end). This is the
    sequential counterpart of the fixed-horizon ab_test_zscore — the test a
    live experiment platform actually runs, since it bounds both error
    rates while allowing early stopping. The LLR coefficients and Wald
    bounds are python-computed literals shared verbatim with the oracle, so
    the walk, the stopping time, and the decision are all hash-exact."""
    ev = load(spark, sf_dir, "events")
    w = Window.orderBy("ts", "event_id")
    walk = ev.select(
        F.row_number().over(w).cast("long").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("k"),
    ).select(
        "n",
        "k",
        (F.col("k") * F.lit(_SPRT_C1) + (F.col("n") - F.col("k")) * F.lit(_SPRT_C0)).alias("llr"),
    )
    crossed = (
        walk.filter((F.col("llr") >= _SPRT_A) | (F.col("llr") <= _SPRT_B))
        .orderBy("n")
        .limit(1)
        .select(F.lit(1).alias("pri"), "n", "k", "llr")
    )
    last = (
        walk.orderBy(F.col("n").desc())
        .limit(1)
        .select(F.lit(2).alias("pri"), "n", "k", "llr")
    )
    pick = crossed.unionByName(last).orderBy("pri").limit(1)
    return pick.select(
        F.when(F.col("llr") >= _SPRT_A, "accept_h1")
        .when(F.col("llr") <= _SPRT_B, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
        F.col("n").alias("n_decided"),
        F.col("k").alias("k_decided"),
        F.round(F.col("llr"), 6).alias("llr"),
    )


@query(
    "bh_fdr_metric_screen",
    oracle="""
    -- Benjamini-Hochberg FDR screen over 20 simultaneous hypotheses (each
    -- source's mean doc length vs the corpus mean): per-source z from
    -- EXACT integer moments (n_chars is BIGINT, so sums and sums of
    -- squares are exact), p-values via the logistic normal-CDF
    -- approximation Phi(z) ~ 1/(1+exp(-1.702 z)) — the SAME closed form
    -- in both engines (neither ships erf), monotone in |z| so the BH
    -- ordering is the true ordering — then the step-up rule: reject all
    -- ranks <= max{i : p_(i) <= alpha*i/m} at alpha=0.10.
    WITH g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
      FROM documents
    ),
    per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
             CAST(SUM(n_chars) AS BIGINT) AS s_s
      FROM documents GROUP BY source
    ),
    z AS (
      SELECT per.source, per.n_s,
             (per.s_s * 1.0 / per.n_s - g.s * 1.0 / g.n)
               / sqrt(((g.ss - g.s * g.s * 1.0 / g.n) / g.n) / per.n_s) AS z
      FROM per CROSS JOIN g
    ),
    p AS (
      SELECT source, n_s, z, 2.0 / (1.0 + exp(1.702 * abs(z))) AS p
      FROM z
    ),
    ranked AS (
      SELECT source, n_s, z, p,
             CAST(ROW_NUMBER() OVER (ORDER BY p, source) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM p
    ),
    thr AS (
      SELECT COALESCE(MAX(i), 0) AS k_max
      FROM ranked WHERE p <= 0.10 * i / m
    )
    SELECT r.source, r.n_s AS n_docs, ROUND(r.z, 6) AS z,
           ROUND(r.p, 8) AS p_approx, r.i AS bh_rank,
           r.i <= t.k_max AS rejected
    FROM ranked r CROSS JOIN thr t
    """,
)
def bh_fdr_metric_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate control over a family of 20
    simultaneous tests (is each source's mean document length shifted from
    the corpus mean?) — the multiple-comparisons correction every metric
    dashboard needs once it screens many segments at once. z statistics
    come from exact integer moments; p-values use the logistic
    approximation to the normal CDF (identical closed form in both
    engines); the step-up rejection rule runs on bit-identical doubles, so
    the discovery set itself is hash-checked."""
    docs = load(spark, sf_dir, "documents")
    g = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("ss"),
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("n_chars").cast("long").alias("s_s"),
    )
    z = per.crossJoin(F.broadcast(g)).select(
        "source",
        "n_s",
        (
            (F.col("s_s") * 1.0 / F.col("n_s") - F.col("s") * 1.0 / F.col("n"))
            / F.sqrt(
                ((F.col("ss") - F.col("s") * F.col("s") * 1.0 / F.col("n")) / F.col("n"))
                / F.col("n_s")
            )
        ).alias("z"),
    )
    p = z.select(
        "source", "n_s", "z", (F.lit(2.0) / (F.lit(1.0) + F.exp(F.lit(1.702) * F.abs(F.col("z"))))).alias("p")
    )
    ranked = p.select(
        "source",
        "n_s",
        "z",
        "p",
        F.row_number().over(Window.orderBy("p", "source")).cast("long").alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("m"),
    )
    thr = ranked.filter(F.col("p") <= F.lit(0.10) * F.col("i") / F.col("m")).agg(
        F.coalesce(F.max("i"), F.lit(0)).cast("long").alias("k_max")
    )
    return ranked.crossJoin(F.broadcast(thr)).select(
        "source",
        F.col("n_s").alias("n_docs"),
        F.round(F.col("z"), 6).alias("z"),
        F.round(F.col("p"), 8).alias("p_approx"),
        F.col("i").alias("bh_rank"),
        (F.col("i") <= F.col("k_max")).alias("rejected"),
    )


@query(
    "theil_sen_trend_slope",
    oracle="""
    -- Theil-Sen estimator per event type: the MEDIAN of all pairwise
    -- slopes of the daily-count series — robust to ~29% outlier days,
    -- where the OLS slope (trend_slope_per_type) moves with every spike.
    -- Slopes are exact-integer ratios -> identical doubles; the median is
    -- the deterministic LOWER median, selected by rank over
    -- (slope, i, j) so ties cannot reorder cross-engine.
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, c,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS d
      FROM daily
    ),
    pairs AS (
      SELECT a.event_type,
             (b.c - a.c) * 1.0 / (b.d - a.d) AS slope,
             a.d AS i, b.d AS j
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND a.d < b.d
    ),
    ranked AS (
      SELECT event_type, slope,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY slope, i, j) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
      FROM pairs
    )
    SELECT event_type, m AS n_pairs, ROUND(slope, 6) AS ts_slope
    FROM ranked WHERE rk = (m + 1) // 2
    """,
)
def theil_sen_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope of each event type's daily-count series
    — the breakdown-point-0.29 companion of the OLS trend_slope_per_type:
    one anomalous day cannot move the median of pairwise slopes. The
    series is O(days) per key, so the pairwise join is O(days^2) per key —
    tiny and bounded by calendar length, never by event volume (100 TB of
    events still yields <=366 day rows per key per year). Lower median
    with a total (slope, i, j) rank: hash-exact."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").cast("string").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    idx = daily.select(
        "event_type",
        "c",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long")
        .alias("d"),
    )
    a = idx.select(
        F.col("event_type").alias("et"), F.col("c").alias("ca"), F.col("d").alias("i")
    )
    b = idx.select(
        F.col("event_type").alias("et"), F.col("c").alias("cb"), F.col("d").alias("j")
    )
    pairs = a.join(b, "et").filter(F.col("i") < F.col("j")).select(
        F.col("et").alias("event_type"),
        ((F.col("cb") - F.col("ca")) * 1.0 / (F.col("j") - F.col("i"))).alias("slope"),
        "i",
        "j",
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "i", "j")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr).cast("long").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).cast("long").alias("m"),
    )
    # integer lower-median rank: Spark `/` is float division, and an even
    # pair count would then match NO rank (x.5) — floor-div like the oracle.
    return ranked.filter(F.col("rk") == F.floor((F.col("m") + 1) / 2).cast("long")).select(
        "event_type", F.col("m").alias("n_pairs"), F.round("slope", 6).alias("ts_slope")
    )


@query(
    "quantile_normalize_sources",
    oracle="""
    -- Quantile normalization (Bolstad et al. 2003, the batch-effect
    -- standard): each source's doc-length distribution is mapped onto the
    -- GLOBAL empirical distribution by rank — source s's rank-r value
    -- becomes the global order statistic at index (r*(N-1)) div (n_s-1).
    -- Pure integer rank arithmetic with a total (value, doc_id) sort key,
    -- so the mapped values (and their sums) are hash-exact.
    WITH g AS (
      SELECT n_chars AS v,
             CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT)
               AS idx,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM documents
    ),
    s AS (
      SELECT source, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS rk0,
             CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
      FROM documents
    ),
    mapped AS (
      SELECT s.source, s.n_chars,
             g.v AS v_norm
      FROM s JOIN g
        ON g.idx = CASE WHEN s.n_s = 1 THEN (g.n - 1) // 2
                        ELSE (s.rk0 * (g.n - 1)) // (s.n_s - 1) END
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_before,
           CAST(SUM(v_norm) AS BIGINT) AS sum_after
    FROM mapped GROUP BY source
    """,
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source doc-length distributions onto
    the global distribution — the classic batch-effect correction (map by
    rank onto the pooled order statistics), the preprocessing step that
    makes heterogeneous source feeds comparable before quality
    thresholding. Integer rank mapping (r*(N-1)) div (n_s-1) with total
    tie-breaks; after normalization every source draws from the same value
    ladder (sum_after varies only through source size). The rank join is
    an equi-join on the target index — at 100 TB the global order
    statistics frame is a ranged broadcast table, and the per-source
    window is a partitioned sort, both shuffle-once shapes."""
    docs = load(spark, sf_dir, "documents")
    g = docs.select(
        F.col("n_chars").alias("v"),
        (F.row_number().over(Window.orderBy("n_chars", "doc_id")) - 1)
        .cast("long")
        .alias("idx"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    s = docs.select(
        "source",
        "n_chars",
        (
            F.row_number().over(
                Window.partitionBy("source").orderBy("n_chars", "doc_id")
            )
            - 1
        )
        .cast("long")
        .alias("rk0"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("n_s"),
    )
    n_row = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    target = s.crossJoin(F.broadcast(n_row)).select(
        "source",
        "n_chars",
        F.when(F.col("n_s") == 1, F.floor((F.col("n") - 1) / 2))
        .otherwise(F.floor(F.col("rk0") * (F.col("n") - 1) / (F.col("n_s") - 1)))
        .cast("long")
        .alias("t_idx"),
    )
    mapped = target.join(g.select("idx", "v"), F.col("t_idx") == F.col("idx"))
    return mapped.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_before"),
        F.sum("v").cast("long").alias("sum_after"),
    )


@query(
    "ewma_control_chart_daily",
    oracle="""
    -- EWMA control chart (Roberts 1959) on the daily event-count series
    -- with lambda = 1/2: every smoothing weight is a POWER OF TWO, so the
    -- recursion's closed form (sum of x_i * 2^-(d-i+1), first obs carries
    -- 2^-(d-1)) is a sum of exactly-representable dyadic rationals whose
    -- partials all fit the mantissa — bit-exact in ANY summation order,
    -- in both engines, with no decimal scaffolding. Control limits use
    -- the standard EWMA variance inflation sqrt(l/(2-l)*(1-(1-l)^2d)).
    WITH daily AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS d,
             day, c
      FROM (
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
      )
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM daily
    ),
    ewma AS (
      SELECT a.d, a.day,
             CAST(SUM(b.c * CASE WHEN b.d = 1 THEN power(2.0, -(a.d - 1))
                                 ELSE power(2.0, -(a.d - b.d + 1)) END)
               AS DOUBLE) AS e
      FROM daily a JOIN daily b ON b.d <= a.d
      GROUP BY a.d, a.day
    ),
    scored AS (
      SELECT e.d, e.day, e.e,
             (e.e - s.s * 1.0 / s.n)
               / sqrt(((s.ss - s.s * s.s * 1.0 / s.n) / s.n)
                      * (1.0 / 3.0) * (1 - power(0.25, e.d))) AS z
      FROM ewma e CROSS JOIN stats s
    )
    SELECT day, ROUND(e, 6) AS ewma, ROUND(z, 6) AS z,
           abs(z) > 2.7 AS out_of_control
    FROM scored
    """,
)
def ewma_control_chart_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over the daily event-count series — the drift
    monitor that reacts faster than Shewhart limits and smoother than
    CUSUM's argmax: exponential smoothing with lambda = 1/2 chosen so
    EVERY weight is a power of two, making the smoothed series bit-exact
    across engines without decimal scaffolding (a float determinism trick
    the repo's ROUND-then-DECIMAL rule can't offer for a recursive
    statistic). Variance-inflated control limits flag out-of-control days.
    The weight join is O(days^2) bounded by calendar length — 366 rows a
    year per key no matter the event volume."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            F.row_number().over(Window.orderBy("day")).cast("long").alias("d"),
            "day",
            "c",
        )
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    a = daily.select(F.col("d").alias("da"), F.col("day").alias("day_a"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    ewma = (
        a.join(b, F.col("db") <= F.col("da"))
        .groupBy("da", "day_a")
        .agg(
            F.sum(
                F.col("cb")
                * F.when(
                    F.col("db") == 1, F.pow(F.lit(2.0), -(F.col("da") - 1))
                ).otherwise(F.pow(F.lit(2.0), -(F.col("da") - F.col("db") + 1)))
            )
            .cast("double")
            .alias("e")
        )
    )
    scored = ewma.crossJoin(F.broadcast(stats)).select(
        F.col("day_a").alias("day"),
        "e",
        (
            (F.col("e") - F.col("s") * 1.0 / F.col("n"))
            / F.sqrt(
                ((F.col("ss") - F.col("s") * F.col("s") * 1.0 / F.col("n")) / F.col("n"))
                * (1.0 / 3.0)
                * (1 - F.pow(F.lit(0.25), F.col("da")))
            )
        ).alias("z"),
    )
    return scored.select(
        "day",
        F.round("e", 6).alias("ewma"),
        F.round("z", 6).alias("z"),
        (F.abs(F.col("z")) > 2.7).alias("out_of_control"),
    )


@query(
    "wasserstein_source_drift",
    oracle="""
    -- 1-D Wasserstein-1 (earth mover's) distance between each source's
    -- doc-length distribution and the corpus: completes the drift family
    -- (KL weighs density ratios, PSI bins, KS takes the max gap — W1
    -- integrates |CDF gap| over the value axis, so it sees HOW FAR mass
    -- moved, in characters). Exact integer CDF counts at the merged
    -- support; per-segment terms ROUND@1e-8 then DECIMAL-summed.
    WITH support AS (
      SELECT DISTINCT n_chars AS v FROM documents
    ),
    g AS (
      SELECT s.v,
             CAST((SELECT COUNT(*) FROM documents d WHERE d.n_chars <= s.v)
               AS BIGINT) AS cg,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS ng
      FROM support s
    ),
    per AS (
      SELECT src.source, s.v,
             CAST((SELECT COUNT(*) FROM documents d
                   WHERE d.source = src.source AND d.n_chars <= s.v)
               AS BIGINT) AS cs,
             src.ns
      FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
            FROM documents GROUP BY source) src
      CROSS JOIN support s
    ),
    gaps AS (
      SELECT v, CAST(LEAD(v) OVER (ORDER BY v) - v AS BIGINT) AS gap
      FROM support
    ),
    terms AS (
      SELECT p.source,
             ROUND(abs(p.cs * 1.0 / p.ns - g.cg * 1.0 / g.ng) * ga.gap, 8)
               AS t
      FROM per p
      JOIN g ON g.v = p.v
      JOIN gaps ga ON ga.v = p.v
      WHERE ga.gap IS NOT NULL
    )
    SELECT source,
           ROUND(CAST(SUM(CAST(t AS DECIMAL(28,8))) AS DOUBLE), 6) AS w1_chars
    FROM terms GROUP BY source
    """,
)
def wasserstein_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 distance of each source's document-length
    distribution from the corpus — the drift metric that reports how far
    the mass moved (in characters), not just that it differs: the integral
    of |CDF_source - CDF_corpus| over the merged support. CDF counts are
    exact integers from two grouped passes + a cumulative window (no
    correlated subquery at scale — the oracle's subselects are the
    semantic spec, the plan is wordcount-shaped); per-segment terms follow
    the rounded-term decimal-sum rule."""
    docs = load(spark, sf_dir, "documents")
    support = docs.select(F.col("n_chars").alias("v")).distinct()
    # corpus total stays IN the plan as a broadcast 1-row cross join
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("ng"))
    w_ord = Window.orderBy("v")
    gcdf = (
        docs.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "v",
            F.sum("c").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cg"),
        )
    )
    ns = docs.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("ns"))
    scdf_sparse = docs.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # densify each source's CDF onto the merged support: cross join the
    # (small) support with sources, left-join sparse counts, cumulative sum
    grid = ns.crossJoin(support)
    w_src = Window.partitionBy("source").orderBy("v")
    scdf = (
        grid.join(scdf_sparse, ["source", "v"], "left")
        .select(
            "source",
            "ns",
            "v",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .select(
            "source",
            "ns",
            "v",
            F.sum("c").over(w_src.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cs"),
        )
    )
    gaps = support.select(
        "v", (F.lead("v").over(w_ord) - F.col("v")).cast("long").alias("gap")
    ).filter(F.col("gap").isNotNull())
    terms = (
        scdf.join(gcdf, "v")
        .join(gaps, "v")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.round(
                F.abs(F.col("cs") * 1.0 / F.col("ns") - F.col("cg") * 1.0 / F.col("ng"))
                * F.col("gap"),
                8,
            ).alias("t"),
        )
    )
    return terms.groupBy("source").agg(
        F.round(
            F.sum(F.col("t").cast("decimal(28,8)")).cast("double"), 6
        ).alias("w1_chars")
    )


@query(
    "spearman_trend_by_type",
    oracle="""
    -- Spearman rank correlation between event value and event time, per
    -- event type: the rank-based monotonic-trend test (Theil-Sen gives the
    -- slope magnitude; Spearman gives a tie-corrected, outlier-immune
    -- trend strength in [-1,1]). Average ranks stay EXACT as 2*rank
    -- integers (a tied block of c rows after s rows has 2*avgrank =
    -- 2s+c+1); rho = Pearson of the doubled ranks (scale-invariant), its
    -- moment sums exact DECIMAL integers, the closed form one double chain.
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS t, value FROM events
    ),
    vr AS (
      SELECT event_type, value,
             CAST(2 * COALESCE(SUM(COUNT(*)) OVER (PARTITION BY event_type
               ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + COUNT(*) + 1 AS BIGINT) AS rx2
      FROM e GROUP BY event_type, value
    ),
    tr AS (
      SELECT event_type, t,
             CAST(2 * COALESCE(SUM(COUNT(*)) OVER (PARTITION BY event_type
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + COUNT(*) + 1 AS BIGINT) AS ry2
      FROM e GROUP BY event_type, t
    ),
    rows_r AS (
      SELECT e.event_type, vr.rx2, tr.ry2
      FROM e
      JOIN vr ON vr.event_type = e.event_type AND vr.value = e.value
      JOIN tr ON tr.event_type = e.event_type AND tr.t = e.t
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(rx2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(ry2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(rx2 * rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS syy
      FROM rows_r GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             AS spearman_rho
    FROM m
    ORDER BY event_type
    """,
)
def spearman_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of event value against event time, per
    event type — the monotonic-trend strength companion of
    theil_sen_trend_slope (rank-based, so immune to outliers and to any
    monotone rescaling of value). Tie-exact: each side's average ranks are
    carried as 2*rank integers built from one grouped pass + a cumulative
    window per type, joined back on the (type, value)/(type, ts) block
    keys; rho is the Pearson closed form over exact decimal moment sums,
    one double chain on both engines."""
    e = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("t"), "value"
    )
    w_v = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vr = (
        e.groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "event_type",
            "value",
            (2 * F.coalesce(F.sum("c").over(w_v), F.lit(0)) + F.col("c") + 1)
            .cast("long")
            .alias("rx2"),
        )
    )
    w_t = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tr = (
        e.groupBy("event_type", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "event_type",
            "t",
            (2 * F.coalesce(F.sum("c").over(w_t), F.lit(0)) + F.col("c") + 1)
            .cast("long")
            .alias("ry2"),
        )
    )
    rows_r = e.join(vr, ["event_type", "value"]).join(tr, ["event_type", "t"])
    m = rows_r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("rx2").cast("decimal(38,0)")).cast("double").alias("sx"),
        F.sum(F.col("ry2").cast("decimal(38,0)")).cast("double").alias("sy"),
        F.sum((F.col("rx2") * F.col("ry2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("rx2") * F.col("rx2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("ry2") * F.col("ry2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    rho = F.round(
        (n * F.col("sxy") - sx * sy)
        / F.sqrt((n * F.col("sxx") - sx * sx) * (n * F.col("syy") - sy * sy)),
        6,
    )
    return m.select("event_type", "n", rho.alias("spearman_rho")).orderBy(
        "event_type"
    )


@query(
    "kruskal_wallis_value_by_type",
    oracle="""
    -- Kruskal-Wallis H across the event types: the k-group rank test that
    -- completes the nonparametric family (Mann-Whitney = its k=2 case,
    -- ANOVA = its parametric twin). Pooled average ranks as exact 2*rank
    -- integers from one pass over distinct values; per-group doubled rank
    -- sums via the tied-block formula; H and its tie correction are one
    -- double chain over exact integers.
    WITH v AS (
      SELECT value, COUNT(*) AS c FROM events GROUP BY value
    ),
    w AS (
      SELECT value, c,
             CAST(COALESCE(SUM(c) OVER (ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS s
      FROM v
    ),
    gv AS (
      SELECT e.event_type,
             CAST(COUNT(*) AS BIGINT) AS c_g,
             CAST(MAX(2 * w.s + w.c + 1) AS BIGINT) AS r2
      FROM events e JOIN w ON w.value = e.value
      GROUP BY e.event_type, e.value
    ),
    g AS (
      SELECT event_type,
             CAST(SUM(c_g) AS BIGINT) AS n_g,
             CAST(CAST(SUM(CAST(c_g * r2 AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS DOUBLE) AS r2sum
      FROM gv GROUP BY event_type
    ),
    t AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(c * c * c - c AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS DOUBLE) AS tie_sum
      FROM v
    ),
    h AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k, t.n, t.tie_sum,
             12.0 / (4.0 * t.n * (t.n + 1))
               * CAST(SUM(CAST(ROUND(g.r2sum * g.r2sum / g.n_g, 4)
                               AS DECIMAL(38,4))) AS DOUBLE)
               - 3.0 * (t.n + 1) AS h_raw
      FROM g CROSS JOIN t
      GROUP BY t.n, t.tie_sum
    )
    SELECT k, n, ROUND(h_raw, 6) AS h_stat,
           ROUND(h_raw / (1.0 - tie_sum / (1.0 * n * n * n - n)), 6)
             AS h_tie_corrected
    FROM h
    """,
)
def kruskal_wallis_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of event value across the 5 event types — the
    k-group generalization of mann_whitney_u_halves and the rank-based
    twin of anova_f_oneway_value_by_type. Pooled ranks over all events
    come from ONE grouped pass on distinct values + a cumulative window
    (tied block after s rows, size c -> every member's doubled rank is
    2s+c+1); each group's doubled rank sum is an exact decimal integer, so
    H = 12/(N(N+1)) * sum(R_g^2/n_g) - 3(N+1) (computed on the doubled
    sums with the matching 1/4 factor) and its tie correction are
    bit-identical double chains."""
    ev = load(spark, sf_dir, "events")
    v = ev.groupBy("value").agg(F.count(F.lit(1)).alias("c"))
    w_prev = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    w = v.select(
        "value",
        "c",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0)).cast("long").alias("s"),
    )
    gv = (
        ev.join(w, "value")
        .groupBy("event_type", "value")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c_g"),
            F.max(2 * F.col("s") + F.col("c") + 1).cast("long").alias("r2"),
        )
    )
    g = gv.groupBy("event_type").agg(
        F.sum("c_g").cast("long").alias("n_g"),
        F.sum((F.col("c_g") * F.col("r2")).cast("decimal(38,0)"))
        .cast("double")
        .alias("r2sum"),
    )
    t = v.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(
            (F.col("c") * F.col("c") * F.col("c") - F.col("c")).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("tie_sum"),
    )
    h = (
        g.crossJoin(F.broadcast(t))
        .groupBy("n", "tie_sum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            (
                F.lit(12.0)
                / (F.lit(4.0) * F.col("n") * (F.col("n") + 1))
                * F.sum(
                    F.round(
                        F.col("r2sum") * F.col("r2sum") / F.col("n_g"), 4
                    ).cast("decimal(38,4)")
                ).cast("double")
                - F.lit(3.0) * (F.col("n") + 1)
            ).alias("h_raw"),
        )
    )
    return h.select(
        "k",
        "n",
        F.round(F.col("h_raw"), 6).alias("h_stat"),
        F.round(
            F.col("h_raw")
            / (
                F.lit(1.0)
                - F.col("tie_sum")
                / (F.lit(1.0) * F.col("n") * F.col("n") * F.col("n") - F.col("n"))
            ),
            6,
        ).alias("h_tie_corrected"),
    )


@query(
    "k_anonymity_ldiversity_audit",
    oracle="""
    -- privacy-governance audit before a data release: k-anonymity and
    -- l-diversity of the customer table under quasi-identifiers
    -- (nation, account-balance band) with market segment as the
    -- sensitive attribute (Sweeney 2002; Machanavajjhala 2007). One
    -- grouped pass builds the QI equivalence classes; each threshold row
    -- reports how re-identifiable the release is. All-integer counts ->
    -- exact ratios, hash-checked.
    WITH q AS (
      SELECT c_nationkey,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 3000 THEN 'low'
                  WHEN c_acctbal < 7000 THEN 'mid'
                  ELSE 'high' END AS bal_band,
             c_mktsegment
      FROM customer
    ),
    g AS (
      SELECT c_nationkey, bal_band,
             CAST(COUNT(*) AS BIGINT) AS sz,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
      FROM q GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(MIN(sz) AS BIGINT) AS k_anonymity,
             CAST(MIN(l_div) AS BIGINT) AS l_diversity
      FROM g
    )
    SELECT k.k AS k_threshold, tot.n_rows, tot.n_groups,
           tot.k_anonymity, tot.l_diversity,
           CAST((SELECT COALESCE(SUM(sz), 0) FROM g WHERE sz < k.k) AS BIGINT)
             AS rows_violating,
           ROUND((SELECT COALESCE(SUM(sz), 0) FROM g WHERE sz < k.k)
                 * 1.0 / tot.n_rows, 6) AS pct_rows_violating
    FROM (SELECT unnest([2, 5, 10, 25]) AS k) k CROSS JOIN tot
    ORDER BY k_threshold
    """,
)
def k_anonymity_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of a customer release: group sizes
    of the quasi-identifier equivalence classes (nation x balance band)
    give the k-anonymity level; distinct sensitive values (market
    segment) per class give l-diversity; each k threshold row reports the
    re-identifiable row fraction. The audit is one grouped pass + a
    broadcast threshold cross join — the pre-release governance gate a
    training-data pipeline runs before shipping user-derived tables."""
    cust = load(spark, sf_dir, "customer")
    q = cust.select(
        "c_nationkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        "c_mktsegment",
    )
    g = q.groupBy("c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.count_distinct("c_mktsegment").cast("long").alias("l_div"),
    )
    tot = g.agg(
        F.sum("sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("sz").cast("long").alias("k_anonymity"),
        F.min("l_div").cast("long").alias("l_diversity"),
    )
    ks = spark.createDataFrame([(2,), (5,), (10,), (25,)], "k int")
    viol = (
        g.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
            .cast("long")
            .alias("rows_violating")
        )
    )
    return (
        viol.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").alias("k_threshold"),
            "n_rows",
            "n_groups",
            "k_anonymity",
            "l_diversity",
            "rows_violating",
            F.round(F.col("rows_violating") * 1.0 / F.col("n_rows"), 6).alias(
                "pct_rows_violating"
            ),
        )
        .orderBy("k_threshold")
    )


@query(
    "dp_noisy_counts",
    oracle="""
    -- differentially-private histogram release (Dwork et al. 2006):
    -- per-type event counts + Laplace(1/eps) noise, eps=1, sensitivity 1
    -- (each event contributes to one bucket). The noise is SEEDED AND
    -- PORTABLE: u = md5('dp1|'||type) first-12-hex / 2^48 - 0.5, noise =
    -- -sign(u) * (1/eps) * ln(1 - 2|u|) — the Laplace inverse CDF on a
    -- hash every engine reproduces bit-for-bit, so the released values
    -- are hash-checked (true counts shown only for the audit gate).
    WITH c AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM events GROUP BY event_type
    ),
    u AS (
      SELECT event_type, true_cnt,
             ('0x' || substr(md5('dp1|' || event_type), 1, 12))::BIGINT
               / 281474976710656.0 - 0.5 AS uu
      FROM c
    )
    SELECT event_type, true_cnt,
           ROUND(true_cnt
                 - CASE WHEN uu >= 0 THEN 1.0 ELSE -1.0 END
                   * ln(1.0 - 2.0 * abs(uu)), 4) AS dp_count,
           1.0 AS epsilon
    FROM u ORDER BY event_type
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: the Laplace mechanism on the
    per-type event histogram (sensitivity 1, eps=1). The noise draw is the
    inverse-CDF transform of a PORTABLE md5-derived uniform — the same
    seed-discipline rule every sketch in this repo follows — so the
    mechanism is deterministic, auditable, and engine-reproducible while
    keeping the calibrated Laplace(1/eps) distribution across buckets.
    (True counts appear alongside only because this registers as an
    oracle-checked audit; a production release would drop them.)"""
    c = load(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("true_cnt")
    )
    uu = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp1|"), F.col("event_type"))), 1, 12),
            16,
            10,
        ).cast("long")
        / F.lit(281474976710656.0)
        - 0.5
    )
    u = c.select("event_type", "true_cnt", uu.alias("uu"))
    return u.select(
        "event_type",
        "true_cnt",
        F.round(
            F.col("true_cnt")
            - F.when(F.col("uu") >= 0, 1.0).otherwise(-1.0)
            * F.log(1.0 - 2.0 * F.abs(F.col("uu"))),
            4,
        ).alias("dp_count"),
        F.lit(1.0).alias("epsilon"),
    ).orderBy("event_type")


@query(
    "ablation_source_influence",
    oracle="""
    -- leave-one-source-out data valuation: each source's influence on the
    -- corpus-level metrics = metric(corpus \\ source) - metric(corpus),
    -- computed CLOSED-FORM from one grouped pass (totals minus the
    -- group's partials) instead of |sources| recomputations — the O(1)
    -- ablation trick that makes per-shard valuation feasible at 100 TB.
    -- Metrics: mean doc length and English fraction; integer partials ->
    -- exact deltas.
    WITH g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(n_chars) AS BIGINT) AS s_g,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en_g
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(SUM(s_g) AS BIGINT) AS s,
             CAST(SUM(en_g) AS BIGINT) AS en
      FROM g
    )
    SELECT g.source, g.n_g AS n_docs,
           ROUND((t.s - g.s_g) * 1.0 / (t.n - g.n_g)
                 - t.s * 1.0 / t.n, 6) AS delta_mean_chars,
           ROUND((t.en - g.en_g) * 1.0 / (t.n - g.n_g)
                 - t.en * 1.0 / t.n, 6) AS delta_en_frac
    FROM g CROSS JOIN t
    ORDER BY delta_mean_chars DESC, g.source
    """,
)
def ablation_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out ablation of corpus metrics — the cheapest
    honest data-valuation signal: how would mean document length and the
    English fraction move if this source were dropped? Computed in closed
    form from one grouped pass (corpus totals minus per-source partials),
    so valuing S sources costs ONE scan, not S scans — the shape that
    keeps per-shard valuation tractable when the corpus is 100 TB. All
    partials are exact integers; the deltas are single double chains."""
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("n_chars").cast("long").alias("s_g"),
        F.sum((F.col("lang") == "en").cast("long")).cast("long").alias("en_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.sum("en_g").cast("long").alias("en"),
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "source",
            F.col("n_g").alias("n_docs"),
            F.round(
                (F.col("s") - F.col("s_g")) * 1.0 / (F.col("n") - F.col("n_g"))
                - F.col("s") * 1.0 / F.col("n"),
                6,
            ).alias("delta_mean_chars"),
            F.round(
                (F.col("en") - F.col("en_g")) * 1.0 / (F.col("n") - F.col("n_g"))
                - F.col("en") * 1.0 / F.col("n"),
                6,
            ).alias("delta_en_frac"),
        )
        .orderBy(F.desc("delta_mean_chars"), "source")
    )


@query(
    "wilcoxon_signed_rank_users",
    oracle="""
    -- Wilcoxon signed-rank test, the PAIRED member completing the
    -- nonparametric trio (Mann-Whitney = unpaired, Kruskal-Wallis =
    -- k-group): did per-user event value shift between the two calendar
    -- halves of January? The pair delta is the EXACT decimal
    -- cross-product d = s2*n1 - s1*n2 (sign of the mean difference
    -- without a division), |d| ranks use the doubled-average-rank trick,
    -- and the tie-corrected z is one double chain over exact integers.
    WITH h AS (
      SELECT user_id,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END
               AS half,
             value
      FROM events
    ),
    m AS (
      SELECT user_id, half,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS s
      FROM h GROUP BY user_id, half
    ),
    pairs AS (
      SELECT a.user_id, b.s * a.n - a.s * b.n AS d
      FROM m a JOIN m b ON a.user_id = b.user_id
      WHERE a.half = 0 AND b.half = 1
    ),
    nz AS (SELECT user_id, d, abs(d) AS ad FROM pairs WHERE d <> 0),
    v AS (
      SELECT ad, COUNT(*) AS c,
             CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_pos
      FROM nz GROUP BY ad
    ),
    w AS (
      SELECT c, c_pos,
             CAST(COALESCE(SUM(c) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS s
      FROM v
    ),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c_pos * (2 * s + c + 1)) AS BIGINT) AS two_wplus,
             CAST(SUM(c * c * c - c) AS BIGINT) AS tie_sum
      FROM w
    )
    SELECT n, two_wplus,
           ROUND((two_wplus / 2.0 - n * (n + 1) / 4.0)
                 / sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0
                        - tie_sum / 48.0), 6) AS z
    FROM agg
    """,
)
def wilcoxon_signed_rank_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank over per-user paired halves of the month —
    the paired-design rank test the experiment scorecards reach for when
    the same users appear before and after a change. Pair deltas are
    exact decimal cross-products (no mean division), |d| ranks come from
    the doubled-rank tied-block construction, so W+ and the tie-corrected
    z are bit-identical cross-engine."""
    ev = load(spark, sf_dir, "events")
    h = ev.select(
        "user_id",
        (F.to_date("ts") >= F.lit("2024-01-16").cast("date")).cast("int").alias(
            "half"
        ),
        "value",
    )
    m = h.groupBy("user_id", "half").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("value", 6).cast("decimal(28,6)")).alias("s"),
    )
    a = m.filter(F.col("half") == 0).select(
        "user_id", F.col("n").alias("n1"), F.col("s").alias("s1")
    )
    b = m.filter(F.col("half") == 1).select(
        "user_id", F.col("n").alias("n2"), F.col("s").alias("s2")
    )
    pairs = a.join(b, "user_id").select(
        "user_id", (F.col("s2") * F.col("n1") - F.col("s1") * F.col("n2")).alias("d")
    )
    nz = pairs.filter(F.col("d") != 0).select("d", F.abs("d").alias("ad"))
    v = nz.groupBy("ad").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum((F.col("d") > 0).cast("long")).alias("c_pos"),
    )
    w_prev = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    w = v.select(
        "c",
        "c_pos",
        F.coalesce(F.sum("c").over(w_prev), F.lit(0)).cast("long").alias("s"),
    )
    agg = w.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c_pos") * (2 * F.col("s") + F.col("c") + 1))
        .cast("long")
        .alias("two_wplus"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_sum"),
    )
    n = F.col("n")
    z = F.round(
        (F.col("two_wplus") / 2.0 - n * (n + 1) / 4.0)
        / F.sqrt(
            n * (n + 1.0) * (2 * n + 1) / 24.0 - F.col("tie_sum") / 48.0
        ),
        6,
    )
    return agg.select("n", "two_wplus", z.alias("z"))


@query(
    "jackknife_ratio_se",
    oracle="""
    -- delete-one-DAY jackknife standard error of a ratio metric (revenue
    -- per purchase event): ratio metrics have no per-row variance, so the
    -- experimentation stack resamples by time block. Per-day partials
    -- (exact decimal numerator, integer denominator) give every
    -- leave-one-out replicate in closed form from the totals; pseudo-value
    -- deviations ROUND@8 then DECIMAL-sum. One scan, D=calendar days of
    -- driver-free arithmetic.
    WITH d AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(28,6))) AS num,
             CAST(COUNT(*) AS BIGINT) AS den
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS dd,
             CAST(SUM(num) AS DECIMAL(38,6)) AS tn,
             CAST(SUM(den) AS BIGINT) AS td
      FROM d
    ),
    reps AS (
      SELECT t.dd,
             CAST(t.tn AS DOUBLE) / t.td AS r_full,
             t.dd * (CAST(t.tn AS DOUBLE) / t.td)
               - (t.dd - 1) * (CAST(t.tn - d.num AS DOUBLE) / (t.td - d.den))
               AS pseudo
      FROM d CROSS JOIN t
    ),
    mp AS (
      SELECT dd, r_full,
             CAST(SUM(CAST(ROUND(pseudo, 8) AS DECIMAL(38,8))) AS DOUBLE) / dd
               AS pbar
      FROM reps GROUP BY dd, r_full
    )
    SELECT mp.dd AS n_days, ROUND(mp.r_full, 6) AS ratio,
           ROUND(sqrt(
             CAST(SUM(CAST(ROUND((reps.pseudo - mp.pbar)
                                 * (reps.pseudo - mp.pbar), 8)
                           AS DECIMAL(38,8))) AS DOUBLE)
             / (mp.dd * (mp.dd - 1.0))), 6) AS jackknife_se
    FROM reps CROSS JOIN mp
    GROUP BY mp.dd, mp.r_full
    """,
)
def jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-day jackknife SE for the revenue-per-purchase ratio —
    the honest uncertainty for ratio metrics (their numerator and
    denominator co-vary, so a per-row CLT is wrong; blocks are days).
    Every leave-one-out replicate comes from corpus totals minus that
    day's partials (the same closed-form ablation trick as
    ablation_source_influence), so D replicates cost one scan; pseudo-
    value moments follow the rounded-term decimal-sum rule."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    d = ev.groupBy(F.to_date("ts").cast("string").alias("day")).agg(
        F.sum(F.round("value", 6).cast("decimal(28,6)")).alias("num"),
        F.count(F.lit(1)).cast("long").alias("den"),
    )
    t = d.agg(
        F.count(F.lit(1)).cast("long").alias("dd"),
        F.sum("num").cast("decimal(38,6)").alias("tn"),
        F.sum("den").cast("long").alias("td"),
    )
    r_full = F.col("tn").cast("double") / F.col("td")
    reps = d.crossJoin(F.broadcast(t)).select(
        "dd",
        r_full.alias("r_full"),
        (
            F.col("dd") * r_full
            - (F.col("dd") - 1)
            * ((F.col("tn") - F.col("num")).cast("double") / (F.col("td") - F.col("den")))
        ).alias("pseudo"),
    )
    mp = reps.groupBy("dd", "r_full").agg(
        (
            F.sum(F.round("pseudo", 8).cast("decimal(38,8)")).cast("double")
            / F.col("dd")
        ).alias("pbar")
    )
    return (
        reps.join(F.broadcast(mp), ["dd", "r_full"])
        .groupBy("dd", "r_full")
        .agg(
            F.sum(
                F.round(
                    (F.col("pseudo") - F.col("pbar"))
                    * (F.col("pseudo") - F.col("pbar")),
                    8,
                ).cast("decimal(38,8)")
            )
            .cast("double")
            .alias("ssq")
        )
        .select(
            F.col("dd").alias("n_days"),
            F.round(F.col("r_full"), 6).alias("ratio"),
            F.round(
                F.sqrt(F.col("ssq") / (F.col("dd") * (F.col("dd") - 1.0))), 6
            ).alias("jackknife_se"),
        )
    )


@query(
    "voptimal_saturated_exact",
    oracle="""
    -- V-optimal DP exactness witness (the saturated regime): with
    -- n_buckets == |distinct values| the DP must place every value in
    -- its own bucket (k buckets over k values, all non-empty), total
    -- SSE exactly 0 regardless of frequency ties — so the emitted
    -- buckets ARE the distinct-value histogram in value order, an exact
    -- GROUP BY + ROW_NUMBER. Pins the DP's prefix-sum/backtrack
    -- machinery under the value hash at any SF. The series is the
    -- doc_id < 1000 slice: the saturated DP is O(n^3) in distinct
    -- values by construction (k = n kills the usual k*n^2 bound's k
    -- factor savings), so the witness input must be FIXED-SIZE — the
    -- same bounded-sample rule as energy_distance_embeddings.
    WITH h AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents WHERE doc_id < 1000 GROUP BY 1
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS INTEGER) AS bucket,
           CAST(v AS BIGINT) AS v, n_docs
    FROM h ORDER BY bucket
    """,
)
def voptimal_saturated_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal histogram witness: n_buckets = number of distinct values
    (derived, so the regime holds at any data scale) forces the DP into
    the all-singletons partition with SSE 0 — the only way to fill k
    buckets with k values — and the result must hash-equal the exact
    distinct-value histogram. Input is the fixed doc_id < 1000 slice:
    the saturated DP is O(n^3) in distinct values, so the witness series
    must stay constant-size at any corpus scale. The data-dependent
    regime (real bucket merging, tie-broken leftmost) stays covered by
    voptimal_histogram_stats' rows-only check and the brute-force
    property test."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    rows = (
        docs.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .orderBy("v")
        .collect()
    )  # domain-bounded: distinct lengths, not rows
    vals = [int(r["v"]) for r in rows]
    freqs = [int(r["f"]) for r in rows]
    bounds, sse_opt = quality.v_optimal_partition(freqs, len(freqs))
    assert sse_opt == 0.0 and len(bounds) == len(freqs), (
        "saturated V-optimal DP must emit singleton buckets with zero SSE"
    )
    out = []
    start = 0
    for b, end in enumerate(bounds):
        assert end == start + 1
        out.append((b, vals[start], freqs[start]))
        start = end
    return spark.createDataFrame(
        out, "bucket int, v bigint, n_docs bigint"
    ).orderBy("bucket")


@query("voptimal_histogram_stats", witness="voptimal_saturated_exact")
def voptimal_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal histogram of the document-length distribution (Jagadish
    et al., VLDB 1998) — the planner-statistics structure that beats
    equal-width binning where it matters (selectivity estimation over
    skewed columns): bucket boundaries minimize total within-bucket
    frequency variance by exact dynamic programming. The frequency series
    is the distinct-value histogram (domain-bounded: n_chars has a few
    hundred support points at ANY data scale), aggregated distributed and
    folded on the driver like the Holt-Winters series; the result carries
    the v-optimal SSE next to the equal-width SSE on the same data —
    optimality is visible, and exactness is brute-force property-tested.
    Rows-only (a DP over split points is not SQL-expressible)."""
    n_buckets = 8
    docs = load(spark, sf_dir, "documents")
    rows = (
        docs.groupBy(F.col("n_chars").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
        .orderBy("v")
        .collect()
    )  # domain-bounded: distinct lengths, not rows
    vals = [int(r["v"]) for r in rows]
    freqs = [int(r["f"]) for r in rows]
    bounds, sse_opt = quality.v_optimal_partition(freqs, n_buckets)
    # equal-width comparison on the same series
    lo_v, hi_v = vals[0], vals[-1]
    width = (hi_v - lo_v) / n_buckets
    ew_groups: list[list[int]] = [[] for _ in range(n_buckets)]
    for v, f in zip(vals, freqs):
        b = min(int((v - lo_v) / width) if width > 0 else 0, n_buckets - 1)
        ew_groups[b].append(f)
    sse_ew = 0.0
    for g in ew_groups:
        if g:
            s, ss = sum(g), sum(x * x for x in g)
            sse_ew += ss - s * s / len(g)
    out = []
    start = 0
    for b, end in enumerate(bounds):
        fs = freqs[start:end]
        s = sum(fs)
        out.append(
            (
                b,
                int(vals[start]),
                int(vals[end - 1]),
                int(end - start),
                int(s),
                round(s / len(fs), 4),
                round(sse_opt, 4),
                round(sse_ew, 4),
            )
        )
        start = end
    return spark.createDataFrame(
        out,
        "bucket int, v_lo bigint, v_hi bigint, n_values bigint, n_docs bigint,"
        " avg_freq double, sse_voptimal double, sse_equal_width double",
    ).orderBy("bucket")


@query(
    "gtest_independence_lang_source",
    oracle="""
    -- G-test (log-likelihood ratio) of lang x source independence: the
    -- LR companion of chi_square_lang_source (G is additive across
    -- partitions of the table and is what deviance-based pipelines
    -- report). G = 2 * sum O * ln(O * N / (R * C)); each term ROUND@8
    -- then DECIMAL-summed — the ln chain is identical IEEE on exact
    -- integer ratios.
    WITH o AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
      FROM documents GROUP BY lang, source
    ),
    r AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS rt FROM o GROUP BY lang),
    c AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS ct FROM o GROUP BY source),
    n AS (SELECT CAST(SUM(obs) AS BIGINT) AS nt FROM o),
    terms AS (
      SELECT ROUND(o.obs * ln(o.obs * 1.0 * n.nt / (r.rt * 1.0 * c.ct)), 8)
               AS t
      FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n
    ),
    dof AS (
      SELECT CAST((SELECT COUNT(*) FROM r) - 1 AS BIGINT)
             * CAST((SELECT COUNT(*) FROM c) - 1 AS BIGINT) AS dof
    )
    SELECT dof.dof,
           ROUND(2.0 * CAST(SUM(CAST(t AS DECIMAL(28,8))) AS DOUBLE), 6)
             AS g_statistic
    FROM terms CROSS JOIN dof GROUP BY dof.dof
    """,
)
def gtest_independence_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test of independence for the lang x source contingency table —
    the log-likelihood-ratio companion of chi_square_lang_source:
    additive across table partitions (sub-table G's sum to the total, so
    per-shard G's merge, which Pearson's X² doesn't do exactly) and the
    statistic deviance-based model pipelines report. One grouped pass +
    broadcast marginals; every O*ln(O*N/(R*C)) term rounds before a
    decimal sum."""
    docs = load(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    r = o.groupBy("lang").agg(F.sum("obs").cast("long").alias("rt"))
    c = o.groupBy("source").agg(F.sum("obs").cast("long").alias("ct"))
    n = o.agg(F.sum("obs").cast("long").alias("nt"))
    dof = (
        r.agg(F.count(F.lit(1)).alias("nr"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("nc")))
        .select(((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"))
    )
    terms = (
        o.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(
                F.col("obs")
                * F.log(
                    F.col("obs") * 1.0 * F.col("nt") / (F.col("rt") * 1.0 * F.col("ct"))
                ),
                8,
            ).alias("t")
        )
    )
    return (
        terms.crossJoin(F.broadcast(dof))
        .groupBy("dof")
        .agg(
            F.round(
                2.0 * F.sum(F.col("t").cast("decimal(28,8)")).cast("double"), 6
            ).alias("g_statistic")
        )
        .select("dof", "g_statistic")
    )


@query(
    "cohens_kappa_langid_agreement",
    oracle="""
    -- Cohen's kappa between the n-gram language-id heuristic and the
    -- gold lang label — the annotation-pipeline agreement audit:
    -- accuracy corrected for chance agreement. The heuristic is the
    -- registered lang_id_heuristic rule (stopword-hit English detector);
    -- kappa = (po - pe) / (1 - pe) from exact confusion counts.
    WITH pred AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS gold_en,
             CASE WHEN (length(lower(text)) - length(replace(lower(text), ' the ', '')))
                    / 5 >= 2
                   OR (length(lower(text)) - length(replace(lower(text), ' and ', '')))
                    / 5 >= 2
                  THEN 1 ELSE 0 END AS pred_en
      FROM documents
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN gold_en = 1 AND pred_en = 1 THEN 1 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN gold_en = 0 AND pred_en = 0 THEN 1 END) AS BIGINT) AS tn,
             CAST(SUM(CASE WHEN gold_en = 1 THEN 1 END) AS BIGINT) AS gold_pos,
             CAST(SUM(CASE WHEN pred_en = 1 THEN 1 END) AS BIGINT) AS pred_pos
      FROM pred
    )
    SELECT n, tp, tn,
           ROUND((tp + tn) * 1.0 / n, 6) AS observed_agreement,
           ROUND((gold_pos * 1.0 * pred_pos + (n - gold_pos) * 1.0 * (n - pred_pos))
                 / (n * 1.0 * n), 6) AS chance_agreement,
           ROUND(((tp + tn) * 1.0 / n
                  - (gold_pos * 1.0 * pred_pos + (n - gold_pos) * 1.0 * (n - pred_pos))
                    / (n * 1.0 * n))
                 / (1.0
                    - (gold_pos * 1.0 * pred_pos + (n - gold_pos) * 1.0 * (n - pred_pos))
                      / (n * 1.0 * n)), 6) AS cohens_kappa
    FROM m
    """,
)
def cohens_kappa_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between a cheap stopword language detector and the
    gold lang label — the agreement statistic every annotation/labeling
    pipeline reports before trusting a weak labeler (raw accuracy flatters
    detectors on imbalanced labels; kappa subtracts the chance-agreement
    floor). Exact integer confusion counts from one pass; the closed form
    is a single double chain."""
    docs = load(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))

    def hits(token: str):
        return (
            F.length(low) - F.length(F.replace(low, F.lit(token), F.lit("")))
        ) / len(token)

    pred = docs.select(
        (F.col("lang") == "en").cast("int").alias("gold_en"),
        ((hits(" the ") >= 2) | (hits(" and ") >= 2)).cast("int").alias("pred_en"),
    )
    m = pred.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(((F.col("gold_en") == 1) & (F.col("pred_en") == 1)).cast("long"))
        .cast("long")
        .alias("tp"),
        F.sum(((F.col("gold_en") == 0) & (F.col("pred_en") == 0)).cast("long"))
        .cast("long")
        .alias("tn"),
        F.sum("gold_en").cast("long").alias("gold_pos"),
        F.sum("pred_en").cast("long").alias("pred_pos"),
    )
    n = F.col("n") * 1.0
    po = (F.col("tp") + F.col("tn")) * 1.0 / F.col("n")
    pe = (
        F.col("gold_pos") * 1.0 * F.col("pred_pos")
        + (F.col("n") - F.col("gold_pos")) * 1.0 * (F.col("n") - F.col("pred_pos"))
    ) / (F.col("n") * 1.0 * F.col("n"))
    return m.select(
        "n",
        "tp",
        "tn",
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("chance_agreement"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("cohens_kappa"),
    )


@query(
    "mcnemar_labeler_comparison",
    oracle="""
    -- McNemar's test between two weak language labelers on the SAME
    -- documents (the paired-design companion of the kappa audit): only
    -- the DISCORDANT pairs carry information — b = A right where B is
    -- wrong, c = the reverse; chi2 = (b-c)^2/(b+c). Exact integer
    -- counts, one pass.
    WITH lab AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS gold,
             CASE WHEN (length(lower(text)) - length(replace(lower(text), ' the ', '')))
                    / 5 >= 2
                   OR (length(lower(text)) - length(replace(lower(text), ' and ', '')))
                    / 5 >= 2
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN (length(lower(text)) - length(replace(lower(text), ' of ', '')))
                    / 4 >= 1
                   OR (length(lower(text)) - length(replace(lower(text), ' is ', '')))
                    / 4 >= 1
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN a = gold AND b <> gold THEN 1 END) AS BIGINT)
               AS n_b,
             CAST(SUM(CASE WHEN a <> gold AND b = gold THEN 1 END) AS BIGINT)
               AS n_c
      FROM lab
    )
    SELECT n_b, n_c,
           ROUND((n_b - n_c) * (n_b - n_c) * 1.0 / (n_b + n_c), 6)
             AS mcnemar_chi2
    FROM m
    """,
)
def mcnemar_labeler_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test comparing two weak language labelers on paired
    documents — the right test for "is labeler A better than B on the
    same data" (an unpaired proportion test wastes the pairing; McNemar
    looks only at discordant pairs). Completes the weak-supervision
    audit pair with cohens_kappa_langid_agreement; exact integer counts,
    single pass, hash-checked."""
    docs = load(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))

    def hits(token: str):
        return (
            F.length(low) - F.length(F.replace(low, F.lit(token), F.lit("")))
        ) / len(token)

    lab = docs.select(
        (F.col("lang") == "en").cast("int").alias("gold"),
        ((hits(" the ") >= 2) | (hits(" and ") >= 2)).cast("int").alias("a"),
        ((hits(" of ") >= 1) | (hits(" is ") >= 1)).cast("int").alias("b"),
    )
    m = lab.agg(
        F.sum(((F.col("a") == F.col("gold")) & (F.col("b") != F.col("gold"))).cast("long"))
        .cast("long")
        .alias("n_b"),
        F.sum(((F.col("a") != F.col("gold")) & (F.col("b") == F.col("gold"))).cast("long"))
        .cast("long")
        .alias("n_c"),
    )
    return m.select(
        "n_b",
        "n_c",
        F.round(
            (F.col("n_b") - F.col("n_c"))
            * (F.col("n_b") - F.col("n_c"))
            * 1.0
            / (F.col("n_b") + F.col("n_c")),
            6,
        ).alias("mcnemar_chi2"),
    )


@query(
    "labeler_precision_recall_f1",
    oracle="""
    -- the classification report completing the weak-supervision audit
    -- trio (kappa: chance-corrected agreement; McNemar: A vs B; this:
    -- the per-class operating point): precision/recall/F1 of the
    -- stopword language labeler against gold, from exact confusion
    -- counts in one pass.
    WITH lab AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS gold,
             CASE WHEN (length(lower(text)) - length(replace(lower(text), ' the ', '')))
                    / 5 >= 2
                   OR (length(lower(text)) - length(replace(lower(text), ' and ', '')))
                    / 5 >= 2
                  THEN 1 ELSE 0 END AS pred
      FROM documents
    ),
    m AS (
      SELECT CAST(SUM(CASE WHEN gold = 1 AND pred = 1 THEN 1 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN gold = 0 AND pred = 1 THEN 1 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN gold = 1 AND pred = 0 THEN 1 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN gold = 0 AND pred = 0 THEN 1 END) AS BIGINT) AS tn
      FROM lab
    )
    SELECT tp, fp, fn, tn,
           ROUND(tp * 1.0 / (tp + fp), 6) AS "precision",
           ROUND(tp * 1.0 / (tp + fn), 6) AS recall,
           ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1
    FROM m
    """,
)
def labeler_precision_recall_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 of the weak stopword language labeler against
    gold — the per-class operating point that complements kappa (overall
    chance-corrected agreement) and McNemar (labeler-vs-labeler): the
    numbers a filtering pipeline uses to set its keep threshold. Exact
    confusion counts from one scan; closed forms are single double
    chains."""
    docs = load(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))

    def hits(token: str):
        return (
            F.length(low) - F.length(F.replace(low, F.lit(token), F.lit("")))
        ) / len(token)

    lab = docs.select(
        (F.col("lang") == "en").cast("int").alias("gold"),
        ((hits(" the ") >= 2) | (hits(" and ") >= 2)).cast("int").alias("pred"),
    )
    m = lab.agg(
        F.sum(((F.col("gold") == 1) & (F.col("pred") == 1)).cast("long"))
        .cast("long")
        .alias("tp"),
        F.sum(((F.col("gold") == 0) & (F.col("pred") == 1)).cast("long"))
        .cast("long")
        .alias("fp"),
        F.sum(((F.col("gold") == 1) & (F.col("pred") == 0)).cast("long"))
        .cast("long")
        .alias("fn"),
        F.sum(((F.col("gold") == 0) & (F.col("pred") == 0)).cast("long"))
        .cast("long")
        .alias("tn"),
    )
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.col("tp") * 1.0 / (F.col("tp") + F.col("fp")), 6).alias("precision"),
        F.round(F.col("tp") * 1.0 / (F.col("tp") + F.col("fn")), 6).alias("recall"),
        F.round(
            2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("f1"),
    )


@query(
    "diversity_index_by_source",
    oracle="""
    -- Language-diversity indices per source — the curation dashboard's
    -- "is this feed monolingual" number: Simpson (1 - sum p^2), Shannon
    -- entropy (nats), and Hill number exp(H) = effective language count.
    -- Shares are exact int/int doubles; squared/ln terms ROUND@10 into
    -- DECIMAL sums; exp runs on the identical double in both engines.
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY source),
    terms AS (
      SELECT c.source, c.c, n.n,
             CAST(ROUND((c.c * 1.0 / n.n) * (c.c * 1.0 / n.n), 10)
               AS DECIMAL(28,10)) AS p2,
             CAST(ROUND((c.c * 1.0 / n.n) * ln(c.c * 1.0 / n.n), 10)
               AS DECIMAL(28,10)) AS plnp
      FROM c JOIN n USING (source)
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(1.0 - CAST(SUM(p2) AS DOUBLE), 6) AS simpson,
           ROUND(-CAST(SUM(plnp) AS DOUBLE), 6) AS shannon_nats,
           ROUND(exp(-CAST(SUM(plnp) AS DOUBLE)), 6) AS effective_langs
    FROM terms GROUP BY source ORDER BY source
    """,
)
def diversity_index_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson index, Shannon entropy, and the Hill effective-language
    count of each source's language mix — the diversity triple a mixture
    planner reads before rebalancing a feed. One (source, lang) aggregate;
    squared-share and p*ln(p) terms follow the ROUND -> DECIMAL rule, so
    all three indices are engine-exact.

    Scale shape: map-side combine on (source, lang); everything after is
    |sources| x |langs| rows."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = c.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    terms = c.join(n, "source").select(
        "source",
        F.round(p * p, 10).cast("decimal(28,10)").alias("p2"),
        F.round(p * F.log(p), 10).cast("decimal(28,10)").alias("plnp"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.round(1.0 - F.sum("p2").cast("double"), 6).alias("simpson"),
            F.round(-F.sum("plnp").cast("double"), 6).alias("shannon_nats"),
            F.round(F.exp(-F.sum("plnp").cast("double")), 6).alias(
                "effective_langs"
            ),
        )
        .orderBy("source")
    )


PH_LAMBDA = 150.0
PH_ORACLE = """
    -- Page-Hinkley drift monitor per event type: m_t = sum(x_s - mean_s)
    -- over the daily series (running mean, delta=0), alarm when
    -- m_t - min_{s<=t} m_s clears lambda. Terms ROUND@8 into DECIMAL
    -- window sums; running means k/t never hit a rounding tie (t <= 31:
    -- terminating denominators have <= 6 decimals). Reports each key's
    -- max PH statistic and first alarm day.
    WITH daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, x,
             CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS t
      FROM daily
    ),
    terms AS (
      SELECT event_type, day,
             CAST(ROUND(x - cum * 1.0 / t, 8) AS DECIMAL(28,8)) AS term
      FROM w
    ),
    mt AS (
      SELECT event_type, day,
             CAST(SUM(term) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS m
      FROM terms
    ),
    ph AS (
      SELECT event_type, day, m,
             m - MIN(m) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS ph
      FROM mt
    )
    SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(MAX(ph), 6) AS max_ph,
           COALESCE(MIN(CASE WHEN ph > 150.0 THEN day END), 'none')
             AS first_alarm_day
    FROM ph GROUP BY event_type ORDER BY key
    """


@query("page_hinkley_drift", oracle=PH_ORACLE)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift monitor on each event type's daily series —
    the sequential drift detector between the EWMA chart (smooth drift)
    and CUSUM (retrospective argmax): alarms online when the walk
    m_t = sum(x_s - running_mean_s) rises lambda above its running
    minimum. Terms ROUND@8 into decimal window sums; with <= 31 days a
    running mean can never land on a rounding tie, so the walk is
    engine-exact.

    Scale shape: one map-side (type, day) aggregate; the walk runs on
    calendar-bounded partitions."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w_cum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w = daily.select(
        "event_type",
        "day",
        "x",
        F.sum("x").over(w_cum).cast("long").alias("cum"),
        F.row_number().over(w_ord).cast("long").alias("t"),
    )
    terms = w.select(
        "event_type",
        "day",
        F.round(F.col("x") - F.col("cum") * 1.0 / F.col("t"), 8)
        .cast("decimal(28,8)")
        .alias("term"),
    )
    mt = terms.select(
        "event_type",
        "day",
        F.sum("term").over(w_cum).cast("double").alias("m"),
    )
    ph = mt.select(
        "event_type",
        "day",
        (F.col("m") - F.min("m").over(w_cum)).alias("ph"),
    )
    return (
        ph.groupBy(F.col("event_type").alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.max("ph"), 6).alias("max_ph"),
            F.coalesce(
                F.min(F.when(F.col("ph") > PH_LAMBDA, F.col("day"))),
                F.lit("none"),
            ).alias("first_alarm_day"),
        )
        .orderBy("key")
    )


@query(
    "calibration_error_summary",
    oracle="""
    -- The scalar calibration scorecard on top of the reliability diagram:
    -- ECE (bin-weighted |mean score - observed rate|), MCE (worst bin),
    -- and the Brier score — the numbers a probability gate must publish
    -- before its threshold is trusted. Same logistic score and fixed 0.1
    -- bins as score_calibration_bins; per-bin and per-doc terms ROUND
    -- into DECIMAL sums.
    WITH f AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             ROUND(1.0 / (1.0 + exp(-(
               -1.5
               + 4.0 * (len(list_filter(string_split(lower(text), ' '),
                             w -> list_contains(
                               ['the','a','of','and','to','in','is','it','that','for'],
                               w))) * 1.0
                        / len(list_filter(string_split(lower(text), ' '),
                                          w -> w <> '')))
               - 6.0 * (length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
                        / length(text))
               + 0.004 * len(list_filter(string_split(lower(text), ' '),
                                         w -> w <> ''))
             ))), 6) AS score
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
        AND length(text) > 0
    ),
    b AS (
      SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(CAST(ROUND(score, 6) AS DECIMAL(28,6))) AS DOUBLE) AS ss,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM f GROUP BY 1
    ),
    nn AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM b),
    gaps AS (
      SELECT b.n_b, nn.n,
             ABS(b.ss / b.n_b - b.pos * 1.0 / b.n_b) AS gap
      FROM b CROSS JOIN nn
    ),
    ece AS (
      SELECT CAST(SUM(CAST(ROUND(n_b * gap / n, 10) AS DECIMAL(28,10)))
               AS DOUBLE) AS ece,
             MAX(ROUND(gap, 10)) AS mce
      FROM gaps
    ),
    brier AS (
      SELECT CAST(SUM(CAST(ROUND((score - y) * (score - y), 8)
                           AS DECIMAL(28,8))) AS DOUBLE) AS bsum
      FROM f
    )
    SELECT nn.n, ROUND(ece.ece, 6) AS ece, ROUND(ece.mce, 6) AS mce,
           ROUND(brier.bsum / nn.n, 6) AS brier
    FROM nn CROSS JOIN ece CROSS JOIN brier
    """,
)
def calibration_error_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error and the Brier score of the
    logistic quality gate — the scalar scorecard over the reliability
    diagram (ECE weights each bin's |confidence - accuracy| gap by mass;
    Brier is the proper scoring rule that decomposes into calibration +
    refinement). Same fixed 0.1 bins; every sum is a rounded-term decimal
    accumulation, so all three scalars are engine-exact.

    Scale shape: one map-side scored scan + a 10-row rollup."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as T

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(T.word_tokens(F.col("text")))
    lin = T.logistic_quality_linear(F.col("text"))
    f = docs.filter((n_tok > 0) & (F.length("text") > 0)).select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-lin)), 6).alias("score"),
    ).persist()
    b = f.groupBy(
        F.least(F.floor(F.col("score") * 10).cast("long"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum(F.round("score", 6).cast("decimal(28,6)")).cast("double").alias("ss"),
        F.sum("y").cast("long").alias("pos"),
    )
    nn = b.agg(F.sum("n_b").cast("long").alias("n"))
    gap = F.abs(F.col("ss") / F.col("n_b") - F.col("pos") * 1.0 / F.col("n_b"))
    gaps = b.crossJoin(F.broadcast(nn)).select("n_b", "n", gap.alias("gap"))
    ece = gaps.agg(
        F.sum(
            F.round(F.col("n_b") * F.col("gap") / F.col("n"), 10).cast(
                "decimal(28,10)"
            )
        )
        .cast("double")
        .alias("ece"),
        F.max(F.round("gap", 10)).alias("mce"),
    )
    brier = f.agg(
        F.sum(
            F.round(
                (F.col("score") - F.col("y")) * (F.col("score") - F.col("y")), 8
            ).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("bsum")
    )
    return (
        nn.crossJoin(F.broadcast(ece))
        .crossJoin(F.broadcast(brier))
        .select(
            "n",
            F.round("ece", 6).alias("ece"),
            F.round("mce", 6).alias("mce"),
            F.round(F.col("bsum") / F.col("n"), 6).alias("brier"),
        )
    )


@query(
    "fleiss_kappa_weak_labelers",
    oracle=f"""
    -- Fleiss' kappa across THREE weak English-labelers (stopword-density,
    -- punctuation-sparsity, length): the multi-rater generalization of
    -- Cohen's kappa the weak-supervision audit needs once there are more
    -- than two labelers. With n=3 raters and 2 categories, each doc's
    -- agreement P_i has an exact integer numerator, so Pbar, Pe, and
    -- kappa are pure int-ratio double chains — engine-exact.
    WITH votes AS (
      SELECT
        (CASE WHEN len(list_filter(string_split(lower(text), ' '),
                       w -> w IN {_STOPS_SQL})) * 1.0
                   / len(list_filter(string_split(lower(text), ' '),
                                     w -> w <> '')) >= 0.05
              THEN 1 ELSE 0 END)
        + (CASE WHEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                     * 1.0 / length(text) <= 0.08 THEN 1 ELSE 0 END)
        + (CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END) AS n_en
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
        AND length(text) > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_en * (n_en - 1) + (3 - n_en) * (2 - n_en))
               AS BIGINT) AS agree_num,
             CAST(SUM(n_en) AS BIGINT) AS tot_en
      FROM votes
    )
    SELECT n_docs,
           ROUND(agree_num * 1.0 / (6.0 * n_docs), 6) AS pbar,
           ROUND((tot_en * 1.0 / (3.0 * n_docs)) * (tot_en * 1.0 / (3.0 * n_docs))
                 + (1.0 - tot_en * 1.0 / (3.0 * n_docs))
                   * (1.0 - tot_en * 1.0 / (3.0 * n_docs)), 6) AS pe,
           ROUND((agree_num * 1.0 / (6.0 * n_docs)
                  - ((tot_en * 1.0 / (3.0 * n_docs))
                     * (tot_en * 1.0 / (3.0 * n_docs))
                     + (1.0 - tot_en * 1.0 / (3.0 * n_docs))
                       * (1.0 - tot_en * 1.0 / (3.0 * n_docs))))
                 / (1.0 - ((tot_en * 1.0 / (3.0 * n_docs))
                           * (tot_en * 1.0 / (3.0 * n_docs))
                           + (1.0 - tot_en * 1.0 / (3.0 * n_docs))
                             * (1.0 - tot_en * 1.0 / (3.0 * n_docs)))), 6)
             AS kappa
    FROM agg
    """,
)
def fleiss_kappa_weak_labelers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over three deterministic weak English-labelers
    (stopword density >= 0.05, punctuation ratio <= 0.08, length >= 500)
    — the multi-rater agreement statistic that extends the Cohen's-kappa
    audit once a labeling pipeline has more than two weak sources. Each
    document's pairwise-agreement numerator n_en(n_en-1)+(3-n_en)(2-n_en)
    is an exact integer, so the whole statistic is one aggregate and an
    exact int-ratio double chain.

    Scale shape: one map-only vote pass, one scalar aggregate."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as T

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(T.word_tokens(F.col("text")))
    r1 = (T.stopword_ratio(F.col("text")) >= 0.05).cast("long")
    r2 = (T.punct_ratio(F.col("text")) <= 0.08).cast("long")
    r3 = (F.col("n_chars") >= 500).cast("long")
    votes = docs.filter((n_tok > 0) & (F.length("text") > 0)).select(
        (r1 + r2 + r3).alias("n_en")
    )
    agg = votes.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.col("n_en") * (F.col("n_en") - 1)
            + (3 - F.col("n_en")) * (2 - F.col("n_en"))
        )
        .cast("long")
        .alias("agree_num"),
        F.sum("n_en").cast("long").alias("tot_en"),
    )
    p_en = F.col("tot_en") * 1.0 / (3.0 * F.col("n_docs"))
    pe = p_en * p_en + (1.0 - p_en) * (1.0 - p_en)
    pbar = F.col("agree_num") * 1.0 / (6.0 * F.col("n_docs"))
    return agg.select(
        "n_docs",
        F.round(pbar, 6).alias("pbar"),
        F.round(pe, 6).alias("pe"),
        F.round((pbar - pe) / (1.0 - pe), 6).alias("kappa"),
    )


@query(
    "brown_forsythe_variance_test",
    oracle="""
    -- Brown-Forsythe variance-equality test of event value across the 5
    -- event types: one-way ANOVA on |x - group LOWER MEDIAN| — the robust
    -- Levene variant that justifies (or forbids) the pooled-variance
    -- assumption under anova_f_oneway_value_by_type. The lower median is
    -- an exact order statistic (rank (n+1)//2 with event_id tie-break), so
    -- every deviation is an exact IEEE subtraction; z terms ROUND@1e-6 ->
    -- DECIMAL moments -> closed-form F, bit-identical cross-engine.
    WITH e AS (SELECT event_type, value, event_id FROM events),
    r AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_g
      FROM e
    ),
    med AS (SELECT event_type, value AS med FROM r WHERE rn = (n_g + 1) // 2),
    z AS (
      SELECT e.event_type, ROUND(ABS(e.value - m.med), 6) AS z
      FROM e JOIN med m USING (event_type)
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(z AS DECIMAL(28,6))) AS DOUBLE) AS s_g,
             CAST(SUM(CAST(ROUND(z * z, 6) AS DECIMAL(28,6))) AS DOUBLE) AS ss_g
      FROM z GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(s_g AS DECIMAL(28,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(ss_g AS DECIMAL(28,6))) AS DOUBLE) AS ss
      FROM g
    ),
    parts AS (
      SELECT tot.k, tot.n,
             CAST(SUM(CAST(ROUND(g.s_g * g.s_g / g.n_g, 6)
                           AS DECIMAL(28,6))) AS DOUBLE)
               - tot.s * tot.s / tot.n AS ssb,
             tot.ss - CAST(SUM(CAST(ROUND(g.s_g * g.s_g / g.n_g, 6)
                                    AS DECIMAL(28,6))) AS DOUBLE) AS ssw
      FROM g CROSS JOIN tot
      GROUP BY tot.k, tot.n, tot.s, tot.ss
    )
    SELECT k, n, ROUND(ssb, 4) AS ss_between, ROUND(ssw, 4) AS ss_within,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS bf_stat
    FROM parts
    """,
)
def brown_forsythe_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test of variance equality across event types — the
    robust (median-centered) Levene variant: the diagnostic that decides
    whether anova_f_oneway's pooled-variance denominator or welch_t's
    unpooled one is the honest model. F on |x - group median| deviations.

    Scale shape: the lower median is an exact rank selection (one window
    per group; k = 5 groups, so the per-group sorts run in parallel — at
    real scale the selection step would swap to the histogram-bisect rank
    search the quantile family uses, the deviation/moment passes are
    unchanged). Medians broadcast (k rows); deviations and moments are one
    map-side-combining scan. ROUND->DECIMAL moments keep F bit-identical."""
    ev = load(spark, sf_dir, "events").select("event_type", "value", "event_id")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    med = (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_g", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.expr("(n_g + 1) DIV 2"))
        .select("event_type", F.col("value").alias("med"))
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.round(F.abs(F.col("value") - F.col("med")), 6).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("z").cast("decimal(28,6)")).cast("double").alias("s_g"),
        F.sum(F.round(F.col("z") * F.col("z"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("ss_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("s_g").cast("decimal(28,6)")).cast("double").alias("s"),
        F.sum(F.col("ss_g").cast("decimal(28,6)")).cast("double").alias("ss"),
    )
    parts = (
        g.crossJoin(F.broadcast(tot))
        .groupBy("k", "n", "s", "ss")
        .agg(
            F.sum(
                F.round(F.col("s_g") * F.col("s_g") / F.col("n_g"), 6).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("between_raw")
        )
        .select(
            "k",
            "n",
            (F.col("between_raw") - F.col("s") * F.col("s") / F.col("n")).alias("ssb"),
            (F.col("ss") - F.col("between_raw")).alias("ssw"),
        )
    )
    return parts.select(
        "k",
        "n",
        F.round(F.col("ssb"), 4).alias("ss_between"),
        F.round(F.col("ssw"), 4).alias("ss_within"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n") - F.col("k"))),
            6,
        ).alias("bf_stat"),
    )


@query(
    "woe_information_value",
    oracle="""
    -- Weight-of-Evidence / Information Value — the credit-scoring feature
    -- screen: per fixed-width document-length bin, WOE = ln(pos share /
    -- neg share) (Laplace +1 per cell so empty cells stay finite), and
    -- IV = sum (pos_share - neg_share) * WOE. The standard read: IV < 0.02
    -- useless, 0.1-0.3 medium, > 0.5 suspicious. Counts exact int64; each
    -- WOE is ln of an exact-int ratio ROUND@1e-8; IV terms ROUND@1e-8 ->
    -- DECIMAL sum.
    WITH d AS (
      SELECT CAST(n_chars // 100 AS BIGINT) AS bin,
             CASE WHEN len(list_filter(string_split(lower(text), ' '),
                                       w -> w IN {stops})) * 1.0
                       / len(list_filter(string_split(lower(text), ' '),
                                         w -> w <> '')) >= 0.05
                  THEN 1 ELSE 0 END AS y
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
    ),
    tot AS (SELECT CAST(SUM(y) AS BIGINT) AS pos_tot,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg_tot FROM d),
    b AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
      FROM d GROUP BY bin
    ),
    w AS (
      SELECT b.bin, b.n, b.pos, b.neg,
             ROUND(ln((b.pos + 1) * (t.neg_tot + 1) * 1.0
                      / ((b.neg + 1) * (t.pos_tot + 1))), 8) AS woe,
             (b.pos + 1) * 1.0 / (t.pos_tot + 1)
               - (b.neg + 1) * 1.0 / (t.neg_tot + 1) AS share_gap
      FROM b CROSS JOIN tot t
    ),
    iv AS (
      SELECT ROUND(CAST(SUM(CAST(ROUND(share_gap * woe, 8)
                                 AS DECIMAL(28,8))) AS DOUBLE), 6) AS iv
      FROM w
    )
    SELECT w.bin, w.n, w.pos, w.neg, ROUND(w.woe, 6) AS woe, iv.iv
    FROM w CROSS JOIN iv
    ORDER BY w.bin
    """.replace("{stops}", _STOPS_SQL),
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence / Information Value screen of document length
    against the stopword quality gate — the credit-scoring-era feature
    audit that complements PSI (drift) and the decision stump (best
    split): per-bin WOE says WHERE the feature separates, IV compresses
    it to the one screening number every feature pipeline ranks by.

    Scale shape: one labeled scan, one groupBy on a fixed-width bin
    (data-independent — no quantile pass), a broadcast totals row; WOE is
    ln of exact-int ratios (Laplace +1 keeps empty cells finite) and IV a
    per-term-rounded decimal sum, so the report is hash-stable."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.plans.eval_queries import (
        stump_labeled_features,
    )

    docs = load(spark, sf_dir, "documents")
    d = stump_labeled_features(docs).select(
        (F.col("x") / 100).cast("long").alias("bin"), "y"
    )
    tot = d.agg(
        F.sum("y").cast("long").alias("pos_tot"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg_tot"),
    )
    b = d.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    w = b.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "pos",
        "neg",
        F.round(
            F.log(
                (F.col("pos") + 1)
                * (F.col("neg_tot") + 1)
                * F.lit(1.0)
                / ((F.col("neg") + 1) * (F.col("pos_tot") + 1))
            ),
            8,
        ).alias("woe"),
        (
            (F.col("pos") + 1) * F.lit(1.0) / (F.col("pos_tot") + 1)
            - (F.col("neg") + 1) * F.lit(1.0) / (F.col("neg_tot") + 1)
        ).alias("share_gap"),
    )
    iv = w.agg(
        F.round(
            F.sum(
                F.round(F.col("share_gap") * F.col("woe"), 8).cast("decimal(28,8)")
            ).cast("double"),
            6,
        ).alias("iv")
    )
    return (
        w.crossJoin(F.broadcast(iv))
        .select("bin", "n", "pos", "neg", F.round("woe", 6).alias("woe"), "iv")
        .orderBy("bin")
    )


# --- Mondrian k-anonymity generalization --------------------------------------

_MOND_K = 50
_MOND_ROUNDS = 4


def _mondrian_oracle() -> str:
    """Unrolled Mondrian rounds (Mondrian multidimensional k-anonymity,
    LeFevre et al. 2006): every CTE referenced more than once is
    MATERIALIZED (the r6 exponential-re-evaluation lesson)."""
    sql = """
    WITH p0 AS MATERIALIZED (
      SELECT c_custkey AS id, CAST(c_nationkey AS BIGINT) AS nk,
             c_acctbal AS ab, CAST(0 AS BIGINT) AS pid
      FROM customer
    ),
    g AS MATERIALIZED (
      SELECT (MAX(nk) - MIN(nk)) * 1.0 AS gnk,
             (MAX(ab) - MIN(ab)) * 1.0 AS gab
      FROM p0
    )"""
    for r in range(_MOND_ROUNDS):
        sql += f""",
    rk{r} AS MATERIALIZED (
      SELECT pid, id, nk, ab,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY nk, id) AS rn_nk,
             ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ab, id) AS rn_ab,
             COUNT(*) OVER (PARTITION BY pid) AS n
      FROM p{r}
    ),
    med{r} AS MATERIALIZED (
      SELECT pid,
             MAX(CASE WHEN rn_nk = (n + 1) // 2 THEN nk END) AS med_nk,
             MAX(CASE WHEN rn_ab = (n + 1) // 2 THEN ab END) AS med_ab,
             MAX(nk) - MIN(nk) AS wnk, MAX(ab) - MIN(ab) AS wab
      FROM rk{r} GROUP BY pid
    ),
    dec{r} AS MATERIALIZED (
      SELECT m.pid,
             CASE WHEN m.wnk * 1.0 / g.gnk >= m.wab / g.gab
                  THEN 0 ELSE 1 END AS dim,
             m.med_nk, m.med_ab
      FROM med{r} m CROSS JOIN g
    ),
    nl{r} AS MATERIALIZED (
      SELECT r.pid,
             CAST(SUM(CASE WHEN (d.dim = 0 AND r.nk <= d.med_nk)
                             OR (d.dim = 1 AND r.ab <= d.med_ab)
                           THEN 1 ELSE 0 END) AS BIGINT) AS nl,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM rk{r} r JOIN dec{r} d ON d.pid = r.pid GROUP BY r.pid
    ),
    p{r + 1} AS MATERIALIZED (
      SELECT r.id, r.nk, r.ab,
             CASE WHEN l.nl >= {_MOND_K} AND l.n - l.nl >= {_MOND_K}
                  THEN r.pid * 2
                       + (CASE WHEN (d.dim = 0 AND r.nk <= d.med_nk)
                                 OR (d.dim = 1 AND r.ab <= d.med_ab)
                               THEN 0 ELSE 1 END)
                  ELSE r.pid * 2 END AS pid
      FROM rk{r} r
      JOIN dec{r} d ON d.pid = r.pid
      JOIN nl{r} l ON l.pid = r.pid
    )"""
    sql += f"""
    SELECT pid, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(nk) AS BIGINT) AS nation_lo,
           CAST(MAX(nk) AS BIGINT) AS nation_hi,
           MIN(ab) AS acctbal_lo, MAX(ab) AS acctbal_hi,
           COUNT(*) >= {_MOND_K} AS k_anonymous
    FROM p{_MOND_ROUNDS}
    GROUP BY pid ORDER BY pid
    """
    return sql


@query("mondrian_k_anonymity", oracle=_mondrian_oracle())
def mondrian_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian multidimensional k-anonymity (LeFevre et al. 2006) — the
    privacy TRANSFORMATION beside the k_anonymity_ldiversity_audit: greedy
    recursive median cuts over the quasi-identifier space (nationkey,
    acctbal), each partition splitting on its widest globally-normalized
    dimension, a cut allowed only if BOTH halves keep >= k rows. Output is
    the generalized release: one row per final partition with its QI
    bounding box and size — every box >= k by construction.

    Determinism: split dimension chosen by comparing two divisions of
    IEEE-identical doubles; split point is the exact lower-median order
    statistic ((n+1) DIV 2 with id tie-break); unsplit partitions keep a
    left-child pid so the pid space never collides.

    Scale shape: each round is one pair of per-partition window ranks +
    one groupBy + two BROADCAST joins of <= 2^r-row decision tables — the
    data shuffles on pid once per round and never collects; bounded
    rounds, localCheckpoint keeps lineage constant-depth (the k-means /
    PageRank discipline)."""
    cust = load(spark, sf_dir, "customer")
    p = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").cast("long").alias("nk"),
        F.col("c_acctbal").alias("ab"),
        F.lit(0).cast("long").alias("pid"),
    )
    g = p.agg(
        ((F.max("nk") - F.min("nk")) * F.lit(1.0)).alias("gnk"),
        ((F.max("ab") - F.min("ab")) * F.lit(1.0)).alias("gab"),
    )
    for _ in range(_MOND_ROUNDS):
        w_nk = Window.partitionBy("pid").orderBy("nk", "id")
        w_ab = Window.partitionBy("pid").orderBy("ab", "id")
        w_all = Window.partitionBy("pid")
        rk = (
            p.withColumn("rn_nk", F.row_number().over(w_nk))
            .withColumn("rn_ab", F.row_number().over(w_ab))
            .withColumn("n", F.count(F.lit(1)).over(w_all))
        )
        med = rk.groupBy("pid").agg(
            F.max(
                F.when(F.col("rn_nk") == F.expr("(n + 1) DIV 2"), F.col("nk"))
            ).alias("med_nk"),
            F.max(
                F.when(F.col("rn_ab") == F.expr("(n + 1) DIV 2"), F.col("ab"))
            ).alias("med_ab"),
            (F.max("nk") - F.min("nk")).alias("wnk"),
            (F.max("ab") - F.min("ab")).alias("wab"),
        )
        dec = med.crossJoin(F.broadcast(g)).select(
            "pid",
            F.when(
                F.col("wnk") * F.lit(1.0) / F.col("gnk")
                >= F.col("wab") / F.col("gab"),
                0,
            )
            .otherwise(1)
            .alias("dim"),
            "med_nk",
            "med_ab",
        )
        joined = rk.join(F.broadcast(dec), "pid")
        left = ((F.col("dim") == 0) & (F.col("nk") <= F.col("med_nk"))) | (
            (F.col("dim") == 1) & (F.col("ab") <= F.col("med_ab"))
        )
        nl = joined.groupBy("pid").agg(
            F.sum(left.cast("int")).cast("long").alias("nl"),
            F.count(F.lit(1)).cast("long").alias("n2"),
        )
        p = (
            joined.join(F.broadcast(nl), "pid")
            .select(
                "id",
                "nk",
                "ab",
                F.when(
                    (F.col("nl") >= _MOND_K)
                    & (F.col("n2") - F.col("nl") >= _MOND_K),
                    F.col("pid") * 2 + F.when(left, 0).otherwise(1),
                )
                .otherwise(F.col("pid") * 2)
                .alias("pid"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        p.groupBy("pid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("nk").cast("long").alias("nation_lo"),
            F.max("nk").cast("long").alias("nation_hi"),
            F.min("ab").alias("acctbal_lo"),
            F.max("ab").alias("acctbal_hi"),
            (F.count(F.lit(1)) >= _MOND_K).alias("k_anonymous"),
        )
        .orderBy("pid")
    )


@query(
    "krippendorff_alpha_labelers",
    oracle=f"""
    -- Krippendorff's alpha over the same three weak English-labelers as
    -- the Fleiss audit — the agreement coefficient that (unlike kappa
    -- family) is defined from a coincidence matrix and generalizes across
    -- metrics/missing data; for complete binary data with m=3 it reduces
    -- to alpha = 1 - S*(3N-1) / (2*T*(3N-T)) with S = sum n_en*(3-n_en)
    -- (within-unit disagreeing pairs) and T = total 'en' votes — every
    -- operand an exact int64, so alpha is one exact-int-ratio double.
    WITH votes AS (
      SELECT
        (CASE WHEN len(list_filter(string_split(lower(text), ' '),
                       w -> w IN {{stops}})) * 1.0
                   / len(list_filter(string_split(lower(text), ' '),
                                     w -> w <> '')) >= 0.05
              THEN 1 ELSE 0 END)
        + (CASE WHEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                     * 1.0 / length(text) <= 0.08 THEN 1 ELSE 0 END)
        + (CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END) AS n_en
      FROM documents
      WHERE len(list_filter(string_split(lower(text), ' '), w -> w <> '')) > 0
        AND length(text) > 0
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_en * (3 - n_en)) AS BIGINT) AS s_dis,
             CAST(SUM(n_en) AS BIGINT) AS tot_en
      FROM votes
    )
    SELECT n_docs,
           ROUND(s_dis * 1.0 / (3.0 * n_docs), 6) AS d_observed,
           ROUND(2.0 * tot_en * (3 * n_docs - tot_en)
                 / (3.0 * n_docs * (3 * n_docs - 1)), 6) AS d_expected,
           ROUND(1.0 - s_dis * (3.0 * n_docs - 1)
                 / (2.0 * tot_en * (3 * n_docs - tot_en)), 6) AS alpha
    FROM agg
    """.replace("{stops}", _STOPS_SQL),
)
def krippendorff_alpha_labelers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha over the three weak English-labelers —
    completing the agreement family (Cohen pairwise, McNemar paired
    difference, Fleiss multi-rater, Krippendorff coincidence-based): the
    coefficient content-analysis methodology actually prescribes, with
    chance correction from the COINCIDENCE matrix (sampling votes without
    replacement, hence the 3N-1 denominator that separates it from
    Fleiss' Pe). Complete binary data collapses it to one exact integer
    aggregate: S = within-doc disagreeing pairs, T = total positive votes.

    Scale shape: one map-only vote pass, one scalar aggregate — identical
    to the Fleiss scan; the two coefficients diverge on exactly the
    (3N-1) finite-sample correction, a useful numeric cross-check."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import (
        text as T,
    )

    docs = load(spark, sf_dir, "documents")
    n_tok = F.size(T.word_tokens(F.col("text")))
    r1 = (T.stopword_ratio(F.col("text")) >= 0.05).cast("long")
    r2 = (T.punct_ratio(F.col("text")) <= 0.08).cast("long")
    r3 = (F.col("n_chars") >= 500).cast("long")
    votes = docs.filter((n_tok > 0) & (F.length("text") > 0)).select(
        (r1 + r2 + r3).alias("n_en")
    )
    agg = votes.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("n_en") * (3 - F.col("n_en"))).cast("long").alias("s_dis"),
        F.sum("n_en").cast("long").alias("tot_en"),
    )
    n3 = 3.0 * F.col("n_docs")
    return agg.select(
        "n_docs",
        F.round(F.col("s_dis") * 1.0 / n3, 6).alias("d_observed"),
        F.round(
            2.0
            * F.col("tot_en")
            * (3 * F.col("n_docs") - F.col("tot_en"))
            / (n3 * (3 * F.col("n_docs") - 1)),
            6,
        ).alias("d_expected"),
        F.round(
            F.lit(1.0)
            - F.col("s_dis")
            * (3.0 * F.col("n_docs") - 1)
            / (
                2.0
                * F.col("tot_en")
                * (3 * F.col("n_docs") - F.col("tot_en"))
            ),
            6,
        ).alias("alpha"),
    )


@query(
    "anderson_darling_two_sample",
    oracle="""
    -- exact two-sample Anderson-Darling statistic (Pettitt 1976) between
    -- the stream's time halves — the drift test that WEIGHTS THE TAILS
    -- where KS sees only the single largest ECDF gap: A2 = (1/(n0*n1)) *
    -- sum_{i<N} (c0_i*N - i*n0)^2 / (i*(N-i)) over the pooled total order
    -- (value, event_id tie-break). c0_i*N - i*n0 is an exact int (< 2^53
    -- as a double), the square/divide chain is identical IEEE in both
    -- engines, terms ROUND@1e-8 -> DECIMAL sum.
    WITH b AS (
      SELECT epoch_us(MIN(ts))
             + CAST(FLOOR((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 2) AS BIGINT)
               AS cut_us
      FROM events
    ),
    pooled AS (
      SELECT CASE WHEN epoch_us(ts) < b.cut_us THEN 0 ELSE 1 END AS h,
             value, event_id
      FROM events CROSS JOIN b
    ),
    n AS (
      SELECT CAST(SUM(CASE WHEN h = 0 THEN 1 END) AS BIGINT) AS n0,
             CAST(COUNT(*) AS BIGINT) AS nn
      FROM pooled
    ),
    walk AS (
      SELECT ROW_NUMBER() OVER (ORDER BY value, event_id) AS i,
             CAST(SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY value, event_id ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS c0
      FROM pooled
    ),
    terms AS (
      SELECT ROUND((w.c0 * n.nn - w.i * n.n0) * 1.0
                   * (w.c0 * n.nn - w.i * n.n0)
                   / (w.i * 1.0 * (n.nn - w.i)), 8) AS t
      FROM walk w CROSS JOIN n
      WHERE w.i < n.nn
    )
    SELECT n.n0, n.nn - n.n0 AS n1,
           ROUND(CAST(SUM(CAST(t AS DECIMAL(38,8))) AS DOUBLE)
                 / (n.n0 * 1.0 * (n.nn - n.n0)), 6) AS ad_a2
    FROM terms CROSS JOIN n
    GROUP BY n.n0, n.nn
    """,
)
def anderson_darling_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Anderson-Darling statistic (Pettitt's rank form)
    between the stream's time halves — completing the drift-test family
    with the member that weights the DISTRIBUTION TAILS: KS reports the
    one largest ECDF gap, Wasserstein the average transport, AD the
    variance-normalized integral that amplifies tail divergence (where
    quality regressions in training data usually hide). Rank-only, so
    every input to the statistic is an exact integer over the same pooled
    total order as the KS query; under the null A2 ~ 1, large values flag
    drift.

    Scale shape: one pooled sort (single total-order window, same as KS —
    at 100 TB you'd run it on a uniform sample, the statistic converges
    at sqrt(n)), one ROUND->DECIMAL term sum, one scalar divide."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 2
            ).cast("long")
        ).alias("cut_us")
    )
    pooled = ev.crossJoin(F.broadcast(bounds)).select(
        F.when(F.unix_micros("ts") < F.col("cut_us"), 0).otherwise(1).alias("h"),
        "value",
        "event_id",
    )
    n = pooled.agg(
        F.sum(F.when(F.col("h") == 0, 1)).cast("long").alias("n0"),
        F.count(F.lit(1)).cast("long").alias("nn"),
    )
    w = Window.orderBy("value", "event_id")
    walk = pooled.select(
        F.row_number().over(w).alias("i"),
        F.sum(F.when(F.col("h") == 0, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("c0"),
    )
    d = (F.col("c0") * F.col("nn") - F.col("i") * F.col("n0")) * F.lit(1.0)
    terms = (
        walk.crossJoin(F.broadcast(n))
        .filter(F.col("i") < F.col("nn"))
        .select(
            "n0",
            "nn",
            F.round(
                d * d / (F.col("i") * F.lit(1.0) * (F.col("nn") - F.col("i"))), 8
            ).alias("t"),
        )
    )
    return (
        terms.groupBy("n0", "nn")
        .agg(
            F.round(
                F.sum(F.col("t").cast("decimal(38,8)")).cast("double")
                / (F.col("n0") * F.lit(1.0) * (F.col("nn") - F.col("n0"))),
                6,
            ).alias("ad_a2")
        )
        .select("n0", (F.col("nn") - F.col("n0")).alias("n1"), "ad_a2")
    )
