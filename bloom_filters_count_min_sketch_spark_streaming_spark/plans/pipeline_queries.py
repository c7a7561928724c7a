"""Training-data pipeline queries (round 3).

Corpus-hygiene operators a large-scale LLM data pipeline runs between raw
crawl and tokenization, each expressed Spark-first and oracle-checked:

- ``text_repetition_stats``  — Gopher-style repetition signals (top-token /
  top-bigram / type-token ratios) per document.
- ``pii_redaction_stats``    — regex PII redaction (emails, phone numbers)
  with audit counts per source.
- ``priority_sample_docs``   — weighted sampling without replacement via
  priority sampling (Duffield-Lund-Thorup): priority = w/u with a
  hash-derived uniform, engine-portable and reproducible.
- ``dedup_incremental_ingest`` — the incremental-ingest shape: dedup an
  incoming batch against the corpus-at-rest, first-wins inside the batch.
- ``bucketed_join_agg``      — co-located (bucketed) join: both sides
  pre-bucketed on the join key so the join runs with NO shuffle exchange.
- ``kmeans_embeddings``      — distributed Lloyd iterations over the
  embedding column (operators/clustering.py); rows-only (iterative, not
  SQL-expressible), invariants property-tested.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.operators.clustering import (
    kmeans_cluster_profile,
)
from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load

# ---------------------------------------------------------------------------
# Gopher-style repetition signals


@query(
    "text_repetition_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents
    ), tok AS (
      SELECT doc_id, unnest(ws) AS w FROM toks
    ), cnt AS (
      SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
    ), uni AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
             CAST(MAX(c) AS BIGINT) AS max_tok,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM cnt GROUP BY 1
    ), bg AS (
      SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS b
      FROM toks WHERE len(ws) >= 2
    ), bcnt AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2
    ), bagg AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_big FROM bcnt GROUP BY 1
    )
    SELECT u.doc_id AS doc_id, n_tok,
           ROUND(max_tok::DOUBLE / n_tok, 4) AS top_token_ratio,
           ROUND(max_big::DOUBLE / (n_tok - 1), 4) AS top_bigram_ratio,
           ROUND(n_types::DOUBLE / n_tok, 4) AS type_token_ratio,
           CASE WHEN max_tok::DOUBLE / n_tok > 0.08
                  OR n_types::DOUBLE / n_tok < 0.25
                THEN 1 ELSE 0 END AS gopher_flag
    FROM uni u JOIN bagg USING (doc_id)
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (Gopher rules, Rae et al. 2021):
    fraction of tokens in the most frequent token / bigram, type-token
    ratio, and a combined flag. Two wordcount-shaped aggregations (map-side
    partial combine; shuffle keyed on (doc_id, gram) — no skew: grams are
    per-document). Ratios are single IEEE divisions of exact integers, so
    both engines compute bit-identical doubles before the ROUND."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "").alias("ws"),
    )
    cnt = (
        toks.select("doc_id", F.explode("ws").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    uni = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tok"),
        F.max("c").cast("long").alias("max_tok"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    # bigrams: zip the token list with itself shifted by one (small per-row
    # arrays — the interpreted-HOF caveat applies to long arrays, not these)
    bigrams = toks.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(ws, 1, size(ws)-1), slice(ws, 2, size(ws)-1),"
                " (x, y) -> concat(x, ' ', y))"
            )
        ).alias("b"),
    )
    bagg = (
        bigrams.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("max_big"))
    )
    top_tok = F.col("max_tok").cast("double") / F.col("n_tok")
    ttr = F.col("n_types").cast("double") / F.col("n_tok")
    return (
        uni.join(bagg, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            F.round(top_tok, 4).alias("top_token_ratio"),
            F.round(F.col("max_big").cast("double") / (F.col("n_tok") - 1), 4).alias(
                "top_bigram_ratio"
            ),
            F.round(ttr, 4).alias("type_token_ratio"),
            F.when((top_tok > 0.08) | (ttr < 0.25), 1).otherwise(0).alias("gopher_flag"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

_PII_ORACLE = """
    WITH aug AS (
      SELECT source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or +1-202-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    ), red AS (
      SELECT source, t,
             regexp_replace(regexp_replace(t, '%EMAIL%', '<EMAIL>', 'g'),
                            '%PHONE%', '<PHONE>', 'g') AS r,
             len(regexp_extract_all(t, '%EMAIL%')) AS n_email,
             len(regexp_extract_all(t, '%PHONE%')) AS n_phone
      FROM aug
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
           CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
           CAST(SUM(length(t) - length(r)) AS BIGINT) AS chars_removed
    FROM red GROUP BY source
""".replace("%EMAIL%", _EMAIL_RE).replace("%PHONE%", _PHONE_RE)
# (DuckDB string literals don't process backslash escapes, so the Python
# regex strings drop in verbatim — no re-escaping.)


@query("pii_redaction_stats", oracle=_PII_ORACLE)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: deterministic synthetic PII (derived from doc_id —
    the fixtures carry none) is appended to each document, then redacted
    with engine-portable regexes (character classes only — identical
    semantics in Java regex and RE2). Per-source counts of redacted
    emails/phones and characters removed. Pure JVM expressions
    (regexp_replace / regexp_extract_all) — no Python in the row path."""
    docs = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-202-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    d = docs.select(
        "source",
        aug.alias("t"),
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ).alias("r"),
        F.size(F.regexp_extract_all(aug, F.lit(_EMAIL_RE), F.lit(0))).alias("n_email"),
        F.size(F.regexp_extract_all(aug, F.lit(_PHONE_RE), F.lit(0))).alias("n_phone"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").cast("long").alias("emails_redacted"),
        F.sum("n_phone").cast("long").alias("phones_redacted"),
        F.sum(F.length("t") - F.length("r")).cast("long").alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling


@query(
    "priority_sample_docs",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             ROUND(n_chars::DOUBLE * 4294967296.0
                   / (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1),
                   4) AS priority
      FROM documents
    )
    SELECT doc_id, n_chars, priority
    FROM s ORDER BY priority DESC, doc_id LIMIT 50
    """,
)
def priority_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield, Lund & Thorup, JACM 2007): each row gets priority w/u with
    u ~ Uniform(0,1]; the k largest priorities are a weighted sample. u is
    derived from md5(doc_id) — a hash, not an engine RNG — so the sample
    is reproducible across engines, retries, and incremental reruns.
    Single TakeOrderedAndProject (no full sort); w = n_chars.

    The w*2^32/u_int form keeps everything an exact float64 op (w*2^32 is
    an exact product below 2^53; one division) so both engines compute the
    identical double before the ROUND."""
    docs = load(spark, sf_dir, "documents")
    u_int = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    )
    pri = F.round(
        F.col("n_chars").cast("double") * F.lit(4294967296.0) / u_int.cast("double"), 4
    )
    return (
        docs.select("doc_id", "n_chars", pri.alias("priority"))
        .orderBy(F.desc("priority"), "doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Incremental-ingest dedup


@query(
    "dedup_incremental_ingest",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT md5(lower(text)) AS h FROM documents WHERE doc_id < 400
    ), inc AS (
      SELECT doc_id, md5(lower(text)) AS h FROM documents WHERE doc_id >= 400
    ), firsts AS (
      SELECT doc_id, h FROM (
        SELECT doc_id, h,
               row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM inc
      ) WHERE rn = 1
    )
    SELECT doc_id, h FROM firsts WHERE h NOT IN (SELECT h FROM hist)
    """,
)
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: accept only incoming docs (doc_id >= 400)
    whose content hash is new vs the corpus-at-rest (doc_id < 400),
    first-wins within the batch. The anti-join shuffles on the hash — at
    100 TB put a Bloom filter of the historical hashes in front of it
    (contamination_bloom_gate is that device) so the at-rest side is never
    re-shuffled for a small batch."""
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.col("text"))).alias("h")
    hist = docs.filter(F.col("doc_id") < 400).select(h).distinct()
    inc = docs.filter(F.col("doc_id") >= 400).select("doc_id", h)
    w = Window.partitionBy("h").orderBy("doc_id")
    firsts = (
        inc.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    return firsts.join(hist, "h", "left_anti").select("doc_id", "h")


# ---------------------------------------------------------------------------
# Bucketed (co-located) join


@query(
    "bucketed_join_agg",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    """,
)
def bucketed_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two tables pre-bucketed on the join key: bucketing makes the
    join (and any later aggregation on the same key) exchange-free — the
    layout investment that pays on every subsequent query. Both sides are
    written once with bucketBy(8, custkey) into an external path; the scan
    reports the bucket spec and the SortMergeJoin runs without a shuffle
    on either side (asserted in tests/test_scale_shapes.py). At 100 TB
    this is the difference between re-shuffling 100 TB per join and zero."""
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
    wh = os.path.join(tempfile.gettempdir(), "bfcms_bucketed", tag)
    cust_t, ord_t = f"bfcms_bucketed_customer_{tag}", f"bfcms_bucketed_orders_{tag}"
    existing = {t.name for t in spark.catalog.listTables()}
    # one-time layout: write both sides bucketed on the join key
    if cust_t not in existing or not os.path.isdir(os.path.join(wh, cust_t)):
        (
            load(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .write.mode("overwrite")
            .format("parquet")
            .option("path", os.path.join(wh, cust_t))
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable(cust_t)
        )
    if ord_t not in existing or not os.path.isdir(os.path.join(wh, ord_t)):
        (
            load(spark, sf_dir, "orders")
            .select("o_custkey", "o_totalprice")
            .write.mode("overwrite")
            .format("parquet")
            .option("path", os.path.join(wh, ord_t))
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable(ord_t)
        )
    cust = spark.table(cust_t)
    orders = spark.table(ord_t)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# K-means (iterative — rows-only, no SQL oracle)


@query("kmeans_embeddings")
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column: 5 iterations,
    k=8, deterministic hash-min init. Assignment is an Arrow-batched numpy
    matmul per partition; the update shuffles only k x dim decimal partial
    sums. Iterative -> no ANSI-SQL oracle (driver records rows-only);
    determinism and invariants are property-tested."""
    emb = load(spark, sf_dir, "embeddings")
    return kmeans_cluster_profile(emb, "vec_id", "embedding", k=8, n_iter=5)
