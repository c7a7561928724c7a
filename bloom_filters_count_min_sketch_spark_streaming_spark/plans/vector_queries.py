"""Vector similarity queries (SURVEY §2.D D3/D6) over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloom_filters_count_min_sketch_spark_streaming_spark.operators import similarity
from bloom_filters_count_min_sketch_spark_streaming_spark.plans.registry import query
from bloom_filters_count_min_sketch_spark_streaming_spark.sources.io import load


@query(
    "knn_cosine_bruteforce",
    oracle="""
    -- rank-only comparison: DuckDB's list_cosine_similarity computes in
    -- float32, ~5e-8 off a float64 dot product; the minimum adjacent gap
    -- in the fixtures' top-10 is ~2e-5, so rankings agree exactly.
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
           ) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
    QUALIFY rank <= 5
    """,
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 20 query vectors: broadcast queries, stream
    corpus, JVM-side zip_with/aggregate dot products, window re-rank."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.cosine_topk_bruteforce(emb, queries, k=5)


@query("ann_lsh_topk")
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH buckets + exact re-rank —
    the 100 TB path (bucket equi-join instead of full cross product).
    Recall < 1 by construction -> rows-only check; recall vs brute force
    is asserted in tests."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_lsh_topk(
        emb, queries, k=5, dim=64, bits_per_table=4, n_tables=6, seed=42
    )


@query("ann_ivf_topk")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate NN (FAISS-IVF-flat contract): seeded
    coarse quantizer, cell-bucketed equi-join, n_probe query fan-out,
    exact re-rank in probed cells. Recall < 1 by construction -> rows-only
    check; recall vs brute force asserted in tests."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4, seed=42)


@query(
    "embedding_centroids",
    oracle="""
    SELECT label, dim - 1 AS dim, ROUND(SUM(x) / COUNT(*), 4) AS centroid_val
    FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings)
    GROUP BY label, dim
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroids via posexplode + (label, dim) aggregation —
    shuffle of scalars with map-side combine, never whole vectors."""
    emb = load(spark, sf_dir, "embeddings")
    return similarity.centroids(emb, "label")


@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id, label,
           ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math surface: per-row L2 norm with JVM-side array fold."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.round(similarity.norm(similarity._as_double_array("embedding")), 6).alias("l2_norm"),
    )


@query(
    "embedding_quantize_stats",
    oracle="""
    -- identical IEEE op sequence in both engines (max-abs / 127, divide,
    -- floor(+0.5)) -> bit-identical quantized ints; sums are exact integers
    WITH e AS (
      SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
             generate_subscripts(embedding, 1) - 1 AS dim
      FROM embeddings
    ), s AS (
      SELECT dim, MAX(ABS(x)) / 127.0 AS scale FROM e GROUP BY dim
    )
    SELECT e.dim,
           CAST(SUM(CAST(FLOOR(e.x / NULLIF(s.scale, 0) + 0.5) AS BIGINT)) AS BIGINT) AS sum_q,
           CAST(SUM(CASE WHEN ABS(FLOOR(e.x / NULLIF(s.scale, 0) + 0.5)) >= 127
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated
    FROM e JOIN s USING (dim)
    GROUP BY e.dim
    """,
)
def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit (D6): per-dimension scale from a
    scalar max-agg, quantized values via JVM expressions (floor(x/s + 0.5)),
    integer sums + saturation counts per dim.

    Everything stays in whole-stage codegen: posexplode -> max-agg ->
    broadcast scale join -> integer agg. At 100 TB this is the exact audit
    you run before committing a corpus to int8 ANN storage.
    """
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(F.posexplode(similarity._as_double_array("embedding")).alias("dim", "x"))
    s = e.groupBy("dim").agg(
        F.when(F.max(F.abs(F.col("x"))) == 0, None)
        .otherwise(F.max(F.abs(F.col("x"))) / F.lit(127.0))
        .alias("scale")
    )
    q = F.floor(F.col("x") / F.col("scale") + F.lit(0.5))
    return (
        e.join(F.broadcast(s), "dim")
        .groupBy("dim")
        .agg(
            F.sum(q.cast("long")).cast("long").alias("sum_q"),
            F.sum(F.when(F.abs(q) >= 127, 1).otherwise(0)).cast("long").alias("n_saturated"),
        )
        .select("dim", "sum_q", "n_saturated")
    )


@query("ann_ivf_int8_topk")
def ann_ivf_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over int8-quantized vectors with full-precision re-rank of a
    short candidate list (FAISS IVF+SQ8 shape): 4x less vector I/O for
    the bulk scoring, float32 touched only for O(|Q| x shortlist) rows.
    Recall < 1 by construction -> rows-only check; recall and quantized-
    vs-float agreement asserted in tests."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_ivf_int8_topk(emb, queries, k=5, n_cells=16, n_probe=4, seed=42)


@query(
    "ann_ivf_full_probe_exact",
    oracle="""
    -- IVF with n_probe == n_cells degenerates to exact kNN: every cell is
    -- probed, so the candidate set is the whole corpus and the re-rank is
    -- the brute-force ranking. This puts the ENTIRE IVF machinery (seeded
    -- coarse quantizer, cell assignment, probe fan-out, bucketed candidate
    -- join, exact re-rank) under the hash-checked oracle; the recall<1
    -- configurations of the same code path are covered by recall tests.
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
           ) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    QUALIFY rank <= 5
    """,
)
def ann_ivf_full_probe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF exactness witness: same operator as ann_ivf_topk but probing all
    cells, which must reproduce brute-force kNN bit-for-bit (rank-level) —
    the standard sanity contract for an IVF index (FAISS nprobe=nlist)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ann_ivf_topk(
        emb, queries, k=5, n_cells=16, n_probe=16, seed=42
    )
