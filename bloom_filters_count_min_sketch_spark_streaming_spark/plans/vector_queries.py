"""Vector similarity queries (SURVEY §2.D D3/D6) over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "knn_blocked_gemm_topk",
    oracle="""
    -- identical result contract to knn_cosine_bruteforce (rank-only);
    -- the Spark side scores with blocked float64 BLAS GEMM, whose ~1e-15
    -- noise is 10 orders under the fixtures' ~2e-5 minimum adjacent gap
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
def knn_blocked_gemm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 via blocked BLAS GEMM tiles + batch-local
    top-k pruning — the scale-path PHYSICAL strategy for exact search
    (cosine_topk_bruteforce is the row-at-a-time logical baseline; this
    must produce the identical ranking)."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.cosine_topk_blocked_gemm(emb, queries, k=5)


@query("ann_lsh_topk", witness="ann_lsh_full_tables_exact")
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


@query("ann_ivf_topk", witness="ann_ivf_full_probe_exact")
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


@query("ann_ivf_int8_topk", witness="ann_ivf_int8_lossless_exact")
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


@query(
    "ann_ivf_int8_lossless_exact",
    oracle="""
    -- IVF+SQ8 exactness witness via IDENTITY-SCALE quantization: the
    -- corpus is snapped to the int8 grid (floor(x*127), clamped) and a
    -- sentinel all-127 vector is unioned in, which pins every per-dim
    -- scale max|x|/127 to EXACTLY 1.0 — so quantize (round(x/1)) and
    -- dequantize (q*1.0) round-trip losslessly and the int8 shortlist
    -- scores are BIT-IDENTICAL to the full-precision cosines (integer
    -- dot products and norms are exact in float64; sqrt/mul/div are
    -- correctly rounded the same way in both engines). With full probe
    -- the whole IVF+SQ8 machinery (per-dim scales, int8 encode, cell
    -- assignment from dequantized vectors, quantized shortlist cut,
    -- float re-rank) must therefore reproduce brute-force kNN
    -- rank-for-rank. The cosine is spelled out as num/(sqrt*sqrt) to
    -- mirror the numpy evaluation order exactly.
    WITH g AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> greatest(-127.0, least(127.0, floor(x * 127.0)))) AS v
      FROM embeddings
      UNION ALL
      SELECT 1000000 AS vec_id, list_transform(range(64), x -> 127.0) AS v
    )
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(list_zip(q.v, c.v),
                        p -> p[1] * p[2]))
                      / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                         * sqrt(list_sum(list_transform(c.v, x -> x * x))))
                      DESC,
                      c.vec_id
           ) AS rank
    FROM g q, g c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    QUALIFY rank <= 5
    """,
)
def ann_ivf_int8_lossless_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-int8 exactness witness: identity-scale quantization (corpus
    snapped to the int8 grid + an all-127 sentinel forcing every scale to
    1.0) makes the SQ8 round-trip lossless, so with n_probe == n_cells the
    operator must equal brute-force kNN exactly — including the quantized
    shortlist cut, whose scores are bit-identical to the float cosines on
    integer-valued vectors (exact integer sums; correctly-rounded
    sqrt/mul/div). Promotes ann_ivf_int8_topk's storage layer (scales,
    encode, dequantized cell assignment, shortlist, re-rank) into the
    hash-checked family; the distortion>0 regime stays covered by the
    quantization property tests and ann_ivf_int8_topk's recall checks."""
    emb = load(spark, sf_dir, "embeddings")
    grid = F.transform(
        similarity._as_double_array("embedding"),
        lambda x: F.greatest(
            F.lit(-127.0), F.least(F.lit(127.0), F.floor(x * 127))
        ),
    )
    corpus = emb.select("vec_id", grid.alias("embedding")).unionByName(
        emb.sparkSession.range(1).select(
            F.lit(1000000).cast("long").alias("vec_id"),
            F.array_repeat(F.lit(127.0), 64).alias("embedding"),
        )
    )
    queries = corpus.filter(F.col("vec_id") < 10)
    return similarity.ann_ivf_int8_topk(
        corpus, queries, k=5, n_cells=16, n_probe=16, seed=42
    )


@query(
    "pq_full_rerank_exact",
    oracle="""
    -- PQ-ADC with the candidate cap at corpus size degenerates to exact
    -- kNN: every corpus row survives the ADC cut, so the exact re-rank IS
    -- the brute-force ranking. This puts the whole product-quantization
    -- machinery (seeded per-subspace codebook training, corpus encode to
    -- m-byte codes, per-query ADC lookup tables, candidate pool, exact
    -- re-rank) under the hash-checked oracle; recall<1 configurations of
    -- the same code path are covered by pq_adc_recall + property tests.
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
def pq_full_rerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ exactness witness (the FAISS IVF-PQ sanity contract): same
    operator as pq_adc_recall's, candidate cap = corpus, which must
    reproduce brute-force kNN rank-for-rank."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    n = emb.count()  # bounded: one scalar for the witness cap
    return similarity.pq_adc_topk(
        emb, queries, k=5, m=8, k_c=16, seed=42, candidates=n, rerank=True
    )


@query("pq_adc_recall", witness="pq_full_rerank_exact")
def pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shaped PQ search (D-row: the ANN memory tier): 8-byte
    codes instead of 256-byte vectors, ADC table-lookup scoring, top-20
    candidate pool, exact re-rank to top-5 — reported as per-run recall@5
    against the brute-force ranking. Rows-only (recall < 1 by design);
    deterministic via seeded codebooks, so the recall value is stable."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    approx = similarity.pq_adc_topk(
        emb, queries, k=5, m=8, k_c=16, seed=42, candidates=20, rerank=True
    ).select("query_id", "neighbor_id")
    # blocked-GEMM is hash-checked identical to brute force and plans no
    # nested-loop join (the recall denominator stays a clean equi-join)
    exact = similarity.cosine_topk_blocked_gemm(emb, queries, k=5).select(
        F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en")
    )
    hits = approx.join(
        exact,
        (F.col("query_id") == F.col("eq")) & (F.col("neighbor_id") == F.col("en")),
    )
    return (
        hits.agg(F.count(F.lit(1)).alias("n_hits"))
        .crossJoin(F.broadcast(exact.agg(F.count(F.lit(1)).alias("n_exact"))))
        .select(
            "n_hits",
            "n_exact",
            F.round(F.col("n_hits") / F.col("n_exact"), 4).alias("recall_at_5"),
        )
    )


@query("frequent_directions_spectrum", witness="fd_saturated_spectrum_exact")
def frequent_directions_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent Directions (Liberty KDD'13) spectrum of the embedding
    corpus: per-partition ell x d streaming sketches, deterministic
    partition-order fold, driver-side SVD of the ell x d result. The
    mergeable-matrix-sketch path to covariance/PCA at 100 TB — O(ell*d)
    memory per task, sketch-sized shuffle, scan-count 1 (vs the exact
    dim^2 moment accumulation in embedding_pca_variance). SVD is not
    SQL-expressible -> rows-only for the driver; the GLPW error bound,
    PSD deficit, mergeability, and run-to-run determinism are property-
    tested in tests/test_fd.py."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import fd

    emb = load(spark, sf_dir, "embeddings")
    sk = fd.fd_sketch(emb, ell=16, dim=64)
    rows = [(c, round(s, 6)) for c, s in fd.fd_spectrum(sk, top=8)]
    return spark.createDataFrame(rows, "component int, sigma double")


@query(
    "embedding_pca_closed_form_exact",
    oracle="""
    -- PCA exactness witness: a 2x2 covariance has CLOSED-FORM eigenvalues
    -- (quadratic formula), so the eigendecomposition stops being the
    -- SQL-inexpressible step. The 2-D input is an integer-grid slice of
    -- the embedding column (floor(x*50) on explicitly DOUBLE-cast
    -- elements, identical in both engines), so every moment sum is an
    -- exact integer, the covariance entries are identical doubles, and
    -- numpy eigh vs the formula agree to ~1 ulp — far inside ROUND(.,6).
    WITH d AS (
      SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 50) AS BIGINT) AS x,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 50) AS BIGINT) AS y
      FROM embeddings
    ), s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x*x) AS DOUBLE) AS sxx,
             CAST(SUM(x*y) AS DOUBLE) AS sxy,
             CAST(SUM(y*y) AS DOUBLE) AS syy
      FROM d
    ), c AS (
      SELECT sxx/n - (sx/n)*(sx/n) AS a,
             sxy/n - (sx/n)*(sy/n) AS b,
             syy/n - (sy/n)*(sy/n) AS cc
      FROM s
    ), e AS (
      SELECT (a + cc + sqrt((a-cc)*(a-cc) + 4*b*b)) / 2 AS l1,
             (a + cc - sqrt((a-cc)*(a-cc) + 4*b*b)) / 2 AS l2,
             a + cc AS tot
      FROM c
    )
    SELECT CAST(1 AS INTEGER) AS component, ROUND(l1, 6) AS eigenvalue,
           ROUND(l1/tot, 6) AS explained_ratio FROM e
    UNION ALL
    SELECT CAST(2 AS INTEGER), ROUND(l2, 6), ROUND(l2/tot, 6) FROM e
    ORDER BY component
    """,
)
def embedding_pca_closed_form_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA exactness witness: the same covariance_eigh code path as
    embedding_pca_variance (distributed mapInPandas moment pass, integer
    moment encoding, driver-side eigh, descending order) run over a 2-D
    integer-grid projection of the FULL embedding corpus — the regime
    where the eigenvalues have a SQL closed form (quadratic formula on
    the 2x2 covariance). Integer-valued inputs make the scaled moment
    sums exact (np.rint has no ties to break), so both engines hold
    bit-identical covariances and the only slack is eigh-vs-formula at
    ~1 ulp, absorbed by ROUND(.,6). The 64-D regime of the SAME code
    path stays rows-only in embedding_pca_variance with its property
    tests (tests/test_pca.py)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import pca

    emb = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    d2 = emb.select(
        F.array(
            F.floor(F.col("embedding")[0].cast("double") * 50).cast("double"),
            F.floor(F.col("embedding")[1].cast("double") * 50).cast("double"),
        ).alias("v2")
    )
    _, w, _, _ = pca.covariance_eigh(d2, "v2", 2)
    total = float(w.sum())
    rows = [
        (int(c + 1), round(float(w[c]), 6), round(float(w[c]) / total, 6))
        for c in range(2)
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_ratio double"
    )


@query(
    "pca_project_closed_form_exact",
    oracle="""
    -- PCA projection witness: in 2-D the eigenVECTORS also have a closed
    -- form — for [[a,b],[b,c]] with b != 0 (asserted Spark-side) the
    -- lambda-eigenvector is (b, lambda-a), normalized, with the
    -- operator's canonical sign (largest-|component| positive; ties keep
    -- the first component, matching np.argmax). Projection is then pure
    -- arithmetic: pc_k = (x-mx)*vkx + (y-my)*vky. Closed form vs LAPACK
    -- differ ~1e-13 with the asserted eigengap; ROUND(.,5) absorbs it.
    WITH d AS (
      SELECT vec_id,
             CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 50) AS BIGINT) AS x,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 50) AS BIGINT) AS y
      FROM embeddings
    ), s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x*x) AS DOUBLE) AS sxx,
             CAST(SUM(x*y) AS DOUBLE) AS sxy,
             CAST(SUM(y*y) AS DOUBLE) AS syy
      FROM d
    ), c AS (
      SELECT sx/n AS mx, sy/n AS my,
             sxx/n - (sx/n)*(sx/n) AS a,
             sxy/n - (sx/n)*(sy/n) AS b,
             syy/n - (sy/n)*(sy/n) AS cc
      FROM s
    ), e AS (
      SELECT mx, my, a, b,
             (a + cc + sqrt((a-cc)*(a-cc) + 4*b*b)) / 2 AS l1,
             (a + cc - sqrt((a-cc)*(a-cc) + 4*b*b)) / 2 AS l2
      FROM c
    ), u AS (
      SELECT mx, my,
             b / sqrt(b*b + (l1-a)*(l1-a)) AS e1x,
             (l1-a) / sqrt(b*b + (l1-a)*(l1-a)) AS e1y,
             b / sqrt(b*b + (l2-a)*(l2-a)) AS e2x,
             (l2-a) / sqrt(b*b + (l2-a)*(l2-a)) AS e2y
      FROM e
    ), v AS (
      SELECT mx, my,
             CASE WHEN (CASE WHEN abs(e1x) >= abs(e1y)
                             THEN e1x ELSE e1y END) < 0
                  THEN -e1x ELSE e1x END AS v1x,
             CASE WHEN (CASE WHEN abs(e1x) >= abs(e1y)
                             THEN e1x ELSE e1y END) < 0
                  THEN -e1y ELSE e1y END AS v1y,
             CASE WHEN (CASE WHEN abs(e2x) >= abs(e2y)
                             THEN e2x ELSE e2y END) < 0
                  THEN -e2x ELSE e2x END AS v2x,
             CASE WHEN (CASE WHEN abs(e2x) >= abs(e2y)
                             THEN e2x ELSE e2y END) < 0
                  THEN -e2y ELSE e2y END AS v2y
      FROM u
    )
    SELECT d.vec_id,
           ROUND((d.x - v.mx)*v.v1x + (d.y - v.my)*v.v1y, 5) AS pc1,
           ROUND((d.x - v.mx)*v.v2x + (d.y - v.my)*v.v2y, 5) AS pc2
    FROM d CROSS JOIN v
    WHERE d.vec_id < 50
    ORDER BY d.vec_id
    """,
)
def pca_project_closed_form_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection witness: the same covariance_eigh + project path as
    embedding_pca_project (moment pass, driver eigh, canonical signs,
    broadcast pandas-UDF matmul) over the 2-D integer-grid projection of
    the corpus, where the eigenvectors have the SQL closed form
    (b, lambda-a)/norm. Asserts the non-degenerate regime in-query
    (b != 0 and an eigengap, else the closed form and eigh could pick
    different bases); with it, eigh and the formula agree to ~1e-13,
    far inside ROUND(.,5). Completes the PCA family's hash-checked
    coverage: spectrum (embedding_pca_closed_form_exact), projection
    (this), 64-D production regime (rows-only + tests/test_pca.py)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import pca

    emb = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    d2 = emb.select(
        "vec_id",
        F.array(
            F.floor(F.col("embedding")[0].cast("double") * 50).cast("double"),
            F.floor(F.col("embedding")[1].cast("double") * 50).cast("double"),
        ).alias("v2"),
    )
    mean, w, v, _ = pca.covariance_eigh(d2, "v2", 2)
    stats = d2.select(
        F.col("v2")[0].alias("x"), F.col("v2")[1].alias("y")
    ).agg(
        (F.sum(F.col("x") * F.col("y")) / F.count(F.lit(1))).alias("sxy_n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
    ).first()
    b_cov = float(stats["sxy_n"]) - float(stats["mx"]) * float(stats["my"])
    assert abs(b_cov) > 1e-9 and float(w[0] - w[1]) > 1e-6, (
        "witness regime broken: degenerate 2x2 covariance (b ~ 0 or "
        "eigengap ~ 0) — the closed-form eigenbasis is not unique"
    )
    projected = pca.project(
        d2.filter(F.col("vec_id") < 50), mean, v, "v2", "pcs"
    )
    return projected.select(
        "vec_id",
        F.round(F.col("pcs")[0], 5).alias("pc1"),
        F.round(F.col("pcs")[1], 5).alias("pc2"),
    ).orderBy("vec_id")


@query(
    "fd_saturated_spectrum_exact",
    oracle="""
    -- Frequent-Directions exactness witness: with ell >= the slice's row
    -- count no shrink can ever fire (per-partition buffers never fill,
    -- the merge fold appends raw rows), so the sketch IS the data matrix
    -- up to row order and zero padding — neither changes singular
    -- values. On a 2-D integer-grid slice the Gram matrix is exact
    -- integers and sigma_i = sqrt(eigenvalue_i(X'X)) has the quadratic
    -- closed form; LAPACK SVD agrees to ~1 ulp, absorbed by ROUND(.,6).
    WITH d AS (
      SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 50) AS BIGINT) AS x,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 50) AS BIGINT) AS y
      FROM embeddings WHERE vec_id < 60
    ), g AS (
      SELECT CAST(SUM(x*x) AS DOUBLE) AS gxx,
             CAST(SUM(x*y) AS DOUBLE) AS gxy,
             CAST(SUM(y*y) AS DOUBLE) AS gyy
      FROM d
    ), e AS (
      SELECT (gxx + gyy + sqrt((gxx-gyy)*(gxx-gyy) + 4*gxy*gxy)) / 2 AS l1,
             (gxx + gyy - sqrt((gxx-gyy)*(gxx-gyy) + 4*gxy*gxy)) / 2 AS l2
      FROM g
    )
    SELECT CAST(1 AS INTEGER) AS component, ROUND(sqrt(l1), 6) AS sigma FROM e
    UNION ALL
    SELECT CAST(2 AS INTEGER), ROUND(sqrt(l2), 6) FROM e
    ORDER BY component
    """,
)
def fd_saturated_spectrum_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-Directions exactness witness: the same fd_sketch /
    fd_spectrum path as frequent_directions_spectrum (per-partition
    streaming sketches, deterministic pid-ordered merge fold, driver
    SVD) in the SATURATED regime — ell is derived from a count pre-pass
    as the slice's row count (the stream_kll_saturated_exact
    discipline), so the shrink step can never fire and the sketch holds
    the raw rows exactly; its singular values equal the closed-form
    2x2 Gram eigenvalues' square roots. The shrinking regime of the
    SAME code path stays rows-only in frequent_directions_spectrum with
    the GLPW-bound property tests (tests/test_fd.py)."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import fd

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    d2 = emb.select(
        "vec_id",
        F.array(
            F.floor(F.col("embedding")[0].cast("double") * 50).cast("double"),
            F.floor(F.col("embedding")[1].cast("double") * 50).cast("double"),
        ).alias("v2"),
    )
    n = int(d2.count())
    assert n >= 2, "witness regime broken: slice too small"
    sk = fd.fd_sketch(d2, vec_col="v2", id_col="vec_id", ell=n, dim=2)
    rows = [(c, round(s, 6)) for c, s in fd.fd_spectrum(sk, top=2)]
    return spark.createDataFrame(rows, "component int, sigma double")


@query(
    "ann_lsh_full_tables_exact",
    oracle="""
    -- LSH exactness witness (the LSH-family analogue of
    -- ann_ivf_full_probe_exact): with 1-bit tables, a candidate pair is
    -- missed only if the two vectors disagree on EVERY one of the 24
    -- hyperplanes — P ~ (theta/pi)^24, and on the fixtures (verified at
    -- every sf by tests/test_similarity.py::test_lsh_full_tables_covers_
    -- exact_topk) the candidate set is a superset of the true top-5, so
    -- the re-rank must reproduce brute-force kNN rank-for-rank. This puts
    -- the ENTIRE LSH code path (plane signatures, banded bucket join,
    -- dedup, exact re-rank) under the hash-checked oracle; recall<1
    -- configurations of the same path are covered by recall tests.
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
def ann_lsh_full_tables_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH exactness witness: same operator as ann_lsh_topk but with 24
    one-bit tables — OR-amplification so aggressive that on the fixture
    corpora the bucket-join candidates provably contain the true top-5
    (asserted per-sf in tests), making the output equal brute-force kNN.
    The hash-checked twin that promotes the LSH path out of rows-only."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ann_lsh_topk(
        emb, queries, k=5, dim=64, bits_per_table=1, n_tables=24, seed=42
    )


@query(
    "hybrid_search_rrf",
    oracle="""
    -- Hybrid retrieval: reciprocal-rank fusion (Cormack et al. SIGIR 2009)
    -- of a BM25 lexical ranking and an embedding-cosine ranking (doc_id and
    -- vec_id share the id space). RRF = sum over lists of 1/(60+rank) for
    -- docs in each list's top-20; per-list terms ROUNDed then summed as
    -- DECIMAL. Cosine ranks use ROUND(cos, 6) with vec_id tie-break (same
    -- double-exact formula as dedup_embedding_cosine's oracle).
    WITH qv AS (
      SELECT embedding::DOUBLE[] AS q FROM embeddings WHERE vec_id = 7
    ), vcos AS (
      SELECT e.vec_id AS id,
             ROUND(list_sum(list_transform(list_zip(e.embedding::DOUBLE[], qv.q),
                                           t -> t[1] * t[2]))
                   / (sqrt(list_sum(list_transform(e.embedding::DOUBLE[], x -> x * x)))
                      * sqrt(list_sum(list_transform(qv.q, x -> x * x)))),
                   6) AS cos
      FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 7
    ), vrank AS (
      SELECT id, vr FROM (
        SELECT id, CAST(row_number() OVER (ORDER BY cos DESC, id) AS BIGINT) AS vr
        FROM vcos
      ) WHERE vr <= 20
    ), toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT AVG(dl) AS avgdl, (SELECT COUNT(*) FROM documents) AS n_docs FROM dl
    ), q AS (SELECT unnest(['join', 'hash', 'vector']) AS term),
    df AS (
      SELECT t.term, COUNT(DISTINCT doc_id) AS df
      FROM toks t JOIN q USING (term) GROUP BY t.term
    ), tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM toks t JOIN q USING (term) GROUP BY doc_id, t.term
    ), per_term AS (
      SELECT tf.doc_id,
             ROUND(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                   * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)),
                   6) AS s
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
    ), scored AS (
      SELECT doc_id, CAST(SUM(CAST(s AS DECIMAL(28,6))) AS DOUBLE) AS score
      FROM per_term GROUP BY doc_id
    ), brank AS (
      SELECT id, br FROM (
        SELECT doc_id AS id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS br
        FROM scored
      ) WHERE br <= 20
    ), fused AS (
      SELECT COALESCE(v.id, b.id) AS doc_id,
             COALESCE(v.vr, 0) AS vec_rank,
             COALESCE(b.br, 0) AS bm25_rank,
             CAST(COALESCE(CAST(ROUND(1.0 / (60 + v.vr), 6) AS DECIMAL(28,6)), 0)
                  + COALESCE(CAST(ROUND(1.0 / (60 + b.br), 6) AS DECIMAL(28,6)), 0)
                  AS DOUBLE) AS rrf_score
      FROM vrank v FULL OUTER JOIN brank b ON v.id = b.id
    )
    SELECT doc_id, rrf_score, vec_rank, bm25_rank
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused with reciprocal-rank fusion —
    the standard RAG retrieval stack as one declarative plan: BM25 top-20
    (functions/text.bm25_doc_scores, shared with bm25_ranked_search) FULL
    OUTER JOINed with cosine top-20 (Arrow-batched numpy cosine), scored
    1/(60+rank) per list.

    Scale shape: each ranking is a TakeOrderedAndProject-sized head (20
    rows), so the fusion join is trivially broadcast; the heavy stages are
    the two underlying rankings, each already in its scale-safe form."""
    from pyspark.sql import Window

    from bloom_filters_count_min_sketch_spark_streaming_spark.functions import text as T

    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    qv = emb.filter(F.col("vec_id") == 7).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    corpus = emb.filter(F.col("vec_id") != 7).select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("cv")
    )
    cos = F.round(similarity.cosine_pandas(F.col("qv"), F.col("cv")), 6)
    wv = Window.orderBy(F.desc("cos"), F.asc("id"))
    # TakeOrderedAndProject head FIRST (distributed top-k, no global sort),
    # then the rank window runs over 20 rows in one tiny partition.
    vrank = (
        corpus.join(F.broadcast(qv))
        .select("id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(20)
        .withColumn("vr", F.row_number().over(wv).cast("long"))
        .select("id", "vr")
    )
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    brank = (
        T.bm25_doc_scores(docs, ["join", "hash", "vector"])
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .withColumn("br", F.row_number().over(wb).cast("long"))
        .select(F.col("doc_id").alias("id"), "br")
    )
    dec = "decimal(28,6)"
    zero = F.lit(0).cast(dec)
    term_v = F.coalesce(F.round(F.lit(1.0) / (60 + F.col("vr")), 6).cast(dec), zero)
    term_b = F.coalesce(F.round(F.lit(1.0) / (60 + F.col("br")), 6).cast(dec), zero)
    fused = (
        vrank.join(brank, "id", "full_outer")
        .select(
            F.col("id").alias("doc_id"),
            (term_v + term_b).cast("double").alias("rrf_score"),
            F.coalesce(F.col("vr"), F.lit(0)).alias("vec_rank"),
            F.coalesce(F.col("br"), F.lit(0)).alias("bm25_rank"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(10)


# --- MMR diversified re-ranking ----------------------------------------------

_MMR_K = 5
_MMR_CAND = 10
_MMR_LAM = 0.7


def _mmr_oracle(k: int = _MMR_K, cand_k: int = _MMR_CAND, lam: float = _MMR_LAM) -> str:
    """Unrolled greedy MMR as chained CTEs (the pagerank-oracle technique):
    every dot product is a per-dim ROUND -> DECIMAL sum, so relevance and
    pairwise similarity are bit-identical doubles in both engines and the
    greedy argmax sequence is engine-stable."""
    sql = f"""
    WITH dims AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, range(1, 65) t(i)  -- fixture dim = 64, all SFs
    ),
    nrm AS (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,8))) AS DOUBLE))
               AS nrm
      FROM dims GROUP BY vec_id
    ),
    qd AS (SELECT i, x FROM dims WHERE vec_id = 0),
    rel0 AS (
      SELECT d.vec_id,
             CAST(SUM(CAST(ROUND(d.x * q.x, 8) AS DECIMAL(28,8))) AS DOUBLE)
               AS dot
      FROM dims d JOIN qd q USING (i) WHERE d.vec_id <> 0 GROUP BY d.vec_id
    ),
    cand AS (
      SELECT r.vec_id, ROUND(r.dot / (n.nrm * qn.qnrm), 8) AS rel
      FROM rel0 r
      JOIN nrm n USING (vec_id)
      CROSS JOIN (SELECT nrm AS qnrm FROM nrm WHERE vec_id = 0) qn
      ORDER BY rel DESC, r.vec_id
      LIMIT {cand_k}
    ),
    sims AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             ROUND(
               CAST(SUM(CAST(ROUND(da.x * db.x, 8) AS DECIMAL(28,8))) AS DOUBLE)
               / (na.nrm * nb.nrm), 8) AS sim
      FROM cand a
      JOIN cand b ON a.vec_id <> b.vec_id
      JOIN dims da ON da.vec_id = a.vec_id
      JOIN dims db ON db.vec_id = b.vec_id AND db.i = da.i
      JOIN nrm na ON na.vec_id = a.vec_id
      JOIN nrm nb ON nb.vec_id = b.vec_id
      GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm
    ),
    s1 AS (
      SELECT vec_id, rel, 1 AS step, rel AS score
      FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ),
    sel1 AS (SELECT * FROM s1)"""
    for i in range(2, k + 1):
        sql += f""",
    p{i} AS (
      SELECT c.vec_id, c.rel,
             ROUND({lam} * c.rel - {round(1 - lam, 10)} * MAX(s.sim), 8) AS score
      FROM cand c
      JOIN sims s ON s.va = c.vec_id
      JOIN sel{i - 1} t ON t.vec_id = s.vb
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
      GROUP BY c.vec_id, c.rel
    ),
    s{i} AS (
      SELECT vec_id, rel, {i} AS step, score
      FROM p{i} ORDER BY score DESC, vec_id LIMIT 1
    ),
    sel{i} AS (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM s{i})"""
    sql += f"""
    SELECT step, vec_id, rel AS relevance, score AS mmr_score
    FROM sel{k} ORDER BY step
    """
    return sql


@query("mmr_diversified_rerank", oracle=_mmr_oracle())
def mmr_diversified_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    from the cosine top-10 for one query vector, greedily select 5 results
    maximizing lam*relevance - (1-lam)*max-similarity-to-already-selected —
    the standard diversity pass between retrieval and a RAG context window.

    Scale shape: relevance is the corpus-wide stage (here the relational
    decimal-summed dot product so the oracle can reproduce it bit-for-bit;
    the production kNN path is the Arrow/numpy batch matmul) — the greedy
    runs on a CANDIDATE LIST of constant size k, so its 4 extra jobs touch
    ~100 rows regardless of corpus size; nothing iterative ever re-reads
    the corpus. Every score is a per-dim ROUND -> DECIMAL sum, making the
    greedy argmax sequence engine-stable."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select("vec_id", "i", F.col("xf").cast("double").alias("x"))
    nrm = dims.groupBy("vec_id").agg(
        F.sqrt(
            F.sum(F.round(F.col("x") * F.col("x"), 8).cast("decimal(28,8)")).cast(
                "double"
            )
        ).alias("nrm")
    )
    qd = dims.filter(F.col("vec_id") == 0).select("i", F.col("x").alias("qx"))
    qnrm = float(nrm.filter(F.col("vec_id") == 0).head()[1])
    rel0 = (
        dims.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qd), "i")
        .groupBy("vec_id")
        .agg(
            F.sum(F.round(F.col("x") * F.col("qx"), 8).cast("decimal(28,8)"))
            .cast("double")
            .alias("dot")
        )
    )
    cand = (
        rel0.join(nrm, "vec_id")
        .select(
            "vec_id",
            F.round(F.col("dot") / (F.col("nrm") * F.lit(qnrm)), 8).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(_MMR_CAND)
        .persist()
    )
    ca = cand.select(F.col("vec_id").alias("va"))
    cb = cand.select(F.col("vec_id").alias("vb"))
    na = nrm.select(F.col("vec_id").alias("va"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("vec_id").alias("vb"), F.col("nrm").alias("nb"))
    da = dims.select(F.col("vec_id").alias("va"), "i", F.col("x").alias("xa"))
    db = dims.select(F.col("vec_id").alias("vb"), "i", F.col("x").alias("xb"))
    sims = (
        ca.join(cb, ca.va != cb.vb)
        .join(da, "va")
        .join(db, ["vb", "i"])
        .groupBy("va", "vb")
        .agg(
            F.sum(F.round(F.col("xa") * F.col("xb"), 8).cast("decimal(28,8)"))
            .cast("double")
            .alias("dot")
        )
        .join(na, "va")
        .join(nb, "vb")
        .select(
            "va", "vb", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 8).alias("sim")
        )
        .persist()
    )
    first = (
        cand.orderBy(F.desc("rel"), "vec_id")
        .limit(1)
        .select("vec_id", "rel", F.lit(1).alias("step"), F.col("rel").alias("score"))
    )
    selected = first
    for i in range(2, _MMR_K + 1):
        sel_ids = selected.select("vec_id")
        pi = (
            cand.join(sel_ids, "vec_id", "left_anti")
            .join(sims, cand.vec_id == sims.va)
            .join(sel_ids.withColumnRenamed("vec_id", "vb"), "vb")
            .groupBy(cand.vec_id, "rel")
            .agg(
                F.round(
                    F.lit(_MMR_LAM) * F.col("rel")
                    - F.lit(round(1 - _MMR_LAM, 10)) * F.max("sim"),
                    8,
                ).alias("score")
            )
        )
        si = (
            pi.orderBy(F.desc("score"), "vec_id")
            .limit(1)
            .select("vec_id", "rel", F.lit(i).alias("step"), "score")
        )
        selected = selected.unionAll(si).localCheckpoint(eager=True)
    return selected.select(
        "step", "vec_id", F.col("rel").alias("relevance"), F.col("score").alias("mmr_score")
    ).orderBy("step")


# --- PCA / whitening ----------------------------------------------------------


@query("embedding_pca_variance", witness="embedding_pca_closed_form_exact")
def embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA spectrum of the embedding corpus: top-8 eigenvalues of the
    covariance matrix with explained-variance ratios — the embedding-health
    audit (collapsed dimensions show up as a cliff in this table).
    Rows-only for the driver (eigendecomposition isn't SQL); exactness
    property-tested in tests/test_pca.py. Scale shape: one mapInPandas
    moment pass (O(dim²) shuffle bytes per partition), driver-side eigh of
    a 64×64 matrix."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import pca

    emb = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    _, w, _, _ = pca.covariance_eigh(emb, "embedding", 64)
    total = float(w.sum())
    rows = [
        (int(c + 1), round(float(w[c]), 6), round(float(w[c]) / total, 6))
        for c in range(8)
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_ratio double"
    )


@query("embedding_pca_project", witness="pca_project_closed_form_exact")
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 principal-component projection of the first 50 embeddings
    (the dimensionality-reduction step before clustering / visualization /
    cheap ANN). Deterministic end-to-end: integer moment sums (partition-
    order invariant), canonical eigenvector signs, one broadcast matmul.
    Rows-only (eigh isn't SQL); invariants in tests/test_pca.py."""
    from bloom_filters_count_min_sketch_spark_streaming_spark.operators import pca

    emb = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    mean, w, v, _ = pca.covariance_eigh(emb, "embedding", 64)
    projected = pca.project(
        emb.filter(F.col("vec_id") < 50), mean, v[:, :4], "embedding", "pcs"
    )
    return projected.select(
        "vec_id",
        *[F.round(F.col("pcs")[c], 5).alias(f"pc{c + 1}") for c in range(4)],
    ).orderBy("vec_id")


@query(
    "jl_projection_distortion",
    oracle="""
    -- Johnson-Lindenstrauss audit: the theory underwriting every LSH /
    -- random-projection stage in the ANN family, measured. A PORTABLE
    -- +/-1 sign matrix (md5(i|j) parity, 64 -> 16 dims) projects a
    -- deterministic 30-pair sample; reported distortion is
    -- ||R(a-b)||^2 / (k * ||a-b||^2), which JL says concentrates near 1.
    -- All sums are ROUNDed-term DECIMAL accumulations over unnested
    -- (vector, dim) rows — no list_sum ordering dependence.
    WITH sel AS (
      SELECT vec_id, embedding,
             ROW_NUMBER() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR) || '|jl'), vec_id) AS rn
      FROM embeddings QUALIFY rn <= 60
    ),
    dims AS (SELECT unnest(range(1, 65)) AS i),
    ks AS (SELECT unnest(range(1, 17)) AS j),
    signs AS (
      SELECT i, j,
             CASE WHEN ('0x' || substr(md5(CAST(i AS VARCHAR) || '|'
                        || CAST(j AS VARCHAR)), 1, 2))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM dims CROSS JOIN ks
    ),
    elems AS (
      SELECT sel.rn, sel.vec_id, dims.i,
             CAST(embedding[dims.i] AS DOUBLE) AS x
      FROM sel CROSS JOIN dims
    ),
    proj AS (
      SELECT e.rn, s.j,
             CAST(SUM(CAST(ROUND(e.x * s.s, 8) AS DECIMAL(28,8))) AS DOUBLE)
               AS y
      FROM elems e JOIN signs s ON s.i = e.i
      GROUP BY e.rn, s.j
    ),
    pairs AS (
      SELECT a.rn AS ra, b.rn AS rb, a.vec_id AS va, b.vec_id AS vb,
             CAST((a.rn + 1) / 2 AS BIGINT) AS pair_id
      FROM sel a JOIN sel b ON b.rn = a.rn + 1 AND a.rn % 2 = 1
    ),
    d2x AS (
      SELECT p.pair_id,
             CAST(SUM(CAST(ROUND((ea.x - eb.x) * (ea.x - eb.x), 10)
                           AS DECIMAL(28,10))) AS DOUBLE) AS dx
      FROM pairs p
      JOIN elems ea ON ea.rn = p.ra
      JOIN elems eb ON eb.rn = p.rb AND eb.i = ea.i
      GROUP BY p.pair_id
    ),
    d2y AS (
      SELECT p.pair_id,
             CAST(SUM(CAST(ROUND((pa.y - pb.y) * (pa.y - pb.y), 8)
                           AS DECIMAL(28,8))) AS DOUBLE) AS dy
      FROM pairs p
      JOIN proj pa ON pa.rn = p.ra
      JOIN proj pb ON pb.rn = p.rb AND pb.j = pa.j
      GROUP BY p.pair_id
    )
    SELECT p.pair_id, p.va, p.vb,
           ROUND(x.dx, 6) AS d2_orig,
           ROUND(y.dy / (16.0 * x.dx), 6) AS distortion_ratio
    FROM pairs p JOIN d2x x USING (pair_id) JOIN d2y y USING (pair_id)
    ORDER BY p.pair_id
    """,
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit: project a deterministic
    30-pair embedding sample through a portable md5-parity +/-1 matrix
    (64 -> 16 dims) and report ||R(a-b)||^2 / (k*||a-b||^2) per pair —
    the measured version of the concentration bound the ANN/LSH family
    leans on. Sign matrix, sample, and every squared-distance sum are
    engine-exact (rounded-term decimal accumulation over unnested rows).

    Scale shape: the sample join prunes the corpus before any explode;
    the projection is (60 x 64 x 16) rows — at production scale the same
    shape is mapInPandas GEMM per batch (knn_blocked_gemm_topk), this
    query is the portable correctness witness."""
    emb = load(spark, sf_dir, "embeddings")
    w_rn = Window.orderBy(
        F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("|jl"))),
        F.col("vec_id"),
    )
    sel = (
        emb.withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rn") <= 60)
        .select("rn", "vec_id", "embedding")
        .persist()
    )
    dims = F.broadcast(
        spark.range(1, 65).select(F.col("id").cast("int").alias("i"))
    )
    ks = F.broadcast(
        spark.range(1, 17).select(F.col("id").cast("int").alias("j"))
    )
    signs = dims.crossJoin(ks).select(
        "i",
        "j",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("i").cast("string"),
                            F.lit("|"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    elems = (
        sel.select(
            "rn", "vec_id", F.posexplode("embedding").alias("p0", "xf")
        )
        .select(
            "rn",
            "vec_id",
            (F.col("p0") + 1).cast("int").alias("i"),
            F.col("xf").cast("double").alias("x"),
        )
        .persist()
    )
    proj = (
        elems.join(F.broadcast(signs), "i")
        .groupBy("rn", "j")
        .agg(
            F.sum(F.round(F.col("x") * F.col("s"), 8).cast("decimal(28,8)"))
            .cast("double")
            .alias("y")
        )
    )
    a = sel.select(F.col("rn").alias("ra"), F.col("vec_id").alias("va"))
    b = sel.select(F.col("rn").alias("rb"), F.col("vec_id").alias("vb"))
    pairs = (
        a.join(b, (F.col("rb") == F.col("ra") + 1) & (F.col("ra") % 2 == 1))
        .select(
            "ra",
            "rb",
            "va",
            "vb",
            ((F.col("ra") + 1) / 2).cast("long").alias("pair_id"),
        )
        .persist()
    )
    ea = elems.select(
        F.col("rn").alias("era"), F.col("i").alias("ia"), F.col("x").alias("xa")
    )
    eb = elems.select(
        F.col("rn").alias("erb"), F.col("i").alias("ib"), F.col("x").alias("xb")
    )
    d2x = (
        pairs.join(ea, F.col("era") == F.col("ra"))
        .join(eb, (F.col("erb") == F.col("rb")) & (F.col("ib") == F.col("ia")))
        .groupBy("pair_id")
        .agg(
            F.sum(
                F.round(
                    (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")),
                    10,
                ).cast("decimal(28,10)")
            )
            .cast("double")
            .alias("dx")
        )
    )
    pa = proj.select(
        F.col("rn").alias("pra"), F.col("j").alias("ja"), F.col("y").alias("ya")
    )
    pb = proj.select(
        F.col("rn").alias("prb"), F.col("j").alias("jb"), F.col("y").alias("yb")
    )
    d2y = (
        pairs.join(pa, F.col("pra") == F.col("ra"))
        .join(pb, (F.col("prb") == F.col("rb")) & (F.col("jb") == F.col("ja")))
        .groupBy(F.col("pair_id").alias("pid2"))
        .agg(
            F.sum(
                F.round(
                    (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")),
                    8,
                ).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("dy")
        )
    )
    return (
        pairs.join(d2x, "pair_id")
        .join(d2y, F.col("pid2") == F.col("pair_id"))
        .select(
            "pair_id",
            "va",
            "vb",
            F.round("dx", 6).alias("d2_orig"),
            F.round(F.col("dy") / (16.0 * F.col("dx")), 6).alias(
                "distortion_ratio"
            ),
        )
        .orderBy("pair_id")
    )


@query(
    "knn_label_ndcg",
    oracle="""
    -- Ranking-quality metrics for the exact cosine top-10 with label-match
    -- relevance: per query, DCG@10 / nDCG@10 (ideal = min(pool,10) ones)
    -- and AP@10 — the retrieval scorecard on top of the kNN family.
    -- Ranks agree cross-engine per the knn_cosine_bruteforce note; gain
    -- and precision terms ROUND@10 into DECIMAL sums.
    WITH ranks AS (
      SELECT q.vec_id AS query_id, q.label AS qlab, c.label AS clab,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id) AS rank
      FROM embeddings q, embeddings c
      WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id
    ),
    pool AS (
      SELECT q.vec_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_rel_pool
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id AND c.label = q.label
      WHERE q.vec_id < 20 GROUP BY 1
    ),
    top AS (
      SELECT query_id, rank,
             CASE WHEN clab = qlab THEN 1 ELSE 0 END AS rel
      FROM ranks WHERE rank <= 10
    ),
    prec AS (
      SELECT query_id, rank, rel,
             CAST(SUM(rel) OVER (PARTITION BY query_id ORDER BY rank
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumrel
      FROM top
    ),
    per AS (
      SELECT query_id,
             CAST(SUM(CAST(ROUND(rel * ln(2.0) / ln(rank + 1.0), 10)
               AS DECIMAL(28,10))) AS DOUBLE) AS dcg,
             CAST(SUM(CAST(ROUND(CASE WHEN rel = 1
                                      THEN cumrel * 1.0 / rank
                                      ELSE 0.0 END, 10)
               AS DECIMAL(28,10))) AS DOUBLE) AS ap_num,
             CAST(SUM(rel) AS BIGINT) AS n_rel_top
      FROM prec GROUP BY 1
    ),
    idcg AS (
      SELECT pool.query_id,
             CAST(SUM(CAST(ROUND(ln(2.0) / ln(r.i + 1.0), 10)
               AS DECIMAL(28,10))) AS DOUBLE) AS idcg
      FROM pool JOIN (SELECT unnest(range(1, 11)) AS i) r
        ON r.i <= LEAST(pool.n_rel_pool, 10)
      GROUP BY 1
    )
    SELECT per.query_id, pool.n_rel_pool, per.n_rel_top,
           ROUND(per.dcg, 6) AS dcg,
           ROUND(per.dcg / idcg.idcg, 6) AS ndcg,
           ROUND(per.ap_num / LEAST(pool.n_rel_pool, 10), 6) AS ap
    FROM per
    JOIN pool ON pool.query_id = per.query_id
    JOIN idcg ON idcg.query_id = per.query_id
    ORDER BY per.query_id
    """,
)
def knn_label_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 and AP@10 of the exact cosine top-10 under label-match
    relevance — the retrieval scorecard the ANN variants' recall numbers
    roll up into (recall says how many relevant came back; nDCG/AP say
    how well they were ORDERED). Gains and precision terms are rounded-
    term decimal sums; the ideal DCG joins a 10-row rank series against
    each query's relevant-pool size.

    Scale shape: reuses the broadcast-query brute-force ranking (the
    Arrow-batched einsum path); the metric layer is 200 rows."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    topk = similarity.cosine_topk_bruteforce(emb, queries, k=10)
    qlab = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlab")
    )
    clab = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("clab")
    )
    top = (
        topk.join(F.broadcast(qlab), "query_id")
        .join(clab, "neighbor_id")
        .select(
            "query_id",
            "rank",
            (F.col("clab") == F.col("qlab")).cast("long").alias("rel"),
        )
    )
    c2 = emb.select(F.col("vec_id").alias("cid"), F.col("label").alias("cl"))
    pool = (
        emb.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("query_id"), F.col("label").alias("ql"))
        .join(c2, (F.col("cid") != F.col("query_id")) & (F.col("cl") == F.col("ql")))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel_pool"))
    )
    w_cum = Window.partitionBy("query_id").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prec = top.withColumn("cumrel", F.sum("rel").over(w_cum).cast("long"))
    dec10 = lambda c: F.sum(F.round(c, 10).cast("decimal(28,10)")).cast(  # noqa: E731
        "double"
    )
    per = prec.groupBy("query_id").agg(
        dec10(
            F.col("rel") * F.log(F.lit(2.0)) / F.log(F.col("rank") + 1.0)
        ).alias("dcg"),
        dec10(
            F.when(
                F.col("rel") == 1, F.col("cumrel") * 1.0 / F.col("rank")
            ).otherwise(0.0)
        ).alias("ap_num"),
        F.sum("rel").cast("long").alias("n_rel_top"),
    )
    ranks10 = F.broadcast(
        spark.range(1, 11).select(F.col("id").cast("int").alias("i"))
    )
    idcg = (
        pool.crossJoin(ranks10)
        .filter(F.col("i") <= F.least(F.col("n_rel_pool"), F.lit(10)))
        .groupBy(F.col("query_id").alias("qid2"))
        .agg(
            dec10(F.log(F.lit(2.0)) / F.log(F.col("i") + 1.0)).alias("idcg")
        )
    )
    return (
        per.join(pool, "query_id")
        .join(idcg, F.col("qid2") == F.col("query_id"))
        .select(
            "query_id",
            "n_rel_pool",
            "n_rel_top",
            F.round("dcg", 6).alias("dcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
            F.round(
                F.col("ap_num") / F.least(F.col("n_rel_pool"), F.lit(10)), 6
            ).alias("ap"),
        )
        .orderBy("query_id")
    )


@query(
    "ann_rptree_full_spill_exact",
    oracle="""
    -- RP-tree exactness witness (same pattern as ann_lsh_full_tables_exact
    -- / ann_ivf_full_probe_exact): with a single tree level, the
    -- both-children spill at the last level makes every query probe BOTH
    -- leaves — i.e. the whole corpus — so the tree machinery (projection
    -- scores, median split, leaf equi-join, dedup, exact re-rank) must
    -- reproduce brute-force cosine kNN rank-for-rank. This puts the entire
    -- RP-tree code path under the hash-checked oracle; recall<1 tree
    -- depths of the SAME path are covered by the recall property tests.
    -- Ranking is on ROUND(cos, 6) in BOTH engines (round-before-compare):
    -- raw-float ranking would rest on fixture rank gaps to absorb
    -- numpy-vs-DuckDB last-bit noise on near-ties.
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY ROUND(list_cosine_similarity(q.embedding, c.embedding), 6)
                        DESC,
                      c.vec_id
           ) AS rank
    FROM embeddings q, embeddings c
    WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    QUALIFY rank <= 5
    """,
)
def ann_rptree_full_spill_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RP-tree exactness witness: levels=1 means the standard last-level
    spill probes both children of the root — the candidate set IS the
    corpus, so the output must equal brute-force kNN exactly. Promotes the
    RP-tree path (ann_rptree_topk, rows-only by construction at depth>1)
    into the hash-checked family, exactly how the LSH and IVF paths earned
    their full-coverage witnesses. Ranks on ROUND(cos, 6) cross-engine so
    determinism comes from the rounding rule, not fixture margins."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ann_rptree_topk(
        emb, queries, k=5, levels=1, dim=64, seed=42, round_scores=6
    )


@query("ann_rptree_topk", witness="ann_rptree_full_spill_exact")
def ann_rptree_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via a random-projection tree (the annoy-family
    member beside LSH tables and IVF cells): median splits give BALANCED
    leaves by construction, queries spill to both last-level children.
    Recall < 1 by construction -> rows-only; recall vs brute force
    asserted in tests/test_similarity.py."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return similarity.ann_rptree_topk(
        emb, queries, k=5, levels=3, dim=64, seed=42
    )


@query(
    "energy_distance_embeddings",
    oracle="""
    -- ENERGY DISTANCE between two embedding populations (labels 0-4 vs
    -- 5-9): E = 2*E|X-Y| - E|X-X'| - E|Y-Y'| — the two-sample test that
    -- works IN VECTOR SPACE, where KS/AD/PSI (scalar drift family) can't
    -- see: E = 0 iff the distributions are equal. Pairwise L2 distances
    -- are identical IEEE chains (exact float32->double lifts, in-order
    -- 64-element folds, one sqrt), ROUND@1e-6 -> DECIMAL sums over exact
    -- pair counts. Sample is FIXED-SIZE: md5-rank LIMIT 80 per group, so
    -- the V-statistic pair join is O(m^2)=12,720 pairs at ANY corpus
    -- scale (a fixed fraction would be O((n/5)^2) — quadratic again).
    WITH s AS (
      SELECT vec_id, grp, v FROM (
        SELECT vec_id, CASE WHEN label < 5 THEN 0 ELSE 1 END AS grp,
               embedding::DOUBLE[] AS v,
               ROW_NUMBER() OVER (
                 PARTITION BY CASE WHEN label < 5 THEN 0 ELSE 1 END
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
      ) WHERE rn <= 80
    ),
    pairs AS (
      SELECT a.grp AS ga, b.grp AS gb,
             ROUND(sqrt(list_sum(list_transform(
               list_zip(a.v, b.v),
               p -> (p[1] - p[2]) * (p[1] - p[2])))), 6) AS d
      FROM s a JOIN s b ON a.vec_id < b.vec_id
    ),
    agg AS (
      SELECT
        CAST(SUM(CASE WHEN ga = 0 AND gb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nxx,
        CAST(SUM(CASE WHEN ga = 1 AND gb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nyy,
        CAST(SUM(CASE WHEN ga <> gb THEN 1 ELSE 0 END) AS BIGINT) AS nxy,
        CAST(SUM(CASE WHEN ga = 0 AND gb = 0
                      THEN CAST(d AS DECIMAL(28,6)) END) AS DOUBLE) AS sxx,
        CAST(SUM(CASE WHEN ga = 1 AND gb = 1
                      THEN CAST(d AS DECIMAL(28,6)) END) AS DOUBLE) AS syy,
        CAST(SUM(CASE WHEN ga <> gb
                      THEN CAST(d AS DECIMAL(28,6)) END) AS DOUBLE) AS sxy
      FROM pairs
    )
    SELECT nxx, nyy, nxy,
           ROUND(sxx / nxx, 6) AS mean_within_x,
           ROUND(syy / nyy, 6) AS mean_within_y,
           ROUND(sxy / nxy, 6) AS mean_between,
           ROUND(2.0 * sxy / nxy - sxx / nxx - syy / nyy, 6) AS energy_distance
    FROM agg
    """,
)
def energy_distance_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance (Szekely-Rizzo) between two embedding populations —
    the drift test that works IN VECTOR SPACE, closing the gap the scalar
    family (KS / AD / PSI / Wasserstein) leaves: a representation shift
    that preserves every per-coordinate marginal still moves pairwise
    distances, and E = 2*E|X-Y| - E|X-X'| - E|Y-Y'| is zero iff the
    distributions coincide. Embedding-space distribution monitoring is
    the production check between retrain snapshots.

    Scale shape: V-statistic on a FIXED-SIZE sample — md5-rank, LIMIT 80
    per group (the Dalenius/Neyman samplers' deterministic-hash pattern),
    so the pair join is a constant 12,720 pairs at any corpus scale; the
    estimator converges like any mean of pairwise kernels, so bounded
    sampling IS the plan at 100 TB (the blocked-GEMM path exists for
    exact sweeps). Distances are in-order 64-element JVM folds rounded
    @1e-6, sums DECIMAL, counts exact."""
    emb = load(spark, sf_dir, "embeddings")
    w = Window.partitionBy("grp").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    s = (
        emb.select(
            "vec_id",
            F.when(F.col("label") < 5, 0).otherwise(1).alias("grp"),
            similarity._as_double_array("embedding").alias("v"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 80)
        .drop("rn")
    )
    a = s.select(
        F.col("vec_id").alias("ida"), F.col("grp").alias("ga"), F.col("v").alias("va")
    )
    b = s.select(
        F.col("vec_id").alias("idb"), F.col("grp").alias("gb"), F.col("v").alias("vb")
    )
    d = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        6,
    )
    pairs = (
        a.join(b, F.col("ida") < F.col("idb"))
        .select("ga", "gb", d.alias("d"))
    )
    dec = lambda cond: F.sum(F.when(cond, F.col("d").cast("decimal(28,6)"))).cast(
        "double"
    )
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("long")
    xx = (F.col("ga") == 0) & (F.col("gb") == 0)
    yy = (F.col("ga") == 1) & (F.col("gb") == 1)
    xy = F.col("ga") != F.col("gb")
    agg = pairs.agg(
        cnt(xx).alias("nxx"),
        cnt(yy).alias("nyy"),
        cnt(xy).alias("nxy"),
        dec(xx).alias("sxx"),
        dec(yy).alias("syy"),
        dec(xy).alias("sxy"),
    )
    return agg.select(
        "nxx",
        "nyy",
        "nxy",
        F.round(F.col("sxx") / F.col("nxx"), 6).alias("mean_within_x"),
        F.round(F.col("syy") / F.col("nyy"), 6).alias("mean_within_y"),
        F.round(F.col("sxy") / F.col("nxy"), 6).alias("mean_between"),
        F.round(
            2.0 * F.col("sxy") / F.col("nxy")
            - F.col("sxx") / F.col("nxx")
            - F.col("syy") / F.col("nyy"),
            6,
        ).alias("energy_distance"),
    )
