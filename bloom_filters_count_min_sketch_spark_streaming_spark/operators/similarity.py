"""Vector similarity search over embedding columns (array<float>).

Two paths:

- **brute force** (the correctness baseline): query set x corpus
  broadcast-nested-loop join, cosine computed in an Arrow-batched pandas
  UDF (one numpy einsum per batch — Catalyst's lambda HOFs are evaluated
  interpreted per element, which made them the CPU bottleneck of the
  vector hot path), ranked per query with a window. Right-sizing note:
  broadcast the *query* side (small), stream the corpus — work is
  |Q| x |corpus|, embarrassingly parallel over corpus partitions.
- **LSH-bucketed** (the 100 TB path): random-hyperplane signatures
  (sign(v . h_p) bits, deterministic planes derived from a seed), bucket
  equi-join, exact re-rank within buckets. Recall < 1 by construction;
  multi-probe = more signature permutations.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType


def _as_double_array(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Element-wise dot product of two array<double> columns (JVM-side).

    NOTE: Catalyst evaluates these lambdas *interpreted*, per element — fine
    for one-shot/low-volume columns, NOT for per-pair scoring. Hot paths use
    ``cosine_pandas`` (Arrow batch + numpy) instead.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def _cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    va = np.stack(a.to_numpy()).astype(np.float64, copy=False)
    vb = np.stack(b.to_numpy()).astype(np.float64, copy=False)
    num = np.einsum("ij,ij->i", va, vb)
    den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.Series(num / den)


# Arrow-batched cosine(array, array) -> double: one einsum + two norms per
# batch. ~dim x faster than the interpreted HOF fold at scale; used by every
# per-pair scoring stage (brute-force kNN, LSH/IVF re-rank, near-dup filter).
cosine_pandas = F.pandas_udf(_cosine_batch, DoubleType())


def with_unit_norm(df: DataFrame, vec_col: str, out: str = "unit") -> DataFrame:
    """Pre-normalize embeddings so cosine becomes a plain dot product."""
    v = _as_double_array(vec_col)
    n = norm(v)
    return df.withColumn(out, F.transform(v, lambda x: x / n))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, rank), rank 1 = nearest, self excluded.
    Deterministic tie-break on neighbor_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("qv")
    )
    # Repartition the corpus: the cosine fold is CPU-heavy per row and a
    # single-file source would otherwise run on one task (see dedup note).
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("cv")
    ).repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_pandas(F.col("qv"), F.col("cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def cosine_topk_blocked_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors via BLOCKED MATRIX MULTIPLY — same
    semantics and output contract as ``cosine_topk_bruteforce``
    (query_id, neighbor_id, rank; self excluded; neighbor_id tie-break),
    different physical strategy: the one production brute-force vector
    search uses at scale.

    Shape: the (small) query set collects once, L2-normalizes into a
    numpy matrix, and ships as a Spark BROADCAST. Each corpus Arrow batch
    lifts to a (batch × dim) float64 matrix, one BLAS GEMM scores every
    (query, row) pair, and np.argpartition keeps only the batch-local
    top-k per query — so the shuffle carries O(batches × queries × k)
    candidate rows, never the full score matrix (each global top-k row is
    top-k within its own batch, so the union of local winners is a
    verified superset). A final window re-ranks candidates globally.

    At 100 TB: per-row Python arithmetic (the broadcast-join + pandas-UDF
    fold in cosine_topk_bruteforce) is replaced by tile-level BLAS with
    ~batch×dim×queries flops per call, and the exchange shrinks from
    O(corpus × queries) scored pairs to the candidate set.
    """
    q_rows = queries.select(id_col, vec_col).collect()  # bounded: query set
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    def gemm_batches(batches):
        ids, Q = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            S = Q @ X.T  # (n_queries, n_batch) — one BLAS call
            S[ids[:, None] == cids[None, :]] = -np.inf  # self-exclusion
            kk = min(k, S.shape[1])
            # keep every row scoring >= the kk-th largest per query: ties
            # with the boundary score ALL survive the batch cut, so the
            # global (cos desc, neighbor_id asc) re-rank sees the same
            # candidates bruteforce would — exact even on tied corpora
            thresh = -np.partition(-S, kk - 1, axis=1)[:, kk - 1 : kk]
            qi, ci = np.nonzero(S >= thresh)
            rows_q = ids[qi]
            rows_c = cids[ci]
            rows_s = S[qi, ci]
            keep = np.isfinite(rows_s)
            yield pd.DataFrame(
                {
                    "query_id": rows_q[keep],
                    "neighbor_id": rows_c[keep],
                    "cos": rows_s[keep],
                }
            )

    # fixture parquet is one row group -> repartition for task parallelism
    # (a real multi-file corpus already arrives in many partitions)
    c = corpus.select(id_col, vec_col).repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    )
    cand = c.mapInPandas(gemm_batches, "query_id long, neighbor_id long, cos double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python LCG —
    driver-side constants baked into the plan, no RNG state at runtime)."""
    state = seed & 0x7FFFFFFF or 1
    planes = []
    for _ in range(n_planes):
        vec = []
        for _ in range(dim):
            # Park-Miller minimal standard LCG
            state = (state * 48271) % 2147483647
            u1 = state / 2147483647
            state = (state * 48271) % 2147483647
            u2 = state / 2147483647
            # Box-Muller for gaussian components
            vec.append(math.sqrt(-2 * math.log(u1 + 1e-12)) * math.cos(2 * math.pi * u2))
        planes.append(vec)
    return planes


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    bits_per_table: int = 4,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH + exact re-rank.

    AND-amplification within a table (all bits must match -> small buckets),
    OR-amplification across tables (candidate if bucketed together in ANY
    table). Cosine is computed only within bucket-joined candidate pairs.
    At 100 TB this replaces the |Q| x |corpus| product with
    n_tables x |Q| x E[bucket size]; recall/cost tunes via (bits, tables).
    """
    # (n_tables*bits, dim) plane matrix, closed over by the Arrow-batched
    # signature UDF — one numpy matmul per batch instead of n_tables*bits
    # interpreted array-folds per row.
    plane_matrix = np.array(
        [p for t in range(n_tables) for p in _hyperplanes(dim, bits_per_table, seed + 1000 * t)]
    )
    weights = 1 << np.arange(bits_per_table, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def signatures(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (v @ plane_matrix.T >= 0).reshape(len(v), n_tables, bits_per_table)
        buckets = bits @ weights  # (batch, n_tables)
        return pd.Series(list(buckets))

    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("cv"))
        .repartition(corpus.sparkSession.sparkContext.defaultParallelism)
        .select("neighbor_id", "cv", F.posexplode(signatures(F.col("cv"))).alias("table", "bucket"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("qv")
    ).select("query_id", "qv", F.posexplode(signatures(F.col("qv"))).alias("table", "bucket"))
    candidates = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine_pandas(F.col("qv"), F.col("cv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _seed_centroids(corpus, id_col: str, vec_col: str, n_cells: int, seed: int):
    """Seed-deterministic UNIFORM pick of n_cells corpus vectors as IVF
    cell centroids: bottom-k by xxhash64(id, seed) over the whole corpus.

    Spark compiles orderBy+limit to TakeOrderedAndProject — a per-partition
    size-n_cells heap merged on the driver, one O(n) scan of (id, vec), no
    global sort and no shuffle of the corpus. The r3 version bounded the
    scan with LIMIT n_cells*64 *before* the hash ordering, which made the
    candidate pool "whatever file sorts first" — at 100 TB that skews cell
    balance toward one ingest shard; hashing over the full corpus keeps
    candidates uniform for one cheap extra column-pruned scan at BUILD
    time only (at real scale you'd follow with a few Lloyd rounds on a
    larger sample — the partitioning structure is unchanged).
    """
    sample_rows = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    cent = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample_rows])
    return cent / np.linalg.norm(cent, axis=1, keepdims=True)


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning.

    Coarse quantizer: n_cells centroids chosen as a deterministic seeded
    sample of corpus vectors (k-means init without the iterations — at
    100 TB you'd run a few Lloyd rounds on a sample; the partitioning
    structure is identical). Corpus vectors are assigned to their nearest
    cell (one numpy matmul per Arrow batch); queries probe their n_probe
    nearest cells; exact cosine re-rank inside the probed cells.

    Work: |corpus| assignment + |Q| x (n_probe/n_cells) x |corpus| scoring
    — the same contract as FAISS-style IVF flat.
    """
    spark = corpus.sparkSession
    # uniform seed-deterministic centroid pick (see _seed_centroids)
    cent_unit = _seed_centroids(corpus, id_col, vec_col, n_cells, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def nearest_cells(vecs: pd.Series, n: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        sims = v @ cent_unit.T  # (batch, n_cells)
        n_top = int(n.iloc[0])
        order = np.argsort(-sims, axis=1)[:, :n_top]
        return pd.Series(list(order.astype(np.int64)))

    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("cv"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            "neighbor_id", "cv", F.explode(nearest_cells(F.col("cv"), F.lit(1))).alias("cell")
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("qv")
    ).select("query_id", "qv", F.explode(nearest_cells(F.col("qv"), F.lit(n_probe))).alias("cell"))
    pairs = c.join(F.broadcast(q), "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_pandas(F.col("qv"), F.col("cv")).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def centroids(df: DataFrame, label_col: str, vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid: posexplode + (label, dim) aggregation.

    Shuffle volume = rows x dim scalars with map-side partial sums — the
    scalable alternative to collecting vectors.
    """
    exploded = df.select(
        F.col(label_col).alias("label"), F.posexplode(_as_double_array(vec_col)).alias("dim", "x")
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg("x"), 4).alias("centroid_val")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_scale: int = 6,
) -> DataFrame:
    """All-pairs embedding-cosine near-duplicate detection.

    Output: (id_a, id_b, cos) with id_a < id_b and rounded cosine >=
    threshold. Per-pair scoring is the Arrow-batched numpy cosine (one
    einsum per batch), not an interpreted Catalyst fold.

    Scale note: the pair join is O(n^2/2) — this is the exact correctness
    baseline. At 100 TB the same dot/filter runs *inside* hyperplane-LSH
    buckets (``ann_lsh_topk``'s signature stage turns the cross product
    into a band-bucket equi-join), trading recall for the quadratic blowup.
    The filter is applied to the ROUNDED cosine so the threshold crossing
    is engine-stable.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        _as_double_array(vec_col).alias("_v"),
    )
    left = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    right = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb")).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    pairs = right.join(F.broadcast(left), F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine_pandas(F.col("va"), F.col("vb")), round_scale).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(threshold))
    )


def grouped_cosine_candidates(
    df: DataFrame,
    cluster_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    new_col: str | None = None,
) -> DataFrame:
    """Near-threshold cosine pairs per cluster via BLOCKED GEMM — the pair
    stage of SemDeDup without materializing pair ROWS.

    Returns (id_a, id_b, cos) with id_a < id_b in the same cluster and raw
    cos >= threshold - 1e-6 (a hair below the cut, so the caller's exact
    ``F.round(cos, scale) >= threshold`` filter decides the boundary with
    the SAME Spark HALF_UP semantics as the pair-join path it replaces).
    With ``new_col`` (boolean), only pairs whose HIGHER id is a new row are
    emitted — the incremental (prior ∪ batch) × batch shape.

    Scale shape: the cluster-scoped pair join shuffled O(sum_c |c|^2) pair
    rows, each dragging two dim-width arrays through the exchange — at
    fixture scale already ~200k x 2 x 64 doubles per batch. Here the
    shuffle carries only the O(n) vectors (one groupBy on the cluster id);
    the quadratic term becomes BLAS flops on a per-cluster matrix, blocked
    to a fixed memory budget, and only the qualifying (near-dup) pairs —
    bounded by the dedup rate, not the candidate count — come back out.
    Same |c|-is-the-knob story as semdedup; flops per cluster are
    |c|^2 x dim, which at the SemDeDup paper's |c| ~ 1e4 is ~100ms of
    BLAS per cluster-task."""
    base = df.select(
        F.col(cluster_col).alias("_c"),
        F.col(id_col).cast("long").alias("_id"),
        _as_double_array(vec_col).alias("_v"),
        (F.lit(True) if new_col is None else F.col(new_col)).alias("_new"),
    ).filter(F.col("_v").isNotNull() & F.col("_c").isNotNull())
    thr_eps = float(threshold) - 1e-6

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64, copy=False)
        new = pdf["_new"].to_numpy()[order].astype(bool)
        nrm = np.linalg.norm(V, axis=1)
        nrm[nrm == 0.0] = 1.0
        N = V / nrm[:, None]
        cand = np.nonzero(new)[0]
        n = len(ids)
        # block so the (n x block) score matrix stays ~64 MB
        block = max(1, min(4096, 8_000_000 // max(n, 1)))
        out_a: list = []
        out_b: list = []
        out_c: list = []
        for s in range(0, len(cand), block):
            cols = cand[s : s + block]
            G = N @ N[cols].T
            hit = (G >= thr_eps) & (ids[:, None] < ids[cols][None, :])
            ai, bj = np.nonzero(hit)
            if len(ai):
                out_a.append(ids[ai])
                out_b.append(ids[cols][bj])
                out_c.append(G[ai, bj])
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.array([], dtype="int64"),
                 "id_b": pd.array([], dtype="int64"),
                 "cos": pd.array([], dtype="float64")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a),
             "id_b": np.concatenate(out_b),
             "cos": np.concatenate(out_c)}
        )

    return base.groupBy("_c").applyInPandas(
        emit, "id_a long, id_b long, cos double"
    )


def semdedup(
    df: DataFrame,
    cluster_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_scale: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup with
    the pairwise cosine scoped to coarse clusters.

    A row is dropped when a LOWER-ID member of the same cluster is within
    ``threshold`` cosine (first-wins keep rule — deterministic, no RNG).
    Output: one row per input — (id, cluster, kept).

    Scale shape: cluster-scoped, so total pair work is sum_c |c|^2, not
    n^2 — the cluster granularity is the knob that bounds the quadratic
    term. At 100 TB the cluster column comes from the distributed k-means
    (``operators/clustering.py``) with k chosen so |c| stays ~1e4; here a
    pre-existing categorical column keeps the whole construction under the
    driver's value hash. The pair stage is ``grouped_cosine_candidates``
    (per-cluster blocked GEMM): the shuffle carries O(n) vectors, the
    quadratic term is BLAS flops, and only near-threshold pairs surface.
    The dropped-id set is distinct'd before the final left join, so the
    join is id-to-id, never pair-to-id. Threshold compares the ROUNDED
    cosine (engine-stable; fixture margin to the 0.45 boundary is >= 0.02).
    """
    dropped = (
        grouped_cosine_candidates(
            df, cluster_col, id_col=id_col, vec_col=vec_col, threshold=threshold
        )
        .select("id_b", F.round(F.col("cos"), round_scale).alias("cos"))
        .filter(F.col("cos") >= F.lit(threshold))
        .select(F.col("id_b").alias("_dropped_id"))
        .distinct()
    )
    return (
        df.select(F.col(id_col), F.col(cluster_col))
        .join(dropped, F.col(id_col) == F.col("_dropped_id"), "left")
        .select(
            F.col(id_col),
            F.col(cluster_col),
            F.col("_dropped_id").isNull().alias("kept"),
        )
    )


def quantization_scales(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension symmetric int8 scales: scale_d = max(|x_d|) / 127.

    posexplode + (dim) max-agg — scalar shuffle with map-side combine; the
    result is dim rows (bounded), broadcastable everywhere downstream.
    """
    e = df.select(F.posexplode(_as_double_array(vec_col)).alias("dim", "x"))
    return e.groupBy("dim").agg((F.max(F.abs(F.col("x"))) / F.lit(127.0)).alias("scale"))


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out: str = "q_embedding",
    scales: DataFrame | None = None,
) -> DataFrame:
    """Add an int8-quantized copy of an embedding column.

    q_d = floor(x_d / scale_d + 0.5) clipped to [-127, 127]; the scales
    table (dim rows) is collected once and closed over by an Arrow-batched
    UDF — one numpy op per batch, 4x memory reduction for ANN at rest.
    Store q + scales; dequantize with q_d * scale_d (cosine distortion is
    bounded by the per-dim resolution, see tests/test_similarity.py).
    """
    from pyspark.sql.types import ByteType

    sc = scales if scales is not None else quantization_scales(df, vec_col)
    rows = sc.orderBy("dim").collect()  # dim rows — bounded by vector width
    s = np.array([r["scale"] for r in rows], dtype=np.float64)
    s[s == 0.0] = 1.0  # all-zero dims quantize to 0 regardless

    @F.pandas_udf(ArrayType(ByteType()))
    def _quant(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        q = np.clip(np.floor(v / s + 0.5), -127, 127).astype(np.int8)
        return pd.Series(list(q))

    return df.withColumn(out, _quant(F.col(vec_col)))


def ann_ivf_int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    shortlist: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF over INT8-quantized storage with full-precision re-rank — the
    memory-bound ANN configuration (FAISS IVF+SQ8 contract).

    At 100 TB of embeddings the working set is dominated by vector bytes:
    int8 + per-dim scales cuts scan/shuffle volume 4x. Shortlist scoring
    runs entirely on dequantized int8 (distortion bounded by the per-dim
    resolution — tests/test_similarity.py), and only the ``shortlist``
    candidates per query are joined back to the float32 column for the
    exact final ranking, so full-precision vectors are read for
    O(|Q| x shortlist) rows, not the corpus.
    """
    spark = corpus.sparkSession
    shortlist = shortlist if shortlist is not None else 3 * k

    # int8 storage layer: per-dim scales (dim rows) + quantized vectors
    sc_rows = quantization_scales(corpus, vec_col).orderBy("dim").collect()
    s = np.array([r["scale"] for r in sc_rows], dtype=np.float64)
    s[s == 0.0] = 1.0
    qcorp = quantize_int8(corpus, vec_col, out="qv8").select(
        F.col(id_col).alias("neighbor_id"), "qv8"
    )

    # seeded coarse quantizer (same uniform pick as ann_ivf_topk)
    cent_unit = _seed_centroids(corpus, id_col, vec_col, n_cells, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def cells_int8(vecs: pd.Series, n: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64) * s  # dequantize
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        order = np.argsort(-(v @ cent_unit.T), axis=1)[:, : int(n.iloc[0])]
        return pd.Series(list(order.astype(np.int64)))

    @F.pandas_udf(ArrayType(LongType()))
    def cells_float(vecs: pd.Series, n: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype(np.float64)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        order = np.argsort(-(v @ cent_unit.T), axis=1)[:, : int(n.iloc[0])]
        return pd.Series(list(order.astype(np.int64)))

    @F.pandas_udf(DoubleType())
    def cos_q(qv: pd.Series, q8: pd.Series) -> pd.Series:
        a = np.stack(qv.to_numpy()).astype(np.float64)
        b = np.stack(q8.to_numpy()).astype(np.float64) * s  # dequantize
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(num / den)

    c = qcorp.repartition(spark.sparkContext.defaultParallelism).select(
        "neighbor_id", "qv8", F.explode(cells_int8(F.col("qv8"), F.lit(1))).alias("cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("qv")
    ).select("query_id", "qv", F.explode(cells_float(F.col("qv"), F.lit(n_probe))).alias("cell"))

    # quantized shortlist inside probed cells
    cand = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", cos_q(F.col("qv"), F.col("qv8")).alias("cos8"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w8 = Window.partitionBy("query_id").orderBy(F.desc("cos8"), F.asc("neighbor_id"))
    top8 = cand.withColumn("r8", F.row_number().over(w8)).filter(F.col("r8") <= shortlist)

    # full-precision re-rank of the shortlist only
    fp = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("cv"))
    rer = top8.join(fp, "neighbor_id").select(
        "query_id", "neighbor_id", cosine_pandas(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou, Douze & Schmid, TPAMI 2011) — the memory tier
# of production ANN (IVF-PQ): vectors compress to m sub-codebook ids (here
# 8 bytes per 64-dim vector = 64x smaller), queries score candidates by ADC
# (asymmetric distance computation: one m x k_c lookup table per query, one
# table-lookup sum per candidate — no float vector ever read), and only the
# final top candidates touch true vectors for an exact re-rank.


def pq_train_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k_c: int = 16,
    iters: int = 8,
    seed: int = 42,
    sample: int = 2048,
):
    """Per-subspace k-means codebooks from a BOUNDED training sample
    (driver-side numpy Lloyd iterations on <= `sample` rows — training is
    O(sample x k_c), never O(corpus); the full corpus only runs the cheap
    encode pass). Vectors are unit-normalized first so ADC approximates
    cosine. Deterministic: seeded init, fixed iteration count."""
    import numpy as np

    rows = corpus.select(vec_col).limit(sample).collect()  # bounded: train set
    X = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books = np.zeros((m, k_c, d))
    for s in range(m):
        sub = X[:, s * d : (s + 1) * d]
        rng = np.random.RandomState(seed + s)
        C = sub[rng.choice(len(sub), k_c, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k_c):
                pts = sub[assign == c]
                if len(pts):
                    C[c] = pts.mean(0)
        books[s] = C
    return books


def pq_encode(
    corpus: DataFrame, books, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Encode every corpus vector to m sub-codebook ids (mapInPandas, one
    GEMM per subspace per Arrow batch). Output (id, codes array<int>) —
    the at-rest representation an IVF-PQ index stores instead of floats."""
    import numpy as np

    bc = corpus.sparkSession.sparkContext.broadcast(books)

    def enc(batches):
        B = bc.value
        m, _k_c, d = B.shape
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            codes = np.zeros((len(X), m), dtype=np.int32)
            for s in range(m):
                sub = X[:, s * d : (s + 1) * d]
                # argmin ||sub - C||^2 = argmin (||C||^2 - 2 sub.C)
                d2 = (B[s] ** 2).sum(1)[None, :] - 2.0 * (sub @ B[s].T)
                codes[:, s] = d2.argmin(1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(np.int64),
                    "codes": list(codes),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        enc, f"{id_col} long, codes array<int>"
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    k_c: int = 16,
    seed: int = 42,
    candidates: int | None = None,
    rerank: bool = True,
) -> DataFrame:
    """Approximate top-k cosine via PQ + ADC, with exact re-rank of the
    candidate pool. Same output contract as cosine_topk_bruteforce
    (query_id, neighbor_id, rank). ``candidates`` bounds the per-query
    pool fed to the exact re-rank (default 4k); with ``candidates`` >=
    corpus size the result is EXACTLY brute force (the correctness
    witness — recall loss can only come from the candidate cut).

    100 TB shape: the scan reads 8-byte codes instead of 256-byte float
    vectors; per batch the score is m table lookups + adds per candidate
    (no FLOPs on corpus floats); only O(queries x candidates) rows ever
    touch true vectors.
    """
    import numpy as np

    spark = corpus.sparkSession
    books = pq_train_codebooks(corpus, vec_col, m=m, k_c=k_c, seed=seed)
    codes = pq_encode(corpus, books, id_col, vec_col)

    q_rows = queries.select(id_col, vec_col).collect()  # bounded: query set
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    d = Q.shape[1] // m
    # per-query ADC lookup tables: (n_q, m, k_c) partial dot products
    luts = np.stack([Q[:, s * d : (s + 1) * d] @ books[s].T for s in range(m)], axis=1)
    cand = candidates if candidates is not None else 4 * k
    bc = spark.sparkContext.broadcast((q_ids, luts))

    def score(batches):
        ids_q, L = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            cids = pdf[id_col].to_numpy(np.int64)
            S = np.zeros((len(ids_q), len(C)))
            for s in range(m):
                S += L[:, s, :][:, C[:, s]]
            S[ids_q[:, None] == cids[None, :]] = -np.inf  # self-exclusion
            kk = min(cand, S.shape[1])
            thresh = -np.partition(-S, kk - 1, axis=1)[:, kk - 1 : kk]
            qi, ci = np.nonzero(S >= thresh)
            vals = S[qi, ci]
            keep = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": ids_q[qi][keep],
                    "neighbor_id": cids[ci][keep],
                    "adc": vals[keep],
                }
            )

    c = codes.repartition(spark.sparkContext.defaultParallelism)
    scored = c.mapInPandas(score, "query_id long, neighbor_id long, adc double")
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    pool = (
        scored.withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= cand)
        .select("query_id", "neighbor_id", "adc")
    )
    if not rerank:
        w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
        return (
            pool.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank")
        )
    # exact re-rank: only the candidate pool touches true vectors
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("cv")
    )
    qvecs = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(q_ids, Q)],
        "query_id long, qv array<double>",
    )
    exact = (
        pool.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_pandas(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ann_rptree_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    levels: int = 3,
    dim: int = 64,
    seed: int = 42,
    round_scores: int | None = None,
) -> DataFrame:
    """Approximate top-k via a RANDOM-PROJECTION TREE (the annoy-family
    member of the ANN suite, beside hyperplane LSH and IVF): one seeded
    projection per level, each node split at its own MEDIAN score, so the
    tree is balanced by construction (2^levels leaves of ~|corpus|/2^levels
    vectors each — the guarantee hyperplane buckets don't give). Queries
    descend the same splits and probe BOTH children at the last level
    (the standard spill that rescues boundary-adjacent neighbors), so each
    query exact-re-ranks ~2/2^levels of the corpus.

    Scale shape: the split medians are one tiny table per level (2^l
    rows, broadcast); assignment is a per-row projection (Arrow-batched
    matmul); candidate generation is a leaf equi-join — the |Q| x |corpus|
    product never materializes. Build is levels passes over (id, score,
    node) scalars, not vectors. Recall is tunable via levels/spill;
    rows-only (median boundaries cross libm), recall asserted in
    tests/test_similarity.py."""
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((levels, dim))

    @F.pandas_udf(ArrayType(DoubleType()))
    def scores(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy())
        s = v @ proj.T  # (batch, levels)
        return pd.Series(list(s))

    c = corpus.select(
        F.col(id_col).alias("vid"), _as_double_array(vec_col).alias("cv")
    ).repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    c = c.select("vid", "cv", scores(F.col("cv")).alias("sc")).withColumn(
        "node", F.lit(0).cast("long")
    )
    c = c.persist()
    meds = []
    for lvl in range(levels):
        s_l = F.element_at("sc", lvl + 1)
        med_l = (
            c.groupBy("node")
            .agg(F.expr(f"percentile(element_at(sc, {lvl + 1}), 0.5)").alias("med"))
        )
        meds.append(med_l.persist())
        c = (
            c.join(F.broadcast(med_l), "node")
            .withColumn(
                "node",
                F.col("node") * 2 + (s_l > F.col("med")).cast("long"),
            )
            .drop("med")
            .localCheckpoint(eager=True)
            if lvl < levels - 1
            else c.join(F.broadcast(med_l), "node").withColumn(
                "child_hi", (s_l > F.col("med")).cast("long")
            )
        )
    # corpus leaf: the actual child; queries: probe BOTH last-level children
    corpus_leaf = c.select(
        F.col("vid").alias("neighbor_id"),
        "cv",
        (F.col("node") * 2 + F.col("child_hi")).alias("leaf"),
    )
    qids = queries.select(F.col(id_col).alias("query_id"))
    q_leaf = (
        c.join(F.broadcast(qids), c.vid == qids.query_id)
        .select(
            "query_id",
            F.col("cv").alias("qv"),
            F.explode(
                F.array(F.col("node") * 2, F.col("node") * 2 + 1)
            ).alias("leaf"),
        )
    )
    candidates = (
        corpus_leaf.join(F.broadcast(q_leaf), "leaf")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = cosine_pandas(F.col("qv"), F.col("cv"))
    # round_scores: rank on ROUND(cos, d) instead of the raw float — the
    # round-before-compare rule for hash-checked witnesses, so a numpy-vs-
    # DuckDB last-bit difference on a near-tie can't flip ROW_NUMBER ranks
    # (ties at the rounded scale break on neighbor_id in both engines).
    if round_scores is not None:
        cos = F.round(cos, round_scores)
    scored = candidates.select("query_id", "neighbor_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
