"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The canonical distributed iterative algorithm, expressed Spark-first:

- **assignment** (the data-sized work) is an Arrow-batched pandas UDF —
  one ``argmin ||x - c||^2`` matmul per batch against the broadcast
  centroid matrix; embarrassingly parallel over partitions.
- **update** shuffles only ``k x dim`` partial sums: posexplode to
  (cluster, dim, value), partial-aggregated map-side, merged into k*dim
  rows. At 100 TB the shuffle payload stays k*dim*partitions — kilobytes.
- **driver** holds exactly the k x dim centroid matrix between
  iterations (collected each round and rebroadcast in the next plan) —
  never data-proportional.

Determinism (the engine's contract): seeded hash-min init (the k rows
with the smallest md5(id) — engine-portable, no RNG state), and all
float reductions go through ROUND -> DECIMAL sums so partition/summation
order cannot perturb centroids across runs. Euclidean-squared distances
are computed in float64 against identical centroid bytes on every
executor, so assignments are reproducible run-to-run.

No SQL oracle: the iteration is genuinely non-SQL-expressible (the
driver records a rows-only check); invariants are property-tested
instead (tests/test_clustering.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

# Per-dim rounding applied before the DECIMAL partial sums. 7 decimals is
# far below fixture noise but makes the sum independent of partition order.
_DIM_SCALE = 7
_DIST_SCALE = 6


def _init_centroids(df: DataFrame, id_col: str, vec_col: str, k: int) -> np.ndarray:
    """Deterministic seed centroids: the k rows with the smallest md5(id).

    A hash-min sample is a uniform-ish draw every engine/run reproduces —
    the same device sample_hashmin_per_group uses. TakeOrderedAndProject:
    no full sort, k rows to the driver.
    """
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(k)
        .collect()
    )
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def _assign_udf(centroids: np.ndarray):
    c = centroids  # captured; shipped once per task via the serialized plan

    @F.pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over clusters.
        d = (
            (x * x).sum(axis=1, keepdims=True)
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
) -> tuple[np.ndarray, DataFrame]:
    """Run ``n_iter`` Lloyd iterations; return (centroids, assigned_df).

    assigned_df has (id_col, vec_col, cluster) with the final assignment.
    """
    data = df.select(
        F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v")
    )
    # Fixture parquet is a single row group -> one task; the assignment UDF
    # is the CPU-heavy stage, so spread it (no-op on well-partitioned input).
    data = data.repartition(df.sparkSession.sparkContext.defaultParallelism).cache()
    centroids = _init_centroids(data, id_col, "v", k)
    dim = centroids.shape[1]
    for _ in range(n_iter):
        assigned = data.withColumn("cluster", _assign_udf(centroids)(F.col("v")))
        # Update step: k*dim decimal partial sums, order-independent.
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.round(F.col("val"), _DIM_SCALE).cast("decimal(28,10)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_c = centroids.copy()  # empty clusters keep their previous center
        acc = np.zeros((k, dim), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in sums:
            acc[r["cluster"], r["dim"]] = float(r["s"])
            cnt[r["cluster"]] = r["n"]
        nonempty = cnt > 0
        new_c[nonempty] = acc[nonempty] / cnt[nonempty, None]
        centroids = new_c
    assigned = data.withColumn("cluster", _assign_udf(centroids)(F.col("v"))).select(
        F.col(id_col), F.col("v").alias(vec_col), "cluster"
    )
    return centroids, assigned


def kmeans_cluster_profile(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
) -> DataFrame:
    """Cluster sizes + within-cluster inertia after ``n_iter`` iterations.

    Output: (cluster, n_points, inertia) — inertia is the sum of
    per-point squared distances, each rounded before a DECIMAL sum so the
    total is summation-order-independent (deterministic run to run).
    """
    centroids, assigned = kmeans_fit(df, id_col, vec_col, k, n_iter)
    c = centroids

    @F.pandas_udf("double")
    def dist2(vecs: pd.Series, cluster: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        cc = c[cluster.to_numpy()]
        d = x - cc
        return pd.Series(np.einsum("ij,ij->i", d, d))

    return (
        assigned.withColumn("d2", dist2(F.col(vec_col), F.col("cluster")))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (
                F.sum(F.round(F.col("d2"), _DIST_SCALE).cast("decimal(28,8)"))
                .cast("double")
            ).alias("inertia"),
        )
        .select(F.col("cluster").cast("int").alias("cluster"), "n_points", F.round("inertia", 4).alias("inertia"))
    )
