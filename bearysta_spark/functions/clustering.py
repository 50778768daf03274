"""Iterative k-means over embedding columns — the trained coarse
quantizer for IVF similarity search (functions.similarity.ivf_topk).

Lloyd's algorithm as pure DataFrame ops per iteration:
  assign: nearest centroid per vector (literal-folded centroid arrays —
          a scan-side map, no shuffle)
  update: mean per (cluster, dim) via posexplode + one hash-agg shuffle
The driver loop holds only the k×d centroid matrix (tiny); data never
leaves executors. At 100 TB each iteration is one scan + one shuffle of
k·d partial sums — the canonical scalable k-means shape. Convergence on
centroid movement is checked driver-side per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bearysta_spark.functions.similarity import nearest_cells


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iters: int = 10,
    vec_col: str = "embedding",
    tol: float = 1e-4,
    seed: int = 42,
) -> list[list[float]]:
    """Train k centroids; returns the centroid matrix (k × d) ready to
    pass to similarity.ivf_topk. Deterministic: seeded init from
    normalized Gaussian vectors, fixed iteration order."""
    import numpy as np

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dim = len(first[0])

    rng = np.random.default_rng(seed)
    centroids = rng.standard_normal((k, dim))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    for _ in range(max_iters):
        assigned = df.select(
            F.col(vec_col),
            nearest_cells(F.col(vec_col), centroids.tolist(), 1)[0].alias("cell"),
        )
        # DECIMAL accumulation: the update means are then independent of
        # partition count / combine order — the same centroids come out
        # of a 2-executor run and a 2000-executor run (and a DuckDB
        # oracle can reproduce the iteration bit-for-bit)
        sums = (
            assigned.select("cell", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(
                F.sum(F.col("v").cast("decimal(25,10)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new_centroids = centroids.copy()
        acc = {}
        for r in sums:
            acc.setdefault(r["cell"], {})[r["dim"]] = (r["s"], r["n"])
        for cell, dims in acc.items():
            vec = np.array([float(dims[d][0]) / dims[d][1] for d in sorted(dims)])
            new_centroids[cell] = vec
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift < tol:
            break
    return centroids.tolist()


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach the nearest-centroid cluster id."""
    return df.withColumn(
        "cluster", nearest_cells(F.col(vec_col), centroids, 1)[0].cast("int")
    )
