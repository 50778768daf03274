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
    init: list[list[float]] | None = None,
) -> list[list[float]]:
    """Train k centroids; returns the centroid matrix (k × d) ready to
    pass to similarity.ivf_topk. Deterministic: seeded init from
    normalized Gaussian vectors, fixed iteration order. Pass `init`
    to start from explicit centroids instead (e.g. the seeded IMI
    half-space books, so a trained coarse quantizer shares provenance
    with its untrained form); k is then taken from it."""
    import numpy as np

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dim = len(first[0])

    if init is not None:
        centroids = np.asarray(init, dtype=np.float64)
        if centroids.shape[1] != dim:
            raise ValueError(
                f"kmeans_fit: init dim {centroids.shape[1]} != data dim {dim}"
            )
        k = len(centroids)
    else:
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


def pq_codebooks_fit(
    df: DataFrame,
    codebooks0: list[list[list[float]]],
    max_iters: int = 2,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ sub-codebooks with per-subspace L2 k-means — FAISS
    ProductQuantizer::train, distributed: all m subspaces train JOINTLY
    in one frame (subspace index j is just another grouping key), so an
    iteration is ONE scan + ONE hash-agg shuffle of m·ksub·dsub partial
    sums regardless of m. Assignment is the L2 argmin in expanded form
    (argmax of <sub, c> − ||c||²/2; the sub² term is per-row constant)
    computed with LITERAL expression folds — sequential, IEEE-identical
    to DuckDB's list_dot_product, so the trained books replay
    bit-for-bit in an unrolled-SQL oracle (the kmeans_fit discipline).
    Updates are DECIMAL-exact means (partition-order-independent);
    empty (j, cell) pairs keep their previous centroid. Ties take the
    LOWEST cell id (struct-max over (score, −cell) — matches
    _residual_l2_codes' np.argmax-first and the oracle's ORDER BY
    score DESC, cell ASC). `codebooks0` is the seeded init
    (make_pq_codebooks), so trained and untrained geometry share one
    provenance. Driver state: the m×ksub×dsub codebook tensor — KB."""
    books = [[list(map(float, c)) for c in book] for book in codebooks0]
    m = len(books)
    ksub = len(books[0])
    dsub = len(books[0][0])

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pq_codebooks_fit: empty input")
    if len(first[0]) != m * dsub:
        # a mismatched width silently yields part-stale, part-garbage
        # books (short slices null-pad the fold, empty subs emit no
        # update rows) — the kmeans_fit init-dim guard, applied here
        raise ValueError(
            f"pq_codebooks_fit: vector dim {len(first[0])} != "
            f"m*dsub = {m}*{dsub} of codebooks0"
        )

    from bearysta_spark.functions.similarity import dot

    for _ in range(max_iters):
        entries = []
        for j in range(m):
            sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
            pairs = F.array(
                *[
                    F.struct(
                        (
                            dot(sub, F.array(*[F.lit(x) for x in c]))
                            - F.lit(
                                0.5 * sum(x * x for x in c)
                            )
                        ).alias("score"),
                        F.lit(-cid).alias("negcell"),
                    )
                    for cid, c in enumerate(books[j])
                ]
            )
            entries.append(
                F.struct(
                    F.lit(j).alias("j"),
                    (-F.array_max(pairs)["negcell"]).alias("cell"),
                    sub.alias("sub"),
                )
            )
        sums = (
            df.select(F.explode(F.array(*entries)).alias("e"))
            .select("e.j", "e.cell", F.posexplode("e.sub").alias("dim", "v"))
            .groupBy("j", "cell", "dim")
            .agg(
                F.sum(F.col("v").cast("decimal(25,10)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        acc: dict = {}
        for r in sums:
            acc.setdefault((r["j"], r["cell"]), {})[r["dim"]] = (
                r["s"],
                r["n"],
            )
        for (j, cell), dims in acc.items():
            books[j][cell] = [
                float(dims[d][0]) / dims[d][1] for d in sorted(dims)
            ]
    return books
