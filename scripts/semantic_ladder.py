#!/usr/bin/env python
"""Per-batch cost ladder for the STREAMING semantic-dedup arm (r09
VERDICT finding #1's done-criterion): feed N fixed-size micro-batches
of synthetic embeddings that all land in ONE cell — the worst case for
the per-cell kernel — time every batch, and report whether per-batch
wall time tracks the BATCH while the cell's index grows N×.

What the fix changed: the old kernel computed the FULL square
(index+batch)² similarity matrix every micro-batch, so per-batch FLOPs
grew quadratically with cell population (stream lifetime) and total
stream work was cubic. The rectangular kernel computes
(index+batch) × batch-new columns only — per-batch dgemm FLOPs are
linear in the index (and stay under the per-batch fixed cost at ladder
scale), so the ladder should be ~flat where the square form grew
visibly.

Usage: python scripts/semantic_ladder.py [--batches 20] [--rows 400]
       [--dim 64] [--compact-every N]
Prints one JSON line; runs on local[$SPARK_GRAFT_CPUS or 8].
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--rows", type=int, default=400)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--compact-every", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bearysta_spark import get_spark
    from bearysta_spark.streaming.neardup import (
        start_streaming_semantic_dedup,
    )

    spark = get_spark(
        "semantic_ladder", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="semantic_ladder_")
    land, idx, out, ckpt = (
        os.path.join(work, d) for d in ("land", "idx", "out", "ckpt")
    )
    # ONE centroid: every vector lands in cell 0, so the whole index is
    # one cell and the kernel sees the full population every batch —
    # the degenerate-cell worst case the rectangular form is sized for
    cents = [[1.0] + [0.0] * (args.dim - 1)]

    def fresh_batch(b: int):
        # deterministic pseudo-random unit-ish vectors (hash-based, no
        # RNG): pairwise cosines concentrate near 0 at d=64, so almost
        # nothing is dropped and the index grows by the full batch
        vec = F.expr(
            f"transform(sequence(1, {args.dim}), i -> "
            "CAST(pmod(xxhash64(id, i), 1000) / 1000.0 - 0.5 AS FLOAT))"
        )
        return (
            spark.range(b * args.rows, (b + 1) * args.rows)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        )

    times = []
    for b in range(args.batches):
        fresh_batch(b).coalesce(2).write.mode("append").parquet(land)
        stream = spark.readStream.schema(
            f"vec_id long, embedding array<float>"
        ).parquet(land)
        q = start_streaming_semantic_dedup(
            stream, cents, idx, out, ckpt,
            threshold=0.9, compact_every=args.compact_every,
        )
        t0 = time.perf_counter()
        q.processAllAvailable()
        q.stop()
        times.append(round(time.perf_counter() - t0, 3))

    # vacuity guards: every fed vector must be in the index (the cell
    # really grew N×) and flagged in the out store
    from bearysta_spark.streaming.index import read_index_view

    expect = args.batches * args.rows
    view = read_index_view(spark, idx, before_batch=None)
    n_indexed = view.count() if view is not None else 0
    n_flagged = spark.read.parquet(out).count()
    assert n_indexed == expect, (n_indexed, expect)
    assert n_flagged == expect, (n_flagged, expect)

    third = max(1, args.batches // 3)
    head = sum(times[:third]) / third
    tail = sum(times[-third:]) / third
    n = len(times)
    xbar, ybar = (n - 1) / 2, sum(times) / n
    slope = sum((i - xbar) * (t - ybar) for i, t in enumerate(times)) / sum(
        (i - xbar) ** 2 for i in range(n)
    )
    print(
        json.dumps(
            {
                "metric": "streaming_semantic_per_batch_sec",
                "batches": args.batches,
                "rows_per_batch": args.rows,
                "dim": args.dim,
                "index_growth": args.batches,
                "n_indexed": n_indexed,
                "times": times,
                "head_mean": round(head, 3),
                "tail_mean": round(tail, 3),
                "tail_over_head": round(tail / head, 3),
                "slope_sec_per_batch": round(slope, 4),
                "compact_every": args.compact_every,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
