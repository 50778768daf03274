#!/usr/bin/env python
"""Per-batch probe-cost ladder for the streaming curation ingest (r07
VERDICT finding #1's done-criterion): feed N micro-batches of FRESH
documents through start_streaming_curation_ingest, time every batch,
and report whether per-batch cost stays flat-ish as the self-growing
index accumulates history.

What flat-ish means here: each batch is the same size, so with the
Bloom-gated, kb-pruned probe the per-batch wall time should NOT grow
with batch count — the sidecar the batch actually reads is tiny and
the index anti-join only runs for Bloom-positive suspects (≈ none in
a fresh-document stream). The old distinct()-over-the-index probe
grew twice as fast as the index itself. We report the mean of the
first third vs the last third of batches plus a least-squares slope.

Usage: python scripts/probe_ladder.py [--batches 24] [--rows 2000]
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
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--rows", type=int, default=2000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bearysta_spark import get_spark
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_ingest,
    )

    spark = get_spark(
        "probe_ladder", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="probe_ladder_")
    land, idx, out, cnt, ckpt = (
        os.path.join(work, d) for d in ("land", "idx", "out", "cnt", "ckpt")
    )

    def fresh_batch(b: int):
        # every doc unique and gate-passing: 20 distinct medium-length
        # words derived from the id — the probe sees 100% novel keys,
        # the production-typical case the Bloom gate is built for
        return (
            spark.range(b * args.rows, (b + 1) * args.rows)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit(f"w{i}x"),
                            (F.col("id") * (i + 3) % 99991).cast("string"),
                        )
                        for i in range(20)
                    ],
                ).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("src").alias("source"),
            )
        )

    times = []
    for b in range(args.batches):
        fresh_batch(b).coalesce(2).write.mode("append").parquet(land)
        stream = spark.readStream.schema(
            "doc_id long, text string, lang string, source string"
        ).parquet(land)
        q = start_streaming_curation_ingest(stream, idx, out, cnt, ckpt)
        t0 = time.perf_counter()
        q.processAllAvailable()
        q.stop()
        times.append(round(time.perf_counter() - t0, 3))

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
                "metric": "curation_probe_per_batch_sec",
                "batches": args.batches,
                "rows_per_batch": args.rows,
                "times": times,
                "head_mean": round(head, 3),
                "tail_mean": round(tail, 3),
                "tail_over_head": round(tail / head, 3),
                "slope_sec_per_batch": round(slope, 4),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
