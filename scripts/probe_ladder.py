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
    ap.add_argument(
        "--compact-every", type=int, default=None,
        help="auto-compaction cadence passed to the ingest loop; the "
        "ladder then also reports end-state partition/sidecar sizes, "
        "which stay bounded instead of growing one dir per batch",
    )
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
        # every doc unique AND gate-passing at any --rows: 16 four-char
        # words sliced from two md5 digests of the id (16 tokens >= 15;
        # mean word length exactly 4.0, inside the [3.0, 4.8] gate; hex
        # chars are [a-z0-9]; md5 uniqueness means NO cross-doc
        # duplicates ever — the probe sees 100% novel keys, the
        # production-typical case the Bloom gate is built for)
        h1 = F.md5(F.col("id").cast("string"))
        h2 = F.md5(F.concat(F.col("id").cast("string"), F.lit("b")))
        words = [F.substring(h1, 1 + 4 * i, 4) for i in range(8)] + [
            F.substring(h2, 1 + 4 * i, 4) for i in range(8)
        ]
        return (
            spark.range(b * args.rows, (b + 1) * args.rows)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", *words).alias("text"),
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
        q = start_streaming_curation_ingest(
            stream, idx, out, cnt, ckpt,
            compact_every=args.compact_every,
        )
        t0 = time.perf_counter()
        q.processAllAvailable()
        q.stop()
        times.append(round(time.perf_counter() - t0, 3))

    # the measurement is void if the gates rejected the stream: assert
    # the index really grew to ~one key per fed document (marker-aware
    # view: a raw directory count would double-count partitions a
    # compaction folded but has not yet reclaimed)
    from bearysta_spark.streaming.index import read_index_view

    view = read_index_view(spark, idx, before_batch=None)
    n_indexed = view.count() if view is not None else 0
    expect = args.batches * args.rows
    assert n_indexed > 0.95 * expect, (
        f"probe ladder vacuous: {n_indexed} keys indexed for {expect} "
        "fed documents — the synthetic docs are failing the gates"
    )

    def batch_dirs(root):
        return sum(
            1 for d in os.listdir(root) if d.startswith("batch_id=")
        )

    # batch_dirs stays a RAW directory count on purpose: listing cost
    # includes superseded partitions until the next fold reclaims them.
    # The sidecar ROW count is marker-aware, though — a raw read would
    # double-count folded-but-unreclaimed rows (the n_indexed lesson).
    idx_dirs, bloom_dirs = batch_dirs(idx), batch_dirs(idx + "_bloom")
    bview = read_index_view(spark, idx + "_bloom", before_batch=None)
    sidecar_rows = bview.count() if bview is not None else 0

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
                "n_indexed": n_indexed,
                "times": times,
                "head_mean": round(head, 3),
                "tail_mean": round(tail, 3),
                "tail_over_head": round(tail / head, 3),
                "slope_sec_per_batch": round(slope, 4),
                "compact_every": args.compact_every,
                "index_partition_dirs": idx_dirs,
                "bloom_partition_dirs": bloom_dirs,
                "bloom_sidecar_rows": sidecar_rows,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
