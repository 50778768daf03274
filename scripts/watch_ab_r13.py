#!/usr/bin/env python
"""r12 watch-key adjudication (r12 VERDICT ask #4): media_ingest_dedup
(mingst) swung 2.8 -> 2.4 -> 3.7 s across r10 -> r11 -> r12 driver
windows with ZERO code change to functions/multimodal.py or the query
(verified by the judge via git diff 06ab623..HEAD). The churn
protocol from BASELINE.md r11: interleaved same-session repeats with a
code-identical control key, min + per-rep spread — window drift shows
as a uniform shift shared with the control; a real constant shows as a
systematic mingst-only delta vs its r10/r11 level.

Run ALONE (concurrent Spark inflates minima). Prints one JSON line;
record the adjudication in BENCH_AB_r13 notes / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# image_phash_pairs: the sibling multimodal key, adjudicated-as-drift in
# r12 (watch_ab_r12) — same decoder codepaths, known-good same-session
# level ~2.3-2.4 s. q9_product_profit: plain TPC-H control.
KEYS = ["media_ingest_dedup", "image_phash_pairs", "q9_product_profit"]
REPS = 6


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bearysta_spark import get_spark
    from bearysta_spark.queries import QUERIES

    spark = get_spark(
        "watch_ab_r13", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    samples: dict[str, list[float]] = {k: [] for k in KEYS}
    for _ in range(REPS):
        for k in KEYS:
            t0 = time.perf_counter()
            QUERIES[k](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples[k].append(round(time.perf_counter() - t0, 2))
            spark.catalog.clearCache()
    out = {
        k: {
            "samples": v,
            "min": min(v),
            "median": sorted(v)[len(v) // 2],
        }
        for k, v in samples.items()
    }
    print(json.dumps({"keys": out, "reps": REPS, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
