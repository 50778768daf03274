#!/usr/bin/env python
"""r11 watch-key adjudication (r11 VERDICT ask #5): image_phash_pairs
(2.38 -> 3.70 across r10 -> r11 driver windows) and embedding_near_dup
(1.28 -> 1.71) — both UNTOUCHED code. The churn-adjudication protocol
from BASELINE.md r11: interleaved same-session repeats, min + per-rep
spread, so window drift and a real constant are distinguishable. The
code is identical r10 = r11 = r12, so any systematic delta vs the r10
minima would indicate an environment constant, not a plan regression;
tight same-session spreads at ~r10 levels clear the flags as drift.

Run ALONE (concurrent Spark inflates minima). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ["image_phash_pairs", "embedding_near_dup"]
REPS = 6


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bearysta_spark import get_spark
    from bearysta_spark.queries import QUERIES

    spark = get_spark(
        "watch_ab_r12", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm: JVM + codegen on an unrelated query
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    samples: dict[str, list[float]] = {k: [] for k in KEYS}
    for _ in range(REPS):          # interleaved: drift bursts spread
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
