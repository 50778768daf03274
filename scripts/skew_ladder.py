#!/usr/bin/env python
"""Skew ladder for operators.skew.salted_join (r11 VERDICT ask #6):
measure plain vs salted equi-join on a ZIPFIAN-HOT key — one whale key
holding ~30% of all fact rows — at base and 10× scale, with AQE's
skew-join mitigation ON (the house session default) and OFF (the
engines/paths salted_join exists for: broadcast-ineligible dims where
runtime skew-split is unavailable, e.g. a pre-aggregation on the hot
key or a non-AQE engine).

Construction (deterministic, no Date/rand): the events fact table's
user_id is remapped so xxhash64(event_id) % 10 < 3 → one hot key; the
dim side is the per-user segment table (distinct user_id), with
autoBroadcastJoinThreshold=-1 during the measurement because at 100 TB
the dim side of this shape does NOT broadcast — that is precisely when
key skew decides the join's wall clock.

Prints one JSON line per (scale, aqe_skew, variant) cell plus a final
summary line for SCALE_LADDER_r12.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

HOT_KEY = 777_777_777


def skewed_fact(spark, sf_dir: str):
    from bearysta_spark.tables import load_events

    e = load_events(spark, sf_dir).select("event_id", "user_id", "value")
    return e.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("event_id"), F.lit(10)) < 3, F.lit(HOT_KEY)
        ).otherwise(F.col("user_id")),
    )


def run_cell(spark, fact, dim, salted: bool, salt: int):
    from bearysta_spark.operators.skew import salted_join

    t0 = time.perf_counter()
    if salted:
        joined = salted_join(fact, dim, ["user_id"], salt=salt)
    else:
        joined = fact.join(dim, "user_id")
    out = joined.groupBy("segment").agg(
        F.count("*").alias("n"), F.sum("value").alias("v")
    )
    rows = out.collect()
    sec = time.perf_counter() - t0
    # the SCALE-VALID witness (wall clock is flat at test scale — a
    # 300k-row hot task is milliseconds on 32 cores; at 100 TB it is
    # the critical path): the share of join-output rows landing in the
    # LARGEST join task. Plain join concentrates the whale key in one
    # task (~hot share); salting bounds it near 1/salt of the hot share
    # plus an even background. Measured post-AQE, so the aqe_skew=on
    # rows show what runtime splitting achieves WITHOUT salting.
    dist = [
        r["n"]
        for r in joined.withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    share = max(dist) / sum(dist)
    spark.catalog.clearCache()
    return sec, sum(r["n"] for r in rows), round(share, 4), len(dist)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/bearysta_scale")
    ap.add_argument("--salt", type=int, default=16)
    args = ap.parse_args()

    from scripts.scale_ladder import materialize

    from bearysta_spark import get_spark

    spark = get_spark(
        "skew_ladder", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = materialize(spark, args.src, args.work, args.mult)

    # the shape under test: shuffle join (dim must not broadcast at
    # 100 TB) — pin it off so base and 10× run the same physical plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # test-scale fidelity knobs: (a) AQE partition COALESCING merges
    # everything at MB scale and hides the key-skew layout entirely
    # (measured: whole join collapses to 1 task) — at 100 TB a hot
    # partition is never coalesced away, so fix the partition count;
    # (b) AQE skew-join only splits partitions past byte thresholds
    # (256 MB default) that MB-scale data never reaches — lower them so
    # the aqe_skew=on cells exercise the SPLIT DECISION the way a
    # 100 TB run would, instead of silently never triggering
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
    )

    results: dict = {}
    for label, sf_dir in (("base", args.src), (f"{args.mult}x", scaled_dir)):
        fact = skewed_fact(spark, sf_dir)
        dim = (
            fact.select("user_id").distinct()
            .withColumn("segment", F.pmod("user_id", F.lit(5)))
        )
        for aqe_skew in (True, False):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower()
            )
            for variant in ("plain", "salted"):
                # min over 2 runs (the ladder protocol)
                s1, n1, sh1, np1 = run_cell(
                    spark, fact, dim, variant == "salted", args.salt
                )
                s2, n2, sh2, np2 = run_cell(
                    spark, fact, dim, variant == "salted", args.salt
                )
                assert n1 == n2, "row-count drift between repeats"
                key = f"{label}/aqe_skew={'on' if aqe_skew else 'off'}/{variant}"
                results[key] = {
                    "sec": round(min(s1, s2), 2),
                    "rows": n1,
                    "max_task_share": max(sh1, sh2),
                    "n_tasks": np1,
                }
                print(json.dumps({"cell": key, **results[key]}), flush=True)
    # equality audit (r12 review finding: previously claimed, never
    # performed): salted and plain must agree on the joined row count
    # in every (scale, aqe) cell — salting is a physical transform
    for label in ("base", f"{args.mult}x"):
        for aqe in ("on", "off"):
            a = results[f"{label}/aqe_skew={aqe}/plain"]["rows"]
            b = results[f"{label}/aqe_skew={aqe}/salted"]["rows"]
            assert a == b, f"salted != plain rows at {label}/{aqe}: {a} vs {b}"
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(json.dumps({"mult": args.mult, "salt": args.salt, "results": results}))


if __name__ == "__main__":
    main()
