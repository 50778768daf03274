#!/usr/bin/env python
"""Per-query profiling harness (r13 optimization round, guide section 1).

For each named query: run it end-to-end with the noop sink (the bench
timing method), record wall seconds, Spark job count and stage count
(statusTracker via a per-query job group), and optionally dump
`.explain("formatted")` to plans/r13/<name>_<tag>.txt.

Usage:
  python scripts/profile_queries.py [--explain TAG] [--reps N] name...
  (no names = the default heavy-query list)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    "imi_pq_opq_recall",
    "imi_pq_residual_recall_clustered",
    "imi_pq_residual_recall",
    "quality_classifier_bigram_train_curve",
    "pretrain_funnel_report",
    "dedup_banding_curve",
    "tokenizer_fertility_agreement",
    "imi_pq_operating_curve",
    "knn_imi_pq_refined_streamed",
    "sparse_knn_recall",
    "multimodal_dedup_agreement",
    "corpus_churn_persisted",
    "image_phash_increment_persisted",
    "knn_imi_pq_streamed",
    "dedup_method_agreement",
    "bpe_train_merges",
    "bpe_trained_compression",
    "jaccard_band_histogram",
    "prefix_jaccard_pairs",
    "corpus_churn_report",
    "near_dup_pairs",
    "quality_classifier_persisted_filter",
    "quality_classifier_train_curve",
    "audio_landmark_recall",
    "sketch_method_agreement",
    "imi_pq_refine_recall",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--explain", default=None, help="dump plans with this tag")
    ap.add_argument("--plans-dir", default="plans/r13", help="where --explain dumps go")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--json", default=None, help="write results JSON here")
    args = ap.parse_args()
    names = args.names or HEAVY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bearysta_spark import get_spark
    from bearysta_spark.queries import QUERIES

    spark = get_spark("profile_queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same warmup as bench.py
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    warm_sf = "/root/testdata/sf0.01"
    for warm_q in (
        "minhash_lsh_candidates",
        "simhash_pairs",
        "recipe_pipeline",
        "contamination_4gram",
        "repetition_filter",
    ):
        if warm_q in QUERIES:
            QUERIES[warm_q](spark, warm_sf).write.mode("overwrite").format(
                "noop"
            ).save()

    out = {}
    for name in names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        best = None
        njobs = nstages = 0
        for rep in range(args.reps):
            group = f"prof_{name}_{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            el = time.perf_counter() - t0
            sc.setJobGroup("", "")
            spark.catalog.clearCache()
            tracker = sc.statusTracker()
            jids = tracker.getJobIdsForGroup(group)
            if rep == 0 or (best is not None and el < best):
                njobs = len(jids)
                nstages = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in jids
                    if tracker.getJobInfo(j) is not None
                )
            best = el if best is None else min(best, el)
        out[name] = {
            "sec": round(best, 3),
            "jobs": njobs,
            "stages": nstages,
        }
        print(
            f"{name:42s} {best:7.2f}s  jobs={njobs:<4d} stages={nstages}",
            flush=True,
        )
        if args.explain:
            os.makedirs(args.plans_dir, exist_ok=True)
            try:
                plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    QUERIES[name](spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            with open(f"{args.plans_dir}/{name}_{args.explain}.txt", "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
    total = sum(v["sec"] for v in out.values())
    print(f"TOTAL {total:.1f}s over {len(out)} queries")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
