#!/usr/bin/env python
"""Churn-audit ladder: the STANDING CORPUS grows N× while the daily
increment stays FIXED — the axis a crawl pipeline actually lives on
(the corpus compounds every day; the increment does not). Measures the
persisted-index churn audit (churn_classify with corpus_buckets from
write_lsh_index, the corpus_churn_persisted shape) at each rung.

Near-flat audit cost is the claim under test: with the r11 doc-grain
prune, the only corpus-proportional terms left in the audit are cheap
scans (the band-bucket index file scan, the exact arm's 16-byte md5
digest pass, the participant semi-join's column scan); the verify
EXPLODE — the term the r10 verdict flagged — is bounded by candidate
participants, which are increment-bounded. The index BUILD is timed
separately: it is the once-per-corpus-build cost, not the daily one.

Corpus replicas use the scale_ladder rot-cipher (letter rotation per
replica k): text length, word boundaries, and within-replica duplicate
structure are preserved while shingle sets across replicas are
disjoint — so the candidate set stays pinned to replica 0 and a 10×
corpus is genuinely bigger, not degenerately self-duplicated.

Usage:
  python scripts/churn_ladder.py [--src /root/testdata/sf0.01]
      [--mults 1,4,10] [--work /tmp/bearysta_churn_ladder] [--reps 3]

Prints one JSON object: per-rung build/audit seconds and the
audit ratio at the top rung vs rung 1.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F

# shared with the general scale ladder so the two rot-cipher
# replications cannot drift (review finding: a future fix — e.g. to
# digit handling, digits being rot-invariant — must land once)
from scale_ladder import LOWER, OFFSET, UPPER, rot  # noqa: E402


def replicate(d: DataFrame, mult: int) -> DataFrame:
    parts = []
    for k in range(mult):
        parts.append(
            d.select(
                (F.col("doc_id") + F.lit(k * OFFSET)).alias("doc_id"),
                F.translate(
                    "text", LOWER + UPPER, rot(LOWER, k) + rot(UPPER, k)
                ).alias("text"),
            )
        )
    return functools.reduce(DataFrame.unionByName, parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--mults", default="1,4,10")
    ap.add_argument("--work", default="/tmp/bearysta_churn_ladder")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    from bearysta_spark.session import get_spark
    from bearysta_spark.functions.dedup import (
        churn_classify,
        load_lsh_index,
        write_lsh_index,
    )
    from bearysta_spark.cachescope import cache_scope

    spark = get_spark("churn_ladder")
    d = spark.read.parquet(os.path.join(args.src, "documents.parquet"))
    inc_src = d.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    corp_src = d.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    os.makedirs(args.work, exist_ok=True)
    inc_path = os.path.join(args.work, "increment")
    inc_src.write.mode("overwrite").parquet(inc_path)
    inc = spark.read.parquet(inc_path)
    n_inc = inc.count()

    rungs = []
    for mult in mults:
        cdir = os.path.join(args.work, f"corpus_x{mult}")
        replicate(corp_src, mult).write.mode("overwrite").parquet(cdir)
        corpus = spark.read.parquet(cdir)
        n_corp = corpus.count()
        idx_path = os.path.join(args.work, f"lsh_index_x{mult}")
        t0 = time.perf_counter()
        write_lsh_index(corpus, idx_path, num_hashes=12, bands=3)
        build_sec = round(time.perf_counter() - t0, 3)
        idx = load_lsh_index(spark, idx_path, num_hashes=12, bands=3)
        audits = []
        row = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            with cache_scope():
                row = churn_classify(
                    corpus, inc, corpus_buckets=idx
                ).collect()[0]
            audits.append(round(time.perf_counter() - t0, 3))
        # vacuity guards: the corpus really grew, and the audit still
        # finds the planted cross-boundary near-dups at every rung
        # (replica-0 candidates; rot replicas must not add or remove
        # any). n_near_dup must be NONZERO — a flat-audit result on a
        # corpus where the verify explode never fires would measure
        # nothing (the documented-vacuous discipline).
        assert row.n_corpus == n_corp and row.n_increment == n_inc
        assert row.n_near_dup > 0, (
            "no cross-boundary near-dups at this --src: the "
            "verify-shingle path is unexercised, ladder result vacuous"
        )
        if rungs:
            assert row.n_near_dup == rungs[0]["n_near_dup"], (
                row.n_near_dup, rungs[0]["n_near_dup"])
        rungs.append(
            {
                "mult": mult,
                "n_corpus": n_corp,
                "n_increment": n_inc,
                "n_near_dup": row.n_near_dup,
                "n_fresh": row.n_fresh,
                "build_sec": build_sec,
                "audit_secs": audits,
                "audit_min_sec": min(audits),
            }
        )
        print(f"# x{mult}: build {build_sec}s audit {audits}", file=sys.stderr)

    base = rungs[0]["audit_min_sec"]
    top = rungs[-1]
    print(
        json.dumps(
            {
                "metric": "churn_audit_sec_vs_corpus_mult",
                "src": args.src,
                "form": "corpus_churn_persisted (persisted write_lsh_index)",
                "rungs": rungs,
                "audit_ratio_top": round(top["audit_min_sec"] / base, 3),
                "corpus_mult_top": top["mult"],
                "audit_ratio_over_mult": round(
                    top["audit_min_sec"] / base / top["mult"], 3
                ),
            }
        )
    )
    shutil.rmtree(args.work, ignore_errors=True)


if __name__ == "__main__":
    main()
