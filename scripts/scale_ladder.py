#!/usr/bin/env python
"""Scale-factor ladder: measure how the heaviest queries scale from
sf0.1 to a synthetic 10x corpus (~sf1.0), converting SCALING.md's 100 TB
arguments into per-query measured ratios (BASELINE.md records them).

Why synthetic scaling needs care: naively unioning N copies of the
corpus makes every document an exact/near duplicate of its N-1 replicas,
so LSH candidate volume grows ~N^2 per original pair-group — a
DEGENERATE corpus, not a bigger one. Instead each replica k gets:

- documents: a deterministic letter-rotation cipher (rot-k over a-z/A-Z
  via translate) — pure JVM, preserves text length, word boundaries,
  Zipf shape, and the planted duplicate structure WITHIN a replica,
  while making shingle/token sets across replicas disjoint. Replica 0
  is the untouched original.
- embeddings: a per-replica deterministic +-1 sign pattern per dimension
  (zip_with multiply) — preserves norms and within-replica geometry,
  decorrelates across replicas (expected cross-replica cosine ~ 0).
- lineitem: key offset only (q1 is the scan-agg control; its values
  aggregate identically, 10x the rows).

Ids are offset by k * 10_000_000 so joins/self-pairs never collide
across replicas.

Usage:
  python scripts/scale_ladder.py [--mult 10] [--src /root/testdata/sf0.1]
      [--work /tmp/bearysta_scale] [--queries name,name,...]

Prints one JSON line per query: base seconds, scaled seconds, ratio,
and ratio/mult (1.0 = perfectly linear scaling).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

OFFSET = 10_000_000
LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()

# the 8 heaviest bench queries (BENCH_r04) + the scan-agg control
DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "near_dup_pairs",
    "jaccard_band_histogram",
    "prefix_jaccard_pairs",
    "dedup_method_agreement",
    "embedding_dup_clusters",
    "simhash_pairs",
    "ann_lsh_recall",
    "cross_doc_repeated_spans",
]


def rot(s: str, k: int) -> str:
    k %= 26
    return s[k:] + s[:k]


def sign_pattern(k: int, dim: int) -> list[float]:
    # deterministic, replica-dependent, roughly balanced
    return [1.0 if ((i * 2654435761 + k * 40503) >> 3) % 2 == 0 else -1.0
            for i in range(dim)]


def materialize(spark, src: str, work: str, mult: int) -> str:
    out = os.path.join(work, f"x{mult}")
    marker = os.path.join(out, "_LADDER_DONE")
    if os.path.exists(marker):
        print(f"# reusing {out}", file=sys.stderr)
        return out
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    doc_parts = []
    for k in range(mult):
        part = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * OFFSET))
        if k:
            part = part.withColumn(
                "text", F.translate("text", LOWER + UPPER, rot(LOWER, k) + rot(UPPER, k))
            )
        doc_parts.append(part)
    base = doc_parts[0]
    for p in doc_parts[1:]:
        base = base.unionByName(p)
    base.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    emb_parts = []
    for k in range(mult):
        part = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * OFFSET))
        if k:
            pat = F.lit(sign_pattern(k, dim))
            part = part.withColumn(
                "embedding",
                F.zip_with("embedding", pat, lambda x, s: (x * s).cast("float")),
            )
        emb_parts.append(part)
    e = emb_parts[0]
    for p in emb_parts[1:]:
        e = e.unionByName(p)
    e.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    li = spark.read.parquet(f"{src}/lineitem.parquet")
    parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * OFFSET))
        for k in range(mult)
    ]
    l = parts[0]
    for p in parts[1:]:
        l = l.unionByName(p)
    l.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    # events: id/user offsets per replica — per-user event structure
    # (funnel order, sessions, distinct counts) is preserved within each
    # replica and user spaces are disjoint across replicas
    from bearysta_spark.tables import load_events

    ev = load_events(spark, src)
    eparts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * OFFSET))
        .withColumn("user_id", F.col("user_id") + F.lit(k * OFFSET))
        for k in range(mult)
    ]
    ee = eparts[0]
    for p in eparts[1:]:
        ee = ee.unionByName(p)
    ee.write.mode("overwrite").parquet(f"{out}/events.parquet")

    open(marker, "w").write("ok")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/bearysta_scale")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()

    from bearysta_spark import get_spark
    from bearysta_spark.queries import QUERIES

    spark = get_spark("scale_ladder", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = materialize(spark, args.src, args.work, args.mult)

    names = [n for n in args.queries.split(",") if n]
    results = {}
    for name in names:
        fn = QUERIES[name]

        def run(sf_dir: str) -> float:
            # trained-model memos (e.g. queries._CLF_TRAIN_MEMO) make a
            # repeat run measure serving only — correct for the bench's
            # steady-state story, WRONG here: the ladder's question is
            # how the TOTAL cost (training included — training scales
            # with the corpus) moves with scale, so every sample pays cold
            from bearysta_spark import queries as _Q

            _Q._CLF_TRAIN_MEMO.clear()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            spark.catalog.clearCache()
            return sec

        base = min(run(args.src), run(args.src))
        scaled = run(scaled_dir)
        ratio = scaled / base if base else float("inf")
        results[name] = {
            "base_sec": round(base, 2),
            "scaled_sec": round(scaled, 2),
            "ratio": round(ratio, 2),
            "per_mult": round(ratio / args.mult, 2),
        }
        print(json.dumps({"query": name, **results[name]}), flush=True)

    print(json.dumps({"mult": args.mult, "results": results}))


if __name__ == "__main__":
    main()
