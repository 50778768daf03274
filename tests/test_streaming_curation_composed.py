"""Composed streaming curation pipeline (gates → exact dedup → LSH
near-dup removal): twin-equality with pretrain_funnel_report's stages
1-4, chaos-tested across replay and compaction (r07 VERDICT ask #4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_streaming_curation import A, B, C, SHORT
from tests.test_streaming_index import D
from tests.test_streaming_multimodal import _truncate_last_commit

SCHEMA = "doc_id long, text string, lang string, source string"

# near-dup variants: one-word edits keep char-5-shingle Jaccard high
A2 = A.replace("warm sun", "warm moon")
D2 = D.replace("dusk today", "dusk yesterday")
# another independent gate-passer + its within-batch near-dup
E = (
    "green trees line the wide road as birds sing soft songs over the "
    "still pond at noon"
)
E2 = E.replace("at noon", "at dark")

B0 = [(0, A, "en", "s0"), (1, SHORT, "en", "s0"), (2, C, "en", "s0")]
B1 = [(10, A, "en", "s1"), (11, A2, "en", "s1"), (12, D, "en", "s1")]
B2 = [
    (20, D2, "en", "s2"),   # cross-batch near-dup of 12
    (21, B, "es", "s2"),    # lang gate
    (22, C, "en", "s2"),    # cross-batch exact dup of 2
    (23, E, "en", "s2"),    # survivor
    (24, E2, "en", "s2"),   # within-batch near-dup of 23
]
ALL = B0 + B1 + B2


def _feed(spark, land, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)


def _run_once(spark, land, index, lsh, out, counters, ckpt):
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )

    stream = spark.readStream.schema(SCHEMA).parquet(land)
    q = start_streaming_curation_pipeline(
        stream, index, lsh, out, counters, ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _batch_twin(spark):
    """pretrain_funnel_report's stages 1-4 on the same corpus, via the
    same shared components (mirrors queries.py:pretrain_funnel_report
    line for line)."""
    from bearysta_spark.functions.dedup import minhash_dedup_verified
    from bearysta_spark.functions.text import curation_gate_flags

    full = spark.createDataFrame(ALL, SCHEMA)
    flags = curation_gate_flags(full, keep=("source",))
    s1 = flags.filter("lang_ok")
    s2 = s1.filter("q_ok")
    keeper = s2.groupBy("norm_key").agg(F.min("doc_id").alias("k"))
    s3a = s2.join(keeper, "norm_key").filter(F.col("doc_id") == F.col("k"))
    vpairs = minhash_dedup_verified(
        full, num_hashes=12, bands=3, threshold=0.5
    ).select("id_a", "id_b")
    ndrem = (
        vpairs.join(s3a.select(F.col("doc_id").alias("id_a")), "id_a")
        .join(s3a.select(F.col("doc_id").alias("id_b")), "id_b")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    s3 = s3a.join(ndrem, "doc_id", "left_anti")
    return flags, s1, s2, s3a, s3


def _stream_state(spark, out):
    rows = spark.read.parquet(out).collect()
    exact = sorted(r.doc_id for r in rows)
    kept = sorted(r.doc_id for r in rows if r.near_ok)
    return exact, kept


def test_composed_pipeline_equals_batch_funnel_with_replay(spark, tmp_path):
    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    _feed(spark, p["land"], B0)
    _run_once(spark, p["land"], p["idx"], p["lsh"], p["out"], p["cnt"],
              p["ckpt"])
    _feed(spark, p["land"], B1)
    _run_once(spark, p["land"], p["idx"], p["lsh"], p["out"], p["cnt"],
              p["ckpt"])
    _truncate_last_commit(p["ckpt"])  # die between execute and commit
    _feed(spark, p["land"], B2)
    # replays batch 1 (sinks overwritten, not duplicated), then batch 2
    _run_once(spark, p["land"], p["idx"], p["lsh"], p["out"], p["cnt"],
              p["ckpt"])

    flags, s1, s2, s3a, s3 = _batch_twin(spark)
    exact, kept = _stream_state(spark, p["out"])
    assert exact == sorted(r.doc_id for r in s3a.collect())
    assert kept == sorted(r.doc_id for r in s3.collect())
    # the scenario exercises every arm: a cross-batch near-dup (20), a
    # within-batch near-dup (24), and a near-dup of a surviving doc (11)
    assert kept == [0, 2, 12, 23]

    # per-stage totals across batches == the batch funnel's stages 1-4
    cnt = spark.read.parquet(p["cnt"])
    totals = {
        r.stage: (r.docs, r.toks)
        for r in cnt.groupBy("stage")
        .agg(F.sum("n_docs").alias("docs"), F.sum("n_tokens").alias("toks"))
        .collect()
    }
    for stage, frame in ((1, flags), (2, s1), (3, s2), (4, s3)):
        row = frame.agg(
            F.count("*").cast("long"),
            F.coalesce(F.sum("tc"), F.lit(0)).cast("long"),
        ).collect()[0]
        assert totals[stage] == (row[0], row[1]), f"stage {stage}"
    # replay left no duplicate counter rows
    assert (
        cnt.groupBy("batch_id", "stage").count().filter("count > 1").count()
        == 0
    )


def test_composed_pipeline_survives_compaction_boundary(spark, tmp_path):
    """Compact BOTH self-growing indexes (norm-key + LSH buckets) after
    the first committed batches; later batches must still exact-dedup
    AND near-dup against the folded history — the LSH rows' `origin`
    data column keeps the out-store text fetch correct after the
    partition batch_id folds into a tier."""
    from bearysta_spark.streaming.curation import compact_pipeline_indexes
    from bearysta_spark.streaming.index import read_marker

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    _feed(spark, p["land"], B0)
    _run_once(spark, p["land"], p["idx"], p["lsh"], p["out"], p["cnt"],
              p["ckpt"])
    _feed(spark, p["land"], B1)
    _run_once(spark, p["land"], p["idx"], p["lsh"], p["out"], p["cnt"],
              p["ckpt"])
    # batches 0 and 1 are committed: fold all three stores in one call
    compact_pipeline_indexes(spark, p["idx"], p["lsh"], upto_batch=2)
    assert read_marker(p["lsh"]) == {"tier": -2, "upto": 2}
    _feed(spark, p["land"], B2)
    _run_once(spark, p["land"], p["idx"], p["lsh"], p["out"], p["cnt"],
              p["ckpt"])

    _, _, _, s3a, s3 = _batch_twin(spark)
    exact, kept = _stream_state(spark, p["out"])
    assert exact == sorted(r.doc_id for r in s3a.collect())
    assert kept == sorted(r.doc_id for r in s3.collect()) == [0, 2, 12, 23]
