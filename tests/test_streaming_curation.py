"""Streaming curation ingest (gates + self-growing exact dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_streaming_multimodal import _truncate_last_commit

A = (
    "the quick brown fox jumps over one lazy dog while the cat naps "
    "under warm sun"
)  # 16 tokens, mean word len ~3.9, no duplicate 2-gram: passes every gate
B = (
    "rivers bend through green valleys where tall birds wade past "
    "quiet stones each cold dawn"
)
C = (
    "old cars roll down long dusty roads while kids wave from tall "
    "gates near the old barn"
)
SHORT = "too short words here now"  # fails the >= 15 token gate
REPET = " ".join(["batch"] * 20)  # fails the dup-2gram (and length) gate


def _run_once(spark, land, index, out, counters, ckpt):
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_ingest,
    )

    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string"
    ).parquet(land)
    q = start_streaming_curation_ingest(stream, index, out, counters, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_curation_gates_dedup_counters_and_replay(spark, tmp_path):
    land = str(tmp_path / "land")
    index = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    counters = str(tmp_path / "cnt")
    ckpt = str(tmp_path / "ckpt")

    b0 = [
        (0, A, "en", "s0"),      # survivor
        (1, A, "en", "s0"),      # within-batch exact dup of 0
        (2, SHORT, "en", "s0"),  # fails quality
        (3, B, "es", "s0"),      # fails lang
    ]
    b1 = [
        (10, A, "en", "s1"),     # cross-batch exact dup of 0
        (11, C, "en", "s1"),     # survivor
        (12, REPET, "en", "s1"), # fails quality (repetition)
    ]
    schema = "doc_id long, text string, lang string, source string"
    spark.createDataFrame(b0, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    _run_once(spark, land, index, out, counters, ckpt)
    _truncate_last_commit(ckpt)  # die between execute and commit
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    # replays batch 0 (its sinks are overwritten, not duplicated), then
    # processes batch 1 against the index batch 0 already wrote
    _run_once(spark, land, index, out, counters, ckpt)

    surv = spark.read.parquet(out)
    assert sorted(r.doc_id for r in surv.collect()) == [0, 11]
    # the streaming result == the batch twin: gates + keep-min-id dedup
    # over the full corpus (ids ascend across batches by construction)
    from bearysta_spark.functions.text import curation_gate_flags

    full = spark.createDataFrame(b0 + b1, schema)
    fl = curation_gate_flags(full, keep=("source",))
    gated = fl.filter(F.col("lang_ok") & F.col("q_ok"))
    keeper = gated.groupBy("norm_key").agg(F.min("doc_id").alias("k"))
    twin = sorted(
        r.k for r in keeper.join(gated, "norm_key").select("k").distinct()
        .collect()
    )
    assert sorted(r.doc_id for r in surv.collect()) == twin

    cnt = {
        (r.batch_id, r.name): (r.n_docs, r.n_tokens)
        for r in spark.read.parquet(counters).collect()
    }
    # batch 0: 4 in, 'es' dropped at lang, SHORT dropped at quality,
    # the within-batch dup dropped at dedup
    assert cnt[(0, "input")][0] == 4
    assert cnt[(0, "lang")][0] == 3
    assert cnt[(0, "quality")][0] == 2
    assert cnt[(0, "dedup")][0] == 1
    # batch 1: 3 in, all en, REPET dropped at quality, the cross-batch
    # dup dropped at dedup
    assert cnt[(1, "input")][0] == 3
    assert cnt[(1, "lang")][0] == 3
    assert cnt[(1, "quality")][0] == 2
    assert cnt[(1, "dedup")][0] == 1
    # token accounting: the surviving batch-0 doc is A (16 tokens)
    assert cnt[(0, "dedup")][1] == 16
    # replay produced no duplicate counter rows
    assert (
        spark.read.parquet(counters)
        .groupBy("batch_id", "stage")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )
    # the index holds exactly the survivors' keys, one partition each
    idx = spark.read.parquet(index)
    assert idx.count() == 2
    assert sorted(r.batch_id for r in idx.collect()) == [0, 1]
