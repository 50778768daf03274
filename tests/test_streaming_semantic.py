"""Streaming SemDeDup (the 5th near-dup signal, r08 VERDICT ask #4):
batch-equivalence with functions.similarity.semantic_dedup under the
ascending-id contract, chaos-tested across truncated-checkpoint replay
and a compaction boundary, plus the centroid layout guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_streaming_multimodal import _truncate_last_commit

SF = "/root/testdata/sf0.001"


def _centroids(spark, k=4):
    rows = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    import numpy as np

    m = np.array([r.embedding for r in rows], dtype=np.float64)
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return (m / n).tolist()


def _run_once(spark, land, cents, idx, out, ckpt, threshold=0.3):
    from bearysta_spark.streaming.neardup import (
        start_streaming_semantic_dedup,
    )

    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(land)
    q = start_streaming_semantic_dedup(
        stream, cents, idx, out, ckpt, threshold=threshold
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _feed(spark, land, lo, hi):
    (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        .select("vec_id", "embedding")
        .coalesce(1)
        .write.mode("append")
        .parquet(land)
    )


def _batch_reference(spark, cents, hi, threshold=0.3):
    from bearysta_spark.functions.similarity import semantic_dedup

    e = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("vec_id") < hi)
        .select("vec_id", "embedding")
    )
    return {
        (r.vec_id): (r.cell, r.keep)
        for r in semantic_dedup(e, cents, threshold=threshold).collect()
    }


def test_streaming_semantic_matches_batch_with_replay_and_compaction(
    spark, tmp_path
):
    from bearysta_spark.streaming.index import compact_index, read_marker

    land, idx, out, ckpt = (
        str(tmp_path / d) for d in ("land", "idx", "out", "ckpt")
    )
    cents = _centroids(spark)
    # three ascending-id batches
    _feed(spark, land, 0, 150)
    _run_once(spark, land, cents, idx, out, ckpt)
    _feed(spark, land, 150, 300)
    _run_once(spark, land, cents, idx, out, ckpt)
    _truncate_last_commit(ckpt)  # die between execute and commit
    # replay batch 1, then fold batches 0-1 and stream batch 2 against
    # the compacted tier
    _run_once(spark, land, cents, idx, out, ckpt)
    compact_index(spark, idx, 2, partition_cols=("batch_id", "cell"))
    assert read_marker(idx) == {"tier": -2, "upto": 2}
    _feed(spark, land, 300, 500)
    _run_once(spark, land, cents, idx, out, ckpt)

    got = {
        r.vec_id: (r.cell, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    want = _batch_reference(spark, cents, 500)
    assert len(got) == 500  # replay overwrote, never duplicated
    assert got == want
    # non-vacuous: the threshold actually drops something at sf0.001
    assert any(not keep for _, keep in got.values())
    assert any(keep for _, keep in got.values())


def test_streaming_semantic_centroid_layout_guard(spark, tmp_path):
    land, idx, out, ckpt = (
        str(tmp_path / d) for d in ("land", "idx", "out", "ckpt")
    )
    cents = _centroids(spark)
    _feed(spark, land, 0, 100)
    _run_once(spark, land, cents, idx, out, ckpt)
    # restart over the same index with a DIFFERENT quantizer: cells
    # would silently diverge — must raise instead
    _feed(spark, land, 100, 200)
    other = _centroids(spark, k=5)
    with pytest.raises(Exception, match="layout mismatch"):
        _run_once(spark, land, other, idx, out, ckpt)


def test_streaming_semantic_auto_compaction(spark, tmp_path):
    """compact_every=2: the arm folds its own index from inside the
    loop; batch 2 probes the auto-folded tier and results still equal
    batch SemDeDup."""
    from bearysta_spark.streaming.neardup import (
        start_streaming_semantic_dedup,
    )
    from bearysta_spark.streaming.index import read_marker

    land, idx, out, ckpt = (
        str(tmp_path / d) for d in ("land", "idx", "out", "ckpt")
    )
    cents = _centroids(spark)

    def run():
        stream = spark.readStream.schema(
            "vec_id long, embedding array<float>"
        ).parquet(land)
        q = start_streaming_semantic_dedup(
            stream, cents, idx, out, ckpt, compact_every=2
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    for lo, hi in ((0, 150), (150, 300), (300, 500)):
        _feed(spark, land, lo, hi)
        run()
    m = read_marker(idx)
    assert m is not None and m["upto"] == 2
    got = {
        r.vec_id: (r.cell, r.keep)
        for r in spark.read.parquet(out).collect()
    }
    assert got == _batch_reference(spark, cents, 500)
