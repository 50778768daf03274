"""Streaming drift monitor: per-batch reports must equal an
INDEPENDENT exact-integer reference (pure-Python counts + bit-length
code lengths) under truncated-checkpoint replay, and the guards fail
loudly (empty reference model, missing meta)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tests.test_streaming_multimodal import _truncate_last_commit

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    )


def _py_reference(ref_texts, batch_rows):
    """Independent integer reference: reference code lengths from raw
    counts via int.bit_length (floor(log2(T//c)) == (T//c).bit_length()
    - 1), batch-local self model the same way, per-lang billing with
    OOV at T.bit_length() escape bits, drift as two floored averages."""
    tok = re.compile(r"[a-z0-9]+")
    rc = Counter(t for txt in ref_texts for t in tok.findall(txt))
    T = sum(rc.values())
    so = {w: (T // c).bit_length() - 1 for w, c in rc.items()}
    esc = T.bit_length()
    bc = Counter(t for _, txt in batch_rows for t in tok.findall(txt))
    Tb = sum(bc.values())
    sb = {w: (Tb // c).bit_length() - 1 for w, c in bc.items()}
    out = {}
    for lang, txt in batch_rows:
        for w in tok.findall(txt):
            n, cr, se, oov = out.get(lang, (0, 0, 0, 0))
            out[lang] = (
                n + 1,
                cr + so.get(w, esc),
                se + sb[w],
                oov + (0 if w in so else 1),
            )
    return {
        lang: (n, cr, se, oov, (1000 * cr) // n - (1000 * se) // n)
        for lang, (n, cr, se, oov) in out.items()
    }


def test_streaming_drift_matches_reference_with_replay(spark, tmp_path):
    from bearysta_spark.streaming.drift import (
        start_streaming_drift_monitor,
        write_codelen_model,
    )

    model, land, rep, ckpt = (
        str(tmp_path / d) for d in ("model", "land", "rep", "ckpt")
    )
    d = _docs(spark)
    ref = d.filter(F.col("doc_id") % 2 == 0)
    write_codelen_model(ref, model)
    ref_texts = [r.text for r in ref.collect()]

    def feed(lo, hi):
        (
            d.filter(
                (F.col("doc_id") % 2 == 1)
                & (F.col("doc_id") >= lo)
                & (F.col("doc_id") < hi)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(land)
        )

    def run():
        stream = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).parquet(land)
        q = start_streaming_drift_monitor(stream, model, rep, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    feed(0, 200)
    run()
    feed(200, 500)
    run()
    _truncate_last_commit(ckpt)  # die between execute and commit
    run()  # replay batch 1 — report partition overwritten, not doubled

    rows = spark.read.parquet(rep).collect()
    by_batch: dict[int, dict] = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, {})[r.lang] = (
            r.n_tokens, r.cross_bits, r.self_bits, r.oov_tokens,
            r.drift_mb,
        )
    assert set(by_batch) == {0, 1}
    for b, (lo, hi) in ((0, (0, 200)), (1, (200, 500))):
        batch_rows = [
            (r.lang, r.text)
            for r in d.filter(
                (F.col("doc_id") % 2 == 1)
                & (F.col("doc_id") >= lo)
                & (F.col("doc_id") < hi)
            ).collect()
        ]
        assert by_batch[b] == _py_reference(ref_texts, batch_rows), b
    # non-vacuous: drift is nonzero somewhere and every lang reported
    assert any(v[4] != 0 for v in by_batch[0].values())
    assert len(by_batch[0]) >= 2


def test_streaming_drift_guards(spark, tmp_path):
    from bearysta_spark.streaming.drift import (
        start_streaming_drift_monitor,
        write_codelen_model,
    )

    # empty reference -> loud build failure
    empty = spark.createDataFrame(
        [(1, "en", "!!! ???")], "doc_id long, lang string, text string"
    )
    with pytest.raises(ValueError, match="EMPTY"):
        write_codelen_model(empty, str(tmp_path / "m0"))

    # missing meta (model dir never built) -> loud per-batch failure
    land = str(tmp_path / "land")
    _docs(spark).limit(5).coalesce(1).write.parquet(land)
    stream = spark.readStream.schema(
        "doc_id long, lang string, text string"
    ).parquet(land)
    q = start_streaming_drift_monitor(
        stream, str(tmp_path / "nomodel"), str(tmp_path / "rep"),
        str(tmp_path / "ckpt"),
    )
    with pytest.raises(Exception, match="code-length model meta"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_streaming_drift_rebuild_picked_up_without_restart(
    spark, tmp_path
):
    """A re-based reference (write_codelen_model over a different
    snapshot) is published by an atomic marker flip: the next
    micro-batch bills under the NEW model — with no crash window and
    no stream restart — and the superseded version dir survives one
    rebuild cycle (deferred reclamation)."""
    import os

    from bearysta_spark.streaming.drift import (
        start_streaming_drift_monitor,
        write_codelen_model,
    )

    model, land, rep, ckpt = (
        str(tmp_path / d) for d in ("model", "land", "rep", "ckpt")
    )
    d = _docs(spark)
    write_codelen_model(d.filter(F.col("doc_id") % 2 == 0), model)

    def feed(lo, hi):
        (
            d.filter(
                (F.col("doc_id") % 2 == 1)
                & (F.col("doc_id") >= lo)
                & (F.col("doc_id") < hi)
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(land)
        )

    def run():
        stream = spark.readStream.schema(
            "doc_id long, lang string, text string"
        ).parquet(land)
        q = start_streaming_drift_monitor(stream, model, rep, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    feed(0, 200)
    run()
    # rebuild from a DIFFERENT reference slice; monitor not restarted
    write_codelen_model(d.filter(F.col("doc_id") % 4 == 0), model)
    assert os.path.isdir(os.path.join(model, "v0"))  # deferred
    assert os.path.isdir(os.path.join(model, "v1"))
    feed(200, 500)
    run()

    rows = {
        (r.batch_id, r.lang): (r.cross_bits, r.oov_tokens)
        for r in spark.read.parquet(rep).collect()
    }
    ref_v1 = [
        r.text for r in d.filter(F.col("doc_id") % 4 == 0).collect()
    ]
    batch1 = [
        (r.lang, r.text)
        for r in d.filter(
            (F.col("doc_id") % 2 == 1)
            & (F.col("doc_id") >= 200)
            & (F.col("doc_id") < 500)
        ).collect()
    ]
    want = _py_reference(ref_v1, batch1)
    got1 = {
        lang: rows[(1, lang)] for (b, lang) in rows if b == 1
    }
    assert got1 == {k: (v[1], v[3]) for k, v in want.items()}
    # a third rebuild reclaims v0
    write_codelen_model(d.filter(F.col("doc_id") % 8 == 0), model)
    assert not os.path.isdir(os.path.join(model, "v0"))
    assert os.path.isdir(os.path.join(model, "v1"))
    assert os.path.isdir(os.path.join(model, "v2"))
