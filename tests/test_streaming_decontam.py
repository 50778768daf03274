"""Streaming decontamination against a persisted eval-gram index:
batch-equivalence with contaminated_docs + truncated-checkpoint replay,
including the fully-contaminated-batch (zero-survivor) edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_streaming_multimodal import _truncate_last_commit

SCHEMA = "doc_id long, text string, source string"

EVAL = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron"
)
CLEAN1 = (
    "rivers bend through green valleys where tall birds wade past "
    "quiet stones each cold dawn"
)
CLEAN2 = (
    "small boats drift past old docks while young kids fish near calm "
    "water at dusk today"
)
# shares the 8-gram "beta gamma delta epsilon zeta eta theta iota"
DIRTY = (
    "intro words then beta gamma delta epsilon zeta eta theta iota "
    "and a tail"
)


def _run_once(spark, land, idx, out, rep, ckpt):
    from bearysta_spark.streaming.decontam import start_streaming_decontam

    stream = spark.readStream.schema(SCHEMA).parquet(land)
    q = start_streaming_decontam(stream, idx, out, rep, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_decontam_matches_batch_and_survives_replay(
    spark, tmp_path
):
    from bearysta_spark.functions.decontam import contaminated_docs
    from bearysta_spark.streaming.decontam import write_eval_gram_index

    land, idx, out, rep, ckpt = (
        str(tmp_path / d) for d in ("land", "idx", "out", "rep", "ckpt")
    )
    ev = spark.createDataFrame([(900, EVAL, "eval")], SCHEMA)
    write_eval_gram_index(ev, idx, n=8)

    b0 = [(0, CLEAN1, "s0"), (1, DIRTY, "s0")]
    b1 = [(10, DIRTY + " again", "s1")]  # fully contaminated batch
    b2 = [(20, CLEAN2, "s2"), (21, DIRTY, "s2")]
    for rows in (b0,):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(land)
    _run_once(spark, land, idx, out, rep, ckpt)
    _truncate_last_commit(ckpt)  # die between execute and commit
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    # replays batch 0, then processes the ZERO-SURVIVOR batch 1 (the
    # empty write must not wedge later re-reads)
    _run_once(spark, land, idx, out, rep, ckpt)
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    _run_once(spark, land, idx, out, rep, ckpt)

    sch = SCHEMA + ", batch_id int"
    surv = spark.read.schema(sch).parquet(out)
    assert sorted(r.doc_id for r in surv.collect()) == [0, 20]

    # batch-equivalence: the surviving set equals the batch operator's
    # complement over the full corpus
    full = spark.createDataFrame(b0 + b1 + b2, SCHEMA)
    dirty = contaminated_docs(full, ev, n=8)
    want = sorted(
        r.doc_id
        for r in full.join(
            dirty.select("doc_id"), "doc_id", "left_anti"
        ).collect()
    )
    assert sorted(r.doc_id for r in surv.collect()) == want

    # per-batch reports: replay produced no duplicates; counts exact
    repd = {
        r.batch_id: (r.n_docs_in, r.n_docs_contaminated, r.n_docs_out)
        for r in spark.read.parquet(rep).collect()
    }
    assert repd == {0: (2, 1, 1), 1: (1, 1, 0), 2: (2, 1, 1)}
    assert (
        spark.read.parquet(rep)
        .groupBy("batch_id").count().filter("count > 1").count()
        == 0
    )


def test_rebuilt_index_picked_up_without_restart(spark, tmp_path):
    """The index is re-read from files each micro-batch: growing the
    eval suite between batches changes the NEXT batch's verdicts with
    no stream restart."""
    from bearysta_spark.streaming.decontam import write_eval_gram_index

    land, idx, out, rep, ckpt = (
        str(tmp_path / d) for d in ("land", "idx", "out", "rep", "ckpt")
    )
    ev1 = spark.createDataFrame([(900, EVAL, "eval")], SCHEMA)
    write_eval_gram_index(ev1, idx, n=8)
    spark.createDataFrame([(0, CLEAN1, "s0")], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    _run_once(spark, land, idx, out, rep, ckpt)
    # CLEAN1 survives batch 0; now the eval suite grows to include it
    ev2 = spark.createDataFrame(
        [(900, EVAL, "eval"), (901, CLEAN1, "eval")], SCHEMA
    )
    write_eval_gram_index(ev2, idx, n=8)
    spark.createDataFrame(
        [(10, CLEAN1, "s1"), (11, CLEAN2, "s1")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(land)
    _run_once(spark, land, idx, out, rep, ckpt)
    surv = spark.read.schema(SCHEMA + ", batch_id int").parquet(out)
    assert sorted(r.doc_id for r in surv.collect()) == [0, 11]


def test_empty_eval_index_raises_at_build_and_cannot_wedge(spark, tmp_path):
    """r08 VERDICT #2: an eval suite whose docs are all shorter than n
    words used to write a _SUCCESS-only index that wedged every
    micro-batch in an UNABLE_TO_INFER_SCHEMA crash loop. Now the build
    raises loudly (an empty decontamination index filters nothing),
    and even against a directory that ends up empty anyway the stream
    reads it with an explicit schema: it survives and drops nothing."""
    import pytest

    from bearysta_spark.streaming.decontam import write_eval_gram_index

    land, idx, out, rep, ckpt = (
        str(tmp_path / d) for d in ("land", "idx", "out", "rep", "ckpt")
    )
    ev = spark.createDataFrame(
        [(900, "only five words right here", "eval")], SCHEMA
    )
    with pytest.raises(ValueError, match="EMPTY"):
        write_eval_gram_index(ev, idx, n=8)

    # the raise left an empty directory behind — a stream pointed at it
    # (operator ignored the error, or a concurrent rebuild) must NOT
    # crash-loop: explicit schema reads zero grams, nothing is dropped
    rows = [(0, CLEAN1, "s0"), (1, DIRTY, "s0")]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    _run_once(spark, land, idx, out, rep, ckpt)
    surv = spark.read.parquet(out)
    assert sorted(r.doc_id for r in surv.collect()) == [0, 1]
    r = spark.read.parquet(rep).collect()[0]
    assert (r.n_docs_in, r.n_docs_contaminated, r.n_docs_out) == (2, 0, 2)


# --- exact-substring arm (r12): short verbatim snippet, ZERO 8-grams ---

SNIP = "the stolen benchmark answer is forty two"  # 7 words, 41 chars
SCLEAN1 = CLEAN1
SCLEAN2 = CLEAN2
SDIRTY = (
    "a long training document where " + SNIP + " appears in the middle "
    "of otherwise unrelated prose"
)


def _run_sub(spark, land, idx, out, rep, ckpt, window=16, stride=4):
    from bearysta_spark.streaming.decontam import (
        start_streaming_substring_decontam,
    )

    stream = spark.readStream.schema(SCHEMA).parquet(land)
    q = start_streaming_substring_decontam(
        stream, idx, out, rep, ckpt, window=window, stride=stride
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_substring_decontam_batch_equal_and_guards(
    spark, tmp_path
):
    """The exact-substring streaming arm: batch-equivalence with
    substring_anchor_hits across truncated-checkpoint replay and a
    zero-survivor batch; an eval suite REBUILT mid-stream is picked up
    on the next micro-batch; a suite rebuilt at a DIFFERENT window
    width refuses to serve (the silently-matches-nothing failure); an
    interrupted index rebuild (pending marker, no layout) refuses."""
    import pytest as _pytest

    from bearysta_spark.functions.decontam import substring_anchor_hits
    from bearysta_spark.streaming.decontam import (
        load_eval_anchor_index,
        write_eval_anchor_index,
    )

    land, idx, out, rep, ckpt = (
        str(tmp_path / d) for d in ("land", "idx", "out", "rep", "ckpt")
    )
    ev = spark.createDataFrame([(900, SNIP, "eval")], SCHEMA).select(
        F.col("doc_id").alias("eval_id"), "text", "source"
    )
    write_eval_anchor_index(ev, idx, window=16)

    b0 = [(0, SCLEAN1, "s0"), (1, SDIRTY, "s0")]
    b1 = [(10, SDIRTY + " again", "s1")]   # fully contaminated batch
    b2 = [(20, SCLEAN2, "s2"), (21, SDIRTY, "s2")]
    spark.createDataFrame(b0, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    _run_sub(spark, land, idx, out, rep, ckpt)
    _truncate_last_commit(ckpt)  # die between execute and commit
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    _run_sub(spark, land, idx, out, rep, ckpt)  # replay 0, then zero-surv 1
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    _run_sub(spark, land, idx, out, rep, ckpt)

    sch = SCHEMA + ", batch_id int"
    surv = spark.read.schema(sch).parquet(out)
    assert sorted(r.doc_id for r in surv.collect()) == [0, 20]

    # batch-equivalence: survivors = complement of the anchor-hit docs
    full = spark.createDataFrame(b0 + b1 + b2, SCHEMA)
    hits = substring_anchor_hits(full, ev, window=16, stride=4)
    want = sorted(
        r.doc_id
        for r in full.join(
            hits.select("doc_id").distinct(), "doc_id", "left_anti"
        ).collect()
    )
    assert sorted(r.doc_id for r in surv.collect()) == want
    repd = {
        r.batch_id: (r.n_docs_in, r.n_docs_contaminated, r.n_docs_out)
        for r in spark.read.parquet(rep).collect()
    }
    assert repd == {0: (2, 1, 1), 1: (1, 1, 0), 2: (2, 1, 1)}

    # rebuild pickup: re-version the suite to ALSO leak CLEAN2's text —
    # next micro-batch drops a doc the old suite admitted
    ev2 = spark.createDataFrame(
        [(900, SNIP, "e"), (901, SCLEAN2[10:45], "e")], SCHEMA
    ).select(F.col("doc_id").alias("eval_id"), "text", "source")
    write_eval_anchor_index(ev2, idx, window=16)
    spark.createDataFrame([(30, SCLEAN2, "s3")], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(land)
    _run_sub(spark, land, idx, out, rep, ckpt)
    surv2 = spark.read.schema(sch).parquet(out)
    assert sorted(r.doc_id for r in surv2.collect()) == [0, 20]  # 30 dropped

    # window guard: suite rebuilt at a different width refuses to serve
    write_eval_anchor_index(ev, idx, window=20)
    spark.createDataFrame([(40, SCLEAN1, "s4")], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(land)
    with _pytest.raises(Exception, match="window|layout"):
        _run_sub(spark, land, idx, out, rep, str(tmp_path / "ckpt2"))

    # interrupted rebuild: pending marker without layout refuses
    import os

    from bearysta_spark.streaming.index import LAYOUT, mark_pending_write

    idx2 = str(tmp_path / "idx2")
    write_eval_anchor_index(ev, idx2, window=16)
    os.unlink(os.path.join(idx2, LAYOUT))
    mark_pending_write(spark, idx2, {"window": 16})
    with _pytest.raises(ValueError, match="pending-write"):
        load_eval_anchor_index(spark, idx2, 16)

    # missing layout with NO pending marker ALSO refuses — anchor
    # indexes have no pre-layout legacy format, so a bare tree is
    # corruption, not a legacy artifact (r12 ADVICE #1)
    from bearysta_spark.streaming.index import _pending_parts

    os.unlink(os.path.join(*_pending_parts(idx2)))
    with _pytest.raises(ValueError, match="no _layout"):
        load_eval_anchor_index(spark, idx2, 16)

    # string-keyed eval suite refuses at build time instead of
    # silently persisting eval_id NULL (r12 ADVICE #2)
    with _pytest.raises(ValueError, match="cast to long"):
        write_eval_anchor_index(
            spark.createDataFrame(
                [("doc-a", SNIP, "e")], "eval_id string, text string, source string"
            ),
            str(tmp_path / "idx4"),
            window=16,
        )

    # empty suite refuses at build time
    with _pytest.raises(ValueError, match="EMPTY"):
        write_eval_anchor_index(
            spark.createDataFrame([(902, "tiny", "e")], SCHEMA).select(
                F.col("doc_id").alias("eval_id"), "text", "source"
            ),
            str(tmp_path / "idx3"),
            window=16,
        )
