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
