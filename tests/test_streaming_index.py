"""Self-growing streaming-index layout: Bloom sidecar exactness, probe
plan shape, replay-safe compaction, and the zero-survivor wedge fix."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests.test_streaming_curation import A, B, C, SHORT, _run_once
from tests.test_streaming_multimodal import _truncate_last_commit

SCHEMA = "doc_id long, text string, lang string, source string"
# 16 tokens, mean word length in-band, no duplicate 2-gram: passes
# every gate (B does NOT — its mean word length exceeds 4.8)
D = (
    "small boats drift past old docks while young kids fish near calm "
    "water at dusk today"
)


def _feed(spark, land, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)


def _paths(tmp_path):
    return {
        k: str(tmp_path / k) for k in ("land", "idx", "out", "cnt", "ckpt")
    }


def test_zero_survivor_first_batch_does_not_wedge(spark, tmp_path):
    """r07 ADVICE #1: a first micro-batch with zero survivors leaves
    out_path/index_root holding only _SUCCESS; the re-reads must use
    explicit schemas or every replay crash-loops on
    UNABLE_TO_INFER_SCHEMA."""
    p = _paths(tmp_path)
    _feed(spark, p["land"], [(0, SHORT, "en", "s0"), (1, B, "es", "s0")])
    _run_once(spark, p["land"], p["idx"], p["out"], p["cnt"], p["ckpt"])
    # batch 0 survived the empty write; counters recorded zero docs
    cnt = {
        (r.batch_id, r.name): r.n_docs
        for r in spark.read.parquet(p["cnt"]).collect()
    }
    assert cnt[(0, "dedup")] == 0
    # the stream keeps going: batch 1 probes the (empty) index fine
    _feed(spark, p["land"], [(10, A, "en", "s1"), (11, A, "en", "s1")])
    _run_once(spark, p["land"], p["idx"], p["out"], p["cnt"], p["ckpt"])
    sch = (
        "doc_id long, source string, lang string, tc long,"
        " norm_key string, kb int, batch_id int"
    )
    surv = spark.read.schema(sch).parquet(p["out"])
    assert sorted(r.doc_id for r in surv.collect()) == [10]
    # and batch 2 dedups against batch 1's key (fresh reader: a
    # DataFrame pins its file listing at creation)
    _feed(spark, p["land"], [(20, A, "en", "s2"), (21, C, "en", "s2")])
    _run_once(spark, p["land"], p["idx"], p["out"], p["cnt"], p["ckpt"])
    surv = spark.read.schema(sch).parquet(p["out"])
    assert sorted(r.doc_id for r in surv.collect()) == [10, 21]


def test_bloom_split_no_false_negatives(spark):
    from bearysta_spark.streaming.index import bloom_rows, split_by_bloom

    indexed = spark.range(500).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k"),
        F.pmod(F.xxhash64(F.concat(F.lit("key_"), F.col("id"))), F.lit(32))
        .cast("int")
        .alias("kb"),
    )
    bloom = bloom_rows(indexed, "k", kb_col="kb")
    fresh = spark.range(500, 1000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k"),
        F.pmod(F.xxhash64(F.concat(F.lit("key_"), F.col("id"))), F.lit(32))
        .cast("int")
        .alias("kb"),
    )
    batch = indexed.unionByName(fresh)
    new, suspects = split_by_bloom(batch, bloom, "k", kb_col="kb")
    sus = {r.k for r in suspects.collect()}
    # exactness: every indexed key MUST be a suspect (no false negative)
    assert all(f"key_{i}" in sus for i in range(500))
    # the split is a partition of the batch
    assert new.count() + len(sus) == 1000
    # and the Bloom actually prunes: most fresh keys are definite-new
    fresh_sus = sum(1 for k in sus if int(k.split("_")[1]) >= 500)
    assert fresh_sus < 25, f"false-positive flood: {fresh_sus}/500"


def _walk_plan(node, pred, out):
    if pred(node):
        out.append(node)
    kids = node.children()
    for i in range(kids.size()):
        _walk_plan(kids.apply(i), pred, out)


def test_probe_plan_has_no_aggregate_over_index(spark, tmp_path):
    """r07 VERDICT finding #1: the index side of the exact anti-join
    must be a bare scan — survivor keys are unique by construction and
    left-anti ignores right duplicates, so any Aggregate (the old
    .distinct()) is a full shuffle of the whole index per batch."""
    from bearysta_spark.streaming.curation import probe_new_keys
    from bearysta_spark.streaming.index import bloom_rows

    root = str(tmp_path / "idx")
    keys = spark.range(64).select(
        F.concat(F.lit("k"), F.col("id")).alias("norm_key")
    ).withColumn(
        "kb", F.pmod(F.xxhash64("norm_key"), F.lit(32)).cast("int")
    )
    keys.withColumn("batch_id", F.lit(0)).write.partitionBy(
        "batch_id", "kb"
    ).parquet(root)
    wb = spark.createDataFrame(
        [("k3",), ("fresh",)], "norm_key string"
    ).withColumn(
        "kb", F.pmod(F.xxhash64("norm_key"), F.lit(32)).cast("int")
    )

    # no sidecar yet: the fallback is the PLAIN anti-join — zero
    # aggregates anywhere in the probe plan (the old distinct() put
    # one right on top of the index scan)
    surv = probe_new_keys(wb, spark, root, batch_id=5)
    plan = surv._jdf.queryExecution().optimizedPlan()
    assert "Aggregate" not in plan.toString(), plan.toString()
    assert [r.norm_key for r in surv.collect()] == ["fresh"]

    # with the sidecar: aggregates exist (Bloom OR-merge, per-key
    # all-hit), but NONE in the right (index) subtree of the LeftAnti
    bloom_rows(keys, "norm_key").withColumn(
        "batch_id", F.lit(0)
    ).write.partitionBy("batch_id").parquet(root + "_bloom")
    surv = probe_new_keys(wb, spark, root, batch_id=5)
    plan = surv._jdf.queryExecution().optimizedPlan()
    antis = []
    _walk_plan(
        plan,
        lambda n: n.nodeName() == "Join"
        and "LeftAnti" in n.joinType().toString(),
        antis,
    )
    assert antis, "probe lost its anti-join"
    for j in antis:
        aggs = []
        _walk_plan(j.right(), lambda n: n.nodeName() == "Aggregate", aggs)
        assert not aggs, j.right().toString()
    # and the exactness bar: k3 is dropped, fresh survives
    assert [r.norm_key for r in surv.collect()] == ["fresh"]


def _write_key_batches(spark, root, batches):
    from bearysta_spark.streaming.index import bloom_rows

    for b, keys in batches.items():
        df = spark.createDataFrame(
            [(k,) for k in keys], "norm_key string"
        ).withColumn(
            "kb", F.pmod(F.xxhash64("norm_key"), F.lit(32)).cast("int")
        )
        df.withColumn("batch_id", F.lit(b)).write.mode("append").partitionBy(
            "batch_id", "kb"
        ).parquet(root)
        bloom_rows(df, "norm_key").withColumn(
            "batch_id", F.lit(b)
        ).write.mode("append").partitionBy("batch_id").parquet(
            root + "_bloom"
        )


def test_compaction_preserves_probe_view(spark, tmp_path):
    from bearysta_spark.streaming.curation import compact_curation_index
    from bearysta_spark.streaming.index import read_index_view, read_marker

    root = str(tmp_path / "idx")
    _write_key_batches(
        spark, root,
        {0: ["a", "b"], 1: ["c"], 2: ["d", "e"], 3: ["f"]},
    )

    def view_keys():
        v = read_index_view(spark, root, before_batch=100)
        return sorted(r.norm_key for r in v.select("norm_key").collect())

    before = view_keys()
    compact_curation_index(spark, root, upto_batch=3)
    assert view_keys() == before == list("abcdef")
    m = read_marker(root)
    assert m == {"tier": -2, "upto": 3}
    # reclamation is DEFERRED one cycle: folded partitions stay on
    # disk (a probe holding the old marker must finish against
    # present files) but are invisible to the view
    dirs = {d for d in os.listdir(root) if d.startswith("batch_id=")}
    assert {"batch_id=-2", "batch_id=3"} <= dirs
    # a second compaction stacks: tier counts down, view unchanged,
    # and the FIRST fold's garbage is reclaimed at its start
    _write_key_batches(spark, root, {4: ["g"]})
    compact_curation_index(spark, root, upto_batch=5)
    assert read_marker(root) == {"tier": -3, "upto": 5}
    assert view_keys() == list("abcdefg")
    dirs = {d for d in os.listdir(root) if d.startswith("batch_id=")}
    assert dirs == {"batch_id=-3", "batch_id=-2", "batch_id=3",
                    "batch_id=4"}
    # a third (no-op) fold reclaims the second's garbage; only the
    # fresh tier and the one-cycle-behind previous tier remain
    compact_curation_index(spark, root, upto_batch=5)
    dirs = {d for d in os.listdir(root) if d.startswith("batch_id=")}
    assert dirs == {"batch_id=-4", "batch_id=-3"}
    assert view_keys() == list("abcdefg")
    bdirs = {
        d for d in os.listdir(root + "_bloom") if d.startswith("batch_id=")
    }
    assert bdirs == {"batch_id=-4", "batch_id=-3"}


def test_orphan_tier_from_crashed_compaction_is_invisible(spark, tmp_path):
    from bearysta_spark.streaming.index import compact_index, read_index_view

    root = str(tmp_path / "idx")
    _write_key_batches(spark, root, {0: ["a"], 1: ["b"]})
    # simulate a compaction that died after writing (part of) its tier
    # but BEFORE the marker commit: stale rows at the tier batch_id
    spark.createDataFrame(
        [("stale", 0), ("a", 1)], "norm_key string, kb int"
    ).withColumn("batch_id", F.lit(-2)).write.mode("append").partitionBy(
        "batch_id", "kb"
    ).parquet(root)
    v = read_index_view(spark, root, before_batch=100)
    assert sorted(r.norm_key for r in v.collect()) == ["a", "b"]
    # re-running the compaction clears the orphan first — no stale row
    # survives into the committed tier, no duplicate 'a'
    compact_index(spark, root, 2, partition_cols=("batch_id", "kb"))
    v = read_index_view(spark, root, before_batch=100)
    assert sorted(r.norm_key for r in v.collect()) == ["a", "b"]


def test_seed_partition_probed_then_folded(spark, tmp_path):
    from bearysta_spark.streaming.index import compact_index, read_index_view

    root = str(tmp_path / "idx")
    # pre-seeded corpus convention: batch_id = -1
    _write_key_batches(spark, root, {-1: ["seed"], 0: ["a"]})
    v = read_index_view(spark, root, before_batch=100)
    assert sorted(r.norm_key for r in v.collect()) == ["a", "seed"]
    compact_index(spark, root, 1, partition_cols=("batch_id", "kb"))
    v = read_index_view(spark, root, before_batch=100)
    assert sorted(r.norm_key for r in v.collect()) == ["a", "seed"]
    # the seed and batch partitions linger (deferred reclamation) but
    # only the tier is visible; the next fold reclaims them (and its
    # own superseded tier lingers one further cycle)
    compact_index(spark, root, 1, partition_cols=("batch_id", "kb"))
    dirs = {d for d in os.listdir(root) if d.startswith("batch_id=")}
    assert dirs == {"batch_id=-3", "batch_id=-2"}
    v = read_index_view(spark, root, before_batch=100)
    assert sorted(r.norm_key for r in v.collect()) == ["a", "seed"]


def test_curation_replay_across_compaction_boundary(spark, tmp_path):
    """VERDICT #2's chaos bar: compact after a committed batch, then
    crash-replay the NEXT batch — the replay probes the compacted tier
    and still dedups exactly."""
    p = _paths(tmp_path)
    from bearysta_spark.streaming.curation import compact_curation_index

    _feed(spark, p["land"], [(0, A, "en", "s0"), (1, C, "en", "s0")])
    _run_once(spark, p["land"], p["idx"], p["out"], p["cnt"], p["ckpt"])
    # batch 0 is checkpoint-committed: safe to fold everything below 1
    compact_curation_index(spark, p["idx"], upto_batch=1)
    _feed(
        spark, p["land"],
        [(10, A, "en", "s1"), (11, D, "en", "s1")],  # 10 dups batch 0's A
    )
    _run_once(spark, p["land"], p["idx"], p["out"], p["cnt"], p["ckpt"])
    _truncate_last_commit(p["ckpt"])  # die between execute and commit
    _run_once(spark, p["land"], p["idx"], p["out"], p["cnt"], p["ckpt"])
    surv = spark.read.schema(
        "doc_id long, source string, lang string, tc long,"
        " norm_key string, kb int, batch_id int"
    ).parquet(p["out"])
    assert sorted(r.doc_id for r in surv.collect()) == [0, 1, 11]
    # replay overwrote its own partitions: no duplicate counter rows
    assert (
        spark.read.parquet(p["cnt"])
        .groupBy("batch_id", "stage").count().filter("count > 1").count()
        == 0
    )
    # index VIEW = compacted tier + batch 1's partition, marker intact
    # (the folded batch-0 partition lingers on disk until the next
    # compaction reclaims it — deferred reclamation — but the
    # marker-aware view must not see it)
    from bearysta_spark.streaming.index import read_index_view

    idx = read_index_view(
        spark, p["idx"], before_batch=100,
        schema="norm_key string, kb int, batch_id int",
    )
    assert sorted(r.batch_id for r in idx.collect()) == [-2, -2, 1]
    with open(os.path.join(p["idx"], "_compaction.json")) as f:
        assert json.load(f) == {"tier": -2, "upto": 1}


def test_self_neardup_index_compaction(spark, tmp_path):
    """The self-growing KEY index (streaming/neardup.py) compacts with
    the same machinery; pair emission across the boundary is exact —
    shared-key COUNTS must survive the fold un-inflated."""
    from bearysta_spark.streaming.index import compact_index, read_index_view

    root = str(tmp_path / "kidx")
    rows = [("d0", f"key{i}", 0) for i in range(6)] + [
        ("d1", f"other{i}", 1) for i in range(6)
    ]
    spark.createDataFrame(
        rows, "doc_id string, key string, batch_id int"
    ).withColumn(
        "kb", F.pmod(F.xxhash64("key"), F.lit(32)).cast("int")
    ).write.partitionBy("batch_id", "kb").parquet(root)

    def pairs_against(new_doc_keys, before):
        from bearysta_spark.functions.multimodal import incremental_key_pairs

        idx = read_index_view(spark, root, before_batch=before)
        nk = spark.createDataFrame(
            new_doc_keys, "doc_id string, key string"
        )
        return sorted(
            (r.corpus_id, r.new_id, r.shared_keys)
            for r in incremental_key_pairs(
                idx, nk, min_shared=5, id_col="doc_id"
            ).collect()
        )

    probe = [("dX", f"key{i}") for i in range(6)]
    before = pairs_against(probe, 2)
    compact_index(spark, root, 2, partition_cols=("batch_id", "kb"))
    after = pairs_against(probe, 2)
    assert before == after == [("d0", "dX", 6)]


def test_self_neardup_stream_replay_across_compaction(spark, tmp_path):
    """The self-growing KEY-index STREAM (start_streaming_self_neardup)
    probes through the marker-aware view: compact after a committed
    batch, then crash-replay the next one — pairs are exact and
    un-duplicated, and shared-key COUNTS survive the fold un-inflated."""
    from bearysta_spark.streaming.neardup import start_streaming_self_neardup

    land = str(tmp_path / "land")
    index = str(tmp_path / "kidx")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    t1 = "alpha bravo charlie delta echo foxtrot golf hotel india"
    t2 = "nothing shared here at all zulu yankee xray whiskey victor"
    rows0 = [(0, t1), (1, t2)]
    rows1 = [(10, t1 + " juliet"), (11, "more unshared filler words only")]

    def extractor(df):
        return df.select(
            "doc_id", F.explode(F.split("text", " ")).alias("key")
        )

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            land
        )
        q = start_streaming_self_neardup(
            stream, index, out, ckpt, extractor=extractor, min_shared=5
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    spark.createDataFrame(rows0, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(land)
    run_once()
    # batch 0 committed: fold its partitions (keys + seed space)
    from bearysta_spark.streaming.index import compact_index, read_marker

    compact_index(spark, index, 1, partition_cols=("batch_id", "kb"))
    assert read_marker(index) == {"tier": -2, "upto": 1}
    spark.createDataFrame(rows1, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(land)
    run_once()
    _truncate_last_commit(ckpt)  # die between execute and commit
    run_once()  # replay batch 1 against the compacted tier

    got = sorted(
        (r.corpus_id, r.new_id, r.shared_keys)
        for r in spark.read.parquet(out).collect()
    )
    # doc 10 shares exactly the 9 words of t1 with doc 0 — counted
    # once despite fold + replay
    assert got == [(0, 10, 9)]


def test_bucket_layout_mismatch_fails_loudly(spark, tmp_path):
    """r08 review finding: kb is hash-mod-buckets and became
    correctness-load-bearing (Bloom rows + anti-join pruning), so a
    stream restarted over an existing index with a different bucket
    count must raise, not silently stop deduplicating."""
    import pytest

    from bearysta_spark.streaming.curation import (
        start_streaming_curation_ingest,
    )

    p = _paths(tmp_path)
    _feed(spark, p["land"], [(0, A, "en", "s0")])
    _run_once(spark, p["land"], p["idx"], p["out"], p["cnt"], p["ckpt"])
    _feed(spark, p["land"], [(10, D, "en", "s1")])
    stream = spark.readStream.schema(SCHEMA).parquet(p["land"])
    q = start_streaming_curation_ingest(
        stream, p["idx"], p["out"], p["cnt"], p["ckpt"], buckets=16
    )
    try:
        with pytest.raises(Exception, match="layout mismatch"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_split_by_bloom_routes_null_keys_to_definite_new(spark):
    """r08 ADVICE: a NULL key never equi-joins, so it used to vanish
    from BOTH outputs; it must survive, as definite-new (null matches
    no indexed key by definition)."""
    from bearysta_spark.streaming.index import bloom_rows, split_by_bloom

    indexed = spark.createDataFrame(
        [("a", 0), ("b", 1)], "k string, kb int"
    )
    bloom = bloom_rows(indexed, "k", kb_col="kb")
    batch = spark.createDataFrame(
        [("a", 0), (None, 0), ("c", 1)], "k string, kb int"
    )
    new, suspects = split_by_bloom(batch, bloom, "k", kb_col="kb")
    new_rows = new.collect()
    assert new.count() + suspects.count() == 3  # partition, nothing lost
    assert any(r.k is None for r in new_rows)
    assert all(r.k is not None for r in suspects.collect())


def test_layout_exclusive_create_and_lost_race(spark, tmp_path, monkeypatch):
    """r08 ADVICE: ensure_layout's first write is create-if-absent, so
    a concurrent initializer cannot silently overwrite the winner; the
    loser re-reads and raises on mismatch BEFORE writing any row."""
    import pytest

    import bearysta_spark.streaming.index as ix

    root = str(tmp_path / "idx")
    os.makedirs(root, exist_ok=True)
    assert ix._write_json_exclusive(root, ix.LAYOUT, {"buckets": 32})
    # second exclusive create loses and does NOT clobber the winner
    assert not ix._write_json_exclusive(root, ix.LAYOUT, {"buckets": 16})
    assert ix.read_layout(root) == {"buckets": 32}

    # simulate the check-then-write race: reader sees no layout, but a
    # competitor lands one (with a DIFFERENT value) before our write
    root2 = str(tmp_path / "idx2")
    os.makedirs(root2, exist_ok=True)
    real_read = ix._read_json
    state = {"first": True}

    def racy_read(r, name, spark_=None):
        if name == ix.LAYOUT and r == root2 and state["first"]:
            state["first"] = False
            ix._write_json(root2, ix.LAYOUT, {"buckets": 16})
            return None  # what we observed before the competitor wrote
        return real_read(r, name, spark_)

    monkeypatch.setattr(ix, "_read_json", racy_read)
    with pytest.raises(ValueError, match="layout mismatch"):
        ix.ensure_layout(spark, root2, {"buckets": 32})
    assert real_read(root2, ix.LAYOUT) == {"buckets": 16}  # winner intact


def test_read_json_retries_partial_marker(tmp_path):
    """r08 ADVICE: a non-atomic URI write can expose a half-written
    marker; _read_json retries past the in-flight window and raises
    only on PERSISTENT corruption."""
    import threading

    import pytest

    import bearysta_spark.streaming.index as ix

    root = str(tmp_path / "idx")
    os.makedirs(root, exist_ok=True)
    p = os.path.join(root, ix.MARKER)
    with open(p, "w") as f:
        f.write('{"tier": -2, "upt')  # torn write

    def finish():
        with open(p, "w") as f:
            f.write('{"tier": -2, "upto": 3}')

    t = threading.Timer(0.3, finish)
    t.start()
    try:
        assert ix.read_marker(root) == {"tier": -2, "upto": 3}
    finally:
        t.join()
    # persistent corruption raises instead of looping forever
    with open(p, "w") as f:
        f.write("not json at all {")
    with pytest.raises(ValueError, match="unparseable"):
        ix.read_marker(root)


def test_reclaim_min_age_gates_forced_reclamation(spark, tmp_path):
    """r08 ADVICE: back-to-back compactions shrink the deferred-
    reclamation grace to ~zero; reclaim_min_age_sec skips deletion
    while the current marker is younger than the grace period, so a
    probe holding the previous marker still finds its files."""
    from bearysta_spark.streaming.index import compact_index, read_index_view

    root = str(tmp_path / "idx")
    _write_key_batches(spark, root, {0: ["a"], 1: ["b"]})
    compact_index(spark, root, 2, partition_cols=("batch_id", "kb"))
    # immediate forced fold WITH a grace period: superseded partitions
    # must survive (the marker is seconds old)
    compact_index(
        spark, root, 2, partition_cols=("batch_id", "kb"),
        reclaim_min_age_sec=3600.0,
    )
    dirs = {d for d in os.listdir(root) if d.startswith("batch_id=")}
    assert {"batch_id=0", "batch_id=1", "batch_id=-2"} <= dirs
    v = read_index_view(spark, root, before_batch=100)
    assert sorted(r.norm_key for r in v.collect()) == ["a", "b"]
    # without the grace (default), the same forced fold reclaims
    compact_index(spark, root, 2, partition_cols=("batch_id", "kb"))
    dirs = {d for d in os.listdir(root) if d.startswith("batch_id=")}
    assert "batch_id=0" not in dirs and "batch_id=1" not in dirs
    assert sorted(
        r.norm_key
        for r in read_index_view(spark, root, before_batch=100).collect()
    ) == ["a", "b"]


def test_self_neardup_compaction_reelects_canonical_by_quality(
    spark, tmp_path
):
    """Canonical re-election at compaction (r12 VERDICT ask #6): with
    elect_quality, each fold keeps ONE row per key — the
    highest-quality holder (ties to lowest id), the keep-best rule of
    queries.dedup_canonical_by_quality — instead of pinning the
    first-seen copy forever. Three planted crawls of one page arrive
    worst-first across batches; across a mid-stream fold, a
    truncated-checkpoint replay, and a final converging fold, the
    elected canon per key equals the batch argmax over everything
    streamed, and probes after an elected fold match against the
    CURRENT canon (the semantic switch the option documents)."""
    import pytest as _pytest

    from bearysta_spark.streaming.index import (
        compact_index,
        read_index_view,
        read_marker,
    )
    from bearysta_spark.streaming.neardup import (
        start_streaming_self_neardup,
    )

    land = str(tmp_path / "land")
    index = str(tmp_path / "kidx")
    out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    base = "k1 k2 k3 k4 k5 k6"
    rows0 = [(0, base), (1, "u1 u2 u3 u4 u5 u6 u7")]   # worst crawl + noise
    rows1 = [(10, base + " k7 k8")]                     # better crawl
    rows2 = [(20, base + " k7 k8 k9 k10")]              # best crawl

    def extractor(df):
        return df.select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("key"),
            F.size(F.split("text", " ")).cast("long").alias("qc"),
        )

    def run_once():
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).parquet(land)
        q = start_streaming_self_neardup(
            stream, index, out, ckpt, extractor=extractor,
            min_shared=5, compact_every=1, elect_quality="qc",
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    sch = "doc_id long, text string"
    spark.createDataFrame(rows0, sch).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()  # batch 0 (no fold: batch_id 0)
    spark.createDataFrame(rows1, sch).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()  # batch 1 + fold <1: canon k1..k6 -> doc 0 (only holder)
    spark.createDataFrame(rows2, sch).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()  # batch 2 + fold <2: RE-elects k1..k6 -> doc 10 (qc 8>6)
    _truncate_last_commit(ckpt)
    run_once()  # replay batch 2: same pairs, partition rewrite, re-fold

    # probes matched against the canon of their time: batch 1 saw doc 0
    # (pre-fold view), batch 2 saw the elected doc 10 — doc 0's rows
    # were already re-elected away, so no (0, 20) pair (the documented
    # semantic switch)
    got = sorted(
        (r.corpus_id, r.new_id, r.shared_keys)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [(0, 10, 6), (10, 20, 8)]

    # converge: fold everything (batch 2's own rows included)
    compact_index(
        spark, index, 3, partition_cols=("batch_id", "kb"),
        elect={"keys": ["kb", "key"], "quality": "qc", "id": "doc_id"},
    )
    assert read_marker(index)["upto"] == 3
    view = read_index_view(spark, index, before_batch=None)
    canon = {r.key: r.doc_id for r in view.collect()}
    # batch keep-best twin: argmax(qc, min id) per key over ALL rows
    all_rows = rows0 + rows1 + rows2
    want = {}
    for did, text in all_rows:
        qc = len(text.split(" "))
        for k in text.split(" "):
            best = want.get(k)
            if best is None or (qc, -did) > (best[0], -best[1]):
                want[k] = (qc, did)
    assert canon == {k: v[1] for k, v in want.items()}
    # one row per key — the index is bounded by the distinct-key count
    assert view.count() == len(want)

    # guards: elect + or_merge refuse; missing columns refuse
    with _pytest.raises(ValueError, match="mutually exclusive"):
        compact_index(
            spark, index, 3, partition_cols=("batch_id", "kb"),
            or_merge=("qc",),
            elect={"keys": ["key"], "quality": "qc", "id": "doc_id"},
        )
    with _pytest.raises(ValueError, match="not in index schema"):
        compact_index(
            spark, index, 3, partition_cols=("batch_id", "kb"),
            elect={"keys": ["key"], "quality": "nope", "id": "doc_id"},
        )
