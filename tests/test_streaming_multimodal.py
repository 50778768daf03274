"""Streaming + multimodal extension tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bearysta_spark.functions import multimodal as MM
from bearysta_spark.streaming import (
    events_stream,
    hourly_rollup_stream,
    run_stream_to_memory,
    session_stream,
    view_click_join_stream,
)


def test_streaming_hourly_matches_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    agg = hourly_rollup_stream(stream)
    got = run_stream_to_memory(spark, agg, "hourly_test")

    from bearysta_spark.tables import load_events

    batch = (
        load_events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").cast("long").alias("n"), F.sum("value").alias("total_value"))
    )
    g = {(r["hour"], r["event_type"]): (r["n"], round(r["total_value"], 6)) for r in got.collect()}
    b = {(r["hour"], r["event_type"]): (r["n"], round(r["total_value"], 6)) for r in batch.collect()}
    assert g == b


def test_streaming_sliding_matches_batch(spark, sf_dir):
    from bearysta_spark.streaming.events import sliding_rollup_stream

    stream = events_stream(spark, sf_dir)
    agg = sliding_rollup_stream(stream)
    got = run_stream_to_memory(spark, agg, "sliding_test")

    from bearysta_spark.tables import load_events

    batch = (
        load_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
    )
    g = {(r["win_start"], r["event_type"]): (r["n"], round(r["total_value"], 6)) for r in got.collect()}
    b = {(r["win_start"], r["event_type"]): (r["n"], round(r["total_value"], 6)) for r in batch.collect()}
    assert g == b
    # sliding: ~4x the tumbling row count
    assert len(b) > 3000


def test_stream_stream_join_matches_batch(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    got = run_stream_to_memory(
        spark, view_click_join_stream(stream), "vc_join_test", output_mode="append"
    )

    from bearysta_spark.tables import load_events

    ev = load_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    batch = views.join(
        clicks,
        F.expr(
            "user_id = click_user AND click_ts >= view_ts "
            "AND click_ts <= view_ts + interval 10 minutes"
        ),
    )
    g = {(r["view_id"], r["click_id"]) for r in got.collect()}
    b = {(r["view_id"], r["click_id"]) for r in batch.collect()}
    assert g == b
    assert len(g) > 0


def test_streaming_sessions(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    got = run_stream_to_memory(spark, session_stream(stream), "sessions_test")
    assert got.count() > 0
    r = got.first()
    assert r["end"] > r["start"]
    assert r["n_events"] >= 1


@pytest.fixture(scope="module")
def binary_docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def test_multimodal_metadata(binary_docs):
    out = MM.with_payload_metadata(binary_docs)
    r = out.first()
    assert r["meta"]["media_type"] == "image/fake"
    assert 32 <= r["meta"]["width"] < 1952
    # deterministic: same payload → same metadata
    again = MM.with_payload_metadata(binary_docs).first()
    assert again["meta"] == r["meta"]


def test_multimodal_features(binary_docs):
    out = MM.extract_features(binary_docs, dim=16)
    rows = out.collect()
    assert len(rows) == binary_docs.count()
    assert all(len(r["feat"]) == 16 for r in rows[:5])
    assert all(0.0 <= v <= 1.0 for v in rows[0]["feat"])
    # payload dropped from output schema (vectors-only downstream)
    assert "payload" not in out.columns
    # deterministic across runs
    a = {r["doc_id"]: r["feat"] for r in rows}
    b = {r["doc_id"]: r["feat"] for r in MM.extract_features(binary_docs, dim=16).collect()}
    assert a == b


def test_multimodal_resize_and_frames(binary_docs):
    rs = MM.resize_images(binary_docs, 64, 64)
    r = rs.first()
    assert r["width"] == 64 and len(bytes(r["payload"])) == 64 * 64 // 64 + 8
    fr = MM.sample_frames(binary_docs.limit(5), every_n=4)
    assert fr.count() >= 5
    assert set(fr.columns) == {"doc_id", "frame", "payload", "width", "height"}


def _make_y4m(w, h, n_frames):
    # luma plane = frame index everywhere, chroma planes = 128
    frames = b"".join(
        b"FRAME\n" + bytes([i]) * (w * h) + bytes([128]) * (w * h // 2)
        for i in range(n_frames)
    )
    return f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode() + frames


def test_sample_frames_real_y4m(spark):
    payload = _make_y4m(4, 2, 7)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(payload))],
        "doc_id long, payload binary",
    )
    out = MM.sample_frames(df, every_n=3, fake=False).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["frame"])
        assert [r["frame"] for r in rows] == [0, 3, 6]
        for r in rows:
            assert (r["width"], r["height"]) == (4, 2)
            raw = bytes(r["payload"])
            assert len(raw) == 4 * 2 * 3 // 2
            # luma plane carries the frame index
            assert raw[0] == r["frame"]

    bad = spark.createDataFrame(
        [(3, bytearray(b"\x00\x00\x00 ftypmp42 not a y4m"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="ffmpeg|YUV4MPEG2"):
        MM.sample_frames(bad, fake=False).collect()


def test_multimodal_real_decode_raises(binary_docs):
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        MM.extract_features(binary_docs.limit(2), fake=False).collect()


def test_stateful_running_totals(spark, sf_dir):
    from bearysta_spark.streaming.stateful import running_user_totals
    from bearysta_spark.tables import load_events

    stream = events_stream(spark, sf_dir)
    got = run_stream_to_memory(
        spark, running_user_totals(stream), "running_totals", output_mode="update"
    )
    # last update per user equals the batch lifetime totals
    import pyspark.sql.functions as F

    latest = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    batch = {
        r["user_id"]: r["n"]
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got_map = {r["user_id"]: r["n_events"] for r in latest}
    assert got_map == batch


def test_stateful_stream_dedup(spark, sf_dir):
    from bearysta_spark.streaming.stateful import stream_dedup
    from bearysta_spark.tables import load_events

    stream = events_stream(spark, sf_dir).select("user_id", "event_id", "value")
    got = run_stream_to_memory(spark, stream_dedup(stream), "dedup_stream", output_mode="append")
    n_events = load_events(spark, sf_dir).count()
    assert got.count() == n_events           # source has unique ids → all pass
    assert got.select("event_id").distinct().count() == n_events


def test_stream_static_enrichment(spark, sf_dir):
    from bearysta_spark.streaming import enriched_stream

    dims = spark.createDataFrame(
        [(i, "seg_%d" % (i % 3)) for i in range(2000)], ["user_id", "segment"]
    )
    stream = events_stream(spark, sf_dir)
    got = run_stream_to_memory(
        spark,
        enriched_stream(stream, dims)
        .groupBy("segment")
        .agg(F.count("*").cast("long").alias("n")),
        "enrich_test",
    )
    rows = {r["segment"]: r["n"] for r in got.collect()}
    from bearysta_spark.tables import load_events

    ev = load_events(spark, sf_dir)
    batch = {
        r["segment"]: r["n"]
        for r in ev.join(F.broadcast(dims), "user_id", "left")
        .groupBy("segment")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    }
    assert rows == batch


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None,
    reason="Pillow not installed",
)
def test_multimodal_real_decode_with_pillow(spark):
    # real-decode path, exercised only where the optional dep exists:
    # a 2x2 PNG built with PIL round-trips through feature extraction
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (2, 2), (255, 0, 0)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "doc_id: long, payload: binary")
    row = MM.extract_features(df, dim=4, fake=False).first()
    assert row["media_type"] == "image/decoded"
    assert len(row["feat"]) == 4
    rs = MM.resize_images(df, 8, 8, fake=False).first()
    assert rs["media_type"] == "image/png" and rs["width"] == 8


def test_watermark_drops_late_rows_across_microbatches(spark, tmp_path):
    # r01 VERDICT #10: a real multi-micro-batch file source where the
    # watermark actually advances and discards a late row — the single
    # processAllAvailable backlog tests can never exercise the drop.
    import datetime as dt

    src = tmp_path / "wm_src"
    src.mkdir()
    schema = "ts timestamp, user_id long, value double"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    stream = spark.readStream.schema(schema).parquet(str(src))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_drop_test")
        .start()
    )
    try:
        feed([(t(10, 0), 1, 1.0), (t(10, 30), 2, 1.0), (t(12, 0), 3, 1.0)])
        q.processAllAvailable()  # watermark -> 11:00
        feed([(t(9, 10), 4, 99.0), (t(13, 0), 5, 1.0)])
        q.processAllAvailable()  # 09:10 is behind the watermark: dropped
        feed([(t(15, 30), 6, 1.0)])
        q.processAllAvailable()  # watermark 14:30: flushes 12:00 + 13:00
    finally:
        q.stop()

    got = {
        r["w"]["start"].hour: r["n"]
        for r in spark.sql("SELECT * FROM wm_drop_test").collect()
    }
    # batch oracle over the NON-late rows for the closed windows
    assert got[10] == 2  # the late 09:10 event did NOT resurrect hour 9/10
    assert 9 not in got
    assert got[12] == 1 and got[13] == 1


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    # duplicates arriving in LATER micro-batches must be suppressed by
    # the state store; output equals the batch distinct-by-event_id
    import datetime as dt

    from bearysta_spark.streaming.stateful import stream_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    schema = "user_id long, event_id long, value double"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        stream_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_mb_test")
        .start()
    )
    try:
        feed([(1, 101, 1.0), (1, 102, 2.0), (2, 201, 3.0)])
        q.processAllAvailable()
        feed([(1, 102, 2.0), (1, 103, 4.0), (2, 201, 3.0), (2, 202, 5.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["user_id"], r["event_id"])
        for r in spark.sql("SELECT * FROM dedup_mb_test").collect()
    )
    # batch oracle: distinct (user_id, event_id) across both feeds
    assert got == [(1, 101), (1, 102), (1, 103), (2, 201), (2, 202)]


def test_events_stream_empty_dir_fallback(spark, tmp_path):
    # ADVICE r02: stream definition must work before any file lands (the
    # object-store ingestion pattern) — falls back to the explicit schema
    stream = events_stream(spark, str(tmp_path))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_streaming_restart_exactly_once(spark, sf_dir, tmp_path):
    # checkpointed file-source → parquet-sink pipeline across a restart:
    # offsets in the checkpoint + the sink's file manifest give
    # exactly-once per input file even when the query is stopped and a
    # new query object resumes from the same checkpoint
    from pyspark.sql.types import LongType

    from bearysta_spark.tables import load_events

    land, out, ckpt = (str(tmp_path / d) for d in ("land", "out", "ckpt"))
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "value")
    total = ev.count()
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("append").parquet(land)

    schema = ev.schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    second.coalesce(1).write.mode("append").parquet(land)
    run_once()  # resume from checkpoint: only the new file is processed
    got = spark.read.parquet(out)
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total  # no dups

    run_once()  # idempotent restart with no new data
    assert spark.read.parquet(out).count() == total


def test_expiring_sessions_state_ttl(spark, sf_dir):
    # event-time TTL: keys whose last event + gap falls behind the final
    # watermark are finalized and their state removed; totals match batch
    from bearysta_spark.streaming.stateful import expiring_user_sessions
    from bearysta_spark.tables import load_events

    stream = events_stream(spark, sf_dir).select("user_id", "ts", "value")
    out = expiring_user_sessions(stream, gap_ms=60 * 1000)
    got = run_stream_to_memory(spark, out, "expiring_sessions", output_mode="append")
    rows = got.collect()
    assert len(rows) > 0  # watermark advanced past idle keys → emissions

    ev = load_events(spark, sf_dir)
    # per-user totals over the whole backlog; an expired user may have
    # sessionized into several rows — sum them
    import collections

    agg = collections.defaultdict(lambda: [0, 0.0])
    for r in rows:
        agg[r["user_id"]][0] += r["n_events"]
        agg[r["user_id"]][1] += r["total_value"]
    batch = {
        r["user_id"]: (r["n"], round(r["t"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    for uid, (n, tot) in agg.items():
        # emitted sessions never exceed the user's lifetime totals
        assert n <= batch[uid][0]
        # fully-expired users match exactly
        if n == batch[uid][0]:
            assert round(tot, 6) == batch[uid][1]
    full = sum(1 for uid, (n, _) in agg.items() if n == batch[uid][0])
    assert full > 0


def test_expiring_sessions_match_batch_session_split(spark, sf_dir):
    # session-LEVEL parity (not just per-user totals): for users whose
    # state fully expired, the stream's emitted (n_events, total) rows
    # equal the batch assign_sessions partitioning at the same gap —
    # the invariant that lets the driver's events_ttl_sessions oracle
    # row transitively verify the streaming operator
    from bearysta_spark.streaming.stateful import (
        assign_sessions,
        expiring_user_sessions,
    )
    from bearysta_spark.tables import load_events

    gap_ms = 60 * 1000
    stream = events_stream(spark, sf_dir).select("user_id", "ts", "value")
    got = run_stream_to_memory(
        spark,
        expiring_user_sessions(stream, gap_ms=gap_ms),
        "expiring_sessions_split",
        output_mode="append",
    ).collect()

    ev = load_events(spark, sf_dir).select("user_id", "ts", "value")
    batch = (
        assign_sessions(ev, gap_ms=gap_ms)
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    )
    import collections

    got_by_user = collections.defaultdict(list)
    for r in got:
        got_by_user[r["user_id"]].append((r["n_events"], round(r["total_value"], 6)))
    batch_by_user = collections.defaultdict(list)
    for r in batch:
        batch_by_user[r["user_id"]].append((r["n"], round(r["t"], 6)))

    full = 0
    for uid, sessions in got_by_user.items():
        if sum(n for n, _ in sessions) == sum(n for n, _ in batch_by_user[uid]):
            assert sorted(sessions) == sorted(batch_by_user[uid])
            full += 1
    assert full > 0


def test_streaming_trending_matches_batch_query(spark, sf_dir):
    """The streaming daily-counts aggregate + a per-refresh batch rank
    reproduces the registered events_trending query exactly — the
    composition a streaming 'trending now' board runs per trigger."""
    from pyspark.sql import Window

    from bearysta_spark.queries import QUERIES
    from bearysta_spark.streaming import (
        daily_type_counts_stream,
        events_stream,
        run_stream_to_memory,
    )

    stream = events_stream(spark, sf_dir)
    daily = run_stream_to_memory(
        spark, daily_type_counts_stream(stream), "trend_daily"
    )
    wrank = Window.partitionBy("day").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    wtot = Window.partitionBy("day")
    got = (
        daily.withColumn("rank", F.row_number().over(wrank).cast("long"))
        .withColumn("day_total", F.sum("cnt").over(wtot).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "day",
            "rank",
            "event_type",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("day_total"), 6).alias(
                "share"
            ),
        )
    )
    want = QUERIES["events_trending"](spark, sf_dir)
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w


# ---------------------------------------------------------------------------
# Audio (WAV) — real stdlib-generated payloads through the decode path
# ---------------------------------------------------------------------------


def _make_wav(freq_hz=440, rate=8000, seconds=0.5, channels=1, amp=0.5):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        n = int(rate * seconds)
        frames = bytearray()
        for i in range(n):
            v = int(amp * 32767 * math.sin(2 * math.pi * freq_hz * i / rate))
            frames += struct.pack("<h", v) * channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_audio_metadata_real_wav(spark):
    from bearysta_spark.functions import multimodal as M

    df = spark.createDataFrame(
        [(1, bytearray(_make_wav(rate=8000, seconds=0.5))),
         (2, bytearray(_make_wav(rate=16000, seconds=0.25, channels=2)))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in M.audio_metadata(df).collect()}
    assert out[1]["sample_rate"] == 8000 and out[1]["channels"] == 1
    assert out[1]["bits"] == 16 and out[1]["n_samples"] == 4000
    assert abs(out[1]["duration_s"] - 0.5) < 1e-9
    assert out[2]["sample_rate"] == 16000 and out[2]["channels"] == 2
    assert out[2]["n_samples"] == 4000


def test_audio_features_sine_physics(spark):
    from bearysta_spark.functions import multimodal as M

    # 440 Hz sine at amplitude 0.5: RMS = amp/sqrt(2); ZCR = 2f/rate
    df = spark.createDataFrame(
        [(1, bytearray(_make_wav(freq_hz=440, rate=8000, seconds=1.0, amp=0.5)))],
        "doc_id long, payload binary",
    )
    row = M.audio_features(df, window=1024).collect()[0]
    assert row["n_windows"] == 8000 // 1024
    for r in row["rms"]:
        assert abs(r - 0.5 / 2 ** 0.5) < 0.01
    for z in row["zcr"]:
        assert abs(z - 2 * 440 / 8000) < 0.02


def test_audio_bad_payload_raises(spark):
    from bearysta_spark.functions import multimodal as M

    df = spark.createDataFrame(
        [(9, bytearray(b"ID3\x04 this is an mp3, not wav"))],
        "doc_id long, payload binary",
    )
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as ei:
        M.audio_metadata(df).collect()
    assert "RIFF" in str(ei.value) or "PythonException" in type(ei.value).__name__


def test_audio_features_fake_schema_parity(spark):
    from bearysta_spark.functions import multimodal as M

    df = spark.createDataFrame(
        [(1, bytearray(b"\x01" * 4096))], "doc_id long, payload binary"
    )
    real_schema = M.audio_features(df, window=1024).schema
    fake = M.audio_features(df, window=1024, fake=True)
    assert fake.schema == real_schema
    row = fake.collect()[0]
    assert row["n_windows"] == len(row["rms"]) == len(row["zcr"]) == 2


def test_streaming_cms_matches_batch_sketch(spark, tmp_path):
    # the streaming sketch's final cells must equal the batch sketch
    # over the union of all micro-batches — cell-wise, exactly
    from bearysta_spark.functions.sketch import cms_cells
    from bearysta_spark.streaming.stateful import streaming_cms_cells

    src = tmp_path / "cms_src"
    src.mkdir()
    schema = "user_id long, value double"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_cms_cells(stream, d=4, w=16)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cms_mb_test")
        .start()
    )
    batch1 = [(u, 1.0) for u in [1, 2, 3, 1, 1, 2]]
    batch2 = [(u, 1.0) for u in [2, 4, 4, 1, 5]]
    try:
        feed(batch1)
        q.processAllAvailable()
        feed(batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    # live sketch = max cnt per cell across the update log (monotone)
    got = {}
    for r in spark.sql("SELECT * FROM cms_mb_test").collect():
        k = (r["i"], r["bucket"])
        got[k] = max(got.get(k, 0), r["cnt"])
    want = {
        (r["i"], r["bucket"]): r["cnt"]
        for r in cms_cells(
            spark.createDataFrame(batch1 + batch2, schema), "user_id", d=4, w=16
        ).collect()
    }
    assert got == want
    # bounded state: never more than d*w cells
    assert len(got) <= 4 * 16


def test_streaming_hll_matches_batch_registers(spark, tmp_path):
    # the streaming sketch's final registers must equal the batch
    # registers over the union of all micro-batches — and the estimate
    # derived from them must be the batch estimate exactly
    from bearysta_spark.functions.sketch import hll_estimate, hll_registers
    from bearysta_spark.streaming.stateful import streaming_hll_registers

    src = tmp_path / "hll_src"
    src.mkdir()
    schema = "user_id long, value double"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_hll_registers(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hll_mb_test")
        .start()
    )
    batch1 = [(u, 1.0) for u in range(0, 40)]
    batch2 = [(u, 1.0) for u in range(20, 70)]
    try:
        feed(batch1)
        q.processAllAvailable()
        feed(batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {}
    for r in spark.sql("SELECT * FROM hll_mb_test").collect():
        got[r["bucket"]] = max(got.get(r["bucket"], 0), r["m"])
    union = spark.createDataFrame(batch1 + batch2, schema)
    want = {r["bucket"]: r["m"] for r in hll_registers(union, "user_id").collect()}
    assert got == want
    assert len(got) <= 256  # bounded state
    # estimate from streamed registers == batch estimate
    regs = spark.createDataFrame(
        [(b, m) for b, m in got.items()], "bucket string, m int"
    )
    est_stream = hll_estimate(regs).first()["est_hll"]
    est_batch = hll_estimate(hll_registers(union, "user_id")).first()["est_hll"]
    assert est_stream == est_batch


def test_streaming_hist_matches_batch_bins(spark, tmp_path):
    # stream histogram's final bins == batch histogram over the union
    from bearysta_spark.functions.sketch import hist_bins
    from bearysta_spark.streaming.stateful import streaming_hist_bins

    src = tmp_path / "hist_src"
    src.mkdir()
    schema = "user_id long, value double"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_hist_bins(stream, bin_width=4.0, nbins=16)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("hist_mb_test")
        .start()
    )
    batch1 = [(1, float(v)) for v in [0.5, 3.9, 4.0, 17.2, 100.0]]
    batch2 = [(2, float(v)) for v in [-3.0, 4.1, 63.9, 64.0, 1000.0]]
    try:
        feed(batch1)
        q.processAllAvailable()
        feed(batch2)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {}
    for r in spark.sql("SELECT * FROM hist_mb_test").collect():
        got[r["bin"]] = max(got.get(r["bin"], 0), r["cnt"])
    union = spark.createDataFrame(batch1 + batch2, schema)
    want = {
        r["bin"]: r["cnt"]
        for r in hist_bins(union, "value", bin_width=4.0, nbins=16).collect()
    }
    assert got == want
    assert min(got) == 0 and max(got) == 15  # clamped under/overflow


def test_image_dimensions_header_parsing(spark):
    # handcrafted container headers: the parser reads ONLY header bytes
    from bearysta_spark.functions.multimodal import image_dimensions

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + (640).to_bytes(4, "big") + (480).to_bytes(4, "big") + b"\x08\x06"
    )
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    # JPEG: SOI, APP0 segment (16 bytes), SOF0 with height=600 width=800
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (600).to_bytes(2, "big") + (800).to_bytes(2, "big") + b"\x03"
    )
    rows = [(1, png), (2, gif), (3, jpeg), (4, b"not an image"), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["img_format"], r["width"], r["height"])
           for r in image_dimensions(df).collect()}
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("gif", 320, 200)
    assert got[3] == ("jpeg", 800, 600)
    assert got[4] == (None, None, None)
    assert got[5] == (None, None, None)
    # truncated JPEG: container recognized, dimensions unknown -> NULLs
    trunc = spark.createDataFrame([(6, b"\xff\xd8\xff\xe0")],
                                  "doc_id long, payload binary")
    assert image_dimensions(trunc).collect()[0]["img_format"] == "jpeg"

def test_image_dimensions_jpeg_fill_bytes_and_standalone_markers(spark):
    # encoders may pad with 0xFF fill bytes before a marker, and TEM
    # (0x01) / RSTn (0xD0-D7) are standalone markers with no length
    # field: the segment walk must skip both to reach the SOF (a naive
    # walk reads a bogus length and lands mid-stream)
    from bearysta_spark.functions.multimodal import _parse_image_dims

    sof = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (600).to_bytes(2, "big") + (800).to_bytes(2, "big") + b"\x03"
    )
    padded = b"\xff\xd8" + b"\xff\xff\xff" + sof  # FF fill run before SOF
    assert _parse_image_dims(padded) == ("jpeg", 800, 600)
    standalone = b"\xff\xd8" + b"\xff\x01" + b"\xff\xd0" + sof  # TEM + RST0
    assert _parse_image_dims(standalone) == ("jpeg", 800, 600)
    # fill bytes before an ordinary segment, then the SOF
    app0 = b"\xff\xff\xe0" + (4).to_bytes(2, "big") + b"\x00\x00"
    assert _parse_image_dims(b"\xff\xd8" + app0 + sof) == ("jpeg", 800, 600)
    # EOI before any SOF: recognized container, unknown dims
    assert _parse_image_dims(b"\xff\xd8\xff\xd9" + sof) == ("jpeg", None, None)

def _truncate_last_commit(ckpt: str) -> int:
    """Simulate a mid-batch kill: remove the newest commits/<n> marker,
    leaving the offsets log one batch ahead — exactly the crash window
    between 'batch executed' and 'batch committed'. On restart the
    engine must replay that batch; exactly-once then rests on the file
    sink's _spark_metadata (skips the already-committed addBatch) and
    state-store versioning (replays from the pre-batch version)."""
    import glob
    import os

    commits = [
        p
        for p in glob.glob(os.path.join(ckpt, "commits", "*"))
        if os.path.basename(p).isdigit()
    ]
    assert commits, "no commit markers written yet"
    last = max(commits, key=lambda p: int(os.path.basename(p)))
    os.remove(last)
    # drop the local-FS checksum sidecar too, or the re-write of the
    # commit marker fails its integrity check and the engine misreads
    # the situation as two queries sharing one checkpoint
    crc = os.path.join(
        os.path.dirname(last), f".{os.path.basename(last)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    return int(os.path.basename(last))


def test_stream_dedup_truncated_checkpoint_exactly_once(spark, tmp_path):
    from bearysta_spark.streaming.stateful import stream_dedup

    land, out, ckpt = (str(tmp_path / d) for d in ("land", "out", "ckpt"))
    schema = "user_id long, event_id long, value double"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(land)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = (
            stream_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    feed([(1, 101, 1.0), (1, 102, 2.0), (2, 201, 3.0)])
    run_once()
    _truncate_last_commit(ckpt)  # die after executing, before committing

    # overlap with batch 1 on purpose: replay must not re-emit, new ids
    # must not be lost
    feed([(1, 102, 2.0), (1, 103, 4.0), (2, 201, 3.0), (2, 202, 5.0)])
    run_once()

    got = sorted(
        (r["user_id"], r["event_id"], r["value"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, 101, 1.0),
        (1, 102, 2.0),
        (1, 103, 4.0),
        (2, 201, 3.0),
        (2, 202, 5.0),
    ]


def test_expiring_sessions_truncated_checkpoint_exactly_once(spark, tmp_path):
    import datetime as dt

    from bearysta_spark.streaming.stateful import expiring_user_sessions

    land, out, ckpt = (str(tmp_path / d) for d in ("land", "out", "ckpt"))
    schema = "user_id long, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(land)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = (
            expiring_user_sessions(stream, gap_ms=60 * 1000)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # session A: user 1, two events 10s apart (unique total 3.0)
    feed([(1, t0, 1.0), (1, t0 + dt.timedelta(seconds=10), 2.0)])
    run_once()
    _truncate_last_commit(ckpt)  # kill inside the first batch's window

    # batch 2 advances the watermark 10 minutes -> session A expires
    # exactly once despite the replay; session B (user 1) and user 3 open
    feed(
        [
            (1, t0 + dt.timedelta(minutes=10), 4.0),
            (3, t0 + dt.timedelta(minutes=10), 8.0),
        ]
    )
    run_once()
    # batch 3 advances the watermark far enough to expire B and user 3
    feed([(99, t0 + dt.timedelta(minutes=30), 0.5)])
    run_once()

    got = sorted(
        (r["user_id"], r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    )
    # each session finalized exactly once; user 99 still open (no later
    # watermark) so it must NOT appear
    assert got == [(1, 1, 4.0), (1, 2, 3.0), (3, 1, 8.0)]


def test_streaming_near_dup_matches_batch_and_survives_replay(spark, documents, tmp_path):
    # streaming arm of the persisted-index dedup: docs stream in two
    # micro-batches, each joined against the corpus LSH index files;
    # union of outputs must equal the batch incremental result, and a
    # truncated checkpoint (mid-batch kill) must not duplicate pairs
    # thanks to the batch-id dynamic-partition overwrite
    from bearysta_spark.functions import dedup as D
    from bearysta_spark.streaming.neardup import start_streaming_near_dup

    corp = documents.filter(F.col("doc_id") % 10 != 0)
    inc = documents.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")

    index = str(tmp_path / "lsh_index")
    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    D.write_lsh_index(corp, index, num_hashes=12, bands=3)

    half_a = inc.filter(F.col("doc_id") % 20 == 0)
    half_b = inc.filter(F.col("doc_id") % 20 != 0)

    def run_once():
        stream = spark.readStream.schema("doc_id long, text string").parquet(land)
        q = start_streaming_near_dup(
            stream, index, out, ckpt, num_hashes=12, bands=3
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    half_a.coalesce(1).write.mode("append").parquet(land)
    run_once()
    _truncate_last_commit(ckpt)  # kill between execute and commit
    half_b.coalesce(1).write.mode("append").parquet(land)
    run_once()  # replays batch 0 -> overwrites its own partition

    got = sorted(
        (r["corpus_id"], r["new_id"])
        for r in spark.read.parquet(out).select("corpus_id", "new_id").collect()
    )
    want = sorted(
        (r["corpus_id"], r["new_id"])
        for r in D.incremental_lsh_pairs(
            corp, inc, num_hashes=12, bands=3
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_dedup_bloom_at_most_once_and_bounded_state(spark, sf_dir):
    # Bloom-state dedup: never emits an id twice (no false negatives),
    # matches the exact dedup on this corpus (the deterministic md5
    # positions produce no false positives at these cardinalities), and
    # state stays 128 longs per key regardless of id count
    from bearysta_spark.streaming.stateful import (
        BLOOM_DEDUP_NBITS,
        _bloom_positions,
        _update_dedup_bloom,
        stream_dedup,
        stream_dedup_bloom,
    )

    stream = events_stream(spark, sf_dir).select("user_id", "event_id", "value")
    got = run_stream_to_memory(
        spark, stream_dedup_bloom(stream), "bloom_dedup_stream", output_mode="append"
    )
    exact = run_stream_to_memory(
        spark, stream_dedup(stream), "exact_dedup_stream2", output_mode="append"
    )
    g = sorted((r["user_id"], r["event_id"]) for r in got.collect())
    e = sorted((r["user_id"], r["event_id"]) for r in exact.collect())
    assert len(g) == len(set(g))  # at-most-once: no id emitted twice
    assert g == e  # no false positives at this cardinality

    # kernel-level: state is fixed-width and ids are idempotent
    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True
            self.get = v

    st = FakeState()
    import pandas as pd

    batch = pd.DataFrame({"event_id": [1, 2, 1, 3], "value": [1.0, 2.0, 1.0, 3.0]})
    out = list(_update_dedup_bloom((7,), [batch], st))[0]
    assert list(out["event_id"]) == [1, 2, 3]
    assert len(st.get[0]) == BLOOM_DEDUP_NBITS // 64
    assert all(-(1 << 63) <= w < (1 << 63) for w in st.get[0])
    # replaying the same batch emits nothing new
    out2 = list(_update_dedup_bloom((7,), [batch], st))[0]
    assert len(out2) == 0
    # positions deterministic + in range
    for eid in (0, 1, 2**40, 17):
        pos = _bloom_positions(eid, BLOOM_DEDUP_NBITS, 4)
        assert pos == _bloom_positions(eid, BLOOM_DEDUP_NBITS, 4)
        assert all(0 <= p < BLOOM_DEDUP_NBITS for p in pos)


# -- Perceptual hashing: zero-dep decode + dHash + pairing (r06) ------------


def _png_with_filters(pixels, width, height, nch, ctype, filters, palette=b""):
    """Test-side PNG builder applying an explicit filter type per row —
    the FORWARD filter direction, written independently of the decoder's
    reconstruction loop so the two implementations check each other."""
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    stride = width * nch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = bytes(pixels[y * stride : (y + 1) * stride])
        f = filters[y % len(filters)]
        raw.append(f)
        for i in range(stride):
            a = row[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if f == 0:
                enc = row[i]
            elif f == 1:
                enc = row[i] - a
            elif f == 2:
                enc = row[i] - b
            elif f == 3:
                enc = row[i] - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc = row[i] - pred
            raw.append(enc & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette:
        body += chunk(b"PLTE", palette)
    return body + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_roundtrip_and_all_filters():
    import random

    rnd = random.Random(11)
    w, h = 13, 9
    px = [rnd.randrange(256) for _ in range(w * h)]
    # encoder (filter 0 only) round-trips
    w2, h2, gray = MM._png_decode_gray(MM.png_encode_gray(px, w, h))
    assert (w2, h2, list(gray)) == (w, h, px)
    # every filter type reconstructs (gray, one filter per row, cycled)
    w2, h2, gray = MM._png_decode_gray(
        _png_with_filters(px, w, h, 1, 0, [0, 1, 2, 3, 4])
    )
    assert list(gray) == px
    # RGB and RGBA reduce via the BT.601 integer luma
    rgb = [rnd.randrange(256) for _ in range(w * h * 3)]
    _, _, gray = MM._png_decode_gray(
        _png_with_filters(rgb, w, h, 3, 2, [4, 3, 2, 1, 0])
    )
    want = [
        (299 * rgb[3 * i] + 587 * rgb[3 * i + 1] + 114 * rgb[3 * i + 2]) // 1000
        for i in range(w * h)
    ]
    assert list(gray) == want
    rgba = [rnd.randrange(256) for _ in range(w * h * 4)]
    _, _, gray = MM._png_decode_gray(
        _png_with_filters(rgba, w, h, 4, 6, [1, 4])
    )
    want = [
        (299 * rgba[4 * i] + 587 * rgba[4 * i + 1] + 114 * rgba[4 * i + 2]) // 1000
        for i in range(w * h)
    ]
    assert list(gray) == want
    # palette indexes map through PLTE then luma
    pal = bytes(rnd.randrange(256) for _ in range(256 * 3))
    idx = [rnd.randrange(256) for _ in range(w * h)]
    _, _, gray = MM._png_decode_gray(
        _png_with_filters(idx, w, h, 1, 3, [0, 2], palette=pal)
    )
    want = [
        (299 * pal[3 * i] + 587 * pal[3 * i + 1] + 114 * pal[3 * i + 2]) // 1000
        for i in idx
    ]
    assert list(gray) == want


def _gif_encode_gray(pixels, width, height):
    """Test-side minimal GIF89a writer: 256-entry grayscale palette and
    the classic 'uncompressed' LZW trick (CLEAR emitted before the code
    table would outgrow 9 bits, every pixel a literal code)."""
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries
    for v in range(256):
        out += bytes([v, v, v])
    out += b"\x2c" + b"\x00" * 4
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += b"\x00"  # no LCT, not interlaced
    out += b"\x08"  # LZW min code size
    codes = []
    for i, v in enumerate(pixels):
        if i % 250 == 0:
            codes.append(256)  # CLEAR
        codes.append(v)
    codes.append(257)  # EOI
    acc = nbits = 0
    data = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_decode_lzw():
    import random

    rnd = random.Random(5)
    w, h = 21, 17
    px = [rnd.randrange(256) for _ in range(w * h)]
    w2, h2, gray = MM._gif_decode_gray(_gif_encode_gray(px, w, h))
    # grayscale palette entry v has luma (299v+587v+114v)//1000 == v
    assert (w2, h2, list(gray)) == (w, h, px)
    # decode_gray dispatches on magic for both containers
    assert MM.decode_gray(_gif_encode_gray(px, w, h))[2] == gray


def test_dhash_properties():
    # uniform tiles: resample is exact, so the hash equals the hash of
    # the raw grid; a gradient row yields all-ones bytes
    grid = [c * 7 for r in range(8) for c in range(9)]
    buf = bytearray(36 * 32)
    for r in range(32):
        for c in range(36):
            buf[r * 36 + c] = grid[(r // 4) * 9 + c // 4]
    assert MM.dhash_bytes(MM.png_encode_gray(buf, 36, 32)) == [255] * 8
    # near-identical images land at tiny hamming
    buf2 = bytearray(buf)
    buf2[0] = (buf2[0] + 2) % 256
    a = MM.dhash_bytes(MM.png_encode_gray(buf, 36, 32))
    b = MM.dhash_bytes(MM.png_encode_gray(bytes(buf2), 36, 32))
    assert sum(bin(x ^ y).count("1") for x, y in zip(a, b)) <= 1


def test_phash_near_pairs_matches_bruteforce(spark):
    import random

    rnd = random.Random(42)
    base = [rnd.randrange(256) for _ in range(8)]
    rows = []
    for i in range(40):
        hb = list(base)
        for _ in range(rnd.randrange(0, 12)):  # 0-11 bit flips
            pos = rnd.randrange(64)
            hb[pos // 8] ^= 1 << (pos % 8)
        rows.append((i, hb))
    df = spark.createDataFrame(rows, "doc_id long, hash_bytes array<int>")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in MM.phash_near_pairs(df, max_hamming=6).collect()
    )
    want = []
    for i in range(40):
        for j in range(i + 1, 40):
            d = sum(
                bin(a ^ b).count("1") for a, b in zip(rows[i][1], rows[j][1])
            )
            if d <= 6:
                want.append((i, j, d))
    assert got == sorted(want)
    with pytest.raises(ValueError, match="pigeonhole"):
        MM.phash_near_pairs(df, max_hamming=7)


def test_synthesized_pngs_hash_like_their_grids(spark):
    import random

    rnd = random.Random(3)
    rows = [
        (i, [rnd.randrange(256) for _ in range(72)]) for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, px array<int>")
    payloads = MM.synthesize_gray_pngs(df, scale=4)
    hashed = {
        r["doc_id"]: r["hash_bytes"]
        for r in MM.dhash_rows(payloads).collect()
    }
    for i, grid in rows:
        want = []
        for r in range(8):
            v = 0
            for c in range(8):
                if grid[r * 9 + c] < grid[r * 9 + c + 1]:
                    v |= 1 << c
            want.append(v)
        assert list(hashed[i]) == want, f"grid {i}"


def test_dhash_rows_null_on_undecodable(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, None)],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r["hash_bytes"] for r in MM.dhash_rows(df).collect()}
    assert out == {1: None, 2: None}


def test_incremental_phash_matches_full_pair_surface(spark, documents):
    # probing a persisted-style index with an increment must find
    # exactly the corpus-x-increment subset of the full pair surface
    from bearysta_spark.queries import _PHASH_LETTERS

    payloads = MM.charcount_grid_pngs(documents, _PHASH_LETTERS, scale=4)
    hashes = MM.dhash_rows(payloads)
    corp_h = hashes.filter(F.col("doc_id") % 10 != 0)
    inc_h = hashes.filter(F.col("doc_id") % 10 == 0)
    idx = MM.phash_keys(corp_h)
    got = sorted(
        (r["corpus_id"], r["new_id"], r["hamming"])
        for r in MM.incremental_phash_pairs(idx, inc_h, max_hamming=6).collect()
    )
    full = MM.phash_near_pairs(hashes, max_hamming=6).collect()
    want = sorted(
        (a, b, r["hamming"])
        for r in full
        for a, b in [(r["id_a"], r["id_b"]), (r["id_b"], r["id_a"])]
        if a % 10 != 0 and b % 10 == 0
    )
    assert got == want and len(got) > 0


def test_streaming_image_neardup_matches_batch_and_survives_replay(
    spark, documents, tmp_path
):
    # image twin of the streaming LSH test: payloads stream in two
    # micro-batches against the persisted phash index files; union of
    # outputs equals the batch incremental result, and a truncated
    # checkpoint (mid-batch kill) must not duplicate pairs
    from bearysta_spark.queries import _PHASH_LETTERS
    from bearysta_spark.streaming.neardup import start_streaming_image_neardup

    payloads = MM.charcount_grid_pngs(documents, _PHASH_LETTERS, scale=4)
    corp_h = MM.dhash_rows(payloads.filter(F.col("doc_id") % 10 != 0))
    inc = payloads.filter(F.col("doc_id") % 10 == 0)

    index = str(tmp_path / "phash_index")
    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    MM.write_phash_index(corp_h, index)

    inc.filter(F.col("doc_id") % 20 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(land)

    def run_once():
        stream = spark.readStream.schema("doc_id long, payload binary").parquet(
            land
        )
        q = start_streaming_image_neardup(stream, index, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    _truncate_last_commit(ckpt)  # kill between execute and commit
    inc.filter(F.col("doc_id") % 20 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()  # replays batch 0 -> overwrites its own partition

    got = sorted(
        (r["corpus_id"], r["new_id"], r["hamming"])
        for r in spark.read.parquet(out)
        .select("corpus_id", "new_id", "hamming")
        .collect()
    )
    want = sorted(
        (r["corpus_id"], r["new_id"], r["hamming"])
        for r in MM.incremental_phash_pairs(
            spark.read.parquet(index), MM.dhash_rows(inc), max_hamming=6
        ).collect()
    )
    assert got == want and len(got) > 0


def test_wav_fingerprint_roundtrip_and_robustness():
    # encode -> parse round trip is lossless (int16 survives the float
    # normalization), and substitution edits stay at tiny hamming
    t = "the quick brown fox jumps over the lazy dog 0123456789 " * 5
    samples = [((ord(c) % 128) - 64) * 256 for c in t]
    wav = MM.wav_encode_pcm16(samples)
    rate, ch, bits, x = MM._parse_wav(wav)
    assert (rate, ch, bits) == (8000, 1, 16)
    assert [int(round(v * 32768)) for v in x[:, 0]] == samples
    fp = MM.audio_fp_bytes(wav)
    t2 = t[:100] + "x" + t[101:]  # substitution, same length
    fp2 = MM.audio_fp_bytes(
        MM.wav_encode_pcm16([((ord(c) % 128) - 64) * 256 for c in t2])
    )
    assert sum(bin(a ^ b).count("1") for a, b in zip(fp, fp2)) <= 2


def test_audio_fp_rows_and_pairing(spark):
    # the audio fingerprint is byte-compatible with the image banding:
    # near-identical WAVs pair through phash_near_pairs unchanged
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    variants = {
        1: base,
        2: base[:50] + "X" + base[51:],          # tiny substitution
        3: "completely different content " * 12,  # unrelated
    }
    rows = [
        (i, bytearray(MM.wav_encode_pcm16(
            [((ord(c) % 128) - 64) * 256 for c in t.lower()]
        )))
        for i, t in variants.items()
    ] + [(4, bytearray(b"not audio")), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = MM.audio_fp_rows(df)
    got = {r["doc_id"]: r["hash_bytes"] for r in hashes.collect()}
    assert got[4] is None and got[5] is None
    pairs = [
        (r["id_a"], r["id_b"])
        for r in MM.phash_near_pairs(hashes, max_hamming=6).collect()
    ]
    assert (1, 2) in pairs
    assert all({a, b} != {1, 3} and {a, b} != {2, 3} for a, b in pairs)


def test_gif_lzw_code_width_growth():
    # literals emitted WITHOUT clear codes force the decoder's table
    # past 512/1024 entries, exercising the 9->10->11 bit width growth
    # that the clear-code-early encoder never touches
    import random

    rnd = random.Random(8)
    w, h = 40, 30  # 1200 pixels -> next_code reaches ~1458 (11 bits)
    px = [rnd.randrange(256) for _ in range(w * h)]
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])
    for v in range(256):
        out += bytes([v, v, v])
    out += b"\x2c" + b"\x00" * 4
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += b"\x00\x08"
    codes = [256] + px + [257]  # one CLEAR, then raw literals, EOI
    acc = nbits = 0
    width = 9
    next_code = 258
    first_literal = True
    data = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        # mirror the decoder's table growth: every literal after the
        # first post-clear code adds one entry; width bumps at 2^width
        if code not in (256, 257):
            if first_literal:
                first_literal = False
            else:
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    w2, h2, gray = MM._gif_decode_gray(bytes(out))
    assert (w2, h2, list(gray)) == (w, h, px)


def test_y4m_roundtrip_and_frame_hashes(spark):
    import random

    rnd = random.Random(21)
    w, h = 36, 32
    f0 = bytes(rnd.randrange(256) for _ in range(w * h))
    f1 = bytes(rnd.randrange(256) for _ in range(w * h))
    y4m = MM.y4m_encode_mono([f0, f1], w, h)
    w2, h2, frames = MM._parse_y4m(y4m)
    assert (w2, h2) == (w, h) and frames == [f0, f1]

    df = spark.createDataFrame(
        [(1, bytearray(y4m)), (2, bytearray(b"not video"))],
        "doc_id long, payload binary",
    )
    rows = MM.video_frame_hashes(df).collect()
    got = {(r["doc_id"], r["frame"]): list(r["hash_bytes"]) for r in rows}
    assert set(got) == {(1, 0), (1, 1)}  # undecodable doc 2 yields no rows

    def direct(frame):
        px = MM.box_resample_gray(frame, w, h, 9, 8)
        return [
            sum(
                (1 << c) if px[r * 9 + c] < px[r * 9 + c + 1] else 0
                for c in range(8)
            )
            for r in range(8)
        ]

    assert got[(1, 0)] == direct(f0)
    assert got[(1, 1)] == direct(f1)


def test_video_shared_frame_pairs_alignment(spark):
    # videos 1/2 share frame A at the SAME position; video 3 has frame A
    # at a different position; video 4 is unrelated
    A, B, C, D = [1] * 8, [2] * 8, [3] * 8, [4] * 8
    rows = [
        (1, 0, A), (1, 1, B),
        (2, 0, A), (2, 1, C),
        (3, 0, C), (3, 1, A),
        (4, 0, D), (4, 1, D),
    ]
    df = spark.createDataFrame(rows, "doc_id long, frame int, hash_bytes array<int>")
    aligned = sorted(
        (r["id_a"], r["id_b"], r["shared_frames"])
        for r in MM.video_shared_frame_pairs(df).collect()
    )
    # only 1&2 share a hash at the SAME position (A at frame 0); 2&3
    # share C and 1&3 share A but at different offsets
    assert aligned == [(1, 2, 1)]
    any_pos = sorted(
        (r["id_a"], r["id_b"], r["shared_frames"])
        for r in MM.video_shared_frame_pairs(df, align_frames=False).collect()
    )
    assert (1, 3, 1) in any_pos  # A found at any offset


def test_png_roundtrip_property():
    # randomized sizes, pixel values and per-row filter types: the
    # forward filter (test-side) and the decoder's reconstruction must
    # invert each other for every filter in every geometry
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 23),
        h=st.integers(1, 17),
        seed=st.integers(0, 2**31),
        filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    )
    def check(w, h, seed, filters):
        import random

        rnd = random.Random(seed)
        px = [rnd.randrange(256) for _ in range(w * h)]
        assert list(
            MM._png_decode_gray(_png_with_filters(px, w, h, 1, 0, filters))[2]
        ) == px
        assert list(MM._png_decode_gray(MM.png_encode_gray(px, w, h))[2]) == px

    check()


def test_box_resample_uniform_tile_property():
    # resampling a scale-tiled grid recovers the grid exactly for any
    # grid values and any integer scale — the property the oracle
    # queries rely on to replay hashes without decoding
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(seed=st.integers(0, 2**31), scale=st.integers(1, 6))
    def check(seed, scale):
        import random

        rnd = random.Random(seed)
        grid = [rnd.randrange(256) for _ in range(72)]
        w, h = 9 * scale, 8 * scale
        buf = bytearray(w * h)
        for y in range(h):
            for x in range(w):
                buf[y * w + x] = grid[(y // scale) * 9 + x // scale]
        assert MM.box_resample_gray(buf, w, h, 9, 8) == grid

    check()


def test_png_bomb_guards_reject_before_allocating():
    import struct
    import zlib

    # crafted IHDR declaring a ~4-gigapixel raster: rejected on the
    # declared dims (ValueError → NULL-hash policy), no allocation
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 0, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        MM._png_decode_gray(bomb)

    # zip-bomb IDAT behind honest small dims: inflate is bounded to the
    # declared raster, so the decode succeeds with the expected bytes
    # instead of materializing the bomb
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0)
    raw = (b"\x00" + b"\x07" * 4) * 2
    bombed_idat = zlib.compress(raw + b"\x00" * 10_000_000)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bombed_idat)
        + chunk(b"IEND", b"")
    )
    w, h, gray = MM._png_decode_gray(png)
    assert (w, h, list(gray)) == (4, 2, [7] * 8)

    # truncated IDAT (inflates to less than the raster) raises instead
    # of producing garbage rows
    short = zlib.compress(raw[:3])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", short)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated"):
        MM._png_decode_gray(png)


def test_gif_bomb_guard_rejects_huge_raster():
    # GIF with 65535x65535 image descriptor and a 4-byte "stream"
    hdr = b"GIF89a" + b"\x04\x00\x04\x00" + bytes([0x80, 0, 0]) + b"\x00" * 6
    desc = b"\x2c" + b"\x00\x00\x00\x00" + b"\xff\xff\xff\xff" + b"\x00"
    body = b"\x02\x01\x00\x00" + b"\x3b"
    with pytest.raises(ValueError, match="MAX_PIXELS"):
        MM._gif_decode_gray(hdr + desc + body)


def test_audio_fp_windows_validation_and_smaller_grid():
    wav = MM.wav_encode_pcm16([((i % 128) - 64) * 256 for i in range(720)])
    with pytest.raises(ValueError, match="windows"):
        MM.audio_fp_bytes(wav, windows=50)
    with pytest.raises(ValueError, match="windows"):
        MM.audio_fp_bytes(wav, windows=80)
    fp16 = MM.audio_fp_bytes(wav, windows=16)  # 8 rows x 2 spans: 1 bit/row
    assert len(fp16) == 8 and all(0 <= b <= 1 for b in fp16)
    assert MM.audio_fp_bytes(wav) == MM.audio_fp_bytes(wav, windows=72)


def test_box_resample_matches_naive_reference():
    # the integral-image implementation must reproduce the scalar
    # floor-arithmetic definition bit-for-bit on awkward sizes
    import random

    def naive(gray, width, height, out_w, out_h):
        out = []
        for r in range(out_h):
            y0 = r * height // out_h
            y1 = max((r + 1) * height // out_h, y0 + 1)
            for c in range(out_w):
                x0 = c * width // out_w
                x1 = max((c + 1) * width // out_w, x0 + 1)
                s = sum(
                    gray[y * width + x]
                    for y in range(y0, y1)
                    for x in range(x0, x1)
                )
                out.append(s // ((y1 - y0) * (x1 - x0)))
        return out

    rnd = random.Random(3)
    for w, h, ow, oh in [(9, 8, 9, 8), (13, 7, 9, 8), (5, 3, 9, 8), (40, 33, 8, 8)]:
        buf = bytes(rnd.randrange(256) for _ in range(w * h))
        assert MM.box_resample_gray(buf, w, h, ow, oh) == naive(buf, w, h, ow, oh)


def test_audio_landmark_keys_translation_invariant():
    # prepending audio shifts peak positions but not (values, gaps):
    # every original triple key survives except at the junction
    samples = [((i * 37 + 11) % 128 - 64) * 256 for i in range(400)]
    wav = MM.wav_encode_pcm16(samples)
    wav_ins = MM.wav_encode_pcm16([5000, -9000, 3000] + samples)
    k0 = set(MM.audio_peak_triple_keys(wav))
    k1 = set(MM.audio_peak_triple_keys(wav_ins))
    assert len(k0) > 20
    assert len(k0 & k1) >= len(k0) - 3  # only junction triples may differ
    # whereas the envelope hash moves by many bits under the same edit
    fp0, fp1 = MM.audio_fp_bytes(wav), MM.audio_fp_bytes(wav_ins)
    ham = sum(bin(a ^ b).count("1") for a, b in zip(fp0, fp1))
    assert ham > 6


def test_audio_landmark_pairs_spark(spark):
    texts = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "xx" + "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different content with nothing in common here at all"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    wav = MM.charcode_wav_payloads(df)
    keys = MM.audio_landmark_rows(wav)
    pairs = MM.audio_landmark_pairs(keys, min_shared=5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got
    from bearysta_spark.cachescope import release_scoped_caches

    release_scoped_caches()


# -- real-media ingestion round trip (r07): write_media_files → on-disk
# fixture corpus → read_media_corpus (binaryFile) → the SAME hash
# pipelines the synthetic-path queries use ---------------------------------


def _near_dup_texts(spark):
    t = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches quietly from the garden fence nearby today"
    )
    return spark.createDataFrame(
        [(10, t), (11, t + " x"), (12, "entirely different words " * 5)],
        "doc_id long, text string",
    )


def test_media_roundtrip_image_dedup(spark, tmp_path):
    root = str(tmp_path / "imgs")
    pngs = MM.charcount_grid_pngs(_near_dup_texts(spark), "abcdefghijklmnopqr")
    assert MM.write_media_files(pngs, root, ext="png").count() == 3
    corpus = MM.read_media_corpus(spark, root, glob="*.png")
    assert sorted(r.doc_id for r in corpus.select("doc_id").collect()) == [10, 11, 12]
    hashes = MM.dhash_rows(corpus)
    pairs = MM.phash_near_pairs(hashes, max_hamming=6)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (10, 11) in got and (10, 12) not in got
    from bearysta_spark.cachescope import release_scoped_caches

    release_scoped_caches()


def test_media_roundtrip_audio_dedup(spark, tmp_path):
    root = str(tmp_path / "wavs")
    wavs = MM.charcode_wav_payloads(_near_dup_texts(spark))
    assert MM.write_media_files(wavs, root, ext="wav").count() == 3
    corpus = MM.read_media_corpus(spark, root, glob="*.wav")
    keys = MM.audio_landmark_rows(corpus)
    pairs = MM.audio_landmark_pairs(keys, min_shared=5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (10, 11) in got and (10, 12) not in got
    # envelope fingerprints flow through the same frame too
    fps = MM.audio_fp_rows(corpus)
    assert fps.filter("hash_bytes is not null").count() == 3
    from bearysta_spark.cachescope import release_scoped_caches

    release_scoped_caches()


def test_media_roundtrip_video_dedup(spark, tmp_path):
    root = str(tmp_path / "vids")
    # video near-dup needs SAME-LENGTH texts (slice boundaries are
    # length-relative): doc 11 differs from 10 only in the final 10
    # chars, so the first 3 of 4 frames are identical
    t = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches quietly from the garden fence nearby today"
    )
    texts = spark.createDataFrame(
        [(10, t), (11, t[:-10] + "qqqqqqqqqq"), (12, "z o " * 27 + "end")],
        "doc_id long, text string",
    )
    vids = MM.charcount_video_payloads(texts, "abcdefghijklmnopqr")
    assert MM.write_media_files(vids, root, ext="y4m").count() == 3
    corpus = MM.read_media_corpus(spark, root, glob="*.y4m")
    fh = MM.video_frame_hashes(corpus)
    pairs = MM.video_shared_frame_pairs(fh, min_shared=2)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (10, 11) in got and (10, 12) not in got
    from bearysta_spark.cachescope import release_scoped_caches

    release_scoped_caches()


def test_media_corpus_plan_single_binaryfile_pass(spark, tmp_path):
    # plan pin (r06 VERDICT ask #3): the hash stage reads the
    # binaryFile relation ONCE, and a length predicate reaches the scan
    # as a pushed data filter (binaryFile supports length/path
    # pushdown) — payload bytes are never read twice
    import contextlib
    import io

    root = str(tmp_path / "imgs")
    pngs = MM.charcount_grid_pngs(_near_dup_texts(spark), "abcdefghijklmnopqr")
    MM.write_media_files(pngs, root, ext="png").count()
    corpus = MM.read_media_corpus(spark, root, glob="*.png")
    hashes = MM.dhash_rows(corpus.filter(F.col("length") < 10_000_000))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hashes.explain("formatted")
    p = buf.getvalue()
    # one scan node = exactly two mentions in formatted output (tree
    # line + detail header); payload bytes are read once
    assert p.count("Scan binaryFile") == 2
    assert "LessThan(length,10000000)" in p
    # column pruning: modificationTime never read
    assert "modificationTime" not in p


def test_read_media_corpus_id_modes(spark, tmp_path):
    root = str(tmp_path / "m")
    wavs = MM.charcode_wav_payloads(_near_dup_texts(spark))
    MM.write_media_files(wavs, root, ext="wav").count()
    by_hash = MM.read_media_corpus(spark, root, id_from="hash")
    rows = by_hash.select("doc_id", "path").collect()
    assert len({r.doc_id for r in rows}) == 3  # distinct per path
    with pytest.raises(ValueError, match="id_from"):
        MM.read_media_corpus(spark, root, id_from="bogus")


def test_streaming_audio_neardup_matches_batch_and_survives_replay(
    spark, documents, tmp_path
):
    # audio arm of the streaming dedup family: landmark keys stream in
    # two micro-batches against the persisted key index; union of
    # outputs equals the batch incremental result, and a truncated
    # checkpoint (mid-batch kill) must not duplicate pairs
    from bearysta_spark.streaming.neardup import start_streaming_audio_neardup

    wavs = MM.charcode_wav_payloads(documents.limit(200))
    corp_keys = MM.audio_landmark_rows(wavs.filter(F.col("doc_id") % 10 != 0))
    inc = wavs.filter(F.col("doc_id") % 10 == 0)

    index = str(tmp_path / "lm_index")
    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    MM.write_key_index(corp_keys, index)

    inc.filter(F.col("doc_id") % 20 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(land)

    def run_once():
        stream = spark.readStream.schema("doc_id long, payload binary").parquet(
            land
        )
        q = start_streaming_audio_neardup(stream, index, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    _truncate_last_commit(ckpt)
    inc.filter(F.col("doc_id") % 20 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    got = sorted(
        (r["corpus_id"], r["new_id"], r["shared_keys"])
        for r in spark.read.parquet(out)
        .select("corpus_id", "new_id", "shared_keys")
        .collect()
    )
    want = sorted(
        (r["corpus_id"], r["new_id"], r["shared_keys"])
        for r in MM.incremental_key_pairs(
            spark.read.parquet(index), MM.audio_landmark_rows(inc)
        ).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_audio_neardup_envelope_method(spark, documents, tmp_path):
    # the cheap-variant arm: envelope fingerprints probed against a
    # phash index, same machinery as the image stream
    from bearysta_spark.streaming.neardup import start_streaming_audio_neardup

    docs = documents.limit(60).select("doc_id", "text")
    # plant an exact duplicate of corpus doc 1 in the increment id
    # space so the stream provably emits at least one pair
    dup = docs.filter(F.col("doc_id") == 1).select(
        F.lit(10000).alias("doc_id"), "text"
    )
    wavs = MM.charcode_wav_payloads(docs.unionAll(dup))
    corp_h = MM.audio_fp_rows(wavs.filter(F.col("doc_id") % 10 != 0))
    inc = wavs.filter(F.col("doc_id") % 10 == 0)

    index = str(tmp_path / "fp_index")
    land = str(tmp_path / "land")
    MM.write_phash_index(corp_h, index)
    inc.coalesce(1).write.parquet(land)

    stream = spark.readStream.schema("doc_id long, payload binary").parquet(land)
    q = start_streaming_audio_neardup(
        stream, index, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        method="envelope",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["corpus_id"], r["new_id"], r["hamming"])
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("corpus_id", "new_id", "hamming")
        .collect()
    )
    want = sorted(
        (r["corpus_id"], r["new_id"], r["hamming"])
        for r in MM.incremental_phash_pairs(
            spark.read.parquet(index), MM.audio_fp_rows(inc)
        ).collect()
    )
    assert got == want and len(got) > 0
    with pytest.raises(ValueError, match="method"):
        start_streaming_audio_neardup(stream, index, "x", "y", method="nope")


def test_streaming_video_neardup_matches_batch_and_survives_replay(
    spark, documents, tmp_path
):
    from bearysta_spark.queries import _PHASH_LETTERS
    from bearysta_spark.streaming.neardup import start_streaming_video_neardup

    docs = documents.limit(120).select("doc_id", "text")
    # plant exact duplicates of corpus docs 1 and 3 in the increment id
    # space (one per micro-batch: 10000 % 20 == 0 lands in batch 0,
    # 10010 % 20 != 0 in batch 1) so both batches emit pairs
    dups = docs.filter(F.col("doc_id").isin([1, 3])).select(
        F.when(F.col("doc_id") == 1, F.lit(10000))
        .otherwise(F.lit(10010))
        .alias("doc_id"),
        "text",
    )
    vids = MM.charcount_video_payloads(
        docs.unionAll(dups), _PHASH_LETTERS
    )
    corp_fh = MM.video_frame_hashes(vids.filter(F.col("doc_id") % 10 != 0))
    inc = vids.filter(F.col("doc_id") % 10 == 0)

    index = str(tmp_path / "vf_index")
    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    MM.write_key_index(MM.video_frame_keys(corp_fh), index)

    inc.filter(F.col("doc_id") % 20 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(land)

    def run_once():
        stream = spark.readStream.schema("doc_id long, payload binary").parquet(
            land
        )
        q = start_streaming_video_neardup(stream, index, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    _truncate_last_commit(ckpt)
    inc.filter(F.col("doc_id") % 20 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    got = sorted(
        (r["corpus_id"], r["new_id"], r["shared_keys"])
        for r in spark.read.parquet(out)
        .select("corpus_id", "new_id", "shared_keys")
        .collect()
    )
    want = sorted(
        (r["corpus_id"], r["new_id"], r["shared_keys"])
        for r in MM.incremental_key_pairs(
            spark.read.parquet(index),
            MM.video_frame_keys(MM.video_frame_hashes(inc)),
            min_shared=2,
        ).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_self_neardup_grows_index_and_survives_replay(
    spark, tmp_path
):
    # the self-growing loop: batch 1 docs must match batch 0 docs (the
    # index grew), within-batch dups match once, and a truncated
    # checkpoint replay neither duplicates pairs nor matches a batch
    # against its own replayed keys
    from bearysta_spark.streaming.neardup import start_streaming_self_neardup

    t1 = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches quietly from the garden fence nearby today"
    )
    t2 = "completely different content with nothing in common here at all okay"
    rows = [
        (0, t1),            # batch 0
        (1, t2),            # batch 0
        (2, "x " + t1),     # batch 0: within-batch near-dup of 0
        (10, t1 + " yz"),   # batch 1: cross-batch near-dup of 0 and 2
        (11, "unrelated words strung together for a quiet control row"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wavs = MM.charcode_wav_payloads(docs).cache()
    b0 = wavs.filter(F.col("doc_id") < 10)
    b1 = wavs.filter(F.col("doc_id") >= 10)

    index = str(tmp_path / "grow_index")
    land = str(tmp_path / "land")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema("doc_id long, payload binary").parquet(
            land
        )
        q = start_streaming_self_neardup(
            stream, index, out, ckpt,
            extractor=lambda df: MM.audio_landmark_rows(df),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    b0.coalesce(1).write.mode("append").parquet(land)
    run_once()
    _truncate_last_commit(ckpt)  # die between execute and commit
    b1.coalesce(1).write.mode("append").parquet(land)
    run_once()  # replays batch 0 against an index that already has its keys

    got = sorted(
        (min(r.corpus_id, r.new_id), max(r.corpus_id, r.new_id), r.shared_keys)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.id_a, r.id_b, r.shared_keys)
        for r in MM.audio_landmark_pairs(
            MM.audio_landmark_rows(wavs), min_shared=5
        ).collect()
    )
    assert got == want
    assert {(a, b) for a, b, _ in got} >= {(0, 2), (0, 10), (2, 10)}
    wavs.unpersist()
    from bearysta_spark.cachescope import release_scoped_caches

    release_scoped_caches()


def test_media_ingest_dedup_cleans_stale_corpus(spark, tmp_path, monkeypatch):
    """r08 VERDICT #3: a previous LARGER corpus run leaves stale media
    files under the corpus root; the directory glob must not re-ingest
    them. The guard now routes through delete_dir (Hadoop FS on URI
    roots, rmtree locally), so the histogram always reflects THIS run's
    corpus."""
    import os

    from bearysta_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    monkeypatch.setenv("BEARYSTA_INDEX_DIR", str(tmp_path))
    stale_dir = str(
        tmp_path / f"media_corpus_{os.path.basename(sf)}"
    )
    os.makedirs(stale_dir, exist_ok=True)
    # a stale "doc" with an id far outside the corpus and junk bytes
    with open(os.path.join(stale_dir, "999999999.png"), "wb") as f:
        f.write(b"\x89PNG stale leftover bytes")
    got = QUERIES["media_ingest_dedup"](spark, sf).collect()
    # fresh-run histogram: total docs across clusters == corpus size,
    # and no keeper is the stale id
    d = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = d.count()
    assert sum(r.n_copies * r.n_clusters for r in got) == n_docs
    assert all(r.min_keeper < 999999999 for r in got)
    from bearysta_spark.cachescope import release_scoped_caches

    release_scoped_caches()


def test_delete_dir_local_and_missing(spark, tmp_path):
    from bearysta_spark.streaming.index import delete_dir

    p = tmp_path / "gone"
    (p / "sub").mkdir(parents=True)
    (p / "sub" / "f.txt").write_text("x")
    delete_dir(spark, str(p))
    assert not p.exists()
    delete_dir(spark, str(p))  # missing path is a no-op
    # URI-schemed local path exercises the Hadoop FS branch
    q = tmp_path / "gone2"
    q.mkdir()
    (q / "f.txt").write_text("x")
    delete_dir(spark, "file://" + str(q))
    assert not q.exists()
