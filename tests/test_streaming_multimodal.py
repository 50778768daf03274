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
    assert set(fr.columns) == {"doc_id", "frame", "payload"}


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
