"""Streaming pipelines over the events table.

Design: `readStream` over the parquet directory (file source — stands in
for Kafka; the transformations are source-agnostic), event-time
watermarks bound state, windowed aggregations run with partial
aggregation + state store. At scale the state store is RocksDB-backed
and the only tuning point is watermark delay vs. late-data tolerance.

Batch/stream parity: hourly_rollup_stream computes exactly the batch
`events_hourly` query (date_trunc ≡ 1-hour tumbling window start) — the
test suite asserts equality of the two results.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# Default when the directory is empty at stream-definition time (the
# object-store ingestion pattern: files land after the stream starts).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # nanos-as-long (see tables.load_events)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet; ts normalized to a timestamp.

    The file source wants a directory — point it at the sf dir with a
    glob filter (new event files landing there stream in incrementally,
    the object-store ingestion pattern). maxFilesPerTrigger bounds each
    micro-batch.

    The stream schema is probed from a batch read of the same files so
    both physical encodings of `ts` work: legacy nanos-as-long (bigint)
    and native parquet timestamp[us] (TIMESTAMP_NTZ). withWatermark
    requires TIMESTAMP — NTZ is cast (session TZ pinned UTC, so the cast
    is offset-free). An empty directory falls back to the nanos schema.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        probe = (
            spark.read.option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .schema
        )
    except AnalysisException:  # no files yet — start on the default schema
        probe = EVENTS_RAW_SCHEMA
    raw = (
        spark.readStream.schema(probe)
        .option("maxFilesPerTrigger", 4)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = probe["ts"].dataType
    if isinstance(ts_type, LongType):
        raw = raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    elif isinstance(ts_type, TimestampNTZType):
        # NTZ→TIMESTAMP reinterprets the wall-clock in the session TZ;
        # the engine pins UTC (session.py) so the cast is offset-free.
        # Assert rather than assume: under a non-UTC session this would
        # silently shift every watermark/window boundary.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            raise AssertionError(
                f"events_stream requires an UTC session timezone for the "
                f"NTZ ts cast; got {tz!r} (set spark.sql.session.timeZone=UTC)"
            )
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_rollup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour window counts/sums per event_type with a
    watermark bounding state. Output schema matches the batch
    events_hourly query (window.start aliased to hour)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )


def sliding_rollup_stream(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Sliding 1-hour windows advancing every 15 minutes (each event in
    4 windows; the window operator expands scan-side, partial-aggregates
    map-side). Matches the batch events_sliding_windows query — the
    parity test asserts equality."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "total_value"
        )
    )


def daily_type_counts_stream(
    events: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    """Tumbling 1-day window counts per event_type — the stateful half
    of a streaming 'trending now' board. Top-k ranking is NOT a
    streaming-supported operator (no rank over an open window); the
    intended composition is this watermarked aggregate feeding a
    complete/update sink, with the k-row rank applied per refresh on
    the materialized days×types table (tiny) — exactly what the batch
    events_trending query does, and what its parity test asserts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            F.col("w.start").cast("date").alias("day"), "event_type", "cnt"
        )
    )


def session_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (session_window) — the streaming
    equivalent of the batch lag-gap sessionization."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select("user_id", F.col("w.start").alias("start"), F.col("w.end").alias("end"), "n_events")
    )


def view_click_join_stream(
    events: DataFrame, max_delay: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: each view paired with the same
    user's clicks landing within `max_delay` AFTER it (attribution
    join). Both sides carry a watermark and the join condition bounds
    click_ts to [view_ts, view_ts + max_delay], so Spark can expire
    buffered state on both sides — an unbounded-condition stream join
    would accumulate state forever. At scale state is partitioned by
    user_id (the equi-key); the interval bound is what keeps per-key
    state O(watermark window), independent of stream length."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    return views.join(
        clicks,
        F.expr(
            "user_id = click_user AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + interval {max_delay}"
        ),
    ).select("user_id", "view_id", "click_id", "view_ts", "click_ts")


def enriched_stream(events: DataFrame, dims: DataFrame) -> DataFrame:
    """Stream-static broadcast enrichment: join each micro-batch against
    a static dimension table (user → segment here). The static side is
    re-planned per batch, so at scale it broadcasts once per trigger —
    the standard dimension-lookup pattern; no state store involved
    (unlike stream-stream joins)."""
    return events.join(F.broadcast(dims), "user_id", "left")


def run_stream_to_memory(
    spark: SparkSession, agg: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming aggregation to completion against the static
    file backlog (processAllAvailable) and return the materialized
    result — the local-smoke harness for every streaming operator."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
