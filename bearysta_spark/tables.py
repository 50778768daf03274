"""Test-data table loaders.

The driver's tables (TESTDATA.md) are plain parquet; `events.parquet`
carries TIMESTAMP(NANOS) which Spark's parquet reader rejects unless
`spark.sql.legacy.parquet.nanosAsLong` is set — we set it at runtime
(works on a caller-provided session) and convert the raw nanosecond
longs to proper microsecond timestamps.

At 100 TB these reads stay exactly the same — parquet scans with
predicate pushdown and column pruning; only the path changes to object
storage and the tables gain partition columns (e.g. orders by
o_orderdate month) which Catalyst prunes from the same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` as a proper TimestampType (µs).

    The nanosAsLong conf is runtime-settable; flipping it only affects
    parquet footer interpretation for reads planned afterwards.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
