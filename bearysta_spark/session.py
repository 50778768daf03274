"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same config block is what we would
ship to a 1000-executor cluster (AQE handles runtime re-planning, skew
joins, and shuffle-partition coalescing there — at cluster scale only
`spark.sql.shuffle.partitions` / executor sizing change).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(app_name: str = "bearysta_spark", cpus: int | None = None) -> SparkSession:
    """Build (or get) a SparkSession.

    Settings rationale (100 TB design notes):
    - AQE on: runtime shuffle coalescing + skew-join splitting; at scale
      this is what keeps the group-agg / ratio_of joins balanced.
    - shuffle.partitions ~ cores locally; on a real cluster this is set
      to 2-3x total executor cores and AQE coalesces down.
    - Arrow on: every Pandas-UDF extension operator (minhash, embedding
      kernels, multimodal decode) moves batches via Arrow, not pickle.
    - session timezone pinned UTC: parity with DuckDB/parquet timestamps.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # warehouse for bucketed saveAsTable (static conf — set at build)
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "bearysta_spark_warehouse"),
        )
    )
    return builder.getOrCreate()
