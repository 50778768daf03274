"""Banded (bucketized) interval join.

Spark plans a plain `value BETWEEN lo AND hi` join as a broadcast
nested loop — O(rows × intervals) comparisons, and a non-broadcastable
interval side falls off a cliff. Bucketizing turns it into an
equi-join: values key by floor(value / width), intervals explode to
every bucket they overlap, the join runs hash-partitioned on the bucket
key, and a residual predicate removes the partial-overlap false hits.

Cost model: interval replication = ceil(span / width) + 1 rows each, so
pick `width` near the typical interval span (replication ~2×); probe
rows are never replicated. This is the standard open-source answer to
the range-join optimization commercial Spark forks bolt on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    probe: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join probe rows to every interval with lo <= value < hi.

    Equals the naive range join; the plan is explode + equi-join +
    residual filter instead of a nested loop. A probe row joins through
    exactly one bucket (its own), so no post-join dedup is needed."""
    p = probe.withColumn(
        "__bucket", F.floor(F.col(value_col) / F.lit(width)).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(width)).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "__bucket", how)
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("__bucket")
    )
