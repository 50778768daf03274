"""Sequence packing: assign documents to fixed token-budget training
bins ("concat then chunk" packing — documents are laid end-to-end in a
deterministic order and cut every `budget` tokens; a doc belongs to the
bin where its first token lands).

Scale shape: one window shuffle on the stream key (e.g. source); within
each stream the cumulative sum is a single pass. For 100 TB, streams
are the parallelism unit — packing is embarrassingly parallel across
sources/shards, and a skewed stream can be pre-split by hashing the id
into sub-streams (each sub-stream packs independently).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str,
    stream_cols: Sequence[str] = ("source",),
    order_col: str = "doc_id",
    bin_col: str = "bin_id",
) -> DataFrame:
    """Add `bin_col`: the 0-based training-bin index within each stream.
    bin = floor(start_offset / budget) where start_offset is the running
    token count before this doc — deterministic given (stream, order)."""
    w = Window.partitionBy(*stream_cols).orderBy(order_col)
    start = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(bin_col, F.floor(start / budget).cast("long"))


def bin_stats(
    packed: DataFrame,
    token_col: str,
    stream_cols: Sequence[str] = ("source",),
    bin_col: str = "bin_id",
) -> DataFrame:
    """Per-bin fill report: docs and tokens per (stream, bin). Integer
    outputs — exact under any aggregation order."""
    return packed.groupBy(*stream_cols, bin_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_col).cast("long").alias("bin_tokens"),
    )
