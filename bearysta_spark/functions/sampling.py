"""Deterministic sampling for training-data pipelines.

Reproducibility is the requirement samplers usually break: `rand()`
varies across runs/partitionings. Hash-ordered sampling (order within
each stratum by a content hash, take the first n) is fully deterministic
for a given dataset — reruns, re-partitions, and other engines produce
the same sample. Cost: one window shuffle on the stratum key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    order_key: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Take n rows per stratum, chosen by md5-hash order of
    `order_key` (default: the id column) — deterministic and
    engine-portable. Ties broken by the id column."""
    key = F.md5(F.col(order_key if order_key else id_col).cast("string"))
    w = Window.partitionBy(*strata).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def proportional_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~fraction of rows by hash-bucket threshold — deterministic,
    no shuffle at all (a scan-side filter), stable under reruns and
    appends (a row's fate depends only on its id)."""
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(1_000_000))
    return df.filter(bucket < int(fraction * 1_000_000))
