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


def hex_threshold(fraction: float) -> str:
    """8-hex-digit acceptance threshold for md5-prefix sampling: a row is
    kept iff `md5(key) < threshold` as a STRING comparison. md5 hex is
    uniform, so P(keep) = fraction to within 16^-8, and lexicographic
    compare of lowercase hex is identical in every engine (no hex→int
    conversion needed, which DuckDB lacks)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(fraction * 16**8)
    if n >= 16**8:
        return "g"  # > every hex string → keep all ('100000000' would not:
        # it string-compares BELOW md5s that start with a letter)
    return format(n, "08x")


def weighted_mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    strat_col: str = "source",
    id_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Domain-mixture sampling: keep each stratum at its own rate (the
    'data mixture' step of a training pipeline — e.g. wiki ×0.8, web
    ×0.05). Deterministic md5-threshold acceptance — no shuffle, no rand;
    a row's fate depends only on (id, salt), so reruns and appends are
    stable and any engine reproduces the exact sample."""
    thr = F.lit(hex_threshold(default))
    for stratum, frac in weights.items():
        thr = F.when(F.col(strat_col) == stratum, F.lit(hex_threshold(frac))).otherwise(
            thr
        )
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    return df.filter(key < thr)


def hash_split(
    df: DataFrame,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split depends
    only on md5(id, salt) against cumulative hex thresholds, so the
    partition is stable under reruns, appends, and repartitioning, and
    any engine reproduces it. Scan-side expression — zero shuffle.

    `splits` maps name → fraction (must sum to ≤ 1; remainder falls into
    the last split listed)."""
    if splits is None:
        splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    names = list(splits)
    expr = F.lit(names[-1])  # remainder → last split
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += splits[name]
        arms.append((name, hex_threshold(cum)))
    for name, thr in reversed(arms):
        expr = F.when(key < thr, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def hash_split_case_sql(
    splits: dict[str, float], id_sql: str, salt: str = "split"
) -> str:
    """The ANSI-SQL twin of `hash_split` for oracle pairing."""
    names = list(splits)
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += splits[name]
        arms.append(
            f"WHEN md5({id_sql} || ':{salt}') < '{hex_threshold(cum)}' "
            f"THEN '{name}'"
        )
    return f"CASE {' '.join(arms)} ELSE '{names[-1]}' END"


def per_group_sample(
    df: DataFrame,
    k: int,
    group_cols: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    salt: str = "grp",
) -> DataFrame:
    """Exactly-k-per-group deterministic sample (e.g. "100 eval docs per
    language"): rank rows inside each group by md5(id, salt) and keep
    the first k. One window shuffle on the group key; md5 order is
    uniform, so this is an unbiased without-replacement sample that any
    engine reproduces. Ties are impossible while ids are unique, but
    id_col is a secondary sort key so the output is total-ordered
    regardless."""
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy(*group_cols).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
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
