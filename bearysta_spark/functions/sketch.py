"""Mergeable sketch summaries as DataFrame state — count-min sketch.

A CMS is d×w integer cells; cell (i, hash_i(key) % w) accumulates every
occurrence of `key`. Estimates read min over the key's d cells and never
undercount. The properties that matter at 100 TB:

- **The sketch IS a keyed aggregate**: cells are (i, bucket) group keys,
  so partial sketches combine by cell-wise sum — map-side combine and
  streaming state both apply with zero extra machinery.
- **Fixed size**: d×w cells regardless of corpus/stream length — the
  bounded-state frequency summary for open-ended key spaces where exact
  per-key counters (running_user_totals) would grow without limit.
- **md5-derived bucket hashing**: replayable in any SQL engine
  (('0x'||substr(md5(..),1,15))::BIGINT arithmetic), which is what lets
  the cms_heavy_hitters driver oracle check the sketch exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key: Column, i: Column, w: int) -> Column:
    """Row-i CMS bucket for a string key: low 60 bits of
    md5(key || ':cms' || i) mod w — identical to the DuckDB
    ('0x'||substr(md5,1,15))::BIGINT % w arithmetic."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(key, F.lit(":cms"), i.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_cell_rows(
    df: DataFrame,
    key_col: str = "user_id",
    weight_col: str | None = None,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Explode each input row into its d sketch cells:
    (i, bucket, __w). Pure scan-side codegen; feed to a groupBy-sum
    (batch) or a stateful counter (streaming)."""
    key = F.col(key_col).cast("string")
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(
            key.alias("__k"),
            wcol.alias("__w"),
            F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
        )
        .select(
            F.col("i").cast("int").alias("i"),
            cms_bucket(F.col("__k"), F.col("i"), w).alias("bucket"),
            "__w",
        )
    )


def cms_cells(
    df: DataFrame,
    key_col: str = "user_id",
    weight_col: str | None = None,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """The batch sketch: (i, bucket, cnt) with cnt = total weight landing
    in the cell. One map-side-combined aggregate over ≤ d×w groups."""
    return (
        cms_cell_rows(df, key_col, weight_col, d, w)
        .groupBy("i", "bucket")
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Point estimates for a key set: join each key's d cells, take the
    min — adds (key_col, est) to `keys`. The cells frame is ≤ d×w rows,
    always broadcast."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
    ).select(
        key_col,
        F.col("i").cast("int").alias("i"),
        cms_bucket(key, F.col("i"), w).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )
