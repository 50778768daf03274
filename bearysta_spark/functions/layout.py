"""Data-layout optimization: Z-order (Morton) interleaving for
multi-dimensional file clustering.

Why this exists: `sinks.write_corpus(cluster_by=...)` gives tight
parquet min/max stats on ONE sort prefix — predicates on the first
cluster column prune files, predicates on any other column don't. A
Z-order key interleaves the bits of several bucketed dimensions so that
sorting by the single key keeps EVERY participating dimension locally
narrow per file: point/range predicates on any of them skip most shards.
This is the layout trick behind Delta/Iceberg `ZORDER BY`, expressed
here as a plain Column function usable with any writer.

All arithmetic is integer bit manipulation inside whole-stage codegen —
no UDFs, no shuffle of its own (the write's local sort does the work).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column | str, lo: float, hi: float, bits: int = 8) -> Column:
    """Map a numeric column into [0, 2^bits) by linear range bucketing
    (clamped). `lo`/`hi` come from table stats or domain knowledge; at
    100 TB compute them once with a scalar min/max aggregate — two
    numbers on the driver, not data."""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    scaled = F.floor((c - F.lit(lo)) / F.lit(hi - lo) * n).cast("long")
    return F.greatest(F.lit(0), F.least(scaled, F.lit(n - 1)))


def hash_bucket(col: Column | str, bits: int = 8) -> Column:
    """Map an arbitrary (e.g. id) column into [0, 2^bits) by hashing —
    the bucketing for dimensions with no meaningful order, so equality
    predicates still prune after Z-ordering."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(1 << bits)).cast("long")


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Morton-interleave `bits` low bits of each (already-bucketed,
    non-negative) column: output bit j·len(cols)+i is bit j of cols[i].
    Sorting by the result clusters rows so every dimension varies
    slowly — the multi-column generalization of `cluster_by`.

    bits·len(cols) must fit a long (≤ 63). The expansion is a flat sum
    of shift/mask terms — pure codegen, constant-folded shifts.
    """
    ncols = len(cols)
    if ncols == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * ncols > 63:
        raise ValueError(f"bits*ncols = {bits * ncols} exceeds 63")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    out = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, j * ncols + i)
    return out


def with_zorder(
    df: DataFrame,
    spec: dict[str, Column],
    bits: int = 8,
    key_col: str = "_zorder",
) -> DataFrame:
    """Attach a Z-order key built from a {name: bucketed-column} spec.
    Use with sinks.write_corpus(cluster_by=[key_col]) — the helper keeps
    the bucketed dims as columns too so min/max stats exist for them."""
    out = df
    names = []
    for name, col in spec.items():
        out = out.withColumn(name, col)
        names.append(name)
    return out.withColumn(key_col, zorder_key(names, bits))
