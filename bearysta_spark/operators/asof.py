"""As-of (most-recent-match) join — a temporal operator Spark lacks.

Formulation (pure DataFrame ops, no Python): tag left/right rows, union
them, and per partition-key take the last right-side value at-or-before
each left row's timestamp via a running `last(ignorenulls=True)` window.
One shuffle on (keys, time) — same cost as a window function — versus
the naive range-join which explodes to |L|·|R| per key.

This is the pattern pd.merge_asof users need at scale (backward
direction, optional tolerance). The window sort is (time, is_left) so a
right row at exactly t matches a left row at t.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.on <= left.on (within the same `by` keys, and within
    `tolerance_seconds` when given).

    right_cols: right columns to carry (default: all non-key,
    non-time). Carried columns are renamed with `suffix` on clashes.

    tolerance_seconds requires a timestamp-typed `on` column (TIMESTAMP
    or TIMESTAMP_NTZ); the gap is computed with timestampdiff on the
    original type, so NTZ inputs are DST-safe regardless of session TZ
    and numeric time columns fail fast instead of being silently read
    as epoch seconds.
    """
    by = list(by)
    if tolerance_seconds is not None:
        on_type = left.schema[on].dataType
        if not isinstance(on_type, (TimestampType, TimestampNTZType)):
            raise TypeError(
                f"asof_join tolerance_seconds requires a timestamp `on` "
                f"column; {on!r} is {on_type.simpleString()}"
            )
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    lt = left.withColumn("__is_left", F.lit(1))
    rt = right.select(
        *by, F.col(on), *[F.col(c).alias(out_names[c]) for c in right_cols]
    ).withColumn("__is_left", F.lit(0))

    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal time → exact-time match
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the matched right ROW as one struct: per-column
    # last(ignorenulls) would skip a matched row's NULL value and attach
    # an older row's non-NULL one instead, and could tolerance-check
    # against a timestamp the value didn't come from. merge_asof /
    # DuckDB ASOF attach the matched row's values even when NULL.
    rstruct = F.when(
        F.col("__is_left") == 0,
        F.struct(
            F.col(on).alias("__rt"), *[F.col(out_names[c]) for c in right_cols]
        ),
    )
    filled = unioned.withColumn("__r", F.last(rstruct, ignorenulls=True).over(w))
    keep = F.col("__r").isNotNull()
    if tolerance_seconds is not None:
        keep = keep & (
            F.timestamp_diff("MICROSECOND", F.col("__r.__rt"), F.col(on))
            <= int(tolerance_seconds * 1_000_000)
        )
    for c in right_cols:
        filled = filled.withColumn(
            out_names[c], F.when(keep, F.col(f"__r.{out_names[c]}"))
        )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left", "__r")
