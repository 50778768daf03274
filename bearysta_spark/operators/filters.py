"""Value-list filters (SURVEY §2.3).

filter-in / filter-out (reference aggregate.py:548-551 / :341-344): keep
or drop rows whose column value is in a list. Pure `isin` predicates —
Catalyst pushes these into the parquet scan (visible as PushedFilters),
so at 100 TB they become row-group skipping, not a post-scan filter.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bearysta_spark.colnames import qcol


def _as_list(v) -> list:
    return list(v) if isinstance(v, (list, tuple, set)) else [v]


def _member(df: DataFrame, col: str, vals: list):
    """ANSI-safe membership: recipe YAML lists freely mix numbers and
    words against columns of either type (filter-out classes: [2, 3] on
    a string column holding 'n/a'); a plain isin would ANSI-cast and
    throw where pandas just doesn't match. Numeric-vs-string pairs
    compare through try_cast (matching pandas' per-cell parsed object
    columns); the homogeneous remainder stays one pushdown-friendly
    isin."""
    from pyspark.sql.types import NumericType, StringType

    c = qcol(col)
    dt = df.schema[col].dataType
    direct, crossed = [], []
    for v in vals:
        if isinstance(dt, NumericType) and isinstance(v, str):
            try:
                crossed.append(c == F.lit(float(v)))
            except ValueError:
                pass  # word vs numeric column: never equal
        elif (
            isinstance(dt, StringType)
            and isinstance(v, (int, float))
            and not isinstance(v, bool)
        ):
            crossed.append(c.try_cast("double") == F.lit(float(v)))
        else:
            direct.append(v)
    preds = ([c.isin(direct)] if direct else []) + crossed
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def filter_in(df: DataFrame, spec: Mapping[str, Sequence]) -> DataFrame:
    """Keep rows where col ∈ values, per column (AND across columns).

    No coalesce wrapper: filter(NULL) already drops the row, and a bare
    isin stays pushable into the parquet scan (plan-asserted)."""
    for col, vals in spec.items():
        if col in df.columns:
            df = df.filter(_member(df, col, _as_list(vals)))
    return df


def filter_out(df: DataFrame, spec: Mapping[str, Sequence]) -> DataFrame:
    """Drop rows where col ∈ values, per column.

    NULL parity: pandas `~isin` keeps NaN rows; Spark `~isin` would drop
    NULLs (NULL.isin → NULL), so we explicitly keep them — the
    Not(In) OR IsNull shape also stays scan-pushable.
    """
    for col, vals in spec.items():
        if col in df.columns:
            c = qcol(col)
            df = df.filter(~_member(df, col, _as_list(vals)) | c.isNull())
    return df
