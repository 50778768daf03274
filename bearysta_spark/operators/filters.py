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


def _as_list(v) -> list:
    return list(v) if isinstance(v, (list, tuple, set)) else [v]


def filter_in(df: DataFrame, spec: Mapping[str, Sequence]) -> DataFrame:
    """Keep rows where col ∈ values, per column (AND across columns)."""
    for col, vals in spec.items():
        if col in df.columns:
            df = df.filter(F.col(col).isin(_as_list(vals)))
    return df


def filter_out(df: DataFrame, spec: Mapping[str, Sequence]) -> DataFrame:
    """Drop rows where col ∈ values, per column.

    NULL parity: pandas `~isin` keeps NaN rows; Spark `~isin` would drop
    NULLs (NULL.isin → NULL), so we explicitly keep them.
    """
    for col, vals in spec.items():
        if col in df.columns:
            c = F.col(col)
            df = df.filter(~c.isin(_as_list(vals)) | c.isNull())
    return df
