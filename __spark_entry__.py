"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in bearysta_spark/queries.py; this module stays a
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path with an arbitrary cwd — make
# the sibling bearysta_spark package importable regardless
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape group-agg) on /root/testdata/sf0.001."""
    from bearysta_spark.queries import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-pipeline extension operators)."""
    from bearysta_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents; queries without an entry
    here are non-SQL-expressible and get the driver's rows-only check."""
    from bearysta_spark.queries import ORACLE

    return dict(ORACLE)
