"""DataFrame→DataFrame operator library (SURVEY.md §2 inventory).

Each operator is a pure function over pyspark DataFrames, expressed with
built-in pyspark.sql.functions so Catalyst can push filters / prune
columns / pick join strategies. Python UDFs appear nowhere in this
package; extensions that genuinely need Python use Arrow-batched Pandas
UDFs under bearysta_spark.functions.
"""

from bearysta_spark.operators.aggregate import AGG_FUNCS, agg_expr, group_agg, pivot_table
from bearysta_spark.operators.filters import filter_in, filter_out
from bearysta_spark.operators.ratio import ratio_of
from bearysta_spark.operators.reshape import pack, unpack
from bearysta_spark.operators.expected import expected_fill

__all__ = [
    "AGG_FUNCS",
    "agg_expr",
    "group_agg",
    "pivot_table",
    "filter_in",
    "filter_out",
    "ratio_of",
    "pack",
    "unpack",
    "expected_fill",
]
