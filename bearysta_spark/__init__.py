"""bearysta_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of IntelPython/bearysta.

The reference (read-only at /root/reference) is a single-node pandas
"recipe" aggregation engine (bearysta/aggregate.py). This package rebuilds
its semantics Spark-first: every recipe compiles to a lazy DataFrame plan
(Catalyst optimizes; the only shuffles are the group-aggregate, pivot and
ratio_of join), and extends the surface with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns, streaming) designed for 100 TB / 1000-executor scale.
"""

from bearysta_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
