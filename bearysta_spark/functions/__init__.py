"""Large-scale training-data pipeline functions (beyond-reference surface).

Column-level building blocks for deduplication, text analysis,
similarity search, and multimodal columns. Everything here returns
pyspark Column expressions or DataFrame transforms built from JVM-side
built-ins wherever possible; Python appears only as Arrow-batched Pandas
UDFs in clearly-marked slow paths.
"""
