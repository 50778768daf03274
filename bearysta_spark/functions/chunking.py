"""Document chunking: split long texts into fixed-token windows with
overlap — the pretraining prep step between cleaning and packing
(context-window-sized training examples from arbitrarily long docs).

Scale design: pure codegen expressions end to end — tokenize once per
row (regexp_extract_all), compute the chunk count arithmetically, then
explode(sequence(...)) and slice the SAME token array per chunk. No
shuffle at all: chunking is embarrassingly row-parallel, and the
explode fan-out (~len/stride per doc) happens inside the scan stage.
The one sizing concern at 100 TB is output partition width — a
chunk_size/stride of 2048/1536 multiplies bytes ~1.3×; set
maxPartitionBytes accordingly or repartition after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[a-z0-9]+"


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Window i covers tokens [i*stride, i*stride + chunk_size); with
    stride < chunk_size consecutive windows share (chunk_size - stride)
    tokens. Chunk count = ceil(max(n_tokens - overlap, 1) / stride), so
    every token lands in ≥1 chunk and a short doc yields exactly one.
    Returns (id_col, chunk_id, chunk, n_tokens); the final (ragged)
    window keeps whatever tokens remain.
    """
    if not 0 < stride <= chunk_size:
        raise ValueError(f"need 0 < stride <= chunk_size, got {stride}/{chunk_size}")
    overlap = chunk_size - stride
    toks = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)
    n_chunks = F.ceil(
        F.greatest(F.size(F.col("__toks")) - overlap, F.lit(1)) / F.lit(stride)
    ).cast("long")
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id").cast("int") * stride + 1, chunk_size
    )
    return (
        df.withColumn("__toks", toks)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_id"
            ),
            "__toks",
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(piece, " ").alias("chunk"),
            F.size(piece).cast("long").alias("n_tokens"),
        )
    )
