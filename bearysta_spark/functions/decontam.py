"""Benchmark decontamination: flag corpus documents sharing word
n-grams with an eval/benchmark set (the step every training pipeline
runs before a data release).

Scale shape: the benchmark side is small (thousands of eval docs → a
few million distinct n-grams) and is DISTINCT-ed then broadcast, so the
corpus side — the 100 TB side — does one exploded scan and a broadcast
semi/inner join with NO shuffle of corpus data. The per-doc groupBy
that counts shared grams shuffles only the matching (doc, gram) pairs,
which is tiny (contamination is rare by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bearysta_spark.functions.dedup import _spread


def gram_rows(
    df: DataFrame, n: int, text_col: str, keep_cols: tuple[str, ...]
) -> DataFrame:
    """One row per word n-gram: explode positions, then build the gram
    with plain (whole-stage-codegen) expressions. Deliberately NOT
    `explode(transform(sequence(...)))` — higher-order array builders
    run interpreted with per-row allocation (measured 6× slower on this
    path)."""
    a = F.regexp_extract_all(F.col(text_col), F.lit("[a-z0-9]+"), 0)
    return (
        df.select(*keep_cols, a.alias("__a"))
        .filter(F.size("__a") >= n)
        .select(
            *keep_cols,
            "__a",
            F.explode(F.sequence(F.lit(1), F.size("__a") - (n - 1))).alias("__i"),
        )
        .select(
            *keep_cols,
            F.concat_ws(
                " ",
                *[F.element_at(F.col("__a"), F.col("__i") + j) for j in range(n)],
            ).alias("gram"),
        )
    )


def contaminated_docs(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Corpus docs sharing ≥1 word n-gram with any benchmark doc, with
    the count of distinct shared grams. Returns (id, *keep_cols,
    shared_grams)."""
    bench_grams = gram_rows(bench, n, text_col, ()).distinct()
    doc_grams = gram_rows(_spread(corpus), n, text_col, (id_col, *keep_cols))
    # Join BEFORE any distinct: the broadcast join filters corpus grams
    # map-side, so only the (rare) matching pairs ever shuffle — a
    # pre-join .distinct() would shuffle every gram of the 100 TB side.
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col, *keep_cols)
        .agg(F.count_distinct("gram").cast("long").alias("shared_grams"))
    )
