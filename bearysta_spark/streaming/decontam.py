"""Streaming decontamination against a PERSISTED eval-set gram index —
the decontamination arm of the streaming ingest family.

Decontamination against a FIXED evaluation set is well-defined for a
stream (unlike the batch funnel's stage 5, which draws its eval split
FROM the corpus — ill-defined over unbounded input): the eval set's
word n-grams are indexed once (`write_eval_gram_index`), and every
micro-batch drops documents sharing >= `min_shared` distinct grams with
it. This is the shape a production ingest actually runs — the eval
suites are versioned artifacts, the stream is the crawl.

Exactly-once: the survivor and report sinks use the house batch-id
dynamic-partition overwrite (a replayed batch overwrites its own
partition; chaos-tested with a truncated checkpoint). The index is
STATIC — re-read from files each micro-batch like the persisted-LSH
streams, so an updated eval suite (rebuilt index) is picked up on the
next batch without a stream restart.

100 TB shape: batch grams are batch-sized (one regexp tokenization +
position explode per doc); the probe is a gram equi-join against the
index — the index side is eval-sized (small by contract; grams are
distinct at build time), so AQE broadcasts it and the probe never
shuffles the batch. Payload text never shuffles: the join carries
(id, gram) rows only, and survivors are re-selected from the batch by
id anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bearysta_spark.functions.decontam import gram_rows

#: explicit reader schema for the persisted eval-gram index: an eval
#: suite whose docs are all shorter than `n` words writes ZERO rows, and
#: schema inference over the _SUCCESS-only directory would raise
#: UNABLE_TO_INFER_SCHEMA on every micro-batch — a wedged stream (the
#: zero-survivor lesson from streaming/curation.py, applied here too)
INDEX_SCHEMA = "gram string, gb int"


def write_eval_gram_index(
    eval_docs: DataFrame,
    path: str,
    n: int = 8,
    text_col: str = "text",
    buckets: int = 32,
) -> None:
    """Persist the eval set's DISTINCT word n-grams, bucketed by gram
    hash to bound file sizes and parallelize the write (an arbitrary
    gram probe cannot partition-prune; the buckets are layout, not
    pruning). Rebuild = overwrite; running streams pick the new index
    up on their next micro-batch.

    Raises ValueError when the index comes out EMPTY (every eval doc
    shorter than `n` words): a silently empty decontamination index
    filters nothing — the operator almost certainly passed the wrong
    `n`, the wrong column, or the wrong suite, and the loud failure
    here is strictly better than discovering contamination after a
    training run. The check reads the PERSISTED files back, so it also
    guards a write that succeeded but landed zero rows."""
    (
        gram_rows(eval_docs, n, text_col, ())
        .distinct()
        .withColumn(
            "gb", F.pmod(F.xxhash64("gram"), F.lit(buckets)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("gb")
        .parquet(path)
    )
    spark = eval_docs.sparkSession
    n_grams = spark.read.schema(INDEX_SCHEMA).parquet(path).count()
    if n_grams == 0:
        raise ValueError(
            f"eval gram index at {path} is EMPTY: no eval document has "
            f">= n={n} words in '{text_col}' — an empty index "
            "decontaminates nothing; lower n or fix the eval input"
        )


def start_streaming_decontam(
    stream_docs: DataFrame,
    index_path: str,
    out_path: str,
    report_path: str,
    checkpoint: str,
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the decontamination loop: per micro-batch, documents
    sharing >= min_shared distinct word n-grams with the indexed eval
    set are dropped; survivors (full rows) land under out_path and a
    per-batch report (n_docs_in, n_docs_contaminated, n_docs_out)
    under report_path, both partitioned by batch_id. Returns the
    StreamingQuery. Batch-equivalence with functions.decontam.
    contaminated_docs is the tested contract."""
    spark = stream_docs.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # explicit schema (see INDEX_SCHEMA): an empty index directory
        # must read as zero grams (drop nothing), never wedge the
        # stream in an UNABLE_TO_INFER_SCHEMA crash loop
        idx = spark.read.schema(INDEX_SCHEMA).parquet(index_path).select(
            "gram"
        )
        bg = gram_rows(batch_df, n, text_col, (id_col,))
        contaminated = (
            bg.join(idx, "gram", "left_semi")
            .groupBy(id_col)
            .agg(F.count_distinct("gram").alias("__sg"))
            .filter(F.col("__sg") >= min_shared)
            .select(id_col)
        )
        surv = batch_df.join(contaminated, id_col, "left_anti")
        written = surv.withColumn("batch_id", F.lit(batch_id))
        (
            written.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
        # explicit schema: a fully-contaminated batch leaves only
        # _SUCCESS and schema inference would wedge the replay loop
        # (the zero-survivor lesson from streaming/curation.py)
        survread = (
            spark.read.schema(written.schema)
            .parquet(out_path)
            .filter(F.col("batch_id") == batch_id)
        )
        report = (
            batch_df.agg(F.count("*").cast("long").alias("n_docs_in"))
            .crossJoin(
                survread.agg(F.count("*").cast("long").alias("n_docs_out"))
            )
            .select(
                "n_docs_in",
                (F.col("n_docs_in") - F.col("n_docs_out"))
                .cast("long")
                .alias("n_docs_contaminated"),
                "n_docs_out",
            )
        )
        (
            report.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(report_path)
        )

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
