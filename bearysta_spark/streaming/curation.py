"""Streaming curation ingest: the pretrain funnel's streaming twin.

`start_streaming_curation_ingest` runs the batch funnel's gate block
(functions.text.curation_gate_flags — the SAME expressions, so batch
and stream cannot drift) over each micro-batch of documents, then
exact-dedups survivors against a SELF-GROWING norm-key index (every
earlier batch's surviving keys), appends the new survivors' keys, and
emits per-batch funnel counters — the continuously-updated version of
the report pretrain_funnel_report computes over a static corpus.

Exactly-once under foreachBatch replay, by the house construction
(streaming/neardup.py:start_streaming_self_neardup):
- every sink (survivors, counters, index) is hive-partitioned by
  batch_id and written with dynamic partition overwrite, so a replayed
  batch overwrites ITS OWN output instead of duplicating it;
- the index probe filters batch_id < current, so a replay that already
  appended its keys cannot dedup the batch against itself (within-batch
  dedup is the explicit min-id step, applied once).

100 TB shape: gates are scan-side expressions; within-batch dedup is a
16-byte-digest hash-agg at batch grain; the cross-batch probe is ONE
anti-join against the key index per batch (an exact-key probe cannot
partition-prune — the kb buckets exist to bound file sizes and write
parallelism); survivors are written first and the batch-sized result
re-read for the counter and index sinks, so the index is scanned once
per batch, not once per sink; index growth is one small parquet
partition per batch. Near-dup removal and
decontamination are deliberately NOT in this loop — they ride the
persisted LSH index streams (start_streaming_near_dup and friends);
compose both foreachBatch stages for the full pipeline.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def start_streaming_curation_ingest(
    stream_docs: DataFrame,
    index_root: str,
    out_path: str,
    counters_path: str,
    checkpoint: str,
    lang: str = "en",
    id_col: str = "doc_id",
    buckets: int = 32,
):
    """Start the gate → exact-dedup → append-index ingest loop.

    stream_docs: streaming frame with (doc_id, text, lang, source).
    Survivor rows (doc_id, source, lang, tc, norm_key) land under
    out_path; per-batch funnel counters (stage, name, n_docs,
    n_tokens) under counters_path; surviving norm keys under
    index_root — all partitioned by batch_id."""
    from bearysta_spark.cachescope import release_scoped_caches
    from bearysta_spark.functions.text import curation_gate_flags

    spark = stream_docs.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # no persist/localCheckpoint: the gate projection is scan-side
        # and batch-sized, so the few actions below recompute it (the
        # start_streaming_self_neardup convention — nothing stays
        # pinned across batches of a long-running stream)
        flags = curation_gate_flags(
            batch_df, lang=lang, id_col=id_col, keep=("source",)
        )
        gated = flags.filter(F.col("lang_ok") & F.col("q_ok"))
        # within-batch exact dedup: keep the smallest id per norm key
        keeper = gated.groupBy("norm_key").agg(F.min(id_col).alias("__k"))
        wb = gated.join(keeper, "norm_key").filter(
            F.col(id_col) == F.col("__k")
        ).drop("__k")
        # cross-batch: drop anything whose key arrived in an EARLIER
        # batch (replay-safe: own keys are batch_id == current)
        try:
            idx = spark.read.parquet(index_root).filter(
                F.col("batch_id") < batch_id
            )
        except AnalysisException as e:
            # ONLY the missing-path case means "first batch, no index
            # yet" — any other read failure (transient FS error,
            # corrupt partition) must fail the batch loudly, or exact
            # dedup would be silently disabled and duplicates admitted
            # (and indexed) forever
            if "PATH_NOT_FOUND" not in str(e):
                raise
            idx = None
        surv = wb
        if idx is not None:
            surv = wb.join(
                idx.select("norm_key").distinct(), "norm_key", "left_anti"
            )

        def stage(n: int, name: str, frame: DataFrame) -> DataFrame:
            return frame.agg(
                F.lit(n).cast("long").alias("stage"),
                F.lit(name).alias("name"),
                F.count("*").cast("long").alias("n_docs"),
                F.coalesce(F.sum("tc"), F.lit(0)).cast("long")
                .alias("n_tokens"),
            )

        # write survivors FIRST, then read the batch-sized result back
        # for the counter and index sinks — the anti-join (and its full
        # index scan) executes once per batch instead of once per sink
        (
            surv.select(id_col, "source", "lang", "tc", "norm_key")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
        survread = spark.read.parquet(out_path).filter(
            F.col("batch_id") == batch_id
        )
        counters = (
            stage(1, "input", flags)
            .unionByName(stage(2, "lang", flags.filter("lang_ok")))
            .unionByName(stage(3, "quality", gated))
            .unionByName(stage(4, "dedup", survread))
        )
        for frame, path, parts in (
            (counters, counters_path, ("batch_id",)),
            (
                survread.select(
                    "norm_key",
                    F.pmod(F.xxhash64("norm_key"), F.lit(buckets))
                    .cast("int")
                    .alias("kb"),
                ),
                index_root,
                ("batch_id", "kb"),
            ),
        ):
            (
                frame.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*parts)
                .parquet(path)
            )
        release_scoped_caches()

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
