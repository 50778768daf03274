"""Streaming corpus-drift monitor against a PERSISTED reference
code-length model — the data-freshness arm of the streaming ingest
family (the corpus_drift_report audit, continuous).

A reference snapshot's unigram code-length model is persisted once
(`write_codelen_model`: one integer code length per distinct token —
the whole-bit surprisal convention of corpus_drift_report /
doremi_domain_weights — plus the escape cost for novel tokens); every
micro-batch is then billed under the reference model AND under its own
batch-local model, and the per-group excess (an exact-integer KL
estimate in milli-bits/token) lands as report rows. This is the
monitor a production ingest runs to notice the crawl shifting away
from what the current models were trained on — rising drift_mb or OOV
mass is the page-the-owner signal.

Exactly-once by the house construction: the report sink is a batch_id
dynamic-partition overwrite. The model is STATIC within a version and
published by an ATOMIC marker flip (version subdirs + _current.json,
superseded versions reclaimed one rebuild cycle late), so a re-based
reference snapshot is picked up on the next micro-batch without a
stream restart and without a wiped-directory crash window.

100 TB shape: per-batch cost is one tokenization pass, one batch-local
count agg, and a token equi-join against the vocab-bounded model
(AQE-broadcast under the same contract as the decontam index); the
report is G rows per batch. Payload text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bearysta_spark.streaming.index import _read_json, _write_json

#: explicit reader schema (the empty-directory lesson from
#: streaming/decontam.py): tok -> whole-bit code length, bucketed by
#: token hash for write layout (a token probe cannot partition-prune)
MODEL_SCHEMA = "tok string, s long, tb int"
META = "_current.json"


def _tok_col(text_col: str):
    return F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit("[a-z0-9]+"), 0)
    )


def write_codelen_model(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    buckets: int = 32,
) -> None:
    """Persist the reference snapshot's unigram code-length model: one
    (tok, s) row per distinct token with s = floor(log2(T/c)) computed
    exactly as length(bin(T div c)) - 1, published ATOMICALLY — rows
    land in a fresh version subdir (v<k>) and the _current.json marker
    (total T, escape cost floor(log2 T)+1 bits, version) flips to it
    in one rename AFTER the rows are verified non-empty. A rebuild
    therefore never has a window where a running monitor sees a wiped
    or half-written model (the in-place mode('overwrite') form did:
    the old files vanish at job start, the meta only lands after — a
    micro-batch in between crashed the stream the module contract says
    survives rebuilds). The superseded version dir is deleted
    DEFERRED one rebuild cycle (the compaction-reclamation
    discipline), so a batch that read the old marker finishes against
    present files. Raises when the model comes out EMPTY — a silently
    empty reference bills everything at the escape cost and reads as
    catastrophic drift (the empty-eval-index lesson)."""
    spark = docs.sparkSession
    cur = _read_json(path, META, spark)
    version = (int(cur["version"]) + 1) if cur else 0
    vdir = f"{path}/v{version}"
    c1 = (
        docs.select(_tok_col(text_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    # one pass for the total (bounded: a single long), folded into the
    # row write as a literal — the tot-as-crossJoin form re-scanned the
    # whole reference a second time just to recover T for the meta
    n_tokens = int(
        c1.agg(F.sum("c").cast("long").alias("t")).collect()[0]["t"] or 0
    )
    if n_tokens == 0:
        raise ValueError(
            f"code-length model at {path} would be EMPTY: the reference "
            f"snapshot has no [a-z0-9] tokens in '{text_col}' — every "
            "monitored batch would bill at the escape cost and read as "
            "catastrophic drift; fix the reference input"
        )
    (
        c1.select(
            "tok",
            (F.length(F.bin(F.expr(f"{n_tokens} div c"))) - 1)
            .cast("long")
            .alias("s"),
            F.pmod(F.xxhash64("tok"), F.lit(buckets)).cast("int")
            .alias("tb"),
        )
        .write.mode("overwrite")
        .partitionBy("tb")
        .parquet(vdir)
    )
    # explicit raise, not assert: stripped under `python -O`, and an
    # empty model silently published here is the exact loud-error
    # condition the monitor treats as fatal (r10 ADVICE)
    if spark.read.schema(MODEL_SCHEMA).parquet(vdir).count() == 0:
        raise ValueError(
            f"code-length model write to {vdir} produced zero rows — "
            "refusing to publish an empty version marker"
        )
    _write_json(
        path, META,
        {
            "version": version,
            "n_tokens": n_tokens,
            "escape_bits": n_tokens.bit_length(),
        },
        spark,
    )
    if version >= 2:  # deferred reclamation: keep v(k-1), drop v(k-2)
        from bearysta_spark.streaming.index import delete_dir

        delete_dir(spark, f"{path}/v{version - 2}")


def drift_bill(
    batch: DataFrame,
    model: DataFrame,
    escape_bits: int,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Bill one document frame under the reference model vs its own
    batch-local model — the shared kernel of the streaming monitor
    (and its batch twin in tests): per `group_col`, token count, bits
    under the reference (OOV at the escape cost), bits under the
    batch's own code lengths, OOV token count, and drift_mb as TWO
    independently floored milli-bit averages (Spark `div` truncates
    toward zero, DuckDB `//` floors — a single floor over the possibly
    negative difference would diverge between engines)."""
    toks = batch.select(F.col(group_col), _tok_col(text_col).alias("tok"))
    cb = toks.groupBy("tok").agg(F.count("*").cast("long").alias("c"))
    tb = cb.agg(F.sum("c").cast("long").alias("t"))
    sb = cb.crossJoin(F.broadcast(tb)).select(
        "tok",
        (F.length(F.bin(F.expr("t div c"))) - 1).cast("long").alias("sb"),
    )
    return (
        toks.join(sb, "tok")
        .join(model.select("tok", F.col("s").alias("so")), "tok", "left")
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("so"), F.lit(escape_bits)))
            .cast("long")
            .alias("cross_bits"),
            F.sum("sb").cast("long").alias("self_bits"),
            F.sum(F.when(F.col("so").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("oov_tokens"),
        )
        .select(
            group_col,
            "n_tokens",
            "cross_bits",
            "self_bits",
            "oov_tokens",
            (
                F.expr("(1000 * cross_bits) div n_tokens")
                - F.expr("(1000 * self_bits) div n_tokens")
            )
            .cast("long")
            .alias("drift_mb"),
        )
    )


def start_streaming_drift_monitor(
    stream_docs: DataFrame,
    model_root: str,
    report_path: str,
    checkpoint: str,
    group_col: str = "lang",
    text_col: str = "text",
):
    """Start the drift-monitor loop: per micro-batch, bill the batch
    under the persisted reference model vs its own batch-local model
    and land per-group report rows (n_tokens, cross_bits, self_bits,
    oov_tokens, drift_mb) under report_path, partitioned by batch_id.
    Returns the StreamingQuery. Batch-equivalence with an independent
    integer reference is the tested contract
    (tests/test_streaming_drift.py)."""
    spark = stream_docs.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # marker first, files second (the read_index_view ordering): a
        # rebuild committing between the two leaves this batch on the
        # OLD version whose files are retained one full rebuild cycle
        meta = _read_json(model_root, META, spark)
        if meta is None:
            raise ValueError(
                f"no code-length model meta under {model_root} — build "
                "the reference with write_codelen_model first"
            )
        model = spark.read.schema(MODEL_SCHEMA).parquet(
            f"{model_root}/v{int(meta['version'])}"
        )
        report = drift_bill(
            batch_df, model, int(meta["escape_bits"]), group_col, text_col
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
