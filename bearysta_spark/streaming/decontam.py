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


#: explicit reader schema for the persisted eval ANCHOR index (the
#: exact-substring arm): zero-row suites must read as empty, not wedge
ANCHOR_INDEX_SCHEMA = "eval_id long, akey string, ab int"


def write_eval_anchor_index(
    eval_docs: DataFrame,
    path: str,
    window: int = 16,
    text_col: str = "text",
    id_col: str = "eval_id",
    buckets: int = 32,
) -> None:
    """Persist the eval suite's EXHAUSTIVE window-char substring set —
    the exact-substring decontamination index (the character-grain
    sibling of write_eval_gram_index, backing
    functions.decontam.substring_anchor_hits' eval side): one row per
    DISTINCT (eval_id, window-substring), bucketed by key hash to
    bound file sizes. Eval suites are small by contract, so the index
    is |eval bytes|·~window rows of short strings — broadcastable at
    probe time.

    `window` is correctness-load-bearing (a probe cut at a different
    width never matches a single key), so it is persisted as the index
    LAYOUT and the probing arms validate it — with the r12
    pending-write discipline: marker before the wiping write, layout
    after, so an interrupted rebuild is refused instead of admitted.
    Raises on an EMPTY index (every eval text shorter than `window`),
    the write_eval_gram_index lesson."""
    from bearysta_spark.streaming.index import (
        clear_pending_write,
        ensure_layout,
        mark_pending_write,
    )

    spark = eval_docs.sparkSession
    # eval_id is persisted as long; a string-keyed eval suite would
    # either throw an unactionable CAST_INVALID_INPUT mid-write (ANSI
    # on) or silently persist eval_id NULL (ANSI off) — drops still
    # work (akey-only) but pair attribution in persisted-probe audits
    # breaks with no error. Probe with try_cast (NULL under both ANSI
    # modes) and refuse any id the cast loses, with the fix named.
    lost = eval_docs.filter(
        F.col(id_col).isNotNull()
        & F.expr(f"try_cast({id_col} AS LONG)").isNull()
    ).limit(1)
    bad = lost.select(F.col(id_col).cast("string")).collect()
    if bad:
        raise ValueError(
            f"write_eval_anchor_index: id column '{id_col}' has value "
            f"{bad[0][0]!r} that does not cast to long — eval_id would "
            "be persisted NULL and anchor->eval attribution silently "
            "lost; use an integer id or remap the suite first"
        )
    layout = {"window": int(window)}
    mark_pending_write(spark, path, layout)
    (
        eval_docs.filter(F.length(text_col) >= window)
        .select(
            F.col(id_col).cast("long").alias("eval_id"),
            F.explode(
                F.sequence(F.lit(1), F.length(text_col) - (window - 1))
            ).alias("__p"),
            F.col(text_col).alias("__t"),
        )
        .select(
            "eval_id",
            F.substring("__t", F.col("__p"), F.lit(window)).alias("akey"),
        )
        .distinct()
        .withColumn(
            "ab", F.pmod(F.xxhash64("akey"), F.lit(buckets)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("ab")
        .parquet(path)
    )
    n = spark.read.schema(ANCHOR_INDEX_SCHEMA).parquet(path).count()
    if n == 0:
        raise ValueError(
            f"eval anchor index at {path} is EMPTY: no eval text has "
            f">= window={window} chars in '{text_col}' — an empty index "
            "decontaminates nothing; lower window or fix the eval input"
        )
    ensure_layout(spark, path, layout)
    clear_pending_write(spark, path)


def load_eval_anchor_index(
    spark: SparkSession, path: str, window: int
) -> DataFrame:
    """Read the persisted anchor index with the window guard: probing
    with a different cut width silently matches NOTHING (every doc
    passes decontamination), so a mismatch raises; a MISSING layout
    raises unconditionally. Anchor indexes postdate the layout
    discipline (r12), so unlike the LSH/PQ loaders there is no
    legacy-artifact allowance: a deleted or never-written layout is
    corruption, and admitting it would skip the one guard that keeps
    a width-mismatched probe from silently admitting every
    contaminated doc."""
    from bearysta_spark.streaming.index import (
        check_pending_write,
        read_layout,
    )

    cur = read_layout(path, spark)
    if cur is None:
        check_pending_write(spark, path)  # interrupted rebuild → raise
        raise ValueError(
            f"eval anchor index at {path} has no _layout.json: anchor "
            "indexes always persist their window (no pre-layout legacy "
            "format exists for this artifact type) — refusing to probe "
            "an index whose cut width cannot be verified"
        )
    want = {"window": int(window)}
    if cur != want:
        raise ValueError(
            f"eval anchor index layout mismatch at {path}: persisted "
            f"{cur}, caller expects {want} — a probe cut at a different "
            "window width matches nothing and silently admits every "
            "contaminated document"
        )
    return spark.read.schema(ANCHOR_INDEX_SCHEMA).parquet(path)


def start_streaming_substring_decontam(
    stream_docs: DataFrame,
    index_path: str,
    out_path: str,
    report_path: str,
    checkpoint: str,
    window: int = 16,
    stride: int = 4,
    min_anchors: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Streaming EXACT-SUBSTRING decontamination — the character-grain
    sibling of start_streaming_decontam, for the leak class word
    n-grams are structurally blind to (eval snippets shorter than n
    tokens; see queries.eval_substring_decontam). Per micro-batch:
    window-char substrings sampled every `stride` positions are
    equi-joined against the persisted eval anchor index (any shared
    run >= window + stride − 1 chars is GUARANTEED to match); docs
    with >= min_anchors matched anchor positions are dropped.

    Same contracts as the gram arm: exactly-once batch_id
    dynamic-partition overwrite on both sinks; the index is STATIC and
    re-read each micro-batch, so a rebuilt (re-versioned) eval suite
    is picked up without restart — and the window guard
    (load_eval_anchor_index) turns a suite rebuilt at a different
    width into a loud error instead of a silently-passing filter.
    Batch-equivalence with substring_anchor_hits is the tested
    contract.

    100 TB shape: the batch side emits |batch bytes|/stride short keys
    in one scan; the index side is eval-sized and AQE-broadcast, so
    batch payload never shuffles (survivors re-selected by id
    anti-join, the gram arm's discipline)."""
    from bearysta_spark.functions.decontam import contaminated_doc_ids

    spark = stream_docs.sparkSession
    w = int(window)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        idx = load_eval_anchor_index(spark, index_path, w).select("akey")
        # the drop decision is the SHARED helper (also stage 5b of the
        # composed pipeline and the train side of the batch audit) —
        # one anchor grid, one min-anchors rule, no drift surface
        contaminated = contaminated_doc_ids(
            batch_df, idx, w, stride, min_anchors, id_col, text_col
        )
        surv = batch_df.join(contaminated, id_col, "left_anti")
        written = surv.withColumn("batch_id", F.lit(batch_id))
        (
            written.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_path)
        )
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
