"""Bucketing: the co-located-join strategy for repeated big-table joins.

At 100 TB, lineitem⋈orders on every query would shuffle both sides each
time; writing both bucketed by the join key makes the join a zero-
exchange local zip. This test proves the property end-to-end: write
bucketed tables, join, assert the plan contains no shuffle exchange and
results match the plain join.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .saveAsTable("li_b"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .saveAsTable("o_b"))

    lb = spark.table("li_b")
    ob = spark.table("o_b")
    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").cast("long").alias("n"))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # the join itself consumes bucketed inputs: no exchange feeds it
    join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan

    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n"))
    )
    got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
    want = {r["o_orderpriority"]: r["n"] for r in plain.collect()}
    assert got == want

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_lsh_corpus_index_bucketed_increment_join(spark, sf_dir):
    """The incremental-dedup 100 TB story end-to-end: the corpus LSH
    bucket table persists BUCKETED BY its band-bucket key, so a daily
    increment joins against it with the corpus side never reshuffled —
    only the (small) increment side exchanges. Results must equal the
    plain unbucketed join."""
    import contextlib
    import io

    from bearysta_spark.functions.dedup import band_buckets, minhash_signatures

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = d.filter(F.col("doc_id") % 4 != 0)
    incr = d.filter(F.col("doc_id") % 4 == 0)

    def buckets(df):
        return band_buckets(
            minhash_signatures(df, "text", "doc_id", 5, 12, True), "doc_id", 12, 3
        ).withColumn("bb", F.concat_ws(":", "band", "bucket"))

    spark.sql("DROP TABLE IF EXISTS corpus_lsh_idx")
    (
        buckets(corpus)
        .write.mode("overwrite")
        .bucketBy(8, "bb")
        .sortBy("bb")
        .saveAsTable("corpus_lsh_idx")
    )
    idx = spark.table("corpus_lsh_idx")
    inc_b = buckets(incr)
    joined = (
        inc_b.alias("i")
        .join(idx.alias("c"), "bb")
        .select(
            F.col("i.doc_id").alias("id_incr"), F.col("c.doc_id").alias("id_corpus")
        )
        .distinct()
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # the persisted index is consumed in place: the ONLY bb-exchange in
    # the plan is the increment side's
    assert plan.count("Exchange hashpartitioning(bb") <= 1
    assert "corpus_lsh_idx" in plan
    assert "SelectedBucketsCount" in plan  # bucketed read actually engaged

    plain = (
        buckets(incr)
        .alias("i")
        .join(buckets(corpus).alias("c"), "bb")
        .select(
            F.col("i.doc_id").alias("id_incr"), F.col("c.doc_id").alias("id_corpus")
        )
        .distinct()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    spark.sql("DROP TABLE IF EXISTS corpus_lsh_idx")
