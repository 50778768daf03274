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
