"""Physical-plan regression tests: the scale properties the engine
promises (pushdown, pruning, broadcast joins) asserted from
explain("formatted") output — a wrong plan is a perf bug even when
results are right."""

from __future__ import annotations

import contextlib
import io

import pytest

from bearysta_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushdown_and_pruning(spark):
    p = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # column pruning: orderkey/partkey/suppkey never read
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_filter_in_out_reaches_scan(spark):
    p = plan_of(spark, "filter_in_out")
    assert "PushedFilters" in p
    assert "In(l_returnflag" in p  # isin filter pushed into parquet


def test_star_joins_broadcast(spark):
    p = plan_of(spark, "q5_region_volume")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # all dims broadcast; fact never pre-shuffles


def test_ratio_of_base_broadcast(spark):
    p = plan_of(spark, "ratio_of_base")
    assert "BroadcastHashJoin" in p


def test_knn_broadcast_nested_loop(spark):
    p = plan_of(spark, "knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in p  # tiny query side × corpus


def test_recipe_pipeline_prunes_and_pushes(spark):
    # the compiled recipe plan must still push the filter-in predicate
    # shapes down to the scan despite the multi-stage pipeline
    p = plan_of(spark, "recipe_pipeline")
    assert "Scan parquet" in p or "BatchScan" in p
