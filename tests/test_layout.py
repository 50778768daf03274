"""Z-order layout: interleaving correctness + the locality claim it
exists for — sorting shards by the Morton key keeps EVERY bucketed
dimension narrow per file, vs a linear sort which only helps its own
prefix column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bearysta_spark.functions.layout import (
    bucketize,
    hash_bucket,
    with_zorder,
    zorder_key,
)
from bearysta_spark.sinks import write_corpus


def _morton2(x: int, y: int, bits: int = 8) -> int:
    out = 0
    for j in range(bits):
        out |= ((x >> j) & 1) << (2 * j)
        out |= ((y >> j) & 1) << (2 * j + 1)
    return out


def test_zorder_key_matches_reference_morton(spark):
    rows = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 2, 63, 255)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], 8)).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton2(x, y), (x, y)


def test_zorder_key_bounds_and_validation(spark):
    with pytest.raises(ValueError):
        zorder_key([], 8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], 32)


def test_bucketize_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (49.9,), (100.0,), (250.0,)], ["v"])
    vals = [r["b"] for r in df.withColumn("b", bucketize("v", 0.0, 100.0, 3)).collect()]
    assert vals == [0, 0, 3, 7, 7]


def _file_bounds(path: str, col_a: str, col_b: str):
    """Per written shard: ((min,max) of dim a, (min,max) of dim b) —
    exactly the parquet footer stats an engine prunes on."""
    bounds = []
    for f in glob.glob(path + "/*.parquet"):
        t = pq.read_table(f, columns=[col_a, col_b])
        a = t[col_a].to_pylist()
        b = t[col_b].to_pylist()
        bounds.append(((min(a), max(a)), (min(b), max(b))))
    return bounds


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "user_id", "value"
    )
    spec = {
        "ub": hash_bucket("user_id", 8),
        "vb": bucketize(F.col("value"), 0.0, 500.0, 8),
    }
    zdf = with_zorder(e, spec, bits=8)

    out_z = str(tmp_path / "zorder")
    write_corpus(
        zdf, out_z, cluster_by=["_zorder"], max_records_per_file=200
    )
    out_lin = str(tmp_path / "linear")
    write_corpus(
        zdf, out_lin, cluster_by=["ub"], max_records_per_file=200
    )

    z_bounds = _file_bounds(out_z, "ub", "vb")
    lin_bounds = _file_bounds(out_lin, "ub", "vb")
    assert len(z_bounds) > 10 and len(lin_bounds) > 10

    # the pruning metric that actually matters: for a point predicate on
    # ONE dimension, what fraction of files must be read (their min/max
    # range contains the point)? A linear sort prunes its own prefix
    # column near-perfectly and the other dimension not at all; Z-order
    # prunes BOTH. The win is the worst-case dimension.
    # query workload = the data distribution (points that exist), not a
    # uniform grid — the value column is skewed and empty key space
    # would dilute the measurement
    pdf = zdf.select("ub", "vb").toPandas()

    def hit_frac(bounds, dim, col):
        weights = pdf[col].value_counts().to_dict()
        total = 0.0
        for q, w in weights.items():
            total += w * sum(
                1 for b in bounds if b[dim][0] <= q <= b[dim][1]
            )
        return total / (len(pdf) * len(bounds))

    z_worst = max(
        hit_frac(z_bounds, 0, "ub"), hit_frac(z_bounds, 1, "vb")
    )
    lin_worst = max(
        hit_frac(lin_bounds, 0, "ub"), hit_frac(lin_bounds, 1, "vb")
    )
    # linear leaves vb unclustered → most files hit on vb predicates
    assert lin_worst > 0.5, lin_worst
    # z-order reads a much smaller fraction of files on its worst dim
    assert z_worst < 0.5 * lin_worst, (z_worst, lin_worst)
