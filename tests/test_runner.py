"""Runner (X1-X4) tests: matrix expansion, overrides, shell vars, and
the full runner→scanner round trip (produced .out/.meta trees feed the
recipe engine)."""

from __future__ import annotations

import os

from bearysta_spark.runner import (
    apply_overrides,
    expand_matrix,
    load_run_config,
    run_benchmark,
)


def test_expand_matrix():
    combos = expand_matrix({"size": [1000, 2000], "impl": "numpy", "threads": [1, 4]})
    assert len(combos) == 4
    assert {"size": "1000", "impl": "numpy", "threads": "1"} in combos
    # constants normalized to singletons, everything stringified
    assert all(c["impl"] == "numpy" for c in combos)


def test_overrides_update_and_drop():
    cfg = load_run_config(
        {
            "variables": {"a": [1]},
            "commands": {"x": "echo x", "y": {"command": "echo y", "variables": {"b": [2]}}},
        }
    )
    cfg = apply_overrides(
        cfg,
        [{"variables": {"a": [9]}, "commands": {"x": "drop", "y": {"variables": {"b": [3]}}}}],
    )
    assert "x" not in cfg["commands"]
    assert cfg["variables"]["a"] == [9]
    assert cfg["commands"]["y"]["variables"]["b"] == [3]


def test_runner_to_engine_roundtrip(spark, tmp_path):
    cfg = {
        "variables": {"size": [100, 200], "mode": "fast"},
        "commands": {
            "bench": "sh -c $script",
        },
    }
    # the command prints a CSV row using its env-var variables
    cfg["commands"]["bench"] = {
        "command": ["sh", "-c", 'echo "size,mode,time"; echo "$size,$mode,1.5"'],
    }
    outs = run_benchmark(
        cfg, run_path=str(tmp_path / "runs"), run_id="r1", suite="s", env_name="e"
    )
    assert len(outs) == 2
    assert all(os.path.isfile(p) and os.path.isfile(p + ".meta") for p in outs)

    # the produced tree feeds the recipe engine (S1+S4+S7 round trip)
    from bearysta_spark.engine import RecipeEngine

    recipe = {
        "input": {"path": str(tmp_path / "runs" / "r1" / "s" / "e" / "*.out"), "format": "csv"},
        "aggregation": "mean",
        "series": ["size"],
        "values": ["time"],
    }
    agg = RecipeEngine(spark, recipe).aggregated()
    rows = {r["size"]: r for r in agg.collect()}
    assert set(rows) == {100, 200}
    assert rows[100]["time"] == 1.5
    # sidecar metadata landed as columns
    assert rows[100]["env_name"] == "e"


def test_shell_precomputed_vars(tmp_path):
    cfg = {
        "variables": {"host": "$(echo myhost)"},
        "commands": {"c": ["sh", "-c", "echo v,$host; echo host,1"]},
    }
    outs = run_benchmark(cfg, run_path=str(tmp_path / "runs"), run_id="r2")
    meta = open(outs[0] + ".meta").read()
    assert "myhost" in meta


def test_dry_run(tmp_path):
    cfg = {"variables": {}, "commands": {"c": "echo hi"}}
    outs = run_benchmark(cfg, run_path=str(tmp_path / "r"), dry_run=True)
    assert "# skipped" in open(outs[0]).read()
