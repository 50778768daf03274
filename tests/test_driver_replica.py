"""Slow CI gate: replay the EXACT driver correctness configuration
(sf0.01, every registered query vs its DuckDB oracle, row+schema+hash
compare) via scripts/driver_replica.py — reproducible locally instead
of waiting for the round driver. Run with: pytest -m slow
(the default addopts deselect it)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_driver_replica_full_inventory_sf001():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.01"
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "driver_replica.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"driver replica failures:\n{tail}"
    assert "failures: 0" in proc.stdout
