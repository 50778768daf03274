#!/usr/bin/env python
"""Control-adjusted per-query bench comparison (r09 VERDICT ask #7):
the host hypervisor drifts 1.17x-1.90x between rounds, so raw
BENCH_r{N}.json deltas conflate code changes with window quality. This
script emits the per-query A/B protocol output as ONE machine-readable
JSON artifact instead of two summary numbers in prose:

- control_ratio per file (in-band since r06: the 22 code-identical
  TPC-H shapes vs their r05 minima);
- per shared query: raw ratio B/A and control-adjusted ratio
  (B/A) / (control_B/control_A);
- aggregate medians and the >1.3x-adjusted regression list (on >1s
  bases, the sweep rule the verdicts use).

Usage: python scripts/bench_ab.py BENCH_r09.json BENCH_r10.json
Prints one JSON line; pipe to BENCH_AB_r{N}.json to record.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    # driver BENCH_r{N}.json wraps bench.py's line under "parsed";
    # bench.py's own stdout line is the bare object — accept both
    a = a.get("parsed", a)
    b = b.get("parsed", b)
    qa, qb = a["queries"], b["queries"]
    ca, cb = a.get("control_ratio"), b.get("control_ratio")
    adj = (cb / ca) if (ca and cb) else 1.0
    shared = sorted(set(qa) & set(qb))
    rows = {}
    for q in shared:
        if not qa[q]:
            continue
        raw = qb[q] / qa[q]
        rows[q] = {
            "a_sec": qa[q],
            "b_sec": qb[q],
            "raw_ratio": round(raw, 3),
            "adj_ratio": round(raw / adj, 3),
        }
    regressions = {
        q: r
        for q, r in rows.items()
        if r["adj_ratio"] > 1.3 and r["a_sec"] > 1.0
    }
    out = {
        "metric": "bench_ab_control_adjusted",
        "a": a_path,
        "b": b_path,
        "control_ratio_a": ca,
        "control_ratio_b": cb,
        "window_adjustment": round(adj, 3),
        "n_shared": len(rows),
        "median_raw_ratio": round(
            statistics.median(r["raw_ratio"] for r in rows.values()), 3
        ),
        "median_adj_ratio": round(
            statistics.median(r["adj_ratio"] for r in rows.values()), 3
        ),
        "sum_a_sec": round(sum(r["a_sec"] for r in rows.values()), 2),
        "sum_b_sec": round(sum(r["b_sec"] for r in rows.values()), 2),
        "regressions_adj_gt_1.3_on_gt_1s": regressions,
        "queries": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
