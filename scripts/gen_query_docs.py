#!/usr/bin/env python
"""Regenerate docs/QUERIES.md from the registered query docstrings.

Run after adding queries: `python scripts/gen_query_docs.py`. The doc is
committed (not built on the fly) so reviewers can diff inventory changes
alongside the code that caused them.
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bearysta_spark.queries import ORACLE, QUERIES  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "QUERIES.md")


def main() -> None:
    lines = [
        "# Query inventory",
        "",
        "Auto-generated from `bearysta_spark/queries.py` docstrings by",
        "`python scripts/gen_query_docs.py` — regenerate after adding",
        "queries. Every query listed here is registered in",
        "`__spark_entry__.queries()`; all are paired with DuckDB oracle",
        "SQL in `oracle_sql()` (the driver's exact value-hash gate at",
        "sf0.01, replayed locally over all entries by",
        "`tests/test_correctness_oracle.py` at sf0.001 and by",
        "`scripts/driver_replica.py` at sf0.01).",
        "",
        f"**{len(QUERIES)} queries, {len(ORACLE)} oracle-paired.** Listed",
        "in registration order. (The driver samples 50 per round for",
        "CORRECTNESS_r{N}.json by a rule of its own; queries outside a",
        "round's draw are replica-verified via driver_replica.py and",
        "recorded in REPLICA_r{N}.json.)",
        "",
    ]
    for name, fn in QUERIES.items():
        doc = inspect.getdoc(fn) or "(no docstring)"
        first = " ".join(doc.split("\n\n")[0].split())
        lines.append(f"- **{name}** — {first}")
    lines.append("")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {os.path.normpath(OUT)} ({len(QUERIES)} queries)")


if __name__ == "__main__":
    main()
