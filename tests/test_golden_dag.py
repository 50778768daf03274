"""Golden 3-layer recipe DAG (SURVEY §3.2 / §5.2#2): the reference's
flagship composition — raw extraction recipes feed indicator recipes
(ratio_of normalization + drop-filter), which union into a summary
recipe alongside a goal-targets CSV, aggregated with geomean.

Mirrors the raw/ → indicators/ → summary_indicators.yml convention
(doc/GETTING_STARTED.md:233-243) with our own miniature data.
"""

from __future__ import annotations

import textwrap

import pytest

from bearysta_spark.engine import RecipeEngine


def w(p, content):
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(content))
    return str(p)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("golden")

    # runner-style outputs for two workloads × two prefixes
    for wl, rows in {
        "erf": [("native", 1000, 10.0), ("native", 2000, 40.0),
                ("intelpython", 1000, 5.0), ("intelpython", 2000, 10.0)],
        "blackscholes": [("native", 1000, 8.0), ("intelpython", 1000, 2.0)],
    }.items():
        lines = ["prefix,size,time"]
        lines += [f"{p},{s},{t}" for p, s, t in rows]
        w(root / "runs" / "r1" / wl / "out.csv", "\n".join(lines) + "\n")

    # raw layer: scan + normalize prefix naming
    for wl in ("erf", "blackscholes"):
        w(
            root / "raw" / f"{wl}.yml",
            f"""\
            input:
                path: '{root}/runs/r1/{wl}/*.csv'
                format: csv
            precomputed:
                Prefix: "'Native-C' if row['prefix'] == 'native' else row['prefix']"
                Function: "'{wl}'"
            aggregation: mean
            series: [Prefix]
            axis: [Function, size]
            values: [time]
            """,
        )

    # indicator layer: speedup ratio vs Native-C, drop the baseline rows
    for wl in ("erf", "blackscholes"):
        w(
            root / "indicators" / f"{wl}.yml",
            f"""\
            input:
                config: ['../raw/{wl}.yml']
            precomputed:
                Ratio: "1 / ratio_of('time', Prefix='Native-C')"
                drop: "row['Prefix'] == 'Native-C'"
            filter-in:
                drop: [false]
            aggregation: mean
            series: [Prefix]
            axis: [Function, size]
            values: [Ratio]
            """,
        )

    # goal table (targets.csv-equivalent) joined as a plain CSV input
    w(root / "targets.csv", "Function,Ratio,Prefix\nerf,1.5,Goal\nblackscholes,3.0,Goal\n")

    # summary layer: union of both indicators + goals, geomean per Function
    summary = w(
        root / "summary.yml",
        f"""\
        input:
            config: ['indicators/erf.yml', 'indicators/blackscholes.yml']
            path: '{root}/targets.csv'
            format: csv
        aggregation: geomean
        series: [Prefix]
        axis: [Function]
        values: [Ratio]
        """,
    )
    return summary


def test_three_layer_dag(spark, tree):
    out = RecipeEngine(spark, tree).aggregated()
    rows = {(r["Function"], r["Prefix"]): r["Ratio"] for r in out.collect()}

    # erf speedups: size1000 → 10/5 = 2.0, size2000 → 40/10 = 4.0;
    # geomean(2,4) = 2·√2
    assert rows[("erf", "intelpython")] == pytest.approx(8.0 ** 0.5)
    # blackscholes: 8/2 = 4.0
    assert rows[("blackscholes", "intelpython")] == pytest.approx(4.0)
    # goal rows pass through the union untouched
    assert rows[("erf", "Goal")] == pytest.approx(1.5)
    assert rows[("blackscholes", "Goal")] == pytest.approx(3.0)
    # baseline rows were dropped by the indicator layer
    assert ("erf", "Native-C") not in rows
