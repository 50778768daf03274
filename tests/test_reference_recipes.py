"""End-to-end execution of the reference's REAL example recipes
(VERDICT r01 #6 / SURVEY §5.2#2): copy `examples/aggregations/` into a
tmp dir at test runtime, reconstruct a miniature `runs/` tree per
FIXTURES.md §A, chdir there, and drive every recipe — raw layer,
indicator layer, the indicators.yml union with targets.csv, and
summary_indicators.yml — through RecipeEngine.

The recipes are read from the read-only reference checkout; nothing is
copied into this repo. The fixture data is synthesized here with
hand-computable numbers so layer outputs can be spot-checked, not just
row-counted.
"""

from __future__ import annotations

import os
import shutil

import pytest

from bearysta_spark.engine import RecipeEngine

AGG = "/root/reference/examples/aggregations"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(AGG), reason="reference examples not available"
)

RUN = "runs/icx_tower_2024"  # Arch parses to 'icx' (3rd-from-last _ part)


def w(root, rel, content):
    p = root / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(content)
    return p


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("refagg")
    shutil.copytree(AGG, root, dirs_exist_ok=True)
    # indicators.yml reads config/targets.csv relative to cwd
    (root / "config").mkdir(exist_ok=True)
    shutil.copy(f"{AGG}/targets.csv", root / "config" / "targets.csv")

    # A1: sklearn_python — headered CSV + noise; daal4py/intel/stock rows
    w(
        root,
        f"{RUN}/sklearn_python/intelpython3/t1.sklearn_run_seq.out",
        "prefix,function,size,threads,time,classes,solver,svd_solver\n"
        "@ Package 'daal4py' was not found. Number of threads is being ignored\n"
        "intelpython3,ridge,1000x15,1,2.0,,,\n"
        "Tolerance: 0.0001\n"
        "intelpython3,ridge,1000x15,8,1.0,,,\n"
        "stockpython3,ridge,1000x15,1,4.0,,,\n"
        "stockpython3,ridge,1000x15,8,2.0,,,\n"
        "daal4py,ridge,1000x15,1,1.6,,,\n"
        "daal4py,ridge,1000x15,8,0.8,,,\n"
        "WARNING: Number of actual iterations exceeded\n"
        "intelpython3,kmeans,1000x15,1,3.0,,,\n"
        "daal4py,kmeans,1000x15,1,1.5,,,\n"
        "intelpython3,log_reg,1000x15,1,5.0,2,lbfgs,\n"
        "intelpython3,pca,1000x15,1,6.0,,newton-cg,\n"
        "\n",
    )

    # A2: sklearn_native — headerless CSV, injected header
    for fn, t_serial, t_par in (("ridge", 0.5, 0.25), ("kmeans", 0.75, 0.5)):
        w(
            root,
            f"{RUN}/sklearn_native/native/t1.run_{fn}_seq.out",
            f"1,icx,Native-C,1,1000x15,{fn},{t_serial}\n"
            f"1,icx,Native-C,8,1000x15,{fn},{t_par}\n",
        )
    w(
        root,
        f"{RUN}/sklearn_native/native/t1.run_pca_native.out",
        "1,icx,Native-C,1,1000x15,4,pca,0.9\n",
    )

    # A8: svm / logreg / df_clsf / df_regr — only Native-C lines survive
    w(
        root,
        f"{RUN}/daal_native/native/t1.run_svm.out",
        "prefix_ID,rows,features,classes,threads,fit,predict\n"
        "Native-C,1000,15,5,1,3.0,1.0\n"
        "daal4py,1000,15,5,1,2.0,0.5\n",
    )
    w(
        root,
        f"{RUN}/daal_native/native/t1.run_log_reg.out",
        "prefix_ID,rows,features,classes,threads,solver,fit,predict\n"
        "Native-C,1000,15,5,1,lbfgs,2.0,0.8\n",
    )
    w(
        root,
        f"{RUN}/daal_native/native/t1.run_df_clsf.out",
        "prefix_ID,rows,features,classes,threads,fit,predict\n"
        "Native-C,1000,15,5,1,4.0,1.5\n",
    )
    w(
        root,
        f"{RUN}/daal_native/native/t1.run_df_regr.out",
        "prefix_ID,rows,features,classes,threads,fit,predict\n"
        "Native-C,1000,15,5,1,4.5,1.8\n",
    )

    # A3: blackscholes — log-to-CSV regex; native needs the acc sidecar
    w(
        root,
        f"{RUN}/numba/native/t1.run_blackscholes_seq.out",
        "Using MKL backend\n"
        "ERF: Native-C-SVML: Size: 16777216 MOPS: 2000.0\n",
    )
    w(
        root,
        f"{RUN}/numba/native/t1.run_blackscholes_seq.out.meta",
        "acc: ha\nhostname: testhost\n",
    )
    w(
        root,
        f"{RUN}/numba/intelpython3/t1.run_blackscholes_seq.out",
        "ERF: Numba@jit-loop: Size: 16777216 MOPS: 500.0 intelpython3\n",
    )

    # A5: fft — headerless 3-col CSV with banner noise
    for env, med in (("native", 0.002), ("intelpython3", 0.004)):
        w(
            root,
            f"{RUN}/fft_bench/{env}/t1.run_fft_arr_seq.out",
            "TAG something\n$PREFIX noise\n======\n"
            f"0.001, {med}, 0.01\n",
        )
        w(
            root,
            f"{RUN}/fft_bench/{env}/t1.run_fft_arr_seq_in.out",
            f"0.001, {med * 2}, 0.01\n",
        )

    # A6: rng — headerless 4-col CSV; Prefix comes from the env dir
    w(
        root,
        f"{RUN}/rng_bench/native/t1.run_rng_uniform.out",
        "native,None,uniform,4.0\n",
    )
    w(
        root,
        f"{RUN}/rng_bench/intelpython3/t1.run_rng_uniform.out",
        "intelpython3,MT19937,uniform,8.0\n",
    )

    # A4: ibench linalg — self-headered CSV with @-comment noise
    for env, t in (("native", 0.5), ("intelpython3", 1.5)):
        w(
            root,
            f"{RUN}/ibench/{env}/t1.np_ibench_seq.out",
            "@ ibench banner\nFunction,Size,Time\n"
            f"Dot,1000,{t}\nLu,1000,{t * 2}\n",
        )
    w(
        root,
        f"{RUN}/ibench/native/t1.np_dot_native_seq.out",
        "Prefix,Function,Size,Time\nNative-C,dot,1000,0.4\n",
    )

    # A7: umath — self-headered, per-prefix line filters
    w(
        root,
        f"{RUN}/umath/intelpython3/t1.x_umath_python_seq.out",
        "Prefix,Implementation,Function,Size,CPE:aligned\n"
        "Overhead,skip,me,0,0\n"
        "Unaligned,skip,me,0,0\n"
        "intelpython3,numpy,erf,1000,4.0\n"
        "intelpython3,numba,erf,1000,3.0\n"
        "stockpython3,numpy,erf,1000,8.0\n",
    )
    w(
        root,
        f"{RUN}/umath/native/t1.x_umath_native_seq.out",
        "Prefix,Implementation,Function,Size,CPE\n"
        "Overhead,skip,me,0,0\n"
        "native_ha,VML,erf,1000,1.0\n"
        "native_ha,SVML,erf,1000,1.5\n",
    )

    # omnisci server log — single-line stdlog entries plus a digit-free
    # banner that exercises the `append` path (joined into the previous
    # line, then dropped by the sql_ keep-filter)
    w(
        root,
        "data/mapd_log/omnisci_server.INFO.20240101.log",
        "startup banner without numeric content\n"
        'I0601 123 q stdlog sql_execute 7 abc,"45","50"}\n'
        'I0601 124 q stdlog sql_execute 8 def,"60","70"}\n',
    )
    return root


@pytest.fixture(scope="module")
def cd(tree):
    prev = os.getcwd()
    os.chdir(tree)
    yield tree
    os.chdir(prev)


def run_recipe(spark, tree, rel):
    return RecipeEngine(spark, str(tree / rel)).aggregated()


RAW = [
    "raw/sklearn.yml",
    "raw/sklearn-stock.yml",
    "raw/sklearn-native.yml",
    "raw/pca-native.yml",
    "raw/svm.yml",
    "raw/logreg.yml",
    "raw/df_clsf.yml",
    "raw/df_regr.yml",
    "raw/blackscholes.yml",
    "raw/fft.yml",
    "raw/rng.yml",
    "raw/linalg.yml",
    "raw/linalg-native.yml",
    "raw/umath-python.yml",
    "raw/umath-native.yml",
]


@pytest.mark.parametrize("rel", RAW)
def test_raw_recipe_runs(spark, cd, rel):
    out = run_recipe(spark, cd, rel)
    rows = out.collect()
    assert len(rows) > 0, rel


def test_raw_sklearn_values(spark, cd):
    out = run_recipe(spark, cd, "raw/sklearn.yml")
    rows = {
        (r["Prefix"], r["Function"], r["Mode"]): r["Time"] for r in out.collect()
    }
    assert rows[("intelpython3", "ridge", "Serial")] == pytest.approx(2.0)
    assert rows[("daal4py", "ridge", "Parallel")] == pytest.approx(0.8)
    # Arch parsed from the 3rd-from-last directory segment
    out_arch = {r["Arch"] for r in out.collect()}
    assert out_arch == {"icx"}


def test_raw_blackscholes_regex_and_sidecar(spark, cd):
    out = run_recipe(spark, cd, "raw/blackscholes.yml")
    rows = {(r["Prefix"], r["Implementation"]): r["MOPS"] for r in out.collect()}
    # Native-C-SVML line: prefix token regenerated by the regex rewrite
    assert rows[("Native-C", "SVML")] == pytest.approx(2000.0)
    # Numba@jit-loop spelled to 'numba' by the line filter
    assert rows[("intelpython3", "numba")] == pytest.approx(500.0)
    # Accuracy: sidecar 'acc' for native, constant 'ha' for python rows
    accs = {r["Prefix"]: r["Accuracy"] for r in out.collect()}
    assert accs == {"Native-C": "ha", "intelpython3": "ha"}


def test_indicator_sklearn_ratio(spark, cd):
    out = run_recipe(spark, cd, "indicators/sklearn.yml")
    rows = {
        (r["Prefix"], r["Function"], r["Mode"]): r["Ratio"] for r in out.collect()
    }
    # Ratio = 1/ratio_of(Time vs Native-C): intel ridge Serial = 0.5/2.0
    assert rows[("intelpython3", "ridge", "Serial")] == pytest.approx(0.25)
    assert rows[("intelpython3", "ridge", "Parallel")] == pytest.approx(0.25)
    # daal4py filtered out of the scikit-learn indicator
    assert not any(p == "daal4py" for p, _, _ in rows)
    # Native-C baseline rows dropped
    assert not any(p == "Native-C" for p, _, _ in rows)


def test_indicator_daal4py_ratio(spark, cd):
    out = run_recipe(spark, cd, "indicators/daal4py.yml")
    rows = {(r["Function"], r["Mode"]): r["Ratio"] for r in out.collect()}
    # daal4py rows renamed to intelpython3, ratio vs Native-C twin
    prefixes = {r["Prefix"] for r in out.collect()}
    assert prefixes == {"intelpython3"}
    assert rows[("ridge", "Serial")] == pytest.approx(0.5 / 1.6)
    assert rows[("kmeans", "Serial")] == pytest.approx(0.75 / 1.5)


@pytest.mark.parametrize(
    "rel",
    [
        "indicators/arithmetics-mkl.yml",
        "indicators/arithmetics-numba.yml",
        "indicators/blackscholes.yml",
        "indicators/fft.yml",
        "indicators/rng.yml",
        "indicators/linalg.yml",
    ],
)
def test_indicator_recipe_runs(spark, cd, rel):
    out = run_recipe(spark, cd, rel)
    rows = out.collect()
    assert len(rows) > 0, rel
    assert "Ratio" in out.columns


def test_indicators_union_with_targets(spark, cd):
    out = run_recipe(spark, cd, "indicators.yml")
    rows = out.collect()
    prefixes = {r["Prefix"] for r in rows}
    modes = {r["Mode"] for r in rows}
    # goal rows from config/targets.csv pass through the union
    # (targets.csv: Prefix=IntelPython, Mode=Goal)
    assert "IntelPython" in prefixes
    assert "Goal" in modes
    # filter-out drops stockpython3
    assert "stockpython3" not in prefixes


def test_summary_indicators_end_to_end(spark, cd):
    out = run_recipe(spark, cd, "summary_indicators.yml")
    rows = out.collect()
    assert len(rows) > 0
    assert {"Domain", "Prefix", "Mode", "Ratio"} <= set(out.columns)


def test_omnisci_append_scanner(spark, cd):
    out = run_recipe(spark, cd, "omnisci-query-times.yml")
    rows = {r["queryID"]: r["execution_time_ms"] for r in out.collect()}
    # query 7 parsed from a single line, query 8 from a wrapped pair
    assert rows[7] == pytest.approx(45.0)
    assert rows[8] == pytest.approx(60.0)
