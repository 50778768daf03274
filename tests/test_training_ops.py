"""Training-data pipeline operators: mixture sampling, sequence
packing, benchmark decontamination, repetition stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bearysta_spark.functions.decontam import contaminated_docs
from bearysta_spark.functions.packing import bin_stats, pack_sequences
from bearysta_spark.functions.sampling import (
    hash_split,
    hex_threshold,
    per_group_sample,
    weighted_mixture_sample,
)
from bearysta_spark.functions.text import dup_ngram_stats, ngrams


def test_ngrams_basic(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("a",)], ["text"])
    got = [r[0] for r in df.select(ngrams("text", 3)).collect()]
    assert got == [["a b c", "b c d"], [], []]


def test_dup_ngram_stats(spark):
    # "a b a b a" → bigrams [a b, b a, a b, b a]: total 4, distinct 2, dup 2
    df = spark.createDataFrame([("a b a b a",), ("x",)], ["text"])
    t, d = dup_ngram_stats("text", 2)
    got = df.select(t.alias("t"), d.alias("d")).collect()
    assert [(r["t"], r["d"]) for r in got] == [(4, 2), (0, 0)]


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(0.5) == "80000000"
    assert hex_threshold(1.0) == "g"  # compares above every hex md5
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_weighted_mixture_rates_and_determinism(documents):
    w = {"src0": 1.0, "src1": 0.0}
    out = weighted_mixture_sample(documents, w, default=0.5)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per.get("src0") == totals["src0"]  # fraction 1.0 keeps all
    assert "src1" not in per  # fraction 0.0 keeps none
    other = sum(v for k, v in per.items() if k not in w)
    other_total = sum(v for k, v in totals.items() if k not in w)
    assert 0.25 * other_total < other < 0.75 * other_total  # ~default rate

    again = weighted_mixture_sample(documents.repartition(5), w, default=0.5)
    assert {r["doc_id"] for r in again.collect()} == {
        r["doc_id"] for r in out.collect()
    }


def test_hash_split_partition_and_determinism(documents):
    out = hash_split(documents, {"train": 0.8, "val": 0.1, "test": 0.1})
    n = documents.count()
    per = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(per.values()) == n  # a partition: every row exactly once
    assert 0.7 * n < per["train"] < 0.9 * n
    again = hash_split(documents.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
    assert sorted(
        (r["doc_id"], r["split"]) for r in again.select("doc_id", "split").collect()
    ) == sorted((r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect())
    with pytest.raises(ValueError):
        hash_split(documents, {"a": 0.9, "b": 0.3})


def test_per_group_sample_exact_k(documents):
    out = per_group_sample(documents, k=7)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["source"]: r["n"]
        for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {s: min(7, t) for s, t in totals.items()}
    again = per_group_sample(documents.repartition(11), k=7)
    assert {r["doc_id"] for r in again.collect()} == {r["doc_id"] for r in out.collect()}


def test_pack_sequences_concat_then_chunk(spark):
    rows = [("s", i, t) for i, t in enumerate([4, 4, 4, 4, 4])]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tokens"])
    packed = pack_sequences(df, budget=10, token_col="n_tokens")
    bins = {r["doc_id"]: r["bin_id"] for r in packed.collect()}
    # start offsets 0,4,8,12,16 → bins 0,0,0,1,1
    assert bins == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}
    stats = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["bin_tokens"])
        for r in bin_stats(packed, token_col="n_tokens").collect()
    }
    assert stats == {("s", 0): (3, 12), ("s", 1): (2, 8)}


def test_contaminated_docs_known_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 tail", "a"),  # shares the w1..w4 4-gram
            (2, "no overlap here at all", "a"),
            (3, "pre w5 w6 w7 w8", "b"),  # shares w5..w8
        ],
        ["doc_id", "text", "source"],
    )
    bench = spark.createDataFrame(
        [(100, "w1 w2 w3 w4 w5 w6 w7 w8")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["shared_grams"]
        for r in contaminated_docs(corpus, bench, n=4).collect()
    }
    assert got == {1: 1, 3: 1}


def test_chunk_documents_coverage_and_overlap(documents):
    from bearysta_spark.functions.chunking import chunk_documents

    out = chunk_documents(documents, chunk_size=32, stride=24).cache()
    rows = out.filter(F.col("doc_id") == 1).orderBy("chunk_id").collect()
    toks_by_chunk = [r["chunk"].split(" ") for r in rows]
    # consecutive chunks share exactly the 8-token overlap
    for a, b in zip(toks_by_chunk, toks_by_chunk[1:]):
        assert a[24:] == b[: len(a[24:])]
    # stitching chunks (dropping each successor's overlap) rebuilds the doc
    stitched = toks_by_chunk[0] + [t for c in toks_by_chunk[1:] for t in c[8:]]
    import re

    orig = re.findall(
        "[a-z0-9]+", documents.filter(F.col("doc_id") == 1).first()["text"]
    )
    assert stitched == orig
    # every chunk but the last is exactly chunk_size tokens
    per_doc_last = {
        r["doc_id"]: r["chunk_id"]
        for r in out.groupBy("doc_id").agg(F.max("chunk_id").alias("chunk_id")).collect()
    }
    bad = out.filter(
        (F.col("n_tokens") != 32)
        & (F.col("chunk_id") != F.lit(None))
    ).collect()
    assert all(per_doc_last[r["doc_id"]] == r["chunk_id"] for r in bad)
    with pytest.raises(ValueError):
        chunk_documents(documents, chunk_size=8, stride=9)


# --- HyperLogLog sketch ----------------------------------------------------


def test_hll_registers_merge_by_max(spark, sf_dir):
    """Sketches over disjoint slices merged with max(m) == the sketch
    over the union — the mergeability that makes HLL the bounded-state
    distinct counter for cross-day unions and streaming state."""
    from bearysta_spark.functions.sketch import hll_registers

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    whole = {
        (r["bucket"],): r["m"] for r in hll_registers(e, "user_id").collect()
    }
    halves = [
        hll_registers(e.filter(F.col("event_id") % 2 == i), "user_id")
        for i in (0, 1)
    ]
    merged = {
        (r["bucket"],): r["m"]
        for r in halves[0]
        .unionByName(halves[1])
        .groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .collect()
    }
    assert merged == whole


def test_hll_estimate_accuracy_small_range(spark, sf_dir):
    """Few distinct users -> the linear-counting branch (raw HLL
    overestimates badly below 2.5m); the LUT correction should land
    within 25% (deterministic — md5 hashing)."""
    from bearysta_spark.functions.sketch import hll_estimate, hll_registers

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    est = hll_estimate(hll_registers(e, "user_id")).first()["est_hll"]
    exact = e.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.25


def test_hll_estimate_accuracy_large_range(spark):
    """5000 distinct keys >> 2.5m = 640 -> the raw-estimator branch;
    256 registers give ~6.5% typical error, assert a loose 20% gate."""
    from bearysta_spark.functions.sketch import hll_estimate, hll_registers

    df = spark.range(5000)
    r = hll_estimate(hll_registers(df, "id")).first()
    assert r["empty_buckets"] == 0 or r["est_hll"] > 640
    assert abs(r["est_hll"] - 5000) / 5000 < 0.20


def test_hll_registers_ignore_null_keys(spark):
    """NULL keys must not create a NULL-bucket register: the sketch
    counts the same population as count_distinct (which skips NULLs)."""
    from bearysta_spark.functions.sketch import hll_estimate, hll_registers

    clean = spark.range(500).select(F.col("id").cast("string").alias("k"))
    dirty = clean.unionByName(
        spark.range(200).select(F.lit(None).cast("string").alias("k"))
    )
    regs_clean = {r["bucket"]: r["m"] for r in hll_registers(clean, "k").collect()}
    regs_dirty = {r["bucket"]: r["m"] for r in hll_registers(dirty, "k").collect()}
    assert regs_dirty == regs_clean
    assert None not in regs_dirty
    est_c = hll_estimate(hll_registers(clean, "k")).first()["est_hll"]
    est_d = hll_estimate(hll_registers(dirty, "k")).first()["est_hll"]
    assert est_c == est_d


def test_hist_quantiles_q0_returns_minimum_bin(spark):
    """q=0.0 resolves to the first non-empty bin instead of silently
    returning no row (the raw rank predicate is unsatisfiable at 0)."""
    from bearysta_spark.functions.sketch import hist_bins, hist_quantiles

    df = spark.createDataFrame([(float(v),) for v in (9.0, 10.0, 42.0)], ["value"])
    bins = hist_bins(df, "value", bin_width=4.0, nbins=16)
    got = {
        r["q_label"]: r["est"]
        for r in hist_quantiles(bins, {"min": 0.0, "max": 1.0}, bin_width=4.0).collect()
    }
    assert "min" in got  # previously: empty result
    assert got["min"] == 8.0  # left edge of the first non-empty bin
    assert got["max"] == 44.0  # unchanged for q in (0, 1]


# --- edit-distance blocking ------------------------------------------------


def test_edit_distance_pairs_blocking_and_cap(spark):
    from bearysta_spark.functions.dedup import edit_distance_pairs

    rows = [(i, "en", "aaaa bbbb cccc") for i in range(10)] + [
        (100, "de", "xxxx yyyy zzzz"),
        (101, "de", "xxxx yyyy zzzz"),
        (102, "fr", "totally different length band padding " * 4),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    pairs = edit_distance_pairs(df, max_dist=5).collect()
    # cross-language / cross-band rows never pair
    ids = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (100, 101) in ids
    assert all(not (a < 100 <= b) for a, b in ids)
    # the 10-member 'en' block is quadratic: C(10,2) pairs without a cap
    assert len([p for p in ids if p[1] < 100]) == 45
    capped = edit_distance_pairs(df, max_dist=5, max_block_size=5).collect()
    capped_ids = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert capped_ids == {(100, 101)}  # oversized block dropped, logged


# --- BM25 ------------------------------------------------------------------


def test_bm25_scores_ranking(spark):
    from bearysta_spark.functions.text import bm25_scores

    rows = [
        (1, "spark window hash stream spark window"),
        (2, "nothing relevant here at all"),
        (3, "spark and only spark " + "filler " * 20),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in bm25_scores(
            df, ["spark", "window", "hash", "stream"]
        ).collect()
    }
    assert 2 not in out  # no matching term -> no postings row
    assert out[1]["n_terms_hit"] == 4
    assert out[3]["n_terms_hit"] == 1
    assert out[1]["bm25"] > out[3]["bm25"]


def test_bm25_duplicate_terms_collapse(spark):
    # a repeated query term must not double its df or its contribution
    from bearysta_spark.functions.text import bm25_scores

    rows = [(1, "spark runs fast"), (2, "spark spark everywhere")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = sorted(map(tuple, bm25_scores(df, ["spark", "fast"]).collect()))
    dup = sorted(
        map(tuple, bm25_scores(df, ["spark", "fast", "spark"]).collect())
    )
    assert once == dup


def test_index_root_resolution_order(tmp_path, monkeypatch):
    from bearysta_spark.queries import _index_root

    monkeypatch.setenv("BEARYSTA_INDEX_DIR", "/data/indexes")
    assert _index_root(str(tmp_path)) == "/data/indexes"
    monkeypatch.delenv("BEARYSTA_INDEX_DIR")
    # writable corpus dir -> co-located _indexes (the cluster shape)
    assert _index_root(str(tmp_path)) == str(tmp_path / "_indexes")
    # read-only fixture dir -> node-local temp fallback, never under it
    assert not _index_root("/root/testdata/sf0.001").startswith(
        "/root/testdata"
    )


def test_classifier_margins_fixed_point_exact(spark):
    # margin must be the exact integer dot product of the hashed sparse
    # vector with the milli-unit weights; empty docs have no sparse rows
    import math

    from bearysta_spark.functions.text import (
        classifier_margins,
        hashed_doc_vectors,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "???")], ["doc_id", "text"]
    )
    w = [100] * 64  # uniform 0.1 weight: margin = 100 * sum(weights)
    out = {r["doc_id"]: r for r in classifier_margins(docs, w).collect()}
    expect = 100 * sum(
        r["weight"] for r in hashed_doc_vectors(docs, 64).collect()
        if r["doc_id"] == 1
    )
    assert out[1]["margin_milli"] == expect
    assert 2 not in out  # no [a-z0-9] token -> absent from sparse surface
    assert abs(out[1]["score"] - 1 / (1 + math.exp(-expect / 1000))) < 1e-12


def test_hist_bins_merge_by_sum(spark, sf_dir):
    """Histogram sketches over disjoint slices merged by cnt-sum == the
    sketch over the union (the same mergeability as CMS cells)."""
    from bearysta_spark.functions.sketch import hist_bins

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    whole = {r["bin"]: r["cnt"] for r in hist_bins(e).collect()}
    halves = [hist_bins(e.filter(F.col("event_id") % 2 == i)) for i in (0, 1)]
    merged = {
        r["bin"]: r["cnt"]
        for r in halves[0]
        .unionByName(halves[1])
        .groupBy("bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .collect()
    }
    assert merged == whole


def test_hist_quantile_error_bounded_by_bin_width(spark, sf_dir):
    """The sketch's accuracy contract: the histogram estimate lands in
    the same bin as the ceil(q*n)-th order statistic it approximates, so
    it is within one bin width (4.0) of that value. (The query's
    exact_pct column is the R-7 interpolated percentile — a *different*
    rank definition whose distance from the estimate additionally
    depends on tail sparsity, so it is reported, not asserted.)"""
    import math

    from bearysta_spark.functions.sketch import hist_bins, hist_quantiles

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    bins = hist_bins(e, "value", ("event_type",))
    est = {
        (r["event_type"], r["q_label"]): r["est"]
        for r in hist_quantiles(
            bins, {"p50": 0.5, "p90": 0.9, "p99": 0.99}, ("event_type",)
        ).collect()
    }
    assert len(est) >= 3
    vals: dict[str, list[float]] = {}
    for r in e.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for (et, label), e_val in est.items():
        xs = sorted(vals[et])
        q = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[label]
        order_stat = xs[min(math.ceil(q * len(xs)), len(xs)) - 1]
        assert abs(e_val - order_stat) <= 4.0, (et, label, e_val, order_stat)


def test_sketch_ops_empty_and_degenerate_inputs(spark):
    """Empty frames and no-match inputs flow through the sketch family
    without errors: 0 rows in -> 0 rows out, never a crash or a bogus
    estimate row."""
    from bearysta_spark.functions.dedup import edit_distance_pairs
    from bearysta_spark.functions.sketch import (
        hist_bins,
        hist_quantiles,
        hll_estimate,
        hll_registers,
    )
    from bearysta_spark.functions.text import bm25_scores

    empty_ev = spark.createDataFrame([], "user_id long, value double")
    assert hll_registers(empty_ev, "user_id").count() == 0
    # zero-group estimate over empty input: one global row, estimate 0
    # (all m registers empty -> linear counting m*ln(m/m) = 0)
    glob = hll_estimate(hll_registers(empty_ev, "user_id")).collect()
    assert [r["est_hll"] for r in glob] == [0.0]
    # grouped estimate over empty input: no groups, no rows
    assert (
        hll_estimate(
            hll_registers(empty_ev, "user_id", ("user_id",)), ("user_id",)
        ).count()
        == 0
    )
    bins = hist_bins(empty_ev, "value")
    assert bins.count() == 0
    assert hist_quantiles(bins, {"p50": 0.5}).count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, lang string, text string")
    assert edit_distance_pairs(empty_docs).count() == 0
    assert bm25_scores(empty_docs, ["spark"]).count() == 0

    # no term matches at all -> empty postings, empty result (not error)
    docs = spark.createDataFrame([(1, "nothing here")], ["doc_id", "text"])
    assert bm25_scores(docs, ["absent"]).count() == 0

    # single-row corpus: no pairs
    one = spark.createDataFrame([(1, "en", "solo text")], ["doc_id", "lang", "text"])
    assert edit_distance_pairs(one).count() == 0


def test_hll_weekly_merge_equals_direct(spark, sf_dir):
    """est_merged == est_direct on every week row — the max-merge
    algebra the rollup query demonstrates."""
    from bearysta_spark.queries import QUERIES

    for r in QUERIES["hll_weekly_rollup"](spark, sf_dir).collect():
        assert r["est_merged"] == r["est_direct"], r


def test_load_fasttext_weights_roundtrip(tmp_path, spark):
    from bearysta_spark.functions import text as T

    dim = 64
    vec = tmp_path / "model.vec"
    vec.write_text(
        "3 2\n"
        "good 2.5 0.1\n"
        "bad -1.75 0.2\n"
        "meh 0.25 -3.0\n"
    )
    w = T.load_fasttext_weights(str(vec), dim=dim)
    assert len(w) == dim
    # verify the fold against the hash arithmetic directly
    toks = {"good": 2500, "bad": -1750, "meh": 250}
    dims = {t: T.token_hash_dim_sign(t, dim) for t in toks}
    assert len({j for j, _ in dims.values()}) == 3  # no collisions at 64
    for t, wm in toks.items():
        j, s = dims[t]
        assert w[j] == s * wm
    # margins through the real classifier match the per-token model
    df = spark.createDataFrame(
        [(1, "good good bad"), (2, "meh"), (3, "bad bad bad")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.margin_milli
        for r in T.classifier_margins(df, w, bias_milli=100).collect()
    }
    assert got == {1: 2 * 2500 - 1750 + 100, 2: 250 + 100, 3: -3 * 1750 + 100}
    # second weight column via component=
    w2 = T.load_fasttext_weights(str(vec), dim=dim, component=1)
    j, s = dims["meh"]
    assert w2[j] == s * -3000
    # missing component is a hard error, not a silent zero
    with pytest.raises(ValueError, match="component"):
        T.load_fasttext_weights(str(vec), dim=dim, component=5)


def test_sample_centroids_cap(spark, monkeypatch, caplog):
    import logging

    from bearysta_spark.functions import similarity as S

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(40)], "vec_id long, embedding array<double>"
    )
    monkeypatch.setattr(S, "CENTROID_SAMPLE_CAP", 4)
    with caplog.at_level(logging.WARNING, logger="bearysta_spark.functions.similarity"):
        cents = S._sample_centroids(df, n_rows=40, id_col="vec_id",
                                    vec_col="embedding", cell_target=1)
    assert len(cents) == 4
    assert any("capping centroid sample" in r.message for r in caplog.records)
    # under the cap: no warning, k honored
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="bearysta_spark.functions.similarity"):
        cents = S._sample_centroids(df, n_rows=40, id_col="vec_id",
                                    vec_col="embedding", cell_target=10)
    assert len(cents) == 4 and not caplog.records


def test_qlog2_parity_spark_duckdb_python(spark):
    """The quantized-log2 used by dsir_importance_select must agree
    bit-for-bit between the Spark spelling (conv/shiftleft/shiftright),
    the DuckDB spelling (printf('%b'), <<, >>), and a python reference
    — over small values, octave boundaries, and large BIGINTs."""
    import duckdb

    from bearysta_spark.queries import _qlog2_duck, _qlog2_spark

    xs = (
        list(range(1, 600))
        + [2**k for k in range(1, 62)]
        + [2**k - 1 for k in range(2, 62)]
        + [2**k + 1 for k in range(1, 61)]
        + [123456789012345, 987654321987654321]
    )

    def ref(x: int) -> int:
        lb = x.bit_length()
        m = x << (9 - lb) if lb <= 9 else x >> (lb - 9)
        return 256 * lb + m - 512

    con = duckdb.connect()
    con.sql("CREATE TABLE t(x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    duck = dict(
        con.sql(f"SELECT x, {_qlog2_duck('x')} FROM t").fetchall()
    )
    sdf = spark.createDataFrame([(x,) for x in xs], "x long")
    got = dict(
        sdf.selectExpr("x", f"{_qlog2_spark('x')} AS q").collect()
    )
    for x in xs:
        r = ref(x)
        assert duck[x] == r, (x, duck[x], r)
        assert got[x] == r, (x, got[x], r)


def test_unimax_waterfill_matches_oracle_at_many_languages():
    """r07 VERDICT ask #7: the engine loop is unbounded (no 6-round
    clamp) and the oracle's unrolled stage count is a parameter —
    engine == oracle on a 9-language corpus ENGINEERED to cap one
    language per round (geometric token counts), the worst case for
    any fixed unroll."""
    import duckdb

    from bearysta_spark.queries import _unimax_waterfill, unimax_oracle_sql

    # worst case for any fixed unroll: a 10-language corpus built so
    # that rounds 1..9 each cap EXACTLY ONE language — cap_k is set
    # just above round k-1's fair share (so it survives round k-1) and
    # below round k's (so it caps there); the 10th language absorbs
    # the rest and never caps
    T = 10_000_000_000
    B = (8 * T) // 5
    caps, r, prev_fair = [], B, None
    for k in range(9):
        fair = r // (10 - k)
        c = 2 if k == 0 else prev_fair + 2 + (prev_fair % 2)
        assert c <= fair
        caps.append(c)
        r -= c
        prev_fair = fair
    toks = [c // 2 for c in caps]
    cascade = [(f"l{i}", t) for i, t in enumerate(toks + [T - sum(toks)])]

    cases = [
        cascade,
        # all equal: nothing caps, pure fair split with remainder
        [(f"l{i}", 1000) for i in range(8)],
        # mixed: ties, a zero-token language, one giant
        [("aa", 0), ("bb", 7), ("cc", 7), ("dd", 50), ("ee", 51),
         ("ff", 9999), ("gg", 3), ("hh", 3), ("ii", 12)],
    ]
    for langs in cases:
        vals = ", ".join(f"('{l}', {t})" for l, t in langs)
        lt_cte = (
            f"SELECT lang, CAST(tok AS BIGINT) AS tok"
            f" FROM (VALUES {vals}) AS t(lang, tok)"
        )
        sql = unimax_oracle_sql(rounds=len(langs), lt_cte=lt_cte)
        con = duckdb.connect()
        got = con.sql(sql).fetchall()
        want = _unimax_waterfill(langs)
        assert [tuple(r) for r in got] == want, langs
        # the budget is exactly exhausted and every cap respected
        total = sum(t for _, t in langs)
        assert sum(r[3] for r in want) == (8 * total) // 5
        assert all(r[3] <= r[2] for r in want)
    # the cascade case really does cap one language per round: rounds
    # 1..9 each freeze exactly one (else the test is vacuous)
    rounds = [r[6] for r in _unimax_waterfill(cascade)]
    assert sorted(r for r in rounds if r > 0) == list(range(1, 10))


def test_unimax_randomized_engine_oracle_differential():
    """Randomized differential over the unimax waterfiller: 30 seeded
    random corpora (2-14 languages, token counts spanning 6 orders of
    magnitude, ties and zeros included) — engine == oracle exactly,
    plus the waterfilling invariants: budget exactly exhausted, every
    cap respected, and uncapped languages within 1 token of each
    other (the as-uniform-as-possible guarantee)."""
    import random

    import duckdb

    from bearysta_spark.queries import _unimax_waterfill, unimax_oracle_sql

    rnd = random.Random(20260815)
    for case in range(30):
        L = rnd.randint(2, 14)
        langs = []
        for i in range(L):
            kind = rnd.random()
            if kind < 0.1:
                t = 0
            elif kind < 0.3:
                t = rnd.choice([7, 7, 50, 1000])  # planted ties
            else:
                t = rnd.randint(1, 10 ** rnd.randint(1, 6))
            langs.append((f"l{i:02d}", t))
        vals = ", ".join(f"('{l}', {t})" for l, t in langs)
        lt_cte = (
            f"SELECT lang, CAST(tok AS BIGINT) AS tok"
            f" FROM (VALUES {vals}) AS t(lang, tok)"
        )
        con = duckdb.connect()
        got = [
            tuple(r)
            for r in con.sql(
                unimax_oracle_sql(rounds=L, lt_cte=lt_cte)
            ).fetchall()
        ]
        want = _unimax_waterfill(langs)
        assert got == want, (case, langs)
        total = sum(t for _, t in langs)
        assert sum(r[3] for r in want) == (8 * total) // 5, (case, langs)
        assert all(r[3] <= r[2] for r in want), (case, langs)
        uncapped = [r[3] for r in want if r[6] == 0]
        if uncapped:
            assert max(uncapped) - min(uncapped) <= 1, (case, langs)


def test_doremi_eg_matches_oracle_randomized():
    """Engine-vs-oracle differential for the DoReMi EG trajectory: the
    exact-integer Python loop (_doremi_eg) must replay bit-identically
    as the unrolled MATERIALIZED DuckDB rounds on randomized domain
    tables — including degenerate shapes (all-equal losses: every
    round is a no-op; one extreme outlier: the shift cap binds)."""
    import random

    import duckdb

    from bearysta_spark.queries import _doremi_eg, doremi_oracle_sql

    rng = random.Random(7)
    cases = [
        # (dom, n_tokens, S_bits) randomized
        [
            (f"d{i}", n, n * rng.randint(3000, 5000) // 1000)
            for i, n in enumerate(
                rng.randint(100, 10_000) for _ in range(12)
            )
        ]
        for _ in range(3)
    ]
    # all-equal losses: ref == L everywhere, weights stay uniform
    cases.append([(f"e{i}", 1000, 4000) for i in range(5)])
    # extreme outlier: excess // q far beyond the shift cap
    cases.append(
        [("hard", 10, 4000), ("easy1", 10, 10), ("easy2", 10, 11)]
    )
    for doms in cases:
        vals = ", ".join(f"('{d}', {n}, {S})" for d, n, S in doms)
        base_sql = (
            "SELECT dom, CAST(n AS BIGINT) AS n, CAST(S AS BIGINT) AS S,"
            " (1000 * CAST(S AS BIGINT)) // n AS L"
            f" FROM (VALUES {vals}) AS t(dom, n, S)"
        )
        con = duckdb.connect()
        got = con.sql(doremi_oracle_sql(base_sql=base_sql)).fetchall()
        want = _doremi_eg(doms)
        assert [tuple(r) for r in got] == want, doms


def test_doremi_eg_properties():
    """Trajectory invariants: weights are monotone in loss (the EG
    update is the same nondecreasing function of L for every domain),
    the uniform-loss corpus stays uniform, smoothing keeps every
    domain above the uniform floor's smoothed share, and the mixture
    concentrates on the max-loss domain."""
    from bearysta_spark.queries import (
        _DOREMI_SMOOTH_TENTHS,
        _doremi_eg,
    )

    doms = [("a", 1000, 4100), ("b", 1000, 4050), ("c", 1000, 4020),
            ("d", 1000, 4200), ("e", 1000, 3900)]
    out = _doremi_eg(doms)
    by = {r[0]: r for r in out}
    # monotone: loss order == weight order
    losses = sorted(out, key=lambda r: r[2])
    assert [r[3] for r in losses] == sorted(r[3] for r in out)
    # max-loss domain holds the max weight and the rescale fixes it at 2^20
    assert by["d"][3] == 1 << 20
    assert by["d"][4] == max(r[4] for r in out)
    # smoothing floor: every domain gets >= sm/10 of uniform
    floor = _DOREMI_SMOOTH_TENTHS * (1_000_000 // len(doms)) // 10
    assert all(r[5] >= floor for r in out)
    assert sum(r[4] for r in out) <= 1_000_000
    # uniform losses -> uniform mixture
    uni = _doremi_eg([(f"u{i}", 500, 2000) for i in range(4)])
    assert len({r[4] for r in uni}) == 1
