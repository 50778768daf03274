"""Benchmark decontamination: flag corpus documents sharing word
n-grams with an eval/benchmark set (the step every training pipeline
runs before a data release).

Scale shape: the benchmark side is small (thousands of eval docs → a
few million distinct n-grams) and is DISTINCT-ed then broadcast, so the
corpus side — the 100 TB side — does one exploded scan and a broadcast
semi/inner join with NO shuffle of corpus data. The per-doc groupBy
that counts shared grams shuffles only the matching (doc, gram) pairs,
which is tiny (contamination is rare by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bearysta_spark.cachescope import scoped_cache
from bearysta_spark.functions.dedup import BROADCAST_ROW_LIMIT, _gated_broadcast, _spread


def gram_rows(
    df: DataFrame, n: int, text_col: str, keep_cols: tuple[str, ...]
) -> DataFrame:
    """One row per word n-gram: explode positions, then build the gram
    with plain (whole-stage-codegen) expressions. Deliberately NOT
    `explode(transform(sequence(...)))` — higher-order array builders
    run interpreted with per-row allocation (measured 6× slower on this
    path)."""
    a = F.regexp_extract_all(F.col(text_col), F.lit("[a-z0-9]+"), 0)
    return (
        df.select(*keep_cols, a.alias("__a"))
        .filter(F.size("__a") >= n)
        .select(
            *keep_cols,
            "__a",
            F.explode(F.sequence(F.lit(1), F.size("__a") - (n - 1))).alias("__i"),
        )
        .select(
            *keep_cols,
            F.concat_ws(
                " ",
                *[F.element_at(F.col("__a"), F.col("__i") + j) for j in range(n)],
            ).alias("gram"),
        )
    )


def build_gram_bloom(
    grams: DataFrame,
    nbits: int = 1 << 17,
    num_hashes: int = 4,
    gram_col: str = "gram",
) -> list[int]:
    """Distributed Bloom-filter build over a gram column: each gram sets
    num_hashes bits (xxhash64 seeded 0..k-1, mod nbits) in an nbits-wide
    filter packed into 64-bit words. The bit-setting is pure JVM
    (explode + map-side-combined bit_or on the word index), so the only
    driver-side data is the finished filter: nbits/64 longs — bounded by
    filter GEOMETRY, never by data volume (a 2^27-bit production filter
    is 16 MB regardless of corpus size).

    Returns the packed word list (index w holds bits [64w, 64w+64)).
    """
    nwords = nbits // 64
    # Kirsch-Mitzenmacher double hashing: position_i = h1 + i·h2 (mod
    # nbits) — two xxhash64 evaluations give all num_hashes positions
    # with Bloom FP guarantees intact; Java long overflow wraps
    # identically on build and probe.
    g = grams.select(
        *[
            F.expr(
                f"pmod(pmod(xxhash64(0, {gram_col}), {nbits})"
                f" + {i} * pmod(xxhash64(1, {gram_col}), {nbits}), {nbits})"
            ).alias(f"p{i}")
            for i in range(num_hashes)
        ]
    )
    structs = ", ".join(
        f"struct(cast(p{i} div 64 as int) as w, "
        f"shiftleft(1L, cast(p{i} % 64 as int)) as m)"
        for i in range(num_hashes)
    )
    bits = g.select(F.expr(f"explode(array({structs}))").alias("b")).select(
        "b.w", "b.m"
    )
    words = [0] * nwords
    for r in bits.groupBy("w").agg(F.bit_or("m").alias("m")).collect():
        words[r["w"]] = r["m"]
    return words


def bloom_contains(
    words: list[int], nbits: int, num_hashes: int, gram_col: str = "gram"
):
    """Membership predicate for a packed Bloom filter: all num_hashes
    bit positions of the gram are set. The word array is a foldable
    literal (constant-folded once by Catalyst), the probes are codegen
    shift/mask expressions — zero Python in the scan. No false
    negatives; false positives are eliminated by the exact join that
    follows in contaminated_docs_bloom."""

    def bit_test(i: int) -> str:
        p = (
            f"pmod(pmod(xxhash64(0, {gram_col}), {nbits})"
            f" + {i} * pmod(xxhash64(1, {gram_col}), {nbits}), {nbits})"
        )
        return (
            f"((shiftright(element_at(__bloom, cast({p} div 64 as int) + 1), "
            f"cast({p} % 64 as int)) & 1) = 1)"
        )

    cond = F.expr(" AND ".join(bit_test(i) for i in range(num_hashes)))
    # single literal (one py4j call): building the word array from
    # per-element F.lit costs thousands of driver round-trips per plan
    # construction — measured ~2 s at 2048 words
    import numpy as np

    arr = F.lit(np.asarray(words, dtype=np.int64))
    return arr, cond


def contaminated_docs_bloom(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("source",),
    nbits: int = 1 << 17,
    num_hashes: int = 4,
) -> DataFrame:
    """contaminated_docs with a Bloom prefilter on the corpus gram scan.

    Why a second path: the exact broadcast join ships the full distinct
    benchmark gram set to every executor — at a few hundred million
    grams that broadcast is tens of GB and stops fitting. The Bloom
    filter carries the same membership signal at ~10 bits/entry (a
    16 MB literal for 2^27 bits), the scan-side probe drops the ~99%+
    of corpus grams that can't match, and only Bloom survivors reach the
    exact join — which is itself broadcast only while the MEASURED
    distinct bench-gram count fits the row budget (the count is free:
    the frame is cached and materialized by the Bloom build) and
    otherwise shuffles on the gram key, which is affordable precisely
    because the Bloom probe already shrank the corpus side. Result is
    IDENTICAL to contaminated_docs (no false negatives; FPs die in the
    exact join)."""
    # cached: materialized once by the Bloom build, reused by the exact
    # verify join (otherwise the benchmark gram explode runs twice)
    bench_grams = scoped_cache(gram_rows(bench, n, text_col, ()).distinct())
    words = build_gram_bloom(bench_grams, nbits, num_hashes)
    n_grams = bench_grams.count()
    arr, cond = bloom_contains(words, nbits, num_hashes)
    doc_grams = gram_rows(_spread(corpus), n, text_col, (id_col, *keep_cols))
    survivors = (
        doc_grams.withColumn("__bloom", arr).filter(cond).drop("__bloom")
    )
    return (
        survivors.join(
            _gated_broadcast(
                bench_grams,
                n_grams,
                BROADCAST_ROW_LIMIT,
                "contaminated_docs_bloom benchmark grams",
            ),
            "gram",
        )
        .groupBy(id_col, *keep_cols)
        .agg(F.count_distinct("gram").cast("long").alias("shared_grams"))
    )


def contaminated_docs(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Corpus docs sharing ≥1 word n-gram with any benchmark doc, with
    the count of distinct shared grams. Returns (id, *keep_cols,
    shared_grams).

    Contract: `bench` must be a genuinely small eval/benchmark set —
    its distinct gram table is hard-broadcast. When the "benchmark"
    side is corpus-proportional (e.g. a 10% validation split), use
    contaminated_docs_bloom: identical results, broadcast gated on a
    measured count, and a Bloom prefilter so the fallback shuffle only
    moves surviving grams."""
    bench_grams = gram_rows(bench, n, text_col, ()).distinct()
    doc_grams = gram_rows(_spread(corpus), n, text_col, (id_col, *keep_cols))
    # Join BEFORE any distinct: the broadcast join filters corpus grams
    # map-side, so only the (rare) matching pairs ever shuffle — a
    # pre-join .distinct() would shuffle every gram of the 100 TB side.
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col, *keep_cols)
        .agg(F.count_distinct("gram").cast("long").alias("shared_grams"))
    )
