"""Subword tokenizer tests: differential BPE check, wordpiece greedy
semantics, and the distinct-word Spark shape."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bearysta_spark.functions import tokenize as TK

SEP = "\x1f"


def _bpe_ref(word: str) -> int:
    """Independent BPE implementation for the differential test: the
    same spec (merge every occurrence of the lowest-rank adjacent pair,
    repeat until none applies) but computed via a separator-string
    replace-until-fixpoint instead of list surgery."""
    syms = tuple(word)
    while len(syms) > 1:
        ranked = sorted(
            (TK._BPE_RANKS[(syms[i], syms[i + 1])], syms[i], syms[i + 1])
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in TK._BPE_RANKS
        )
        if not ranked:
            break
        _, a, b = ranked[0]
        s = SEP + SEP.join(syms) + SEP
        pat = SEP + a + SEP + b + SEP
        rep = SEP + a + b + SEP
        while pat in s:
            s = s.replace(pat, rep)
        syms = tuple(s.strip(SEP).split(SEP))
    return len(syms)


WORD_RE = re.compile("[a-z0-9]+")


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=24))
@settings(max_examples=300, deadline=None)
def test_bpe_differential_vs_independent_impl(word):
    assert TK.bpe_len(word) == _bpe_ref(word)


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=24))
@settings(max_examples=300, deadline=None)
def test_token_counts_bounded_and_positive(word):
    for fn in (TK.bpe_len, TK.wordpiece_len):
        n = fn(word)
        assert 1 <= n <= len(word)


def test_wordpiece_greedy_examples():
    assert TK.wordpiece_len("the") == 1  # 'the' is a vocab entry
    assert TK.wordpiece_len("a") == 1
    # greedy: 'tion' (4) beats 'ti'+'on'
    assert TK.wordpiece_len("tion") == 1
    # 'theory' -> 'the' + 'or' + 'y'
    assert TK.wordpiece_len("theory") == 3


def test_bpe_merge_examples():
    # t+h -> th, th+e -> the: one token
    assert TK.bpe_len("the") == 1
    # no ranked pair in 'zq': stays two symbols
    assert TK.bpe_len("zq") == 2


def test_spark_counts_match_pure_functions(spark):
    rows = [
        (1, "The quick brown foxes, jumping OVER 42 lazy dogs!"),
        (2, "tokenization tokenization tokenization"),
        (3, ""),
        (4, "ZZZZ qqqq 0099"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    def expect(counter):
        out = {}
        for i, text in rows:
            words = WORD_RE.findall(text.lower())
            if words:
                out[i] = (len(words), sum(counter(w) for w in words))
        return out

    for fn, counter in (
        (TK.wordpiece_token_counts, TK.wordpiece_len),
        (TK.bpe_token_counts, TK.bpe_len),
    ):
        got = {
            r["doc_id"]: (r["n_words"], r["n_subword_tokens"])
            for r in fn(df).collect()
        }
        assert got == expect(counter)


def test_python_only_touches_distinct_words(spark):
    # the Arrow kernel input must be the distinct-word frame: its plan
    # subtree aggregates (deduplicates) BEFORE mapInPandas, so the
    # Python stage's input is vocabulary-bounded, not corpus-bounded
    df = spark.createDataFrame(
        [(i, "alpha beta gamma " * 50) for i in range(20)],
        "doc_id: long, text: string",
    )
    out = TK.wordpiece_token_counts(df)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    map_pos = p.find("MapInPandas")
    assert map_pos != -1
    # the section listing MapInPandas's child chain must contain the
    # distinct aggregate (HashAggregate over word) before the kernel
    assert "MapInPandas" in p and p.count("HashAggregate") >= 2
    # per-doc totals: 3 distinct words, 150 occurrences each
    r = out.filter(F.col("doc_id") == 0).first()
    assert r["n_words"] == 150
    assert r["n_subword_tokens"] == 150 * (
        TK.wordpiece_len("alpha") + TK.wordpiece_len("beta") + TK.wordpiece_len("gamma")
    ) / 3


def test_wordpiece_oracle_sql_matches_python_on_random_words():
    # the recursive-CTE walk the driver oracle uses must agree with the
    # Python kernel on arbitrary words, not just the benchmark corpus
    import duckdb

    rnd = __import__("random").Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = sorted(
        {
            "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 18)))
            for _ in range(400)
        }
        | {"the", "tion", "theory", "ingestion", "a", "0", "thethethe"}
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(words))
    )
    sql = (
        "WITH RECURSIVE "
        + TK.wordpiece_oracle_ctes()
        + " SELECT word, n_tokens FROM wp"
    )
    got = dict(con.sql(sql).fetchall())
    want = {w: TK.wordpiece_len(w) for w in words}
    assert got == want


def test_bpe_oracle_sql_matches_python_on_random_words():
    # the one-merge-per-step recursive CTE (r06 — closed the last
    # rows-only oracle gap) must agree with the batch BPE loop on
    # arbitrary words; equivalence is guaranteed by merge-table
    # well-formedness, which the generator asserts
    import duckdb

    rnd = __import__("random").Random(99)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    words = sorted(
        {
            "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 18)))
            for _ in range(400)
        }
        | {"the", "there", "thereabouts", "ingestion", "a", "0",
           "thethethe", "estimation", "corresponding", "restlessness"}
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(words))
    )
    sql = (
        "WITH RECURSIVE "
        + TK.bpe_oracle_ctes()
        + " SELECT word, n_tokens FROM bpe"
    )
    got = dict(con.sql(sql).fetchall())
    want = {w: TK.bpe_len(w) for w in words}
    assert got == want


def test_external_tokenizer_files_public_formats(spark, tmp_path):
    # GPT-2-format merges.txt and BERT-style vocab.txt drive the same
    # count machinery and the same oracle generators as the embedded
    # tables (r06 — token budgets billable against a real model)
    import duckdb

    merges_path = tmp_path / "merges.txt"
    merges_path.write_text(
        "#version: 0.2\ns t\nst o\na b\n\nab c\n", encoding="utf-8"
    )
    vocab_path = tmp_path / "vocab.txt"
    vocab_path.write_text(
        "[CLS]\n[SEP]\nsto\n##ab\nqu\n<pad>\n", encoding="utf-8"
    )

    loaded = TK.load_gpt2_merges(str(merges_path))
    assert loaded == (("s", "t"), ("st", "o"), ("a", "b"), ("ab", "c"))

    # only the FIRST line is a header: a later '# #' line is a real
    # merge (GPT-2's table builds '##' tokens this way)
    hash_path = tmp_path / "merges_hash.txt"
    hash_path.write_text("#version: 0.2\n# #\n## #\n", encoding="utf-8")
    assert TK.load_gpt2_merges(str(hash_path)) == (("#", "#"), ("##", "#"))
    # non-alnum merges are dropped from the SQL literal but the oracle
    # generator still emits valid SQL
    assert "VALUES (0, 'zzunmatchable'" in TK.bpe_oracle_ctes(
        merges=(("#", "#"),)
    )
    assert TK.load_vocab_file(str(vocab_path)) == ("sto", "ab", "qu")

    docs = spark.createDataFrame(
        [(1, "stop abcde quick stout"), (2, "ababab stosto")],
        ["doc_id", "text"],
    )
    bl = TK.make_bpe_len(loaded)
    got_bpe = {
        r["doc_id"]: r["n_subword_tokens"]
        for r in TK.bpe_token_counts(docs, merges=str(merges_path)).collect()
    }
    want_bpe = {
        1: bl("stop") + bl("abcde") + bl("quick") + bl("stout"),
        2: bl("ababab") + bl("stosto"),
    }
    assert got_bpe == want_bpe

    wl = TK.make_wordpiece_len(TK.load_vocab_file(str(vocab_path)))
    got_wp = {
        r["doc_id"]: r["n_subword_tokens"]
        for r in TK.wordpiece_token_counts(
            docs, vocab=str(vocab_path)
        ).collect()
    }
    want_wp = {
        1: wl("stop") + wl("abcde") + wl("quick") + wl("stout"),
        2: wl("ababab") + wl("stosto"),
    }
    assert got_wp == want_wp

    # oracle generators accept the same external tables
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute(
        "INSERT INTO documents VALUES (1, 'stop abcde quick stout'),"
        " (2, 'ababab stosto')"
    )
    got = dict(con.sql(
        "WITH RECURSIVE "
        + TK.bpe_oracle_ctes(merges=loaded)
        + " SELECT word, n_tokens FROM bpe"
    ).fetchall())
    for w in ("stop", "abcde", "quick", "stout", "ababab", "stosto"):
        assert got[w] == bl(w)
    got = dict(con.sql(
        "WITH RECURSIVE "
        + TK.wordpiece_oracle_ctes(vocab=TK.load_vocab_file(str(vocab_path)))
        + " SELECT word, n_tokens FROM wp"
    ).fetchall())
    for w in ("stop", "abcde", "quick", "stout", "ababab", "stosto"):
        assert got[w] == wl(w)


def test_merge_table_well_formedness_guard():
    import pytest

    TK.check_well_formed_merges(TK.BPE_MERGES)  # shipped table is sound
    with pytest.raises(ValueError, match="not well-formed"):
        # "th" used before any merge produces it
        TK.check_well_formed_merges((("th", "e"), ("t", "h")))


# ---------------------------------------------------------------------------
# BPE training (bpe_train): differential vs an independent pure-Python
# Sennrich-style trainer, overlap semantics, and well-formedness.
# ---------------------------------------------------------------------------


def _train_ref(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str, int]]:
    """Independent reference trainer: dict-of-tuples state, explicit
    scan-left merge — the textbook loop bpe_train re-expresses
    relationally."""
    state = {tuple(w): f for w, f in word_freqs.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        # argmax: count DESC, then pair lexicographic ASC
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        new_state: dict[tuple[str, ...], int] = {}
        for syms, f in state.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_state[t] = new_state.get(t, 0) + f
        state = new_state
    return merges


def test_bpe_train_matches_reference(spark):
    word_freqs = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3, "west": 4,
        "the": 9, "then": 3, "there": 2, "aaaa": 7, "aaab": 2,
        "banana": 4, "bandana": 1,
    }
    words = spark.createDataFrame(
        list(word_freqs.items()), "word string, freq long"
    )
    got = TK.bpe_train(words, num_merges=8)
    assert got == _train_ref(word_freqs, 8)


def test_bpe_train_overlap_chain_is_leftmost_greedy(spark):
    # 'aaaa' counts (a,a) three times (overlaps included, Sennrich
    # get_stats) and merges leftmost-non-overlapping: aa|aa
    words = spark.createDataFrame([("aaaa", 1)], "word string, freq long")
    got = TK.bpe_train(words, num_merges=2)
    assert got == _train_ref({"aaaa": 1}, 2)
    assert got[0] == ("a", "a", 3)
    assert got[1] == ("aa", "aa", 1)


def test_bpe_train_exhausts_and_stops_early(spark):
    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    got = TK.bpe_train(words, num_merges=5)
    # one merge fuses the word to a single symbol; no pairs remain
    assert got == [("a", "b", 1)]


def test_bpe_train_learned_table_is_well_formed_and_applies(spark):
    words = spark.createDataFrame(
        [("stress", 3), ("stresses", 2), ("tresses", 1)],
        "word string, freq long",
    )
    got = TK.bpe_train(words, num_merges=6)
    table = tuple((a, b) for a, b, _ in got)
    TK.check_well_formed_merges(table)  # raises on violation
    blen = TK.make_bpe_len(table)
    assert blen("stresses") <= len("stresses")


def test_bpe_train_leaves_no_pinned_blocks(spark):
    spark.catalog.clearCache()
    before = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    words = spark.createDataFrame(
        [("abcabc", 2), ("bcabca", 1)], "word string, freq long"
    )
    TK.bpe_train(words, num_merges=3)
    after = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert not (after - before)


def test_viterbi_piece_counts_dp_and_fallback(spark):
    from bearysta_spark.functions.tokenize import (
        SP_CHAR_COST,
        SP_MAX_LEN,
        viterbi_piece_counts,
    )

    words = spark.createDataFrame(
        [("the",), ("there",), ("q7",), ("x" * (SP_MAX_LEN + 5),)],
        "word string",
    )
    got = {
        r.word: (r.sp_cost, r.sp_pieces)
        for r in viterbi_piece_counts(words).collect()
    }
    # 'the' as one piece (700) beats th+e (1080), t+he (1070), chars (1800)
    assert got["the"] == (700, 1)
    # 'there' = 'the'+'re' (700+460) beats 'th'+'er'+'e' (1530) and
    # 'ther'+'e' (940+600)
    assert got["there"] == (1160, 2)
    # no multi-char piece applies: exact char costs
    assert got["q7"] == (2 * SP_CHAR_COST, 2)
    # beyond SP_MAX_LEN: the documented char fallback
    L = SP_MAX_LEN + 5
    assert got["x" * L] == (L * SP_CHAR_COST, L)


def test_viterbi_tiebreak_prefers_fewer_pieces(spark):
    from bearysta_spark.functions.tokenize import viterbi_piece_counts

    # craft a tie on cost: piece 'ab' at 1200 == 'a'+'b' (600+600);
    # the (cost, n_pieces) tuple must pick the 1-piece segmentation
    pieces = (("a", 600), ("b", 600), ("ab", 1200))
    words = spark.createDataFrame([("ab",)], "word string")
    r = viterbi_piece_counts(words, pieces=pieces).collect()[0]
    assert (r.sp_cost, r.sp_pieces) == (1200, 1)


def test_load_sentencepiece_vocab(tmp_path):
    from bearysta_spark.functions.tokenize import load_sentencepiece_vocab

    p = tmp_path / "sp.vocab"
    p.write_text(
        "<unk>\t0\n▁the\t-2.5\nthe\t-2.25\ning\t-3.125\n<s>\t0\n"
        "▁\t-1.5\nxy z\t-9\n",
        encoding="utf-8",
    )
    got = load_sentencepiece_vocab(str(p))
    # meta symbols and non-[a-z0-9] pieces dropped; ▁ stripped; costs
    # are round(-1000 * score); the '▁the'/'the' duplicate collapses
    # to the cheaper cost (the better log-prob)
    assert got == [("the", 2250), ("ing", 3125)]


def test_viterbi_oracle_uncovered_and_duplicate_pieces(spark):
    """Review findings r08: (1) duplicate piece strings (the loader's
    '▁the'/'the' collapse) must resolve to the CHEAPEST cost in both
    engines; (2) a word no piece inventory covers must take the
    char fallback in the ORACLE too, not silently drop out of the
    bill's inner join."""
    import duckdb

    from bearysta_spark.functions.tokenize import (
        unigram_viterbi_oracle_sql,
        viterbi_piece_counts,
    )

    # no coverage for 'q'; 'ab' duplicated with two costs
    pieces = (("a", 600), ("b", 600), ("ab", 1200), ("ab", 1100),
              ("x", 600), ("y", 600), ("xy", 500))
    words = spark.createDataFrame(
        [("ab",), ("q",), ("xy",)], "word string"
    )
    got = {
        r.word: (r.sp_cost, r.sp_pieces)
        for r in viterbi_piece_counts(words, pieces=pieces).collect()
    }
    assert got == {"ab": (1100, 1), "q": (600, 1), "xy": (500, 1)}

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES"
        " (1, 'ab q xy', 's0')) t(doc_id, text, source)"
    )
    sql = unigram_viterbi_oracle_sql(pieces=pieces, max_len=6)
    rows = con.sql(sql).fetchall()
    assert rows == [("s0", 3, 3, 2200, 1.0)]


# -- unigram-LM TRAINING (r08 VERDICT ask #5) --------------------------------


def _reference_unigram_em(
    word_freqs, rounds=2, seed_max_piece=4, seed_size=120,
    keep_pieces=80, max_len=12,
):
    """Independent plain-Python EM — written against the SPEC (seed by
    substring counts, Viterbi-count E-step minimizing
    (cost, n_pieces, path), prune/clamp/milli-nat M-step), sharing no
    code with functions.tokenize.unigram_train."""
    import math

    def millinat(total, cnt):
        return int(math.floor(1000.0 * math.log(float(total) / float(cnt)) + 0.5))

    counts = {}
    for w, f in word_freqs.items():
        for l in range(1, min(seed_max_piece, len(w)) + 1):
            for i in range(len(w) - l + 1):
                p = w[i:i + l]
                counts[p] = counts.get(p, 0) + f
    top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:seed_size]
    inv_counts = dict(top)
    for p, c in counts.items():
        if len(p) == 1:
            inv_counts[p] = c
    total = sum(inv_counts.values())
    inv = {p: millinat(total, c) for p, c in inv_counts.items()}

    for _ in range(rounds):
        ecnt = {}
        for w, f in word_freqs.items():
            if len(w) > max_len:
                for ch in w:
                    ecnt[ch] = ecnt.get(ch, 0) + f
                continue
            INF = (1 << 62, 1 << 30, "")
            best = [INF] * (len(w) + 1)
            best[0] = (0, 0, "")
            for i in range(1, len(w) + 1):
                b = INF
                for j in range(max(0, i - seed_max_piece), i):
                    p = w[j:i]
                    if p not in inv or best[j][0] >= INF[0]:
                        continue
                    cand = (best[j][0] + inv[p], best[j][1] + 1,
                            best[j][2] + " " + p)
                    if cand < b:
                        b = cand
                best[i] = b
            for p in best[len(w)][2].split(" "):
                if p:
                    ecnt[p] = ecnt.get(p, 0) + f
        multi = sorted(
            ((p, ecnt[p]) for p in inv if len(p) > 1 and ecnt.get(p, 0) > 0),
            key=lambda t: (-t[1], t[0]),
        )[:keep_pieces]
        inv_counts = dict(multi)
        for p in inv:
            if len(p) == 1:
                inv_counts[p] = max(ecnt.get(p, 0), 1)
        total = sum(inv_counts.values())
        inv = {p: millinat(total, c) for p, c in inv_counts.items()}
    return sorted((p, inv[p], inv_counts[p]) for p in inv)


def test_unigram_train_matches_independent_em(spark):
    """Engine vs an independent plain-Python EM on the sf0.001 vocab."""
    from pyspark.sql import functions as F

    from bearysta_spark.functions.tokenize import (
        unigram_train,
        word_occurrences,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    occ = word_occurrences(d)
    words = occ.groupBy("word").agg(F.count("*").cast("long").alias("freq"))
    got = unigram_train(words)
    wf = {r.word: int(r.freq) for r in words.collect()}
    want = _reference_unigram_em(wf)
    assert got == want
    # non-vacuous: multi-char pieces were learned and pruning bit
    assert any(len(p) > 1 for p, _, _ in got)
    assert len(got) < 120 + 36


def test_unigram_train_fallback_pruning_and_oracle_on_crafted_vocab(spark):
    """Edge arms the driver corpus never hits (its max word length is
    8): the max_len char fallback contributes char counts; zero-count
    chars survive with the count clamp; pruning keeps only the top
    multi-char pieces — engine == independent EM == SQL oracle."""
    import duckdb

    from bearysta_spark.functions.tokenize import (
        unigram_train,
        unigram_train_oracle_sql,
    )

    # 'waterfall' exceeds max_len=6 -> char fallback; 'zz' gives a
    # piece whose chars never win otherwise; tiny keep forces pruning
    rows = [("waterfall wat wat zz zz zz at at water q", )]
    docs = [(1, rows[0][0], "s0")]
    words = spark.createDataFrame(
        [("waterfall", 1), ("wat", 2), ("zz", 3), ("at", 2),
         ("water", 1), ("q", 1)],
        "word string, freq long",
    )
    kw = dict(rounds=2, seed_max_piece=3, seed_size=10,
              keep_pieces=3, max_len=6)
    got = unigram_train(words, **kw)
    wf = {"waterfall": 1, "wat": 2, "zz": 3, "at": 2, "water": 1, "q": 1}
    want = _reference_unigram_em(
        wf, rounds=2, seed_max_piece=3, seed_size=10,
        keep_pieces=3, max_len=6,
    )
    assert got == want
    pieces = {p for p, _, _ in got}
    # every char survives (incl. ones only used via fallback), and the
    # pruned inventory has at most keep_pieces multi-char pieces
    assert {"w", "a", "t", "e", "r", "f", "l", "z", "q"} <= pieces
    assert sum(1 for p in pieces if len(p) > 1) <= 3

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES"
        f" (1, '{docs[0][1]}', 's0')) t(doc_id, text, source)"
    )
    sql = unigram_train_oracle_sql(
        rounds=2, seed_max_piece=3, seed_size=10,
        keep_pieces=3, max_len=6,
    )
    assert sorted(tuple(r) for r in con.sql(sql).fetchall()) == got


def test_unigram_train_reads_input_exactly_once(spark):
    """The trainer runs 2 + rounds separate actions; the up-front
    scratch materialization must make them all read the materialized
    vocab, never re-deriving the input — an accumulator in the input's
    lineage counts exactly one pass over the rows."""
    from pyspark.sql import functions as F

    from bearysta_spark.functions.tokenize import (
        unigram_train,
        word_occurrences,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = word_occurrences(d).groupBy("word").agg(
        F.count("*").cast("long").alias("freq")
    )
    n_words = words.count()
    acc = spark.sparkContext.accumulator(0)

    def bump(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    instrumented = words.mapInPandas(bump, "word string, freq long")
    out = unigram_train(instrumented, rounds=2)
    assert out  # trained something
    assert acc.value == n_words, (
        f"input read {acc.value / n_words:.1f}x; expected exactly once"
    )


def test_unigram_train_word_bill_matches_serving_kernel(spark):
    """return_word_bill=True hands back the per-word bill under the
    FINAL inventory — identical to running viterbi_piece_counts over
    the same vocab with the returned (piece, cost) pairs, and costed
    in DuckDB's ln (the _millinats cross-engine rule)."""
    from pyspark.sql import functions as F

    from bearysta_spark.functions.tokenize import (
        unigram_train,
        viterbi_piece_counts,
        word_occurrences,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    words = word_occurrences(d).groupBy("word").agg(
        F.count("*").cast("long").alias("freq")
    )
    inv, bill = unigram_train(words, rounds=2, return_word_bill=True)
    got = {r.word: (r.sp_cost, r.sp_pieces) for r in bill.collect()}
    want = {
        r.word: (r.sp_cost, r.sp_pieces)
        for r in viterbi_piece_counts(
            words.select("word"),
            pieces=[(p, c) for p, c, _ in inv],
            max_len=12,
        ).collect()
    }
    assert got == want
    assert len(got) == words.count()  # every vocab word billed
    # the trained inventory segments real words into >1 piece somewhere
    assert any(np > 1 for _, np in got.values())
