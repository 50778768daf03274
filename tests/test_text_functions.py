"""Text-analysis function units (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bearysta_spark.functions import text as T


def test_fingerprint_whitespace_normalized(spark):
    df = spark.createDataFrame(
        [(1, "hello  world"), (2, " hello world "), (3, "hello\tworld"), (4, "other")],
        ["id", "t"],
    )
    out = {r["id"]: r["fp"] for r in df.select("id", T.fingerprint("t").alias("fp")).collect()}
    # rolling-hash content identity: whitespace variants collapse
    assert out[1] == out[2] == out[3]
    assert out[4] != out[1]


def test_word_and_token_counts(spark):
    df = spark.createDataFrame([("a b  c", ), ("", )], ["t"])
    rows = df.select(
        T.word_count("t").alias("w"), T.token_count("t").alias("tok")
    ).collect()
    assert rows[0]["w"] == 4  # split keeps the empty between double spaces
    assert rows[0]["tok"] == 3
    assert rows[1]["tok"] == 0


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox " * 10,), ("@@@@!!!",), ("ok",)], ["t"]
    )
    vals = [r[0] for r in df.select(T.quality_score("t")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]  # clean long text beats punctuation soup


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of a house",),
         ("der hund und die katze ist hier",),
         ("zzz qqq xxx",)],
        ["t"],
    )
    got = [r[0] for r in df.select(T.lang_id("t")).collect()]
    assert got == ["en", "de", "unk"]
