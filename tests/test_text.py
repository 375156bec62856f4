"""Text operators: expr/UDF twin equivalence + fixed golden outputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_streaming_kafka_spark.functions import text as T


def test_sentiment_expr_and_udf_agree(spark):
    rows = [
        (0, "I love this great fast engine"),
        (1, "bad slow awful pain"),
        (2, "neutral words only here"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        T.sentiment_expr(F.col("text")).alias("expr"),
        T.sentiment_pandas_udf(F.col("text")).alias("udf"),
    ).collect()
    for r in out:
        assert float(r["expr"]) == r["udf"]
    scores = {r["doc_id"]: r["expr"] for r in out}
    assert scores[0] == 4 + 4 + 1  # love(4) + great(4) + fast(1)
    assert scores[1] < 0
    assert scores[2] == 0 and scores[3] == 0


def test_token_counts(spark):
    df = spark.createDataFrame([("ab 12 cd!",)], "text string")
    r = df.select(
        T.ws_token_count(F.col("text")).alias("ws"),
        T.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).first()
    assert r["ws"] == 3
    assert r["bpe"] == 4  # ab | 12 | cd | !


def test_langid_markers(spark):
    rows = [
        (0, "the cat is on a mat"),
        (1, "der hund ist und das"),
        (2, "xyzzy qwerty"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["p"] for r in df.select("doc_id", T.langid(F.col("text")).alias("p")).collect()}
    assert out == {0: "en", 1: "de", 2: "und"}


def test_quality_score_ranges(spark):
    rows = [(0, "the " * 60), (1, "!!!! ???? ####"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["q"] for r in df.select("doc_id", T.quality_score(F.col("text")).alias("q")).collect()}
    assert 0.0 <= out[1] < out[0] <= 1.0


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["f"] for r in df.select("doc_id", T.doc_fingerprint(F.col("text")).alias("f")).collect()}
    assert out[0] == out[2]
    assert out[0] != out[1]


def test_make_sentiment_udf_custom_lexicon(spark, tmp_path):
    """Pluggable lexicon path (the slot real AFINN drops into): an
    AFINN-format file round-trips through load_afinn_lexicon and scores
    phrases-before-tokens like the afinn package."""
    from spark_streaming_kafka_spark.functions.text import (
        load_afinn_lexicon,
        make_sentiment_udf,
    )

    p = tmp_path / "AFINN-custom.txt"
    p.write_text("cool\t1\nnot good\t-2\ngood\t3\nterrible\t-3\n")
    lex = load_afinn_lexicon(str(p))
    assert lex == {"cool": 1, "not good": -2, "good": 3, "terrible": -3}

    udf = make_sentiment_udf(lex)
    df = spark.createDataFrame(
        [(0, "good and cool"), (1, "not good weather"), (2, "TERRIBLE stuff")],
        "id int, text string",
    )
    got = {r["id"]: r["s"] for r in df.select("id", udf("text").alias("s")).collect()}
    assert got[0] == 4.0   # good(3) + cool(1)
    assert got[1] == -2.0  # phrase beats token: 'not good' = -2, not +3
    assert got[2] == -3.0  # case-insensitive

    # word boundaries: 'not good' must NOT match inside 'cannot goodness'
    df2 = spark.createDataFrame([(0, "cannot goodness prevail")], "id int, text string")
    assert df2.select(udf("text").alias("s")).first()["s"] == 0.0
