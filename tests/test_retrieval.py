"""Unit tests for the retrieval/corpus-statistics surface: BM25
ranking, PMI collocations, sliding-window chunking, char entropy, and
rolling z-score anomaly flags — each against a hand-computed or
property oracle (the DuckDB value oracle lives in queries.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_spark.functions.text import char_entropy
from spark_streaming_kafka_spark.operators.curation import chunk_documents
from spark_streaming_kafka_spark.operators.retrieval import (
    bm25_topk,
    pmi_collocations,
)
from spark_streaming_kafka_spark.operators.windows import rolling_zscore


# --- BM25 ---------------------------------------------------------------

def _bm25_ref(docs, terms, k1=1.2, b=0.75):
    """Plain-Python Okapi BM25 (Lucene idf) over token lists."""
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for toks in docs.values() if q in toks) for q in terms
    }
    out = {}
    for doc_id, toks in docs.items():
        s = 0.0
        hits = 0
        for q in terms:
            tf = toks.count(q)
            if not tf:
                continue
            hits += 1
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        if hits:
            out[doc_id] = (hits, round(s, 6))
    return out


def test_bm25_matches_python_oracle(spark):
    corpus = {
        1: "cat dog cat fish".split(),
        2: "dog dog dog".split(),
        3: "cat bird".split(),
        4: "fish fish cat cat cat".split(),
    }
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_terms_hit, r.bm25)
        for r in bm25_topk(df, ["cat", "dog"], k=10).collect()
    }
    assert got == _bm25_ref(corpus, ["cat", "dog"])


def test_bm25_rare_term_outranks_common(spark):
    # 'rare' appears in one doc, 'common' in all: the rare-term doc must
    # outrank a same-length doc with the same tf of the common term.
    rows = [(i, "common filler words here") for i in range(20)]
    rows.append((99, "rare filler words here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = bm25_topk(df, ["common", "rare"], k=1).collect()[0]
    assert top.doc_id == 99


def test_bm25_rejects_empty_query(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


# --- PMI ----------------------------------------------------------------

def test_pmi_matches_hand_computation(spark):
    # 6 docs of "a b", 6 of "c d": bigrams ab×6, cd×6; unigrams 6 each;
    # T=24, B=12. pmi(a,b) = log2((6/12) / ((6/24)*(6/24))) = 3.0
    rows = [(i, "a b") for i in range(6)] + [
        (i + 6, "c d") for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.left_word, r.right_word): (r.pair_count, r.pmi)
        for r in pmi_collocations(df, min_count=5, k=10).collect()
    }
    assert got == {("a", "b"): (6, 3.0), ("c", "d"): (6, 3.0)}


def test_pmi_min_count_floor(spark):
    rows = [(i, "x y") for i in range(4)] + [(9, "p q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # floor 5 kills both (4 and 1 occurrences)
    assert pmi_collocations(df, min_count=5, k=10).count() == 0
    got = pmi_collocations(df, min_count=4, k=10).collect()
    assert [(r.left_word, r.right_word) for r in got] == [("x", "y")]


# --- chunking -----------------------------------------------------------

def _words(n):
    return " ".join(f"w{i}" for i in range(n))


@pytest.mark.parametrize("n", [1, 8, 31, 32, 33, 50, 56, 57, 100])
def test_chunk_coverage_and_no_redundant_tail(spark, n):
    chunk, stride = 32, 24
    df = spark.createDataFrame([(1, _words(n))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk, stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    starts = [r.chunk_idx * stride for r in rows]
    # contiguous stride multiples from zero
    assert starts == [i * stride for i in range(len(starts))]
    # full coverage: last chunk reaches the end
    assert starts[-1] + chunk >= n
    # no redundant tail: the PREVIOUS chunk must not already cover it
    if len(starts) > 1:
        assert starts[-2] + chunk < n
    # token content round-trips
    for r in rows:
        s = r.chunk_idx * stride
        want = [f"w{i}" for i in range(s, min(s + chunk, n))]
        assert r.chunk_text.split(" ") == want
        assert r.n_tokens == len(want)


def test_chunk_empty_doc_emits_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, "one")], "doc_id long, text string"
    )
    got = chunk_documents(df, 4, 2).collect()
    assert [(r.doc_id, r.chunk_text) for r in got] == [(3, "one")]


def test_chunk_rejects_bad_stride(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, 4, 5)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, 0)


# --- char entropy -------------------------------------------------------

def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", F.round(char_entropy(F.col("text")), 9).alias("e")
        ).collect()
    }
    assert got[1] == 0.0
    assert got[2] == 1.0
    assert got[3] == 2.0
    assert got[4] == 0.0
    assert got[5] == 0.0


def test_char_entropy_matches_python(spark):
    texts = ["hello world", "aabbccdd  zz", "the quick brown fox"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", F.round(char_entropy(F.col("text")), 6).alias("e")
        ).collect()
    }
    for i, t in enumerate(texts):
        n = len(t)
        want = -sum(
            (t.count(c) / n) * math.log2(t.count(c) / n) for c in set(t)
        )
        assert got[i] == pytest.approx(round(want, 6), abs=1e-6)


# --- rolling z-score ----------------------------------------------------

def test_rolling_zscore_flags_spike(spark):
    # 21 calm points alternating 9.5/10.5 then one spike at 100
    vals = [(i, "m", 10.0 + (0.5 if i % 2 else -0.5)) for i in range(21)]
    vals.append((21, "m", 100.0))
    df = spark.createDataFrame(vals, "i long, g string, v double")
    rows = {
        r.i: r
        for r in rolling_zscore(
            df, "v", ["g"], [F.col("i").asc()], window=20, threshold=3.0
        ).collect()
    }
    assert rows[0].zscore is None  # empty trailing window
    assert rows[1].zscore is None  # single-row window: stddev_samp NULL
    assert rows[21].is_anomaly
    assert rows[21].zscore > 3
    assert not any(rows[i].is_anomaly for i in range(21))


def test_rolling_zscore_bucketed_matches_plain(spark):
    """The bucketed variant must be value-identical to the plain
    window, including carries that hop an EMPTY bucket (key "n" has
    no rows in bucket 1) and a final bucket smaller than the window."""
    import random

    from spark_streaming_kafka_spark.operators.windows import (
        rolling_zscore_bucketed,
    )

    rng = random.Random(7)
    rows = []
    i = 0
    for bkt in range(4):
        for _ in range(25):  # every non-final bucket >= window rows
            rows.append((i, "m", bkt, rng.uniform(0, 100.0)))
            i += 1
        if bkt != 1:  # key "n" skips bucket 1 entirely
            for _ in range(25 if bkt < 3 else 7):
                rows.append((i, "n", bkt, rng.uniform(0, 100.0)))
                i += 1
    df = spark.createDataFrame(rows, "i long, g string, b int, v double")
    plain = rolling_zscore(
        df, "v", ["g"], [F.col("i").asc()], window=20
    )
    bucketed = rolling_zscore_bucketed(
        df, "v", ["g"], [F.col("i").asc()],
        bucket_col=F.col("b"), window=20,
    )
    want = {(r.g, r.i): (r.zscore, r.is_anomaly) for r in plain.collect()}
    got = {(r.g, r.i): (r.zscore, r.is_anomaly) for r in bucketed.collect()}
    assert got == want and len(got) == len(rows)


def test_rolling_zscore_bucketed_guards_sparse_buckets(spark):
    import pytest as _pytest

    from spark_streaming_kafka_spark.operators.windows import (
        rolling_zscore_bucketed,
    )

    # bucket 0 holds 3 rows < window=20 and is not the final bucket
    rows = [(i, "g", 0, float(i)) for i in range(3)] + [
        (i, "g", 1, float(i)) for i in range(3, 30)
    ]
    df = spark.createDataFrame(rows, "i long, g string, b int, v double")
    with _pytest.raises(ValueError, match="coarsen bucket_col"):
        rolling_zscore_bucketed(
            df, "v", ["g"], [F.col("i").asc()],
            bucket_col=F.col("b"), window=20,
        )


def test_rolling_zscore_zero_variance_is_null_not_flagged(spark):
    df = spark.createDataFrame(
        [(i, "g", 5.0) for i in range(10)] + [(10, "g", 5.0)],
        "i long, g string, v double",
    )
    rows = rolling_zscore(
        df, "v", ["g"], [F.col("i").asc()], window=5
    ).collect()
    assert all(r.zscore is None for r in rows)
    assert not any(r.is_anomaly for r in rows)


def test_with_char_entropy_matches_expression_form(spark):
    from spark_streaming_kafka_spark.functions.text import with_char_entropy

    texts = ["hello world", "aaaa", "", None, "the quick brown fox"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    expr_form = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", F.round(char_entropy(F.col("text")), 6).alias("e")
        ).collect()
    }
    staged = {
        r.doc_id: r.char_entropy for r in with_char_entropy(df).collect()
    }
    assert staged == expr_form
    # intermediate columns are dropped; originals preserved
    assert with_char_entropy(df).columns == ["doc_id", "text", "char_entropy"]


# --- RRF fusion ---------------------------------------------------------

def test_rrf_fuse_hand_computed(spark):
    from spark_streaming_kafka_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(20, 1), (10, 2), (40, 3)], "doc_id long, rank long"
    )
    got = {
        r.doc_id: (r.n_sources, r.rrf_score)
        for r in rrf_fuse([a, b], k=10, c=60).collect()
    }
    assert got == {
        10: (2, round(1 / 61 + 1 / 62, 9)),
        20: (2, round(1 / 62 + 1 / 61, 9)),
        30: (1, round(1 / 63, 9)),
        40: (1, round(1 / 63, 9)),
    }


def test_rrf_fuse_order_and_ties(spark):
    from spark_streaming_kafka_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(5, 1), (7, 1)], "doc_id long, rank long")
    rows = rrf_fuse([a], k=10).collect()
    # equal scores: ascending-id tiebreak
    assert [r.doc_id for r in rows] == [5, 7]


def test_rrf_fuse_rejects_empty(spark):
    from spark_streaming_kafka_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_ndcg_perfect_and_degraded_rankings(spark):
    from pyspark.sql import functions as F

    from spark_streaming_kafka_spark.operators.retrieval import ndcg_at_k

    rels = spark.createDataFrame(
        [(i, max(0, 10 - i)) for i in range(20)], "doc_id long, rel long"
    )
    # A ranking that IS the ideal ordering -> ndcg == 1.
    perfect = spark.createDataFrame(
        [(i, 100.0 - i) for i in range(10)], "doc_id long, score double"
    )
    row = ndcg_at_k(
        perfect, rels, [F.col("score").desc(), F.col("doc_id").asc()], k=5
    ).collect()[0]
    assert row["ndcg"] == 1.0
    assert row["dcg"] == row["idcg"]
    # Reversed ranking (worst docs first) -> strictly lower, positive.
    reverse = perfect.select("doc_id", (F.lit(200.0) - F.col("score")).alias("score"))
    row2 = ndcg_at_k(
        reverse, rels, [F.col("score").desc(), F.col("doc_id").asc()], k=5
    ).collect()[0]
    assert 0 < row2["ndcg"] < 1.0
    # Docs missing from rels score as rel=0 (no crash, no row loss).
    sparse = spark.createDataFrame([(999, 50.0)], "doc_id long, score double")
    row3 = ndcg_at_k(
        sparse, rels, [F.col("score").desc(), F.col("doc_id").asc()], k=5
    ).collect()[0]
    assert row3["dcg"] == 0.0
