"""Training-example construction (operators/augment.py)."""

from __future__ import annotations

import pytest

from spark_streaming_kafka_spark.operators.augment import fim_split


def test_fim_split_reassembles_and_nonempty(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(4 + i % 7))) for i in range(20)]
        + [(100, "too short"), (101, "a b c")],
        "doc_id long, text string",
    )
    out = fim_split(docs).collect()
    ids = {r["doc_id"] for r in out}
    assert 100 not in ids and 101 not in ids  # < 4 tokens excluded
    assert len(out) == 20
    for r in out:
        # all three parts non-empty, and concatenation restores the doc
        assert r["prefix"] and r["middle"] and r["suffix"]
        joined = " ".join([r["prefix"], r["middle"], r["suffix"]])
        assert joined == " ".join(f"w{j}" for j in range(r["n_tokens"]))


def test_fim_split_deterministic_across_repartition(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(10))) for i in range(30)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: (r["prefix"], r["middle"], r["suffix"])
         for r in fim_split(docs).collect()}
    b = {r["doc_id"]: (r["prefix"], r["middle"], r["suffix"])
         for r in fim_split(docs.repartition(7)).collect()}
    assert a == b
    # cuts vary by id (not all docs split at the same offset)
    assert len({v for v in a.values()}) > 1


def test_fim_split_rejects_bad_min_tokens(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError):
        fim_split(docs, min_tokens=3)
