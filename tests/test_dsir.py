"""DSIR importance resampling (operators/dsir.py): the selection must
actually prefer raw documents that look like the target distribution,
and the ratio table must stay bucket-bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_spark.operators.dsir import (
    dsir_bucket_logratios,
    dsir_select_topk,
    dsir_weights,
)


def _corpus(spark):
    # Target speaks "alpha beta gamma"; raw pool mixes on-target docs
    # (ids 0-9) with off-target "zeta eta theta" docs (ids 10-29).
    tgt = [(100 + i, "alpha beta gamma alpha beta") for i in range(20)]
    raw = [(i, "alpha beta gamma beta alpha gamma") for i in range(10)] + [
        (i, "zeta eta theta zeta eta theta") for i in range(10, 30)
    ]
    t = spark.createDataFrame(tgt, "doc_id long, text string")
    r = spark.createDataFrame(raw, "doc_id long, text string")
    return t, r


def test_dsir_prefers_on_target_docs(spark):
    t, r = _corpus(spark)
    top = dsir_select_topk(t, r, k=10, buckets=256)
    assert sorted(row["doc_id"] for row in top.collect()) == list(range(10))
    # And the scores separate cleanly: every on-target weight beats
    # every off-target weight.
    w = {row["doc_id"]: row["logw_sum"] for row in dsir_weights(t, r, 256).collect()}
    assert min(w[i] for i in range(10)) > max(w[i] for i in range(10, 30))


def test_dsir_ratio_table_bucket_bounded(spark):
    t, r = _corpus(spark)
    lam = dsir_bucket_logratios(t, r, buckets=64)
    assert lam.count() <= 64
    # All raw tokens are coverable: scoring loses no rows.
    scored = dsir_weights(t, r, buckets=64)
    assert scored.count() == r.count()
    assert scored.filter(F.col("n_tokens") == 0).count() == 0
