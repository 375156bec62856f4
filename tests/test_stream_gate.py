"""Streaming ingest gate (streaming/gate.py): batch parity + live
micro-batch smoke."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_spark.operators.curation import boilerplate_shingles
from spark_streaming_kafka_spark.sources.readers import load_table
from spark_streaming_kafka_spark.streaming.gate import (
    collect_boilerplate_dict,
    gate_stream,
)

SF = "/root/testdata/sf0.001"


def _batch_survivors(spark, docs):
    """The batch web_corpus_gate survivor set BEFORE the cap."""
    from spark_streaming_kafka_spark.functions.text import logistic_quality
    from spark_streaming_kafka_spark.operators.curation import boilerplate_ratio

    br_keep = (
        boilerplate_ratio(docs, k=3, min_share=0.05)
        .filter(F.col("boilerplate_ratio") <= 0.1)
        .select("doc_id")
    )
    prob = F.round(logistic_quality(F.col("text")), 6)
    q_keep = (
        docs.select("doc_id", prob.alias("p"))
        .filter(F.col("p") >= 0.5)
        .select("doc_id")
    )
    return (
        docs.join(br_keep, "doc_id", "left_semi")
        .join(q_keep, "doc_id", "left_semi")
    )


def test_gate_stream_batch_parity(spark):
    docs = load_table(spark, SF, "documents")
    d = collect_boilerplate_dict(boilerplate_shingles(docs, k=3, min_share=0.05))
    got = {r["doc_id"] for r in gate_stream(docs, d).select("doc_id").collect()}
    want = {r["doc_id"] for r in _batch_survivors(spark, docs).select("doc_id").collect()}
    assert got == want
    assert 0 < len(got) < docs.count()  # the gate actually cuts something


def test_gate_stream_live_micro_batches(spark, tmp_path):
    """Drive the gate through a REAL stream: two parquet files land in
    a watched directory, a file-source readStream gates them with
    maxFilesPerTrigger=1 (two micro-batches), and the union of the
    per-batch outputs must equal static gating of the same data."""
    docs = load_table(spark, SF, "documents").limit(100).cache()
    d = collect_boilerplate_dict(boilerplate_shingles(docs, k=3, min_share=0.05))

    rows = docs.collect()
    schema = docs.schema
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    for i, chunk in enumerate((rows[:50], rows[50:])):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src_dir / f"batch{i}"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    gated = gate_stream(stream, d)

    collected: list[int] = []
    batches: list[int] = []

    def sink(batch_df, batch_id):
        ids = [r["doc_id"] for r in batch_df.select("doc_id").collect()]
        collected.extend(ids)
        batches.append(batch_id)

    q = (
        gated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = {r["doc_id"] for r in gate_stream(docs, d).select("doc_id").collect()}
    assert set(collected) == want
    assert len(collected) == len(set(collected))
    assert len(batches) >= 2  # maxFilesPerTrigger=1 -> one batch per file
    docs.unpersist()
