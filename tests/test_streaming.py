"""Streaming pipelines via memory source/sink micro-batch tests —
no Kafka broker needed (the Kafka builders' option wiring is checked
separately in test_sources.py)."""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from spark_streaming_kafka_spark.streaming.sessions import flush_complete_sessions
from spark_streaming_kafka_spark.streaming.wordcount import streaming_word_count


def _await_rows(spark, table: str, minimum: int, timeout: float = 30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= minimum:
            return rows
        time.sleep(0.5)
    raise AssertionError(f"memory sink {table} never reached {minimum} rows")


def test_streaming_word_count_running_totals(spark):
    spark.sql("DROP TABLE IF EXISTS wc_out")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .withColumn("value", F.concat(F.lit("w"), (F.col("value") % 3).cast("string")))
    )
    q = (
        streaming_word_count(stream, "value")
        .writeStream.format("memory")
        .queryName("wc_out")
        .outputMode("complete")
        .start()
    )
    try:
        rows = _await_rows(spark, "wc_out", 3)
        words = {r["word"] for r in rows}
        assert {"w0", "w1", "w2"} <= words
        assert all(r["count"] >= 1 for r in rows)
    finally:
        q.stop()


def test_foreach_batch_pipeline(spark):
    """X2 — foreachBatch over a rate source: per-batch transform runs
    and sees executor-resident DataFrames (no driver collect)."""
    seen: list[tuple[int, int]] = []

    stream = spark.readStream.format("rate").option("rowsPerSecond", "100").load()

    def process(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        seen.append((batch_id, batch_df.count()))

    q = stream.writeStream.foreachBatch(process).trigger(processingTime="1 seconds").start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline and len(seen) < 2:
            time.sleep(0.5)
        assert len(seen) >= 2
        assert all(n > 0 for _, n in seen)
    finally:
        q.stop()


def test_flush_complete_sessions_batch_semantics(spark):
    rows = [
        (1, "m1", 100, 3), (1, "m2", 101, 4), (1, "m3", 102, 5),  # complete
        (2, "m1", 200, 2),                                        # incomplete
    ]
    df = spark.createDataFrame(rows, "userid int, slot string, song_id int, rating int")
    out = flush_complete_sessions(df).collect()
    assert {r["userid"] for r in out} == {1}
    assert len(out) == 3


def test_sentinel_sessions_stateful(spark, tmp_path):
    """X4 — applyInPandasWithState session flush on sentinel, via a
    memory-source stream fed both complete and incomplete sessions."""
    from spark_streaming_kafka_spark.streaming.sessions import (
        sentinel_sessions_stateful,
    )

    events = [
        (1, "m1", 100, 3), (1, "m2", 101, 4), (1, "m3", 102, 5),
        (2, "m1", 200, 2),
    ]
    src = spark.createDataFrame(events, "userid int, slot string, song_id int, rating int")
    # feed through a file stream for a real micro-batch
    data_dir = tmp_path / "events_in"
    src.coalesce(1).write.mode("overwrite").parquet(str(data_dir))
    stream = spark.readStream.schema(src.schema).parquet(str(data_dir))
    spark.sql("DROP TABLE IF EXISTS sessions_out")
    q = (
        sentinel_sessions_stateful(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        rows = _await_rows(spark, "sessions_out", 3)
        assert {r["userid"] for r in rows} == {1}
        assert sorted(r["song_id"] for r in rows) == [100, 101, 102]
        assert all(r["session_size"] == 3 for r in rows)
    finally:
        q.stop()
