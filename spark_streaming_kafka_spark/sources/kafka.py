"""Kafka source/sink (S6, S8, S9) — Structured Streaming edition.

Reference: receiver-based ``KafkaUtils.createStream`` (Kafka 0.8 +
ZooKeeper, at-least-once, ``spark_streaming_kafka.py:139``) and a sink
that collects every micro-batch to the driver and loops a
``KafkaProducer`` over rows (``:64-75``). Rebuild: the direct Kafka
source (offset-tracked, checkpointed, exactly-once source semantics) and
the built-in kafka sink writing key/value COLUMNS from the executors —
the driver never sees data.

The ``spark-sql-kafka`` connector JAR ships with Spark distributions but
may be absent in this container; builders construct the plan lazily, so
the wiring is unit-testable without a broker (tests/test_streaming.py)
and fails with Spark's own clear error only on ``.start()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming Kafka source. ``max_offsets_per_trigger`` caps batch
    size — the backpressure knob the receiver model lacked (a retrain
    spike can't snowball batch sizes)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_batch_source(
    spark: SparkSession, bootstrap_servers: str, topics: str
) -> DataFrame:
    """Batch read of a topic's current contents (replaces the reference's
    driver-side KafkaConsumer poll loop, ``spark_kafka.py:62-75``)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .load()
    )


def parse_kafka_json(stream: DataFrame, schema: StructType) -> DataFrame:
    """Kafka value bytes → typed columns in one pass (P13; replaces
    eval(json.loads(...)) ×3)."""
    return stream.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), schema).alias("j"),
        "timestamp",
    ).select("key", "j.*", "timestamp")


def to_kafka_records(df: DataFrame, key: F.Column | None, value_cols: list[str]) -> DataFrame:
    """Shape a DataFrame into kafka sink records: key (nullable) +
    JSON-encoded value column, built executor-side."""
    value = F.to_json(F.struct(*[F.col(c) for c in value_cols]))
    if key is None:
        return df.select(value.alias("value"))
    return df.select(key.cast("string").alias("key"), value.alias("value"))


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    trigger_seconds: int | None = None,
) -> DataStreamWriter:
    """Streaming kafka sink writer (unstarted — call ``.start()``).
    Checkpointed: restarts resume from committed offsets, giving
    end-to-end at-least-once (exactly-once with idempotent readers) vs
    the reference's fire-and-forget driver producer."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer


def kafka_batch_write(df: DataFrame, bootstrap_servers: str, topic: str) -> None:
    """Batch kafka write (records df from :func:`to_kafka_records`)."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


# --- S10: Kafka REST proxy client ------------------------------------

class KafkaRestProducer:
    """Kafka REST proxy produce client (S10 — reference
    ``line_music.ipynb#cell0``: ``requests.post`` to
    ``http://host:8082/topics/<topic>`` with
    ``application/vnd.kafka.json.v2+json``).

    Deliberately out-of-engine: this is a test-fixture / edge-ingest
    client, not a Spark path — bulk produce goes through the kafka sink
    (executor-side, offset-tracked). Differences from the reference:

    - values are REAL JSON objects, not ``str(dict)`` payloads (the
      reference's consumers then ``eval`` them — the injection bug this
      rebuild removes everywhere);
    - stdlib ``urllib`` (no requests dependency), explicit timeout,
      non-2xx raises.
    """

    def __init__(self, base_url: str, timeout: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def send(
        self,
        topic: str,
        values: list[dict],
        keys: list | None = None,
    ) -> dict:
        """POST records to ``{base_url}/topics/{topic}``; returns the
        proxy's JSON response (per-record partition/offset)."""
        import json
        import urllib.request

        if keys is not None and len(keys) != len(values):
            raise ValueError(
                f"keys/values length mismatch: {len(keys)} != {len(values)}"
            )
        records = [
            {"value": v} if keys is None else {"key": k, "value": v}
            for v, k in zip(values, keys or [None] * len(values))
        ]
        req = urllib.request.Request(
            f"{self.base_url}/topics/{topic}",
            data=json.dumps({"records": records}).encode(),
            headers={"Content-Type": "application/vnd.kafka.json.v2+json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())

    def send_rows(self, df: DataFrame, topic: str, key_col: str | None = None) -> dict:
        """Produce a SMALL DataFrame's rows (collects to the driver — by
        design: REST produce is for fixtures/edge events, never bulk)."""
        rows = [r.asDict(recursive=True) for r in df.collect()]
        keys = [r.pop(key_col) for r in rows] if key_col else None
        return self.send(topic, rows, keys)
