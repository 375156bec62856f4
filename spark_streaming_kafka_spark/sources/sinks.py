"""Peripheral sinks: JDBC (S11), Redis (S12), MongoDB (S14), console
(S18) — the reference's serving fan-out (``spark_kafka.py:84-126``),
rebuilt without driver-side row loops.

Patterns:

- JDBC: ``df.write.jdbc`` — parameterized batch inserts executor-side.
  The reference concatenated user strings into INSERT statements
  (``spark_kafka.py:86``) — a SQL injection; the JDBC writer's prepared
  statements remove the class of bug.
- Redis / Mongo: no first-party Spark sink in this container, so the
  scalable shape is ``foreachPartition``: one client per PARTITION (not
  per row, not per batch on the driver), pipelined writes. Clients are
  imported lazily and the partition functions are importable/testable
  without the services installed.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> None:
    """S11 — executor-parallel JDBC append with prepared statements.
    (reference: one pyodbc connection + string-built INSERT per message,
    ``rating_data_to_longdb.txt:40-55``)."""
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})


def jdbc_read(spark, url: str, table: str, properties: dict[str, str] | None = None,
              partition_column: str | None = None, num_partitions: int = 8,
              lower_bound: int | None = None, upper_bound: int | None = None) -> DataFrame:
    """Parallel JDBC read — partitioned by a numeric column so N
    executors each pull a range (a single-connection read is the
    default trap at scale)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def redis_hset_partition(
    rows: Iterator[Row],
    host: str = "localhost",
    port: int = 6379,
    name: str = "music",
    key_col: str = "user_id",
    value_cols: tuple[str, ...] = ("song_id", "predicted_rating"),
    client_factory=None,
) -> None:
    """S12 — per-partition Redis HSET pipeline. Values stored as JSON
    (the reference stored Python ``repr`` and ``eval``'d it back,
    ``spark_kafka.py:124`` / ``line_music.ipynb#cell1``).

    ``client_factory`` injects the connection (tests drive the full
    pipelining/flush/JSON logic through a fake that records commands;
    production leaves it None → real ``redis.Redis``)."""
    if client_factory is None:
        import redis  # lazy: not installed in this container

        client = redis.Redis(host=host, port=port)
    else:
        client = client_factory()
    pipe = client.pipeline(transaction=False)
    n = 0
    for row in rows:
        payload = json.dumps({c: row[c] for c in value_cols})
        pipe.hset(name, str(row[key_col]), payload)
        n += 1
        if n % 1000 == 0:
            pipe.execute()
    pipe.execute()


def redis_write(df: DataFrame, **kwargs) -> None:
    """Fan a DataFrame into Redis, one pipelined client per partition."""
    df.foreachPartition(lambda rows: redis_hset_partition(rows, **kwargs))


def mongo_insert_partition(
    rows: Iterator[Row],
    uri: str = "mongodb://localhost:27017",
    database: str = "music",
    collection: str = "recommendations",
    client_factory=None,
) -> None:
    """S14 — per-partition bulk ``insert_many`` (reference:
    ``insert_one`` per record from the driver, ``spark_kafka.py:125``).
    ``client_factory`` injects the connection for fake-backed tests of
    the batching logic; None → real ``pymongo.MongoClient``."""
    if client_factory is None:
        import pymongo  # lazy: not installed in this container

        client = pymongo.MongoClient(uri)
    else:
        client = client_factory()
    coll = client[database][collection]
    batch = []
    for row in rows:
        batch.append(row.asDict())
        if len(batch) >= 1000:
            coll.insert_many(batch)
            batch = []
    if batch:
        coll.insert_many(batch)


def mongo_write(df: DataFrame, **kwargs) -> None:
    df.foreachPartition(lambda rows: mongo_insert_partition(rows, **kwargs))


def console_sink(df: DataFrame, n: int = 20, truncate: bool = True) -> None:
    """S18 — batch peek."""
    df.show(n, truncate)


def mongo_read(spark, uri: str, database: str, collection: str) -> DataFrame:
    """S15 — distributed Mongo scan via the Spark Mongo connector
    (replaces the reference's driver-side ``music.find()`` cursor,
    ``lyric.ipynb#cell1``). Requires the ``mongodb`` connector JAR on
    the classpath; raises Spark's DATA_SOURCE error otherwise."""
    return (
        spark.read.format("mongodb")
        .option("spark.mongodb.read.connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
        .load()
    )


def redis_hget_client(
    key: str,
    field: str,
    host: str = "localhost",
    port: int = 6379,
    client_factory=None,
):
    """S13 — the reference's LINE-bot read path (``line_music.ipynb
    #cell1``: ``r.hget('music', userid)`` + ``eval``) as a safe client:
    values are stored as JSON by redis_hset_partition, decoded with
    ``json.loads`` — never ``eval``. Driver/test-harness utility, not a
    distributed read (Redis hashes don't partition a Spark scan).
    ``client_factory`` injects the connection for fake-backed tests."""
    import json

    if client_factory is None:
        import redis  # lazy: not installed in this container

        r = redis.Redis(host=host, port=port)
    else:
        r = client_factory()
    raw = r.hget(key, field)
    return None if raw is None else json.loads(raw)


def idempotent_parquet_sink(base_path: str, partition_col: str = "_batch_id"):
    """foreachBatch parquet sink with EXACTLY-ONCE output under replay.

    Structured Streaming guarantees at-least-once delivery to
    foreachBatch: after a crash the last uncommitted micro-batch is
    REPLAYED with the same batch_id. A plain append sink duplicates that
    batch's rows; this sink stamps rows with the batch id and
    dynamically overwrites only that batch's partition, so a replay
    rewrites the same partition instead of appending — idempotent
    without any external transaction log. (Same mechanism production
    jobs use before reaching for a table format with upserts.)
    """
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    def sink(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn(partition_col, F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(base_path)
        )

    return sink
