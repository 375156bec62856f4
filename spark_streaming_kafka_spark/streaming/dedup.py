"""Streaming deduplication — the streaming twin of
``operators/dedup.py::exact_dedup``.

An unbounded ingest stream (crawl results, event feeds) re-delivers
identical payloads: at-least-once sources, retried producers, and
literal duplicate documents. Batch exact-dedup cannot run on a stream
(no end to group over); the streaming form is Spark's watermarked
``dropDuplicates``: state holds one entry per key seen within the
watermark horizon, and keys older than the watermark are dropped from
state — bounded memory on an unbounded stream, which is the whole
constraint. Exactly the semantics a 100 TB/day ingest dedup needs:
duplicates arriving within the horizon are suppressed; a re-crawl
months later is a new version, not a duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str,
    text_col: str = "text",
    watermark: str = "1 hour",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Drop payload-identical rows within the watermark horizon.

    Dedup key = md5(text) (+ ``extra_keys``): state carries the 32-byte
    hash, never the document body — same shuffle discipline as the batch
    operator. The watermark is the state-size dial: horizon × unique-key
    rate bounds the state store.
    """
    keys = ["__text_hash", *(extra_keys or [])]
    # dropDuplicatesWithinWatermark, NOT dropDuplicates: with plain
    # dropDuplicates on a key subset that excludes the event-time
    # column, Spark never evicts state (one row per distinct payload
    # forever — unbounded). The WithinWatermark variant expires each
    # key once event time passes its arrival + watermark, which is the
    # bounded-state contract this module promises.
    #
    # NULL text is NOT a payload: md5(NULL) is NULL and the state store
    # treats NULL keys as equal, so without the split every null-bodied
    # row after the first would be silently dropped as a "duplicate" of
    # an unrelated row. Null-text rows bypass dedup entirely (union of
    # two filtered branches of the same source — a supported streaming
    # shape).
    hashed = stream.withColumn("__text_hash", F.md5(F.col(text_col)))
    deduped = (
        hashed.filter(F.col("__text_hash").isNotNull())
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
    )
    passthrough = hashed.filter(F.col("__text_hash").isNull())
    return deduped.unionByName(passthrough).drop("__text_hash")
