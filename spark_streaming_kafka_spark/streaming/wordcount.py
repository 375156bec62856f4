"""X1/A2 — streaming word count (reference ``kafka_streaming.py``).

The reference counted words per micro-batch with no running state (its
``reduceByKey`` reset every batch). The rebuild exposes both semantics:

- ``running=True`` (default): a real stateful streaming aggregation —
  ``groupBy(word).count()`` in update mode; Spark keeps the state store,
  checkpointable, scales by key partitioning.
- ``running=False``: per-batch counts via ``foreachBatch`` parity mode,
  reproducing the reference's reset-each-batch behavior.

Works over any streaming source with a string ``value`` column (kafka,
socket, memory, rate+format).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from ..operators.relational import word_count


def streaming_word_count(stream: DataFrame, text_col: str = "value") -> DataFrame:
    """Stateful running counts (update/complete mode at the writer)."""
    return word_count(stream, text_col)


def per_batch_word_count_writer(
    stream: DataFrame,
    sink: Callable[[DataFrame, int], None],
    text_col: str = "value",
    trigger_seconds: int = 5,
) -> DataStreamWriter:
    """Reference-parity per-batch counts: each micro-batch counted in
    isolation (X2 ``transform`` + X3 ``foreachRDD`` shape) and handed to
    ``sink(batch_counts_df, batch_id)``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sink(word_count(batch_df, text_col), batch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
