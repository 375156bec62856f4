"""Watermarked event-time window aggregation — the streaming form of
operators/timewindows.py (same ``F.window`` grouping; Structured
Streaming plans it incrementally).

The reference never had event-time semantics (its DStreams are
processing-time micro-batches, SURVEY.md §2.10 "absent" list); this is
the built-in upgrade: late events within the watermark still land in
their correct window, state for closed windows is dropped (bounded
memory — mandatory for an unbounded stream), and results are
deterministic w.r.t. event time rather than arrival time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_stream_agg(
    stream: DataFrame,
    ts_col: str,
    width: str,
    aggs: list[Column],
    slide: str | None = None,
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time windowed aggregation over a streaming DataFrame.

    ``watermark`` bounds both lateness tolerated and state retained:
    a window closes (and its state is freed) once event time passes
    window_end + watermark. Use output mode 'append' to emit each
    window exactly once at close, or 'update' for running refinements.
    """
    win = (
        F.window(ts_col, width, slide) if slide else F.window(ts_col, width)
    ).alias("__w")
    keys = list(group_cols or [])
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win, *keys)
        .agg(*aggs)
        .withColumn("window_start_ms", F.unix_millis("__w.start"))
        .withColumn("window_end_ms", F.unix_millis("__w.end"))
        .drop("__w")
    )
