"""Event-time window aggregations (tumbling / sliding).

Absent from the reference (SURVEY.md §2.10 — its streaming is
processing-time micro-batches only), but fundamental for the events
table and for any watermarked streaming aggregation; the same operators
run unchanged on a batch DataFrame or a streaming one (Structured
Streaming plans ``F.window`` groupings incrementally with state cleanup
once a watermark is set — see streaming/windows.py for the stream form).

Spark's ``F.window`` buckets are epoch-aligned, so the oracle can verify
with plain integer arithmetic on epoch millis — no engine-specific
``time_bucket`` semantics involved.

Scale: a tumbling agg is ONE hash aggregation whose key space is
(windows × groups) — partial map-side combine makes the shuffle
proportional to distinct keys, not input rows. A sliding agg multiplies
rows by width/slide (each row belongs to that many windows) BEFORE the
partial combine; keep width/slide small (≤ a handful) or pre-aggregate
to tumbling slices of the slide width and roll up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    aggs: list[Column],
    slide: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Group ``df`` by an event-time window (+ optional extra keys) and
    aggregate. Output carries ``window_start_ms`` / ``window_end_ms``
    (epoch millis — portable, no raw timestamps) instead of the struct.
    """
    win = (
        F.window(ts_col, width, slide) if slide else F.window(ts_col, width)
    ).alias("__w")
    keys = list(group_cols or [])
    return (
        df.groupBy(win, *keys)
        .agg(*aggs)
        .withColumn("window_start_ms", F.unix_millis("__w.start"))
        .withColumn("window_end_ms", F.unix_millis("__w.end"))
        .drop("__w")
    )


def hourly_type_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour stats per event_type over the events table."""
    return windowed_agg(
        events,
        "ts",
        "1 hour",
        [
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        ],
        group_cols=["event_type"],
    ).select("window_start_ms", "event_type", "n", "sum_value")


def gap_fill_hourly(
    df: DataFrame, key: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Resample to a dense per-key hourly grid: one row per (key, hour)
    between each key's first and last event, zero-filled where no
    events fell — the gap-fill step every downstream time-series model
    assumes has happened.

    Grid = per-key bounds (one agg) + ``sequence`` explode (rows ∝ key's
    active span, generated executor-side — no driver loop), then a left
    join against the hourly counts on (key, hour). Both joins/aggs hash
    on the same key ⇒ AQE keeps it to two shuffles total at any scale.
    """
    # floor division via floor(), not `div`: `div` truncates toward
    # zero, so pre-1970 (negative-epoch) events would land one hour
    # late — inconsistent with the F.window operators in this module,
    # which floor. (Millis magnitudes ~1e12 are exact in double.)
    ms = F.floor(F.expr(f"unix_millis({ts_col})") / F.lit(3600000)).cast(
        "long"
    )
    bounds = df.groupBy(key).agg(
        F.min(ms).alias("h0"), F.max(ms).alias("h1")
    )
    grid = bounds.select(
        key, F.explode(F.sequence("h0", "h1")).alias("h")
    )
    actual = df.groupBy(F.col(key), ms.alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return grid.join(actual, [key, "h"], "left").select(
        key,
        (F.col("h") * 3600000).alias("hour_ms"),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
    )


def sliding_counts(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window event counts (width 1h, slide 30m ⇒ every event
    counted in exactly 2 windows)."""
    return windowed_agg(
        events,
        "ts",
        width,
        [F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value")],
        slide=slide,
    ).select("window_start_ms", "n", "avg_value")
