"""Event sessionization (batch form of the streaming session semantics).

Two session notions ship with the engine:

- :func:`sessionize_by_gap` — classic inactivity-gap sessions: a new
  session starts when a user's inter-event gap exceeds ``gap``. One
  window shuffle on user_id; session ids via lag + running sum —
  no state, no UDFs, scales with the window shuffle. (The streaming
  equivalent is ``F.session_window`` on event time with a watermark.)
- ``streaming.sessions`` — the reference's sentinel-bounded sessions
  (``slot == 'm3'`` flush, ``spark_kafka.py:92-94``), stateful form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_by_gap(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Tag every event with a per-user ``session_idx`` (0-based).

    lag + cumulative sum over one window: a single hash-partition
    shuffle on ``user_col``; AQE splits skewed users at runtime.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    ms = F.unix_millis(F.col(ts_col))
    new_session = F.when(
        ms - F.lag(ms).over(w) > gap_ms, F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn(
        "session_idx", F.sum(new_session).over(running).cast("long")
    )


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session-level rollup: (user, session_idx) → event count, start/end
    epoch-ms, duration. Same partitioning as sessionize_by_gap ⇒ the agg
    reuses the shuffle under AQE."""
    return sessions.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_millis(F.min(ts_col)).alias("start_ms"),
        F.unix_millis(F.max(ts_col)).alias("end_ms"),
        (F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col))).alias("duration_ms"),
    )


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: per user, the FIRST completion time of
    each step STRICTLY AFTER the previous step's completion (the
    standard product-analytics funnel — a click before the first view
    does not count as a converted click).

    Output: one row per user who completed step 1, with
    ``<step>_ms`` epoch-millis columns, NULL from the first
    uncompleted step onward.

    Plan: one partial-aggregated min per step over the user-keyed
    shuffle (k-1 joins against the shrinking converted set — each
    later stage's input is a SUBSET of the previous, so the join
    frontier only narrows). No windows, no state; scales with the
    per-step hash aggregates.
    """
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("__t"),
        F.unix_millis(F.col(ts_col)).alias("__ms"),
    )
    first = steps[0]
    result = (
        base.filter(F.col("__t") == first)
        .groupBy("user_id")
        .agg(F.min("__ms").alias(f"{first}_ms"))
    )
    prev = f"{first}_ms"
    for s in steps[1:]:
        nxt = (
            base.filter(F.col("__t") == s)
            .join(result.select("user_id", prev), "user_id")
            .filter(F.col("__ms") > F.col(prev))
            .groupBy("user_id")
            .agg(F.min("__ms").alias(f"{s}_ms"))
        )
        result = result.join(nxt, "user_id", "left")
        prev = f"{s}_ms"
    return result
