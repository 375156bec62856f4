"""Stream-stream joins with watermark-bounded state.

Not representable in the reference's DStream stack at all (its join-like
logic happens on collected driver lists, SURVEY.md §3 E2); Structured
Streaming runs a true distributed stream-stream join: both sides are
buffered in state keyed by the join key, and the watermark + time-range
condition lets Spark EVICT buffered rows once they can no longer match —
without both bounds, state grows forever on an unbounded stream.

Pattern (the one to copy for any correlation-within-Δt use case, e.g.
click→purchase attribution):

    joined = time_bounded_join(clicks, purchases, key="user_id",
                               left_ts="ts", right_ts="ts",
                               max_delay="10 minutes")

Scale: state size ≈ input rate × (watermark + max_delay) per side,
hash-partitioned by key — independent of total stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event happens within
    [left_ts, left_ts + max_delay].

    Both watermarks plus the range condition bound the join state; Spark
    drops buffered left rows once watermark passes left_ts + max_delay,
    and right rows once they can no longer match any live left row.
    Column names other than ``key`` must be disjoint (alias first).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        # qualified upper bound: a bare F.expr(left_ts) is ambiguous
        # whenever both streams name their timestamp column the same
        # (the module example's left_ts = right_ts = 'ts' case)
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"interval {max_delay}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
