"""Temporal joins Spark lacks as built-ins: as-of and band (range) joins.

The reference has no temporal joins (SURVEY.md §2.3 — all equi-joins),
but any event-stream analysis over the ``events`` table wants them, and
both have well-known scalable formulations that avoid the naive
O(n·m) theta-join Spark would otherwise plan:

- :func:`asof_join` — "most recent right row at or before each left
  row" via the union + fill-forward-window trick: ONE shuffle on the
  key, one sort within partitions (the same cost class as a sort-merge
  equi-join). The naive formulation — inequality join then argmax —
  is a BroadcastNestedLoopJoin that dies at scale.
- :func:`band_join` — "pairs within ±tolerance" via interval bucketing:
  each right row lands in one bucket of width = tolerance, each left
  row probes its own and both adjacent buckets, so the join is a plain
  equi-join on (key, bucket) followed by the exact band filter. Shuffle
  volume is 3× left + 1× right — independent of the time span.

Both are deterministic under repartitioning given unique right-side
(key, ts) pairs (pre-aggregate the right side to enforce; the oracle
queries do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "matched_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the greatest ``right_ts`` ≤ ``left_ts`` for the same ``key``.

    Semantics match DuckDB ``ASOF JOIN`` / pandas ``merge_asof``
    (direction='backward', inclusive). Unmatched left rows carry NULLs
    (left-join shape; filter ``{prefix}ts IS NOT NULL`` for inner).

    ``right`` must be unique per (key, right_ts) — pre-aggregate if not;
    with duplicates the fill-forward pick would be partition-dependent.

    Plan: union both sides tagged (right=0, left=1 so a right row at
    exactly left_ts matches), then one window fills the latest right
    payload forward as an ATOMIC struct (all matched columns are
    guaranteed to come from the same right row, even with NULL payload
    values). No nested-loop join, no per-key collect.
    """
    right_cols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l2 = left.withColumn("__ats", F.col(left_ts)).withColumn("__side", F.lit(1))
    r2 = right.select(
        F.col(key),
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("ts"), *[F.col(c) for c in right_cols]
        ).alias("__payload"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ats").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        F.col("__match.ts").alias(f"{prefix}ts"),
        *[F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
    return out


def band_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    tolerance_ms: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left, right) pairs with the same ``key`` whose timestamps
    differ by at most ``tolerance_ms`` (inclusive, either direction).

    Column names other than ``key`` must be disjoint between the two
    inputs (alias before calling). Each pair appears exactly once: a
    right row has ONE bucket, and the left row probes it via exactly one
    of its three candidate buckets.
    """
    if tolerance_ms <= 0:
        # bucket width IS the tolerance; 0 means division by zero under
        # ANSI (the Spark 4 default) or silent emptiness without it —
        # an exact-timestamp match is an equi-join, not a band join
        raise ValueError(
            "tolerance_ms must be positive (for exact-timestamp matches "
            "join on the timestamp column directly)"
        )
    band = F.lit(tolerance_ms)
    lb = left.withColumn("__lms", F.unix_millis(F.col(left_ts)))
    rb = right.withColumn("__rms", F.unix_millis(F.col(right_ts))).withColumn(
        "__bucket", F.floor(F.col("__rms") / band)
    )
    probe = F.floor(F.col("__lms") / band)
    lb = lb.withColumn(
        "__bucket", F.explode(F.array(probe - 1, probe, probe + 1))
    )
    return (
        lb.join(rb, [key, "__bucket"])
        .filter(F.abs(F.col("__lms") - F.col("__rms")) <= band)
        .drop("__bucket", "__lms", "__rms")
    )
