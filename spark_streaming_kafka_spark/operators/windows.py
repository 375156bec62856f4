"""W2 — windowed per-group ranking / top-k.

The reference serves top-25 for ONE user at a time via driver-side
``takeOrdered`` (``engine.py:73-81``). The scalable generalization ranks
every group in one pass: ``row_number() OVER (PARTITION BY g ORDER BY s
DESC)`` — a single shuffle on the group key, no driver round-trips, and
the natural shape for "recommendations for all users" (also available as
``ALSModel.recommendForAllUsers``, see recommend.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_top_k(
    df: DataFrame,
    group: str | Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group with their rank (1-based).

    ``order`` must be a total order (include a unique tiebreaker) for
    deterministic output. Spark plans a single hash-partition shuffle on
    ``group``; with AQE, skewed groups are split at runtime. For heavily
    skewed + tiny k, a two-phase variant (partial per-partition top-k via
    ``mapInPandas``, then final window) cuts the shuffle volume — not
    needed until group cardinality skew actually bites.
    """
    groups = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def trailing_range_sum(
    df: DataFrame,
    group: str | Sequence[str],
    order_col: str,
    value_col: str,
    trailing: int,
    alias: str = "trailing_sum",
) -> DataFrame:
    """Trailing-window aggregate over a VALUE range (``RANGE BETWEEN
    trailing PRECEDING AND CURRENT ROW``), not a row count: every row
    sums the value over all rows of its group whose ``order_col`` lies
    within ``[current - trailing, current]`` — the moving-average /
    rolling-revenue shape where events are irregularly spaced so ROWS
    frames are wrong.

    One shuffle on the group key + one sort per partition; the range
    frame is evaluated with a sliding two-pointer over the sorted run
    (linear, not per-row rescan). ``order_col`` must be numeric (for
    event time, convert to epoch days/seconds first — which also makes
    the frame's units explicit).
    """
    groups = [group] if isinstance(group, str) else list(group)
    w = (
        Window.partitionBy(*groups)
        .orderBy(F.col(order_col))
        .rangeBetween(-trailing, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value_col).over(w))


def group_mode(
    df: DataFrame,
    group: str | Sequence[str],
    value_col: str,
    alias: str = "mode",
) -> DataFrame:
    """Deterministic per-group mode: the most frequent ``value_col``
    per group, ties broken by the smallest value — one row per group
    ``(group..., mode, mode_count)``.

    Two hash aggregations, no window: count per (group, value) —
    map-side combined — then ``max_by`` over a (count, negated-order
    tiebreak) struct. Built-in ``mode()`` is tie-nondeterministic
    across partitionings; this construction is reproducible anywhere,
    which is the oracle/cluster contract.
    """
    groups = [group] if isinstance(group, str) else list(group)
    counts = df.groupBy(*groups, value_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # min_by over (-count, value): struct comparison is lexicographic,
    # so this maximizes count and breaks ties on the smallest value —
    # one aggregation, no window, deterministic under any partitioning.
    out = counts.groupBy(*groups).agg(
        F.min_by(
            F.struct(F.col(value_col).alias("v"), F.col("__c").alias("c")),
            F.struct(-F.col("__c"), F.col(value_col)),
        ).alias("__m")
    )
    return out.select(
        *groups,
        F.col("__m.v").alias(alias),
        F.col("__m.c").alias(f"{alias}_count"),
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    part_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    window: int = 20,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly detection: flag rows whose value is more
    than ``threshold`` sample standard deviations from the mean of the
    PRECEDING ``window`` rows in their partition — the streaming-metrics
    outlier pass (spike detection over per-type event values) expressed
    as one window aggregation.

    Appends ``zscore`` (rounded to 6, NULL while the trailing window
    has <2 rows or zero variance) and ``is_anomaly``. The frame is
    ``ROWS BETWEEN window PRECEDING AND 1 PRECEDING`` — strictly
    historical, so a spike can't mask itself by inflating its own
    baseline. Pass a total order (unique tiebreaker) in ``order_cols``
    for deterministic results under any partitioning.

    Plan: ONE shuffle on the partition keys, then a single running
    window pass computes both moments; everything stays JVM-side. At
    100 TB the shuffle is the per-key event history — the same key
    layout every per-entity window query in this package uses.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col)
    mu = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    z = F.round((v - mu) / sd, 6)
    zscore = F.when(sd > 0, z)
    return df.withColumn("zscore", zscore).withColumn(
        "is_anomaly", F.coalesce(F.abs(zscore) > F.lit(threshold), F.lit(False))
    )


def time_decay_sum(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_cols: list[str],
    ref_date: str,
    half_life_days: float,
) -> DataFrame:
    """Freshness-weighted aggregate: per group, ``sum(value · w)`` with
    ``w = 0.5^(age_days / half_life)`` — recency-decayed revenue/volume
    so one stale burst can't dominate a "current importance" ranking
    (the time-decay every recommendation/trending score applies, as an
    operator). Output: (group..., n_rows, decayed_sum).

    ``ref_date`` is an explicit literal, NOT max(ts): a global max
    would cost a second pass or a degenerate join, and a pinned
    reference makes the score reproducible across reruns — pass
    "today" from the scheduler. Ages are whole days via ``datediff``
    (type-agnostic: works for TIMESTAMP and TIMESTAMP_NTZ alike, the
    vanilla-session rule). The per-row weight is ROUNDED to 9 digits
    before the multiply so every engine sums identical doubles.

    Scale shape: pure column algebra into ONE partial-aggregated hash
    aggregate — the same single pass any grouped sum costs; no window,
    no second scan.
    """
    age = F.datediff(F.lit(ref_date).cast("date"), F.col(ts_col))
    w = F.round(
        F.pow(F.lit(0.5), age.cast("double") / F.lit(float(half_life_days))), 9
    )
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col(value_col) * w), 2).alias("decayed_sum"),
    )
