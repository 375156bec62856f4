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


def rolling_zscore_bucketed(
    df: DataFrame,
    value_col: str,
    part_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    bucket_col: Column,
    window: int = 20,
    threshold: float = 3.0,
) -> DataFrame:
    """:func:`rolling_zscore` for LOW-CARDINALITY partition keys — the
    scale-out form when one key's full history is too much for one
    task (the r11 SCALING.md finding: `events` has ~5 event types, so
    the plain per-type window runs ~5-way parallel at ANY volume).

    Exact same output: the input is sub-partitioned on
    ``(part_cols..., bucket)`` (``bucket_col``: any monotone function
    of the order — e.g. ``date_trunc('month', ts)``), and each
    bucket's last ``window`` rows are ALSO emitted into the next
    non-empty bucket as carry rows — they extend that bucket's
    trailing frames across the boundary, then drop from the output.
    Parallelism becomes keys × buckets instead of keys.

    Exactness requires every non-final bucket of a key to hold at
    least ``window`` rows (otherwise a frame would need to reach TWO
    buckets back); the operator verifies that with one bounded
    (keys × buckets)-sized probe at build and raises ``ValueError``
    asking for coarser buckets when violated — the same
    probe-gate-at-build pattern as the dedup cluster loop.

    Plan: one shuffle of the fact rows on (key, bucket), one
    dimension-sized bucket-index aggregation (dense per-key bucket
    numbering, so carries hop EMPTY buckets correctly), the tail
    extraction and the z-score both ride the same (key, bucket)
    window partitioning.
    """
    parts = [F.col(c) if isinstance(c, str) else c for c in part_cols]
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    base_cols = list(df.columns)
    b = df.withColumn("__bkt", bucket_col)
    # dense per-key bucket index over the DISTINCT (key, bucket) table
    # (dimension-sized window, not the fact table) — consecutive
    # indexes even when calendar buckets are empty.
    idx_w = Window.partitionBy(*parts).orderBy(F.col("__bkt").asc())
    idx = (
        b.select(*parts, F.col("__bkt"))
        .distinct()
        .withColumn("__bi", F.row_number().over(idx_w))
    )
    data = b.join(idx, [*part_cols, "__bkt"])
    bw = Window.partitionBy(*parts, F.col("__bi"))
    # probe gate: every non-final bucket must hold >= window rows
    probe = (
        data.groupBy(*parts, "__bi")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__is_last",
            F.col("__bi")
            == F.max("__bi").over(Window.partitionBy(*parts)),
        )
        .filter(~F.col("__is_last") & (F.col("__n") < window))
        .limit(1)
        .collect()
    )
    if probe:
        raise ValueError(
            "rolling_zscore_bucketed: a non-final bucket holds fewer "
            f"than window={window} rows (e.g. {probe[0].asDict()}); "
            "coarsen bucket_col so every bucket spans at least one "
            "full window, or fall back to rolling_zscore"
        )
    # tail = rows with fewer than `window` rows after them in their
    # bucket (ascending row_number vs bucket size — the order columns
    # may already carry asc()/desc() wrappers, so no desc() re-wrap).
    rn_asc = F.row_number().over(bw.orderBy(*order))
    n_in_bkt = F.count(F.lit(1)).over(bw)
    carries = (
        data.withColumn("__rn", rn_asc)
        .withColumn("__nb", n_in_bkt)
        .filter(F.col("__rn") > F.col("__nb") - window)
        .drop("__rn", "__nb")
        .withColumn("__bi", F.col("__bi") + 1)
        .withColumn("__carry", F.lit(1))
    )
    unioned = data.withColumn("__carry", F.lit(0)).unionByName(carries)
    # width pin (the _bucket_pairs/AQE lesson): the z-window's exchange
    # carries only a few MB at test SF, so AQE would coalesce the whole
    # keys x buckets layout back to ONE task — an explicit numbered
    # repartition on the window keys pins the parallelism this operator
    # exists to provide.
    width = df.sparkSession.sparkContext.defaultParallelism
    unioned = unioned.repartition(width, *parts, F.col("__bi"))
    zw = bw.orderBy(*order).rowsBetween(-window, -1)
    v = F.col(value_col)
    mu = F.avg(v).over(zw)
    sd = F.stddev_samp(v).over(zw)
    zscore = F.when(sd > 0, F.round((v - mu) / sd, 6))
    return (
        unioned.withColumn("zscore", zscore)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("zscore")) > F.lit(threshold), F.lit(False)),
        )
        .filter(F.col("__carry") == 0)
        .select(*base_cols, "zscore", "is_anomaly")
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


def rolling_median(
    df: DataFrame,
    part_col: str,
    order_cols: list[str],
    value_col: str,
    preceding: int = 2,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Exact rolling median of ``value_col`` over the trailing
    ``preceding``+1 rows of each ``part_col`` group.

    The robust twin of the running mean: one spike does not move it,
    which is why monitoring and pricing features prefer it. Spark's
    exact ``percentile`` aggregate works as a window function over a
    ROWS frame, so this stays a single per-key window shuffle with a
    bounded O(frame) buffer per row — no self-join, no collect_list
    blowup beyond the fixed frame, linear-interpolation semantics
    identical to DuckDB's ``median`` (even-count frames average the
    two middle values).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-preceding, Window.currentRow)
    )
    # Backtick-quoted identifier in the expr string (r9 ADVICE: a bare
    # f-string broke on names needing quoting — spaces/dots/hyphens).
    # `median()` can't replace this: Spark 4.x rejects it over a window
    # frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC); `percentile`
    # with the same exact-interpolation semantics is frame-capable.
    qname = "`" + value_col.replace("`", "``") + "`"
    return df.withColumn(out_col, F.expr(f"percentile({qname}, 0.5)").over(w))


def period_growth(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 12),
) -> DataFrame:
    """Period-over-period growth: monthly rollup of ``value_col`` plus
    percent change vs each lag in ``lags`` (1 = MoM, 12 = YoY).

    The data-sized input collapses to one row per calendar month FIRST
    (map-side-combined hash agg), so the only unpartitioned window —
    unavoidable for a global time series — orders a months-sized table
    (~e2 rows for years of data), never the fact table. Missing prior
    periods (series head) yield NULL growth, as does a zero base —
    try_divide, never /0. Sums are rounded to 4 before the ratio so
    both engines difference identical doubles. Lags step over PRESENT
    months (an empty calendar month is absent from the rollup, not a
    zero row), so on sparse series "lag 12" means twelve active months
    back — gap-fill first if calendar alignment matters.
    """
    monthly = (
        df.groupBy(
            F.date_format(F.date_trunc("month", F.col(ts_col)), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(F.round(F.sum(value_col), 4).alias("value"))
    )
    w = Window.orderBy(F.col("month").asc())  # months-sized table only
    out = monthly
    for lag in lags:
        prev = F.lag("value", lag).over(w)
        out = out.withColumn(
            f"growth_{lag}",
            F.round(F.try_divide(F.col("value") - prev, prev) * 100, 6),
        )
    return out


def seasonal_baseline_residual(
    df: DataFrame,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Day-of-week seasonal baseline and residual for a daily series.

    The first stage of any weekly-seasonality decomposition: roll the
    facts up to one row per day (data-sized work, one hash agg), then
    attach each day-of-week's mean over the whole span and the day's
    deviation from it. The dow means are computed with a window over
    the days-sized rollup (bounded: one row per calendar day), so
    nothing beyond the initial aggregation touches the fact table.
    ``dow`` is Sunday=0..Saturday=6 — Spark's ``dayofweek()-1``,
    matching DuckDB's ``dayofweek()`` for the oracle.
    """
    daily = (
        df.groupBy(F.date_trunc("day", F.col(ts_col)).alias("__day"))
        .agg(F.round(F.sum(value_col), 4).alias("day_value"))
        .select(
            F.date_format("__day", "yyyy-MM-dd").alias("day"),
            (F.dayofweek("__day") - 1).cast("int").alias("dow"),
            "day_value",
        )
    )
    w = Window.partitionBy("dow")  # days-sized table only
    # Residual subtracts the ROUNDED mean: the raw avg carries ~1e-10
    # fold-order noise between engines, which a later round() can tip
    # across a digit boundary — subtracting identical rounded doubles
    # keeps the residual bit-identical under the oracle.
    dow_mean = F.round(F.avg("day_value").over(w), 6)
    return daily.select(
        "day",
        "dow",
        "day_value",
        dow_mean.alias("dow_mean"),
        F.round(F.col("day_value") - dow_mean, 6).alias("residual"),
    )


def ses_forecast(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Simple-exponential-smoothing one-step forecast per key over the
    daily rollup of ``value_col`` — the baseline forecaster every
    monitoring pipeline wants next to its anomaly flags.

    The recursion ``l_t = α·v_t + (1-α)·l_{t-1}`` (init ``l_1 = v_1``)
    UNROLLS to a weighted sum — ``l_T = (1-α)^{T-1}·v_1 +
    Σ_{i>1} α·(1-α)^{T-i}·v_i`` — so no sequential scan, no UDF: one
    daily rollup, one per-key window for the day index, one weighted
    aggregate, all whole-stage codegen. Weights are rounded to 9
    (decay_weighted_revenue's pow-portability discipline: JVM and C
    ``pow`` may differ in the last ulp) and daily sums to 4, so both
    engines sum identical doubles.

    Returns per key: ``n_days``, ``forecast`` (round 6).
    """
    daily = df.groupBy(
        *key_cols, F.date_trunc("day", F.col(ts_col)).alias("__day")
    ).agg(F.round(F.sum(value_col), 4).alias("__v"))
    w = Window.partitionBy(*key_cols).orderBy(F.col("__day").asc())
    idx = F.row_number().over(w)
    n = F.count(F.lit(1)).over(Window.partitionBy(*key_cols))
    weight = F.round(
        F.pow(F.lit(1.0 - alpha), (n - idx).cast("double")), 9
    ) * F.when(idx == 1, F.lit(1.0)).otherwise(F.lit(alpha))
    contrib = daily.select(
        *key_cols, (F.col("__v") * weight).alias("__c")
    )
    return contrib.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.sum("__c"), 6).alias("forecast"),
    )
