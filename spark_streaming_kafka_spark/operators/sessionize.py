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


def transition_pairs(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Consecutive (key, prev_state, next_state) rows from per-key
    event sequences — ONE ``lead()`` window ordered by (ts, tiebreak),
    the total-order discipline every ranking in this repo follows. The
    shared front half of :func:`markov_transitions` and
    :func:`sequence_logprob`; its streaming twin is
    ``streaming/transitions.py`` (lead windows are unsupported on
    streams, so the carry-over between micro-batches lives in the
    state store there)."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return (
        events.select(
            F.col(key_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(state_col).alias("prev_state"),
        )
        .withColumn("next_state", F.lead("prev_state").over(w))
        .filter(F.col("next_state").isNotNull())
    )


def markov_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: (prev_state, next_state, n_transitions, prob) with
    ``prob = P(next | prev)`` row-normalized — the behavioral-model
    summary of a clickstream (what follows a view? how absorbing is
    purchase?) and the input to sequence-anomaly scoring (a session
    whose transitions are improbable under the corpus matrix).

    Consecutive-pair extraction is one ``lead()`` window per key,
    ordered by (ts, tiebreak) — the tiebreak makes simultaneous events
    deterministic, the same total-order discipline every ranking in
    this repo follows. Pair counting is a partial-aggregated groupBy on
    (prev, next) — at most |states|² rows reach the final stage, so the
    row-normalizing window runs on a states²-bounded table (same
    bounded-window discipline as ``kmv_cross_group_overlap``).

    Scale shape: one user-keyed shuffle (the lead window) + one
    states²-bounded aggregate. Sequences never leave their key's
    partition; the matrix itself is broadcast-sized by construction.
    """
    pairs = transition_pairs(events, key_col, ts_col, state_col, tiebreak_col)
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wp = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "next_state",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp), 6
        ).alias("prob"),
    )


def sequence_logprob(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
    matrix: DataFrame | None = None,
) -> DataFrame:
    """Per-key behavioral likelihood under the corpus transition
    matrix: (key, n_transitions, avg_logprob) where ``avg_logprob`` is
    the mean ln P(next|prev) over the key's consecutive transitions —
    the sequence-anomaly screen :func:`markov_transitions` exists to
    feed (a session walking improbable edges scores far below the
    population; bots, scripted replays, and instrumentation bugs all
    surface here before any per-event rule fires).

    ``matrix`` defaults to the matrix fitted on ``events`` itself
    (self-scoring, the profiling shape); pass a frozen matrix to score
    new traffic against a reference period (the drift shape). Scoring
    uses the matrix's ROUNDED probabilities, so both engines take ln
    of identical doubles — the cross-engine determinism rule every
    double-valued query follows.

    Scale shape: the pairs need the same one user-keyed window shuffle
    the matrix fit pays; the matrix itself is |states|²-bounded and
    BROADCAST into the scoring join, so facts never shuffle again —
    profile once, score in the same pass.
    """
    pairs = transition_pairs(events, key_col, ts_col, state_col, tiebreak_col)
    if matrix is None:
        matrix = markov_transitions(
            events, key_col, ts_col, state_col, tiebreak_col
        )
    probs = matrix.select("prev_state", "next_state", "prob")
    return (
        pairs.join(F.broadcast(probs), ["prev_state", "next_state"])
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.round(F.avg(F.log("prob")), 6).alias("avg_logprob"),
        )
    )


def debounce_first_per_burst(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_ms: int = 5_000,
) -> DataFrame:
    """Burst suppression: keep only the FIRST event of each burst per
    key, where a burst is a maximal run of events whose inter-event
    gaps are all ≤ ``gap_ms`` — duplicate-click / retry / at-least-once
    redelivery hygiene at ingest (the temporal twin of
    ``curation.source_cap_sample``'s volume caps: there the guard is
    "too many overall", here it is "too many at once").

    Burst boundaries are the sessionize_by_gap rule with the keep
    reduced to the session's opening event: one lag over the same
    (ts, tiebreak)-ordered key window, so the cost is the single
    hash-partition shuffle every per-key ranking pays, and the result
    is deterministic under any partitioning. Epoch-ms arithmetic via
    ``unix_millis`` (inputs loaded through ``load_table`` are
    normalized TIMESTAMP).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    ms = F.unix_millis(F.col(ts_col))
    keep = F.lag(ms).over(w).isNull() | (ms - F.lag(ms).over(w) > gap_ms)
    return events.withColumn("__keep", keep).filter(F.col("__keep")).drop(
        "__keep"
    )


def merge_intervals(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    duration_ms: int = 5 * 60 * 1000,
) -> DataFrame:
    """Islands-and-gaps interval merging: expand each event to the
    interval ``[ts, ts + duration_ms)`` and coalesce per-key intervals
    that overlap or touch into maximal islands.

    The classic warehouse interval-coalesce (uptime windows, visit
    stitching, meeting-room occupancy). Differs from
    :func:`sessionize_by_gap` in that membership is decided against the
    RUNNING MAX interval end, not the immediately previous event — a
    short event inside a long one must not split the island, which the
    plain lag-gap rule would get wrong for variable-length intervals.

    One window shuffle on ``key_cols``: running-max end over strictly
    preceding rows, island breaks where ``start > prev_max_end``,
    island ids by running sum, then the per-island rollup reuses the
    same hash partitioning under AQE. Deterministic under any
    partitioning via the (ts, tiebreak) order.

    Returns one row per island: key cols, ``island_idx`` (0-based,
    per key), ``start_ms``, ``end_ms`` (exclusive), ``n_events``,
    ``span_ms``.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    start = F.unix_millis(F.col(ts_col))
    end = start + F.lit(duration_ms)
    prev_max_end = F.max(end).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (start > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.select(
        *key_cols,
        start.alias("__start"),
        end.alias("__end"),
        (
            F.sum(new_island).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.lit(1)
        ).cast("long").alias("island_idx"),
    )
    return tagged.groupBy(*key_cols, "island_idx").agg(
        F.min("__start").alias("start_ms"),
        F.max("__end").alias("end_ms"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max("__end") - F.min("__start")).alias("span_ms"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity month
    (the cohort), counted in each subsequent month they were active.

    The standard product-analytics retention report. Three hash
    aggregations, all on bounded-cardinality outputs: distinct
    (user, month) activity; per-user min month (the cohort); then the
    (cohort, offset) rollup. The user->cohort join broadcasts when the
    user dimension is small and shuffles on ``user_col`` otherwise —
    both sides are already distinct-per-user so no skew beyond the
    natural user distribution.

    Returns (``cohort_month`` 'yyyy-MM', ``month_offset``, ``n_users``,
    ``retention`` = n_users / cohort size at offset 0, rounded to 6).
    """
    month = F.date_trunc("month", F.col(ts_col))
    active = (
        events.select(
            F.col(user_col).alias("__user"), month.alias("__month")
        )
        .distinct()
    )
    cohorts = active.groupBy("__user").agg(
        F.min("__month").alias("__cohort")
    )
    per_cell = (
        active.join(cohorts, "__user")
        .groupBy("__cohort", "__month")
        .agg(F.countDistinct("__user").alias("n_users"))
        .select(
            F.date_format("__cohort", "yyyy-MM").alias("cohort_month"),
            F.months_between(F.col("__month"), F.col("__cohort"))
            .cast("long")
            .alias("month_offset"),
            "n_users",
        )
    )
    size_w = Window.partitionBy("cohort_month")
    base = F.max(
        F.when(F.col("month_offset") == 0, F.col("n_users"))
    ).over(size_w)
    return per_cell.select(
        "cohort_month",
        "month_offset",
        "n_users",
        F.round(F.col("n_users") / base, 6).alias("retention"),
    )


def first_seen_cumulative(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "month",
    fmt: str = "yyyy-MM",
) -> DataFrame:
    """Cumulative unique-user growth: per period, how many users appear
    for the FIRST time, and the running total of users seen so far.

    The growth-accounting curve "how many customers have we ever had" —
    NOT expressible as a windowed count(distinct) (no engine runs
    distinct aggregates over cumulative frames at scale); the scalable
    identity is first-seen attribution: cumulative distinct users
    through period P = sum of per-period first-timer counts up to P.
    One per-user min (map-side combined), one periods-sized rollup,
    one running sum over the periods-sized table. Returns (``period``,
    ``n_new``, ``cum_users``).
    """
    firsts = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(F.date_trunc(period, F.col(ts_col))).alias("__p")
    )
    per_period = firsts.groupBy(
        F.date_format("__p", fmt).alias("period")
    ).agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy(F.col("period").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )  # periods-sized table only
    return per_period.select(
        "period", "n_new", F.sum("n_new").over(w).alias("cum_users")
    )


def new_vs_returning_rollup(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    period: str = "month",
    fmt: str = "yyyy-MM",
) -> DataFrame:
    """Per-period value split into FIRST-period vs RETURNING users —
    the new/repeat revenue decomposition every growth report opens
    with (is revenue growth acquisition or retention?).

    A row is "new" iff its period equals its user's first-seen period.
    Two hash aggregations on the user key (the per-user first period
    joins back onto the facts — broadcast at small user dims, shuffled
    co-partitioned otherwise) and one periods-sized rollup; the share
    is a ratio of the ROUNDED sums so both engines divide identical
    doubles. Returns (``period``, ``new_value``, ``returning_value``,
    ``n_new_users``, ``n_returning_users``, ``new_share``).
    """
    p = F.date_trunc(period, F.col(ts_col))
    firsts = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(F.date_trunc(period, F.col(ts_col))).alias("__first_p")
    )
    tagged = events.join(
        firsts, F.col(user_col) == F.col("__u")
    ).select(
        F.date_format(p, fmt).alias("period"),
        F.col(user_col).alias("__user"),
        F.col(value_col).alias("__v"),
        (p == F.col("__first_p")).alias("__is_new"),
    )
    new_v = F.round(
        F.sum(F.when(F.col("__is_new"), F.col("__v")).otherwise(F.lit(0.0))), 4
    )
    ret_v = F.round(
        F.sum(
            F.when(~F.col("__is_new"), F.col("__v")).otherwise(F.lit(0.0))
        ),
        4,
    )
    out = tagged.groupBy("period").agg(
        new_v.alias("new_value"),
        ret_v.alias("returning_value"),
        F.countDistinct(
            F.when(F.col("__is_new"), F.col("__user"))
        ).alias("n_new_users"),
        F.countDistinct(
            F.when(~F.col("__is_new"), F.col("__user"))
        ).alias("n_returning_users"),
    )
    return out.select(
        "period",
        "new_value",
        "returning_value",
        "n_new_users",
        "n_returning_users",
        F.round(
            F.try_divide(
                F.col("new_value"),
                F.col("new_value") + F.col("returning_value"),
            ),
            6,
        ).alias("new_share"),
    )
