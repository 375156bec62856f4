"""Behavioral / marketing analytics: attribution, conversion latency,
RFM segmentation, behavioral entropy.

The event-stream questions a product-analytics user asks right after
funnels (`funnel_conversion`) and transitions
(`event_markov_transitions`):

- :func:`position_attribution` — split each conversion's value across
  the user's preceding touch events (U-shaped position weighting).
- :func:`time_to_conversion` — per-user first-touch → first-conversion
  latency.
- :func:`rfm_scores` — recency/frequency/monetary quintile scoring of
  customers over their order history.
- :func:`behavioral_entropy` — Shannon entropy of each user's
  event-type mix (how specialized vs. diverse a user's activity is).

Determinism contract (queries.py rules): weights are rational
arithmetic (divisions of exact integers — no pow/exp, whose last-ulp
behavior differs across engines), every ranking carries a unique
tiebreaker, doubles are rounded by the callers before comparison.
Entropy uses log2 like the committed mutual-information operator
(`event_hour_mutual_info` established cross-engine log parity under
round-6).

Scale shapes: everything here is hash aggregations plus per-user
equi-joins/windows — shuffles keyed by user/customer, fact-sized once,
then dimension-sized. The attribution join is bounded per user by the
lookback window; pathological single-user streams are the same skew
knob every per-user operator in this package shares (salt or cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "position_attribution",
    "time_to_conversion",
    "rfm_scores",
    "behavioral_entropy",
    "event_path_trigrams",
    "interarrival_gaps",
    "active_users_rolling",
    "kaplan_meier",
]


def position_attribution(
    events: DataFrame,
    convert_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_ms: int = 7 * 24 * 3600 * 1000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution.

    For every conversion event, its ``value`` is credited to the same
    user's touch events with ``0 <= Δt <= lookback_ms`` before the
    conversion: 40% to the first touch, 40% to the last, the remaining
    20% split evenly over the middle touches (1 touch → 100%, 2 →
    50/50 — the standard U-shape degenerations). Credits aggregate per
    touch ``event_type``.

    Output: ``(event_type, n_touches, credited_value)`` — how much
    conversion revenue each channel actually drove, vs. the last-click
    answer a naive groupBy gives.

    Plan: conversions ⋈ touches is a per-user equi-join (both sides
    shuffle by user once), the window filter prunes to the lookback,
    position weights come from one row_number window per conversion,
    and the final aggregate is channel-sized. Weights are exact
    rational divisions — no float pow — so the DuckDB twin reproduces
    every credit bit-for-bit before rounding.
    """
    conv = events.filter(F.col(type_col) == convert_type).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__cts"),
        F.col("event_id").alias("__cid"),
        F.col(value_col).alias("__val"),
    )
    touch = events.filter(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__tts"),
        F.col("event_id").alias("__tid"),
        F.col(type_col).alias("event_type"),
    )
    joined = conv.join(touch, "__u").filter(
        (F.col("__tts") <= F.col("__cts"))
        & (
            F.unix_millis(F.col("__cts")) - F.unix_millis(F.col("__tts"))
            <= F.lit(lookback_ms)
        )
    )
    w = Window.partitionBy("__cid").orderBy(
        F.col("__tts").asc(), F.col("__tid").asc()
    )
    pos = joined.select(
        "__cid",
        "__val",
        "event_type",
        F.row_number().over(w).alias("__pos"),
        F.count(F.lit(1)).over(Window.partitionBy("__cid")).alias("__n"),
    )
    n = F.col("__n")
    first_or_last = (F.col("__pos") == 1) | (F.col("__pos") == n)
    weight = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when(first_or_last, F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2).cast("double"))
    )
    return (
        pos.select(
            "event_type", (F.col("__val") * weight).alias("__credit")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum("__credit").alias("credited_value"),
        )
    )


def time_to_conversion(
    events: DataFrame,
    start_type: str = "view",
    convert_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user conversion latency: first ``start_type`` event → first
    ``convert_type`` event AT OR AFTER it.

    Output: ``(user_id, first_touch_ms, first_conversion_ms,
    latency_s)`` — one row per user who converted after touching;
    never-converted and converted-before-touch users are absent (the
    caller left-joins if it wants the full base). All integer
    epoch-millis arithmetic; ``latency_s`` is millis/1000.0 rounded by
    the caller.

    Plan: one conditional aggregation per user (min ts of each type
    with the conversion min conditioned on >= the touch min via a
    second pass over the same grouped rows) — a single fact shuffle
    keyed by user, no join at all.
    """
    ms = F.unix_millis(F.col(ts_col))
    first_touch = (
        events.filter(F.col(type_col) == start_type)
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.min(ms).alias("first_touch_ms"))
    )
    # The conditional min (first conversion AT OR AFTER the first
    # touch) needs the touch min first: one user-keyed join of the
    # conversion stream against the user-sized touch table (broadcast
    # when the user base is bounded; shuffle-safe regardless), then a
    # second user-keyed aggregation.
    conv = events.filter(F.col(type_col) == convert_type).select(
        F.col(user_col).alias("user_id"), ms.alias("__cms")
    )
    first_conv_after = (
        conv.join(first_touch, "user_id")
        .filter(F.col("__cms") >= F.col("first_touch_ms"))
        .groupBy("user_id")
        .agg(F.min("__cms").alias("first_conversion_ms"))
    )
    return (
        first_touch.join(first_conv_after, "user_id")
        .select(
            "user_id",
            "first_touch_ms",
            "first_conversion_ms",
            (
                (F.col("first_conversion_ms") - F.col("first_touch_ms"))
                / 1000.0
            ).alias("latency_s"),
        )
    )


def rfm_scores(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    buckets: int = 5,
) -> DataFrame:
    """RFM segmentation: per customer, ``ntile(buckets)`` scores for
    Recency (days since last order — lower is better, so the tile runs
    over recency DESC to make 5 = most recent), Frequency (order
    count), and Monetary (total spend in exact cents).

    Output: ``(customer_id, recency_days, n_orders, total_cents,
    r_score, f_score, m_score)``. Monetary uses integer cents
    (``round(price*100)``) so cross-engine sums are exact; every ntile
    ordering carries the customer id tiebreak (the committed
    ntile_buckets parity precedent).

    Plan — the scale-honest global ranking, FUSED: one fact
    aggregation by customer (checkpointed once; the dataset's last
    order date is read off it by the same bounded collect, so there is
    no separate fact-table scan for the constant), then ONE
    :func:`~.percentile.global_ntile_multi` pass scores all three
    orderings — a single range shuffle + a single bounded offset-count
    job instead of three chained global_ntile passes (never the
    single-partition ``Window.partitionBy()`` trap an unpartitioned
    ntile plans). At dimension-table sizes the pass barriers are the
    wall time; the fusion cut the query from 19 to ~11 stages.
    """
    from .percentile import global_ntile_multi

    per_cust = orders.groupBy(
        F.col(customer_col).alias("customer_id")
    ).agg(
        F.max(F.col(ts_col)).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col(amount_col) * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
    ).localCheckpoint(eager=False)
    max_date = per_cust.agg(F.max("__last")).first()[0]
    rec = per_cust.select(
        "customer_id",
        F.datediff(F.lit(max_date), F.col("__last"))
        .cast("long")
        .alias("recency_days"),
        "n_orders",
        "total_cents",
    )
    scored = global_ntile_multi(
        rec,
        [
            (-F.col("recency_days"), "r_score"),  # recency DESC
            (F.col("n_orders"), "f_score"),
            (F.col("total_cents"), "m_score"),
        ],
        buckets,
        tiebreak_col="customer_id",
    )
    return scored.select(
        "customer_id",
        "recency_days",
        "n_orders",
        "total_cents",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
    )


def behavioral_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Shannon entropy (bits) of each user's event-type distribution:
    ``H(u) = -Σ_t p_t log2 p_t`` with ``p_t = n_{u,t} / n_u``.

    The behavioral-diversity score: 0 = a user who only ever does one
    thing, log2(k) = uniform over k types. Output: ``(user_id,
    n_events, entropy_bits)``.

    Plan: one (user, type) hash aggregation (map-side combined), one
    user-sized re-aggregation deriving the total and the entropy sum
    in a single pass — the per-user total is folded in via sum-over-
    group rather than a join. Counts are exact integers; log2 parity
    under round-6 follows the mutual-information precedent.
    """
    ut = events.groupBy(
        F.col(user_col).alias("user_id"), F.col(type_col).alias("__t")
    ).agg(F.count(F.lit(1)).alias("__c"))
    per_user = ut.groupBy("user_id").agg(
        F.sum("__c").cast("long").alias("n_events"),
        F.sum(F.col("__c") * F.log2("__c")).alias("__clogc"),
    )
    # H = log2(n) - (Σ c·log2 c)/n  — one pass, no p_t materialization
    return per_user.select(
        "user_id",
        "n_events",
        (
            F.log2("n_events") - F.col("__clogc") / F.col("n_events")
        ).alias("entropy_bits"),
    )


def event_path_trigrams(
    events: DataFrame,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_id_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` most common length-3 event-type paths across users —
    "what do people actually DO in sequence" (the path-analysis staple
    behind every sankey diagram).

    Each user's event stream, ordered by (ts, event id), yields one
    trigram per position via two ``lead`` windows — no
    ``collect_list`` of whole histories, so per-user state through the
    shuffle is O(1) per row, not O(events). Output: ``(step1, step2,
    step3, n_paths)``, ties broken by the path itself.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_id_col).asc()
    )
    tri = events.select(
        F.col(type_col).alias("step1"),
        F.lead(type_col, 1).over(w).alias("step2"),
        F.lead(type_col, 2).over(w).alias("step3"),
    ).filter(F.col("step3").isNotNull())
    counts = tri.groupBy("step1", "step2", "step3").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    from .relational import top_k

    return top_k(
        counts,
        [
            F.col("n_paths").desc(),
            F.col("step1").asc(),
            F.col("step2").asc(),
            F.col("step3").asc(),
        ],
        k,
    )


def interarrival_gaps(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_id_col: str = "event_id",
) -> DataFrame:
    """Per-user inter-arrival-time statistics — the core behavioral
    cadence features (bot detection: near-constant sub-second gaps;
    churn models: stretching gaps): for every user with at least two
    events, the count/mean/stddev/min/max of the millisecond gaps
    between consecutive events.

    One shuffle on the user key (high-cardinality — parallelism is the
    user count, unlike the type-keyed windows), one ``lag`` window
    pass, one hash aggregation. Gaps are exact integer epoch-ms
    differences; the mean is one division of exact integers, so the
    whole row hash-matches the SQL twin. Output: ``(user_id, n_gaps,
    mean_gap_ms, std_gap_ms, min_gap_ms, max_gap_ms)``.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_id_col).asc()
    )
    ms = F.unix_millis(F.col(ts_col))
    gap = (ms - F.lag(ms, 1).over(w)).alias("__gap")
    gaps = events.select(F.col(user_col).alias("user_id"), gap).filter(
        F.col("__gap").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        (F.sum("__gap").cast("double") / F.count(F.lit(1))).alias(
            "mean_gap_ms"
        ),
        F.stddev_samp(F.col("__gap").cast("double")).alias("std_gap_ms"),
        F.min("__gap").cast("long").alias("min_gap_ms"),
        F.max("__gap").cast("long").alias("max_gap_ms"),
    )


def active_users_rolling(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 28,
) -> DataFrame:
    """Rolling N-day active users per OBSERVED day — the
    DAU/WAU/MAU-style engagement series: for each calendar day that
    has any event, how many distinct users were active in the
    ``window_days`` ending on it.

    The scale-honest shape: a sliding COUNT DISTINCT cannot be a
    window aggregate (distinct does not decompose), so each distinct
    (user, active-day) pair is exploded into the ``window_days``
    window-ends it supports, deduped to (user, window-end), and hash
    aggregated — volume is ``distinct(user, day) × window_days``
    narrow rows, map-side combinable, no per-day scan and no
    single-partition anything. Output: ``(day, active_users)`` with
    the day formatted ISO so both engines compare as strings.
    """
    ud = events.select(
        F.col(user_col).alias("__u"), F.to_date(F.col(ts_col)).alias("__d")
    ).distinct()
    days = ud.select(F.col("__d").alias("__end")).distinct()
    ends = ud.select(
        "__u",
        F.explode(
            F.sequence(
                F.col("__d"),
                F.date_add(F.col("__d"), window_days - 1),
            )
        ).alias("__end"),
    ).distinct()
    observed = ends.join(days, "__end", "left_semi")
    return observed.groupBy("__end").agg(
        F.count(F.lit(1)).cast("long").alias("active_users")
    ).select(
        F.date_format("__end", "yyyy-MM-dd").alias("day"), "active_users"
    )


def kaplan_meier(
    subjects: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan–Meier product-limit survival estimate — the churn/
    retention curve done right: a user still active at the observation
    cutoff is CENSORED (we know they survived *at least* this long),
    not a churn event, and naive retention curves that ignore that
    distinction bias survival down.

    Input is one row per subject: ``duration_col`` (integer time
    units) and ``event_col`` (1 = event observed, 0 = censored). The
    fact-sized work is ONE hash aggregation to the distinct-duration
    table; everything after is window algebra over that
    duration-cardinality-sized table (the package's documented
    distinct-value-window bound — durations are days/weeks, not
    facts). At-risk counts come from a DESCENDING cumulative sum (no
    grand-total pass needed); the survival product is
    ``exp(Σ ln((r−d)/r))`` over the ascending event times — both
    factors exact-integer ratios, the ln/exp round-trip agrees
    cross-engine at round-6 (the mutual-information precedent). A
    time point where all remaining subjects fail (``d = r``) sends
    survival to exactly 0 from there on (the ln is skipped, not
    evaluated at 0).

    Output: one row per distinct duration WITH observed events —
    ``(duration, n_risk, n_events, n_censored, survival)`` — the
    standard KM step-curve support.
    """
    per_t = subjects.groupBy(
        F.col(duration_col).cast("long").alias("duration")
    ).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum(1 - F.col(event_col).cast("long")).alias("n_censored"),
        F.count(F.lit(1)).cast("long").alias("__t"),
    )
    asc = Window.orderBy(F.col("duration").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    desc = Window.orderBy(F.col("duration").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.withColumn(
        "n_risk", F.sum("__t").over(desc).cast("long")
    )
    d, r = F.col("n_events"), F.col("n_risk")
    ln_factor = F.when(
        d < r, F.log((r - d).cast("double") / r.cast("double"))
    )  # NULL when d == r (absorbing zero) or d == 0 (ln 1 skipped too
    # cheaply as an aggregate no-op: ln(1) = 0 contributes nothing,
    # but evaluating it keeps the expression uniform — d==0 rows pass
    # the d < r guard and contribute exactly 0.0)
    curve = risk.withColumn(
        "__zero",
        F.max((d == r).cast("int")).over(asc),
    ).withColumn(
        "__lnsum", F.sum(ln_factor).over(asc)
    )
    survival = F.when(F.col("__zero") == 1, F.lit(0.0)).otherwise(
        F.exp(F.coalesce(F.col("__lnsum"), F.lit(0.0)))
    )
    return (
        curve.filter(d > 0)
        .select(
            "duration",
            "n_risk",
            "n_events",
            "n_censored",
            F.round(survival, 6).alias("survival"),
        )
        .orderBy("duration")
    )


def nelson_aalen(
    subjects: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate — the additive
    companion to :func:`kaplan_meier`: ``H(t) = Σ_{tᵢ≤t} dᵢ/rᵢ`` with
    variance ``Σ dᵢ/rᵢ²``, the curve survival analysts difference to
    read the hazard RATE over time (KM's product form hides it).

    Identical execution contract to :func:`kaplan_meier`: one
    fact-sized hash aggregation to the distinct-duration table, then
    window algebra bounded by duration cardinality (days/weeks, never
    facts); at-risk counts from the descending cumulative sum. Every
    per-time term is a ratio of exact integers summed over a bounded
    table — no ln/exp needed for the hazard itself, so the only
    transcendental is the derived ``exp(−H)`` survival (the
    Fleming–Harrington estimator, KM's asymptotic twin, worth emitting
    for the diff-against-KM sanity check). Censored subjects leave the
    risk set without contributing events, exactly as in KM.

    Output: one row per distinct duration WITH observed events —
    ``(duration, n_risk, n_events, cum_hazard, var_hazard,
    fh_survival)`` round-6, ascending.
    """
    per_t = subjects.groupBy(
        F.col(duration_col).cast("long").alias("duration")
    ).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("__t"),
    )
    asc = Window.orderBy(F.col("duration").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    desc = Window.orderBy(F.col("duration").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.withColumn(
        "n_risk", F.sum("__t").over(desc).cast("long")
    )
    d = F.col("n_events").cast("double")
    r = F.col("n_risk").cast("double")
    curve = risk.withColumn(
        "cum_hazard", F.sum(d / r).over(asc)
    ).withColumn("var_hazard", F.sum(d / (r * r)).over(asc))
    return (
        curve.filter(F.col("n_events") > 0)
        .select(
            "duration",
            "n_risk",
            "n_events",
            F.round(F.col("cum_hazard"), 6).alias("cum_hazard"),
            F.round(F.col("var_hazard"), 6).alias("var_hazard"),
            F.round(F.exp(-F.col("cum_hazard")), 6).alias(
                "fh_survival"
            ),
        )
        .orderBy("duration")
    )
