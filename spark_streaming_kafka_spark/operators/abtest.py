"""Experiment-analysis primitives: two-proportion z-test over variants.

The decision layer on top of the engine's funnel/retention operators:
given a deterministic unit→variant assignment and a per-unit success
flag, compute per-variant conversion and the pooled two-proportion
z-statistic — the standard A/B readout. The statistic is closed-form
column algebra over TWO tiny aggregates, so at 100 TB the cost is one
hash aggregation per unit (map-side combined) and a 2-row reduction;
nothing about the test itself touches the driver.

Determinism notes (this feeds the DuckDB oracle gate): assignment must
be a pure function of the unit key (modulus here, rendezvous/HRW in
``operators/skew`` for weighted splits — never ``rand()``), and all
counts are exact longs, so the only doubles are final ratios of exact
integers — identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_proportion_ztest(
    events: DataFrame,
    unit_col: str,
    success: "F.Column",
    variant: "F.Column | None" = None,
) -> DataFrame:
    """Pooled two-proportion z-test between variant 0 and variant 1.

    ``success`` is any boolean Column over the event rows (a unit
    converts if ANY of its rows succeeds); ``variant`` defaults to
    ``unit_col % 2``, the simplest deterministic split. Returns one
    row: per-variant unit counts and conversions, conversion rates,
    and the z statistic ``(p0 - p1) / sqrt(p*(1-p)*(1/n0 + 1/n1))``
    with the pooled rate ``p``. Rates and z are rounded to 6.
    """
    if variant is None:
        variant = (F.col(unit_col) % 2).cast("int")
    per_unit = events.groupBy(
        F.col(unit_col).alias("__unit"), variant.alias("__variant")
    ).agg(F.max(success.cast("int")).alias("__conv"))
    is0 = (F.col("__variant") == 0).cast("long")
    is1 = (F.col("__variant") == 1).cast("long")
    # Conditional sums pivot the two variants inside ONE aggregation —
    # no scalar cross join for the plan audit to flag.
    out = per_unit.groupBy().agg(
        F.sum(is0).alias("n_0"),
        F.sum(is1).alias("n_1"),
        F.sum(is0 * F.col("__conv")).alias("conv_0"),
        F.sum(is1 * F.col("__conv")).alias("conv_1"),
    )
    # try_divide throughout: ANSI mode (Spark 4 default) turns /0 into a
    # runtime error, and a degenerate experiment (empty arm, pooled rate
    # 0 or 1) must report NULL, not raise mid-sweep.
    p0 = F.try_divide(F.col("conv_0"), F.col("n_0"))
    p1 = F.try_divide(F.col("conv_1"), F.col("n_1"))
    p = (F.col("conv_0") + F.col("conv_1")) / (F.col("n_0") + F.col("n_1"))
    se = F.sqrt(
        p
        * (1 - p)
        * (
            F.try_divide(F.lit(1), F.col("n_0"))
            + F.try_divide(F.lit(1), F.col("n_1"))
        )
    )
    return out.select(
        "n_0",
        "n_1",
        "conv_0",
        "conv_1",
        F.round(p0, 6).alias("rate_0"),
        F.round(p1, 6).alias("rate_1"),
        F.round(F.when(se > 0, (p0 - p1) / se), 6).alias("z"),
    )


def cuped_summary(
    units: DataFrame,
    pre_col: str,
    post_col: str,
) -> DataFrame:
    """CUPED variance-reduction summary over per-unit (pre, post)
    metrics: ``theta = cov(pre, post) / var(pre)`` and the variance
    reduction the adjustment ``post - theta * (pre - mean(pre))``
    achieves, which is exactly ``corr(pre, post)²``.

    The experiment-sensitivity companion to
    :func:`two_proportion_ztest`: before running a test on a noisy
    metric, CUPED says how much pre-period behavior can soak up —
    reduction near 0 means the pre-period covariate is useless, near 1
    means most between-unit noise is removable. One aggregation over
    the units table (covar/var/corr are single-pass partial-merge
    aggregates in both engines); outputs are scale-free ratios of the
    same sums, so 1e-12 fold-order noise dies at round-6.

    Returns one row: (``n``, ``theta``, ``var_reduction_pct``), NULL
    theta/reduction when var(pre) is 0 (constant covariate).
    """
    # corr² spelled as covar²/(var·var): ANSI-mode corr() itself raises
    # DIVIDE_BY_ZERO on a constant column; try_divide yields NULL.
    cov = F.covar_pop(pre_col, post_col)
    return units.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.try_divide(cov, F.var_pop(pre_col)),
            6,
        ).alias("theta"),
        F.round(
            F.try_divide(
                cov * cov, F.var_pop(pre_col) * F.var_pop(post_col)
            )
            * 100,
            6,
        ).alias("var_reduction_pct"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group: "F.Column",
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two groups —
    the nonparametric complement of :func:`two_proportion_ztest` for
    CONTINUOUS outcomes with no normality assumption (revenue, latency
    — exactly the heavy-tailed columns a mean-based test misreads).

    ``group`` must evaluate to 0/1. Tie handling is the standard
    average-rank ("midrank") convention with the tie variance
    correction; the normal approximation
    ``z = (U1 - n1·n2/2) / sqrt(n1·n2/12 · ((n+1) - Σ(t³-t)/(n(n-1))))``
    is returned alongside U.

    NO global sort of the data: midranks come from the DISTINCT-VALUE
    table — per distinct value, rows-below + (count+1)/2 — so the only
    window runs over the value-cardinality-sized aggregate, and every
    rank sum is an exact integer-weighted aggregate. Output one row:
    ``(n_0, n_1, u_1, z)``.
    """
    # NULL values carry no rank: Spark's ascending sort places NULLs
    # first while ANSI engines place them last, so an unfiltered NULL
    # group would shift every midrank differently per engine.
    g = df.select(
        F.col(value_col).alias("__v"), group.cast("int").alias("__g")
    ).filter(F.col("__v").isNotNull())
    per_val = g.groupBy("__v").agg(
        F.count(F.lit(1)).alias("__t"),
        F.sum("__g").cast("long").alias("__t1"),
    )
    from pyspark.sql import Window as _W

    w = _W.orderBy(F.col("__v").asc()).rowsBetween(
        _W.unboundedPreceding, _W.currentRow
    )
    # midrank(v) = (#rows below v) + (t_v + 1)/2 ; the unpartitioned
    # window is VALUE-CARDINALITY-sized (the aggregate), never the fact
    # table — the same bound the suite's other distinct-value windows
    # carry. For unbounded-cardinality doubles, bucket first or rank
    # with percentile.global_rank.
    ranked = per_val.withColumn(
        "__below", F.sum("__t").over(w) - F.col("__t")
    ).withColumn(
        "__midrank", F.col("__below") + (F.col("__t") + 1) / 2.0
    )
    agg = ranked.agg(
        F.sum(F.col("__t") - F.col("__t1")).cast("long").alias("n_0"),
        F.sum("__t1").cast("long").alias("n_1"),
        F.sum(F.col("__t1") * F.col("__midrank")).alias("__r1"),
        F.sum(
            F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")
        ).cast("long").alias("__tie3"),
    )
    n0, n1 = F.col("n_0"), F.col("n_1")
    n = n0 + n1
    u1 = F.col("__r1") - n1 * (n1 + 1) / 2.0
    var = (
        n0.cast("double") * n1 / 12.0
        * ((n + 1) - F.col("__tie3") / (n.cast("double") * (n - 1)))
    )
    z = F.when(var > 0, (u1 - n0.cast("double") * n1 / 2.0) / F.sqrt(var))
    return agg.select(
        "n_0", "n_1", u1.alias("u_1"), z.alias("z")
    )


#: Cumulative probabilities of Poisson(1): P(X <= k) for k = 0..7.
#: Literal doubles (identical in any engine); the tail above 7 is
#: ~1e-10 and maps to weight 8.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.919698602928606,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    n_replicates: int = 50,
    alpha: float = 0.05,
    seed: str = "boot",
) -> DataFrame:
    """Deterministic Poisson bootstrap CI for the mean of
    ``value_col`` — THE distributed bootstrap: instead of resampling n
    units with replacement (which needs global coordination), each
    unit draws an independent Poisson(1) weight per replicate, which
    converges to the same resampling distribution and is one data pass.

    Weights are DERIVED, not random: ``u = md5_long(unit, b) / 2^60``
    → inverse-CDF lookup against the Poisson(1) table — the engine's
    seeded-permutation precedent (manifest dedup), so the DuckDB
    oracle reproduces every draw and the CI is hash-checkable. Output
    one row: ``(n_units, n_replicates, mean_value, ci_low, ci_high)``
    with the percentile-method CI over replicate means.

    Plan: one explode of (unit, value) × replicate ids (map-side;
    the shuffle is map-combined to n_replicates rows per partition),
    one replicate-sized aggregation, one exact-percentile reduction
    over n_replicates rows.
    """
    from ..functions.hashing import md5_long

    b = F.explode(
        F.array(*[F.lit(i) for i in range(1, n_replicates + 1)])
    ).alias("__b")
    base = df.select(
        F.col(unit_col).alias("__unit"), F.col(value_col).alias("__x")
    )
    drawn = base.select("__unit", "__x", b)
    u = md5_long(
        F.concat(
            F.lit(seed + "_"),
            F.col("__unit").cast("string"),
            F.lit("_"),
            F.col("__b").cast("string"),
        )
    ) / F.lit(float(1 << 60))
    wexpr = F.lit(len(_POISSON1_CDF))
    for k in range(len(_POISSON1_CDF) - 1, -1, -1):
        wexpr = F.when(u <= F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(wexpr)
    # Keep the weighted sum in the INPUT's type: with integer values
    # (pass cents, not dollars) every replicate sum is exact in both
    # engines and the replicate mean is ONE division of exact integers
    # — bit-identical, where a float accumulation's order noise would
    # flip round-6 on 1e10-magnitude sums.
    weighted = drawn.select(
        "__b", (wexpr * F.col("__x")).alias("__wx"),
        wexpr.cast("long").alias("__w"),
    )
    reps = weighted.groupBy("__b").agg(
        (F.sum("__wx").cast("double") / F.sum("__w")).alias("__mean")
    ).filter(F.col("__mean").isNotNull())
    lo, hi = alpha / 2.0, 1.0 - alpha / 2.0
    # Point estimate: one bounded three-scalar collect at build (the
    # documented corpus-constant pattern — a 1x1 crossJoin would put a
    # CartesianProduct in the returned plan, which the suite audit
    # rightly bans). n_units counts DISTINCT resampling units (the
    # thing the bootstrap draws weights for); the mean stays the row
    # mean, which is what the cluster bootstrap estimates when a unit
    # spans several rows.
    n_units, n_rows, total = df.agg(
        F.countDistinct(F.col(unit_col)),
        F.count(F.lit(1)),
        F.sum(F.col(value_col)),
    ).first()
    mean_value = (
        float(total) / n_rows
        if n_rows and total is not None
        else float("nan")
    )
    return reps.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.expr(f"percentile(__mean, {lo!r})").alias("ci_low"),
        F.expr(f"percentile(__mean, {hi!r})").alias("ci_high"),
    ).select(
        F.lit(int(n_units)).cast("long").alias("n_units"),
        "n_replicates",
        F.lit(float(mean_value)).alias("mean_value"),
        "ci_low",
        "ci_high",
    )
