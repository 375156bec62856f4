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
