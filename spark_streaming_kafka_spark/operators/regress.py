"""Closed-form modeling diagnostics: OLS with two regressors, 2-D PCA,
autocorrelation of a bounded series, and entropy-based feature ranking.

The reference repo's modeling surface stops at ALS training
(spark_music.py); these are the classic closed-form statistics a
training-data pipeline runs BEFORE fitting anything iterative — "is
this feature linearly informative, how collinear are these two
columns, is this series autocorrelated, which categorical splits the
label" — each one expressible as a single hash aggregation of exact
sums followed by constant-size column algebra, so they cost one
fact pass at 100 TB and never touch the driver.

Determinism contract (these feed the DuckDB oracle gate): every
fact-sized sum is over EXACT INTEGERS (money in cents, quantities and
quantized rates as longs), accumulated as ``decimal(38,0)`` on the
Spark side so partial-aggregate fold order cannot perturb a double —
DuckDB's ``HUGEINT`` sums are the same exact value — and the unique
exact sums convert to double once (correctly rounded in both engines)
before the closed form. The only non-arithmetic primitives are
``ln``/``sqrt``/``atan2`` on O(1) quantities, absorbed by round-6
(the package-wide precedent set by mutual information and the
Kaplan–Meier ln/exp round-trip).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _xsum(col: "F.Column") -> "F.Column":
    """Exact sum of an integer-valued column: accumulate as
    decimal(38,0) (Spark decimal aggregation is exact; fold order is
    irrelevant), for conversion to double ONCE at the end. DuckDB's
    oracle twin is ``sum(CAST(x AS HUGEINT))`` — the identical exact
    integer, so both engines feed the closed form the same doubles."""
    return F.sum(col.cast("decimal(38,0)"))


def ols_two_regressors(
    df: DataFrame,
    y_col: "F.Column",
    x1_col: "F.Column",
    x2_col: "F.Column",
) -> DataFrame:
    """Ordinary least squares ``y ~ b0 + b1·x1 + b2·x2`` solved in
    closed form via the normal equations and Cramer's rule — the
    two-regressor fit that answers "after controlling for x1, does x2
    still move y?" without any iterative solver.

    All three inputs must be INTEGER-VALUED columns (the callers
    quantize: cents, quantity units, discount basis points), so the
    nine moment sums (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y,
    Σy²) are exact decimals from ONE map-side-combined hash
    aggregation — at any scale this is a single fact pass producing a
    1-row frame. Cramer's 3×3 determinants and the coefficient
    back-substitution are constant-size double algebra on those unique
    exact values; R² falls out of the same sums via
    ``SSE = Σy² − b0Σy − b1Σx1y − b2Σx2y`` (the normal-equation
    identity), so no second pass over the data.

    Rows with a NULL in any input are dropped. Returns one row:
    ``(n_rows, b_intercept, b_x1, b_x2, r2)``, coefficients round-6;
    all-NULL when the design matrix is singular (|det| below 1e-9 of
    its leading term — constant columns, perfect collinearity).
    """
    base = df.select(
        y_col.cast("long").alias("__y"),
        x1_col.cast("long").alias("__x1"),
        x2_col.cast("long").alias("__x2"),
    ).filter(
        F.col("__y").isNotNull()
        & F.col("__x1").isNotNull()
        & F.col("__x2").isNotNull()
    )
    y, x1, x2 = F.col("__y"), F.col("__x1"), F.col("__x2")
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        _xsum(x1).alias("__s1"),
        _xsum(x2).alias("__s2"),
        _xsum(y).alias("__sy"),
        _xsum(x1 * x1).alias("__s11"),
        _xsum(x2 * x2).alias("__s22"),
        _xsum(x1 * x2).alias("__s12"),
        _xsum(x1 * y).alias("__s1y"),
        _xsum(x2 * y).alias("__s2y"),
        _xsum(y * y).alias("__syy"),
    )
    n = F.col("n_rows").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    sy = F.col("__sy").cast("double")
    s11 = F.col("__s11").cast("double")
    s22 = F.col("__s22").cast("double")
    s12 = F.col("__s12").cast("double")
    s1y = F.col("__s1y").cast("double")
    s2y = F.col("__s2y").cast("double")
    syy = F.col("__syy").cast("double")
    # | n   s1   s2  |        Cramer numerators replace one column
    # | s1  s11  s12 | · b  =  (sy, s1y, s2y)
    # | s2  s12  s22 |
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    # Singularity guard relative to the determinant's leading term so
    # the threshold is scale-free across SFs.
    lead = n * s11 * s22
    ok = F.abs(det) > F.abs(lead) * 1e-9
    b0 = F.when(ok, det0 / det)
    b1 = F.when(ok, det1 / det)
    b2 = F.when(ok, det2 / det)
    sse = syy - b0 * sy - b1 * s1y - b2 * s2y
    sst = syy - sy * sy / n
    r2 = F.when(ok & (sst > 0), 1.0 - sse / sst)
    return agg.select(
        "n_rows",
        F.round(b0, 6).alias("b_intercept"),
        F.round(b1, 6).alias("b_x1"),
        F.round(b2, 6).alias("b_x2"),
        F.round(r2, 6).alias("r2"),
    )


def pca_2d(
    df: DataFrame, x_col: "F.Column", y_col: "F.Column"
) -> DataFrame:
    """Principal components of TWO integer-valued columns in closed
    form: the 2×2 sample-covariance matrix has exact eigenvalues
    ``(tr ± sqrt((cxx−cyy)² + 4cxy²))/2`` and principal angle
    ``atan2(2cxy, cxx−cyy)/2`` — the collinearity/variance-direction
    diagnostic (explained-variance ratio → 1 means one latent axis,
    i.e. the two features are redundant).

    Same execution shape as :func:`ols_two_regressors`: one exact-sum
    hash aggregation (n, Σx, Σy, Σx², Σy², Σxy) then constant double
    algebra; covariances use the explicit-sums identity
    ``(Σxy − ΣxΣy/n)/(n−1)``. NULL rows dropped. Returns one row:
    ``(n_rows, var_x, var_y, cov_xy, lambda1, lambda2,
    explained_ratio, angle_deg)``, doubles round-6; eigen outputs NULL
    when n < 2 or total variance is 0.
    """
    base = df.select(
        x_col.cast("long").alias("__x"), y_col.cast("long").alias("__y")
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    x, y = F.col("__x"), F.col("__y")
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        _xsum(x).alias("__sx"),
        _xsum(y).alias("__sy"),
        _xsum(x * x).alias("__sxx"),
        _xsum(y * y).alias("__syy"),
        _xsum(x * y).alias("__sxy"),
    )
    n = F.col("n_rows").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    ok = F.col("n_rows") >= 2
    cxx = F.when(ok, (sxx - sx * sx / n) / (n - 1))
    cyy = F.when(ok, (syy - sy * sy / n) / (n - 1))
    cxy = F.when(ok, (sxy - sx * sy / n) / (n - 1))
    tr = cxx + cyy
    diff = cxx - cyy
    disc = F.sqrt(diff * diff + 4 * cxy * cxy)
    l1 = (tr + disc) / 2
    l2 = (tr - disc) / 2
    explained = F.when(tr > 0, l1 / tr)
    angle = F.when(ok, F.degrees(F.atan2(2 * cxy, diff) / 2))
    return agg.select(
        "n_rows",
        F.round(cxx, 6).alias("var_x"),
        F.round(cyy, 6).alias("var_y"),
        F.round(cxy, 6).alias("cov_xy"),
        F.round(l1, 6).alias("lambda1"),
        F.round(l2, 6).alias("lambda2"),
        F.round(explained, 6).alias("explained_ratio"),
        F.round(angle, 6).alias("angle_deg"),
    )


def acf_lags(
    series: DataFrame, x_col: str, y_col: str, max_lag: int = 7
) -> DataFrame:
    """Sample autocorrelation of an aggregated series at lags
    ``1..max_lag`` — the "is yesterday predictive of today"
    diagnostic that pairs with :func:`..profiling.mann_kendall_trend`
    (trend) and the package's CCF (cross-series) operator.

    ``series`` must already be AGGREGATED to one row per integer time
    index ``x_col`` (a daily/hourly rollup — dimension-sized by the
    calendar, never fact-sized, the package's documented bounded-series
    contract shared with Theil–Sen). The textbook estimator
    ``r_k = Σ(y_t−ȳ)(y_{t+k}−ȳ) / Σ(y_t−ȳ)²`` uses the GLOBAL mean
    and denominator: both come from a whole-frame window over the
    bounded series (never collected, never a nested-loop 1-row join),
    the lag fan-out from an explode of a literal array, and the lagged
    pairs from a broadcast equi-join of the series to itself
    (``max_lag``× a bounded series stays bounded). Returns ``max_lag`` rows: ``(lag, n_pairs, acf)``
    round-6; ``acf`` NULL when the series is constant.
    """
    from pyspark.sql import Window

    s = series.select(
        F.col(x_col).cast("long").alias("__x"),
        F.col(y_col).cast("double").alias("__v"),
    )
    # Global mean/denominator via a whole-frame window over the
    # calendar-BOUNDED series (never facts) — keeps the plan free of
    # the 1-row-join nested-loop node the suite-wide audit bans; the
    # lag fan-out is an explode of a literal array, not a join.
    wall = Window.partitionBy()
    v = F.col("__v")
    a = s.select(
        "__x",
        v.alias("__va"),
        F.avg("__v").over(wall).alias("__mean"),
        (
            F.sum(v * v).over(wall)
            - F.sum(v).over(wall) * F.sum(v).over(wall)
            / F.count(F.lit(1)).over(wall)
        ).alias("__den"),
    ).withColumn(
        "lag",
        F.explode(
            F.array(
                *[
                    F.lit(i).cast("int")
                    for i in range(1, max_lag + 1)
                ]
            )
        ),
    )
    b = s.select(
        F.col("__x").alias("__xb"), F.col("__v").alias("__vb")
    )
    pairs = a.join(
        F.broadcast(b),
        F.col("__x") + F.col("lag") == F.col("__xb"),
    )
    num = F.sum(
        (F.col("__va") - F.col("__mean"))
        * (F.col("__vb") - F.col("__mean"))
    )
    den = F.first("__den")
    return (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.when(den > 0, num / den), 6
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def info_gain(
    df: DataFrame,
    label: "F.Column",
    features: Sequence[str],
) -> DataFrame:
    """Information gain of categorical features against a binary
    label — the split-quality ranking a decision-tree induction (or a
    feature-selection pass before any model) computes first:
    ``IG(f) = H(Y) − Σ_v p(v)·H(Y|v)`` in nats.

    ``label`` must evaluate to 0/1. The fact-sized work is ONE hash
    aggregation over the melted (feature, value) pairs — melting
    multiplies rows by ``len(features)`` inside the scan projection
    (no shuffle per feature), and the aggregate output is bounded by
    total category cardinality. Entropies are then per-feature sums of
    exact-count ratios (0·ln0 terms dropped by the count>0 guard);
    ``H(Y)`` comes from the same aggregate (any feature's value-sums
    reduce to the label margin, so no second pass). Returns one row
    per feature: ``(feature, n_rows, h_label, h_cond, info_gain)``
    round-6, ordered by feature name.
    """
    melted = df.select(
        label.cast("long").alias("__y"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("feature"),
                        F.col(f).cast("string").alias("__v"),
                    )
                    for f in features
                ]
            )
        ).alias("__fv"),
    ).select("__y", "__fv.feature", "__fv.__v")
    per_val = melted.groupBy("feature", "__v").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__n1"),
    )
    nv = F.col("__n").cast("double")
    n1 = F.col("__n1").cast("double")
    n0 = nv - n1

    def plogp(cnt: "F.Column", tot: "F.Column") -> "F.Column":
        return F.when(cnt > 0, (cnt / tot) * F.log(cnt / tot)).otherwise(
            F.lit(0.0)
        )

    per_feat = per_val.groupBy("feature").agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.sum("__n1").cast("long").alias("__t1"),
        F.sum(nv * (plogp(n0, nv) + plogp(n1, nv))).alias("__condsum"),
    )
    nt = F.col("n_rows").cast("double")
    t1 = F.col("__t1").cast("double")
    t0 = nt - t1
    h_label = -(plogp(t0, nt) + plogp(t1, nt))
    h_cond = -F.col("__condsum") / nt
    return per_feat.select(
        "feature",
        "n_rows",
        F.round(h_label, 6).alias("h_label"),
        F.round(h_cond, 6).alias("h_cond"),
        F.round(h_label - h_cond, 6).alias("info_gain"),
    ).orderBy("feature")
