"""Distribution-drift monitoring between two corpus snapshots.

The pre-publish gate a production training-data pipeline runs when a
new crawl/batch lands: has the feature mix (language, length, quality,
…) shifted against the reference corpus? Metric: Population Stability
Index per feature,

    PSI(f) = Σ_bins (p_b − q_b) · ln(p_b / q_b)

with p/q the reference/current bin proportions floored at ``eps`` so
empty bins contribute a finite penalty (the standard industry form;
PSI < 0.1 ≈ stable, 0.1–0.25 ≈ drifting, > 0.25 ≈ shifted).

Shape at scale: each snapshot is scanned ONCE — every feature's bin
assignment is a row-local expression, exploded to (feature, bin) and
aggregated in a single partial-agg groupBy, so adding features adds
zero passes and the shuffle carries bin counts, never rows. Everything
downstream (full-outer bin align, per-feature totals, PSI terms) is
|features|·|bins|-sized. Deterministic given the binning, so the whole
report has a value-exact DuckDB oracle (queries.py::q_drift_report).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bin_counts", "psi_from_counts", "psi_report"]

_NULL_BIN = "∅"


def bin_counts(df: DataFrame, features: list[tuple[str, Column]]) -> DataFrame:
    """(feature, bin, n) — ONE scan of ``df`` regardless of feature
    count. NULL bin values map to a sentinel so the later full-outer
    join aligns them (join keys never match on NULL)."""
    structs = [
        F.struct(
            F.lit(name).alias("feature"),
            F.coalesce(expr.cast("string"), F.lit(_NULL_BIN)).alias("bin"),
        )
        for name, expr in features
    ]
    return (
        df.select(F.explode(F.array(*structs)).alias("fb"))
        .groupBy(F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    features: list[tuple[str, Column]],
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Per-feature PSI between ``ref`` and ``cur``.

    ``features`` is a list of (name, binning expression) — the
    expression must be row-local (a language column, ``floor(len/50)``,
    a quality-score bucket, …) and is applied identically to both
    snapshots. Returns one row per feature:
    (feature, ref_rows, cur_rows, n_bins, psi) sorted by feature.

    Both count aggregations reduce to |bins| rows before any join, the
    per-feature totals join is broadcast-sized, and the PSI sum is a
    second tiny aggregation — the snapshots themselves never shuffle.
    """
    return psi_from_counts(
        bin_counts(ref, features), bin_counts(cur, features), eps, round_to
    )


def psi_from_counts(
    rc: DataFrame,
    cc: DataFrame,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """PSI from two precomputed :func:`bin_counts` tables — the piece
    the streaming monitor reuses so the reference corpus is binned
    ONCE, not once per micro-batch (streaming/drift.py)."""
    from pyspark.sql.window import Window

    aligned = (
        rc.withColumnRenamed("n", "ref_n")
        .join(cc.withColumnRenamed("n", "cur_n"), ["feature", "bin"], "full_outer")
        .fillna(0, subset=["ref_n", "cur_n"])
    )
    # Per-feature totals via a window over the (already bin-sized)
    # aligned table — a tiny extra sort, but it keeps the lineage
    # LINEAR: a groupBy-totals + join-back would plan the whole
    # bin-count subtree twice and scan each snapshot twice.
    w = Window.partitionBy("feature")
    aligned = aligned.withColumn("ref_rows", F.sum("ref_n").over(w)).withColumn(
        "cur_rows", F.sum("cur_n").over(w)
    )
    p = F.greatest(F.col("ref_n") / F.col("ref_rows"), F.lit(eps))
    q = F.greatest(F.col("cur_n") / F.col("cur_rows"), F.lit(eps))
    return (
        aligned.withColumn("term", (p - q) * F.log(p / q))
        .groupBy("feature")
        .agg(
            F.first("ref_rows").alias("ref_rows"),
            F.first("cur_rows").alias("cur_rows"),
            F.count(F.lit(1)).alias("n_bins"),
            F.round(F.sum("term"), round_to).alias("psi"),
        )
        .orderBy("feature")
    )


def mean_shift_changepoint(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key changepoint detection: the split position maximizing the
    CUSUM mean-shift statistic ``sqrt(i·(n−i)/n) · |mean(x₁..xᵢ) −
    mean(xᵢ₊₁..xₙ)|`` over the (ts, tiebreak)-ordered series — the
    first step of binary segmentation, and the question the PSI drift
    report can't answer: not "did the distribution move between two
    snapshots" but WHEN, inside one series, the level shifted most.
    Output: (key..., n, change_ts_ms, stat) — one row per key with
    ≥ 2 points; ``change_ts_ms`` is the last point of the left
    segment (epoch ms).

    All prefix/suffix means come from ONE cumulative window over the
    key partition (prefix sums make every candidate split O(1)), the
    arg-max is a rank over the same partition, and the statistic is
    rounded before ranking with (ts, tiebreak) tiebreaks — so both
    engines pick identical splits. Cost: the single per-key window
    shuffle; no per-split recomputation, no UDFs.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_key = Window.partitionBy(*key_cols)
    x = F.col(value_col).cast("double")
    cur = df.select(
        *key_cols,
        F.unix_millis(F.col(ts_col)).alias("__ms"),
        F.col(tiebreak_col).alias("__tb"),
        F.sum(x).over(w_cum).alias("__cum"),
        F.row_number()
        .over(Window.partitionBy(*key_cols).orderBy(*order))
        .alias("__i"),
        F.sum(x).over(w_key).alias("__tot"),
        F.count(F.lit(1)).over(w_key).alias("__n"),
    ).filter(F.col("__i") < F.col("__n"))
    i, n = F.col("__i").cast("double"), F.col("__n").cast("double")
    pre = F.col("__cum") / i
    post = (F.col("__tot") - F.col("__cum")) / (n - i)
    stat = F.round(F.sqrt(i * (n - i) / n) * F.abs(pre - post), 6)
    ranked = cur.select(
        *key_cols,
        F.col("__n").alias("n"),
        F.col("__ms").alias("change_ts_ms"),
        stat.alias("stat"),
        F.row_number()
        .over(
            Window.partitionBy(*key_cols).orderBy(
                stat.desc(), F.col("__ms").asc(), F.col("__tb").asc()
            )
        )
        .alias("__r"),
    )
    return ranked.filter(F.col("__r") == 1).drop("__r")


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information between two CATEGORICAL columns:
    one row (n, mi, h_x, h_y) with ``mi = Σ p(x,y)·ln(p(x,y) /
    (p(x)p(y)))`` in nats and the marginal entropies for reference
    (``mi / min(h_x, h_y)`` is the usual normalized association). The
    column-relationship profile for feature screens and leakage checks
    — ``corr_quantity_price`` answers this for numeric pairs, PMI for
    adjacent tokens; this is the categorical-pair member.

    NULL in either column drops the row (same discipline as the
    sketches). One partial-aggregated pass builds the (x, y)
    contingency table; every window after runs on that
    |X|·|Y|-bounded table (the caller's contract is categorical
    columns — bucket continuous ones first, e.g. with
    ``histogram_sketch`` bins). Counts are integers, so both engines
    derive the doubles from identical inputs; outputs round to 6.
    """
    from pyspark.sql import Window

    joint = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_all = Window.partitionBy()  # |X|·|Y| rows by construction
    w_x = Window.partitionBy("__x")
    w_y = Window.partitionBy("__y")
    c = F.col("__c").cast("double")
    n = F.sum("__c").over(w_all).cast("double")
    cx = F.sum("__c").over(w_x).cast("double")
    cy = F.sum("__c").over(w_y).cast("double")
    cells = joint.select(
        F.col("__c"),
        ((c / n) * F.log(c * n / (cx * cy))).alias("__mi_term"),
        (c / n).alias("__pxy"),
        (cx / n).alias("__px"),
        (cy / n).alias("__py"),
        F.sum("__c").over(w_all).alias("__n"),
        # entropy terms must count each marginal ONCE: weight the
        # per-cell marginal term by the cell's share of its marginal
        ((c / cx) * (-(cx / n) * F.log(cx / n))).alias("__hx_term"),
        ((c / cy) * (-(cy / n) * F.log(cy / n))).alias("__hy_term"),
    )
    return cells.groupBy().agg(
        F.max("__n").alias("n"),
        F.round(F.sum("__mi_term"), 6).alias("mi"),
        F.round(F.sum("__hx_term"), 6).alias("h_x"),
        F.round(F.sum("__hy_term"), 6).alias("h_y"),
    )
