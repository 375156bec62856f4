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
