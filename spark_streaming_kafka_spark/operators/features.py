"""Feature-engineering operators for model-training tables — the step
where curated rows become numeric model inputs: leakage-safe target
encoding, per-dimension scaler statistics over embedding columns, and
balanced class weights.

The reference repo's ML surface stops at ALS (spark_music.py); these
are the tabular/feature-side counterparts a training pipeline needs
around it, built on the same determinism contract as the rest of the
package: fold assignment from the portable md5-prefix hash (no RNG
state), money in exact integer cents, every double output rounded by
the caller.

Scale shapes: target encoding is one hash aggregation over the fact
table plus dimension-sized window algebra (the fold×category grid);
scaler stats are one posexplode + hash aggregation keyed by dimension
index (cardinality = vector width, map-side combined); class weights
are one label-sized aggregation. No collects, no windows over fact
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def target_encode_kfold(
    df: DataFrame,
    category_col: str,
    target_col: str,
    id_col: str,
    n_folds: int = 5,
    seed: str = "te",
) -> DataFrame:
    """K-fold (out-of-fold) target encoding — THE leakage-safe way to
    turn a categorical column into a numeric feature: a row in fold f
    receives the mean target of its category computed over every OTHER
    fold, so no row's own label leaks into its feature.

    Folds are DERIVED, not random: ``fold = md5_long(seed || id) %
    n_folds`` (the package's seeded-permutation precedent), so both
    engines assign identical folds and the encoding is hash-checkable.
    Output one row per (category, fold) — the encoding table a trainer
    joins back onto the fact rows: ``(category, fold, n_in, n_out,
    enc)`` where ``enc = (sum(cat) − sum(cat, fold)) / (n(cat) −
    n(cat, fold))``, NULL when the fold holds the whole category
    (``try_divide``).

    Plan: ONE fact-sized hash aggregation by (category, fold); the
    leave-one-fold-out algebra runs on that grid (categories ×
    n_folds rows) via a category-partitioned window — dimension-sized,
    never the fact table.
    """
    fold = (
        md5_long(
            F.concat(
                F.lit(seed + "_"), F.col(id_col).cast("string")
            )
        )
        % n_folds
    ).cast("int")
    grid = (
        df.select(
            F.col(category_col).alias("category"),
            fold.alias("fold"),
            F.col(target_col).alias("__y"),
        )
        .groupBy("category", "fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_in"),
            F.sum("__y").alias("__s"),
        )
    )
    w = Window.partitionBy("category")
    tot_n = F.sum("n_in").over(w)
    tot_s = F.sum("__s").over(w)
    return grid.select(
        "category",
        "fold",
        "n_in",
        (tot_n - F.col("n_in")).cast("long").alias("n_out"),
        F.try_divide(
            (tot_s - F.col("__s")).cast("double"),
            (tot_n - F.col("n_in")).cast("double"),
        ).alias("enc"),
    )


def feature_scaler_stats(
    df: DataFrame,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Per-dimension scaler statistics over an embedding/feature-vector
    column: ``(dim, n_values, v_min, v_max, v_mean, v_std)`` — the fit
    step of min-max and standard scaling, computed distributed (the
    sklearn ``.fit`` that no longer fits in one process at corpus
    scale).

    Plan: posexplode (map-side, narrow) then one hash aggregation keyed
    by dimension index — key cardinality = vector width, so the shuffle
    after partial combine is (partitions × width) rows regardless of
    corpus size. Elements are cast to double BEFORE aggregation so both
    engines accumulate in the same type. ``dim`` is 1-based (matching
    SQL array subscripts).
    """
    ex = df.select(
        F.posexplode(F.col(vec_col)).alias("__i", "__v")
    ).select(
        (F.col("__i") + 1).alias("dim"),
        F.col("__v").cast("double").alias("__v"),
    )
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.min("__v").alias("v_min"),
        F.max("__v").alias("v_max"),
        F.avg("__v").alias("v_mean"),
        F.stddev_samp("__v").alias("v_std"),
    )


def class_weights(
    df: DataFrame,
    label_col: str,
) -> DataFrame:
    """Balanced class weights — sklearn's ``class_weight="balanced"``
    formula ``w_c = n / (k · n_c)`` (k = number of classes), the
    standard counter to label imbalance when sampling or weighting a
    training set.

    One label-sized aggregation; n and k come from unpartitioned
    windows over that LABEL-SIZED result (the benford-total precedent
    — never over fact rows). Exact integer counts, one double division.
    """
    counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    w = Window.partitionBy()
    n = F.sum("n_rows").over(w)
    k = F.count(F.lit(1)).over(w)
    return counts.select(
        "label",
        "n_rows",
        (n.cast("double") / (k * F.col("n_rows"))).alias("weight"),
    )
