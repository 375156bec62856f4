"""Runnable walkthrough: the round-11 feature-engineering tier — from
curated tables to model-ready features, composed end to end.

    python examples/feature_engineering.py [sf_dir] [out_dir]

Steps: leakage-safe K-fold target encoding of order priority against
order value (md5-derived folds — reproducible across engines and
reruns) → per-dimension scaler statistics over the embedding column
(the distributed sklearn-.fit) → balanced class weights over the
embedding labels → per-user inter-arrival cadence features (bot /
churn signals) → the rolling 28-day active-user series → the
click→purchase cross-correlation function (which lag the purchase
response peaks at). Every step writes parquet to out_dir and prints a
one-screen summary.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.behavior import (
    active_users_rolling,
    interarrival_gaps,
)
from spark_streaming_kafka_spark.operators.features import (
    class_weights,
    feature_scaler_stats,
    target_encode_kfold,
)
from spark_streaming_kafka_spark.operators.regress import (
    info_gain,
    ols_two_regressors,
    pca_2d,
)
from spark_streaming_kafka_spark.operators.timewindows import (
    lag_cross_correlation,
)
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="feature_engineering_"
    )
    spark = get_spark("feature-engineering-example")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    emb = load_table(spark, sf_dir, "embeddings")

    # [1] leakage-safe target encoding: order priority -> mean order
    # cents over the OTHER folds (a row's own label never leaks into
    # its feature).
    cents = orders.withColumn(
        "__cents", F.round(F.col("o_totalprice") * 100).cast("long")
    )
    enc = target_encode_kfold(
        cents, "o_orderpriority", "__cents", "o_orderkey", n_folds=5
    )
    enc.write.mode("overwrite").parquet(f"{out_dir}/target_encoding")
    ex = enc.orderBy("category", "fold").limit(3).collect()
    print(f"[1] target encoding: {enc.count()} (category, fold) rows, e.g.")
    for r in ex:
        print(
            f"    {r['category']!r} fold {r['fold']}: enc {round(r['enc'], 2)}"
            f" from {r['n_out']} out-of-fold rows"
        )

    # [2] scaler fit over the embedding column.
    stats = feature_scaler_stats(emb, "embedding", "vec_id")
    stats.write.mode("overwrite").parquet(f"{out_dir}/scaler_stats")
    worst = stats.orderBy(F.col("v_std").desc()).first()
    print(
        f"[2] scaler stats: {stats.count()} dims; widest dim "
        f"{worst['dim']} (std {round(worst['v_std'], 4)})"
    )

    # [3] balanced class weights for the label column.
    w = class_weights(emb, "label")
    w.write.mode("overwrite").parquet(f"{out_dir}/class_weights")
    rare = w.orderBy(F.col("weight").desc()).first()
    print(
        f"[3] class weights: {w.count()} labels; rarest label "
        f"{rare['label']} gets weight {round(rare['weight'], 3)}"
    )

    # [4] per-user cadence features.
    gaps = interarrival_gaps(events)
    gaps.write.mode("overwrite").parquet(f"{out_dir}/interarrival")
    fast = gaps.filter(F.col("n_gaps") >= 5).orderBy("mean_gap_ms").first()
    print(
        f"[4] cadence: {gaps.count()} users; fastest regular user "
        f"{fast['user_id']} (mean gap {round(fast['mean_gap_ms'] / 1000, 1)} s)"
    )

    # [5] rolling 28-day actives.
    act = active_users_rolling(events, window_days=28)
    act.write.mode("overwrite").parquet(f"{out_dir}/active_28d")
    peak = act.orderBy(F.col("active_users").desc()).first()
    print(
        f"[5] engagement: {act.count()} observed days; peak 28-day "
        f"actives {peak['active_users']} on {peak['day']}"
    )

    # [6] click -> purchase response lag.
    ccf = lag_cross_correlation(events, "click", "purchase", max_lag_hours=12)
    ccf.write.mode("overwrite").parquet(f"{out_dir}/ccf")
    rows = sorted(ccf.collect(), key=lambda r: r["lag_hours"])
    best = max(
        (r for r in rows if r["ccf"] is not None),
        key=lambda r: r["ccf"],
    )
    print(
        f"[6] ccf: purchase response peaks {best['lag_hours']} h after "
        f"clicks (r = {round(best['ccf'], 4)} over {best['n_hours']} hours)"
    )

    # [7] pre-model diagnostics (round-11 batch D): is discount still
    # informative after controlling for quantity?
    li = load_table(spark, sf_dir, "lineitem")
    ols = ols_two_regressors(
        li,
        F.round(F.col("l_extendedprice") * 100),
        F.col("l_quantity"),
        F.round(F.col("l_discount") * 10000),
    ).first()
    print(
        f"[7] OLS cents ~ qty + discount_bps: b_qty "
        f"{round(ols['b_x1'], 2)}, b_disc {round(ols['b_x2'], 4)}, "
        f"R2 {round(ols['r2'], 4)} over {ols['n_rows']} rows"
    )

    # [8] feature-redundancy check: explained-variance ratio near 0.5
    # means the two features carry independent signal.
    pca = pca_2d(
        li, F.col("l_quantity"), F.round(F.col("l_discount") * 10000)
    ).first()
    print(
        f"[8] PCA(qty, discount_bps): explained ratio "
        f"{round(pca['explained_ratio'], 4)} at angle "
        f"{round(pca['angle_deg'], 2)} deg"
    )

    # [9] categorical split ranking against the high-value-order label.
    ig = info_gain(
        orders,
        (F.col("o_totalprice") > 150000).cast("long"),
        ["o_orderpriority", "o_orderstatus"],
    ).collect()
    for r in sorted(ig, key=lambda r: -r["info_gain"]):
        print(
            f"[9] info gain {r['feature']}: {round(r['info_gain'], 6)}"
            f" (H(Y) {round(r['h_label'], 4)})"
        )

    print(f"wrote parquet outputs under {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
