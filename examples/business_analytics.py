"""Runnable walkthrough: the r10 analytics/experimentation family
composed end to end over the orders/lineitem/events tables.

    python examples/business_analytics.py [sf_dir] [out_dir]

Steps: monthly revenue with MoM/YoY growth → day-of-week seasonal
baseline and the 2-sigma anomaly days (anomalous relative to their
weekday, not to Monday) → one-step SES forecast per event type
(closed-form, no sequential UDF) → per-customer rolling median order
value → cohort retention triangle (first-order month x months-since)
→ experiment readouts: two-proportion z-test on a deterministic
split plus the CUPED variance reduction the pre-period covariate
buys → the Pareto frontier of users on (activity, max value) via the
two-phase distributed skyline → "bought X, also bought Y" item-item
co-occurrence neighbors. Every step writes parquet to out_dir and
prints a one-screen summary with row accounting.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.abtest import (
    cuped_summary,
    two_proportion_ztest,
)
from spark_streaming_kafka_spark.operators.retrieval import (
    item_cooccurrence_topk,
)
from spark_streaming_kafka_spark.operators.sessionize import cohort_retention
from spark_streaming_kafka_spark.operators.skyline import skyline_2d
from spark_streaming_kafka_spark.operators.windows import (
    period_growth,
    rolling_median,
    seasonal_baseline_residual,
    ses_forecast,
)
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="analytics_"
    )
    spark = get_spark("example-analytics")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    # 1. Monthly revenue + growth.
    growth = period_growth(orders, "o_orderdate", "o_totalprice")
    growth.write.mode("overwrite").parquet(f"{out_dir}/monthly_growth")
    n_months = growth.count()
    worst = growth.orderBy(F.col("growth_1").asc_nulls_last()).first()
    print(f"[1] monthly growth: {n_months} months; worst MoM "
          f"{worst['month']} ({worst['growth_1']}%)")

    # 2. Seasonal baseline + anomaly days.
    resid = seasonal_baseline_residual(orders, "o_orderdate", "o_totalprice")
    from pyspark.sql import Window

    sd = F.round(
        F.stddev_pop("residual").over(Window.partitionBy("dow")), 6
    )
    anomalies = (
        resid.withColumn("sd", sd)
        .filter(F.abs(F.col("residual")) > 2 * F.col("sd"))
    )
    anomalies.write.mode("overwrite").parquet(f"{out_dir}/anomaly_days")
    n_days, n_anom = resid.count(), anomalies.count()
    print(f"[2] seasonal gate: {n_anom}/{n_days} days beyond 2 sigma "
          f"of their weekday baseline")

    # 3. SES forecast per event type.
    fc = ses_forecast(events, ["event_type"], "ts", "value")
    fc.write.mode("overwrite").parquet(f"{out_dir}/ses_forecast")
    for r in fc.orderBy("event_type").collect():
        print(f"[3] ses: {r['event_type']:<10} {r['n_days']:>3}d "
              f"-> {r['forecast']:.2f}")

    # 4. Rolling median order value (robust running level).
    med = rolling_median(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"], "o_totalprice"
    )
    med.write.mode("overwrite").parquet(f"{out_dir}/rolling_median")
    print(f"[4] rolling median rows = orders rows: "
          f"{med.count()} (lossless window)")

    # 5. Cohort retention triangle.
    tri = cohort_retention(
        orders.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
        )
    )
    tri.write.mode("overwrite").parquet(f"{out_dir}/retention")
    cells = tri.count()
    m1 = (
        tri.filter(F.col("month_offset") == 1)
        .agg(F.round(F.avg("retention"), 4).alias("r"))
        .first()["r"]
    )
    print(f"[5] retention triangle: {cells} cells; mean month-1 "
          f"retention {m1}")

    # 6. Experiment readouts on a deterministic split.
    z = two_proportion_ztest(
        events, "user_id",
        (F.col("event_type") == "purchase") & (F.col("value") > 150),
    ).first()
    print(f"[6] z-test: {z['n_0']}v{z['n_1']} units, rates "
          f"{z['rate_0']}/{z['rate_1']}, z={z['z']}")
    per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.sum(F.when(F.year("o_orderdate") < 1997,
                             F.col("o_totalprice")).otherwise(0.0)), 4)
        .alias("pre"),
        F.round(F.sum(F.when(F.year("o_orderdate") >= 1997,
                             F.col("o_totalprice")).otherwise(0.0)), 4)
        .alias("post"),
    )
    c = cuped_summary(per_cust, "pre", "post").first()
    print(f"[6] cuped: theta={c['theta']}, variance reduction "
          f"{c['var_reduction_pct']}%")

    # 7. Pareto frontier of users (activity vs max value).
    users = events.filter(F.col("value").isNotNull()).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("max_value"),
    )
    frontier = skyline_2d(users, "n_events", "max_value")
    frontier.write.mode("overwrite").parquet(f"{out_dir}/frontier")
    print(f"[7] pareto frontier: {frontier.count()} of {users.count()} "
          f"users undominated")

    # 8. Item-item co-occurrence neighbors.
    cf = item_cooccurrence_topk(lineitem, "l_orderkey", "l_partkey", k=3)
    cf.write.mode("overwrite").parquet(f"{out_dir}/cooccurrence")
    print(f"[8] co-occurrence: {cf.count()} (item, neighbor) rows, "
          f"top lift = "
          f"{cf.agg(F.max('lift')).first()[0]}")

    print(f"\nwrote 7 parquet outputs under {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
