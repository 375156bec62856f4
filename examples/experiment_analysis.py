"""Runnable walkthrough: the statistical-inference stack over events
and orders — the round-11 batch composed the way an experimentation
team reads out a launch.

    python examples/experiment_analysis.py [sf_dir] [out_dir]

Steps: deterministic unit split → conversion z-test → outcome tests on
the same split (Welch's t, Mann-Whitney U, two-sample KS) → bootstrap
CI on mean revenue → diff-in-diff against a holdout segment →
Kaplan-Meier time-to-first-purchase (right-censored at day 7) →
monthly-revenue trend (Mann-Kendall test + Theil-Sen slope) →
association diagnostics (Spearman midrank correlation, chi-square
independence of event mix vs weekday).

Every step writes parquet to out_dir and prints a one-screen summary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.abtest import (
    chi_square_independence,
    diff_in_diff,
    ks_two_sample,
    mann_whitney_u,
    poisson_bootstrap_ci,
    two_proportion_ztest,
    welch_ttest,
)
from spark_streaming_kafka_spark.operators.behavior import kaplan_meier
from spark_streaming_kafka_spark.operators.profiling import (
    mann_kendall_trend,
    spearman_corr,
    theil_sen_slope,
)
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="experiment_"
    )
    spark = get_spark("example-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    # 1. conversion readout on the deterministic unit split
    z = two_proportion_ztest(
        events, "user_id", F.col("event_type") == "purchase"
    )
    z.write.mode("overwrite").parquet(os.path.join(out_dir, "ztest"))
    r = z.first()
    print(
        f"conversion: {r['rate_0']} vs {r['rate_1']} "
        f"(n={r['n_0']}/{r['n_1']}) z={r['z']}"
    )

    # 2. outcome tests on the same split: parametric, rank, and shape
    variant = (F.col("user_id") % 2).cast("int")
    w = welch_ttest(events, "value", variant).first()
    print(
        f"welch: mean {w['mean_0']} vs {w['mean_1']} "
        f"t={w['t_stat']} dof={w['dof']}"
    )
    u = mann_whitney_u(events, "value", variant).first()
    print(f"mann-whitney: U1={u['u_1']} z={u['z']}")
    ks = ks_two_sample(events, "value", variant).first()
    print(f"ks: D={ks['ks_d']} scaled={ks['ks_stat']}")

    # 3. how precise is the mean itself? distributed Poisson bootstrap
    cents = orders.select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ci = poisson_bootstrap_ci(cents, "cents", "o_custkey").first()
    print(
        f"bootstrap: mean {ci['mean_value']:.1f} cents, 95% CI "
        f"[{ci['ci_low']:.1f}, {ci['ci_high']:.1f}] "
        f"({ci['n_replicates']} replicates over {ci['n_units']} units)"
    )

    # 4. non-randomized rollout readout: DiD vs the holdout segment
    j = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        F.col("c_custkey") == F.col("o_custkey"),
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "c_mktsegment",
        "o_orderdate",
    )
    did = diff_in_diff(
        j,
        "cents",
        F.col("c_mktsegment") == "BUILDING",
        F.col("o_orderdate") >= F.lit("1998-07-01").cast("timestamp"),
    )
    did.write.mode("overwrite").parquet(os.path.join(out_dir, "did"))
    d = did.first()
    print(
        f"diff-in-diff: treat {d['mean_treat_pre']}->{d['mean_treat_post']}"
        f" ctrl {d['mean_ctrl_pre']}->{d['mean_ctrl_post']}"
        f" => did={d['did']} cents"
    )

    # 5. time-to-first-purchase survival, censored at day 7
    per_user = events.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("d0"),
        F.to_date(
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("dp"),
    )
    ttp = F.datediff("dp", "d0")
    observed = F.col("dp").isNotNull() & (ttp <= 7)
    subjects = per_user.select(
        F.when(observed, ttp).otherwise(F.lit(7)).alias("dur"),
        observed.cast("int").alias("ev"),
    )
    km = kaplan_meier(subjects, "dur", "ev")
    km.write.mode("overwrite").parquet(os.path.join(out_dir, "km"))
    rows = km.collect()
    tail = rows[-1] if rows else None
    print(
        f"kaplan-meier: {len(rows)} event times; S({tail['duration']}d) = "
        f"{tail['survival']} (risk {tail['n_risk']})"
        if tail
        else "kaplan-meier: no event rows"
    )

    # 6. is monthly revenue trending? test + robust slope
    series = orders.groupBy(
        "o_orderpriority",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("x"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("y")
    )
    mk = mann_kendall_trend(series, "o_orderpriority", "x", "y")
    ts = theil_sen_slope(series, "o_orderpriority", "x", "y")
    trend = mk.join(ts, "o_orderpriority").orderBy("o_orderpriority")
    trend.write.mode("overwrite").parquet(os.path.join(out_dir, "trend"))
    for t in trend.collect():
        print(
            f"trend {t['o_orderpriority']}: S={t['s_stat']} z={t['z']} "
            f"sen_slope={t['sen_slope']} cents/month "
            f"({t['n_points']} months)"
        )

    # 7. association diagnostics
    lineitem = load_table(spark, sf_dir, "lineitem")
    rho = spearman_corr(lineitem, "l_quantity", "l_discount").first()
    print(f"spearman(qty, discount) = {rho['rho']} over {rho['n_rows']} rows")
    chi = chi_square_independence(
        events, "event_type", F.dayofweek("ts"),
        col_domain=range(1, 8), col_name="dow",
    )
    chi.write.mode("overwrite").parquet(os.path.join(out_dir, "chisq"))
    c = chi.first()
    print(
        f"chi-square(event_type x weekday): stat={c['chi2_total']} "
        f"dof={c['dof']} over {chi.count()} cells"
    )

    print(f"artifacts in {out_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
