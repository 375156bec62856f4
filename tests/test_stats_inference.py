"""Unit tests for the round-11 statistical-inference batch: Welch's
t, the KS two-sample distance (and its global_cumsum prefix-sum
primitive), chi-square independence, diff-in-diff, Mann-Kendall,
Theil-Sen, Spearman midrank correlation, the Zipf fit, and the
Kaplan-Meier product-limit curve — hand-computed oracles (DuckDB value
oracles live in queries.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_spark.operators.abtest import (
    chi_square_independence,
    diff_in_diff,
    ks_two_sample,
    welch_ttest,
)
from spark_streaming_kafka_spark.operators.behavior import kaplan_meier
from spark_streaming_kafka_spark.operators.percentile import global_cumsum
from spark_streaming_kafka_spark.operators.profiling import (
    mann_kendall_trend,
    spearman_corr,
    theil_sen_slope,
    zipf_fit,
)


# --- Welch's t ----------------------------------------------------------

def test_welch_matches_hand_computation(spark):
    g0, g1 = [1.0, 2.0, 3.0, 4.0], [2.0, 4.0, 6.0, 8.0, 10.0]
    rows = [(v, 0) for v in g0] + [(v, 1) for v in g1]
    df = spark.createDataFrame(rows, "v double, g int")
    r = welch_ttest(df, "v", F.col("g")).collect()[0]
    n0, n1 = len(g0), len(g1)
    m0, m1 = sum(g0) / n0, sum(g1) / n1
    v0 = sum((x - m0) ** 2 for x in g0) / (n0 - 1)
    v1 = sum((x - m1) ** 2 for x in g1) / (n1 - 1)
    se2 = v0 / n0 + v1 / n1
    t = (m0 - m1) / math.sqrt(se2)
    dof = se2 * se2 / (
        (v0 / n0) ** 2 / (n0 - 1) + (v1 / n1) ** 2 / (n1 - 1)
    )
    assert (r.n_0, r.n_1) == (n0, n1)
    assert r.mean_0 == pytest.approx(m0, abs=1e-6)
    assert r.mean_1 == pytest.approx(m1, abs=1e-6)
    assert r.t_stat == pytest.approx(t, abs=1e-6)
    assert r.dof == pytest.approx(dof, abs=1e-6)


def test_welch_nulls_dropped_and_tiny_arm_null_stat(spark):
    df = spark.createDataFrame(
        [(1.0, 0), (None, 0), (2.0, 1)], "v double, g int"
    )
    r = welch_ttest(df, "v", F.col("g")).collect()[0]
    assert (r.n_0, r.n_1) == (1, 1)  # NULL carries no weight
    assert r.t_stat is None and r.dof is None  # var undefined at n=1


# --- KS two-sample (and global_cumsum) ----------------------------------

def test_global_cumsum_matches_serial_prefix_and_totals(spark):
    rows = [(i, i % 3 + 1, (i * 7) % 5) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, a long, b long")
    out, totals = global_cumsum(
        df, [F.col("k").asc()], ["a", "b"], num_parts=7
    )
    got = {r.k: (r.cum_a, r.cum_b) for r in out.collect()}
    ca = cb = 0
    for k, a, b in rows:  # k is already ascending and unique
        ca, cb = ca + a, cb + b
        assert got[k] == (ca, cb)
    assert totals == {"a": ca, "b": cb}


def test_ks_hand_example(spark):
    # g0 = {1,2,3}, g1 = {2,3,4}: D = 1/3 at v=1 (and ties elsewhere)
    rows = [(1.0, 0), (2.0, 0), (3.0, 0), (2.0, 1), (3.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "v double, g int")
    r = ks_two_sample(df, "v", F.col("g")).collect()[0]
    assert (r.n_0, r.n_1) == (3, 3)
    assert r.ks_d == pytest.approx(1 / 3, abs=1e-6)
    assert r.ks_stat == pytest.approx(
        (1 / 3) * math.sqrt(9 / 6), abs=1e-6
    )


def test_ks_empty_arm_yields_null_not_div0(spark):
    df = spark.createDataFrame([(1.0, 0), (2.0, 0)], "v double, g int")
    r = ks_two_sample(df, "v", F.col("g")).collect()[0]
    assert (r.n_0, r.n_1) == (2, 0)
    assert r.ks_d is None and r.ks_stat is None


def test_ks_identical_samples_zero(spark):
    rows = [(float(v), g) for g in (0, 1) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "v double, g int")
    r = ks_two_sample(df, "v", F.col("g")).collect()[0]
    assert r.ks_d == 0.0


# --- chi-square independence --------------------------------------------

def test_chi_square_2x2_hand_example(spark):
    # classic 2x2: rows A/B, cols 1/2, obs [[10, 20], [20, 10]]
    rows = (
        [("A", 1)] * 10 + [("A", 2)] * 20 + [("B", 1)] * 20 + [("B", 2)] * 10
    )
    df = spark.createDataFrame(rows, "r string, c int")
    out = chi_square_independence(df, "r", F.col("c"), col_domain=[1, 2])
    got = {(r.r, r.col_key): r for r in out.collect()}
    # every expected count is 15; each term is 25/15
    for cell in got.values():
        assert cell.expected == pytest.approx(15.0, abs=1e-6)
        assert cell.chi2_term == pytest.approx(25 / 15, abs=1e-6)
        assert cell.chi2_total == pytest.approx(4 * 25 / 15, abs=1e-6)
        assert cell.dof == 1
    assert got[("A", 1)].n_obs == 10 and got[("B", 1)].n_obs == 20


def test_chi_square_densifies_zero_cells(spark):
    # row B never sees col 2; the dense cell must exist with n_obs=0
    rows = [("A", 1), ("A", 2), ("B", 1)]
    df = spark.createDataFrame(rows, "r string, c int")
    out = chi_square_independence(df, "r", F.col("c"), col_domain=[1, 2])
    got = {(r.r, r.col_key): r for r in out.collect()}
    assert ("B", 2) in got and got[("B", 2)].n_obs == 0
    # expected for the zero cell: rt*ct/n = 1*1/3
    assert got[("B", 2)].expected == pytest.approx(1 / 3, abs=1e-6)


# --- diff-in-diff --------------------------------------------------------

def test_did_hand_example(spark):
    # treat: pre mean 10, post mean 25; ctrl: pre 10, post 15 → DiD 10
    rows = (
        [(10, 1, 0), (10, 1, 0), (25, 1, 1), (25, 1, 1)]
        + [(10, 0, 0), (10, 0, 0), (15, 0, 1), (15, 0, 1)]
    )
    df = spark.createDataFrame(rows, "v long, t int, p int")
    r = diff_in_diff(
        df, "v", F.col("t") == 1, F.col("p") == 1
    ).collect()[0]
    assert r.did == pytest.approx(10.0, abs=1e-6)
    assert r.mean_treat_post == 25.0 and r.mean_ctrl_pre == 10.0
    assert (
        r.n_treat_pre, r.n_treat_post, r.n_ctrl_pre, r.n_ctrl_post
    ) == (2, 2, 2, 2)


def test_did_empty_cell_yields_null(spark):
    df = spark.createDataFrame(
        [(10, 1, 1), (10, 0, 0)], "v long, t int, p int"
    )
    r = diff_in_diff(
        df, "v", F.col("t") == 1, F.col("p") == 1
    ).collect()[0]
    assert r.did is None  # treat_pre and ctrl_post are empty


# --- Mann-Kendall / Theil-Sen --------------------------------------------

def test_mann_kendall_monotone_series(spark):
    rows = [("k", x, x * 10) for x in range(1, 6)]  # strictly rising
    df = spark.createDataFrame(rows, "k string, x long, y long")
    r = mann_kendall_trend(df, "k", "x", "y").collect()[0]
    n = 5
    var = n * (n - 1) * (2 * n + 5) / 18  # no ties
    assert r.s_stat == 10  # all C(5,2) pairs concordant
    assert r.var_s == pytest.approx(var, abs=1e-6)
    assert r.z == pytest.approx((10 - 1) / math.sqrt(var), abs=1e-6)


def test_mann_kendall_tie_correction_and_flat_series(spark):
    rows = [("k", x, 7) for x in range(1, 5)]  # constant: all ties
    df = spark.createDataFrame(rows, "k string, x long, y long")
    r = mann_kendall_trend(df, "k", "x", "y").collect()[0]
    assert r.s_stat == 0
    # tie term equals the no-tie variance → var 0 → z NULL
    assert r.var_s == 0.0 and r.z is None


def test_theil_sen_hand_median(spark):
    pts = [(1, 1), (2, 2), (3, 4), (4, 3)]
    df = spark.createDataFrame(
        [("k", x, y) for x, y in pts], "k string, x long, y long"
    )
    r = theil_sen_slope(df, "k", "x", "y").collect()[0]
    slopes = sorted(
        (yb - ya) / (xb - xa)
        for i, (xa, ya) in enumerate(pts)
        for xb, yb in pts[i + 1:]
    )
    med = (slopes[2] + slopes[3]) / 2
    assert r.n_pairs == 6
    assert r.sen_slope == pytest.approx(med, abs=1e-6)


# --- Spearman -------------------------------------------------------------

def test_spearman_perfect_monotone_is_one(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 8)], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.rho == pytest.approx(1.0, abs=1e-6)


def test_spearman_midranks_with_ties(spark):
    # x=[1,1,2] → ranks [1.5,1.5,3]; y=[2,3,3] → ranks [1,2.5,2.5]
    df = spark.createDataFrame(
        [(1.0, 2.0), (1.0, 3.0), (2.0, 3.0)], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.n_rows == 3
    assert r.rho == pytest.approx(0.5, abs=1e-6)


# --- Zipf fit -------------------------------------------------------------

def test_zipf_exact_power_law_slope_minus_one(spark):
    # counts K/rank exactly → ln(count) = ln K − ln(rank): slope −1
    df = spark.createDataFrame(
        [("w1", 24), ("w2", 12), ("w3", 8), ("w4", 6)],
        "word string, cnt long",
    )
    r = zipf_fit(df, "word", "cnt", n_top=10).collect()[0]
    assert r.n_terms == 4
    assert r.zipf_slope == pytest.approx(-1.0, abs=1e-6)
    assert r.zipf_intercept == pytest.approx(math.log(24), abs=1e-6)


def test_zipf_n_top_caps_and_tiebreaks(spark):
    # equal counts break ties by term ASC; only top-2 kept
    df = spark.createDataFrame(
        [("b", 5), ("a", 5), ("c", 1)], "word string, cnt long"
    )
    r = zipf_fit(df, "word", "cnt", n_top=2).collect()[0]
    assert r.n_terms == 2
    assert r.zipf_slope == pytest.approx(0.0, abs=1e-6)  # both ln(5)


# --- Kaplan-Meier ----------------------------------------------------------

def test_kaplan_meier_classic_example(spark):
    subjects = [(1, 1), (2, 1), (2, 0), (3, 1), (3, 1), (4, 0)]
    df = spark.createDataFrame(subjects, "dur long, ev int")
    got = {r.duration: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert set(got) == {1, 2, 3}  # t=4 is censor-only, filtered
    assert got[1].n_risk == 6 and got[1].n_events == 1
    assert got[1].survival == pytest.approx(5 / 6, abs=1e-6)
    assert got[2].n_risk == 5 and got[2].n_censored == 1
    assert got[2].survival == pytest.approx(5 / 6 * 4 / 5, abs=1e-6)
    assert got[3].n_risk == 3 and got[3].n_events == 2
    assert got[3].survival == pytest.approx(2 / 3 * 1 / 3, abs=1e-6)


def test_kaplan_meier_absorbing_zero(spark):
    # everyone left dies at t=2: survival exactly 0 there (no ln(0))
    subjects = [(1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(subjects, "dur long, ev int")
    got = {r.duration: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert got[1].survival == pytest.approx(2 / 3, abs=1e-6)
    assert got[2].survival == 0.0


# --- batch C: k-group tests, effect sizes, resampling ---------------------

def test_anova_hand_example(spark):
    from spark_streaming_kafka_spark.operators.abtest import anova_oneway_f

    groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 3.0, 4.0], "c": [6.0, 7.0, 8.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway_f(df, "v", "g").collect()[0]
    means = {g: sum(vs) / len(vs) for g, vs in groups.items()}
    grand = sum(sum(vs) for vs in groups.values()) / 9
    ssb = sum(len(vs) * (means[g] - grand) ** 2 for g, vs in groups.items())
    ssw = sum(
        (v - means[g]) ** 2 for g, vs in groups.items() for v in vs
    )
    f = (ssb / 2) / (ssw / 6)
    assert (r.k_groups, r.n_rows) == (3, 9)
    assert (r.df_between, r.df_within) == (2, 6)
    assert r.f_stat == pytest.approx(f, abs=1e-6)


def test_anova_single_group_null(spark):
    from spark_streaming_kafka_spark.operators.abtest import anova_oneway_f

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, v double"
    )
    r = anova_oneway_f(df, "v", "g").collect()[0]
    assert r.f_stat is None and r.df_between == 0


def test_kruskal_wallis_matches_hand_h(spark):
    from spark_streaming_kafka_spark.operators.abtest import kruskal_wallis

    # no ties: values 1..6 split (1,2,3) vs (4,5,6): R1=6, R2=15
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    n = 6
    h = 12 / (n * (n + 1)) * (6 ** 2 / 3 + 15 ** 2 / 3) - 3 * (n + 1)
    assert (r.k_groups, r.n_rows) == (2, 6)
    assert r.h_stat == pytest.approx(h, abs=1e-6)
    assert r.h_corrected == pytest.approx(h, abs=1e-6)  # no ties


def test_kruskal_wallis_tie_correction(spark):
    from spark_streaming_kafka_spark.operators.abtest import kruskal_wallis

    # all values tied -> correction factor 0 -> h_corrected NULL
    rows = [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r.h_stat == pytest.approx(0.0, abs=1e-6)
    assert r.h_corrected is None


def test_brown_forsythe_flat_when_spreads_match(spark):
    from spark_streaming_kafka_spark.operators.abtest import brown_forsythe

    # identical spreads around different medians -> F == 0
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 11.0), ("b", 12.0), ("b", 13.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = brown_forsythe(df, "v", "g").collect()[0]
    assert r.f_stat == pytest.approx(0.0, abs=1e-6)


def test_cramers_v_perfect_association_is_one(spark):
    from spark_streaming_kafka_spark.operators.abtest import cramers_v

    # 2x2 diagonal: row fully determines column -> V = 1
    rows = [("A", 1)] * 5 + [("B", 2)] * 5
    df = spark.createDataFrame(rows, "r string, c int")
    r = cramers_v(df, "r", F.col("c"), col_domain=[1, 2]).collect()[0]
    assert r.v == pytest.approx(1.0, abs=1e-6)
    assert r.n_rows == 10 and r.dof == 1


def test_odds_ratio_hand_2x2(spark):
    from spark_streaming_kafka_spark.operators.abtest import odds_ratio

    # variant 1: 3 of 4 convert; variant 0: 1 of 4 -> OR = (3*3)/(1*1)=9
    rows = []
    for unit, conv in [(1, 1), (3, 1), (5, 1), (7, 0),
                       (2, 1), (4, 0), (6, 0), (8, 0)]:
        rows.append((unit, conv))
    df = spark.createDataFrame(rows, "unit long, ok int")
    r = odds_ratio(df, "unit", F.col("ok") == 1).collect()[0]
    assert (r.conv_1, r.nonconv_1, r.conv_0, r.nonconv_0) == (3, 1, 1, 3)
    assert r.or_ratio == pytest.approx(9.0, abs=1e-6)
    assert r.log_or == pytest.approx(math.log(9.0), abs=1e-6)
    assert r.se == pytest.approx(
        math.sqrt(1 / 3 + 1 / 1 + 1 / 1 + 1 / 3), abs=1e-6
    )


def test_permutation_test_null_data_large_p(spark):
    from spark_streaming_kafka_spark.operators.abtest import (
        permutation_test_mean,
    )

    # identical values in both arms: obs_diff 0, every replicate ties
    # or exceeds -> p = 1
    rows = [(u, 100) for u in range(1, 21)]
    df = spark.createDataFrame(rows, "unit long, v long")
    r = permutation_test_mean(
        df, "v", "unit", n_replicates=20
    ).collect()[0]
    assert r.obs_diff == pytest.approx(0.0, abs=1e-9)
    assert r.n_units == 20 and r.n_replicates == 20
    assert r.p_value == pytest.approx(1.0, abs=1e-6)


def test_permutation_test_planted_effect_small_p(spark):
    from spark_streaming_kafka_spark.operators.abtest import (
        permutation_test_mean,
    )

    # arm 1 (odd units) gets value 1000, arm 0 gets 0: the observed
    # split is the most extreme possible; random reassignments rarely
    # reproduce it
    rows = [(u, 1000 if u % 2 else 0) for u in range(1, 41)]
    df = spark.createDataFrame(rows, "unit long, v long")
    r = permutation_test_mean(
        df, "v", "unit", n_replicates=50
    ).collect()[0]
    assert r.obs_diff == pytest.approx(1000.0, abs=1e-9)
    assert r.p_value < 0.1


def test_qte_matches_per_arm_percentiles(spark):
    from spark_streaming_kafka_spark.operators.abtest import (
        quantile_treatment_effect,
    )

    a = [float(v) for v in range(1, 101)]           # arm 0: 1..100
    b = [float(v) + 10 for v in range(1, 101)]      # arm 1: shifted +10
    rows = [(v, 0) for v in a] + [(v, 1) for v in b]
    df = spark.createDataFrame(rows, "v double, g int")
    got = {r.prob: r for r in quantile_treatment_effect(
        df, "v", F.col("g"), probs=(0.25, 0.5, 0.75)
    ).collect()}
    assert set(got) == {0.25, 0.5, 0.75}
    for p, row in got.items():
        assert row.qte == pytest.approx(10.0, abs=1e-6)
    assert got[0.5].q_0 == pytest.approx(50.5, abs=1e-6)
