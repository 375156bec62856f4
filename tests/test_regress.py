"""Unit tests for the round-11 batch-D closed-form modeling operators:
OLS via Cramer, 2-D PCA, lagged autocorrelation, information gain,
KL/JS categorical divergence, Chao1 richness, and the Nelson-Aalen
cumulative hazard — hand/numpy oracles (DuckDB value oracles live in
queries.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_spark.operators.behavior import nelson_aalen
from spark_streaming_kafka_spark.operators.profiling import (
    chao1_richness,
    kl_js_divergence,
)
from spark_streaming_kafka_spark.operators.regress import (
    acf_lags,
    info_gain,
    ols_two_regressors,
    pca_2d,
)


# --- OLS ---------------------------------------------------------------

def test_ols_matches_numpy_lstsq(spark):
    rows = [
        (5, 1, 10), (9, 2, 20), (12, 3, 10), (18, 4, 30),
        (20, 5, 20), (27, 6, 40), (29, 7, 10), (33, 8, 50),
    ]
    df = spark.createDataFrame(rows, "y long, x1 long, x2 long")
    r = ols_two_regressors(
        df, F.col("y"), F.col("x1"), F.col("x2")
    ).collect()[0]
    y = np.array([t[0] for t in rows], dtype=float)
    X = np.column_stack(
        [np.ones(len(rows)), [t[1] for t in rows], [t[2] for t in rows]]
    )
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    sse = float(((y - pred) ** 2).sum())
    sst = float(((y - y.mean()) ** 2).sum())
    assert r.n_rows == len(rows)
    assert r.b_intercept == pytest.approx(beta[0], abs=1e-5)
    assert r.b_x1 == pytest.approx(beta[1], abs=1e-5)
    assert r.b_x2 == pytest.approx(beta[2], abs=1e-5)
    assert r.r2 == pytest.approx(1 - sse / sst, abs=1e-5)


def test_ols_collinear_design_is_null(spark):
    # x2 = 2*x1 exactly -> singular normal equations -> NULL fit.
    rows = [(i + 1, i, 2 * i) for i in range(6)]
    df = spark.createDataFrame(rows, "y long, x1 long, x2 long")
    r = ols_two_regressors(
        df, F.col("y"), F.col("x1"), F.col("x2")
    ).collect()[0]
    assert r.b_intercept is None and r.r2 is None


def test_ols_null_rows_dropped(spark):
    rows = [(5, 1, 10), (None, 2, 20), (9, None, 30), (12, 3, None),
            (18, 4, 30), (20, 5, 20)]
    df = spark.createDataFrame(rows, "y long, x1 long, x2 long")
    r = ols_two_regressors(
        df, F.col("y"), F.col("x1"), F.col("x2")
    ).collect()[0]
    assert r.n_rows == 3


# --- PCA ---------------------------------------------------------------

def test_pca_matches_numpy_eig(spark):
    rows = [(1, 2), (2, 1), (3, 4), (4, 3), (5, 7), (6, 5), (7, 9)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = pca_2d(df, F.col("x"), F.col("y")).collect()[0]
    m = np.array(rows, dtype=float)
    cov = np.cov(m.T)
    lams = sorted(np.linalg.eigvalsh(cov), reverse=True)
    assert r.var_x == pytest.approx(cov[0, 0], abs=1e-5)
    assert r.var_y == pytest.approx(cov[1, 1], abs=1e-5)
    assert r.cov_xy == pytest.approx(cov[0, 1], abs=1e-5)
    assert r.lambda1 == pytest.approx(lams[0], abs=1e-5)
    assert r.lambda2 == pytest.approx(lams[1], abs=1e-5)
    assert r.explained_ratio == pytest.approx(
        lams[0] / (lams[0] + lams[1]), abs=1e-5
    )
    ang = math.degrees(
        math.atan2(2 * cov[0, 1], cov[0, 0] - cov[1, 1]) / 2
    )
    assert r.angle_deg == pytest.approx(ang, abs=1e-5)


def test_pca_single_row_is_null(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    r = pca_2d(df, F.col("x"), F.col("y")).collect()[0]
    assert r.n_rows == 1 and r.lambda1 is None


# --- ACF ---------------------------------------------------------------

def test_acf_matches_hand_formula(spark):
    ys = [3.0, 5.0, 4.0, 6.0, 5.0, 7.0, 6.0, 8.0]
    rows = [(i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "x long, v double")
    got = {
        r.lag: r for r in acf_lags(df, "x", "v", max_lag=3).collect()
    }
    mean = sum(ys) / len(ys)
    den = sum((y - mean) ** 2 for y in ys)
    for k in (1, 2, 3):
        num = sum(
            (ys[t] - mean) * (ys[t + k] - mean)
            for t in range(len(ys) - k)
        )
        assert got[k].n_pairs == len(ys) - k
        assert got[k].acf == pytest.approx(num / den, abs=1e-6)

def test_acf_alternating_series_signs(spark):
    ys = [3.0, 7.0, 3.0, 7.0, 3.0, 7.0, 3.0, 7.0]
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "x long, v double"
    )
    got = {
        r.lag: r for r in acf_lags(df, "x", "v", max_lag=2).collect()
    }
    # pure alternation: strong negative lag-1, positive lag-2
    assert got[1].acf < 0 < got[2].acf


def test_acf_gap_in_series_shrinks_pairs(spark):
    rows = [(0, 1.0), (1, 2.0), (3, 4.0), (4, 1.0)]  # day 2 missing
    df = spark.createDataFrame(rows, "x long, v double")
    got = {
        r.lag: r for r in acf_lags(df, "x", "v", max_lag=1).collect()
    }
    assert got[1].n_pairs == 2  # (0,1) and (3,4) only


def test_acf_constant_series_is_null(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(6)], "x long, v double"
    )
    r = acf_lags(df, "x", "v", max_lag=1).collect()[0]
    assert r.acf is None


# --- Information gain --------------------------------------------------

def test_info_gain_perfect_and_useless_split(spark):
    # f_good separates the label perfectly; f_bad is constant.
    rows = [("a", "z", 1), ("a", "z", 1), ("b", "z", 0), ("b", "z", 0)]
    df = spark.createDataFrame(rows, "f_good string, f_bad string, y long")
    got = {
        r.feature: r
        for r in info_gain(
            df, F.col("y"), ["f_good", "f_bad"]
        ).collect()
    }
    h = -2 * 0.5 * math.log(0.5)  # H(Y) at the 50/50 margin
    assert got["f_good"].h_label == pytest.approx(h, abs=1e-6)
    assert got["f_good"].h_cond == pytest.approx(0.0, abs=1e-6)
    assert got["f_good"].info_gain == pytest.approx(h, abs=1e-6)
    assert got["f_bad"].info_gain == pytest.approx(0.0, abs=1e-6)


def test_info_gain_hand_computation(spark):
    rows = [("a", 1)] * 3 + [("a", 0)] * 1 + [("b", 1)] * 1 + [("b", 0)] * 3
    df = spark.createDataFrame(rows, "f string, y long")
    r = info_gain(df, F.col("y"), ["f"]).collect()[0]

    def H(*ps):
        return -sum(p * math.log(p) for p in ps if p > 0)

    h_label = H(0.5, 0.5)
    h_cond = 0.5 * H(0.75, 0.25) + 0.5 * H(0.25, 0.75)
    assert r.n_rows == 8
    assert r.info_gain == pytest.approx(h_label - h_cond, abs=1e-6)


# --- KL / JS divergence ------------------------------------------------

def test_kl_js_matches_hand_smoothed(spark):
    rows = [("x", 0)] * 4 + [("y", 0)] * 2 + [("x", 1)] * 1 + [
        ("y", 1)
    ] * 5
    df = spark.createDataFrame(rows, "c string, s int")
    r = kl_js_divergence(df, "c", F.col("s")).collect()[0]
    k, n0, n1 = 2, 6, 6
    p = [(4 + 0.5) / (n0 + 0.5 * k), (2 + 0.5) / (n0 + 0.5 * k)]
    q = [(1 + 0.5) / (n1 + 0.5 * k), (5 + 0.5) / (n1 + 0.5 * k)]
    kl01 = sum(pi * math.log(pi / qi) for pi, qi in zip(p, q))
    kl10 = sum(qi * math.log(qi / pi) for pi, qi in zip(p, q))
    js = sum(
        0.5 * pi * math.log(pi / ((pi + qi) / 2))
        + 0.5 * qi * math.log(qi / ((pi + qi) / 2))
        for pi, qi in zip(p, q)
    )
    assert (r.n_categories, r.n_0, r.n_1) == (k, n0, n1)
    assert r.kl_01 == pytest.approx(kl01, abs=1e-6)
    assert r.kl_10 == pytest.approx(kl10, abs=1e-6)
    assert r.js_div == pytest.approx(js, abs=1e-6)
    assert 0 <= r.js_div <= math.log(2) + 1e-9


def test_kl_js_identical_distributions_zero(spark):
    rows = [("x", 0), ("x", 1), ("y", 0), ("y", 1)]
    df = spark.createDataFrame(rows, "c string, s int")
    r = kl_js_divergence(df, "c", F.col("s")).collect()[0]
    assert r.kl_01 == pytest.approx(0.0, abs=1e-9)
    assert r.js_div == pytest.approx(0.0, abs=1e-9)


# --- Chao1 -------------------------------------------------------------

def test_chao1_hand_computation(spark):
    # counts: 3 singletons, 2 doubletons, 1 five -> S=6, N=12.
    rows = [("a", 1), ("b", 1), ("c", 1), ("d", 2), ("e", 2), ("f", 5)]
    df = spark.createDataFrame(rows, "term string, cnt long")
    r = chao1_richness(df, "term", "cnt").collect()[0]
    assert (r.s_observed, r.n_tokens, r.f1, r.f2) == (6, 12, 3, 2)
    assert r.chao1 == pytest.approx(6 + 3 * 2 / (2 * 3), abs=1e-6)
    assert r.gt_coverage == pytest.approx(1 - 3 / 12, abs=1e-6)


def test_chao1_no_doubletons_stays_finite(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 4)], "term string, cnt long"
    )
    r = chao1_richness(df, "term", "cnt").collect()[0]
    assert (r.f1, r.f2) == (2, 0)
    assert r.chao1 == pytest.approx(3 + 2 * 1 / 2, abs=1e-6)


# --- Nelson-Aalen ------------------------------------------------------

def test_nelson_aalen_hand_computation(spark):
    # durations: events at t=1 (2 of 6), t=3 (1 of 3); censored at
    # t=2 (1) and t=3 (2, leaving risk set with the t=3 event).
    rows = [(1, 1), (1, 1), (2, 0), (3, 1), (3, 0), (3, 0)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    out = {r.duration: r for r in nelson_aalen(df, "dur", "ev").collect()}
    assert set(out) == {1, 3}  # censored-only times carry no row
    assert out[1].n_risk == 6 and out[1].n_events == 2
    assert out[3].n_risk == 3 and out[3].n_events == 1
    h1 = 2 / 6
    h3 = h1 + 1 / 3
    assert out[1].cum_hazard == pytest.approx(h1, abs=1e-6)
    assert out[3].cum_hazard == pytest.approx(h3, abs=1e-6)
    assert out[3].var_hazard == pytest.approx(
        2 / 36 + 1 / 9, abs=1e-6
    )
    assert out[3].fh_survival == pytest.approx(math.exp(-h3), abs=1e-6)


def test_nelson_aalen_tracks_km_closely(spark):
    """Fleming-Harrington exp(-H) ~ KM survival when event fractions
    per time are small — the textbook asymptotic-twin relation."""
    from spark_streaming_kafka_spark.operators.behavior import kaplan_meier

    rows = [(t, 1 if i % 7 == 0 else 0) for t in range(1, 20)
            for i in range(10)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    na = {r.duration: r.fh_survival
          for r in nelson_aalen(df, "dur", "ev").collect()}
    km = {r.duration: r.survival
          for r in kaplan_meier(df, "dur", "ev").collect()}
    assert set(na) == set(km)
    for t in na:
        assert na[t] == pytest.approx(km[t], rel=0.05)
        assert na[t] >= km[t] - 1e-9  # FH always sits at/above KM
