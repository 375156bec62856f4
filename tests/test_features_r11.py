"""Round-11 operator unit tests: feature engineering
(operators/features.py), HITS, inter-arrival gaps, rolling actives,
and lag cross-correlation — each against a hand/NumPy reference on a
small exact input (the registry oracle covers the at-SF hash parity;
these pin the semantics on adversarial shapes)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_target_encode_kfold_leaves_own_fold_out(spark):
    from spark_streaming_kafka_spark.operators.features import (
        target_encode_kfold,
    )

    rows = [(i, "a" if i % 2 else "b", 10 * (i + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, cat string, y long")
    out = {
        (r["category"], r["fold"]): r
        for r in target_encode_kfold(df, "cat", "y", "id", n_folds=3).collect()
    }
    # python twin
    import collections

    sums = collections.defaultdict(int)
    cnts = collections.defaultdict(int)
    tot_s = collections.defaultdict(int)
    tot_n = collections.defaultdict(int)
    for i, cat, y in rows:
        f = _md5_long(f"te_{i}") % 3
        sums[(cat, f)] += y
        cnts[(cat, f)] += 1
        tot_s[cat] += y
        tot_n[cat] += 1
    for (cat, f), n_in in cnts.items():
        r = out[(cat, f)]
        assert r["n_in"] == n_in
        assert r["n_out"] == tot_n[cat] - n_in
        want = (tot_s[cat] - sums[(cat, f)]) / (tot_n[cat] - n_in)
        assert r["enc"] == pytest.approx(want, rel=1e-12)


def test_target_encode_single_fold_category_yields_null(spark):
    from spark_streaming_kafka_spark.operators.features import (
        target_encode_kfold,
    )

    # one row => its fold holds the whole category => enc NULL
    df = spark.createDataFrame([(1, "solo", 5)], "id long, cat string, y long")
    r = target_encode_kfold(df, "cat", "y", "id", n_folds=5).collect()
    assert len(r) == 1 and r[0]["enc"] is None and r[0]["n_out"] == 0


def test_class_weights_balanced_formula(spark):
    from spark_streaming_kafka_spark.operators.features import class_weights

    df = spark.createDataFrame(
        [(i, 0) for i in range(6)] + [(i, 1) for i in range(3)] + [(9, 2)],
        "id long, label int",
    )
    w = {r["label"]: r for r in class_weights(df, "label").collect()}
    n, k = 10, 3
    assert w[0]["weight"] == pytest.approx(n / (k * 6))
    assert w[1]["weight"] == pytest.approx(n / (k * 3))
    assert w[2]["weight"] == pytest.approx(n / (k * 1))


def test_feature_scaler_stats_matches_numpy(spark):
    import numpy as np

    from spark_streaming_kafka_spark.operators.features import (
        feature_scaler_stats,
    )

    rng = np.random.RandomState(3)
    mat = rng.rand(50, 4).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(50)],
        "vec_id long, vec array<float>",
    )
    got = {r["dim"]: r for r in feature_scaler_stats(df, "vec", "vec_id").collect()}
    as_double = mat.astype("float64")
    for d in range(4):
        col = as_double[:, d]
        r = got[d + 1]
        assert r["n_values"] == 50
        assert r["v_min"] == pytest.approx(col.min(), rel=1e-9)
        assert r["v_max"] == pytest.approx(col.max(), rel=1e-9)
        assert r["v_mean"] == pytest.approx(col.mean(), rel=1e-9)
        assert r["v_std"] == pytest.approx(col.std(ddof=1), rel=1e-9)


def test_hits_matches_python_power_iteration(spark):
    from spark_streaming_kafka_spark.operators.graph import hits

    edges = [(1, 10), (1, 11), (2, 10), (3, 11), (3, 12), (4, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r for r in hits(df, iterations=5).collect()}

    srcs = sorted({a for a, _ in edges})
    dsts = sorted({b for _, b in edges})
    h = {u: 1.0 for u in srcs}
    a = {}
    for _ in range(5):
        a = {v: sum(h[u] for u, w in edges if w == v) for v in dsts}
        h = {u: sum(a[v] for w, v in edges if w == u) for u in srcs}
    sh, sa = sum(h.values()), sum(a.values())
    for u in srcs:
        assert got[u]["hub_score"] == pytest.approx(h[u] / sh, rel=1e-12)
        assert got[u]["authority_score"] == 0.0
    for v in dsts:
        assert got[v]["authority_score"] == pytest.approx(a[v] / sa, rel=1e-12)
        assert got[v]["hub_score"] == 0.0
    # node with every edge into the most-hubbed pages wins authority
    assert got[10]["authority_score"] > got[12]["authority_score"]


def test_interarrival_gaps_hand_check(spark):
    from datetime import datetime

    from spark_streaming_kafka_spark.operators.behavior import (
        interarrival_gaps,
    )

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, "u", t(0)),
        (2, "u", t(10)),
        (3, "u", t(40)),   # gaps 10000, 30000 ms
        (4, "v", t(5)),    # single event: no gaps row
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = {r["user_id"]: r for r in interarrival_gaps(df).collect()}
    assert set(out) == {"u"}
    r = out["u"]
    assert r["n_gaps"] == 2
    assert r["mean_gap_ms"] == pytest.approx(20000.0)
    assert r["std_gap_ms"] == pytest.approx(
        math.sqrt(((10000 - 20000) ** 2 + (30000 - 20000) ** 2) / 1), rel=1e-12
    )
    assert (r["min_gap_ms"], r["max_gap_ms"]) == (10000, 30000)


def test_active_users_rolling_window_boundaries(spark):
    from datetime import datetime

    from spark_streaming_kafka_spark.operators.behavior import (
        active_users_rolling,
    )

    d = lambda day: datetime(2024, 1, day, 12, 0, 0)
    rows = [
        (1, "a", d(1)),
        (2, "b", d(1)),
        (3, "a", d(3)),   # a active twice: counted once per window
        (4, "c", d(31)),  # day 1 is 30 days before day 31: outside 28d
        (5, "b", d(28)),  # day 1..28 inclusive = 28 days: inside
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = {
        r["day"]: r["active_users"]
        for r in active_users_rolling(df, window_days=28).collect()
    }
    assert out["2024-01-01"] == 2          # a, b
    assert out["2024-01-03"] == 2          # a, b (day1 still in window)
    assert out["2024-01-28"] == 2          # window [1,28]: a{1,3}, b{1,28}
    assert out["2024-01-31"] == 2          # window [4,31]: b{28}, c{31}; a aged out
    assert set(out) == {"2024-01-01", "2024-01-03", "2024-01-28", "2024-01-31"}


def test_lag_cross_correlation_recovers_known_shift(spark):
    from datetime import datetime, timedelta

    import numpy as np

    from spark_streaming_kafka_spark.operators.timewindows import (
        lag_cross_correlation,
    )

    # y is x delayed by exactly 3 hours -> ccf peaks at lag 3 with r=1
    base = datetime(2024, 1, 1)
    xs = [5, 1, 9, 3, 7, 2, 8, 4, 6, 1, 9, 2, 7, 3, 8, 5]
    rows = []
    eid = 0
    for i, c in enumerate(xs):
        for _ in range(c):
            rows.append((eid, "click", base + timedelta(hours=i))); eid += 1
        for _ in range(c):
            rows.append((eid, "purchase", base + timedelta(hours=i + 3))); eid += 1
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    out = {r["lag_hours"]: r for r in lag_cross_correlation(df, "click", "purchase", max_lag_hours=5).collect()}
    assert out[3]["ccf"] == pytest.approx(1.0, abs=1e-9)
    # numpy twin at lag 0 over the dense spine (hours 0..18)
    spine_hours = 16 + 3
    x = np.zeros(spine_hours); y = np.zeros(spine_hours)
    for i, c in enumerate(xs):
        x[i] = c; y[i + 3] = c
    want0 = np.corrcoef(x, y)[0, 1]
    assert out[0]["ccf"] == pytest.approx(want0, rel=1e-9)
    assert out[0]["n_hours"] == spine_hours
    assert out[3]["n_hours"] == spine_hours - 3
