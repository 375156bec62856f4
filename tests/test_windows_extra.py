"""trailing_range_sum and group_mode (operators/windows.py)."""

from __future__ import annotations

from spark_streaming_kafka_spark.operators.windows import (
    group_mode,
    trailing_range_sum,
)


def test_trailing_range_sum_irregular_spacing(spark):
    """RANGE frame sums by VALUE distance, not row count: day 10 sees
    days 4-10 only; same-day peers are always included."""
    rows = [
        ("c1", 1, 10.0),
        ("c1", 2, 20.0),
        ("c1", 8, 40.0),   # 8-6=2 → includes day 2, not day 1
        ("c1", 10, 5.0),
        ("c1", 10, 7.0),   # same-day peer: both rows see both
        ("c2", 1, 99.0),
    ]
    df = spark.createDataFrame(rows, "cust string, day long, amt double")
    out = trailing_range_sum(df, "cust", "day", "amt", trailing=6)
    got = {
        (r["cust"], r["day"], r["amt"]): r["trailing_sum"]
        for r in out.collect()
    }
    assert got[("c1", 1, 10.0)] == 10.0
    assert got[("c1", 2, 20.0)] == 30.0          # days 1-2 (range -4..2)
    assert got[("c1", 8, 40.0)] == 60.0          # days 2,8
    assert got[("c1", 10, 5.0)] == 52.0          # days 8,10,10
    assert got[("c1", 10, 7.0)] == 52.0          # peer rows identical
    assert got[("c2", 1, 99.0)] == 99.0          # groups isolated


def test_group_mode_ties_to_smallest(spark):
    rows = [
        ("u1", "b"), ("u1", "b"), ("u1", "a"),        # clear winner b
        ("u2", "b"), ("u2", "a"),                     # tie → a
        ("u3", "z"),
    ]
    df = spark.createDataFrame(rows, "u string, t string")
    got = {
        r["u"]: (r["mode"], r["mode_count"])
        for r in group_mode(df, "u", "t").collect()
    }
    assert got == {"u1": ("b", 2), "u2": ("a", 1), "u3": ("z", 1)}


def test_group_mode_partition_invariant(spark):
    rows = [("u1", t) for t in ["x", "y", "x", "y"]] * 5
    df = spark.createDataFrame(rows, "u string, t string")
    one = group_mode(df.coalesce(1), "u", "t").collect()
    many = group_mode(df.repartition(7), "u", "t").collect()
    assert one == many == [("u1", "x", 10)]
