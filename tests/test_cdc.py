"""Snapshot diff / upsert operators (operators/cdc.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka_spark.operators.cdc import snapshot_diff, upsert


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b double")


def test_snapshot_diff_classifies(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _snap(spark, [(2, "y", 2.0), (3, "z", 99.0), (4, "w", 4.0)])
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged → omitted


def test_snapshot_diff_null_vs_empty(spark):
    """The null-tagged row hash distinguishes NULL from '' and from the
    literal separator-free text."""
    old = _snap(spark, [(1, None, 1.0)])
    new = _snap(spark, [(1, "", 1.0)])
    got = snapshot_diff(old, new, "k").collect()
    assert [(r["k"], r["change"]) for r in got] == [(1, "changed")]


def test_snapshot_diff_subset_cols(spark):
    """compare_cols restricts what counts as a change."""
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "x", 5.0)])
    assert snapshot_diff(old, new, "k", compare_cols=["a"]).count() == 0
    assert snapshot_diff(old, new, "k", compare_cols=["b"]).count() == 1


def test_upsert_whole_row_wins(spark):
    """An update row replaces the base row ENTIRELY — its NULLs are not
    back-filled from base — new keys append, untouched rows pass."""
    base = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0)])
    updates = _snap(spark, [(2, None, 20.0), (3, "new", 3.0)])
    got = {
        r["k"]: (r["a"], r["b"])
        for r in upsert(base, updates, "k").collect()
    }
    assert got == {1: ("x", 1.0), 2: (None, 20.0), 3: ("new", 3.0)}


def test_upsert_broadcasts_small_delta(spark, tables):
    """With a delta-sized update side, the plan broadcasts it — the
    base never shuffles (the repeated-upsert scale contract)."""
    base = tables["orders"].select("o_orderkey", "o_totalprice")
    updates = base.filter(F.col("o_orderkey") % 89 == 0)
    plan = (
        upsert(base, updates, "o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_merge_additive_aggregates_with_retraction(spark):
    from spark_streaming_kafka_spark.operators.cdc import (
        merge_additive_aggregates,
    )

    agg = spark.createDataFrame(
        [(1, 3, 30.0), (2, 1, 5.0)], "k long, n long, s double"
    )
    # delta: +2 rows for key 1, retraction of key 2's row, new key 3
    delta = spark.createDataFrame(
        [(1, 2, 12.0), (2, -1, -5.0), (3, 1, 7.0)], "k long, n long, s double"
    )
    got = {
        r["k"]: (r["n"], r["s"])
        for r in merge_additive_aggregates(
            agg, delta, ["k"], ["n", "s"]
        ).collect()
    }
    assert got == {1: (5, 42.0), 2: (0, 0.0), 3: (1, 7.0)}
