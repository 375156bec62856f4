"""PSI drift monitor (operators/drift.py) — known-value and edge cases.

(Value parity vs DuckDB for the registered query is the oracle gate's
job; here we pin the math and the degenerate inputs.)
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_streaming_kafka_spark.operators.drift import psi_report


def _docs(spark, cats):
    return spark.createDataFrame([(c,) for c in cats], "cat string")


def test_psi_known_value(spark):
    # ref 3:1, cur 1:3 → PSI = 2 · 0.5·ln(3) = ln(3)
    ref = _docs(spark, ["a", "a", "a", "b"])
    cur = _docs(spark, ["a", "b", "b", "b"])
    row = psi_report(ref, cur, [("cat", F.col("cat"))]).first()
    assert row["ref_rows"] == 4 and row["cur_rows"] == 4
    assert row["n_bins"] == 2
    assert abs(row["psi"] - round(math.log(3.0), 6)) < 1e-9


def test_psi_identical_snapshots_zero(spark):
    ref = _docs(spark, ["a", "a", "b", "c"])
    row = psi_report(ref, ref, [("cat", F.col("cat"))]).first()
    assert row["psi"] == 0.0


def test_psi_novel_and_vanished_bins_finite(spark):
    """A bin present on only one side hits the eps floor — finite,
    large, and sided symmetrically."""
    ref = _docs(spark, ["a", "a"])
    cur = _docs(spark, ["b", "b"])
    row = psi_report(ref, cur, [("cat", F.col("cat"))]).first()
    assert row["n_bins"] == 2
    # each side: (1 - eps)·ln(1/eps) ≈ 13.815; two bins ≈ 27.63
    assert 27.0 < row["psi"] < 28.0


def test_psi_null_bins_align(spark):
    """NULL bin values on both sides land in the same sentinel bin —
    the full-outer join must not split them (NULL keys never match)."""
    ref = _docs(spark, ["a", None, None])
    cur = _docs(spark, ["a", None, None])
    row = psi_report(ref, cur, [("cat", F.col("cat"))]).first()
    assert row["n_bins"] == 2
    assert row["psi"] == 0.0


def test_psi_multi_feature_single_scan(spark):
    """Adding features adds bins, not passes: both features compute in
    one Generate per snapshot and PSI is reported per feature."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 100), ("b", 1), ("b", 100)], "cat string, n long"
    )
    out = psi_report(
        df, df, [("cat", F.col("cat")), ("n_bin", F.floor(F.col("n") / 50.0))]
    )
    rows = {r["feature"]: r for r in out.collect()}
    assert set(rows) == {"cat", "n_bin"}
    assert all(r["psi"] == 0.0 for r in rows.values())
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # linear lineage: one Generate (and one scan) per snapshot, never a
    # duplicated bin-count subtree for the totals
    assert plan.count("Generate") <= 2
    assert plan.count("Scan ExistingRDD") <= 2
