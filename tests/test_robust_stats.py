"""Unit tests for containment dedup, Tukey-fence outliers, and
nearest-centroid label QC — hand-computed oracles (DuckDB value oracles
live in queries.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka_spark.operators.dedup import containment_pairs
from spark_streaming_kafka_spark.operators.percentile import iqr_outliers
from spark_streaming_kafka_spark.operators.similarity import (
    nearest_centroid_confusion,
)


# --- containment --------------------------------------------------------

def test_containment_detects_subset_doc(spark):
    # B = 10 tokens (8 distinct 3-shingles), A = its first 5 tokens
    # (3 shingles, all present in B): C(A→B)=1.0, C(B→A)=3/8.
    b_text = " ".join(f"t{i}" for i in range(10))
    a_text = " ".join(f"t{i}" for i in range(5))
    df = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, "x y z w v")],
        "doc_id long, text string",
    )
    got = {
        (r.inner_id, r.outer_id): r.containment
        for r in containment_pairs(df, threshold=0.6).collect()
    }
    assert got == {(1, 2): 1.0}
    # lower threshold exposes the reverse direction at 3/8
    got_all = {
        (r.inner_id, r.outer_id): r.containment
        for r in containment_pairs(df, threshold=0.3).collect()
    }
    assert got_all[(2, 1)] == pytest.approx(3 / 8)


def test_containment_max_df_drops_stop_shingles(spark):
    # the same shingle in 4 docs; max_df=3 removes it everywhere, so no
    # pairs survive (each doc's only shingle was the stop shingle).
    rows = [(i, "a b c") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert containment_pairs(df, threshold=0.1, max_df=3).count() == 0
    # without the gate the 4 docs are mutual exact containments
    assert containment_pairs(df, threshold=0.99).count() == 12


# --- IQR outliers -------------------------------------------------------

def test_iqr_flags_only_the_planted_outlier(spark):
    # values 1..9: Q1=3, Q3=7, IQR=4 → fences [-3, 13]; 100 flagged
    rows = [(i, "g", float(v)) for i, v in enumerate(range(1, 10))]
    rows.append((99, "g", 100.0))
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = iqr_outliers(df, "g", "v").collect()
    assert [(r.id, r.v) for r in got] == [(99, 100.0)]
    # fences include the outlier in their own computation: Q1/Q3 of the
    # 10 values (1..9,100) → Q3 = 7.75, IQR = 4.5, hi = 14.5
    assert got[0].fence_hi == pytest.approx(14.5)
    assert got[0].fence_lo == pytest.approx(-3.5)


def test_iqr_groups_are_independent(spark):
    rows = [(i, "a", float(i % 5)) for i in range(20)]
    rows += [(100 + i, "b", 1000.0 + (i % 3)) for i in range(20)]
    rows.append((999, "b", 0.0))  # outlier only relative to group b
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = iqr_outliers(df, "g", "v").collect()
    assert [(r.id, r.g) for r in got] == [(999, "b")]


# --- nearest centroid ---------------------------------------------------

def test_nearest_centroid_confusion_counts(spark):
    # two orthogonal clusters; one vector carries the wrong label
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
        (5, [1.0, 0.05], 1),  # mislabeled: sits in cluster 0
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r.true_label, r.pred_label): r.n
        for r in nearest_centroid_confusion(df).collect()
    }
    assert got[(0, 0)] == 2
    assert got[(1, 1)] == 2
    assert got[(1, 0)] == 1
    assert (0, 1) not in got


def test_nearest_centroid_tie_prefers_smallest_label(spark):
    # identical centroids for labels 3 and 7: every vector ties; the
    # deterministic tiebreak assigns the smaller label
    rows = [
        (1, [1.0, 0.0], 3),
        (2, [1.0, 0.0], 7),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r.true_label, r.pred_label): r.n
        for r in nearest_centroid_confusion(df).collect()
    }
    assert got == {(3, 3): 1, (7, 3): 1}


def test_nearest_centroid_empty_raises(spark):
    df = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    with pytest.raises(ValueError):
        nearest_centroid_confusion(df)


def test_nearest_centroid_string_labels(spark):
    # the index-based tiebreak must work for non-numeric labels too
    rows = [
        (1, [1.0, 0.0], "news"),
        (2, [0.9, 0.1], "news"),
        (3, [0.0, 1.0], "code"),
        (4, [1.0, 0.05], "code"),  # mislabeled: sits in the news cluster
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    got = {
        (r.true_label, r.pred_label): r.n
        for r in nearest_centroid_confusion(df).collect()
    }
    assert got == {("news", "news"): 2, ("code", "code"): 1, ("code", "news"): 1}


def test_nearest_centroid_string_tie_prefers_smallest_label(spark):
    rows = [(1, [1.0, 0.0], "zebra"), (2, [1.0, 0.0], "apple")]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string"
    )
    got = {
        (r.true_label, r.pred_label): r.n
        for r in nearest_centroid_confusion(df).collect()
    }
    assert got == {("zebra", "apple"): 1, ("apple", "apple"): 1}


def test_nearest_centroid_null_labels_scored_as_null_true(spark):
    # NULL-label rows contribute nothing to centroids but ARE scored:
    # they surface as true_label=NULL cells (oracle-parity behavior)
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 1),
        (3, [0.95, 0.05], None),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        (r.true_label, r.pred_label): r.n
        for r in nearest_centroid_confusion(df).collect()
    }
    assert got[(None, 0)] == 1
    assert got[(0, 0)] == 1
    assert got[(1, 1)] == 1


# --- MAD outliers -------------------------------------------------------

def test_mad_outliers_known_values(spark):
    from spark_streaming_kafka_spark.operators.percentile import mad_outliers

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = mad_outliers(df, "g", "v").collect()
    # median 5.5, deviations [4.5..0.5, 94.5] -> MAD 2.5;
    # mz(100) = 0.6745*94.5/2.5 = 25.5 -> only the 100 row flags
    assert [(r.id, r.v) for r in got] == [(9, 100.0)]
    assert abs(got[0].mz - round(0.6745 * 94.5 / 2.5, 6)) < 1e-9


def test_mad_outliers_degenerate_group_excluded(spark):
    from spark_streaming_kafka_spark.operators.percentile import mad_outliers

    # >50% identical values => MAD 0 => group excluded by contract,
    # even though 99.0 is wildly off-median
    rows = [(i, "a", 5.0) for i in range(6)] + [(6, "a", 99.0)]
    rows += [(10, "b", 1.0), (11, "b", 2.0), (12, "b", 3.0), (13, "b", 50.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = mad_outliers(df, "g", "v").collect()
    assert all(r.g == "b" for r in got)
    assert {r.id for r in got} == {13}


def test_histogram_quantile_accuracy_and_merge(spark):
    from pyspark.sql import functions as F
    from spark_streaming_kafka_spark.operators.sketches import (
        histogram_quantile,
        histogram_sketch,
    )

    # uniform 0..999: P50 ~ 500, P95 ~ 950; bin width = 1000/100 = 10
    df = spark.range(1000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    sk = histogram_sketch(df, "v", ["g"], lo=0.0, hi=1000.0, bins=100)
    est = {
        r["q"]: r["est"]
        for r in histogram_quantile(
            sk, ["g"], [0.5, 0.95], lo=0.0, hi=1000.0, bins=100
        ).collect()
    }
    assert abs(est[0.5] - 500.0) <= 10.0
    assert abs(est[0.95] - 950.0) <= 10.0

    # mergeability: sketch(a) + sketch(b) cell-sum == sketch(a union b)
    a, b = df.filter("v < 400"), df.filter("v >= 400")
    merged = (
        histogram_sketch(a, "v", ["g"], 0.0, 1000.0, 100)
        .unionByName(histogram_sketch(b, "v", ["g"], 0.0, 1000.0, 100))
        .groupBy("g", "bin")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    whole = histogram_sketch(df, "v", ["g"], 0.0, 1000.0, 100)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))

    # out-of-range values clamp to edge bins, never drop
    oob = spark.createDataFrame([("g", -5.0), ("g", 2000.0)], "g string, v double")
    cells = {r["bin"]: r["c"] for r in histogram_sketch(oob, "v", ["g"], 0.0, 1000.0, 100).collect()}
    assert cells == {0: 1, 99: 1}
