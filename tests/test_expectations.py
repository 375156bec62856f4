"""Unit tests for the expectation-check surface (data-contract gate)."""

from __future__ import annotations

import pytest

from spark_streaming_kafka_spark.operators.expectations import (
    accepted_values,
    expectation_report,
    foreign_key,
    in_range,
    not_null,
    unique,
)


def _df(spark):
    rows = [
        (1, "a", 1.0),
        (2, "a", 3.0),
        (2, "a", 99.0),   # dup key (id, cat); out of range
        (3, None, -1.0),  # null cat; out of range
        (4, "zz", 2.0),   # not an accepted cat; fk miss
    ]
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_expectation_counts(spark):
    df = _df(spark)
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    rep = {
        r.rule: (r.violations, r.passed)
        for r in expectation_report(
            spark,
            df,
            [
                not_null("cat"),
                in_range("v", 0.0, 10.0),
                accepted_values("cat", ["a", "b"]),
                unique(["id", "cat"]),
                foreign_key("id", dim, "k"),
            ],
        ).collect()
    }
    assert rep["not_null:cat"] == (1, False)
    assert rep["in_range:v[0.0,10.0]"] == (2, False)
    # NULL cat is not an accepted_values violation (not_null's job)
    assert rep["accepted_values:cat"] == (1, False)
    assert rep["unique:id,cat"] == (1, False)
    assert rep["foreign_key:id"] == (1, False)


def test_expectation_all_pass(spark):
    df = _df(spark).filter("id = 1")
    rep = expectation_report(
        spark, df, [not_null("cat"), in_range("v", 0.0, 10.0)]
    ).collect()
    assert all(r.passed and r.violations == 0 for r in rep)


def test_expectation_rejects_bad_input(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        expectation_report(spark, df, [])
    with pytest.raises(ValueError):
        expectation_report(spark, df, [not_null("cat"), not_null("cat")])


def test_fk_null_keys_are_not_violations(spark):
    df = spark.createDataFrame([(None,), (9,)], "id long")
    dim = spark.createDataFrame([(1,)], "k long")
    rep = expectation_report(
        spark, df, [foreign_key("id", dim, "k")]
    ).collect()
    assert rep[0].violations == 1  # only the non-null miss
