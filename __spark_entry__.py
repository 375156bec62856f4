"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the oracle-checked registry (implementation in
``spark_streaming_kafka_spark/queries.py`` — one entry per SQL-
expressible operator from SURVEY.md §2 plus the LLM-pipeline operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's serving
    pipeline shape (fact ⋈ broadcast dims → agg → filter → top-k,
    SURVEY.md E1/E3) over the testdata star schema."""
    from spark_streaming_kafka_spark.queries import QUERIES

    return QUERIES["top_revenue_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spark_streaming_kafka_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from spark_streaming_kafka_spark.queries import ORACLES

    return dict(ORACLES)
