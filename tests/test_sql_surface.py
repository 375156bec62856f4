"""SQL entry point (sql_surface.py): views + SQL-registered functions
produce the same plans/results as the DataFrame callables."""

from __future__ import annotations

from spark_streaming_kafka_spark.sql_surface import (
    register_sql_functions,
    register_views,
    sql,
)


def test_sql_matches_dataframe_query(spark, sf_dir):
    from spark_streaming_kafka_spark.queries import QUERIES

    got = sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem GROUP BY 1, 2
        """,
    ).collect()
    li = QUERIES["filter_project"]  # just to assert registry import works
    assert li is not None
    by_key = {(r[0], r[1]): r[2] for r in got}
    assert sum(by_key.values()) > 0 and len(by_key) >= 4


def test_views_use_normalized_events(spark, sf_dir):
    """SQL users get the same events.ts normalization as load_table —
    instant functions work under any session."""
    register_views(spark, sf_dir)
    row = spark.sql(
        "SELECT count(*) AS n, max(unix_millis(ts)) AS mx FROM events"
    ).collect()[0]
    assert row["n"] > 0 and row["mx"] > 0


def test_sentiment_callable_from_sql(spark, sf_dir):
    register_views(spark, sf_dir)
    register_sql_functions(spark)
    rows = spark.sql(
        "SELECT sentiment('good good bad') AS s, sentiment(NULL) AS z"
    ).collect()[0]
    assert rows["s"] == 3.0 and rows["z"] == 0.0  # 3 + 3 - 3


def test_sql_plan_equals_dataframe_plan(spark, sf_dir):
    """SQL text and the DataFrame API compile to the same physical plan
    shape (same engine, two faces)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    a = spark.sql(
        "SELECT o_custkey, sum(o_totalprice) AS s FROM orders GROUP BY o_custkey"
    )
    b = (
        spark.table("orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    pa = a._jdf.queryExecution().executedPlan().toString().split("\n")[0]
    pb = b._jdf.queryExecution().executedPlan().toString().split("\n")[0]
    assert pa.split("#")[0] == pb.split("#")[0]
