"""The SQL face of the engine: temp views + SQL-callable functions.

Everything in this repo is expressible through ``spark.sql`` once the
tables are registered as views and the engine's scalar functions are
registered as SQL functions — the surface an analyst (or an external
BI/notebook tool) actually touches. DataFrame callables and SQL text
compile to the SAME Catalyst plans, so nothing here forks the engine:
it is registration, not reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.readers import load_table

#: Every driver testdata table (TESTDATA.md).
TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Register each testdata table as a temp view (through
    ``load_table``, so the events timestamp normalization applies to
    SQL users too). Returns the registered names."""
    names = names or TABLE_NAMES
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
    return list(names)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Expose the engine's Python-side scalar functions to SQL.

    Column-expression functions (quality features, fingerprints,
    tokenization, …) need no registration — they are already plain
    Catalyst expressions reachable from SQL text. What SQL can't reach
    on its own are the pandas-UDF paths; those are registered here:

    - ``sentiment(text)`` — the Arrow-batched lexicon scorer (F9), the
      reference's TextBlob/Afinn step (`lyric.ipynb#cell9-10`).

    Registration is per-session and idempotent.
    """
    from .functions.text import sentiment_pandas_udf

    spark.udf.register("sentiment", sentiment_pandas_udf)
    return ["sentiment"]


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-call SQL entry point: register views + functions, run the
    query. (Registration cost is a handful of catalog ops — negligible
    next to any real query.)"""
    register_views(spark, sf_dir)
    register_sql_functions(spark)
    return spark.sql(query)
