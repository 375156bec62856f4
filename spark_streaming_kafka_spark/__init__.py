"""spark_streaming_kafka_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query and data-processing capabilities of the
reference repo ``jimmy29304825/spark_streaming_kafka`` (a Spark-2.4-era
RDD/DStream/mllib music-recommendation system), re-expressed on modern
Spark: DataFrame + Catalyst for the relational core, Structured Streaming
for the streaming legs, ``pyspark.ml`` for ALS, and Arrow-batched pandas
UDFs for the few operators the built-in functions cannot express.

Layout (mirrors SURVEY.md §2's operator inventory):

- ``sources``   — S1–S18: csv/tsv/jsonl/parquet readers, Kafka source/sink,
                  JDBC, Redis, Mongo, console/memory, model persistence.
- ``operators`` — P*/J*/A*/T*/U*/W*: projections, filters, joins,
                  aggregations, top-k, set ops, percentile bucketing,
                  window top-k; plus the LLM-data-pipeline operators
                  (dedup, similarity search, multimodal, text analysis).
- ``functions`` — F*: scalar/column expression helpers (hashing, text
                  metrics, sentiment, vector math) shared by operators.
- ``streaming`` — X*: Structured Streaming pipelines (word count,
                  recommend cycle, sentinel sessions).
- ``plans``     — physical-plan inspection helpers used by tests to assert
                  broadcast joins, pushed filters, and codegen coverage.
- ``recommend`` — the ``RecommendationEngine`` DataFrame API (reference
                  ``engine.py:50-81`` parity).

Everything here is plain public PySpark; no reference code is copied.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
