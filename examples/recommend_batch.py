"""Runnable walkthrough: the reference's batch train/evaluate/recommend
flow (``spark_music.py`` / ``engine.py``) on this engine's DataFrame
API, using synthetic ratings derived from the testdata events table.

    python examples/recommend_batch.py [sf_dir]

Steps (mirroring SURVEY.md E3):
  build ratings → grid-search rank by held-out RMSE → retrain best →
  simulate a new user's ratings arriving → top-10 recommendations.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.recommend import RecommendationEngine
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-recommend")
    spark.sparkContext.setLogLevel("ERROR")

    # user×item ratings synthesized from events (user_id, event hash →
    # item, value → rating-ish) — the engine is schema-driven, any
    # (user, item, rating) works
    ev = load_table(spark, sf_dir, "events")
    ratings = ev.select(
        F.col("user_id").cast("int").alias("user_id"),
        (F.abs(F.xxhash64("event_type")) % 100).cast("int").alias("song_id"),
        (F.col("value") % 5 + 1).cast("double").alias("rating"),
    ).dropDuplicates(["user_id", "song_id"])
    metadata = spark.range(100).select(
        F.col("id").cast("int").alias("new_song_ID"),
        F.concat(F.lit("song #"), F.col("id")).alias("title"),
    )

    engine, rmses = RecommendationEngine.train_best_rank(
        spark, ratings, metadata, ranks=(4, 8), min_ratings=5
    )
    print(
        "validation RMSE by rank: "
        + ", ".join(f"{r}: {v:.4f}" for r, v in rmses.items())
        + f" → chose rank {engine.rank}; held-out test RMSE "
        + f"{engine.test_rmse_:.4f}"
    )

    new_user = ratings.agg(F.max("user_id")).first()[0] + 1
    new_rows = spark.createDataFrame(
        [(new_user, s, 5.0) for s in range(5)],
        "user_id int, song_id int, rating double",
    )
    engine.add_ratings(new_rows)  # union + retrain (reference M6)

    top = engine.get_top_ratings(new_user, k=10)
    top.show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
