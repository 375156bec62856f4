"""The reference's ETL pipeline (``music_ETL.ipynb``) as one declarative
DataFrame flow.

Reference flow (pandas, driver-side, per-user Python loops):
  MSD listen triplets → drop listen_count < 2 (#cell4) → keep users with
  total ≥ 20 (#cell5-6) → per-user quantile bucketing of listen_count
  into levels 1–5 (#cell9, the W1 operator) → top-200 songs by total
  listens (#cell12-13) → restrict ratings to the top-200 catalog
  (#cell16) → res_use.csv.

Here each step is a DataFrame op; the only shuffles are the two
aggregations (user totals, song totals) and the quantile groupBy — all
partial-agg hash aggregates. The per-user Python loop (the reference's
scalability cliff: one pandas quantile call per user on the driver)
becomes a single distributed ``percentile`` aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.percentile import quantile_buckets
from .operators.relational import grouped_sum, top_k


def filter_min_listens(triplets: DataFrame, min_count: int = 2) -> DataFrame:
    """#cell4 — drop noise plays (listen_count < 2)."""
    return triplets.filter(F.col("listen_count") >= min_count)


def filter_active_users(triplets: DataFrame, min_total: int = 20) -> DataFrame:
    """#cell5-6 — keep users with ≥ min_total listens. Semi-join against
    the per-user totals (broadcast when small; shuffle-safe regardless)."""
    totals = grouped_sum(triplets, "user_id", "listen_count", "total")
    active = totals.filter(F.col("total") >= min_total).select("user_id")
    return triplets.join(active, "user_id", "left_semi")


def bucket_ratings(triplets: DataFrame) -> DataFrame:
    """#cell8-9 (W1) — level 1.0 default, else 2–5 by per-user listen
    count quantiles (exact pandas-interpolation parity; see
    operators/percentile.py)."""
    out = quantile_buckets(
        triplets, "user_id", "listen_count", (0.2, 0.4, 0.6, 0.8), out="level",
        # MSD-shaped user base (~1M ⇒ ~40 MB of quantile rows): broadcast
        # the per-user boundaries instead of shuffling the fact side.
        broadcast_quantiles=True,
    )
    return out.withColumn("level", F.col("level").cast("double"))


def top_songs(triplets: DataFrame, n: int = 200) -> DataFrame:
    """#cell12-13 — top-n songs by total listens (deterministic: ties
    broken by song_id)."""
    totals = grouped_sum(triplets, "song_id", "listen_count", "total")
    return top_k(totals, [F.col("total").desc(), F.col("song_id").asc()], n)


def build_ratings(
    triplets: DataFrame,
    min_count: int = 2,
    min_total: int = 20,
    catalog_size: int = 200,
) -> DataFrame:
    """Full pipeline → (user_id, song_id, rating) restricted to the
    top-catalog (#cell16's 168,861-row shape on MSD input)."""
    cleaned = filter_active_users(
        filter_min_listens(triplets, min_count), min_total
    )
    # `cleaned` feeds BOTH the quantile bucketing and the catalog top-k;
    # without materialization the upstream join + user-totals semi-join
    # runs twice (column pruning differs per branch, so Spark's
    # ReusedExchange can't kick in). Lazy localCheckpoint materializes
    # it once on first use (~20% measured at sf0.1; the bigger the
    # upstream join, the bigger the saving). On a long-lived cluster
    # job prefer df.persist(MEMORY_AND_DISK) + unpersist for
    # fault-tolerant lineage; checkpoint blocks die with the executor.
    cleaned = cleaned.localCheckpoint(eager=False)
    rated = bucket_ratings(cleaned)
    catalog = top_songs(cleaned, catalog_size).select("song_id")
    return (
        rated.join(F.broadcast(catalog), "song_id", "left_semi")
        .select("user_id", "song_id", F.col("level").alias("rating"))
    )
