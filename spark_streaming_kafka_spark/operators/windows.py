"""W2 — windowed per-group ranking / top-k.

The reference serves top-25 for ONE user at a time via driver-side
``takeOrdered`` (``engine.py:73-81``). The scalable generalization ranks
every group in one pass: ``row_number() OVER (PARTITION BY g ORDER BY s
DESC)`` — a single shuffle on the group key, no driver round-trips, and
the natural shape for "recommendations for all users" (also available as
``ALSModel.recommendForAllUsers``, see recommend.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def per_group_top_k(
    df: DataFrame,
    group: str | Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group with their rank (1-based).

    ``order`` must be a total order (include a unique tiebreaker) for
    deterministic output. Spark plans a single hash-partition shuffle on
    ``group``; with AQE, skewed groups are split at runtime. For heavily
    skewed + tiny k, a two-phase variant (partial per-partition top-k via
    ``mapInPandas``, then final window) cuts the shuffle volume — not
    needed until group cardinality skew actually bites.
    """
    groups = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
