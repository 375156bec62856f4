"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Similarity search needs dot products over embedding arrays. The slow path
is a Python UDF per row; the fast path used here is ``zip_with`` +
``aggregate`` column algebra, which Catalyst evaluates inside codegen with
no Python exchange at all. For very wide vectors (>4k dims) a pandas_udf
with numpy matmul wins; see operators/similarity.py for that variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
