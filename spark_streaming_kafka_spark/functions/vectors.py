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


def int8_scale(vec: Column) -> Column:
    """Per-vector int8 quantization scale: ``max|v| / 127`` (0 for the
    zero vector). Materialize this as its OWN column before calling
    :func:`quantize_int8` — referencing the aggregate inline inside the
    per-element lambda would re-evaluate the O(d) fold once per element
    (Catalyst does no subexpression elimination inside higher-order
    lambdas; the O(d²) blowup is the same trap the minhash docstring
    records as measured 30× slower)."""
    v = F.transform(vec, lambda x: x.cast("double"))
    return F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    ) / F.lit(127.0)


def quantize_int8(vec: Column, scale: Column) -> Column:
    """Scalar int8 quantization against a pre-materialized ``scale``
    column (:func:`int8_scale`):
    ``qvec[i] = clip(floor(v[i]/scale + 0.5), -127, 127)``; zero scale
    → all-zero qvec.

    The storage-scale trade for 100 TB vector corpora: 4× smaller than
    float32 (8× vs float64), dequantize is one multiply, and recall
    loss at ANN thresholds is negligible (the reconstruction-cosine
    query pins it ≥ 0.999 on the testdata). floor(x + 0.5) — not
    round() — because round's half-case convention differs across
    engines while floor is exact everywhere: the quantized values are
    bit-reproducible in any SQL engine, which is what lets an external
    system verify (or consume) the quantized table.

    Pure column algebra: zero shuffle, O(d) per vector, runs inside the
    scan projection.
    """
    return F.transform(
        vec,
        lambda x: F.when(
            scale > 0,
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )


def dequantize_int8(qvec: Column, scale: Column) -> Column:
    """Inverse of :func:`quantize_int8`: array<double> ≈ the original."""
    return F.transform(qvec, lambda x: x.cast("double") * scale)
