"""Mergeable distributed sketches: HyperLogLog and Count-Min.

At 100 TB, exact ``COUNT(DISTINCT)`` and exact per-key frequency
tables are often the single most expensive aggregations in a
pipeline: the shuffle carries one row per distinct key. Sketches
replace that with FIXED-SIZE mergeable state — the map side reduces
each partition to (bucket, max_rho) / (row, col, count) cells, the
shuffle carries at most ``m`` (HLL) or ``d*w`` (CMS) rows per group
regardless of data volume, and sketches from different days / sources /
streams merge with ``MAX`` / ``SUM``. That mergeability is the whole
point: a 1000-executor cluster builds per-partition sketches with no
coordination and combines them in one tiny reduce.

Everything here is expressed as plain DataFrame column algebra over the
engine-portable hash (:mod:`..functions.hashing`), so results are
bit-reproducible in the DuckDB oracle:

- :func:`hll_sketch` / :func:`hll_estimate` — classic Flajolet et al.
  HyperLogLog (the 2007 AlgoHLL paper): bucket = ``h mod m`` with
  ``m = 2^p``, rho = leading-zero rank of the remaining ``60 - p``
  hash bits (md5_long yields 60-bit hashes), estimate =
  ``alpha_m * m^2 / sum(2^-max_rho)`` with the standard small-range
  linear-counting correction. The ``sum(2^-max_rho)`` accumulator is
  computed in EXACT integer space (``sum(1 << (maxbits - max_rho))``
  as a 64-bit integer with ``maxbits = 60 - p + 1`` — 53 at the
  default p=8 — one final float division) so the estimate is
  order-independent and engine-portable — a floating sum of 2^-k terms
  would depend on reduction order.
- :func:`cms_sketch` / :func:`cms_lookup` — Cormode & Muthukrishnan's
  Count-Min sketch: ``d`` universal-hash rows of width ``w``; a point
  query reads the MIN over its ``d`` cells and over-estimates only
  (one-sided error ≤ 2N/w with prob ≥ 1 - 2^-d).

Reference scope anchor: the reference's aggregation surface is exact
RDD ``countByValue``/``reduceByKey`` (spark_kafka.py:96-104); these are
the bounded-state versions of the same questions, which is what the
reference's approach has to become at three orders of magnitude more
data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, md5_long

__all__ = [
    "hll_sketch",
    "hll_estimate",
    "hll_distinct",
    "cms_sketch",
    "cms_lookup",
    "CMS_DEFAULT_PARAMS",
]

#: md5_long yields 60-bit hashes; after taking p bucket bits, 60 - p
#: bits remain for the rho (leading-zero-rank) field.
_HASH_BITS = 60


def _alpha(m: int) -> float:
    """Standard HLL bias-correction constant for m buckets."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame,
    key: Column | str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., bucket, max_rho).

    ``key`` is a string column (or expression) identifying the items to
    count distinctly. One hash aggregation; after map-side combine the
    shuffle carries at most ``|groups| * 2^p`` rows — data-volume
    independent. Register tables for different slices of data merge
    with ``GROUP BY bucket -> MAX(max_rho)``, which is how a
    1000-executor build (or a day-over-day rollup) combines partials.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    field_bits = _HASH_BITS - p
    c = F.col(key) if isinstance(key, str) else key
    h = md5_long(c)
    bucket = (h % F.lit(m)).cast("int")
    # Integer shift, NOT h/m: float division of a 60-bit value loses
    # low bits past the 53-bit double mantissa.
    rest = F.shiftright(h, p)  # top 60-p hash bits
    # rho = leading zeros of the (60-p)-bit field + 1. bit-length via
    # length(bin(x)) is exact integer math in Spark AND DuckDB; the
    # all-zero field maxes out at field_bits + 1.
    rho = F.when(rest == 0, F.lit(field_bits + 1)).otherwise(
        F.lit(field_bits + 1) - F.length(F.bin(rest))
    )
    return (
        # NULL keys hash to NULL and would land in a bucket=NULL register
        # row, inflating `nonzero` (deflating the zeros correction) in
        # hll_estimate — drop them: NULL is "no item", not a distinct key.
        df.filter(c.isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_estimate(sketch: DataFrame, group_cols: list[str], p: int = 8) -> DataFrame:
    """Cardinality estimate per group from a register table.

    Exact-integer accumulator: ``Z_int = sum(1 << (maxbits - max_rho))
    + zeros * (1 << maxbits)`` where ``maxbits = 60 - p + 1`` — a
    64-bit integer (≤ 2^(p + maxbits) ≤ 2^61 for p ≤ 16... p + maxbits
    = 61 always), so the only float op is the final division and the
    estimate is identical regardless of aggregation order or engine.
    Small-range correction: linear counting ``m * ln(m / zeros)`` when
    the raw estimate ≤ 2.5m and empty registers exist.
    """
    m = 1 << p
    maxbits = _HASH_BITS - p + 1  # max rho value
    alpha = _alpha(m)
    agg = sketch.groupBy(*group_cols).agg(
        # shiftleft with a COLUMN shift amount needs the SQL form (the
        # Python helper only takes int literals)
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {maxbits} - max_rho)")
        ).alias("z_int"),
        F.count(F.lit(1)).alias("nonzero"),
    )
    zeros = F.lit(m) - F.col("nonzero")
    z_int = F.col("z_int") + zeros * F.lit(1 << maxbits).cast("long")
    # E_raw = alpha * m^2 / (Z_int / 2^maxbits), written so both engines
    # evaluate the same literal expression tree.
    e_raw = (
        F.lit(alpha * m * m * float(1 << maxbits)) / z_int.cast("double")
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.round(est, 2).alias("hll_distinct"),
        zeros.cast("long").alias("empty_registers"),
    )


def hll_distinct(
    df: DataFrame,
    key: Column | str,
    group_cols: list[str],
    p: int = 8,
) -> DataFrame:
    """Composed sketch + estimate: (group_cols..., hll_distinct,
    empty_registers). The production replacement for per-group
    ``COUNT(DISTINCT key)`` when the key space is large: state is
    ``m`` registers per group instead of one row per distinct key."""
    return hll_estimate(hll_sketch(df, key, group_cols, p=p), group_cols, p=p)


def duckdb_hll_sql(
    table_expr: str,
    key_sql: str,
    group_sql: list[str],
    p: int = 8,
) -> str:
    """DuckDB twin of :func:`hll_distinct` — same hash, same integer
    accumulator, same literal constants, so values match bit-for-bit
    after the shared round(., 2)."""
    m = 1 << p
    maxbits = _HASH_BITS - p + 1
    alpha = _alpha(m)
    gcols = ", ".join(group_sql)
    h = f"CAST(concat('0x', substr(md5({key_sql}), 1, 15)) AS BIGINT)"
    e_raw = f"({alpha * m * m * float(1 << maxbits)!r} / CAST(z_int + zeros * (CAST(1 AS BIGINT) << {maxbits}) AS DOUBLE))"
    lin = f"({float(m)!r} * ln({float(m)!r} / CAST(zeros AS DOUBLE)))"
    return f"""
    WITH hashed AS (
      SELECT {gcols}, {h} % {m} AS bucket, {h} >> {p} AS rest
      FROM {table_expr}
      WHERE {key_sql} IS NOT NULL
    ),
    regs AS (
      SELECT {gcols}, bucket,
             max(CASE WHEN rest = 0 THEN {maxbits}
                      ELSE {maxbits} - length(bin(rest)) END) AS max_rho
      FROM hashed GROUP BY {gcols}, bucket
    ),
    agg AS (
      SELECT {gcols},
             sum(CAST(1 AS BIGINT) << ({maxbits} - max_rho)) AS z_int,
             {m} - count(*) AS zeros
      FROM regs GROUP BY {gcols}
    )
    SELECT {gcols},
           round(CASE WHEN {e_raw} <= {2.5 * m!r} AND zeros > 0
                      THEN {lin} ELSE {e_raw} END, 2) AS hll_distinct,
           CAST(zeros AS BIGINT) AS empty_registers
    FROM agg
    """


#: (a, b) universal-hash parameters for the CMS rows — fixed literals so
#: sketches built on different days / engines address the same cells.
CMS_DEFAULT_PARAMS: list[tuple[int, int]] = [
    (1103515245, 12345),
    (69069, 362437),
    (1664525, 1013904223),
]


def cms_sketch(
    keys: DataFrame,
    key_col: str = "term",
    width: int = 64,
    params: list[tuple[int, int]] = CMS_DEFAULT_PARAMS,
) -> DataFrame:
    """Count-Min sketch of a key stream: (row, col, c).

    ``keys`` is one row per occurrence (e.g. the exploded token
    stream). Each occurrence lands in ``d = len(params)`` cells; the
    output is at most ``d * width`` rows TOTAL after the hash
    aggregation — the shuffle after map-side combine is sketch-sized,
    never corpus-sized. Two sketches over different data merge by
    summing matching cells.
    """
    h = md5_long(F.col(key_col)) % F.lit(MERSENNE_P)
    cells = F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P) % F.lit(width)).cast("int")
            for (a, b) in params
        ]
    )
    return (
        # NULL keys hash to NULL cells — drop them, same discipline as
        # hll_sketch / histogram_sketch.
        keys.filter(F.col(key_col).isNotNull())
        .select(F.posexplode(cells).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_lookup(
    sketch: DataFrame,
    query_keys: DataFrame,
    key_col: str = "term",
    width: int = 64,
    params: list[tuple[int, int]] = CMS_DEFAULT_PARAMS,
) -> DataFrame:
    """Point-query the sketch for each key in ``query_keys``:
    (key, est_count) with ``est = min`` over the key's ``d`` cells.
    The d*w sketch is broadcast; the output over-estimates only."""
    h = md5_long(F.col(key_col)) % F.lit(MERSENNE_P)
    cells = F.array(
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P) % F.lit(width)).cast("int")
            for (a, b) in params
        ]
    )
    q = query_keys.select(key_col, F.posexplode(cells).alias("row", "col"))
    return (
        q.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_count"))
    )


def duckdb_cms_cells_sql(
    key_sql: str,
    width: int = 64,
    params: list[tuple[int, int]] = CMS_DEFAULT_PARAMS,
) -> str:
    """DuckDB fragment: LIST of the d (row, col) cell addresses for a
    key expression, matching :func:`cms_sketch`'s addressing."""
    h = f"(CAST(concat('0x', substr(md5({key_sql}), 1, 15)) AS BIGINT) % {MERSENNE_P})"
    structs = [
        f"{{'ri': {i}, 'ci': CAST(({a} * {h} + {b}) % {MERSENNE_P} % {width} AS INT)}}"
        for i, (a, b) in enumerate(params)
    ]
    return "[" + ", ".join(structs) + "]"

def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Fixed-bin histogram sketch: (group..., bin, c) — the mergeable
    QUANTILE member of the sketch trio (HLL = distinct, CMS = heavy
    hitters, histogram = quantiles).

    Exact per-group percentiles at 100 TB need a full sort or an
    all-values shuffle; the histogram reduces each partition to at
    most ``bins`` cells per group, the shuffle after map-side combine
    is sketch-sized, and sketches over different days / sources /
    streams merge by summing matching cells — same merge discipline
    as the other two sketches, so incremental and streaming rollups
    come for free. Out-of-range values clamp to the edge bins.

    Bin addressing is one floor-divide of column algebra (IEEE-double
    identical across engines), so the DuckDB oracle reproduces the
    sketch cell-for-cell.
    """
    width = (hi - lo) / bins
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        # NULL values would count into a bin=NULL cell, inflating `total`
        # in histogram_quantile and shifting every quantile — drop them.
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def histogram_quantile(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 128,
) -> DataFrame:
    """Per-group quantile estimates from a :func:`histogram_sketch`:
    (group..., q, est) with linear interpolation inside the selected
    bin (the classic Prometheus/HDR ``histogram_quantile`` rule):

        target   = q * N
        bin*     = first bin with cum(bin) >= target
        est      = lo + (bin* + (target - cum_prev)/c(bin*)) * width

    Everything downstream of the sketch is bin-bounded: the cumulative
    sum is a window over <= ``bins`` rows per group, the quantile
    probe is a broadcast-sized join of |groups| x |qs| rows. Error is
    bounded by one bin width — tighten by raising ``bins``, whose cost
    is still trivially sketch-sized.
    """
    from pyspark.sql import Window

    width = (hi - lo) / bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = (
        sketch.withColumn("cum", F.sum("c").over(w))
        .withColumn("total", F.max("cum").over(Window.partitionBy(*group_cols)))
    )
    qdf = F.explode(F.array(*[F.lit(q) for q in qs])).alias("q")
    probes = cum.select(*group_cols, "bin", "c", "cum", "total", qdf)
    hit = probes.filter(
        (F.col("cum") >= F.col("q") * F.col("total"))
        & ((F.col("cum") - F.col("c")) < F.col("q") * F.col("total"))
    )
    est = (
        F.lit(lo)
        + (
            F.col("bin")
            + (F.col("q") * F.col("total") - (F.col("cum") - F.col("c")))
            / F.col("c")
        )
        * F.lit(width)
    )
    # q rounded to 6 digits (not 2): fine-grained requests like
    # qs=[0.995, 0.999] must stay distinguishable in the output.
    return hit.select(
        *group_cols,
        F.round(F.col("q"), 6).alias("q"),
        F.round(est, 6).alias("est"),
    )


__all__ += ["histogram_sketch", "histogram_quantile"]
