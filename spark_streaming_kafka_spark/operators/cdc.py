"""Snapshot-delta operators: diff and upsert between table versions.

Incremental pipelines at 100 TB re-process deltas, not snapshots: the
nightly ingest produces a new version of a keyed table, and everything
downstream wants "what changed" (to re-embed only changed documents,
re-dedup only added ones) and "apply these updates" (upsert without a
transactional table format). These two operators are that contract in
plain DataFrame algebra — no Delta/Iceberg dependency, deterministic,
oracle-verifiable.

Scale shape — the whole point of the implementation:

- :func:`snapshot_diff` compares ROW HASHES, not rows: each side
  reduces to ``(key, md5(canonical row))`` at the scan, so the full
  outer join shuffles ~40 bytes/row regardless of row width (a wide
  document row never crosses the wire). Hash equality stands in for
  value equality with md5's collision odds (~n²/2¹²⁸ — the same
  trade exact_dedup makes).
- :func:`upsert` is one full outer join on the key: update rows win,
  base rows survive untouched, brand-new keys append. With both sides
  bucketed/partitioned by key on disk this is the sort-merge join a
  lakehouse MERGE compiles to anyway; updates are usually small, so
  AQE broadcasts them and the base never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(df: DataFrame, key: str, cols: list[str]) -> DataFrame:
    """(key, h) with h = md5 over the null-tagged canonical encoding of
    ``cols`` (fixed order, '\\x01' separator, NULL → '\\x00NULL' tag so
    (NULL, 'x') never collides with ('', 'x') or a value containing the
    separator-free text 'NULL')."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols
    ]
    return df.select(
        F.col(key), F.md5(F.concat_ws("\x01", *parts)).alias("h")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two snapshot versions → ``(key, change)`` with
    change ∈ {'added', 'removed', 'changed'}; unchanged keys are
    omitted (at scale they are ~all keys — the output is delta-sized).

    One full outer join of the two hash-reduced sides (40-byte rows);
    ``compare_cols`` defaults to every non-key column of ``old``.
    Assumes ``key`` is unique per snapshot (a snapshot invariant the
    caller owns — enforce upstream with exact_dedup/dedup_by_key).
    """
    compare_cols = compare_cols or [c for c in old.columns if c != key]
    a = _row_hash(old, key, compare_cols).withColumnRenamed("h", "__ha")
    b = _row_hash(new, key, compare_cols).withColumnRenamed("h", "__hb")
    j = a.join(b, key, "full_outer")
    change = (
        F.when(F.col("__ha").isNull(), F.lit("added"))
        .when(F.col("__hb").isNull(), F.lit("removed"))
        .when(F.col("__ha") != F.col("__hb"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(key, "change")
    )


def upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE without a table format: rows from ``updates`` replace
    same-key rows of ``base`` whole-row; new keys append; all other
    base rows pass through. Both inputs must share the schema; ``key``
    unique on each side.

    Formulated as anti-join + union — NOT a full outer join — because
    full outer cannot broadcast (Spark plans it sort-merge even for a
    10-row delta): ``base ▷ update_keys`` drops the superseded rows
    with a LEFT ANTI join that broadcasts the delta's key set, then the
    delta unions in unchanged. The base never shuffles and never
    rewrites untouched rows' bytes — the delta-sized cost a 100 TB
    nightly merge requires. (Whole-row replacement falls out for free:
    superseded base rows are gone, so no per-column coalesce can
    resurrect their values.)

    ``broadcast_updates=False`` drops the explicit hint for the rare
    snapshot-sized update set (the anti-join then shuffles both key
    sets; correctness is identical).
    """
    keys = updates.select(key)
    if broadcast_updates:
        keys = F.broadcast(keys)
    survivors = base.join(keys, key, "left_anti")
    return survivors.unionByName(updates.select(*base.columns))


def merge_additive_aggregates(
    agg: DataFrame,
    delta_agg: DataFrame,
    keys: list[str],
    add_cols: list[str],
) -> DataFrame:
    """Incremental maintenance of an ADDITIVE aggregate table: fold a
    delta's pre-aggregated contributions into the standing aggregate
    without touching the history — ``new = old ⊎ delta`` where ⊎ sums
    ``add_cols`` per key (sums, counts; any commutative-monoid
    measure). Avg/stddev maintain as (sum, count[, sumsq]) pairs and
    derive at read; quantiles/distincts need sketches (t-digest, HLL)
    — not this operator.

    This is the 100 TB reporting pattern: the standing aggregate is
    dimension-sized, the delta is batch-sized, and the merge is a
    union + hash re-aggregation over ONLY those two — the fact history
    is never rescanned. Retractions are just negative contributions
    (a removed row's delta is its negated measures).
    """
    u = agg.select(*keys, *add_cols).unionByName(
        delta_agg.select(*keys, *add_cols)
    )
    return u.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in add_cols]
    )
