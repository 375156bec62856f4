"""Training-example construction transforms — the step after curation
where documents become model inputs.

:func:`fim_split` is the fill-in-the-middle transform (Bavarian et
al., "Efficient Training of Language Models to Fill in the Middle"):
each document is deterministically cut into (prefix, middle, suffix)
so the trainer can emit PSM/SPM-ordered examples. Public pipelines
apply this to a sampled fraction of the corpus at preprocessing time.

Determinism contract: the cut points derive from the portable
md5-prefix hash of the document id — no RNG state, identical across
engines/partitionings/reruns, and value-replayable by the DuckDB
oracle. Pure column algebra (tokenize, two hashes, three slices):
stays in whole-stage codegen with zero shuffle — the ideal 100 TB
shape, a map-only pass over the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from .dedup import tokenize

__all__ = ["fim_split"]


def fim_split(
    docs: DataFrame,
    min_tokens: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut each document into non-empty (prefix, middle, suffix) at
    hash-derived token offsets: ``(doc_id, n_tokens, prefix, middle,
    suffix)``.

    Cut rule (1-based token positions, n = token count):

    - middle starts at  a = 2 + md5('fim_a_'+id) mod (n-2)   ∈ [2, n-1]
    - middle length     L = 1 + md5('fim_l_'+id) mod (n-a)   ∈ [1, n-a]

    so prefix = tokens[1, a), middle = tokens[a, a+L), suffix =
    tokens[a+L, n] — all three non-empty by construction. Documents
    shorter than ``min_tokens`` (< 4) cannot satisfy that and are
    excluded (train them unsplit).
    """
    if min_tokens < 4:
        raise ValueError("min_tokens must be >= 4 for non-empty splits")
    toks = tokenize(F.col(text_col))
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("__t"),
            F.size(toks).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
    )
    a = (
        F.lit(2)
        + md5_long(F.concat(F.lit("fim_a_"), F.col("doc_id").cast("string")))
        % (F.col("n_tokens") - F.lit(2))
    ).cast("int")
    d = d.withColumn("__a", a)
    length = (
        F.lit(1)
        + md5_long(F.concat(F.lit("fim_l_"), F.col("doc_id").cast("string")))
        % (F.col("n_tokens") - F.col("__a"))
    ).cast("int")
    d = d.withColumn("__l", length)
    return d.select(
        "doc_id",
        "n_tokens",
        F.concat_ws(" ", F.slice("__t", F.lit(1), F.col("__a") - F.lit(1))).alias("prefix"),
        F.concat_ws(" ", F.slice("__t", F.col("__a"), F.col("__l"))).alias("middle"),
        F.concat_ws(
            " ",
            F.slice(
                "__t",
                F.col("__a") + F.col("__l"),
                (F.col("n_tokens").cast("int") - F.col("__a") - F.col("__l") + F.lit(1)),
            ),
        ).alias("suffix"),
    )
