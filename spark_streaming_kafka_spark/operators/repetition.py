"""Repetition-based quality filters and passage-level exact dedup.

Two corpus-curation operators the reference lacks but a 100 TB
training-data pipeline runs on every ingest (the reference's only text
analytics is lyric sentiment, ``lyric.ipynb#cell9-10``; these extend
that leg to the modern curation rulebook):

- :func:`repetition_features` — the Gopher repetition rules (Rae et
  al. 2021, §A1.1): fraction of the document covered by its most
  frequent word 2-gram, and fraction of token positions covered by
  duplicated 3-grams. High values mean boilerplate, looped generation,
  or scraped navigation text; corpora are filtered by thresholding
  these per-document scores.
- :func:`passage_dedup` — fixed-span passage-level exact dedup
  (C4-style line dedup generalized to token windows): chunk each
  document into non-overlapping ``span``-token passages, hash each
  passage, and keep only the corpus-wide FIRST occurrence of every
  distinct passage (ordered by doc_id, then position). This catches
  repeated boilerplate embedded inside otherwise-unique documents,
  which document-level MinHash/SimHash (operators/dedup.py) cannot.

Scale shape (100 TB):

- ``repetition_features`` explodes each document into its n-gram
  stream (×~2 rows per token) and runs two partial-aggregated hash
  aggs keyed by (doc_id, gram) — the shuffle carries (doc_id, gram
  hash, count), never document bodies, and every agg is map-side
  combined. Per-doc state is bounded by the doc's distinct-gram count.
- ``passage_dedup`` shuffles (passage md5, doc_id, idx) — 16 bytes +
  ids per ``span`` tokens — to a first-occurrence window. At 100 TB
  the md5 keyspace is uniform, so the shuffle is balanced by
  construction; passage text itself never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokenize


def _grams(toks, n: int):
    """Within-row word n-gram array from a token array (column algebra,
    no explode): gram i = toks[i..i+n-1] joined by spaces, for
    i in 0..len-n. Empty array when the document has < n tokens."""
    joined = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", F.array(*([x] + [F.element_at(toks, i + F.lit(j + 1)) for j in range(1, n)]))
        ),
    )
    return joined


def repetition_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Per-document Gopher-style repetition scores.

    Returns one row per document:

    - ``n_tokens`` — whitespace token count;
    - ``top_{top_n}gram_frac`` — occurrences of the document's most
      frequent ``top_n``-gram / total ``top_n``-gram count (0.0 when
      the document has fewer than ``top_n`` tokens);
    - ``dup_{dup_n}gram_frac`` — fraction of token positions covered
      by at least one ``dup_n``-gram that occurs ≥2 times in the
      document (0.0 when no gram repeats).

    Both aggregations group on (doc, gram) — partial aggregation
    collapses each doc's gram stream map-side, so the shuffle is the
    per-doc *distinct*-gram set, not the token stream. The coverage
    union (positions of duplicated grams) stays array algebra inside
    one aggregate, no second explode.
    """
    toks = tokenize(F.col(text_col))
    base = docs.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
    )

    # -- top n-gram fraction: explode grams, count per (doc, gram) -----
    top_grams = base.select(
        id_col, "__n", F.explode_outer(_grams(F.col("__toks"), top_n)).alias("__g")
    )
    top_counts = top_grams.groupBy(id_col, "__n", "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    top_stats = top_counts.groupBy(id_col, "__n").agg(
        F.max(F.when(F.col("__g").isNotNull(), F.col("__c"))).alias("__top_c"),
        F.sum(F.when(F.col("__g").isNotNull(), F.col("__c"))).alias("__tot"),
    )

    # -- duplicated n-gram coverage: positions under repeated grams ----
    # posexplode gives each gram its 0-based start; a duplicated gram
    # covers [pos, pos+dup_n). collect the per-(doc,gram) position list
    # in ONE agg, keep only grams with ≥2 occurrences, then flatten the
    # covered-position sets and count distinct positions per doc.
    dup_grams = base.select(
        id_col, F.posexplode_outer(_grams(F.col("__toks"), dup_n)).alias("__pos", "__g")
    )
    per_gram = dup_grams.groupBy(id_col, "__g").agg(
        F.count(F.lit(1)).alias("__c"),
        F.collect_list("__pos").alias("__positions"),
    )
    covered = (
        per_gram.filter(F.col("__g").isNotNull() & (F.col("__c") >= 2))
        .select(
            id_col,
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("__positions"),
                        lambda p: F.sequence(p, p + F.lit(dup_n - 1)),
                    )
                )
            ).alias("__cov"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("__cov").alias("__cov_n"))
    )

    out = (
        top_stats.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            F.col("__n").cast("long").alias("n_tokens"),
            F.round(
                F.when(
                    F.col("__tot") > 0, F.col("__top_c") / F.col("__tot")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(f"top_{top_n}gram_frac"),
            F.round(
                F.when(
                    F.col("__n") > 0,
                    F.coalesce(F.col("__cov_n"), F.lit(0)) / F.col("__n"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias(f"dup_{dup_n}gram_frac"),
        )
    )
    return out


def passages(
    docs: DataFrame,
    span: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode documents into non-overlapping ``span``-token passages:
    (id, passage_idx, passage, passage_md5). The md5 is the dedup /
    shuffle key — passage text never needs to leave its scan partition
    when a caller only wants the dedup decision."""
    toks = tokenize(F.col(text_col))
    n_passages = F.ceil(F.size(toks) / F.lit(span)).cast("int")
    # sequence(0, -1) would DESCEND; token-less documents have no
    # passages, so they vanish from the exploded output by design.
    passage_arr = F.when(
        n_passages > 0,
        F.transform(
            F.sequence(F.lit(0), n_passages - 1),
            lambda i: F.array_join(F.slice(toks, i * span + 1, span), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col),
        F.posexplode(passage_arr).alias("passage_idx", "passage"),
    ).withColumn("passage_md5", F.md5(F.col("passage")))


def passage_dedup(
    docs: DataFrame,
    span: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide passage-level exact dedup summary.

    Keeps the FIRST occurrence of each distinct passage — ordered by
    (doc_id, passage_idx), the deterministic corpus order — and reports
    per document: total passages, kept passages, and the kept fraction.
    A downstream cleaner drops or rewrites documents below a kept-
    fraction threshold; :func:`passages` exposes the row-level kept
    flag for the rewrite path.

    The first-occurrence window partitions by passage md5 (uniform
    16-byte keys, balanced shuffle); per-key state is the occurrence
    list of ONE passage, bounded by its corpus frequency — and the
    frequency-heavy keys are exactly the ones the operator exists to
    collapse.
    """
    p = passages(docs, span, text_col, id_col)
    w = Window.partitionBy("passage_md5").orderBy(
        F.col(id_col).asc(), F.col("passage_idx").asc()
    )
    flagged = p.withColumn("__rn", F.row_number().over(w))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_passages"),
        F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.round(
            F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("kept_frac"),
    )
