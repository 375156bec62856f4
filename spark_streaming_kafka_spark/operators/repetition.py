"""Repetition-based quality filters, passage-level exact dedup, and
suffix-array-style repeated-substring dedup (detect + repair).

Corpus-curation operators the reference lacks but a 100 TB
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
- :func:`repeated_substring_spans` / :func:`substring_dedup_rewrite`
  — the UNALIGNED-duplicate repair passage dedup cannot do: the
  distributed k-gram-island formulation of suffix-array exact
  substring dedup (Lee et al. 2022), reporting maximal duplicated
  token spans per document and rewriting the text with every
  duplicated region cut out.

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


def _dup_shingle_hits(
    docs: DataFrame,
    k: int,
    min_occurrences: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, pos, h) rows for every ``k``-gram shingle position whose
    hash occurs ≥ min_occurrences times corpus-wide — the shared
    detection stage of :func:`repeated_substring_spans` (report) and
    :func:`substring_dedup_rewrite` (repair). Shingle hashes are
    computed IN-ROW (sequence + slice column algebra) so only (id,
    pos, 16-byte md5) ever explodes or shuffles."""
    toks = tokenize(F.col(text_col))
    n_sh = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, k))),
    )
    pos = docs.select(
        F.col(id_col),
        F.posexplode(
            F.when(n_sh > 0, shingles).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "h"),
    )
    dup = (
        pos.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_occurrences)
        .select("h")
    )
    return pos.join(dup, "h", "left_semi")


def repeated_substring_spans(
    docs: DataFrame,
    k: int = 10,
    min_occurrences: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact repeated-substring spans, the distributed formulation of
    suffix-array training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find, per document,
    every maximal token span covered by ``k``-gram shingles that occur
    ≥ ``min_occurrences`` times corpus-wide (within- or cross-document).
    A cleaner cuts those spans out of the training text — the repair
    fixed-window passage dedup cannot do for UNALIGNED duplicates.

    Output: (id, span_start, span_end, n_shingles) with 0-based
    inclusive token indices.

    Pipeline (every step linear in corpus tokens):

    1. slide a ``k``-token shingle over each document IN-ROW (column
       algebra: sequence + slice, no explode until the hash is taken),
       emitting (id, pos, md5(shingle)) — 16-byte keys, never text;
    2. corpus-wide occurrence counts by shingle hash (partial-agg hash
       aggregate; uniform md5 keyspace ⇒ balanced shuffle) keep hashes
       with count ≥ min_occurrences;
    3. semi-join positions against the duplicated-hash set (shuffle on
       the hash — both sides are (id, pos, hash)-narrow);
    4. merge hit positions into maximal spans per document with the
       gaps-and-islands window: a new span starts when the previous
       duplicated shingle's token range [prev, prev+k-1] neither
       overlaps nor touches this one's (gap > k). Per-doc window state
       is the doc's hit list — bounded by its token count.

    The construction is pure relational algebra, so the DuckDB oracle
    runs the IDENTICAL query (same tokenizer, same md5 keys, same
    island rule) and the hash check pins every span boundary.
    """
    hits = _dup_shingle_hits(docs, k, min_occurrences, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos", 1).over(w) <= k, F.lit(0)
    ).otherwise(F.lit(1))  # lag NULL (first hit) -> otherwise branch = 1
    spans = hits.withColumn("__brk", brk).withColumn(
        "__span", F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        spans.groupBy(id_col, "__span")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
        )
        .drop("__span")
    )


def substring_dedup_rewrite(
    docs: DataFrame,
    k: int = 10,
    min_occurrences: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The REPAIR step for :func:`repeated_substring_spans`: rewrite
    each document with every duplicated-substring token cut out,
    returning (id, clean_text, n_tokens, n_cut).

    Semantics: EVERY occurrence of a duplicated ``k``-gram region is
    removed (not all-but-one) — the conservative, partition-invariant
    choice: electing a canonical survivor would need a corpus-global
    occurrence order, and training pipelines that cut aggressively
    (boilerplate, licenses, navigation text repeats) want all copies
    gone anyway. Documents with NULL text pass through as NULL.

    Plan shape: the detection stage is shared column algebra
    (:func:`_dup_shingle_hits`); covered token indices aggregate to ONE
    array row per affected document (bounded by that doc's token
    count), join back LEFT so untouched documents flow through without
    a rewrite, and the cut itself is in-row hash-based position
    subtraction (array_except — linear in tokens + covered, never the
    per-token containment scan that goes quadratic on heavily-
    duplicated long documents) — bodies shuffle ONCE (the join-back on
    id), never by shingle.
    """
    hits = _dup_shingle_hits(docs, k, min_occurrences, text_col, id_col)
    cover = (
        hits.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos").cast("long"), F.col("pos").cast("long") + (k - 1))
            ).alias("idx"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.collect_set("idx").alias("__covered"))
    )
    out = docs.join(cover, id_col, "left")
    toks = tokenize(F.col(text_col))
    cov = F.coalesce(F.col("__covered"), F.array().cast("array<bigint>"))
    # Hash-based position subtraction — O(n_tokens + n_covered) per row
    # (array_except builds one hash set of the covered indices), where a
    # per-token array_contains scan would be O(n_tokens × n_covered):
    # quadratic exactly on the heavily-duplicated long documents this
    # operator targets. array_except preserves first-array order, so
    # the kept indices stay ascending and token order survives.
    # sequence(0, -1) would DESCEND (same trap as passages()); guard the
    # token-less case to an empty index list explicitly
    all_idx = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0).cast("long"), F.size(toks).cast("long") - 1),
    ).otherwise(F.array().cast("array<bigint>"))
    kept_idx = F.array_except(all_idx, cov)
    clean = F.array_join(
        F.transform(kept_idx, lambda i: F.element_at(toks, (i + 1).cast("int"))),
        " ",
    )
    return out.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(clean)
        .alias("clean_text"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(cov).cast("long").alias("n_cut"),
    )


def ngram_novelty(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty against everything INGESTED BEFORE
    it: (doc_id, n_grams, novel_grams, novelty), where a doc's gram is
    novel iff no smaller-id document contains it, and ``novelty`` is
    the novel fraction of its distinct k-grams.

    The curriculum/diversity dial deduplication doesn't give: exact
    dedup keeps one copy of an identical doc, near-dup dedup keeps one
    per cluster, but neither says how much NEW text the marginal
    document contributes — the metric dedup papers report as the novel
    n-gram rate, and the natural ordering score for "freshest first"
    sampling or for measuring a crawl snapshot's marginal value
    (compose with ``source`` to see which feeds have gone stale).

    Plan shape: one distinct-shingle explode (the same corpus-sized
    pass every dedup operator starts with), a gram-keyed min window to
    find each gram's first document, then a doc-keyed aggregate — two
    narrow shuffles, gram rows are (gram, doc_id) only, bodies never
    shuffle. A stop-gram's window group is big but carries id-pairs,
    not text (the same skew profile as the inverted-index operators).
    Docs with fewer than k tokens have no grams and produce no row
    (the MinHash no-shingles discipline).
    """
    from .dedup import doc_shingles

    grams = doc_shingles(docs, text_col, id_col, k)
    wg = Window.partitionBy("shingle")
    flagged = grams.withColumn("__first", F.min("doc_id").over(wg))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum((F.col("doc_id") == F.col("__first")).cast("long")).alias(
            "novel_grams"
        ),
    ).select(
        "doc_id",
        "n_grams",
        "novel_grams",
        F.round(F.col("novel_grams") / F.col("n_grams"), 6).alias("novelty"),
    )


def ngram_novelty_vs_manifest(
    new_docs: DataFrame,
    manifest: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental novelty: score a NEW batch's n-gram novelty against
    a PERSISTED gram manifest instead of re-reading history — the
    ingest-time form of :func:`ngram_novelty`, same incremental
    discipline as ``curation.manifest_dedup`` / MinHash signature
    manifests (history is touched as a manifest scan, never re-
    shingled). ``manifest`` is a ``(shingle)`` table — distinct grams
    of everything ingested so far, i.e. exactly
    ``dedup.doc_shingles(history).select("shingle").distinct()``.

    Semantics match the batch operator run over history ∪ batch: a
    gram is novel iff it is absent from the manifest AND this doc is
    the smallest-id batch member containing it (within-batch firsts
    count once, like any other first occurrence). So scoring ordered
    ingests batch-by-batch — appending each batch's grams to the
    manifest afterwards — reproduces :func:`ngram_novelty` on the
    concatenated corpus exactly (pinned by test).

    Scale shape: the batch is small by assumption — its distinct gram
    set BROADCASTS as the build side of a left-semi probe, so the
    manifest streams through its scan without shuffling (the manifest
    is the 100 TB side; one narrow column read, zero exchange). The
    batch-side window and aggregate run on batch-sized gram rows.
    After scoring, append the batch's distinct grams to the manifest —
    ingest N+1 stays as cheap as ingest N.
    """
    from .dedup import doc_shingles

    grams = doc_shingles(new_docs, text_col, id_col, k)
    batch_grams = grams.select("shingle").distinct()
    # manifest grams that occur in this batch: manifest scans ONCE
    # against a broadcast probe set — no manifest shuffle
    hits = (
        manifest.select("shingle")
        .join(F.broadcast(batch_grams), "shingle", "left_semi")
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    wg = Window.partitionBy("shingle")
    flagged = grams.join(F.broadcast(hits), "shingle", "left").withColumn(
        "__first", F.min("doc_id").over(wg)
    )
    novel = (F.col("__seen").isNull() & (F.col("doc_id") == F.col("__first"))).cast(
        "long"
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(novel).alias("novel_grams"),
    ).select(
        "doc_id",
        "n_grams",
        "novel_grams",
        F.round(F.col("novel_grams") / F.col("n_grams"), 6).alias("novelty"),
    )
