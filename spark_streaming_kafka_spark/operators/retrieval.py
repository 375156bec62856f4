"""Corpus-retrieval analytics: BM25 ranking and PMI collocation mining.

The two IR statistics a training-data pipeline runs on top of its
inverted index (operators/curation.py::inverted_index):

- :func:`bm25_topk` — Okapi BM25 top-k document ranking for a fixed
  query-term set. The workhorse behind "which documents should seed
  this domain mixture" and targeted-decontamination lookups that need
  *ranked* matches, not just posting lists.
- :func:`pmi_collocations` — pointwise-mutual-information collocation
  mining over consecutive-token bigrams: the standard corpus-analysis
  pass for multi-word-expression discovery (tokenizer-merge
  candidates, boilerplate phrase detection).

Both are deterministic (unique tiebreakers, no RNG) so each has a
value-exact DuckDB oracle in queries.py. Shapes at scale:

- BM25 filters the exploded token stream to the query terms BEFORE any
  shuffle, so the aggregation shuffle is bounded by the matching
  postings, never the corpus; document length rides the explode as a
  per-row constant (no separate doclen join); the term-level df/idf
  table is |terms|-sized and broadcast; corpus-level scalars (N,
  avgdl) are ONE bounded two-value collect.
- PMI's bigram extraction is per-row array algebra; both count tables
  are vocabulary-bounded hash aggregations with map-side combine (the
  corpus text itself shuffles nowhere), and the unigram side is
  broadcast into the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokenize, word_shingles
from .relational import top_k

__all__ = ["bm25_topk", "pmi_collocations", "rrf_fuse", "ndcg_at_k"]


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k ranking of ``docs`` for ``query_terms``.

    Output: (doc_id, n_terms_hit, bm25) — the ``k`` highest-scoring
    documents, score summed over the query terms with the
    Lucene-variant idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive, so stopword-heavy queries can't produce negative
    contributions). Deterministic: ties broken by ascending doc id.

    Plan: one corpus scan computes tokens + document length, explodes,
    and filters to the query terms BEFORE the (doc, term) count
    shuffle — the shuffle carries only matching postings. df per term
    is an aggregation OF that bounded table; N and avgdl are one
    two-scalar collect (bounded by design, like the other corpus-level
    constants in this package). The per-term idf join is broadcast
    (|terms| rows).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokenize(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.size(toks).cast("double").alias("__dl"),
    )
    # Corpus constants: N docs and average document length. Two scalars,
    # one job — bounded collect, never row data.
    n_docs, avgdl = base.agg(
        F.count(F.lit(1)), F.avg("__dl")
    ).first()
    if not n_docs:
        raise ValueError("empty corpus")
    if not avgdl:
        raise ValueError("corpus has no tokens (avgdl = 0)")
    term_arr = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        base.select(
            "doc_id", "__dl", F.explode("__toks").alias("term")
        )
        .filter(F.array_contains(term_arr, F.col("term")))
        .groupBy("doc_id", "term", "__dl")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = df_tbl.select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(float(avgdl))
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (F.col("tf") + norm)
            ).alias("__s"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            F.round(F.sum("__s"), 6).alias("bm25"),
        )
    )
    return top_k(
        scored, [F.col("bm25").desc(), F.col("doc_id").asc()], k
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-k consecutive-token collocations by pointwise mutual
    information: ``pmi = log2(p(ab) / (p(a) p(b)))`` with token-level
    probabilities (an LM statistic sees every occurrence, not document
    frequency — same convention as the bigram LM in functions/text.py).

    Output: (left_word, right_word, pair_count, pmi) for the ``k``
    highest-PMI pairs with ``pair_count >= min_count`` (the standard
    noise floor: a hapax pair has spuriously maximal PMI).
    Deterministic: ties broken by (left_word, right_word) ascending.

    Plan: bigram extraction is per-row array algebra over ONE corpus
    scan; the pair counts are one vocab²-bounded hash aggregation with
    map-side combine; unigram counts aggregate the same exploded
    stream and are broadcast into the join (vocab-bounded); the two
    corpus totals are one bounded two-scalar collect. The corpus text
    shuffles nowhere.
    """
    bg = docs.select(
        F.explode(
            word_shingles(F.col(text_col), 2, distinct=False)
        ).alias("bg")
    ).select(
        F.split(F.col("bg"), " ").getItem(0).alias("left_word"),
        F.split(F.col("bg"), " ").getItem(1).alias("right_word"),
    )
    pair_counts = bg.groupBy("left_word", "right_word").agg(
        F.count(F.lit(1)).alias("c_ab")
    )
    uni = (
        docs.select(
            F.explode(tokenize(F.col(text_col))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    # Corpus totals: token count and bigram count. Derived from the two
    # (already vocabulary-bounded) count tables, one two-scalar job.
    totals = uni.agg(F.sum("c_w")).crossJoin(
        pair_counts.agg(F.sum("c_ab"))
    )
    raw_tokens, raw_bigrams = totals.first()
    if not raw_bigrams:
        raise ValueError("no bigrams: every document has < 2 tokens")
    n_tokens, n_bigrams = float(raw_tokens), float(raw_bigrams)
    left = uni.select(
        F.col("w").alias("left_word"), F.col("c_w").alias("c_a")
    )
    right = uni.select(
        F.col("w").alias("right_word"), F.col("c_w").alias("c_b")
    )
    scored = (
        pair_counts.filter(F.col("c_ab") >= min_count)
        .join(F.broadcast(left), "left_word")
        .join(F.broadcast(right), "right_word")
        .select(
            "left_word",
            "right_word",
            F.col("c_ab").cast("long").alias("pair_count"),
            F.round(
                F.log2(
                    (F.col("c_ab") / F.lit(n_bigrams))
                    / (
                        (F.col("c_a") / F.lit(n_tokens))
                        * (F.col("c_b") / F.lit(n_tokens))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return top_k(
        scored,
        [
            F.col("pmi").desc(),
            F.col("left_word").asc(),
            F.col("right_word").asc(),
        ],
        k,
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 20,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists:
    ``score(d) = Σ_lists 1 / (c + rank_list(d))`` — the standard
    score-free hybrid-search combiner (Cormack et al.'s RRF; ``c = 60``
    is the canonical damping constant), used to merge a lexical BM25
    ranking with a vector-similarity ranking without calibrating their
    incomparable score scales.

    Each input needs (``id_col``, ``rank_col``) with rank 1-based;
    items absent from a list simply contribute nothing (no imputation).
    Output: (id, n_sources, rrf_score) — the ``k`` best, ties broken by
    ascending id.

    Plan: the inputs are top-k lists — already bounded — so the fusion
    is a union + one tiny hash aggregation + TakeOrderedAndProject;
    nothing here touches the corpus. Determinism: 1/(c+rank) over
    identical integer ranks is bit-identical on any engine, and the
    two-term sum is order-insensitive (IEEE addition is commutative).
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    parts = [
        r.select(
            F.col(id_col), F.col(rank_col).cast("long").alias("__rank")
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum(F.lit(1.0) / (F.lit(float(c)) + F.col("__rank"))).alias(
            "__s"
        ),
    )
    top = top_k(
        scored, [F.col("__s").desc(), F.col(id_col).asc()], k
    )
    return top.select(
        id_col, "n_sources", F.round("__s", 9).alias("rrf_score")
    )


def ndcg_at_k(
    ranked: DataFrame,
    rels: DataFrame,
    order: list,
    k: int = 10,
    id_col: str = "doc_id",
    rel_col: str = "rel",
) -> DataFrame:
    """Normalized discounted cumulative gain of a ranking — the eval
    layer for the retrieval stack (Järvelin & Kekäläinen 2002):

        nDCG@k = DCG@k / IDCG@k,   DCG = Σ_pos (2^rel − 1) / log2(pos+1)

    ``ranked`` is a candidate list (already top-cut, e.g. bm25_topk's
    output — the single-partition rank window below is CANDIDATE-
    bounded, never corpus-bounded); ``rels`` maps ``id_col`` to graded
    relevance. The ideal ranking is a TakeOrderedAndProject over
    ``rels`` — no full sort. Output: one row (k, dcg, idcg, ndcg).

    Determinism: pass a total ``order`` (score + unique id); gains sum
    ≤ k double terms so the round(6) is stable under any reduction
    order.
    """
    from pyspark.sql import Window

    gain = lambda rel, rank: (F.pow(F.lit(2.0), rel) - F.lit(1.0)) / F.log2(  # noqa: E731
        rank.cast("double") + F.lit(1.0)
    )
    w = Window.orderBy(*order)
    top = (
        ranked.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .select(id_col, "__rank")
    )
    got = top.join(rels, id_col, "left").select(
        gain(F.coalesce(F.col(rel_col), F.lit(0)).cast("double"), F.col("__rank")).alias("g"),
        F.lit(True).alias("__actual"),
    )
    ideal_order = [F.col(rel_col).desc(), F.col(id_col).asc()]
    ideal = top_k(rels.filter(F.col(rel_col) > 0), ideal_order, k)
    iw = Window.orderBy(*ideal_order)
    ideal_g = (
        ideal.withColumn("__rank", F.row_number().over(iw))
        .select(
            gain(F.col(rel_col).cast("double"), F.col("__rank")).alias("g"),
            F.lit(False).alias("__actual"),
        )
    )
    # One tagged union + conditional aggregation instead of a 1x1
    # crossJoin: keeps the suite-wide plan audit free of
    # CartesianProduct/BNLJ nodes and collapses the combine to a
    # single job over <= 2k rows.
    return (
        got.unionByName(ideal_g)
        .agg(
            F.sum(F.when(F.col("__actual"), F.col("g"))).alias("__dcg"),
            F.sum(F.when(~F.col("__actual"), F.col("g"))).alias("__idcg"),
        )
        .select(
            F.lit(k).cast("long").alias("k"),
            F.round(F.col("__dcg"), 6).alias("dcg"),
            F.round(F.col("__idcg"), 6).alias("idcg"),
            F.round(F.col("__dcg") / F.col("__idcg"), 6).alias("ndcg"),
        )
    )


def basket_pairs_lift(
    facts: DataFrame,
    basket_col: str,
    item_col: str,
    top_items: int = 50,
) -> DataFrame:
    """Association mining: co-occurrence support and lift for item
    pairs sharing a basket — (item_a, item_b, n_ab, support, lift)
    with ``lift = P(a,b) / (P(a)·P(b))`` over basket incidence, the
    classic market-basket measure of "together more than chance"
    (lift > 1 ⟹ affinity; < 1 ⟹ substitution). The co-occurrence
    family member PMI covers for adjacent TOKENS, generalized to any
    (basket, item) incidence: users×behaviors, orders×products,
    documents×entities.

    ``top_items`` caps the item universe to the most basket-frequent
    items first (ties break item-asc) — the standard frequent-itemset
    discipline: pair volume is bounded at C(top_items, 2) BY
    CONSTRUCTION, never |items|². Scale shape: one distinct over
    (basket, item), a TakeOrderedAndProject for the top items, a
    broadcast left-semi to keep only their incidences, then the
    ``_bucket_pairs`` array expansion per basket (one hash aggregate,
    no self-join — the same pair generator the LSH path uses). The
    basket total rides a tagged union row into the pair table, so the
    only unpartitioned window is over ≤ C(top_items,2)+1 rows.
    """
    from pyspark.sql import Window

    from .dedup import _bucket_pairs

    b = facts.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    top = (
        b.groupBy("__item")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__item").asc())
        .limit(top_items)
    )
    kept = b.join(F.broadcast(top.select("__item")), "__item", "left_semi")
    pc = (
        _bucket_pairs(kept.select("__basket", "__item"), ["__basket"], "__item")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .select(F.lit(0).alias("__tag"), "id_a", "id_b", "n_ab")
    )
    nb = b.agg(F.countDistinct("__basket").alias("n_ab")).select(
        F.lit(1).alias("__tag"),
        F.lit(None).cast(pc.schema["id_a"].dataType).alias("id_a"),
        F.lit(None).cast(pc.schema["id_b"].dataType).alias("id_b"),
        "n_ab",
    )
    w_all = Window.partitionBy()  # <= C(top_items, 2) + 1 rows
    with_n = (
        pc.unionByName(nb)
        .withColumn(
            "__nb", F.max(F.when(F.col("__tag") == 1, F.col("n_ab"))).over(w_all)
        )
        .filter(F.col("__tag") == 0)
    )
    ca = top.select(F.col("__item").alias("id_a"), F.col("__c").alias("__ca"))
    cb = top.select(F.col("__item").alias("id_b"), F.col("__c").alias("__cb"))
    return (
        with_n.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .select(
            F.col("id_a").alias("item_a"),
            F.col("id_b").alias("item_b"),
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.col("__nb"), 6).alias(
                "support"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("__nb")
                / (F.col("__ca") * F.col("__cb")),
                6,
            ).alias("lift"),
        )
    )


def item_cooccurrence_topk(
    facts: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    max_basket_size: int = 64,
) -> DataFrame:
    """Item-item collaborative filtering neighbors: for every item, the
    top-``k`` co-purchased items ranked by lift — the "customers who
    bought X also bought Y" table, built from basket co-occurrence.

    Complements :func:`basket_pairs_lift`: that caps the ITEM UNIVERSE
    to the globally frequent head (association-rule mining over a few
    items), this keeps every item and instead caps the BASKET size —
    the right bound for recommendations, where pair volume is
    Σ C(|basket|, 2) and a handful of pathological mega-baskets (a
    crawler account, a test order) would otherwise dominate the
    expansion. Baskets above ``max_basket_size`` are dropped whole
    (log-and-drop is the caller's job; retail baskets are tiny).

    Scale shape: distinct incidence → ONE basket-level aggregation
    (collect sorted item arrays; the size gate is a filter on the
    arrays), materialized once via a lazy localCheckpoint shared by
    all three consumers → the ``_bucket_pairs``-style array expansion
    (one explode, never a self-join) → symmetrize → per-item counts
    (explode of the same arrays) equi-joined on the item key → lift →
    per-item top-k window. The basket total is a plain count of the
    checkpointed bucket rows, collected at plan-BUILD time (so
    building this DataFrame runs one Spark job, and the lift constant
    reflects the data as of build — the documented bm25
    corpus-constant trade).
    Lift is one division of exact longs; ranking ties break by
    (n_ab desc, neighbor asc), so the result is engine-independent.
    """
    from pyspark.sql import Window

    b = facts.select(
        F.col(basket_col).alias("__basket"), F.col(item_col).alias("__item")
    ).distinct()
    # ONE basket-level aggregation carries the whole pipeline (r11 —
    # was: a size pre-aggregation + semi-join back onto the incidence
    # rows, i.e. two extra exchanges and a duplicated distinct lineage,
    # plus a separate countDistinct job for the basket total). The
    # basket-size gate is a size(__ids) filter on the collected arrays
    # (identical rows: baskets outside 2..max are dropped whole), the
    # basket total is a plain count of the checkpointed bucket rows
    # (one row per kept basket), and per-item counts explode the same
    # arrays. The lazy localCheckpoint materializes once at the nb job
    # below and serves the returned plan's branches from its blocks;
    # the ContextCleaner frees them with the DataFrame (the r9 ADVICE
    # fix) — plain exchange reuse was measured NOT to fire across
    # these branches.
    # r12 memory bound (the r11-advice mega-basket hole): truncate each
    # basket to max+1 rows with a ranking window BEFORE the collect, so
    # one pathological hot basket (a crawler account with millions of
    # items) never materializes its full array in a single aggregation
    # buffer. Exact: in-cap baskets keep every row; an over-cap basket
    # keeps max+1 sentinels — enough for the size filter below to drop
    # it whole, exactly as before. Window and groupBy share the one
    # __basket exchange.
    w_cap = Window.partitionBy("__basket").orderBy(F.col("__item").asc())
    capped = (
        b.withColumn("__rn", F.row_number().over(w_cap))
        .filter(F.col("__rn") <= max_basket_size + 1)
        .drop("__rn")
    )
    buckets = (
        capped.groupBy("__basket")
        .agg(F.sort_array(F.collect_list("__item")).alias("__ids"))
        .filter(
            (F.size("__ids") >= 2) & (F.size("__ids") <= max_basket_size)
        )
        .localCheckpoint(eager=False)
    )
    # Basket total: one bounded single-scalar collect at plan-build
    # time (NOTE: building this DataFrame therefore runs one Spark job,
    # and the lift constant reflects the data as of build — the
    # documented bm25 corpus-constant trade; re-call the function after
    # data changes). A lazy constant-key join was tried and rejected:
    # any compile-time-constant key folds to a trivially-true condition
    # and plans the BroadcastNestedLoopJoin the suite audit bans.
    nb = buckets.count()  # also materializes the checkpoint

    # The pair expansion is _bucket_pairs' array algebra applied to the
    # already-built buckets (one explode, never a self-join); the
    # explicit round-robin repartition pins the expansion width AQE
    # would otherwise coalesce away on byte count.
    width = facts.sparkSession.sparkContext.defaultParallelism
    pairs = (
        buckets.repartition(width)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(__ids, (x, i) -> "
                    "transform(slice(__ids, i + 2, size(__ids)), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("__p")
        )
        .select("__p.id_a", "__p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    counts = (
        buckets.select(F.explode("__ids").alias("__item"))
        .groupBy("__item")
        .agg(F.count(F.lit(1)).alias("__c"))
    )

    # Count joins run on the HALF-SIZE unordered pair table; lift is
    # symmetric, so symmetrization happens AFTER scoring by exploding a
    # 2-struct array — one evaluation of the pair aggregate (a
    # unionByName would re-run the subtree per branch) and half the
    # join volume.
    scored_pairs = (
        pairs.join(
            counts.select(
                F.col("__item").alias("id_a"), F.col("__c").alias("__ca")
            ),
            "id_a",
        )
        .join(
            counts.select(
                F.col("__item").alias("id_b"), F.col("__c").alias("__cb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_ab",
            F.round(
                F.col("n_ab") * F.lit(nb) / (F.col("__ca") * F.col("__cb")),
                6,
            ).alias("lift"),
        )
    )
    scored = scored_pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("item"),
                    F.col("id_b").alias("neighbor"),
                    F.col("n_ab"),
                    F.col("lift"),
                ),
                F.struct(
                    F.col("id_b").alias("item"),
                    F.col("id_a").alias("neighbor"),
                    F.col("n_ab"),
                    F.col("lift"),
                ),
            )
        ).alias("__e")
    ).select("__e.item", "__e.neighbor", "__e.n_ab", "__e.lift")
    w = Window.partitionBy("item").orderBy(
        F.col("lift").desc(), F.col("n_ab").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
