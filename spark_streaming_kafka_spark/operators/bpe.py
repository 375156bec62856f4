"""Distributed BPE merge learning — tokenizer training as a Spark job.

Classic byte-pair encoding (Sennrich et al. 2016): start from
characters, repeatedly merge the most frequent adjacent symbol pair.
The distributed insight is that after ONE corpus pass, everything
operates on the WORD-FREQUENCY table — vocabulary-sized, not
corpus-sized — so a 100 TB corpus pays one scan + k vocabulary-sized
iterations:

1. corpus scan → (word, freq) hash aggregate (the only fact-sized job);
2. per iteration: adjacent-pair counts via explode + partial-agg SUM
   weighted by word freq (vocab-sized shuffle), the arg-max pair via
   TakeOrderedAndProject (ONE row to the driver — the per-iteration
   driver transfer is the merge decision itself, ~bytes), then a
   vocab-sized Arrow pass applying the merge greedily left-to-right.

Lineage is truncated per round (persist + unpersist of the superseded
vocab) exactly like the connected-components loop — without it the
plan doubles per merge and the driver dies re-optimizing it.

Determinism: ties on pair count break to the lexicographically
smallest pair, so the merge sequence is reproducible anywhere — the
pytest oracle is a plain-Python BPE on the same corpus.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-sized job."""
    return (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _to_symbols(vocab: DataFrame) -> DataFrame:
    """word → initial symbol sequence: characters + '</w>' end marker
    (the marker keeps merges from crossing word boundaries when the
    learned merges are later applied to running text)."""
    return vocab.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit("</w>"))
        ).alias("syms"),
    )


def _pair_counts(symdf: DataFrame, num_partitions: int | None = None) -> DataFrame:
    pairs = symdf.select(
        "freq",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i + 1).alias("a"),
                        F.element_at(F.col("syms"), i + 2).alias("b"),
                    ),
                ),
            ).otherwise(F.expr("array()").cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    flat = pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
    if num_partitions is not None:
        # Per-PLAN partition control: an explicit hash repartition on the
        # grouping keys with the loop's partition count. The aggregate's
        # ClusteredDistribution(a, b) is then already satisfied, so
        # EnsureRequirements elides the conf-sized exchange — the loop
        # never touches (or depends on) spark.sql.shuffle.partitions,
        # and concurrent jobs in the same session are unaffected.
        #
        # Known tradeoff: with the exchange below the aggregate, BOTH
        # partial and final aggregation run post-shuffle, so the shuffle
        # carries raw exploded pair rows instead of map-side combines.
        # That stream is VOCABULARY-sized (one row per adjacent symbol
        # pair per DISTINCT word — Σ|word| over the vocab, never corpus
        # tokens), so the inflation is a bounded constant factor; an
        # Arrow mapInPandas pre-combine that restores map-side combining
        # measured SLOWER end-to-end (6.63 s vs 5.42 s for 10 merges at
        # sf0.01 — the Python round-trip costs more than the combine
        # saves on vocab-sized data), so the JVM-only plan is kept.
        flat = flat.repartition(num_partitions, "a", "b")
    return flat.groupBy("a", "b").agg(F.sum("freq").alias("c"))


def _apply_merge(symdf: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (a, b) → a+b in every
    symbol sequence — a pure-JVM higher-order fold over the symbol
    array (r11: was a ``mapInPandas`` pass, which cost one ~0.2 s
    Python-worker round trip PER MERGE ROUND — the training loop runs
    one of these per learned merge, so the Python toll, not the vocab
    volume, dominated the job floor). The fold walks indices with a
    one-element lookahead and a ``skip`` flag, reproducing the greedy
    left-to-right semantics exactly; words shorter than 2 symbols pass
    through untouched.

    Bound: the fold's ``array_append`` copies the accumulator per
    element, so the pass is O(|word|²) per word — fine for
    natural-language tokens (tens of symbols), degrading only on
    pathological unsegmented tokens (megabyte URLs/hashes), which a
    production vocab pass should length-cap upstream."""
    merged = a + b
    syms = F.col("syms")

    def step(s, i):
        cur = F.element_at(syms, i.cast("int"))
        # F.get is 0-based and returns NULL out of bounds, so the
        # lookahead at i == size(syms) is safe by construction — not by
        # And short-circuit order, which ANSI-mode element_at(i+1)
        # relied on (r11 advisor finding: fragile against expression
        # reordering/CSE). NULL == b is NULL, and when() treats a NULL
        # condition as false — same branch as before.
        nxt = F.get(syms, i.cast("int"))
        is_pair = (
            (i < F.size(syms)) & (cur == F.lit(a)) & (nxt == F.lit(b))
        )
        return (
            F.when(
                s.skip,
                F.struct(s.acc.alias("acc"), F.lit(False).alias("skip")),
            )
            .when(
                is_pair,
                F.struct(
                    F.array_append(s.acc, F.lit(merged)).alias("acc"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.array_append(s.acc, cur).alias("acc"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    folded = F.aggregate(
        F.sequence(F.lit(1), F.size(syms)),
        F.struct(
            F.array().cast("array<string>").alias("acc"),
            F.lit(False).alias("skip"),
        ),
        step,
        lambda s: s.acc,
    )
    out = F.when(F.size(syms) < 2, syms).otherwise(folded)
    return symdf.select("freq", out.alias("syms"))


def learn_bpe_merges(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    learned order. Stops early when no adjacent pair repeats.

    The loop's shuffles are sized from the MEASURED vocab row count
    (same discipline as the connected-components loop): under an
    untuned session (200 shuffle partitions) each vocabulary-sized
    iteration otherwise runs 200-task stages and the loop is pure
    scheduling overhead — measured 6× slower at sf0.01. Partition
    control is per-PLAN (explicit hash repartition on the grouping keys
    inside :func:`_pair_counts`), never a mutation of the shared
    ``spark.sql.shuffle.partitions`` — concurrent jobs in the same
    session see no conf change and two overlapping trainings cannot
    race on a restore. The returned merges are plain Python."""
    spark = docs.sparkSession
    vocab = word_frequencies(docs, text_col).persist()
    n_words = vocab.count()
    parallelism = spark.sparkContext.defaultParallelism
    loop_parts = max(2, min(parallelism, n_words // 20_000 + 2))
    symdf = _to_symbols(vocab).coalesce(loop_parts).persist()
    merges: list[tuple[str, str]] = []
    # ONE job per merge round (r7): the previous round's Arrow merge
    # apply is left LAZY (persist marked, not materialized) and runs
    # inside this round's pair-count job, which fills its cache as a
    # side effect — the old eager `new_symdf.count()` doubled the job
    # count, and at vocab scale each round is pure scheduling floor
    # (measured: 12 merges at sf0.1 went 12.1 s → one-job rounds).
    # The parent stays cached until the child materializes, so a
    # recomputation chain is at most one merge deep.
    prev: DataFrame | None = None
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(symdf, num_partitions=loop_parts)
                .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            # that job materialized symdf's cache; its parent can go
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top or top[0]["c"] < 2:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            new_symdf = _apply_merge(symdf, a, b).persist()
            prev, symdf = symdf, new_symdf
    finally:
        symdf.unpersist()
        if prev is not None:
            prev.unpersist()
        vocab.unpersist()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode text with learned merges: each word starts as characters
    + '</w>' and repeatedly applies the LOWEST-RANK applicable merge
    (standard BPE encode order — merge rank, not position, decides) —
    exactly the greedy fixpoint the training loop's symbol table
    reaches, so encoding the training corpus reproduces training's
    final state (asserted in tests).

    The merge table (the trained tokenizer) ships in the task closure
    like any model — KB-sized for real vocabularies. One Arrow pass,
    zero shuffle; per-word results are memoized per batch (Zipf makes
    the word-level cache hit rate ~the corpus's type/token ratio).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + ["</w>"]
        while len(syms) >= 2:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def encode(batches):
        cache: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").split(" "):
                    if w:
                        toks.extend(encode_word(w, cache))
                out.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType(
        docs.schema.fields + [StructField(out_col, ArrayType(StringType()))]
    )
    return docs.mapInPandas(encode, schema=schema)


def vocab_coverage(
    docs: DataFrame,
    cutoffs: list[int],
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage curve: for each candidate vocab size V in
    ``cutoffs``, the fraction of corpus TOKEN OCCURRENCES covered by
    the V most frequent words — (v_cutoff, covered_tokens,
    total_tokens, coverage). The tokenizer-design dial: where the
    curve flattens is where adding vocab buys nothing and BPE subword
    splitting should take over (the standard coverage/OOV analysis
    run before fixing a vocab size).

    Scale shape: ONE corpus scan into the (word, freq) hash aggregate
    (:func:`word_frequencies`, map-side combined), then the top
    ``max(cutoffs)`` words via ``orderBy().limit()`` — Spark plans
    TakeOrderedAndProject, per-partition heaps, no global sort over
    the vocabulary. The grand total rides a TAGGED UNION row into the
    cutoff table (the 1×1-crossJoin-free pattern ``ndcg_at_k``
    established; a constant-key join would constant-fold to the
    cartesian the suite-wide plan audit rejects), so the only
    unpartitioned window runs over ``max(cutoffs)+1`` rows — bounded
    by construction. Ranking ties break (freq desc, word asc), the
    usual total-order rule.
    """
    from pyspark.sql import Window

    if not cutoffs or any(c <= 0 for c in cutoffs):
        raise ValueError("cutoffs must be positive vocab sizes")
    vmax = max(cutoffs)
    wf = word_frequencies(docs, text_col)
    top = (
        wf.orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(vmax)
        .select(F.lit(0).alias("__tag"), "word", "freq")
    )
    total = wf.agg(F.sum("freq").alias("freq")).select(
        F.lit(1).alias("__tag"), F.lit(None).cast("string").alias("word"), "freq"
    )
    w_all = Window.partitionBy()  # vmax + 1 rows by construction
    ranked = (
        top.unionByName(total)
        .select(
            "__tag",
            "freq",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("__tag").asc(), F.col("freq").desc(), F.col("word").asc()
                )
            )
            .alias("__rank"),
            F.max(F.when(F.col("__tag") == 1, F.col("freq")))
            .over(w_all)
            .alias("total_tokens"),
        )
        .filter(F.col("__tag") == 0)
    )
    cum = ranked.select(
        "__rank",
        "total_tokens",
        F.sum("freq")
        .over(
            Window.partitionBy()
            .orderBy("__rank")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("__cum"),
    )
    # Rank r contributes to every cutoff >= r, expressed as an explode
    # of a FILTERED LITERAL ARRAY — a theta join against a cutoff table
    # would plan as the BroadcastNestedLoopJoin the suite-wide plan
    # audit rejects. max(__cum) per cutoff = the cumulative count at
    # rank min(cutoff, |vocab|), so cutoffs beyond the vocab end report
    # full coverage rather than dropping out.
    cuts_arr = F.array(*[F.lit(int(c)) for c in sorted(set(cutoffs))])
    assigned = cum.select(
        "__cum",
        "total_tokens",
        F.explode(
            F.filter(cuts_arr, lambda c: c >= F.col("__rank"))
        ).alias("v_cutoff"),
    )
    return (
        assigned.groupBy("v_cutoff")
        .agg(
            F.max("__cum").alias("covered_tokens"),
            F.max("total_tokens").alias("total_tokens"),
        )
        .select(
            "v_cutoff",
            "covered_tokens",
            "total_tokens",
            F.round(
                F.col("covered_tokens").cast("double") / F.col("total_tokens"), 6
            ).alias("coverage"),
        )
    )
