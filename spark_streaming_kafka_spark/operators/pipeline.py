"""The composed end-to-end corpus-curation pipeline — every stage the
package ships, run in sequence as ONE dataflow, the way a real
pretraining data pass uses them:

    exact dedup → MinHash near-dup clusters → SemDeDup semantic prune
    → benchmark decontamination → per-source quality calibration
    → temperature-mixture sampling → sequence packing
    → per-source attrition/packing report

The individual operators each carry their own DuckDB value oracle
(queries.py); this module is the evidence that their COMPOSITION is
correct too — :func:`curate_corpus` is registered as
``corpus_curation_e2e`` with an oracle that replays the identical
seven stages in SQL and pins the final per-source counts.

Scale shape (the 100 TB story):

- Document BODIES never shuffle. Every stage reduces the corpus scan
  to id-keyed facts (hashes, signatures, shingle counts, quality
  scores, token counts); inter-stage composition is id-only
  semi/anti-joins. In a production run the tiers additionally
  materialize survivors between passes (see
  ``streaming/manifest_dedup.py`` for the incremental form); inside
  one query the id-set joins express the same thing.
- Population-dependent stages come AFTER all drops: quality
  calibration (percent_rank within source) and mixture rates (from
  survivor token totals) are computed over id+source+score rows only.
- The final report is a |sources|-sized aggregate; nothing wide
  survives to the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_long
from ..functions.text import quality_score
from .curation import benchmark_contamination
from .dedup import dedup_clusters, exact_dedup
from .similarity import semdedup_prune

__all__ = ["curate_corpus", "curation_attrition", "curation_stages"]


def curate_corpus(
    docs: DataFrame,
    emb: DataFrame,
    benchmark: DataFrame | None = None,
    jaccard_threshold: float = 0.5,
    sem_threshold: float = 0.45,
    contamination_max: float = 0.8,
    calibration_min: float = 0.1,
    token_budget: int = 10000,
    alpha: float = 0.7,
    chunk_tokens: int = 256,
    shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Run the full curation pipeline and return the per-source report
    ``(source, kept_docs, kept_tokens, packed_seqs)`` — documents
    surviving all seven stages, their token volume, and how many packed
    training sequences they start or continue.

    Stage semantics (each delegating to the registered operator):

    1. *Exact dedup* — keep each byte-identical text's canonical
       (minimum-id) copy (:func:`..dedup.exact_dedup`).
    2. *Near-dup clusters* — MinHash-LSH candidates → exact-Jaccard
       verify → connected components over the exact-dedup survivors;
       keep only each cluster's minimum-id representative
       (:func:`..dedup.dedup_clusters`).
    3. *SemDeDup prune* — embedding-space within-cluster domination,
       decided CORPUS-WIDE (:func:`..similarity.semdedup_prune`). This
       is a deliberate convention, not a proven-sound composition: a
       doc's dominating lower-id mate may itself have been dropped by
       the text-dedup tiers without an embedding-close survivor
       standing in (exact/near TEXT duplicates need not be
       embedding-near). Deciding over the full corpus keeps the stage
       population-independent (and oracle-replayable); a stricter
       variant would recompute the prune over the stage-2 survivors'
       embedding subset.
    4. *Decontamination* — drop survivors whose 5-gram shingle overlap
       with the benchmark set reaches ``contamination_max``
       (benchmark members self-report 1.0 and are dropped too;
       :func:`..curation.benchmark_contamination`). Per-doc scores are
       population-independent, so scoring only the survivors equals
       scoring everything and intersecting.
    5. *Quality calibration* — within-source percent_rank of the
       rounded quality score over the SURVIVOR population; drop the
       bottom ``calibration_min`` quantile per source (the
       quality_calibrated_by_source semantics).
    6. *Temperature mixture* — tokens_s^alpha-weighted budget rates
       from SURVIVOR totals, deterministic per-doc hash gate
       (:func:`..curation.mixture_sample`).
    7. *Sequence packing* — hash-sharded concat-and-chunk every
       ``chunk_tokens`` tokens (the sequence_packing semantics);
       ``packed_seqs`` counts the distinct (shard, seq) chunks a
       source's documents START in.

    ``benchmark`` defaults to the ``doc_id % 97 == 0`` slice of the
    input (the registry convention for a stand-in eval set).
    """
    stages = curation_stages(
        docs, emb, benchmark, jaccard_threshold, sem_threshold,
        contamination_max, calibration_min, token_budget, alpha,
        text_col, id_col, source_col,
    )
    s6 = stages["s6"]

    # 7. pack and report
    t = s6.withColumn(
        "shard",
        md5_long(F.concat(F.lit("pack_"), F.col(id_col))) % shards,
    )
    w7 = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn(
        "cum_before", F.sum("n_tokens").over(w7) - F.col("n_tokens")
    ).withColumn("seq_id", F.expr(f"cum_before div {chunk_tokens}"))
    # composite-key multiplier 1e12: seq_id stays unique per shard up to
    # 2.56e14 tokens/shard (1e6 would collide at a mere 256M tokens —
    # trivially reached at the module's advertised scale)
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("kept_docs"),
        F.sum("n_tokens").cast("long").alias("kept_tokens"),
        F.countDistinct(
            F.col("shard") * F.lit(1_000_000_000_000) + F.col("seq_id")
        ).cast("long").alias("packed_seqs"),
    )


def curation_attrition(
    docs: DataFrame,
    emb: DataFrame,
    benchmark: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """Per-stage survivor counts for the curation pipeline — the
    attrition report every corpus run publishes: (stage int, name,
    docs). Stage frames are the exact :func:`curate_corpus` dataflow;
    each count is a count-only aggregate over the stage's id-keyed
    survivor set (no extra body scans beyond the pipeline's own).

    Accepts the full :func:`curate_corpus` kwarg set; the
    packing-only params (``chunk_tokens``, ``shards``) are ignored
    since the report stops before stage 7."""
    kwargs.pop("chunk_tokens", None)
    kwargs.pop("shards", None)
    stages = curation_stages(docs, emb, benchmark, **kwargs)
    names = [
        ("input", "input"),
        ("s1", "exact_dedup"),
        ("s2", "near_dup_clusters"),
        ("s3", "semdedup"),
        ("s4", "decontaminated"),
        ("s5", "calibrated"),
        ("s6", "mixture"),
    ]
    spark = docs.sparkSession
    # Persist each stage while counting: stage N's lineage contains all
    # earlier stages, so seven uncached counts would re-run the LSH +
    # connected-components + SemDeDup subtrees up to 7x. With the
    # persists, each stage computes once and later counts reuse it.
    persisted = [stages[key] for key, _ in names[1:]]
    for df in persisted:
        df.persist()
    try:
        counts = [
            (i, label, stages[key].count())
            for i, (key, label) in enumerate(names)
        ]
    finally:
        for df in persisted:
            df.unpersist()
    return spark.createDataFrame(counts, "stage int, name string, docs long")


def curation_stages(
    docs: DataFrame,
    emb: DataFrame,
    benchmark: DataFrame | None = None,
    jaccard_threshold: float = 0.5,
    sem_threshold: float = 0.45,
    contamination_max: float = 0.8,
    calibration_min: float = 0.1,
    token_budget: int = 10000,
    alpha: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> dict[str, DataFrame]:
    """The shared stage dataflow behind :func:`curate_corpus` and
    :func:`curation_attrition`: returns {input, s1..s6} survivor
    frames (s6 carries (id, source, n_tokens); the rest carry the
    document columns)."""
    if benchmark is None:
        benchmark = docs.filter(F.col(id_col) % 97 == 0)

    # Lineage discipline (r12): composed lazily, the stage decisions
    # NEST — stage N's plan re-evaluates every earlier stage's subtree
    # once per consumer (s4 carries s3 twice: main side + inside the
    # contamination aggregate; s6 carried s5 twice: the mixture gate
    # joins survivor rows against rates computed FROM the same rows),
    # so the shingle-explode / MinHash / quality passes each ran 2-8×
    # in one query (the r11 e2e plan: 28 parquet scans of documents,
    # 16 pandas-exec nodes, 90 exchanges, ZERO reused). Each small
    # DECISION frame (ids only — bodies never checkpoint) is now
    # ``localCheckpoint(eager=False)``-ed: every heavy pass runs
    # exactly once (the checkpoint RDD computes within the first action
    # that touches it — the lazy form keeps independent stage subtrees
    # schedulable concurrently inside one job, where the eager form
    # would serialize them as separate build-time jobs), and downstream
    # lineage is a flat chain of checkpoint scans + small joins.
    # dedup_clusters' connected-components gate still materializes
    # mid-build (its documented build-time job), so the result reflects
    # data as of build either way. Numbers: OPTIMIZATION_r12.md.

    # 1. exact: canonical ids only (id-keyed drop decision)
    canon = (
        exact_dedup(docs, text_col, id_col)
        .select(F.col("canonical_id").alias(id_col))
        .localCheckpoint(eager=False)
    )
    s1 = docs.join(F.broadcast(canon), id_col, "left_semi")

    # 2. near-dup clusters over survivors; keep cluster representatives
    # (no checkpoint needed: connected_components returns either a
    # driver-built local frame or checkpoint-materialized labels)
    clusters = dedup_clusters(
        s1, threshold=jaccard_threshold, text_col=text_col, id_col=id_col
    )
    drop2 = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    s2 = s1.join(F.broadcast(drop2), id_col, "left_anti")

    # 3. semantic prune decisions (corpus-wide, embedding side)
    sem_drop = (
        semdedup_prune(emb, threshold=sem_threshold)
        .filter(~F.col("keep"))
        .select(F.col("vec_id").alias(id_col))
        .localCheckpoint(eager=False)
    )
    s3 = s2.join(F.broadcast(sem_drop), id_col, "left_anti")

    # 4. decontamination vs the (external, fixed) benchmark shingles
    contam = benchmark_contamination(
        s3, benchmark, k=5, text_col=text_col, id_col=id_col
    )
    drop4 = (
        contam.filter(F.col("contamination") >= contamination_max)
        .select(id_col)
        .localCheckpoint(eager=False)
    )
    s4 = s3.join(F.broadcast(drop4), id_col, "left_anti")

    # 5. per-source quality calibration over the survivor population
    q = s4.select(
        id_col,
        F.col(source_col).alias("source"),
        text_col,
        F.round(quality_score(F.col(text_col)), 6).alias("__quality"),
    )
    w5 = Window.partitionBy("source").orderBy(
        F.col("__quality").asc(), F.col(id_col).asc()
    )
    s5 = (
        q.withColumn("__cal", F.round(F.percent_rank().over(w5), 6))
        .filter(F.col("__cal") >= calibration_min)
        .select(id_col, "source", text_col)
    )

    # 6. temperature mixture from survivor totals. The narrow survivor
    # token frame (id, source, n_tokens) is checkpointed once and BOTH
    # mixture consumers (the per-source rate aggregate and the per-doc
    # hash gate) read it — ``mixture_sample(s5)`` would tokenize and
    # re-run the whole s5 subtree (quality window included) twice. The
    # expressions below replicate mixture_rates/mixture_sample's alpha
    # path verbatim, so values (and the oracle hash) are unchanged;
    # tests pin s6 ≡ mixture_sample(s5) row-for-row.
    from ..functions.text import ws_token_count

    tok5 = s5.select(
        F.col(id_col),
        F.col("source"),
        ws_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)
    totals = tok5.groupBy("source").agg(
        F.sum("n_tokens").alias("tokens_available")
    )
    w6 = Window.partitionBy()
    pw = F.pow(F.col("tokens_available").cast("double"), F.lit(float(alpha)))
    rates = totals.withColumn(
        "__budget", F.lit(float(token_budget)) * pw / F.sum(pw).over(w6)
    ).select(
        "source",
        F.round(
            F.least(F.lit(1.0), F.col("__budget") / F.col("tokens_available")),
            6,
        ).alias("rate"),
    )
    bucket = md5_long(F.concat(F.lit("mix_"), F.col(id_col))) % 1000000
    s6 = (
        tok5.join(F.broadcast(rates), "source")
        .filter(bucket < F.round(F.col("rate") * 1000000, 0).cast("long"))
        .select(id_col, "source", "n_tokens")
    )

    return {
        "input": docs,
        "s1": s1,
        "s2": s2,
        "s3": s3,
        "s4": s4,
        "s5": s5,
        "s6": s6,
    }
