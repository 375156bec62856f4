"""Write docs/PLANS.md: formatted physical plans for representative
queries, annotated with what to look for — the evidence that each
operator plans the way the scale design claims (broadcast joins where
dims are small, pushed filters, pruned scans, no nested-loop joins).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: query → what the plan must show (rendered as the section preamble).
SHOWCASE = {
    "top_revenue_join": "Three dim joins all BroadcastHashJoin; the only "
    "exchange is the final aggregation — the fact scan never shuffles for joins.",
    "filter_project": "PushedFilters + pruned ReadSchema at the parquet scan: "
    "predicate and projection run in the reader, not after it.",
    "pricing_summary": "Partial → final HashAggregate pair (map-side combine): "
    "the shuffle carries one row per group per partition.",
    "asof_click_view": "No join operator at all — the as-of match is a union + "
    "window fill-forward; exactly one hash exchange per side on user_id.",
    "band_join_click_error": "Equi-join on (user_id, bucket) — no "
    "BroadcastNestedLoopJoin despite the |Δt| predicate.",
    "window_topk_per_customer": "Single window exchange; rank filter runs "
    "inside the window stage (no second pass).",
    "salted_bigjoin_revenue": "Join keys are (o_orderkey, __salt): a hot key's "
    "rows spread over 8 reducers; results provably equal the unsalted join "
    "(its oracle IS the unsalted SQL).",
    "corpus_clean_pipeline": "ReadSchema pruned to doc_id,text; one window "
    "exchange on the 16-byte md5, filters before wide columns survive.",
    "bloom_prefilter_orders": "The bloom bitmap is a literal array inside a "
    "scan-side Filter (bit tests over element_at) — fact rows die before the "
    "BroadcastHashJoin; no extra exchange for the prefilter.",
    "benchmark_contamination": "Benchmark shingles BroadcastExchange into the "
    "corpus-side join; ONE shingle evaluation feeds both total and hit "
    "counts (single explode_outer stream), and the only hash exchange is "
    "the per-doc aggregate.",
    "stratified_sample_balanced": "Per-stratum thresholds from one "
    "dimension-sized aggregate broadcast back; the fact side is a single "
    "filtered scan (no fact shuffle, no scalar cross-join).",
    "passage_dedup": "First-occurrence window partitions by the 16-byte "
    "passage md5 — one hash exchange of (md5, id, idx); passage text never "
    "shuffles and the summary agg is partial-combined.",
    "substring_dup_spans": "Suffix-array-style dedup as linear relational "
    "algebra: shingle hashes computed in-row (no explode before the md5), "
    "dup-hash semi-join on 16-byte keys, one per-doc window for the island "
    "merge — text never shuffles, no quadratic operator anywhere.",
    "semantic_dedup_clusters_lsh": "The scale path of semantic dedup, "
    "end-to-end: sign-LSH bucketed candidates (per-bucket grouped-pandas "
    "gemm, no self-join of the corpus) feed the connected-components loop — "
    "no CartesianProduct, no BroadcastNestedLoopJoin, no SortMergeJoin of "
    "embeddings against themselves.",
    "embedding_centroid_outliers": "Centroids come from a dimension-sized "
    "partial aggregate and BroadcastExchange into the scoring join — the "
    "vector column never shuffles.",
    "mixture_budget_sample": "Per-source rate table BroadcastExchange into "
    "the corpus pass; the kept-set filter is scan-side hash algebra, no "
    "document shuffle.",
    "profile_orders": "ALL per-column stats in one aggregation: Expand "
    "replicates scan rows per distinct column, then a single partial→final "
    "HashAggregate pair — one job for any column count.",
    "orders_upsert": "The delta's key set BroadcastExchange into a LEFT ANTI "
    "join (full outer cannot broadcast); the base side is a plain scan with "
    "no exchange — delta-sized merge cost.",
    "orders_snapshot_diff": "Both snapshot sides reduce to (key, md5) "
    "projections BEFORE the full-outer SortMergeJoin: the exchanges carry "
    "~40-byte rows, never table-width rows.",
    "dedup_minhash_lsh": "ONE mapInPandas signature pass (no duplicated "
    "subtree): banding expands per-bucket sorted id arrays — no self-join "
    "for candidates; the verify join broadcasts the bounded candidate set.",
    "trailing_week_revenue": "Single window exchange on o_custkey; the RANGE "
    "frame evaluates inside the window stage with a sliding bound.",
    "purchase_retention": "INTERSECT and EXCEPT plan as left-semi / "
    "left-anti hash joins over pre-aggregated distinct user sets — only "
    "distinct keys shuffle.",
    "bigram_lm_top_next": "Bigram expansion is scan-side array algebra; the "
    "(head,next) hash agg is partial-combined and every later operator "
    "(window, filters) works on the vocabulary-sized counts table.",
    "semdedup_prune": "Assignment is shuffle-free mapInPandas (broadcast "
    "codebook); the pairwise term runs per-CLUSTER inside "
    "FlatMapGroupsInPandas after ONE shuffle by cluster id — no corpus "
    "self-join anywhere in the plan.",
    "diversity_sample_clusters": "Shuffle-free codebook assignment, then a "
    "single window exchange over (id, cluster, centrality) rows — vectors "
    "themselves never shuffle.",
    "funnel_conversion": "One partial-aggregated min per funnel step; each "
    "later stage joins only the SHRINKING converted set (user-keyed hash "
    "joins, no windows, no state).",
    "pagerank_source_authority": "The r11 single-lazy-query loop: ONE "
    "plan holds all five rounds — the checkpointed edge state (Scan "
    "ExistingRDD) is shuffled on the source key once and every later "
    "round reads it back as ReusedExchange; per round one ShuffledHashJoin "
    "(ranks on the build side, no sort) + one partial-agg sum; no "
    "per-round driver job, no nodes left-join (no-in-edge ranks are "
    "closed-form).",
    "bm25_topk_docs": "Query-term filter runs map-side BEFORE the (doc, "
    "term) count shuffle — the exchange carries matching postings only; "
    "idf is a |terms|-row BroadcastHashJoin and the final cut is "
    "TakeOrderedAndProject (no global sort).",
    "chunk_documents": "Map-only: tokenize → Generate(explode(sequence)) → "
    "slice/array_join, zero hash exchanges — chunking is pure per-row "
    "array algebra at any corpus size.",
    "char_entropy_scores": "One Project, zero exchanges, zero Python: the "
    "entropy fold runs inside whole-stage codegen, with chars/length/"
    "counts STAGED as separate projections so no lambda subtree is "
    "re-evaluated (3.4× measured win over the single-expression form).",
    "nearest_centroid_confusion": "Centroids are plan LITERALS (bounded "
    "|labels|×dim collect): scoring is zip_with dot products + an in-row "
    "struct arg-max — no join, no explode; the only exchange is the "
    "|labels|²-bounded confusion aggregate.",
    "iqr_outlier_events": "One exact-percentile aggregation builds the "
    "|groups|-row fence table, BroadcastExchange into a scan-side filter "
    "— the fact table has no exchange at all.",
    "event_anomaly_zscore": "ONE hash exchange on event_type; both rolling "
    "moments evaluate in a single Window stage over the strictly "
    "historical frame.",
    "fuzzy_part_names": "Pass-Join candidate generation: segment geometry "
    "STAGED as separate projections (codegen survives — no 64 KB method "
    "blowup); signature rows carry only (block, id, l2, seg, piece) — "
    "never string bodies — through an equi-join whose stage width is "
    "PINNED by an explicit repartition (AQE coalesces by input bytes and "
    "is blind to candidate blowup; a default-heap session OOMs without "
    "the pin); distinct ids-only candidates, strings fetched back by two "
    "linear (block, id) joins, ONE levenshtein verify — no block "
    "self-join, no CartesianProduct, linear shuffle however coarse the "
    "blocking key.",
    "link_prediction_parts": "Weighted wedge expansion from ONE per-z "
    "array aggregation (the _bucket_pairs shape with the Adamic-Adar "
    "weight on the bucket row) — no self-join of the incidence table; "
    "known edges removed by a LEFT ANTI hash join; TakeOrderedAndProject "
    "cuts the top-k without a global sort.",
    "price_quantile_normalized": "global_rank on a FACT column: "
    "RangePartitioning exchange (the distributed sort) + per-partition "
    "row_number + literal offsets — the plan an unpartitioned-window "
    "rank could never scale to.",
    "graph_triangle_counts": "Edge-iterator triangle closure: the oriented "
    "edge set joins its two adjacency-array sides (equi-joins, never a "
    "wedge materialization), array_intersect runs in-row, and BOTH heavy "
    "stages show REPARTITION_BY_NUM — explicit width pins because AQE "
    "coalesces on shuffle bytes and cannot see the array-expansion work.",
    "rfm_customer_segments": "FUSED global_ntile_multi: one explode to "
    "(spec, key) rows, ONE RangePartitioning exchange over the "
    "customer-sized aggregate covering all three orderings, per-(spec, "
    "partition) literal offsets + a per-partition row_number, and a "
    "max(case) pivot hash-agg instead of three joins — no "
    "Window.partitionBy() single-task sort anywhere; the fact table "
    "shuffles exactly once (the customer agg).",
    "attribution_u_shaped": "Conversions x touches is ONE user-keyed "
    "equi-join; position weights come from a per-conversion window over "
    "the joined (lookback-bounded) rows, and the final aggregate is "
    "channel-sized — no cartesian, no per-row Python.",
    "event_anomaly_zscore_bucketed": "The scale-out rolling window: rows "
    "and their carried previous-bucket tails union into (type, bucket) "
    "window partitions, and the z-window stage shows REPARTITION_BY_NUM "
    "— the explicit pin that keeps types x buckets parallelism where "
    "AQE's byte-based coalescing would fold it back to one task (the "
    "plain per-type form is KEY-CARDINALITY-bound at ~5).",
    "hits_hub_authority": "Both per-round joins read the SAME checkpointed "
    "edge RDD through two reused keyed shuffles (src for the authority "
    "step, dst for the hub step); scores ride the shuffled-hash build "
    "side; normalization is deferred to one node-sized window pass at "
    "the end — no per-round global reduction.",
    "rolling_active_users_28d": "A sliding COUNT DISTINCT that never "
    "windows: Generate(explode(sequence(day, day+27))) fans each "
    "(user, day) into its window-ends, a hash DISTINCT dedups, a "
    "left-semi join restricts to observed days, one final hash agg — "
    "every exchange is map-side combinable, nothing is per-day.",
    "target_encode_kfold": "Leakage-safe encoding as pure plan algebra: "
    "one fact-sized hash aggregation by (category, md5-derived fold), "
    "then the leave-one-fold-out means via a category-partitioned window "
    "over the CATEGORYxFOLD grid — the fact table shuffles once.",
    "gini_revenue_concentration": "Global ranks via RangePartitioning + "
    "partition-offset literals (global_rank): the sort is distributed, "
    "the offsets are a bounded driver collect, and every moment is an "
    "exact integer sum folded map-side.",
    "split_no_leakage": "The split unit is the near-dup cluster: the plan is "
    "the established sub-quadratic cluster path (LSH candidates, bounded "
    "verify, one-job-per-iteration CC) plus ONE group-keyed left join and "
    "pure hash algebra for the gate — no new wide exchange over the corpus.",
    "takedown_propagation": "Propagation through the dup graph costs one "
    "group-sized aggregate (any-direct-hit flag) and one group-keyed join on "
    "top of the cluster path; document bodies never re-shuffle.",
    "mixture_epochs_schedule": "ONE partial→final HashAggregate pair over the "
    "corpus (per-source doc+token counts); totals ride a window over the "
    "source-sized table — no corpus join-back, no second scan.",
    "cdc_chunk_documents": "A single ArrowEvalPython/MapInPandas stage over "
    "the pruned (doc_id, text) scan — linear per-doc chunking, zero shuffle; "
    "the Catalyst array formulation re-evaluates the k-gram hash array per "
    "element under projection collapse (measured 60× slower) and is "
    "deliberately not used.",
    "winnowing_overlap_pairs": "Inverted-index self-join over the SELECTED "
    "fingerprint set (~2/(w+1) of shingle volume), stop-keys dropped by the "
    "max_df cap BEFORE pairing; one pair-keyed aggregate — same shape as "
    "ngram_jaccard but on the winnowed set.",
    "cdc_dedup_rewrite": "Keep decisions rank NARROW (hash, id, idx) rows in "
    "one hash-keyed window; chunk bodies shuffle exactly twice (window "
    "exchange + per-doc rebuild), both linear — and the rebuild restores "
    "order via array_sort, deterministic under any partitioning.",
    "cross_source_dup_matrix": "Pairs ride the sub-quadratic LSH+verify "
    "path; attribution is two id-keyed joins against the (id, source) "
    "projection and a source-pair-sized aggregate — bodies never "
    "re-shuffle.",
    "dup_weighted_docs": "One hash-groupBy on md5(text) — the shuffle "
    "carries (hash, id) pairs, never bodies — and one hash-keyed join "
    "back; weights are pure column algebra.",
    "drift_report_docs": "One scan per snapshot: every feature's bin lands "
    "in a single Generate→partial-agg pair; totals via a window over the "
    "bin-sized aligned table (NOT a join-back that would duplicate the "
    "subtree) — corpus rows never shuffle.",
    "expectation_report_events": "All row-level rules in ONE HashAggregate "
    "over a single events scan (conditional counts + a distinct count); "
    "the FK rule is a BroadcastHashJoin LeftAnti count — adding rules adds "
    "aggregate expressions, not passes.",
    "manifest_neardup_new": "Incremental gate: mapInPandas signatures for "
    "the NEW batch only; band keys equi-join against the (signature-only) "
    "manifest; the bounded candidate set broadcasts into the estimator "
    "join — historical text appears nowhere in the plan.",
    "ann_topk_pq": "PQ ADC search: ONE shuffle-free mapInPandas encode "
    "pass chained into the scoring pass (codes never hit a shuffle), "
    "per-batch partial top-k, then a |Q|·k-row window cut — query-time "
    "work is table lookups, no float vectors, no joins.",
    "cluster_canonical_keep": "Cluster composition: the sub-quadratic "
    "cluster subtree feeds ONE window partitioned by cluster_id over "
    "(doc_id, cluster_id, quality) rows — canonical pick and keep flag "
    "in the same window stage, no second pass over documents.",
    "quality_calibrated_by_source": "One window exchange keyed by source "
    "over 24-byte (id, source, quality) rows; the percent_rank and its "
    "rounding evaluate inside the window stage.",
    "ann_topk_pq_refined": "IVF-PQ refine: the ADC subtree's candidate ids "
    "BroadcastExchange back into the corpus scan (semi-join-shaped vector "
    "fetch, column-pruned to id+embedding, corpus never shuffles), then a "
    "|Q|·refine_n-row mapInPandas exact re-rank and one window cut — the "
    "only exchanges are the ADC partial top-k and the final tiny window.",
    "weighted_sample_noreplace": "A-Res keys are pure column algebra on the "
    "scan (hash → ln → divide, codegen'd); ONE group-keyed window exchange "
    "carrying one extra double — the global form instead plans "
    "TakeOrderedAndProject (per-partition top-n, no global sort).",
    "ngram_novelty_scores": "Two narrow exchanges: gram-keyed window (min "
    "doc per shingle — rows are (gram, id) pairs, never text) then the "
    "doc-keyed count/sum aggregate; document bodies appear only in the "
    "initial tokenize projection.",
    "manifest_novelty_new": "Incremental gate: the manifest scans ONCE "
    "through a BroadcastHashJoin LeftSemi probe against the broadcast "
    "batch-gram set — zero manifest exchange; the batch-side window and "
    "aggregate run on batch-sized gram rows (plan-asserted in "
    "tests/test_curation.py).",
    "event_markov_transitions": "One user-keyed window exchange for the "
    "lead() pairs; the count aggregate partial-combines map-side and the "
    "row-normalizing window runs on the |states|²-bounded matrix.",
    "session_sequence_logprob": "The pairs reuse the same user-keyed window "
    "shuffle the matrix fit pays; the |states|² matrix returns as a "
    "BroadcastHashJoin into the scoring aggregate — facts never shuffle "
    "a second time.",
    "neyman_allocation_events": "ONE partial→final HashAggregate over the "
    "facts (count + stddev partial-combine); floor/remainder/rank all ride "
    "unpartitioned windows over the stratum-count-sized profile.",
    "vocab_coverage_curve": "One corpus scan into the word-frequency hash "
    "aggregate, TakeOrderedAndProject for the top-V (per-partition heaps, "
    "no global vocab sort); the grand total rides a tagged union row and "
    "cutoff assignment is an explode of a filtered LITERAL array — no "
    "theta join, so no BroadcastNestedLoopJoin.",
    "behavior_affinity_lift": "Distinct (basket, item) incidence → "
    "TakeOrderedAndProject top items → broadcast left-semi keep → "
    "_bucket_pairs array expansion (one hash aggregate, no basket "
    "self-join); totals and item counts return as broadcasts over the "
    "C(top_items,2)-bounded pair table.",
    "decay_weighted_revenue": "Pure column algebra (datediff → pow → "
    "round) folded into ONE partial→final HashAggregate — the same single "
    "pass any grouped sum costs.",
    "debounce_burst_events": "One lag over the (user, type)-keyed window "
    "— the single hash-partition shuffle every per-key ranking pays; the "
    "keep predicate evaluates inside the window stage.",
    "value_changepoints": "Prefix sums + key totals in ONE window stage "
    "over the per-key shuffle make every candidate split O(1); the "
    "arg-max rank reuses the same partitioning — no per-split "
    "recomputation, no second exchange.",
    "event_hour_mutual_info": "One partial→final HashAggregate builds the "
    "contingency table; every window after runs on the |X|·|Y|-bounded "
    "cells and the final global aggregate is one row.",
    "corpus_curation_e2e": "The composed seven-stage pipeline: every "
    "inter-stage hand-off is a BroadcastHashJoin LeftSemi/LeftAnti on "
    "id-only decision sets (no document-body shuffle anywhere); the "
    "population-dependent windows (calibration percent_rank, packing "
    "cumsum) key on source/shard over narrow fact rows; final aggregate "
    "is |sources|-sized. No CartesianProduct outside the bounded "
    "16-centroid SemDeDup assignment.",
    "ann_topk_ivf_trained": "Trained-codebook IVF: the Lloyd's centroids "
    "are driver-side model state (two bounded assignment+mean jobs), so "
    "this plan is IDENTICAL in shape to ann_topk_ivf — shuffle-free "
    "mapInPandas cell assignment, broadcast probe rows, one window cut; "
    "swapping the codebook changed zero plan structure, which is the "
    "point of the pluggable-codebook design.",
    "semantic_contamination": "Benchmark matrix in the task closure: one "
    "mapInPandas over the corpus scan, NO join and NO exchange at all "
    "before the collect — the flag/nearest-id columns are computed "
    "in-batch against the broadcast-like ref matrix.",
    "boilerplate_doc_ratio": "The per-source boilerplate dictionary is "
    "size-bounded by construction (df >= share·n_docs), so it arrives as "
    "a BroadcastExchange and the exploded corpus shingles join it "
    "BroadcastHashJoin — the corpus side's only wide exchange is the "
    "per-doc count aggregate.",
    "quality_classifier_scores": "Frozen-weight sigmoid over the quality "
    "features: one codegen'd Project over the parquet scan — no UDF, no "
    "join; the only Exchange is fan_out's round-robin split of the "
    "single-file testdata scan (a no-op on a many-split 100 TB scan).",
    "fim_splits": "Map-only training-example construction: tokenize + two "
    "md5 hashes + three slices as chained Projects over the scan; no "
    "join, no aggregate — the only Exchange is fan_out's testdata "
    "round-robin (no-op at scale).",
    "contrastive_pairs": "Query matrix in the task closure; one "
    "mapInPandas over the corpus emits <= 2 rows per query per batch, so "
    "the only exchange is the tiny (query, leg) ranking window.",
    "winnowing_fingerprints": "Fingerprint selection entirely inside "
    "codegen'd Projects (positional shingles, per-k-gram md5, window "
    "minima via slice/array_min, array_distinct BEFORE the explode) — no "
    "join/aggregate shuffle; the only Exchange is fan_out's testdata "
    "round-robin, and the exploded output is the ~2n/(w+1) selected set.",
    "web_corpus_gate": "Three gates composed: the boilerplate dictionary "
    "and the classifier verdicts reduce to id-keyed LeftSemi joins; the "
    "per-source cap is one narrow rank window; the report aggregate is "
    "|sources|-sized. Document bodies are scanned, never shuffled.",
    "eval_sample_per_source": "Sampling as top-k over a hash order: one "
    "window exchange on source over (source, doc_id, hash) rows, rank "
    "filter inside the window stage — no RNG, no second pass, and the "
    "picked ids are partition-layout-independent.",
    "histogram_quantiles_value": "The quantile sketch: partial→final "
    "HashAggregate pair over (group, bin) cells — the shuffle after "
    "map-side combine is <= 128 rows per group; the cumulative window and "
    "the quantile probe run over the bin-bounded cell table only.",
    "embedding_random_projection": "JL projection as plan literals: the "
    "±1 matrix appears as literal arrays inside a single codegen'd "
    "Project over the embeddings scan — no UDF, no join, no Exchange at "
    "all before the final projection.",
    "jaccard_threshold_sweep": "The established inverted-index pair "
    "subtree feeds a band-keyed partial agg (<= ~10 rows) and a window "
    "over those bands — everything after pairing is band-bounded.",
    "retrieval_ndcg_bm25": "DCG and IDCG legs combined by a tagged UNION "
    "into one final aggregate — no 1×1 crossJoin/BNLJ anywhere; both "
    "rank windows run over candidate-bounded (top-k) inputs.",
    "image_ahash_dedup": "Media dedup: generate→encode→decode→hash fuse "
    "into ONE ArrowEvalPython/mapInPandas stage over the scan (no "
    "shuffle between them); the dedup groupBy exchanges 8-byte (hash, "
    "id) pairs — payload bytes never cross the wire.",
    "audio_fingerprint_dedup": "Same single-stage media shape as "
    "image_ahash_dedup: WAV encode→decode→fingerprint in one fused "
    "mapInPandas pass, then a fingerprint-keyed aggregate over narrow "
    "rows.",
    "kmv_distinct_users": "KMV sketch: one map-side-combined distinct "
    "exchange of (group, hash) rows, then the r8 salted TWO-STAGE "
    "bottom-k (rank within (group, h mod fanout), then rank the "
    "≤ fanout·k survivors per group — no task ever sorts one group's "
    "full distinct set), k-row groups into the estimator projection; "
    "the exact-count certifier joins as a BroadcastHashJoin of a "
    "5-row aggregate.",
    "kmv_audience_overlap": "JOIN-FREE, COLLECT-FREE set algebra (r8): "
    "membership-tagged projection of ONE sketch, per-side (n, hk) "
    "stats via conditional aggregates over a ≤2k-row unpartitioned "
    "window, theta gate, per-hash dedup, one global conditional "
    "aggregate — no constant-key join anywhere (that shape "
    "constant-folds to a cartesian and the plan audit rejects it) and "
    "no driver literal frozen at construction time.",
    "histogram_quantile_error": "Sketch side stays bin-bounded "
    "(≤128-cell windows); the exact side is the one full-sort "
    "cume_dist window this query deliberately pays to certify the "
    "sketch's one-bin-width error theorem.",
    "rendezvous_shard_sizes": "Map-only placement: 8 md5 struct "
    "entries folded with array_max inside the scan's project — the "
    "ONLY exchange is the final 8-row size aggregate.",
    "merge_event_intervals": "Islands-and-gaps coalesce (r10): "
    "running-max-end, island-break flag, and running island id all "
    "evaluate in ONE Window stage over ONE user_id exchange, and the "
    "per-island rollup reuses that partitioning under AQE — a "
    "data-sized interval merge for the price of a single shuffle.",
    "pareto_frontier_users": "Two-phase distributed skyline (r10): after "
    "the per-user aggregate, the plan is two MapInPandas stages — "
    "partition-local frontier prune (sound: dominated-anywhere ⊆ "
    "dominated-locally), then the exact resolve over the frontier-sized "
    "candidates — NO quadratic self-anti-join, NO unpartitioned sort "
    "of the full table.",
    "curriculum_schedule": "Interleaved curriculum (r10): the global "
    "training position is ARITHMETIC ((rank-1)·n_sources + src_idx), so "
    "the plan shows one per-source ranking window plus a sources-sized "
    "BroadcastHashJoin — no global sort, no single-partition window "
    "over the corpus.",
    "part_cooccurrence_topk": "Item-item CF (r10): pair expansion is the "
    "join-free _bucket_pairs hash aggregate (baskets ≤ 64 cap bounds "
    "ΣC(n,2)); per-item counts attach via two id-keyed equi-joins of "
    "narrow (item, count) rows; the basket total is a bounded "
    "single-scalar collect — no constant-key join to constant-fold "
    "into a cartesian.",
}


def main() -> None:
    from spark_streaming_kafka_spark import get_spark
    from spark_streaming_kafka_spark.plans.inspect import explain_str
    from spark_streaming_kafka_spark.queries import REGISTRY

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# Physical plans (generated by tools/dump_plans.py)",
        "",
        f"Scale factor dir: `{SF_DIR}`. Regenerate after plan-affecting",
        "changes; tests/test_asof_windows.py and plans/inspect.py assert",
        "the load-bearing properties, this file is for human review.",
        "",
    ]
    for name, blurb in SHOWCASE.items():
        df = REGISTRY[name][0](spark, SF_DIR)
        lines += [f"## {name}", "", blurb, "", "```",
                  explain_str(df, "formatted").rstrip(), "```", ""]
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "docs"), exist_ok=True)
    out = os.path.join(os.path.dirname(__file__), "..", "docs", "PLANS.md")
    text = "\n".join(lines)
    # plan strings can embed literal control bytes (the portable hash's
    # \x01 separator / \x00 null sentinel in concat_ws) — escape them so
    # the dump stays a text file for grep/diff
    text = "".join(
        ch if ch in "\n\t" or ord(ch) >= 32 else f"\\x{ord(ch):02x}"
        for ch in text
    )
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {os.path.normpath(out)}")
    spark.stop()


if __name__ == "__main__":
    main()
