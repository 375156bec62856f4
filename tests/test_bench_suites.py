"""The driver greps bench.py's JSON line for the graded record; a
query rename that orphans a suite entry would crash the bench at
round-grading time, not test time. Pin suite membership here."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_suites_are_registered_queries():
    from spark_streaming_kafka_spark.queries import QUERIES
    from spark_streaming_kafka_spark.streaming.microbench import STREAM_MICRO

    bench = _bench()
    for suite_name, suite in bench.SUITES.items():
        # a suite entry resolves either to a registry query (noop-sink
        # timed) or to a streaming micro-bench (full-drain timed, r12)
        missing = [
            q for q in suite if q not in QUERIES and q not in STREAM_MICRO
        ]
        assert not missing, f"{suite_name} references unregistered: {missing}"
        assert len(suite) == len(set(suite)), f"{suite_name} has duplicates"


def test_headline_suite_frozen_since_r3():
    """The README's like-for-like bench-history claim depends on the
    headline set not changing; this is the tripwire for accidental
    edits (an intentional change updates this list AND the README)."""
    bench = _bench()
    assert bench.HEADLINE == [
        "pricing_summary", "counts_and_averages", "top_revenue_join",
        "filter_project", "percentile_buckets", "window_topk_per_customer",
        "json_extract_sum", "word_count", "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash", "ann_topk_bruteforce", "ann_topk_lsh", "ann_topk_ivf",
        "quality_scores", "doc_fingerprints", "asof_click_view",
        "band_join_click_error", "tumbling_hourly_stats", "rollup_revenue",
        "corpus_clean_pipeline", "dedup_clusters", "gap_fill_hourly",
        "etl_ratings_pipeline",
    ]


def test_pipeline_suite_frozen():
    """Same tripwire for the pipeline tier: the r7-r9 members are the
    comparable prefix; r10 appended two new-family representatives and
    r10 batch B three more (graph/RFM/attribution); r11 appended the
    two iterative-graph rankers and the sliding-distinct series; r12
    appended the three streaming micro-benches (the first measured
    perf path for the streaming tier).
    Intentional changes update this list AND the README."""
    bench = _bench()
    assert bench.PIPELINE == [
        "cdc_dedup_rewrite", "cdc_chunk_documents",
        "winnowing_overlap_pairs", "dsir_select_docs", "bm25_topk_docs",
        "hybrid_search_rrf", "hll_distinct_users", "heavy_hitters_cms",
        "split_no_leakage", "web_corpus_gate", "bpe_merges",
        "part_cooccurrence_topk", "curriculum_schedule",
        "graph_triangle_counts", "rfm_customer_segments",
        "attribution_u_shaped",
        "pagerank_source_authority", "hits_hub_authority",
        "rolling_active_users_28d",
        "stream_manifest_dedup", "stream_sessionization",
        "stream_drift_gate",
    ]
