"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with the noop sink (full materialization, no
driver transfer, no result-size bias). The suite runs TWICE: the first
pass (unmeasured) pays one-time JVM/codegen/JIT warm-up per plan shape,
the second pass is what's reported — steady-state, which is how these
plans actually run in a long-lived cluster session. Cold numbers are
dominated by whole-stage-codegen compilation (~3-4s per novel plan
shape), a per-plan constant that is irrelevant at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: every operator family with real work at sf0.1.
HEADLINE = [
    "pricing_summary",        # scan+filter+wide agg
    "counts_and_averages",    # high-cardinality hash agg
    "top_revenue_join",       # 3-way broadcast join + agg + top-k
    "filter_project",         # pushdown + pruning scan
    "percentile_buckets",     # per-group exact quantiles + join (W1)
    "window_topk_per_customer",  # window shuffle (W2)
    "json_extract_sum",       # from_json parse
    "word_count",             # explode + agg
    "dedup_exact",            # md5 groupBy
    "dedup_minhash_lsh",      # signatures + banding + verify
    "dedup_simhash",          # fingerprints + banding
    "ann_topk_bruteforce",    # broadcast NLJ + vector fold + window
    "ann_topk_lsh",           # sign-LSH buckets + per-bucket BLAS top-k
    "ann_topk_ivf",           # IVF cells: shuffle-free assign + probe
    "quality_scores",         # text feature extraction
    "doc_fingerprints",       # rolling-hash fingerprint
    "asof_click_view",        # as-of join (union + fill-forward window)
    "band_join_click_error",  # band join (interval bucketing)
    "tumbling_hourly_stats",  # event-time window agg
    "rollup_revenue",         # grouping-sets hash agg + joins
    "corpus_clean_pipeline",  # dedup+quality composite cleaning pass
    "dedup_clusters",         # near-dup pairs -> components (iterative)
    "gap_fill_hourly",        # dense resample via sequence explode
    "etl_ratings_pipeline",   # reference's full ETL (filters+W1+top-200)
]


def main() -> None:
    from spark_streaming_kafka_spark import get_spark
    from spark_streaming_kafka_spark.queries import QUERIES

    # Opt-in workload profile (tuning.py): SPARK_GRAFT_PROFILE=batch_etl
    # layers that profile's conf delta over the session defaults, scaled
    # to the benched core count, and is recorded in the output line so
    # A/B runs are self-describing. Unset = the plain defaults.
    profile_name = os.environ.get("SPARK_GRAFT_PROFILE")
    extra_conf = None
    if profile_name:
        from spark_streaming_kafka_spark.tuning import profile

        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        extra_conf = profile(profile_name, total_cores=cores)

    spark = get_spark("bench", extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")

    # pass 1 (unmeasured): compile/JIT every plan shape once
    for name in HEADLINE:
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # passes 2-3 (measured): steady-state; report the per-query MIN so
    # one transient stall (GC pause, CPU contention from an unrelated
    # process) can't masquerade as a plan cost
    import gc

    timings: dict[str, float] = {}
    for _ in range(2):
        for name in HEADLINE:
            fn = QUERIES[name]
            # drop blocks orphaned by the PREVIOUS query (iterative ops
            # localCheckpoint per round; the RDD blocks are only released
            # when Python refs die) so they can't distort this measurement
            spark.catalog.clearCache()
            gc.collect()
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    sf = 0.1
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[1])
    except (IndexError, ValueError):
        pass
    out = {
        "metric": "headline-suite wall clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if profile_name:
        out["profile"] = profile_name
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
