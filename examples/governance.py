"""Runnable walkthrough: data-governance passes over a training corpus —
the compliance/planning layer a 100 TB pipeline runs AFTER curation.

    python examples/governance.py [sf_dir] [out_dir]

Steps: content-defined chunking (chunk-level dedup inventory) →
chunk-level dedup rewrite (drop repeated passages across docs) →
cross-source duplication matrix (provenance view) → soft dedup
weights → takedown propagation (opt-out sources AND their near-dup
copies) → leakage-safe train/eval split (near-dup clusters never
straddle) → per-source mixture schedule (temperature weights →
repeat factors), with each artifact written to parquet and a
one-screen summary.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.curation import (
    cdc_dedup_rewrite,
    content_defined_chunks,
    cross_source_dup_matrix,
    dup_weighted_docs,
    leakage_safe_split,
    mixture_epochs,
    takedown_propagation,
)
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="governance_"
    )
    spark = get_spark("example-governance")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. content-defined chunk inventory: identical passages across
    #    docs share chunk hashes, so distinct/total measures
    #    passage-level redundancy the doc-level dedup misses.
    chunks = content_defined_chunks(docs, k=3, divisor=16)
    chunks.write.mode("overwrite").parquet(os.path.join(out_dir, "chunks"))
    stats = chunks.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("chunk_hash").alias("distinct"),
    ).first()
    print(
        f"chunks: {stats['total']} total, {stats['distinct']} distinct "
        f"({stats['total'] - stats['distinct']} duplicated passages)"
    )

    # 1b. chunk-level dedup rewrite: drop every passage already seen
    #     earlier in the corpus, rebuild the documents.
    rewritten = cdc_dedup_rewrite(docs, k=3, divisor=16)
    rewritten.write.mode("overwrite").parquet(
        os.path.join(out_dir, "rewritten")
    )
    rw = rewritten.agg(
        F.sum("n_chunks").alias("n"), F.sum("kept_chunks").alias("k")
    ).first()
    print(f"rewrite: kept {rw['k']}/{rw['n']} chunks corpus-wide")

    # 1c. provenance: which source pairs share near-dup content, and
    #     soft weights for the copies we keep.
    matrix = cross_source_dup_matrix(docs)
    matrix.write.mode("overwrite").parquet(os.path.join(out_dir, "dup_matrix"))
    top = matrix.orderBy(F.desc("n_pairs")).limit(3).collect()
    print("heaviest source-pair duplication:", [
        (r["source_a"], r["source_b"], r["n_pairs"]) for r in top
    ])
    dup_weighted_docs(docs).write.mode("overwrite").parquet(
        os.path.join(out_dir, "weights")
    )

    # 2. takedown propagation: remove opted-out sources AND every doc
    #    in the same near-dup cluster as a direct hit.
    removals = takedown_propagation(docs, optout_mod=7)
    removals.write.mode("overwrite").parquet(os.path.join(out_dir, "takedown"))
    by_reason = {
        r["reason"]: r["n"]
        for r in removals.groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"takedown: {by_reason} of {n0} docs")
    kept = docs.join(removals.select("doc_id"), "doc_id", "left_anti")

    # 3. leakage-safe split over the surviving docs: the split unit is
    #    the near-dup cluster, so eval never contains a training doc's
    #    near-copy.
    split = leakage_safe_split(kept, eval_mod=10)
    split.write.mode("overwrite").parquet(os.path.join(out_dir, "split"))
    sides = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"split: {sides}")

    # 4. mixture schedule for the training side: repeat factors per
    #    source under a one-corpus token budget.
    train_docs = kept.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    sched = mixture_epochs(train_docs, temperature=0.7, budget_factor=1.0)
    sched.write.mode("overwrite").parquet(os.path.join(out_dir, "schedule"))
    print("mixture schedule (top repeat factors):")
    for r in sched.orderBy(F.desc("epochs")).limit(5).collect():
        print(
            f"  {r['source']}: tokens={r['tokens']}, weight={r['weight']}, "
            f"epochs={r['epochs']}"
        )
    print(f"artifacts under {out_dir}")


if __name__ == "__main__":
    main()
