"""Runnable walkthrough: from a gated web corpus to model-ready
training examples — the round-6 operator set composed end to end.

    python examples/training_examples.py [sf_dir] [out_dir]

Pipeline: boilerplate-ratio gate → frozen-weight quality-classifier
gate → per-source cap → fill-in-the-middle splits for the survivors →
winnowing fingerprints (local-overlap index) → contrastive
(positive, hard-negative) pairs from the embedding table. Writes the
FIM examples and the pair set as parquet plus a per-source gate
report to out_dir.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.functions.text import logistic_quality
from spark_streaming_kafka_spark.operators.augment import fim_split
from spark_streaming_kafka_spark.operators.curation import (
    boilerplate_ratio,
    source_cap_sample,
)
from spark_streaming_kafka_spark.operators.dedup import winnowing_fingerprints
from spark_streaming_kafka_spark.operators.similarity import contrastive_pairs
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="training_examples_")
    spark = get_spark()

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1-3. the web-corpus gate: boilerplate, classifier, per-source cap
    br_keep = (
        boilerplate_ratio(docs, k=3, min_share=0.05)
        .filter(F.col("boilerplate_ratio") <= 0.1)
        .select("doc_id")
    )
    q_keep = (
        docs.select("doc_id", logistic_quality(F.col("text")).alias("p"))
        .filter(F.col("p") >= 0.5)
        .select("doc_id")
    )
    surv = (
        docs.join(br_keep, "doc_id", "left_semi")
        .join(q_keep, "doc_id", "left_semi")
    )
    capped_ids = source_cap_sample(surv, cap=15).select("doc_id")
    kept = surv.join(capped_ids, "doc_id", "left_semi").cache()

    report = (
        docs.groupBy("source").agg(F.count(F.lit(1)).alias("total_docs"))
        .join(
            kept.groupBy("source").agg(F.count(F.lit(1)).alias("kept_docs")),
            "source",
            "left",
        )
        .fillna(0, ["kept_docs"])
        .orderBy("source")
    )
    print("=== per-source gate report ===")
    report.show(25, truncate=False)

    # 4-6. write each output once, then count the written parquet —
    # count()-then-write would recompute every uncached dataflow twice
    def write_and_count(df, name):
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()

    n_fim = write_and_count(fim_split(kept), "fim_examples")
    n_fp = write_and_count(winnowing_fingerprints(kept, k=3, w=4), "fingerprints")
    n_pairs = write_and_count(
        contrastive_pairs(emb, emb.filter(F.col("vec_id") % 97 == 0)),
        "contrastive_pairs",
    )

    print(
        f"wrote {n_fim} FIM examples, {n_fp} fingerprints, "
        f"{n_pairs} contrastive pairs -> {out_dir}"
    )
    kept.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
