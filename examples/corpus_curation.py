"""Runnable walkthrough: an end-to-end training-corpus curation pass —
the LLM-pipeline composition this engine adds beyond the reference.

    python examples/corpus_curation.py [sf_dir] [out_dir]

Pipeline: exact dedup → near-dup clusters (MinHash-LSH + exact verify
+ connected components, keep one doc per cluster) → quality/language
gates → PII scrub → deterministic train/val/test split → curated
parquet + a per-stage attrition report.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.functions.text import (
    langid,
    quality_score,
)
from spark_streaming_kafka_spark.operators.curation import pii_scrub
from spark_streaming_kafka_spark.operators.dedup import (
    dedup_clusters,
    exact_dedup,
)
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_"
    )
    spark = get_spark("example-curation")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup: keep each byte-identical text's canonical copy
    canon = exact_dedup(docs).select(
        F.col("canonical_id").alias("doc_id")
    )
    docs1 = docs.join(F.broadcast(canon), "doc_id")
    n1 = docs1.count()

    # 2. near-dup clusters: keep the cluster representative
    clusters = dedup_clusters(docs1, threshold=0.5)
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )
    in_any_cluster = clusters.select("doc_id")
    docs2 = docs1.join(in_any_cluster, "doc_id", "left_anti").unionByName(
        docs1.join(keep, "doc_id", "left_semi")
    )
    n2 = docs2.count()

    # 3. quality + language gates, PII scrub
    docs3 = (
        docs2.withColumn("quality", F.round(quality_score(F.col("text")), 6))
        .withColumn("pred_lang", langid(F.col("text")))
        .filter((F.col("quality") >= 0.3) & (F.col("pred_lang") == "en"))
        .withColumn("text", pii_scrub(F.col("text")))
    )
    n3 = docs3.count()

    # 4. deterministic split (hash buckets — stable under repartition)
    bucket = F.abs(F.xxhash64(F.concat(F.lit("split_"), F.col("doc_id")))) % 100
    curated = docs3.withColumn(
        "split",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"),
    )
    curated.write.mode("overwrite").partitionBy("split").parquet(out_dir)

    print(
        f"attrition: {n0} → exact {n1} → near-dup {n2} → gates {n3}; "
        f"curated parquet at {out_dir}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
