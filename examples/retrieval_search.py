"""Runnable walkthrough: hybrid corpus retrieval — the search stack a
training-data pipeline runs on top of its curated corpus.

    python examples/retrieval_search.py [sf_dir]

Pipeline: chunk documents into passages → BM25 lexical leg over the
corpus → exact-cosine vector leg against a query embedding →
reciprocal-rank fusion of the two legs → fused top-10 with both legs'
evidence printed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.curation import chunk_documents
from spark_streaming_kafka_spark.operators.retrieval import bm25_topk, rrf_fuse
from spark_streaming_kafka_spark.operators.similarity import cosine_topk
from spark_streaming_kafka_spark.sources.readers import load_table

QUERY_TERMS = ["hash", "join", "dup"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-retrieval")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 0. passage chunking (what a real index would store per entry)
    chunks = chunk_documents(docs, chunk_tokens=32, stride=24)
    print(f"passages: {chunks.count()} from {docs.count()} documents")

    # 1. lexical leg: BM25 top-20 for the fixed query
    lex = bm25_topk(docs, QUERY_TERMS, k=20)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex_ranked = lex.select("doc_id", F.row_number().over(w).alias("rank"))
    print("\nBM25 top-5:")
    for r in lex.limit(5).collect():
        print(f"  doc {r.doc_id:>6}  bm25={r.bm25:.4f}  hits={r.n_terms_hit}")

    # 2. vector leg: exact cosine top-20 against doc 0's embedding
    q0 = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qdf = spark.createDataFrame(
        [(-1, list(q0[0]))], "query_id long, embedding array<float>"
    )
    vec = cosine_topk(emb, qdf, k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rank", "cosine"
    )
    print("\ncosine top-5:")
    for r in vec.orderBy("rank").limit(5).collect():
        print(f"  doc {r.doc_id:>6}  cos={r.cosine:.4f}")

    # 3. fuse
    fused = rrf_fuse([lex_ranked, vec.select("doc_id", "rank")], k=10)
    print("\nRRF fused top-10 (c=60):")
    for r in fused.collect():
        print(
            f"  doc {r.doc_id:>6}  rrf={r.rrf_score:.6f}"
            f"  sources={r.n_sources}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
