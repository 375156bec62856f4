"""Dedup + similarity: semantic invariants on controlled fixtures.

(Value parity vs DuckDB is covered by the oracle gate; here we pin the
algorithmic properties — known dup pairs found, recall guarantees,
candidate ⊆ verified, LSH vs brute-force agreement.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_streaming_kafka_spark.operators import dedup as dd
from spark_streaming_kafka_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    base = "spark makes big data small and fast with catalyst and tungsten engines today"
    near = base.replace("today", "tonight")  # one-token edit ⇒ high jaccard
    other = "completely different words about cooking pasta with garlic butter and sage leaves"
    rows = [(0, base), (1, near), (2, other), (3, base), (4, "tiny doc")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_identical_texts(docs):
    out = {r["canonical_id"]: r["n_copies"] for r in dd.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 3 identical, canonical = min id
    assert out[2] == 1


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(0, "one two")], "doc_id long, text string")
    row = df.select(dd.word_shingles(F.col("text"), 3).alias("s")).first()
    assert row["s"] == []


def test_jaccard_finds_planted_pair(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.6
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
    assert not any({a, b} == {0, 2} for a, b in pairs)


def test_minhash_matches_exact_jaccard(docs):
    exact = {(r["id_a"], r["id_b"]) for r in dd.ngram_jaccard_pairs(docs, 0.5).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in dd.minhash_lsh_pairs(docs, 0.5).collect()}
    assert approx == exact  # verification kills FPs; near-identical dups ⇒ no FNs


def test_minhash_params_deterministic():
    assert dd.minhash_params(4) == dd.minhash_params(4)
    a, b = dd.minhash_params(2)[0], dd.minhash_params(2)[1]
    assert a != b


def test_simhash_identical_docs_zero_hamming(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             dd.simhash_pairs(docs, max_hamming=10, bands=16).collect()}
    assert pairs.get((0, 3)) == 0


def test_simhash_bands_guard():
    # recall guarantee requires bands >= max_hamming + 1; checked before
    # any plan is built, so passing None for docs is safe
    with pytest.raises(ValueError):
        dd.simhash_pairs(None, max_hamming=5, bands=4)


@pytest.fixture(scope="module")
def emb(tables):
    return tables["embeddings"]


def test_bruteforce_topk_shape_and_selfexclusion(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.cosine_topk(emb, queries, k=5).collect()
    assert len(out) == 15
    assert all(r["neighbor_id"] != r["query_id"] for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for q, rows in by_q.items():
        rows.sort()
        cos = [c for _, c in rows]
        assert cos == sorted(cos, reverse=True)


def test_lsh_results_subset_of_bucketmates_and_agree_with_bruteforce(spark, emb):
    lsh = sim.lsh_cosine_topk(emb, k=3, n_planes=4)
    b = sim.signature_buckets(emb, n_planes=4)
    buckets = {r["vec_id"]: r["bucket"] for r in b.select("vec_id", "bucket").collect()}
    for r in lsh.collect():
        assert buckets[r["query_id"]] == buckets[r["neighbor_id"]]


def test_numpy_scorer_matches_column_algebra(spark, emb):
    qrows = emb.filter(F.col("vec_id") < 2).collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    scored = sim.cosine_topk_numpy(emb, queries, k=500)
    qdf = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk(emb, qdf, k=5, round_digits=6)
    approx_top = {}
    from spark_streaming_kafka_spark.operators.windows import per_group_top_k

    ranked = per_group_top_k(
        scored.withColumn("cosine", F.round("cosine", 6)),
        "query_id",
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        5,
    )
    for r in ranked.collect():
        approx_top[(r["query_id"], r["rank"])] = (r["neighbor_id"], r["cosine"])
    for r in exact.collect():
        nid, cos = approx_top[(r["query_id"], r["rank"])]
        assert nid == r["neighbor_id"]
        assert cos == pytest.approx(r["cosine"], abs=1e-6)


def test_ann_plans_stream_once_no_pair_join(spark, emb):
    """Scale discipline for the ANN paths: the corpus must stream once
    through Arrow (no nested-loop / cartesian pair join materializing
    vector pairs), and the LSH path's only exchange is the one hash
    partition on bucket feeding the per-bucket scorer."""
    import re

    from spark_streaming_kafka_spark.plans.inspect import explain_str

    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = explain_str(sim.cosine_topk(emb, queries, k=5), "simple")
    assert "BroadcastNestedLoopJoin" not in bf
    assert "CartesianProduct" not in bf
    assert "MapInPandas" in bf

    lsh = explain_str(sim.lsh_cosine_topk(emb, k=5), "simple")
    assert "BroadcastNestedLoopJoin" not in lsh
    assert "CartesianProduct" not in lsh
    assert "SortMergeJoin" not in lsh and "BroadcastHashJoin" not in lsh
    assert len(re.findall(r"Exchange hashpartitioning\(bucket", lsh)) == 1
