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


def test_dedup_clusters_minhash_default_matches_exact(docs):
    """Default (sub-quadratic MinHash-LSH candidates + exact verify)
    must produce the same clusters as the unbounded exact path."""
    approx = {(r["doc_id"], r["cluster_id"])
              for r in dd.dedup_clusters(docs, threshold=0.5).collect()}
    exact = {(r["doc_id"], r["cluster_id"])
             for r in dd.dedup_clusters(docs, threshold=0.5, candidates="exact").collect()}
    assert approx == exact
    assert {(0, 0), (1, 0), (3, 0)} <= approx  # 0≈1, 0=3 collapse together


def test_dedup_clusters_default_has_no_unbounded_shingle_join(docs):
    """Guard against the stop-shingle explosion: a corpus where every doc
    shares one common shingle but only planted pairs are near-dups must
    not blow candidate generation up to all-pairs. With the MinHash
    default, LSH candidates stay ≈ true pairs (the exact inverted-index
    join would touch n²/2 pairs through the shared shingle)."""
    spark = docs.sparkSession
    common = "the quick fox"  # one shared 3-shingle across ALL docs
    rows = [
        (i, common + " " + " ".join(f"u{i}x{j}" for j in range(12)))
        for i in range(40)
    ]
    rows += [(100, f"{common} planted pair text that is long enough alpha"),
             (101, f"{common} planted pair text that is long enough beta")]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    cand = dd.minhash_lsh_pairs(corpus, threshold=0.5, verify=False)
    n_cand = cand.count()
    # band-collision odds at jaccard ≈ 1/28 are ~1e-2 per pair: candidates
    # stay ≈ true pairs; the exact inverted index would join all 42·41/2
    # = 861 pairs through the shared shingle
    assert n_cand <= 50
    clusters = dd.dedup_clusters(corpus, threshold=0.5)
    by_cluster = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    assert by_cluster.get(100) == {100, 101}


def test_cc_loop_frees_superseded_checkpoints(spark):
    """Each CC iteration must free the previous round's localCheckpoint
    blocks; only the final labels checkpoint may stay resident."""
    from spark_streaming_kafka_spark.operators.dedup import (
        _persistent_rdd_ids,
        connected_components,
    )

    sc = spark.sparkContext
    before = _persistent_rdd_ids(sc)
    # chain of diameter 5 ⇒ several propagation rounds; force the
    # distributed loop (the driver-finish gate would shortcut it)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    labels = connected_components(edges, driver_finish_below=0)
    assert {r["component"] for r in labels.collect()} == {0}
    leaked = _persistent_rdd_ids(sc) - before
    assert len(leaked) <= 1  # final labels checkpoint only


def test_cc_driver_finish_matches_distributed_loop(spark):
    """The size-gated driver union-find must produce the identical
    (node, component=min id) labeling as the Pregel loop, including on
    graphs with multiple components, chains, and isolated-pair edges."""
    import random

    from spark_streaming_kafka_spark.operators.dedup import connected_components

    rnd = random.Random(11)
    # several chains + stars + disjoint pairs over a sparse id space
    edge_list = []
    base = 0
    for size in (2, 3, 7, 1, 5):
        ids = [base + i * 3 for i in range(size + 1)]
        edge_list += list(zip(ids, ids[1:]))  # chain
        base += 1000
    edge_list += [(5000 + rnd.randrange(50), 5000 + rnd.randrange(50)) for _ in range(30)]
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")

    fast = connected_components(edges)  # gate takes the driver path
    slow = connected_components(edges, driver_finish_below=0)  # forced loop
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


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


def test_embedding_near_dup_bucketed_path_no_self_join(spark):
    """Above the size gate, embedding_near_dup_pairs must route through
    sign-LSH buckets: no join operator at all (pairs come from in-bucket
    gemms), and near-identical pairs are still found."""
    import math

    from spark_streaming_kafka_spark.plans.inspect import explain_str

    dim = 16
    rows = []
    for c in range(20):  # 20 clusters × 3 near-identical vectors
        base = [math.sin(0.7 * (c + 1) * (i + 1)) for i in range(dim)]
        for j in range(3):
            rows.append((c * 10 + j, [v + 0.0005 * j * ((i % 3) - 1)
                                      for i, v in enumerate(base)]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    bucketed = dd.embedding_near_dup_pairs(
        vecs, threshold=0.999, exact_below=0, n_planes=6, n_rotations=4, dim=dim
    )
    plan = explain_str(bucketed, "simple")
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan

    exact = dd.embedding_near_dup_pairs(vecs, threshold=0.999, exact_below=10**9)
    got = {(r["id_a"], r["id_b"]) for r in bucketed.collect()}
    want = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert want  # fixture really contains near-dup pairs
    assert got == want  # θ≈0 pairs collide in some rotation w.p. ≈ 1


def test_ivf_kmeans_codebook_recall(spark, emb):
    """IVF with a REAL KMeans codebook (the production path the
    deterministic sample stands in for): k rows per query, and recall
    vs exact brute-force stays useful at nprobe=4/16."""
    ivf = sim.ivf_topk(emb, n_centroids=8, nprobe=4, k=5, n_queries=3,
                       codebook="kmeans")
    rows = ivf.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(by_q) == {0, 1, 2} and all(len(v) == 5 for v in by_q.values())

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk(emb, queries, k=5).collect()
    exact_by_q = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(
        len(by_q[q] & exact_by_q[q]) for q in exact_by_q
    ) / sum(len(v) for v in exact_by_q.values())
    assert recall >= 0.5  # half the cells probed ⇒ well above chance


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


def test_label_centroid_similarity_known_values(spark):
    from spark_streaming_kafka_spark.operators.similarity import (
        centroid_similarity,
        label_centroids,
    )

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.0, 1.0]),   # label-0 centroid = [0.5, 0.5]
        (3, 1, [3.0, 4.0]),   # singleton label: sim to own centroid = 1.0
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    cents = {r["label"]: r["centroid"] for r in label_centroids(df).collect()}
    assert cents[0] == [0.5, 0.5]
    assert cents[1] == [3.0, 4.0]
    sims = {r["vec_id"]: r["centroid_sim"] for r in centroid_similarity(df).collect()}
    assert abs(sims[1] - 0.707107) < 1e-6  # cos([1,0],[.5,.5]) = 1/sqrt 2
    assert abs(sims[2] - 0.707107) < 1e-6
    assert sims[3] == 1.0


def test_centroid_scoring_plan_broadcasts_centroids(spark, sf_dir):
    from spark_streaming_kafka_spark.operators.similarity import centroid_similarity
    from spark_streaming_kafka_spark.plans.inspect import explain_str
    from spark_streaming_kafka_spark.sources.readers import load_table

    out = centroid_similarity(load_table(spark, sf_dir, "embeddings"))
    plan = explain_str(out, "formatted")
    assert "BroadcastHashJoin" in plan  # scoring never shuffles vectors
    assert "SortMergeJoin" not in plan


def test_minhash_strategy_parity(spark, tables):
    """pandas (default) and expr strategies produce bit-identical
    signatures, including dropping <k-token docs on both paths."""
    from spark_streaming_kafka_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = tables["documents"].limit(200)
    extra = spark.createDataFrame(
        [(10**9, "one two"), (10**9 + 1, ""), (10**9 + 2, "a b c d")],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    a = {
        r["doc_id"]: r["signature"]
        for r in minhash_signatures(both, strategy="pandas").collect()
    }
    b = {
        r["doc_id"]: r["signature"]
        for r in minhash_signatures(both, strategy="expr").collect()
    }
    assert a == b
    assert 10**9 not in a and 10**9 + 1 not in a  # <k tokens → no row
    assert 10**9 + 2 in a


def test_simhash_strategy_parity(spark, tables):
    from spark_streaming_kafka_spark.operators.dedup import (
        simhash_fingerprints,
    )

    docs = tables["documents"].limit(200)
    extra = spark.createDataFrame(
        [(10**9, ""), (10**9 + 1, "solo")], "doc_id long, text string"
    )
    both = docs.select("doc_id", "text").unionByName(extra)
    a = {
        r["doc_id"]: r["fingerprint"]
        for r in simhash_fingerprints(both, strategy="pandas").collect()
    }
    b = {
        r["doc_id"]: r["fingerprint"]
        for r in simhash_fingerprints(both, strategy="expr").collect()
    }
    assert a == b
    assert 10**9 not in a and 10**9 + 1 in a


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    from pyspark.sql import functions as F

    from spark_streaming_kafka_spark.functions.vectors import (
        cosine_similarity,
        dequantize_int8,
        int8_scale,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0]), (3, [127.0, -127.0, 63.5])],
        "vec_id long, embedding array<double>",
    )
    out = df.select(
        "vec_id", "embedding", int8_scale(F.col("embedding")).alias("s")
    ).withColumn("q", quantize_int8(F.col("embedding"), F.col("s")))
    rows = {r["vec_id"]: r for r in out.collect()}
    assert rows[2]["s"] == 0.0 and rows[2]["q"] == [0, 0, 0]  # zero guard
    assert rows[3]["q"] == [127, -127, 64]  # half rounds via floor(x+.5)
    assert max(abs(x) for x in rows[1]["q"]) == 127  # max maps to ±127
    rec = out.filter("vec_id != 2").select(
        cosine_similarity(
            F.col("embedding"), dequantize_int8(F.col("q"), F.col("s"))
        ).alias("c")
    ).collect()
    assert all(r["c"] > 0.999 for r in rec)


def test_minhash_simhash_string_ids(spark):
    """Non-bigint doc ids flow through the pandas strategy (the id
    type is taken from the input schema, not hard-coded)."""
    from spark_streaming_kafka_spark.operators.dedup import (
        minhash_signatures,
        simhash_fingerprints,
    )

    df = spark.createDataFrame(
        [("doc://a", "one two three four"), ("doc://b", "five six seven")],
        "doc_id string, text string",
    )
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(df).collect()}
    assert set(sigs) == {"doc://a", "doc://b"}
    assert all(len(s) == 32 for s in sigs.values())
    fps = {r["doc_id"]: r["fingerprint"] for r in simhash_fingerprints(df).collect()}
    assert set(fps) == {"doc://a", "doc://b"}


def test_ivf_empty_query_set(spark, emb):
    """No vectors below the query-id threshold → empty typed result,
    not a numpy crash at plan-build time."""
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 10**6)
    out = sim.ivf_topk(shifted, n_queries=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]


def test_diversity_sample_balances_clusters(spark):
    """Every cluster contributes at most per_cluster rows, ranks are
    dense from 1, and the kept members are the most-central ones."""
    import numpy as np

    from spark_streaming_kafka_spark.operators.similarity import (
        diversity_sample,
    )

    rng = np.random.default_rng(3)
    # two tight blobs far apart + noise; ids 0..1 are the blob seeds so
    # the deterministic "sample" codebook (lowest ids) lands one
    # centroid per blob
    a = rng.normal(0, 0.05, (30, 8)) + np.array([5.0] + [0] * 7)
    b = rng.normal(0, 0.05, (30, 8)) + np.array([0] * 7 + [5.0])
    vecs = np.vstack([a[:1], b[:1], a[1:], b[1:]])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = diversity_sample(emb, per_cluster=5, n_centroids=2).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert set(by_cluster) == {0, 1}
    for cid, rows in by_cluster.items():
        assert len(rows) == 5  # balanced despite 30/30 blob sizes
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4, 5]
        # kept = most central: every kept centrality >= any dropped one
        assert min(r["centrality"] for r in rows) > 0.9
    # blob membership respected: cluster 0 seeded by vec 0 holds a-blob
    a_ids = {0} | set(range(2, 31))
    got_c0 = {r["vec_id"] for r in by_cluster[0]}
    assert got_c0 <= a_ids


def test_semdedup_prune_rules(spark):
    """Within-cluster domination: lowest id survives, near-dups of it
    prune with pruned_by pointing at the lowest dominator; cross-cluster
    near-dups are NOT pruned (by design — the cluster is the blocking
    unit)."""
    import numpy as np

    from spark_streaming_kafka_spark.operators.similarity import semdedup_prune

    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.999, 0.001, 0.0, 0.0]   # near-dup of e1
    e3 = [0.0, 1.0, 0.0, 0.0]       # distinct direction
    rows = [
        (0, e1), (1, e3),        # ids 0,1 are the codebook (2 centroids)
        (2, e2),                 # near-dup of 0, same cluster
        (3, e1),                 # exact dup of 0, same cluster
        (4, [0.0, 0.999, 0.001, 0.0]),  # near-dup of centroid 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semdedup_prune(
        emb, threshold=0.95, n_centroids=2).collect()}
    assert out[0]["keep"] and out[0]["pruned_by"] is None
    assert out[1]["keep"]
    assert not out[2]["keep"] and out[2]["pruned_by"] == 0
    assert not out[3]["keep"] and out[3]["pruned_by"] == 0  # lowest dominator
    assert not out[4]["keep"] and out[4]["pruned_by"] == 1
    # cluster ids: 0-cluster holds {0,2,3}, 1-cluster holds {1,4}
    assert {v["cluster_id"] for k, v in out.items() if k in (0, 2, 3)} == {0}
    assert {v["cluster_id"] for k, v in out.items() if k in (1, 4)} == {1}


def test_pagerank_matches_python_reference(spark):
    """Fixed-iteration PageRank against a plain-Python power iteration
    on a small directed graph with a dangling node (mass leak must
    match — no redistribution in either implementation)."""
    from spark_streaming_kafka_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (4, 1)]  # 4 -> 1; 5 unseen
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_score"] for r in pagerank(df, iterations=5).collect()}

    nodes = {1, 2, 3, 4}
    n, d = len(nodes), 0.85
    out = {u: [v for s, v in edges if s == u] for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(5):
        nxt = {u: (1 - d) / n for u in nodes}
        for u in nodes:
            for v in out[u]:
                nxt[v] += d * r[u] / len(out[u])
        r = nxt
    assert set(got) == nodes
    for u in nodes:
        assert abs(got[u] - r[u]) < 1e-12, (u, got[u], r[u])
    # the cycle members outrank the dangling source
    assert got[1] > got[4] and got[2] > got[4]


def test_minhash_manifest_matches_planted(spark):
    """Incremental gate: a new batch matched against a signature-only
    manifest finds the planted near-copy, reports estimator=1.0 for the
    exact copy, and ties break to the smallest historical id."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    old = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # duplicate of 1 in history: tie target
            (3, "unrelated words about cooking pasta with garlic butter and sage and thyme leaves"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, base),                                  # exact copy
            (101, base.replace("tango", "whiskey")),      # near copy
            (102, "completely novel content that shares no shingles with anything at all here"),
        ],
        "doc_id long, text string",
    )
    manifest = dd.minhash_signatures(old)
    out = {
        r["doc_id"]: (r["dup_of"], r["est_jaccard"])
        for r in dd.minhash_manifest_matches(new, manifest, threshold=0.5).collect()
    }
    assert out[100] == (1, 1.0)  # tie between 1 and 2 → smallest id
    assert out[101][0] in (1, 2) and out[101][1] >= 0.5
    assert 102 not in out


def test_minhash_manifest_estimator_matches_signature_overlap(spark):
    """The reported estimate IS the matching-component fraction of the
    two signatures (computed independently here), not a recomputation
    from text."""
    old = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten eleven twelve")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(9, "one two three four five six seven eight nine ten eleven thirteen")],
        "doc_id long, text string",
    )
    s_old = old_sig = dd.minhash_signatures(old).first()["signature"]
    s_new = dd.minhash_signatures(new).first()["signature"]
    expected = round(sum(a == b for a, b in zip(s_new, s_old)) / 32.0, 6)
    rows = dd.minhash_manifest_matches(
        new, dd.minhash_signatures(old), threshold=0.0
    ).collect()
    if expected > 0:
        assert rows and rows[0]["est_jaccard"] == expected


# --- product quantization (similarity.pq_*) ---------------------------

def test_pq_encode_matches_numpy_reference(spark, emb):
    import numpy as np

    cb = sim.pq_codebook(emb, m=8, k=16)
    CB = np.asarray(cb, dtype=np.float64)
    assert CB.shape == (8, 16, 8)
    got = {r["vec_id"]: r for r in sim.pq_encode(emb, cb).collect()}
    ref_rows = {
        int(r[0]): np.asarray(list(r[1]), dtype=np.float64)
        for r in emb.limit(50).collect()
    }
    for vid, v in ref_rows.items():
        d2 = ((v.reshape(8, 1, 8) - CB) ** 2).sum(-1)
        assert list(d2.argmin(-1)) == list(got[vid]["codes"])
        assert abs(d2.min(-1).sum() - got[vid]["recon_err"]) < 1e-9


def test_pq_adc_matches_exhaustive_lookup(spark, emb):
    import numpy as np

    cb = sim.pq_codebook(emb, m=8, k=16)
    CB = np.asarray(cb, dtype=np.float64)
    out = sim.pq_adc_topk(emb, cb, n_queries=2, k=5).collect()
    allv = {
        int(r[0]): np.asarray(list(r[1]), dtype=np.float64)
        for r in emb.collect()
    }
    for qid in (0, 1):
        lut = ((allv[qid].reshape(8, 1, 8) - CB) ** 2).sum(-1)
        dists = {}
        for vid, v in allv.items():
            if vid == qid:
                continue
            codes = ((v.reshape(8, 1, 8) - CB) ** 2).sum(-1).argmin(-1)
            dists[vid] = sum(lut[j, codes[j]] for j in range(8))
        ref = sorted(dists.items(), key=lambda kv: (round(kv[1], 6), kv[0]))[:5]
        got = [
            (r["neighbor_id"], r["adc_dist"])
            for r in sorted(out, key=lambda r: r["rank"])
            if r["query_id"] == qid
        ]
        assert [(i, round(d, 6)) for i, d in ref] == got


def test_pq_kmeans_codebook_strategy(spark, emb):
    """The production (per-subspace Lloyd's) codebook plugs into the
    same encode/search path; reconstruction error must not be worse on
    average than the sample codebook it replaces."""
    cb_s = sim.pq_codebook(emb, m=8, k=8, strategy="sample")
    cb_k = sim.pq_codebook(emb, m=8, k=8, strategy="kmeans")
    import pyspark.sql.functions as F

    err_s = sim.pq_encode(emb, cb_s).agg(F.avg("recon_err")).first()[0]
    err_k = sim.pq_encode(emb, cb_k).agg(F.avg("recon_err")).first()[0]
    assert err_k <= err_s * 1.05


def test_lloyd_codebook_fixed_refines_and_stays_bounded(spark, emb):
    """The oracle-checkable trained codebook: iterations move the
    centroids off the init vectors, each cell's centroid is the mean
    of its members under the ivf_assign rule, and the k x dim shape is
    stable."""
    import numpy as np

    cb0 = sim.lloyd_codebook_fixed(emb, n_centroids=4, iterations=0)
    cb2 = sim.lloyd_codebook_fixed(emb, n_centroids=4, iterations=2)
    assert [c for c, _ in cb0] == [0, 1, 2, 3] == [c for c, _ in cb2]
    dim = len(cb0[0][1])
    assert all(len(v) == dim for _, v in cb2)
    # iterations=0 IS the sample codebook (same init convention)
    init = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in emb.filter(F.col("vec_id") < 4)
        .select("vec_id", "embedding")
        .collect()
    )
    assert all(
        np.allclose(v, init[i][1]) for i, (_, v) in enumerate(cb0)
    )
    assert any(
        not np.allclose(v0, v2)
        for (_, v0), (_, v2) in zip(cb0, cb2)
    )
    # one more iteration from the returned centroids reproduces the
    # operator's own update: centroid = per-dim mean of assigned cell
    assigned = sim.ivf_assign(emb, cb2, out_col="cid")
    pdf = assigned.select("cid", "embedding").toPandas()
    for cid, vec in sim.lloyd_codebook_fixed(emb, n_centroids=4, iterations=3):
        members = np.array(
            [np.asarray(v, dtype=np.float64)
             for v in pdf[pdf["cid"] == cid]["embedding"]]
        )
        if len(members):
            assert np.allclose(vec, members.mean(axis=0), atol=1e-9)


def test_lloyd_codebook_fixed_missing_init_raises(spark):
    import pytest

    df = spark.createDataFrame(
        [(5, [1.0, 0.0]), (6, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError):
        sim.lloyd_codebook_fixed(df, n_centroids=4)


def test_pq_adc_tie_cut_is_partition_invariant(spark):
    """>k vectors with IDENTICAL PQ codes tie exactly on ADC distance;
    the per-batch partial top-k must keep the lowest neighbor ids (the
    final window's tiebreak), not whatever batch order delivered —
    regression for the lexsort cut."""
    import numpy as np

    dim, k = 8, 3
    # ids 0..1 are the codebook/init ids (k=2 codebook); 20 clones of
    # the same vector => identical codes => identical ADC distance.
    # The clones arrive in one partition in DESCENDING id order: a
    # batch-order cut would keep 29, 28, 27 and the rightful winners
    # 10, 11, 12 would never reach the final window.
    rows = [(0, [1.0] * dim), (1, [0.0] * dim)]
    rows += [(29 - i, [1.0] * dim) for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).coalesce(1)
    cb = sim.pq_codebook(emb, m=2, k=2)
    out = sim.pq_adc_topk(emb, cb, n_queries=1, k=k).collect()
    got = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # query 0's nearest ties are every clone; lowest ids win: 10, 11, 12
    assert got == [10, 11, 12]


def test_max_cosine_to_set_flags_and_ties(spark):
    ref = spark.createDataFrame(
        [(0, [1.0, 0.0]), (7, [1.0, 0.0]), (9, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    emb = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0]), (102, [1.0, 1.0]),
         (103, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in sim.max_cosine_to_set(emb, ref, 0.9).collect()}
    # exact tie between refs 0 and 7 -> lowest ref id wins
    assert got[100]["nearest_ref_id"] == 0 and got[100]["flagged"]
    assert got[101]["nearest_ref_id"] == 9 and got[101]["flagged"]
    assert abs(got[102]["max_cosine"] - 0.707107) < 1e-6
    assert not got[102]["flagged"]
    # best of {-1 (refs 0,7), 0 (ref 9)} is 0.0 via ref 9
    assert got[103]["max_cosine"] == 0.0
    assert got[103]["nearest_ref_id"] == 9 and not got[103]["flagged"]


def test_max_cosine_to_set_empty_ref_raises(spark):
    import pytest

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    ref = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        sim.max_cosine_to_set(emb, ref)


def test_max_cosine_to_set_zero_norm_corpus_row_is_nan(spark):
    ref = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in sim.max_cosine_to_set(emb, ref, 0.5).collect()}
    # zero-norm corpus vector: documented null fallback (batch-local
    # NaN crosses the Arrow boundary as null), never flagged
    assert got[1]["max_cosine"] is None and not got[1]["flagged"]
    assert got[2]["max_cosine"] == 1.0 and got[2]["flagged"]


def test_contrastive_pairs_semantics(spark):
    # label 0 cluster near x-axis, label 1 cluster near y-axis, plus a
    # label-1 vector close to the query: the hard negative.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),       # query
            (1, [0.99, 0.14], 0),     # positive (same label, closest)
            (2, [0.5, 0.86], 0),      # same label, farther
            (3, [0.97, 0.24], 1),     # HARD negative (diff label, close)
            (4, [0.0, 1.0], 1),       # diff label, far
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = emb.filter("vec_id = 0")
    got = sim.contrastive_pairs(emb, q).collect()
    assert len(got) == 1
    r = got[0]
    assert r["query_id"] == 0 and r["label"] == 0
    assert r["positive_id"] == 1
    assert r["negative_id"] == 3
    assert r["positive_cos"] > r["negative_cos"] > 0.9


def test_contrastive_pairs_drops_one_legged_queries(spark):
    # query's label is unique -> no positive leg -> dropped
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 5), (1, [0.9, 0.1], 1), (2, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    q = emb.filter("vec_id = 0")
    assert sim.contrastive_pairs(emb, q).count() == 0


def test_winnowing_shared_run_guarantee_and_density(spark):
    import random

    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(200)]
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    a = " ".join(rng.choice(vocab) for _ in range(40)) + " " + shared
    b = shared + " " + " ".join(rng.choice(vocab) for _ in range(40))
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    fp = dd.winnowing_fingerprints(docs, k=3, w=4)
    rows = fp.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # SWA guarantee: a shared run of >= w+k-1 tokens shares a fingerprint
    assert by_doc[1] & by_doc[2]
    # density: ~2/(w+1) of the ~44 k-gram hashes, far fewer than all
    n_grams = 40 + 6 - 2
    assert len(by_doc[1]) < n_grams * 0.6


def test_winnowing_rightmost_tie_and_short_docs(spark):
    docs = spark.createDataFrame(
        [
            # 4 tokens -> 2 trigram hashes -> fewer than w=4: one global-min window
            (1, "a b c d"),
            # repeated identical k-grams -> min ties -> rightmost position wins
            (2, "x y z x y z x y z x y z"),
            (3, "ab"),  # < k tokens -> nothing
        ],
        "doc_id long, text string",
    )
    out = dd.winnowing_fingerprints(docs, k=3, w=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    assert len(by_doc[1]) == 1  # single window over the short doc
    assert 3 not in by_doc
    # doc 2: "x y z" appears at positions 1,4,7,10 — every window's min
    # tie resolves to the window's RIGHTMOST copy, and selections dedupe
    poss = sorted(p for p, _ in by_doc[2])
    assert poss == sorted(set(poss))
    # rerun-stability
    again = dd.winnowing_fingerprints(docs, k=3, w=4).collect()
    assert sorted((r["doc_id"], r["pos"], r["fp"]) for r in again) == sorted(
        (r["doc_id"], r["pos"], r["fp"]) for r in out
    )


def test_contrastive_pairs_zero_norm_rows(spark):
    import pytest as _pytest

    # zero-norm corpus row never matches; zero-norm query raises
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 0.0], 0),   # zero-norm: must not hijack the argmax
            (2, [0.9, 0.1], 0),
            (3, [0.1, 0.9], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = emb.filter("vec_id = 0")
    r = sim.contrastive_pairs(emb, q).collect()[0]
    assert r["positive_id"] == 2  # not the NaN row
    assert r["negative_id"] == 3

    zq = spark.createDataFrame(
        [(9, [0.0, 0.0], 0)], "vec_id long, embedding array<float>, label int"
    )
    with _pytest.raises(ValueError, match="zero-norm"):
        sim.contrastive_pairs(emb, zq)


def test_winnowing_overlap_pairs_guarantee_and_cap(spark):
    from spark_streaming_kafka_spark.operators.dedup import (
        winnowing_overlap_pairs,
    )

    import random

    rng = random.Random(13)
    shared_run = " ".join(f"s{rng.randrange(400)}" for _ in range(30))
    noise = lambda n: " ".join(f"n{rng.randrange(400)}" for _ in range(n))
    docs = spark.createDataFrame(
        [
            (1, noise(20) + " " + shared_run + " " + noise(20)),
            (2, shared_run + " " + noise(40)),   # shares the 30-token run
            (3, noise(60)),                      # unrelated
        ],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["n_shared"]
           for r in winnowing_overlap_pairs(docs, k=3, w=4, min_shared=1).collect()}
    # winnowing guarantee: a shared >= w+k-1 token run forces >= 1
    # shared fingerprint — a 30-token run forces many
    assert (1, 2) in out and out[(1, 2)] >= 2
    # ordering normalized
    assert all(a < b for a, b in out)
    # min_shared filter tightens monotonically
    strict = {(r["id_a"], r["id_b"])
              for r in winnowing_overlap_pairs(
                  docs, k=3, w=4, min_shared=out[(1, 2)] + 1).collect()}
    assert (1, 2) not in strict
    # max_df cap: with every fingerprint capped away, no pairs at all
    capped = winnowing_overlap_pairs(docs, k=3, w=4, min_shared=1, max_df=0).collect()
    assert capped == []


def test_random_projection_preserves_pairwise_distance(spark):
    import math

    from pyspark.sql import functions as F
    from spark_streaming_kafka_spark.functions.vectors import (
        jl_sign_matrix,
        random_project,
    )

    # matrix is a pure function of (dims, salt)
    assert jl_sign_matrix(8, 4) == jl_sign_matrix(8, 4)
    assert jl_sign_matrix(8, 4, "a") != jl_sign_matrix(8, 4, "b")

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(40)
    rows = (
        df.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            random_project(F.col("embedding").cast("array<double>"), 64, 32).alias("p"),
        )
        .collect()
    )
    assert all(len(r["p"]) == 32 for r in rows)

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    # median pairwise distortion stays near 1 (JL guarantee is
    # probabilistic per pair; the aggregate must be tight)
    ratios = []
    for i in range(0, 20):
        a, b = rows[i], rows[i + 20]
        din = d(a["v"], b["v"])
        if din > 0:
            ratios.append(d(a["p"], b["p"]) / din)
    ratios.sort()
    assert 0.75 < ratios[len(ratios) // 2] < 1.25


def test_winnowing_candidate_volume_linear_on_clone_growth(spark):
    """The scale claim behind DOCS_SCALE_PROOF's winnowing_overlap_pairs
    row, pinned structurally rather than by timing (r8 verdict item):
    the join work of the inverted-index pass is sum_fp C(df,2) candidate
    rows. (1) On DIVERSE documents that volume is a vanishing fraction
    of all-pairs — only documents sharing a selected fingerprint ever
    meet. (2) Replicating the corpus with token-disjoint copies (the
    exact construction of the 10x proof) grows the candidate volume
    LINEARLY, not quadratically — each copy's fingerprint universe is
    disjoint, so the observed 10x-corpus growth is honest output-bound
    work, not a banding defect."""
    import random

    import pyspark.sql.functions as F

    from spark_streaming_kafka_spark.operators import dedup as dd

    rng = random.Random(13)
    vocab = [f"tok{i}" for i in range(5000)]
    n = 400
    base = [
        (i, " ".join(rng.choice(vocab) for _ in range(60))) for i in range(n)
    ]
    # plant 8 clone pairs (shared 20-token run)
    for j in range(8):
        run = base[j][1].split()[:20]
        base.append((n + j, " ".join(run + [rng.choice(vocab) for _ in range(40)])))

    def cand_volume(rows):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fps = (
            dd.winnowing_fingerprints(docs, k=3, w=4)
            .select("doc_id", "fp")
            .distinct()
        )
        df = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
        row = df.agg(
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("cand")
        ).collect()[0]
        return int(row["cand"] or 0)

    v1 = cand_volume(base)
    n_docs = len(base)
    all_pairs = n_docs * (n_docs - 1) // 2
    # (1) subquadratic on diverse data: <2% of all-pairs ever meet
    assert v1 < all_pairs * 0.02, f"{v1} candidates vs {all_pairs} all-pairs"

    # (2) token-disjoint replication (the 10x proof's construction)
    def shifted(copy):
        return [
            (d + copy * 100000, " ".join(f"{t}_{copy}" for t in txt.split()))
            for d, txt in base
        ]

    v2 = cand_volume(base + shifted(1))
    v3 = cand_volume(base + shifted(1) + shifted(2))
    # linear: 2x corpus ~ 2x candidates, 3x ~ 3x (each copy disjoint);
    # quadratic banding failure would give ~4x / ~9x.
    assert v2 <= v1 * 2.3, (v1, v2)
    assert v3 <= v1 * 3.5, (v1, v2, v3)
    # and the planted pairs are still found in the replicated corpus
    found = {
        (r["id_a"], r["id_b"])
        for r in dd.winnowing_overlap_pairs(
            spark.createDataFrame(base, "doc_id long, text string"),
            k=3, w=4, min_shared=1,
        ).collect()
    }
    assert {(j, n + j) for j in range(8)} <= found


def test_fused_band_keys_match_two_phase_derivation(spark, tables):
    """The fused signature+banding Arrow pass must emit exactly the
    (doc_id, band, key) rows _band_keys derives from the signature
    table — the r10 stage fusion is an optimization, never a semantics
    change (this is what keeps dedup_minhash_lsh's oracle exact)."""
    from spark_streaming_kafka_spark.operators.dedup import (
        _band_keys,
        _minhash_band_keys_pandas,
        minhash_signatures,
    )

    docs = tables["documents"].limit(300).select("doc_id", "text")
    sigs = minhash_signatures(docs, 32, 3, "text", "doc_id")
    two_phase = set(map(tuple, _band_keys(sigs, "doc_id", 32, 16).collect()))
    fused = set(
        map(
            tuple,
            _minhash_band_keys_pandas(docs, 32, 16, 3, "text", "doc_id").collect(),
        )
    )
    assert fused == two_phase and len(fused) > 0
