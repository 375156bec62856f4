"""Suite-wide physical-plan audit: every registry query is planned at
sf0.001 and checked for the red flags that pass value checks but die at
scale. Catches regressions the per-query plan tests don't cover."""

from __future__ import annotations

import pytest

from spark_streaming_kafka_spark.plans.inspect import explain_str
from spark_streaming_kafka_spark.queries import REGISTRY

#: Queries whose SEMANTICS are exact all-pairs (their oracle is the
#: quadratic ground truth; each has a documented sub-quadratic sibling).
ALL_PAIRS_BY_DESIGN = {
    # the two exact-ground-truth twins, each with a driver-green
    # sub-quadratic sibling (embedding_near_dup_lsh /
    # semantic_dedup_clusters_lsh):
    "embedding_near_dup",      # exact pinned; LSH sibling is gated in the operator
    "semantic_dedup_clusters", # exact pairs feed CC; same pinning
}

#: Trains ALS / collects at build time — planned but notably slower.
SLOW_BUILD = {"als_recommend_topk", "als_recommend_topk_shape"}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_product_in_plan(spark, sf_dir, name):
    if name in SLOW_BUILD:
        pytest.skip("model training at plan-build time; covered by rows-only gate")
    fn, _ = REGISTRY[name]
    plan = explain_str(fn(spark, sf_dir), "simple")
    if name in ALL_PAIRS_BY_DESIGN:
        return  # quadratic by contract, documented at the operator
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a nested-loop join (unpushable predicate?)"
    )


def test_embedding_lsh_query_is_bucketed(spark, sf_dir):
    """The driver-visible production near-dup path must stay out of the
    all-pairs allowlist AND plan the per-bucket gemm, not a self-join:
    its sibling `embedding_near_dup` pins exact semantics; this one pins
    the scale plan."""
    assert "embedding_near_dup_lsh" not in ALL_PAIRS_BY_DESIGN
    fn, _ = REGISTRY["embedding_near_dup_lsh"]
    plan = explain_str(fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # per-(rotation, bucket) scoring runs as grouped pandas, and the only
    # join in the plan is dropDuplicates' aggregation — no SortMergeJoin
    # of the corpus against itself.
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan


def test_passjoin_candidate_stage_is_narrow_and_pinned(spark, sf_dir):
    """Pins the two halves of the Pass-Join memory fix (the sf0.1
    default-heap OOM): (a) the signature-join stage width is an
    EXPLICIT user repartition — AQE coalesces shuffles by input bytes
    and is blind to candidate-join output blowup, so leaving the width
    to AQE plans a handful of fat tasks whose partial dedup
    aggregation exhausts a 1g-heap session; (b) string bodies never
    ride the signature rows — candidates are deduplicated as ids only
    and the two strings are fetched back per DISTINCT pair."""
    from spark_streaming_kafka_spark.operators.dedup import (
        passjoin_edit_distance_pairs,
    )
    from spark_streaming_kafka_spark.sources.readers import load_table

    part = load_table(spark, sf_dir, "part")
    cand = passjoin_edit_distance_pairs(
        part, "p_brand", "p_name", "p_partkey", max_dist=2, candidates_only=True
    )
    plan = explain_str(cand, "simple")
    # (a) pinned width: the signature-key exchange is user-specified,
    # exempt from AQE coalescing.
    assert "REPARTITION_BY_NUM" in plan, (
        "signature-join stage width left to AQE — output-blowup OOM risk"
    )
    # (b) narrow candidates: the dedup aggregate carries ids only, no
    # renamed string-body columns survive to the candidate output.
    assert "__sa" not in plan and "__sb" not in plan, (
        "string bodies flow through the candidate join/dedup"
    )

    full = passjoin_edit_distance_pairs(
        part, "p_brand", "p_name", "p_partkey", max_dist=2
    )
    fplan = explain_str(full, "simple")
    # the codegen'd verify survives (textually repeated across the
    # Filter/Project pair that shares the expression)
    assert "levenshtein" in fplan


# ---------------------------------------------------------------------
# Positive join-strategy pins (r10): the negative bans above catch
# cartesians, but a regression that silently DROPS a broadcast hint
# (dim-side sort-merge of a 5-row region table against the fact scan)
# passes them and only shows up as a bench delta. Pin the intended
# strategy on the headline join queries so it turns the suite red.
# ---------------------------------------------------------------------

@pytest.mark.parametrize(
    "name",
    ["top_revenue_join", "salted_bigjoin_revenue", "etl_ratings_pipeline"],
)
def test_dim_joins_stay_broadcast(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    plan = explain_str(fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan, (
        f"{name}: dimension join lost its broadcast (sort-merge of a "
        "dim table against the fact scan at 100 TB)"
    )


def test_etl_fact_fact_join_is_shuffled_hash(spark, sf_dir):
    """etl_ratings_pipeline's triplets x user-totals join is fact-fact:
    neither side broadcasts at scale, and SortMergeJoin would add two
    sorts a hash join doesn't need. The SHUFFLE_HASH hint is the r8
    tuning win — pin it."""
    fn, _ = REGISTRY["etl_ratings_pipeline"]
    plan = explain_str(fn(spark, sf_dir), "simple")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_click_view_is_join_free(spark, sf_dir):
    """The as-of query's scale guarantee is NOT a broadcast — it is the
    union + fill-forward-window plan (operators/asof.py): one shuffle on
    the key, no range join, no join operator at all. Pin that."""
    fn, _ = REGISTRY["asof_click_view"]
    plan = explain_str(fn(spark, sf_dir), "simple")
    assert "Join" not in plan, "asof gained a join — union+window plan lost"
    assert "Window" in plan


def test_triangle_stages_width_pinned(spark, sf_dir):
    """Triangle counting's two heavy stages (adjacency collect_list and
    the array_intersect closure) must keep their explicit widths: AQE
    coalesces on shuffle BYTES and cannot see the array-expansion work
    — unpinned, both ran as single multi-second tasks at sf0.1."""
    fn, _ = REGISTRY["graph_triangle_counts"]
    plan = explain_str(fn(spark, sf_dir), "simple")
    assert plan.count("REPARTITION_BY_NUM") >= 2, (
        "triangle_counts lost a width pin — AQE will single-task the "
        "intersect stage"
    )
    assert "CartesianProduct" not in plan
