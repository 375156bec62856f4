"""RecommendationEngine: seeded-RMSE gate (the reference's only
correctness practice, spark_music.py:52-56), API parity behaviors, and
model persistence."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spark_streaming_kafka_spark.recommend import RecommendationEngine


@pytest.fixture(scope="module")
def ratings(spark):
    """Synthetic ratings with real structure: 60 users × 40 songs, block
    preference pattern + deterministic jitter so ALS has signal."""
    rows = []
    for u in range(60):
        for s in range(40):
            if (u * 7 + s * 3) % 5 < 3:  # ~60% density, deterministic
                base = 4.0 if (u % 2 == s % 2) else 2.0
                rows.append((u, s, base + ((u + s) % 3 - 1) * 0.5))
    return spark.createDataFrame(rows, "user_id int, song_id int, rating double").cache()


@pytest.fixture(scope="module")
def engine(spark, ratings):
    eng = RecommendationEngine(spark, ratings, rank=4, max_iter=10, min_ratings=1)
    eng.retrain()
    return eng


def test_rmse_below_threshold(spark, engine, ratings):
    train, test = ratings.randomSplit([0.8, 0.2], seed=0)
    eng = RecommendationEngine(spark, train, rank=4, min_ratings=1)
    eng.retrain()
    assert eng.evaluate_rmse(test) < 1.2  # block structure ⇒ learnable


def test_top_ratings_excludes_rated(engine, ratings):
    rated = {r["song_id"] for r in ratings.filter(F.col("user_id") == 3).collect()}
    recs = engine.get_top_ratings(3, k=10).collect()
    assert 0 < len(recs) <= 10
    assert all(r["song_id"] not in rated for r in recs)
    scores = [r["predicted_rating"] for r in recs]
    assert scores == sorted(scores, reverse=True)


def test_batch_serving_matches_per_user_path(spark, engine):
    """get_top_ratings_for_users == per-user get_top_ratings for every
    user, and the batch plan is ONE job with no per-user Union chain
    (the round-1 streaming loop launched one job per distinct user)."""
    users = spark.createDataFrame([(3,), (5,), (7,)], "user_id int")
    batch = engine.get_top_ratings_for_users(users, k=10)
    assert "Union" not in batch._jdf.queryExecution().optimizedPlan().toString()
    got = {
        u: [(r["song_id"], round(r["predicted_rating"], 4)) for r in rows]
        for u, rows in _by_user(batch.collect()).items()
    }
    for uid in (3, 5, 7):
        want = [
            (r["song_id"], round(r["predicted_rating"], 4))
            for r in engine.get_top_ratings(uid, k=10).collect()
        ]
        assert got[uid] == want


def _by_user(rows):
    out = {}
    for r in rows:
        out.setdefault(r["user_id"], []).append(r)
    for u in out:
        out[u].sort(key=lambda r: (-r["predicted_rating"], r["song_id"]))
    return out


def test_recommend_for_all_users_shape(engine):
    recs = engine.recommend_for_all_users(k=3)
    counts = recs.groupBy("user_id").count().collect()
    assert all(r["count"] == 3 for r in counts)
    assert len(counts) == 60


def test_als_factors_reconstruct_predictions(spark, engine):
    """Factor-level pin: model.transform must equal the numpy dot product
    of the persisted user/item factor matrices — the factors are real and
    the serving path uses exactly them (reference persists rank-4 factors
    under music_lens_als/data/{user,product})."""
    import numpy as np

    m = engine.model
    uf = {r["id"]: np.array(r["features"], dtype=np.float64)
          for r in m.userFactors.collect()}
    vf = {r["id"]: np.array(r["features"], dtype=np.float64)
          for r in m.itemFactors.collect()}
    assert all(len(v) == 4 for v in uf.values())  # rank pinned
    pairs = spark.createDataFrame(
        [(u, s) for u in range(5) for s in range(8)], "user_id int, song_id int"
    )
    preds = m.transform(pairs).collect()
    assert len(preds) == 40
    for r in preds:
        want = float(uf[r["user_id"]] @ vf[r["song_id"]])
        assert r["prediction"] == pytest.approx(want, abs=1e-5)


def test_als_recovers_block_structure(engine):
    """Prediction-level pin: on the parity-block fixture (same-parity
    user/song pairs rated ~4.0, cross-parity ~2.0) the seeded model must
    rank same-parity songs on top for the large majority of users."""
    recs = engine.recommend_for_all_users(3).collect()
    assert len(recs) == 180
    agree = sum(1 for r in recs if r["user_id"] % 2 == r["song_id"] % 2)
    assert agree / len(recs) > 0.8


def test_als_same_seed_reproduces_topk(spark, ratings):
    """Determinism pin: two independent trainings with the same seed and
    data must serve identical top-k lists (what makes the rows-only
    als_recommend_topk driver check meaningful)."""
    outs = []
    for _ in range(2):
        eng = RecommendationEngine(spark, ratings, rank=4, min_ratings=1)
        eng.retrain()
        outs.append(sorted(
            (r["user_id"], r["rank"], r["song_id"])
            for r in eng.recommend_for_all_users(5).collect()
        ))
    assert outs[0] == outs[1]


def test_add_ratings_extends_history(spark, engine):
    n0 = engine.ratings.count()
    new = spark.createDataFrame([(999, 1, 5.0), (999, 2, 4.0)],
                                "user_id int, song_id int, rating double")
    engine.add_ratings(new, retrain=True)
    assert engine.ratings.count() == n0 + 2
    recs = engine.get_top_ratings(999, k=5).collect()
    assert len(recs) > 0
    assert all(r["song_id"] not in (1, 2) for r in recs)


def test_model_save_load(tmp_path, spark, engine):
    path = str(tmp_path / "als_model")
    engine.save_model(path)
    eng2 = RecommendationEngine(spark, engine.ratings, min_ratings=1)
    eng2.load_model(path)
    a = engine.get_top_ratings(5, k=5).collect()
    b = eng2.get_top_ratings(5, k=5).collect()
    assert [(r["song_id"], round(r["predicted_rating"], 5)) for r in a] == [
        (r["song_id"], round(r["predicted_rating"], 5)) for r in b
    ]


def test_best_rank_search(spark, ratings):
    eng, rmses = RecommendationEngine.train_best_rank(
        spark, ratings, ranks=(2, 4), min_ratings=1
    )
    assert set(rmses) == {2, 4}
    assert eng.model is not None
    assert eng.rank == min(rmses, key=rmses.get)


def test_add_ratings_bounds_persisted_storage(spark, tables):
    """Long-lived incremental ingestion keeps a BOUNDED set of
    persisted RDDs: superseded caches and checkpoint blocks are freed
    every cycle (previously ~2 leaked snapshots per checkpoint)."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka_spark.operators.dedup import (
        _persistent_rdd_ids,
    )
    from spark_streaming_kafka_spark.recommend import RecommendationEngine

    ratings = (
        tables["events"]
        .select(
            F.col("user_id").cast("int").alias("user_id"),
            (F.col("event_id") % 50).cast("int").alias("song_id"),
            (F.col("value") % 5 + 1).cast("double").alias("rating"),
        )
        .dropDuplicates(["user_id", "song_id"])
    )
    sc = spark.sparkContext
    before = len(_persistent_rdd_ids(sc))
    eng = RecommendationEngine(spark, ratings, None)
    new = spark.createDataFrame(
        [(999, 1, 5.0)], "user_id int, song_id int, rating double"
    )
    for _ in range(25):  # crosses two checkpoint cycles
        eng.add_ratings(new, retrain=False)
    after = len(_persistent_rdd_ids(sc))
    assert after - before <= 4  # bounded, not ~2 per cycle

    eng.ratings.unpersist()
    eng.rating_counts.unpersist()


# ---------------------------------------------------------------------
# Factor-serving path (score_saved_factors): the committed pinned
# artifact + the serving plan (parquet load -> inlined item catalog ->
# codegen dot product -> windowed top-k).
# ---------------------------------------------------------------------

def test_saved_factor_scores_match_numpy(spark):
    """Serving output equals a NumPy recomputation from the same
    parquet — pins the dot-product expression and the ranking."""
    import numpy as np
    import pyarrow.parquet as pq

    from spark_streaming_kafka_spark.recommend import (
        PINNED_FACTORS_DIR,
        score_saved_factors,
    )

    users = spark.createDataFrame([(u,) for u in [0, 7, 42, 999]], "user_id int")
    got = {
        (r.user_id, r.rec_rank): (r.item_id, r.score)
        for r in score_saved_factors(spark, users, k=3).collect()
    }

    uf = {r["id"]: np.array(r["features"]) for r in pq.read_table(
        f"{PINNED_FACTORS_DIR}/user.parquet").to_pylist()}
    itf = {r["id"]: np.array(r["features"]) for r in pq.read_table(
        f"{PINNED_FACTORS_DIR}/item.parquet").to_pylist()}
    for u in [0, 7, 42, 999]:
        scores = sorted(
            ((float(uf[u] @ v), i) for i, v in itf.items()),
            key=lambda t: (-t[0], t[1]),
        )
        for rank in (1, 2, 3):
            exp_score, exp_item = scores[rank - 1]
            item, score = got[(u, rank)]
            assert item == exp_item, (u, rank)
            assert abs(score - exp_score) < 1e-12, (u, rank)


def test_saved_factor_serving_drops_unknown_users(spark):
    """Users absent from the factor table get no rows (inner join) —
    the caller decides cold-start policy, the scorer never fabricates."""
    from spark_streaming_kafka_spark.recommend import score_saved_factors

    users = spark.createDataFrame([(5,), (123456,)], "user_id int")
    out = score_saved_factors(spark, users, k=2)
    assert sorted(r.user_id for r in out.collect()) == [5, 5]


def test_saved_factor_serving_ranks_are_dense(spark):
    from spark_streaming_kafka_spark.recommend import score_saved_factors

    users = spark.createDataFrame([(1,), (2,)], "user_id int")
    out = score_saved_factors(spark, users, k=5).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r.rec_rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_user.values())
