"""Runnable walkthrough: behavioral sequence analytics over an event
stream — the r9 operator family composed end to end.

    python examples/behavior_analytics.py [sf_dir] [out_dir]

Steps: per-user transition pairs (one lead window) → first-order Markov
matrix P(next|prev) → per-user sequence log-likelihood under that
matrix, flagging the least probable sessions (bot/replay screen) →
behavior affinity lift (which event types co-occur in the same user's
history beyond chance) → the STREAMING twin: the same events replayed
as two micro-batches through the stateful transition extractor, whose
emitted pairs rebuild the matrix — counted against the batch matrix so
the walkthrough proves the two surfaces agree.

Every step writes parquet to out_dir and prints a one-screen summary.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.retrieval import basket_pairs_lift
from spark_streaming_kafka_spark.operators.sessionize import (
    markov_transitions,
    sequence_logprob,
    transition_pairs,
)
from spark_streaming_kafka_spark.sources.readers import load_table
from spark_streaming_kafka_spark.streaming.transitions import (
    transition_stream_pairs,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="behavior_"
    )
    spark = get_spark("example-behavior")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, sf_dir, "events")

    # 1. the corpus transition matrix — broadcast-sized by construction
    matrix = markov_transitions(events)
    matrix.write.mode("overwrite").parquet(os.path.join(out_dir, "matrix"))
    top = matrix.orderBy(F.col("prob").desc()).first()
    print(
        f"matrix: {matrix.count()} transitions; most likely edge "
        f"{top['prev_state']} -> {top['next_state']} (p={top['prob']})"
    )

    # 2. per-user sequence likelihood under the matrix; flag the tail
    scored = sequence_logprob(events, matrix=matrix)
    scored.write.mode("overwrite").parquet(os.path.join(out_dir, "scored"))
    flagged = scored.orderBy(F.col("avg_logprob").asc(), F.col("user_id").asc())
    worst = flagged.first()
    print(
        f"scored {scored.count()} users; least probable sequence: user "
        f"{worst['user_id']} avg_logprob={worst['avg_logprob']} over "
        f"{worst['n_transitions']} transitions"
    )

    # 3. behavior affinity: co-occurrence lift across each user's history
    lift = basket_pairs_lift(events, "user_id", "event_type", top_items=5)
    lift.write.mode("overwrite").parquet(os.path.join(out_dir, "lift"))
    for r in lift.orderBy(F.col("lift").desc()).limit(3).collect():
        print(
            f"affinity: {r['item_a']} + {r['item_b']} lift={r['lift']} "
            f"(support={r['support']})"
        )

    # 4. streaming twin: replay the same events as two micro-batches;
    #    the stateful extractor's pairs must total the batch pairs.
    replay = events.select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "event_type"
    )
    half = replay.count() // 2
    stream_dir = os.path.join(out_dir, "replay_in")
    replay.filter(F.col("event_id") <= half).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)
    time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    replay.filter(F.col("event_id") > half).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)

    expected = transition_pairs(
        events.withColumn("ts_ms", F.unix_millis("ts")),
        ts_col="ts_ms",
    ).count()
    stream = (
        spark.readStream.schema(replay.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        transition_stream_pairs(stream)
        .writeStream.format("memory")
        .queryName("behavior_pairs")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .start()
    )
    # poll the sink (ProcessingTimeTimeout keeps the engine running
    # state-cleanup batches, so processAllAvailable never settles —
    # same discipline as tests/test_streaming.py)
    deadline = time.time() + 120
    got = 0
    while time.time() < deadline:
        got = spark.sql("SELECT count(*) AS n FROM behavior_pairs").first()["n"]
        if got >= expected:
            break
        time.sleep(0.5)
    q.stop()
    assert got == expected, f"streaming pairs {got} != batch pairs {expected}"
    print(
        f"streaming twin: {got} transition pairs across 2 micro-batches "
        f"== batch operator's {expected} (cross-batch edges via state)"
    )

    spark.stop()
    print(f"artifacts in {out_dir}")


if __name__ == "__main__":
    main()
