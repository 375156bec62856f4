"""Runnable walkthrough: the bounded-state sketch surface — what a
100 TB pipeline publishes to its dashboard instead of exact answers.

    python examples/sketch_monitors.py [sf_dir]

Flow: HyperLogLog distinct users per event_type (vs the exact count,
to show the error) → Count-Min heavy-hitter terms over the document
token stream → histogram-sketch P50/P95/P99 of events.value per type
(vs exact percentile_approx) → the same histogram cells driven through
a real micro-batch STREAM, proving the streaming monitor converges to
the batch sketch over identical data → KMV (bottom-k theta) set
algebra: the overlap/Jaccard question HLL registers structurally
cannot answer, estimated from two k-row sketches and certified against
the exact INTERSECT. Every sketch is mergeable (MAX / SUM cells /
keep-k-smallest), which is what makes per-day / per-source rollups
free at scale.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.dedup import tokenize
from spark_streaming_kafka_spark.operators.sketches import (
    cms_lookup,
    cms_sketch,
    hll_distinct,
    histogram_quantile,
    histogram_sketch,
)
from spark_streaming_kafka_spark.sources.readers import load_table
from spark_streaming_kafka_spark.streaming.sketches import histogram_stream_monitor


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example-sketch-monitors")
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    # ---- sketch 1: HLL distinct users per event type ------------------
    print("== HLL distinct users per event_type (p=8 -> ~6.5% rse) ==")
    est = {
        r["event_type"]: r["hll_distinct"]
        for r in hll_distinct(events, F.col("user_id").cast("string"), ["event_type"], p=8).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et in sorted(est):
        err = abs(est[et] - exact[et]) / max(exact[et], 1)
        print(f"  {et:<10} est={est[et]:<7} exact={exact[et]:<7} err={err:.3f}")

    # ---- sketch 2: Count-Min heavy hitters over tokens ----------------
    print("== Count-Min heavy hitters (d x w cells, over-estimate only) ==")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
    sketch = cms_sketch(toks, "term", width=256)
    probes = toks.groupBy("term").count().orderBy(F.desc("count"), "term").limit(5)
    looked = cms_lookup(sketch, probes.select("term"), "term", width=256)
    joined = {r["term"]: r["est_count"] for r in looked.collect()}
    for r in probes.collect():
        print(f"  {r['term']:<15} true={r['count']:<7} cms={joined[r['term']]:<7}"
              f" (over by {joined[r['term']] - r['count']})")

    # ---- sketch 3: histogram quantiles vs exact -----------------------
    print("== histogram-sketch quantiles of events.value (128 bins) ==")
    cells = histogram_sketch(events, "value", ["event_type"], 0.0, 500.0, 128)
    hq = {
        (r["event_type"], r["q"]): r["est"]
        for r in histogram_quantile(
            cells, ["event_type"], [0.5, 0.95, 0.99], 0.0, 500.0, 128
        ).collect()
    }
    ex = {
        r["event_type"]: r["qs"]
        for r in events.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("qs"))
        .collect()
    }
    for (et, q), v in sorted(hq.items()):
        idx = {0.5: 0, 0.95: 1, 0.99: 2}[q]
        print(f"  {et:<10} q={q:<5} sketch={v:<12.4f} exact~{ex[et][idx]:.4f}")

    # ---- the same cells as a STREAM -----------------------------------
    print("== streaming histogram monitor (2 micro-batches) ==")
    with tempfile.TemporaryDirectory() as td:
        in_dir = os.path.join(td, "in")
        os.makedirs(in_dir)
        half1 = events.filter(F.col("event_id") % 2 == 0)
        half2 = events.filter(F.col("event_id") % 2 == 1)
        half1.select("event_type", "value").coalesce(1).write.parquet(
            os.path.join(in_dir, "f1")
        )
        reports: dict[int, list] = {}
        stream = (
            spark.readStream.schema("event_type string, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(in_dir, "*"))
        )
        q = (
            histogram_stream_monitor(
                stream, "value", ["event_type"],
                lambda bid, rows: reports.update({bid: rows}),
                lo=0.0, hi=500.0, bins=128,
            )
            .option("checkpointLocation", os.path.join(td, "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            half2.select("event_type", "value").coalesce(1).write.parquet(
                os.path.join(in_dir, "f2")
            )
            q.processAllAvailable()
        finally:
            q.stop()
        final = {(r["event_type"], r["q"]): r["est"] for r in reports[max(reports)]}
        n_match = sum(1 for k, v in final.items() if abs(v - hq[k]) < 1e-9)
        print(f"  streaming estimates matching batch sketch: {n_match}/{len(final)}")
        assert n_match == len(final), "streaming monitor diverged from batch sketch"

    # ---- sketch 4: KMV theta set algebra (what HLL cannot do) ---------
    print("== KMV bottom-k overlap: click vs view audiences (k=128) ==")
    from spark_streaming_kafka_spark.operators.sketches import (
        kmv_cross_group_overlap,
        kmv_sketch,
    )

    k = 128
    key = F.concat(F.lit("u"), F.col("user_id").cast("string"))
    sk = kmv_sketch(
        events.filter(F.col("event_type").isin("click", "view")).select(
            key.alias("k"), "event_type"
        ),
        "k",
        ["event_type"],
        k=k,
    )
    ov = kmv_cross_group_overlap(sk, "event_type", "click", "view", k=k).collect()[0]
    # NULL keys are outside the sketch's universe (kmv_sketch drops
    # them), so the exact baseline must drop them too — Spark's
    # INTERSECT is null-safe and would otherwise count a NULL member.
    nn = events.filter(F.col("user_id").isNotNull())
    ua = nn.filter(F.col("event_type") == "click").select("user_id")
    ub = nn.filter(F.col("event_type") == "view").select("user_id")
    exact_inter = ua.intersect(ub).count()
    err = abs(ov["inter_est"] - exact_inter) / max(exact_inter, 1)
    print(
        f"  {ov['pair']}: inter_est={ov['inter_est']:<10} "
        f"exact={exact_inter:<8} err={err:.3f} jaccard_est={ov['jaccard_est']}"
    )
    # The sketch is 2*k rows of state; the exact INTERSECT is the full
    # shuffle a 100 TB pipeline runs once to certify, then retires.
    assert err < 0.5, "theta estimate should land near the exact overlap"

    print("done.")


if __name__ == "__main__":
    main()
