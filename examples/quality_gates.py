"""Runnable walkthrough: the data-quality / observability surface —
the gates a production pipeline runs around every ingest.

    python examples/quality_gates.py [sf_dir]

Flow: contract expectations over the events table → PSI drift check of
an incoming document batch vs the reference corpus → incremental
dedup of the batch against persisted manifests (exact hash + MinHash
near-dup) — printing one gate report per stage, the way a scheduler
would publish them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.curation import manifest_dedup
from spark_streaming_kafka_spark.operators.dedup import (
    minhash_manifest_matches,
    minhash_signatures,
)
from spark_streaming_kafka_spark.operators.drift import psi_report
from spark_streaming_kafka_spark.operators.expectations import (
    accepted_values,
    expectation_report,
    foreign_key,
    in_range,
    not_null,
    unique,
)
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example-quality-gates")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- gate 1: contract expectations on the fact table -------------
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    report = expectation_report(
        spark,
        events,
        [
            not_null("props"),
            in_range("value", 0.0, 5.0),
            accepted_values("event_type", ["view", "click", "purchase"]),
            unique(["user_id", "ts"]),
            foreign_key("user_id", customer, "c_custkey"),
        ],
    ).collect()
    print("== expectations (events) ==")
    for r in report:
        print(f"  {r['rule']:<35} violations={r['violations']:<6} "
              f"{'PASS' if r['passed'] else 'FAIL'}")

    # ---- gate 2: distribution drift of the incoming batch ------------
    docs = load_table(spark, sf_dir, "documents")
    src_idx = F.regexp_extract("source", r"(\d+)$", 1).cast("int")
    reference, incoming = docs.filter(src_idx < 10), docs.filter(src_idx >= 10)
    features = [
        ("lang", F.col("lang")),
        ("n_chars_bin", F.floor(F.col("n_chars") / 50.0).cast("long")),
    ]
    print("== drift (incoming vs reference) ==")
    for r in psi_report(reference, incoming, features).collect():
        verdict = "stable" if r["psi"] < 0.1 else (
            "drifting" if r["psi"] < 0.25 else "SHIFTED")
        print(f"  {r['feature']:<14} psi={r['psi']:<10} bins={r['n_bins']:<4} {verdict}")

    # ---- gate 3: incremental dedup vs persisted manifests ------------
    # exact tier: hash-only manifest (16 B/doc)
    manifest_hashes = reference.select(F.md5("text").alias("text_hash"))
    fresh = manifest_dedup(incoming, manifest_hashes)
    n_in, n_fresh = incoming.count(), fresh.count()
    print("== incremental exact dedup ==")
    print(f"  incoming={n_in} fresh={n_fresh} dropped={n_in - n_fresh}")

    # near-dup tier: MinHash-signature manifest (256 B/doc), historical
    # text never re-read
    sig_manifest = minhash_signatures(reference)
    near = minhash_manifest_matches(incoming, sig_manifest, threshold=0.5)
    print("== incremental near-dup (signature manifest) ==")
    for r in near.orderBy("doc_id").limit(10).collect():
        print(f"  new doc {r['doc_id']} ≈ historical {r['dup_of']} "
              f"(est jaccard {r['est_jaccard']})")
    print(f"  total near-dup matches: {near.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
