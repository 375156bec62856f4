"""Runnable walkthrough: the COMPOSED streaming pipeline — every
stateful/streaming piece chained in one query, with end-to-end row
accounting asserted, not eyeballed.

    python examples/streaming_e2e.py [sf_dir] [out_dir]

Flow (the streaming analog of `corpus_curation_e2e`; reference shape
spark_streaming_kafka.py:139-147 — consume, buffer per user until the
sentinel, flush, transform, publish):

  file micro-batch source (2 deterministic batches)
    → sentinel-bounded sessions        (X4: applyInPandasWithState)
    → per-session document assembly    (foreachBatch)
    → boilerplate/classifier gate      (streaming/gate.py, stateless)
    → two-tier incremental manifest dedup
                                       (streaming/manifest_dedup.py:
                                        exact hash manifest + MinHash
                                        signature manifest, replay-safe)
    → HLL sketch monitor               (register MAX-merge per batch —
                                        bounded state, 256 rows)
    → kafka-shaped sink                (key/value records, parquet-
                                        persisted; a broker would take
                                        the same frame byte-for-byte)

Every stage's row counts are reconciled at the end:
  events_in == events_flushed + events_carried
  docs_built == kept + gated_out + dup_dropped
  sink_rows == kept
so a silently-dropping (or silently-duplicating) stage fails the
script. CI runs this file (tests/test_examples.py).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.sketches import hll_estimate, hll_sketch
from spark_streaming_kafka_spark.sources.kafka import to_kafka_records
from spark_streaming_kafka_spark.streaming.gate import gate_stream
from spark_streaming_kafka_spark.streaming.manifest_dedup import incremental_dedup_sink
from spark_streaming_kafka_spark.streaming.sessions import (
    SENTINEL,
    sentinel_sessions_stateful,
)

#: Two deterministic micro-batches of (userid, slot, song_id, rating).
#: Sessions complete on slot == "m3" (the reference's sentinel,
#: spark_kafka.py:92-94). Designed so every accounting branch fires:
#: user 2's doc is boilerplate (gated), user 202's doc duplicates user
#: 101's from the PREVIOUS batch (manifest-deduped), user 3's session
#: spans both batches (state carry), user 4 never completes (carried).
BATCH_1 = [
    (1, "the data pipeline", 1, 4), (1, "keeps good documents", 2, 5), (1, SENTINEL, 3, 3),
    (2, "buy now click", 1, 1), (2, "buy now click", 2, 1),
    (2, "buy now click", 3, 1), (2, SENTINEL, 4, 1),
    (3, "incomplete session", 1, 2),
    (101, "unique text alpha", 1, 5), (101, SENTINEL, 2, 4),
]
BATCH_2 = [
    (3, SENTINEL, 2, 3),
    (202, "unique text alpha", 1, 5), (202, SENTINEL, 2, 4),
    (4, "abandoned forever", 1, 1),
]
EVENT_SCHEMA = "userid int, slot string, song_id int, rating int"

#: The gate's boilerplate dictionary — in production this comes from
#: curation.boilerplate_shingles over a reference corpus; the demo pins
#: one known 3-shingle so the gated path is deterministic.
#: (k=5 windows over whitespace tokens — the entry must be a 5-token
#: shingle or it can never match)
BOILER_DICT = {"stream": frozenset({"buy now click buy now"})}


def main() -> None:
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="e2e_out_")
    work = tempfile.mkdtemp(prefix="e2e_work_")
    spark = get_spark("streaming-e2e", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]")
    spark.sparkContext.setLogLevel("ERROR")

    src_dir = os.path.join(work, "events")
    os.makedirs(src_dir, exist_ok=True)
    spark.createDataFrame(BATCH_1, EVENT_SCHEMA).coalesce(1).write.parquet(
        os.path.join(src_dir, "f1")
    )

    acct = {"flushed": 0, "docs": 0, "gated_out": 0, "dup_dropped": 0, "kept": 0}
    hll_regs: dict[int, int] = {}  # bucket -> max_rho (the monitor state)

    def on_kept(kept_docs, batch_id: int) -> None:
        n = kept_docs.count()
        acct["kept"] += n
        # sketch monitor leg: MAX-merge this batch's HLL registers into
        # the running table — bounded driver state (≤ 256 rows), the
        # same merge the streaming monitors use (streaming/sketches.py)
        regs = hll_sketch(
            kept_docs.withColumn("g", F.lit("all")), F.col("doc_id").cast("string"), ["g"]
        ).collect()
        for r in regs:
            hll_regs[r["bucket"]] = max(hll_regs.get(r["bucket"], 0), r["max_rho"])
        # kafka-shaped sink: (key, value) records exactly as
        # kafka_batch_write would ship them; parquet stands in for the
        # broker (none in this container — docs/LIVE_SERVICES.md)
        records = to_kafka_records(kept_docs, kept_docs["doc_id"], ["doc_id", "text"])
        records.write.mode("append").parquet(os.path.join(out_dir, "kafka_records"))

    dedup_fb = incremental_dedup_sink(
        spark,
        hash_manifest_path=os.path.join(work, "hash_manifest"),
        sig_manifest_path=os.path.join(work, "sig_manifest"),
        on_kept=on_kept,
        threshold=0.5,
    )

    def chain(batch_df, batch_id: int) -> None:
        # With ProcessingTimeTimeout + live state the engine fires
        # EMPTY micro-batches forever to evaluate timeouts — skip them
        # (and drive completion by polling the accounting, below:
        # processAllAvailable would never settle).
        if batch_df.isEmpty():
            return
        batch_df = batch_df.persist()
        acct["flushed"] += batch_df.count()
        # one document per completed session: slots space-joined in
        # song_id order (the kernel already emits rows in that order)
        docs = (
            batch_df.groupBy("userid")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("song_id", "slot"))
                        ),
                        lambda s: s["slot"],
                    ),
                    " ",
                ).alias("text")
            )
            .select(
                F.col("userid").cast("long").alias("doc_id"),
                "text",
                F.lit("stream").alias("source"),
            )
            .persist()
        )
        n_docs = docs.count()
        acct["docs"] += n_docs
        gated = gate_stream(
            docs, BOILER_DICT, k=5, ratio_max=0.1, prob_min=0.0
        ).persist()
        n_gated = gated.count()
        acct["gated_out"] += n_docs - n_gated
        kept_before = acct["kept"]
        dedup_fb(gated, batch_id)
        acct["dup_dropped"] += n_gated - (acct["kept"] - kept_before)
        batch_df.unpersist()
        docs.unpersist()
        gated.unpersist()

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src_dir, "*"))
    )
    q = (
        sentinel_sessions_stateful(stream)
        .writeStream.foreachBatch(chain)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    def _await(predicate, what: str, timeout_s: float = 120.0) -> None:
        import time

        t0 = time.time()
        while not predicate():
            if not q.isActive:
                raise RuntimeError(f"query died awaiting {what}: {q.exception()}")
            if time.time() - t0 > timeout_s:
                raise TimeoutError(f"timed out awaiting {what}: {acct}")
            time.sleep(0.5)

    def _settled(n_docs: int) -> bool:
        # true only once every built doc has been fully dispositioned —
        # the per-batch chain is synchronous, so this can't observe a
        # half-processed batch as "done"
        return acct["docs"] >= n_docs and (
            acct["kept"] + acct["gated_out"] + acct["dup_dropped"] == acct["docs"]
        )

    try:
        _await(lambda: _settled(3), "batch-1 sessions")
        spark.createDataFrame(BATCH_2, EVENT_SCHEMA).coalesce(1).write.parquet(
            os.path.join(src_dir, "f2")
        )
        _await(lambda: _settled(5), "batch-2 sessions")
    finally:
        q.stop()

    # ---- end-to-end reconciliation ----
    events_in = len(BATCH_1) + len(BATCH_2)
    carried = events_in - acct["flushed"]
    sink_rows = spark.read.parquet(os.path.join(out_dir, "kafka_records")).count()
    est = hll_estimate(
        spark.createDataFrame(
            [("all", b, r) for b, r in hll_regs.items()],
            "g string, bucket int, max_rho int",
        ),
        ["g"],
    ).collect()[0]["hll_distinct"]

    print(f"events_in          {events_in}")
    print(f"  flushed          {acct['flushed']}")
    print(f"  carried-in-state {carried}   (user 4's abandoned session)")
    print(f"docs_built         {acct['docs']}")
    print(f"  gated_out        {acct['gated_out']}   (boilerplate)")
    print(f"  dup_dropped      {acct['dup_dropped']}   (cross-batch manifest hit)")
    print(f"  kept             {acct['kept']}")
    print(f"kafka-shaped rows  {sink_rows}")
    print(f"HLL monitor est    {est}  (exact distinct kept docs = {acct['kept']})")

    assert acct["flushed"] + carried == events_in, "event accounting broke"
    assert carried == 1, "exactly user 4's lone event should stay in state"
    assert acct["docs"] == 5, acct
    assert acct["gated_out"] == 1, acct
    assert acct["dup_dropped"] == 1, acct
    assert acct["kept"] == 3, acct
    assert sink_rows == acct["kept"], "sink must carry exactly the kept docs"
    assert abs(est - acct["kept"]) < 0.5, "HLL monitor diverged from truth"
    print("OK — every stage's rows reconcile end-to-end")

    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
