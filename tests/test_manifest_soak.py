"""Soak test for the two-tier streaming incremental dedup
(streaming/manifest_dedup.py): 20 real micro-batches through a file
source, one injected checkpoint replay mid-stream, one genuine restart
— final kept-set and both manifests must equal the batch-mode driver
loop over the same data (batch/streaming parity at soak length, the
round-4 verdict's item 6).

The replay is injected the way production crashes produce it: the
checkpoint's newest ``commits/N`` file is deleted between the two
stream runs, so on restart Structured Streaming re-delivers batch N
with the SAME batch id and file set — exercising the sink's
dynamic-partition-overwrite idempotence through the real engine path
rather than a hand-called ``sink(df, n)``.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from spark_streaming_kafka_spark.streaming.manifest_dedup import (
    incremental_dedup_sink,
)

N_BATCHES = 20


def _batches() -> list[list[tuple[int, str]]]:
    """20 deterministic batches: ~6 fresh docs each, plus one exact dup
    and one near dup (1 of 25 words changed → 3-gram Jaccard ≈ 0.77)
    of earlier batches' docs."""
    batches: list[list[tuple[int, str]]] = []
    fresh: list[str] = []
    did = 0
    for b in range(N_BATCHES):
        rows: list[tuple[int, str]] = []
        for i in range(6):
            text = " ".join(
                f"w{(b * 31 + i * 7 + j * 3) % 211}" for j in range(25)
            )
            rows.append((did, text))
            fresh.append(text)
            did += 1
        if b > 0:
            rows.append((did, fresh[(b * 13) % (len(fresh) - 7)]))
            did += 1
        if b > 1:
            base = fresh[(b * 17) % (len(fresh) - 8)]
            rows.append((did, base.rsplit(" ", 1)[0] + " zz"))
            did += 1
        batches.append(rows)
    return batches


def _write_batch_file(path: str, rows: list[tuple[int, str]], mtime: int) -> None:
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)
    os.utime(path, (mtime, mtime))


def _manifest_state(spark, hp: str, sp: str):
    hashes = frozenset(
        (r["batch_id"], r["text_hash"])
        for r in spark.read.parquet(hp).collect()
    )
    sigs = frozenset(
        (r["batch_id"], r["doc_id"], tuple(r["signature"]))
        for r in spark.read.parquet(sp).collect()
    )
    return hashes, sigs


def _drain(spark, src: str, ckpt: str, sink) -> None:
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "stream did not drain in time"
    q.stop()
    deadline = time.time() + 60
    while q.isActive and time.time() < deadline:
        time.sleep(0.2)
    assert not q.isActive


def test_soak_streaming_equals_batch_with_replay_and_restart(spark, tmp_path):
    batches = _batches()
    base_mtime = int(time.time()) - 10_000

    # ---- streaming soak: phase 1 (batches 0..9), injected replay,
    # ---- restart, phase 2 (batches 10..19) ---------------------------
    src = str(tmp_path / "src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    hp, sp = str(tmp_path / "s_hashes"), str(tmp_path / "s_sigs")
    kept: dict[int, frozenset] = {}

    def on_kept(df, bid):
        # last write wins: the replayed batch overwrites its first
        # delivery, mirroring an idempotent downstream sink
        kept[bid] = frozenset(r["doc_id"] for r in df.collect())

    for b in range(10):
        _write_batch_file(
            os.path.join(src, f"batch_{b:02d}.parquet"), batches[b],
            base_mtime + b,
        )
    sink = incremental_dedup_sink(spark, hp, sp, on_kept)
    _drain(spark, src, ckpt, sink)
    assert sorted(kept) == list(range(10))

    # inject a crash-replay: drop the newest commit so the restart
    # re-delivers batch 9 with the same batch id and file
    commits = sorted(os.listdir(os.path.join(ckpt, "commits")), key=str)
    newest = max(
        (c for c in commits if not c.startswith(".")), key=lambda c: int(c)
    )
    assert int(newest) == 9
    os.remove(os.path.join(ckpt, "commits", newest))
    # the local checksum FS keeps a .N.crc sidecar; leaving it behind
    # makes the re-commit rename fail with FileAlreadyExists
    crc = os.path.join(ckpt, "commits", f".{newest}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    kept_before_replay = kept[9]

    for b in range(10, N_BATCHES):
        _write_batch_file(
            os.path.join(src, f"batch_{b:02d}.parquet"), batches[b],
            base_mtime + b,
        )
    # restart path: a brand-new sink instance resumes from the
    # persisted manifests and checkpoint
    sink2 = incremental_dedup_sink(spark, hp, sp, on_kept)
    _drain(spark, src, ckpt, sink2)

    assert sorted(kept) == list(range(N_BATCHES))
    # the replayed batch delivered the identical kept set
    assert kept[9] == kept_before_replay

    # ---- batch-mode twin: the same operators in a driver loop --------
    bhp, bsp = str(tmp_path / "b_hashes"), str(tmp_path / "b_sigs")
    bkept: dict[int, frozenset] = {}
    bsink = incremental_dedup_sink(
        spark, bhp, bsp,
        lambda df, bid: bkept.update(
            {bid: frozenset(r["doc_id"] for r in df.collect())}
        ),
    )
    for b, rows in enumerate(batches):
        bsink(spark.createDataFrame(rows, "doc_id long, text string"), b)

    # ---- parity: kept sets and manifests byte-equal ------------------
    assert kept == bkept
    assert _manifest_state(spark, hp, sp) == _manifest_state(spark, bhp, bsp)

    # attrition sanity: the dup tiers actually dropped rows, and the
    # manifests grew by exactly the kept rows
    total = sum(len(rows) for rows in batches)
    kept_total = sum(len(v) for v in kept.values())
    assert 0 < kept_total < total
    assert len(_manifest_state(spark, hp, sp)[0]) == kept_total
