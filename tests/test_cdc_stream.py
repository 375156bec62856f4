"""Streaming CDC apply (streaming/cdc_apply.py): versioned snapshot
upsert with pointer swap, latest-per-key collapse, replay idempotence."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from spark_streaming_kafka_spark.streaming.cdc_apply import (
    cdc_upsert_sink,
    current_snapshot,
    latest_per_key,
    read_pointer,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, val string, seq long")


def test_latest_per_key_collapse(spark):
    b = _batch(spark, [(1, "a", 1), (1, "b", 3), (1, "c", 2), (2, "x", 1)])
    got = {r["k"]: r["val"] for r in latest_per_key(b, "k", "seq").collect()}
    assert got == {1: "b", 2: "x"}


def test_snapshot_evolution_and_replay(spark, tmp_path):
    base = str(tmp_path / "cdc_base")
    sink = cdc_upsert_sink(base, "k", "seq")

    assert current_snapshot(spark, base) is None

    sink(_batch(spark, [(1, "a", 1), (2, "b", 1)]), 0)
    assert read_pointer(spark, base) == "v000000000000"
    s0 = {r["k"]: r["val"] for r in current_snapshot(spark, base).collect()}
    assert s0 == {1: "a", 2: "b"}

    # batch 1 updates key 1 (two changes — latest wins) and adds key 3
    sink(_batch(spark, [(1, "a2", 5), (1, "mid", 4), (3, "c", 1)]), 1)
    s1 = {r["k"]: r["val"] for r in current_snapshot(spark, base).collect()}
    assert s1 == {1: "a2", 2: "b", 3: "c"}
    assert read_pointer(spark, base) == "v000000000001"

    # crash-replay of batch 1: same batch_id, same result, same pointer
    sink(_batch(spark, [(1, "a2", 5), (1, "mid", 4), (3, "c", 1)]), 1)
    s1r = {r["k"]: r["val"] for r in current_snapshot(spark, base).collect()}
    assert s1r == s1
    assert read_pointer(spark, base) == "v000000000001"

    # empty batch is a no-op
    sink(_batch(spark, []), 2)
    assert read_pointer(spark, base) == "v000000000001"


def test_cdc_sink_under_real_stream(spark, tmp_path):
    """The sink runs inside an actual Structured Streaming query (rate
    source → changefeed shape) and publishes a readable snapshot."""
    base = str(tmp_path / "cdc_stream")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    )
    feed = stream.select(
        (F.col("value") % 5).alias("k"),
        F.concat(F.lit("v"), F.col("value")).alias("val"),
        F.col("value").alias("seq"),
    )
    q = (
        feed.writeStream.foreachBatch(cdc_upsert_sink(base, "k", "seq"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and read_pointer(spark, base) is None:
            time.sleep(0.5)
        assert read_pointer(spark, base) is not None
    finally:
        q.stop()
    snap = current_snapshot(spark, base)
    rows = {r["k"]: r for r in snap.collect()}
    assert set(rows) <= {0, 1, 2, 3, 4} and len(rows) >= 1
    # every kept row is the max-seq row for its key within what arrived
    for k, r in rows.items():
        assert r["val"] == f"v{r['seq']}" and r["seq"] % 5 == k


def test_version_pruning_bounds_storage(spark, tmp_path):
    from spark_streaming_kafka_spark.streaming.cdc_apply import (
        cdc_upsert_sink,
        current_snapshot,
        prune_versions,
        read_pointer,
    )

    base = str(tmp_path / "pruned")
    sink = cdc_upsert_sink(base, "k", "seq", keep_versions=2)
    for i in range(5):
        sink(_batch(spark, [(1, f"v{i}", i), (i + 10, "x", 1)]), i)
    import os

    dirs = sorted(d for d in os.listdir(base) if d.startswith("v"))
    assert dirs == ["v000000000003", "v000000000004"]  # keep 2 newest
    assert read_pointer(spark, base) == "v000000000004"
    snap = {r["k"]: r["val"] for r in current_snapshot(spark, base).collect()}
    assert snap[1] == "v4" and len(snap) == 6
    # prune never deletes the pointer target even at keep_versions=1
    prune_versions(spark, base, keep_versions=1)
    assert sorted(os.listdir(base))[-1] == "v000000000004"
    assert current_snapshot(spark, base).count() == 6


def test_prune_ignores_stray_v_directories(spark, tmp_path):
    """A user directory that merely starts with 'v' (e.g. 'vacuum_tmp')
    must survive pruning — only exact v{12-digit} snapshot dirs are
    prune candidates."""
    import os

    from spark_streaming_kafka_spark.streaming.cdc_apply import (
        cdc_upsert_sink,
        prune_versions,
    )

    base = str(tmp_path / "stray")
    sink = cdc_upsert_sink(base, "k", "seq", keep_versions=1)
    sink(_batch(spark, [(1, "a", 0)]), 0)
    # stray dirs sorting BELOW the pointer — the old bug's kill zone
    for stray in ("vacuum_tmp", "v0_manual_backup", "v00000000000"):
        os.makedirs(os.path.join(base, stray, "inner"), exist_ok=True)
    sink(_batch(spark, [(1, "b", 1)]), 1)  # triggers prune of v…000
    names = set(os.listdir(base))
    assert {"vacuum_tmp", "v0_manual_backup", "v00000000000"} <= names
    assert "v000000000000" not in names  # real superseded version pruned
    assert prune_versions(spark, base, keep_versions=1) == []


def test_checkpoint_reset_fails_loudly(spark, tmp_path):
    """A fresh query incarnation (batch ids reset) against an existing
    base must raise, not silently drop batches; exact replay of the
    committed batch stays a silent no-op."""
    import pytest as _pytest

    from spark_streaming_kafka_spark.streaming.cdc_apply import (
        cdc_upsert_sink,
    )

    base = str(tmp_path / "reset")
    sink = cdc_upsert_sink(base, "k", "seq")
    sink(_batch(spark, [(1, "a", 1)]), 7)
    sink(_batch(spark, [(1, "b", 2)]), 8)
    sink(_batch(spark, [(1, "b", 2)]), 8)  # true replay: no-op
    with _pytest.raises(ValueError, match="checkpoint reset"):
        sink(_batch(spark, [(1, "c", 3)]), 0)  # new incarnation


def test_latest_per_key_handles_map_columns(spark):
    """Tie-break must not order by raw payload columns — map types are
    unorderable in a sort; the hash tiebreak handles them."""
    from spark_streaming_kafka_spark.streaming.cdc_apply import (
        latest_per_key,
    )

    df = spark.createDataFrame(
        [(1, 2, {"a": "x"}), (1, 1, {"b": "y"})],
        "k long, seq long, attrs map<string,string>",
    )
    out = latest_per_key(df, "k", "seq").collect()
    assert len(out) == 1 and out[0]["seq"] == 2
