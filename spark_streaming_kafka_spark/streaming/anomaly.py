"""Streaming rolling z-score anomaly detection — the streaming twin of
``operators/windows.py::rolling_zscore``.

The batch form ranks a strictly-historical 20-row frame per key with
one window pass; a stream has no frame to rank over, so the streaming
form carries the trailing window PER KEY in the state store: each
arriving event is scored against the values already in state (strictly
historical — a spike still can't inflate its own baseline), then pushed
into the window, oldest value evicted. State per key is exactly
``window`` doubles — bounded regardless of stream length, and idle keys
are garbage-collected by a processing-time timeout, which is the
bounded-memory contract every stateful operator in this package keeps.

Ordering: rows are scored in (ts, id) order WITHIN each micro-batch
(sorted before the scan); across batches the operator trusts
micro-batch arrival order, the standard applyInPandasWithState
contract (exact event-time ordering across batches would need the
watermarked-window formulation, which cannot express a row-count
frame).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_OUTPUT_SCHEMA = (
    "event_id long, event_type string, ts_ms long, value double, "
    "zscore double, is_anomaly boolean"
)
ANOMALY_STATE_SCHEMA = "vals array<double>"

#: Idle-key state GC horizon (ms): a key silent this long is dropped.
STATE_TTL_MS = 60 * 60 * 1000


def _make_zscore_fn(window: int, threshold: float):
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        hist: list[float] = list(state.get[0]) if state.exists else []
        out: dict[str, list] = {
            "event_id": [], "event_type": [], "ts_ms": [],
            "value": [], "zscore": [], "is_anomaly": [],
        }
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_ms", "event_id"], kind="stable")
            for _, row in pdf.iterrows():
                v = float(row["value"])
                z = None
                if len(hist) >= 2:
                    n = len(hist)
                    mu = sum(hist) / n
                    var = sum((x - mu) ** 2 for x in hist) / (n - 1)
                    if var > 0:
                        z = round((v - mu) / var ** 0.5, 6)
                out["event_id"].append(int(row["event_id"]))
                out["event_type"].append(key[0])
                out["ts_ms"].append(int(row["ts_ms"]))
                out["value"].append(v)
                out["zscore"].append(z)
                out["is_anomaly"].append(
                    z is not None and abs(z) > threshold
                )
                hist.append(v)
                if len(hist) > window:
                    hist = hist[-window:]
        state.update((hist,))
        state.setTimeoutDuration(STATE_TTL_MS)
        if out["event_id"]:
            yield pd.DataFrame(out)

    return fn


def streaming_rolling_zscore(
    stream: DataFrame,
    window: int = 20,
    threshold: float = 3.0,
) -> DataFrame:
    """Score a streaming (event_id, event_type, ts_ms, value) frame:
    per event type, z-score each event against the trailing ``window``
    values held in state, flag ``|z| > threshold``. Emits every event
    with its score (NULL while the baseline has <2 values or zero
    variance), same output columns as the batch
    ``event_anomaly_zscore`` query. State: ``window`` doubles per key,
    idle keys GC'd after ``STATE_TTL_MS``.
    """
    return stream.groupBy("event_type").applyInPandasWithState(
        _make_zscore_fn(window, threshold),
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
