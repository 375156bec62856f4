"""X4 — sentinel-bounded sessions (the one genuinely stateful streaming
semantic in the reference).

Reference (``spark_kafka.py:71-94,127``): the driver buffers every
incoming (userid, slot, song_id, rating) in Python lists until a message
with ``slot == 'm3'`` arrives, then flushes the whole buffer as one
training micro-batch and resets. Single-threaded, one global buffer,
state lost on crash.

Rebuild, two forms:

- :func:`sentinel_sessions_stateful` — ``applyInPandasWithState``:
  per-user session state kept in Spark's state store (partitioned by
  user, checkpointed, crash-recoverable). Emits one row per event of a
  completed session when that user's sentinel arrives; a processing-time
  timeout discards abandoned sessions instead of leaking state forever —
  the property that makes this viable with millions of concurrent users.
- :func:`flush_complete_sessions` — batch/foreachBatch form: given an
  accumulated events DataFrame, emit events of users whose session has
  seen the sentinel (the E2 rebuild path; also the oracle-checkable
  semantics).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SENTINEL = "m3"

#: Output/state schemas for the stateful form.
SESSION_OUTPUT_SCHEMA = (
    "userid int, slot string, song_id int, rating int, session_size int"
)
SESSION_STATE_SCHEMA = "slots array<string>, song_ids array<int>, ratings array<int>"


def _session_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate (slot, song_id, rating) per user; flush on sentinel."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        slots, song_ids, ratings = state.get
        slots, song_ids, ratings = list(slots), list(song_ids), list(ratings)
    else:
        slots, song_ids, ratings = [], [], []
    flushed: list[pd.DataFrame] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("song_id", kind="stable")
        for _, row in pdf.iterrows():
            slots.append(str(row["slot"]))
            song_ids.append(int(row["song_id"]))
            ratings.append(int(row["rating"]))
            if row["slot"] == SENTINEL:
                flushed.append(
                    pd.DataFrame(
                        {
                            "userid": key[0],
                            "slot": slots,
                            "song_id": song_ids,
                            "rating": ratings,
                            "session_size": len(slots),
                        }
                    )
                )
                slots, song_ids, ratings = [], [], []
    if slots:
        state.update((slots, song_ids, ratings))
        state.setTimeoutDuration(60 * 60 * 1000)  # 1 h abandoned-session GC
    else:
        state.remove()
    yield from flushed


def sentinel_sessions_stateful(parsed: DataFrame) -> DataFrame:
    """``parsed``: streaming DataFrame (userid int, slot string,
    song_id int, rating int). Returns completed-session event rows."""
    return parsed.groupBy("userid").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def flush_complete_sessions(events: DataFrame, sentinel: str = SENTINEL) -> DataFrame:
    """Batch semantics: rows of users whose accumulated events include
    the sentinel slot (left_semi — no driver lists, no multiplicity)."""
    done = events.filter(F.col("slot") == sentinel).select("userid").distinct()
    return events.join(done, "userid", "left_semi")
