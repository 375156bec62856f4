"""Direct-call tests for the vectorized sentinel-session kernel
(streaming/sessions.py::_session_fn, reference spark_kafka.py:71-94).

The streaming integration path is pinned in test_streaming.py; here we
call the kernel directly with a fake GroupState so we can (1) prove
value parity against the straightforward row-at-a-time reference
implementation on adversarial sequences, and (2) pin the round-6
advice item — the vectorized kernel must beat the row loop by ≥10×
rows/s on a 100k-event batch.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

from spark_streaming_kafka_spark.streaming.sessions import SENTINEL, _session_fn


class FakeState:
    """Duck-typed stand-in for pyspark GroupState (direct-call tests)."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v
        self.removed = False

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _rowloop_session_fn(key, pdfs, state):
    """The pre-round-7 row-at-a-time implementation, kept verbatim as
    the semantics oracle for the vectorized kernel."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        slots, song_ids, ratings = state.get
        slots, song_ids, ratings = list(slots), list(song_ids), list(ratings)
    else:
        slots, song_ids, ratings = [], [], []
    flushed = []
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
        state.setTimeoutDuration(60 * 60 * 1000)
    else:
        state.remove()
    yield from flushed


def _norm(dfs):
    """Flush list -> one canonical DataFrame for comparison."""
    if not dfs:
        return pd.DataFrame(
            columns=["userid", "slot", "song_id", "rating", "session_size"]
        )
    out = pd.concat(dfs, ignore_index=True)
    return out.astype(
        {"userid": "int64", "song_id": "int64", "rating": "int64", "session_size": "int64"}
    )


def _batch(slots, start_song=0):
    n = len(slots)
    return pd.DataFrame(
        {
            "slot": slots,
            "song_id": np.arange(start_song, start_song + n),
            "rating": np.arange(n) % 5,
        }
    )


CASES = [
    # (list of per-pdf slot sequences, initial state or None)
    ([["m1", "m2", "m3"]], None),
    ([["m1", "m2"]], None),  # no sentinel: all carried
    ([["m3"]], None),  # bare sentinel
    ([["m1", "m3", "m2", "m3", "m1"]], None),  # two sessions + remainder
    ([["m1"], ["m2", "m3"], ["m3", "m1"]], None),  # multi-pdf carry
    ([["m2", "m3"]], (["m0", "m1"], [100, 101], [4, 4])),  # carried state
    ([[]], None),  # empty batch
    ([["m3", "m3", "m3"]], None),  # back-to-back sentinels
]


@pytest.mark.parametrize("seqs,init", CASES)
def test_vectorized_matches_rowloop(seqs, init):
    key = (7,)
    s_vec, s_ref = FakeState(init), FakeState(init)
    got = _norm(list(_session_fn(key, [_batch(s, i * 50) for i, s in enumerate(seqs)], s_vec)))
    want = _norm(list(_rowloop_session_fn(key, [_batch(s, i * 50) for i, s in enumerate(seqs)], s_ref)))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # State parity: same carried remainder (or both removed).
    assert s_vec.removed == s_ref.removed
    if not s_vec.removed:
        vs, vg, vr = s_vec.get
        rs, rg, rr = s_ref.get
        assert list(vs) == list(rs) and list(vg) == list(rg) and list(vr) == list(rr)
        assert s_vec.timeout_ms == s_ref.timeout_ms


def test_timed_out_state_removed():
    s = FakeState((["m1"], [1], [1]), timed_out=True)
    assert list(_session_fn((7,), [_batch(["m2"])], s)) == []
    assert s.removed


def test_session_fn_vectorized_throughput():
    """Round-6 advice: ≥10× rows/s vs the row loop on a 100k-event
    synthetic batch (1000 users' worth of traffic through one group:
    sentinel every ~100 events)."""
    n = 100_000
    rng = np.random.default_rng(42)
    slots = np.where(rng.random(n) < 0.01, SENTINEL, "m1").astype(object)
    pdf = pd.DataFrame(
        {"slot": slots, "song_id": np.arange(n), "rating": rng.integers(0, 5, n)}
    )

    # process_time, not wall clock, and min-of-3 INTERLEAVED passes per
    # side: the full suite runs under heavy contention, where even CPU
    # time inflates one-sidedly (cache/membw pressure varies second to
    # second); interleaving and taking mins compares both kernels at
    # their least-disturbed moment.
    slice_n = 10_000
    t_vec = t_ref = float("inf")
    out_vec = out_ref_slice = None
    for _ in range(3):
        t0 = time.process_time()
        out_vec = _norm(list(_session_fn((7,), [pdf], FakeState())))
        t_vec = min(t_vec, time.process_time() - t0)
        t0 = time.process_time()
        out_ref_slice = _norm(
            list(_rowloop_session_fn((7,), [pdf.iloc[:slice_n]], FakeState()))
        )
        t_ref = min(t_ref, (time.process_time() - t0) * (n / slice_n))

    # Parity on the timed slice.
    out_vec_slice = _norm(list(_session_fn((7,), [pdf.iloc[:slice_n]], FakeState())))
    pd.testing.assert_frame_equal(out_vec_slice, out_ref_slice, check_dtype=False)
    assert len(out_vec) > 0

    speedup = t_ref / t_vec
    assert speedup >= 10.0, f"vectorized kernel only {speedup:.1f}x the row loop"
