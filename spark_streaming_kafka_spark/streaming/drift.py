"""Streaming distribution-drift monitor — the streaming twin of
``operators/drift.py::psi_report``.

The production loop: a reference corpus is binned ONCE
(:func:`reference_counts` — bin-sized, persisted), then every
micro-batch of the ingest stream is binned (one scan of the batch) and
scored against it with the SAME ``psi_from_counts`` the batch operator
uses — parity is by construction, not by reimplementation. Reports are
|features| rows per batch, handed to a caller callback (alerting,
metrics sink, quarantine trigger).

Semantics choice: each batch is compared independently against the
fixed reference (the "is this ingest batch weird?" gate). Cumulative
drift ("has the stream as a whole shifted?") is the same machinery
with an accumulator kept by the caller — add the batch's bin counts
into a running table and pass that instead; bin counts are additive,
which is the property that makes this monitor mergeable at any
granularity.

State: none in the state store — the reference is a broadcast-sized
cached table and batches are stateless, so the monitor adds zero
checkpoint footprint and restarts clean.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame

from ..operators.drift import bin_counts, psi_from_counts

__all__ = ["reference_counts", "drift_monitor_sink"]


def reference_counts(
    ref: DataFrame, features: list[tuple[str, Column]]
) -> DataFrame:
    """Bin the reference corpus once and persist the (bin-sized)
    result — the one corpus-scale scan in the monitor's lifetime."""
    rc = bin_counts(ref, features).persist()
    rc.count()  # materialize now, not inside the first micro-batch
    return rc


def drift_monitor_sink(
    ref_counts: DataFrame,
    features: list[tuple[str, Column]],
    on_report: Callable[[int, list], None],
    min_rows: int = 1,
    eps: float = 1e-6,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` callable: for each micro-batch with at
    least ``min_rows`` rows, compute the per-feature PSI vs the
    reference and call ``on_report(batch_id, rows)`` with the collected
    (feature, ref_rows, cur_rows, n_bins, psi) rows — bounded by
    |features|·|bins|, never batch-sized.

    ``min_rows`` guards the degenerate report: a near-empty batch
    makes every proportion 0-or-1 and PSI maximal — noise, not drift.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.limit(min_rows).count() < min_rows:
            return
        report = psi_from_counts(
            ref_counts, bin_counts(batch_df, features), eps=eps
        ).collect()
        on_report(batch_id, report)

    return sink
