"""Streaming ingest gate — the streaming twin of the stateless legs of
``web_corpus_gate`` (boilerplate-ratio cut + frozen-weight quality
classifier).

The production loop mirrors ``streaming/drift.py``: the boilerplate
dictionary is built ONCE from a reference corpus with the batch
operator (:func:`..operators.curation.boilerplate_shingles` — its
output is size-bounded by construction), collected into the task
closure, and every arriving document is gated with zero shuffle and
zero state — a per-row Arrow-batched ratio + a codegen'd sigmoid, so
the gate composes with any downstream streaming sink or dedup tier.

Deliberately OUT of scope here: the per-source cap.  A cap is a
population decision (rank within source), so it belongs to periodic
batch compaction, not a record-at-a-time gate — applying it per
micro-batch would admit ``cap`` docs per BATCH per source, a
different semantics. The docstring states this rather than quietly
shipping the wrong cap.

Parity: gating a static frame through this path equals the batch
``web_corpus_gate`` survivor set (pre-cap) — pinned by test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import logistic_quality

__all__ = ["collect_boilerplate_dict", "gate_stream"]


def collect_boilerplate_dict(dictionary: DataFrame) -> dict[str, frozenset]:
    """Collect a :func:`..operators.curation.boilerplate_shingles`
    output into {source: shingle-set} for the task closure. Bounded by
    the dictionary's construction (≤ shingles-per-doc / min_share rows
    per source); raise if something upstream broke that bound."""
    rows = dictionary.select("source", "shingle").collect()
    if len(rows) > 1_000_000:
        raise ValueError(
            f"boilerplate dictionary unexpectedly large ({len(rows)} rows) "
            "— check min_share; refusing to ship in task closures"
        )
    out: dict[str, set] = {}
    for r in rows:
        out.setdefault(r["source"], set()).add(r["shingle"])
    return {s: frozenset(v) for s, v in out.items()}


def gate_stream(
    docs: DataFrame,
    boiler_dict: dict[str, frozenset],
    k: int = 3,
    ratio_max: float = 0.1,
    prob_min: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Stateless streaming gate: keep documents whose boilerplate
    ratio ≤ ``ratio_max`` and frozen-classifier P(keep) ≥ ``prob_min``.
    Works identically on static and streaming frames (no aggregation,
    no state, no watermark needed).

    The per-doc ratio is computed in an Arrow-batched pass with the
    SAME shingle semantics as the batch operator (whitespace tokens,
    k-window space-joined, distinct), rounded to 6 like the batch
    side, so batch/stream decisions agree exactly.
    """
    cols = list(docs.columns)
    # cheap codegen'd classifier gate FIRST: Catalyst cannot push a
    # filter through the opaque mapInPandas, so rows failing the
    # sigmoid must die before paying the Python shingle pass
    prob = F.round(logistic_quality(F.col(text_col)), 6)
    docs = docs.filter(prob >= prob_min)

    def ratio_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ratios = []
            for text, src in zip(pdf[text_col], pdf[source_col]):
                toks = [t for t in (text or "").split(" ") if t]
                shingles = {
                    " ".join(toks[i : i + k])
                    for i in range(len(toks) - k + 1)
                }
                if not shingles:
                    ratios.append(0.0)
                    continue
                dic = boiler_dict.get(src)
                hits = len(shingles & dic) if dic else 0
                ratios.append(round(hits / len(shingles), 6))
            out = pdf.copy()
            out["__ratio"] = ratios
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields)
    with_ratio = docs.mapInPandas(ratio_batches, schema=schema + ", __ratio double")
    return with_ratio.filter(F.col("__ratio") <= ratio_max).select(*cols)
