"""Pipeline-tier perf regression gate (round-7 verdict item 7).

The LLM-pipeline bench tier got a committed per-round record in r7
(docs/BENCH_r{N}_pipeline.json, min-of-2 isolated protocol, membership
pinned by tests/test_bench_suites.py). This gate makes a silent
regression impossible: the NEWEST committed pipeline artifact is
compared query-by-query against the previous round's — any query whose
isolated min grew more than 30% (after single-core calibration
normalization, so a slower box can't masquerade as a plan change)
turns the suite red.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

#: Allowed growth for one query's isolated min between consecutive
#: committed rounds, after box normalization.
MAX_GROWTH = 1.30


def _pipeline_artifacts() -> list[tuple[int, dict]]:
    arts = []
    for p in (REPO / "docs").glob("BENCH_r*_pipeline.json"):
        m = re.search(r"BENCH_r(\d+)_pipeline", p.name)
        if m:
            arts.append((int(m.group(1)), json.loads(p.read_text())))
    return sorted(arts)


def test_pipeline_tier_no_query_regressed():
    arts = _pipeline_artifacts()
    if len(arts) < 2:
        pytest.skip("need two committed pipeline artifacts to compare")
    (prev_r, prev), (cur_r, cur) = arts[-2], arts[-1]
    # Preferred baseline: a SAME-BOX A/B replay — the previous round's
    # CODE re-run by bench.py on the current round's box, committed as
    # docs/BENCH_r{cur}_pipeline_ab.json (with replay_of_commit
    # provenance). Cross-session boxes differ in MULTI-CORE throughput
    # by up to ~25% while the single-core md5 calib barely moves (r9:
    # calib within 2%, every untouched query +15-60% vs the r8 record;
    # the replay proved the code neutral at 1.02x). When the replay
    # exists, it IS the box-controlled baseline and no further
    # normalization applies.
    ab_path = REPO / "docs" / f"BENCH_r{cur_r}_pipeline_ab.json"
    if ab_path.exists():
        prev = json.loads(ab_path.read_text())
        scale = 1.0
    else:
        # Fallback: single-core calib normalization against the previous
        # round's committed record. Clamped to [1.0, 1.5] — a FASTER box
        # never tightens the 30% bound (that would flake on hardware
        # luck), and a >1.5x slower box is a broken record, not a
        # normalization case.
        try:
            scale = cur["calib"]["md5_32mb_sec"] / prev["calib"]["md5_32mb_sec"]
        except (KeyError, ZeroDivisionError):
            scale = 1.0
        scale = min(max(scale, 1.0), 1.5)
    missing = set(prev["queries"]) - set(cur["queries"])
    assert not missing, (
        f"r{cur_r} pipeline record dropped queries present in r{prev_r}: "
        f"{sorted(missing)}"
    )
    regressed = {
        q: (prev["queries"][q], cur["queries"][q])
        for q in prev["queries"]
        if cur["queries"][q] > prev["queries"][q] * MAX_GROWTH * scale
    }
    assert not regressed, (
        f"pipeline queries regressed >{int((MAX_GROWTH - 1) * 100)}% "
        f"r{prev_r}→r{cur_r} (prev_s, cur_s): {regressed}"
    )
