"""Evidence-hygiene gate (round-6 verdict item 2): the committed
definitive correctness sweep must never trail the query registry.

Round 6 shipped `video_fingerprint_dedup` registered AFTER the sweep
artifact was written, so the committed "every query proved green"
guarantee was stale. This test makes that impossible: the NEWEST
`CORRECTNESS_full_r*.json` at the repo root must contain exactly the
registry's query set with zero failures — register a query without
re-running `tools/check_correctness.py --vanilla --json ...` and the
suite goes red.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _latest_sweep() -> tuple[Path, dict]:
    arts = sorted(
        REPO.glob("CORRECTNESS_full_r*.json"),
        key=lambda p: int(re.search(r"_r(\d+)", p.name).group(1)),
    )
    assert arts, "no committed CORRECTNESS_full_r*.json sweep artifact"
    p = arts[-1]
    return p, json.loads(p.read_text())


def test_sweep_artifact_covers_exact_registry():
    from spark_streaming_kafka_spark.queries import QUERIES

    path, art = _latest_sweep()
    swept = set(art["queries"])
    registry = set(QUERIES)
    missing = sorted(registry - swept)
    extra = sorted(swept - registry)
    assert not missing, (
        f"{path.name} is stale: registered queries never swept: {missing} — "
        "regenerate with tools/check_correctness.py --vanilla --json"
    )
    assert not extra, f"{path.name} sweeps unregistered queries: {extra}"
    assert art["n_fail"] == 0, f"{path.name} records failures"
    assert art["n_pass"] == len(registry)
    statuses = {q: v["status"] for q, v in art["queries"].items() if not v["status"].startswith("PASS")}
    assert not statuses, f"non-PASS rows in {path.name}: {statuses}"
