"""Produce the committed isolated bench artifact: run ``bench.py``
N times in fresh subprocesses (each already warm-up + min-of-2
internally), take the per-query MIN across runs, and write one JSON in
the same shape bench.py prints, plus the calib block of the fastest
run and the raw per-run totals for provenance.

Usage: python tools/bench_isolated.py OUT.json [suite] [n_runs]

This is the protocol the README's bench history uses (min-of-2
isolated); keeping it as a tool means the artifact is one command and
can't silently drift from the protocol.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/BENCH_isolated.json"
    suite = sys.argv[2] if len(sys.argv) > 2 else "headline"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    runs = []
    for i in range(n_runs):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), suite],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        runs.append(rec)
        print(f"run {i + 1}/{n_runs}: {rec['value']}s (load {rec['calib']['loadavg_1m']})")

    best = min(runs, key=lambda r: r["value"])
    queries = {
        q: min(r["queries"][q] for r in runs) for q in runs[0]["queries"]
    }
    out = {
        "metric": best["metric"],
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": best["sf"],
        "calib": best["calib"],
        "protocol": f"per-query min over {n_runs} fresh bench.py runs "
        "(each warm-up pass + internal min-of-2)",
        "run_totals": [r["value"] for r in runs],
    }
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}: {out['value']}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
