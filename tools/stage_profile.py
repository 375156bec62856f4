"""Per-stage profile of a registry query: where the executor time and
shuffle bytes actually go.

Usage: python tools/stage_profile.py <query> [sf_dir]

Runs the query once warm (codegen/JIT paid), once measured, then reads
the Spark UI REST API for the measured run's stages: executor run time
(CPU across all tasks — divide by cores for a wall-clock floor), task
count, shuffle read/write volume, and input bytes. This is how the
repo's perf work is grounded: a query that is "slow" from scheduling
floor (many small barrier stages) profiles completely differently from
one with a hot compute stage, and the fix differs accordingly —
Catalyst/plan changes for the former, expression/vectorization work
for the latter.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: stage_profile.py <query> [sf_dir]")
    name = sys.argv[1]

    from spark_streaming_kafka_spark import get_spark
    from spark_streaming_kafka_spark.queries import QUERIES

    spark = get_spark("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[name]

    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
    gc.collect()
    # stages before the measured run, so we can attribute what follows
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def stages():
        return json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )

    before = {s["stageId"] for s in stages()}
    t0 = time.time()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    rows = [s for s in stages() if s["stageId"] not in before]
    rows.sort(key=lambda s: s["stageId"])
    cores = spark.sparkContext.defaultParallelism
    print(f"{name}: wall {wall:.3f}s over {len(rows)} stages ({cores} cores)")
    print(
        f"{'stage':>5} {'tasks':>5} {'cpu_s':>8} {'cpu/core':>8} "
        f"{'shuf_r':>9} {'shuf_w':>9} {'input':>10}"
    )
    tot_cpu = 0.0
    for s in rows:
        cpu = s.get("executorRunTime", 0) / 1000.0
        tot_cpu += cpu
        print(
            f"{s['stageId']:>5} {s['numCompleteTasks']:>5} {cpu:>8.2f} "
            f"{cpu / cores:>8.3f} "
            f"{s.get('shuffleReadBytes', 0):>9} "
            f"{s.get('shuffleWriteBytes', 0):>9} "
            f"{s.get('inputBytes', 0):>10}"
        )
    barrier_floor = len(rows) * 0.25
    print(
        f"total cpu {tot_cpu:.2f}s (= {tot_cpu / cores:.3f}s/core); "
        f"~{barrier_floor:.1f}s stage-barrier floor at 0.25s/stage"
    )
    print(
        "diagnosis:",
        "compute-bound (fix expressions/vectorization)"
        if tot_cpu / cores > barrier_floor
        else "barrier-bound (fix plan shape / stage count; amortizes at scale)",
    )
    spark.stop()


if __name__ == "__main__":
    main()
