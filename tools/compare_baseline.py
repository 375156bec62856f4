"""Side-by-side: Spark bench queries vs their DuckDB oracle, same SF.

Contextualizes BENCH numbers against a single-process columnar engine
(the closest measurable stand-in for BASELINE.md, which publishes no
numbers). Both engines run warm; DuckDB gets all threads.

Usage: python tools/compare_baseline.py [sf_dir] [--json OUT.json]
                                        [--queries NAME ...]
Prints one JSON line: {query: {"duckdb": s, "spark": s, "ratio": r}}.
Default query set is the bench HEADLINE suite; ``--queries`` appends
extra registry names (r12: the rewritten pipeline-tier queries).

Reading the ratios (see README "Performance vs single-process
baseline"): sub-100 ms DuckDB queries sit under Spark's ~0.3 s per-job
scheduling floor — that constant is what a cluster amortizes away; the
queries with real compute land within ~2x either way.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_args = list(sys.argv[1:])
JSON_OUT = None
if "--json" in _args:
    i = _args.index("--json")
    JSON_OUT = _args[i + 1]
    del _args[i : i + 2]
EXTRA_QUERIES: list[str] = []
if "--queries" in _args:
    i = _args.index("--queries")
    EXTRA_QUERIES = _args[i + 1 :]
    del _args[i:]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.1"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    import bench
    from spark_streaming_kafka_spark import get_spark
    from spark_streaming_kafka_spark.queries import REGISTRY

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    spark = get_spark("compare_baseline")
    spark.sparkContext.setLogLevel("ERROR")

    import gc

    out: dict[str, dict[str, float]] = {}
    for name in list(bench.HEADLINE) + EXTRA_QUERIES:
        fn, sql = REGISTRY[name]
        spark.catalog.clearCache()  # release blocks orphaned upstream
        gc.collect()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        s_spark = time.time() - t0
        if sql is None:
            out[name] = {"spark": round(s_spark, 3)}
            continue
        con.execute(sql).fetchall()  # warm
        t0 = time.time()
        con.execute(sql).fetchall()
        s_duck = time.time() - t0
        out[name] = {
            "duckdb": round(s_duck, 3),
            "spark": round(s_spark, 3),
            "ratio": round(s_spark / s_duck, 2) if s_duck > 0 else None,
        }
    print(json.dumps(out))
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump({"sf_dir": SF_DIR, "queries": out}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
