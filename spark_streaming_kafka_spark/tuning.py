"""Workload tuning profiles: the conf deltas a 100 TB deployment layers
over ``session.get_spark``'s safe defaults.

``get_spark`` sets what is right EVERYWHERE (AQE, Arrow, UTC, sized
shuffle partitions). What changes per workload is a small, explainable
set of knobs — collected here as named profiles so jobs declare intent
(``get_spark(extra_conf=profile("batch_etl", total_cores=8000))``)
instead of cargo-culting numbers. Every value carries its reasoning;
nothing here is load-bearing for correctness (profiles are pure conf).
"""

from __future__ import annotations


def profile(name: str, total_cores: int = 32) -> dict[str, str]:
    """Conf delta for a named workload profile, scaled to the cluster's
    total core count.

    Profiles:

    - ``batch_etl`` — scan→shuffle→write pipelines (the ETL/dedup/query
      surface). Shuffle partitions ≈ 3× cores: small enough that each
      task amortizes its launch, big enough that AQE's runtime coalesce
      — which can only MERGE partitions, never split a too-big one
      (skew-join splitting aside) — starts from a fine granularity.
      128 MB scan partitions: the classic open-cost/straggler balance.
    - ``vector_heavy`` — embedding scans through mapInPandas/BLAS.
      Arrow batch size capped (vectors are wide: 10k rows × 64 float64
      ≈ 5 MB is fine, but the same cap protects 1k-dim corpora where
      the default batch is ~80 MB of Python-worker resident memory);
      fewer, larger shuffle partitions (vector stages are CPU-bound,
      per-task constant costs dominate at high partition counts).
    - ``streaming_serve`` — micro-batch foreachBatch serving. Shuffle
      partitions ≈ cores (micro-batches are small; 3× cores of 10-row
      tasks is pure scheduling); state-store compression on.
    - ``ingest_compact`` — file-layout jobs (compaction, clustering,
      bucketed writes). maxPartitionBytes raised to 256 MB so rewrites
      read fewer, fuller splits; speculative execution off (rewrites
      are write-amplified; duplicate attempts double S3/HDFS traffic).
    """
    cores = max(1, int(total_cores))
    profiles: dict[str, dict[str, str]] = {
        "batch_etl": {
            "spark.sql.shuffle.partitions": str(3 * cores),
            "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        },
        "vector_heavy": {
            "spark.sql.shuffle.partitions": str(2 * cores),
            "spark.sql.execution.arrow.maxRecordsPerBatch": "5000",
        },
        "streaming_serve": {
            "spark.sql.shuffle.partitions": str(cores),
            "spark.sql.streaming.stateStore.compression.codec": "lz4",
        },
        "ingest_compact": {
            "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
            "spark.speculation": "false",
        },
    }
    if name not in profiles:
        raise ValueError(
            f"unknown profile {name!r}; have {sorted(profiles)}"
        )
    return profiles[name]
