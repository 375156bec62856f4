"""Streaming incremental dedup against persisted manifests — the
streaming twin of ``curation.manifest_dedup`` (exact tier) and
``dedup.minhash_manifest_matches`` (near-dup tier).

The production loop this wires: a document stream lands in
micro-batches; each batch is (1) exact-deduped against the hash
manifest and within itself, (2) its survivors near-dup-checked against
the signature manifest, and (3) the kept documents handed to the
caller's sink while BOTH manifests grow by exactly the kept rows — so
batch N+1 deduplicates against everything batch N kept, and a restart
resumes from the persisted manifests rather than rescanning history.

State lives in the manifests (plain parquet the caller owns), not the
state store: the checkpoint carries only source offsets, and each
batch's manifest growth lands in its OWN ``batch_id=N`` partition,
dynamically overwritten — so a crash-replayed batch (a) does not read
its failed attempt's partition back as "history" (which would make the
batch drop itself and silently deliver nothing), and (b) rewrites the
identical partition instead of double-growing the manifest. Replay is
therefore exactly-once into the manifests and at-least-once into
``on_kept`` (pair it with an idempotent downstream sink, e.g.
``sinks.idempotent_parquet_sink``).

Batch/streaming parity is by construction: the batch operators run
verbatim inside ``foreachBatch``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..operators.curation import manifest_dedup
from ..operators.dedup import minhash_manifest_matches, minhash_signatures

__all__ = ["incremental_dedup_sink"]


def incremental_dedup_sink(
    spark: SparkSession,
    hash_manifest_path: str,
    sig_manifest_path: str,
    on_kept: Callable[[DataFrame, int], None],
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` callable implementing the two-tier
    incremental dedup loop. ``on_kept(kept_df, batch_id)`` receives the
    batch's surviving documents (exact-fresh AND not a near-dup of any
    manifest signature); the manifests at the two paths are read at
    batch start and appended at batch end.

    Scale: per batch, the hash manifest contributes one anti-join (16
    B/doc history; bloom-prefilterable) and the signature manifest one
    band-key join (256 B/doc history) — history is never re-read as
    text. The batch's own work is one signature pass over the batch.
    """

    def _read_manifest(path: str, schema: str, batch_id: int) -> DataFrame:
        # Exclude the CURRENT batch id: on crash-replay the failed
        # attempt's manifest partition already exists, and reading it
        # would make the batch see ITSELF as history — tier 1 would
        # drop every row and the replay would deliver nothing
        # downstream (silent data loss). Filtering on the partition
        # column prunes, never scans, the excluded directory.
        try:
            return spark.read.parquet(path).filter(
                F.col("batch_id") != batch_id
            )
        except AnalysisException as exc:
            # ONLY the first-batch no-manifest case may fail open. Any
            # other read failure (corrupt parquet, permissions, storage
            # outage) must abort the batch — returning empty there would
            # silently disable dedup history and let duplicates flow to
            # on_kept AND into the manifests permanently.
            msg = str(exc).lower()
            if (
                "path_not_found" in msg
                or "path does not exist" in msg
                # empty manifest dir (created but never written) — both
                # the Spark 4 error-class token and the 3.x prose form
                or "unable_to_infer_schema" in msg
                or "unable to infer schema" in msg
            ):
                return spark.createDataFrame([], schema + ", batch_id long")
            raise

    def _write_manifest(df: DataFrame, path: str, batch_id: int) -> None:
        # One partition directory per batch, OVERWRITTEN on replay —
        # the same kept rows are recomputed (the dedup read above is
        # deterministic given prior batches), so a replayed write is
        # byte-idempotent instead of double-growing the manifest.
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(path)
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hashes = _read_manifest(hash_manifest_path, "text_hash string", batch_id)
        sigs = _read_manifest(
            sig_manifest_path, "doc_id long, signature array<bigint>", batch_id
        )

        # tier 1: exact — drop manifest-seen texts, dedup within batch
        fresh_keys = manifest_dedup(batch_df, hashes, text_col, id_col)
        fresh = batch_df.join(
            F.broadcast(fresh_keys.select(id_col)), id_col
        ).persist()
        # tier 2: near-dup vs the signature manifest
        if sigs.isEmpty():
            kept = fresh
        else:
            near = minhash_manifest_matches(
                fresh, sigs.select("doc_id", "signature"), threshold=threshold,
                text_col=text_col, id_col=id_col,
            )
            kept = fresh.join(
                F.broadcast(near.select(F.col("doc_id").alias(id_col))),
                id_col,
                "left_anti",
            )
        kept = kept.persist()
        on_kept(kept, batch_id)
        # grow both manifests by exactly the kept rows
        _write_manifest(
            kept.select(F.md5(F.col(text_col)).alias("text_hash")),
            hash_manifest_path,
            batch_id,
        )
        _write_manifest(
            minhash_signatures(kept, text_col=text_col, id_col=id_col),
            sig_manifest_path,
            batch_id,
        )
        kept.unpersist()
        fresh.unpersist()

    return sink
