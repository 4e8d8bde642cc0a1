"""Streaming exact dedup — cross-micro-batch via the state store.

The batch engine's ``dedup_exact_payload`` (one shuffle on md5) has a
streaming twin: documents trickling in must dedup against everything seen
in EARLIER micro-batches too, which no per-batch groupBy can do. Structured
Streaming's ``dropDuplicates`` keeps the seen-key set in the state store
(RocksDB/HDFS-backed at scale), so the first arrival of each content hash
is emitted exactly once and every later duplicate — same batch or a later
one — is dropped; the checkpoint makes the state survive restarts, i.e.
a drained-and-restarted stream still refuses previously seen payloads.

State growth note (the 100 TB question): keys are 32-byte md5 hex strings,
one per DISTINCT payload — the state is the dedup answer itself, not a
leak. For bounded retention semantics (dedup within a time horizon), use
``dropDuplicatesWithinWatermark`` with an event-time column instead; the
unbounded form here matches the reference's Redis cache, which also never
expires (cache read, tasks.py:44-48).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..pipeline import with_content_hash
from ..schema import DOCS_INTERLEAVED_SCHEMA


def run_streaming_dedup(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain all available input once, emitting each distinct payload's
    first arrival to ``out_dir``/unique (parquet, exactly-once via the
    streaming checkpoint)."""
    stream = (
        spark.readStream.schema(DOCS_INTERLEAVED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    deduped = with_content_hash(stream).dropDuplicates(["content_hash"])
    q = (
        deduped.select("doc_id", "content_hash")
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/unique")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
