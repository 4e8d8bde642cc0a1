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

from pyspark.sql import SparkSession, functions as F

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


def run_streaming_dedup_windowed(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    delay: str = "1 hour",
    max_files_per_trigger: int = 1,
) -> None:
    """Bounded-retention streaming dedup (the module docstring's documented
    variant, shipped r4): ``dropDuplicatesWithinWatermark`` over an
    event-time column dedups only WITHIN the time horizon ``delay`` — a
    payload re-arriving within the horizon of its first arrival is dropped;
    one re-arriving beyond it is a NEW event (state for the old arrival is
    evicted once the watermark passes it), so the state store holds only
    the horizon's worth of keys instead of every key ever seen. That is
    the 100-TB answer when "same document re-crawled a month later" must
    re-enter the pipeline (recrawl freshness) while same-day duplicates
    still collapse.

    Input schema: (payload string, ts timestamp). Emits each horizon-first
    arrival to ``out_dir``/unique; exactly-once via the streaming
    checkpoint, state survives restarts.
    """
    stream = (
        spark.readStream.schema("payload string, ts timestamp")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    deduped = (
        stream.withColumn("content_hash", F.md5("payload"))
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    q = (
        deduped.select("content_hash", "ts")
        .writeStream.format("parquet")
        .option("path", f"{out_dir}/unique")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
