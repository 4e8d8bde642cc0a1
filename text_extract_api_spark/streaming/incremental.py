"""Incremental ingestion — Structured Streaming over the docs table.

The reference's "streaming" is a Celery task queue (``main.py:69-72`` →
``tasks.py:18-96``): documents trickle in over HTTP and workers drain the
queue. The engine's analog is a Structured Streaming job over the input
table: ``readStream`` with ``trigger(availableNow=True)`` drains whatever
accumulated since the last checkpoint, ``foreachBatch`` runs the *same*
batch pipeline per micro-batch (one code path for batch and incremental),
and the streaming checkpoint gives exactly-once sink semantics — the
queue's at-least-once + Redis-memo dedup, strengthened.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import run_extract_pipeline
from ..schema import DOCS_INTERLEAVED_SCHEMA


def run_incremental(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    media_pages: DataFrame | None = None,
    run_id: str = "stream-0",
) -> int:
    """Drain all available input files once; returns micro-batch count."""
    stream = (
        spark.readStream.schema(DOCS_INTERLEAVED_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )
    n_batches = {"n": 0}

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        results, new_cache = run_extract_pipeline(
            spark, batch_df, media_pages, None, f"{run_id}-e{epoch_id}"
        )
        results.write.mode("append").parquet(f"{out_dir}/results")
        new_cache.write.mode("append").parquet(f"{out_dir}/cache")
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]
