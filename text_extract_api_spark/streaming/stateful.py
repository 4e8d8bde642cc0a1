"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference's only cross-request state is the Redis memo and Celery task
states (``tasks.py:44-69``); the engine's incremental path (incremental.py)
covers those. What a *streaming* deployment additionally needs is per-key
state that survives micro-batches — e.g. "how many documents / payload bytes
has each source contributed so far, and in how many batches" — the live
analog of the progress table, maintained incrementally instead of
re-aggregated.

``running_source_totals`` implements that shape with
``applyInPandasWithState`` (GroupState, per-key), the idiomatic Spark
construct for custom stateful operators:

- grouped by ``source`` → state is one (docs, bytes, batches) triple per
  key; per-micro-batch work is one Arrow batch per key — bounded memory.
- state timeout: none (totals are monotone); a TTL'd variant would pass
  ``GroupStateTimeout.ProcessingTimeTimeout`` and call
  ``state.setTimeoutDuration``.
- at scale the state store is RocksDB
  (``spark.sql.streaming.stateStore.providerClass``) partitioned by the
  group key — adding executors shards the key space (the N→4N axis applies
  to stateful ops unchanged).

The test drives it with two ``availableNow`` drains over a growing input
directory and asserts totals accumulate across restarts via the state-store
checkpoint. (``applyInPandasWithState`` is streaming-only in Spark 4 — a
batch frame raises UnsupportedOperationException; the batch equivalent of
this rollup is a plain groupBy/agg.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "docs long, bytes long, batches long"
OUTPUT_SCHEMA = "source string, docs long, bytes long, batches long"


def _accumulate(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    docs, nbytes, batches = state.get if state.exists else (0, 0, 0)
    new_docs = 0
    new_bytes = 0
    for pdf in pdfs:
        new_docs += len(pdf)
        new_bytes += int(pdf["n_chars"].sum())
    docs += new_docs
    nbytes += new_bytes
    batches += 1
    state.update((docs, nbytes, batches))
    yield pd.DataFrame(
        {"source": [key[0]], "docs": [docs], "bytes": [nbytes], "batches": [batches]}
    )


def running_source_totals(docs: DataFrame) -> DataFrame:
    """(source, docs, bytes, batches) — cumulative per-source totals, one
    output row per key per micro-batch (streaming frames only)."""
    return (
        docs.select("source", "n_chars")
        .groupBy("source")
        .applyInPandasWithState(
            _accumulate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
