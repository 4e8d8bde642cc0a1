"""Per-partition checkpoint / lineage — resumable runs.

The reference surfaces progress through Celery ``update_state`` milestones
(``extract/tasks.py:40-94``: PENDING → PROGRESS(10/30/50/75) → SUCCESS) and
resumes nothing — a crashed task recomputes from scratch (modulo the Redis
cache). At 10^12 documents a restartable job is mandatory (north rule), so
the engine checkpoints at *bucket* granularity:

- every document is assigned a stable bucket ``pmod(xxhash64(doc_id), B)``;
- a run writes results partitioned by bucket, then appends one ``done``
  progress row per bucket (result write precedes the marker → a crash
  between the two re-does at most one bucket, and the overwrite-by-bucket
  write keeps that idempotent — exactly-once results);
- resume = anti-join the input against completed buckets of the same
  ``run_id`` and process only the remainder.

Bucket count B is the resume granularity / bookkeeping trade-off: B ≈ 4×
executor count keeps markers tiny at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .io import read_table, write_table
from .partitioning import payload_size_col

_PROGRESS_DDL = (
    "run_id string, partition_id int, bucket int, status string, "
    "docs_done long, spans_done long, bytes_done long"
)


def _milestone_row(
    spark: SparkSession, run_id: str, run_ts: str, name: str, metrics: dict
) -> DataFrame:
    """One milestone progress row (shared by write_milestone and the merged
    write_progress path — the schema must stay identical between them)."""
    return (
        spark.createDataFrame(
            [
                (
                    run_id,
                    -1,
                    -1,
                    f"milestone:{name}",
                    int(metrics.get("docs") or 0),
                    int(metrics.get("spans") or 0),
                    int(metrics.get("bytes") or 0),
                )
            ],
            _PROGRESS_DDL,
        )
        .withColumn("updated_at", F.lit(run_ts).cast("timestamp"))
        .coalesce(1)
    )


def bucket_col(doc_id: Column, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(doc_id), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, progress_loc: str, run_id: str) -> DataFrame:
    """Buckets already marked done for this run (empty if no progress yet)."""
    try:
        prog = read_table(spark, progress_loc)
    except Exception:
        return spark.createDataFrame([], "bucket int")
    return (
        prog.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("bucket")
        .distinct()
    )


def filter_resumable(
    docs: DataFrame, done: DataFrame, n_buckets: int
) -> DataFrame:
    """Drop documents whose bucket already completed (idempotent resume)."""
    withb = docs.withColumn("bucket", bucket_col(F.col("doc_id"), n_buckets))
    return withb.join(F.broadcast(done), "bucket", "left_anti")


def observe_extraction(results: DataFrame, name: str):
    """Attach an in-flight metrics observation to the results frame — the
    engine analog of Celery ``update_state`` milestones (tasks.py:40-94):
    metrics are collected DURING the write action (observation node in the
    plan), not by a separate pass afterwards.

    Returns (observed_df, observation); read ``observation.get`` after the
    consuming action completes.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = results.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.coalesce(F.sum(F.size("spans")), F.lit(0)).alias("spans"),
        F.coalesce(F.sum(payload_size_col()), F.lit(0)).alias("bytes"),
    )
    return observed, obs


def write_milestone(
    spark: SparkSession,
    progress_loc: str,
    run_id: str,
    run_ts: str,
    milestone: str,
    metrics: dict,
) -> None:
    """Append one milestone row (status='milestone:<name>') with observed
    metrics — the per-wave analog of the reference's PROGRESS states
    (10/30/50/75, tasks.py:41-63). Milestone rows use bucket=-1 and never
    match the ``status == 'done'`` resume filter."""
    write_table(
        _milestone_row(spark, run_id, run_ts, milestone, metrics),
        progress_loc,
        mode="append",
    )


def poll_progress(spark: SparkSession, progress_loc: str, run_id: str) -> DataFrame:
    """Result-polling view (the reference's GET /ocr/result state machine,
    main.py:171-188): per-status rollup for a run. Empty frame = PENDING."""
    try:
        prog = read_table(spark, progress_loc)
    except Exception:
        return spark.createDataFrame(
            [], "status string, n_marks long, docs_done long, spans_done long"
        )
    return (
        prog.filter(F.col("run_id") == run_id)
        .groupBy("status")
        .agg(
            F.count("*").alias("n_marks"),
            F.sum("docs_done").alias("docs_done"),
            F.sum("spans_done").alias("spans_done"),
        )
    )


def write_progress(
    results: DataFrame,
    progress_loc: str,
    run_id: str,
    run_ts: str,
    milestone: tuple[str, dict] | None = None,
) -> None:
    """Append one done-marker row per bucket with extraction metrics.

    ``run_ts`` is an injected timestamp (job argument) — never wall clock,
    per the determinism contract (the reference templates wall-clock
    ``datetime.now()`` into filenames, storage_strategy.py:26-31; the engine
    pins it).

    ``milestone``: optional ``(name, metrics)`` — unioned into the same
    append so the marker write and the milestone cost ONE action, not two
    (each extra action is fixed non-scaling driver time; measured ~1.9 s for
    a single milestone row at local[8]).
    """
    marks = (
        results.groupBy("bucket")
        .agg(
            F.count("*").alias("docs_done"),
            F.sum(F.size("spans")).alias("spans_done"),
            # chars of extracted text only — a to_json over the span array
            # would re-serialize the whole corpus just for a progress metric
            F.sum(payload_size_col()).alias("bytes_done"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.spark_partition_id().alias("partition_id"),
            F.col("bucket"),
            F.lit("done").alias("status"),
            F.col("docs_done").cast("long"),
            F.col("spans_done").cast("long"),
            F.col("bytes_done").cast("long"),
            F.lit(run_ts).cast("timestamp").alias("updated_at"),
        )
    )
    if milestone is not None:
        name, metrics = milestone
        marks = marks.unionByName(
            _milestone_row(results.sparkSession, run_id, run_ts, name, metrics)
        )
    # one marker row per bucket — without the coalesce this writes B files of
    # one row each and pays B task-commits for a KB of data
    write_table(marks.coalesce(1), progress_loc, mode="append")


def write_bucket_marks(
    results: DataFrame,
    progress_loc: str,
    run_id: str,
    run_ts: str,
    milestone: tuple[str, dict] | None = None,
) -> None:
    """``write_progress`` for frames WITHOUT a spans payload (e.g. the prep
    job's verdict rows): one done-marker per bucket, docs counted, spans/
    bytes zero. Same schema, same resume semantics."""
    marks = (
        results.groupBy("bucket")
        .agg(F.count("*").alias("docs_done"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.spark_partition_id().alias("partition_id"),
            F.col("bucket"),
            F.lit("done").alias("status"),
            F.col("docs_done").cast("long"),
            F.lit(0).cast("long").alias("spans_done"),
            F.lit(0).cast("long").alias("bytes_done"),
            F.lit(run_ts).cast("timestamp").alias("updated_at"),
        )
    )
    if milestone is not None:
        name, metrics = milestone
        marks = marks.unionByName(
            _milestone_row(results.sparkSession, run_id, run_ts, name, metrics)
        )
    write_table(marks.coalesce(1), progress_loc, mode="append")


def write_stage_marker(
    spark: SparkSession,
    progress_loc: str,
    run_id: str,
    run_ts: str,
    stage: str,
    metrics: dict | None = None,
) -> None:
    """Append one ``stage:<name>`` completion row — the resume unit for
    GLOBAL pipeline stages (quota/shard/noncanon cannot be bucket-split the
    way per-doc extraction can: their output depends on every input row).
    The stage's output write precedes the marker, and stage outputs are
    deterministic overwrites, so a crash between the two re-does exactly
    one stage and lands on identical bytes — exactly-once."""
    metrics = metrics or {}
    row = (
        spark.createDataFrame(
            [
                (
                    run_id,
                    -1,
                    -1,
                    f"stage:{stage}",
                    int(metrics.get("docs") or 0),
                    int(metrics.get("spans") or 0),
                    int(metrics.get("bytes") or 0),
                )
            ],
            _PROGRESS_DDL,
        )
        .withColumn("updated_at", F.lit(run_ts).cast("timestamp"))
        .coalesce(1)
    )
    write_table(row, progress_loc, mode="append")


def completed_stages(spark: SparkSession, progress_loc: str, run_id: str) -> set[str]:
    """Names of stages already marked complete for this run (empty set when
    no progress exists yet). Stage rows never collide with the bucket-level
    ``done`` resume filter (distinct status prefix)."""
    try:
        prog = read_table(spark, progress_loc)
    except Exception:
        return set()
    rows = (
        prog.filter(
            (F.col("run_id") == run_id) & F.col("status").startswith("stage:")
        )
        .select("status")
        .distinct()
        .collect()
    )
    return {r["status"].removeprefix("stage:") for r in rows}
