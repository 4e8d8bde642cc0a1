"""Resumability: completed buckets are skipped; resumed output == clean run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_extract_api_spark.checkpoint import (
    bucket_col,
    completed_buckets,
    filter_resumable,
    write_progress,
)
from text_extract_api_spark.synth import synthesize_interleaved

N_BUCKETS = 8


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d, _ = synthesize_interleaved(spark, sf_dir)
    d = d.withColumn("bucket", bucket_col(F.col("doc_id"), N_BUCKETS)).persist()
    yield d
    d.unpersist()


def test_bucket_assignment_stable(docs):
    a = {r["doc_id"]: r["bucket"] for r in docs.select("doc_id", "bucket").collect()}
    b = {
        r["doc_id"]: r["bucket"]
        for r in docs.repartition(13).select("doc_id", "bucket").collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(N_BUCKETS))


def test_resume_skips_done_buckets(spark, docs, tmp_path):
    progress = str(tmp_path / "progress")
    run_id = "resume-test"

    # simulate a half-completed run: buckets {0,1,2} done
    half = docs.filter(F.col("bucket") < 3).select(
        "doc_id", "bucket", F.col("spans")
    )
    write_progress(half, progress, run_id, "2026-01-01 00:00:00")

    done = completed_buckets(spark, progress, run_id)
    assert {r["bucket"] for r in done.collect()} == {0, 1, 2}

    remaining = filter_resumable(docs.drop("bucket"), done, N_BUCKETS)
    got_buckets = {r["bucket"] for r in remaining.select("bucket").distinct().collect()}
    assert got_buckets == set(range(3, N_BUCKETS))

    # union of completed + remaining == full input, disjointly
    n_half = half.count()
    assert n_half + remaining.count() == docs.count()


def test_completed_buckets_empty_when_no_progress(spark, tmp_path):
    done = completed_buckets(spark, str(tmp_path / "nope"), "x")
    assert done.count() == 0


def test_observation_milestones_and_polling(spark, docs, tmp_path):
    """Observation metrics ride the consuming action (Celery update_state
    analog); milestone rows are pollable and never match the resume filter."""
    from text_extract_api_spark.checkpoint import (
        observe_extraction,
        poll_progress,
        write_milestone,
    )

    progress = str(tmp_path / "progress")
    run_id = "obs-test"

    observed, obs = observe_extraction(docs.select("doc_id", "spans", "bucket"), "m0")
    write_progress(observed, progress, run_id, "2026-01-01 00:00:00")
    metrics = obs.get
    assert metrics["docs"] == docs.count()
    assert metrics["spans"] > 0 and metrics["bytes"] > 0

    write_milestone(spark, progress, run_id, "2026-01-01 00:00:00", "wave_0", metrics)

    # milestone rows must not mark buckets done
    done = completed_buckets(spark, progress, run_id)
    assert -1 not in {r["bucket"] for r in done.collect()}

    polled = {r["status"]: r for r in poll_progress(spark, progress, run_id).collect()}
    assert polled["milestone:wave_0"]["docs_done"] == metrics["docs"]
    assert polled["done"]["docs_done"] == metrics["docs"]

    # unknown run → PENDING (empty)
    assert poll_progress(spark, progress, "other-run").count() == 0
    assert poll_progress(spark, str(tmp_path / "missing"), run_id).count() == 0


def test_crash_between_results_write_and_marker_is_exactly_once(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The at-most-one-wave-recompute claim (checkpoint.py:10-13), crash
    window included: kill the job AFTER wave 1's results write but BEFORE its
    done markers, resume, and assert (a) only wave 1 recomputed, (b) the
    results table is exactly-once per doc despite the double write."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spans_extract_job",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs", "spans_extract.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    out = str(tmp_path / "out")
    argv = [
        "--sf-dir", sf_dir, "--out", out,
        "--run-id", "crash1", "--waves", "2", "--n-buckets", str(N_BUCKETS),
    ]

    monkeypatch.setenv("SPARK_GRAFT_CRASH_AFTER_RESULTS", "wave_1")
    with pytest.raises(RuntimeError, match="injected crash"):
        job.main(argv, spark=spark)
    monkeypatch.delenv("SPARK_GRAFT_CRASH_AFTER_RESULTS")
    spark.catalog.clearCache()

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    res_crashed = spark.read.parquet(f"{out}/results")
    # the crash window is real: wave-1 results landed, markers did not
    assert res_crashed.count() == n_docs
    # (materialize before the resume overwrites wave-1's partition files —
    # the old frame's file listing goes stale)
    wave1_docs = res_crashed.filter(F.col("bucket") % 2 == 1).count()
    done = {
        r["bucket"] for r in completed_buckets(spark, f"{out}/progress", "crash1").collect()
    }
    assert done and all(b % 2 == 0 for b in done), done

    summary = job.main(argv + ["--resume"], spark=spark)
    spark.catalog.clearCache()

    # (a) at most one wave recomputed: resume reprocessed only wave-1 docs
    assert 0 < summary["docs"] == wave1_docs < n_docs

    # (b) exactly-once results: one row per doc, full corpus covered
    res = spark.read.parquet(f"{out}/results").filter(F.col("run_id") == "crash1")
    assert res.count() == n_docs
    assert res.select("doc_id").distinct().count() == n_docs
    # and every bucket is now marked done exactly once
    prog = spark.read.parquet(f"{out}/progress")
    marks = prog.filter((F.col("run_id") == "crash1") & (F.col("status") == "done"))
    per_bucket = {r["bucket"]: r["cnt"] for r in
                  marks.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    assert set(per_bucket) == set(range(N_BUCKETS))
    assert all(c == 1 for c in per_bucket.values()), per_bucket
