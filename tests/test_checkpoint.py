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
