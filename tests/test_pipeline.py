"""Span-sequence golden tests: Spark pipeline vs the pure-Python oracle.

The north-rule invariant: per doc_id, strict sequence equality on
(kind, text, media_ref, order).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from text_extract_api_spark.pipeline import (
    extract_flat_no_cache,
    run_extract_pipeline,
    with_content_hash,
)
from text_extract_api_spark.synth import synthesize_interleaved

from .oracle import expected_extraction


@pytest.fixture(scope="module")
def synth(spark, sf_dir):
    docs, media = synthesize_interleaved(spark, sf_dir)
    docs = docs.persist()
    media = media.persist()
    yield docs, media
    docs.unpersist()
    media.unpersist()


@pytest.fixture(scope="module")
def expected(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return expected_extraction(pdf)


def _collect_flat(df) -> dict[str, list[tuple]]:
    out: dict[str, list[tuple]] = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], []).append(
            (r["kind"], r["text"], r["media_ref"], r["offset"])
        )
    for v in out.values():
        v.sort(key=lambda s: s[3])
    return out


def test_flat_extraction_matches_oracle(spark, synth, expected):
    docs, media = synth
    got = _collect_flat(extract_flat_no_cache(spark, docs, media))
    assert set(got) == set(expected)
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id], f"doc {doc_id} mismatch"


def test_permutation_invariance(spark, synth, expected):
    """Shuffled/odd-partitioned input must yield identical span sequences —
    order may never come from partition layout."""
    docs, media = synth
    shuffled = docs.repartition(7).sortWithinPartitions(F.md5("doc_id"))
    got = _collect_flat(extract_flat_no_cache(spark, shuffled, media))
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id]


def test_full_pipeline_results_match_oracle(spark, synth, expected):
    docs, media = synth
    results, new_cache = run_extract_pipeline(spark, docs, media, None, "t1")
    rows = results.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    got = _collect_flat(rows)
    for doc_id in expected:
        assert got[doc_id] == expected[doc_id]


def test_cache_hit_branch_short_circuits(spark, synth):
    docs, media = synth
    _, cache1 = run_extract_pipeline(spark, docs, media, None, "warm")
    cache1 = cache1.persist()
    results2, new2 = run_extract_pipeline(spark, docs, media, cache1, "second")
    assert results2.filter(~F.col("from_cache")).count() == 0
    assert new2.count() == 0
    assert results2.count() == docs.count()
    cache1.unpersist()


def test_duplicate_payloads_share_hash_and_results(spark, synth):
    docs, _ = synth
    hashed = with_content_hash(docs)
    dups = (
        hashed.groupBy("content_hash")
        .agg(F.count("*").alias("n"), F.collect_list("doc_id").alias("ids"))
        .filter(F.col("n") > 1)
    )
    rows = dups.collect()
    assert len(rows) > 0, "synthesizer must produce duplicate payloads"
    for r in rows:
        ids = sorted(int(i) for i in r["ids"])
        assert len(ids) == 2 and ids[1] - ids[0] == 7


def test_compute_once_per_distinct_payload(spark, synth):
    """Duplicate docs must produce identical extracted spans (fan-back join)."""
    docs, media = synth
    results, _ = run_extract_pipeline(spark, docs, media, None, "t2")
    per_hash = results.groupBy("content_hash").agg(
        F.countDistinct(F.to_json("spans")).alias("variants")
    )
    assert per_hash.filter(F.col("variants") > 1).count() == 0
