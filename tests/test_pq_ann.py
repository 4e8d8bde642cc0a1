"""Product-quantization ANN tests: recall against brute force + determinism."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from text_extract_api_spark.functions.similarity import (
    PQ_K,
    build_pq_store,
    pq_topk_stored,
)


def _emb(spark, n=120, dim=16, seed_salt=7):
    # deterministic pseudo-embeddings: smooth per-id sinusoids so nearby
    # ids are nearby vectors (gives PQ a meaningful structure to code)
    rows = [
        (i, [math.sin(0.1 * i + 0.5 * d) + 0.01 * ((i * seed_salt + d) % 7) for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_adc_recall_vs_bruteforce(spark, tmp_path):
    dim, k = 16, 10
    emb = _emb(spark, dim=dim)
    store = str(tmp_path / "pq")
    build_pq_store(emb, store, m=4, k=PQ_K, iters=2, dim=dim)
    q = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    got = [r["vec_id"] for r in pq_topk_stored(spark, store, q, k=k).collect()]
    # brute-force L2 top-k
    truth = sorted(
        (
            (sum((float(a) - float(b)) ** 2 for a, b in zip(q, r["embedding"])), r["vec_id"])
            for r in emb.collect()
        )
    )[:k]
    truth_ids = {vid for _, vid in truth}
    overlap = len(truth_ids & set(got))
    # ADC is approximate; on this smooth corpus PQ should recover most of
    # the true neighborhood
    assert overlap >= k // 2, (overlap, got, sorted(truth_ids))
    # the query vector itself must be the top hit (distance ~0 to own codes)
    assert got[0] == 0


def test_pq_store_deterministic_rebuild(spark, tmp_path):
    emb = _emb(spark, n=60, dim=16)
    s1, s2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_pq_store(emb, s1, m=4, k=PQ_K, iters=2, dim=16)
    build_pq_store(emb, s2, m=4, k=PQ_K, iters=2, dim=16)
    a = sorted(map(tuple, spark.read.parquet(f"{s1}/codes").collect()))
    b = sorted(map(tuple, spark.read.parquet(f"{s2}/codes").collect()))
    assert a == b
    import json

    cb1 = json.load(open(f"{s1}/codebook.json"))
    cb2 = json.load(open(f"{s2}/codebook.json"))
    assert cb1 == cb2


def test_pq_rerank_lifts_recall_over_pure_adc(spark, tmp_path):
    dim, k = 16, 10
    emb = _emb(spark, n=200, dim=dim)
    store = str(tmp_path / "pq")
    build_pq_store(emb, store, m=4, k=PQ_K, iters=2, dim=dim)
    q = [r["embedding"] for r in emb.filter("vec_id = 0").collect()][0]
    truth = {
        vid
        for _, vid in sorted(
            (
                (
                    sum((float(a) - float(b)) ** 2 for a, b in zip(q, r["embedding"])),
                    r["vec_id"],
                )
                for r in emb.collect()
            )
        )[:k]
    }
    pure = {r["vec_id"] for r in pq_topk_stored(spark, store, q, k=k).collect()}
    refined = {
        r["vec_id"]
        for r in pq_topk_stored(spark, store, q, k=k, rerank=64, emb=emb).collect()
    }
    assert len(truth & refined) >= len(truth & pure)
    # with the candidate pool 6x the answer size, the refine stage should
    # recover the true neighborhood almost entirely on this smooth corpus
    assert len(truth & refined) >= int(0.8 * k)
