"""Int8-quantized ANN: code parity, store shape, top-k agreement."""

from __future__ import annotations

import math

import pytest

from text_extract_api_spark.functions.similarity import (
    build_quantized_store,
    quantize_int8,
    quantized_topk_stored,
)


def test_quantize_int8_codes():
    q, s = quantize_int8([0.5, -1.5, 2.0])
    assert s == 127.0 / 2.0
    # 0.5*63.5 = 31.75 -> 32; 1.5*63.5 = 95.25 -> 95 (sign-aware); 2.0 -> 127
    assert q == [32, -95, 127]
    assert all(-127 <= x <= 127 for x in q)


def test_quantize_half_away_rounding():
    # |v|*s exactly *.5 rounds AWAY from zero on both signs
    q, _ = quantize_int8([1.0, 0.5, -0.5])  # s=127; 0.5*127 = 63.5 → 64
    assert q == [127, 64, -64]


def _pyscore(qa: list[int], qb: list[int]) -> float:
    dot = sum(a * b for a, b in zip(qa, qb))
    na = math.sqrt(sum(a * a for a in qa))
    nb = math.sqrt(sum(b * b for b in qb))
    x = dot / (na * nb)
    return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)


def test_store_and_topk(spark, tmp_path):
    vecs = [
        (0, [1.0, 0.0, 0.5, -0.25]),
        (1, [0.9, 0.05, 0.55, -0.2]),   # near the query
        (2, [-1.0, 0.2, 0.0, 0.8]),     # far
        (3, [1.0, 0.0, 0.5, -0.25]),    # identical to query
        (4, [0.0, 0.0, 0.0, 0.0]),      # zero vector: excluded at build
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    path = str(tmp_path / "qstore")
    build_quantized_store(df, path)

    stored = spark.read.parquet(path)
    assert stored.count() == 4  # zero vector gone
    row = {r["vec_id"]: r for r in stored.collect()}
    assert row[0]["q"] == quantize_int8([1.0, 0.0, 0.5, -0.25])[0]
    assert row[0]["qn"] == float(sum(x * x for x in row[0]["q"]))

    out = quantized_topk_stored(spark, path, [1.0, 0.0, 0.5, -0.25], k=3).collect()
    assert [r["vec_id"] for r in out] == [0, 3, 1]  # exact matches first, tie by id
    qq, _ = quantize_int8([1.0, 0.0, 0.5, -0.25])
    for r in out:
        assert r["score"] == pytest.approx(_pyscore(row[r["vec_id"]]["q"], qq), abs=0)
    assert out[0]["score"] == 1.0


def test_store_is_4x_smaller_per_vector(spark, tmp_path):
    # the scale claim in the docstring: int8 codes are 1/4 the float32 bytes
    import numpy as np

    q, _ = quantize_int8(list(np.linspace(-1, 1, 64)))
    assert len(q) == 64  # 64 int8 bytes vs 256 float32 bytes
