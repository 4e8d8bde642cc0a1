"""Edge semantics of similarity.semantic_decontaminate: zero-norm
exclusion on both sides, empty-benchmark short circuit, and the
lowest-bench-id tiebreak on rounded scores."""

from __future__ import annotations

from text_extract_api_spark.functions.similarity import semantic_decontaminate

SCHEMA = "vec_id bigint, embedding array<float>"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_flags_above_threshold_with_lowest_id_tiebreak(spark):
    # bench 10 and 11 are IDENTICAL vectors: both score 1.0 against corpus
    # vec 1 — the rounded-score argmax must resolve to the LOWER bench id.
    bench = _df(spark, [(11, [1.0, 0.0]), (10, [1.0, 0.0]), (12, [0.0, 1.0])])
    corpus = _df(spark, [(1, [2.0, 0.0]), (2, [-1.0, 0.0])])
    out = {
        r["vec_id"]: (r["bench_id"], r["score"])
        for r in semantic_decontaminate(corpus, bench, 0.5).collect()
    }
    assert out == {1: (10, 1.0)}  # vec 2's best cosine is 0.0 — clean


def test_zero_norm_vectors_never_flagged(spark):
    bench = _df(spark, [(10, [0.0, 0.0]), (11, [1.0, 0.0])])
    corpus = _df(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0])])
    rows = semantic_decontaminate(corpus, bench, -1.0).collect()
    # corpus zero-norm scores -inf (below any threshold); bench zero-norm
    # is excluded at collect so it can never be the reported neighbor
    assert {(r["vec_id"], r["bench_id"]) for r in rows} == {(2, 11)}


def test_empty_benchmark_returns_empty(spark):
    bench = _df(spark, [(10, [0.0, 0.0])])  # only a zero vector -> excluded
    corpus = _df(spark, [(1, [1.0, 0.0])])
    out = semantic_decontaminate(corpus, bench, 0.0)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "bench_id", "score"]
