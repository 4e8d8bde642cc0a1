"""Incremental ingestion: availableNow drain + exactly-once via checkpoint."""

from __future__ import annotations

from text_extract_api_spark.streaming.incremental import run_incremental
from text_extract_api_spark.synth import synthesize_interleaved


def test_incremental_drain_and_checkpoint(spark, sf_dir, tmp_path):
    docs, media = synthesize_interleaved(spark, sf_dir)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    n_docs = docs.count()
    docs.repartition(4).write.parquet(inp)

    n1 = run_incremental(spark, inp, out, media, "s1")
    assert n1 >= 1
    got = spark.read.parquet(f"{out}/results")
    assert got.count() == n_docs
    assert got.select("doc_id").distinct().count() == n_docs

    # second drain with the same checkpoint: nothing new → no duplicate rows
    run_incremental(spark, inp, out, media, "s2")
    assert spark.read.parquet(f"{out}/results").count() == n_docs
