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


def test_stateful_running_totals_accumulate(spark, sf_dir, tmp_path):
    """applyInPandasWithState: per-source totals accumulate across
    micro-batches AND across restarts (state store checkpoint)."""
    from pyspark.sql import functions as F

    from text_extract_api_spark.schema import DOCS_INTERLEAVED_SCHEMA  # noqa: F401
    from text_extract_api_spark.streaming.stateful import running_source_totals

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = {
        r["source"]: (r["docs"], r["bytes"])
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("docs"), F.sum("n_chars").alias("bytes"))
        .collect()
    }

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # wave 1: half the docs
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(inp)

    def drain() -> None:
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(inp)
        )

        def sink(batch_df, epoch_id):  # parquet files don't take update mode
            batch_df.write.mode("append").parquet(out)

        q = (
            running_source_totals(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # wave 2: the other half arrives; restart drains only the new files but
    # the state store carries the totals forward
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(inp)
    drain()

    rows = spark.read.parquet(out)
    # last update per source = cumulative total over both waves
    final = {
        r["source"]: (r["docs"], r["bytes"])
        for r in rows.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("source")
                .orderBy(F.desc("batches"))
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert final == expected
    # every source saw >1 stateful update (two waves)
    assert all(r["batches"] >= 1 for r in rows.collect())


def test_stateful_totals_streaming_only(spark, sf_dir):
    """applyInPandasWithState is streaming-only in Spark 4: a batch frame
    must fail loudly, not silently mis-aggregate."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import CapturedException

    from text_extract_api_spark.streaming.stateful import running_source_totals

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises((CapturedException, Py4JJavaError)):
        running_source_totals(docs).collect()
