"""spans_extract — the shippable extraction job.

    spark-submit --py-files engine.zip jobs/spans_extract.py \
        --sf-dir /root/testdata/sf0.1 --out /tmp/out \
        --run-id r1 --run-ts 2026-01-01T00:00:00 [--waves 4] [--resume]

One batch plan replaces the reference's FastAPI→Celery→Redis queue
(SURVEY.md §3): synthesize/read the interleaved docs table → content-hash →
cache anti-join → per-kind vectorized extract → ordered reassembly → write
results + cache + per-bucket progress markers.

Resumability: documents are processed in ``--waves`` sequential wave groups
(bucket % waves). Each wave overwrites its own result partitions
(dynamic partition overwrite → idempotent) and then appends its progress
markers; ``--resume`` skips buckets already marked done for the run-id, so a
crash costs at most one wave of recompute and never duplicates output rows.

Prints one JSON line: docs, spans, wall seconds, docs/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from text_extract_api_spark.checkpoint import (  # noqa: E402
    bucket_col,
    completed_buckets,
    observe_extraction,
    write_progress,
)
from text_extract_api_spark.extractors.media import validate_media_pages  # noqa: E402
from text_extract_api_spark.io import read_table, write_table  # noqa: E402
from text_extract_api_spark.partitioning import repartition_by_size  # noqa: E402
from text_extract_api_spark.pipeline import run_extract_pipeline  # noqa: E402
from text_extract_api_spark.session import get_spark  # noqa: E402
from text_extract_api_spark.synth import synthesize_interleaved_office  # noqa: E402


TARGET_PARTITION_MB = 64  # per-task shuffle budget (matches AQE advisory)


def _autoscale_shuffle_partitions(spark) -> None:
    """Size ``spark.sql.shuffle.partitions`` from the MEASURED corpus size.

    The ×256 scale-up probe (r5) caught the failure mode this prevents: a
    fixed 32-partition layout pushes corpus/32 bytes through every
    reassembly task — ~400 MB/task at 12.8 GB of spans — and 32 such
    concurrent object-agg buffers blow the heap long before the plan is
    wrong. Partition count must grow with data so per-task bytes stay
    constant (the spill-aware sizing rule); AQE coalesces back down when
    partitions come out small, so oversizing costs nothing.

    Uses the cached-corpus storage size (free to read after the persist) —
    an Iceberg deployment gets the same number from table statistics. An
    explicit ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` pins the count instead
    (the scaling bench holds it fixed across parallelism levels — there it
    is a controlled variable, not a knob)."""
    import os as _os

    if _os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"):
        return
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    cached = sum(i.memSize() + i.diskSize() for i in infos)
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))
    need = min(2048, max(cur, int(cached / (TARGET_PARTITION_MB * 1024 * 1024)) + 1))
    if need > cur:
        spark.conf.set("spark.sql.shuffle.partitions", str(need))


def main(argv: list[str] | None = None, spark=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--run-ts", default="2026-01-01 00:00:00")
    ap.add_argument("--master", default=None)
    ap.add_argument("--waves", type=int, default=1)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--input-table", default=None,
                    help="pre-built interleaved table location (skips synthesis)")
    ap.add_argument("--media-table", default=None)
    ap.add_argument("--office-table", default=None,
                    help="office blob sidecar (media_ref, payload) for the "
                         "docx/pptx legs when using --input-table")
    ap.add_argument("--multiplier", type=int, default=1,
                    help="deterministic corpus scale-up for scaling benches")
    ap.add_argument("--inflate", type=int, default=1,
                    help="deterministic per-document size scale-up (bench)")
    ap.add_argument("--warmup", action="store_true",
                    help="run the pipeline on a small slice before the timed "
                         "window (JIT + Python-worker warmup for benches)")
    args = ap.parse_args(argv)

    own_session = spark is None
    if own_session:
        spark = get_spark(
            "spans_extract", master=args.master,
            extra_conf={
                "spark.sql.sources.partitionOverwriteMode": "dynamic",
                # v2 commit: tasks move their own files at task-commit instead
                # of the driver serially renaming every file at job end — the
                # serial rename is pure non-scaling overhead on multi-file
                # writes
                "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
            },
        )
    else:
        # injected session (tests): dynamic overwrite is a correctness
        # requirement for idempotent per-wave re-writes, set it at runtime
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    if args.input_table:
        docs = read_table(spark, args.input_table)
        media = read_table(spark, args.media_table) if args.media_table else None
        office_blobs = (
            read_table(spark, args.office_table) if args.office_table else None
        )
    else:
        docs, media, office_blobs = synthesize_interleaved_office(
            spark, args.sf_dir, args.multiplier, args.inflate
        )
        # Synthesis is a stand-in for the Iceberg scan; materialize it so the
        # timed window measures extraction, and so multi-action waves don't
        # recompute the synthesis joins.
        docs = docs.persist()
        docs.count()
        _autoscale_shuffle_partitions(spark)

    results_loc = f"{args.out}/results"
    cache_loc = f"{args.out}/cache"
    progress_loc = f"{args.out}/progress"
    quarantine_loc = f"{args.out}/quarantine"

    # Media validity quarantine (reference: PIL verify raises per image,
    # image.py:43-48; the engine splits bad pages out instead of failing the
    # task). ONE decoder pass: verdicts + page text come out of the same
    # Arrow stage, materialized by the quarantine write; the pdf leg then
    # joins only surviving pages and the bad rows land in a queryable sink.
    n_quarantined = 0
    if media is not None:
        validated = validate_media_pages(media).persist()
        write_table(
            validated.filter(~F.col("valid")).select("media_ref", "page_no", "reason")
            .coalesce(4),
            quarantine_loc, mode="overwrite",
        )
        n_quarantined = read_table(spark, quarantine_loc).count()
        media = validated.filter(F.col("valid")).select(
            "media_ref", "page_no", "page_text"
        )
    if office_blobs is not None:
        # small sidecar (one row per office doc) but its lineage carries the
        # synthesis joins + an Arrow stage — pin it so per-wave actions and
        # the cache/progress re-reads don't rebuild the OOXML blobs
        office_blobs = office_blobs.persist()
        office_blobs.count()

    try:
        cache = read_table(spark, cache_loc)
    except Exception:
        cache = None

    docs = docs.withColumn("bucket", bucket_col(F.col("doc_id"), args.n_buckets))
    if args.resume:
        done = completed_buckets(spark, progress_loc, args.run_id)
        docs = docs.join(F.broadcast(done), "bucket", "left_anti")

    if args.warmup:
        # JIT-compile the hot codegen paths and spawn the Python workers
        # before the timed window: a fresh JVM otherwise spends its first
        # seconds interpreted, which reads as fake serial time in scaling
        # measurements (disclosed in BENCH/BASELINE.md).
        warm, _ = run_extract_pipeline(
            spark, docs.limit(256).select("doc_id", "spans", "bucket"),
            media, cache, "warmup", office_blobs=office_blobs,
        )
        warm.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    total_docs = 0
    total_spans = 0
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for wave in range(args.waves):
        wave_docs = docs.filter(F.pmod(F.col("bucket"), F.lit(args.waves)) == wave)
        if args.waves > 1 and wave_docs.isEmpty():
            continue
        if args.input_table:
            # Unknown external layout: size-bucketed salted repartition
            # spreads oversized-media docs before the heavy stages. The
            # synthesis path skips this: its persisted input is already
            # hash(doc_id)-partitioned (uniform bytes at scale), the slim
            # pipeline reuses that alignment for the zero-exchange span
            # reattach join, and AQE skew-join covers residual outliers —
            # an up-front full-array shuffle would cost more DRAM traffic
            # than the skew it prevents (BENCH/BASELINE.md, r3).
            wave_docs = repartition_by_size(wave_docs, shuffle_n)
        results, _ = run_extract_pipeline(
            spark, wave_docs.select("doc_id", "spans", "bucket"),
            media, cache, args.run_id, office_blobs=office_blobs,
        )
        # bucket is a pure function of doc_id — recompute instead of joining
        results = results.withColumn(
            "bucket", bucket_col(F.col("doc_id"), args.n_buckets)
        ).withColumn("wave", F.lit(wave))
        # In-flight metrics (Celery update_state analog): the observation
        # node rides the write action — no separate counting pass.
        results, obs = observe_extraction(results, f"wave_{wave}")
        # ONE heavy action per wave: the results write. Partition dirs by
        # (run_id, wave) — the WAVE is the recompute/overwrite granularity
        # (markers append per wave in one atomic single-file write, so a
        # wave is either fully marked or fully redone; the crash-window
        # pytest proves exactly-once either way). Partitioning by bucket
        # dirs (r2) forced a full-array repartition before the write purely
        # to avoid a tasks×buckets small-file spray; with one wave dir every
        # task writes one file, so the results keep their join partitioning
        # and the spans cross ZERO extra exchanges between extraction and
        # storage (r3, VERDICT item 4). bucket stays a data column for
        # markers/resume bookkeeping.
        write_table(
            results,
            results_loc, mode="overwrite", partition_by=["run_id", "wave"],
        )
        # Test-only crash injection INSIDE the claimed at-most-one-wave
        # window (checkpoint.py:10-13): results written, markers not — a
        # resume must recompute exactly this wave and stay exactly-once.
        if os.environ.get("SPARK_GRAFT_CRASH_AFTER_RESULTS") == f"wave_{wave}":
            raise RuntimeError(
                f"injected crash: wave {wave} results written, markers not"
            )
        # Cache entries, progress markers, and run metrics all derive from
        # the *written* results (cheap columnar re-read) — not from the
        # results lineage, which would recompute the extraction subtree per
        # action, nor from a persisted frame, which pins executor memory.
        written = (
            read_table(spark, results_loc)
            .filter(
                (F.col("run_id") == args.run_id) & (F.col("wave") == wave)
            )
        )
        new_cache = (
            written.filter(~F.col("from_cache"))
            .dropDuplicates(["content_hash"])
            .select("content_hash", "spans", F.lit(args.run_id).alias("run_id"))
        )
        if cache is not None:
            # keep the cache near-unique: only genuinely new hashes append
            new_cache = new_cache.join(
                cache.select("content_hash"), "content_hash", "left_anti"
            )
        # the cache table is small rows (hash + spans); 8 output files beat
        # shuffle.partitions× tiny files and their task-commit overhead
        write_table(new_cache.coalesce(8), cache_loc, mode="append")
        # metrics observed during the results write — no extra counting
        # action; milestone row rides the progress append (one action)
        metrics = obs.get
        write_progress(
            written, progress_loc, args.run_id, args.run_ts,
            milestone=(f"wave_{wave}_extracted", metrics),
        )
        total_docs += int(metrics.get("docs") or 0)
        total_spans += int(metrics.get("spans") or 0)

    wall = time.time() - t0
    summary = {
        "run_id": args.run_id,
        "docs": total_docs,
        "spans": total_spans,
        "quarantined": n_quarantined,
        "sec": round(wall, 3),
        "docs_per_sec": round(total_docs / wall, 2) if wall > 0 else None,
        "waves": args.waves,
    }
    print(json.dumps(summary))
    if own_session:
        spark.stop()
    # injected sessions: caller owns cache cleanup (tests clearCache)
    return summary


if __name__ == "__main__":
    main()
