"""Micro-bench for the _minhash_base stage (VERDICT r3 #7).

    python tools/minhash_stage_bench.py [sf_dir] [reps]

Times ONLY the signature stage (noop write action) at the given sf, with a
warmup action first; prints per-rep wall times. Run back-to-back before and
after a change, inside the /tmp/scaling_session.lock protocol.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text_extract_api_spark.functions.dedup import _minhash_base
from text_extract_api_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("minhash_stage_bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs.persist().count()
    base = _minhash_base(docs, "doc_id", "text", 3)
    # warmup: JIT + python worker spawn
    base.write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(reps):
        t0 = time.time()
        base.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    load1 = os.getloadavg()[0]
    print({"sf": sf_dir, "times": times, "min": min(times), "load1": load1})
    spark.stop()


if __name__ == "__main__":
    main()
