"""Interleaved A/B: k-means assignment stage, JVM HOF vs chunked-numpy Arrow.

The measurement behind clustering._assign_frame's shipped default
(assign_arrow=True): same-session alternating min-of-3 noop writes over an
inflated corpus (sf0.1 embeddings × 64 → 128k vectors), at the sandbox k
and a large k. Recorded 2026-08-18: k=16 JVM 1.10 s vs Arrow 0.71 s
(1.5×); k=64 JVM 4.35 s vs Arrow 1.81 s (2.4×). Sub-second numbers on
this box are ~70-90% fixed per-action overhead — only the interleaved
ratio is meaningful (BENCH/BASELINE.md r4 diagnosis).

Usage: python tools/kmeans_ab.py [sf_dir] [inflate]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from text_extract_api_spark.functions.clustering import _assign_frame
from text_extract_api_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    inflate = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    spark = get_spark("kmeans_ab", master="local[32]")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = (
        emb.crossJoin(spark.range(inflate).select(F.col("id").alias("rep")))
        .select(
            (F.col("vec_id") * inflate + F.col("rep")).alias("vec_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()
    )
    dim = len(base.select("v").first()["v"])
    print(f"rows={base.count()} dim={dim} ambient={os.getloadavg()[0]:.2f}")

    def timed(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for k in (16, 64):
        cents = [
            [round(float(j * 37 % 17) / 7.0 + d * 0.001, 6) for d in range(dim)]
            for j in range(k)
        ]
        timed(_assign_frame(base, cents, False))  # warm JIT + codegen
        timed(_assign_frame(base, cents, True))  # warm Python workers
        res: dict[str, list[float]] = {"jvm": [], "arrow": []}
        for _ in range(3):  # interleaved: both forms sample the same weather
            res["jvm"].append(timed(_assign_frame(base, cents, False)))
            res["arrow"].append(timed(_assign_frame(base, cents, True)))
        print(
            f"k={k}",
            {m: [round(x, 2) for x in v] for m, v in res.items()},
            f"min jvm={min(res['jvm']):.2f} min arrow={min(res['arrow']):.2f}",
        )
    spark.stop()


if __name__ == "__main__":
    main()
