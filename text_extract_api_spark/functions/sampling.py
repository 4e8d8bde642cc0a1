"""Deterministic corpus sampling & mixing — training-data pipeline ops.

Not in the reference (single-document service); mandated by the build
contract's training-data-pipeline scope. Both operators avoid RNG entirely —
sampling decisions derive from md5 of the row key, so the sample is
reproducible on any engine/partitioning (the DuckDB oracle reproduces it
bit-for-bit) and stable across reruns, which is what a resumable 100 TB
pipeline needs (re-sampling a restarted partition must keep the same rows).

- :func:`stratified_sample` — per-stratum keep fractions via a hash
  threshold: u32(md5(key||salt)[:8]) < frac·2^32. One narrow codegen map +
  filter, zero shuffles; the integer threshold comparison is bit-stable.
- :func:`mix_weights` — per-stratum upsampling weights to hit a target
  token mix: weight = target_share / actual_share, computed in scaled
  integer arithmetic (×10⁴) so engines agree exactly. One partial+final agg
  plus a broadcast-size window over the stratum rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

U32 = 1 << 32


def hash_u32_col(key, salt: str) -> F.Column:
    """First 8 hex digits of md5(key||':'||salt) as a uniform uint32 —
    the deterministic stand-in for rand() (engine-portable)."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 8),
        16,
        10,
    ).cast("bigint")


def hash_u32_sql(key_expr: str, salt: str) -> str:
    """The identical uint32 in DuckDB SQL (digit arithmetic — DuckDB has no
    base-conv builtin)."""
    h = f"md5(CAST({key_expr} AS VARCHAR) || ':{salt}')"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"CAST({digits} AS BIGINT)"


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep each stratum's rows with its configured probability,
    deterministically. Thresholds are integers (frac·2^32 floored), so the
    predicate is pure integer compare — identical in any engine."""
    u = hash_u32_col(F.col(key_col), salt)
    th = None
    for stratum, frac in fractions.items():
        t = F.lit(int(frac * U32))
        cond = F.col(stratum_col) == stratum
        th = F.when(cond, t) if th is None else th.when(cond, t)
    th = th.otherwise(F.lit(int(default_fraction * U32))) if th is not None else F.lit(
        int(default_fraction * U32)
    )
    return docs.filter(u < th)


def stratified_sample_sql(
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strat",
) -> str:
    """WHERE clause fragment reproducing :func:`stratified_sample`."""
    u = hash_u32_sql(key_col, salt)
    whens = "".join(
        f" WHEN '{s}' THEN {int(f * U32)}" for s, f in fractions.items()
    )
    return f"({u}) < (CASE {stratum_col}{whens} ELSE {int(default_fraction * U32)} END)"


def mix_weights(
    docs: DataFrame,
    target_ppm: dict[str, int],
    token_col,
    stratum_col: str = "lang",
) -> DataFrame:
    """(stratum, n_docs, total_tokens, weight_x10k): upsampling weight per
    stratum so sampled token shares hit ``target_ppm`` (parts-per-million,
    summing to ≤ 1e6; strata without a target get weight 0).

    weight = target_share / actual_share, in ×10⁴ scaled integer math:
    weight_x10k = target_ppm · overall_tokens · 10⁴ / (10⁶ · stratum_tokens)
    — exact integer division, bit-stable across engines. The numerator is
    computed as DECIMAL(38,0): in bigint it overflows past ~2.3e9 total
    tokens (a ~10 GB corpus — ANSI ARITHMETIC_OVERFLOW kills the job),
    while decimal(38) holds to ~10²⁸ tokens and DuckDB's hugeint promotion
    matches it. A stratum whose documents are all empty (0 tokens) gets
    weight 0 instead of a divide-by-zero. The final window runs over one
    row per stratum (bounded by stratum cardinality, not corpus size)."""
    per = docs.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("total_tokens"),
    )
    overall = F.sum("total_tokens").over(
        Window.partitionBy()  # one row per stratum — tiny frame, safe
    )
    t = None
    for stratum, ppm in target_ppm.items():
        cond = F.col(stratum_col) == stratum
        t = F.when(cond, F.lit(ppm)) if t is None else t.when(cond, F.lit(ppm))
    t = t.otherwise(F.lit(0))
    return per.withColumn(
        "_num",
        t.cast("decimal(38,0)") * overall.cast("decimal(38,0)") * F.lit(10000),
    ).select(
        stratum_col,
        "n_docs",
        "total_tokens",
        F.when(
            F.col("total_tokens") > 0,
            F.expr(
                "CAST(_num div (CAST(1000000 AS DECIMAL(38,0)) * total_tokens) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("weight_x10k"),
    )
