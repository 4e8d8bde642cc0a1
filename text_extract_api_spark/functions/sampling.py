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


def quota_per_stratum(
    docs: DataFrame,
    quota: int,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota",
    n_salts: int = 16,
) -> DataFrame:
    """Per-stratum cap (e.g. "at most K documents per domain"): keep each
    stratum's ``quota`` rows with the smallest deterministic hash rank —
    the per-source quota pass every web-corpus mix applies so one giant
    domain can't dominate the training set.

    Skew-safe two-phase top-k: a single window over a hot stratum would
    funnel that stratum's entire row set through one task, so phase 1 caps
    each ``(stratum, u % n_salts)`` bucket at ``quota`` locally — correct
    because every global top-``quota`` row is, within its own bucket, also
    among the ``quota`` smallest, so phase 1 can never drop one. Phase 2's
    window then sees at most ``n_salts * quota`` rows per stratum (bounded
    by config, not by corpus size). Ordering is the md5-derived u32 of the
    key (restart-stable, engine-portable), key as tiebreak.
    """
    u = hash_u32_col(F.col(key_col), salt)
    ranked = docs.select(
        key_col, stratum_col, u.alias("_u"), (u % n_salts).alias("_b")
    )
    local = Window.partitionBy(stratum_col, "_b").orderBy("_u", key_col)
    survivors = ranked.withColumn(
        "_lrk", F.row_number().over(local)
    ).filter(F.col("_lrk") <= quota)
    final = Window.partitionBy(stratum_col).orderBy("_u", key_col)
    return (
        survivors.withColumn("rk", F.row_number().over(final).cast("bigint"))
        .filter(F.col("rk") <= quota)
        .select(key_col, stratum_col, "rk")
    )


def quota_per_stratum_sql(
    quota: int,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`quota_per_stratum` — the direct (non-salted)
    window form; the two-phase Spark plan must select identical rows."""
    u = hash_u32_sql(key_col, salt)
    return f"""
WITH ranked AS (
  SELECT {key_col}, {stratum_col},
         row_number() OVER (PARTITION BY {stratum_col} ORDER BY ({u}), {key_col})
           AS rk
  FROM {table}
)
SELECT {key_col}, {stratum_col}, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= {quota}
""".strip()


def shard_assign(
    docs: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    salt_shard: str = "shard",
    salt_pos: str = "pos",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic corpus shuffle for training order: assign every doc a
    shard (``u32(key) % n_shards``) and a dense 1-based position within its
    shard, ordered by an independent hash — the (shard, pos) pair IS the
    global pseudo-random read order a data loader consumes, without ever
    materializing a total sort.

    Zero RNG, so a resumed/backfilled run reproduces the identical
    permutation. One shuffle (the per-shard window). Scale: choose
    ``n_shards ≈ corpus_rows / target_shard_rows`` so each window partition
    holds one shard's bounded row count; shards are independent, so
    parallelism grows with the corpus instead of collapsing into the single
    partition a global ``row_number() OVER (ORDER BY ...)`` would need.
    """
    shard = (hash_u32_col(F.col(key_col), salt_shard) % n_shards).cast("int")
    pos_key = hash_u32_col(F.col(key_col), salt_pos)
    w = Window.partitionBy("shard").orderBy("_p", key_col)
    return (
        docs.select(key_col, *extra_cols, shard.alias("shard"), pos_key.alias("_p"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select(key_col, *extra_cols, "shard", "pos")
    )


def shard_assign_sql(
    n_shards: int,
    key_col: str = "doc_id",
    salt_shard: str = "shard",
    salt_pos: str = "pos",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`shard_assign`."""
    us = hash_u32_sql(key_col, salt_shard)
    up = hash_u32_sql(key_col, salt_pos)
    return f"""
SELECT {key_col},
       CAST(({us}) % {n_shards} AS INTEGER) AS shard,
       CAST(row_number() OVER (
         PARTITION BY ({us}) % {n_shards} ORDER BY ({up}), {key_col}
       ) AS BIGINT) AS pos
FROM {table}
""".strip()
