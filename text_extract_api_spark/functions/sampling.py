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


def temperature_mix(
    docs: DataFrame,
    token_col,
    stratum_col: str = "lang",
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-scaled sampling shares per stratum — the multilingual
    mixing rule of mT5/XLM-R (Xue et al. 2021 §3.1; Conneau et al. 2020
    §3.1): sampling probability p_i ∝ (n_i/N)^(1/T). T=1 reproduces the
    natural token distribution; T→∞ flattens toward uniform; the papers
    ship T∈[2,5] to lift low-resource strata without drowning the head.

    Returns one row per stratum:
    (stratum, n_docs, total_tokens, share_x1e6, temp_share_x1e6,
    upsample_x10k) where ``share_x1e6`` is the natural token share,
    ``temp_share_x1e6`` the temperature-scaled sampling share (both in
    parts-per-million) and ``upsample_x10k`` = temp_share/share ×10⁴ — the
    per-stratum repetition factor a loader applies.

    Determinism contract: only ``temperature == 2.0`` is exposed, because
    x^(1/2) is ``sqrt`` — IEEE-754 requires sqrt be correctly rounded, so
    Spark's JVM and DuckDB's libm produce the identical double on the
    identical integer input; a general ``pow(x, 1/T)`` carries a 1-ulp
    cross-engine caveat this engine's bit-parity gate does not accept.
    The per-stratum weight q_i = round(sqrt(total_tokens)·10⁶) is
    quantized to BIGINT *before* the cross-strata sums, so every
    downstream share/ratio is exact integer arithmetic (DECIMAL(38,0)
    products — BIGINT would overflow past ~10⁹ tokens) in both engines —
    no partition-order float accumulation anywhere.

    Scale design (100 TB): one map-side-combined groupBy(stratum) touches
    the corpus; everything after runs over one row per stratum (window
    frames bounded by stratum cardinality, like :func:`mix_weights`).
    """
    if temperature != 2.0:
        raise ValueError(
            "temperature_mix ships the T=2 (sqrt) path only: IEEE sqrt is "
            "correctly rounded in every engine, pow(x, 1/T) is not"
        )
    per = docs.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("total_tokens"),
    )
    q_u = F.round(F.sqrt(F.col("total_tokens").cast("double")) * F.lit(1e6), 0).cast(
        "bigint"
    )
    w = Window.partitionBy()  # one row per stratum — tiny frame, safe
    per = per.withColumn("_q_u", q_u).withColumn(
        "_tok_all", F.sum("total_tokens").over(w).cast("decimal(38,0)")
    ).withColumn("_q_all", F.sum("_q_u").over(w).cast("decimal(38,0)"))
    return per.select(
        stratum_col,
        "n_docs",
        "total_tokens",
        F.when(
            F.col("_tok_all") > 0,
            F.expr(
                "CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000)"
                " div _tok_all AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("share_x1e6"),
        F.when(
            F.col("_q_all") > 0,
            F.expr("CAST((CAST(_q_u AS DECIMAL(38,0)) * 1000000) div _q_all AS BIGINT)"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("temp_share_x1e6"),
        F.when(
            (F.col("total_tokens") > 0) & (F.col("_q_all") > 0),
            F.expr(
                "CAST((CAST(_q_u AS DECIMAL(38,0)) * _tok_all * 10000)"
                " div (_q_all * CAST(total_tokens AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("upsample_x10k"),
    )


def temperature_mix_sql(
    token_expr: str,
    stratum_col: str = "lang",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`temperature_mix` (T=2). HUGEINT casts keep
    the products exact where Spark uses DECIMAL(38,0)."""
    return f"""
WITH per AS (
  SELECT {stratum_col}, COUNT(*) AS n_docs,
         CAST(SUM({token_expr}) AS BIGINT) AS total_tokens
  FROM {table} GROUP BY {stratum_col}
),
q AS (
  SELECT *,
         CAST(round(sqrt(CAST(total_tokens AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS q_u
  FROM per
),
t AS (
  SELECT *,
         CAST(SUM(total_tokens) OVER () AS HUGEINT) AS tok_all,
         CAST(SUM(q_u) OVER () AS HUGEINT) AS q_all
  FROM q
)
SELECT {stratum_col}, n_docs, total_tokens,
       CAST(CASE WHEN tok_all > 0
         THEN (CAST(total_tokens AS HUGEINT) * 1000000) // tok_all
         ELSE 0 END AS BIGINT) AS share_x1e6,
       CAST(CASE WHEN q_all > 0
         THEN (CAST(q_u AS HUGEINT) * 1000000) // q_all
         ELSE 0 END AS BIGINT) AS temp_share_x1e6,
       CAST(CASE WHEN total_tokens > 0 AND q_all > 0
         THEN (CAST(q_u AS HUGEINT) * tok_all * 10000)
              // (q_all * CAST(total_tokens AS HUGEINT))
         ELSE 0 END AS BIGINT) AS upsample_x10k
FROM t
""".strip()


def soft_sample(
    scored: DataFrame,
    prob,
    key_col: str = "doc_id",
    salt: str = "soft",
) -> DataFrame:
    """Score-proportional soft sampling: keep each row with probability
    ``prob`` (a per-row [0,1] Column), deterministically — the FineWeb-Edu
    retention pattern where a quality score sets each document's admission
    probability instead of a hard percentile cut, preserving a calibrated
    long tail of mid-quality text rather than a cliff.

    keep ⟺ u32(md5(key||':'||salt)) < floor(clamp(prob, 0, 1) · 2³²)

    Determinism contract: the draw is the engine-wide md5-threshold
    sampler (zero RNG — restart/backfill stable), and the threshold is
    floor() of a double both engines computed bit-identically (callers
    feed round-4dp scores, the quality_score contract), so the predicate
    is an exact integer compare. Monotone in prob for a fixed key: raising
    a document's score can only ADD it to the sample (a curriculum
    re-score never silently drops previously admitted docs).

    Scale design (100 TB): row-local codegen predicate on top of whatever
    computed the score — zero shuffles, no sort, no per-stratum state;
    contrast quota_per_source (exact per-stratum counts, needs the salted
    top-k machinery) when hard quotas are required.
    """
    u = hash_u32_col(F.col(key_col), salt)
    p = F.greatest(F.lit(0.0), F.least(F.lit(1.0), prob))
    th = F.floor(p * F.lit(float(U32))).cast("bigint")
    return scored.filter(u < th)


def soft_sample_sql(
    prob_expr: str, key_col: str = "doc_id", salt: str = "soft"
) -> str:
    """WHERE fragment reproducing :func:`soft_sample` in DuckDB."""
    u = hash_u32_sql(key_col, salt)
    p = f"GREATEST(0.0, LEAST(1.0, {prob_expr}))"
    return f"({u}) < CAST(floor({p} * {float(U32)!r}) AS BIGINT)"


def token_quota_per_stratum(
    docs: DataFrame,
    budget: int,
    tokens,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "tquota",
    n_salts: int = 16,
) -> DataFrame:
    """Per-stratum TOKEN budget (e.g. "at most B tokens per domain") — the
    unit real training mixes are specified in, where :func:`quota_per_stratum`
    counts documents: keep each stratum's greedy hash-ordered prefix of
    documents whose running token sum stays within ``budget``.

    Returns (key, stratum, n_tokens, cum_tokens) for kept rows. Zero-token
    documents are EXCLUDED up front: they contribute nothing to a token
    budget, and admitting them would unbound the phase-1 survivor count.

    Skew-safe two-phase prefix (quota_per_stratum discipline): phase 1
    takes each ``(stratum, u % n_salts)`` bucket's LOCAL budget-prefix —
    lossless, because a globally kept row's bucket-local prefix is a
    subset of its global prefix, and token counts are positive, so its
    local running sum can only be ≤ its global one. Phase 2's per-stratum
    window then sees at most ``n_salts × budget`` rows (every survivor
    costs ≥ 1 token) — bounded by config, not by corpus size; with real
    documents it is ~``n_salts × budget / avg_tokens``. The running sums
    are exact BIGINT — no float accumulation anywhere.
    """
    tok = F.greatest(tokens.cast("bigint"), F.lit(0).cast("bigint"))
    u = hash_u32_col(F.col(key_col), salt)
    ranked = docs.select(
        key_col,
        stratum_col,
        tok.alias("n_tokens"),
        u.alias("_u"),
        (u % n_salts).alias("_b"),
    ).filter(F.col("n_tokens") > 0)
    local = (
        Window.partitionBy(stratum_col, "_b")
        .orderBy("_u", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    survivors = ranked.withColumn(
        "_lcum", F.sum("n_tokens").over(local)
    ).filter(F.col("_lcum") <= budget)
    final = (
        Window.partitionBy(stratum_col)
        .orderBy("_u", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        survivors.withColumn("cum_tokens", F.sum("n_tokens").over(final))
        .filter(F.col("cum_tokens") <= budget)
        .select(key_col, stratum_col, "n_tokens", "cum_tokens")
    )


def token_quota_per_stratum_sql(
    budget: int,
    tokens_expr: str,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "tquota",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`token_quota_per_stratum` — the direct
    single-window greedy prefix; the two-phase Spark plan must keep
    identical rows with identical running sums."""
    u = hash_u32_sql(key_col, salt)
    return f"""
WITH t AS (
  SELECT {key_col}, {stratum_col},
         CAST(GREATEST({tokens_expr}, 0) AS BIGINT) AS n_tokens,
         ({u}) AS u
  FROM {table}
),
c AS (
  SELECT {key_col}, {stratum_col}, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY {stratum_col} ORDER BY u, {key_col}
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS cum_tokens
  FROM t WHERE n_tokens > 0
)
SELECT {key_col}, {stratum_col}, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {budget}
""".strip()


def epoch_shuffle(
    docs: DataFrame,
    n_shards: int,
    seed: str = "epoch0",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic hierarchical training-order shuffle for one epoch.

    Training loaders don't sort 10^12 documents globally — they shuffle at
    two levels: documents hash into shards, and each shard is shuffled
    internally; the epoch order is (shard, pos) lexicographic. This operator
    produces exactly that order with NO RNG: both levels derive from
    ``md5(key||seed)`` (the engine-portable uniform hash used by every
    sampler in this module), so a restarted epoch regenerates the identical
    permutation — the resumability property the north rule demands.

    Plan shape: one hash exchange on ``shard`` (parallelism == ``n_shards``;
    pick shards >> executors at scale), then a per-shard window sort of
    corpus/n_shards rows — never a global single-partition ``row_number``.
    Ties in the order hash break on the key, so output is total and stable.

    Returns ``(key, shard, pos)``; global epoch order = ORDER BY shard, pos.
    """
    key = F.col(key_col)
    shard = F.pmod(hash_u32_col(key, seed + ":shard"), F.lit(n_shards)).cast("int")
    order_u = hash_u32_col(key, seed + ":order")
    w = Window.partitionBy("shard").orderBy(F.col("_ord"), key)
    return (
        docs.select(key.alias(key_col), shard.alias("shard"), order_u.alias("_ord"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("int"))
        .select(key_col, "shard", "pos")
    )


def epoch_shuffle_sql(
    n_shards: int,
    seed: str = "epoch0",
    key_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`epoch_shuffle` — same two md5-derived
    levels, expressed directly."""
    sh = hash_u32_sql(key_col, seed + ":shard")
    ou = hash_u32_sql(key_col, seed + ":order")
    return f"""
WITH t AS (
  SELECT {key_col},
         CAST(({sh}) % {n_shards} AS INT) AS shard,
         ({ou}) AS u
  FROM {table}
)
SELECT {key_col}, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY u, {key_col}) - 1 AS INT) AS pos
FROM t
""".strip()
