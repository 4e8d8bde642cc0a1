"""Targeted data selection — DSIR importance weighting over hashed n-grams.

Not in the reference (single-document service); mandated by the build
contract's training-data-pipeline scope. Implements the scoring core of
Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169): fit two bag-of-hashed-ngrams multinomial distributions —
one on a small "target" corpus (the domain you want more of, e.g. wiki-like
text) and one on the raw pool — then weight every raw document by the
log-likelihood ratio of its features under target vs raw. Documents whose
text "looks like" the target domain score high and get selected.

Determinism contract (engine parity): the per-bucket log-ratio is quantized
to BIGINT micro-nats (round(ln(pt/pr) × 1e6)) BEFORE the per-document sum,
so document scores accumulate in exact integer arithmetic — Spark's
partition-order double summation can never drift from DuckDB's sequential
fold. Feature hashing is the engine-portable md5-u32 (`hash_u32_col`), the
same primitive the sampling ops use, so the oracle reproduces bucket
assignment bit-for-bit.

Scale design (100 TB): the feature space is CAPPED at ``n_buckets``
(hashing trick), so the learned log-ratio table is bounded by config — it
broadcasts by construction, unlike a raw vocabulary table (which is
corpus-scaled and must merge-join; cf. quality.unigram_logppl). Plan:
explode → two bounded groupBys (map-side combine collapses repeated
buckets) → one-row totals broadcast → broadcast-join of the ≤n_buckets
ratio table onto per-doc term frequencies → per-doc agg. No window, no
global sort: selection is a fixed log-ratio threshold (score ≥ τ), not a
corpus-wide top-k, so the decision is row-local after the score exists.
(DSIR's Gumbel-noise resampling step is replaced by the deterministic
threshold form — this engine bans RNG in sampling decisions so resumed
runs keep identical rows; see functions/sampling.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import hash_u32_col, hash_u32_sql
from .textstats import WS_SPLIT

DSIR_BUCKETS = 1024  # hashed-feature space; fixed by config, never corpus-scaled
DSIR_SCALE = 1_000_000  # micro-nats quantization (same convention as LOGP_SCALE)


def dsir_scores(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
    tau: float = 0.0,
) -> DataFrame:
    """(doc_id, is_target, n_tokens, dsir_score, selected) for EVERY input
    document.

    ``dsir_score`` = mean per-token log-likelihood ratio (nats) of the
    document's hashed unigram features under the target vs raw Laplace-
    smoothed multinomials. ``selected`` marks raw-pool documents whose
    score clears ``tau`` (τ=0 ⇒ "more target-like than raw-like").
    Target documents are never selected (they're already in the target
    set); token-less documents score 0.0 and are not selected.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        target_pred.alias("is_target"),
    )
    toks = base.filter(F.length(F.trim(F.col("_text"))) > 0).select(
        "doc_id",
        "is_target",
        F.explode(F.split(F.trim(F.lower(F.col("_text"))), WS_SPLIT)).alias("word"),
    )
    feats = toks.select(
        "doc_id",
        "is_target",
        (hash_u32_col(F.col("word"), salt) % n_buckets).alias("bucket"),
    )
    tf = feats.groupBy("doc_id", "is_target", "bucket").agg(
        F.count("*").alias("tf")
    )
    # Per-side bucket counts: ≤ n_buckets rows by construction (hashing trick),
    # so this table — unlike a raw vocabulary — is ALWAYS broadcastable.
    bucket_counts = tf.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("tf")).otherwise(0))
        .cast("bigint")
        .alias("t_cnt"),
        F.sum(F.when(~F.col("is_target"), F.col("tf")).otherwise(0))
        .cast("bigint")
        .alias("r_cnt"),
    )
    totals = bucket_counts.agg(
        F.sum("t_cnt").cast("bigint").alias("t_total"),
        F.sum("r_cnt").cast("bigint").alias("r_total"),
    )
    b = F.lit(n_buckets).cast("bigint")
    logratio = bucket_counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            (
                F.log(
                    (F.col("t_cnt") + F.lit(1)).cast("double")
                    / (F.col("t_total") + b).cast("double")
                )
                - F.log(
                    (F.col("r_cnt") + F.lit(1)).cast("double")
                    / (F.col("r_total") + b).cast("double")
                )
            )
            * F.lit(float(DSIR_SCALE)),
            0,
        )
        .cast("bigint")
        .alias("lr_u"),
    )
    per_doc = (
        tf.join(F.broadcast(logratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lr_u")).alias("llr_u"),
        )
    )
    score = F.coalesce(
        F.round(
            F.col("llr_u").cast("double")
            / (F.col("n_tokens").cast("double") * F.lit(float(DSIR_SCALE))),
            6,
        ),
        F.lit(0.0),  # engine-wide rule: float output columns are never NULL
    )
    # NULL-free n_tokens (docs absent from per_doc are token-less): the
    # selected predicate must see 0, not NULL — NULL > 0 is NULL in Spark
    # but the oracle's COALESCE form yields false.
    ntok = F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint"))
    return (
        base.select("doc_id", "is_target")
        # per_doc is one row per non-empty doc — corpus-scaled, never
        # statically broadcastable
        .join(per_doc.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            ntok.alias("n_tokens"),
            score.alias("dsir_score"),
            (
                (~F.col("is_target")) & (ntok > 0) & (score >= F.lit(tau))
            ).alias("selected"),
        )
    )


def dsir_scores_sql(
    target_pred_sql: str,
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
    tau: float = 0.0,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`dsir_scores` — identical hashing, Laplace
    smoothing, and micro-nat quantization."""
    u = hash_u32_sql("word", salt)
    return f"""
WITH toks AS (
  SELECT doc_id, ({target_pred_sql}) AS is_target,
         unnest(regexp_split_to_array(trim(lower(text)), '[ \\t\\r\\n]+')) AS word
  FROM {table} WHERE length(trim(text)) > 0
),
feats AS (SELECT doc_id, is_target, ({u}) % {n_buckets} AS bucket FROM toks),
tf AS (SELECT doc_id, is_target, bucket, COUNT(*) AS tf FROM feats GROUP BY 1, 2, 3),
bc AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN is_target THEN tf ELSE 0 END) AS BIGINT) AS t_cnt,
         CAST(SUM(CASE WHEN is_target THEN 0 ELSE tf END) AS BIGINT) AS r_cnt
  FROM tf GROUP BY 1
),
tot AS (SELECT CAST(SUM(t_cnt) AS BIGINT) AS t_total,
               CAST(SUM(r_cnt) AS BIGINT) AS r_total FROM bc),
lr AS (
  SELECT bucket,
         CAST(round((ln(CAST(t_cnt + 1 AS DOUBLE) / CAST(t_total + {n_buckets} AS DOUBLE))
                   - ln(CAST(r_cnt + 1 AS DOUBLE) / CAST(r_total + {n_buckets} AS DOUBLE)))
                    * {DSIR_SCALE}.0, 0) AS BIGINT) AS lr_u
  FROM bc CROSS JOIN tot
),
per_doc AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         SUM(tf.tf * lr.lr_u) AS llr_u
  FROM tf JOIN lr USING (bucket) GROUP BY 1
)
SELECT d.doc_id, ({target_pred_sql}) AS is_target,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(round(CAST(p.llr_u AS DOUBLE)
             / (CAST(p.n_tokens AS DOUBLE) * {DSIR_SCALE}.0), 6), 0.0) AS dsir_score,
       (NOT ({target_pred_sql})) AND COALESCE(p.n_tokens, 0) > 0
         AND COALESCE(round(CAST(p.llr_u AS DOUBLE)
             / (CAST(p.n_tokens AS DOUBLE) * {DSIR_SCALE}.0), 6), 0.0) >= {tau}
         AS selected
FROM {table} d LEFT JOIN per_doc p USING (doc_id)
""".strip()


def kl_drift(
    docs: DataFrame,
    snapshot_pred: Column,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """One-row corpus-drift report between two snapshots — the monitoring
    pass a continuously-crawled training pipeline runs before admitting a
    new snapshot: symmetric KL divergence between the hashed-unigram
    distributions of snapshot A (``snapshot_pred``) and snapshot B (the
    rest). Large drift = the crawl changed character (new spam cluster,
    encoding regression, source mix shift) and the mix weights need
    re-deriving.

    Returns (a_tokens, b_tokens, n_active_buckets, kl_ab, kl_ba, kl_sym):
    KL(A‖B), KL(B‖A) in nats over Laplace-smoothed bucket multinomials,
    and their sum (symmetric KL).

    Determinism: per-bucket ln-ratios quantized to BIGINT micro-nats, then
    weighted by exact integer bucket counts and integer-summed — the same
    no-float-accumulation contract as dsir_scores; the two final divisions
    run on identical operands in both engines.

    Scale design: ONE explode → groupBy(bucket) pass builds both sides'
    counts (map-side combine; the exchange carries ≤ n_buckets rows), then
    a one-row total agg. Nothing is ever joined against the corpus; the
    report is two bounded shuffles regardless of corpus size.
    """
    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        snapshot_pred.alias("in_a"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS_SPLIT)).alias("word"),
    )
    bc = (
        toks.select(
            "in_a", (hash_u32_col(F.col("word"), salt) % n_buckets).alias("bucket")
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("a_cnt"),
            F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("bigint").alias("b_cnt"),
        )
    )
    b = F.lit(n_buckets).cast("bigint")
    tot = bc.agg(
        F.sum("a_cnt").cast("bigint").alias("a_tot"),
        F.sum("b_cnt").cast("bigint").alias("b_tot"),
        F.count("*").cast("bigint").alias("n_active"),
    )
    # ln(p_a/p_b) per bucket in micro-nats; p = Laplace-smoothed (cnt+1)/(tot+B)
    lr_u = F.round(
        (
            F.log((F.col("a_cnt") + F.lit(1)).cast("double") / (F.col("a_tot") + b).cast("double"))
            - F.log((F.col("b_cnt") + F.lit(1)).cast("double") / (F.col("b_tot") + b).cast("double"))
        )
        * F.lit(float(DSIR_SCALE)),
        0,
    ).cast("bigint")
    terms = bc.crossJoin(F.broadcast(tot)).select(
        "a_tot", "b_tot", "n_active",
        ((F.col("a_cnt") + F.lit(1)) * lr_u).alias("a_term_u"),
        ((F.col("b_cnt") + F.lit(1)) * (-lr_u)).alias("b_term_u"),
    )
    # KL(A||B) = Σ p_a · ln(p_a/p_b); numerators (cnt+1) are the exact
    # integer weights, the common denominator (tot+B) factors out of the sum
    out = terms.groupBy("a_tot", "b_tot", "n_active").agg(
        F.sum("a_term_u").alias("a_sum_u"),
        F.sum("b_term_u").alias("b_sum_u"),
    )
    kl_ab = F.round(
        F.col("a_sum_u").cast("double")
        / ((F.col("a_tot") + b).cast("double") * F.lit(float(DSIR_SCALE))),
        6,
    )
    kl_ba = F.round(
        F.col("b_sum_u").cast("double")
        / ((F.col("b_tot") + b).cast("double") * F.lit(float(DSIR_SCALE))),
        6,
    )
    return out.select(
        F.col("a_tot").alias("a_tokens"),
        F.col("b_tot").alias("b_tokens"),
        F.col("n_active").alias("n_active_buckets"),
        kl_ab.alias("kl_ab"),
        kl_ba.alias("kl_ba"),
        F.round(kl_ab + kl_ba, 6).alias("kl_sym"),
    )


def kl_drift_sql(
    snapshot_pred_sql: str,
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`kl_drift`."""
    u = hash_u32_sql("word", salt)
    return f"""
WITH toks AS (
  SELECT ({snapshot_pred_sql}) AS in_a,
         unnest(regexp_split_to_array(trim(lower(text)), '[ \\t\\r\\n]+')) AS word
  FROM {table} WHERE length(trim(text)) > 0
),
bc AS (
  SELECT ({u}) % {n_buckets} AS bucket,
         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS a_cnt,
         CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS b_cnt
  FROM toks GROUP BY 1
),
tot AS (SELECT CAST(SUM(a_cnt) AS BIGINT) AS a_tot,
               CAST(SUM(b_cnt) AS BIGINT) AS b_tot,
               CAST(COUNT(*) AS BIGINT) AS n_active FROM bc),
terms AS (
  SELECT a_tot, b_tot, n_active,
         (a_cnt + 1) * lr_u AS a_term_u,
         (b_cnt + 1) * (-lr_u) AS b_term_u
  FROM (
    SELECT a_cnt, b_cnt, a_tot, b_tot, n_active,
           CAST(round((ln(CAST(a_cnt + 1 AS DOUBLE) / CAST(a_tot + {n_buckets} AS DOUBLE))
                     - ln(CAST(b_cnt + 1 AS DOUBLE) / CAST(b_tot + {n_buckets} AS DOUBLE)))
                      * {DSIR_SCALE}.0, 0) AS BIGINT) AS lr_u
    FROM bc CROSS JOIN tot
  )
),
sums AS (
  SELECT a_tot, b_tot, n_active,
         SUM(a_term_u) AS a_sum_u, SUM(b_term_u) AS b_sum_u
  FROM terms GROUP BY 1, 2, 3
)
SELECT a_tot AS a_tokens, b_tot AS b_tokens, n_active AS n_active_buckets,
       round(CAST(a_sum_u AS DOUBLE) / (CAST(a_tot + {n_buckets} AS DOUBLE) * {DSIR_SCALE}.0), 6) AS kl_ab,
       round(CAST(b_sum_u AS DOUBLE) / (CAST(b_tot + {n_buckets} AS DOUBLE) * {DSIR_SCALE}.0), 6) AS kl_ba,
       round(round(CAST(a_sum_u AS DOUBLE) / (CAST(a_tot + {n_buckets} AS DOUBLE) * {DSIR_SCALE}.0), 6)
           + round(CAST(b_sum_u AS DOUBLE) / (CAST(b_tot + {n_buckets} AS DOUBLE) * {DSIR_SCALE}.0), 6), 6) AS kl_sym
FROM sums
""".strip()


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Crawl-snapshot delta — the admission diff a continuously-crawled
    corpus computes before incremental reprocessing (the batch analog of
    the engine's `dedup_incremental`): classify every key across two
    snapshots as ``added`` (new only), ``removed`` (old only), ``changed``
    (both sides, content fingerprint differs) or ``unchanged``. Downstream,
    only `added`+`changed` re-enter the extraction/dedup pipeline and
    `removed` drives retention deletes — at a 10^12-document recrawl this
    diff is what keeps per-day cost proportional to the CHANGE, not the
    corpus.

    Inputs are (key, fingerprint) frames; output one row per distinct key:
    (key, status, old_fp, new_fp). Fingerprints are NULL on the absent side
    (string NULLs — the engine's no-NULL rule covers numerics).

    Scale design (100 TB): ONE full-outer sort-merge equi-join on the key —
    both sides are corpus-sized so neither may broadcast (merge-hinted);
    AQE skew-split covers hot keys. Status is a row-local CASE after the
    join; no windows, no second shuffle, no Python.
    """
    o = old.select(
        F.col(key_col).alias("k"), F.col(fp_col).alias("old_fp")
    )
    n = new.select(
        F.col(key_col).alias("k"), F.col(fp_col).alias("new_fp")
    )
    joined = o.hint("merge").join(n, "k", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("k").alias(key_col),
        status.alias("status"),
        "old_fp",
        "new_fp",
    )


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    key_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`snapshot_diff`; ``old_sql``/``new_sql``
    must each yield ({key_col}, fp)."""
    return f"""
WITH o AS ({old_sql}), n AS ({new_sql})
SELECT COALESCE(o.{key_col}, n.{key_col}) AS {key_col},
       CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp = n.fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.fp AS old_fp, n.fp AS new_fp
FROM o FULL OUTER JOIN n ON o.{key_col} = n.{key_col}
""".strip()


HOLDOUT_VAL_FRAC = 0.10


def holdout_split(
    docs: DataFrame,
    pairs: DataFrame,
    val_frac: float = HOLDOUT_VAL_FRAC,
    id_col: str = "doc_id",
    salt: str = "holdout",
) -> DataFrame:
    """Decontaminated train/validation split — the split a training run
    must make BEFORE any loss is trusted: validation membership is a
    deterministic hash threshold (no RNG — resumed runs keep identical
    rows, `functions/sampling.py` contract), and any training document
    that is a verified NEAR-DUPLICATE of a validation document is
    quarantined out of train (Lee et al. 2021 §6.2 measure exactly this
    leakage inflating eval scores). ``pairs`` is an undirected verified
    near-dup pair list — in production the already-shipped
    `dedup.minhash_near_dups` output.

    Returns (doc_id, split) for EVERY document, split ∈ {'val', 'train',
    'quarantined'}: val wins over quarantine (a val doc near-dupping
    another val doc stays val — leakage is only train→val).

    Scale design (100 TB): the val predicate is a row-local integer
    compare (md5-u32 < frac·2³²); leak ids = the pair list joined against
    the val side — pair-table-sized (duplicate-chain-bounded), NEVER
    corpus-sized; its distinct is one bounded shuffle. The final
    membership join is a merge-hinted left join on doc_id (leak set is
    not statically broadcastable — it scales with duplicate mass).
    Composes with the minhash pipeline's three shuffles; adds two bounded
    ones of its own.
    """
    from .sampling import U32, hash_u32_col

    threshold = F.lit(int(val_frac * U32))
    is_val = hash_u32_col(F.col(id_col), salt) < threshold

    base = docs.select(F.col(id_col).alias("doc_id"), is_val.alias("is_val"))
    val_ids = base.filter("is_val").select("doc_id")

    # Undirected pairs → both directions; keep the NON-val endpoint of any
    # edge whose other endpoint is val. Both joins are pair-sized.
    edges = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    leak_ids = (
        edges.join(val_ids.withColumnRenamed("doc_id", "v"), "v")
        .select(F.col("u").alias("doc_id"))
        .distinct()
    )

    split = (
        F.when(F.col("is_val"), F.lit("val"))
        .when(F.col("leak").isNotNull(), F.lit("quarantined"))
        .otherwise(F.lit("train"))
    )
    return (
        base.hint("merge")
        .join(leak_ids.withColumn("leak", F.lit(1)), "doc_id", "left")
        .select("doc_id", split.alias("split"))
    )


def holdout_split_sql(
    pairs_sql: str,
    val_frac: float = HOLDOUT_VAL_FRAC,
    id_col: str = "doc_id",
    salt: str = "holdout",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`holdout_split`; ``pairs_sql`` must yield
    (id_a, id_b) — the same verified near-dup pair list."""
    from .sampling import U32, hash_u32_sql

    u = hash_u32_sql(id_col, salt)
    th = int(val_frac * U32)
    return f"""
WITH pairs AS ({pairs_sql}),
base AS (SELECT {id_col} AS doc_id, ({u}) < {th} AS is_val FROM {table}),
val_ids AS (SELECT doc_id FROM base WHERE is_val),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b AS u, id_a AS v FROM pairs
),
leak_ids AS (
  SELECT DISTINCT e.u AS doc_id FROM edges e JOIN val_ids x ON e.v = x.doc_id
)
SELECT b.doc_id,
       CASE WHEN b.is_val THEN 'val'
            WHEN l.doc_id IS NOT NULL THEN 'quarantined'
            ELSE 'train' END AS split
FROM base b LEFT JOIN leak_ids l ON b.doc_id = l.doc_id
""".strip()
