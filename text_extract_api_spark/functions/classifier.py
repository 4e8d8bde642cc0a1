"""Model-based quality classification — distributed logistic regression.

Not in the reference (single-document service); mandated by the build
contract's training-data-pipeline scope. The modern web-corpus pipelines
(DCLM, FineWeb-Edu) gate documents with a fastText-style linear classifier
over bag-of-words features rather than hand rules alone; this module is
that pass, built Spark-first: hashed unigram features (hashing trick, the
same md5-u32 primitive as functions/selection.py), full-batch gradient
descent where each round is two bounded shuffles plus a ≤``n_buckets``-row
driver collect (the kmeans-centroid pattern), and scoring that never joins
anything corpus-scaled against the corpus except the per-doc residual join
GD inherently needs.

Determinism contract (engine parity): weights live in INTEGER micro-units
(w = w_u / 1e6, BIGINT) at every step, so per-document scores are exact
integer dot products — no partition-order float accumulation anywhere.
The only floats are (a) the sigmoid, evaluated on bit-identical
``score_u/1e6`` doubles and immediately re-quantized to a micro-unit
residual, and (b) the learning-rate multiply on the integer gradient,
evaluated on identical operands in both engines. The DuckDB oracle unrolls
the GD rounds as CTE layers (kmeans/BPE-oracle pattern) and must reproduce
every probability bit-for-bit after 6-dp rounding.

Scale design (100 TB): driver state = the weight vector, capped at
``n_buckets + 1`` by the hashing trick — never vocabulary-scaled. Per
round: one groupBy(doc) score agg over the cached feature table, one
merge-hinted residual join back onto features, one groupBy(bucket)
gradient agg whose exchange carries ≤ n_buckets rows. Rounds are O(corpus)
scans with bounded driver traffic — the standard distributed full-batch GD
shape. For stochastic variants at extreme scale, sub-sample the feature
table with the deterministic hash-threshold sampler (stratified_sample)
before training; scoring is unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .sampling import hash_u32_col, hash_u32_sql
from .textstats import WS_SPLIT

CLF_BUCKETS = 1024
CLF_ROUNDS = 3
CLF_LR = 1.0  # full-batch GD step (measured: 4.0 oscillates on presence features)
CLF_SCALE = 1_000_000  # micro-unit fixed point (engine-wide convention)


def _feature_tf(
    docs: DataFrame,
    label_pred: Column,
    id_col: str,
    text_col: str,
    n_buckets: int,
    salt: str,
) -> tuple[DataFrame, DataFrame]:
    """(spine, x): the (doc_id, y) label spine over ALL docs and the
    (doc_id, bucket, x_u) BINARY-PRESENCE hashed feature table over
    non-empty docs — x_u = 1e6 micro (feature value 1.0) per distinct
    bucket the document touches."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        label_pred.cast("int").alias("y"),
    )
    spine = base.select("doc_id", "y")
    # binary presence: distinct buckets per document — x_u is the constant
    # 1e6 micro (feature value 1.0). Presence caps each feature's
    # per-document mass independent of term frequency AND document length,
    # which is what lets one learning rate fit every document (raw-tf
    # measured divergent: long docs dominate; mean-pooled tf measured
    # 30× too slow to converge: feature scale shrinks with doc length).
    #
    # The distinct-bucket set is WITHIN-document, so it never needed the
    # r4-wave-2 explode + groupBy(doc, bucket) exchange over the whole
    # token stream — one Arrow ``mapInPandas`` stage builds it row-local
    # (bigram_logppl/_minhash_base discipline; bit-identical buckets, the
    # Python md5-u32 replicates hash_u32_col exactly). A per-batch
    # word→bucket memo collapses the natural-language vocabulary skew:
    # repeated words hash once per Arrow batch, not once per occurrence.
    import hashlib
    import re as _re
    from collections.abc import Iterator

    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    x_schema = f"doc_id {id_type}, bucket bigint, x_u bigint"
    ws = _re.compile(WS_SPLIT)
    salt_b = (":" + salt).encode()
    md5 = hashlib.md5

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            ids: list = []
            bks: list[int] = []
            for did, txt in zip(pdf["doc_id"].values, pdf["_text"].values):
                if txt is None or not txt.strip(" "):
                    continue
                buckets = set()
                for w in ws.split(txt.lower().strip(" ")):
                    b = memo.get(w)
                    if b is None:
                        b = memo[w] = (
                            int(md5(w.encode() + salt_b).hexdigest()[:8], 16)
                            % n_buckets
                        )
                    buckets.add(b)
                ids.extend([did] * len(buckets))
                bks.extend(buckets)
            yield pd.DataFrame(
                {"doc_id": ids, "bucket": bks, "x_u": [CLF_SCALE] * len(bks)}
            ).astype({"bucket": "int64", "x_u": "int64"}, errors="ignore")

    x = base.select("doc_id", "_text").mapInPandas(op, x_schema)
    return spine, x


def train_quality_classifier(
    docs: DataFrame,
    label_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = CLF_BUCKETS,
    n_rounds: int = CLF_ROUNDS,
    lr: float = CLF_LR,
    salt: str = "clf",
) -> DataFrame:
    """Train ``n_rounds`` of full-batch logistic regression against the
    boolean ``label_pred`` and return the final per-document scoring:
    (doc_id, y, prob, predicted) for EVERY document — the trained filter's
    verdict on its own corpus (the shape a deployment persists before
    thresholding the admission gate).

    GD update (weights in integer micro-units, dot products in exact
    integer pico-units; N = total doc count):
        x_u_ib    = 1e6 iff bucket b present in doc i   (presence feature)
        score_p_i = Σ_b x_u_ib · w_u_b + bias_u · 1e6   (exact BIGINT, pico)
        p_i       = σ(score_p_i / 1e12)                 (identical doubles)
        r_u_i     = round((y_i − p_i) · 1e6)            (micro residual)
        w_u_b    += round(lr · Σ_i r_u_i · x_u_ib / (1e6 · N))
        bias_u   += round(lr · Σ_i r_u_i / N)
    Zero-init weights; documents with no tokens score the bias alone and
    contribute only to the bias gradient (they stay in the spine).
    Integer-width note: each per-row gradient term r_u·x_u is ≤ 1e12
    (BIGINT-safe), but the SUM over the corpus is ≤ N·1e12 and would wrap
    BIGINT silently past ~9×10⁶ documents — so the accumulators run in
    DECIMAL(38,0) (exact, headroom to 10³⁸ ≫ 10²⁴ at 10¹²-doc scale; the
    mix_weights promotion pattern). DuckDB needs no promotion: its
    BIGINT SUM widens to HUGEINT natively, so the oracle is unchanged.
    """
    spark = docs.sparkSession
    spine, x = _feature_tf(docs, label_pred, id_col, text_col, n_buckets, salt)
    spine = spine.localCheckpoint()  # corpus-spine: reused every round
    x = x.localCheckpoint()  # feature table: reused every round
    n_docs = spine.count()
    weights: dict[int, int] = {}  # bucket -> w_u (micro-units)
    bias_u = 0

    def scored(w: dict[int, int], b_u: int) -> DataFrame:
        if w:
            wdf = spark.createDataFrame(
                [(k, v) for k, v in sorted(w.items())], "bucket bigint, w_u bigint"
            )
            part = (
                x.join(F.broadcast(wdf), "bucket")
                .groupBy("doc_id")
                .agg(F.sum(F.col("x_u") * F.col("w_u")).alias("dot_p"))
            )
        else:  # round 1: all-zero weights — score is the bias alone
            part = x.groupBy("doc_id").agg(F.lit(0).cast("bigint").alias("dot_p"))
        return spine.join(part.hint("merge"), "doc_id", "left").select(
            "doc_id",
            "y",
            (
                F.coalesce(F.col("dot_p"), F.lit(0))
                + F.lit(b_u * CLF_SCALE)
            ).alias("score_p"),
        )

    def resid(sc: DataFrame) -> DataFrame:
        p = F.lit(1.0) / (
            F.lit(1.0)
            + F.exp(
                -(
                    F.col("score_p").cast("double")
                    / F.lit(float(CLF_SCALE) * float(CLF_SCALE))
                )
            )
        )
        return sc.select(
            "doc_id",
            F.round((F.col("y").cast("double") - p) * F.lit(float(CLF_SCALE)), 0)
            .cast("bigint")
            .alias("r_u"),
        )

    for _ in range(n_rounds):
        # one localCheckpoint (the residual frame feeds both union branches
        # AND would otherwise recompute its spine merge-join per branch —
        # measured 4× slower un-checkpointed at sf0.1) + ONE union-agg
        # collect per round: bucket −1 carries the bias gradient (tf has
        # no negative buckets), so weight and bias updates arrive in a
        # single ≤ n_buckets+1-row job instead of two.
        r = resid(scored(weights, bias_u)).localCheckpoint()
        grads = _gradient_sums(x, r).collect()
        for row in grads:
            b = int(row["bucket"])
            if b < 0:  # bias gradient: Σ r_u is already micro-scaled
                bias_u += int(_round_half_up(lr * float(row["g_u"]) / n_docs))
            else:  # weight gradient: Σ r_u·x_u is micro² — rescale to micro
                weights[b] = weights.get(b, 0) + int(
                    _round_half_up(
                        lr * float(row["g_u"]) / (float(CLF_SCALE) * n_docs)
                    )
                )

    final = scored(weights, bias_u)
    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(
            -(
                F.col("score_p").cast("double")
                / F.lit(float(CLF_SCALE) * float(CLF_SCALE))
            )
        )
    )
    return final.select(
        "doc_id",
        "y",
        F.round(p, 6).alias("prob"),
        (p >= F.lit(0.5)).alias("predicted"),
    )


def _gradient_sums(x: DataFrame, r: DataFrame) -> DataFrame:
    """One union-agg gradient job: (bucket, g_u) with bucket −1 carrying
    the bias gradient Σ r_u and buckets ≥ 0 carrying Σ r_u·x_u.

    Each per-row term fits BIGINT (|r_u·x_u| ≤ 1e12), but the corpus SUM
    is ≤ N·1e12 — past ~9×10⁶ docs that exceeds 2^63, which non-ANSI
    Spark wraps silently and ANSI Spark (4.x default) kills the job on —
    so the residual is promoted to DECIMAL(38,0) BEFORE the multiply and
    the sum runs in exact decimal: headroom through 10¹²+ documents
    (≤ 10²⁴ ≪ 10³⁸). The exchange still carries ≤ n_buckets+1 rows after
    map-side partial aggregation.
    """
    g_type = "decimal(38,0)"
    contrib = (
        x.join(r.hint("merge"), "doc_id")
        .select(
            "bucket",
            (F.col("r_u").cast(g_type) * F.col("x_u")).cast(g_type).alias("g"),
        )
        .unionByName(
            r.select(
                F.lit(-1).cast("bigint").alias("bucket"),
                F.col("r_u").cast(g_type).alias("g"),
            )
        )
    )
    return contrib.groupBy("bucket").agg(F.sum("g").alias("g_u"))


def _round_half_up(x: float) -> float:
    """Python's round() is banker's; Spark/DuckDB round() is HALF_UP away
    from zero — the driver-side weight update must match the oracle's."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def quality_classifier_sql(
    label_pred_sql: str,
    n_buckets: int = CLF_BUCKETS,
    n_rounds: int = CLF_ROUNDS,
    lr: float = CLF_LR,
    salt: str = "clf",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`train_quality_classifier`: the GD rounds
    unrolled as CTE layers (kmeans/BPE pattern). Weight tables carry only
    ACTIVE buckets (inactive buckets keep w_u = 0 forever: no tf row can
    produce a gradient for them), bias as a one-row CTE per round."""
    u = hash_u32_sql("word", salt)
    pico = f"{CLF_SCALE}.0 * {CLF_SCALE}.0"
    p_of = (
        lambda score_p: f"(1.0 / (1.0 + exp(-(CAST({score_p} AS DOUBLE) / ({pico})))))"
    )
    parts = [
        f"""
WITH spine AS (
  SELECT doc_id, CAST(({label_pred_sql}) AS INT) AS y FROM {table}
),
nd AS (SELECT COUNT(*) AS n FROM spine),
tf AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, ({u}) % {n_buckets} AS bucket FROM (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '[ \\t\\r\\n]+')) AS word
      FROM {table} WHERE length(trim(text)) > 0
    )
  ) GROUP BY 1, 2
),
x AS (
  SELECT doc_id, bucket, CAST({CLF_SCALE} AS BIGINT) AS x_u FROM tf
),
w0 AS (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w_u FROM x),
b0 AS (SELECT CAST(0 AS BIGINT) AS bias_u)"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(
            f""",
sc{r} AS (
  SELECT s.doc_id, s.y,
         COALESCE(d.dot_p, 0) + (SELECT bias_u FROM b{r - 1}) * {CLF_SCALE}
           AS score_p
  FROM spine s LEFT JOIN (
    SELECT x.doc_id, SUM(x.x_u * w.w_u) AS dot_p
    FROM x JOIN w{r - 1} w USING (bucket) GROUP BY 1
  ) d USING (doc_id)
),
rs{r} AS (
  SELECT doc_id,
         CAST(round((CAST(y AS DOUBLE) - {p_of('score_p')}) * {CLF_SCALE}.0, 0)
              AS BIGINT) AS r_u
  FROM sc{r}
),
w{r} AS (
  SELECT w.bucket,
         w.w_u + CAST(round({lr} * CAST(COALESCE(g.g_u, 0) AS DOUBLE)
                            / ({CLF_SCALE}.0 * (SELECT n FROM nd)), 0)
                      AS BIGINT) AS w_u
  FROM w{r - 1} w LEFT JOIN (
    SELECT x.bucket, SUM(rs.r_u * x.x_u) AS g_u
    FROM x JOIN rs{r} rs USING (doc_id) GROUP BY 1
  ) g USING (bucket)
),
b{r} AS (
  SELECT (SELECT bias_u FROM b{r - 1})
         + CAST(round({lr} * CAST((SELECT SUM(r_u) FROM rs{r}) AS DOUBLE)
                      / (SELECT n FROM nd), 0) AS BIGINT) AS bias_u
)"""
        )
    tail = f"""
SELECT s.doc_id, s.y,
       round({p_of('s.score_p')}, 6) AS prob,
       {p_of('s.score_p')} >= 0.5 AS predicted
FROM sc_final s
""".rstrip()
    final_sc = f""",
sc_final AS (
  SELECT s.doc_id, s.y,
         COALESCE(d.dot_p, 0) + (SELECT bias_u FROM b{n_rounds}) * {CLF_SCALE}
           AS score_p
  FROM spine s LEFT JOIN (
    SELECT x.doc_id, SUM(x.x_u * w.w_u) AS dot_p
    FROM x JOIN w{n_rounds} w USING (bucket) GROUP BY 1
  ) d USING (doc_id)
)"""
    return ("".join(parts) + final_sc + "\n" + tail).strip()
