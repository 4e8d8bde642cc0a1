"""Training-corpus preparation — the composed curation pipeline.

The reference engine is a per-document extraction service with no corpus-
level curation (its only dedup is the md5 cache short-circuit,
extract/tasks.py:33-41); this module is the §2.11 training-data surface a
100-TB pipeline actually ships, composed from the engine's own verified
operators:

    funnel_verdicts   per-doc keep/drop verdict with first-reason precedence
                      (near_dup → lang_und → low_quality → repetition → keep)
    prep_manifest     keep → per-source quota cap → deterministic shard +
                      order assignment → the data-loader manifest

Both are deterministic (no RNG, hash-ordered selections), so re-running any
stage over the same input reproduces byte-identical output — the property
``jobs/corpus_prep.py`` leans on for exactly-once resume (an overwrite
re-write of a stage that crashed before its marker lands on the same rows).

Scale shape (per the component operators' own docs): the funnel is one
scan of row-local signal columns + the pair-scale cluster resolution + ONE
merge-hinted left join against the non-canonical set (near-dup membership
is corpus-scale at the web's 30-50% dup rates — broadcast would OOM; AQE
still downgrades when genuinely small). Quota is the two-phase salted
top-k; sharding is per-shard windows. Nothing holds corpus-scale state on
one executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import quality
from .clustering import neardup_clusters
from .dedup import minhash_near_dups
from .sampling import quota_per_stratum, shard_assign
from .textstats import lang_id_col, quality_score_col


def noncanonical_docs(docs: DataFrame, neardup_threshold: float = 0.82) -> DataFrame:
    """(doc_id) of every non-canonical near-dup cluster member — the one
    corpus-GLOBAL signal in the funnel (a doc's dup-ness depends on every
    other doc). The resumable job materializes this as its own stage so the
    per-doc verdict pass downstream becomes embarrassingly parallel and
    bucket-resumable against a stable table."""
    pairs = minhash_near_dups(docs, threshold=neardup_threshold).select(
        "id_a", "id_b"
    )
    return (
        neardup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )


def funnel_verdicts(
    docs: DataFrame,
    neardup_threshold: float = 0.82,
    quality_min: float = 0.45,
    noncanon: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, verdict) per document; verdict ∈ {near_dup, lang_und,
    low_quality, repetition, keep} with first-reason precedence.

    ``noncanon``: a precomputed :func:`noncanonical_docs` frame (or a
    re-read of its persisted stage table). When given, ``docs`` may be any
    SLICE of the corpus the noncanon set was computed over — everything
    else is row-local, which is what makes the job's verdict stage
    wave-resumable. When None, it is computed inline over ``docs``.
    """
    if noncanon is None:
        noncanon = noncanonical_docs(docs, neardup_threshold)
    noncanon = noncanon.select("doc_id").withColumn("is_dup", F.lit(True))
    sig = quality.repetition_cols("text")
    scored = docs.select(
        "doc_id",
        lang_id_col(F.col("text")).alias("lang_pred"),
        quality_score_col(F.col("text")).alias("q"),
        quality.rep_flagged_col(sig).alias("repf"),
    )
    return scored.join(noncanon.hint("merge"), "doc_id", "left").select(
        "doc_id",
        F.when(F.col("is_dup"), F.lit("near_dup"))
        .when(F.col("lang_pred") == "und", F.lit("lang_und"))
        .when(F.col("q") < quality_min, F.lit("low_quality"))
        .when(F.col("repf"), F.lit("repetition"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )


def prep_manifest(
    docs: DataFrame,
    verdicts: DataFrame,
    quota: int = 40,
    n_shards: int = 8,
) -> DataFrame:
    """keep-verdict docs → per-source quota cap → (doc_id, source, shard,
    pos) loader manifest. ``verdicts`` is ``funnel_verdicts`` output (or a
    re-read of its persisted stage table — how the resumable job chains)."""
    kept = docs.select("doc_id", "source").join(
        verdicts.filter(F.col("verdict") == "keep").select("doc_id"),
        "doc_id",
        "inner",
    )
    capped = quota_per_stratum(kept, quota=quota)
    return shard_assign(capped, n_shards=n_shards, extra_cols=("source",))
