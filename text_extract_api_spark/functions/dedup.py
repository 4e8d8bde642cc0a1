"""Corpus deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the part that matters at 10^12 docs):

- **exact**: one shuffle on md5(text). The canonical representative is
  min(doc_id) — deterministic under any partitioning.
- **n-gram Jaccard (pairwise)**: exact but quadratic in the worst case —
  the candidate generator is a self-join on shingles, which explodes on hot
  shingles. It is the *verification* stage; never run it corpus-wide.
- **MinHash + LSH**: the scale path. Per-doc signature is an aggregation
  (one shuffle); banding turns near-dup search into an equi-join on band
  keys — no pairwise blowup. Hash family: lexicographic min of
  md5(seed||shingle) per seed — uniform, engine-portable (identical in the
  DuckDB oracle), no RNG.
- **SimHash**: per-doc 16-bit signature from hex-digit votes of token
  md5s; Hamming-adjacent buckets then join. One explode + one groupBy.

All expressions are JVM builtins (md5/split/explode/min) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WS_SPLIT = "[ \\t\\r\\n]+"
MINHASH_SEEDS = 12
LSH_BANDS = 4  # 4 bands × 3 rows
LSH_ROWS = MINHASH_SEEDS // LSH_BANDS
SIMHASH_BITS = 16


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(content_hash, canonical_id, n_dups) for every duplicate group."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_dups"),
        )
    )


def shingles_col(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingles as an array column (JVM-side)."""
    words = F.split(F.trim(F.col(text_col)), WS_SPLIT)
    k = F.size(words) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + j).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Exploded (id, shingle) pairs — distinct per doc."""
    return (
        docs.select(F.col(id_col).alias("id"), shingles_col(text_col, n).alias("sh"))
        .filter(F.size("sh") > 0)
        .select("id", F.explode("sh").alias("shingle"))
    )


def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard ≥ threshold).

    Candidate generation is a shingle self-join — verification-stage only;
    use :func:`lsh_candidate_pairs` to pre-filter at scale.
    """
    sh = doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signature(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    seeds: int = MINHASH_SEEDS,
) -> DataFrame:
    """(id, sig_0..sig_{seeds-1}): min over shingles of md5(seed||':'||shingle).

    Lexicographic min over uniformly-distributed hex digests is a valid
    minwise hash; identical SQL exists in DuckDB (oracle parity).
    """
    sh = doc_shingles(docs, id_col, text_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"sig_{s}")
        for s in range(seeds)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_bands(sig: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> DataFrame:
    """(id, band, band_key): hash of each band's signature slice."""
    parts = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows + r}") for r in range(rows)]
        parts.append(
            sig.select(
                "id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lsh_candidate_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket.

    The equi-join on (band, band_key) is the whole trick: near-dup search
    with no pairwise term. Hot buckets (giant dup clusters) are bounded by
    AQE skew-join splitting.
    """
    bands = lsh_bands(minhash_signature(docs, id_col, text_col, n))
    a = bands.select("band", "band_key", F.col("id").alias("id_a"))
    b = bands.select("band", "band_key", F.col("id").alias("id_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates → exact Jaccard verification (the full scale path)."""
    cands = lsh_candidate_pairs(docs, id_col, text_col, n)
    sh = doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        cands.join(a, "id_a").join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): 16-bit signature as a '0'/'1' string.

    Bit b votes +1 if hex digit b of md5(token) ≥ 8 (i.e. its top bit is
    set), else −1; the signature bit is 1 iff the vote sum is positive.
    Engine-portable: identical arithmetic exists in the DuckDB oracle.
    """
    toks = (
        docs.select(F.col(id_col).alias("id"), F.split(F.trim(F.col(text_col)), WS_SPLIT).alias("w"))
        .filter(F.size("w") > 0)
        .select("id", F.explode("w").alias("tok"))
        .withColumn("h", F.md5("tok"))
    )
    votes = [
        F.sum(
            F.when(
                F.substring("h", b + 1, 1).isin(*list("89abcdef")), F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"v_{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("id").agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v_{b}") > 0, F.lit("1")).otherwise(F.lit("0")) for b in range(SIMHASH_BITS)]
    )
    return agg.select("id", bits.alias("simhash"))
