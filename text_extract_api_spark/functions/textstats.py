"""Text analysis: token counting, quality scoring, language ID, fingerprints.

All pure Column expressions (codegen'd, shuffle-free, scale-proof: these are
embarrassingly parallel map ops — at 100 TB the only cost is the scan, and
column pruning keeps that to the ``text`` column).

Every expression has an exact DuckDB twin in ``__spark_entry__.oracle_sql``:
stick to replace/length/regexp with dialect-identical semantics.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified hints here

from pyspark.sql import Column, functions as F

WS_SPLIT = "[ \\t\\r\\n]+"

# language-marker stopwords (occurrence counted with padded spaces so they
# match whole words only) — a classic cheap n-gram/stopword LID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it"]


def token_count_col(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, WS_SPLIT))
    )


# GPT-2-style pretokenizer regex, lookahead-free so Java regex (Spark) and
# RE2 (DuckDB) agree exactly: a token is an optionally space-prefixed letter
# run, digit run, or punctuation run. Explicit whitespace class (not \s):
# Java's \s includes \x0B, RE2's does not.
BPE_TOKEN_RE = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\r\\n]+"


def token_count_bpe_col(text: Column) -> Column:
    """BPE-ish subword-boundary token count via the GPT-2-style pretokenizer
    regex (the standard proxy for 'how many tokens will the tokenizer emit'
    when budgeting a training mix). Pure codegen: one regexp_extract_all +
    size per row, zero shuffles."""
    return F.when(text.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))
    )


def _occurrences(text: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of a fixed substring —
    (len(s) - len(replace(s, n, ''))) / len(n), dialect-portable."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_scores_cols(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            c = _occurrences(padded, m)
            score = c if score is None else score + c
        out[lang] = score
    return out


def lang_id_col(text: Column) -> Column:
    """argmax over marker scores; ties and all-zero → 'und' (undetermined)."""
    scores = lang_scores_cols(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # deterministic preference order on ties: en > de > fr > es
    for lang in ["es", "fr", "de", "en"]:
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def quality_score_col(text: Column) -> Column:
    """Composite [0,1] quality score from cheap surface statistics:
    length saturation, punctuation ratio, stopword ratio, alpha ratio.
    Deterministic replacement for model-based quality filters."""
    n_chars = F.length(text).cast("double")
    n_tokens = token_count_col(text).cast("double")
    punct = F.length(F.regexp_replace(text, "[^.!?,;:]", "")).cast("double")
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    sw = None
    for w in STOPWORDS_EN:
        c = _occurrences(padded, f" {w} ")
        sw = c if sw is None else sw + c
    stopword_ratio = F.when(n_tokens > 0, sw.cast("double") / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * F.least(F.lit(1.0), stopword_ratio * 5.0)
        + F.lit(0.1) * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 10.0))
    )
    # +1e-9 before rounding: engines computing the composite in a slightly
    # different expression order can land 1 ulp apart, straddling a .xxxx5
    # rounding boundary (observed at sf0.1: 7 docs of 5000 off by 0.0001).
    # The shared epsilon pushes both sides off the knife edge; the DuckDB
    # oracle applies the identical epsilon.
    return F.round(score + F.lit(1e-9), 4)


# URL matcher, dialect-portable: scheme + host captured as group 1, rest of
# the URL consumed by an explicit character class (no \S — Java and RE2
# disagree on what \s covers).
URL_RE = "https?://([A-Za-z0-9.-]+)[^ \\t\\r\\n]*"

# Domains whose documents a curation pass drops outright (synthetic stand-in
# for the C4/RefinedWeb URL blocklists — the real artifact is a config file).
URL_BLOCKLIST = ["spam.example", "ads.example"]


def url_domains_col(text: Column) -> Column:
    """All URL host names in a document, lowercased, leading ``www.``
    stripped — one ``regexp_extract_all`` per row, pure codegen. Duplicates
    preserved (occurrence counts matter for domain stats)."""
    return F.transform(
        F.regexp_extract_all(text, F.lit(URL_RE), F.lit(1)),
        lambda d: F.regexp_replace(F.lower(d), "^www\\.", ""),
    )


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 over the casefolded alphanumeric skeleton —
    robust to whitespace/punctuation edits (cheap canonical near-dup key)."""
    return F.md5(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))


def length_quantiles(
    docs,
    group_col: str = "lang",
    value_col: str = "n_chars",
    approx: bool = False,
    accuracy: int = 10_000,
):
    """Per-group value distribution (p50/p90/p99 + count) — the first cut of
    any mix-design or outlier-filter decision.

    Two modes (VERDICT r3 #6):

    - ``approx=False`` (default, the oracle-checked path): exact
      interpolated percentiles. One sort-based agg per group — fine while a
      group's values fit an executor, which stops being true at 100 TB.
    - ``approx=True`` (the scale path): ``percentile_approx`` over a
      KLL/GK-style sketch of bounded size (``accuracy`` controls the
      rank-error bound ~1/accuracy). Sketches merge associatively, so the
      agg is a normal partial/final aggregation — memory is O(accuracy) per
      group regardless of corpus size, and no group ever needs its values
      co-resident. Returns discrete observed values (no interpolation), so
      it carries no SQL oracle — bounded-error parity vs the exact path is
      pinned by ``tests/test_quality.py::test_length_quantiles_approx``.

    The +1e-9 epsilon on the exact path guards 4-dp rounding against the
    engines' last-ulp interpolation difference ((1-g)a+gb vs a+(b-a)g).
    """
    if approx:
        pct = lambda p: F.percentile_approx(value_col, p, accuracy)  # noqa: E731
        eps = F.lit(0)
    else:
        pct = lambda p: F.percentile(value_col, p)  # noqa: E731
        eps = F.lit(1e-9)
    return docs.groupBy(group_col).agg(
        F.round(pct(0.5) + eps, 4).alias("p50_chars"),
        F.round(pct(0.9) + eps, 4).alias("p90_chars"),
        F.round(pct(0.99) + eps, 4).alias("p99_chars"),
        F.count("*").cast("bigint").alias("n_docs"),
    )


def nfc_normalize_col(text: Column) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF.

    Every serious corpus pipeline NFC-normalizes before content hashing:
    the same visible string arrives from the web in composed (U+00E9) and
    decomposed (U+0065 U+0301) forms, and a byte-keyed exact dedup treats
    them as distinct documents. NFC is THE canonical-equivalence composer
    (Unicode TR15), implemented identically by Python's ``unicodedata``
    and DuckDB's ``nfc_normalize`` — both track the same standard tables,
    which is what makes the oracle exact.

    Spark has no JVM-side normalizer builtin, so this is a designated
    Arrow batch kernel (row-local, zero shuffles; the ICU-equivalent fast
    path short-circuits pure-ASCII strings inside CPython, so the common
    case is a pointer walk, not a table lookup)."""
    import unicodedata

    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if isinstance(x, str) else x
        )

    return _nfc(text)


def normalized_fingerprint_col(text: Column) -> Column:
    """md5 over the NFC-normalized text — the dedup key that collapses
    canonically-equivalent encodings of the same content."""
    return F.md5(nfc_normalize_col(text))


def tfidf_topk_terms(docs, k: int = 5):
    """Per-document top-k terms by TF-IDF — the standard keyword-extraction
    / document-signature op a training-data pipeline uses for topic
    balancing and near-dup triage.

    score = tf × ln((N+1)/(df+1)), smoothed so df=N terms score 0 instead
    of degenerate ln(1) ties everywhere; rank is over the score ROUNDED to
    6 decimals (ties broken by term) so the JVM and DuckDB rank the exact
    same doubles — a raw-double ordering could flip on a 1-ulp ln()
    disagreement between libm implementations.

    Scale shape (the 100-TB audit):
    - token explode feeds groupBy(doc_id, term): partial (map-side) combine
      collapses in-doc repeats before the exchange — the shuffle carries
      distinct (doc, term) pairs, not the token stream;
    - df = groupBy(term) over the tf frame (distinct-pairs input, already
      far smaller than the corpus);
    - the tf⋈df enrich joins on term. The df side scales with the corpus
      vocabulary (billions of terms on web text) so it is NOT statically
      broadcast (pitfall: the static planner sizes it from the parquet
      footprint); AQE downgrades to broadcast when genuinely small and
      skew-splits the stopword keys — "the" matches ~every doc's tf row,
      but it's a 1:1 enrich, so hot keys are partition imbalance, not row
      explosion;
    - N arrives as a broadcast one-row aggregate (no driver collect);
    - top-k is a per-doc window: partition key = doc_id (high cardinality,
      bounded rows per key — no skew path).
    """
    from pyspark.sql import Window

    nonempty = docs.filter(F.length(F.trim(F.col("text"))) > 0)
    toks = nonempty.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), WS_SPLIT)).alias(
            "term"
        ),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df_counts = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    n_frame = nonempty.agg(F.count("*").cast("double").alias("n_docs"))
    # merge hint: the static planner sizes df_counts from the parquet
    # footprint and would BROADCAST it — but it scales with the corpus
    # vocabulary (billions of terms on web text). SMJ is the safe shape;
    # AQE downgrades to broadcast at runtime when genuinely small and
    # skew-splits hot stopword partitions. AQE also runtime-reuses the
    # duplicated tf subtree (identical exchange), so the token explode
    # runs once despite appearing twice in the static plan.
    scored = (
        tf.join(df_counts.hint("merge"), "term")
        .crossJoin(F.broadcast(n_frame))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1e-9),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


# ------------------------------------------------------------- BPE training
BPE_N_MERGES = 4
_SEP = "\x1f"  # unit separator: cannot appear in whitespace-split tokens
_EOW = "</w>"  # Sennrich end-of-word marker (a single symbol)


def _sym_str_col(word: Column) -> Column:
    """A word as its boundary-delimited symbol string:
    ``␟c1␟␟c2␟…␟cn␟␟</w>␟`` — every symbol wrapped in ␟…␟, symbols joined
    back-to-back. The wrapping makes the merge step a plain string
    replace: the pattern ``␟left␟␟right␟`` can only match at a symbol
    boundary (a bare ``left␟␟right`` would also match the TAIL of a
    longer first symbol), and replace()'s left-to-right non-overlapping
    scan IS the BPE merge-application order — [a,a,a] merges to [aa,a],
    [a,a,a,a] to [aa,aa] — identically in Spark and DuckDB, with no
    per-element lambda at all."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.concat(F.lit(_SEP), word.substr(i, F.lit(1)), F.lit(_SEP)),
    )
    return F.concat(
        F.concat_ws("", chars), F.lit(_SEP + _EOW + _SEP)
    )


def bpe_train_merges(
    docs,
    n_merges: int = BPE_N_MERGES,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Learn the top-``n_merges`` BPE merge rules from the corpus
    (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
    Words with Subword Units" — word-level BPE with an end-of-word
    marker). Returns (merge_rank, merge_left, merge_right, pair_count):
    rank-r is the symbol pair with the highest corpus count AFTER the
    first r-1 merges were applied, ties broken lexicographically.

    Scale design (the Sennrich construction is what makes this
    distributable): the corpus is touched ONCE — the word-count
    aggregation (map-side combined; the exchange carries the
    vocabulary, not the token stream). Every merge round then runs over
    the VOCABULARY table: a row-local pair explode weighted by word
    count, one bounded groupBy(left,right) exchange, a 1-row TakeOrdered
    to the driver (the per-round centroid-collect pattern from
    kmeans_assign), and a row-local string replace applying the merge.
    Driver state per round = one pair. Merge application is the
    boundary-delimited replace (see _sym_str_col) — bit-identical
    semantics on both engines, no interpreted per-element lambda.
    """
    spark = docs.sparkSession
    words = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), WS_SPLIT)
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("s", _sym_str_col(F.col("word")))
        .select("s", "cnt")
        .localCheckpoint()  # vocab-sized; each round re-reads it
    )
    sep2 = _SEP + _SEP
    out_rows = []
    cur = words
    for rank in range(1, n_merges + 1):
        syms = F.split(
            F.expr(f"trim(BOTH '{_SEP}' FROM s)"), sep2, -1
        )
        pairs = (
            cur.select(F.col("cnt"), syms.alias("y"))
            .filter(F.size("y") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("y") - 1),
                        lambda i: F.struct(
                            F.element_at("y", i).alias("l"),
                            F.element_at("y", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p")["l"].alias("l"), F.col("p")["r"].alias("r"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()  # exactly one row per round
        )
        if not pairs:
            break
        l, r, c = pairs[0]["l"], pairs[0]["r"], pairs[0]["c"]
        out_rows.append((rank, l, r, c))
        cur = cur.select(
            F.replace(
                F.col("s"),
                F.lit(_SEP + l + sep2 + r + _SEP),
                F.lit(_SEP + l + r + _SEP),
            ).alias("s"),
            "cnt",
        ).localCheckpoint()
    return spark.createDataFrame(
        out_rows,
        "merge_rank int, merge_left string, merge_right string, pair_count bigint",
    )


def bpe_apply(
    docs,
    merges: list[tuple[str, str]] | None = None,
    n_merges: int = BPE_N_MERGES,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Encode every document with the trained BPE merge table — the apply
    half of the tokenizer loop (:func:`bpe_train_merges` learns the rules;
    this tokenizes the corpus with them, the pass a training pipeline runs
    to produce token counts/budgets per document).

    Returns (doc_id, n_words, n_bpe_tokens, enc_md5): subword token count
    after applying the merges in rank order, plus md5 of the full encoded
    symbol stream — the strong value check (any divergence in ANY
    document's tokenization changes the digest).

    ``merges`` defaults to training on ``docs`` itself (the 1-row-per-round
    driver collect documented in bpe_train_merges — bounded by config).

    Mechanics: each word becomes the boundary-delimited symbol string
    (``_sym_str_col``); words join with a plain space, which can never be
    part of a ``␟…␟`` symbol, so a merge replace cannot cross a word
    boundary. Applying rank-r's merge is ONE literal string replace over
    the whole document — replace()'s left-to-right non-overlapping scan is
    exactly BPE's within-word merge order, identical in Spark and DuckDB.
    Token count = ``␟␟`` boundary count + word count, recovered by a
    length difference (no split, no explode).

    Scale: entirely row-local — zero shuffles, output inherits input
    partitioning; the merge table is driver-side literals (config-bounded,
    the kmeans-centroid pattern), never a joined side. The per-word
    symbol-string build is the one interpreted-HOF lambda; at 100 TB it
    moves to the chunker's Arrow ``mapInPandas`` seam (measured 6× there) —
    the merge replaces and counts stay codegen either way.
    """
    if merges is None:
        merges = [
            (r["merge_left"], r["merge_right"])
            for r in bpe_train_merges(
                docs, n_merges=n_merges, id_col=id_col, text_col=text_col
            ).collect()
        ]
    sep2 = _SEP + _SEP
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), WS_SPLIT),
        lambda w: w != F.lit(""),
    )
    enc = F.concat_ws(" ", F.transform(words, _sym_str_col))
    for left, right in merges:
        enc = F.replace(
            enc,
            F.lit(_SEP + left + sep2 + right + _SEP),
            F.lit(_SEP + left + right + _SEP),
        )
    n_words = F.size(words).cast("bigint")
    n_bounds = (
        (F.length(enc) - F.length(F.replace(enc, F.lit(sep2), F.lit(""))))
        / F.lit(2)
    ).cast("bigint")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        (n_bounds + n_words).alias("n_bpe_tokens"),
        F.md5(enc).alias("enc_md5"),
    )


def tokenizer_fertility(
    docs: "DataFrame",
    stratum_col: str = "lang",
    text_col: str = "text",
) -> "DataFrame":
    """Per-stratum tokenizer-efficiency report — the fertility table every
    multilingual training run consults before fixing a token budget (how
    many bytes/chars one tokenizer token buys per language decides the
    effective per-language capacity; cf. the fertility analyses in the
    XLM-R and ByT5 papers). Returns one row per stratum:

    (stratum, n_docs, total_bytes, total_chars, ws_tokens, bpe_tokens,
    bytes_per_bpe_x1e4, chars_per_ws_x1e4, bpe_per_ws_x1e4)

    The three ratios are ×10⁴ scaled-integer divisions (DECIMAL(38,0)
    products — exact in both engines, zero float accumulation; strata with
    a zero denominator report 0, the engine-wide no-NULL-numerics rule).

    Scale design (100 TB): byte/char/token counts are pure codegen per row
    (``octet_length``/``length``/one pretokenizer ``regexp_extract_all``);
    the ONLY exchange is the map-side-combined groupBy(stratum) whose
    output is strata-count-sized. The ratio window math runs over one row
    per stratum. No Python, no joins, one shuffle.
    """
    t = F.col(text_col)
    per = docs.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length(t)).cast("bigint").alias("total_bytes"),
        F.sum(F.length(t)).cast("bigint").alias("total_chars"),
        F.sum(token_count_col(t)).cast("bigint").alias("ws_tokens"),
        F.sum(token_count_bpe_col(t)).cast("bigint").alias("bpe_tokens"),
    )

    def ratio(num: str, den: str, name: str) -> Column:
        return (
            F.when(
                F.col(den) > 0,
                F.expr(
                    f"CAST((CAST({num} AS DECIMAL(38,0)) * 10000)"
                    f" div CAST({den} AS DECIMAL(38,0)) AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("bigint"))
            .alias(name)
        )

    return per.select(
        stratum_col,
        "n_docs",
        "total_bytes",
        "total_chars",
        "ws_tokens",
        "bpe_tokens",
        ratio("total_bytes", "bpe_tokens", "bytes_per_bpe_x1e4"),
        ratio("total_chars", "ws_tokens", "chars_per_ws_x1e4"),
        ratio("bpe_tokens", "ws_tokens", "bpe_per_ws_x1e4"),
    )


def tokenizer_fertility_sql(
    stratum_col: str = "lang",
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`tokenizer_fertility` — identical counting
    semantics (strlen = bytes, length = chars, same pretokenizer regex) and
    HUGEINT integer division where Spark uses DECIMAL(38,0)."""
    ws_tok = (
        "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '[ \\t\\r\\n]+')) END AS BIGINT)"
    )
    bpe_tok = (
        "CAST(CASE WHEN text IS NULL THEN 0 "
        f"ELSE len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) END AS BIGINT)"
    )
    rat = (
        lambda num, den, name: f"CAST(CASE WHEN {den} > 0 THEN "
        f"(CAST({num} AS HUGEINT) * 10000) // CAST({den} AS HUGEINT) "
        f"ELSE 0 END AS BIGINT) AS {name}"
    )
    return f"""
WITH per AS (
  SELECT {stratum_col}, COUNT(*) AS n_docs,
         CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
         CAST(SUM(length(text)) AS BIGINT) AS total_chars,
         CAST(SUM({ws_tok}) AS BIGINT) AS ws_tokens,
         CAST(SUM({bpe_tok}) AS BIGINT) AS bpe_tokens
  FROM {table} GROUP BY {stratum_col}
)
SELECT {stratum_col}, n_docs, total_bytes, total_chars, ws_tokens, bpe_tokens,
       {rat('total_bytes', 'bpe_tokens', 'bytes_per_bpe_x1e4')},
       {rat('total_chars', 'ws_tokens', 'chars_per_ws_x1e4')},
       {rat('bpe_tokens', 'ws_tokens', 'bpe_per_ws_x1e4')}
FROM per
""".strip()
