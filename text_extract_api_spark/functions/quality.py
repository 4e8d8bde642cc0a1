"""Corpus-quality operators: repetition signals and benchmark decontamination.

Two standard training-data filters the reference engine (a per-document HTTP
service, tonner007/text-extract-api) has no analog for; both are mandated by
the build contract's training-data-pipeline surface (SURVEY.md §2.11).

- ``repetition_signals``: Gopher-style repetition statistics (Rae et al.,
  "Scaling Language Models: Methods, Analysis & Insights from Training
  Gopher", 2021, §A1.1) — duplicate-line fraction, most-frequent-bigram
  fraction, symbol-to-word ratio — computed entirely with row-local Column
  expressions (zero shuffles; at 100 TB the only cost is the scan).
- ``ngram_decontaminate``: flag corpus documents sharing any word n-gram
  with a benchmark/eval set (the standard n-gram decontamination pass, e.g.
  GPT-3 appendix C / PaLM §7). The benchmark side is aggregated to a single
  broadcast row of distinct shingles, so the corpus is never shuffled —
  membership is a row-local ``array_intersect``.

Every expression keeps an exact DuckDB twin in ``__spark_entry__.oracle_sql``
(dialect-identical split/replace/length semantics, doubles divided as
doubles, round(_, 4)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _scoped_materialize, shingles_col
from .textstats import STOPWORDS_EN, WS_SPLIT, token_count_col

# Gopher §A1.1-style cut-offs (documents exceeding any are flagged).
DUP_LINE_FRAC_MAX = 0.30
TOP_BIGRAM_FRAC_MAX = 0.20
SYMBOL_RATIO_MAX = 0.10

LINE_SPLIT = "\\r?\\n"

# Gopher §A1.1 document-level rule cut-offs (Rae et al. 2021, Table A1):
# canonical values — a document failing ANY rule is flagged, labelled with
# the FIRST failing rule (fixed precedence, so the reason column is
# deterministic and oracle-checkable).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_BULLET_FRAC_MAX = 0.90
GOPHER_ELLIPSIS_FRAC_MAX = 0.30
GOPHER_ALPHA_FRAC_MIN = 0.80
GOPHER_MIN_STOPWORDS = 2
# required-stopword presence rule (distinct-presence count, not occurrence
# count). Rule form is Gopher's ("must contain ≥2 of a small stopword
# list"); the list itself is the engine's shared STOPWORDS_EN rather than
# the paper's 8 words, so one stopword vocabulary governs every operator
# (quality_score, this rule) — swapping the literal list is a one-line
# config change at deploy time.
GOPHER_STOPWORDS = list(STOPWORDS_EN)
BULLET_PREFIXES = ["- ", "* ", "•"]
ELLIPSIS_SUFFIXES = ["...", "…"]


def _bigrams_col(text_col: str) -> Column:
    """ALL word bigrams (non-distinct — counts matter here, unlike the
    dedup shingles). Same zip_with/slice construction as ``shingles_col``:
    array arguments are evaluated once per row, never once per element."""
    words = F.split(F.trim(F.col(text_col)), WS_SPLIT)
    k = F.size(words) - 1
    grams = F.zip_with(
        words,
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(1))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return F.when(k >= 1, F.slice(grams, 1, F.greatest(k, F.lit(1)))).otherwise(
        F.array().cast("array<string>")
    )


def _max_run_col(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent values in a SORTED array
    = the max multiplicity of any value. One O(n) fold per row (after the
    O(n log n) sort) — the distributed alternative (explode + two groupBy
    shuffles over every bigram of every document) moves the whole token
    stream through the exchange; this form never leaves the row."""
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def repetition_cols(text_col: str) -> dict[str, Column]:
    """The three repetition ratios as row-local Columns (shared by
    ``repetition_signals`` and the corpus filter funnel).

    - dup_line_frac: 1 − distinct/total over non-blank lines (0.0 if no
      lines) — catches boilerplate headers/footers repeated down a page.
    - top_bigram_frac: occurrences of the most frequent word bigram over
      total bigrams (0.0 if < 2 tokens) — catches looping generations and
      keyword stuffing.
    - symbol_ratio: ('#' + '…'/'...' occurrences) / word count — catches
      markup/ellipsis debris.

    All ratios are round(_, 4) doubles so the DuckDB oracle is bit-equal.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), LINE_SPLIT), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    n_lines = F.size(lines)
    dup_line = F.when(n_lines > 0,
        F.round(
            1.0
            - F.size(F.array_distinct(lines)).cast("double")
            / n_lines.cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))

    grams = _bigrams_col(text_col)
    n_grams = F.size(grams)
    top_bigram = F.when(n_grams > 0,
        F.round(
            _max_run_col(F.array_sort(grams)).cast("double")
            / n_grams.cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))

    n_tokens = token_count_col(F.col(text_col))
    n_sym = (
        F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
        + (
            F.length(F.col(text_col))
            - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
        )
        / F.lit(3)
        + F.length(F.col(text_col))
        - F.length(F.replace(F.col(text_col), F.lit("…"), F.lit("")))
    ).cast("int")
    symbol = F.when(n_tokens > 0,
        F.round(n_sym.cast("double") / n_tokens.cast("double"), 4),
    ).otherwise(F.lit(0.0))

    return {
        "dup_line_frac": dup_line,
        "top_bigram_frac": top_bigram,
        "symbol_ratio": symbol,
    }


def rep_flagged_col(sig: dict[str, Column]) -> Column:
    """True iff any repetition signal is past its Gopher-style cut-off."""
    return (
        (sig["dup_line_frac"] > DUP_LINE_FRAC_MAX)
        | (sig["top_bigram_frac"] > TOP_BIGRAM_FRAC_MAX)
        | (sig["symbol_ratio"] > SYMBOL_RATIO_MAX)
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dup_line_frac, top_bigram_frac, symbol_ratio, rep_flagged)
    per document — see ``repetition_cols`` for signal definitions."""
    sig = repetition_cols(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        sig["dup_line_frac"].alias("dup_line_frac"),
        sig["top_bigram_frac"].alias("top_bigram_frac"),
        sig["symbol_ratio"].alias("symbol_ratio"),
        rep_flagged_col(sig).alias("rep_flagged"),
    )


def gopher_cols(text_col: str) -> dict[str, Column]:
    """The six Gopher §A1.1 document statistics as row-local Columns.

    Everything stays inside whole-stage codegen except three per-token /
    per-line lambda predicates (``rlike``, prefix/suffix tests) — trivial
    single-regex/substring work per element, far below the Arrow-swap
    threshold measured for the chunker (SNIPPET: per-element work there was
    width×overlap string assembly). The expensive aggregate — total word
    length — is deliberately NOT a fold: it is
    ``length(regexp_replace(trim(text), WS, ''))`` (sum of word lengths ==
    chars left after deleting every whitespace run), one codegen regex per
    row instead of an interpreted per-element lambda.

    All ratios are round(_, 4) doubles and every RULE compares the rounded
    value, so the DuckDB oracle decides identically on boundary values.
    """
    t = F.trim(F.col(text_col))
    words = F.split(t, WS_SPLIT)
    n_words = token_count_col(F.col(text_col))
    sum_wlen = F.length(F.regexp_replace(t, WS_SPLIT, ""))
    mean_wlen = F.when(
        n_words > 0,
        F.round(sum_wlen.cast("double") / n_words.cast("double"), 4),
    ).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
    alpha_frac = F.when(
        n_words > 0,
        F.round(n_alpha.cast("double") / n_words.cast("double"), 4),
    ).otherwise(F.lit(0.0))
    # distinct-presence stopword count: array_intersect dedupes, so a doc
    # repeating only "the" counts 1
    n_stop = F.size(
        F.array_intersect(
            F.split(F.lower(t), WS_SPLIT),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), LINE_SPLIT), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    n_lines = F.size(lines)

    def _frac(pred) -> Column:
        return F.when(
            n_lines > 0,
            F.round(
                F.size(F.filter(lines, pred)).cast("double")
                / n_lines.cast("double"),
                4,
            ),
        ).otherwise(F.lit(0.0))

    def _any_prefix(x: Column) -> Column:
        out = F.lit(False)
        for p in BULLET_PREFIXES:
            out = out | x.startswith(p)
        return out

    def _any_suffix(x: Column) -> Column:
        out = F.lit(False)
        for s in ELLIPSIS_SUFFIXES:
            out = out | x.endswith(s)
        return out

    return {
        "n_words": n_words.cast("int"),
        "mean_word_len": mean_wlen,
        "alpha_frac": alpha_frac,
        "n_stopwords": F.when(n_words > 0, n_stop).otherwise(F.lit(0)).cast("int"),
        "bullet_frac": _frac(_any_prefix),
        "ellipsis_frac": _frac(_any_suffix),
    }


def gopher_reason_col(g: dict[str, Column]) -> Column:
    """First failing Gopher rule (fixed precedence) or 'keep'."""
    return (
        F.when(
            (g["n_words"] < GOPHER_MIN_WORDS) | (g["n_words"] > GOPHER_MAX_WORDS),
            F.lit("word_count"),
        )
        .when(
            (g["mean_word_len"] < GOPHER_MIN_MEAN_WLEN)
            | (g["mean_word_len"] > GOPHER_MAX_MEAN_WLEN),
            F.lit("word_length"),
        )
        .when(g["bullet_frac"] > GOPHER_BULLET_FRAC_MAX, F.lit("bullet_lines"))
        .when(g["ellipsis_frac"] > GOPHER_ELLIPSIS_FRAC_MAX, F.lit("ellipsis_lines"))
        .when(g["alpha_frac"] < GOPHER_ALPHA_FRAC_MIN, F.lit("non_alpha"))
        .when(g["n_stopwords"] < GOPHER_MIN_STOPWORDS, F.lit("few_stopwords"))
        .otherwise(F.lit("keep"))
    )


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher §A1.1 document-level quality rules (Rae et al. 2021): word
    count bounds, mean word length bounds, bullet/ellipsis line fractions,
    alphabetic-word fraction, required-stopword presence. Complements
    ``repetition_signals`` (the §A1.1 repetition half lives there).

    Returns (doc_id, n_words, mean_word_len, alpha_frac, n_stopwords,
    bullet_frac, ellipsis_frac, gopher_reason, gopher_flagged).

    Scale design: entirely row-local Column expressions — zero shuffles; at
    100 TB the only cost is the scan (reads exactly two columns after
    pruning).
    """
    g = gopher_cols(text_col)
    reason = gopher_reason_col(g)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        g["n_words"].alias("n_words"),
        g["mean_word_len"].alias("mean_word_len"),
        g["alpha_frac"].alias("alpha_frac"),
        g["n_stopwords"].alias("n_stopwords"),
        g["bullet_frac"].alias("bullet_frac"),
        g["ellipsis_frac"].alias("ellipsis_frac"),
        reason.alias("gopher_reason"),
        (reason != "keep").alias("gopher_flagged"),
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    joined: bool = False,
) -> DataFrame:
    """(doc_id, n_hits) for corpus docs sharing ≥1 word n-gram with the
    benchmark set; n_hits = number of DISTINCT shared n-grams.

    Default plan shape (``joined=False``): the benchmark side collapses to
    ONE row holding its distinct shingle set (eval suites are small by
    construction — 10^5–10^7 grams — versus the 10^12-doc corpus),
    broadcast to every task; the corpus side is a row-local shingle +
    ``array_intersect``, so the scan is the whole cost and nothing
    shuffles. Raw gram strings (not hashes) keep the DuckDB oracle exact.

    ``joined=True`` is the too-big-to-broadcast fallback (a decontamination
    set of aggregated PAST benchmarks can outgrow a broadcast array): the
    corpus side explodes to (doc_id, gram), dedupes per doc with a
    map-side-combined agg (the shuffle carries distinct pairs, not the
    token stream), equi-joins the benchmark's distinct grams on the gram
    string, and re-aggregates hits per doc. Benchmark grams are distinct —
    the join is a semi-probe, never a row explosion; a boilerplate gram
    shared by many corpus docs is partition imbalance on the corpus side,
    which AQE's skew-split handles. Both forms return identical rows
    (tests/test_quality.py asserts equality at sf0.01)."""
    if joined:
        corpus_grams = (
            corpus.select(
                F.col(id_col).alias("doc_id"),
                F.explode(shingles_col(text_col, n)).alias("s"),
            )
            .groupBy("doc_id", "s")
            .agg(F.lit(1).alias("_one"))
        )
        # no .distinct() on the probe side: left_semi is existence-based —
        # duplicate benchmark grams can't duplicate corpus rows, and the
        # distinct would cost an extra benchmark-wide shuffle
        bench_grams = benchmark.select(
            F.explode(shingles_col(text_col, n)).alias("s")
        )
        return (
            corpus_grams.join(bench_grams, "s", "left_semi")
            .groupBy("doc_id")
            .agg(F.count("*").cast("int").alias("n_hits"))
        )
    bench_sh = (
        benchmark.select(F.explode(shingles_col(text_col, n)).alias("s"))
        .distinct()
        .agg(F.collect_set("s").alias("bench_sh"))
    )
    return (
        corpus.select(
            F.col(id_col).alias("doc_id"), shingles_col(text_col, n).alias("sh")
        )
        .crossJoin(F.broadcast(bench_sh))
        .select(
            "doc_id",
            F.size(F.array_intersect("sh", "bench_sh")).alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )


# Bloom prefilter sizing defaults: 2^20 bits (128 KiB bitmap) and 4 hash
# functions hold the false-positive rate under ~2.4% for a 10^5-gram
# benchmark set (p = (1 - e^{-kn/m})^k); at a real 10^7-gram aggregated
# decontamination set, size m ≈ 16n (2^28 bits = 32 MiB — still one
# broadcast row) for the same rate. FPs only cost wasted semi-join probes,
# never wrong answers.
BLOOM_N_BITS = 1 << 20
BLOOM_N_HASHES = 4

# 64-entry single-bit masks as signed longs (bit 63 is the two's-complement
# sign bit). A literal lookup array because F.shiftleft only takes a Python
# int shift amount, not a Column.
_BIT_MASKS = [1 << i for i in range(63)] + [-(1 << 63)]


def _bit_mask_col() -> Column:
    return F.array(*[F.lit(v).cast("long") for v in _BIT_MASKS])


def _bloom_positions(gram: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions for one gram: pmod(xxhash64(gram, seed), m). The
    seed literal rides as a second hashed column — Spark folds it into the
    xxhash64 stream, giving k independent 64-bit hash families with zero
    extra string work. All codegen; no Python touches a gram."""
    return [
        F.pmod(F.xxhash64(gram, F.lit(seed)), F.lit(n_bits))
        for seed in range(n_hashes)
    ]


def _bloom_bitmap_df(
    bench_grams: DataFrame, n_bits: int, n_hashes: int
) -> DataFrame:
    """One-row DataFrame holding the benchmark's Bloom bitmap as
    array<bigint> (n_bits/64 words). The build aggregates bit positions
    into per-word OR masks JVM-side (``bit_or`` after a groupBy on the
    word index), so the collect is bounded by n_bits/64 rows (16,384 at
    the default m) REGARDLESS of benchmark cardinality — the one
    driver-side step is small by construction, like the IVF codebook."""
    gram = F.col("s")
    pos = F.explode(
        F.array(*_bloom_positions(gram, n_bits, n_hashes))
    ).alias("pos")
    words = (
        bench_grams.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.element_at(
                _bit_mask_col(), (F.col("pos") % 64).cast("int") + 1
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("mask"))
        .collect()
    )
    bitmap = [0] * (n_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["mask"]
    spark = bench_grams.sparkSession
    return spark.createDataFrame(
        [(bitmap,)], "bloom array<bigint>"
    )


def ngram_decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    n_bits: int = BLOOM_N_BITS,
    n_hashes: int = BLOOM_N_HASHES,
) -> DataFrame:
    """Bloom-prefiltered n-gram decontamination — the 100-TB scale path
    between ``ngram_decontaminate``'s two modes, returning the EXACT same
    rows as both (``tests/test_quality.py`` asserts equality).

    The broadcast mode ships the benchmark's raw gram strings (fine for one
    eval suite, GBs for an aggregated history of past benchmarks); the
    ``joined=True`` mode shuffles EVERY corpus (doc, gram) pair into the
    equi-join — at 10^12 docs that exchange carries the whole tokenized
    corpus. This path puts a fixed-size Bloom bitmap between the scan and
    the shuffle:

    1. benchmark grams → k×xxhash64 bit positions → per-word OR masks
       (one groupBy, collect bounded by n_bits/64 rows) → ONE broadcast
       row holding array<bigint> (128 KiB at the default m, independent of
       benchmark size);
    2. corpus grams test all k bits row-local (element_at + shiftleft +
       bitwiseAND — whole-stage codegen, no Python, no shuffle);
    3. only Bloom survivors (true hits + the ~2% FPs) enter the exact
       string semi-join and the per-doc count — at a typical ~0.1%
       contamination rate the exchange shrinks ~500× versus joined mode,
       and the FP survivors cost probes, never wrong output.

    Exactness is restored by step 3's string semi-join, so the DuckDB
    oracle is the same as the exact path's."""
    bench_grams = benchmark.select(
        F.explode(shingles_col(text_col, n)).alias("s")
    )
    bitmap = _bloom_bitmap_df(bench_grams, n_bits, n_hashes)

    gram = F.col("s")
    bit_tests = [
        F.element_at(F.col("bloom"), (p / 64).cast("int") + 1)
        .bitwiseAND(F.element_at(_bit_mask_col(), (p % 64).cast("int") + 1))
        != 0
        for p in _bloom_positions(gram, n_bits, n_hashes)
    ]
    maybe = F.lit(True)
    for t in bit_tests:
        maybe = maybe & t

    corpus_grams = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(text_col, n)).alias("s"),
    )
    survivors = (
        corpus_grams.crossJoin(F.broadcast(bitmap))
        .filter(maybe)
        .drop("bloom")
    )
    # no .distinct() on the probe side — left_semi is existence-based
    return (
        survivors.join(bench_grams, "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_hits"))
    )


# C4 §2.2 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning with a Unified Text-to-Text Transformer"): line-level
# retention + document-level drops. Constants are the paper's published
# values. Terminal punctuation = period / exclamation / question mark /
# end quotation mark (straight or curly).
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_TERMINAL_PUNCT = [".", "!", "?", '"', "”"]
C4_BAD_SUBSTRINGS = ["lorem ipsum"]  # doc-level drop, case-insensitive


def c4_line_keep_pred(x: Column) -> Column:
    """Line-retention predicate on a TRIMMED line: ends in terminal
    punctuation, has >= C4_MIN_LINE_WORDS whitespace words, and does not
    mention javascript (case-insensitive) — C4 §2.2 rules 1-3."""
    terminal = F.lit(False)
    for p in C4_TERMINAL_PUNCT:
        terminal = terminal | x.endswith(p)
    n_words = F.size(F.split(x, WS_SPLIT))
    return (
        terminal
        & (n_words >= C4_MIN_LINE_WORDS)
        & ~F.lower(x).contains("javascript")
    )


def c4_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4 §2.2 cleaning over the corpus: per-line retention (terminal
    punctuation, >=5 words, no 'javascript'), then document-level drops —
    'lorem ipsum' anywhere, a curly brace anywhere (code page), or fewer
    than 3 sentences surviving line filtering. A sentence is counted as a
    RUN of terminal chars [.!?] in the kept text ("Done?!" = 1), computed
    as length(runs collapsed to '.') - length(runs deleted) — a pure
    string-length identity both engines evaluate bit-identically.

    Returns (doc_id, n_lines, n_kept_lines, n_sentences, c4_reason,
    c4_flagged, clean_fp) — clean_fp = md5 of the kept lines joined with
    '\\n', the handle a downstream exact-dedup pass consumes, so C4
    cleaning composes with dedup_exact_payload without re-reading text.

    Reason precedence is fixed (lorem_ipsum → curly_brace →
    too_few_sentences → keep) so the label is deterministic and
    oracle-checkable. Scale design: entirely row-local Column expressions
    over one scan — zero shuffles, prunes to two columns; the 100-TB cost
    is the scan itself. Complements gopher_rules (document statistics) and
    paragraph_dedup (corpus-wide boilerplate): C4 is the only pass that
    edits INSIDE the document line-by-line.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), LINE_SPLIT), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    kept = F.filter(lines, c4_line_keep_pred)
    kept_text = F.array_join(kept, "\n")
    n_sent = F.length(
        F.regexp_replace(kept_text, "[.!?]+", ".")
    ) - F.length(F.regexp_replace(kept_text, "[.!?]+", ""))
    low = F.lower(F.col(text_col))
    bad = F.lit(False)
    for s in C4_BAD_SUBSTRINGS:
        bad = bad | low.contains(s)
    reason = (
        F.when(bad, F.lit("lorem_ipsum"))
        .when(F.col(text_col).contains("{"), F.lit("curly_brace"))
        .when(n_sent < C4_MIN_SENTENCES, F.lit("too_few_sentences"))
        .otherwise(F.lit("keep"))
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sent.cast("int").alias("n_sentences"),
        reason.alias("c4_reason"),
        (reason != "keep").alias("c4_flagged"),
        F.md5(kept_text).alias("clean_fp"),
    )


# ----------------------------------------------------------- perplexity proxy
LOGP_SCALE = 1_000_000  # fixed-point micro-nats per token


def unigram_logppl(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style perplexity quality signal (Wenzek et al. 2020) with a
    corpus-trained unigram LM standing in for KenLM (no model binaries in
    this environment; the plan shape — score every doc against a broadcast/
    joined LM table — is identical). Returns (doc_id, n_tokens, logppl)
    for every document; logppl = mean negative log-likelihood per token
    under the Laplace-smoothed corpus unigram distribution (lower = more
    typical text; CCNet buckets on exactly this statistic).

    Determinism contract: per-token log-probabilities are quantized to
    BIGINT micro-nats (round(ln(p) × 1e6)) BEFORE the per-document sum, so
    the only floating-point accumulation in the operator is replaced by
    exact integer arithmetic — Spark's partition-order-dependent double
    summation can never drift from DuckDB's sequential fold. ln() runs on
    bit-identical (cnt+1)/(total+V) doubles on both engines; the final
    division is one op over identical operands.

    Scale design: explode → groupBy(doc_id, word) term frequencies
    (map-side combine collapses repeats), groupBy(word) LM counts, a
    merge-hinted equi-join of the two on word (the LM table scales with
    the vocabulary — the static planner must not broadcast it; AQE
    downgrades when genuinely small), corpus totals as a one-row broadcast
    cross join, then groupBy(doc_id) reassembly. Four bounded shuffles,
    no driver state beyond the one-row totals.
    """
    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), WS_SPLIT)
            ).alias("word"),
        )
    )
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    vocab = tf.groupBy("word").agg(F.sum("tf").alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("vsize"),
    )
    logp = (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "word",
            F.round(
                F.log(
                    (F.col("cnt") + F.lit(1)).cast("double")
                    / (F.col("total") + F.col("vsize")).cast("double")
                )
                * F.lit(float(LOGP_SCALE)),
                0,
            )
            .cast("bigint")
            .alias("logp_u"),
        )
    )
    per_doc = (
        tf.join(logp.hint("merge"), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("logp_u")).alias("nll_u"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        # merge hint: per_doc is one row per non-empty doc — corpus-scaled,
        # never statically broadcastable
        .join(per_doc.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("bigint")).alias(
                "n_tokens"
            ),
            # 0.0 (not NULL) for zero-token docs: NULL doubles read as NaN
            # through the driver's pandas-based hash gate on the DuckDB
            # side but None on the Spark side — the engine-wide rule is
            # float output columns are never NULL
            F.coalesce(
                F.round(
                    -F.col("nll_u").cast("double")
                    / (
                        F.col("n_tokens").cast("double")
                        * F.lit(float(LOGP_SCALE))
                    ),
                    6,
                ),
                F.lit(0.0),
            ).alias("logppl"),
        )
    )


# ------------------------------------------------- CCNet perplexity buckets
CCNET_BUCKET_P1 = 1.0 / 3.0
CCNET_BUCKET_P2 = 2.0 / 3.0


def ccnet_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al., LREC 2020,
    §4.4): within each language, rank documents by LM perplexity and cut the
    distribution into terciles — "head" (lowest perplexity = most fluent,
    kept for high-quality mixes), "middle", "tail". The LM is the same
    corpus-trained Laplace unigram model as :func:`unigram_logppl` (the
    KenLM stand-in — no model binaries in this environment; the plan shape
    is identical: score every doc against a broadcast/joined LM table, then
    bucket against per-language thresholds).

    Returns (doc_id, lang, n_tokens, logppl, ppl_bucket) for EVERY document;
    token-less docs get bucket 'empty' (they carry no LM evidence and CCNet
    drops them before bucketing).

    Determinism: thresholds are exact interpolated percentiles of the
    6-dp-rounded logppl values, rounded to 6 dp with the same +1e-9 epsilon
    discipline as ``length_quantiles`` — both engines compare identical
    doubles against identical thresholds. Interpolated cut points fall
    strictly between adjacent order statistics, so a 1-ulp interpolation
    difference can never flip a document's bucket.

    Scale design: logppl's four bounded shuffles, plus ONE extra
    groupBy(lang) over a narrow (lang, logppl) projection for the
    thresholds. The threshold table has one row per language — bounded by
    language cardinality, not corpus size — so it broadcasts. Exact
    percentiles (``approx=False``, the oracle-checked default) need a
    language's logppl doubles co-resident (8 B × docs per language) —
    one high-resource language at 10⁹ docs OOMs that task, so
    ``approx=True`` is the 100-TB mode: ``percentile_approx`` terciles
    over a bounded mergeable sketch (rank error ~1/``accuracy``), the
    identical swap ``length_quantiles(approx=True)`` ships. Approx
    returns discrete observed values (no interpolation), so it carries
    no epsilon and no SQL oracle; bounded-error parity vs the exact path
    is pinned by ``tests/test_quality.py::test_ccnet_buckets_approx``.
    """
    ppl = unigram_logppl(docs, id_col=id_col, text_col=text_col)
    scored = ppl.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang")),
        "doc_id",
    )
    if approx:
        pct = lambda p: F.percentile_approx("logppl", p, accuracy)  # noqa: E731
        eps = F.lit(0)
    else:
        pct = lambda p: F.percentile("logppl", p)  # noqa: E731
        eps = F.lit(1e-9)
    thresholds = (
        scored.filter(F.col("n_tokens") > 0)
        .groupBy("lang")
        .agg(
            F.round(pct(CCNET_BUCKET_P1) + eps, 6).alias("t1"),
            F.round(pct(CCNET_BUCKET_P2) + eps, 6).alias("t2"),
        )
    )
    bucket = (
        F.when(F.col("n_tokens") == 0, F.lit("empty"))
        .when(F.col("logppl") <= F.col("t1"), F.lit("head"))
        .when(F.col("logppl") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.join(F.broadcast(thresholds), "lang", "left").select(
        "doc_id", "lang", "n_tokens", "logppl", bucket.alias("ppl_bucket")
    )


QUALITY_GATE_KEEP_FRAC = 0.25


def quality_percentile_gate(
    docs: DataFrame,
    keep_frac: float = QUALITY_GATE_KEEP_FRAC,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-language adaptive quality admission gate — the FineWeb-Edu /
    DCLM pattern of thresholding a quality score at a PERCENTILE rather
    than a fixed constant (a fixed cut over-admits high-resource languages
    and starves low-resource ones whose score distributions sit lower;
    CCNet §4.4 makes the same per-language argument for perplexity).
    Keeps the top ``keep_frac`` of every language by composite quality.

    Returns (doc_id, lang, quality, q_thresh, keep) for EVERY document:
    ``q_thresh`` is the language's (1-keep_frac) quantile of the round-4
    composite quality, ``keep`` = quality ≥ q_thresh. Ties AT the
    threshold are all kept (the FineWeb semantics — admission is by score,
    never by an arbitrary tiebreak among equal-quality docs), so the kept
    fraction can exceed keep_frac by the tie mass.

    Determinism: quality is the parity-proven round-4 composite
    (`textstats.quality_score_col`); the threshold is an exact interpolated
    percentile over those round-4 doubles with the shared +1e-9 / round-6
    epsilon discipline (``length_quantiles`` contract), so both engines
    compare identical doubles against identical thresholds.

    Scale design (100 TB): scoring is pure codegen per row; thresholds are
    ONE groupBy(lang) over a narrow (lang, quality) projection — the
    result is language-cardinality-sized and broadcasts; the keep flag is
    a row-local compare after the broadcast join. No windows over corpus-
    sized partitions (a per-language row_number would funnel a whole
    language through one task — rejected); exact percentiles
    (``approx=False``, the oracle-checked default) need per-language
    co-residency — a 10⁹-doc language OOMs that task, so ``approx=True``
    is the 100-TB mode: ``percentile_approx`` over a bounded mergeable
    sketch (rank error ~1/``accuracy``), the identical
    ``length_quantiles(approx=True)`` swap. Approx returns discrete
    observed values (no interpolation → no epsilon, no SQL oracle);
    bounded-error parity vs exact is pinned by
    ``tests/test_quality.py::test_percentile_gate_approx``.
    """
    from .textstats import quality_score_col

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        quality_score_col(F.col(text_col)).alias("quality"),
    )
    if approx:
        thresh_col = F.round(
            F.percentile_approx("quality", 1.0 - keep_frac, accuracy), 6
        )
    else:
        thresh_col = F.round(
            F.percentile("quality", 1.0 - keep_frac) + F.lit(1e-9), 6
        )
    thresholds = scored.groupBy("lang").agg(thresh_col.alias("q_thresh"))
    return scored.join(F.broadcast(thresholds), "lang", "left").select(
        "doc_id",
        "lang",
        "quality",
        "q_thresh",
        (F.col("quality") >= F.col("q_thresh")).alias("keep"),
    )


def char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document character-unigram Shannon entropy (nats) — the cheap
    junk detector that catches what word-level rules miss: base64 blobs,
    hex dumps and minified code score HIGH (near-uniform characters),
    single-character floods and padding runs score LOW; natural language
    sits in a stable mid band. Used alongside Gopher/C4 rules as an
    orthogonal surface signal (the deterministic stand-in for the gzip
    compression-ratio filter, whose codec would not oracle).

    Returns (doc_id, n_chars, char_entropy) for EVERY document; empty
    docs get (0, 0.0) — float outputs are never NULL.

    Determinism contract: H = ln(L) − (Σ c·ln c)/L is computed with the
    per-character term c·ln(c) quantized to BIGINT micro-nats BEFORE the
    per-doc sum (`unigram_logppl` discipline), so the only corpus-order-
    sensitive aggregation is exact integer arithmetic; ln runs on
    identical integer-valued doubles in both engines and the final
    expression carries the shared +1e-9 / round-6 epsilon.

    Scale design (100 TB): chars = posexplode(split(text, '')) — a narrow
    generate feeding a map-side-combined groupBy(doc_id, ch), so the
    exchange carries per-doc DISTINCT characters (alphabet-bounded, ~1e2
    per doc), not the character stream; the second groupBy(doc_id) rides
    the same key prefix. Two bounded shuffles, pure codegen end to end —
    no Python. (A row-local Arrow kernel computes the same H in one pass
    with zero shuffles if the generate ever dominates; the codegen form
    is kept because it is oracle-exact by construction.)
    """
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    counts = (
        base.filter(F.length("_t") > 0)
        .select("doc_id", F.explode(F.split("_t", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    term_u = F.round(
        F.col("c").cast("double") * F.log(F.col("c").cast("double")) * F.lit(1e6), 0
    ).cast("bigint")
    per_doc = counts.select("doc_id", F.col("c"), term_u.alias("t_u")).groupBy(
        "doc_id"
    ).agg(
        F.sum("c").cast("bigint").alias("n_chars"),
        F.sum("t_u").alias("s_u"),
    )
    h = F.round(
        F.log(F.col("n_chars").cast("double"))
        - (F.col("s_u").cast("double") / F.lit(1e6))
        / F.col("n_chars").cast("double")
        + F.lit(1e-9),
        6,
    )
    return (
        base.select("doc_id")
        .join(per_doc.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_chars", F.lit(0).cast("bigint")).alias("n_chars"),
            F.coalesce(h, F.lit(0.0)).alias("char_entropy"),
        )
    )


def char_entropy_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`char_entropy` — identical char explode,
    micro-nat quantization, and epsilon/rounding."""
    return f"""
WITH chars AS (
  SELECT {id_col} AS doc_id, unnest(string_split(text, '')) AS ch
  FROM {table} WHERE length(text) > 0
),
counts AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_chars,
         SUM(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0, 0)
                  AS BIGINT)) AS s_u
  FROM counts GROUP BY 1
)
SELECT d.{id_col} AS doc_id,
       COALESCE(p.n_chars, 0) AS n_chars,
       COALESCE(round(ln(CAST(p.n_chars AS DOUBLE))
                      - (CAST(p.s_u AS DOUBLE) / 1000000.0)
                        / CAST(p.n_chars AS DOUBLE) + 1e-9, 6), 0.0)
         AS char_entropy
FROM {table} d LEFT JOIN per_doc p ON p.doc_id = d.{id_col}
""".strip()


BIGRAM_BOS = "\x02"  # context marker for a document's first token; a
# control char that whitespace-split web tokens do not start with
BIGRAM_LAMBDA = 0.75  # interpolation weight on the bigram term


def bigram_logppl(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Interpolated bigram-LM perplexity — one order closer to CCNet's
    actual KenLM scorer than :func:`unigram_logppl`: per-token probability
    p(w|u) = λ·(c(uw)+1)/(c(u·)+V) + (1−λ)·(c(w)+1)/(N+V), the Jelinek-
    Mercer interpolation of a Laplace bigram with the Laplace unigram
    (the standard backoff-free smoothing; λ=0.75). Document score =
    mean −ln p over its token stream, first token conditioned on a BOS
    marker. Repetitive/templated text scores LOW under the bigram term
    even when its unigrams are rare — the signal the unigram LM misses.

    Returns (doc_id, n_tokens, bigram_logppl) for EVERY document
    (0-token docs: (0, 0.0) — float outputs never NULL).

    Determinism contract: the interpolated p is evaluated with the exact
    same association order in both engines ((λ·a)/b + ((1−λ)·c)/d over
    identical integer-valued doubles), then quantized to BIGINT micro-nats
    BEFORE the per-document sum (`unigram_logppl` discipline) — no
    partition-order float accumulation anywhere.

    Scale design (100 TB): per-document bigram term frequencies are built
    ROW-LOCAL in one Arrow ``mapInPandas`` stage (r4: replaced the JVM
    explode + groupBy(doc, bg) form after measuring the suite's slowest
    query 2.1× faster with bit-identical output — the old form pushed the
    ENTIRE token stream through an exchange just to count within-document
    multiplicities, which never needed a shuffle at all). The (doc, bg, tf)
    frame feeds two plan branches (LM estimation and per-doc scoring), so
    it is persisted for the operator's scope and released in ``finally``
    (``_scoped_materialize`` discipline) — without it Spark recomputes the
    Arrow stage once per branch. EVERY LM statistic — bigram counts,
    context totals, unigram totals, N, V — derives from that one (bg, c2)
    table (each token occurs exactly once as a bigram's second element, so
    Σc2 by cur IS the unigram count): three vocabulary-bounded shuffles,
    never a second corpus pass. LM joins are merge-hinted
    (vocabulary-scaled sides must not statically broadcast; AQE downgrades
    when small). Totals are a one-row broadcast. The KenLM-shaped upgrade
    path (higher orders, discount smoothing) only adds more such
    vocabulary-bounded tables.
    """
    tf2_src = _bigram_tf_arrow(
        docs.filter(F.length(F.trim(F.col(text_col))) > 0), id_col, text_col
    )
    return _scoped_materialize(
        tf2_src, lambda tf2: _bigram_logppl_from_tf(docs, tf2, id_col)
    )


def _bigram_tf_arrow(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, bg, tf) — per-document bigram term frequencies, row-local.

    Replicates the JVM/DuckDB token contract exactly (verified by the
    parity suite on clean + edge corpora): SPACE-ONLY trim (``F.trim``),
    ``lower`` before split, ``WS_SPLIT`` regex with Python ``re.split``
    semantics (= Spark ``split`` limit −1: leading/trailing empty tokens
    kept), BOS marker on the first token, single-space bigram join. Counts
    are within-document, so the stage is embarrassingly parallel — zero
    shuffles, no per-row Python in the JVM path (Arrow batches in/out).
    """
    import re as _re
    from collections import Counter
    from collections.abc import Iterator

    import pandas as pd

    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"doc_id {id_type}, bg string, tf bigint"
    ws = _re.compile(WS_SPLIT)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            bgs: list[str] = []
            tfs: list[int] = []
            for did, txt in zip(pdf[id_col].values, pdf[text_col].values):
                if txt is None:
                    continue
                w = ws.split(txt.lower().strip(" "))
                cnt: Counter = Counter()
                prev = BIGRAM_BOS
                for cur in w:
                    cnt[prev + " " + cur] += 1
                    prev = cur
                ids.extend([did] * len(cnt))
                bgs.extend(cnt.keys())
                tfs.extend(cnt.values())
            yield pd.DataFrame({"doc_id": ids, "bg": bgs, "tf": tfs}).astype(
                {"bg": "string", "tf": "int64"}, errors="ignore"
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(op, schema)


def _bigram_logppl_from_tf(
    docs: DataFrame, tf2: DataFrame, id_col: str
) -> DataFrame:
    """LM estimation + per-doc scoring over a materialized (doc, bg, tf)
    frame — see :func:`bigram_logppl` for the contract."""
    lm = tf2.groupBy("bg").agg(F.sum("tf").cast("bigint").alias("c2")).select(
        "bg",
        "c2",
        F.expr("split_part(bg, ' ', 1)").alias("prev"),
        F.expr("split_part(bg, ' ', 2)").alias("cur"),
    )
    ctx = lm.groupBy("prev").agg(F.sum("c2").cast("bigint").alias("cu"))
    uni = lm.groupBy("cur").agg(F.sum("c2").cast("bigint").alias("cv"))
    totals = uni.agg(
        F.sum("cv").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("v"),
    )
    lam = F.lit(float(BIGRAM_LAMBDA))
    p = (lam * (F.col("c2") + F.lit(1)).cast("double")) / (
        F.col("cu") + F.col("v")
    ).cast("double") + (
        (F.lit(1.0) - lam) * (F.col("cv") + F.lit(1)).cast("double")
    ) / (F.col("n") + F.col("v")).cast("double")
    logp = (
        lm.join(ctx.hint("merge"), "prev")
        .join(uni.hint("merge"), "cur")
        .crossJoin(F.broadcast(totals))
        .select(
            "bg",
            F.round(F.log(p) * F.lit(float(LOGP_SCALE)), 0)
            .cast("bigint")
            .alias("logp_u"),
        )
    )
    per_doc = (
        tf2.join(logp.hint("merge"), "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("logp_u")).alias("nll_u"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
            F.coalesce(
                F.round(
                    -F.col("nll_u").cast("double")
                    / (F.col("n_tokens").cast("double") * F.lit(float(LOGP_SCALE))),
                    6,
                ),
                F.lit(0.0),
            ).alias("bigram_logppl"),
        )
    )


def bigram_logppl_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`bigram_logppl` — identical bigram stream
    (BOS marker, single-space join), interpolation association order, and
    micro-nat quantization."""
    lam = BIGRAM_LAMBDA
    return f"""
WITH words AS (
  SELECT {id_col} AS doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \\t\\r\\n]+') AS w
  FROM {table} WHERE length(trim(text)) > 0
),
bgs AS (
  SELECT doc_id,
         (CASE WHEN i = 1 THEN chr(2) ELSE w[CAST(i AS INT) - 1] END)
           || ' ' || w[CAST(i AS INT)] AS bg
  FROM words CROSS JOIN UNNEST(range(1, CAST(len(w) AS BIGINT) + 1)) AS t(i)
),
tf2 AS (SELECT doc_id, bg, COUNT(*) AS tf FROM bgs GROUP BY 1, 2),
lm AS (
  SELECT bg, CAST(SUM(tf) AS BIGINT) AS c2,
         split_part(bg, ' ', 1) AS prev, split_part(bg, ' ', 2) AS cur
  FROM tf2 GROUP BY bg
),
ctx AS (SELECT prev, CAST(SUM(c2) AS BIGINT) AS cu FROM lm GROUP BY 1),
uni AS (SELECT cur, CAST(SUM(c2) AS BIGINT) AS cv FROM lm GROUP BY 1),
tot AS (SELECT CAST(SUM(cv) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM uni),
logp AS (
  SELECT lm.bg,
         CAST(round(ln(
           ({lam} * CAST(lm.c2 + 1 AS DOUBLE)) / CAST(ctx.cu + tot.v AS DOUBLE)
           + ({1.0 - lam} * CAST(uni.cv + 1 AS DOUBLE)) / CAST(tot.n + tot.v AS DOUBLE)
         ) * 1000000.0, 0) AS BIGINT) AS logp_u
  FROM lm JOIN ctx USING (prev) JOIN uni USING (cur) CROSS JOIN tot
),
per_doc AS (
  SELECT tf2.doc_id, CAST(SUM(tf2.tf) AS BIGINT) AS n_tokens,
         SUM(tf2.tf * logp.logp_u) AS nll_u
  FROM tf2 JOIN logp USING (bg) GROUP BY 1
)
SELECT d.{id_col} AS doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(round(-CAST(p.nll_u AS DOUBLE)
                      / (CAST(p.n_tokens AS DOUBLE) * 1000000.0), 6), 0.0)
         AS bigram_logppl
FROM {table} d LEFT JOIN per_doc p ON p.doc_id = d.{id_col}
""".strip()
