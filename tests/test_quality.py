"""Repetition-signal and n-gram-decontamination tests (functions/quality.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from text_extract_api_spark.functions.quality import (
    ngram_decontaminate,
    repetition_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sig(spark, text):
    [r] = repetition_signals(_docs(spark, [(1, text)])).collect()
    return r


def test_duplicate_lines_fraction(spark):
    # 4 non-blank lines, 2 distinct -> 1 - 2/4 = 0.5 (> 0.30 cut-off)
    r = _sig(spark, "header\nbody text here\nheader\nbody text here\n\n")
    assert r.dup_line_frac == 0.5
    assert r.rep_flagged is True


def test_top_bigram_fraction_looping_text(spark):
    # bigrams: [the cat, cat the, the cat, cat the, the cat] -> top 3/5
    r = _sig(spark, "the cat the cat the cat")
    assert r.top_bigram_frac == 0.6
    assert r.rep_flagged is True


def test_symbol_ratio(spark):
    # 4 '#' + 1 '...' = 5 symbol units over 7 tokens -> round(5/7, 4)
    r = _sig(spark, "## title ## more words here ...")
    assert r.symbol_ratio == 0.7143
    assert r.rep_flagged is True


def test_clean_text_not_flagged(spark):
    r = _sig(spark, "a perfectly ordinary sentence with no repetition at all")
    assert r.dup_line_frac == 0.0
    assert r.top_bigram_frac < 0.21
    assert r.symbol_ratio == 0.0
    assert r.rep_flagged is False


def test_empty_and_single_word_edges(spark):
    for text in ["", "   ", "word"]:
        r = _sig(spark, text)
        assert (r.dup_line_frac, r.top_bigram_frac, r.symbol_ratio) == (
            0.0,
            0.0,
            0.0,
        ), text
        assert r.rep_flagged is False


def test_decontaminate_flags_shared_8grams(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = _docs(
        spark,
        [
            # contains bench 8-grams: shares a 10-word run -> 3 distinct 8-grams
            (1, "x y " + bench_text),
            # unrelated
            (2, "one two three four five six seven eight nine ten"),
            # shares only a 7-word run -> no 8-gram overlap
            (3, "alpha beta gamma delta epsilon zeta eta DIFFERENT tail words"),
        ],
    )
    bench = _docs(spark, [(100, bench_text)])
    got = {r.doc_id: r.n_hits for r in ngram_decontaminate(corpus, bench).collect()}
    assert got == {1: 3}


def test_decontaminate_empty_benchmark(spark):
    corpus = _docs(spark, [(1, "some words " * 10)])
    bench = _docs(spark, [(9, "short")])  # < 8 tokens -> no shingles
    assert ngram_decontaminate(corpus, bench).count() == 0
