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


def test_decontaminate_joined_form_matches_broadcast(spark):
    """The too-big-to-broadcast fallback (joined=True) returns EXACTLY the
    broadcast form's rows — both on handcrafted overlaps and on the sf0.01
    corpus probed against a slice of itself (real duplicate boilerplate,
    repeated grams on both sides, empty/short docs)."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = _docs(
        spark,
        [
            (1, "x y " + bench_text),
            (2, "one two three four five six seven eight nine ten"),
            (3, "alpha beta gamma delta epsilon zeta eta DIFFERENT tail words"),
            # same bench run twice: hits stay DISTINCT-gram-counted
            (4, bench_text + " filler " + bench_text),
        ],
    )
    bench = _docs(spark, [(100, bench_text), (101, bench_text)])  # dup bench doc
    a = {r.doc_id: r.n_hits for r in ngram_decontaminate(corpus, bench).collect()}
    b = {
        r.doc_id: r.n_hits
        for r in ngram_decontaminate(corpus, bench, joined=True).collect()
    }
    assert a == b and a[1] == 3

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench2 = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    big_a = {
        r.doc_id: r.n_hits
        for r in ngram_decontaminate(docs, bench2).collect()
    }
    big_b = {
        r.doc_id: r.n_hits
        for r in ngram_decontaminate(docs, bench2, joined=True).collect()
    }
    assert big_a == big_b and len(big_a) > 0


def test_decontaminate_bloom_matches_exact(spark):
    """The Bloom-prefiltered scale path returns EXACTLY the exact paths'
    rows — FPs only waste semi-join probes, never change output. Checked
    on handcrafted overlaps AND at a deliberately tiny bitmap (m=256,
    k=2 — FP rate near 1, every gram survives the prefilter) so the
    exactness-restoring semi-join is actually exercised."""
    from text_extract_api_spark.functions.quality import (
        ngram_decontaminate_bloom,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = _docs(
        spark,
        [
            (1, "x y " + bench_text),
            (2, "one two three four five six seven eight nine ten"),
            (3, "alpha beta gamma delta epsilon zeta eta DIFFERENT tail words"),
            (4, bench_text + " filler " + bench_text),
        ],
    )
    bench = _docs(spark, [(100, bench_text), (101, bench_text)])
    exact = {r.doc_id: r.n_hits for r in ngram_decontaminate(corpus, bench).collect()}
    bloom = {
        r.doc_id: r.n_hits
        for r in ngram_decontaminate_bloom(corpus, bench).collect()
    }
    assert bloom == exact and bloom[1] == 3
    # saturated tiny bitmap: prefilter passes ~everything, output unchanged
    tiny = {
        r.doc_id: r.n_hits
        for r in ngram_decontaminate_bloom(
            corpus, bench, n_bits=256, n_hashes=2
        ).collect()
    }
    assert tiny == exact

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench2 = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "text")
    big_exact = {
        r.doc_id: r.n_hits for r in ngram_decontaminate(docs, bench2).collect()
    }
    big_bloom = {
        r.doc_id: r.n_hits
        for r in ngram_decontaminate_bloom(docs, bench2).collect()
    }
    assert big_bloom == big_exact and len(big_bloom) > 0


def test_decontaminate_bloom_empty_benchmark(spark):
    from text_extract_api_spark.functions.quality import (
        ngram_decontaminate_bloom,
    )

    corpus = _docs(spark, [(1, "some words " * 10)])
    bench = _docs(spark, [(9, "short")])  # < 8 tokens -> no shingles
    assert ngram_decontaminate_bloom(corpus, bench).count() == 0


# ---------------------------------------------------------------- r3: token counting + paragraph dedup


def test_token_count_bpe_splits_punct_and_digit_runs(spark):
    from text_extract_api_spark.functions.textstats import (
        token_count_bpe_col,
        token_count_col,
    )

    df = _docs(spark, [(1, "see http://ex.org/a?b=1. v2.3 done"), (2, ""), (3, "plain words only")])
    out = {
        r.doc_id: (r.ws, r.bpe)
        for r in df.select(
            "doc_id",
            token_count_col(F.col("text")).alias("ws"),
            token_count_bpe_col(F.col("text")).alias("bpe"),
        ).collect()
    }
    # "see http://ex.org/a?b=1. v2.3 done": ws = 4; bpe splits the URL and
    # version into letter/digit/punct runs
    assert out[1][0] == 4
    assert out[1][1] == 18
    assert out[2] == (0, 0)
    assert out[3] == (3, 3)  # pure words: counters agree


def _paras_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, paras array<string>")


def test_paragraph_dedup_drops_corpus_wide_repeats(spark):
    from text_extract_api_spark.functions.dedup import paragraph_dedup

    df = _paras_df(
        spark,
        [
            (1, ["HEADER", "unique one", "FOOTER"]),
            (2, ["HEADER", "unique two", "FOOTER"]),
            (3, ["HEADER", "unique three"]),
        ],
    )
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert len(out) == 3
    assert out[1].n_paras == 3 and out[1].n_kept == 1
    assert out[3].n_paras == 2 and out[3].n_kept == 1
    import hashlib

    assert out[2].clean_fp == hashlib.md5(b"unique two").hexdigest()


def test_paragraph_dedup_all_boilerplate_doc_survives(spark):
    from text_extract_api_spark.functions.dedup import paragraph_dedup
    import hashlib

    df = _paras_df(spark, [(1, ["X", "Y"]), (2, ["X", "Y"])])
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    # every paragraph dropped -> doc still present with n_kept=0, md5('')
    assert out[1].n_kept == 0
    assert out[1].clean_fp == hashlib.md5(b"").hexdigest()


def test_paragraph_dedup_preserves_document_order(spark):
    from text_extract_api_spark.functions.dedup import paragraph_dedup
    import hashlib

    df = _paras_df(spark, [(1, ["b second", "DUP", "a first"]), (2, ["DUP"])])
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    # kept paragraphs joined in POSITION order, not sorted-text order
    assert out[1].clean_fp == hashlib.md5(b"b second\n\na first").hexdigest()


def test_length_quantiles_approx_bounded_error(spark):
    """The percentile_approx scale mode must land within the sketch's rank
    error of the exact path at sf0.1 (VERDICT r3 #6). percentile_approx's
    rank error is ~n/accuracy; translate that to a VALUE tolerance by
    checking the approx answer falls between the exact quantiles at
    p ± slack."""
    from text_extract_api_spark.functions.textstats import length_quantiles

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    exact = {r["lang"]: r for r in length_quantiles(docs, approx=False).collect()}
    approx = {
        r["lang"]: r
        for r in length_quantiles(docs, approx=True, accuracy=10_000).collect()
    }
    assert set(exact) == set(approx)
    slack = 0.002  # rank slack >> 1/accuracy, << quantile spacing
    from pyspark.sql import functions as FF

    for p, col in ((0.5, "p50_chars"), (0.9, "p90_chars"), (0.99, "p99_chars")):
        lo_hi = (
            docs.groupBy("lang")
            .agg(
                FF.percentile("n_chars", max(0.0, p - slack)).alias("lo"),
                FF.percentile("n_chars", min(1.0, p + slack)).alias("hi"),
            )
            .collect()
        )
        for r in lo_hi:
            got = approx[r["lang"]][col]
            assert r["lo"] - 1 <= got <= r["hi"] + 1, (r["lang"], col, got, r)
        # and counts agree exactly
    for lang in exact:
        assert exact[lang]["n_docs"] == approx[lang]["n_docs"]


def test_ccnet_buckets_approx_bounded_error(spark):
    """The percentile_approx scale mode of ccnet_buckets (VERDICT r4 #3)
    must put its terciles within the sketch's rank error of the exact
    path at sf0.1: each approx threshold falls between the exact
    quantiles at p ± slack, and the resulting bucketing disagrees on at
    most the doc mass inside those slack bands."""
    from pyspark.sql import functions as FF

    from text_extract_api_spark.functions.quality import (
        CCNET_BUCKET_P1,
        CCNET_BUCKET_P2,
        ccnet_buckets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    exact = ccnet_buckets(docs).select("doc_id", "lang", "logppl", "ppl_bucket")
    approx = ccnet_buckets(docs, approx=True, accuracy=10_000).select(
        "doc_id", FF.col("ppl_bucket").alias("ppl_bucket_a")
    )
    both = exact.join(approx, "doc_id").localCheckpoint()
    slack = 0.002  # rank slack >> 1/accuracy, << tercile spacing
    bands = (
        both.filter(FF.col("ppl_bucket") != "empty")
        .groupBy("lang")
        .agg(
            *[
                FF.percentile("logppl", q).alias(n)
                for q, n in (
                    (CCNET_BUCKET_P1 - slack, "t1_lo"),
                    (CCNET_BUCKET_P1 + slack, "t1_hi"),
                    (CCNET_BUCKET_P2 - slack, "t2_lo"),
                    (CCNET_BUCKET_P2 + slack, "t2_hi"),
                )
            ]
        )
    )
    # bucket disagreements only happen for docs whose logppl sits inside a
    # slack band around a tercile; everything outside must agree exactly
    disagree_outside = (
        both.join(bands, "lang")
        .filter(FF.col("ppl_bucket") != FF.col("ppl_bucket_a"))
        .filter(
            ~(
                FF.col("logppl").between(FF.col("t1_lo"), FF.col("t1_hi"))
                | FF.col("logppl").between(FF.col("t2_lo"), FF.col("t2_hi"))
            )
        )
        .count()
    )
    assert disagree_outside == 0
    # empty docs are mode-invariant, and the overall disagreement is tiny
    n = both.count()
    n_diff = both.filter(FF.col("ppl_bucket") != FF.col("ppl_bucket_a")).count()
    assert n_diff <= max(10, int(0.02 * n)), (n_diff, n)
    assert (
        both.filter(
            (FF.col("ppl_bucket") == "empty")
            & (FF.col("ppl_bucket_a") != "empty")
        ).count()
        == 0
    )


def test_percentile_gate_approx_bounded_error(spark):
    """quality_percentile_gate(approx=True) (VERDICT r4 #3): the sketch
    threshold sits between the exact quantiles at (1-keep_frac) ± slack
    per language, and keep verdicts flip only inside that band."""
    from pyspark.sql import functions as FF

    from text_extract_api_spark.functions.quality import (
        QUALITY_GATE_KEEP_FRAC,
        quality_percentile_gate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    exact = quality_percentile_gate(docs)
    approx = quality_percentile_gate(docs, approx=True, accuracy=10_000).select(
        "doc_id", FF.col("keep").alias("keep_a")
    )
    both = exact.join(approx, "doc_id").localCheckpoint()
    p = 1.0 - QUALITY_GATE_KEEP_FRAC
    slack = 0.002
    bands = both.groupBy("lang").agg(
        FF.percentile("quality", p - slack).alias("lo"),
        FF.percentile("quality", p + slack).alias("hi"),
    )
    flipped_outside = (
        both.join(bands, "lang")
        .filter(FF.col("keep") != FF.col("keep_a"))
        .filter(~FF.col("quality").between(FF.col("lo"), FF.col("hi")))
        .count()
    )
    assert flipped_outside == 0
    n = both.count()
    n_flip = both.filter(FF.col("keep") != FF.col("keep_a")).count()
    assert n_flip <= max(10, int(0.02 * n)), (n_flip, n)


def test_paragraph_dedup_empty_and_null_paras_doc_survives(spark):
    # ADVICE r3: a doc with zero paragraphs (empty or NULL array) used to
    # vanish from the output — downstream anti-joins then treated it as
    # unprocessed. It must emit (n_paras=0, n_kept=0, clean_fp=md5('')).
    from text_extract_api_spark.functions.dedup import paragraph_dedup
    import hashlib

    df = _paras_df(spark, [(1, []), (2, None), (3, ["kept text"])])
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert set(out) == {1, 2, 3}
    empty_fp = hashlib.md5(b"").hexdigest()
    for d in (1, 2):
        assert out[d].n_paras == 0 and out[d].n_kept == 0
        assert out[d].clean_fp == empty_fp
    assert out[3].n_kept == 1


def test_paragraph_dedup_within_doc_repeat_also_dropped(spark):
    from text_extract_api_spark.functions.dedup import paragraph_dedup

    df = _paras_df(spark, [(1, ["loop", "loop", "solo"])])
    out = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    # occurrence counting is corpus-wide incl. within-doc repeats (they are
    # repetition junk too)
    assert out[1].n_kept == 1


# ---------------------------------------------------------------- gopher rules


def _gopher(spark, text):
    from text_extract_api_spark.functions.quality import gopher_rules

    [r] = gopher_rules(_docs(spark, [(1, text)])).collect()
    return r


def test_gopher_keep_and_signal_values(spark):
    # 60 words, mean len in [3,10], all alpha, stopwords {the,a,and,it,is,
    # to,in} >= 2, no bullet/ellipsis lines -> keep
    t = " ".join(
        ["the quick brown fox jumps over a lazy dog and it is here to stay"] * 4
    )
    r = _gopher(spark, t)
    assert r.gopher_reason == "keep" and r.gopher_flagged is False
    assert r.n_words == 60 and r.alpha_frac == 1.0 and r.n_stopwords >= 2


def test_gopher_word_count_bounds(spark):
    assert _gopher(spark, "short doc").gopher_reason == "word_count"
    assert _gopher(spark, "").gopher_reason == "word_count"
    assert _gopher(spark, "   ").n_words == 0


def test_gopher_word_length(spark):
    # 60 words of 15 chars: word count passes, mean length 15 > 10
    r = _gopher(spark, " ".join(["extraordinarily"] * 60))
    assert r.gopher_reason == "word_length" and r.mean_word_len == 15.0


def test_gopher_bullet_lines_incl_multibyte(spark):
    # 10 bullet lines (ASCII '- ' and U+2022 '•'), 70 words, mean len ok
    lines = ["- the quick brown fox and dog runs"] * 8 + [
        "• the quick brown fox and dog runs",
        "* the quick brown fox and dog runs",
    ]
    r = _gopher(spark, "\n".join(lines))
    assert r.bullet_frac == 1.0 and r.gopher_reason == "bullet_lines"


def test_gopher_ellipsis_lines_incl_multibyte(spark):
    lines = ["the quick brown fox jumps here..."] * 6 + [
        "the quick brown fox jumps here…"
    ] * 4
    r = _gopher(spark, "\n".join(lines))
    assert r.ellipsis_frac == 1.0 and r.gopher_reason == "ellipsis_lines"


def test_gopher_non_alpha_and_few_stopwords(spark):
    # 60 numeric words: alpha_frac 0 < 0.8 (word count/length pass first)
    assert _gopher(spark, " ".join(["12345"] * 60)).gopher_reason == "non_alpha"
    # 60 alpha words, <2 distinct stopwords present
    assert (
        _gopher(spark, " ".join(["cat dog fish bird"] * 15)).gopher_reason
        == "few_stopwords"
    )


# ------------------------------------------------------- intra-doc segment dedup


_SPANS_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def test_intradoc_dedup_collapses_repeats_keeps_first(spark):
    import hashlib

    from text_extract_api_spark.functions.dedup import intradoc_segment_dedup

    rows = [
        ("a", [("text", "X" * 120, "", 0), ("text", "X" * 120, "", 1),
               ("text", "Y" * 60, "", 2)]),
        ("b", [("pdf", "", "pdf://b/0", 0)]),  # empty doc text still emits
        ("c", [("text", "z" * 300, "", 1), ("text", "w" * 60, "", 0)]),
    ]
    got = {
        r.doc_id: r
        for r in intradoc_segment_dedup(
            spark.createDataFrame(rows, _SPANS_DDL)
        ).collect()
    }
    a = got["a"]
    assert (a.n_segs, a.n_kept, a.dedup_ratio) == (3, 2, 0.6667)
    assert a.clean_fp == hashlib.md5(("X" * 120 + "Y" * 60).encode()).hexdigest()
    b = got["b"]
    assert (b.n_segs, b.n_kept, b.dedup_ratio) == (0, 0, 1.0)
    assert b.clean_fp == hashlib.md5(b"").hexdigest()
    # spans sort by offset BEFORE concat: doc_text = w*60 + z*300 → segs
    # [w60+z60, z120, z120] → kept 2
    c = got["c"]
    assert (c.n_segs, c.n_kept) == (3, 2)
    assert c.clean_fp == hashlib.md5(
        ("w" * 60 + "z" * 60 + "z" * 120).encode()
    ).hexdigest()


def test_intradoc_dedup_oversize_docs_collapse(spark, sf_dir):
    """The synth corpus's oversize docs (eff_id % 97 == 0: one chunk
    repeated 50×) must compress hard; ordinary docs must not."""
    from text_extract_api_spark.functions.dedup import intradoc_segment_dedup
    from text_extract_api_spark.synth import synthesize_interleaved

    docs, _ = synthesize_interleaved(spark, sf_dir)
    out = intradoc_segment_dedup(docs)
    squeezed = {r.doc_id for r in out.filter("n_segs - n_kept >= 40").collect()}
    assert "0" in squeezed  # doc 0 is oversize at every sf
    total = out.count()
    assert out.filter("n_kept = n_segs").count() > total * 0.8


# --- C4 §2.2 cleaning rules ------------------------------------------------


def _c4(spark, rows):
    from text_extract_api_spark.functions.quality import c4_rules

    return {r.doc_id: r for r in c4_rules(_docs(spark, rows)).collect()}


def test_c4_line_retention_and_keep(spark):
    txt = (
        "This is a perfectly fine first sentence.\n"
        "short line.\n"                       # < 5 words -> dropped
        "no terminal punctuation on this line\n"  # no terminal punct -> dropped
        "Please enable JavaScript to view comments.\n"  # javascript -> dropped
        "Here is another good sentence to keep!\n"
        "And a third good closing sentence right here?\n"
    )
    r = _c4(spark, [(1, txt)])[1]
    assert r.n_lines == 6
    assert r.n_kept_lines == 3
    assert r.n_sentences == 3
    assert r.c4_reason == "keep" and r.c4_flagged is False


def test_c4_doc_level_drops_and_precedence(spark):
    good = (
        "One good retained sentence stands right here.\n"
        "Two good retained sentences stand right here.\n"
        "Three good retained sentences stand right here.\n"
    )
    rows = [
        (1, good + "We sprinkle Lorem Ipsum in the { page."),  # lorem wins
        (2, good + "code { block }"),
        (3, "Only two kept sentences live here today.\nAnd the second one is also here now.\n"),
        (4, ""),
    ]
    out = _c4(spark, rows)
    assert out[1].c4_reason == "lorem_ipsum"      # precedence over curly_brace
    assert out[2].c4_reason == "curly_brace"
    assert out[3].c4_reason == "too_few_sentences"
    assert out[4].c4_reason == "too_few_sentences"
    assert out[4].n_lines == 0 and out[4].n_kept_lines == 0
    # md5('') — empty doc fingerprint is stable, not NULL
    assert out[4].clean_fp == "d41d8cd98f00b204e9800998ecf8427e"


def test_c4_sentence_runs_count_once(spark):
    # "?!" terminal run counts as ONE sentence boundary
    txt = (
        "Is this really the end of the line?!\n"
        "A second retained sentence comes right after.\n"
        "A third retained sentence closes the document.\n"
    )
    r = _c4(spark, [(1, txt)])[1]
    assert r.n_sentences == 3
    assert r.c4_reason == "keep"


# --- unigram log-perplexity --------------------------------------------------


def test_unigram_logppl_matches_hand_computation(spark):
    import math

    from text_extract_api_spark.functions.quality import LOGP_SCALE, unigram_logppl

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logppl(docs).collect()}
    # vocab: a=2, b=2, c=1; total=5, V=3 -> Laplace p = (cnt+1)/(total+V)
    lp = {
        w: round(math.log((c + 1) / 8.0) * LOGP_SCALE)
        for w, c in {"a": 2, "b": 2, "c": 1}.items()
    }
    def r6(x: float) -> float:  # HALF_UP like Spark/DuckDB round, not banker's
        return math.floor(x * 1e6 + 0.5) / 1e6

    exp1 = r6(-(2 * lp["a"] + lp["b"]) / (3 * LOGP_SCALE))
    exp2 = r6(-(lp["b"] + lp["c"]) / (2 * LOGP_SCALE))
    assert (out[1].n_tokens, out[1].logppl) == (3, exp1)
    assert (out[2].n_tokens, out[2].logppl) == (2, exp2)
    # empty doc still emits a row; float outputs are never NULL
    assert (out[3].n_tokens, out[3].logppl) == (0, 0.0)
    # the rare-word doc is more surprising than the common-word doc
    assert out[2].logppl > out[1].logppl


def test_unigram_logppl_partitioning_invariant(spark):
    from text_extract_api_spark.functions.quality import unigram_logppl

    rows = [
        (i, " ".join(f"tok{(i * j) % 17}" for j in range(1, 25)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.doc_id: (r.n_tokens, r.logppl) for r in unigram_logppl(docs).collect()}
    b = {
        r.doc_id: (r.n_tokens, r.logppl)
        for r in unigram_logppl(docs.repartition(11)).collect()
    }
    assert a == b


def test_corpus_datacard_is_consistent_with_per_doc_operators(spark):
    """The data card must be the exact groupBy of the per-doc operators it
    composes — totals cross-checked against the standalone queries."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    card = entry.q_corpus_datacard(spark, sf).collect()
    docs = entry._docs(spark, sf)
    assert sum(r.n_docs for r in card) == docs.count()
    tok = {
        r.doc_id: r.n_tokens for r in entry.q_token_count(spark, sf).collect()
    }
    assert sum(r.total_tokens for r in card) == sum(tok.values())
    gf = entry.queries()["quality_gopher_rules"](spark, sf).collect()
    assert sum(r.n_gopher_flagged for r in card) == sum(
        1 for r in gf if r.gopher_flagged
    )
    rep = entry.queries()["quality_repetition"](spark, sf).collect()
    assert sum(r.n_rep_flagged for r in card) == sum(
        1 for r in rep if r.rep_flagged
    )
    # mean_quality is bounded and fixed-point exact
    assert all(0.0 <= r.mean_quality <= 1.0 for r in card)
