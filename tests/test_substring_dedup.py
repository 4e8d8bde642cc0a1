"""Exact-substring dedup (Lee et al. 2021 construction) — interval-union
semantics, zero-dup rows, and cross-partitioning determinism."""

from __future__ import annotations


def _run(spark, rows, k):
    from text_extract_api_spark.functions.dedup import substring_dup_spans

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in substring_dup_spans(df, k=k).collect()
    }


def test_shared_run_merges_overlapping_grams(spark):
    # docs 0/1 share a 10-token run; every 5-gram inside it is duplicated,
    # the union must collapse to ONE span of 10 tokens, not 6 spans
    shared = "a b c d e f g h i j"
    out = _run(
        spark,
        [
            (0, shared + " unique tail zero"),
            (1, "x y " + shared + " other stuff"),
            (2, "totally different words nothing shared here at all"),
            (3, ""),
            (4, "short doc"),
        ],
        k=5,
    )
    assert (out[0].n_dup_spans, out[0].dup_tokens) == (1, 10)
    assert (out[1].n_dup_spans, out[1].dup_tokens) == (1, 10)
    assert out[1].dup_frac == round(10 / out[1].n_tokens, 6)
    # zero-dup, empty, and shorter-than-k docs all still emit rows
    assert (out[2].n_dup_spans, out[2].dup_tokens) == (0, 0)
    assert (out[3].n_tokens, out[3].dup_tokens, out[3].dup_frac) == (0, 0, 0.0)
    assert (out[4].n_tokens, out[4].dup_tokens) == (2, 0)


def test_gap_lt_k_overlap_not_double_counted(spark):
    # doc 10's dup gram positions are 0 and 3 (gap < k): the two spans
    # [0,5) and [3,8) overlap — union is 8 tokens in ONE span; a naive
    # consecutive-run grouping would report 2 spans / 10 tokens
    out = _run(
        spark,
        [
            (10, "t1 t2 t3 t4 t5 t6 t7 t8"),
            (11, "t1 t2 t3 t4 t5 q q q t4 t5 t6 t7 t8"),
        ],
        k=5,
    )
    assert (out[10].n_dup_spans, out[10].dup_tokens) == (1, 8)
    # doc 11: dup positions 0 and 8 (gap >= k) stay two separate spans
    assert (out[11].n_dup_spans, out[11].dup_tokens) == (2, 10)


def test_adjacent_spans_merge_and_within_doc_repeat_not_flagged(spark):
    # doc 20 repeats its own 5-gram (positions 0 and 5) but NO other doc
    # shares it -> cross-doc rule flags nothing (intradoc pass owns that)
    out = _run(
        spark,
        [
            (20, "t1 t2 t3 t4 t5 t1 t2 t3 t4 t5"),
            (21, "completely unrelated filler words beyond any overlap"),
        ],
        k=5,
    )
    assert (out[20].n_dup_spans, out[20].dup_tokens) == (0, 0)
    # now a third doc shares the gram: both copies flag; pos 5 == prev
    # span end 5 -> contiguous union, ONE merged span covering all 10
    out = _run(
        spark,
        [
            (20, "t1 t2 t3 t4 t5 t1 t2 t3 t4 t5"),
            (21, "t1 t2 t3 t4 t5"),
            (22, "completely unrelated filler words beyond any overlap"),
        ],
        k=5,
    )
    assert (out[20].n_dup_spans, out[20].dup_tokens) == (1, 10)
    assert (out[21].n_dup_spans, out[21].dup_tokens) == (1, 5)


def test_partitioning_invariance(spark):
    from text_extract_api_spark.functions.dedup import substring_dup_spans

    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(30))) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.doc_id: (r.n_dup_spans, r.dup_tokens, r.dup_frac)
         for r in substring_dup_spans(df, k=6).collect()}
    b = {r.doc_id: (r.n_dup_spans, r.dup_tokens, r.dup_frac)
         for r in substring_dup_spans(df.repartition(13), k=6).collect()}
    assert a == b


def test_matches_bruteforce_oracle_on_random_corpus(spark):
    """Operator output == a direct Python computation of the union of
    duplicated >=k-token spans, on a seeded corpus with heavy boilerplate
    reuse (cross-doc shared runs of varying lengths, short docs, empties)."""
    import random

    from text_extract_api_spark.functions.dedup import substring_dup_spans

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    boiler = [
        [rng.choice(vocab) for _ in range(rng.randint(6, 14))] for _ in range(5)
    ]
    docs_tokens = []
    for i in range(50):
        toks: list[str] = []
        for _ in range(rng.randint(0, 4)):
            if rng.random() < 0.5:
                toks += rng.choice(boiler)
            toks += [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
        docs_tokens.append(toks)
    docs_tokens.append([])  # empty doc
    rows = [(i, " ".join(t)) for i, t in enumerate(docs_tokens)]

    K = 5
    grams: dict[tuple, set] = {}
    for i, toks in enumerate(docs_tokens):
        for p in range(len(toks) - K + 1):
            grams.setdefault(tuple(toks[p : p + K]), set()).add(i)
    expected = {}
    for i, toks in enumerate(docs_tokens):
        dup_pos = [
            p
            for p in range(len(toks) - K + 1)
            if len(grams[tuple(toks[p : p + K])] - {i}) > 0
        ]
        spans = []
        for p in dup_pos:  # interval union of [p, p+K)
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + K)
            else:
                spans.append([p, p + K])
        dup_tokens = sum(e - s for s, e in spans)
        n = len(toks)
        frac = round(dup_tokens / n, 6) if n else 0.0
        expected[i] = (n, len(spans), dup_tokens, frac)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.dup_tokens, r.dup_frac)
        for r in substring_dup_spans(df, k=K).collect()
    }
    assert got == expected
