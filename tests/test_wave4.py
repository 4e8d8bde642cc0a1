"""fuzzy_decontaminate / char_entropy / batch_by_length semantic tests."""
from __future__ import annotations

import math

from text_extract_api_spark.functions.chunking import batch_by_length
from text_extract_api_spark.functions.dedup import fuzzy_decontaminate
from text_extract_api_spark.functions.quality import char_entropy


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fuzzy_decontaminate_flags_paraphrased_leak(spark):
    bench_text = "the quick brown fox jumps over the lazy dog every day"
    corpus = _docs(
        spark,
        [
            # near-identical to the benchmark doc (one word changed)
            (1, "the quick brown fox jumps over the lazy dog every night"),
            # unrelated
            (2, "completely different content about spark dataframes here"),
            # too short for any shingle — must still appear in the output
            (3, "two words"),
        ],
    )
    bench = _docs(spark, [(100, bench_text)])
    out = {
        r["doc_id"]: r
        for r in fuzzy_decontaminate(corpus, bench, threshold=0.5).collect()
    }
    assert len(out) == 3
    assert out[1]["contaminated"] and out[1]["n_bench_matches"] == 1
    assert out[1]["max_jaccard"] >= 0.5
    assert not out[2]["contaminated"] and out[2]["max_jaccard"] == 0.0
    assert not out[3]["contaminated"] and out[3]["n_bench_matches"] == 0


def test_fuzzy_decontaminate_never_flags_within_corpus(spark):
    # two identical corpus docs, but an unrelated benchmark: candidates are
    # cross-side only, so corpus-internal duplication must NOT flag anything
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = _docs(spark, [(1, dup), (2, dup)])
    bench = _docs(spark, [(100, "nothing shared with the corpus documents")])
    out = fuzzy_decontaminate(corpus, bench).collect()
    assert all(not r["contaminated"] for r in out)


def test_char_entropy_orders_uniform_above_flood(spark):
    df = _docs(
        spark,
        [
            (1, "abcdefgh"),  # 8 distinct chars -> ln(8)
            (2, "aaaaaaaa"),  # single char -> 0
            (3, "aabb"),  # two chars, equal -> ln(2)
            (4, ""),  # empty -> (0, 0.0)
        ],
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert abs(out[1]["char_entropy"] - math.log(8)) < 1e-4
    assert out[2]["char_entropy"] == 0.0
    assert abs(out[3]["char_entropy"] - math.log(2)) < 1e-4
    assert out[4]["n_chars"] == 0 and out[4]["char_entropy"] == 0.0


def test_batch_by_length_batches_never_mix_buckets(spark):
    rows = [(i, "tok " * (10 if i % 2 else 200)) for i in range(40)]
    out = batch_by_length(
        _docs(spark, rows), batch_size=4, n_shards=2
    ).collect()
    assert len(out) == 40
    groups: dict[tuple, list] = {}
    for r in out:
        groups.setdefault((r["bucket"], r["shard"], r["batch_id"]), []).append(r)
    for (bucket, _, _), members in groups.items():
        assert len(members) <= 4  # capacity respected
        assert {m["bucket"] for m in members} == {bucket}
        # positions within a batch are 0..len-1, each exactly once
        assert sorted(m["pos_in_batch"] for m in members) == list(
            range(len(members))
        )
    # short and long docs land in different buckets
    assert len({r["bucket"] for r in out}) == 2


def test_batch_by_length_deterministic_across_runs(spark):
    rows = [(i, f"some text number {i} with words") for i in range(30)]
    a = sorted(map(tuple, batch_by_length(_docs(spark, rows)).collect()))
    b = sorted(map(tuple, batch_by_length(_docs(spark, rows)).collect()))
    assert a == b


def test_bigram_logppl_templated_text_scores_low(spark):
    from text_extract_api_spark.functions.quality import bigram_logppl

    # docs 1-3: the same repeated bigram pattern (high bigram counts);
    # doc 4: the same unigrams shuffled into unseen bigram contexts.
    rows = [
        (1, "click here to buy click here to buy"),
        (2, "click here to buy click here to buy"),
        (3, "click here to buy click here to buy"),
        (4, "buy to click here buy here click to"),
        (5, ""),
    ]
    out = {
        r["doc_id"]: r
        for r in bigram_logppl(_docs(spark, rows)).collect()
    }
    assert len(out) == 5
    assert out[1]["bigram_logppl"] == out[2]["bigram_logppl"]
    # seen-bigram text is more probable than shuffled-unigram text
    assert out[1]["bigram_logppl"] < out[4]["bigram_logppl"]
    assert out[5]["n_tokens"] == 0 and out[5]["bigram_logppl"] == 0.0
