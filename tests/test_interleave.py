"""Interleaved-sequence structure operators: hand-computed edge cases.

Covers the degenerate shapes the sf0.01 oracle corpus can't guarantee to
contain: all-media docs, all-text docs, single-span docs, and exact
tie-breaking in the nearest-text pairing.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from text_extract_api_spark.functions.interleave import (
    interleave_stats,
    media_text_pairing,
)
from text_extract_api_spark.functions.sampling import epoch_shuffle


def _span(kind, off):
    return Row(kind=kind, text="t", media_ref="", offset=off)


def _nested(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=d, spans=[_span(k, i) for i, k in enumerate(kinds)])
         for d, kinds in rows],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_interleave_stats_hand_cases(spark):
    df = _nested(
        spark,
        [
            # T M M T: 2 transitions, media run 2, text run 1, first media 1
            ("a", ["text", "image", "pdf", "text"]),
            # all media: 0 transitions, media run 3, text run 0, first 0
            ("b", ["pdf", "image", "pdf"]),
            # all text: no media, first_media = -1 sentinel
            ("c", ["text", "html", "markdown"]),
            # single span
            ("d", ["image"]),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in interleave_stats(df).collect()}
    assert got["a"] == dict(doc_id="a", n_spans=4, n_transitions=2,
                            max_media_run=2, max_text_run=1, first_media_idx=1)
    assert got["b"] == dict(doc_id="b", n_spans=3, n_transitions=0,
                            max_media_run=3, max_text_run=0, first_media_idx=0)
    assert got["c"] == dict(doc_id="c", n_spans=3, n_transitions=0,
                            max_media_run=0, max_text_run=3, first_media_idx=-1)
    assert got["d"] == dict(doc_id="d", n_spans=1, n_transitions=0,
                            max_media_run=1, max_text_run=0, first_media_idx=0)


def _flat(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=d, offset=i, kind=k,
             text="x" if k not in ("pdf", "image") else "",
             media_ref=f"m://{d}/{i}" if k in ("pdf", "image") else "")
         for d, kinds in rows for i, k in enumerate(kinds)],
        "doc_id string, offset int, kind string, text string, media_ref string",
    )


def test_pairing_tie_breaks_earlier(spark):
    # T M T : media at 1 is equidistant from text 0 and 2 -> pairs to 0
    df = _flat(spark, [("a", ["text", "image", "text"])])
    [r] = media_text_pairing(df).collect()
    assert (r["paired_text_idx"], r["pair_dist"]) == (0, 1)


def test_pairing_directional_and_unpairable(spark):
    df = _flat(
        spark,
        [
            # M M T: both media pair forward to 2
            ("a", ["pdf", "image", "text"]),
            # T M M: both media pair back to 0
            ("b", ["text", "pdf", "image"]),
            # all-media doc: unpairable -> -1 sentinels
            ("c", ["image", "pdf"]),
        ],
    )
    got = {(r["doc_id"], r["media_idx"]): (r["paired_text_idx"], r["pair_dist"])
           for r in media_text_pairing(df).collect()}
    assert got[("a", 0)] == (2, 2) and got[("a", 1)] == (2, 1)
    assert got[("b", 1)] == (0, 1) and got[("b", 2)] == (0, 2)
    assert got[("c", 0)] == (-1, -1) and got[("c", 1)] == (-1, -1)


def test_epoch_shuffle_total_deterministic_permutation(spark):
    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    a = epoch_shuffle(docs, n_shards=8, seed="s1")
    # total: every doc exactly once
    assert a.count() == 400 and a.select("doc_id").distinct().count() == 400
    # positions within each shard are dense 0..n-1
    dense = a.groupBy("shard").agg(
        F.count("*").alias("n"), (F.max("pos") + 1).alias("mx"),
        F.countDistinct("pos").alias("d"),
    )
    assert all(r["n"] == r["mx"] == r["d"] for r in dense.collect())
    # deterministic across independent builds and partitionings
    b = epoch_shuffle(docs.repartition(13), n_shards=8, seed="s1")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # a different seed yields a different permutation
    c = epoch_shuffle(docs, n_shards=8, seed="s2")
    assert a.exceptAll(c).count() > 0


def test_epoch_shuffle_shard_balance(spark):
    docs = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    sizes = [r["n"] for r in epoch_shuffle(docs, n_shards=8, seed="s1")
             .groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(sizes) == 8
    # md5 is uniform: no shard more than 30% off the mean at n=4000
    assert max(sizes) < 500 * 1.3 and min(sizes) > 500 * 0.7


def test_strip_boilerplate_spans_hand_cases(spark):
    import hashlib

    from text_extract_api_spark.functions.interleave import (
        strip_boilerplate_spans,
    )

    rows = [
        # "NAV" recurs in docs a, b, d -> dropped from all three;
        # media spans always survive; intra-doc repeats (doc c) survive
        # (distinct-doc counting); doc d loses everything -> md5('').
        ("a", 0, "text", "NAV", ""),
        ("a", 1, "image", "", "img://a/1"),
        ("a", 2, "text", "uniq1", ""),
        ("b", 0, "text", "NAV", ""),
        ("b", 1, "text", "uniq2", ""),
        ("c", 0, "text", "CHANT", ""),
        ("c", 1, "text", "CHANT", ""),
        ("c", 2, "text", "CHANT", ""),
        ("d", 0, "text", "NAV", ""),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, offset int, kind string, text string, media_ref string",
    )
    got = {r["doc_id"]: r.asDict()
           for r in strip_boilerplate_spans(df).collect()}

    def fp(*pieces):
        return hashlib.md5("\x1f".join(pieces).encode()).hexdigest()

    assert got["a"] == dict(doc_id="a", n_spans=3, n_media=1, n_dropped=1,
                            clean_fp=fp("[img://a/1]", "uniq1"))
    assert got["b"] == dict(doc_id="b", n_spans=2, n_media=0, n_dropped=1,
                            clean_fp=fp("uniq2"))
    assert got["c"] == dict(doc_id="c", n_spans=3, n_media=0, n_dropped=0,
                            clean_fp=fp("CHANT", "CHANT", "CHANT"))
    assert got["d"] == dict(doc_id="d", n_spans=1, n_media=0, n_dropped=1,
                            clean_fp=fp(""))

    # the materialization half on the same fixture: surviving spans only,
    # offsets rebased dense per doc (doc a's kept spans at original
    # offsets 1, 2 land at 0, 1); all-dropped doc d emits no rows
    from text_extract_api_spark.functions.interleave import (
        strip_boilerplate_apply,
    )

    applied = sorted(
        (r["doc_id"], r["offset"], r["kind"], r["text"], r["media_ref"])
        for r in strip_boilerplate_apply(df).collect()
    )
    assert applied == [
        ("a", 0, "image", "", "img://a/1"),
        ("a", 1, "text", "uniq1", ""),
        ("b", 0, "text", "uniq2", ""),
        ("c", 0, "text", "CHANT", ""),
        ("c", 1, "text", "CHANT", ""),
        ("c", 2, "text", "CHANT", ""),
    ]


def test_media_reuse_stats_hand_cases(spark):
    from text_extract_api_spark.functions.interleave import media_reuse_stats

    rows = [
        # logo: 2 distinct docs, 3 occurrences (intra-doc repeat raises
        # n_occ but not n_docs); pdf://one: single use; text rows ignored
        ("a", 0, "image", "", "img://logo"),
        ("a", 1, "image", "", "img://logo"),
        ("b", 0, "image", "", "img://logo"),
        ("b", 1, "pdf", "", "pdf://one"),
        ("c", 0, "text", "t", ""),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, offset int, kind string, text string, media_ref string",
    )
    got = {
        r["media_ref"]: (r["n_docs"], r["n_occ"], r["is_hot"])
        for r in media_reuse_stats(df, hot_min_docs=2).collect()
    }
    assert got == {"img://logo": (2, 3, True), "pdf://one": (1, 1, False)}


def test_mm_funnel_verdicts_every_reason(spark):
    from text_extract_api_spark.functions.interleave import (
        mm_funnel_verdicts,
    )

    shapes = [
        ("no_media", ["text", "html", "markdown"]),
        ("wall", ["text", "pdf", "image", "pdf", "text"]),      # run 3
        # M M T M M: runs 2, transitions 2, but only 2/4 media at dist 1
        # -> unanchored under min_adj_pct=60
        ("unanchored", ["image", "pdf", "text", "pdf", "image"]),
        ("boiler", ["text", "image", "text", "pdf", "text"]),   # hot text
        ("keep", ["text", "image", "text", "pdf", "text"]),
    ]
    nested = _nested(spark, shapes)
    flat = _flat(spark, shapes)
    # every text span of doc 'boiler' (and every other doc — _flat gives
    # all text spans the same payload "x") is corpus-hot; gate only doc
    # 'boiler' by leaving the others' boiler_max_pct head-room via an
    # empty hot set first, then a full one.
    import hashlib

    hot_all = spark.createDataFrame(
        [(hashlib.md5(b"x").hexdigest(),)], "fp string"
    )
    hot_none = spark.createDataFrame([], "fp string")

    got = {
        r["doc_id"]: r["verdict"]
        for r in mm_funnel_verdicts(
            nested, flat, hot_none, min_adj_pct=60
        ).collect()
    }
    assert got == {
        "no_media": "no_media",
        "wall": "not_interleaved",
        "unanchored": "unanchored",
        "boiler": "keep",
        "keep": "keep",
    }

    # with the hot set populated, the structurally-good docs flip to
    # 'boilerplate' (all their text is corpus-recurring); the earlier
    # gates keep precedence
    got2 = {
        r["doc_id"]: r["verdict"]
        for r in mm_funnel_verdicts(
            nested, flat, hot_all, min_adj_pct=60
        ).collect()
    }
    assert got2 == {
        "no_media": "no_media",
        "wall": "not_interleaved",
        "unanchored": "unanchored",
        "boiler": "boilerplate",
        "keep": "boilerplate",
    }

    # hot-media gate: with every media ref of doc 'keep' marked hot
    # (_flat refs are m://{doc}/{i}), the structurally-good doc flips to
    # 'hot_media'; text boilerplate keeps precedence for doc 'boiler'
    # only when its fps are hot too — here hot_none isolates the media
    # gate.
    hot_refs = spark.createDataFrame(
        [("m://keep/1",), ("m://keep/3",)], "media_ref string"
    )
    got3 = {
        r["doc_id"]: r["verdict"]
        for r in mm_funnel_verdicts(
            nested, flat, hot_none, min_adj_pct=60, hot_refs=hot_refs
        ).collect()
    }
    assert got3 == {
        "no_media": "no_media",
        "wall": "not_interleaved",
        "unanchored": "unanchored",
        "boiler": "keep",
        "keep": "hot_media",
    }


def test_mm_curation_gates(spark):
    from text_extract_api_spark.functions.interleave import mm_curation

    shapes = [
        ("keep_perfect", ["text", "image", "text", "pdf", "text"]),   # kept
        ("drop_few_trans", ["pdf", "image", "pdf", "text"]),          # 1 transition
        ("drop_media_wall", ["text", "pdf", "image", "pdf", "text"]), # run 3
        ("drop_no_media", ["text", "html", "markdown"]),              # no media
        ("keep_partial", ["text", "image", "text", "pdf", "image"]),  # adj 2/3 = 66
    ]
    nested = _nested(spark, shapes)
    flat = _flat(spark, shapes)
    got = {r["doc_id"]: r.asDict() for r in mm_curation(nested, flat).collect()}
    assert set(got) == {"keep_perfect", "keep_partial"}
    assert got["keep_perfect"]["adj_pct"] == 100
    assert got["keep_partial"]["n_media"] == 3
    assert got["keep_partial"]["n_adjacent"] == 2
    assert got["keep_partial"]["adj_pct"] == 66
