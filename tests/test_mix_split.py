"""temperature_mix / tokenizer_fertility / snapshot_diff /
quality_percentile_gate / holdout_split semantic tests."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from text_extract_api_spark.functions.quality import quality_percentile_gate
from text_extract_api_spark.functions.sampling import temperature_mix
from text_extract_api_spark.functions.selection import holdout_split, snapshot_diff
from text_extract_api_spark.functions.textstats import tokenizer_fertility


def test_temperature_mix_sqrt_shares_exact(spark):
    # tokens 100 vs 400: natural shares 1/5, 4/5; sqrt weights 10 vs 20 ->
    # temperature shares 1/3, 2/3. All outputs are exact integer divisions.
    df = spark.createDataFrame(
        [("a", 100), ("b", 400)], "lang string, n_tokens long"
    )
    out = {
        r["lang"]: r
        for r in temperature_mix(df, F.col("n_tokens")).collect()
    }
    assert out["a"]["share_x1e6"] == 200_000
    assert out["b"]["share_x1e6"] == 800_000
    assert out["a"]["temp_share_x1e6"] == 333_333
    assert out["b"]["temp_share_x1e6"] == 666_666
    # upsample = temp_share / share: 5/3 and 5/6 in x10k fixed point
    assert out["a"]["upsample_x10k"] == 16_666
    assert out["b"]["upsample_x10k"] == 8_333


def test_temperature_mix_zero_token_stratum(spark):
    df = spark.createDataFrame(
        [("a", 100), ("z", 0)], "lang string, n_tokens long"
    )
    out = {r["lang"]: r for r in temperature_mix(df, F.col("n_tokens")).collect()}
    assert out["z"]["share_x1e6"] == 0
    assert out["z"]["temp_share_x1e6"] == 0
    assert out["z"]["upsample_x10k"] == 0
    # the live stratum still gets the whole temperature mass
    assert out["a"]["temp_share_x1e6"] == 1_000_000


def test_temperature_mix_rejects_non_sqrt_temperature(spark):
    df = spark.createDataFrame([("a", 1)], "lang string, n_tokens long")
    with pytest.raises(ValueError):
        temperature_mix(df, F.col("n_tokens"), temperature=3.0)


def test_tokenizer_fertility_counts_and_ratios(spark):
    # 'ab cd' -> 5 bytes, 5 chars, 2 ws tokens, 2 pretokenizer tokens;
    # 'é' -> 2 bytes, 1 char, 1 ws token, 1 pretokenizer token;
    # empty lang -> all zeros (no NULL numerics, no divide-by-zero).
    df = spark.createDataFrame(
        [(1, "ab cd", "en"), (2, "é", "fr"), (3, "", "empty")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    en, fr, empty = out["en"], out["fr"], out["empty"]
    assert (en["total_bytes"], en["total_chars"]) == (5, 5)
    assert (en["ws_tokens"], en["bpe_tokens"]) == (2, 2)
    assert en["bytes_per_bpe_x1e4"] == 25_000  # 5 bytes / 2 tokens
    assert (fr["total_bytes"], fr["total_chars"]) == (2, 1)
    assert fr["bytes_per_bpe_x1e4"] == 20_000  # 2 bytes / 1 token
    assert empty["total_bytes"] == 0
    assert empty["bytes_per_bpe_x1e4"] == 0
    assert empty["chars_per_ws_x1e4"] == 0


def test_snapshot_diff_four_statuses(spark):
    old = spark.createDataFrame(
        [(1, "h1"), (2, "h2"), (3, "h3")], "doc_id long, fp string"
    )
    new = spark.createDataFrame(
        [(2, "h2"), (3, "h3x"), (4, "h4")], "doc_id long, fp string"
    )
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_quality_percentile_gate_keeps_top_fraction_per_lang(spark):
    good = (
        "The quick brown fox jumps over the lazy dog and the story continues "
        "with a long fluent paragraph of plain English text, as it should. "
    ) * 4
    rows = [
        (1, good, "en"),
        (2, good + "More of the same readable text follows here.", "en"),
        (3, "@@@@ #### $$$$ %%%%", "en"),
        (4, "!!!! ???? ;;;; ::::", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: r
        for r in quality_percentile_gate(df, keep_frac=0.5).collect()
    }
    assert len(out) == 4
    assert out[1]["keep"] and out[2]["keep"]
    assert not out[3]["keep"] and not out[4]["keep"]
    # threshold column is the same per-lang constant on every row
    assert len({r["q_thresh"] for r in out.values()}) == 1


def test_quality_percentile_gate_ties_at_threshold_all_kept(spark):
    # identical docs => identical quality => everyone ties at the threshold
    # and the FineWeb semantics keep them all (admission by score, no
    # arbitrary tiebreak among equals).
    rows = [(i, "the same text for every doc", "en") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_percentile_gate(df, keep_frac=0.25).collect()
    assert all(r["keep"] for r in out)


def _is_val(doc_id: int, frac: float, salt: str = "holdout") -> bool:
    h = hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8]
    return int(h, 16) < int(frac * (1 << 32))


def test_holdout_split_quarantines_train_neardups_of_val(spark):
    frac = 0.5
    ids = list(range(1, 11))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    # near-dup chain pairs: (1,2), (3,4), ... (9,10)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in ids[::2]], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["split"]
        for r in holdout_split(docs, pairs, val_frac=frac).collect()
    }
    assert len(out) == 10
    val = {i for i in ids if _is_val(i, frac)}
    assert val and len(val) < 10  # both sides populated at this frac
    partner = {i: (i + 1 if i % 2 else i - 1) for i in ids}
    for i in ids:
        if i in val:
            assert out[i] == "val"  # val wins even when paired with val
        elif partner[i] in val:
            assert out[i] == "quarantined"
        else:
            assert out[i] == "train"


def test_holdout_split_no_pairs_means_no_quarantine(spark):
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = holdout_split(docs, empty_pairs, val_frac=0.3).collect()
    assert {r["split"] for r in out} <= {"val", "train"}
    assert len(out) == 20
