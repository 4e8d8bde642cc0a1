"""NFC-normalized fingerprint: canonical-equivalence dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_extract_api_spark.functions.textstats import (
    nfc_normalize_col,
    normalized_fingerprint_col,
)


def test_composed_and_decomposed_collapse(spark):
    rows = [
        (1, "caf\u00e9"),  # composed U+00E9
        (2, "cafe\u0301"),  # decomposed e + combining acute
        (3, "cafe"),             # genuinely different
        (4, None),               # null passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n"], r["fp"])
        for r in df.select(
            "doc_id",
            nfc_normalize_col(F.col("text")).alias("n"),
            normalized_fingerprint_col(F.col("text")).alias("fp"),
        ).collect()
    }
    assert out[1][0] == out[2][0] == "caf\u00e9"  # byte-identical after NFC
    assert out[1][1] == out[2][1]                  # fingerprints collapse
    assert out[3][1] != out[1][1]                  # real difference survives
    assert out[4] == (None, None)


def test_ascii_is_identity(spark):
    df = spark.createDataFrame([(1, "plain ascii text")], "doc_id long, text string")
    r = df.select(nfc_normalize_col(F.col("text")).alias("n")).first()
    assert r["n"] == "plain ascii text"
