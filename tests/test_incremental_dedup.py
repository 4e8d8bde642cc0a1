"""Incremental near-dup dedup against a persisted signature store."""

from __future__ import annotations

from text_extract_api_spark.functions.dedup import (
    build_signature_store,
    incremental_near_dup_flags,
)

_BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_flags(spark, tmp_path):
    store = str(tmp_path / "sigstore")
    hist = _docs(
        spark,
        [
            (1, _BASE),
            (2, "completely different historical content about spark engines"),
        ],
    )
    build_signature_store(hist, store)

    batch = _docs(
        spark,
        [
            (10, _BASE),                       # dup of historical doc 1
            (11, "novel fresh text with many unique words in this sentence"),
            (12, "novel fresh text with many unique words in this sentence"),  # dup of 11
            (13, "tiny"),                      # < 3 words: no signature, absent
        ],
    )
    out = {r["doc_id"]: r for r in incremental_near_dup_flags(spark, store, batch).collect()}

    assert set(out) == {10, 11, 12}  # doc 13 has no shingles
    assert out[10]["n_hist_cands"] >= 1 and not out[10]["kept"]
    assert out[11]["n_hist_cands"] == 0 and out[11]["n_prior_cands"] == 0
    assert out[11]["kept"]
    # first-occurrence-wins: 12 matches earlier batch doc 11
    assert out[12]["n_prior_cands"] == 1 and not out[12]["kept"]


def test_store_partitioned_by_band(spark, tmp_path):
    import os

    store = str(tmp_path / "sigstore2")
    build_signature_store(_docs(spark, [(1, _BASE)]), store)
    bands = [d for d in os.listdir(store) if d.startswith("band=")]
    assert len(bands) >= 1  # partition pruning surface exists


def test_batch_only_work(spark, tmp_path):
    """Incremental flags need ONLY the store — the historical TEXT is gone
    (the whole point: per-day cost scales with the batch, history is never
    re-read). The store band table alone must reproduce the hist match."""
    store = str(tmp_path / "sigstore3")
    hist = _docs(spark, [(1, _BASE)])
    build_signature_store(hist, store)
    del hist  # no historical frame exists below this line
    out = {
        r["doc_id"]: r
        for r in incremental_near_dup_flags(
            spark,
            store,
            _docs(spark, [(20, _BASE), (21, "some new words entirely here now")]),
        ).collect()
    }
    assert not out[20]["kept"] and out[20]["n_hist_cands"] == 1
    assert out[21]["kept"]
