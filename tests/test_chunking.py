"""chunk_token_windows + pack_sequences + URL domain extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from text_extract_api_spark.functions.chunking import (
    chunk_token_windows,
    pack_sequences,
)
from text_extract_api_spark.functions.textstats import url_domains_col


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


def test_chunk_windows_starts_and_last_partial(spark):
    # width 5, overlap 2 -> stride 3; 10 words -> chunks [0:5], [3:8], [6:10]
    df = _docs(spark, [(1, _words(10))])
    rows = sorted(
        chunk_token_windows(df, width=5, overlap=2).collect(),
        key=lambda r: r.chunk_no,
    )
    assert [r.chunk_text.split()[0] for r in rows] == ["w0", "w3", "w6"]
    assert [r.n_chunk_tokens for r in rows] == [5, 5, 4]


def test_chunk_windows_tail_inside_overlap_not_emitted(spark):
    # 8 words, width 5, stride 3: [0:5], [3:8]; tail ring == overlap -> done
    df = _docs(spark, [(1, _words(8))])
    assert chunk_token_windows(df, width=5, overlap=2).count() == 2


def test_chunk_windows_short_and_empty_docs(spark):
    df = _docs(spark, [(1, "only three words"), (2, ""), (3, "   ")])
    rows = chunk_token_windows(df, width=5, overlap=2).collect()
    assert len(rows) == 1  # empty/blank docs chunk to nothing
    assert rows[0].doc_id == 1 and rows[0].n_chunk_tokens == 3


def test_chunk_windows_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        chunk_token_windows(_docs(spark, [(1, "x")]), width=4, overlap=4)


def _letters(n):
    # pure-letter words: BPE-proxy count == word count (digits would split)
    return " ".join("w" * (i % 3 + 1) for i in range(n))


def test_pack_sequences_bin_assignment_and_spanning(spark):
    # BPE counts == word counts for pure-letter words; budget 10.
    # doc 1: 6 tok (cum 6), doc 2: 6 tok (cum 12, crosses seq 0->1),
    # doc 3: 25 tok (cum 37, spans seqs 1..3), doc 4: 0 tok.
    df = _docs(spark, [(1, _letters(6)), (2, _letters(6)), (3, _letters(25)), (4, "")])
    out = {r.doc_id: r for r in pack_sequences(df, budget=10, n_parts=2).collect()}
    assert (out[1].seq_id, out[1].seq_offset, out[1].n_seqs_spanned) == (0, 0, 1)
    assert (out[2].seq_id, out[2].seq_offset, out[2].n_seqs_spanned) == (0, 6, 2)
    assert (out[3].seq_id, out[3].seq_offset, out[3].n_seqs_spanned) == (1, 2, 3)
    assert (out[4].seq_id, out[4].seq_offset, out[4].n_seqs_spanned) == (3, 7, 1)


def test_pack_sequences_partitioning_invariant(spark):
    # the two-level scan must equal a single global cumsum whatever n_parts
    df = _docs(spark, [(i, _letters(i % 7 + 1)) for i in range(40)])
    a = sorted(pack_sequences(df, budget=8, n_parts=1).collect())
    b = sorted(pack_sequences(df, budget=8, n_parts=16).collect())
    assert a == b


def _py_chunks(words, width, overlap):
    """Reference chunker: starts at 0, stride, 2*stride …; last partial
    chunk kept only if it adds words beyond the previous chunk's overlap."""
    stride = width - overlap
    if not words:
        return []
    if len(words) <= width:
        return [" ".join(words)]
    out = []
    start = 0
    while start + width <= len(words):
        out.append(" ".join(words[start : start + width]))
        start += stride
    # tail only if it extends past the last full chunk's end (i.e. it
    # contributes words beyond the previous chunk's overlap)
    if start < len(words) and len(words) > (start - stride) + width:
        out.append(" ".join(words[start:]))
    return out


def test_chunk_windows_matches_reference_grid(spark):
    """Exhaustive sweep: every doc length 0..40 under three (width, overlap)
    geometries must equal the pure-Python reference chunker exactly."""
    docs = [(n, _words(n)) for n in range(41)]
    df = _docs(spark, docs)
    for width, overlap in [(5, 2), (8, 0), (7, 6)]:
        got = {}
        for r in chunk_token_windows(df, width=width, overlap=overlap).collect():
            got.setdefault(r.doc_id, []).append((r.chunk_no, r.chunk_text))
        for n, text in docs:
            expect = _py_chunks(text.split(), width, overlap)
            actual = [t for _, t in sorted(got.get(n, []))]
            assert actual == expect, (n, width, overlap)


def test_pack_sequences_global_invariants(spark):
    """Invariants any correct packing must satisfy, checked over the real
    documents table: offsets in [0, budget); seq_id nondecreasing in doc
    order; each doc's (seq_id, seq_offset) equals the running token total
    of every doc before it; spans count matches ceil arithmetic."""
    budget = 257  # deliberately not a round number
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(
        pack_sequences(docs, budget=budget, n_parts=7).collect(),
        key=lambda r: r.doc_id,
    )
    run = 0
    prev_seq = 0
    for r in rows:
        assert 0 <= r.seq_offset < budget
        assert r.seq_id == run // budget
        assert r.seq_offset == run % budget
        assert r.seq_id >= prev_seq
        if r.n_tokens > 0:
            end_seq = (run + r.n_tokens - 1) // budget
        else:
            end_seq = r.seq_id
        assert r.n_seqs_spanned == end_seq - r.seq_id + 1
        run += r.n_tokens
        prev_seq = r.seq_id


def test_url_domains_normalizes(spark):
    df = _docs(
        spark,
        [
            (1, "x https://WWW.Ex.COM/a?b=1 y http://sub.ex.org/p z"),
            (2, "no urls here"),
        ],
    )
    out = {
        r.doc_id: r.d
        for r in df.select("doc_id", url_domains_col(F.col("text")).alias("d")).collect()
    }
    assert out[1] == ["ex.com", "sub.ex.org"]
    assert out[2] == []
