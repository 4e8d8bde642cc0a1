"""Spark-vs-DuckDB parity on an ADVERSARIAL corpus (tools/edge_corpus.py):
empty / whitespace-only / control-whitespace / punctuation-dense / 5000-char
/ single-token documents. The clean synth corpus never exercises these, and
they found a real bug in r3 (simhash emitted signatures for token-less docs
because split('') is [''], not []).

The full 69-query sweep lives behind `python tools/parity_check.py
<edge_dir>`; this test pins the text-shape-sensitive subset so the suite
stays fast."""

from __future__ import annotations

import os
import subprocess
import sys



REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries whose semantics depend on text shape (tokenization, hashing,
# length, chunking, span synthesis) — the ones the edge corpus can break.
EDGE_SENSITIVE = [
    "dedup_simhash",
    "dedup_exact_payload",
    "token_count",
    "token_count_bpe",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "length_quantiles",
    "vocab_topk",
    "pipeline_extract_flat",
    "chunk_windows",
    "quality_repetition",
    "quality_gopher_rules",
    "dedup_intradoc",
    "quality_c4_rules",
    # r4 wave 2: substring grams + the unigram LM (whose NULL-logppl
    # pandas-NaN trap the edge corpus caught) + the composed datacard
    "dedup_substrings",
    "quality_unigram_logppl",
    "corpus_datacard",
    # r4 wave 3: the bigram LM's and the classifier's Arrow feature stages
    # re-tokenize in Python — pin their parity on control-whitespace /
    # empty-token shapes
    "bigram_logppl",
    "quality_classifier",
    # r4 wave 4: both derive per-doc text statistics feeding exact-integer
    # keep predicates — pin the statistic→threshold boundary on edge shapes
    "sample_soft_quality",
    "quota_tokens_per_source",
    # r4 late wave: text chunks flow through the HTML parser and the
    # per-block ws-collapse/trim — the \x0b / control-char cases pin the
    # whitespace-class discipline through a DOM round-trip
    "html_to_markdown",
    # r4 final wave: span-level strip hashes raw span payloads — the
    # empty/whitespace-only docs collapse to identical '' chunks across
    # docs, exercising the everything-dropped + md5('') path corpus-wide
    "span_boilerplate_strip",
    # its materialization half re-emits full payloads — the value hash
    # pins every surviving edge-shaped span byte-for-byte
    "span_boilerplate_apply",
    # r5: document texts round-trip through REAL container bytes — the
    # punctuation case stresses PDF literal-string escaping ((), \\),
    # the 5000-char case multi-page pagination and TJ splits, and the
    # control-whitespace case the latin-1 encode/decode boundary; WARC
    # wraps the same shapes in length-framed HTTP envelopes
    "pdf_text_extract",
    "warc_ingest",
]


def test_edge_corpus_parity(tmp_path):
    from tools.edge_corpus import build_edge_corpus

    edge_dir = build_edge_corpus(str(tmp_path / "edge_sf"))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py"),
         edge_dir, *EDGE_SENSITIVE],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "ALL PASS" in proc.stdout
