"""Property-based tests (hypothesis) for the pure extractor cores."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from text_extract_api_spark.extractors.html import extract_main_content_py
from tests.oracle import anonymize, norm, strip_md

text_st = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="<>&\x00"),
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_norm_idempotent(s):
    assert norm(norm(s)) == norm(s)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_anonymize_idempotent(s):
    assert anonymize(anonymize(s)) == anonymize(s)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_anonymize_leaves_no_emails(s):
    out = anonymize(s + " someone@example.com")
    assert not re.search(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", out)


@settings(max_examples=100, deadline=None)
@given(text_st)
def test_html_wrapper_roundtrip(s):
    """Any benign text wrapped in the content template survives extraction."""
    html = f"<html><body><nav><a href='/'>x</a></nav><article><p>{s}</p></article></body></html>"
    assert extract_main_content_py(html) == norm(s)


@settings(max_examples=100, deadline=None)
@given(text_st)
def test_strip_md_idempotent(s):
    assert strip_md(strip_md(s)) == strip_md(s)
