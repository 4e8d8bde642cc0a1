"""URL canonicalization: step-by-step normalization + dedup semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_extract_api_spark.functions.urlnorm import (
    canonical_url_col,
    canonical_url_dedup,
)


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonical_url_col(F.col("url")).alias("c")).first()["c"]


def test_case_port_www_fragment(spark):
    assert (
        _canon(spark, "HTTPS://WWW.Example.COM:443/a/b?x=1#frag")
        == "https://example.com/a/b?x=1"
    )


def test_http_default_port_stripped_https_port_80_kept(spark):
    assert _canon(spark, "http://h.com:80/p") == "http://h.com/p"
    # :80 is NOT the default for https — must survive
    assert _canon(spark, "https://h.com:80/p") == "https://h.com:80/p"
    # non-default port survives
    assert _canon(spark, "https://h.com:8443/p") == "https://h.com:8443/p"


def test_trailing_slash_and_root(spark):
    assert _canon(spark, "https://h.com/a/") == "https://h.com/a"
    # root slash is preserved; empty path becomes root
    assert _canon(spark, "https://h.com/") == "https://h.com/"
    assert _canon(spark, "https://h.com") == "https://h.com/"


def test_tracking_params_dropped_and_sorted(spark):
    assert (
        _canon(spark, "https://h.com/p?z=2&utm_source=x&a=1&fbclid=F&gclid=G")
        == "https://h.com/p?a=1&z=2"
    )
    # all params tracking → no '?' at all
    assert _canon(spark, "https://h.com/p?utm_a=1&utm_b=2") == "https://h.com/p"


def test_param_order_insensitive(spark):
    a = _canon(spark, "https://h.com/p?b=2&a=1")
    b = _canon(spark, "https://h.com/p?a=1&b=2")
    assert a == b == "https://h.com/p?a=1&b=2"


def test_www_only_stripped_as_prefix_label(spark):
    # 'www.' mid-host or a host that IS 'www.x' variant: only the leading
    # label goes; 'wwwx.com' untouched
    assert _canon(spark, "https://wwwx.com/p") == "https://wwwx.com/p"
    assert _canon(spark, "https://www.www.h.com/p") == "https://www.h.com/p"


def test_dedup_groups_variants(spark):
    rows = [
        (1, "https://www.h.com/a?id=1&ref=x"),
        (2, "HTTPS://h.com:443/a/?ref=x&id=1"),
        (3, "https://h.com/a?id=1&ref=x&utm_source=feed#s"),
        (4, "https://h.com/other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["canonical_url"]: r
        for r in canonical_url_dedup(df).collect()
    }
    assert len(out) == 2
    grp = out["https://h.com/a?id=1&ref=x"]
    assert grp["keeper_doc_id"] == 1
    assert grp["n_docs"] == 3
    assert grp["n_variants"] == 3  # three distinct raw spellings
    assert out["https://h.com/other"]["n_docs"] == 1
