"""URL canonicalization + canonical-URL dedup (the crawl-frontier /
WARC-dedup normalization pass every web-scale corpus build runs before
content dedup — C4 and RefinedWeb both key their exact-dedup stage on a
normalized URL).

The reference service has no crawler (files arrive by upload,
``main.py:60-77``), so this operator comes from the build contract's
training-data-pipeline mandate, not from reference parity. Semantics are
the standard RFC 3986 §6 normalizations plus the tracking-parameter strip
every production pipeline adds:

1. drop the fragment (``#...`` — never sent to the server);
2. lowercase the scheme and host (case-insensitive per RFC 3986);
3. strip a leading ``www.`` (alias hosts serve identical content);
4. strip default ports (``:443`` for https, ``:80`` for http);
5. strip a single trailing slash from non-root paths; empty path → ``/``;
6. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``) —
   they vary per click, not per resource;
7. sort the surviving query parameters (order is not semantic).

Scale design: every step is a row-local string expression — pure
whole-stage-codegen JVM work, zero shuffles, no UDF. The only HOFs
(``filter``/``array_sort``/``array_join``) run over the handful of query
parameters of ONE url, so the interpreted-lambda cost (perf note #8) is
bounded by the per-row param count, not by corpus size. Downstream dedup
is one hash-aggregate shuffle on the canonical key; at 10^12 rows that is
the minimum possible — one exchange of (canonical_url, doc_id) pairs with
map-side combine collapsing same-partition variants before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Parameter-name prefixes that identify per-click tracking junk. Module
# constant so the DuckDB oracle mirrors the exact same list.
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def _keep_param(x: Column) -> Column:
    cond = x != ""
    for p in TRACKING_PREFIXES:
        cond = cond & ~x.startswith(p)
    return cond


def canonical_url_col(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one codegen expression.

    Assumes the ``scheme://host[:port][/path][?query][#fragment]`` shape
    (guaranteed here by the corpus seeding; a crawler frontier guarantees it
    by construction — relative URLs are resolved before they reach dedup).
    """
    no_frag = F.split(url, "#", 2).getItem(0)
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    tail = F.regexp_replace(rest, r"^[^/?]+", "")  # '/path?query', '?query' or ''

    # host: default port off, then leading www. off
    host = F.when(
        ((scheme == "https") & hostport.endswith(":443"))
        | ((scheme == "http") & hostport.endswith(":80")),
        F.substring_index(hostport, ":", 1),
    ).otherwise(hostport)
    host = F.when(
        host.startswith("www."), host.substr(F.lit(5), F.length(host))
    ).otherwise(host)

    path = F.split(tail, r"\?", 2).getItem(0)
    query = F.when(
        tail.contains("?"), F.split(tail, r"\?", 2).getItem(1)
    ).otherwise(F.lit(""))

    # path: strip ONE trailing slash unless the path is just '/'; '' → '/'
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), (F.length(path) - 1).cast("int")),
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    kept = F.filter(F.split(query, "&"), _keep_param)
    sorted_q = F.array_join(F.array_sort(kept), "&")

    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def canonical_url_dedup(df, url_col: str = "url", id_col: str = "doc_id"):
    """Group a (id, raw url) frame by canonical URL: per canonical key emit
    the keeper (min id — deterministic, restart-stable), the variant count
    and the doc count. Two-level aggregation — (canonical, raw) then
    canonical — instead of ``countDistinct``, whose Expand plan doubles the
    exchanged rows and costs a third shuffle; both levels get map-side
    combine, and the second exchange carries only distinct variants."""
    canon = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(url_col).alias("raw_url"),
        canonical_url_col(F.col(url_col)).alias("canonical_url"),
    )
    per_raw = canon.groupBy("canonical_url", "raw_url").agg(
        F.count("*").alias("n_rows"), F.min("doc_id").alias("min_doc")
    )
    return per_raw.groupBy("canonical_url").agg(
        F.min("min_doc").alias("keeper_doc_id"),
        F.count("*").cast("bigint").alias("n_variants"),
        F.sum("n_rows").cast("bigint").alias("n_docs"),
    )
