"""Outlink extraction and host-graph construction from crawled HTML.

The web-graph feed for :mod:`sketchlib.graph.hyperball` and for link-based
quality signals (in-degree, host authority).  Everything here is pure JVM
column expressions — ``regexp_extract_all`` + ``explode`` + the hardened
``url_host`` — so link extraction over 10^12 pages is whole-stage-codegen
with zero Python crossings and never shuffles page payloads: the only
shuffle in :func:`host_edges` is the final ``groupBy`` over *(src_host,
dst_host)* pairs, already reduced map-side.

Reference parity note: the reference repo (CardinalityEstimation) has no
web-graph surface; this module exists for the graft's Common-Crawl-style
payload (BASELINE.json ``input_hint``: pages with an ``html`` binary
column), feeding HLL counters per the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketchlib.text.urls import url_host

# href value inside an <a ...> tag, either quote style.  RE2-compatible
# (no backreference to the opening quote): the value class excludes both
# quote chars and '>', so a mismatched-quote attribute yields a truncated
# value instead of swallowing the rest of the document.  The attribute
# span and the value are BOUNDED ({0,2000} / {0,4000}): crawled pages
# contain pathological fragments ('<a ' followed by megabytes with no
# '>'), where an unbounded [^>]* makes Java's backtracking quadratic per
# tag — a stuck-task job-killer at corpus scale.  Links living >2000
# chars into a tag's attribute list are dropped by design.
_HREF_RE = r"""(?i)<a\s[^>]{0,2000}?href\s*=\s*["']([^"'>]{0,4000})["']"""


def extract_links_expr(html_col: Column | str) -> Column:
    """``array<string>`` of raw href values from an HTML payload.

    Accepts the ``binary`` html column from the pages table (cast to string
    — crawled pages are stored as UTF-8 per the extraction invariant) or an
    already-string column.  Pure JVM regex; malformed HTML yields whatever
    hrefs are well-formed, never an error.
    """
    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return F.regexp_extract_all(col.cast("string"), F.lit(_HREF_RE), F.lit(1))


def extract_links(df: DataFrame, html_col: str = "html",
                  keep_cols: tuple[str, ...] = ("url",),
                  out_col: str = "link") -> DataFrame:
    """One row per (page, outlink): ``keep_cols... , link``.

    Pages with zero links produce zero rows (inner explode) — callers that
    need page-preserving semantics (e.g. outlink *counts* including zeros)
    should aggregate :func:`extract_links_expr` with ``array_size`` instead
    of exploding.
    """
    return df.select(*keep_cols,
                     F.explode(extract_links_expr(html_col)).alias(out_col))


def host_edges(df: DataFrame, url_col: str = "url", html_col: str = "html",
               include_self: bool = False) -> DataFrame:
    """Host-level link graph: ``(src_host, dst_host, n_links)``.

    * absolute ``http(s)`` hrefs resolve to their own host;
    * protocol-relative (``//host/path``) hrefs resolve by borrowing the
      page's scheme;
    * hrefs with any OTHER scheme (``mailto:``, ``ftp:``, ``javascript:``
      …) are dropped — they are not web navigation, and counting them as
      self-links would silently pad self-edge counts;
    * every remaining href (path-relative, fragment) is same-host
      navigation — kept only when ``include_self=True`` (self edges
      otherwise dominate the graph and say nothing about authority);
    * hrefs whose host cannot be parsed are dropped (``url_host`` returns
      NULL instead of throwing under ANSI mode).

    Scale shape: map-side the plan is scan -> regex -> explode -> project,
    all codegen; the single shuffle carries (src_host, dst_host) pairs
    pre-combined by the hash aggregate.  Host skew (every page links to
    google.com) lands in AQE's skew handling on the aggregate, not a join.
    """
    src_host = url_host(F.col(url_col)).alias("__src")
    links = df.select(src_host, F.col(url_col).alias("__u"),
                      F.explode(extract_links_expr(html_col)).alias("__l"))
    scheme = F.lower(F.try_parse_url(F.col("__u"), F.lit("PROTOCOL")))
    absolute = F.lower(F.col("__l")).rlike(r"^https?://")
    proto_rel = F.col("__l").startswith("//")
    # any other scheme (mailto:, ftp:, javascript:, data:, tel:) is not web
    # navigation -> NULL host, filtered below
    other_scheme = F.col("__l").rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:")
    dst = (F.when(absolute, url_host(F.col("__l")))
            .when(proto_rel, url_host(F.concat(scheme, F.lit(":"), F.col("__l"))))
            .when(other_scheme, F.lit(None).cast("string"))
            .otherwise(F.col("__src")))
    edges = (links
             .select(F.col("__src").alias("src_host"), dst.alias("dst_host"))
             .filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull()))
    if not include_self:
        edges = edges.filter(F.col("src_host") != F.col("dst_host"))
    return (edges.groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links")))
