"""URL utilities for Common-Crawl-style pipelines — all JVM column
expressions (whole-stage codegen; zero Python).

Normalization here is the *dedup key* sense used by CC processing: two urls
that normalize equal almost certainly point at the same resource. It is
deliberately conservative (no path case-folding — paths are case-sensitive).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that never change the resource (tracking)
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid", "msclkid", "mc_cid",
                   "mc_eid")

_SCHEME = r"[a-zA-Z][a-zA-Z0-9+.-]*"


def url_host(col: Column) -> Column:
    """Lowercased host, `www.` stripped.  NULL for malformed input:
    ``try_parse_url``, NOT ``parse_url`` — under ANSI mode (the Spark 4
    default) ``parse_url`` THROWS on an invalid URL, so one malformed row
    in a web corpus would kill the whole job instead of yielding a null
    key."""
    host = F.lower(F.try_parse_url(col, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def url_domain(col: Column) -> Column:
    """Registrable-ish domain: last two host labels (heuristic — a full
    public-suffix list would be bundled data in production)."""
    return F.regexp_extract(url_host(col), r"([^.]+\.[^.]+)$", 1)


def strip_tracking_params(col: Column) -> Column:
    """Remove known tracking query parameters; repair separators.

    Operates structurally — split at the first '?' (query start) and
    first '#' (fragment start), edit only the query, reassemble — so an
    RFC-legal '&' in the *path* ('https://e.com/a&b?utm_source=x') is
    never promoted to '?', and a dangling '?' (empty query, whether we
    emptied it or the input arrived as 'https://e.com/a?') is always
    dropped: '?' with no parameters never changes the resource, so the
    strip is safe unconditionally.  Separator repair (collapsing the
    '&&' / leading / trailing '&' left by a blanked param) applies ONLY
    when a tracking param was actually stripped — a query containing no
    tracking params passes through byte-identical (repairing pre-existing
    odd-but-legal separators would silently alter clean URLs)."""
    frag = F.regexp_extract(col, r"(#.*)$", 1)        # '' when no fragment
    body = F.regexp_replace(col, r"#.*$", "")
    base = F.substring_index(body, "?", 1)            # whole body if no '?'
    query = F.regexp_extract(body, r"^[^?]*\?(.*)$", 1)
    # blank each tracking param in place (lookbehind keeps the '&'
    # separators so consecutive tracking params each match), then
    # collapse the separators the blanking left behind
    pat = "(?:^|(?<=&))(?:" + "|".join(TRACKING_PARAMS) + ")=[^&]*"
    q0 = F.regexp_replace(query, pat, "")
    q = F.regexp_replace(q0, "&&+", "&")
    q = F.regexp_replace(q, "^&+|&+$", "")
    cleaned = F.when(q == "", base).otherwise(
        F.concat(base, F.lit("?"), q))
    untouched = F.when(query == "", base).otherwise(
        F.concat(base, F.lit("?"), query))
    rebuilt = F.when(q0 != query, cleaned).otherwise(untouched)
    return F.concat(rebuilt, frag)


def normalize_url(col: Column) -> Column:
    """Canonical dedup key: lowercase scheme+host, strip www / default ports /
    fragments / tracking params / trailing slash."""
    u = F.trim(col)
    # scheme-less / malformed input passes through as-is: regexp_extract
    # returns '' on no match, so the unconditional rebuild would collapse
    # EVERY such row to the constant ':/' — one shared dedup key that
    # deletes all-but-one malformed row corpus-wide
    is_url = u.rlike(f"^{_SCHEME}://")
    scheme = F.lower(F.regexp_extract(u, f"^({_SCHEME})://", 1))
    host = F.lower(F.regexp_extract(u, f"^{_SCHEME}://([^/?#]*)", 1))
    rest = F.regexp_extract(u, f"^{_SCHEME}://[^/?#]*(.*)$", 1)
    u = F.when(is_url, F.concat(scheme, F.lit("://"), host, rest)) \
        .otherwise(u)
    u = F.regexp_replace(u, r"^(\w+://)www\.", "$1")
    # fragment BEFORE ports: 'https://h:443#f' must still drop the default
    # port (with the fragment in place, '#' follows ':443' and the port
    # pattern's (/|?|$) terminator would miss it — the port would then be
    # stripped on a SECOND normalization pass, a non-idempotent dedup key)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^(\w+://[^/:?#]*):80(/|\?|$)", "$1$2")
    u = F.regexp_replace(u, r"^(\w+://[^/:?#]*):443(/|\?|$)", "$1$2")
    u = strip_tracking_params(u)
    # trailing slash: only when preceded by a path/host character — a bare
    # 'scheme://' must keep its slashes (stripping one yields 'scheme:/',
    # which no longer parses as a URL and re-normalizes differently)
    u = F.regexp_replace(u, r"([^:/])/$", "$1")
    return u


def filter_blocked_domains(df, blocklist, url_col: str = "url",
                           level: str = "domain"):
    """Drop every row whose URL's registrable domain (or full host, with
    ``level="host"``) appears in ``blocklist`` — the standard
    adult/malware/spam domain-list filter of CC-style pipelines.

    ``blocklist`` is a single-column DataFrame of lowercase domains (UT1,
    StevenBlack and friends are a few million rows — far under the
    broadcast threshold), so the filter is a **broadcast left-anti hash
    join**: map-only, no shuffle of the corpus, no Python.  The join key
    is derived in the same codegen stage as the scan.  A plain Python
    sequence of domain strings is accepted too (localized to one
    DataFrame driver-side); an empty blocklist keeps every row.

    Returns the kept rows with the derived key appended as ``__blockkey``
    dropped — i.e. the original schema.
    """
    if level not in ("domain", "host"):
        raise ValueError(f"level must be 'domain' or 'host', got {level!r}")
    if not isinstance(blocklist, DataFrame):
        domains = [(str(d),) for d in blocklist]
        if not domains:
            return df
        blocklist = df.sparkSession.createDataFrame(
            domains, "__blocked_domain string")
    key = url_domain(F.col(url_col)) if level == "domain" \
        else url_host(F.col(url_col))
    # uniquified temp name: withColumn would silently REPLACE (then drop) a
    # pre-existing user column of the same name
    k = "__blockkey"
    while k in df.columns:
        k += "_"
    bcol = blocklist.columns[0]
    bl = blocklist.select(F.lower(F.col(bcol)).alias(k)).distinct()
    kept = df.withColumn(k, key).join(F.broadcast(bl), k, "left_anti")
    return kept.drop(k)
