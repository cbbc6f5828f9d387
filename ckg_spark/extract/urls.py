"""URL canonicalization + canonical-URL dedup for web-page corpora.

Every production crawl pipeline dedups on a CANONICAL url before any
content-based pass (CCNet/C4/RefinedWeb all do a url-level dedup first —
it removes the bulk of recrawl duplicates for the cost of one hash-agg
shuffle, before the expensive MinHash machinery ever sees the bytes).
The reference has no crawling layer; this belongs to the engine's
web-scale retarget (the input_hint table is keyed by url).

Everything here is JVM column math (regexp_replace chains) — no Python
in the hot path — and the rules are frozen, documented normalizations
so canonical ids are deterministic and reproducible across runs:

1. lowercase scheme and host[:port] (ONLY those — userinfo, path and
   query stay case-exact; credentials are case-sensitive);
2. strip the fragment (#...);
3. strip known tracking params (utm_*, fbclid, gclid, msclkid, mc_eid,
   ref, referrer) wherever they appear in the query string;
4. strip default ports (:80 for http, :443 for https);
5. drop a bare trailing "?" left by param stripping;
6. collapse a trailing "/" on an otherwise-empty path.

Dedup keeps the EARLIEST capture per canonical url (warc_ts, then raw
url as the total-order tiebreak) via min_by — one partial-aggregated
shuffle carrying (canonical_url, chosen row), never a window sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = "(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref|referrer)"


def canonical_url(url: Column) -> Column:
    """The canonicalization chain, entirely in JVM regexp/string ops."""
    u = F.trim(url)
    # 1. lowercase scheme and host[:port] ONLY — userinfo (user:pass@)
    #    stays case-exact like path/query: credentials are case-sensitive,
    #    so lowercasing them would collapse distinct resources into one
    #    canonical id and dedup would silently drop a capture. userinfo =
    #    authority up to the LAST '@' (greedy), host:port = the remainder.
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    auth = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    userinfo = F.regexp_extract(auth, r"^(.*)@[^@]*$", 1)
    hostport = F.lower(F.regexp_extract(auth, r"([^@]*)$", 1))
    head = F.concat(
        scheme,
        F.lit("://"),
        F.when(userinfo == "", F.lit("")).otherwise(F.concat(userinfo, F.lit("@"))),
        hostport,
    )
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.when(scheme == "", u).otherwise(F.concat(head, rest))
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. tracking params: the lookbehind keeps the preceding delimiter OUT
    #    of the match (a pattern that consumed the '&' joiner made the
    #    scanner resume past the next param, so the second of two adjacent
    #    tracking params survived and permuted recrawl urls got different
    #    canonical ids); each match eats its own trailing '&' when present
    u = F.regexp_replace(u, rf"(?<=[?&]){_TRACKING}=[^&#]*&?", "")
    # a query that now starts with '&' lost its first param: promote to '?'
    u = F.regexp_replace(u, r"\?&", "?")
    # stripping the last param can leave a trailing delimiter
    u = F.regexp_replace(u, r"[?&]+$", "")
    # 4. default ports
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443(?=[/?#]|$)", "$1")
    # 5. bare trailing '?'
    u = F.regexp_replace(u, r"\?$", "")
    # 6. trailing slash on an empty path ("http://x.com/" == "http://x.com")
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", "$1")
    return u


def dedup_by_canonical_url(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """One row per canonical url: the earliest capture (ts, then raw url —
    an explicit total order, never first()-under-shuffle). min_by keeps
    the whole-row struct so the shuffle carries one candidate per
    (partition, canonical) — map-side combined, no window sort."""
    cols = pages.columns
    c = pages.withColumn("canonical_url", canonical_url(F.col(url_col)))
    picked = c.groupBy("canonical_url").agg(
        F.min_by(
            F.struct(*cols), F.struct(F.col(ts_col), F.col(url_col))
        ).alias("_row")
    )
    return picked.select("canonical_url", *[F.col(f"_row.{x}").alias(x) for x in cols])
