"""PII scrubbing — redact emails / IPv4 addresses / phone-like numbers.

The content-safety pass every public-web training pipeline runs before
tokenization (C4 strips pages on a blocklist and later pipelines redact
contact strings; see also the CCNet/RefinedWeb cleaning stages). Pure JVM
``regexp_replace`` chains — no Python in the hot path, one projection,
zero shuffles (the counts are per-row column math).

Pattern notes (cross-engine contract):
- every pattern is RE2-compatible (no lookaround, no backreferences), so
  the DuckDB oracle runs the IDENTICAL regex text — Java and RE2 agree
  on this subset;
- replacement order is load-bearing: emails first (their local parts can
  contain digit runs a phone pattern would eat), then IPv4 (digit-dot
  runs also phone-shaped), then phones — each replacement token contains
  no digits, so later passes cannot re-match earlier redactions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\s.-]{6,}[0-9]"

_PASSES = [(EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")]


def scrub_text(text: Column) -> Column:
    out = text
    for pat, token in _PASSES:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_pii(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, clean_text, n_emails, n_ips, n_phones): redacted text plus
    per-kind match counts. Counts are taken pass-by-pass on the
    PROGRESSIVELY scrubbed text (an email is counted once as an email,
    never again as a phone) — same order as the replacements."""
    t0 = F.col(text_col)
    after_email = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    return docs.select(
        F.col(id_col).alias("doc"),
        F.regexp_replace(after_ip, PHONE_RE, "<PHONE>").alias("clean_text"),
        F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), 0)).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
        .cast("bigint")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
        .cast("bigint")
        .alias("n_phones"),
    )
