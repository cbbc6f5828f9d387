"""Deterministic HTML -> text extraction, Arrow-vectorized.

The north rule's per-row invariant: **byte-identical extracted text per
url**, across runs, partitionings, and cluster sizes. So the extractor is a
pure function of the html bytes only — stdlib ``html.parser`` (no external
lib whose version could drift), explicit whitespace normalization, no
locale/environment dependence.

The reference never parses HTML (its inputs are pre-built TSV dumps); this
is the web-corpus generalization of its per-line parser streaming (e.g.
/root/reference src/graphdb_builder/databases/parsers/uniprotParser.py:105-165):
per-record pure-Python work, executed here as a **scalar-iterator pandas
UDF** so the Python worker processes Arrow batches, not rows.

Semantics:
- bytes are decoded UTF-8 with replacement (deterministic for any input);
- <script>/<style>/<noscript>/<template> subtrees are dropped;
- character references are unescaped (convert_charrefs);
- tag boundaries separate tokens; all whitespace runs collapse to a single
  space; leading/trailing whitespace stripped.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._chunks.append(data)

    def text(self) -> str:
        # join chunks with a space, then collapse all whitespace runs
        return " ".join(" ".join(self._chunks).split())


def extract_text(html: bytes | None) -> str | None:
    """Pure function: html bytes -> normalized text. None stays None."""
    if html is None:
        return None
    parser = _TextExtractor()
    parser.feed(html.decode("utf-8", errors="replace"))
    parser.close()
    return parser.text()


@F.pandas_udf(StringType())
def _extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # scalar-iterator form: per-batch overhead amortized, Arrow transfer
    for s in batches:
        yield s.map(extract_text)


def with_extracted_text(pages: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """Fill/overwrite ``out_col`` with the deterministic extraction of ``html_col``.

    Rows that already carry a non-null ``text`` are still recomputed — the
    invariant is defined by the extractor, not by upstream crawlers.
    """
    return pages.withColumn(out_col, _extract_text_udf(F.col(html_col)))
