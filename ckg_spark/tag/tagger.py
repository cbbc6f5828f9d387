"""Dictionary mention tagging: broadcast automaton applied in mapInPandas.

Pipeline position: pages(text) -> mentions(url, entity_type, canonical_id,
surface_lc, n_hits). Mirrors the consumption contract of the reference's
textmining importer (/root/reference
src/graphdb_builder/databases/parsers/textminingParser.py):

- per-(doc, entity) dedup with hit count (n_hits ≙ the tagger's mention
  counts that feed scores);
- blocklist filter on canonical id (textminingParser.py:113-114), applied
  as a broadcast left-anti join so it is visible in the plan and prunable;
- language filter ≙ organism/taxid filter (uniprotParser.py:154-159).

Scale shape: the only shuffle this stage needs is none at all — tagging is
a narrow map over pages partitions; dedup happens inside the UDF per
document, so no groupBy is required. The automaton rides a broadcast
variable, deserialized once per executor.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# n_tokens (doc length) rides along so link-scoring never needs to join
# back to the pages table (avoids a big-big shuffle at corpus scale).
MENTIONS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("entity_type", StringType(), False),
        StructField("canonical_id", StringType(), False),
        StructField("surface_lc", StringType(), False),
        StructField("n_hits", IntegerType(), False),
        StructField("n_tokens", IntegerType(), False),
    ]
)


def _tag_batches(
    automaton_bc: Broadcast, doc_iter
) -> Iterator[pd.DataFrame]:
    """Shared accumulation: (url, text) pairs -> mention frame batches.
    ``doc_iter`` yields lists of (url, text)."""
    ac = automaton_bc.value  # one deserialization per worker process
    for docs in doc_iter:
        urls: list[str] = []
        etypes: list[str] = []
        ids: list[str] = []
        surfaces: list[str] = []
        hits: list[int] = []
        toks: list[int] = []
        for url, text in docs:
            # per-doc dedup: (etype, id) -> [count, min surface]
            acc: dict[tuple[str, str], list] = {}
            for _s, _e, surface, (etype, cid) in ac.find(text):
                cur = acc.get((etype, cid))
                if cur is None:
                    acc[(etype, cid)] = [1, surface]
                else:
                    cur[0] += 1
                    if surface < cur[1]:
                        cur[1] = surface
            n_tok = len(text.split())
            for (etype, cid), (cnt, surface) in acc.items():
                urls.append(url)
                etypes.append(etype)
                ids.append(cid)
                surfaces.append(surface)
                hits.append(cnt)
                toks.append(n_tok)
        yield pd.DataFrame(
            {
                "url": urls,
                "entity_type": pd.Series(etypes, dtype="object"),
                "canonical_id": pd.Series(ids, dtype="object"),
                "surface_lc": pd.Series(surfaces, dtype="object"),
                "n_hits": pd.Series(hits, dtype="int32"),
                "n_tokens": pd.Series(toks, dtype="int32"),
            }
        )


def _with_blocklist(mentions: DataFrame, blocklist: DataFrame | None) -> DataFrame:
    if blocklist is None:
        return mentions
    return mentions.join(
        F.broadcast(blocklist.select(F.col("id").alias("canonical_id"))),
        on="canonical_id",
        how="left_anti",
    )


def tag_mentions(
    pages: DataFrame,
    automaton_bc: Broadcast,
    blocklist: DataFrame | None = None,
    lang: str | None = "en",
    text_col: str = "text",
) -> DataFrame:
    """pages must carry (url, text). Returns the mentions DataFrame."""
    src = pages
    if lang is not None:
        src = src.filter(F.col("lang") == F.lit(lang))
    src = src.select("url", text_col).filter(F.col(text_col).isNotNull())

    def tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _tag_batches(
            automaton_bc,
            (list(zip(pdf["url"], pdf[text_col])) for pdf in batches),
        )

    return _with_blocklist(src.mapInPandas(tag, MENTIONS_SCHEMA), blocklist)


def tag_pages_fused(
    pages: DataFrame,
    automaton_bc: Broadcast,
    blocklist: DataFrame | None = None,
    lang: str | None = "en",
    html_col: str = "html",
) -> DataFrame:
    """Extract + tag in ONE Python pass over (url, html).

    vs. chaining ``with_extracted_text`` then ``tag_mentions``: the
    extracted text never crosses the Arrow boundary back to the JVM only to
    cross again into the tag UDF — at corpus scale that is a full extra
    round-trip of the whole corpus text. The lang filter sits on a real
    source column here, so it reaches the parquet scan (PushedFilters) and
    non-matching documents are never even decoded."""
    from ..extract.html_text import extract_text

    src = pages
    if lang is not None:
        src = src.filter(F.col("lang") == F.lit(lang))
    src = src.select("url", html_col).filter(F.col(html_col).isNotNull())

    def extract_and_tag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from _tag_batches(
            automaton_bc,
            (
                [(url, extract_text(html)) for url, html in zip(pdf["url"], pdf[html_col])]
                for pdf in batches
            ),
        )

    return _with_blocklist(src.mapInPandas(extract_and_tag, MENTIONS_SCHEMA), blocklist)
