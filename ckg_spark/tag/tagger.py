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
        ac = automaton_bc.value  # one deserialization per worker process
        for pdf in batches:
            urls: list[str] = []
            etypes: list[str] = []
            ids: list[str] = []
            surfaces: list[str] = []
            hits: list[int] = []
            toks: list[int] = []
            for url, text in zip(pdf["url"], pdf[text_col]):
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

    mentions = src.mapInPandas(tag, MENTIONS_SCHEMA)
    if blocklist is not None:
        mentions = mentions.join(
            F.broadcast(blocklist.select(F.col("id").alias("canonical_id"))),
            on="canonical_id",
            how="left_anti",
        )
    return mentions
