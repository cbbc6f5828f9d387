"""Deterministic, distributed synthetic web-page corpus generator.

Produces the exact input table of BASELINE.json's input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generation is **distributed and driver-light**: ``spark.range(n_docs)`` +
``mapInPandas`` — each page is a pure function of ``(seed, doc_id)``
(``random.Random(seed * 1_000_003 + doc_id)``), so any partitioning, any
cluster size, any retry produces byte-identical html. That is what lets the
extraction invariant ("byte-identical text per url") be tested honestly.

Planted structure (FIXTURES.md §1):
- ~95% ``lang='en'``; other langs also embed mentions, so the language
  filter (≙ the reference's taxid filter,
  /root/reference src/graphdb_builder/databases/parsers/uniprotParser.py:154-159)
  is observably load-bearing;
- 3 hub entities appear in ~30% of English docs (join/agg skew target);
- ~0.1% of urls are repeated-content hubs (exact-dup dedup target);
- blocklisted root terms appear and must be filtered by the tagger;
- mention surfaces appear mixed-case, wrapped in inline tags, next to
  HTML entities — exercising the extractor + lowercase matching
  (mapping.py:67).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .vocab import Vocab

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), False),
    ]
)

_FILLER = (
    "the quick brown fox jumps over a lazy dog while many readers browse "
    "pages about news weather sports travel finance cooking music history "
    "science culture research reports updates articles reviews stories"
).split()

_LANGS = ["de", "fr", "es", "zh"]

_EPOCH_BASE = 1_600_000_000  # fixed, deterministic


@dataclass
class PagesConfig:
    n_docs: int = 2_000
    seed: int = 42
    pct_en: float = 0.95
    hub_rate: float = 0.30       # P(each hub surface appears | en doc)
    dup_url_rate: float = 0.001  # repeated-content hub urls
    mentions_min: int = 2
    mentions_max: int = 8
    words_min: int = 40      # body length; raise for realistic-sized pages
    words_max: int = 160
    partitions: int = 32
    id_offset: int = 0       # first doc id — urls derive from doc ids, so
    #                          disjoint offsets give disjoint url ranges
    #                          (incremental-drop fixtures)
    # filled from vocab:
    surfaces: list[tuple[str, str]] = field(default_factory=list)   # (surface, id)
    hub_surfaces: list[str] = field(default_factory=list)
    root_surfaces: list[str] = field(default_factory=list)          # blocklisted


def config_from_vocab(v: Vocab, **kw) -> PagesConfig:
    cfg = PagesConfig(**kw)
    root_ids = {b["id"] for b in v.blocklist}
    hub_ids = set(v.hub_ids)
    for a in v.aliases:
        cid = a["canonical_id"]
        if cid in root_ids:
            cfg.root_surfaces.append(a["alias"])
        else:
            cfg.surfaces.append((a["alias"], cid))
        if cid in hub_ids and a["source"] == "NAME":
            cfg.hub_surfaces.append(a["alias"])
    return cfg


def _decorate(rng: random.Random, surface: str) -> str:
    """Mixed-case + inline-markup wrapping; tag boundaries still separate
    tokens so the extractor output keeps the surface intact."""
    style = rng.randint(0, 5)
    s = surface
    if style == 1:
        s = s.upper()
    elif style == 2:
        s = s.title()
    wrap = rng.randint(0, 3)
    if wrap == 1:
        s = f"<b>{s}</b>"
    elif wrap == 2:
        s = f'<a href="/x">{s}</a>'
    return s


def _page_body(rng: random.Random, cfg: PagesConfig, is_en: bool) -> str:
    words: list[str] = []
    n_words = rng.randint(cfg.words_min, cfg.words_max)
    for _ in range(n_words):
        words.append(rng.choice(_FILLER))
    # splice mentions at random positions
    mentions: list[str] = []
    if cfg.surfaces:
        for hub in cfg.hub_surfaces:
            if rng.random() < cfg.hub_rate:
                mentions.append(hub)
        k = rng.randint(cfg.mentions_min, cfg.mentions_max)
        for _ in range(k):
            mentions.append(rng.choice(cfg.surfaces)[0])
        if cfg.root_surfaces and rng.random() < 0.2:
            mentions.append(rng.choice(cfg.root_surfaces))
    for m in mentions:
        pos = rng.randint(0, len(words))
        words.insert(pos, _decorate(rng, m))
    # sprinkle entities
    for _ in range(rng.randint(0, 4)):
        words.insert(rng.randint(0, len(words)), rng.choice(["&amp;", "&#8212;", "&lt;tag&gt;"]))
    paras = []
    i = 0
    while i < len(words):
        j = min(len(words), i + rng.randint(15, 40))
        paras.append("<p>" + " ".join(words[i:j]) + "</p>")
        i = j
    return "\n".join(paras)


def _gen_one(seed: int, doc_id: int, cfg: PagesConfig) -> tuple[str, int, bytes, str]:
    rng = random.Random(seed * 1_000_003 + doc_id)
    is_dup = rng.random() < cfg.dup_url_rate
    lang = "en" if rng.random() < cfg.pct_en else rng.choice(_LANGS)
    if is_dup:
        # repeated-content hub: body AND title come from one of 17 canonical
        # streams, so extracted text is byte-identical across the dup urls
        crng = random.Random(seed * 7_000_003 + (doc_id % 17))
        body = _page_body(crng, cfg, True)
        title = " ".join(crng.choice(_FILLER) for _ in range(4))
        lang = "en"
    else:
        body = _page_body(rng, cfg, lang == "en")
        title = " ".join(rng.choice(_FILLER) for _ in range(4))
    html = (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        "<style>body{margin:0;color:#222}</style>"
        "<script>var t=1;function f(){return 'no mentions here cardioma';}</script>"
        "</head><body>"
        f"<h1>{title}</h1>\n{body}\n"
        '<div class="nav"><span>home</span><span>about</span></div>'
        "<noscript>enable js</noscript>"
        "</body></html>"
    )
    url = f"https://example.org/{doc_id:010d}"
    ts = _EPOCH_BASE + doc_id * 3600
    return url, ts, html.encode("utf-8"), lang


def iter_pages(cfg: PagesConfig, ids: Iterator[int]):
    """Single-process generator over explicit doc ids (used by the oracle)."""
    for i in ids:
        url, ts, html, lang = _gen_one(cfg.seed, i, cfg)
        yield {"url": url, "warc_ts": ts, "html": html, "lang": lang}


def generate_pages_df(spark: SparkSession, cfg: PagesConfig) -> DataFrame:
    """Distributed generation: no page data ever materializes on the driver."""
    cfg_bc = spark.sparkContext.broadcast(cfg)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = cfg_bc.value
        for pdf in batches:
            rows = [_gen_one(c.seed, int(i), c) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r[0] for r in rows],
                    "warc_ts": pd.to_datetime([r[1] for r in rows], unit="s"),
                    "html": [r[2] for r in rows],
                    "text": pd.Series([None] * len(rows), dtype="object"),
                    "lang": [r[3] for r in rows],
                }
            )

    base = spark.range(cfg.id_offset, cfg.id_offset + cfg.n_docs, 1, cfg.partitions)
    return base.mapInPandas(gen, PAGES_SCHEMA)
