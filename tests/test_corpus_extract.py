"""Corpus generation determinism + the byte-identical extraction invariant."""

from __future__ import annotations

import dataclasses

from pyspark.sql import functions as F

from ckg_spark.corpus.pages import generate_pages_df, iter_pages
from ckg_spark.corpus.vocab import VocabConfig, generate_vocab
from ckg_spark.extract import extract_text, with_extracted_text


def test_vocab_deterministic():
    a = generate_vocab(VocabConfig(seed=7, terms_per_type=30))
    b = generate_vocab(VocabConfig(seed=7, terms_per_type=30))
    assert a.terms == b.terms
    assert a.aliases == b.aliases
    assert a.expected_merges == b.expected_merges


def test_pages_distributed_equals_single_process(spark, pages_cfg):
    df = generate_pages_df(spark, pages_cfg)
    got = {r["url"]: (bytes(r["html"]), r["lang"]) for r in df.collect()}
    exp = {
        p["url"]: (p["html"], p["lang"])
        for p in iter_pages(pages_cfg, iter(range(pages_cfg.n_docs)))
    }
    assert got == exp


def test_pages_partitioning_invariant(spark, pages_cfg):
    """Same corpus regardless of partition count (pure function of id)."""
    cfg2 = dataclasses.replace(pages_cfg, partitions=3)
    a = sorted((r["url"], bytes(r["html"])) for r in generate_pages_df(spark, pages_cfg).collect())
    b = sorted((r["url"], bytes(r["html"])) for r in generate_pages_df(spark, cfg2).collect())
    assert a == b


def test_extract_text_semantics():
    html = (
        b"<html><head><title>T</title><style>x{}</style>"
        b"<script>var bad='cardioma';</script></head>"
        b"<body><h1>Head&amp;line</h1><p>alpha <b>beta</b>gamma&#8212;delta</p>"
        b"<noscript>skip me</noscript></body></html>"
    )
    text = extract_text(html)
    assert "var bad" not in text and "x{}" not in text and "skip me" not in text
    assert "Head&line" in text
    assert "—" in text  # &#8212; unescaped
    assert "  " not in text  # whitespace collapsed
    assert extract_text(None) is None
    # malformed html must not raise and must be deterministic
    junk = b"<p><b>unclosed <i>tags &unknownentity; \xff\xfe raw bytes"
    assert extract_text(junk) == extract_text(junk)


def test_extraction_invariant_byte_identical(spark, pages_cfg):
    """Extractor output per url is identical across partitionings and equals
    the pure-function result (the north-rule per-row invariant)."""
    pages = generate_pages_df(spark, pages_cfg)
    out = with_extracted_text(pages).select("url", "text").collect()
    got = {r["url"]: r["text"] for r in out}
    for p in iter_pages(pages_cfg, iter(range(pages_cfg.n_docs))):
        assert got[p["url"]] == extract_text(p["html"])
    # repartitioned run -> same result
    out2 = with_extracted_text(pages.repartition(5)).select("url", "text").collect()
    assert {r["url"]: r["text"] for r in out2} == got


def test_extract_pushdown_plan(spark, pages_cfg):
    """Projection after extraction must not force html to be read twice;
    plan should be a narrow map (no shuffle)."""
    pages = generate_pages_df(spark, pages_cfg)
    plan = with_extracted_text(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
