"""Entity linking + triple emission.

Output contract mirrors the reference importer's edge TSVs
(``START_ID, END_ID, TYPE[, source, score]`` — /root/reference
src/graphdb_builder/builder_utils.py:123-138, textmining header
src/graphdb_builder/databases/parsers/textminingParser.py:93):

- ``(entity, MENTIONED_IN_PUBLICATION, url)`` ≙ textminingParser mention
  edges (textminingParser.py:87-93), with a deterministic link score in
  pure JVM column math (the batched-pandas-UDF surface lives in the
  extract/tag stages where per-document parsing genuinely needs Python);
- ``(a, ASSOCIATED_WITH, b)`` co-mention edges ≙ the jensenlab-style
  association pairs (databases/parsers/jensenlabParser.py:24-50), scored by
  distinct-document co-mention count;
- ``(child, HAS_PARENT, parent)`` ≙ oboParser is_a edges
  (ontologies/parsers/oboParser.py:6-50).

Shuffle budget — the whole stage moves the corpus-scale mention table
through exactly ONE shuffle:

1. ``mentions_per_url``: broadcast-join the dimension-sized canonical map
   (alias fan-out of stringParser.py:52-58; broadcast => hub-entity skew
   never hits a shuffled join), then a single ``groupBy(url)`` collecting
   the document's entity list. Twin-merge (mentions of canonicalized
   aliases collapsing to one node) happens *inside the array* with
   higher-order functions — the per-document entity count is bounded, so
   the O(k^2) in-array pass is cheap and replaces a second full shuffle on
   (url, node_id).
2. ``mention_edges`` explodes that frame — narrow.
3. ``comention_edges`` expands C(k,2) in-array pairs — narrow — and
   aggregates on the pair key (a second shuffle, but of the much smaller
   pair table; hot hub pairs are absorbed map-side by partial agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

TRIPLES_COLUMNS = ["subj", "pred", "obj", "source", "score"]

MENTIONED_IN = "MENTIONED_IN_PUBLICATION"
ASSOCIATED_WITH = "ASSOCIATED_WITH"
HAS_PARENT = "HAS_PARENT"


def _link_score(n_hits: Column, n_tokens: Column) -> Column:
    """Deterministic per-mention link confidence: hits / sqrt(doc length).

    Pure JVM column math (whole-stage codegen) — a 2-op formula does not
    justify an Arrow round-trip in the corpus-scale mention-edge
    projection, the pipeline's hottest narrow stage; the batched-pandas-UDF
    requirement applies to per-document *parsing* (extract/tag), which
    keeps it. ``bround`` is IEEE half-even, bit-for-bit the semantics of
    the previous numpy ``round(6)`` and of the oracle's Python ``round``
    (ckg_spark/oracle.py:146) — the bit-exact score gate is unchanged."""
    return F.bround(
        n_hits.cast("double") / F.sqrt(n_tokens.cast("double")), 6
    )


def mentions_per_url(mentions: DataFrame, canonical_map: DataFrame) -> DataFrame:
    """(url, ents: array<struct<node_id, entity_type, n_hits, n_tokens>>)
    — one broadcast join + ONE shuffle; canonicalized twins merged in-array
    (n_hits summed, entity_type = min, exactly the semantics of the
    previous (url, node_id) hash aggregate; tests assert bit-equality)."""
    m = mentions.join(
        F.broadcast(canonical_map),
        mentions["canonical_id"] == canonical_map["term_id"],
        "inner",
    )
    grouped = m.groupBy("url").agg(
        F.collect_list(
            F.struct("node_id", "entity_type", "n_hits", "n_tokens")
        ).alias("raw")
    )
    raw = F.col("raw")
    node_ids = F.array_sort(F.array_distinct(F.transform(raw, lambda e: e["node_id"])))
    merged = F.transform(
        node_ids,
        lambda nid: F.struct(
            nid.alias("node_id"),
            F.array_min(
                F.transform(
                    F.filter(raw, lambda e: e["node_id"] == nid),
                    lambda e: e["entity_type"],
                )
            ).alias("entity_type"),
            F.aggregate(
                F.filter(raw, lambda e: e["node_id"] == nid),
                F.lit(0).cast("long"),
                lambda acc, e: acc + e["n_hits"].cast("long"),
            )
            .cast("int")
            .alias("n_hits"),
            F.array_min(
                F.transform(
                    F.filter(raw, lambda e: e["node_id"] == nid),
                    lambda e: e["n_tokens"],
                )
            ).alias("n_tokens"),
        ),
    )
    # fast path: no canonicalized twins in this doc (node_ids already
    # unique — the overwhelming case) means nothing to merge; struct
    # comparison sorts by the first field (node_id), matching `merged`'s
    # order, so array_sort(raw) is the identical result at O(k log k)
    # instead of the O(k^2) per-node filter passes.
    ents = F.when(F.size(node_ids) == F.size(raw), F.array_sort(raw)).otherwise(merged)
    return grouped.select("url", ents.alias("ents"))


def mention_edges(per_url: DataFrame) -> DataFrame:
    """Narrow explode of the per-document entity lists."""
    e = per_url.select("url", F.explode("ents").alias("e"))
    return e.select(
        F.col("e.node_id").alias("subj"),
        F.lit(MENTIONED_IN).alias("pred"),
        F.col("url").alias("obj"),
        F.lit("dictionary").alias("source"),
        _link_score(F.col("e.n_hits"), F.col("e.n_tokens")).alias("score"),
    )


def comention_edges(per_url: DataFrame, min_score: float | None = None) -> DataFrame:
    """Co-mention pairs per document WITHOUT a self-join: the entity list
    is already collected per url, so the C(k,2) pairs expand in-array
    (node_ids are sorted, so subj < obj is positional) and only the pair
    table shuffles for the final count.

    ``min_score`` drops pairs co-mentioned in fewer than that many
    documents — the reference's association score cutoff (STRING >= 0.4,
    databases/config/stringConfig.yml:2 / stringParser.py:51) and the
    practical cap on the quadratic C(k,2) growth at rich-vocabulary scale
    (a 25k-term vocabulary tags ~20 entities/doc => ~190 pairs/doc)."""
    ids = F.transform(F.col("ents"), lambda e: e["node_id"])  # sorted already
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("subj"), y.alias("obj")),
            ),
        )
    )
    pairs = (
        per_url.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.subj").alias("subj"), F.col("p.obj").alias("obj"))
        .agg(F.count(F.lit(1)).cast("double").alias("score"))
    )
    if min_score is not None:
        pairs = pairs.filter(F.col("score") >= F.lit(min_score))
    return pairs.select(
        "subj",
        F.lit(ASSOCIATED_WITH).alias("pred"),
        "obj",
        F.lit("dictionary").alias("source"),
        "score",
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
    mentions: DataFrame,
    terms: DataFrame,
    canonical_map: DataFrame,
    comention_min_score: float | None = None,
) -> DataFrame:
    # The per-url frame feeds two union branches; localCheckpoint(eager)
    # computes its one shuffle exactly once (persist() is not enough: the
    # branches become concurrent stages of the one write job and race past
    # a still-empty cache). The stage's table write is the recovery point,
    # so truncated lineage costs nothing.
    per_url = mentions_per_url(mentions, canonical_map).localCheckpoint(eager=True)
    return (
        mention_edges(per_url)
        .unionByName(comention_edges(per_url, min_score=comention_min_score))
        .unionByName(hierarchy_edges(terms, canonical_map))
    )
