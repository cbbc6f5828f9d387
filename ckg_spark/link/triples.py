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
through exactly ONE shuffle, and that shuffle carries INTEGER node ids:

0. ``node_dictionary``: the canonical node-id vocabulary is
   dimension-sized (UMLS-scale at worst: ~10^7 ids), so each string
   ``node_id`` gets a dense ``nid`` int in node_id sort order. Every
   corpus-scale frame downstream carries the 4-byte ``nid`` instead of
   the string; strings are restored by dimension-sized broadcast joins
   AFTER aggregation, when row counts have collapsed. Measured on the
   150k-doc profile corpus this cut the link stage ~25-30% at both 1
   and 4 pinned cores — the stage is memory-bandwidth-bound, so
   bytes-per-row is the binding cost, exactly the quantity that matters
   at 100 TB shuffle volume too.
1. ``mentions_per_url``: broadcast-join the dimension-sized canonical
   map + dictionary (alias fan-out of stringParser.py:52-58; broadcast
   => hub-entity skew never hits a shuffled join), then a single
   ``groupBy(url)`` collecting the document's (nid, n_hits, n_tokens)
   list. Twin-merge (mentions of canonicalized aliases collapsing to one
   node) happens *inside the array* with higher-order functions — the
   per-document entity count is bounded, so the O(k^2) in-array pass is
   cheap and replaces a second full shuffle on (url, node_id).
2. ``mention_edges`` explodes that frame — narrow — and restores the
   node string with one broadcast join.
3. ``comention_edges`` expands C(k,2) in-array pairs — narrow — PACKED
   into one 8-byte long (shiftleft(nid_a,32)|nid_b; exact integer ops,
   no float round-trip), aggregates on that single long key (a second
   shuffle, but of the much smaller pair table; hot hub pairs are
   absorbed map-side by partial agg), then restores both strings with
   two broadcast joins against the post-aggregation pair table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column
from pyspark.sql.window import Window

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


def node_dictionary(canonical_map: DataFrame) -> DataFrame:
    """(node_id: string, nid: int) — dense ints assigned in node_id SORT
    order, so any ordering computed on ``nid`` (the sorted per-document
    id arrays that make pair emission positional) is identical to the
    ordering the string ids would have produced. Dimension-sized: the
    global row_number window is one tiny single-partition exchange over
    the distinct node ids, and every use site broadcasts it.

    nids feed the shiftleft(nid,32)|nid pair packing in
    :func:`comention_edges`, which silently collides past 2^31 distinct
    nodes — so the id is bounds-checked per row (cheap: the frame is
    dimension-sized) and fails loudly, mirroring mapper_nerve's packing
    guard (ops/mapper.py:224). The lower bound catches row_number's own
    int wrap-around (negative ids) as well."""
    rn = F.row_number().over(Window.orderBy("node_id"))
    guarded = F.when(
        (rn >= F.lit(1)) & (rn <= F.lit((1 << 31) - 1)), rn.cast("int")
    ).otherwise(
        F.raise_error(
            F.lit(
                "node_dictionary: distinct node count exceeds the 2^31-1 "
                "packed-pair-key ceiling; comention pair packing would "
                "silently collide"
            )
        ).cast("int")
    )
    return (
        canonical_map.select("node_id")
        .distinct()
        .withColumn("nid", guarded)
    )


def mentions_per_url(
    mentions: DataFrame,
    canonical_map: DataFrame,
    node_dict: DataFrame | None = None,
) -> DataFrame:
    """(url, ents: array<struct<nid, n_hits, n_tokens>>) — one broadcast
    join + ONE shuffle carrying int node ids; canonicalized twins merged
    in-array (n_hits summed, exactly the semantics of the previous
    (url, node_id) hash aggregate; tests assert bit-equality of the
    emitted triples)."""
    nd = node_dictionary(canonical_map) if node_dict is None else node_dict
    cm = canonical_map.join(nd, "node_id").select("term_id", "nid")
    m = mentions.join(
        F.broadcast(cm),
        mentions["canonical_id"] == cm["term_id"],
        "inner",
    )
    grouped = m.groupBy("url").agg(
        F.collect_list(
            F.struct(
                F.col("nid").cast("int").alias("nid"),
                F.col("n_hits").cast("int").alias("n_hits"),
                F.col("n_tokens").cast("int").alias("n_tokens"),
            )
        ).alias("raw")
    )
    raw = F.col("raw")
    nids = F.array_sort(F.array_distinct(F.transform(raw, lambda e: e["nid"])))
    merged = F.transform(
        nids,
        lambda n: F.struct(
            n.alias("nid"),
            F.aggregate(
                F.filter(raw, lambda e: e["nid"] == n),
                F.lit(0).cast("long"),
                lambda acc, e: acc + e["n_hits"].cast("long"),
            )
            .cast("int")
            .alias("n_hits"),
            F.array_min(
                F.transform(
                    F.filter(raw, lambda e: e["nid"] == n),
                    lambda e: e["n_tokens"],
                )
            ).alias("n_tokens"),
        ),
    )
    # fast path: no canonicalized twins in this doc (nids already unique
    # — the overwhelming case) means nothing to merge; struct comparison
    # sorts by the first field (nid), matching `merged`'s order, so
    # array_sort(raw) is the identical result at O(k log k) instead of
    # the O(k^2) per-node filter passes.
    ents = F.when(F.size(nids) == F.size(raw), F.array_sort(raw)).otherwise(merged)
    return grouped.select("url", ents.alias("ents"))


def mention_edges(per_url: DataFrame, node_dict: DataFrame) -> DataFrame:
    """Narrow explode of the per-document entity lists; the node string
    comes back via the broadcast dictionary (map-side, no shuffle)."""
    e = per_url.select("url", F.explode("ents").alias("e"))
    return e.join(F.broadcast(node_dict), e["e.nid"] == node_dict["nid"]).select(
        F.col("node_id").alias("subj"),
        F.lit(MENTIONED_IN).alias("pred"),
        F.col("url").alias("obj"),
        F.lit("dictionary").alias("source"),
        _link_score(F.col("e.n_hits"), F.col("e.n_tokens")).alias("score"),
    )


def comention_edges(
    per_url: DataFrame,
    node_dict: DataFrame,
    min_score: float | None = None,
) -> DataFrame:
    """Co-mention pairs per document WITHOUT a self-join: the entity list
    is already collected per url, so the C(k,2) pairs expand in-array
    (nids are sorted, and nid order == node_id string order by
    construction, so subj < obj is positional) packed as ONE long key —
    the corpus-scale pair table never materializes a string. Only the
    pair table shuffles for the final count; the post-aggregation result
    (bounded by C(|vocab|, 2)) restores strings via broadcast joins.

    ``min_score`` drops pairs co-mentioned in fewer than that many
    documents — the reference's association score cutoff (STRING >= 0.4,
    databases/config/stringConfig.yml:2 / stringParser.py:51) and the
    practical cap on the quadratic C(k,2) growth at rich-vocabulary scale
    (a 25k-term vocabulary tags ~20 entities/doc => ~190 pairs/doc)."""
    # the nid array is PROJECTED into a column before the expansion:
    # referencing the computed transform(ents→nid) inside the outer
    # lambda would re-evaluate it per element (no CSE through
    # higher-order functions — the documented CLAUDE.md gotcha), turning
    # the O(k²) expansion into O(k³) field extraction on the hot path
    ids = F.col("ids")
    pair_keys = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.shiftleft(x.cast("long"), 32).bitwiseOR(
                    y.cast("long")
                ),
            ),
        )
    )
    pairs = (
        per_url.select(
            F.transform(F.col("ents"), lambda e: e["nid"]).alias("ids")
        )
        .select(F.explode(pair_keys).alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("double").alias("score"))
    )
    if min_score is not None:
        pairs = pairs.filter(F.col("score") >= F.lit(min_score))
    da = node_dict.select(F.col("nid").alias("na"), F.col("node_id").alias("subj"))
    db = node_dict.select(F.col("nid").alias("nb"), F.col("node_id").alias("obj"))
    return (
        pairs.withColumn("na", F.shiftrightunsigned("pk", 32).cast("int"))
        .withColumn("nb", F.col("pk").bitwiseAND(F.lit(0xFFFFFFFF)).cast("int"))
        .join(F.broadcast(da), "na")
        .join(F.broadcast(db), "nb")
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
    mentions: DataFrame,
    terms: DataFrame,
    canonical_map: DataFrame,
    comention_min_score: float | None = None,
) -> DataFrame:
    # The per-url frame feeds two union branches; localCheckpoint(eager)
    # computes its one shuffle exactly once (persist() is not enough: the
    # branches become concurrent stages of the one write job and race past
    # a still-empty cache). The stage's table write is the recovery point,
    # so truncated lineage costs nothing. The dictionary is dimension-sized
    # and recomputed per broadcast — a ~ms window over the distinct node
    # ids, not worth a pinned block.
    nd = node_dictionary(canonical_map)
    per_url = mentions_per_url(mentions, canonical_map, node_dict=nd)
    per_url = per_url.localCheckpoint(eager=True)
    return (
        mention_edges(per_url, nd)
        .unionByName(comention_edges(per_url, nd, min_score=comention_min_score))
        .unionByName(hierarchy_edges(terms, canonical_map))
    )
