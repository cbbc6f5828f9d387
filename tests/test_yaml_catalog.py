"""YAML knowledge-query catalog over a built graph (parity with the
reference's query_utils, SURVEY.md §3.3)."""

from __future__ import annotations

import pytest

from ckg_spark.corpus.pages import config_from_vocab
from ckg_spark.corpus.vocab import VocabConfig, generate_vocab
from ckg_spark.pipeline import KGPipeline
from ckg_spark.queries.yaml_catalog import (
    find_queries_involving_nodes,
    find_queries_involving_relationships,
    read_knowledge_queries,
    run_query,
)


@pytest.fixture(scope="module")
def graph_wh(spark, tmp_path_factory):
    wh_root = str(tmp_path_factory.mktemp("kq_wh"))
    vocab_cfg = VocabConfig(seed=7, terms_per_type=30)
    vocab = generate_vocab(vocab_cfg)
    pages_cfg = config_from_vocab(vocab, n_docs=150, seed=42, partitions=8)
    KGPipeline(spark, wh_root, vocab_cfg=vocab_cfg, pages_cfg=pages_cfg).run()
    return wh_root


def test_catalog_loads_and_filters():
    qs = read_knowledge_queries()
    assert len(qs) >= 5
    disease_qs = find_queries_involving_nodes(qs, ["Disease", "Publication"])
    assert "disease_mentions" in disease_qs
    assert "entity_associations" not in disease_qs  # no Publication there
    rel_qs = find_queries_involving_relationships(qs, ["HAS_PARENT"])
    assert "disease_parents_rollup" in rel_qs


def test_disease_mentions_runs(spark, graph_wh):
    df = run_query(spark, graph_wh, "disease_mentions", {"TOPK": 5})
    rows = df.collect()
    assert 0 < len(rows) <= 5
    assert rows[0]["n_docs"] >= rows[-1]["n_docs"]


def test_entity_associations_placeholders(spark, graph_wh):
    # pick a real associated entity from the edges table
    from ckg_spark.lakehouse import Warehouse

    edges = Warehouse(graph_wh).table("edges").read(spark)
    some = edges.filter("pred = 'ASSOCIATED_WITH'").select("subj").first()["subj"]
    df = run_query(
        spark, graph_wh, "entity_associations",
        {"ENTITYID": some, "MINSCORE": 1},
    )
    assert df.count() >= 1


def test_graph_stats(spark, graph_wh):
    stats = {r["kind"]: r["n"] for r in run_query(spark, graph_wh, "graph_stats").collect()}
    assert any(k.startswith("node:") for k in stats)
    assert "edge:MENTIONED_IN_PUBLICATION" in stats


def test_placeholder_injection_rejected(spark, graph_wh):
    """ADVICE r1 regression: replacement values are spliced into SQL text —
    quotes / SQL fragments must be rejected, safe tokens must pass."""
    import pytest

    with pytest.raises(ValueError, match="unsafe replacement"):
        run_query(
            spark,
            graph_wh,
            "entity_associations",
            replacements={"ENTITYID": "x' OR '1'='1"},
        )
    with pytest.raises(ValueError, match="unsafe replacement"):
        run_query(
            spark,
            graph_wh,
            "entity_associations",
            replacements={"ENTITYID": "a; DROP TABLE nodes"},
        )


def test_every_catalog_query_runs(spark, graph_wh):
    """Smoke-run EVERY named query over the built warehouse with default
    placeholder values; each must execute and return a well-formed
    result (non-placeholder queries must return >=1 row on the fixture
    graph)."""
    from ckg_spark.lakehouse import Warehouse
    from pyspark.sql import functions as F

    wh = Warehouse(graph_wh)
    # a real entity id that has mentions, a parent, and associations
    nodes = wh.table("nodes").read(spark)
    edges = wh.table("edges").read(spark)
    mentioned = (
        edges.filter(F.col("pred") == "MENTIONED_IN_PUBLICATION")
        .join(
            edges.filter(F.col("pred") == "HAS_PARENT").select(
                F.col("subj").alias("c")
            ),
            F.col("subj") == F.col("c"),
        )
        .groupBy("subj")
        .count()
        .orderBy(F.desc("count"), "subj")
        .first()
    )
    entity_id = mentioned["subj"]
    # a second mentioned entity for the two-entity list shape
    entity2 = (
        edges.filter(F.col("pred") == "MENTIONED_IN_PUBLICATION")
        .filter(F.col("subj") != entity_id)
        .groupBy("subj")
        .count()
        .orderBy(F.desc("count"), "subj")
        .first()["subj"]
    )
    repl = {
        "ENTITYID2": entity2, "ENTITYID": entity_id, "MINSCORE": 1.0,
        "TOPK": 5, "TARGETLABEL": "Disease", "MINTYPES": 1,
    }

    needs_rows = {
        "disease_mentions", "disease_parents_rollup", "comention_partners",
        "graph_stats", "entity_profile", "family_document_reach",
        "top_entities_per_type", "score_distribution", "parent_coverage",
        "hub_entities", "shared_document_partners", "document_entity_lists",
        "top_associations", "hierarchy_label_matrix",
        "mention_density_per_type", "score_percentiles_per_pred",
    }
    for qid in read_knowledge_queries():
        df = run_query(spark, wh, qid, replacements=repl)
        rows = df.collect()
        assert df.columns, qid
        if qid in needs_rows:
            assert len(rows) >= 1, f"{qid} returned no rows"
    assert nodes.count() > 0


def test_substitution_never_rescans_substituted_values(spark, graph_wh, tmp_path):
    """Single-pass substitution: a key occurring INSIDE another key's
    replacement value must not be rewritten (sequential .replace turned
    'MONDO:ID123' into 'MONDO:42123' when ID=42 followed DISEASEID)."""
    yml = tmp_path / "q.yml"
    yml.write_text(
        "probe:\n"
        "  name: substitution probe\n"
        "  description: value-corruption regression\n"
        "  involved_nodes: []\n"
        "  involved_rels: []\n"
        "  query: >\n"
        "    SELECT 'DISEASEID' AS a, ID AS b FROM nodes LIMIT 1\n"
    )
    row = run_query(
        spark, graph_wh, "probe",
        {"DISEASEID": "MONDO:ID123", "ID": 42},
        path=str(yml),
    ).collect()[0]
    assert row["a"] == "MONDO:ID123" and row["b"] == 42
