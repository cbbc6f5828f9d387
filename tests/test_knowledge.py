"""Knowledge-summary graph (≙ report_manager/knowledge.py): generator
semantics, regulated-filter semi-joins, last-generator-wins node typing,
edge dedup, and materialization through the lakehouse graph sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ckg_spark.knowledge import (
    build_knowledge_graph,
    knowledge_from_annotations,
    knowledge_from_correlation,
    knowledge_from_regulation,
    knowledge_from_similarity,
)


@pytest.fixture(scope="module")
def report_frames(spark):
    regulated = spark.createDataFrame(
        [("P1",), ("P2",), ("P3",)], ["identifier"]
    )
    correlations = spark.createDataFrame(
        [
            ("P1", "P2", 0.9),
            ("P1", "P3", -0.7),
            ("P2", "P4", 0.95),   # P4 not regulated -> filtered
            ("P1", "P3", 0.2),    # below cutoff
        ],
        ["node1", "node2", "weight"],
    )
    annotations = spark.createDataFrame(
        [("P1", "GO:1"), ("P2", "GO:1"), ("P9", "GO:2")],  # P9 not regulated
        ["identifier", "annotation"],
    )
    similar = spark.createDataFrame(
        [("proj-A", "proj-B", 0.81)], ["current", "other", "similarity_pearson"]
    )
    return regulated, correlations, annotations, similar


def test_generators_match_reference_semantics(spark, report_frames):
    regulated, correlations, annotations, similar = report_frames
    n_reg, e_reg = knowledge_from_regulation(regulated, "Protein")
    assert e_reg.count() == 0
    assert {tuple(r) for r in n_reg.collect()} == {
        ("P1", "Protein", "Regulated"),
        ("P2", "Protein", "Regulated"),
        ("P3", "Protein", "Regulated"),
    }

    n_cor, e_cor = knowledge_from_correlation(
        correlations, "Protein", "Protein", cutoff=0.5, node_filter=regulated
    )
    got = {(r["subj"], r["obj"]): r["weight"] for r in e_cor.collect()}
    # P2-P4 dropped by the regulated filter, 0.2 by the cutoff
    assert got == {("P1", "P2"): 0.9, ("P1", "P3"): -0.7}
    assert {r["node_id"] for r in n_cor.collect()} == {"P1", "P2", "P3"}

    # the reference keeps a row only when BOTH endpoints are in the filter
    # (knowledge.py:184) — so the caller's filter carries annotation terms too
    ann_filter = regulated.unionByName(
        spark.createDataFrame([("GO:1",)], ["identifier"])
    )
    n_ann, e_ann = knowledge_from_annotations(
        annotations, "Protein", "Pathway", node_filter=ann_filter
    )
    # P9 row dropped (subj not in filter); GO:2 row dropped (obj not in filter)
    assert {(r["subj"], r["obj"]) for r in e_ann.collect()} == {
        ("P1", "GO:1"),
        ("P2", "GO:1"),
    }
    types = {r["node_id"]: r["node_type"] for r in n_ann.collect()}
    assert types == {"P1": "Protein", "P2": "Protein", "GO:1": "Pathway"}

    # a filter with no annotation terms drops every row — both-endpoint
    # semantics, not subj-only
    _n, e_subj_only = knowledge_from_annotations(
        annotations, "Protein", "Pathway", node_filter=regulated
    )
    assert e_subj_only.count() == 0

    n_sim, e_sim = knowledge_from_similarity(similar)
    assert [tuple(r) for r in e_sim.collect()] == [
        ("proj-A", "is_similar", "proj-B", 0.81)
    ]
    assert {r["node_type"] for r in n_sim.collect()} == {"Project"}


def test_build_knowledge_graph_merges_and_types_deterministically(
    spark, report_frames
):
    regulated, correlations, annotations, similar = report_frames
    ann_filter = regulated.unionByName(
        spark.createDataFrame([("GO:1",)], ["identifier"])
    )
    parts = [
        knowledge_from_regulation(regulated, "Protein"),
        knowledge_from_correlation(
            correlations, "Protein", "Protein", cutoff=0.5, node_filter=regulated
        ),
        knowledge_from_annotations(
            annotations, "Protein", "Pathway", node_filter=ann_filter
        ),
        knowledge_from_similarity(similar),
    ]
    nodes, edges = build_knowledge_graph(parts)
    nd = {r["node_id"]: (r["node_type"], r["parent"]) for r in nodes.collect()}
    # one row per node; regulation's parent survives only where no later
    # generator re-mentions the node... P1/P2 ARE re-mentioned (correlation,
    # annotation) so last-wins drops the parent — the reference's dict
    # update does exactly this
    assert nd["GO:1"] == ("Pathway", None)
    assert nd["P1"] == ("Protein", None)
    assert nd["proj-A"] == ("Project", None)
    assert set(nd) == {"P1", "P2", "P3", "GO:1", "proj-A", "proj-B"}
    ed = {(r["subj"], r["pred"], r["obj"]): r["weight"] for r in edges.collect()}
    assert ed[("P1", "correlates", "P2")] == 0.9
    assert ed[("P1", "is_annotated", "GO:1")] == 1.0
    assert len(ed) == 5
    # deterministic under repartition
    parts2 = [(n.repartition(7), e.repartition(5)) for n, e in parts]
    n2, e2 = build_knowledge_graph(parts2)
    assert sorted(map(tuple, n2.collect())) == sorted(map(tuple, nodes.collect()))
    assert sorted(map(tuple, e2.collect())) == sorted(map(tuple, edges.collect()))


def test_knowledge_graph_materializes_through_lakehouse(spark, report_frames, tmp_path):
    """The summary graph lands through the same MERGE sink as the corpus
    KG (the point of keeping (subj, pred, obj) shape)."""
    from ckg_spark.lakehouse import Warehouse

    regulated, correlations, _ann, _sim = report_frames
    nodes, edges = build_knowledge_graph(
        [
            knowledge_from_regulation(regulated, "Protein"),
            knowledge_from_correlation(
                correlations, "Protein", "Protein", cutoff=0.5, node_filter=regulated
            ),
        ]
    )
    wh = Warehouse(str(tmp_path / "wh"))
    wh.table("knowledge_nodes").merge_insert_absent(spark, nodes, key_cols=["node_id"])
    wh.table("knowledge_edges").merge_insert_absent(
        spark, edges, key_cols=["subj", "pred", "obj"]
    )
    assert wh.table("knowledge_nodes").read(spark).count() == nodes.count()
    # idempotent re-merge
    wh.table("knowledge_edges").merge_insert_absent(
        spark, edges, key_cols=["subj", "pred", "obj"]
    )
    assert wh.table("knowledge_edges").read(spark).count() == edges.count()
