"""Neo4j bulk-import TSV export of the materialized graph.

The reference's end artifact is a directory of tab-separated files that
``USING PERIODIC COMMIT ... LOAD CSV`` Cypher templates consume
(builder/loader.py:40-76): entity files with header
``ID, :LABEL, name, description, type, synonyms`` (synonyms
comma-joined; ontologies_controller.py:140-151, QUOTE_ALL, tab,
backslash escape) and relationship files with header
``START_ID, END_ID, TYPE`` plus property columns
(ontologies_controller.py:156, textminingParser.py:93).

This module emits the same layout from the warehouse's nodes/edges
tables so a reference deployment can ingest this engine's graph
unchanged: one subdirectory per node label and per relationship type
(≙ the reference's one TSV per entity/relationship — neo4j-admin and
LOAD CSV both accept a file set), each holding header-bearing TSV part
files.

Scale: both exports are single narrow projections + distributed CSV
writes partitioned by the dimension-sized label/pred column — no
shuffle (the dir-partitioning column is a duplicate of an existing
column, so Spark routes rows at write time; the edges table is already
stored pred-partitioned, so its export is partition-aligned). Quoting
semantics (every field quoted, backslash escape) mirror the reference's
csv.QUOTE_ALL; under quoteAll Spark quotes the header row like data
rows (header writes as "ID"<TAB>":LABEL"), matching the reference's
csv.QUOTE_ALL output exactly — asserted by the roundtrip test.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lakehouse import Warehouse

_CSV_OPTS = {
    "sep": "\t",
    "header": "true",
    "quoteAll": "true",
    "escape": "\\",
    "compression": "none",
}


def _write_partitioned(df: DataFrame, dir_col: str, out_dir: str) -> None:
    # dynamic partition overwrite: only the partitions present in THIS
    # batch are replaced. Under the default static mode a partial export
    # (labels=['Tissue']) would first truncate the whole base path,
    # deleting every previously exported label's TSVs — the opposite of
    # the reference's accumulate-entity-files partial build.
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(dir_col)
        .options(**_CSV_OPTS)
        .csv(out_dir)
    )


def export_neo4j_bulk(
    spark: SparkSession,
    wh: Warehouse,
    out_dir: str,
    labels: list[str] | None = None,
    preds: list[str] | None = None,
) -> dict:
    """Write ``out_dir/nodes/_label=<label>/*.csv`` and
    ``out_dir/edges/_type=<pred>/*.csv`` in the reference's bulk-import
    shape. Returns per-kind row counts (≙ the reference's per-file
    import stats, builder/importer.py:169-265).

    ``labels`` / ``preds`` select entity/relationship subsets — the
    reference's partial build (builder/builder.py:69-123
    ``--import_types``/``--load_entities`` restricts which entity files
    are produced/loaded). Because nodes partition by label and edges by
    pred, the filters prune at the scan: a one-pred partial export reads
    exactly that pred's files, never the 100×-grown rest of the table."""
    nodes = wh.table("nodes").read(spark)
    edges = wh.table("edges").read(spark)
    if labels is not None:
        nodes = nodes.filter(F.col("label").isin(*labels))
    if preds is not None:
        edges = edges.filter(F.col("pred").isin(*preds))

    node_rows = nodes.select(
        F.col("id").alias("ID"),
        F.col("label").alias(":LABEL"),
        "name",
        "description",
        "type",
        # ",".join(synonym set) — ontologies_controller.py:145
        F.array_join(F.coalesce("synonyms", F.array().cast("array<string>")), ",").alias(
            "synonyms"
        ),
        F.col("label").alias("_label"),
    )
    _write_partitioned(node_rows, "_label", os.path.join(out_dir, "nodes"))

    edge_cols = [
        F.col("subj").alias("START_ID"),
        F.col("obj").alias("END_ID"),
        F.col("pred").alias("TYPE"),
    ]
    prop_cols = [c for c in edges.columns if c not in ("subj", "pred", "obj")]
    edge_rows = edges.select(
        *edge_cols, *prop_cols, F.col("pred").alias("_type")
    )
    _write_partitioned(edge_rows, "_type", os.path.join(out_dir, "edges"))

    stats = {
        # full export: manifest counts are free; partial export: count the
        # pruned scans (cheap — they read only the selected partitions)
        "n_nodes": wh.table("nodes").row_count() if labels is None else nodes.count(),
        "n_edges": wh.table("edges").row_count() if preds is None else edges.count(),
        "out_dir": out_dir,
    }
    wh.log_metric("export_neo4j_bulk", **stats)
    return stats
