"""YAML catalog of named Spark-SQL knowledge queries over the graph tables.

Parity feature with the reference's query-catalog utilities
(/root/reference src/graphdb_connector/query_utils.py:7-50): load a YAML
file of named queries with involved-node/relationship metadata, filter by
the entities they touch, substitute placeholders, run. Cypher text is
replaced by Spark SQL over the warehouse ``nodes``/``edges`` tables
(registered as temp views per call), and the placeholder convention
(UPPERCASE tokens, query_utils-style string replace —
report_manager/dataset.py:146-170 replaces PROJECTID the same way) is kept.
"""

from __future__ import annotations

import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..lakehouse import Warehouse

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "knowledge_queries.yml")


def read_knowledge_queries(path: str | None = None) -> dict[str, dict[str, Any]]:
    """Load the YAML catalog: {query_id: {name, description, involved_nodes,
    involved_rels, query}} (≙ query_utils.read_knowledge_queries)."""
    import yaml

    with open(path or _DEFAULT_PATH) as f:
        queries = yaml.safe_load(f)
    for qid, q in queries.items():
        missing = {"name", "description", "involved_nodes", "involved_rels", "query"} - set(q)
        if missing:
            raise ValueError(f"query {qid!r} missing fields: {sorted(missing)}")
    return queries


def find_queries_involving_nodes(
    queries: dict[str, dict[str, Any]], nodes: list[str]
) -> dict[str, dict[str, Any]]:
    """Queries whose involved_nodes cover ALL requested node labels
    (≙ query_utils.find_queries_involving_nodes:28-33)."""
    want = set(nodes)
    return {
        qid: q
        for qid, q in queries.items()
        if len(set(q["involved_nodes"]) & want) == len(want)
    }


def find_queries_involving_relationships(
    queries: dict[str, dict[str, Any]], rels: list[str]
) -> dict[str, dict[str, Any]]:
    """Queries touching ANY of the requested relationship types
    (≙ query_utils.find_queries_involving_relationships:52-58)."""
    want = set(rels)
    return {qid: q for qid, q in queries.items() if set(q["involved_rels"]) & want}


# Substituted values are spliced into SQL text (the reference's template
# mechanism is a raw string replace, builder/loader.py:110-116) — restrict
# them to a safe token charset so a value containing quotes or SQL
# fragments cannot produce a malformed or injected statement.
_SAFE_VALUE = re.compile(r"^[A-Za-z0-9_.:\-]+$")


def _safe_value(key: str, val: Any) -> str:
    if isinstance(val, bool):
        return str(val).upper()
    if isinstance(val, (int, float)):
        return repr(val)
    s = str(val)
    if not _SAFE_VALUE.match(s):
        raise ValueError(
            f"unsafe replacement for {key!r}: {s!r} "
            "(allowed: alphanumerics, '_', '.', ':', '-')"
        )
    return s


def run_query(
    spark: SparkSession,
    warehouse: Warehouse | str,
    query_id: str,
    replacements: dict[str, Any] | None = None,
    path: str | None = None,
) -> DataFrame:
    """Register the warehouse graph tables as views and run one catalog
    query, substituting UPPERCASE placeholders (string-replace, exactly the
    reference's template mechanism, builder/loader.py:110-116)."""
    wh = Warehouse(warehouse) if isinstance(warehouse, str) else warehouse
    q = read_knowledge_queries(path)[query_id]
    sql = q["query"]
    # ONE regex pass with longest-first alternation: sequential .replace
    # calls rescan already-substituted VALUES, so a shorter key occurring
    # inside an earlier replacement's value (ID inside 'MONDO:ID123')
    # would silently corrupt it; a single pass only ever sees the
    # original template text. Longest-first ordering keeps a key that
    # prefixes another (ENTITYID/ENTITYID2) from clobbering it mid-token.
    reps = replacements or {}
    if reps:
        import re as _re

        keys = sorted(reps, key=len, reverse=True)
        pat = _re.compile("|".join(_re.escape(k) for k in keys))
        sql = pat.sub(lambda m: _safe_value(m.group(0), reps[m.group(0)]), sql)
    wh.table("nodes").read(spark).createOrReplaceTempView("nodes")
    wh.table("edges").read(spark).createOrReplaceTempView("edges")
    return spark.sql(sql)
