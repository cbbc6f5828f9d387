"""Driver contract for the spark-graft builder (PySpark target).

``entry``/``queries``/``oracle_sql`` delegate to the query catalog in
``ckg_spark/queries/catalog.py`` — one entry per operator family from
SURVEY.md §2 plus the KG-construction stages and the training-data ops.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ckg_spark.queries import oracle_queries, spark_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top entities by distinct-document mention count, computed
    with the broadcast Aho-Corasick tagger (the KG pipeline's tag stage)
    over /root/testdata/sf0.001/documents.parquet."""
    from ckg_spark.queries.catalog import CATALOG

    return CATALOG["q_kg_mention_topk"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for the non-SQL-
    expressible ops: LSH banding, SimHash, IVF probing, stub decode)."""
    return oracle_queries()
