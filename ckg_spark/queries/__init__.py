from .catalog import CATALOG, QuerySpec, spark_queries, oracle_queries

__all__ = ["CATALOG", "QuerySpec", "spark_queries", "oracle_queries"]
