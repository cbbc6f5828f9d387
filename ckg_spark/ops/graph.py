"""Graph operators over the (subj, pred, obj) edge table.

The reference expands ontology hierarchies (``HAS_PARENT``) with Cypher
variable-length patterns (/root/reference
src/report_manager/queries/datasets_cypher.yml:58-66 expands parents +
siblings before the biomarker check). Spark has no recursive join, so the
transitive closure is an iterative self-join with doubling:

    reach(1)  = edges
    reach(2k) = reach(k) JOIN reach(k)       (path-doubling)

Doubling converges in O(log depth) iterations instead of O(depth) — an
ontology 30 levels deep closes in 5 rounds. Lineage is cut per round with
``localCheckpoint`` (the iterative-plan-explosion trap), and each round
dedups before joining so the frontier never carries duplicates into the
next shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_iterations: int = 10,
) -> DataFrame:
    """All (ancestor-reachable) pairs of the DAG: (src, dst, min_depth).

    ``min_depth`` = length of the shortest path (1 = direct edge), kept as
    an explicit deterministic tie-break column. 2^max_iterations bounds the
    expressible path length.
    """
    reach = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .withColumn("depth", F.lit(1))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        a = reach.alias("a")
        b = reach.alias("b")
        doubled = a.join(b, F.col("a.d") == F.col("b.s")).select(
            F.col("a.s").alias("s"),
            F.col("b.d").alias("d"),
            (F.col("a.depth") + F.col("b.depth")).alias("depth"),
        )
        new_reach = (
            reach.unionByName(doubled)
            .groupBy("s", "d")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint()
        )
        if new_reach.count() == reach.count():
            reach = new_reach
            break
        reach = new_reach
    return reach.select(
        F.col("s").alias(src), F.col("d").alias(dst), F.col("depth").alias("min_depth")
    )
