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


def pagerank(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    damping: float = 0.85,
    iterations: int = 15,
) -> DataFrame:
    """(node, rank) by power iteration — the distributed analog of the
    reference's eigenvector-centrality analytics (analytics.py:2278-2290),
    expressed as join + aggregate per round (no GraphFrames jar needed).

    Deterministic: fixed iteration count, no sampling. Dangling-node mass
    is redistributed uniformly each round, so ranks sum to ~1."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("out_deg"))
    links = e.join(out_deg, "s").localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            links.join(ranks, links["s"] == ranks["node"])
            .select("d", (F.col("rank") / F.col("out_deg")).alias("contrib"))
            .groupBy("d")
            .agg(F.sum("contrib").alias("in_rank"))
        )
        # dangling mass: rank held by nodes with no out-edges
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["s"], "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["d"], "left")
            .select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("in_rank"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
