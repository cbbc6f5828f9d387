"""Connected components as an iterative DataFrame computation.

No GraphFrames jar is assumed (none ships in this sandbox); this is the
documented fallback of SURVEY.md §7: min-label propagation to convergence.

Each iteration:
    label[u] <- min(label[u], min over neighbors v of label[v])   (propagate)
    label[u] <- label[label[u]]                                   (pointer jump)

- the pointer-jump step is the standard shortcutting trick (same idea as
  large-star): distance-to-representative roughly halves every round, so
  convergence is O(log diameter) instead of O(diameter) — a 30-hop chain
  closes in ~6 rounds, and the near-pair-sized alias-merge components of
  the KG close in 2;
- lineage is cut every round with ``localCheckpoint()`` (iterative joins
  otherwise stack exponentially growing plans — the classic Spark iterative
  trap);
- convergence is detected with a cheap aggregate (sum of changed flags),
  not a collect of labels;
- the edge list is symmetrized once up front and cached.

Cluster representative = lexicographic min id, which makes canonical node
ids deterministic (north-rule requirement: no nondeterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node id."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = labels.join(nbr_min, labels["node"] == nbr_min["u"], "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                "p_label"
            ),
        )
        # pointer jump: label[u] <- label[label[u]] (labels only decrease)
        jump_src = propagated.select(
            F.col("node").alias("j_node"), F.col("p_label").alias("j_label")
        )
        jumped = (
            propagated.join(jump_src, propagated["p_label"] == jump_src["j_node"], "left")
            .select(
                "node",
                "old_label",
                F.least(
                    F.col("p_label"), F.coalesce(F.col("j_label"), F.col("p_label"))
                ).alias("new_label"),
            )
            .localCheckpoint()
        )
        n_changed = jumped.filter(F.col("new_label") != F.col("old_label")).count()
        labels = jumped.select("node", F.col("new_label").alias("label"))
        if not n_changed:
            break
    return labels.select("node", F.col("label").alias("component"))
