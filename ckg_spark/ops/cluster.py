"""Lloyd's k-means over embedding vectors as iterative DataFrame math.

The reference clusters driver-side (sklearn AgglomerativeClustering
inside run_mapper, analytics.py:2204; AffinityPropagation for network
communities, :2335 — the latter is mirrored by ops/graph.py LPA). This
operator is the engine's distributed clustering primitive for the
training-data toolkit (embedding-space bucketing, the same family as
the IVF index's cell assignment in ops/simsearch.py).

Design for scale:

- Points stay MELTED (vec_id, dim, val) and never leave the executors;
  centroids are k*d rows — dimension-sized — so every join is a
  broadcast and the only corpus-scale shuffle per iteration is the
  (id, cid) partial-aggregated distance reduction.
- Each iteration's centroid frame is ``localCheckpoint(eager=True)``
  (k*d rows): truncates the growing lineage so iteration N's plan does
  not re-derive iterations 1..N-1 (the same guard BENCH.md documents
  for the link stage).
- Determinism: init is the k smallest vec_ids (cid = rank-1); argmin
  ties break by cid; empty clusters simply drop (no reseeding) — the
  exact same rules the DuckDB oracle (unrolled iterations, see
  catalog.py::q_kmeans_embeddings) executes, which is what makes the
  final assignment value-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def kmeans_assign(
    points: DataFrame,
    k: int,
    iters: int,
    id_col: str = "id",
    dim_col: str = "dim",
    val_col: str = "val",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations and return the final assignment
    (id_col, cluster). ``points`` is the melted (id, dim, val) matrix.

    The points frame is localCheckpoint-ed ONCE: every iteration's eager
    centroid job and the distance joins read it, and without the
    checkpoint an expensive upstream plan (tagger, embedding pipeline)
    would re-execute twice per iteration — the same guard
    ops/graph.py::eigenvector_centrality applies to its edge frame.

    Hash-oracle caveat: the cross-engine assignment equality rides on
    unrounded float distance sums whose accumulation order differs
    between engines (~1 ulp); a point equidistant from two centroids to
    within that noise could flip its argmin on one engine only. No
    tolerance can remove the boundary (rounding just moves it); with
    real-valued embeddings exact near-ties are measure-zero, and the
    repartition-determinism test guards the Spark side."""
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(dim_col).alias("dim"),
        F.col(val_col).cast("double").alias("val"),
    ).localCheckpoint(eager=True)

    seeds = (
        pts.select("id")
        .distinct()
        .orderBy("id")
        .limit(k)
        .withColumn("cid", F.row_number().over(Window.orderBy("id")) - 1)
    )
    cent = (
        pts.join(F.broadcast(seeds), "id")
        .select("cid", "dim", "val")
        .localCheckpoint(eager=True)
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        c = cent_df.select(
            "cid", "dim", F.col("val").alias("cval")
        )
        d2 = (
            pts.join(F.broadcast(c), "dim")
            .groupBy("id", "cid")
            .agg(
                F.sum(
                    (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
                ).alias("d2")
            )
        )
        w = Window.partitionBy("id").orderBy(F.col("d2").asc(), F.col("cid").asc())
        return (
            d2.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .select("id", "cid")
        )

    for _ in range(iters):
        best = assign(cent)
        cent = (
            best.join(pts, "id")
            .groupBy("cid", "dim")
            .agg(F.avg("val").alias("val"))
            .localCheckpoint(eager=True)
        )

    return assign(cent).select(
        F.col("id").alias(id_col), F.col("cid").cast("bigint").alias("cluster")
    )


def kmeans_oracle_sql(
    source_cte: str, k: int, iters: int, id_sql: str = "id"
) -> str:
    """The EXACT unrolled-iteration DuckDB twin of :func:`kmeans_assign`.
    ``source_cte`` must define a relation ``pts(id, dim, val)``."""
    parts = [
        source_cte,
        f"""seeds AS (
          SELECT id, (ROW_NUMBER() OVER (ORDER BY id) - 1) AS cid
          FROM (SELECT DISTINCT id FROM pts ORDER BY id LIMIT {k})
        )""",
        """cent_0 AS (
          SELECT s.cid, p.dim, p.val FROM pts p JOIN seeds s ON p.id = s.id
        )""",
    ]
    for i in range(iters):
        parts.append(
            f"""d2_{i} AS (
              SELECT p.id, c.cid, SUM((p.val - c.val) * (p.val - c.val)) AS d2
              FROM pts p JOIN cent_{i} c ON p.dim = c.dim
              GROUP BY p.id, c.cid
            )"""
        )
        parts.append(
            f"""best_{i} AS (
              SELECT id, cid FROM (
                SELECT id, cid,
                       ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2 ASC, cid ASC) AS rn
                FROM d2_{i}) WHERE rn = 1
            )"""
        )
        parts.append(
            f"""cent_{i + 1} AS (
              SELECT b.cid, p.dim, AVG(p.val) AS val
              FROM best_{i} b JOIN pts p ON b.id = p.id
              GROUP BY b.cid, p.dim
            )"""
        )
    parts.append(
        f"""d2_fin AS (
          SELECT p.id, c.cid, SUM((p.val - c.val) * (p.val - c.val)) AS d2
          FROM pts p JOIN cent_{iters} c ON p.dim = c.dim
          GROUP BY p.id, c.cid
        )"""
    )
    body = ",\n".join(parts)
    return f"""
    WITH {body}
    SELECT id AS {id_sql}, CAST(cid AS BIGINT) AS cluster FROM (
      SELECT id, cid,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY d2 ASC, cid ASC) AS rn
      FROM d2_fin) WHERE rn = 1
    """


def boruvka_mst(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dist: str = "dist",
    max_rounds: int = 20,
) -> DataFrame:
    """Minimum spanning forest of the undirected graph by distributed
    Boruvka — the corpus-scale half of single-linkage hierarchical
    clustering (the reference's dendrograms: FF.create_dendrogram over
    the wide matrix in get_complex_heatmapplot, viz/viz.py:823-827, and
    wgcnaAnalysis.get_dendrogram — scipy linkage, driver-side; SLINK's
    dendrogram is exactly the MST's edges replayed in weight order).

    Boruvka parallelizes as join + min_by per round: every component
    picks its lightest outgoing edge, all picks join the forest at once,
    components merge, repeat — O(log n) rounds regardless of graph
    shape. Ties are broken by the (dist, src, dst) struct order, which
    totally orders edges, so the classic tie-cycle hazard cannot occur
    (Boruvka is cycle-free iff edge weights are distinct; the struct IS
    the distinct weight). Per round: two broadcast-ish label joins on
    the candidate edges, one min_by aggregation, one min-label CC pass
    over the (forest-sized) edge set; lineage cut via localCheckpoint.

    ``edges`` need not be symmetrized. Returns the forest edges
    (src, dst, dist) — at most n-1 rows."""
    from ..canon.cc import connected_components

    e = (
        edges.select(
            F.col(src).alias("a"), F.col(dst).alias("b"), F.col(dist).cast("double").alias("w")
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    forest = e.filter(F.lit(False)).localCheckpoint(eager=True)  # empty, same schema
    labels = nodes.withColumn("label", F.col("node"))
    converged = False
    for _ in range(max_rounds):
        la = labels.select(F.col("node").alias("a"), F.col("label").alias("ca"))
        lb = labels.select(F.col("node").alias("b"), F.col("label").alias("cb"))
        crossing = (
            e.join(la, "a").join(lb, "b").filter(F.col("ca") != F.col("cb"))
        )
        # each component's lightest outgoing edge, both directions so a
        # component sees edges where it is either endpoint
        cand = crossing.select(
            F.col("ca").alias("comp"), F.struct("w", "a", "b").alias("pick")
        ).unionByName(
            crossing.select(F.col("cb").alias("comp"), F.struct("w", "a", "b").alias("pick"))
        )
        picked = (
            cand.groupBy("comp")
            .agg(F.min("pick").alias("pick"))
            .select(F.col("pick.a").alias("a"), F.col("pick.b").alias("b"), F.col("pick.w").alias("w"))
            .dropDuplicates(["a", "b"])
        )
        if picked.isEmpty():
            converged = True
            break
        forest = forest.unionByName(picked).localCheckpoint(eager=True)
        labels = connected_components(forest, src="a", dst="b").select(
            "node", F.col("component").alias("label")
        )
        # isolated nodes keep their self-label
        labels = (
            nodes.join(labels, "node", "left")
            .select("node", F.coalesce(F.col("label"), F.col("node")).alias("label"))
            .localCheckpoint(eager=True)
        )
    if not converged:
        # a partial forest is WRONG (downstream single-linkage clusters /
        # dendrograms silently change), not just slow — same contract as
        # ops/graph.k_core. Boruvka halves components per round, so
        # max_rounds=20 covers 2^20 components; raise rather than return.
        raise RuntimeError(
            f"boruvka_mst did not converge in {max_rounds} rounds; "
            "crossing edges remain — raise max_rounds"
        )
    return forest.select(
        F.col("a").alias(src), F.col("b").alias(dst), F.col("w").alias(dist)
    )


def linkage_matrix(mst_rows: list, all_nodes: list) -> list:
    """Driver-side scipy-format linkage Z from a COLLECTED spanning
    forest (Kruskal replay: sort MST edges by weight, union-find, each
    merge emits [left_cluster, right_cluster, height, size]) — the exact
    single-linkage dendrogram, because single linkage's merge sequence
    is the MST's edges in weight order (Gower & Ross 1969). Inputs are
    dimension-sized by contract (a dendrogram is unreadable beyond ~10^3
    leaves; the reference only ever draws feature/sample dendrograms) —
    corpus-scale callers want :func:`boruvka_mst` + a threshold cut via
    connected components instead.

    ``mst_rows``: (src, dst, dist) triples; ``all_nodes``: leaf ids in
    the label order the caller wants (index = scipy leaf id). Forests
    with k>1 components yield n-k merges (scipy requires a connected
    input; callers padding to a full dendrogram should add inf edges)."""
    idx = {v: i for i, v in enumerate(all_nodes)}
    n = len(all_nodes)
    parent = list(range(2 * n))  # union-find over leaf+internal ids
    size = [1] * n + [0] * n
    cluster_of = list(range(2 * n))  # current scipy cluster id per root

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    z = []
    nxt = n
    for a, b, w in sorted(mst_rows, key=lambda r: (float(r[2]), str(r[0]), str(r[1]))):
        ra, rb = find(idx[a]), find(idx[b])
        if ra == rb:
            continue
        ca, cb = cluster_of[ra], cluster_of[rb]
        merged = size[ra] + size[rb]
        z.append([min(ca, cb), max(ca, cb), float(w), merged])
        parent[ra] = nxt
        parent[rb] = nxt
        size[nxt] = merged
        cluster_of[nxt] = nxt
        nxt += 1
    return z
