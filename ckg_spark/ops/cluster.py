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
