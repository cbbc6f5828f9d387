"""Similarity search over embedding columns (array<float>).

Two paths:

- ``brute_force_topk``: exact cosine top-k against a query vector.
  The dot product stays JVM-side (``F.zip_with`` + ``F.aggregate`` over the
  array column — whole-stage codegen, no Python); top-k is
  ``orderBy(...).limit(k)``, which Spark executes as a per-partition
  TakeOrdered + driver merge, i.e. no full sort shuffle.
- ``ivf_topk``: IVF-style two-stage ANN. A deterministic coarse quantizer
  (k-means-lite on a seeded sample, or hash-buckets) assigns every vector
  to a cell; queries probe only the ``nprobe`` nearest cells. At 100 TB the
  probe is a partition-pruned scan of ~nprobe/ncells of the data instead
  of everything.
- ``cosine_self_pairs``: near-duplicate vectors (cosine >= threshold),
  blocked on a coarse cell so the pairwise work is per-bucket.

Scores are rounded to 6 dp at the boundary so results are reproducible
across float32/float64 evaluation orders.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType, StringType
from pyspark.sql.window import Window


def _cosine_col(vec_col, query: list[float]):
    """JVM-side cosine similarity between an array<float> column and a
    literal query vector (zip_with product + aggregate sum + norms)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_v = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    qn = float(np.sqrt(np.dot(query, query)))
    return dot / (norm_v * F.lit(qn))


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (id, cosine) ordered desc, ties by id."""
    cos = F.round(_cosine_col(F.col(vec_col), query), 6).alias("cosine")
    return (
        embeddings.select(F.col(id_col), cos)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def assign_cells(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    sample_per_cell: int = 8,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: centroids = mean of deterministic hash-sampled
    seed vectors per cell, then one nearest-centroid assignment pass
    (vectorized numpy in mapInPandas). Returns (assigned df, centroids)."""
    # deterministic seed sample: smallest (hash(id)) rows per pseudo-cell
    sampled = (
        embeddings.select(id_col, vec_col)
        .withColumn("h", F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .withColumn("cell0", F.pmod(F.col("h"), F.lit(n_cells)).cast("int"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("cell0").orderBy("h"))
        )
        .filter(F.col("rn") <= sample_per_cell)
        .collect()
    )
    by_cell: dict[int, list[np.ndarray]] = {}
    for r in sampled:
        by_cell.setdefault(r["cell0"], []).append(np.asarray(r[vec_col], dtype=np.float64))
    centroids = np.stack(
        [
            np.mean(by_cell[c], axis=0)
            if c in by_cell
            else np.zeros(len(sampled[0][vec_col]))
            for c in range(n_cells)
        ]
    )
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0] = 1.0
    cn = centroids / norms[:, None]
    schema = StructType(
        [StructField("key", StringType(), False), StructField("cell", IntegerType(), False)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0] = 1.0
            sims = (mat / vn[:, None]) @ cn.T
            yield pd.DataFrame(
                {"key": pdf[id_col].astype(str), "cell": sims.argmax(axis=1).astype("int32")}
            )

    assigned = embeddings.select(
        F.col(id_col).cast("string").alias(id_col), vec_col
    ).mapInPandas(assign, schema)
    out = embeddings.join(
        assigned.withColumnRenamed("key", "__k"),
        F.col(id_col).cast("string") == F.col("__k"),
    ).drop("__k")
    return out, centroids


def ivf_topk(
    embeddings_with_cells: DataFrame,
    centroids: np.ndarray,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest cells only, then exact cosine within them.
    With cell-partitioned storage this is partition pruning at the scan."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0] = 1.0
    sims = (centroids / norms[:, None]) @ qn
    probe = sorted(int(c) for c in np.argsort(-sims)[:nprobe])
    pruned = embeddings_with_cells.filter(F.col("cell").isin(probe))
    return brute_force_topk(pruned, query, k=k, id_col=id_col, vec_col=vec_col)


def cosine_self_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    block_col: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), blocked.

    If block_col is None an IVF cell assignment is used as the block —
    self-pairing within a cell misses cross-cell near-dups near boundaries
    (standard ANN recall trade-off; raise n_cells/nprobe to tune).
    """
    src = embeddings
    if block_col is None:
        src, _ = assign_cells(embeddings)
        block_col = "cell"
    a = src.select(
        F.col(block_col).alias("blk_a"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = src.select(
        F.col(block_col).alias("blk_b"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
