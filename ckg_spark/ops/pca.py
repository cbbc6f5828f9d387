"""PCA over DataFrame feature columns — MLlib's distributed SVD, with the
centering and sign conventions the reference's sklearn PCA applies
(analytics_core/analytics/analytics.py:690-748 ``run_pca``).

MLlib's ``pyspark.ml.feature.PCA`` does NOT center its input (sklearn
does), so the features are mean-centered first via one aggregate whose
result folds into the assembled vector — without this the first
component just points at the data mean. Components are sign-normalized
(the largest-|loading| entry of each component is made positive), the
convention that makes results comparable across LAPACK/numpy/sklearn,
whose eigenvector signs are otherwise arbitrary.

Scale: the gramian (d×d for d features) aggregates in one distributed
pass; the eigendecomposition is driver-side on the d×d matrix —
dimension-sized, exactly where it belongs. Projection is a narrow map.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_project(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 2,
    id_cols: list[str] | None = None,
) -> tuple[DataFrame, np.ndarray, list[float]]:
    """Project rows onto the top-k principal components.

    Returns (projected df with pc1..pck columns, components matrix of
    shape (n_features, k), explained variance per component)."""
    from pyspark.ml.feature import PCA as MLPCA
    from pyspark.ml.feature import VectorAssembler

    means_row = df.agg(
        *[F.avg(F.col(c).cast("double")).alias(c) for c in feature_cols]
    ).first()
    degenerate = [c for c in feature_cols if means_row[c] is None]
    if degenerate:
        raise ValueError(
            "pca_project: no non-null values to center on for feature column(s) "
            f"{degenerate} (empty input or all-null column)"
        )
    centered = df.select(
        *(id_cols or []),
        *[
            (F.col(c).cast("double") - F.lit(float(means_row[c]))).alias(c)
            for c in feature_cols
        ],
    )
    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="__features__"
    ).transform(centered)
    model = MLPCA(k=k, inputCol="__features__", outputCol="__pc__").fit(assembled)
    comps = model.pc.toArray()  # (n_features, k)
    # deterministic sign: largest-|loading| entry of each component > 0
    flips = np.ones(k)
    for j in range(k):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            flips[j] = -1.0
    comps = comps * flips
    explained = [float(v) for v in model.explainedVariance]

    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("__pc__"), dtype="float64")
    projected = model.transform(assembled).select(
        *(id_cols or []),
        *[
            F.round(F.element_at(arr, j + 1) * F.lit(float(flips[j])), 6).alias(
                f"pc{j + 1}"
            )
            for j in range(k)
        ],
    )
    return projected, comps, explained
