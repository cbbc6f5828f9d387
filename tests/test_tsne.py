"""Driver-side manifold embeddings (ops/tsne.py ≙ run_tsne
analytics.py:749-797 / run_umap analytics.py:798-838).

No sklearn/umap-learn in the environment, so the oracles here are
structural and independent: planted-cluster neighbor purity (does the
embedding preserve the cluster geometry the input provably has),
bitwise determinism (the implementations are deliberately
deterministic — PCA/spectral init, full-batch gradients), and the
(a, b) curve fit checked against umap-learn's PUBLISHED constants for
its default min_dist (a=1.577, b=0.895 at min_dist=0.1 — the values
umap-learn's own docs/tests cite for find_ab_params)."""

from __future__ import annotations

import numpy as np
import pytest

from ckg_spark.analysis import run_analysis
from ckg_spark.ops.tsne import (
    find_ab_params,
    tsne_core,
    tsne_embed,
    umap_core,
    umap_embed,
)


def _planted(n_per: int = 30, dim: int = 8, seed: int = 7):
    rng = np.random.default_rng(seed)
    blocks, labels = [], []
    for c, mu in enumerate([0.0, 8.0, -8.0]):
        blocks.append(rng.normal(mu, 1.0, size=(n_per, dim)))
        labels += [c] * n_per
    return np.vstack(blocks), np.array(labels)


def _nn_purity(y: np.ndarray, labels: np.ndarray) -> float:
    d2 = np.square(y).sum(1)[:, None] + np.square(y).sum(1)[None, :] - 2 * y @ y.T
    np.fill_diagonal(d2, np.inf)
    return float((labels[d2.argmin(1)] == labels).mean())


def test_tsne_core_preserves_planted_clusters_and_is_deterministic():
    x, labels = _planted()
    y1 = tsne_core(x, 2, perplexity=15, n_iter=500)
    y2 = tsne_core(x, 2, perplexity=15, n_iter=500)
    assert np.array_equal(y1, y2)
    assert y1.shape == (90, 2)
    assert _nn_purity(y1, labels) >= 0.95


def test_umap_core_preserves_planted_clusters_and_is_deterministic():
    x, labels = _planted()
    y1 = umap_core(x, 2, n_neighbors=10, metric="euclidean", n_epochs=200)
    y2 = umap_core(x, 2, n_neighbors=10, metric="euclidean", n_epochs=200)
    assert np.array_equal(y1, y2)
    assert _nn_purity(y1, labels) >= 0.9
    # the reference's default metric is cosine (run_umap analytics.py:798)
    yc = umap_core(x, 2, n_neighbors=10, metric="cosine", n_epochs=200)
    assert _nn_purity(yc, labels) >= 0.9


def test_find_ab_params_matches_umap_learn_published_values():
    a, b = find_ab_params(0.1)
    assert a == pytest.approx(1.577, abs=5e-3)
    assert b == pytest.approx(0.895, abs=5e-3)
    # monotone sanity: looser min_dist -> flatter curve (smaller a)
    a3, _ = find_ab_params(0.3)
    assert a3 < a


def test_tsne_rejects_degenerate_and_oversized_inputs(spark):
    with pytest.raises(ValueError, match=">= 4 rows"):
        tsne_core(np.zeros((3, 4)))
    x, _ = _planted(n_per=4)
    df = spark.createDataFrame(
        [(i, *map(float, row)) for i, row in enumerate(x)],
        schema=["rid"] + [f"f{j}" for j in range(x.shape[1])],
    )
    with pytest.raises(ValueError, match="max_rows"):
        tsne_embed(df, [f"f{j}" for j in range(x.shape[1])], ["rid"], max_rows=5)


def test_embed_dataframes_roundtrip_and_dispatch(spark):
    x, labels = _planted(n_per=12, dim=6)
    feats = [f"f{j}" for j in range(6)]
    df = spark.createDataFrame(
        [(int(i), *map(float, row)) for i, row in enumerate(x)],
        schema=["rid"] + feats,
    )
    out = tsne_embed(df, feats, ["rid"], perplexity=10, n_iter=500)
    assert out.columns == ["rid", "x", "y"]
    rows = {r["rid"]: (r["x"], r["y"]) for r in out.collect()}
    assert len(rows) == 36
    y = np.array([rows[i] for i in range(36)])
    assert _nn_purity(y, labels) >= 0.9

    # collection order must not depend on partitioning
    out_r = tsne_embed(df.repartition(7), feats, ["rid"], perplexity=10, n_iter=500)
    assert sorted(out_r.collect()) == sorted(out.collect())

    disp = run_analysis(
        df, "umap", {"feature_cols": feats, "id_cols": ["rid"], "n_neighbors": 8}
    )
    assert disp.columns == ["rid", "x", "y"]
    assert disp.count() == 36


def _umap_ce(y, g, a, b):
    d2 = np.square(y).sum(1)[:, None] + np.square(y).sum(1)[None, :] - 2 * y @ y.T
    np.fill_diagonal(d2, 1.0)
    phi = 1.0 / (1.0 + a * np.power(np.maximum(d2, 1e-12), b))
    eps = 1e-12
    return float(-(g * np.log(phi + eps) + (1 - g) * np.log(1 - phi + eps)).sum())


def test_umap_descends_its_cross_entropy():
    """Objective-value gate, not output plausibility: the optimized
    layout must have materially lower fuzzy cross-entropy than the
    spectral init. This is the assertion that would have caught the
    inverted-gradient bug the purity tests missed (the init was already
    cluster-pure, so climbing the objective still 'looked right')."""
    from ckg_spark.ops.tsne import _fuzzy_graph, find_ab_params, umap_core

    x, _ = _planted()
    sq = np.square(x).sum(1)
    d = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2 * x @ x.T, 0.0))
    np.fill_diagonal(d, 0.0)
    g = _fuzzy_graph(d, 10)
    a, b = find_ab_params(0.3)

    y_opt = umap_core(x, 2, n_neighbors=10, metric="euclidean", n_epochs=200)
    y_init = umap_core(x, 2, n_neighbors=10, metric="euclidean", n_epochs=1)
    ce_opt, ce_init = _umap_ce(y_opt, g, a, b), _umap_ce(y_init, g, a, b)
    assert ce_opt < 0.5 * ce_init, (ce_opt, ce_init)


def test_tsne_descends_kl():
    """Same gate for t-SNE: KL(P||Q) of the final layout must be far
    below the (scaled-PCA) initialization's."""
    from ckg_spark.ops.tsne import _perplexity_probs, tsne_core

    x, _ = _planted()
    xc = x - x.mean(axis=0)
    d2 = np.square(xc).sum(1)
    d2 = np.maximum(d2[:, None] + d2[None, :] - 2.0 * (xc @ xc.T), 0.0)
    np.fill_diagonal(d2, 0.0)
    cond = _perplexity_probs(d2, 15.0)
    p = np.maximum((cond + cond.T) / (2.0 * len(x)), 1e-12)

    def kl(y):
        yd2 = np.square(y).sum(1)
        num = 1.0 / (1.0 + yd2[:, None] + yd2[None, :] - 2.0 * (y @ y.T))
        np.fill_diagonal(num, 0.0)
        q = np.maximum(num / num.sum(), 1e-12)
        return float((p * np.log(p / q)).sum())

    y_final = tsne_core(x, 2, perplexity=15, n_iter=500)
    y_early = tsne_core(x, 2, perplexity=15, n_iter=4)
    assert kl(y_final) < 0.5 * kl(y_early), (kl(y_final), kl(y_early))


def test_layout_rejects_coordinate_name_collision(spark):
    import numpy as np

    from ckg_spark.ops.tsne import _layout_df

    rows = spark.createDataFrame([("a",)], schema="x string").collect()
    with pytest.raises(ValueError, match="collide with the output coordinate"):
        _layout_df(spark, rows, ["x"], np.zeros((1, 2)))
