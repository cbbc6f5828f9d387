"""Quality classifier: independent numpy matrix-form GD reference,
planted separability, and determinism."""

from __future__ import annotations

import re

import numpy as np
import pytest

from ckg_spark.ops import classifier

GOOD = [
    "informative article about science and research methods",
    "detailed analysis of research data and scientific findings",
    "the science of careful research and honest analysis",
]
SPAM = [
    "buy cheap pills casino bonus click click",
    "casino bonus free spins click here buy now",
    "cheap pills free bonus casino spam spam",
]
DOCS = [(i, t) for i, t in enumerate(GOOD + SPAM)]
LABELS = [1.0] * len(GOOD) + [0.0] * len(SPAM)


def _ref_train(docs, ys, lr=1.0, iters=20):
    """Matrix-form GD in numpy — independently coded from the engine's
    per-doc loop (dense X, vectorized sigmoid)."""
    tok = lambda t: re.findall(r"[a-z0-9']+", t.lower())
    vocab = sorted({w for _i, t in docs for w in tok(t)})
    vi = {w: j for j, w in enumerate(vocab)}
    X = np.zeros((len(docs), len(vocab)))
    for r, (_i, t) in enumerate(docs):
        for w in tok(t):
            X[r, vi[w]] += 1.0
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    y = np.asarray(ys)
    w = np.zeros(len(vocab))
    b = 0.0
    for _ in range(iters):
        z = np.clip(X @ w + b, -500, 500)
        e = 1.0 / (1.0 + np.exp(-z)) - y
        w -= lr / len(docs) * (X.T @ e)
        b -= lr / len(docs) * e.sum()
    return dict(zip(vocab, w)), b, vi


@pytest.fixture(scope="module")
def labeled_df(spark):
    rows = [(i, t, y) for (i, t), y in zip(DOCS, LABELS)]
    return spark.createDataFrame(rows, "doc_id long, text string, y double")


def test_training_matches_numpy_reference(spark, labeled_df):
    weights, bias = classifier.train_logreg(labeled_df, "text", "doc_id", "y")
    ref_w, ref_b, _ = _ref_train(DOCS, LABELS)
    assert bias == pytest.approx(ref_b, abs=1e-12)
    got = dict(weights)
    assert set(got) == set(ref_w)
    for t in ref_w:
        assert got[t] == pytest.approx(ref_w[t], abs=1e-12), t


def test_scores_separate_planted_classes(spark, labeled_df):
    weights, bias = classifier.train_logreg(labeled_df, "text", "doc_id", "y")
    scored = {
        r["doc"]: r
        for r in classifier.score_quality(
            labeled_df, weights, bias, "text", "doc_id"
        ).collect()
    }
    good_scores = [scored[i]["score"] for i in range(len(GOOD))]
    spam_scores = [scored[i + len(GOOD)]["score"] for i in range(len(SPAM))]
    assert min(good_scores) > max(spam_scores)
    # an unseen good-vocabulary doc outranks an unseen spam-vocabulary doc
    new = spark.createDataFrame(
        [(100, "new research analysis of science"), (101, "click casino pills bonus")],
        "doc_id long, text string",
    )
    ns = {r["doc"]: r["score"] for r in classifier.score_quality(
        new, weights, bias, "text", "doc_id").collect()}
    assert ns[100] > ns[101]


def test_kept_deterministic_under_repartition(spark, labeled_df):
    weights, bias = classifier.train_logreg(labeled_df, "text", "doc_id", "y")
    a = sorted(
        (r["doc"], r["kept"])
        for r in classifier.score_quality(labeled_df, weights, bias, "text", "doc_id").collect()
    )
    b = sorted(
        (r["doc"], r["kept"])
        for r in classifier.score_quality(
            labeled_df.repartition(7), weights, bias, "text", "doc_id"
        ).collect()
    )
    assert a == b
