"""Learned quality classifier — train on a labeled sample, score the corpus.

The third leg of the quality-filtering triad (heuristic stats in
ops/textstats.py, LM perplexity in ops/lm.py): a logistic-regression
document classifier in the style of GPT-3/LLaMA's WebText quality filter
(Brown et al. 2020 §A; Touvron et al. 2023 train a classifier on
Wikipedia-referenced pages and keep documents stochastically by score).

Scale split (the realistic deployment shape):
- TRAINING data is a labeled sample — dimension-sized by definition
  (somebody labeled it) — so the model fits on the DRIVER with
  deterministic full-batch gradient descent (fixed iterations, zero
  init, pure-Python floats; no BLAS nondeterminism);
- SCORING is distributed and JVM-only: per-doc l2-normalized unigram
  counts, ONE broadcast join against the weight table, one per-doc
  aggregation, sigmoid. The corpus text never shuffles;
- the stochastic keep decision (keep doc with probability == its score,
  LLaMA-style) uses the lowbias32 uniform of the doc id — deterministic
  and stable under repartitioning, like every sampling decision in this
  engine (ops/curation.py).

The DuckDB oracle replays the identical GD recurrence as unrolled
MATERIALIZED CTEs (the kmeans/PageRank twin pattern — materialization
keeps the per-iteration expression tree linear, see CLAUDE.md). The
sigmoid argument is clamped to [-500, 500] IDENTICALLY on every path:
Python's math.exp raises on overflow where SQL saturates, so the clamp
is part of the model's definition, not a numerical afterthought.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import split_u
from .lm import _tokens

Z_CLAMP = 500.0


def doc_token_counts(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, tok, c) unigram counts — in-partition explode, map-side
    combined; the shuffle carries (doc, tok) counts, never text.
    Tokenization is lm._tokens so the quality triad (perplexity LM,
    DSIR, this classifier) scores one definitionally-identical token
    stream. Token-less docs contribute no rows — scoring/training
    re-attach them with empty features."""
    toks = _tokens(docs, text_col)
    return (
        toks.select(F.col(id_col).alias("doc"), F.explode("_tk").alias("tok"))
        .groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )


def _l2_features(counts: DataFrame) -> DataFrame:
    # window, not groupBy+join: the join spelling scans the count frame
    # twice (once for norms, once to attach them); an unbounded window
    # over doc is one shuffle and one pass
    from pyspark.sql.window import Window

    nrm = F.sqrt(F.sum(F.col("c") * F.col("c")).over(Window.partitionBy("doc")))
    return counts.select("doc", "tok", (F.col("c") / nrm).alias("x"))


def _sigmoid(z: float) -> float:
    z = max(-Z_CLAMP, min(Z_CLAMP, z))
    return 1.0 / (1.0 + math.exp(-z))


def train_logreg(
    labeled: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str,
    lr: float = 1.0,
    iters: int = 20,
) -> tuple[list[tuple[str, float]], float]:
    """Deterministic full-batch GD on the driver over the labeled
    sample's l2-normalized unigram features:

        e_d   = sigmoid(sum_t w_t x_dt + b) - y_d
        w_t  -= lr/n * sum_d e_d x_dt ;  b -= lr/n * sum_d e_d

    Zero init, fixed ``iters``; vocabulary = tokens of the labeled docs
    (out-of-vocabulary tokens score with weight 0). EVERY labeled doc
    participates — a token-less doc has empty features, so it still
    drives the bias through e_d = sigmoid(b) - y_d and counts in n.
    Returns (sorted [(tok, w)], bias). Sums run in sorted (doc, tok)
    order so the recurrence is reproducible run-to-run."""
    feats = _l2_features(doc_token_counts(labeled, text_col, id_col))
    lab = labeled.select(
        F.col(id_col).alias("doc"), F.col(label_col).cast("double").alias("y")
    )
    rows = sorted(
        (r["doc"], r["tok"], r["x"])
        for r in feats.join(lab.select("doc"), "doc", "left_semi").collect()
    )
    ys = {r["doc"]: r["y"] for r in lab.collect()}
    if not ys:
        raise ValueError("train_logreg: labeled sample is empty — nothing to fit")
    by_doc: dict = {}
    for d, t, x in rows:
        by_doc.setdefault(d, []).append((t, x))
    docs = sorted(ys)
    vocab = sorted({t for _d, t, _x in rows})
    n = float(len(docs))
    w = {t: 0.0 for t in vocab}
    b = 0.0
    for _ in range(iters):
        grad_w = {t: 0.0 for t in vocab}
        grad_b = 0.0
        for d in docs:
            z = sum(w[t] * x for t, x in by_doc.get(d, ())) + b
            e = _sigmoid(z) - ys[d]
            for t, x in by_doc.get(d, ()):
                grad_w[t] += e * x
            grad_b += e
        for t in vocab:
            w[t] -= lr / n * grad_w[t]
        b -= lr / n * grad_b
    return sorted(w.items()), b


def score_quality(
    docs: DataFrame,
    weights: list[tuple[str, float]],
    bias: float,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(doc, score, kept) for EVERY input document: sigmoid(w . x + b),
    plus the LLaMA-style stochastic keep — u(doc) < score with the
    deterministic lowbias32 uniform. Weight table broadcast; one agg
    pass over (doc, tok) counts, then a left join back onto the id set
    so token-less docs score sigmoid(bias) instead of silently missing
    (a downstream 'drop where not kept' must see them)."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(weights, "tok string, w double")
    feats = _l2_features(doc_token_counts(docs, text_col, id_col))
    zz = (
        feats.join(F.broadcast(wdf), "tok", "left")
        .groupBy("doc")
        .agg(F.sum(F.coalesce(F.col("w"), F.lit(0.0)) * F.col("x")).alias("zz"))
    )
    ids = docs.select(F.col(id_col).alias("doc"))
    z = ids.join(zz, "doc", "left").select(
        "doc",
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -F.greatest(
                        F.lit(-Z_CLAMP),
                        F.least(
                            F.lit(Z_CLAMP),
                            F.coalesce(F.col("zz"), F.lit(0.0)) + F.lit(float(bias)),
                        ),
                    )
                )
            )
        ).alias("score"),
    )
    return z.select(
        "doc", "score", (split_u(F.col("doc")) < F.col("score")).alias("kept")
    )
