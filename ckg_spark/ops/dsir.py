"""DSIR — data selection via importance resampling (Xie et al. 2023).

The standard scalable recipe for "pick the k raw web documents that look
most like a target corpus": fit hashed-n-gram unigram+bigram bag models
of the TARGET and the RAW distributions, weight every raw document by
its log importance ratio sum_f count_doc(f) * (ln p_target(f) -
ln p_raw(f)), perturb with Gumbel noise and take the top k (Gumbel
top-k sampling == sampling without replacement proportional to the
importance weights — Vieira 2014).

Scale design:
- the feature-ratio table joins into the document token stream as a
  BROADCAST when ``n_buckets`` bounds it (DSIR's hashing trick — the
  production path); the exact-string path's table is vocabulary-sized
  (all unigrams+bigrams — unbounded), so it shuffle-joins the
  (doc, feat) id stream instead. Either way the document TEXT never
  shuffles for scoring, exactly like ops/lm.py;
- distribution fitting is two map-side-combined count aggregations;
- selection is a TakeOrdered top-k (no global sort shuffle);
- Gumbel noise derives from the lowbias32 ``split_u`` mix of the doc id
  (ops/curation.py) — bit-identical across engines and stable under
  repartitioning, so the selected SET is deterministic (the north
  rule's no-nondeterministic-tie-breaks requirement).

The DuckDB oracle replays the exact pipeline on raw n-gram strings
(``n_buckets=None``); the hashed path is the same math over
``xxhash64`` buckets (engine-only — collision-bounded, tested for
agreement with the exact path at large bucket counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import _M32, split_u
from .lm import TOKEN_RE


def _features(
    docs: DataFrame, text_col: str, id_col: str | None, n_buckets: int | None
) -> DataFrame:
    """Per-occurrence unigram + bigram feature stream (doc, feat).
    The explode keeps rows in their input partition — no shuffle.
    id_col=None emits a constant doc id: the target-corpus side only ever
    aggregates per-feature counts, so requiring an id column there would
    make a text-only target parquet (the documented input) crash."""
    toks = docs.withColumn(
        "_tk", F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    ).filter(F.size("_tk") >= 1)
    grams = F.concat(
        F.col("_tk"),
        F.zip_with(
            F.slice(F.col("_tk"), 1, F.size("_tk") - 1),
            F.slice(F.col("_tk"), 2, F.size("_tk") - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    doc = F.col(id_col) if id_col is not None else F.lit(0)
    out = toks.select(doc.alias("doc"), F.explode(grams).alias("feat"))
    if n_buckets is not None:
        out = out.select(
            "doc", F.pmod(F.xxhash64("feat"), F.lit(int(n_buckets))).alias("feat")
        )
    return out


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    smoothing: float = 1.0,
    n_buckets: int | None = None,
) -> DataFrame:
    """Per-raw-document log importance weight under Laplace-smoothed
    unigram+bigram models:

        lr(f)  = ln[(c_t(f)+s) / (T_t+s*V)] - ln[(c_r(f)+s) / (T_r+s*V)]
        log_w  = sum over the document's feature OCCURRENCES of lr(f)

    V is the joint vocabulary (the bucket count when hashed). Returns
    (doc, n_feats, log_w, avg_lr)."""
    rf = _features(raw, text_col, id_col, n_buckets)
    tf = _features(target, text_col, None, n_buckets)  # text-only target OK
    rc = rf.groupBy("feat").agg(F.count(F.lit(1)).alias("cr"))
    tc = tf.groupBy("feat").agg(F.count(F.lit(1)).alias("ct"))
    joint = rc.join(tc, "feat", "full_outer").select(
        "feat",
        F.coalesce("cr", F.lit(0)).alias("cr"),
        F.coalesce("ct", F.lit(0)).alias("ct"),
    )
    tots = joint.agg(
        F.sum("cr").alias("tr"),
        F.sum("ct").alias("tt"),
        F.count(F.lit(1)).cast("double").alias("vocab_n"),
    ).select(
        "tr",
        "tt",
        (
            F.lit(float(n_buckets)) if n_buckets is not None else F.col("vocab_n")
        ).alias("vsz"),
    )
    s = float(smoothing)
    lr = joint.crossJoin(F.broadcast(tots)).select(
        "feat",
        (
            F.log((F.col("ct") + F.lit(s)) / (F.col("tt") + F.lit(s) * F.col("vsz")))
            - F.log((F.col("cr") + F.lit(s)) / (F.col("tr") + F.lit(s) * F.col("vsz")))
        ).alias("lr"),
    )
    # broadcast the ratio table ONLY when hashing bounds it (<= n_buckets
    # rows); the exact-string path's table is vocabulary-sized (unigrams +
    # bigrams of the whole corpus — unbounded), so it must shuffle-join
    # the (doc, feat) stream instead. Only ids + features shuffle; the
    # document text still never does.
    ratio = F.broadcast(lr) if n_buckets is not None else lr
    return (
        rf.join(ratio, "feat")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_feats"), F.sum("lr").alias("log_w"))
        .select(
            "doc",
            F.col("n_feats").cast("bigint").alias("n_feats"),
            F.col("log_w"),
            (F.col("log_w") / F.col("n_feats")).alias("avg_lr"),
        )
    )


def gumbel_key(doc_col, log_w_col):
    """log_w + Gumbel(0,1) noise from the doc id's lowbias32 uniform —
    u is shifted by 0.5/2^32 so it is strictly inside (0,1) and the
    double logs never see 0. Deterministic, cross-engine exact."""
    u = split_u(doc_col) + F.lit(0.5 / _M32)
    return log_w_col - F.log(-F.log(u))


def dsir_select(
    weighted: DataFrame, k: int, noisy: bool = True
) -> DataFrame:
    """Gumbel top-k over the importance weights (== weighted sampling
    without replacement); ``noisy=False`` degenerates to plain top-k by
    weight. TakeOrdered — no full-sort shuffle. Ties broken by doc id."""
    key = gumbel_key(F.col("doc"), F.col("log_w")) if noisy else F.col("log_w")
    return (
        weighted.withColumn("key", key)
        .orderBy(F.desc("key"), F.asc("doc"))
        .limit(int(k))
    )
