"""N-gram language-model quality scoring (CCNet-style perplexity filter).

A standard web-corpus curation stage the reference does not have (its
text layer stops at dictionary tagging): score every document's
perplexity under a count-based bigram model with stupid backoff
(Brants et al. 2007, "Large Language Models in Machine Translation"),
then bucket the corpus into head/middle/tail quality terciles the way
CCNet does with its wikipedia-trained KenLM (Wenzek et al. 2019).

Scale design (the part that matters at 100 TB):
- TRAINING is two count aggregations over the exploded token stream —
  map-side partial aggregation shrinks the shuffle to the model's own
  cardinality, and ``min_count`` pruning caps the bigram table so the
  MODEL, not the corpus, is the thing that must fit for broadcast;
- SCORING never shuffles the text: one ``explode`` of (prev, tok)
  pairs (rows stay in their input partition), two BROADCAST joins
  against the model tables, then a per-document aggregation whose
  map-side combine emits one tiny row per document per partition;
- everything is JVM column math (regexp tokenizer, arrays_zip, ln) —
  no Python in the hot path.

Cross-engine notes (the DuckDB oracle hashes the output): token
probabilities are exact ratios of BIGINT counts, so both engines take
ln() of bitwise-identical doubles; perplexity is rounded to 4 dp to
absorb summation-order ulps in the per-document mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Latin-script SCORING tokenizer (lm/dsir/classifier share it — the
# DuckDB oracles and reference tests mirror this exact class). Scoring
# ops never rewrite text, so non-Latin docs are simply UNSCORED (no ppl
# row); destructive ops must not use this — remove_repeated_spans
# tokenizes on \p{L}\p{N} so it never deletes non-Latin content, and
# curate's LM stage left-joins so unscored docs pass through.
TOKEN_RE = "[a-z0-9']+"
BOS = "<s>"
ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007 use 0.4)


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        "_tk", F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    ).filter(F.size("_tk") >= 1)


def _pairs(df: DataFrame, id_col: str) -> DataFrame:
    """(doc, prev, tok) bigram stream with a BOS sentinel — the explode
    keeps rows in their input partition (no shuffle)."""
    prev = F.concat(F.array(F.lit(BOS)), F.slice(F.col("_tk"), 1, F.size("_tk") - 1))
    return df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.arrays_zip(prev.alias("prev"), F.col("_tk").alias("tok"))).alias("p"),
    ).select("_doc", F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok"))


def ngram_model(
    docs: DataFrame, text_col: str, id_col: str, min_count: int = 1
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables for the stupid-backoff bigram model:
    (unigrams(tok, uc), bigrams(prev, tok, bc, cc), totals(total)).
    cc is the context count — occurrences of ``prev`` as a bigram
    context (which also gives the BOS context = number of documents
    without a separate pass). ``min_count`` prunes rare bigrams (the
    model-size knob); unigrams are kept in full. Neither table is forced
    to broadcast downstream — a self-trained crawl-scale vocabulary is
    corpus-proportional (see lm_perplexity)."""
    pairs = _pairs(_tokens(docs, text_col), id_col)
    # ONE corpus pass: the full bigram table determines everything else —
    # every token occurrence appears exactly once as `tok` in the pair
    # stream, so uc/cc/total are sums over the (model-sized) bigram counts.
    # localCheckpoint pins it so those derivations never rescan the corpus.
    bi_full = (
        pairs.groupBy("prev", "tok")
        .agg(F.count(F.lit(1)).alias("bc"))
        .localCheckpoint(eager=True)
    )
    uni = bi_full.groupBy("tok").agg(F.sum("bc").alias("uc"))
    ctx = bi_full.groupBy("prev").agg(F.sum("bc").alias("cc"))
    bi = bi_full.filter(F.col("bc") >= F.lit(int(min_count))).join(ctx, "prev")
    tot = uni.agg(F.sum("uc").alias("total"))
    return uni, bi, tot


def lm_perplexity(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    model_docs: DataFrame | None = None,
    alpha: float = ALPHA,
    min_count: int = 1,
) -> DataFrame:
    """Per-document stupid-backoff bigram perplexity:

        p(tok | prev) = bc/cc                 if the bigram survived
                      = alpha * uc/total      backoff to the unigram
                      = alpha * 0.5/total     floor for unseen tokens

        ppl = exp(-mean ln p)                 over the document's tokens

    ``model_docs`` defaults to ``docs`` (self-trained model — the CCNet
    deployment trains on a reference corpus instead; pass it here).
    Returns (doc, n_tokens, avg_logprob, ppl)."""
    uni, bi, tot = ngram_model(model_docs or docs, text_col, id_col, min_count)
    pairs = _pairs(_tokens(docs, text_col), id_col)
    # No forced broadcast on the model tables: a SELF-trained model over a
    # web crawl has corpus-proportional vocab (heavy-tailed token space —
    # billions of distinct unigrams at 10^12 docs), so AQE decides at
    # runtime. The CCNet deployment trains on a bounded reference corpus
    # (pass ``model_docs``), which keeps both tables broadcast-sized and
    # AQE picks the broadcast automatically.
    scored = (
        pairs.join(bi, ["prev", "tok"], "left")
        .join(uni, "tok", "left")
        .crossJoin(F.broadcast(tot))
    )
    p = F.when(
        F.col("bc").isNotNull(), F.col("bc").cast("double") / F.col("cc")
    ).otherwise(
        F.lit(float(alpha))
        * F.coalesce(F.col("uc").cast("double"), F.lit(0.5))
        / F.col("total")
    )
    return (
        scored.select("_doc", F.log(p).alias("lp"))
        .groupBy("_doc")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.avg("lp").alias("alp"))
        .select(
            F.col("_doc").alias("doc"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.round("alp", 6).alias("avg_logprob"),
            F.round(F.exp(-F.col("alp")), 4).alias("ppl"),
        )
    )


def perplexity_buckets(scored: DataFrame) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2019 §4.3): exact
    tercile cutpoints as ORDER STATISTICS over the (ppl, count)
    frequency table — c_p is the smallest ppl whose cumulative count
    reaches p*n. Ties at a cutpoint go to the lower bucket
    (deterministic: buckets compare the already-rounded ppl both
    engines share; the DuckDB oracle computes the identical freq/cum
    spelling).

    Scale shape: the frequency aggregation shrinks the corpus to its
    DISTINCT rounded-ppl values with map-side combine, and the
    cumulative window over that table is sort-based (single ordered
    partition, but it streams and spills). The previous spelling used
    the exact ``percentile`` aggregate, whose merge buffer holds a hash
    map of every distinct ppl value on ONE task — ppl is unbounded
    above, so at crawl scale that one buffer OOMs where a sorted
    window merely spills.

    Exact terciles need two passes over ``scored`` (cutpoints, then the
    bucket column); at production scale persist the scored frame first —
    or derive the cutpoints from a deterministic split_u sample — instead
    of replaying the scoring plan (CCNet itself is two-phase here)."""
    from pyspark.sql.window import Window

    freq = scored.groupBy("ppl").agg(F.count(F.lit(1)).alias("w"))
    wspec = Window.orderBy("ppl").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = freq.select("ppl", F.sum("w").over(wspec).alias("cum"))
    n = freq.agg(F.sum("w").alias("n"))
    cuts = cum.crossJoin(F.broadcast(n)).agg(
        F.min(F.when(F.col("cum") >= F.col("n") / 3.0, F.col("ppl"))).alias("c1"),
        F.min(
            F.when(F.col("cum") >= F.col("n") * 2.0 / 3.0, F.col("ppl"))
        ).alias("c2"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        "doc",
        "n_tokens",
        "avg_logprob",
        "ppl",
        F.when(F.col("ppl") <= F.col("c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
