"""Training-data curation ops: deterministic sampling / splitting,
sequence packing, and benchmark-contamination screening.

These are engine extras beyond the reference (which curates experiment
matrices, not LLM corpora) — the operations a large-scale training-data
pipeline runs between dedup (ops/dedup.py) and export:

- :func:`split_u` — a deterministic per-id uniform in [0, 1) from the
  public-domain lowbias32 integer mix (xor-shift-multiply, two rounds).
  Pure int64 arithmetic, so Spark and DuckDB compute IDENTICAL values —
  sampling, splits and holdout membership are value-hash-verifiable,
  and assignment is stable under repartitioning/reruns (seeded
  ``sample()`` is not: it changes with partitioning). ``split_u_sql``
  renders the same graph as SQL text.
- stratified sampling / train-val-test splitting: pure map-side
  predicates on split_u — zero shuffles beyond the final aggregation.
- :func:`pack_greedy` — contiguous sequence packing: per stratum, docs
  in id order accumulate into buckets of ~``budget`` tokens (a doc
  joins the bucket its PREDECESSOR sum falls in, so each bucket holds
  at most budget + one document of tokens — the deterministic,
  window-expressible form of first-fit packing). One window pass per
  stratum; at scale, strata are the partition axis. A single giant
  stratum serializes its window — sub-split it on a split_u range first.
- contamination screen: exact n-gram overlap between the training
  corpus and a holdout/benchmark set (the decontamination step of
  LLM-corpus pipelines), as an n-gram equi-join — blocked by shingle
  exactly like the dedup family, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_MIX = 0x45D9F3B  # lowbias32 multiplier (public-domain constant)
_M32 = 4294967296


def split_u(id_col: Column) -> Column:
    """Deterministic uniform [0, 1) per integer id — lowbias32 mix."""
    h = id_col.cast("long") % F.lit(_M32)
    for _ in range(2):
        h = (F.shiftright(h, 16).bitwiseXOR(h) * F.lit(_MIX)) % F.lit(_M32)
    h = F.shiftright(h, 16).bitwiseXOR(h)
    return h.cast("double") / F.lit(float(_M32))


def split_u_sql(id_expr: str) -> str:
    """The identical mix as DuckDB SQL text (xor()/>> on BIGINT)."""
    h = f"(({id_expr}) % {_M32})"
    for _ in range(2):
        h = f"((xor({h} >> 16, {h}) * {_MIX}) % {_M32})"
    h = f"xor({h} >> 16, {h})"
    return f"(CAST({h} AS DOUBLE) / {_M32}.0)"


def assign_split(
    id_col: Column, train: float = 0.8, val: float = 0.9
) -> Column:
    """'train' / 'val' / 'test' by split_u thresholds (stable under
    repartitioning and re-ingestion — membership is a function of the id)."""
    u = split_u(id_col)
    return (
        F.when(u < train, F.lit("train"))
        .when(u < val, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def pack_greedy(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Assign each row a packing bucket: per stratum, rows in order_col
    order; bucket = floor(preceding-cumulative-tokens / budget). Adds a
    ``bucket`` column (bigint)."""
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    bucket = F.floor((cum - F.col(tokens_col)) / F.lit(float(budget)))
    return df.withColumn("bucket", bucket.cast("bigint"))


def ngram_overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """(left_id, right_id, n_shared) — pairs sharing at least one FULL
    word n-gram, with the count of distinct shared n-grams. The join key
    is the n-gram (high cardinality — well-distributed, never all-pairs);
    partial tail shingles (< n tokens) are dropped so short docs cannot
    alias into spurious matches."""
    from .dedup import word_shingles

    def exploded(d: DataFrame, out: str) -> DataFrame:
        sh = word_shingles(d, id_col, text_col, n=n)
        s = F.explode("shingles").alias("s")
        e = sh.select(F.col("key").cast("long").alias(out), s)
        return e.filter(F.size(F.split(F.col("s"), " ")) == n)

    l = exploded(left, "left_id")
    r = exploded(right, "right_id")
    # word_shingles already de-dups per doc, so (id, s) is unique per side
    # and a plain count IS the distinct shared-ngram count — no distinct agg
    return (
        l.join(r, "s")
        .groupBy("left_id", "right_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
