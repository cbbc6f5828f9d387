"""Missing-value imputation as distributed column math.

The reference imputes at report time (analytics_core/analytics/
analytics.py:240-340): ``imputation_normal_distribution`` fills a
feature's missing values with draws from a down-shifted normal
(mean - 1.8*std, width 0.3*std — the Perseus/MinProb convention for
left-censored proteomics data), and ``imputation_KNN`` fills from the k
nearest samples. Here:

- :func:`impute_group_median` — per-group exact-median fill (the
  ``group_median`` branch of imputation_mixed_norm_KNN); pure window
  math, DuckDB-oracle hash-checkable.
- :func:`impute_normal_downshift` — the down-shifted fill WITHOUT the
  random jitter: missing becomes ``mean - shift*std`` of the group's
  observed values, where "group" is caller-chosen ``group_cols``. The
  REFERENCE's grouping is per SAMPLE — imputation_normal_distribution
  transposes before taking column stats, "for each sample (across all
  proteins) separately" (analytics.py:306) — so reference-parity callers
  pass the (group, sample) keys (prep.py and impute_mixed do). Dropping
  the 0.3σ jitter is a deliberate determinism trade (the reference seeds
  numpy instead); the imputed values land at the distribution's left
  shoulder exactly as MinProb intends, and the operator stays
  reproducible and hash-verifiable on both backends.
- :func:`impute_knn` — the ``imputation_KNN`` branch (analytics.py:
  240-266, sklearn KNNImputer semantics: nan-euclidean distances over
  shared observed features, uniform mean of the k nearest samples that
  observe the target feature). Distributed as a feature-blocked
  self-join over OBSERVED cells only — the pairwise table is bounded by
  |samples|², and samples are the dimension axis of the reference's
  matrices (clinical/proteomics samples), not the corpus axis. At
  100 TB you run this per cohort; the corpus-scale paths remain
  median/down-shift.

Missing-ness convention: callers pass an ``is_missing`` boolean Column
(the synthetic test tables are null-free, so tests model missing as a
value predicate, exactly like q_missing_values_per_group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def impute_group_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    is_missing: Column,
    out_col: str = "value_imputed",
) -> DataFrame:
    """Fill missing values with the group's EXACT interpolated median of
    observed values (percentile(0.5) == DuckDB quantile_cont — the same
    pairing q_median_price_by_brand hash-verifies)."""
    w = Window.partitionBy(*group_cols)
    observed = F.when(~is_missing, F.col(value_col).cast("double"))
    return (
        df.withColumn("__obs__", observed)
        .withColumn("__med__", F.expr("percentile(__obs__, 0.5)").over(w))
        .withColumn(
            out_col,
            F.round(
                F.when(is_missing, F.col("__med__")).otherwise(
                    F.col(value_col).cast("double")
                ),
                6,
            ),
        )
        .drop("__obs__", "__med__")
    )


def impute_knn(
    cells: DataFrame,
    sample_col: str,
    feature_col: str,
    value_col: str,
    is_missing: Column,
    k: int = 5,
    block_col: str | None = None,
) -> DataFrame:
    """Fill each missing (sample, feature) cell with the mean of the k
    nearest samples' observed values for that feature.

    Distance is sklearn's nan-euclidean: ``sqrt(d_total * ssd / n_shared)``
    over features observed in BOTH samples (d_total = the matrix's
    feature count). Neighbors are ranked (distance, neighbor id) — the id
    tiebreak makes the operator deterministic where sklearn's
    argpartition order is not. Samples sharing no observed feature are
    simply not candidates; a feature-mean fallback covers cells with no
    candidate at all (sklearn's column-mean fallback).

    ``block_col`` restricts neighbors (and d_total / the fallback mean)
    to samples of the same block — the reference's imputation_KNN runs
    one KNN per GROUP submatrix (analytics.py:240-266 loops
    ``df[group] == g``), and at scale blocking is also what keeps the
    pairwise table bounded per cohort instead of global.

    Returns one row per missing cell: (sample, feature, value_imputed)
    plus the block column when given.
    """
    v = F.col(value_col).cast("double")
    blk = [block_col] if block_col else []
    bsel = [F.col(c) for c in blk]
    obs = cells.filter(~is_missing).select(
        *bsel,
        F.col(sample_col).alias("__s__"),
        F.col(feature_col).alias("__f__"),
        v.alias("__v__"),
    )
    miss = cells.filter(is_missing).select(
        *bsel, F.col(sample_col).alias("__s__"), F.col(feature_col).alias("__f__")
    )
    d_total = cells.groupBy(*blk).agg(
        F.countDistinct(feature_col).cast("double").alias("__d__")
    )
    a, b = obs.alias("a"), obs.alias("b")
    pair_cond = (F.col("a.__f__") == F.col("b.__f__")) & (
        F.col("a.__s__") != F.col("b.__s__")
    )
    for c in blk:
        pair_cond = pair_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    pairs = (
        a.join(b, pair_cond)
        .groupBy(
            *[F.col(f"a.{c}").alias(c) for c in blk],
            F.col("a.__s__").alias("s1"),
            F.col("b.__s__").alias("s2"),
        )
        .agg(
            F.sum(
                (F.col("a.__v__") - F.col("b.__v__"))
                * (F.col("a.__v__") - F.col("b.__v__"))
            ).alias("ssd"),
            F.count(F.lit(1)).cast("bigint").alias("nsh"),
        )
    )
    if blk:
        dist = pairs.join(F.broadcast(d_total), blk)
    else:
        dist = pairs.crossJoin(F.broadcast(d_total))
    dist = dist.select(
        *bsel,
        "s1",
        "s2",
        F.sqrt(F.col("__d__") * F.col("ssd") / F.col("nsh")).alias("dist"),
    )
    cand = miss.join(dist.withColumnRenamed("s1", "__s__"), [*blk, "__s__"])
    nb = obs.select(
        *[F.col(c).alias(f"__b_{c}__") for c in blk],
        F.col("__s__").alias("s2o"),
        F.col("__f__").alias("f2"),
        F.col("__v__").alias("nv"),
    )
    nb_cond = (F.col("s2") == F.col("s2o")) & (F.col("__f__") == F.col("f2"))
    for c in blk:
        nb_cond = nb_cond & (F.col(c) == F.col(f"__b_{c}__"))
    cand = cand.join(nb, nb_cond).select(*blk, "__s__", "__f__", "s2", "nv", "dist")
    w = Window.partitionBy(*blk, "__s__", "__f__").orderBy(
        F.col("dist").asc(), F.col("s2").asc()
    )
    knn = (
        cand.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .groupBy(*blk, "__s__", "__f__")
        .agg(F.avg("nv").alias("__knn__"))
    )
    fmean = obs.groupBy(*blk, "__f__").agg(F.avg("__v__").alias("__fmean__"))
    return (
        miss.join(knn, [*blk, "__s__", "__f__"], "left")
        .join(F.broadcast(fmean), [*blk, "__f__"], "left")
        .select(
            *bsel,
            F.col("__s__").alias(sample_col),
            F.col("__f__").alias(feature_col),
            F.round(F.coalesce(F.col("__knn__"), F.col("__fmean__")), 6).alias(
                "value_imputed"
            ),
        )
    )


def impute_mixed(
    cells: DataFrame,
    sample_col: str,
    feature_col: str,
    value_col: str,
    is_missing: Column,
    group_col: str,
    cutoff: float = 0.6,
    shift: float = 1.8,
    k: int = 3,
) -> DataFrame:
    """Mixed KNN + down-shifted-normal imputation
    (imputation_mixed_norm_KNN, analytics.py:268-291): features observed
    in at least ``cutoff`` of a group's samples are KNN-imputed WITHIN
    that group (the reference loops ``df[group] == g`` and keeps only
    columns with ``notnull().mean() >= cutoff``; fancyimpute KNN(k=3));
    every remaining missing cell gets its SAMPLE's ``mean - shift*std``
    computed over that (group, sample) row's POST-KNN values across all
    features — the reference's stage-2 ``imputation_normal_distribution``
    transposes first, so its per-column stats are per-sample, "for each
    sample (across all proteins) separately" (analytics.py:306) — minus
    the seeded jitter, the module's documented determinism trade. A
    sample with fewer than two post-KNN observed values has no stddev
    and its downshift cells come back NULL (the reference fills 0.0 for
    all-NaN stats — an artifact of its ``value = 0.0`` default, not a
    semantic we reproduce).

    Returns one row per missing cell:
    (group, sample, feature, value_imputed, method∈{'knn','downshift'}).
    """
    v = F.col(value_col).cast("double")
    g = cells.select(
        F.col(group_col).alias("__g__"),
        F.col(sample_col).alias("__s__"),
        F.col(feature_col).alias("__f__"),
        v.alias("__v__"),
        is_missing.alias("__miss__"),
    )
    elig = (
        g.groupBy("__g__", "__f__")
        .agg(F.avg(F.when(F.col("__miss__"), 0.0).otherwise(1.0)).alias("__frac__"))
        .filter(F.col("__frac__") >= F.lit(float(cutoff)))
        .select("__g__", "__f__")
    )
    ge = g.join(F.broadcast(elig), ["__g__", "__f__"])
    knn_fill = impute_knn(
        ge, "__s__", "__f__", "__v__", F.col("__miss__"), k=k, block_col="__g__"
    ).withColumnRenamed("value_imputed", "__iv__")
    post = g.filter(~F.col("__miss__")).select("__g__", "__s__", "__v__").unionByName(
        knn_fill.select("__g__", "__s__", F.col("__iv__").alias("__v__"))
    )
    # per (group, sample) — the keys identifying one of the reference's
    # transposed columns; sample ids may repeat across groups
    fstat = post.groupBy("__g__", "__s__").agg(
        (F.avg("__v__") - F.lit(float(shift)) * F.stddev_samp("__v__")).alias("__fill__")
    )
    down = (
        g.filter(F.col("__miss__"))
        .join(F.broadcast(elig), ["__g__", "__f__"], "left_anti")
        .join(F.broadcast(fstat), ["__g__", "__s__"], "left")
        .select(
            "__g__",
            "__s__",
            "__f__",
            F.round(F.col("__fill__"), 6).alias("value_imputed"),
            F.lit("downshift").alias("method"),
        )
    )
    knn_rows = knn_fill.select(
        "__g__",
        "__s__",
        "__f__",
        F.round(F.col("__iv__"), 6).alias("value_imputed"),
        F.lit("knn").alias("method"),
    )
    return knn_rows.unionByName(down).select(
        F.col("__g__").alias(group_col),
        F.col("__s__").alias(sample_col),
        F.col("__f__").alias(feature_col),
        "value_imputed",
        "method",
    )


def impute_normal_downshift(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    is_missing: Column,
    shift: float = 1.8,
    out_col: str = "value_imputed",
) -> DataFrame:
    """Fill missing values with ``mean - shift*stddev`` of the group's
    observed values (deterministic down-shifted-normal imputation,
    analytics.py:300-340 minus the seeded jitter)."""
    w = Window.partitionBy(*group_cols)
    observed = F.when(~is_missing, F.col(value_col).cast("double"))
    fill = F.avg(observed).over(w) - F.lit(float(shift)) * F.stddev_samp(observed).over(w)
    return df.withColumn(
        out_col,
        F.round(
            F.when(is_missing, fill).otherwise(F.col(value_col).cast("double")), 6
        ),
    )
