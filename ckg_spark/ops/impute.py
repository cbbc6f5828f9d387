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
  observed values. Dropping the 0.3σ jitter is a deliberate determinism
  trade (the reference seeds numpy instead); the imputed values land at
  the distribution's left shoulder exactly as MinProb intends, and the
  operator stays reproducible and hash-verifiable on both backends.
- KNN imputation is driver-side sklearn in the reference and is NOT
  reimplemented: its sample×sample distance matrix is the antithesis of
  a distributed plan; at corpus scale the down-shift/median paths are
  the ones that run per-partition.

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
