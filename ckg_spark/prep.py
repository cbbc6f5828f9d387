"""Measurement-matrix preparation — the reference's canonical
preprocessing entrypoint, Spark-first.

``get_proteomics_measurements_ready`` / ``get_clinical_measurements_ready``
(analytics_core/analytics/analytics.py:545-607, 609-652) are the first
call of every reference report pipeline: pivot the long measurements to a
sample × feature matrix, drop features with too many missing values
(``extract_number_missing`` :188-211 / ``extract_percentage_missing``
:214-237), then impute (KNN / down-shifted normal / mixed).

Here the matrix STAYS LONG — one row per (group, sample, feature) cell —
because long format is the shape that distributes: the wide pivot is a
pandas artifact (and at 100 TB a million-column frame is not a thing
Catalyst should ever see). Cells absent from the input are materialized
explicitly via a (samples × features) grid — samples carry their group,
features are dimension-sized and broadcast — so "missing" means exactly
what the reference's pivoted NaN means. Callers needing the wide matrix
pivot the dimension-sized RESULT (features are bounded; rows are not).

Filter semantics mirror the reference precisely:

- ``percentage`` (extract_percentage_missing): a feature survives if AT
  LEAST ONE group's missing ratio is <= ``missing_max`` (the reference
  masks the per-group ratio frame and keeps columns that are not
  all-NaN, i.e. any-group-passes).
- ``at_least_x`` (extract_number_missing): a feature survives if AT
  LEAST ONE group has >= ``min_valid`` observed values.
- ``missing_per_group=False`` computes one global ratio/count per
  feature. (For ``at_least_x`` the reference's group=None branch
  row-misaligns its mask — ``notnull().sum(axis=1)`` is per-row — so
  this engine implements the documented intent: per-feature global
  valid count >= min_valid.)

Imputation branches (``method`` in get_proteomics_measurements_ready):
``knn`` (imputation_KNN with its eligibility cutoff; ineligible
features are dropped, the reference's ``alone=True``), ``downshift``
(imputation_normal_distribution minus the seeded jitter — the module's
documented determinism trade, see ops/impute.py), ``mixed``
(imputation_mixed_norm_KNN), or None (filter only, missing cells kept
as nulls).

Everything is JVM column math + the bounded sample-axis KNN self-join of
ops/impute.py; one hash-verified catalog entry (q_measurements_ready)
runs the full composition end-to-end against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ops.impute import impute_knn, impute_mixed, impute_normal_downshift


def measurements_ready(
    cells: DataFrame,
    sample_col: str,
    feature_col: str,
    value_col: str,
    group_col: str,
    is_missing: Column | None = None,
    missing_method: str = "percentage",
    missing_max: float = 0.3,
    min_valid: int = 1,
    missing_per_group: bool = True,
    imputation: str | None = "mixed",
    shift: float = 1.8,
    knn_cutoff: float = 0.6,
    k: int = 3,
) -> DataFrame:
    """Filter + impute a long measurement table; returns one row per
    surviving (group, sample, feature) cell:
    ``(group, sample, feature, value_ready, method)`` with method in
    {'observed', 'knn', 'downshift'} (value_ready null iff
    imputation=None left the cell missing).

    ``cells`` must be unique per (sample, feature) — the reference's
    ``pivot_table(aggfunc='first')`` is input-order-dependent, so this
    operator requires the caller to dedupe deterministically instead
    (e.g. the first-reading min_by framing the catalog uses).
    ``is_missing`` marks observed rows that count as missing (left-
    censored readings); cells absent from the input are always missing.
    """
    v = F.col(value_col).cast("double")
    flagged = cells.select(
        F.col(group_col).alias("__g__"),
        F.col(sample_col).alias("__s__"),
        F.col(feature_col).alias("__f__"),
        v.alias("__v__"),
        (is_missing if is_missing is not None else F.lit(False)).alias("__m0__"),
    )
    observed = flagged.filter(~F.col("__m0__")).select("__g__", "__s__", "__f__", "__v__")
    samples = flagged.select("__g__", "__s__").distinct()
    features = flagged.select("__f__").distinct()
    grid = samples.join(F.broadcast(features)).join(
        observed, ["__g__", "__s__", "__f__"], "left"
    )
    miss = F.col("__v__").isNull()

    # -- missingness filter (any-group-passes, as the reference masks) --
    gcols = ["__g__"] if missing_per_group else []
    per = grid.groupBy(*gcols, "__f__").agg(
        F.avg(F.when(miss, 1.0).otherwise(0.0)).alias("__mf__"),
        F.sum(F.when(miss, 0).otherwise(1)).alias("__nv__"),
    )
    if missing_method == "percentage":
        cond = F.min("__mf__") <= F.lit(float(missing_max))
    elif missing_method == "at_least_x":
        cond = F.max("__nv__") >= F.lit(int(min_valid))
    else:
        raise ValueError(f"unknown missing_method {missing_method!r}")
    keep = per.groupBy("__f__").agg(cond.alias("__k__")).filter("__k__").select("__f__")
    # the filtered grid fans out into every imputation branch (impute_mixed
    # alone references its input ~6 times); without a cut Catalyst replays
    # the scan + grid join per reference (~200 scans measured). The frame
    # is dimension-sized (samples × features cells), so an eager
    # localCheckpoint is cheap and bounds the plan. persist() would not
    # stop concurrent stages of one job from recomputing (see CLAUDE.md).
    kept = grid.join(F.broadcast(keep), "__f__").localCheckpoint(eager=True)

    obs_rows = kept.filter(~miss).select(
        "__g__", "__s__", "__f__", F.col("__v__").alias("value_ready"),
        F.lit("observed").alias("method"),
    )

    if imputation is None:
        imp_rows = kept.filter(miss).select(
            "__g__", "__s__", "__f__",
            F.lit(None).cast("double").alias("value_ready"),
            F.lit(None).cast("string").alias("method"),
        )
    elif imputation == "mixed":
        imp_rows = impute_mixed(
            kept, "__s__", "__f__", "__v__", miss, "__g__",
            cutoff=knn_cutoff, shift=shift, k=k,
        ).select(
            "__g__", "__s__", "__f__",
            F.col("value_imputed").alias("value_ready"), "method",
        )
    elif imputation == "downshift":
        # per-SAMPLE downshift — imputation_normal_distribution transposes
        # first, so its stats are per sample across all features
        # (analytics.py:306); (group, sample) identifies one sample row
        imp_rows = (
            impute_normal_downshift(kept, ["__g__", "__s__"], "__v__", miss, shift=shift)
            .filter(miss)
            .select(
                "__g__", "__s__", "__f__",
                F.col("value_imputed").alias("value_ready"),
                F.lit("downshift").alias("method"),
            )
        )
    elif imputation == "knn":
        # imputation_KNN(alone=True): only features with observed
        # fraction >= knn_cutoff in EVERY group are KNN-imputed; the
        # rest are dropped from the result entirely
        elig = (
            kept.groupBy("__g__", "__f__")
            .agg(F.avg(F.when(miss, 0.0).otherwise(1.0)).alias("__of__"))
            .groupBy("__f__")
            .agg((F.min("__of__") >= F.lit(float(knn_cutoff))).alias("__e__"))
            .filter("__e__")
            .select("__f__")
        )
        ke = kept.join(F.broadcast(elig), "__f__")
        obs_rows = ke.filter(~miss).select(
            "__g__", "__s__", "__f__", F.col("__v__").alias("value_ready"),
            F.lit("observed").alias("method"),
        )
        imp_rows = impute_knn(
            ke, "__s__", "__f__", "__v__", miss, k=k, block_col="__g__"
        ).select(
            "__g__", "__s__", "__f__",
            F.col("value_imputed").alias("value_ready"),
            F.lit("knn").alias("method"),
        )
    else:
        raise ValueError(f"unknown imputation {imputation!r}")

    return obs_rows.unionByName(imp_rows).select(
        F.col("__g__").alias(group_col),
        F.col("__s__").alias(sample_col),
        F.col("__f__").alias(feature_col),
        "value_ready",
        "method",
    )
