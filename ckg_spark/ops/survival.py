"""Survival analysis as distributed window math.

The reference runs Kaplan-Meier + multivariate log-rank at report time
(analytics_core/analytics/kaplan_meierAnalysis.py:58-77 via lifelines;
dispatched from analytics.py:2511 ``run_km(data, time_col, event_col,
group_col)``).  Both estimators are pure order-statistics over the
(duration, event) pairs, so they distribute as one aggregation plus
per-group window passes — no Python in the plan:

- :func:`kaplan_meier` — the product-limit estimator
  ``S(t) = prod_{u<=t} (1 - d_u / n_u)`` per group.  The cumulative
  product is ``exp(sum(ln(factor)))`` over an ordered window; the one
  legal zero factor (everyone at risk dies at the last time) is handled
  with a running ``min(factor)`` guard instead of feeding ``ln(0)``
  through the window (Spark's ``log`` returns NULL there, which a window
  SUM would silently skip — producing a wrong, nonzero tail).
- :func:`logrank_statistic` — the k-group log-rank chi-square:
  at each event time, each group's expected deaths are
  ``n_gt * d_t / n_t``; the statistic sums
  ``(O_g - E_g)^2 / E_g`` over groups (the standard conservative
  approximation lifelines also exposes).  One groupBy + two window
  passes + one aggregation.

At 100 TB the duration table aggregates to |distinct durations| x
|groups| rows before any window runs, so the window partitions are
bounded by the time-grid cardinality, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import special


def _risk_table(
    df: DataFrame,
    duration_col: str,
    event_col: Column,
    group_cols: list[str],
) -> DataFrame:
    """Aggregate raw subjects to the per-(group, time) risk table:
    n_event deaths at t, n_censored leavers at t, and n_risk subjects
    with duration >= t (a descending-time cumulative sum)."""
    g = df.groupBy(*group_cols, duration_col).agg(
        F.count(F.lit(1)).alias("__n_i__"),
        F.sum(F.when(event_col, 1).otherwise(0)).cast("bigint").alias("n_event"),
    )
    w_desc = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(duration_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.withColumn("n_risk", F.sum("__n_i__").over(w_desc)).withColumn(
        "n_censored", (F.col("__n_i__") - F.col("n_event")).cast("bigint")
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: Column,
    group_cols: list[str],
) -> DataFrame:
    """Product-limit survival estimate per group at every distinct
    duration (event times AND censoring-only times carry a row, matching
    lifelines' ``survival_function_`` time grid; censoring-only rows
    have factor 1 and leave the estimate flat)."""
    r = _risk_table(df, duration_col, event_col, group_cols)
    factor = F.lit(1.0) - F.col("n_event").cast("double") / F.col("n_risk").cast("double")
    w_asc = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col(duration_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = r.withColumn("__f__", factor)
    # exp(sum(ln f)) is the cumulative product; min(f)<=0 marks the row
    # where survival legitimately hits zero (and every row after it).
    ln_f = F.when(F.col("__f__") > 0, F.log("__f__")).otherwise(F.lit(0.0))
    surv = F.when(F.min("__f__").over(w_asc) <= 0, F.lit(0.0)).otherwise(
        F.exp(F.sum(ln_f).over(w_asc))
    )
    return (
        r.withColumn("survival", F.round(surv, 6))
        .select(*group_cols, duration_col, "n_risk", "n_event", "n_censored", "survival")
    )


def logrank_statistic(
    df: DataFrame,
    duration_col: str,
    event_col: Column,
    group_col: str,
) -> DataFrame:
    """Multivariate log-rank chi-square statistic across the groups of
    ``group_col`` (kaplan_meierAnalysis.py:73-76
    ``multivariate_logrank_test``; the standard conservative
    sum((O-E)^2/E) form).  Returns one row: (n_groups, dof, chi2,
    p_value).

    Correctness subtlety: at every POOLED event time, EVERY group's
    at-risk count must enter the expected-death calculation — including
    groups with no subject whose duration equals that exact time (with
    near-continuous durations that is almost all (group, time) cells).
    The group risk table alone cannot provide those rows, so the pooled
    event-time grid is merged INTO each group's descending-time
    cumulative count: marker rows (one per group x event time) sort
    after the group's real rows at the same time, and the running sum of
    subject counts at each marker IS that group's at-risk count there —
    one window pass over a timeline bounded by |times| x |groups|, no
    range join."""
    g = df.groupBy(group_col, duration_col).agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum(F.when(event_col, 1).otherwise(0)).cast("bigint").alias("n_event"),
    )
    times = (
        g.groupBy(duration_col)
        .agg(F.sum("n_event").cast("bigint").alias("d_t"))
        .filter(F.col("d_t") > 0)
    )
    groups = g.select(group_col).distinct()
    grid = times.select(duration_col).crossJoin(groups)
    um = g.select(
        group_col, duration_col, F.col("n_i"), F.lit(0).alias("mk")
    ).unionByName(
        grid.select(
            group_col, duration_col, F.lit(0).alias("n_i"), F.lit(1).alias("mk")
        )
    )
    w_desc = (
        Window.partitionBy(group_col)
        .orderBy(F.col(duration_col).desc(), F.col("mk").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = (
        um.withColumn("n_risk", F.sum("n_i").over(w_desc))
        .filter(F.col("mk") == 1)
        .select(group_col, duration_col, "n_risk")
    )
    n_t = risk.groupBy(duration_col).agg(F.sum("n_risk").alias("n_t"))
    obs = risk.join(
        g.select(group_col, duration_col, "n_event"),
        [group_col, duration_col],
        "left",
    ).withColumn("n_event", F.coalesce(F.col("n_event"), F.lit(0)))
    j = obs.join(F.broadcast(times), duration_col).join(F.broadcast(n_t), duration_col)
    expected = F.col("n_risk").cast("double") * F.col("d_t").cast("double") / F.col(
        "n_t"
    ).cast("double")
    per_group = j.groupBy(group_col).agg(
        F.sum("n_event").cast("double").alias("o_g"),
        F.sum(expected).alias("e_g"),
    )
    # e_g == 0 guard: a group fully censored before the first pooled event
    # time has zero at-risk mass at every event time, so o_g = e_g = 0 and
    # the unguarded 0/0 would throw under ANSI (DuckDB's IEEE division
    # silently yields NaN — the oracle carries the identical CASE). Such a
    # group contributes nothing to the statistic, per the usual convention.
    st = per_group.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(
            F.when(
                F.col("e_g") > 0,
                (F.col("o_g") - F.col("e_g"))
                * (F.col("o_g") - F.col("e_g"))
                / F.col("e_g"),
            ).otherwise(F.lit(0.0))
        ).alias("chi2_raw"),
    )
    dof = (F.col("n_groups") - F.lit(1)).cast("double")
    return st.select(
        "n_groups",
        (F.col("n_groups") - F.lit(1)).cast("bigint").alias("dof"),
        F.round("chi2_raw", 6).alias("chi2"),
        F.round(special.chi2_sf_spark(F.col("chi2_raw"), dof), 9).alias("p_value"),
    )
