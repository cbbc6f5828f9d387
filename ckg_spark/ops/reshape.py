"""Long/wide reshapes and ranking annotation — the analytics factory's
format transforms (transform_into_wide_format analytics.py:90-132,
transform_into_long_format :133-159, get_ranking_with_markers
:160-187, get_coefficient_variation :493-544).

All four are single narrow/aggregation plans:

- wide: one groupBy(index).pivot(columns) aggregation (first(value) ≙
  pandas .pivot on a unique (index, column) grid) plus a dimension-sized
  distinct-extras join;
- long: one ``stack`` projection (no shuffle at all — the melt never
  leaves the partition);
- ranking markers: pure column math against a broadcast literal marker
  set (the reference's per-row list comprehensions);
- CV: one map-side-combined aggregation; the biased (population) std of
  2^x mirrors scipy.stats.variation over the reference's log2
  intensities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wide_format(
    df: DataFrame,
    index: str,
    columns: str,
    values: str,
    extra: list[str] | None = None,
) -> DataFrame:
    """Long → wide: one row per ``index``, one column per distinct value
    of ``columns``; ``extra`` columns carried through via a distinct
    join (transform_into_wide_format). Duplicate (index, columns) pairs
    aggregate by MIN — an explicit total order where pandas ``.pivot``
    (the reference) raises; ``F.first`` would be partitioning-dependent.
    An index mapped to several distinct ``extra`` tuples fans out, as the
    reference's ``df.join`` does (its trailing drop_duplicates, mirrored
    here, removes only full-row duplicates)."""
    wide = df.groupBy(index).pivot(columns).agg(F.min(values))
    if extra:
        wide = wide.join(
            df.select(index, *extra).distinct(), index, "left"
        ).dropDuplicates()
    return wide


def long_format(
    df: DataFrame,
    drop_columns: list[str],
    group: str,
    columns: tuple[str, str] = ("name", "y"),
) -> DataFrame:
    """Wide → long over every non-dropped, non-group column
    (transform_into_long_format): output (group, name, y)."""
    name_col, value_col = columns
    feats = [c for c in df.columns if c != group and c not in drop_columns]
    if not feats:
        raise ValueError("long_format: no feature columns left to melt")
    # TRY_CAST: a non-numeric column the caller forgot to drop melts to
    # NULL values (pandas-melt-like tolerance) instead of aborting the
    # whole job with an ANSI CAST_INVALID_INPUT mid-stage.
    stack = ", ".join(f"'{c}', TRY_CAST(`{c}` AS DOUBLE)" for c in feats)
    return df.selectExpr(
        f"`{group}` AS `{group}`",
        f"stack({len(feats)}, {stack}) AS (`{name_col}`, `{value_col}`)",
    )


def ranking_with_markers(
    df: DataFrame,
    group: str,
    name_col: str,
    value_col: str,
    markers: list[str],
    annotation: dict[str, str] | None = None,
) -> DataFrame:
    """Marker annotation over a long frame (get_ranking_with_markers):
    plotly symbol 17 / size 25 for known markers (0 / 7 otherwise), and
    the marker's name rewritten to '<name> marker in <disease>' where
    annotated. The marker list is dimension-sized, so it ships as a
    literal in-plan array (a broadcast variable in spirit)."""
    annotation = annotation or {}
    is_marker = F.col(name_col).isin(*markers) if markers else F.lit(False)
    out = df.select(
        group,
        name_col,
        F.col(value_col).cast("double").alias(value_col),
        F.when(is_marker, F.lit(17)).otherwise(F.lit(0)).alias("symbol"),
        F.when(is_marker, F.lit(25)).otherwise(F.lit(7)).alias("size"),
    )
    if annotation:
        ann = F.create_map(
            *[F.lit(x) for kv in annotation.items() for x in kv]
        )
        out = out.withColumn(
            name_col,
            F.when(
                ann[F.col(name_col)].isNotNull(),
                F.concat(F.col(name_col), F.lit(" marker in "), ann[F.col(name_col)]),
            ).otherwise(F.col(name_col)),
        )
    return out


def coefficient_of_variation(
    df: DataFrame,
    group: str,
    name_col: str,
    value_col: str,
    unlog2: bool = True,
) -> DataFrame:
    """Per-(group, feature) coefficient of variation
    (get_coefficient_variation / calculate_coefficient_variation,
    analytics.py:493-544): scipy.stats.variation — the BIASED
    (population) std over the mean — of 2^x (the reference's values are
    log2 intensities; ``unlog2=False`` skips the un-log), × 100. Output
    mirrors the reference's plotting frame: (name, x=cv, y=mean_value,
    group)."""
    v = F.col(value_col).cast("double")
    lin = F.pow(F.lit(2.0), v) if unlog2 else v
    return (
        df.groupBy(group, name_col)
        .agg(
            F.round(F.stddev_pop(lin) / F.avg(lin) * 100.0, 6).alias("x"),
            F.round(F.avg(v), 6).alias("y"),
        )
        .select(F.col(name_col).alias("name"), "x", "y", F.col(group).alias("group"))
    )
