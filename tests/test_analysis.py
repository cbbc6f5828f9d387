"""Analysis dispatcher (≙ analytics_factory) + generic stats spellings.

The load-bearing check: the column-parameterized operators in
ops/stats.py must reproduce the CATALOG's hash-verified outputs when
pointed at the same framing — the generic API and the oracle-checked
spellings may never drift apart.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ckg_spark.analysis import Analysis, run_analysis
from ckg_spark.queries.catalog import CATALOG

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()
    yield df
    df.unpersist()  # a lingering cache would hijack later plan-shape tests


def _sorted_pdf(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True)


def test_generic_welch_matches_catalog(spark, lineitem):
    generic = run_analysis(
        lineitem,
        "ttest",
        {
            "feature_col": "l_returnflag",
            "group_col": "l_linestatus",
            "value_col": "l_quantity",
            "group_a": "F",
            "group_b": "O",
            "correction": "none",
        },
    )
    catalog = CATALOG["q_welch_ttest"].spark_fn(spark, SF_DIR)
    a = _sorted_pdf(generic.withColumnRenamed("t_stat", "t_stat"))
    b = _sorted_pdf(catalog)
    assert a.equals(b)


def test_generic_anova_matches_catalog(spark, lineitem):
    generic = run_analysis(
        lineitem,
        "anova",
        {
            "feature_col": "l_linestatus",
            "group_col": "l_returnflag",
            "value_col": "l_quantity",
            "correction": "none",
        },
    )
    catalog = CATALOG["q_anova_oneway"].spark_fn(spark, SF_DIR)
    assert _sorted_pdf(generic).equals(_sorted_pdf(catalog))


def test_generic_quantile_normalize_matches_catalog(spark):
    cell_q = CATALOG["q_quantile_normalize"]
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from ckg_spark.queries.catalog import _first_event_cell

    cell = _first_event_cell(spark, SF_DIR)
    generic = run_analysis(
        cell,
        "normalization",
        {
            "method": "quantile",
            "sample_col": "event_type",
            "key_cols": ["user_id"],
            "value_col": "v",
        },
    )
    catalog = cell_q.spark_fn(spark, SF_DIR)
    assert _sorted_pdf(generic).equals(_sorted_pdf(catalog))
    assert events.count() > 0


def test_generic_median_polish_matches_catalog(spark):
    from ckg_spark.queries.catalog import _first_event_cell

    cell = _first_event_cell(spark, SF_DIR)
    generic = run_analysis(
        cell,
        "normalization",
        {
            "method": "median_polish",
            "row_col": "user_id",
            "sample_col": "event_type",
            "value_col": "v",
        },
    )
    catalog = CATALOG["q_median_polish"].spark_fn(spark, SF_DIR)
    assert _sorted_pdf(generic).equals(_sorted_pdf(catalog))


def test_bh_adjust_matches_catalog_fdr(spark, lineitem):
    from ckg_spark.ops import stats

    welch = stats.welch_ttest(
        lineitem, "l_returnflag", "l_linestatus", "l_quantity", "F", "O"
    ).select("l_returnflag", "p_value")
    adj = stats.bh_adjust(welch, "p_value", ["l_returnflag"])
    catalog = CATALOG["q_ttest_fdr"].spark_fn(spark, SF_DIR)
    assert _sorted_pdf(adj).equals(_sorted_pdf(catalog))


def test_dispatch_survival_and_graph(spark):
    # survival: the catalog's duration framing through the dispatcher
    from ckg_spark.queries.catalog import _km_duration_frame

    d = _km_duration_frame(spark, SF_DIR)
    km = run_analysis(
        d, "survival", {"time_col": "t", "event_col": "ev", "group_cols": ["grp"]}
    )
    assert km.count() > 0 and "survival" in km.columns
    lr = run_analysis(d, "logrank", {"time_col": "t", "event_col": "ev", "group_col": "grp"})
    row = lr.collect()[0]
    assert 0.0 <= row["p_value"] <= 1.0

    # graph ops via dispatch on a toy symmetric edge list
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"subj": ["a", "b", "b", "c"], "obj": ["b", "a", "c", "b"]}
        )
    )
    pr = run_analysis(edges, "pagerank", {"iters": 5})
    assert pr.count() == 3
    ev = run_analysis(edges, "eigenvector", {"src": "subj", "dst": "obj", "iters": 10})
    assert ev.count() == 3


def test_dispatch_summary_imputation_clustering(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    s = run_analysis(
        events, "summary", {"value_col": "value", "group_cols": ["event_type"]}
    )
    assert set(s.columns) >= {"n", "mean", "stddev", "median"}
    imp = run_analysis(
        events,
        "imputation",
        {
            "method": "group_median",
            "group_cols": ["event_type"],
            "value_col": "value",
            "is_missing": F.col("value") < 10.0,
        },
    )
    assert "value_imputed" in imp.columns

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pts = emb.select("vec_id", F.posexplode("embedding").alias("dim", "val"))
    cl = run_analysis(pts, "clustering", {"k": 4, "iters": 2, "id_col": "vec_id"})
    assert cl.count() == emb.count()


def test_analysis_container_and_unknown_type(spark, lineitem):
    a = Analysis(
        "proj1",
        "ttest",
        {
            "feature_col": "l_returnflag",
            "group_col": "l_linestatus",
            "value_col": "l_quantity",
            "group_a": "F",
            "group_b": "O",
        },
        lineitem,
    )
    res = a.generate_result()
    assert "ttest" in res and "p_adj" in res["ttest"].columns
    with pytest.raises(ValueError, match="unsupported analysis_type"):
        run_analysis(lineitem, "tsne", {})
