"""Report pipeline (≙ report_manager/dataset.py generate_report): config
walk order, per-subsection dispatch equivalence vs direct run_analysis,
the ttest regulated/regulation-table storage special case, skip-on-
missing-data semantics, prep-from-args, and warehouse persistence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ckg_spark.analysis import run_analysis
from ckg_spark.report import Report, generate_report, prepare_processed


@pytest.fixture(scope="module")
def long_data(spark):
    """Deterministic long-format measurements: 8 features x 2 groups x 4
    samples; features f0/f1 strongly separated (should reject), the rest
    pure noise-free overlap (should not)."""
    rows = []
    for fi in range(8):
        for g, base in (("A", 10.0), ("B", 10.0)):
            sep = 6.0 if fi < 2 and g == "B" else 0.0
            for s in range(4):
                rows.append(
                    (f"f{fi}", g, f"{g}{s}", base + sep + 0.31 * s + 0.17 * fi)
                )
    return spark.createDataFrame(
        rows, ["identifier", "group", "sample", "value"]
    ).cache()


CONFIG = {
    "args": {"group_a": "A", "group_b": "B"},
    "overview": {
        "overview statistics": {
            "data": "processed",
            "analyses": ["summary"],
            "store_analysis": True,
            "args": {"value_col": "value", "group_cols": ["group"]},
        },
        "absent input": {
            "data": "does_not_exist",
            "analyses": ["summary"],
            "args": {},
        },
    },
    "regulation": {
        "differential regulation": {
            "data": "processed",
            "analyses": ["ttest"],
            "store_analysis": True,
            "args": {"correction": "fdr_bh", "alpha": 0.05},
        },
    },
}


def test_generate_report_runs_and_matches_direct_dispatch(spark, long_data):
    report = generate_report("proteomics", {"processed": long_data}, CONFIG)
    assert isinstance(report, Report)
    # every configured analysis on present data ran, in config order
    keys = list(report.analyses)
    assert keys == ["overview statistics_summary", "differential regulation_ttest"]
    # the report's ttest is bit-identical to a direct dispatch
    direct = run_analysis(
        long_data, "ttest", {"group_a": "A", "group_b": "B", "correction": "fdr_bh"}
    )
    got = sorted(map(tuple, report.analyses["differential regulation_ttest"].collect()))
    exp = sorted(map(tuple, direct.collect()))
    assert got == exp


def test_report_regulated_subset_semantics(spark, long_data):
    report = generate_report("proteomics", {"processed": long_data}, CONFIG)
    assert "regulated" in report.stored and "regulation table" in report.stored
    reg_table = report.stored["regulation table"]
    sig = {
        r["identifier"] for r in reg_table.filter(F.col("rejected") == 1).collect()
    }
    assert sig == {"f0", "f1"}  # the two planted separations, nothing else
    regulated = report.stored["regulated"]
    # exactly the input rows of the rejected identifiers (semi-join, no dups)
    assert {r["identifier"] for r in regulated.collect()} == sig
    n_per_feature = long_data.groupBy("identifier").count().collect()[0]["count"]
    assert regulated.count() == len(sig) * n_per_feature


def test_report_skips_missing_data_and_records_pipeline(spark, long_data):
    report = generate_report("proteomics", {"processed": long_data}, CONFIG)
    steps = {s["subsection"]: s for s in report.pipeline}
    assert steps["absent input"]["skipped"] is True
    assert steps["absent input"]["analyses"] == []
    assert steps["differential regulation"]["analyses"] == ["ttest"]
    assert steps["overview statistics"]["skipped"] is False


def test_report_unknown_analysis_raises(spark, long_data):
    bad = {"s": {"sub": {"data": "processed", "analyses": ["snf"], "args": {}}}}
    with pytest.raises(ValueError, match="unsupported"):
        generate_report("x", {"processed": long_data}, bad)


def test_prepare_processed_from_args(spark):
    """The top-level args block drives measurements_ready exactly like
    the reference's proteomics.yml (imputation settings), producing the
    'processed' frame downstream sections consume."""
    rows = [
        ("s1", "A", "f1", 10.0),
        ("s2", "A", "f1", 11.0),
        ("s3", "B", "f1", 12.0),
        ("s4", "B", "f1", 13.0),
        ("s1", "A", "f2", 5.0),
        ("s2", "A", "f2", 6.0),
        # f2 missing in both B samples -> group-missingness filter;
        # f3 fully observed so every sample has >= 2 observed values
        # (per-sample downshift needs a stddev — analytics.py:306)
        ("s1", "A", "f3", 1.0),
        ("s2", "A", "f3", 2.0),
        ("s3", "B", "f3", 3.0),
        ("s4", "B", "f3", 4.0),
    ]
    meas = spark.createDataFrame(rows, ["sample", "group", "identifier", "value"])
    args = {
        "imputation": True,
        "imputation_method": "distribution",
        "missing_method": "percentage",
        "missing_max": 0.5,
        "missing_per_group": True,
    }
    frames = prepare_processed({"measurements": meas}, args)
    assert "processed" in frames
    out = frames["processed"]
    assert set(out.columns) == {"group", "sample", "identifier", "value"}
    got = {(r["identifier"], r["sample"]): r["value"] for r in out.collect()}
    # f1 fully observed everywhere; f2 passes via group A (0% missing there)
    # and its B cells are downshift-imputed (non-null)
    assert got[("f1", "s1")] == 10.0
    assert all(v is not None for v in got.values())
    assert ("f2", "s3") in got and ("f2", "s4") in got
    # existing 'processed' is never clobbered
    same = prepare_processed({"processed": out, "measurements": meas}, args)
    assert same["processed"] is out


def test_report_persists_to_warehouse(spark, long_data, tmp_path):
    from ckg_spark.lakehouse import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    generate_report("proteomics", {"processed": long_data}, CONFIG, warehouse=wh)
    stored = wh.table("report_proteomics_regulation_table").read(spark)
    assert stored.count() == 8
    reg = wh.table("report_proteomics_regulated").read(spark)
    assert {r["identifier"] for r in reg.collect()} == {"f0", "f1"}


def test_unknown_imputation_method_raises(spark, long_data):
    """A typo'd imputation_method must fail loudly, not silently fall
    back to 'mixed' and change the regulated hit lists."""
    cfg = {
        "args": {"imputation_method": "down-shift", "group_a": "A", "group_b": "B"},
        "overview": {
            "s": {"data": "processed", "analyses": ["summary"], "args": {}}
        },
    }
    with pytest.raises(ValueError, match="imputation_method"):
        generate_report("p", {"measurements": long_data}, cfg)


def test_two_regulation_subsections_both_survive(spark, long_data):
    """The fixed 'regulated' keys keep reference parity (last wins), but
    each subsection's results also store under unique prefixed keys so
    nothing is silently lost."""
    cfg = {
        "args": {"group_a": "A", "group_b": "B"},
        "regulation": {
            "reg one": {
                "data": "processed", "analyses": ["ttest"],
                "store_analysis": True,
                "args": {"correction": "fdr_bh", "alpha": 0.05},
            },
            "reg two": {
                "data": "processed", "analyses": ["ttest"],
                "store_analysis": True,
                "args": {"correction": "fdr_bh", "alpha": 0.9},
            },
        },
    }
    report = generate_report("p2", {"processed": long_data}, cfg)
    assert "reg one_regulated" in report.stored
    assert "reg two_regulated" in report.stored
    assert "regulated" in report.stored  # parity key = last subsection
    n_last = report.stored["reg two_regulated"].count()
    assert report.stored["regulated"].count() == n_last
