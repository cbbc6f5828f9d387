"""measurements_ready — the get_*_measurements_ready twin (prep.py).

The mixed-imputation arithmetic itself is covered by
tests/test_analysis.py::test_impute_mixed_matches_independent_reference
and the q_measurements_ready DuckDB oracle; here we pin the FILTER
semantics (any-group-passes, both methods, global mode), the knn
branch's alone=True drop, the imputation=None passthrough, and grid
materialization of absent cells.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ckg_spark.prep import measurements_ready
from ckg_spark.queries.catalog import CATALOG

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frame(spark):
    # 2 groups x 3 samples x 3 features; f3 missing everywhere in both
    # groups except one g1 cell; s3/f2 cell ABSENT from the input (grid
    # must materialize it as missing)
    rows = []
    for g in ("g0", "g1"):
        for s in ("s1", "s2", "s3"):
            for f in ("f1", "f2", "f3"):
                if (s, f) == ("s3", "f2"):
                    continue
                v = float(len(g) + ord(s[1]) - ord("0") + (ord(f[1]) - ord("0")) * 10)
                missing = f == "f3" and not (g == "g1" and s == "s1")
                rows.append((g, g + s, f, v, missing))
    return spark.createDataFrame(rows, ["grp", "smp", "feat", "v", "miss"])


def test_percentage_filter_any_group_passes(spark, frame):
    # f3: missing 3/3 in g0, 2/3 in g1 -> min ratio 2/3; dropped at 0.5,
    # kept at 0.7. f1/f2 fully observed except the absent s3/f2 cell.
    out = measurements_ready(
        frame, "smp", "feat", "v", "grp",
        is_missing=F.col("miss"), missing_max=0.5, imputation=None,
    )
    assert set(r["feat"] for r in out.select("feat").distinct().collect()) == {"f1", "f2"}
    out2 = measurements_ready(
        frame, "smp", "feat", "v", "grp",
        is_missing=F.col("miss"), missing_max=0.7, imputation=None,
    )
    assert set(r["feat"] for r in out2.select("feat").distinct().collect()) == {
        "f1", "f2", "f3",
    }


def test_at_least_x_and_global_modes(spark, frame):
    # at_least_x: f3 has 1 observed value in g1, 0 in g0 -> min_valid=1
    # keeps it (any group), min_valid=2 drops it
    keep1 = measurements_ready(
        frame, "smp", "feat", "v", "grp",
        is_missing=F.col("miss"), missing_method="at_least_x",
        min_valid=1, imputation=None,
    )
    assert "f3" in {r["feat"] for r in keep1.select("feat").distinct().collect()}
    keep2 = measurements_ready(
        frame, "smp", "feat", "v", "grp",
        is_missing=F.col("miss"), missing_method="at_least_x",
        min_valid=2, imputation=None,
    )
    assert "f3" not in {r["feat"] for r in keep2.select("feat").distinct().collect()}
    # global (missing_per_group=False): f3 is missing 5/6 -> dropped at
    # 0.5 even though no single group frame exists
    glob = measurements_ready(
        frame, "smp", "feat", "v", "grp",
        is_missing=F.col("miss"), missing_max=0.5,
        missing_per_group=False, imputation=None,
    )
    assert "f3" not in {r["feat"] for r in glob.select("feat").distinct().collect()}


def test_absent_cell_materialized_and_none_passthrough(spark, frame):
    out = measurements_ready(
        frame, "smp", "feat", "v", "grp",
        is_missing=F.col("miss"), missing_max=0.7, imputation=None,
    ).collect()
    # 2 groups x 3 samples x 3 features = 18 cells, all materialized
    assert len(out) == 18
    absent = [r for r in out if r["feat"] == "f2" and r["smp"].endswith("s3")]
    assert len(absent) == 2
    assert all(r["value_ready"] is None and r["method"] is None for r in absent)
    observed = [r for r in out if r["method"] == "observed"]
    # 18 - 5 missing f3 cells - 2 absent f2 cells
    assert len(observed) == 11


def test_knn_branch_drops_ineligible_features(spark, frame):
    # knn_cutoff=0.6: f3 (observed 0/3 and 1/3) ineligible -> dropped
    # (alone=True); f2 observed 2/3 >= 0.6 kept and its absent cells
    # knn-imputed; f1 complete
    out = measurements_ready(
        frame, "smp", "feat", "v", "grp",
        is_missing=F.col("miss"), missing_max=0.7,
        imputation="knn", knn_cutoff=0.6, k=2,
    ).collect()
    feats = {r["feat"] for r in out}
    assert feats == {"f1", "f2"}
    imputed = {(r["grp"], r["smp"], r["feat"]): r for r in out if r["method"] == "knn"}
    assert set(imputed) == {("g0", "g0s3", "f2"), ("g1", "g1s3", "f2")}
    assert all(r["value_ready"] is not None for r in imputed.values())


def test_downshift_branch_fills_per_sample(spark, frame):
    import statistics

    out = measurements_ready(
        frame, "smp", "feat", "v", "grp",
        is_missing=F.col("miss"), missing_max=0.7,
        imputation="downshift", shift=1.8,
    ).collect()
    downs = [r for r in out if r["method"] == "downshift"]
    # all 5 missing f3 cells + 2 absent f2 cells filled
    assert len(downs) == 7
    # per-SAMPLE fill: each downshifted cell is mean - 1.8*std of its own
    # sample's observed values (imputation_normal_distribution transposes
    # before taking stats — analytics.py:306); a sample with fewer than
    # two observed values has no stddev and stays NULL
    obs: dict[tuple, list] = {}
    for r in out:
        if r["method"] == "observed":
            obs.setdefault((r["grp"], r["smp"]), []).append(r["value_ready"])
    assert any(len(v) < 2 for v in obs.values()) or any(
        (r["grp"], r["smp"]) not in obs for r in downs
    )  # the fixture exercises the no-stddev path (s3 has one observed value)
    for r in downs:
        vals = obs.get((r["grp"], r["smp"]), [])
        if len(vals) >= 2:
            exp = statistics.mean(vals) - 1.8 * statistics.stdev(vals)
            assert r["value_ready"] == pytest.approx(exp, abs=1e-6), r
        else:
            assert r["value_ready"] is None, r


def test_catalog_composition_runs_and_is_consistent(spark):
    df = CATALOG["q_measurements_ready"].spark_fn(spark, SF_DIR).collect()
    assert len(df) > 0
    methods = {r["method"] for r in df}
    assert "observed" in methods
    # every non-observed row carries a fill
    assert all(r["value_ready"] is not None for r in df if r["method"] != "observed")
