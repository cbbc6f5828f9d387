"""Dual-backend special functions: the Spark Column and DuckDB SQL
renderings of lgamma / incomplete beta / distribution tails must agree
with each other (that is what makes p-values hash-checkable by the
driver's oracle) AND with an independent adaptive-precision Python
implementation (math.lgamma + convergence-driven Lentz, deliberately not
the fixed-depth machinery under test)."""

from __future__ import annotations

import math

import duckdb
import pytest

from ckg_spark.ops import special


# -- independent references -------------------------------------------------

def _betacf_ref(a: float, b: float, x: float) -> float:
    fpmin = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < fpmin:
        d = fpmin
    d = 1.0 / d
    h = d
    for m in range(1, 5000):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < fpmin:
            d = fpmin
        c = 1.0 + aa / c
        if abs(c) < fpmin:
            c = fpmin
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-16:
            break
    return h


def betainc_ref(a: float, b: float, x: float) -> float:
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    front = math.exp(
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1 - x)
    )
    if x < (a + 1) / (a + b + 2):
        return front * _betacf_ref(a, b, x) / a
    return 1.0 - front * _betacf_ref(b, a, 1 - x) / b


def hypergeom_sf_ref(k: int, K: int, n: int, N: int) -> float:
    def lc(nn, kk):
        return math.lgamma(nn + 1) - math.lgamma(kk + 1) - math.lgamma(nn - kk + 1)

    return sum(
        math.exp(lc(K, i) + lc(N - K, n - i) - lc(N, n))
        for i in range(k, min(K, n) + 1)
    )


GRID = [
    (a, b, x)
    for a in [0.5, 1.0, 2.5, 50.0, 500.0, 5000.0, 30000.0]
    for b in [0.5, 1.0, 2.5, 50.0, 5000.0]
    for x in [1e-8, 1e-4, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 0.9999, 0.99999999]
]

HYP_CASES = [
    (3, 10, 20, 100),
    (0, 5, 5, 50),
    (40, 200, 100, 4000),
    (500, 2000, 1000, 60000),
    (1, 1, 1, 2),
    (10, 10, 10, 10),
    # k > min(K, n): out of support — 0.0 on BOTH backends (Spark's
    # sequence() would descend and hit lgamma poles without the guard)
    (5, 3, 4, 10),
]


def test_lgamma_sql_matches_math_lgamma():
    con = duckdb.connect()
    expr = special.lgamma(special.DE(None, "z")).s
    for z in [0.5, 1.0, 1.5, 2.0, 7.3, 100.0, 4001.0, 60001.0]:
        (v,) = con.execute(f"SELECT {expr} FROM (SELECT {z!r}::DOUBLE AS z)").fetchone()
        assert v == pytest.approx(math.lgamma(z), rel=1e-12, abs=1e-10)


def test_betainc_sql_accuracy():
    con = duckdb.connect()
    con.execute("CREATE TABLE g(a DOUBLE, b DOUBLE, x DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?,?,?)", GRID)
    rows = con.execute(
        f"SELECT a, b, x, {special.betainc_sql('a','b','x')} FROM g"
    ).fetchall()
    for a, b, x, v in rows:
        assert v == pytest.approx(betainc_ref(a, b, x), abs=5e-10), (a, b, x)


def test_betainc_spark_matches_sql_and_ref(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame(GRID, columns=["a", "b", "x"]))
    got = (
        df.select("a", "b", "x", special.betainc_spark(F.col("a"), F.col("b"), F.col("x")).alias("v"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE g(a DOUBLE, b DOUBLE, x DOUBLE)")
    con.executemany("INSERT INTO g VALUES (?,?,?)", GRID)
    duck = {
        (a, b, x): v
        for a, b, x, v in con.execute(
            f"SELECT a, b, x, {special.betainc_sql('a','b','x')} FROM g"
        ).fetchall()
    }
    for r in got:
        ref = betainc_ref(r["a"], r["b"], r["x"])
        assert r["v"] == pytest.approx(ref, abs=5e-10), (r, ref)
        # cross-backend agreement well inside the ROUND(9) hash gate
        assert r["v"] == pytest.approx(duck[(r["a"], r["b"], r["x"])], abs=1e-10)


def test_t_and_f_tails(spark):
    """Spot checks against closed forms: t with dof=1 is Cauchy
    (P(|T|>=t) = 1 - 2/pi*atan(t)); F(1, d) upper tail equals the
    two-sided t tail at sqrt(f)."""
    import pandas as pd
    from pyspark.sql import functions as F

    cases = pd.DataFrame({"t": [0.5, 1.0, 2.0, 5.0], "dof": [1.0, 10.0, 100.0, 12000.0]})
    df = spark.createDataFrame(cases)
    rows = df.select(
        "t", "dof", special.t_sf2_spark(F.col("t"), F.col("dof")).alias("p")
    ).collect()
    for r in rows:
        ref = betainc_ref(r["dof"] / 2.0, 0.5, r["dof"] / (r["dof"] + r["t"] ** 2))
        assert r["p"] == pytest.approx(ref, abs=1e-10)
    cauchy = [r for r in rows if r["dof"] == 1.0][0]
    assert cauchy["p"] == pytest.approx(1 - 2 / math.pi * math.atan(cauchy["t"]), abs=1e-9)

    f_rows = df.select(
        "t", "dof",
        special.f_sf_spark(F.col("t") * F.col("t"), F.lit(1.0), F.col("dof")).alias("pf"),
        special.t_sf2_spark(F.col("t"), F.col("dof")).alias("pt"),
    ).collect()
    for r in f_rows:
        assert r["pf"] == pytest.approx(r["pt"], abs=1e-9)


def test_hypergeom_both_backends(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    con = duckdb.connect()
    con.execute("CREATE TABLE h(kk BIGINT, cap BIGINT, nn BIGINT, tot BIGINT)")
    con.executemany("INSERT INTO h VALUES (?,?,?,?)", HYP_CASES)
    duck = con.execute(
        f"SELECT kk, cap, nn, tot, {special.hypergeom_sf_sql('kk','cap','nn','tot')} FROM h"
    ).fetchall()
    for k, K, n, N, v in duck:
        assert v == pytest.approx(hypergeom_sf_ref(k, K, n, N), rel=1e-9, abs=1e-12)

    df = spark.createDataFrame(pd.DataFrame(HYP_CASES, columns=["kk", "cap", "nn", "tot"]))
    rows = df.select(
        "kk", "cap", "nn", "tot",
        special.hypergeom_sf_spark(
            F.col("kk"), F.col("cap"), F.col("nn"), F.col("tot")
        ).alias("p"),
    ).collect()
    duck_map = {(k, K, n, N): v for k, K, n, N, v in duck}
    for r in rows:
        key = (r["kk"], r["cap"], r["nn"], r["tot"])
        assert r["p"] == pytest.approx(hypergeom_sf_ref(*key), rel=1e-9, abs=1e-12)
        assert r["p"] == pytest.approx(duck_map[key], rel=1e-10, abs=1e-13)


# ----------------------------------------------------------------------
# regularized upper incomplete gamma / chi-square tail
# ----------------------------------------------------------------------

# For integer a, Q(a, x) = e^-x * sum_{j<a} x^j/j! — an exact closed form
# the CF/series implementation must reproduce on both backends.
def _chi2_sf_exact_even_dof(x: float, k: int) -> float:
    a = k // 2
    half = x / 2.0
    return math.exp(-half) * sum(half**j / math.factorial(j) for j in range(a))


CHI2_CASES = [(1.0, 2.0), (5.0, 4.0), (10.0, 4.0), (3.0, 10.0), (25.0, 4.0),
              (0.5, 2.0), (40.0, 8.0), (2.0, 6.0)]


def test_chi2_sf_sql_matches_closed_form():
    for x, k in CHI2_CASES:
        got = duckdb.sql("SELECT " + special.chi2_sf_sql(repr(x), repr(k))).fetchone()[0]
        want = _chi2_sf_exact_even_dof(x, int(k))
        assert abs(got - want) < 1e-12, (x, k, got, want)


def test_chi2_sf_spark_matches_sql(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    # include odd dof (no closed form — cross-backend agreement is the check)
    cases = CHI2_CASES + [(1.0, 1.0), (7.3, 3.0), (12.0, 5.0)]
    df = spark.createDataFrame(pd.DataFrame(cases, columns=["x", "k"]))
    rows = df.select(
        "x", "k", special.chi2_sf_spark(F.col("x"), F.col("k")).alias("p")
    ).collect()
    for r in rows:
        sql_v = duckdb.sql(
            "SELECT " + special.chi2_sf_sql(repr(r["x"]), repr(r["k"]))
        ).fetchone()[0]
        assert abs(r["p"] - sql_v) < 1e-12, (r["x"], r["k"], r["p"], sql_v)
        assert 0.0 <= r["p"] <= 1.0


def test_chi2_sf_dof1_matches_normal_tail():
    # chi2(1) upper tail at x equals 2*P(Z >= sqrt(x)); cross-check via
    # the t-tail with huge dof (t -> normal).
    x = 3.84145882069412  # ~95th percentile of chi2(1)
    got = duckdb.sql("SELECT " + special.chi2_sf_sql(repr(x), "1.0")).fetchone()[0]
    z2 = duckdb.sql(
        "SELECT " + special.t_sf2_sql(repr(math.sqrt(x)), "1e7")
    ).fetchone()[0]
    assert abs(got - z2) < 1e-6
    assert abs(got - 0.05) < 1e-4


# ----------------------------------------------------------------------
# survival ops: Kaplan-Meier + log-rank
# ----------------------------------------------------------------------

def test_kaplan_meier_small_fixture(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from ckg_spark.ops.survival import kaplan_meier, logrank_statistic

    # classical toy: durations with one censor; hand-computed S(t)
    pdf = pd.DataFrame(
        {"grp": ["a"] * 5, "t": [1, 2, 2, 3, 4], "ev": [True, True, False, True, True]}
    )
    km = (
        kaplan_meier(spark.createDataFrame(pdf), "t", F.col("ev"), ["grp"])
        .orderBy("t")
        .collect()
    )
    # t=1: 5 at risk, 1 death -> 0.8; t=2: 4 at risk, 1 death 1 censor -> 0.6
    # t=3: 2 at risk, 1 death -> 0.3; t=4: 1 at risk, 1 death -> 0.0
    want = [0.8, 0.6, 0.3, 0.0]
    got = [r["survival"] for r in km]
    assert got == pytest.approx(want, abs=1e-9)
    assert [r["n_risk"] for r in km] == [5, 4, 2, 1]

    # identical groups => log-rank chi2 == 0, p == 1
    pdf2 = pd.concat([pdf.assign(grp="a"), pdf.assign(grp="b")])
    lr = logrank_statistic(
        spark.createDataFrame(pdf2), "t", F.col("ev"), "grp"
    ).collect()[0]
    assert lr["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert lr["p_value"] == pytest.approx(1.0, abs=1e-9)
    assert lr["dof"] == 1


def test_kaplan_meier_monotone_on_testdata(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ckg_spark.queries.catalog import CATALOG

    df = CATALOG["q_kaplan_meier"].spark_fn(spark, "/root/testdata/sf0.001")
    w = Window.partitionBy("grp").orderBy("t")
    bad = df.withColumn("prev", F.lag("survival").over(w)).filter(
        (F.col("prev").isNotNull()) & (F.col("survival") > F.col("prev") + 1e-12)
    )
    assert bad.count() == 0


def _logrank_reference(rows):
    """Plain-Python conservative log-rank: rows = (grp, t, event)."""
    groups = sorted({g for g, _, _ in rows})
    times = sorted({t for _, t, e in rows if e})
    O = {g: 0.0 for g in groups}
    E = {g: 0.0 for g in groups}
    for t in times:
        n_t = sum(1 for _, d, _ in rows if d >= t)
        d_t = sum(1 for _, d, e in rows if d == t and e)
        for g in groups:
            n_gt = sum(1 for gg, d, _ in rows if gg == g and d >= t)
            d_gt = sum(1 for gg, d, e in rows if gg == g and d == t and e)
            O[g] += d_gt
            E[g] += n_gt * d_t / n_t
    return sum((O[g] - E[g]) ** 2 / E[g] for g in groups if E[g] > 0)


def test_logrank_counts_all_groups_at_risk(spark):
    """Review regression: groups sharing NO duration values must still
    contribute their at-risk counts at every pooled event time. With
    disjoint durations and wildly different survival, chi2 must be large
    and match the subject-level reference implementation."""
    import pandas as pd

    from ckg_spark.ops.survival import logrank_statistic

    rows = [("a", 1, True), ("a", 3, True), ("b", 100, True), ("b", 200, True)]
    pdf = pd.DataFrame(rows, columns=["grp", "t", "ev"])
    from pyspark.sql import functions as F

    got = logrank_statistic(
        spark.createDataFrame(pdf), "t", F.col("ev"), "grp"
    ).collect()[0]
    want = _logrank_reference(rows)
    assert got["chi2"] == pytest.approx(want, abs=1e-6)
    assert got["chi2"] > 1.0  # radically different curves are NOT chi2=0

    # and on a richer mixed fixture with censoring + shared times
    rows2 = [
        ("a", 1, True), ("a", 2, False), ("a", 4, True), ("a", 7, True),
        ("b", 2, True), ("b", 3, True), ("b", 4, False), ("b", 9, True),
        ("c", 1, False), ("c", 5, True), ("c", 7, True), ("c", 12, False),
    ]
    pdf2 = pd.DataFrame(rows2, columns=["grp", "t", "ev"])
    got2 = logrank_statistic(
        spark.createDataFrame(pdf2), "t", F.col("ev"), "grp"
    ).collect()[0]
    assert got2["chi2"] == pytest.approx(_logrank_reference(rows2), abs=1e-6)


# ----------------------------------------------------------------------
# standard normal upper tail (A&S erfc)
# ----------------------------------------------------------------------

NORM_Z = [-4.0, -2.5, -1.0, -0.5, 0.0, 0.3, 1.0, 1.96, 2.575, 4.0, 6.0]


def test_norm_sf_both_backends_match_erfc(spark):
    """Spark and DuckDB renderings agree with each other to the ulp and
    with math.erfc (the true normal tail) within the A&S 7.1.26
    polynomial's documented 1.5e-7 absolute error."""
    import pandas as pd
    from pyspark.sql import functions as F

    con = duckdb.connect()
    con.execute("CREATE TABLE z(z DOUBLE)")
    con.executemany("INSERT INTO z VALUES (?)", [(z,) for z in NORM_Z])
    duck = dict(
        con.execute(f"SELECT z, {special.norm_sf_sql('z')} FROM z").fetchall()
    )
    rows = (
        spark.createDataFrame(pd.DataFrame({"z": NORM_Z}))
        .select("z", special.norm_sf_spark(F.col("z")).alias("p"))
        .collect()
    )
    for r in rows:
        want = 0.5 * math.erfc(r["z"] / math.sqrt(2.0))
        assert r["p"] == pytest.approx(want, abs=2e-7), r["z"]
        assert r["p"] == pytest.approx(duck[r["z"]], abs=1e-14), r["z"]
    # symmetry: sf(z) + sf(-z) == 1 under the reflection branch
    p = {r["z"]: r["p"] for r in rows}
    assert p[1.0] + p[-1.0] == pytest.approx(1.0, abs=1e-12)


def test_tukey_sf_anchors_published_tables():
    """sf at published 5% studentized-range critical values must be
    ~0.05 (Pearson & Hartley tables, public domain). The quadrature's
    self-measured accuracy is 2.7e-6; table values are rounded to 2-3
    decimals, so 2e-3 covers the anchor rounding."""
    con = duckdb.connect()
    for q, k, nu in [(3.877, 3, 10), (3.58, 3, 20), (3.96, 4, 20), (4.23, 5, 20)]:
        v = con.execute(
            "SELECT " + special.tukey_sf_sql(repr(q), k, repr(float(nu)))
        ).fetchone()[0]
        assert v == pytest.approx(0.05, abs=2e-3), (q, k, nu, v)
    # infinite-df anchor: q(0.05; k=3, inf) = 3.31
    v = con.execute(
        "SELECT " + special.tukey_sf_sql("3.31", 3, "10000.0")
    ).fetchone()[0]
    assert v == pytest.approx(0.05, abs=2e-3)


def test_tukey_sf_k2_identity():
    """EXACT distributional identity: the studentized range of k=2
    groups is |T_nu| * sqrt(2), so sf(q; 2, nu) == P(|T| >= q/sqrt(2)).
    The two sides go through completely different numerics (double
    quadrature vs incomplete-beta continued fraction) — agreement to
    1e-6 is an independent correctness proof of both."""
    con = duckdb.connect()
    for q, nu in [(0.5, 5.0), (2.0, 8.0), (3.0, 15.0), (4.5, 40.0), (6.0, 200.0)]:
        a = con.execute(
            "SELECT " + special.tukey_sf_sql(repr(q), 2, repr(nu))
        ).fetchone()[0]
        b = con.execute(
            "SELECT " + special.t_sf2_sql(repr(q / math.sqrt(2.0)), repr(nu))
        ).fetchone()[0]
        assert a == pytest.approx(b, abs=1e-6), (q, nu, a, b)


def test_tukey_sf_spark_matches_sql(spark):
    import pyspark.sql.functions as F

    con = duckdb.connect()
    rows = [(3.877, 10.0), (2.0, 8.0), (0.5, 5.0), (6.5, 100.0)]
    df = spark.createDataFrame(rows, ["q", "nu"])
    for k in (2, 3, 5):
        got = {
            r["q"]: r["p"]
            for r in df.select(
                "q", special.tukey_sf_spark(F.col("q"), k, F.col("nu")).alias("p")
            ).collect()
        }
        for q, nu in rows:
            want = con.execute(
                "SELECT " + special.tukey_sf_sql(repr(q), k, repr(nu))
            ).fetchone()[0]
            assert abs(got[q] - want) < 1e-12, (k, q, nu)


def test_tukey_sf_monotone_edges():
    con = duckdb.connect()
    vals = [
        con.execute(
            "SELECT " + special.tukey_sf_sql(repr(q), 3, "12.0")
        ).fetchone()[0]
        for q in (0.0, 0.5, 1.5, 3.0, 5.0, 8.0)
    ]
    assert vals[0] == pytest.approx(1.0, abs=1e-9)
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))
    assert vals[-1] < 1e-3


def test_t_tail_at_zero_is_one_both_backends(spark):
    """Regression: t = 0 puts betainc at x == 1.0 exactly; the edge guard
    must return p = 1.0 (an earlier 1.0-1e-300 threshold rounded to 1.0,
    so both backends fell into ln(0) and returned NULL — which then
    poisoned BH ranking downstream)."""
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"t": [0.0, 0.0], "dof": [1.0, 60.0]}))
    rows = df.select(special.t_sf2_spark(F.col("t"), F.col("dof")).alias("p")).collect()
    assert [r["p"] for r in rows] == [1.0, 1.0]
    got = duckdb.sql("SELECT " + special.t_sf2_sql("0.0", "17.0")).fetchone()[0]
    assert got == 1.0
    # F tail at f = 0 hits the same x == 1 edge
    f0 = df.select(special.f_sf_spark(F.lit(0.0), F.lit(3.0), F.col("dof")).alias("p")).collect()
    assert [r["p"] for r in f0] == [1.0, 1.0]


def test_logrank_fully_censored_group_contributes_zero(spark):
    """A group whose every subject is censored BEFORE the first pooled
    event time has e_g = 0 — its (O-E)^2/e term must contribute 0, not
    throw DIVIDE_BY_ZERO under ANSI."""
    import pandas as pd

    from pyspark.sql import functions as F

    from ckg_spark.ops.survival import logrank_statistic

    rows = [
        ("a", 1, False), ("a", 2, False),       # all censored, pre-event
        ("b", 5, True), ("b", 6, True), ("b", 7, False),
    ]
    pdf = pd.DataFrame(rows, columns=["grp", "t", "ev"])
    got = logrank_statistic(
        spark.createDataFrame(pdf), "t", F.col("ev"), "grp"
    ).collect()[0]
    # group b is the only one at risk at its own events: O == E, chi2 = 0
    assert got["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert got["p_value"] == pytest.approx(1.0, abs=1e-9)
