"""Distribution tails (Student-t, F, hypergeometric) as DUAL-BACKEND
expressions: every formula is written once against a tiny dual expression
builder that renders BOTH a Spark ``Column`` (pure JVM column math —
whole-stage codegen, no Python evaluator) and the structurally identical
DuckDB SQL text. That is what makes p-values *hash-checkable* by the
driver's DuckDB oracle: both sides execute the same arithmetic graph, so
they agree to libm-ulp noise (~1e-12), far inside the ROUND(9) gate.

Why not scipy: the execution environment has none, and a scipy p-value
would be a Python UDF on the Spark side (Arrow round-trip in an
aggregation tail) with NO DuckDB equivalent — the query would drop to a
rows-only correctness check. Here the whole statistics pack
(t-test p-values, BH/FDR, ANOVA, Fisher enrichment — the reference's
analytics_core/analytics/analytics.py:859-989, 1229-1658, 1908-2048)
stays value-hash-verified.

Machinery (classical, public-domain numerics):

- ``lgamma``: Lanczos approximation (g=7, n=9) — pure arithmetic + ln,
  valid for z >= 0.5 (every argument here is a dof/2, a count+1, or 1/2);
  relative error ~1e-13.
- regularized incomplete beta ``I_x(a, b)``: modified-Lentz continued
  fraction at FIXED depth (no early exit — a data-independent expression
  both engines can fold), with the standard symmetry switch
  ``I_x(a,b) = 1 - I_{1-x}(b,a)`` into the convergent region
  ``x < (a+1)/(a+b+2)``. The fold is ``F.aggregate`` over a
  ``sequence(1, M)`` on Spark and ``list_reduce`` over ``range`` on
  DuckDB — identical per-step arithmetic via the dual builder.
- Student-t two-sided tail: ``P(|T| >= t) = I_{v/(v+t^2)}(v/2, 1/2)``.
- F upper tail: ``P(F >= f) = I_{d2/(d2+d1 f)}(d2/2, d1/2)``.
- hypergeometric upper tail (Fisher exact, over-representation):
  ``sum_{i=k..min(K,n)} exp(lgC(K,i)+lgC(N-K,n-i)-lgC(N,n))`` — a
  dynamic-length fold, same shape on both backends.

Scale note: these evaluate on POST-AGGREGATION rows (one per feature /
group / annotation term — dimension-sized), so a few hundred fold steps
per row cost nothing; the corpus-scale work stays in the upstream
aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

# Lanczos (g=7, n=9) coefficients — classical public-domain constants.
_LANCZOS = [
    0.99999999999980993,
    676.5203681218851,
    -1259.1392167224028,
    771.32342877765313,
    -176.61502916214059,
    12.507343278686905,
    -0.13857109526572012,
    9.9843695780195716e-6,
    1.5056327351493116e-7,
]
_HALF_LN_2PI = 0.9189385332046727  # 0.5 * ln(2*pi)
_FPMIN = 1e-300
CF_DEPTH = 200  # fixed Lentz depth (2 CF levels per step => 400 levels)


class DE:
    """Dual expression: a Spark Column and/or a DuckDB SQL string built by
    the SAME Python code path, so both backends get the identical
    arithmetic graph. One side may be None (backend-specific leaves).
    Float literals are kept symbolic (``v``) and materialize to ``F.lit``
    lazily, so SQL-only rendering needs no SparkContext."""

    __slots__ = ("c", "s", "v")

    def __init__(self, c: Column | None, s: str | None, v: float | None = None):
        self.c = c
        self.s = s
        self.v = v

    # -- arithmetic (always parenthesized so SQL precedence matches;
    # literal⊗literal folds in Python — IEEE double, same as either
    # engine's constant folding) ------------------------------------------
    def __add__(self, o):
        o = _lift(o)
        if self.v is not None and o.v is not None:
            return lit(self.v + o.v)
        return DE(_c(self) + _c(o) if _has(self, o) else None, _sql2(self, o, "+"))

    def __radd__(self, o):
        return _lift(o) + self

    def __sub__(self, o):
        o = _lift(o)
        if self.v is not None and o.v is not None:
            return lit(self.v - o.v)
        return DE(_c(self) - _c(o) if _has(self, o) else None, _sql2(self, o, "-"))

    def __rsub__(self, o):
        return _lift(o) - self

    def __mul__(self, o):
        o = _lift(o)
        if self.v is not None and o.v is not None:
            return lit(self.v * o.v)
        return DE(_c(self) * _c(o) if _has(self, o) else None, _sql2(self, o, "*"))

    def __rmul__(self, o):
        return _lift(o) * self

    def __truediv__(self, o):
        o = _lift(o)
        if self.v is not None and o.v is not None:
            return lit(self.v / o.v)
        return DE(_c(self) / _c(o) if _has(self, o) else None, _sql2(self, o, "/"))

    def __rtruediv__(self, o):
        return _lift(o) / self

    def __neg__(self):
        return DE(-_c(self) if _has(self) else None,
                  f"(-{self.s})" if self.s is not None else None)


def _c(e: DE) -> Column:
    return e.c if e.c is not None else F.lit(e.v)


def _has(*es: DE) -> bool:
    return all(e.c is not None or e.v is not None for e in es)


def _sql2(a: DE, b: DE, op: str) -> str | None:
    if a.s is None or b.s is None:
        return None
    return f"({a.s} {op} {b.s})"


def lit(v: float) -> DE:
    return DE(None, repr(float(v)), v=float(v))


def _lift(v) -> DE:
    return v if isinstance(v, DE) else lit(v)


def ln(e: DE) -> DE:
    return DE(F.log(_c(e)) if _has(e) else None,
              f"ln({e.s})" if e.s is not None else None)


def exp(e: DE) -> DE:
    return DE(F.exp(_c(e)) if _has(e) else None,
              f"exp({e.s})" if e.s is not None else None)


def sqrt(e: DE) -> DE:
    return DE(F.sqrt(_c(e)) if _has(e) else None,
              f"sqrt({e.s})" if e.s is not None else None)


def abs_(e: DE) -> DE:
    return DE(F.abs(_c(e)) if _has(e) else None,
              f"abs({e.s})" if e.s is not None else None)


def least(a: DE, b: DE) -> DE:
    a, b = _lift(a), _lift(b)
    return DE(F.least(_c(a), _c(b)) if _has(a, b) else None,
              f"least({a.s}, {b.s})" if a.s is not None and b.s is not None else None)


def when_lt(x: DE, y: DE, then: DE, els: DE) -> DE:
    """CASE WHEN x < y THEN then ELSE els END (lazy on both backends —
    guards ln/0-division in the untaken branch)."""
    x, y, then, els = _lift(x), _lift(y), _lift(then), _lift(els)
    c = (
        F.when(_c(x) < _c(y), _c(then)).otherwise(_c(els))
        if _has(x, y, then, els)
        else None
    )
    s = (
        f"(CASE WHEN {x.s} < {y.s} THEN {then.s} ELSE {els.s} END)"
        if None not in (x.s, y.s, then.s, els.s)
        else None
    )
    return DE(c, s)


def _guard(d: DE) -> DE:
    """Lentz underflow guard: |d| < FPMIN => FPMIN (sign dropped, exactly
    the Numerical-Recipes convention on both backends)."""
    return when_lt(abs_(d), lit(_FPMIN), lit(_FPMIN), d)


def lgamma(z: DE) -> DE:
    """Lanczos log-gamma for z >= 0.5 (all callers satisfy this)."""
    zm1 = z - lit(1.0)
    acc = lit(_LANCZOS[0])
    for i in range(1, 9):
        acc = acc + lit(_LANCZOS[i]) / (zm1 + lit(float(i)))
    t = zm1 + lit(7.5)
    return lit(_HALF_LN_2PI) + (zm1 + lit(0.5)) * ln(t) - t + ln(acc)


# ----------------------------------------------------------------------
# Lentz continued fraction for the regularized incomplete beta.
# The per-step arithmetic lives in _betacf_step (written ONCE); the fold
# harness differs per backend (F.aggregate vs list_reduce).
# ----------------------------------------------------------------------

def _betacf_init_d(a: DE, b: DE, x: DE) -> DE:
    """First Lentz denominator: d = 1/(1 - (a+b)x/(a+1)), guarded."""
    qab, qap = a + b, a + lit(1.0)
    return lit(1.0) / _guard(lit(1.0) - qab * x / qap)


def _betacf_step(acc_c: DE, acc_d: DE, acc_h: DE, m: DE, a: DE, b: DE, x: DE):
    """One double-step of the modified Lentz iteration (NR betacf):
    even coefficient then odd coefficient. Returns (c', d', h')."""
    qab, qap, qam = a + b, a + lit(1.0), a - lit(1.0)
    m2 = m * lit(2.0)
    # even step: aa = m(b-m)x / ((qam+2m)(a+2m))
    aa = m * (b - m) * x / ((qam + m2) * (a + m2))
    d1 = lit(1.0) / _guard(lit(1.0) + aa * acc_d)
    c1 = _guard(lit(1.0) + aa / acc_c)
    h1 = acc_h * d1 * c1
    # odd step: aa = -(a+m)(qab+m)x / ((a+2m)(qap+2m))
    aa2 = -((a + m) * (qab + m) * x) / ((a + m2) * (qap + m2))
    d2 = lit(1.0) / _guard(lit(1.0) + aa2 * d1)
    c2 = _guard(lit(1.0) + aa2 / c1)
    h2 = h1 * d2 * c2
    return c2, d2, h2


def _betacf_spark(a: Column, b: Column, x: Column, depth: int) -> Column:
    A, B, X = DE(a, None), DE(b, None), DE(x, None)
    d0 = _betacf_init_d(A, B, X)
    init = F.struct(
        F.lit(1.0).alias("c"), d0.c.alias("d"), d0.c.alias("h")
    )

    def merge(acc, m):
        c2, d2, h2 = _betacf_step(
            DE(acc["c"], None), DE(acc["d"], None), DE(acc["h"], None),
            DE(m.cast("double"), None), A, B, X,
        )
        return F.struct(c2.c.alias("c"), d2.c.alias("d"), h2.c.alias("h"))

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(depth)), init, merge, lambda acc: acc["h"]
    )


def _betacf_sql(a: str, b: str, x: str, depth: int) -> str:
    A, B, X = DE(None, a), DE(None, b), DE(None, x)
    d0 = _betacf_init_d(A, B, X)
    c2, d2, h2 = _betacf_step(
        DE(None, "acc.c"), DE(None, "acc.d"), DE(None, "acc.h"),
        DE(None, "CAST(el.c AS DOUBLE)"), A, B, X,
    )
    # elements carry the step index in field 'c' (same struct type as the
    # accumulator, which list_reduce requires); the init state is prepended.
    #
    # FIELD ORDER MATTERS: DuckDB 1.0 evaluates struct-literal fields in a
    # reduce lambda SEQUENTIALLY — a later field sees earlier fields'
    # UPDATED values (verified empirically; snapshot semantics would give
    # different h). Ordering 'h' (reads old c,d,h) before 'c' (reads only
    # c) before 'd' (reads only d) is correct under BOTH semantics, so the
    # expression survives a DuckDB fix.
    init = f"{{'h': {d0.s}, 'c': CAST(1.0 AS DOUBLE), 'd': {d0.s}}}"
    steps = (
        f"list_transform(range(1, {depth + 1}), "
        f"m -> {{'h': CAST(0.0 AS DOUBLE), 'c': CAST(m AS DOUBLE), 'd': CAST(0.0 AS DOUBLE)}})"
    )
    fold = (
        f"list_reduce(list_prepend({init}, {steps}), "
        f"(acc, el) -> {{'h': {h2.s}, 'c': {c2.s}, 'd': {d2.s}}})"
    )
    return f"struct_extract({fold}, 'h')"


def _betainc_de(a: DE, b: DE, x: DE, cf) -> DE:
    """I_x(a,b) given a backend continued-fraction builder ``cf(a,b,x)``.

    front = exp(lgamma(a+b)-lgamma(a)-lgamma(b) + a ln x + b ln(1-x));
    direct branch when x < (a+1)/(a+b+2), else 1 - swapped."""
    def one_sided(aa: DE, bb: DE, xx: DE) -> DE:
        front = exp(
            lgamma(aa + bb) - lgamma(aa) - lgamma(bb)
            + aa * ln(xx) + bb * ln(lit(1.0) - xx)
        )
        return front * cf(aa, bb, xx) / aa

    direct = one_sided(a, b, x)
    swapped = lit(1.0) - one_sided(b, a, lit(1.0) - x)
    thresh = (a + lit(1.0)) / (a + b + lit(2.0))
    core = when_lt(x, thresh, direct, swapped)
    # exact-edge guards: x<=0 => 0, x>=1 => 1 (lazy CASE keeps ln() safe).
    # The upper threshold must be a double STRICTLY below 1.0: an earlier
    # 1.0-1e-300 rounded to exactly 1.0, so x == 1.0 (e.g. the t-tail at
    # t = 0) fell through to ln(1-x) = ln(0) and returned NULL — on BOTH
    # backends, so the hash gate couldn't see it (the shared-defect trap).
    # 1-1e-15 is representable; clamping x in (1-1e-15, 1) to p=1 errs by
    # O(sqrt(1e-15)) at a tail value of ~1 — far inside ROUND(9).
    return when_lt(x, lit(1e-300), lit(0.0),
                   when_lt(lit(1.0) - lit(1e-15), x, lit(1.0), core))


def betainc_spark(a: Column, b: Column, x: Column, depth: int = CF_DEPTH) -> Column:
    """Regularized incomplete beta I_x(a, b) as a pure-JVM Column."""
    def cf(aa: DE, bb: DE, xx: DE) -> DE:
        return DE(_betacf_spark(aa.c, bb.c, xx.c, depth), None)

    return _betainc_de(DE(a, None), DE(b, None), DE(x, None), cf).c


def betainc_sql(a: str, b: str, x: str, depth: int = CF_DEPTH) -> str:
    """Regularized incomplete beta I_x(a, b) as DuckDB SQL text."""
    def cf(aa: DE, bb: DE, xx: DE) -> DE:
        return DE(None, _betacf_sql(aa.s, bb.s, xx.s, depth))

    return _betainc_de(DE(None, f"({a})"), DE(None, f"({b})"), DE(None, f"({x})"), cf).s


# ----------------------------------------------------------------------
# distribution tails
# ----------------------------------------------------------------------

def t_sf2_spark(t: Column, dof: Column) -> Column:
    """Two-sided Student-t p-value P(|T| >= t) = I_{v/(v+t^2)}(v/2, 1/2)."""
    x = dof / (dof + t * t)
    return betainc_spark(dof / F.lit(2.0), F.lit(0.5), x)


def t_sf2_sql(t: str, dof: str) -> str:
    x = f"(({dof}) / (({dof}) + ({t}) * ({t})))"
    return betainc_sql(f"(({dof}) / 2.0)", "0.5", x)


def f_sf_spark(f: Column, d1: Column, d2: Column) -> Column:
    """F-distribution upper tail P(F >= f) = I_{d2/(d2+d1 f)}(d2/2, d1/2)."""
    x = d2 / (d2 + d1 * f)
    return betainc_spark(d2 / F.lit(2.0), d1 / F.lit(2.0), x)


def f_sf_sql(f: str, d1: str, d2: str) -> str:
    x = f"(({d2}) / (({d2}) + ({d1}) * ({f})))"
    return betainc_sql(f"(({d2}) / 2.0)", f"(({d1}) / 2.0)", x)


# ----------------------------------------------------------------------
# hypergeometric upper tail (Fisher exact, over-representation)
# ----------------------------------------------------------------------

def _lchoose(n: DE, k: DE) -> DE:
    return lgamma(n + lit(1.0)) - lgamma(k + lit(1.0)) - lgamma(n - k + lit(1.0))


def _hyper_term(i: DE, k_: DE, K: DE, n: DE, N: DE) -> DE:
    """P(X = i) for X ~ Hypergeom(N, K, n), in log space."""
    _ = k_
    return exp(_lchoose(K, i) + _lchoose(N - K, n - i) - _lchoose(N, n))


def hypergeom_sf_spark(k: Column, K: Column, n: Column, N: Column) -> Column:
    """P(X >= k) = sum_{i=k}^{min(K,n)} pmf(i) — F.aggregate left fold
    (identical summation order to the DuckDB list_reduce).

    Guarded for k > min(K,n): Spark's sequence(k, hi) silently DESCENDS
    there, summing out-of-support terms whose lgamma hits non-positive
    integer arguments (ANSI divide-by-zero inside the Lanczos rational) —
    while the SQL twin's range() yields an empty list and 0.0. The guard
    keeps the two backends identical over the whole domain."""
    Kd, nd, Nd = K.cast("double"), n.cast("double"), N.cast("double")
    hi = F.least(K, n).cast("int")
    term = lambda i: _hyper_term(  # noqa: E731
        DE(i.cast("double"), None), None, DE(Kd, None), DE(nd, None), DE(Nd, None)
    ).c
    return F.when(k.cast("int") > hi, F.lit(0.0)).otherwise(
        F.aggregate(
            F.sequence(F.least(k.cast("int"), hi), hi),
            F.lit(0.0),
            lambda acc, i: acc + term(i),
        )
    )


def hypergeom_sf_sql(k: str, K: str, n: str, N: str) -> str:
    term = _hyper_term(
        DE(None, "CAST(i AS DOUBLE)"), None,
        DE(None, f"CAST(({K}) AS DOUBLE)"), DE(None, f"CAST(({n}) AS DOUBLE)"),
        DE(None, f"CAST(({N}) AS DOUBLE)"),
    ).s
    terms = f"list_transform(range(CAST(({k}) AS BIGINT), least(({K}), ({n})) + 1), i -> {term})"
    return f"coalesce(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), (acc, el) -> (acc + el)), 0.0)"


# ----------------------------------------------------------------------
# regularized incomplete gamma Q(a, x) — the chi-square upper tail
# (NR gser/gcf pair, same fixed-depth dual-backend fold as the beta CF).
# ----------------------------------------------------------------------

def _gamma_front(a: DE, x: DE) -> DE:
    """exp(-x + a ln x - lgamma(a)) — shared prefactor of series and CF."""
    return exp(-x + a * ln(x) - lgamma(a))


def _gser_fields(acc_sum: DE, acc_term: DE, n: DE, a: DE, x: DE):
    """One series step for P(a,x): term_{n} = term_{n-1} * x/(a+n).
    Each output is a FULL expression of the old accumulator fields;
    'sum' is ordered before 'term' so the expressions are correct under
    both DuckDB struct-fold semantics (see _betacf_sql note)."""
    ratio = x / (a + n)
    return acc_sum + acc_term * ratio, acc_term * ratio


def _gser_spark(a: Column, x: Column, depth: int) -> Column:
    A, X = DE(a, None), DE(x, None)
    inv_a = lit(1.0) / A
    init = F.struct(inv_a.c.alias("s"), inv_a.c.alias("t"))

    def merge(acc, n):
        s2, t2 = _gser_fields(
            DE(acc["s"], None), DE(acc["t"], None),
            DE(n.cast("double"), None), A, X,
        )
        return F.struct(s2.c.alias("s"), t2.c.alias("t"))

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(depth)), init, merge, lambda acc: acc["s"]
    )


def _gser_sql(a: str, x: str, depth: int) -> str:
    A, X = DE(None, a), DE(None, x)
    inv_a = (lit(1.0) / A).s
    s2, t2 = _gser_fields(
        DE(None, "acc.s"), DE(None, "acc.t"),
        DE(None, "CAST(el.s AS DOUBLE)"), A, X,
    )
    # element carries the step index in field 's' (struct type must match
    # the accumulator's for list_reduce)
    init = f"{{'s': {inv_a}, 't': {inv_a}}}"
    steps = (
        f"list_transform(range(1, {depth + 1}), "
        f"n -> {{'s': CAST(n AS DOUBLE), 't': CAST(0.0 AS DOUBLE)}})"
    )
    fold = f"list_reduce(list_prepend({init}, {steps}), (acc, el) -> {{'s': {s2.s}, 't': {t2.s}}})"
    return f"struct_extract({fold}, 's')"


def _gcf_fields(acc_c: DE, acc_d: DE, acc_h: DE, n: DE, a: DE, x: DE):
    """One modified-Lentz step of the NR gcf continued fraction for
    Q(a,x): an = -n(n-a), bn = x+1-a+2n. Field order 'h','c','d' — h
    reads old c/d/h via full expansion, c reads only c, d reads only d
    (correct under both DuckDB struct-fold semantics)."""
    an = -n * (n - a)
    bn = x + lit(1.0) - a + lit(2.0) * n
    d2 = lit(1.0) / _guard(an * acc_d + bn)
    c2 = _guard(bn + an / acc_c)
    h2 = acc_h * d2 * c2
    return c2, d2, h2


def _gcf_spark(a: Column, x: Column, depth: int) -> Column:
    A, X = DE(a, None), DE(x, None)
    b0 = X + lit(1.0) - A
    d0 = lit(1.0) / _guard(b0)
    init = F.struct(
        F.lit(1.0 / _FPMIN).alias("c"), d0.c.alias("d"), d0.c.alias("h")
    )

    def merge(acc, n):
        c2, d2, h2 = _gcf_fields(
            DE(acc["c"], None), DE(acc["d"], None), DE(acc["h"], None),
            DE(n.cast("double"), None), A, X,
        )
        return F.struct(c2.c.alias("c"), d2.c.alias("d"), h2.c.alias("h"))

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(depth)), init, merge, lambda acc: acc["h"]
    )


def _gcf_sql(a: str, x: str, depth: int) -> str:
    A, X = DE(None, a), DE(None, x)
    b0 = X + lit(1.0) - A
    d0 = (lit(1.0) / _guard(b0)).s
    c2, d2, h2 = _gcf_fields(
        DE(None, "acc.c"), DE(None, "acc.d"), DE(None, "acc.h"),
        DE(None, "CAST(el.c AS DOUBLE)"), A, X,
    )
    init = f"{{'h': {d0}, 'c': CAST({1.0 / _FPMIN!r} AS DOUBLE), 'd': {d0}}}"
    steps = (
        f"list_transform(range(1, {depth + 1}), "
        f"n -> {{'h': CAST(0.0 AS DOUBLE), 'c': CAST(n AS DOUBLE), 'd': CAST(0.0 AS DOUBLE)}})"
    )
    fold = (
        f"list_reduce(list_prepend({init}, {steps}), "
        f"(acc, el) -> {{'h': {h2.s}, 'c': {c2.s}, 'd': {d2.s}}})"
    )
    return f"struct_extract({fold}, 'h')"


def _gammainc_q_de(a: DE, x: DE, gser, gcf) -> DE:
    """Q(a, x) = 1 - P(a, x), branching to the series below x < a+1 and
    the continued fraction above (each convergent in its region)."""
    front = _gamma_front(a, x)
    q_series = lit(1.0) - front * gser(a, x)
    q_cf = front * gcf(a, x)
    core = when_lt(x, a + lit(1.0), q_series, q_cf)
    return when_lt(x, lit(1e-300), lit(1.0), core)


def gammainc_q_spark(a: Column, x: Column, depth: int = CF_DEPTH) -> Column:
    """Regularized upper incomplete gamma Q(a, x) as a pure-JVM Column."""
    def gser(aa: DE, xx: DE) -> DE:
        return DE(_gser_spark(aa.c, xx.c, depth), None)

    def gcf(aa: DE, xx: DE) -> DE:
        return DE(_gcf_spark(aa.c, xx.c, depth), None)

    return _gammainc_q_de(DE(a, None), DE(x, None), gser, gcf).c


def gammainc_q_sql(a: str, x: str, depth: int = CF_DEPTH) -> str:
    """Regularized upper incomplete gamma Q(a, x) as DuckDB SQL text."""
    def gser(aa: DE, xx: DE) -> DE:
        return DE(None, _gser_sql(aa.s, xx.s, depth))

    def gcf(aa: DE, xx: DE) -> DE:
        return DE(None, _gcf_sql(aa.s, xx.s, depth))

    return _gammainc_q_de(DE(None, f"({a})"), DE(None, f"({x})"), gser, gcf).s


def chi2_sf_spark(x: Column, k: Column) -> Column:
    """Chi-square upper tail P(X >= x) with k dof = Q(k/2, x/2)."""
    return gammainc_q_spark(k / F.lit(2.0), x / F.lit(2.0))


def chi2_sf_sql(x: str, k: str) -> str:
    return gammainc_q_sql(f"(({k}) / 2.0)", f"(({x}) / 2.0)")


# ----------------------------------------------------------------------
# standard normal upper tail (Mann-Whitney / rank-test approximations)
# ----------------------------------------------------------------------

_SQRT_2 = 1.4142135623730951


def _erfc_ge0(y: DE) -> DE:
    """erfc(y) for y >= 0 via the Abramowitz-Stegun 7.1.26 rational
    polynomial (|abs err| < 1.5e-7). Elementary ops only, so the Spark
    Column and DuckDB SQL renderings share one expression graph — the
    two backends agree to the ulp, which is what makes downstream
    p-values hash-checkable regardless of the approximation's distance
    from the true erfc."""
    t = lit(1.0) / (lit(1.0) + lit(0.3275911) * y)
    poly = t * (
        lit(0.254829592)
        + t * (
            lit(-0.284496736)
            + t * (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))
        )
    )
    return poly * exp(-(y * y))


def _norm_sf_de(z: DE) -> DE:
    """P(Z >= z) = erfc(z / sqrt(2)) / 2, reflected for z < 0 so the
    polynomial only ever sees a non-negative argument."""
    half_erfc = lit(0.5) * _erfc_ge0(abs_(z) / lit(_SQRT_2))
    return when_lt(z, lit(0.0), lit(1.0) - half_erfc, half_erfc)


def norm_sf_spark(z: Column) -> Column:
    """Standard-normal upper tail as a pure-JVM Column."""
    return _norm_sf_de(DE(z, None)).c


def norm_sf_sql(z: str) -> str:
    """Standard-normal upper tail as DuckDB SQL text."""
    return _norm_sf_de(DE(None, f"({z})")).s


# ----------------------------------------------------------------------
# D'Agostino-Pearson K^2 normality statistic (check_normality analog)
# ----------------------------------------------------------------------

def _skew_z_de(n: DE, g1: DE) -> DE:
    """D'Agostino (1970) skewness z-transform — the classical published
    constants (scipy.stats.skewtest uses the same formulas). ``g1`` is
    the biased sample skewness m3/m2^1.5. Valid for n >= 8."""
    y_raw = g1 * sqrt(((n + lit(1.0)) * (n + lit(3.0))) / (lit(6.0) * (n - lit(2.0))))
    beta2 = (
        lit(3.0) * ((n * n) + (lit(27.0) * n) - lit(70.0)) * (n + lit(1.0)) * (n + lit(3.0))
    ) / ((n - lit(2.0)) * (n + lit(5.0)) * (n + lit(7.0)) * (n + lit(9.0)))
    w2 = sqrt(lit(2.0) * (beta2 - lit(1.0))) - lit(1.0)
    delta = lit(1.0) / sqrt(lit(0.5) * ln(w2))
    alpha = sqrt(lit(2.0) / (w2 - lit(1.0)))
    # scipy: y == 0 is replaced by 1 before the asinh transform
    y = when_lt(abs_(y_raw), lit(_FPMIN), lit(1.0), y_raw)
    ya = y / alpha
    return delta * ln(ya + sqrt((ya * ya) + lit(1.0)))


def _kurt_z_de(n: DE, b2: DE) -> DE:
    """Anscombe-Glynn (1983) kurtosis z-transform (scipy.stats
    kurtosistest formulas). ``b2`` is the biased non-Fisher sample
    kurtosis m4/m2^2. Valid for n >= 20 (scipy's recommended floor)."""
    e = (lit(3.0) * (n - lit(1.0))) / (n + lit(1.0))
    var = (lit(24.0) * n * (n - lit(2.0)) * (n - lit(3.0))) / (
        ((n + lit(1.0)) * (n + lit(1.0))) * (n + lit(3.0)) * (n + lit(5.0))
    )
    x = (b2 - e) / sqrt(var)
    sb1 = (
        (lit(6.0) * ((n * n) - (lit(5.0) * n) + lit(2.0))) / ((n + lit(7.0)) * (n + lit(9.0)))
    ) * sqrt((lit(6.0) * (n + lit(3.0)) * (n + lit(5.0))) / (n * (n - lit(2.0)) * (n - lit(3.0))))
    a = lit(6.0) + ((lit(8.0) / sb1) * ((lit(2.0) / sb1) + sqrt(lit(1.0) + (lit(4.0) / (sb1 * sb1)))))
    t1 = lit(1.0) - (lit(2.0) / (lit(9.0) * a))
    denom = lit(1.0) + (x * sqrt(lit(2.0) / (a - lit(4.0))))
    # cube root with sign: sign(denom) * ((1-2/A)/|denom|)^(1/3);
    # |denom| underflow-guarded so ln never sees 0 (scipy yields nan
    # there; real aggregates never land on the singular point).
    mag = exp(ln((lit(1.0) - (lit(2.0) / a)) / _guard(abs_(denom))) / lit(3.0))
    t2 = when_lt(denom, lit(0.0), -mag, mag)
    return (t1 - t2) / sqrt(lit(2.0) / (lit(9.0) * a))


def _normal_k2_de(n: DE, g1: DE, b2: DE) -> DE:
    zs = _skew_z_de(n, g1)
    zk = _kurt_z_de(n, b2)
    return (zs * zs) + (zk * zk)


def normaltest_k2_spark(n: Column, g1: Column, b2: Column) -> Column:
    """K^2 = z_skew^2 + z_kurt^2 as a pure-JVM Column; the p-value is
    the chi-square(2) upper tail, exactly exp(-K^2/2)."""
    return _normal_k2_de(DE(n, None), DE(g1, None), DE(b2, None)).c


def normaltest_k2_sql(n: str, g1: str, b2: str) -> str:
    """K^2 as DuckDB SQL text (identical arithmetic graph)."""
    return _normal_k2_de(DE(None, f"({n})"), DE(None, f"({g1})"), DE(None, f"({b2})")).s


# ----------------------------------------------------------------------
# Studentized-range upper tail (Tukey HSD posthoc p-values)
# ----------------------------------------------------------------------
#
# P(Q <= q | k, nu) = INT_0^inf f_nu(u) * k * INT phi(z)
#                       [Phi(z) - Phi(z - q*u)]^(k-1) dz du
# where f_nu is the density of sqrt(chi2_nu / nu) (the scale factor of
# the studentized range) and the inner integral is the CDF of the range
# of k iid standard normals — both classical results (e.g. Hartley 1942;
# the same double integral R's ptukey evaluates). Both integrals are
# fixed-node Gauss-Legendre sums — a DATA-INDEPENDENT expression both
# engines fold identically, exactly like the Lentz continued fractions
# above: BOTH axes are engine-level folds (F.aggregate / list_reduce)
# over node-carrying struct arrays, so the plan is O(1) in the node
# count (inlining node constants into an unrolled sum put the full erfc
# tree at every node — ~700 KB of expression text).
#
# Phi reuses the A&S 7.1.26 erfc above — including for the COMPILE-TIME
# constants Phi(z_j) (via the Python mirror below), so the bracket is
# exactly zero at q = 0 instead of carrying the polynomial's 1.5e-7
# bias. Absolute accuracy is ~1e-5 (erfc bias dominates); cross-engine
# agreement is to the ulp, which is what the ROUND(9) hash gate needs.
# Anchored against published 5% critical-value tables and the exact
# k=2 identity P(Q >= q) = P(|T_nu| >= q/sqrt(2)) in tests/test_special.py.

_LN_2 = 0.6931471805599453


def _leggauss(n: int):
    import numpy as np

    x, w = np.polynomial.legendre.leggauss(n)
    return [float(v) for v in x], [float(v) for v in w]


# 24 outer x 32 inner nodes with nu-adapted outer interval 1 +- 5.5/sqrt(nu)
# and inner interval [-6.5, 6.5]: max |dev| vs a 64x64 reference quadrature
# is 2.7e-6 over q in [0.5, 6], k in [2, 6], nu in [3, 10000] (measured) —
# inside the ROUND(6) gate with margin, at a third of the fold steps of
# the naive 48x48 / +-8 layout.
_TUKEY_W_OUTER = 5.5
_TUKEY_W_INNER = 6.5
_GL_X, _GL_W = _leggauss(24)


def _norm_sf_py(z: float) -> float:
    """Python mirror of _norm_sf_de (same A&S constants, same _SQRT_2
    literal) — used only to precompute the Phi(z_j) node constants so
    runtime and compile-time Phi cancel exactly."""
    import math

    y = abs(z) / _SQRT_2
    t = 1.0 / (1.0 + 0.3275911 * y)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    half = 0.5 * poly * math.exp(-(y * y))
    return 1.0 - half if z < 0.0 else half


def _tukey_inner_consts():
    """(z_j, c_j, sf_j): inner node, weight*phi(z_j) folded to one
    literal, and the A&S upper tail at z_j."""
    import math

    out = []
    for x, w in zip(*_leggauss(32)):
        z = _TUKEY_W_INNER * x
        c = _TUKEY_W_INNER * w * math.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)
        out.append((z, c, _norm_sf_py(z)))
    return out


_TUKEY_INNER = _tukey_inner_consts()


def greatest(a: DE, b: DE) -> DE:
    a, b = _lift(a), _lift(b)
    return DE(F.greatest(_c(a), _c(b)) if _has(a, b) else None,
              f"greatest({a.s}, {b.s})" if a.s is not None and b.s is not None else None)


def _tukey_term(r: DE, z: DE, c: DE, s: DE, k: int) -> DE:
    """One inner-node term c_j * [Phi(z_j) - Phi(z_j - r)]^(k-1), with
    the bracket as sf(z - r) - sf(z) (both the runtime tail and the
    precomputed node constant use the same A&S polynomial, so the
    bracket is exactly zero at r = 0) and the power as repeated
    multiplication (reproducible across engines, unlike libm pow)."""
    br = greatest(lit(0.0), _norm_sf_de(z - r) - s)
    p = br
    for _ in range(k - 2):
        p = p * br
    return c * p


def _tukey_outer_pieces(q: DE, dof: DE, x: DE, w: DE):
    """(r, wgt_times_density) for one outer node: u = mid + half*x on the
    nu-adapted interval, f_nu the density of sqrt(chi2_nu/nu)."""
    rtnu = sqrt(dof)
    lo = greatest(lit(1e-9), lit(1.0) - lit(_TUKEY_W_OUTER) / rtnu)
    hi = lit(1.0) + lit(_TUKEY_W_OUTER) / rtnu
    half = (hi - lo) * lit(0.5)
    u = ((hi + lo) * lit(0.5)) + (half * x)
    nh = dof * lit(0.5)
    ld = (
        lit(_LN_2) + (nh * ln(nh)) - lgamma(nh)
        + ((dof - lit(1.0)) * ln(u)) - (nh * (u * u))
    )
    return q * u, (w * half) * exp(ld)


def _tukey_sf_finish(total: DE, k: int) -> DE:
    return least(lit(1.0), greatest(lit(0.0), lit(1.0) - (lit(float(k)) * total)))


def tukey_sf_spark(q: Column, k: int, dof: Column) -> Column:
    """P(Q >= q) for the studentized range of k groups with dof error df
    — pure-JVM Column (the p-value behind pingouin.pairwise_tukey's
    psturng call, q = |t| * sqrt(2)). Both quadrature axes are
    engine-level folds over node-carrying struct arrays, so the plan is
    O(1) in the node count (inlining the node constants into an unrolled
    sum put the full erfc tree at every node — ~700 KB of expression)."""
    Q, NU = DE(q, None), DE(dof, None)
    nodes = F.array(*[
        F.struct(F.lit(x).alias("x"), F.lit(w).alias("w"))
        for x, w in zip(_GL_X, _GL_W)
    ])
    inner_nodes = F.array(*[
        F.struct(F.lit(z).alias("z"), F.lit(c).alias("c"), F.lit(s).alias("s"))
        for z, c, s in _TUKEY_INNER
    ])

    def outer(acc, el):
        r, wd = _tukey_outer_pieces(Q, NU, DE(el["x"], None), DE(el["w"], None))
        rc = r.c

        def inner(acc2, e2):
            return acc2 + _tukey_term(
                DE(rc, None), DE(e2["z"], None), DE(e2["c"], None),
                DE(e2["s"], None), k,
            ).c

        s_inner = F.aggregate(inner_nodes, F.lit(0.0), inner)
        return acc + (wd * DE(s_inner, None)).c

    total = F.aggregate(nodes, F.lit(0.0), outer)
    return _tukey_sf_finish(DE(total, None), k).c


def tukey_sf_sql(q: str, k: int, dof: str) -> str:
    """The identical double quadrature as DuckDB SQL text: nested
    list_reduce folds (the inner lambda closes over the outer element —
    supported and covered by tests), node constants carried as struct
    list literals. Same accumulator-type/prepend-init trick and
    sequential-field-order discipline as _betacf_sql."""
    Q, NU = DE(None, f"({q})"), DE(None, f"({dof})")
    zero = "CAST(0.0 AS DOUBLE)"
    outer_lits = ", ".join(
        f"{{'a': {zero}, 'x': {x!r}, 'w': {w!r}}}"
        for x, w in zip(_GL_X, _GL_W)
    )
    inner_lits = ", ".join(
        f"{{'b': {zero}, 'z': {z!r}, 'c': {c!r}, 's': {s!r}}}"
        for z, c, s in _TUKEY_INNER
    )
    r, wd = _tukey_outer_pieces(
        Q, NU, DE(None, "el.x"), DE(None, "el.w")
    )
    term = _tukey_term(
        DE(None, r.s), DE(None, "e2.z"), DE(None, "e2.c"), DE(None, "e2.s"), k
    )
    inner_fold = (
        f"struct_extract(list_reduce("
        f"list_prepend({{'b': {zero}, 'z': {zero}, 'c': {zero}, 's': {zero}}}, [{inner_lits}]), "
        f"(a2, e2) -> {{'b': (a2.b + {term.s}), 'z': {zero}, 'c': {zero}, 's': {zero}}}"
        f"), 'b')"
    )
    fold = (
        f"list_reduce("
        f"list_prepend({{'a': {zero}, 'x': {zero}, 'w': {zero}}}, [{outer_lits}]), "
        f"(acc, el) -> {{'a': (acc.a + ({wd.s} * {inner_fold})), 'x': {zero}, 'w': {zero}}}"
        f")"
    )
    total = f"struct_extract({fold}, 'a')"
    return _tukey_sf_finish(DE(None, total), k).s
