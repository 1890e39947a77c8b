"""Econometrics / causal-inference battery (round 7).

The estimators an analyst reaches for when the question is "does X
CAUSE Y" rather than "are X and Y associated": instrumental variables
(Wald/2SLS with the weak-instrument F diagnostic), regression
discontinuity (local-linear, placebo cutoff on TPC-H), a Simpson's-
paradox scan (pooled-vs-within slope reversal detector), and the
unit-root / whiteness tests (augmented-Dickey-Fuller lite, Ljung-Box)
that gate any time-series regression on the daily revenue series.

Cross-engine determinism (see plans/registry.py header): every moment
is an exact BIGINT in integer DOLLAR units; slopes, intercepts and
t-stats are fixed IEEE expression trees over those integers (products
of two BIGINT sums go through CAST(... AS DOUBLE) — (Σx)(Σy) overflows
int64 near sf1); multi-term double sums (Ljung-Box's Σ r_k²/m_k) are
quantized to integers BEFORE the sum so summation order can never
matter.  Decision flags compare the ROUNDED statistic to the literal
critical value on both sides, so both engines make the same boundary
call.

Estimator laws are pinned by planted-data tests (tests/test_econo.py):
IV recovers a planted effect that confounded OLS misses; RDD recovers
a planted jump; the paradox scan fires exactly on a constructed
Simpson reversal.

Reference scope: the reference's study notes cover aggregation and
window analytics over keyed streams (정리/2주차.md, 정리/3주차.md);
this module extends the same declarative surface to the causal /
diagnostic estimators a production analytics engine is asked for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from .registry import query


def _dd_duck(a: str, b: str) -> str:
    return f"date_diff('day', {a}, {b})"


def _dd_spark(a: str, b: str) -> str:
    return f"datediff({b}, {a})"


# --------------------------------------------------------------------------
# instrumental variables: Wald / 2SLS with weak-instrument diagnostic
# --------------------------------------------------------------------------
_IV_SQL = """
WITH g AS {MAT}(
  SELECT z, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM {base} GROUP BY z
),
w AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(sx) AS BIGINT) AS sx_t,
         CAST(sum(sy) AS BIGINT) AS sy_t,
         CAST(sum(sxy) AS BIGINT) AS sxy_t,
         max(CASE WHEN z = 1 THEN CAST(sy AS DOUBLE) / n END)
           - max(CASE WHEN z = 0 THEN CAST(sy AS DOUBLE) / n END) AS itt_y,
         max(CASE WHEN z = 1 THEN CAST(sx AS DOUBLE) / n END)
           - max(CASE WHEN z = 0 THEN CAST(sx AS DOUBLE) / n END) AS fstage,
         max(CASE WHEN z = 1 THEN n END) AS n1,
         max(CASE WHEN z = 0 THEN n END) AS n0,
         max(CASE WHEN z = 1 THEN sx END) AS sx1,
         max(CASE WHEN z = 0 THEN sx END) AS sx0
  FROM g
)
SELECT n,
       round(itt_y - 1e-9, 4) + 0.0 AS itt_y,
       round(fstage - 1e-9, 6) + 0.0 AS first_stage,
       -- x is binary so Σx² = Σx: pooled residual variance in closed form
       round(fstage * fstage
             / ((CAST(sx_t AS DOUBLE)
                 - CAST(sx1 AS DOUBLE) * sx1 / n1
                 - CAST(sx0 AS DOUBLE) * sx0 / n0) / (n - 2)
                * (1.0 / n1 + 1.0 / n0)) - 1e-9, 4) + 0.0
         AS first_stage_f,
       round(itt_y / fstage - 1e-9, 4) + 0.0 AS wald_iv,
       -- naive OLS y ~ x (x binary): difference of y-means by x
       round(CAST(sxy_t AS DOUBLE) / sx_t
             - CAST(sy_t - sxy_t AS DOUBLE) / (n - sx_t) - 1e-9, 4) + 0.0
         AS ols_naive
FROM w
"""

_IV_BASE = """
base AS {MAT}(
  SELECT CAST(o.o_orderkey % 2 AS BIGINT) AS z,
         CAST(d.x AS BIGINT) AS x,
         CAST(floor(o.o_totalprice) AS BIGINT) AS y
  FROM {orders} o
  JOIN (SELECT l_orderkey,
               max(CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END) AS x
        FROM {lineitem} GROUP BY l_orderkey) d
    ON d.l_orderkey = o.o_orderkey
)
"""


def _iv_full(mat: str, orders: str, lineitem: str) -> str:
    base = (
        _IV_BASE.replace("{MAT}", mat)
        .replace("{orders}", orders)
        .replace("{lineitem}", lineitem)
    )
    return (
        _IV_SQL.replace("WITH g AS", "WITH " + base.strip() + ",\ng AS")
        .replace("{base}", "base")
        .replace("{MAT}", mat)
    )


@query("iv_wald_2sls", _iv_full("MATERIALIZED ", "orders", "lineitem"))
def iv_wald_2sls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variables (Wald / just-identified 2SLS) estimate of
    the effect of deep discounting (any line ≥ 6%) on order revenue,
    "instrumented" by order-key parity — a deliberate PLACEBO
    instrument, so the first-stage F sits near zero and the Wald ratio
    explodes: the query is the weak-instrument diagnostic doing its
    job (report ``first_stage_f`` before believing ``wald_iv``).  The
    estimator itself is exact: with a binary instrument the 2SLS
    estimate is the Wald ratio ITT_y / first-stage, and every input is
    an exact BIGINT count or dollar sum.  ``ols_naive`` (difference of
    means by treatment) is the confounded benchmark.

    The planted-data law test (tests/test_econo.py) runs the same
    estimator via :func:`iv_wald_frame` on a frame where treatment is
    confounded but the instrument is clean — IV recovers the true
    effect, OLS visibly does not.

    Scale shape: one lineitem rollup, one fact join, then a 2-row
    group frame; estimation cost is O(1)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("iv_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "iv_lineitem"
    )
    return spark.sql(_iv_full("", "iv_orders", "iv_lineitem"))


def iv_wald_frame(base: DataFrame) -> DataFrame:
    """Wald/2SLS over any (z, x, y) integer frame — factored out so
    tests can plant a confounder; see :func:`iv_wald_2sls`."""
    base.createOrReplaceTempView("iv_base_frame")
    return base.sparkSession.sql(
        _IV_SQL.replace("{base}", "iv_base_frame").replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# regression discontinuity: placebo cutoff on order value
# --------------------------------------------------------------------------
RDD_CUTOFF = 200_000
RDD_BW = 50_000

_RDD_SQL = """
WITH side AS {MAT}(
  SELECT CASE WHEN r >= 0 THEN 1 ELSE 0 END AS s,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r) AS BIGINT) AS sr,
         CAST(sum(r * r) AS BIGINT) AS srr,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(r * y) AS BIGINT) AS sry
  FROM {base} GROUP BY 1
),
fit AS {MAT}(
  -- local-linear fit per side; intercept = limit of E[y|r] at the cutoff
  SELECT s, n,
         (CAST(sy AS DOUBLE) * srr - CAST(sr AS DOUBLE) * sry)
           / (CAST(n AS DOUBLE) * srr - CAST(sr AS DOUBLE) * sr)
           AS intercept,
         (CAST(n AS DOUBLE) * sry - CAST(sr AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * srr - CAST(sr AS DOUBLE) * sr)
           AS slope
  FROM side
)
SELECT max(CASE WHEN s = 0 THEN n END) AS n_left,
       max(CASE WHEN s = 1 THEN n END) AS n_right,
       round(max(CASE WHEN s = 0 THEN intercept END) - 1e-9, 4) + 0.0
         AS y_at_cutoff_left,
       round(max(CASE WHEN s = 1 THEN intercept END) - 1e-9, 4) + 0.0
         AS y_at_cutoff_right,
       round(max(CASE WHEN s = 1 THEN intercept END)
             - max(CASE WHEN s = 0 THEN intercept END) - 1e-9, 4) + 0.0
         AS rd_effect,
       round(max(CASE WHEN s = 0 THEN slope END) * 10000 - 1e-9, 4) + 0.0
         AS slope_left_per_10k,
       round(max(CASE WHEN s = 1 THEN slope END) * 10000 - 1e-9, 4) + 0.0
         AS slope_right_per_10k
FROM fit
"""

_RDD_BASE = f"""
base AS {{MAT}}(
  SELECT CAST(floor(o.o_totalprice) AS BIGINT) - {RDD_CUTOFF} AS r,
         CAST({{DD}} AS BIGINT) AS y
  FROM {{orders}} o
  JOIN (SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
        FROM {{lineitem}} GROUP BY l_orderkey) f
    ON f.l_orderkey = o.o_orderkey
  WHERE o.o_totalprice >= {RDD_CUTOFF - RDD_BW}
    AND o.o_totalprice < {RDD_CUTOFF + RDD_BW}
)
"""


def _rdd_full(mat: str, orders: str, lineitem: str, dd: str) -> str:
    base = (
        _RDD_BASE.replace("{MAT}", mat)
        .replace("{orders}", orders)
        .replace("{lineitem}", lineitem)
        .replace("{DD}", dd)
    )
    return (
        _RDD_SQL.replace("WITH side AS", "WITH " + base.strip() + ",\nside AS")
        .replace("{base}", "base")
        .replace("{MAT}", mat)
    )


@query(
    "regression_discontinuity",
    _rdd_full(
        "MATERIALIZED ",
        "orders",
        "lineitem",
        _dd_duck("CAST(o.o_orderdate AS DATE)", "f.first_ship"),
    ),
)
def regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity at a $200k order-value cutoff:
    do orders just above the line ship faster than orders just below?
    Local-linear fits on each side of the (placebo) cutoff within a
    $50k bandwidth; ``rd_effect`` is the jump in the two intercepts at
    r = 0.  TPC-H has no real discontinuity, so this doubles as the
    standard FALSIFICATION check — the honest estimate is ≈ 0 — while
    the planted-jump law test (tests/test_econo.py, via
    :func:`rdd_frame`) proves the estimator recovers a real one.

    Determinism: centered running variable and outcome are exact
    BIGINT (dollars / days); each side's 2×2 normal equations solve by
    Cramer with (Σr)² and n·Σr² pushed through DOUBLE (the BIGINT
    product overflows near sf1).  Scale shape: bandwidth filter pushes
    to the scan, one rollup join, then a 2-row side frame."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rdd_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "rdd_lineitem"
    )
    return spark.sql(
        _rdd_full(
            "",
            "rdd_orders",
            "rdd_lineitem",
            _dd_spark("CAST(o.o_orderdate AS DATE)", "f.first_ship"),
        )
    )


def rdd_frame(base: DataFrame) -> DataFrame:
    """Local-linear RD over any (r, y) integer frame — factored out so
    tests can plant a jump; see :func:`regression_discontinuity`."""
    base.createOrReplaceTempView("rdd_base_frame")
    return base.sparkSession.sql(
        _RDD_SQL.replace("{base}", "rdd_base_frame").replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# Simpson's paradox scan: pooled vs within-group slope reversal
# --------------------------------------------------------------------------
_SIMPSON_SQL = """
WITH g AS {MAT}(
  SELECT grp, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM {base} GROUP BY grp
),
slopes AS {MAT}(
  SELECT grp, n,
         round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               - 1e-9, 6) + 0.0 AS slope_within
  FROM g
),
pooled AS {MAT}(
  SELECT round((CAST(sum(n) AS DOUBLE) * sum(sxy)
                - CAST(sum(sx) AS DOUBLE) * sum(sy))
               / (CAST(sum(n) AS DOUBLE) * sum(sxx)
                  - CAST(sum(sx) AS DOUBLE) * sum(sx))
               - 1e-9, 6) + 0.0 AS slope_pooled
  FROM g
),
flag AS (
  SELECT CASE WHEN (SELECT min(sign(slope_within)) FROM slopes)
                 = (SELECT max(sign(slope_within)) FROM slopes)
              AND (SELECT max(sign(slope_within)) FROM slopes)
                 <> (SELECT sign(slope_pooled) FROM pooled)
              AND (SELECT sign(slope_pooled) FROM pooled) <> 0
         THEN 1 ELSE 0 END AS paradox
)
SELECT s.grp, s.n, s.slope_within,
       p.slope_pooled,
       CAST(f.paradox AS BIGINT) AS simpson_flag
FROM slopes s CROSS JOIN pooled p CROSS JOIN flag f
ORDER BY s.grp
"""

_SIMPSON_BASE = """
base AS {MAT}(
  SELECT l_returnflag AS grp,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM {lineitem}
)
"""


def _simpson_full(mat: str, lineitem: str) -> str:
    base = _SIMPSON_BASE.replace("{MAT}", mat).replace(
        "{lineitem}", lineitem
    )
    return (
        _SIMPSON_SQL.replace("WITH g AS", "WITH " + base.strip() + ",\ng AS")
        .replace("{base}", "base")
        .replace("{MAT}", mat)
    )


@query("simpsons_paradox_scan", _simpson_full("MATERIALIZED ", "lineitem"))
def simpsons_paradox_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox detector: within every return-flag class, regress line
    revenue on quantity; flag the textbook reversal where ALL within-
    group slopes share one sign while the pooled slope takes the
    other.  On TPC-H revenue ∝ quantity everywhere so the flag is 0 —
    the planted test (tests/test_econo.py via :func:`simpson_frame`)
    constructs a genuine reversal and pins flag = 1, slopes' signs and
    values.

    Determinism: per-group second moments are exact BIGINT (quantity ≤
    50, dollars ≤ 10^5 keep Σx·y under 2^63 through sf10); sums of
    group moments stay BIGINT; only the final Cramer ratios are IEEE,
    and the sign comparison runs on 6-dp-rounded slopes so both
    engines make the same call.  Scale shape: one scan, one 7-row
    group frame — the paradox test itself is O(groups)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "simpson_lineitem"
    )
    return spark.sql(_simpson_full("", "simpson_lineitem"))


def simpson_frame(base: DataFrame) -> DataFrame:
    """Paradox scan over any (grp, x, y) integer frame — factored out
    for the planted-reversal test; see :func:`simpsons_paradox_scan`."""
    base.createOrReplaceTempView("simpson_base_frame")
    return base.sparkSession.sql(
        _SIMPSON_SQL.replace("{base}", "simpson_base_frame").replace(
            "{MAT}", ""
        )
    )


# --------------------------------------------------------------------------
# augmented-Dickey-Fuller (lag-0 form): unit root in daily revenue?
# --------------------------------------------------------------------------
_ADF_SQL = """
WITH days AS (
  SELECT {DD} AS t,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
  FROM {orders} GROUP BY 1
),
lagged AS (
  SELECT y - yl AS dy, yl
  FROM (SELECT y, lag(y) OVER (ORDER BY t) AS yl FROM days)
  WHERE yl IS NOT NULL
),
m AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(yl) AS BIGINT) AS sl,
         CAST(sum(yl * yl) AS BIGINT) AS sll,
         CAST(sum(dy) AS BIGINT) AS sd,
         CAST(sum(yl * dy) AS BIGINT) AS sld,
         CAST(sum(dy * dy) AS BIGINT) AS sdd
  FROM lagged
),
fit AS {MAT}(
  SELECT n,
         (CAST(n AS DOUBLE) * sld - CAST(sl AS DOUBLE) * sd)
           / (CAST(n AS DOUBLE) * sll - CAST(sl AS DOUBLE) * sl) AS phi,
         CAST(sl AS DOUBLE) AS sl_d, CAST(sd AS DOUBLE) AS sd_d,
         CAST(sll AS DOUBLE) AS sll_d, CAST(sld AS DOUBLE) AS sld_d,
         CAST(sdd AS DOUBLE) AS sdd_d
  FROM m
),
stat AS {MAT}(
  SELECT n, phi,
         phi / sqrt((sdd_d - (sd_d - phi * sl_d) / n * sd_d - phi * sld_d)
                    / (n - 2) / (sll_d - sl_d * sl_d / n)) AS t_stat
  FROM fit
)
SELECT n AS n_days,
       round(phi - 1e-9, 6) + 0.0 AS phi,
       round(t_stat - 1e-9, 4) + 0.0 AS adf_t,
       CASE WHEN round(t_stat - 1e-9, 4) < -2.86 THEN CAST(1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS reject_unit_root_5pct
FROM stat
"""


@query(
    "adf_unit_root",
    _ADF_SQL.replace("{orders}", "orders")
    .replace(
        "{DD}",
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
    )
    .replace("{MAT}", "MATERIALIZED "),
)
def adf_unit_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test (lag-0 augmented form) on daily
    revenue: regress Δy_t on (1, y_{t−1}) and report the t-statistic
    of φ against the 5% Dickey-Fuller critical value −2.86 — the gate
    every revenue-trend regression should pass before trusting its
    standard errors.  Daily TPC-H revenue is mean-reverting around a
    stable level, so the test rejects the unit root (flag 1); the
    random-walk law test (tests/test_econo.py) feeds a planted
    cumulative-sum series through the same SQL and pins flag 0 with
    φ ≈ 0.

    Determinism: all five regression moments are exact BIGINT in
    integer dollars (Σy² ≈ 2.4e17 at sf10 — under 2^63); φ, SSE (via
    the normal-equation identity SSE = Σdy² − αΣdy − φΣy·dy) and the
    t-stat are fixed IEEE trees; the reject flag compares the ROUNDED
    t on both sides.  Scale shape: one fact rollup, one lag window on
    the O(days) frame, O(1) estimation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "adf_orders"
    )
    return spark.sql(
        _ADF_SQL.replace("{orders}", "adf_orders")
        .replace(
            "{DD}",
            "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')",
        )
        .replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# Ljung-Box portmanteau whiteness test on daily revenue changes
# --------------------------------------------------------------------------
LB_MAX_LAG = 7

_LB_SQL = f"""
WITH days AS {{MAT}}(
  SELECT {{DD}} AS t,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
  FROM {{orders}} GROUP BY 1
),
series AS {{MAT}}(
  SELECT t, y - yl AS v
  FROM (SELECT t, y, lag(y) OVER (ORDER BY t) AS yl FROM days)
  WHERE yl IS NOT NULL
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(v * v) AS BIGINT) AS svv
  FROM series
),
lags AS (
  SELECT CAST(k AS BIGINT) AS k FROM {{LAGTAB}}
),
pairs AS {{MAT}}(
  -- calendar-lag pairs: gaps in the day index simply drop out, so the
  -- per-lag pair count m_k is carried explicitly instead of n - k
  SELECT l.k,
         CAST(count(*) AS BIGINT) AS m_k,
         CAST(sum(a.v * b.v) AS BIGINT) AS sab,
         CAST(sum(a.v) AS BIGINT) AS sa,
         CAST(sum(b.v) AS BIGINT) AS sb
  FROM series a JOIN lags l ON 1 = 1
  JOIN series b ON b.t = a.t + l.k
  GROUP BY l.k
),
rk AS {{MAT}}(
  SELECT p.k, p.m_k,
         (CAST(p.sab AS DOUBLE)
          - CAST(tot.sv AS DOUBLE) / tot.n * (p.sa + p.sb)
          + p.m_k * (CAST(tot.sv AS DOUBLE) / tot.n)
                  * (CAST(tot.sv AS DOUBLE) / tot.n))
         / (CAST(tot.svv AS DOUBLE)
            - CAST(tot.sv AS DOUBLE) * tot.sv / tot.n) AS r_k,
         tot.n AS n
  FROM pairs p CROSS JOIN tot
),
terms AS {{MAT}}(
  -- quantize each r_k²/m_k term to 1e-12 BEFORE summing: the Q sum
  -- becomes an exact integer total, immune to summation order
  SELECT k, m_k, n, r_k,
         CAST(floor(r_k * r_k / m_k * 1e12 + 0.5) AS BIGINT) AS q_term
  FROM rk
),
q AS (
  SELECT max(n) AS n,
         CAST(max(n) AS DOUBLE) * (max(n) + 2)
           * (CAST(sum(q_term) AS BIGINT) / 1e12) AS q_stat
  FROM terms
)
SELECT t.k AS lag, t.m_k AS n_pairs,
       round(t.r_k - 1e-9, 4) + 0.0 AS acf,
       q.n AS n_obs,
       round(q.q_stat - 1e-9, 4) + 0.0 AS ljung_box_q,
       CASE WHEN round(q.q_stat - 1e-9, 4) > 14.067
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         AS reject_whiteness_5pct
FROM terms t CROSS JOIN q
ORDER BY t.k
"""


def _lb_sql(orders: str, dd: str, lagtab: str, mat: str) -> str:
    return (
        _LB_SQL.replace("{orders}", orders)
        .replace("{DD}", dd)
        .replace("{LAGTAB}", lagtab)
        .replace("{MAT}", mat)
    )


@query(
    "ljung_box_whiteness",
    _lb_sql(
        "orders",
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
        f"(SELECT unnest(range(1, {LB_MAX_LAG + 1})) AS k)",
        "MATERIALIZED ",
    ),
)
def ljung_box_whiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test: are daily revenue CHANGES white
    noise through lag 7?  Q = n(n+2)·Σ r_k²/m_k against the χ²₇ 5%
    critical value 14.067 — the residual-whiteness gate for any daily
    forecast model.  Autocorrelations use calendar lags (the b.t =
    a.t + k equi-join — the same gap-tolerant mechanics as
    ``acf_hourly_events``) with explicit per-lag pair counts m_k in
    place of n − k.

    Determinism: lag cross-products Σv_t·v_{t+k} are exact BIGINT in
    integer dollars; each r_k is a fixed IEEE tree over those
    integers; and each Q term is quantized to 1e-12 BEFORE the 7-term
    sum, so Q is computed from an exact integer total in both engines.
    Scale shape: one fact rollup to O(days), a 7× lag fanout on that
    small frame, O(1) statistics."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "lb_orders"
    )
    return spark.sql(
        _lb_sql(
            "lb_orders",
            "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')",
            f"(SELECT explode(sequence(1, {LB_MAX_LAG})) AS k)",
            "",
        )
    )


# --------------------------------------------------------------------------
# Engle-Granger cointegration: daily order count vs daily revenue
# --------------------------------------------------------------------------
_EG_SQL = """
WITH days AS {MAT}(
  SELECT {DD} AS t,
         CAST(count(*) AS BIGINT) AS x,
         CAST(sum(CAST(floor(o_totalprice / 1000) AS BIGINT)) AS BIGINT)
           AS y
  FROM {orders} GROUP BY 1
),
m1 AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM days
),
beta AS {MAT}(
  -- slope from EXACT integer dets (n*sxy - sx*sy fits int64 in these
  -- units through sf10): both engines divide the same two integers
  SELECT n, sx, sy,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b
  FROM m1
),
resid AS {MAT}(
  -- centered residual, quantized to exact ints for the ADF moments
  SELECT d.t,
         CAST(floor(((d.y - CAST(b.sy AS DOUBLE) / b.n)
                     - b.b * (d.x - CAST(b.sx AS DOUBLE) / b.n)) * 100
                    + 0.5) AS BIGINT) AS r
  FROM days d CROSS JOIN beta b
),
lagged AS (
  SELECT r - rl AS dr, rl
  FROM (SELECT r, lag(r) OVER (ORDER BY t) AS rl FROM resid)
  WHERE rl IS NOT NULL
),
m2 AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rl) AS BIGINT) AS sl,
         CAST(sum(rl * rl) AS BIGINT) AS sll,
         CAST(sum(dr) AS BIGINT) AS sd,
         CAST(sum(rl * dr) AS BIGINT) AS sld,
         CAST(sum(dr * dr) AS BIGINT) AS sdd
  FROM lagged
),
fit AS {MAT}(
  SELECT n,
         (CAST(n AS DOUBLE) * sld - CAST(sl AS DOUBLE) * sd)
           / (CAST(n AS DOUBLE) * sll - CAST(sl AS DOUBLE) * sl) AS phi,
         CAST(sl AS DOUBLE) AS sl_d, CAST(sd AS DOUBLE) AS sd_d,
         CAST(sll AS DOUBLE) AS sll_d, CAST(sld AS DOUBLE) AS sld_d,
         CAST(sdd AS DOUBLE) AS sdd_d
  FROM m2
),
stat AS {MAT}(
  SELECT n, phi,
         phi / sqrt((sdd_d - (sd_d - phi * sl_d) / n * sd_d
                     - phi * sld_d)
                    / (n - 2) / (sll_d - sl_d * sl_d / n)) AS t_stat
  FROM fit
)
SELECT b.n AS n_days,
       round(b.b - 1e-9, 6) + 0.0 AS beta_long_run,
       round(s.phi - 1e-9, 6) + 0.0 AS resid_phi,
       round(s.t_stat - 1e-9, 4) + 0.0 AS eg_adf_t,
       CASE WHEN round(s.t_stat - 1e-9, 4) < -3.34 THEN CAST(1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS cointegrated_5pct
FROM beta b CROSS JOIN stat s
"""


@query(
    "engle_granger_cointegration",
    _EG_SQL.replace("{orders}", "orders")
    .replace(
        "{DD}",
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
    )
    .replace("{MAT}", "MATERIALIZED "),
)
def engle_granger_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger two-step cointegration test between daily order
    count and daily revenue (k$): fit the long-run relation
    y = α + βx by OLS, then Dickey-Fuller the residual — if the
    residual is stationary (t < −3.34, the EG 5% critical value with
    an estimated β), the two series share a common stochastic trend
    and an error-correction model is warranted; regressing levels on
    levels WITHOUT this check is the classic spurious-regression trap.

    Determinism: β comes from EXACT int64 determinants (x is a count,
    y in integer k$ — n·Σxy − ΣxΣy stays inside int64 through sf10, so
    no FMA/float wobble can touch the slope — the ``bass_diffusion``
    lesson applied one degree down); residuals quantize to exact
    centi-units before the ADF moments, which are then all-BIGINT; the
    verdict compares the ROUNDED t-stat.  On TPC-H both series are
    driven by the same order flow, so they cointegrate (flag 1);
    tests/test_econo.py also runs two INDEPENDENT planted random walks
    through the same machinery and pins flag 0.

    Scale shape: one fact rollup to O(days), two O(days) passes with
    one lag window, O(1) estimation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "eg_orders"
    )
    return spark.sql(
        _EG_SQL.replace("{orders}", "eg_orders")
        .replace(
            "{DD}",
            "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')",
        )
        .replace("{MAT}", "")
    )


def engle_granger_frame(days: DataFrame) -> DataFrame:
    """EG test over any (t, x, y) integer frame — factored out so
    tests can plant independent walks; see
    :func:`engle_granger_cointegration`."""
    days.createOrReplaceTempView("eg_days_frame")
    sql = _EG_SQL.replace("{MAT}", "")
    head = sql.index("m1 AS")
    return days.sparkSession.sql(
        "WITH " + sql[head:].replace("FROM days", "FROM eg_days_frame")
    )
