"""Nonparametric and homogeneity-of-variance test battery.

Round-7 analytics wave: the classical significance tests an analyst
runs BEFORE trusting a segment comparison — rank tests that don't
assume normality (Kruskal-Wallis, Friedman, Cliff's delta), paired /
stratified categorical tests (McNemar, Cochran-Mantel-Haenszel), and
the variance-homogeneity gates for ANOVA (Brown-Forsythe, Bartlett).

Cross-engine determinism rules used throughout (see plans/registry.py
header):
- every rank is the AVERAGE rank via ``rank() + (ties-1)/2`` on exact
  integer keys (cents/dollars/char counts) — halves are exact doubles,
  so rank SUMS are exact and order-insensitive;
- second moments use integer DOLLAR units (Σv² in cents passes 2^63
  near 1M fact rows — the round-6 overflow lesson), and squares of
  >2^31 sums go through CAST(x AS DOUBLE) first ((Σv)² in BIGINT
  overflows even in dollars);
- the few cross-group double sums (≤ 20 terms) are absorbed by the
  ``round(x - 1e-9, k) + 0.0`` output convention.

Both engines run the SAME SQL text modulo dialect slots (integer
division, date difference), formatted per engine — the comparison is
between Spark's and DuckDB's execution of one algebra, not two
hand-kept implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources import load_table
from .registry import query

# dialect slots: {IDIV} infix integer division, {DD} day difference
_SPARK = {"IDIV": "DIV", "DD": "datediff({b}, {a})"}
_DUCK = {"IDIV": "//", "DD": "date_diff('day', {a}, {b})"}


def _render(template: str, dialect: dict) -> str:
    out = template.replace("{IDIV}", dialect["IDIV"])
    while "{DD:" in out:
        pre, rest = out.split("{DD:", 1)
        args, post = rest.split("}", 1)
        a, b = args.split("|")
        out = pre + dialect["DD"].format(a=a, b=b) + post
    return out


# --------------------------------------------------------------------------
# Kruskal-Wallis H: order value across the 5 order priorities
# --------------------------------------------------------------------------
_KW_SQL = """
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM {orders}
),
r AS (
  SELECT grp,
         rank() OVER (ORDER BY v)
           + (count(*) OVER (PARTITION BY v) - 1) / CAST(2 AS DOUBLE)
           AS ar
  FROM o
),
g AS {MAT}(
  SELECT grp, CAST(count(*) AS BIGINT) AS n_g, sum(ar) AS s_g
  FROM r GROUP BY grp
),
ties AS (
  SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tsum
  FROM (SELECT count(*) AS t FROM o GROUP BY v)
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n,
         sum(s_g * s_g / n_g) AS srn
  FROM g
),
stat AS {MAT}(
  SELECT tot.n,
         (CAST(12 AS DOUBLE) / (tot.n * (tot.n + CAST(1 AS DOUBLE)))
            * tot.srn
          - CAST(3 AS DOUBLE) * (tot.n + 1)) AS h_raw,
         (CAST(1 AS DOUBLE)
          - ties.tsum / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n))
           AS corr
  FROM tot, ties
)
SELECT g.grp AS o_orderpriority, g.n_g AS n,
       round(g.s_g / g.n_g - 1e-9, 4) + 0.0 AS mean_rank,
       round(stat.h_raw - 1e-9, 4) + 0.0 AS h,
       round(stat.h_raw / stat.corr - 1e-9, 4) + 0.0 AS h_tie_corrected,
       CAST(4 AS BIGINT) AS df
FROM g CROSS JOIN stat
ORDER BY o_orderpriority
"""


@query(
    "kruskal_wallis_priority",
    _render(_KW_SQL, _DUCK).replace("{orders}", "orders").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def kruskal_wallis_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does order value differ across the five
    order priorities? — the rank-based one-way ANOVA that needs no
    normality assumption, with the standard tie correction
    ``1 − Σ(t³−t)/(N³−N)``.

    Scale shape: ONE global sort assigns average ranks (the same sort
    a percentile needs); everything after is a 5-row group frame.
    Rank sums are exact (average ranks are halves, Σ < 2^53); the tie
    term sums exact small integers; N³ goes through DOUBLE (N³ in
    BIGINT overflows past N ≈ 2M).  Both engines run the same SQL
    text modulo dialect slots."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("kw_orders")
    return spark.sql(
        _render(_KW_SQL, _SPARK)
        .replace("{orders}", "kw_orders")
        .replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# McNemar: do the two document-quality heuristics disagree symmetrically?
# --------------------------------------------------------------------------
MCN_LEN = 500
MCN_SPACE_PCT_X100 = 1200

_MCN_SQL = f"""
WITH flags AS (
  SELECT lang,
         CASE WHEN n_chars >= {MCN_LEN} THEN 1 ELSE 0 END AS a,
         CASE WHEN 10000 * (length(text) - length(replace(text, ' ', '')))
                   < {MCN_SPACE_PCT_X100} * length(text)
              THEN 1 ELSE 0 END AS b
  FROM documents
),
cm AS {{MAT}}(
  SELECT lang,
         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         CAST(count(*) AS BIGINT) AS n
  FROM flags GROUP BY lang
)
SELECT lang, n, n10, n01,
       round((n10 - n01) * CAST(n10 - n01 AS DOUBLE)
             / nullif(n10 + n01, 0) - 1e-9, 4) + 0.0 AS mcnemar_chi2,
       round(greatest(abs(n10 - n01) - 1, 0)
             * CAST(greatest(abs(n10 - n01) - 1, 0) AS DOUBLE)
             / nullif(n10 + n01, 0) - 1e-9, 4) + 0.0 AS mcnemar_cc
FROM cm ORDER BY lang
"""


@query(
    "mcnemar_doc_heuristics",
    _MCN_SQL.replace("{MAT}", "MATERIALIZED "),
)
def mcnemar_doc_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test per language on the SAME two document heuristics
    ``cohens_kappa_heuristics`` scores for agreement: kappa asks "do
    the raters agree?", McNemar asks the complementary question — "when
    they disagree, is the disagreement SYMMETRIC?" (a one-sided
    disagreement means one heuristic is systematically stricter, which
    calibrating a labeling pipeline must know).  χ² = (b−c)²/(b+c) on
    the discordant counts, plus the Edwards continuity correction
    (clamped at 0 for b = c).

    One scan, one tiny groupBy; every input an exact integer — the
    space-ratio boundary is decided by integer cross-multiplication.
    NULL (not ∞) when there are no discordant pairs."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("mcn_documents")
    return spark.sql(
        _MCN_SQL.replace("documents", "mcn_documents").replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# Cochran-Mantel-Haenszel across source strata
# --------------------------------------------------------------------------
_CMH_SQL = f"""
WITH flags AS (
  SELECT source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS x,
         CASE WHEN n_chars >= {MCN_LEN} THEN 1 ELSE 0 END AS y
  FROM documents
),
strata AS {{MAT}}(
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS r1,
         CAST(sum(y) AS BIGINT) AS c1,
         CAST(sum(x * y) AS BIGINT) AS a
  FROM flags GROUP BY source
),
terms AS (
  SELECT source, n, r1, c1, a,
         a - CAST(r1 AS DOUBLE) * c1 / n AS dev,
         CAST(r1 AS DOUBLE) * (n - r1) * c1 * (n - c1)
           / (CAST(n AS DOUBLE) * n * (n - 1)) AS v,
         CAST(a AS DOUBLE) * ((n - r1) - (c1 - a)) / n AS rr,
         CAST(r1 - a AS DOUBLE) * (c1 - a) / n AS ss
  FROM strata WHERE n > 1
),
agg AS {{MAT}}(
  SELECT CAST(count(*) AS BIGINT) AS k_strata,
         sum(dev) AS sdev, sum(v) AS sv,
         sum(rr) AS srr, sum(ss) AS sss
  FROM terms
)
SELECT k_strata,
       round(sdev * sdev / sv - 1e-9, 4) + 0.0 AS cmh_chi2,
       round((abs(sdev) - 0.5) * (abs(sdev) - 0.5) / sv - 1e-9, 4) + 0.0
         AS cmh_chi2_cc,
       round(srr / sss - 1e-9, 4) + 0.0 AS mh_common_odds_ratio
FROM agg
"""


@query("cmh_lang_length", _CMH_SQL.replace("{MAT}", "MATERIALIZED "))
def cmh_lang_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel test: is English associated with long
    documents AFTER controlling for source? — the stratified 2×2 test
    that kills Simpson's-paradox false positives (a marginal χ² sees
    source mix, not the within-source effect), plus the Mantel-Haenszel
    common odds ratio ΣR/ΣS.  The continuity-corrected form subtracts
    0.5 from |Σ(a − E)|.

    One scan, one 20-row stratum frame; every per-stratum term is a
    rational of exact counts computed through DOUBLE (the 4-count
    product overflows BIGINT past ~50k-doc strata); the two final
    20-term sums are guarded by the rounding convention."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("cmh_documents")
    return spark.sql(
        _CMH_SQL.replace("documents", "cmh_documents").replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) across order priorities
# --------------------------------------------------------------------------
_BF_SQL = """
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(floor(o_totalprice) AS BIGINT) AS v
  FROM {orders}
),
m AS (
  SELECT grp, v,
         row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY grp) AS n_g
  FROM o
),
med AS {MAT}(
  SELECT grp, v AS med FROM m WHERE rn = (n_g + 1) {IDIV} 2
),
z AS (
  SELECT o.grp, abs(o.v - med.med) AS z
  FROM o JOIN med ON med.grp = o.grp
),
g AS {MAT}(
  SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(z) AS BIGINT) AS sz,
         CAST(sum(z * z) AS BIGINT) AS szz
  FROM z GROUP BY grp
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(sz) AS BIGINT) AS sz_all,
         CAST(count(*) AS BIGINT) AS k
  FROM g
),
stat AS {MAT}(
  SELECT tot.n, tot.k,
         sum(g.n_g * (g.sz / CAST(g.n_g AS DOUBLE)
                      - CAST(tot.sz_all AS DOUBLE) / tot.n)
                   * (g.sz / CAST(g.n_g AS DOUBLE)
                      - CAST(tot.sz_all AS DOUBLE) / tot.n)) AS ssb,
         sum(g.szz - CAST(g.sz AS DOUBLE) * g.sz / g.n_g) AS ssw
  FROM g CROSS JOIN tot
  GROUP BY tot.n, tot.k
)
SELECT g.grp AS o_orderpriority, g.n_g AS n, med.med AS median_usd,
       round(g.sz / CAST(g.n_g AS DOUBLE) - 1e-9, 4) + 0.0
         AS mean_abs_dev_usd,
       round((stat.n - stat.k) * stat.ssb
             / ((stat.k - 1) * stat.ssw) - 1e-9, 4) + 0.0
         AS brown_forsythe_w,
       stat.k - 1 AS df1, stat.n - stat.k AS df2
FROM g JOIN med ON med.grp = g.grp CROSS JOIN stat
ORDER BY o_orderpriority
"""


@query(
    "brown_forsythe_priority",
    _render(_BF_SQL, _DUCK).replace("{orders}", "orders").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def brown_forsythe_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (the median-based Levene): are order-value
    SPREADS equal across the five priorities? — the robust
    variance-homogeneity gate run before trusting any ANOVA, using
    absolute deviations from the group MEDIAN (mean-based Levene
    inflates under skew; order values are very skewed).

    Determinism: the group median is the LOWER median — the element at
    row_number (n+1) div 2 under an integer ORDER BY — so it is an
    exact integer dollar value in both engines (percentile_cont
    interpolation differs cross-engine; a positional pick cannot).
    z = |v − med| is then an exact integer, the W statistic a rational
    of exact BIGINT moments (dollar units: Σz² in cents would pass
    2^63 near 1M rows).  Two shuffles on the fact frame (median rank,
    then the z rollup); the stat frame is 5 rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("bf_orders")
    return spark.sql(
        _render(_BF_SQL, _SPARK)
        .replace("{orders}", "bf_orders")
        .replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# Cliff's delta: document length, English vs German
# --------------------------------------------------------------------------
_CLIFF_SQL = """
WITH xx AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cx
  FROM documents WHERE lang = 'en' GROUP BY 1
),
yy AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cy
  FROM documents WHERE lang = 'de' GROUP BY 1
),
vals AS {MAT}(
  SELECT coalesce(xx.v, yy.v) AS v,
         coalesce(cx, 0) AS cx, coalesce(cy, 0) AS cy
  FROM xx FULL OUTER JOIN yy ON yy.v = xx.v
),
cum AS (
  SELECT v, cx, cy,
         coalesce(sum(cy) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS y_below,
         sum(cy) OVER () AS ny,
         sum(cx) OVER () AS nx
  FROM vals
),
agg AS {MAT}(
  SELECT CAST(max(nx) AS BIGINT) AS n_en,
         CAST(max(ny) AS BIGINT) AS n_de,
         CAST(sum(cx * y_below) AS BIGINT) AS n_gt,
         CAST(sum(cx * (ny - y_below - cy)) AS BIGINT) AS n_lt,
         CAST(sum(cx * cy) AS BIGINT) AS n_eq
  FROM cum
)
SELECT n_en, n_de, n_gt, n_lt, n_eq,
       round((n_gt - n_lt) / (CAST(n_en AS DOUBLE) * n_de) - 1e-9, 4)
         + 0.0 AS cliffs_delta
FROM agg
"""


@query("cliffs_delta_doclen", _CLIFF_SQL.replace("{MAT}", "MATERIALIZED "))
def cliffs_delta_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta for English vs German document lengths — the
    ordinal effect size behind the rank tests: P(X > Y) − P(X < Y),
    readable where a p-value is not (|δ| ≈ 0.15 small / 0.33 medium /
    0.47 large).

    Scale shape — the point: the naive form is an n×m pair count.
    This computes it EXACTLY from the merged value histogram: group
    both sides by value (one shuffle each), full-join the histograms,
    and one cumulative window turns "pairs where x > y" into
    Σ cx·(#y below) — cost is O(distinct values), never O(pairs).
    All counts exact BIGINTs (products < 2^63 through corpus sizes
    of ~10^9 per side)."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("cliff_documents")
    return spark.sql(
        _CLIFF_SQL.replace("documents", "cliff_documents").replace(
            "{MAT}", ""
        )
    )


# --------------------------------------------------------------------------
# Friedman test: weekday effect on daily revenue, blocked by week
# --------------------------------------------------------------------------
_FRIED_SQL = """
WITH days AS (
  SELECT CAST(o_orderdate AS DATE) AS dd,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM {orders} GROUP BY 1
),
keyed AS (
  SELECT {DD:DATE '1992-01-06'|dd} {IDIV} 7 AS wk,
         {DD:DATE '1992-01-06'|dd} % 7 AS wd,
         cents
  FROM days
  WHERE {DD:DATE '1992-01-06'|dd} >= 0
),
full_weeks AS {MAT}(
  SELECT wk FROM keyed GROUP BY wk HAVING count(*) = 7
),
ranked AS (
  SELECT k.wk, k.wd,
         rank() OVER (PARTITION BY k.wk ORDER BY k.cents)
           + (count(*) OVER (PARTITION BY k.wk, k.cents) - 1)
             / CAST(2 AS DOUBLE) AS ar
  FROM keyed k JOIN full_weeks f ON f.wk = k.wk
),
rj AS {MAT}(
  SELECT wd, sum(ar) AS r_j, CAST(count(*) AS BIGINT) AS b
  FROM ranked GROUP BY wd
),
stat AS {MAT}(
  SELECT CAST(max(b) AS BIGINT) AS n_weeks,
         CAST(12 AS DOUBLE) / (max(b) * 7 * CAST(8 AS DOUBLE))
           * sum(r_j * r_j)
         - CAST(3 AS DOUBLE) * max(b) * 8 AS chi2_f
  FROM rj
)
SELECT rj.wd AS weekday_idx, rj.b AS n_weeks,
       round(rj.r_j - 1e-9, 4) + 0.0 AS rank_sum,
       round(rj.r_j / rj.b - 1e-9, 4) + 0.0 AS mean_rank,
       round(stat.chi2_f - 1e-9, 4) + 0.0 AS friedman_chi2,
       CAST(6 AS BIGINT) AS df
FROM rj CROSS JOIN stat
ORDER BY weekday_idx
"""


@query(
    "friedman_weekday_revenue",
    _render(_FRIED_SQL, _DUCK).replace("{orders}", "orders").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def friedman_weekday_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: does the day-of-week change daily revenue, with
    each calendar week as its own block? — the repeated-measures rank
    ANOVA that removes week-to-week level shifts (holiday seasons,
    growth) a pooled Kruskal-Wallis would smear into noise.

    Blocks are Monday-anchored epoch weeks from pure integer day
    arithmetic (``days-since-1992-01-06 div/mod 7`` — no cross-engine
    ISO-week semantics), incomplete weeks are dropped, and within-week
    average ranks over exact cent sums are exact halves.  The fact
    scan collapses to one row per day; everything after lives on the
    calendar-bounded week frame."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "fried_orders"
    )
    return spark.sql(
        _render(_FRIED_SQL, _SPARK)
        .replace("{orders}", "fried_orders")
        .replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# Bartlett's test across order priorities
# --------------------------------------------------------------------------
_BART_SQL = """
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(floor(o_totalprice) AS BIGINT) AS v
  FROM {orders}
),
g AS {MAT}(
  SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(v * v) AS BIGINT) AS svv
  FROM o GROUP BY grp
),
v AS (
  SELECT grp, n_g,
         (svv - CAST(sv AS DOUBLE) * sv / n_g) / (n_g - 1) AS s2
  FROM g
),
tot AS {MAT}(
  SELECT CAST(sum(n_g) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         sum((n_g - 1) * s2) AS pooled_num,
         sum((n_g - 1) * ln(s2)) AS sum_ln,
         sum(CAST(1 AS DOUBLE) / (n_g - 1)) AS sum_inv
  FROM v
)
SELECT v.grp AS o_orderpriority, v.n_g AS n,
       round(v.s2 - 1e-9, 2) + 0.0 AS var_usd2,
       round(((tot.n - tot.k) * ln(tot.pooled_num / (tot.n - tot.k))
              - tot.sum_ln)
             / (1 + (tot.sum_inv - CAST(1 AS DOUBLE) / (tot.n - tot.k))
                    / (3 * (tot.k - 1))) - 1e-9, 4) + 0.0
         AS bartlett_stat,
       tot.k - 1 AS df
FROM v CROSS JOIN tot
ORDER BY o_orderpriority
"""


@query(
    "bartlett_priority",
    _render(_BART_SQL, _DUCK).replace("{orders}", "orders").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def bartlett_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for equal variances across the five order
    priorities — the parametric (normality-assuming) sharp-edged twin
    of ``brown_forsythe_priority``: more powerful when the data IS
    normal, famously fragile when it isn't, which is exactly why the
    pair belongs together (disagreement between them is itself the
    diagnostic).

    One map-side-combined aggregate produces exact BIGINT dollar
    moments per group (dollar units keep Σv² under 2^63 through sf10;
    (Σv)² goes through DOUBLE); every variance is a rational of those
    moments, and ln() runs on identical doubles in both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "bart_orders"
    )
    return spark.sql(
        _render(_BART_SQL, _SPARK)
        .replace("{orders}", "bart_orders")
        .replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# Jarque-Bera normality test on daily revenue changes
# --------------------------------------------------------------------------
_JB_SQL = """
WITH days AS {MAT}(
  SELECT {DD} AS t,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
  FROM {orders} GROUP BY 1
),
tot AS (SELECT CAST(sum(y) AS BIGINT) AS ty FROM days),
ser AS {MAT}(
  -- scale-free 1e-6-of-total-revenue integer units: |q| ~ 1e3, so
  -- even fourth-power sums stay far inside int64 at ANY sf
  SELECT CAST(floor(CAST(y - yl AS DOUBLE) / t.ty * 1000000 + 0.5)
              AS BIGINT) AS q
  FROM (SELECT y, lag(y) OVER (ORDER BY t) AS yl FROM days)
  CROSS JOIN tot t
  WHERE yl IS NOT NULL
),
c AS (SELECT CAST(floor(avg(CAST(q AS DOUBLE))) AS BIGINT) AS c FROM ser),
m AS {MAT}(
  -- moments of d = q - c (pre-centered by the integer mean, so the
  -- remaining shift delta is in [0,1) and the central-moment shift
  -- formulas cancel only small numbers)
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q - c.c) AS BIGINT) AS s1,
         CAST(sum((q - c.c) * (q - c.c)) AS BIGINT) AS s2,
         CAST(sum((q - c.c) * (q - c.c) * (q - c.c)) AS BIGINT) AS s3,
         CAST(sum((q - c.c) * (q - c.c) * (q - c.c) * (q - c.c))
              AS BIGINT) AS s4
  FROM ser CROSS JOIN c
),
mu AS {MAT}(
  SELECT n,
         CAST(s1 AS DOUBLE) / n AS d1,
         (s2 - CAST(s1 AS DOUBLE) * s1 / n) / n AS mu2,
         (s3 - 3.0 * (CAST(s1 AS DOUBLE) / n) * s2
          + 2.0 * n * (CAST(s1 AS DOUBLE) / n)
            * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / n
           AS mu3,
         (s4 - 4.0 * (CAST(s1 AS DOUBLE) / n) * s3
          + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
            * s2
          - 3.0 * n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
            * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / n
           AS mu4
  FROM m
),
jb AS {MAT}(
  SELECT n,
         mu3 / sqrt(mu2 * mu2 * mu2) AS skew,
         mu4 / (mu2 * mu2) - 3.0 AS exkurt
  FROM mu
)
SELECT n AS n_obs,
       round(skew - 1e-9, 4) + 0.0 AS skewness,
       round(exkurt - 1e-9, 4) + 0.0 AS excess_kurtosis,
       round(n * (skew * skew / 6.0 + exkurt * exkurt / 24.0) - 1e-9, 4)
         + 0.0 AS jb_stat,
       CASE WHEN round(n * (skew * skew / 6.0 + exkurt * exkurt / 24.0)
                       - 1e-9, 4) > 5.991
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         AS reject_normality_5pct
FROM jb
"""


@query(
    "jarque_bera_daily_changes",
    _JB_SQL.replace("{orders}", "orders")
    .replace(
        "{DD}",
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
    )
    .replace("{MAT}", "MATERIALIZED "),
)
def jarque_bera_daily_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test on daily revenue CHANGES — the
    moment-based gate (n·(S²/6 + K²/24) vs χ²₂) that tells an analyst
    whether Gaussian-assuming intervals (CUSUM limits, z-tests,
    VaR-normal) are even admissible on this series.  Complements the
    rank-based KS test with the classical skewness/kurtosis route.

    Determinism: changes become scale-free 1e-6-of-total-revenue
    integer units, pre-centered by their INTEGER mean so all four
    power sums are exact BIGINTs (Σd⁴ ≈ 1e13 at any sf) and the
    central-moment shift formulas cancel only O(1)-sized terms; skew,
    kurtosis and JB are fixed IEEE trees; the verdict compares the
    ROUNDED statistic.  tests/test_stattests.py feeds a planted
    symmetric light-tailed series (flag 0) and a planted heavy-tailed
    one (flag 1) through the same SQL via :func:`jarque_bera_frame`.

    Scale shape: one fact rollup to O(days), one lag window, O(1)
    statistics."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "jb_orders"
    )
    return spark.sql(
        _JB_SQL.replace("{orders}", "jb_orders")
        .replace(
            "{DD}",
            "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')",
        )
        .replace("{MAT}", "")
    )


def jarque_bera_frame(ser: DataFrame) -> DataFrame:
    """JB test over any single-column (q) integer frame — factored out
    for planted-distribution tests; see
    :func:`jarque_bera_daily_changes`."""
    ser.createOrReplaceTempView("jb_ser_frame")
    sql = _JB_SQL.replace("{MAT}", "")
    head = sql.index("c AS (")
    return ser.sparkSession.sql(
        "WITH ser AS (SELECT CAST(q AS BIGINT) AS q FROM jb_ser_frame),\n"
        + sql[head:]
    )


# --------------------------------------------------------------------------
# Cramér-von Mises two-sample test: en vs de document lengths
# --------------------------------------------------------------------------
_CVM_SQL = """
WITH pooled AS {MAT}(
  SELECT src,
         -- average pooled rank minus within-sample index, doubled:
         -- an exact INTEGER (avg ranks are halves); the per-tie-group
         -- multiset of these is assignment-invariant
         CAST(floor(2.0 * (rank() OVER (ORDER BY v)
                           + (count(*) OVER (PARTITION BY v) - 1)
                             / CAST(2 AS DOUBLE)
                           - row_number() OVER (
                               PARTITION BY src ORDER BY v, rid))
                    + 0.5) AS BIGINT) AS q
  FROM (
    SELECT 'x' AS src, n_chars AS v, doc_id AS rid
    FROM {documents} WHERE lang = 'en'
    UNION ALL
    SELECT 'y' AS src, n_chars AS v, doc_id AS rid
    FROM {documents} WHERE lang = 'de'
  )
),
m AS {MAT}(
  SELECT CAST(sum(CASE WHEN src = 'x' THEN 1 ELSE 0 END) AS BIGINT)
           AS n,
         CAST(sum(CASE WHEN src = 'y' THEN 1 ELSE 0 END) AS BIGINT)
           AS mm,
         CAST(sum(CASE WHEN src = 'x' THEN q * q ELSE 0 END) AS BIGINT)
           AS ux4,
         CAST(sum(CASE WHEN src = 'y' THEN q * q ELSE 0 END) AS BIGINT)
           AS uy4
  FROM pooled
),
stat AS {MAT}(
  -- U = n Σ(r-i)² + m Σ(s-j)²; the q's carry 4U exactly
  SELECT n, mm,
         (CAST(n AS DOUBLE) * ux4 + CAST(mm AS DOUBLE) * uy4) / 4.0
           / (CAST(n AS DOUBLE) * mm * (n + mm))
         - (4.0 * n * mm - 1) / (6.0 * (n + mm)) AS t
  FROM m
)
SELECT n AS n_en, mm AS n_de,
       round(t - 1e-9, 6) + 0.0 AS cvm_t,
       CASE WHEN round(t - 1e-9, 6) > 0.461 THEN CAST(1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS reject_same_dist_5pct
FROM stat
"""


@query(
    "cramer_von_mises_doclen",
    _CVM_SQL.replace("{documents}", "documents").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def cramer_von_mises_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér-von Mises two-sample test on en vs de document lengths:
    T integrates the SQUARED gap between the two empirical CDFs, so it
    sees body differences the KS max-gap misses — the standard
    companion to `ks_test_doc_length` / `cliffs_delta_doclen` on the
    same comparison, with the 5% critical value 0.461.

    Determinism: doubled (pooled-average-rank − within-rank) gaps are
    exact INTEGERS (average ranks are halves; within tie groups the
    multiset of gaps is assignment-invariant, so the window's internal
    tie order cannot matter); 4U is an exact BIGINT and T a fixed IEEE
    tree over it.  tests/test_wave20.py plants identical samples
    (T at its theoretical minimum, no rejection) and a shifted sample
    (strong rejection) via :func:`cvm_frame`.

    Scale shape: one pooled sort (the percentile pattern) and one
    4-number aggregate."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "cvm_documents"
    )
    return spark.sql(
        _CVM_SQL.replace("{documents}", "cvm_documents").replace(
            "{MAT}", ""
        )
    )


def cvm_frame(pooled: DataFrame) -> DataFrame:
    """CvM over any (src ∈ {'x','y'}, v, rid) frame; see
    :func:`cramer_von_mises_doclen`."""
    pooled.createOrReplaceTempView("cvm_pool_frame")
    sql = _CVM_SQL.replace("{MAT}", "")
    head = sql.index("m AS ")
    inner = """
    WITH pooled AS (
      SELECT src,
             CAST(floor(2.0 * (rank() OVER (ORDER BY v)
                               + (count(*) OVER (PARTITION BY v) - 1)
                                 / CAST(2 AS DOUBLE)
                               - row_number() OVER (
                                   PARTITION BY src ORDER BY v, rid))
                        + 0.5) AS BIGINT) AS q
      FROM cvm_pool_frame
    ),
    """
    return pooled.sparkSession.sql(inner + sql[head:])


# --------------------------------------------------------------------------
# Dunn's post-hoc: which priority pairs differ, after Kruskal-Wallis?
# --------------------------------------------------------------------------
_DUNN_SQL = """
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM {orders}
),
r AS (
  SELECT grp,
         rank() OVER (ORDER BY v)
           + (count(*) OVER (PARTITION BY v) - 1) / CAST(2 AS DOUBLE)
           AS ar
  FROM o
),
g AS {MAT}(
  SELECT grp, CAST(count(*) AS BIGINT) AS n_g, sum(ar) AS s_g
  FROM r GROUP BY grp
),
ties AS (
  SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tsum
  FROM (SELECT count(*) AS t FROM o GROUP BY v)
),
tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n FROM g),
pairs AS {MAT}(
  SELECT a.grp AS grp_a, b.grp AS grp_b, a.n_g AS n_a, b.n_g AS n_b,
         (a.s_g / a.n_g - b.s_g / b.n_g)
           / sqrt((CAST(tot.n AS DOUBLE) * (tot.n + 1) / 12.0
                   - ties.tsum / (12.0 * (tot.n - 1)))
                  * (1.0 / a.n_g + 1.0 / b.n_g)) AS z
  FROM g a JOIN g b ON a.grp < b.grp
  CROSS JOIN tot CROSS JOIN ties
)
SELECT grp_a, grp_b, n_a, n_b,
       round(z - 1e-9, 4) + 0.0 AS dunn_z,
       -- Bonferroni for the 10 simultaneous pairs: |z| > z_{0.05/20}
       CASE WHEN abs(round(z - 1e-9, 4)) > 2.807
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         AS significant_bonferroni_5pct
FROM pairs
ORDER BY grp_a, grp_b
"""


@query(
    "dunn_posthoc_priority",
    _DUNN_SQL.replace("{orders}", "orders").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def dunn_posthoc_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test for all 10 priority pairs — the step a
    significant ``kruskal_wallis_priority`` omnibus REQUIRES before
    naming any pair as different: pairwise mean-rank z statistics on
    the SHARED pooled ranks (not pairwise re-ranking — that's the
    classic error this query exists to prevent), with the
    Kruskal-Wallis tie correction in the variance and a Bonferroni
    bar (|z| > 2.807 for 10 simultaneous pairs at 5%).

    Determinism: the same average-rank machinery as the omnibus
    (exact-half ranks, exact rank sums); the per-pair z is a fixed
    IEEE tree over those sums and the exact tie term; verdicts compare
    the ROUNDED z.  tests/test_wave20.py pins the rank-mean identity
    (Σ n_g·R̄_g = N(N+1)/2 reconstructed from pair rows) and that one
    planted shifted group lights up exactly its 4 pairs.

    Scale shape: one global sort (shared with every rank statistic),
    then a 5-row group frame joined to itself — O(groups²)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "dunn_orders"
    )
    return spark.sql(
        _DUNN_SQL.replace("{orders}", "dunn_orders").replace("{MAT}", "")
    )


# --------------------------------------------------------------------------
# One-way ANOVA + Brown-Forsythe across order priorities
# --------------------------------------------------------------------------
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_F_CRIT_4_INF = 2.3719  # F(4, inf) upper 5% = chi2_4/4


def _anova_pivot_tail(src: str, stat_name: str, reject_name: str) -> str:
    """Pivot the 5 per-group integer moment rows of CTE ``src`` (grp,
    n, s, ss) into ONE row and compute the one-way F as a fixed IEEE
    expression tree — no float aggregation over a variable row set
    anywhere, so both engines evaluate the identical operation
    sequence."""
    piv = ",\n".join(
        f"""    CAST(coalesce(max(CASE WHEN grp = '{g}' THEN n END), 0) AS BIGINT) AS n{i},
    CAST(coalesce(max(CASE WHEN grp = '{g}' THEN s END), 0) AS BIGINT) AS s{i},
    CAST(coalesce(max(CASE WHEN grp = '{g}' THEN ss END), 0) AS BIGINT) AS ss{i}"""
        for i, g in enumerate(_PRIORITIES, 1)
    )
    # nullif on every divisor (empty-universe parity, round-12): an
    # absent group (n_i = 0) or empty corpus NULLs identically in both
    # engines where ANSI Spark would error and DuckDB silently NULLs —
    # non-degenerate results unchanged (divisors strictly positive)
    sgs = " + ".join(
        f"CAST(s{i} AS DOUBLE) * s{i} / nullif(n{i}, 0)"
        for i in range(1, 6)
    )
    fexpr = (
        "round((ssb / 4.0) / nullif(ssw / nullif(n - 5, 0),"
        " CAST(0.0 AS DOUBLE)) - 1e-9, 6)"
    )
    return f"""
piv AS {{MAT}}(
  SELECT
{piv}
  FROM {src}
),
mo AS {{MAT}}(
  SELECT n1 + n2 + n3 + n4 + n5 AS n,
         s1 + s2 + s3 + s4 + s5 AS s,
         ss1 + ss2 + ss3 + ss4 + ss5 AS ss,
         {sgs} AS sgs
  FROM piv
),
fstat AS {{MAT}}(
  SELECT n,
         sgs - CAST(s AS DOUBLE) * s / nullif(n, 0) AS ssb,
         CAST(ss AS DOUBLE) - sgs AS ssw
  FROM mo
)
SELECT n AS n_obs,
       CAST(4 AS BIGINT) AS df_between,
       n - 5 AS df_within,
       round(ssb - 1e-9, 2) + 0.0 AS ss_between,
       round(ssw - 1e-9, 2) + 0.0 AS ss_within,
       {fexpr} + 0.0 AS {stat_name},
       CASE WHEN {fexpr}
                 > {_F_CRIT_4_INF}
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         AS {reject_name}
FROM fstat
"""


_ANOVA_SQL = (
    """
WITH base AS {MAT}(
  SELECT o_orderpriority AS grp,
         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS q
  FROM {orders}
),
g AS {MAT}(
  SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(q * q) AS BIGINT) AS ss
  FROM base GROUP BY grp
),
"""
    + _anova_pivot_tail("g", "f_stat", "reject_equal_means_5pct")
)


@query(
    "anova_oneway_priority",
    _ANOVA_SQL.replace("{orders}", "orders").replace("{MAT}", "MATERIALIZED "),
)
def anova_oneway_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of order value across the 5 order
    priorities — the classical omnibus the Kruskal-Wallis query is the
    rank-based twin of; under TPC-H's independent column generation
    the truth is "no effect", so the F should sit near 1 (the planted
    law in tests/test_anova_periodogram.py pins both poles: a shifted
    group rejects, independent digit-derived groups do not).

    Determinism: order values round-half-up to integer DOLLARS (the
    sf10-safe second-moment unit), per-group (n, Σq, Σq²) are exact
    BIGINTs, the 5 groups pivot into ONE row so SSB/SSW/F are fixed
    IEEE trees — no float sum over a variable row set in either
    engine.  Verdict compares the ROUNDED statistic to F(4,∞)=2.3719.

    Scale shape: one fact scan → 5-row moment frame; everything after
    is O(1).  Reference scope: keyed aggregation (정리/3주차.md)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "anova_orders"
    )
    return spark.sql(
        _ANOVA_SQL.replace("{orders}", "anova_orders").replace("{MAT}", "")
    )


def anova_frame(spark: SparkSession, base: DataFrame) -> DataFrame:
    """One-way ANOVA over any (grp in _PRIORITIES, q BIGINT) frame —
    factored for planted-law tests (see anova_oneway_priority)."""
    base.createOrReplaceTempView("anova_frame_base")
    return spark.sql(
        "WITH g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(q) AS BIGINT) AS s, CAST(sum(q * q) AS BIGINT) AS ss "
        "FROM anova_frame_base GROUP BY grp),"
        + _anova_pivot_tail("g", "f_stat", "reject_equal_means_5pct")
        .replace("{MAT}", "")
        .lstrip()
        .lstrip(",")
    )


# --------------------------------------------------------------------------
# Tukey HSD post-hoc after the one-way ANOVA
# --------------------------------------------------------------------------
_TUKEY_Q_CRIT = 3.858  # studentized range q(5 groups, inf df) at 5%


def _tukey_sql() -> str:
    # nullif on every divisor: empty/absent groups NULL identically in
    # both engines (ANSI Spark errors on x/0 where DuckDB NULLs); the
    # pair verdict's ELSE 0 then matches the oracle's empty output
    pairs = []
    for i in range(1, 6):
        for j in range(i + 1, 6):
            mi = f"CAST(s{i} AS DOUBLE) / nullif(n{i}, 0)"
            mj = f"CAST(s{j} AS DOUBLE) / nullif(n{j}, 0)"
            se = (
                f"nullif(sqrt((CAST(ss1+ss2+ss3+ss4+ss5 AS DOUBLE) - sgs)"
                f" / nullif(n1+n2+n3+n4+n5 - 5, 0) / 2.0"
                f" * (1.0 / nullif(n{i}, 0) + 1.0 / nullif(n{j}, 0))),"
                f" CAST(0.0 AS DOUBLE))"
            )
            pairs.append(f"""
  SELECT '{_PRIORITIES[i - 1]}' AS grp_a, '{_PRIORITIES[j - 1]}' AS grp_b,
         round(({mi}) - ({mj}) - 1e-9, 4) + 0.0 AS mean_diff,
         round(abs(({mi}) - ({mj})) / ({se}) - 1e-9, 4) + 0.0 AS q_stat,
         CASE WHEN round(abs(({mi}) - ({mj})) / ({se}) - 1e-9, 4)
                   > {_TUKEY_Q_CRIT}
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS sig_5pct
  FROM piv2""")
    piv = ",\n".join(
        f"""    CAST(coalesce(max(CASE WHEN grp = '{g}' THEN n END), 0) AS BIGINT) AS n{i},
    CAST(coalesce(max(CASE WHEN grp = '{g}' THEN s END), 0) AS BIGINT) AS s{i},
    CAST(coalesce(max(CASE WHEN grp = '{g}' THEN ss END), 0) AS BIGINT) AS ss{i}"""
        for i, g in enumerate(_PRIORITIES, 1)
    )
    sgs = " + ".join(
        f"CAST(s{i} AS DOUBLE) * s{i} / nullif(n{i}, 0)"
        for i in range(1, 6)
    )
    return f"""
WITH base AS {{MAT}}(
  SELECT o_orderpriority AS grp,
         CAST(floor(o_totalprice + 0.5) AS BIGINT) AS q
  FROM {{orders}}
),
g AS {{MAT}}(
  SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(q * q) AS BIGINT) AS ss
  FROM base GROUP BY grp
),
piv2 AS {{MAT}}(
  SELECT
{piv},
    {sgs} AS sgs
  FROM g
)
SELECT * FROM ({" UNION ALL ".join(pairs)})
ORDER BY grp_a, grp_b
"""


@query(
    "tukey_hsd_priority",
    _tukey_sql()
    .replace("{orders}", "orders")
    .replace("{MAT}", "MATERIALIZED "),
)
def tukey_hsd_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc for all 10 priority pairs — the parametric
    companion to ``dunn_posthoc_priority`` and the step a significant
    ``anova_oneway_priority`` omnibus requires before naming pairs:
    per pair, the mean difference and the studentized-range statistic
    |Δ|/√(MSW/2·(1/nᵢ+1/nⱼ)) against q(5,∞)=3.858 (family-wise 5%).

    Determinism: the same dollar-unit exact BIGINT moments and 5-group
    pivot as the omnibus; every pair statistic is a fixed IEEE tree
    over that ONE row; verdicts compare ROUNDED statistics.  Scale
    shape: one fact rollup, then 10 constant-time pair expressions."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "tukey_orders"
    )
    sql = _tukey_sql().replace("{orders}", "tukey_orders").replace(
        "{MAT}", ""
    )
    # Spark inlines the plain piv2 CTE into every one of the 10 pair
    # selects (10 fact scans); materialize the 1-row pivot once and
    # point the pair union at it (the rich-club/WL staging rule)
    head = sql.index("piv2 AS (")
    tail = sql.index(")\nSELECT * FROM (")
    piv_sql = "WITH " + sql[sql.index("base AS ") : tail + 1]
    spark.sql(piv_sql.replace("piv2 AS (", "_q AS (") + " SELECT * FROM _q"
              ).localCheckpoint().createOrReplaceTempView("tukey_piv2_v")
    pairs_sql = "WITH piv2 AS (SELECT * FROM tukey_piv2_v)" + sql[
        tail + 1 :
    ]
    return spark.sql(pairs_sql)


# --------------------------------------------------------------------------
# Effect-size battery: weekend vs weekday event values
# --------------------------------------------------------------------------
_EFFECT_SQL = """
WITH base AS {MAT}(
  SELECT CASE WHEN {WD} >= 5 THEN 1 ELSE 0 END AS wk,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS q,
         event_id AS rid
  FROM {events}
),
rk AS {MAT}(
  -- doubled average pooled rank is an exact integer under ties
  SELECT wk,
         2 * rank() OVER (ORDER BY q)
           + (count(*) OVER (PARTITION BY q) - 1) AS r2
  FROM base
),
m AS {MAT}(
  SELECT CAST(sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN wk = 1 THEN q ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN wk = 0 THEN q ELSE 0 END) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN wk = 1 THEN q * q ELSE 0 END) AS BIGINT)
           AS ss1,
         CAST(sum(CASE WHEN wk = 0 THEN q * q ELSE 0 END) AS BIGINT)
           AS ss2
  FROM base
),
r AS {MAT}(
  SELECT CAST(sum(CASE WHEN wk = 1 THEN r2 ELSE 0 END) AS BIGINT) AS r2sum
  FROM rk
),
e AS {MAT}(
  SELECT n1, n2,
         (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / 100.0
           AS diff,
         sqrt(((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
               + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
              / (n1 + n2 - 2)) / 100.0 AS sp,
         sqrt((CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2)
              / (n2 - 1)) / 100.0 AS sd2,
         -- 2*U1 = 2*R1 - n1(n1+1): exact integers end to end
         (CAST(r2sum AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1))
           / (2.0 * n1 * n2) AS cles
  FROM m CROSS JOIN r
)
SELECT n1 AS n_weekend, n2 AS n_weekday,
       round(diff - 1e-9, 4) + 0.0 AS mean_diff_usd,
       round(diff / sp - 1e-9, 4) + 0.0 AS cohens_d,
       round(diff / sp * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)) - 1e-9, 4)
         + 0.0 AS hedges_g,
       round(diff / sd2 - 1e-9, 4) + 0.0 AS glass_delta,
       round(cles - 1e-9, 4) + 0.0 AS cles,
       CASE WHEN abs(round(diff / sp - 1e-9, 4)) < 0.2 THEN 'negligible'
            WHEN abs(round(diff / sp - 1e-9, 4)) < 0.5 THEN 'small'
            WHEN abs(round(diff / sp - 1e-9, 4)) < 0.8 THEN 'medium'
            ELSE 'large' END AS magnitude
FROM e
"""


@query(
    "effect_size_battery",
    _EFFECT_SQL.replace("{events}", "events")
    .replace("{MAT}", "MATERIALIZED ")
    .replace("{WD}", "(isodow(ts) - 1)"),
)
def effect_size_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect-size battery for the weekend-vs-weekday event-value
    contrast: Cohen's d (pooled SD), Hedges' g (small-sample
    correction), Glass's Δ (control-group SD), and the common-language
    effect size P(weekend > weekday) from exact rank sums — the
    practical-significance numbers a bare p-value (the t/U tests
    elsewhere in this module) cannot convey, plus the conventional
    magnitude label.

    Determinism: integer-cent moments per group (exact BIGINTs), every
    statistic a fixed IEEE tree over the single pivoted row; CLES uses
    the doubled-average-rank integers (the CvM/ROC-AUC machinery), so
    ties cost nothing; weekday() ≡ isodow−1 is the established
    dialect pairing.  Scale shape: one scan → one global rank sort
    (shared shape with every rank statistic) + one moment rollup."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("eff_ev")
    return spark.sql(
        _EFFECT_SQL.replace("{events}", "eff_ev")
        .replace("{MAT}", "")
        .replace("{WD}", "weekday(ts)")
    )


# --------------------------------------------------------------------------
# Wilcoxon signed-rank test (paired, normal approximation with ties)
# --------------------------------------------------------------------------
_WILCOXON_SQL = """
WITH daily AS {MAT}(
  SELECT year(CAST(o_orderdate AS DATE)) * 12
           + month(CAST(o_orderdate AS DATE)) AS m,
         CASE WHEN day(CAST(o_orderdate AS DATE)) <= 15
              THEN 1 ELSE 0 END AS h,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM {orders} GROUP BY 1, 2
),
pairs AS {MAT}(
  SELECT m,
         CAST(sum(CASE WHEN h = 1 THEN cents ELSE 0 END)
              - sum(CASE WHEN h = 0 THEN cents ELSE 0 END) AS BIGINT) AS d
  FROM daily GROUP BY m
  HAVING sum(CASE WHEN h = 1 THEN cents ELSE 0 END)
         <> sum(CASE WHEN h = 0 THEN cents ELSE 0 END)
),
ranked AS {MAT}(
  SELECT m, d,
         CAST(rank() OVER (ORDER BY abs(d)) AS BIGINT) AS rmin,
         CAST(count(*) OVER (PARTITION BY abs(d)) AS BIGINT) AS t
  FROM pairs
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CASE WHEN d > 0
                  THEN rmin + (t - 1) / CAST(2.0 AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END) AS w_plus,
         sum(CAST(t * t - 1 AS DOUBLE)) AS tie3
  FROM ranked
),
z AS (
  SELECT n, w_plus,
         (w_plus - n * (n + 1) / CAST(4.0 AS DOUBLE))
           / sqrt(n * (n + 1) * (2 * n + 1) / CAST(24.0 AS DOUBLE)
                  - tie3 / CAST(48.0 AS DOUBLE)) AS zval
  FROM agg
)
SELECT n AS n_pairs,
       round(w_plus - 1e-9, 4) + 0.0 AS w_plus,
       round(zval - 1e-9, 4) + 0.0 AS z_stat,
       -- coalesce: an EMPTY pair set yields NULL z on both engines,
       -- but the comparator stringifies a NULL bool differently per
       -- engine; "no evidence" is a non-rejection, so pin false
       coalesce(abs(zval) > 1.96, false) AS reject_5pct
FROM z
"""


@query(
    "wilcoxon_signed_rank",
    _WILCOXON_SQL.replace("{orders}", "orders").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on paired monthly revenue halves
    (days 1-15 vs 16+): does the first half of the month earn
    systematically more, WITHOUT assuming normality — the
    distribution-free complement of the paired t-test, ranking
    |differences| (average ranks on ties, zero pairs dropped) and
    z-scoring W+ with the tie-corrected variance
    ``n(n+1)(2n+1)/24 − Σ(t³−t)/48``.

    Determinism: paired differences are EXACT int64 cents (half-month
    totals, no averaging), so rank order, tie groups, and the
    per-member tie term t²−1 are integer-exact; every W+ contribution
    is an integer or half-integer (min-rank + (t−1)/2), so the
    unordered double sum is exact regardless of accumulation order —
    no ordered-window scaffolding needed.  Both engines run the
    IDENTICAL SQL (shared template, dialect-free year/month/day).
    Scale shape: one day-grain rollup (map-side combinable), then a
    bounded month-count frame."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "wilcoxon_orders"
    )
    return spark.sql(
        _WILCOXON_SQL.replace("{orders}", "wilcoxon_orders").replace(
            "{MAT}", ""
        )
    )
