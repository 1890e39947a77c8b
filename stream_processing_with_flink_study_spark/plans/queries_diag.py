"""Statistical-diagnostics queries (eighth wave, continued): the
inference layer a data platform runs AFTER fitting something — log-rank
survival comparison, OLS residual diagnostics (Durbin-Watson serial
correlation + Breusch-Pagan heteroskedasticity), Kendall's τ-b, PR-AUC
(average precision), the Murphy decomposition of the Brier score,
Cohen's κ inter-rater agreement, and delete-one-group jackknife
standard errors.

Oracle-determinism strategy (see plans/registry.py conventions):
- model coefficients come from EXACT BIGINT moment sums (integer sums
  are order-independent, unlike float sums), so the fitted α/β — and
  therefore every per-row residual — are bit-identical doubles across
  engines; only the final O(1) diagnostic ratios touch order-dependent
  float sums, where the −1e-9-guarded rounding is many orders above
  the jitter floor;
- decision flags (χ² significance, BP rejection) compare the ROUNDED
  statistic to the literal critical value so both engines make the
  same boundary call;
- rank/count-based statistics (τ-b, AP, κ, Brier bins) are rational
  functions of exact integers end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query

CHI2_95_DF1 = 3.8415  # chi-square 95th percentile, 1 degree of freedom


@query(
    "log_rank_survival",
    f"""
    WITH seq AS (
      SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    horizon AS (SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders),
    firsts AS (SELECT k, d AS d1 FROM seq WHERE rn = 1),
    seconds AS (SELECT k, d AS d2 FROM seq WHERE rn = 2),
    obs AS MATERIALIZED (
      SELECT f.k,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
             CASE WHEN s.d2 IS NOT NULL
                  THEN date_diff('day', f.d1, s.d2)
                  ELSE date_diff('day', f.d1, (SELECT h FROM horizon))
             END AS t,
             CASE WHEN s.d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM firsts f
      LEFT JOIN seconds s ON s.k = f.k
      JOIN customer c ON c.c_custkey = f.k
    ),
    grp AS MATERIALIZED (
      SELECT t,
             CAST(count(*) AS BIGINT) AS c_all,
             CAST(sum(ev) AS BIGINT) AS d_all,
             CAST(sum(g) AS BIGINT) AS c_1,
             CAST(sum(g * ev) AS BIGINT) AS d_1
      FROM obs GROUP BY t
    ),
    atrisk AS (
      SELECT t, d_all, d_1,
             (SELECT count(*) FROM obs) - coalesce(sum(c_all) OVER wp, 0)
               AS n_all,
             (SELECT sum(g) FROM obs) - coalesce(sum(c_1) OVER wp, 0)
               AS n_1
      FROM grp
      WINDOW wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING)
    ),
    terms AS (
      SELECT d_1, d_all,
             d_all * CAST(n_1 AS DOUBLE) / n_all AS e_1,
             CASE WHEN n_all > 1
                  THEN d_all * (CAST(n_1 AS DOUBLE) / n_all)
                       * (1.0 - CAST(n_1 AS DOUBLE) / n_all)
                       * (n_all - d_all) / (n_all - 1)
                  ELSE 0.0 END AS v
      FROM atrisk WHERE d_all > 0
    ),
    agg AS (
      SELECT CAST((SELECT sum(g) FROM obs) AS BIGINT) AS n_building,
             CAST((SELECT count(*) - sum(g) FROM obs) AS BIGINT)
               AS n_other,
             CAST(sum(d_1) AS BIGINT) AS observed_events,
             sum(e_1) AS e1, sum(v) AS v1
      FROM terms
    )
    SELECT n_building, n_other, observed_events,
           round(e1 - 1e-9, 4) AS expected_events,
           round((observed_events - e1) * (observed_events - e1) / v1
                 - 1e-9, 4) AS chi2,
           coalesce(round((observed_events - e1) * (observed_events - e1)
                          / v1 - 1e-9, 4)
                    > {CHI2_95_DF1!r}, false) AS reject_null
    FROM agg
    """,
)
def log_rank_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time-to-second-order survival between
    BUILDING-segment customers and everyone else — the standard
    two-sample censored-data test: at every event time the observed
    group-1 events are compared with the hypergeometric expectation
    ``d·n₁/n`` given the at-risk sets, and ``(O−E)²/V ~ χ²(1)``.
    Extends :func:`queries_core.kaplan_meier_reorder` from estimation
    to inference.

    Scale shape: the customer-keyed ranking window and the broadcast
    join to the customer dim are the only fact-sized stages; the test
    statistic lives on the distinct-gap-day frame (~10³ rows) where
    at-risk counts are one right-to-left cumulative per group.  Counts
    are exact integers; E and V are sums of rationals over the tiny
    frame, rounded with the −1e-9 guard, and the rejection flag
    compares the ROUNDED χ² to the critical value."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    wq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_custkey").alias("k"),
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(wq).alias("rn"),
    )
    horizon = orders.agg(F.max(F.to_date("o_orderdate"))).first()[0]
    # one pass over the ranked frame: pivot rn∈{1,2} into (d1, d2)
    # columns instead of materializing firsts/seconds and re-joining —
    # halves the fact scans versus the Kaplan-Meier formulation
    obs = (
        seq.filter(F.col("rn") <= 2)
        .groupBy("k")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
            F.max(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
        )
        .join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("k"),
                    F.when(F.col("c_mktsegment") == "BUILDING", 1)
                    .otherwise(0)
                    .alias("g"),
                )
            ),
            "k",
        )
        .select(
            "g",
            F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
            .otherwise(F.datediff(F.lit(horizon), F.col("d1")))
            .alias("t"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    grp = obs.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("c_all"),
        F.sum("ev").cast("long").alias("d_all"),
        F.sum("g").cast("long").alias("c_1"),
        F.sum(F.col("g") * F.col("ev")).cast("long").alias("d_1"),
    )
    w_tot = Window.partitionBy()
    wp = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    atrisk = grp.select(
        "d_all",
        "d_1",
        (
            F.sum("c_all").over(w_tot)
            - F.coalesce(F.sum("c_all").over(wp), F.lit(0))
        ).alias("n_all"),
        (
            F.sum("c_1").over(w_tot)
            - F.coalesce(F.sum("c_1").over(wp), F.lit(0))
        ).alias("n_1"),
        F.sum("c_1").over(w_tot).alias("tot_1"),
        F.sum("c_all").over(w_tot).alias("tot_all"),
    )
    frac1 = F.col("n_1").cast("double") / F.col("n_all")
    terms = atrisk.filter(F.col("d_all") > 0).select(
        "d_1",
        "tot_1",
        "tot_all",
        (F.col("d_all") * frac1).alias("e_1"),
        F.when(
            F.col("n_all") > 1,
            F.col("d_all")
            * frac1
            * (1.0 - frac1)
            * (F.col("n_all") - F.col("d_all"))
            / (F.col("n_all") - 1),
        )
        .otherwise(0.0)
        .alias("v"),
    )
    agg = terms.agg(
        F.max("tot_1").cast("long").alias("n_building"),
        (F.max("tot_all") - F.max("tot_1")).cast("long").alias("n_other"),
        F.sum("d_1").cast("long").alias("observed_events"),
        F.sum("e_1").alias("e1"),
        F.sum("v").alias("v1"),
    )
    chi2 = F.round(
        (F.col("observed_events") - F.col("e1"))
        * (F.col("observed_events") - F.col("e1"))
        / F.col("v1")
        - 1e-9,
        4,
    )
    return agg.select(
        "n_building",
        "n_other",
        "observed_events",
        F.round(F.col("e1") - 1e-9, 4).alias("expected_events"),
        chi2.alias("chi2"),
        # no evidence on an empty cohort = non-rejection (r11 wilcoxon)
        F.coalesce(chi2 > CHI2_95_DF1, F.lit(False)).alias("reject_null"),
    )


@query(
    "ols_residual_diagnostics",
    f"""
    WITH base AS MATERIALIZED (
      SELECT l_returnflag AS rf,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS yc,
             l_shipdate, l_orderkey, l_linenumber
      FROM lineitem
    ),
    mom AS MATERIALIZED (
      SELECT rf, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(yc) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * yc) AS BIGINT) AS sxy
      FROM base GROUP BY rf
    ),
    fit AS MATERIALIZED (
      SELECT rf, n,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
               / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               AS beta_c,
             (CAST(sy AS DOUBLE)
                - (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                  / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  * sx) / n AS alpha_c
      FROM mom
    ),
    res AS MATERIALIZED (
      SELECT b.rf, f.n, b.x,
             b.yc - f.alpha_c - f.beta_c * b.x AS e,
             lag(b.yc - f.alpha_c - f.beta_c * b.x) OVER (
               PARTITION BY b.rf
               ORDER BY b.l_shipdate, b.l_orderkey, b.l_linenumber,
                        b.yc, b.x)
               AS e_prev
      FROM base b JOIN fit f ON b.rf = f.rf
    ),
    diag AS (
      SELECT rf, max(n) AS n,
             sum(CASE WHEN e_prev IS NULL THEN 0.0
                      ELSE (e - e_prev) * (e - e_prev) END) AS dw_num,
             sum(e * e) AS see,
             count(*) AS nn,
             sum(x) AS sx2, sum(CAST(x AS DOUBLE) * x) AS sxx2,
             sum(e * e * x) AS sze,
             sum(e * e * e * e) AS szz,
             avg(e * e) AS mz
      FROM res GROUP BY rf
    )
    SELECT rf AS returnflag, CAST(n AS BIGINT) AS n,
           round(dw_num / see - 1e-9, 4) AS durbin_watson,
           round(1.0 - (dw_num / see) / 2.0 - 1e-9, 4) AS rho1,
           round(nn * pow(sze - mz * sx2, 2)
                 / ((sxx2 - CAST(sx2 AS DOUBLE) * sx2 / nn)
                    * (szz - mz * mz * nn))
                 - 1e-9, 4) AS bp_lm,
           round(nn * pow(sze - mz * sx2, 2)
                 / ((sxx2 - CAST(sx2 AS DOUBLE) * sx2 / nn)
                    * (szz - mz * mz * nn))
                 - 1e-9, 4) > {CHI2_95_DF1!r} AS bp_reject
    FROM diag
    ORDER BY rf
    """,
)
def ols_residual_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual diagnostics for the price~quantity OLS fit, per return
    flag: Durbin-Watson serial correlation over shipdate-ordered
    residuals (with the implied lag-1 autocorrelation ρ₁ ≈ 1 − DW/2)
    and the Breusch-Pagan LM test regressing squared residuals on the
    regressor — the "is this model lying to you" battery that belongs
    next to every fitted coefficient.

    Determinism design: α and β are derived from EXACT BIGINT moment
    sums (integer aggregation is order-independent), so every per-row
    residual is a bit-identical double in both engines; the O(1)
    diagnostic ratios are the only order-dependent float sums and sit
    ~1e-12 relative — far under the 4-decimal rounding.  Scale shape:
    one integer-moment aggregate (map-side combinable), one broadcast
    of the 3-row fit, one shipdate sort per flag for the lag — no
    self-joins, no second fact shuffle beyond the window sort."""
    base = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("yc"),
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
    )
    mom = base.groupBy("rf").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("yc").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("yc")).cast("long").alias("sxy"),
    )
    beta = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    fit = mom.select(
        "rf",
        "n",
        beta.alias("beta_c"),
        ((F.col("sy").cast("double") - beta * F.col("sx")) / F.col("n")).alias(
            "alpha_c"
        ),
    )
    e = F.col("yc") - F.col("alpha_c") - F.col("beta_c") * F.col("x")
    # (shipdate, orderkey, linenumber) is NOT unique in this synthetic
    # lineitem — 8 duplicate triples with different values exist, and a
    # nondeterministic lag order there shifts DW by ~4e-4.  (yc, x)
    # completes the total order and fully determines the residual.
    wlag = Window.partitionBy("rf").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber", "yc", "x"
    )
    res = base.join(F.broadcast(fit), "rf").select(
        "rf",
        "n",
        "x",
        e.alias("e"),
        F.lag(e).over(wlag).alias("e_prev"),
    )
    diag = res.groupBy("rf").agg(
        F.max("n").alias("n"),
        F.sum(
            F.when(F.col("e_prev").isNull(), 0.0).otherwise(
                (F.col("e") - F.col("e_prev")) * (F.col("e") - F.col("e_prev"))
            )
        ).alias("dw_num"),
        F.sum(F.col("e") * F.col("e")).alias("see"),
        F.count(F.lit(1)).alias("nn"),
        F.sum("x").alias("sx2"),
        F.sum(F.col("x").cast("double") * F.col("x")).alias("sxx2"),
        F.sum(F.col("e") * F.col("e") * F.col("x")).alias("sze"),
        F.sum(F.col("e") * F.col("e") * F.col("e") * F.col("e")).alias("szz"),
        F.avg(F.col("e") * F.col("e")).alias("mz"),
    )
    dw = F.col("dw_num") / F.col("see")
    bp = (
        F.col("nn")
        * F.pow(F.col("sze") - F.col("mz") * F.col("sx2"), 2)
        / (
            (
                F.col("sxx2")
                - F.col("sx2").cast("double") * F.col("sx2") / F.col("nn")
            )
            * (F.col("szz") - F.col("mz") * F.col("mz") * F.col("nn"))
        )
    )
    bp_r = F.round(bp - 1e-9, 4)
    return diag.select(
        F.col("rf").alias("returnflag"),
        F.col("n").cast("long").alias("n"),
        F.round(dw - 1e-9, 4).alias("durbin_watson"),
        F.round(1.0 - dw / 2.0 - 1e-9, 4).alias("rho1"),
        bp_r.alias("bp_lm"),
        (bp_r > CHI2_95_DF1).alias("bp_reject"),
    ).orderBy("returnflag")


@query(
    "kendall_tau_monthly",
    """
    WITH monthly AS MATERIALIZED (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT a.rev AS r1, a.cnt AS c1, b.rev AS r2, b.cnt AS c2
      FROM monthly a JOIN monthly b ON a.m < b.m
    ),
    counts AS (
      SELECT
        CAST(count(*) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN (r1 < r2 AND c1 < c2)
                        OR (r1 > r2 AND c1 > c2) THEN 1 ELSE 0 END)
             AS BIGINT) AS concordant,
        CAST(sum(CASE WHEN (r1 < r2 AND c1 > c2)
                        OR (r1 > r2 AND c1 < c2) THEN 1 ELSE 0 END)
             AS BIGINT) AS discordant,
        CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT)
          AS ties_rev,
        CAST(sum(CASE WHEN c1 = c2 THEN 1 ELSE 0 END) AS BIGINT)
          AS ties_cnt
      FROM pairs
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM monthly) AS n_months,
           concordant, discordant, ties_rev, ties_cnt,
           round((concordant - discordant)
                 / sqrt((CAST(n0 AS DOUBLE) - ties_rev)
                        * (CAST(n0 AS DOUBLE) - ties_cnt))
                 - 1e-9, 4) AS tau_b
    FROM counts
    """,
)
def kendall_tau_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between monthly revenue and monthly order count:
    concordant/discordant pair counting with the tie-corrected
    denominator — the rank correlation that, unlike Spearman's ρ
    (:func:`queries_eval.spearman_spend_frequency`), has a direct
    probabilistic reading (P[agree] − P[disagree]).

    Scale shape: REDUCE FIRST — the fact table aggregates to one exact
    integer-cent row per month (~84 rows), and the O(n²) pair join runs
    on the reduced frame (3.5k pairs), never on facts.  This
    aggregate-then-quadratic split is the standard way to make
    pair-counting statistics feasible at any fact scale; every count
    is an exact BIGINT so τ-b is engine-identical before rounding."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m")
        )
        .agg(
            F.sum(cents).cast("long").alias("rev"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        .persist()
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = a.join(b, F.col("a.m") < F.col("b.m")).select(
        F.col("a.rev").alias("r1"),
        F.col("a.cnt").alias("c1"),
        F.col("b.rev").alias("r2"),
        F.col("b.cnt").alias("c2"),
    )
    conc = (
        (F.col("r1") < F.col("r2")) & (F.col("c1") < F.col("c2"))
    ) | ((F.col("r1") > F.col("r2")) & (F.col("c1") > F.col("c2")))
    disc = (
        (F.col("r1") < F.col("r2")) & (F.col("c1") > F.col("c2"))
    ) | ((F.col("r1") > F.col("r2")) & (F.col("c1") < F.col("c2")))
    counts = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(conc, 1).otherwise(0)).cast("long").alias("concordant"),
        F.sum(F.when(disc, 1).otherwise(0)).cast("long").alias("discordant"),
        F.sum(F.when(F.col("r1") == F.col("r2"), 1).otherwise(0))
        .cast("long")
        .alias("ties_rev"),
        F.sum(F.when(F.col("c1") == F.col("c2"), 1).otherwise(0))
        .cast("long")
        .alias("ties_cnt"),
    )
    n_months = monthly.count()
    out = counts.select(
        F.lit(n_months).cast("long").alias("n_months"),
        "concordant",
        "discordant",
        "ties_rev",
        "ties_cnt",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt(
                (F.col("n0").cast("double") - F.col("ties_rev"))
                * (F.col("n0").cast("double") - F.col("ties_cnt"))
            )
            - 1e-9,
            4,
        ).alias("tau_b"),
    )
    monthly.unpersist()
    return out


@query(
    "pr_auc_by_source",
    """
    WITH d AS (
      SELECT source, doc_id, n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    ranked AS (
      SELECT source, pos,
             row_number() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS k,
             sum(pos) OVER (PARTITION BY source
                            ORDER BY score DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_pos
      FROM d
    )
    SELECT source,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(CASE WHEN pos = 1
                          THEN CAST(cum_pos AS DOUBLE) / k
                          ELSE 0 END) / sum(pos) - 1e-9, 4)
             AS average_precision,
           round(CAST(sum(pos) AS DOUBLE) / count(*) - 1e-9, 4)
             AS prevalence
    FROM ranked
    GROUP BY source
    HAVING sum(pos) > 0
    ORDER BY source
    """,
)
def pr_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    interpolation) of the doc-length score against the ``lang = 'en'``
    label, per source — the rank metric that, unlike ROC-AUC
    (:func:`queries_eval.roc_auc_by_source`), stays honest under heavy
    class imbalance; prevalence is emitted alongside as the no-skill
    baseline.  AP = mean over positives of precision-at-that-rank,
    computed from one in-partition sort with a unique (score, doc_id)
    tiebreak: ranks and cumulative positives are exact integers, so
    each precision term is a rational of identical integers in both
    engines."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), "doc_id")
    ranked = d.select(
        "source",
        "pos",
        F.row_number().over(w).alias("k"),
        F.sum("pos")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_pos"),
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(
                    F.when(
                        F.col("pos") == 1,
                        F.col("cum_pos").cast("double") / F.col("k"),
                    ).otherwise(0.0)
                )
                / F.sum("pos")
                - 1e-9,
                4,
            ).alias("average_precision"),
            F.round(
                F.sum("pos").cast("double") / F.count(F.lit(1)) - 1e-9, 4
            ).alias("prevalence"),
        )
        .filter(F.col("n_pos") > 0)
        .orderBy("source")
    )


BRIER_BINS = 10


@query(
    "brier_decomposition",
    f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    binned AS (
      SELECT y,
             ntile({BRIER_BINS}) OVER (ORDER BY n_chars, doc_id) AS b
      FROM d
    ),
    probs AS (
      SELECT y, b,
             (2.0 * b - 1.0) / (2.0 * {BRIER_BINS}) AS p
      FROM binned
    ),
    per_bin AS (
      SELECT b, max(p) AS p,
             CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(y) AS BIGINT) AS pos_k
      FROM probs GROUP BY b
    ),
    tot AS (
      SELECT CAST(sum(n_k) AS BIGINT) AS n,
             CAST(sum(pos_k) AS BIGINT) AS pos
      FROM per_bin
    )
    SELECT t.n,
           round(sum(p.n_k * (p.p - CAST(p.pos_k AS DOUBLE) / p.n_k)
                             * (p.p - CAST(p.pos_k AS DOUBLE) / p.n_k))
                 / t.n - 1e-9, 6) AS reliability,
           round(sum(p.n_k
                     * (CAST(p.pos_k AS DOUBLE) / p.n_k
                        - CAST(t.pos AS DOUBLE) / t.n)
                     * (CAST(p.pos_k AS DOUBLE) / p.n_k
                        - CAST(t.pos AS DOUBLE) / t.n))
                 / t.n - 1e-9, 6) AS resolution,
           round((CAST(t.pos AS DOUBLE) / t.n)
                 * (1.0 - CAST(t.pos AS DOUBLE) / t.n) - 1e-9, 6)
             AS uncertainty,
           round(sum(p.n_k * p.p * p.p
                     - 2.0 * p.p * p.pos_k + p.pos_k) / t.n - 1e-9, 6)
             AS brier_score
    FROM per_bin p, tot t
    GROUP BY t.n, t.pos
    """,
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score — BS = reliability −
    resolution + uncertainty — for a decile-grid forecaster of the
    ``lang='en'`` label (each length-decile predicts its grid midpoint
    probability, so predictions are constant within bins and the
    decomposition is EXACT; the emitted brier_score equals REL − RES +
    UNC to the last bit).  This is the canonical answer to "is my
    probability model calibrated, and does it actually discriminate?".

    All four terms are rational functions of exact integer bin counts
    (grid probabilities are fixed literals), so both engines compute
    identical doubles; the only distributed work is one sort for the
    decile ntile and one count aggregate per bin."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    binned = d.select(
        "y",
        F.ntile(BRIER_BINS).over(Window.orderBy("n_chars", "doc_id")).alias(
            "b"
        ),
    )
    probs = binned.withColumn(
        "p", (2.0 * F.col("b") - 1.0) / (2.0 * BRIER_BINS)
    )
    per_bin = probs.groupBy("b").agg(
        F.max("p").alias("p"),
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum("y").cast("long").alias("pos_k"),
    )
    w_tot = Window.partitionBy()
    t = per_bin.select(
        "*",
        F.sum("n_k").over(w_tot).alias("n"),
        F.sum("pos_k").over(w_tot).alias("pos"),
    )
    ybar_k = F.col("pos_k").cast("double") / F.col("n_k")
    ybar = F.col("pos").cast("double") / F.col("n")
    return t.groupBy("n", "pos").agg(
        F.round(
            F.sum(
                F.col("n_k") * (F.col("p") - ybar_k) * (F.col("p") - ybar_k)
            )
            / F.max("n")
            - 1e-9,
            6,
        ).alias("reliability"),
        F.round(
            F.sum(F.col("n_k") * (ybar_k - ybar) * (ybar_k - ybar))
            / F.max("n")
            - 1e-9,
            6,
        ).alias("resolution"),
        F.round(ybar * (1.0 - ybar) - 1e-9, 6).alias("uncertainty"),
        F.round(
            F.sum(
                F.col("n_k") * F.col("p") * F.col("p")
                - 2.0 * F.col("p") * F.col("pos_k")
                + F.col("pos_k")
            )
            / F.max("n")
            - 1e-9,
            6,
        ).alias("brier_score"),
    ).select(
        "n", "reliability", "resolution", "uncertainty", "brier_score"
    )


# Rater B flags a doc "dense" when spaces make up < 12% of characters —
# integer cross-multiplication keeps the threshold exact on both sides.
KAPPA_SPACE_PCT_X100 = 1200
KAPPA_LEN_THRESHOLD = 500


@query(
    "cohens_kappa_heuristics",
    f"""
    WITH r AS (
      SELECT lang,
             CASE WHEN n_chars >= {KAPPA_LEN_THRESHOLD} THEN 1 ELSE 0 END
               AS a,
             CASE WHEN 10000 * (length(text)
                                - length(replace(text, ' ', '')))
                       < {KAPPA_SPACE_PCT_X100} * length(text)
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    cm AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a * b) AS BIGINT) AS n11,
             CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
             CAST(sum((1 - a) * b) AS BIGINT) AS n01,
             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
      FROM r GROUP BY lang
    )
    SELECT lang, n, n11, n10, n01, n00,
           round((n11 + n00) * 1.0 / n - 1e-9, 4) AS p_observed,
           round(((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
                  + (n01 + n00) * CAST(n10 + n00 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * n) - 1e-9, 4) AS p_expected,
           round(((n11 + n00) * 1.0 / n
                  - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
                     + (n01 + n00) * CAST(n10 + n00 AS DOUBLE))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0 - ((n11 + n10) * CAST(n11 + n01 AS DOUBLE)
                           + (n01 + n00) * CAST(n10 + n00 AS DOUBLE))
                          / (CAST(n AS DOUBLE) * n)) - 1e-9, 4) + 0.0
             AS kappa
    FROM cm
    ORDER BY lang
    """,
)
def cohens_kappa_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ agreement between two independent document heuristics
    — rater A flags long documents (≥500 chars), rater B flags "dense"
    text (space ratio < 12%, decided by integer cross-multiplication so
    the boundary is exact) — per language: the chance-corrected
    agreement measure behind every labeling-quality audit.  κ = (p_o −
    p_e)/(1 − p_e) from the 2×2 confusion counts; one scan, one tiny
    groupBy, every input an exact integer."""
    d = load_table(spark, sf_dir, "documents")
    spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
    r = d.select(
        "lang",
        F.when(F.col("n_chars") >= KAPPA_LEN_THRESHOLD, 1)
        .otherwise(0)
        .alias("a"),
        F.when(
            10000 * spaces < KAPPA_SPACE_PCT_X100 * F.length("text"), 1
        )
        .otherwise(0)
        .alias("b"),
    )
    cm = r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")) * 1.0 / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10"))
        * (F.col("n11") + F.col("n01")).cast("double")
        + (F.col("n01") + F.col("n00"))
        * (F.col("n10") + F.col("n00")).cast("double")
    ) / (F.col("n").cast("double") * F.col("n"))
    return cm.select(
        "lang",
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po - 1e-9, 4).alias("p_observed"),
        F.round(pe - 1e-9, 4).alias("p_expected"),
        (F.round((po - pe) / (1.0 - pe) - 1e-9, 4) + 0.0).alias("kappa"),
    ).orderBy("lang")


@query(
    "jackknife_source_sensitivity",
    """
    WITH per_source AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(n_chars) AS BIGINT) AS s_g
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS g
      FROM per_source
    ),
    loo AS (
      SELECT p.source, p.n_g, t.g,
             CAST(t.s AS DOUBLE) / t.n AS theta,
             CAST(t.s - p.s_g AS DOUBLE) / (t.n - p.n_g) AS theta_loo
      FROM per_source p, tot t
    ),
    pseudo AS (
      SELECT source, n_g, g, theta,
             g * theta - (g - 1) * theta_loo AS pv,
             theta_loo,
             avg(theta_loo) OVER () AS loo_bar
      FROM loo
    )
    SELECT source,
           n_g AS n_docs,
           round(theta_loo - 1e-9, 4) AS loo_mean_chars,
           round(pv - 1e-9, 4) AS pseudovalue,
           round(theta_loo - theta - 1e-9, 4) AS influence,
           round(sqrt((g - 1.0) / g
                      * sum((theta_loo - loo_bar)
                            * (theta_loo - loo_bar)) OVER ())
                 - 1e-9, 4) AS jackknife_se
    FROM pseudo
    ORDER BY source
    """,
)
def jackknife_source_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife over sources for the corpus mean
    document length: each source's leave-it-out estimate, pseudovalue,
    influence (how much dropping that source moves the global mean),
    and the grouped-jackknife standard error — the resampling-free way
    to answer "which upstream feed dominates my corpus statistics, and
    what is their sampling uncertainty?".

    The totals-minus-group trick computes every leave-one-out estimate
    from ONE scan: per-source exact integer (count, sum) partials plus
    the grand total — no G rescans, which is what makes the jackknife
    viable when G is large and the facts are 100 TB.  All inputs are
    exact BIGINTs; the derived doubles are engine-identical."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("n_chars").cast("long").alias("s_g"),
    )
    w_tot = Window.partitionBy()
    t = per_source.select(
        "*",
        F.sum("n_g").over(w_tot).alias("n"),
        F.sum("s_g").over(w_tot).alias("s"),
        F.count(F.lit(1)).over(w_tot).alias("g"),
    )
    theta = F.col("s").cast("double") / F.col("n")
    theta_loo = (F.col("s") - F.col("s_g")).cast("double") / (
        F.col("n") - F.col("n_g")
    )
    pseudo = t.select(
        "source",
        "n_g",
        "g",
        theta.alias("theta"),
        theta_loo.alias("theta_loo"),
        (F.col("g") * theta - (F.col("g") - 1) * theta_loo).alias("pv"),
        F.avg(theta_loo).over(w_tot).alias("loo_bar"),
    )
    return pseudo.select(
        "source",
        F.col("n_g").alias("n_docs"),
        F.round(F.col("theta_loo") - 1e-9, 4).alias("loo_mean_chars"),
        F.round(F.col("pv") - 1e-9, 4).alias("pseudovalue"),
        F.round(F.col("theta_loo") - F.col("theta") - 1e-9, 4).alias(
            "influence"
        ),
        F.round(
            F.sqrt(
                (F.col("g") - 1.0)
                / F.col("g")
                * F.sum(
                    (F.col("theta_loo") - F.col("loo_bar"))
                    * (F.col("theta_loo") - F.col("loo_bar"))
                ).over(w_tot)
            )
            - 1e-9,
            4,
        ).alias("jackknife_se"),
    ).orderBy("source")


@query(
    "capture_recapture_dedup",
    """
    WITH flags AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN count(*) OVER (PARTITION BY md5(substr(
                    lower(trim(text)), 1, 128))) > 1
                  THEN 1 ELSE 0 END AS cap_a,
             CASE WHEN count(*) OVER (PARTITION BY md5(coalesce(
                    array_to_string(list_sort(regexp_split_to_array(
                      lower(trim(text)), '\\s+')), ' '), ''))) > 1
                  THEN 1 ELSE 0 END AS cap_b
      FROM documents
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(cap_a) AS BIGINT) AS n_dup_a,
             CAST(sum(cap_b) AS BIGINT) AS n_dup_b,
             CAST(sum(cap_a * cap_b) AS BIGINT) AS overlap,
             CAST(sum(CASE WHEN cap_a = 1 OR cap_b = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS union_caught
      FROM flags
    )
    SELECT n_docs, n_dup_a, n_dup_b, overlap, union_caught,
           round((n_dup_a + 1.0) * (n_dup_b + 1.0) / (overlap + 1.0)
                 - 1.0 - 1e-9, 2) AS chapman_total_dups,
           round(((n_dup_a + 1.0) * (n_dup_b + 1.0) / (overlap + 1.0)
                  - 1.0) - union_caught - 1e-9, 2) + 0.0 AS undetected_est,
           round(union_caught
                 / ((n_dup_a + 1.0) * (n_dup_b + 1.0) / (overlap + 1.0)
                    - 1.0) - 1e-9, 4) AS est_coverage
    FROM agg
    """,
)
def capture_recapture_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen capture-recapture (with the Chapman
    small-sample correction) applied to DEDUP COVERAGE: two imperfect
    duplicate detectors — a 128-char prefix hash and a bag-of-words
    hash — each "capture" a subset of the true duplicate population;
    from the two catch sizes and their overlap, ``N̂ = (n_A+1)(n_B+1)/
    (m+1) − 1`` estimates how many duplicates EXIST, including the ones
    neither method caught.  This is the standard answer to "what's our
    dedup recall?" when no labeled truth exists (same trick ecologists
    use for fish).

    Both detectors are one window over a deterministic md5 key (no
    joins); the estimator is arithmetic over five exact counts.  At
    100 TB each capture flag is a groupBy-count broadcast or window
    per hash — two shuffles total."""
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    prefix_hash = F.md5(F.substring(F.lower(F.trim(F.col("text"))), 1, 128))
    bow_hash = F.md5(
        F.coalesce(
            F.array_join(F.array_sort(T.tokens("text")), " "), F.lit("")
        )
    )
    flags = d.select(
        F.when(
            F.count(F.lit(1)).over(Window.partitionBy(prefix_hash)) > 1, 1
        )
        .otherwise(0)
        .alias("cap_a"),
        F.when(F.count(F.lit(1)).over(Window.partitionBy(bow_hash)) > 1, 1)
        .otherwise(0)
        .alias("cap_b"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("cap_a").cast("long").alias("n_dup_a"),
        F.sum("cap_b").cast("long").alias("n_dup_b"),
        F.sum(F.col("cap_a") * F.col("cap_b")).cast("long").alias("overlap"),
        F.sum(
            F.when((F.col("cap_a") == 1) | (F.col("cap_b") == 1), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("union_caught"),
    )
    chapman = (F.col("n_dup_a") + 1.0) * (F.col("n_dup_b") + 1.0) / (
        F.col("overlap") + 1.0
    ) - 1.0
    return agg.select(
        "n_docs",
        "n_dup_a",
        "n_dup_b",
        "overlap",
        "union_caught",
        F.round(chapman - 1e-9, 2).alias("chapman_total_dups"),
        (F.round(chapman - F.col("union_caught") - 1e-9, 2) + 0.0).alias(
            "undetected_est"
        ),
        F.round(F.col("union_caught") / chapman - 1e-9, 4).alias(
            "est_coverage"
        ),
    )


@query(
    "g_test_source_lang",
    """
    WITH obs AS MATERIALIZED (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY source, lang
    ),
    margins AS (
      SELECT o.source, o.lang, o.o,
             rs.n * cs.n * 1.0 / (SELECT sum(o) FROM obs) AS e
      FROM obs o
      JOIN (SELECT source, sum(o) AS n FROM obs GROUP BY source) rs
        ON rs.source = o.source
      JOIN (SELECT lang, sum(o) AS n FROM obs GROUP BY lang) cs
        ON cs.lang = o.lang
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT source) - 1)
                * (count(DISTINCT lang) - 1) AS BIGINT) AS dof,
           round(2 * sum(o * ln(o / e)) - 1e-9, 4) AS g_stat,
           round(2 * sum(o * ln(o / e))
                 / (2 * (SELECT sum(o) FROM obs)) - 1e-9, 6)
             AS mutual_info_nats
    FROM margins
    """,
)
def g_test_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood ratio) of source×lang independence — the
    information-theoretic twin of :func:`queries_corpus.
    chi2_source_lang`: ``G = 2Σ o·ln(o/e)`` equals ``2N·I(source;
    lang)`` exactly, so the mutual information falls out for free
    (emitted in nats) — χ² is only its second-order Taylor
    approximation, and they diverge exactly where it matters (cells
    with large o/e ratios).  Same one-scan contingency-table scale
    shape as the χ² query; zero-count cells never appear in the obs
    table so o·ln(o/e) is always finite."""
    docs = load_table(spark, sf_dir, "documents")
    # the contingency table feeds margins, totals AND the statistic —
    # checkpoint the ~100-cell frame so documents is scanned once
    obs = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    ).localCheckpoint()
    rs = obs.groupBy("source").agg(F.sum("o").alias("rn"))
    cs = obs.groupBy("lang").agg(F.sum("o").alias("cn"))
    tot = obs.agg(F.sum("o").alias("tn"))
    m = (
        obs.join(F.broadcast(rs), "source")
        .join(F.broadcast(cs), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "o",
            (F.col("rn") * F.col("cn") / F.col("tn")).alias("e"),
            "tn",
        )
    )
    g = 2 * F.sum(F.col("o") * F.log(F.col("o") / F.col("e")))
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            (F.countDistinct("source") - 1) * (F.countDistinct("lang") - 1)
        ).cast("long").alias("dof"),
        F.round(g - 1e-9, 4).alias("g_stat"),
        F.round(g / (2 * F.first("tn")) - 1e-9, 6).alias(
            "mutual_info_nats"
        ),
    )


@query(
    "cochran_armitage_trend",
    f"""
    WITH cust AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS spend,
             CASE WHEN count(*) >= 12 THEN 1 ELSE 0 END AS repeat_c
      FROM orders GROUP BY o_custkey
    ),
    binned AS (
      SELECT repeat_c,
             ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
      FROM cust
    ),
    per AS MATERIALIZED (
      SELECT decile AS s,
             CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(repeat_c) AS BIGINT) AS r_i
      FROM binned GROUP BY decile
    ),
    tot AS (
      SELECT CAST(sum(n_i) AS BIGINT) AS n,
             CAST(sum(r_i) AS BIGINT) AS r,
             CAST(sum(s * n_i) AS BIGINT) AS sn,
             CAST(sum(s * s * n_i) AS BIGINT) AS ssn,
             CAST(sum(s * r_i) AS BIGINT) AS sr
      FROM per
    )
    SELECT n AS n_customers, r AS n_loyal,
           round((CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) * r / n)
                 / sqrt((CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
                        * (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / n))
                 - 1e-9, 4) AS z_trend,
           round(pow((CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) * r / n), 2)
                 / ((CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
                    * (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / n))
                 - 1e-9, 4) AS chi2_trend,
           coalesce(
             round(pow((CAST(sr AS DOUBLE) - CAST(sn AS DOUBLE) * r / n), 2)
                 / ((CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
                    * (CAST(ssn AS DOUBLE) - CAST(sn AS DOUBLE) * sn / n))
                 - 1e-9, 4) > {CHI2_95_DF1!r}, false) AS reject_no_trend
    FROM tot
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a LINEAR TREND in loyal-customer rate
    (12+ orders — the decile_lift_loyal outcome; >=2 is degenerate here,
    every customer reorders) across spend deciles — the right test when categories are ORDERED
    (a plain χ² ignores the ordering and wastes power): with integer
    scores s=1..10, ``T = Σs·r − (Σs·n)·R/N`` and ``z = T/sqrt(p̄(1−p̄)
    (Σs²n − (Σsn)²/N))``.  Every moment is an exact BIGINT over ten
    decile rows (the fact table collapses to per-customer exact cents
    first, then one ntile sort), so z is engine-identical; the
    rejection flag compares the ROUNDED χ²=z² to the critical value."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(cents).cast("long").alias("spend"),
        F.when(F.count(F.lit(1)) >= 12, 1).otherwise(0).alias("repeat_c"),
    )
    binned = cust.select(
        "repeat_c",
        F.ntile(10).over(Window.orderBy("spend", "o_custkey")).alias("s"),
    )
    per = binned.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum("repeat_c").cast("long").alias("r_i"),
    )
    tot = per.agg(
        F.sum("n_i").cast("long").alias("n"),
        F.sum("r_i").cast("long").alias("r"),
        F.sum(F.col("s") * F.col("n_i")).cast("long").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i"))
        .cast("long")
        .alias("ssn"),
        F.sum(F.col("s") * F.col("r_i")).cast("long").alias("sr"),
    )
    pbar = F.col("r").cast("double") / F.col("n")
    t_num = F.col("sr").cast("double") - F.col("sn").cast("double") * F.col(
        "r"
    ) / F.col("n")
    denom = pbar * (1.0 - pbar) * (
        F.col("ssn").cast("double")
        - F.col("sn").cast("double") * F.col("sn") / F.col("n")
    )
    chi2_r = F.round(F.pow(t_num, 2) / denom - 1e-9, 4)
    return tot.select(
        F.col("n").alias("n_customers"),
        F.col("r").alias("n_loyal"),
        F.round(t_num / F.sqrt(denom) - 1e-9, 4).alias("z_trend"),
        chi2_r.alias("chi2_trend"),
        # no evidence on an empty cohort = non-rejection (r11 wilcoxon)
        F.coalesce(chi2_r > CHI2_95_DF1, F.lit(False)).alias(
            "reject_no_trend"
        ),
    )


KDE_GRID_POINTS = 20


@query(
    "kde_doc_length",
    f"""
    WITH cells AS MATERIALIZED (
      SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY n_chars
    ),
    mom AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(v * c) AS BIGINT) AS s1,
             CAST(sum(v * v * c) AS BIGINT) AS s2,
             CAST(min(v) AS BIGINT) AS lo,
             CAST(max(v) AS BIGINT) AS hi
      FROM cells
    ),
    bw AS (
      SELECT n, lo, hi,
             1.06 * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                         / (n - 1))
                  * pow(CAST(n AS DOUBLE), -0.2) AS h
      FROM mom
    ),
    grid AS (
      SELECT g.g,
             b.lo + (b.hi - b.lo) * (g.g - 1.0)
               / ({KDE_GRID_POINTS} - 1.0) AS x,
             b.h, b.n
      FROM (SELECT unnest(range(1, {KDE_GRID_POINTS} + 1)) AS g) g
      CROSS JOIN bw b
    )
    SELECT CAST(g.g AS BIGINT) AS grid_idx,
           round(g.x - 1e-9, 2) AS grid_x,
           round(sum(c.c * exp(-(c.v - g.x) * (c.v - g.x)
                               / (2 * g.h * g.h)))
                 / (g.n * g.h * sqrt(2 * pi())) * 1000000 - 1e-9, 4)
             AS density_ppm
    FROM grid g CROSS JOIN cells c
    GROUP BY g.g, g.x, g.h, g.n
    ORDER BY grid_idx
    """,
)
def kde_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian kernel density estimate of the document-length
    distribution at 20 evenly-spaced grid points, with the Silverman
    rule-of-thumb bandwidth from exact integer moments — the smooth
    answer to "what does my length distribution actually look like"
    that histograms quantize away (multimodality from mixed sources
    shows up as separated humps).

    Scale shape: REDUCE FIRST — the corpus collapses to its distinct-
    value histogram (|V| cells ≪ N docs) in one map-side-combined
    count, and the kernel sum runs on grid × cells, never grid × docs;
    the same two-level shape holds at 100 TB with a coarser pre-bin.
    Bandwidth and grid are exact-integer-derived doubles; each exp
    term applies identical IEEE ops on both engines."""
    d = load_table(spark, sf_dir, "documents")
    # the |V|-cell histogram feeds both the moments and the kernel sum —
    # checkpoint so the corpus is scanned exactly once
    cells = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint()
    mom = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("s1"),
        F.sum(F.col("v") * F.col("v") * F.col("c")).cast("long").alias("s2"),
        F.min("v").cast("long").alias("lo"),
        F.max("v").cast("long").alias("hi"),
    )
    bw = mom.select(
        "n",
        "lo",
        "hi",
        (
            1.06
            * F.sqrt(
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1") / F.col("n")
                )
                / (F.col("n") - 1)
            )
            * F.pow(F.col("n").cast("double"), -0.2)
        ).alias("h"),
    )
    grid = (
        spark.range(1, KDE_GRID_POINTS + 1)
        .select(F.col("id").alias("g"))
        .crossJoin(F.broadcast(bw))
        .select(
            "g",
            (
                F.col("lo")
                + (F.col("hi") - F.col("lo"))
                * (F.col("g") - 1.0)
                / (KDE_GRID_POINTS - 1.0)
            ).alias("x"),
            "h",
            "n",
        )
    )
    kern = F.col("c") * F.exp(
        -(F.col("v") - F.col("x"))
        * (F.col("v") - F.col("x"))
        / (2 * F.col("h") * F.col("h"))
    )
    return (
        grid.crossJoin(cells)
        .groupBy("g", "x", "h", "n")
        .agg(
            F.round(
                F.sum(kern)
                / (F.col("n") * F.col("h") * F.sqrt(F.lit(2 * 3.141592653589793)))
                * 1000000
                - 1e-9,
                4,
            ).alias("density_ppm")
        )
        .select(
            F.col("g").cast("long").alias("grid_idx"),
            F.round(F.col("x") - 1e-9, 2).alias("grid_x"),
            "density_ppm",
        )
        .orderBy("grid_idx")
    )


NW_LAGS = 5
Z_95 = 1.96


@query(
    "newey_west_mean_ci",
    f"""
    WITH daily AS (
      SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents,
             row_number() OVER (ORDER BY o_orderdate) AS t
      FROM orders GROUP BY o_orderdate
    ),
    mom AS (
      SELECT CAST(count(*) AS BIGINT) AS tt,
             CAST(sum(cents) AS BIGINT) AS s1
      FROM daily
    ),
    dev AS MATERIALIZED (
      SELECT d.t, d.cents - CAST(m.s1 AS DOUBLE) / m.tt AS e, m.tt
      FROM daily d CROSS JOIN mom m
    ),
    lagged AS (
      SELECT t, e, tt,
             {", ".join(f"lag(e, {j}) OVER (ORDER BY t) AS e{j}"
                        for j in range(1, NW_LAGS + 1))}
      FROM dev
    ),
    gam AS (
      SELECT max(tt) AS tt,
             sum(e * e) / max(tt) AS g0,
             {", ".join(
               f"sum(CASE WHEN e{j} IS NULL THEN 0 ELSE e * e{j} END)"
               f" / max(tt) AS g{j}" for j in range(1, NW_LAGS + 1))}
      FROM lagged
    ),
    s AS (
      SELECT tt, g0,
             g0 + 2 * ({" + ".join(
               f"(1.0 - {j}.0 / {NW_LAGS + 1}) * g{j}"
               for j in range(1, NW_LAGS + 1))}) AS s_hac,
             (SELECT CAST(s1 AS DOUBLE) / tt FROM mom) AS mu
      FROM gam
    )
    SELECT CAST(tt AS BIGINT) AS n_days,
           round(mu / 100.0 - 1e-9, 2) AS mean_usd,
           round(sqrt(g0 / tt) / 100.0 - 1e-9, 2) AS se_iid_usd,
           round(sqrt(s_hac / tt) / 100.0 - 1e-9, 2) AS se_hac_usd,
           round(sqrt(s_hac / g0) - 1e-9, 4) AS se_inflation,
           round((mu - {Z_95!r} * sqrt(s_hac / tt)) / 100.0 - 1e-9, 2)
             AS ci_lo_usd,
           round((mu + {Z_95!r} * sqrt(s_hac / tt)) / 100.0 - 1e-9, 2)
             AS ci_hi_usd
    FROM s
    """,
)
def newey_west_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West HAC confidence interval for mean daily revenue: the
    Bartlett-weighted long-run variance ``S = γ₀ + 2Σ(1−j/(L+1))γⱼ``
    (L=5) replaces the iid variance, widening the CI by the
    autocorrelation the naive SE ignores — se_inflation says exactly
    how wrong the iid answer was (revenue series are serially
    correlated; an iid CI on them is fiction).

    Scale shape: facts reduce to one exact-cent row per day; all five
    lags ride ONE ordered window pass over the tiny series; the
    autocovariances are O(1) aggregates.  μ comes from exact integer
    sums so deviations are bit-identical doubles; the -1e-9-guarded
    rounding absorbs the order-dependent covariance sums."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    # the day-collapsed series feeds moments, deviations and mu —
    # checkpoint the ~2.5k-row frame so orders is scanned once
    daily = orders.groupBy("o_orderdate").agg(
        F.sum(cents).cast("long").alias("cents")
    ).select(
        "cents", F.row_number().over(Window.orderBy("o_orderdate")).alias("t")
    ).localCheckpoint()
    mom = daily.agg(
        F.count(F.lit(1)).cast("long").alias("tt"),
        F.sum("cents").cast("long").alias("s1"),
    )
    dev = daily.crossJoin(F.broadcast(mom)).select(
        "t",
        (F.col("cents") - F.col("s1").cast("double") / F.col("tt")).alias(
            "e"
        ),
        "tt",
    )
    wo = Window.orderBy("t")
    lagged = dev.select(
        "e",
        "tt",
        *[F.lag("e", j).over(wo).alias(f"e{j}") for j in range(1, NW_LAGS + 1)],
    )
    gam = lagged.agg(
        F.max("tt").alias("tt"),
        (F.sum(F.col("e") * F.col("e")) / F.max("tt")).alias("g0"),
        *[
            (
                F.sum(
                    F.when(F.col(f"e{j}").isNull(), 0.0).otherwise(
                        F.col("e") * F.col(f"e{j}")
                    )
                )
                / F.max("tt")
            ).alias(f"g{j}")
            for j in range(1, NW_LAGS + 1)
        ],
    )
    s_hac = F.col("g0") + 2 * sum(
        (1.0 - j / (NW_LAGS + 1)) * F.col(f"g{j}")
        for j in range(1, NW_LAGS + 1)
    )
    mu = mom.select(
        (F.col("s1").cast("double") / F.col("tt")).alias("mu")
    )
    out = gam.withColumn("s_hac", s_hac).crossJoin(F.broadcast(mu))
    return out.select(
        F.col("tt").cast("long").alias("n_days"),
        F.round(F.col("mu") / 100.0 - 1e-9, 2).alias("mean_usd"),
        F.round(
            F.sqrt(F.col("g0") / F.col("tt")) / 100.0 - 1e-9, 2
        ).alias("se_iid_usd"),
        F.round(
            F.sqrt(F.col("s_hac") / F.col("tt")) / 100.0 - 1e-9, 2
        ).alias("se_hac_usd"),
        F.round(F.sqrt(F.col("s_hac") / F.col("g0")) - 1e-9, 4).alias(
            "se_inflation"
        ),
        F.round(
            (F.col("mu") - Z_95 * F.sqrt(F.col("s_hac") / F.col("tt")))
            / 100.0
            - 1e-9,
            2,
        ).alias("ci_lo_usd"),
        F.round(
            (F.col("mu") + Z_95 * F.sqrt(F.col("s_hac") / F.col("tt")))
            / 100.0
            - 1e-9,
            2,
        ).alias("ci_hi_usd"),
    )


# Abramowitz & Stegun 26.2.17 normal-tail polynomial — literal
# coefficients evaluated with the SAME Horner expression on both
# engines, so p-values are bit-identical doubles.
_AS_T0 = 0.2316419
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327
BH_Q = 0.10  # target false-discovery rate


def _sql_two_sided_p(z: str) -> str:
    b1, b2, b3, b4, b5 = _AS_B
    return (
        f"2.0 * ({_INV_SQRT_2PI} * exp(-(({z}) * ({z})) / 2.0)"
        f" * ((((({b5} * (1.0 / (1.0 + {_AS_T0} * abs({z})))"
        f" + {b4}) * (1.0 / (1.0 + {_AS_T0} * abs({z})))"
        f" + {b3}) * (1.0 / (1.0 + {_AS_T0} * abs({z})))"
        f" + {b2}) * (1.0 / (1.0 + {_AS_T0} * abs({z})))"
        f" + {b1}) * (1.0 / (1.0 + {_AS_T0} * abs({z})))))"
    )


@query(
    "bh_fdr_nation_tests",
    f"""
    WITH x AS (
      SELECT c.c_nationkey AS nationkey,
             CAST(floor(o.o_totalprice) AS BIGINT) AS dol
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    per AS (
      SELECT nationkey,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dol) AS BIGINT) AS sx,
             CAST(sum(dol * dol) AS BIGINT) AS sxx
      FROM x GROUP BY nationkey
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(sx) AS BIGINT) AS sxt
      FROM per
    ),
    zed AS MATERIALIZED (
      SELECT p.nationkey, p.n,
             (CAST(p.sx AS DOUBLE) / p.n - CAST(t.sxt AS DOUBLE) / t.nt)
               / sqrt((CAST(p.sxx AS DOUBLE) / p.n
                       - (CAST(p.sx AS DOUBLE) / p.n)
                         * (CAST(p.sx AS DOUBLE) / p.n)) / p.n) AS z
      FROM per p CROSS JOIN tot t
    ),
    pvals AS MATERIALIZED (
      SELECT nationkey, n, z, {_sql_two_sided_p("z")} AS p FROM zed
    ),
    ranked AS (
      SELECT nationkey, n, z, p,
             CAST(row_number() OVER (ORDER BY p, nationkey) AS BIGINT)
               AS rk,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pvals
    ),
    cut AS (
      SELECT coalesce(max(CASE WHEN p <= rk * {BH_Q} / m THEN rk END), 0)
               AS k_star
      FROM ranked
    )
    SELECT r.nationkey, r.n, round(r.z - 1e-9, 4) AS z,
           round(r.p - 1e-9, 6) AS p_value,
           round(r.rk * {BH_Q} / r.m - 1e-9, 6) AS bh_threshold,
           r.rk <= c.k_star AS rejected
    FROM ranked r CROSS JOIN cut c
    ORDER BY r.nationkey
    """,
)
def bh_fdr_nation_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate control (JRSS-B 1995 —
    THE multiple-testing correction) over the 25 simultaneous
    per-nation "does this nation's mean order value differ from the
    global mean" z-tests: rank p-values ascending, find the largest k
    with p_(k) ≤ k·q/m, reject exactly ranks 1..k (step-up).  Running
    25 uncorrected tests at α=0.05 expects ≥1 false alarm; BH caps the
    EXPECTED false-discovery fraction at q={BH_Q} — the correction the
    per-segment drift/DQ batteries in this repo should feed before
    anyone pages an on-call.

    p-values come from the Abramowitz-Stegun 26.2.17 tail polynomial —
    literal coefficients in an identical Horner chain on both engines,
    over z-scores derived from exact integer-dollar moments, so every
    boundary call is made on bit-identical doubles.  Scale shape: one
    co-partitioned fact join collapses to 25 moment rows; ranking and
    the step-up cut are windows on that tiny frame."""
    x = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey", F.floor("o_totalprice").cast("long").alias("dol")
        )
        .join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_nationkey").alias("nationkey"),
            ),
            "o_custkey",
        )
    )
    per = x.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dol").cast("long").alias("sx"),
        F.sum(F.col("dol") * F.col("dol")).cast("long").alias("sxx"),
    )
    w = Window.partitionBy()
    zed = per.select(
        "nationkey",
        "n",
        (
            (F.col("sx").cast("double") / F.col("n")
             - F.sum("sx").over(w).cast("double") / F.sum("n").over(w))
            / F.sqrt(
                (
                    F.col("sxx").cast("double") / F.col("n")
                    - (F.col("sx").cast("double") / F.col("n"))
                    * (F.col("sx").cast("double") / F.col("n"))
                )
                / F.col("n")
            )
        ).alias("z"),
    )
    t = 1.0 / (1.0 + _AS_T0 * F.abs(F.col("z")))
    b1, b2, b3, b4, b5 = _AS_B
    p = 2.0 * (
        _INV_SQRT_2PI
        * F.exp(-(F.col("z") * F.col("z")) / 2.0)
        * (((((b5 * t + b4) * t + b3) * t + b2) * t + b1) * t)
    )
    ranked = zed.withColumn("p", p).select(
        "nationkey",
        "n",
        "z",
        "p",
        F.row_number()
        .over(Window.partitionBy().orderBy("p", "nationkey"))
        .cast("long")
        .alias("rk"),
        F.count(F.lit(1)).over(w).cast("long").alias("m"),
    )
    k_star = F.coalesce(
        F.max(
            F.when(
                F.col("p") <= F.col("rk") * BH_Q / F.col("m"), F.col("rk")
            )
        ).over(w),
        F.lit(0),
    )
    return (
        ranked.withColumn("k_star", k_star)
        .select(
            "nationkey",
            "n",
            F.round(F.col("z") - 1e-9, 4).alias("z"),
            F.round(F.col("p") - 1e-9, 6).alias("p_value"),
            F.round(F.col("rk") * BH_Q / F.col("m") - 1e-9, 6).alias(
                "bh_threshold"
            ),
            (F.col("rk") <= F.col("k_star")).alias("rejected"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# generalized ESD (iterative Grubbs) outlier detection
# --------------------------------------------------------------------------
ESD_ROUNDS = 3
ESD_LAMBDA = 3.5  # fixed three-sigma-family critical value


def _esd_round(prev: str, rnd: int) -> str:
    """One ESD round over the surviving daily frame: exact integer
    moments -> |z| argmax -> peel it."""
    return f"""
, st{rnd} AS (
  SELECT *,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(sum(dol) OVER () AS BIGINT) AS s1,
         CAST(sum(dol * dol) OVER () AS BIGINT) AS s2
  FROM {prev}
),
z{rnd} AS (
  SELECT *,
         abs(dol - CAST(s1 AS DOUBLE) / n)
           / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                  / (n - 1)) AS r,
         row_number() OVER (
           ORDER BY abs(dol - CAST(s1 AS DOUBLE) / n) DESC, dd) AS rk
  FROM st{rnd}
),
out{rnd} AS (
  SELECT CAST({rnd} AS BIGINT) AS seq, dd, dol, r FROM z{rnd} WHERE rk = 1
),
keep{rnd} AS (
  SELECT dd, dol FROM z{rnd} WHERE rk > 1
)"""


def _esd_tail(epoch_expr: str) -> str:
    unions = " UNION ALL ".join(
        f"SELECT * FROM out{r}" for r in range(1, ESD_ROUNDS + 1)
    )
    return f"""
, cand AS ({unions}),
flagged AS (
  SELECT seq, dd, dol, r,
         coalesce(max(CASE WHEN r > {ESD_LAMBDA} THEN seq END)
                    OVER (), 0) AS k_star
  FROM cand
)
SELECT seq, {epoch_expr} AS day_ms,
       dol AS revenue_usd,
       round(r - 1e-9, 4) AS esd_stat,
       CAST({ESD_LAMBDA} AS DOUBLE) AS lambda_crit,
       seq <= k_star AS is_outlier
FROM flagged ORDER BY seq
"""


def _esd_sql(table: str) -> str:
    sql = f"""
WITH keep0 AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS dd,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS dol
  FROM {table}
  GROUP BY 1
)"""
    for r in range(1, ESD_ROUNDS + 1):
        sql += _esd_round(f"keep{r - 1}", r)
    return sql + _esd_tail("epoch_ms(CAST(dd AS TIMESTAMP))")


@query(
    "esd_outlier_days",
    _esd_sql("orders").replace(
        "epoch_ms(CAST(dd AS TIMESTAMP))", "epoch_ms(CAST(dd AS TIMESTAMP))"
    ),
)
def esd_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD outlier detection (Rosner 1983, the engine
    inside Twitter's S-H-ESD anomaly detector) on daily revenue:
    iteratively peel the most extreme |x−x̄|/s day and RE-ESTIMATE the
    moments before testing the next — the masking-resistant upgrade
    over a one-shot z-threshold, which a cluster of outliers can hide
    from by inflating s.  Up to {ESD_ROUNDS} candidates are tested
    against a fixed λ={ESD_LAMBDA} (three-sigma-family; the exact
    Rosner λ_i needs t-quantiles neither SQL dialect has) and the
    step-up rule flags every candidate up to the last exceedance.

    Determinism: moments are exact integer-dollar sums, so each
    round's argmax pick (day tiebreak) and statistic are engine-
    identical.  Scale shape: the fact scan collapses to one row per
    day FIRST and is MATERIALIZED once; each peel round is window
    passes over the tiny daily frame."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "esd_orders"
    )
    daily = spark.sql("""
      SELECT CAST(o_orderdate AS DATE) AS dd,
             CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS dol
      FROM esd_orders GROUP BY 1
    """).localCheckpoint()
    daily.createOrReplaceTempView("esd_keep0")
    # same round/flag text as the oracle, but rooted at the
    # checkpointed daily view (Spark would otherwise inline the fact
    # scan 2^rounds times) and emitting epoch millis Spark-side
    body = "WITH keep0 AS (SELECT dd, dol FROM esd_keep0)"
    for r in range(1, ESD_ROUNDS + 1):
        body += _esd_round(f"keep{r - 1}", r)
    body += _esd_tail("unix_millis(CAST(dd AS TIMESTAMP))")
    return spark.sql(body)


# --------------------------------------------------------------------------
# permutation test (md5-seeded exact resampling)
# --------------------------------------------------------------------------
PERM_B = 64  # label permutations


@query(
    "permutation_test_segments",
    f"""
    WITH x AS MATERIALIZED (
      SELECT c_custkey AS id,
             c_mktsegment = 'AUTOMOBILE' AS grp,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
    ),
    sizes AS (
      SELECT CAST(sum(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN grp THEN cents ELSE 0 END) AS BIGINT)
               AS sa,
             CAST(sum(cents) AS BIGINT) AS st
      FROM x
    ),
    perms AS (
      SELECT x.id, x.cents, CAST(b.range AS BIGINT) AS b,
             row_number() OVER (
               PARTITION BY b.range
               ORDER BY md5(concat('perm0|', b.range, '|', x.id)), x.id)
               AS rnk
      FROM x CROSS JOIN range({PERM_B}) b
    ),
    perm_stats AS MATERIALIZED (
      SELECT p.b,
             abs(CAST(sum(CASE WHEN p.rnk <= s.na THEN p.cents ELSE 0 END)
                      AS DOUBLE) / s.na
                 - CAST(s.st - sum(CASE WHEN p.rnk <= s.na
                                   THEN p.cents ELSE 0 END) AS DOUBLE)
                   / (s.n - s.na)) AS stat
      FROM perms p CROSS JOIN sizes s
      GROUP BY p.b, s.na, s.n, s.st
    ),
    observed AS (
      SELECT abs(CAST(sa AS DOUBLE) / na
                 - CAST(st - sa AS DOUBLE) / (n - na)) AS obs,
             na, n FROM sizes
    )
    SELECT o.na AS n_auto, o.n - o.na AS n_household,
           round(o.obs / 100.0 - 1e-9, 4) AS observed_gap_usd,
           CAST({PERM_B} AS BIGINT) AS n_perms,
           CAST(sum(CASE WHEN round(p.stat - 1e-9, 4)
                              >= round(o.obs - 1e-9, 4)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_as_extreme,
           round((sum(CASE WHEN round(p.stat - 1e-9, 4)
                                >= round(o.obs - 1e-9, 4)
                      THEN 1 ELSE 0 END) + 1.0)
                 / ({PERM_B} + 1.0) - 1e-9, 4) AS p_value
    FROM perm_stats p CROSS JOIN observed o
    GROUP BY o.na, o.n, o.obs
    """,
)
def permutation_test_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-resampling permutation test (Fisher's distribution-free
    inference — no normality assumption, unlike ``welch_ttest_segments``
    on the same comparison): the mean-balance gap between AUTOMOBILE
    and HOUSEHOLD customers is compared against {PERM_B} md5-seeded
    label permutations (rank by a keyed hash = a reproducible uniform
    shuffle), with the add-one p-value (Phipson-Smyth) that keeps the
    estimate valid at finite B.

    Every permutation's group sums are EXACT integers (the hash ranks
    are identical on both engines), so the only doubles are the final
    means — rounded before the as-extreme comparison so both engines
    count the same exceedances.  Scale shape: the fan-out is
    B × rows with ONE window per permutation partition; at 100 TB
    you'd keep B moderate and the frame pre-aggregated — the shape
    stays one shuffle keyed by (b)."""
    x = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD"))
        .select(
            F.col("c_custkey").alias("id"),
            (F.col("c_mktsegment") == "AUTOMOBILE").alias("grp"),
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
    )
    x.persist()
    sizes = x.agg(
        F.sum(F.when(F.col("grp"), 1).otherwise(0)).cast("long").alias("na"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("grp"), F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sa"),
        F.sum("cents").cast("long").alias("st"),
    )
    perms = x.select(
        "id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(PERM_B - 1))).alias("b"),
    ).withColumn("b", F.col("b").cast("long"))
    perms = perms.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("b").orderBy(
                F.md5(
                    F.concat(
                        F.lit("perm0|"),
                        F.col("b").cast("string"),
                        F.lit("|"),
                        F.col("id").cast("string"),
                    )
                ),
                "id",
            )
        ),
    )
    ps = (
        perms.crossJoin(F.broadcast(sizes))
        .groupBy("b", "na", "n", "st")
        .agg(
            F.sum(
                F.when(F.col("rnk") <= F.col("na"), F.col("cents")).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("sa_perm")
        )
        .select(
            "b",
            F.abs(
                F.col("sa_perm").cast("double") / F.col("na")
                - (F.col("st") - F.col("sa_perm")).cast("double")
                / (F.col("n") - F.col("na"))
            ).alias("stat"),
        )
    )
    obs = sizes.select(
        "na",
        "n",
        F.abs(
            F.col("sa").cast("double") / F.col("na")
            - (F.col("st") - F.col("sa")).cast("double")
            / (F.col("n") - F.col("na"))
        ).alias("obs"),
    )
    extreme = F.sum(
        F.when(
            F.round(F.col("stat") - 1e-9, 4)
            >= F.round(F.col("obs") - 1e-9, 4),
            1,
        ).otherwise(0)
    )
    out = (
        ps.crossJoin(F.broadcast(obs))
        .groupBy("na", "n", "obs")
        .agg(extreme.cast("long").alias("n_as_extreme"))
        .select(
            F.col("na").alias("n_auto"),
            (F.col("n") - F.col("na")).alias("n_household"),
            F.round(F.col("obs") / 100.0 - 1e-9, 4).alias(
                "observed_gap_usd"
            ),
            F.lit(PERM_B).cast("long").alias("n_perms"),
            "n_as_extreme",
            F.round(
                (F.col("n_as_extreme") + 1.0) / (PERM_B + 1.0) - 1e-9, 4
            ).alias("p_value"),
        )
    )
    result = out.localCheckpoint()
    x.unpersist()
    return result


# --------------------------------------------------------------------------
# Mahalanobis outliers in the embedding (dim1, dim2) plane
# --------------------------------------------------------------------------
_MAHAL_SQL = """
WITH pts AS {MAT}(
  SELECT vec_id,
         CAST(floor({E1} * 10000 + 0.5) AS BIGINT) AS x,
         CAST(floor({E2} * 10000 + 0.5) AS BIGINT) AS y
  FROM {embeddings}
),
m AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM pts
),
cov AS {MAT}(
  -- centered second moments (x n): embeddings are near-zero-mean so
  -- the cancellation here is mild — plain double products suffice
  SELECT n,
         CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my,
         (sxx - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS vxx,
         (syy - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS vyy,
         (sxy - CAST(sx AS DOUBLE) * sy / n) / (n - 1) AS vxy
  FROM m
),
d2 AS {MAT}(
  SELECT p.vec_id,
         round(((p.x - c.mx) * (p.x - c.mx) * c.vyy
                - 2.0 * (p.x - c.mx) * (p.y - c.my) * c.vxy
                + (p.y - c.my) * (p.y - c.my) * c.vxx)
               / (c.vxx * c.vyy - c.vxy * c.vxy) - 1e-9, 4) + 0.0
           AS md2
  FROM pts p CROSS JOIN cov c
)
SELECT vec_id,
       md2 AS mahalanobis_d2,
       CASE WHEN md2 > 9.21 THEN CAST(1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS outlier_chi2_99
FROM (
  SELECT vec_id, md2,
         row_number() OVER (ORDER BY md2 DESC, vec_id) AS rk
  FROM d2
) WHERE rk <= 10
ORDER BY mahalanobis_d2 DESC, vec_id
"""


@query(
    "mahalanobis_outliers_2d",
    _MAHAL_SQL.replace("{embeddings}", "embeddings")
    .replace("{E1}", "CAST(embedding[1] AS DOUBLE)")
    .replace("{E2}", "CAST(embedding[2] AS DOUBLE)")
    .replace("{MAT}", "MATERIALIZED "),
)
def mahalanobis_outliers_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 Mahalanobis outliers in the (dim1, dim2) embedding plane
    with the χ²₂ 99% flag (d² > 9.21) — the MULTIVARIATE outlier
    screen: a point can be unremarkable on every marginal (so
    ``mad_outliers``/z-scores stay silent) yet sit far off the
    correlation ridge, and Mahalanobis distance is exactly that
    covariance-aware distance.

    Determinism: coordinates quantize to 1e-4 integers at the scan so
    all five moments are exact BIGINTs; the 2×2 covariance solves in
    plain doubles (embeddings are near-zero-mean, so the centered-
    moment cancellation is mild — the catastrophic-cancellation
    HUGEINT escalation of ``bass_diffusion_fit`` is not needed one
    degree down); d² rounds to 4 dp BEFORE the top-10 cut, whose order
    ties break on vec_id.  tests/test_wave18.py plants an off-ridge
    point that is marginal-modest yet must rank first.

    Scale shape: one scan to moments (44 numbers shuffle), one
    broadcast of the 1-row covariance back over the scan, one
    global top-10."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "mahal_embeddings"
    )
    return spark.sql(
        _MAHAL_SQL.replace("{embeddings}", "mahal_embeddings")
        .replace("{E1}", "CAST(element_at(embedding, 1) AS DOUBLE)")
        .replace("{E2}", "CAST(element_at(embedding, 2) AS DOUBLE)")
        .replace("{MAT}", "")
    )


def mahalanobis_frame(pts: DataFrame) -> DataFrame:
    """Top-10 Mahalanobis over any (vec_id, x, y) integer frame; see
    :func:`mahalanobis_outliers_2d`."""
    pts.createOrReplaceTempView("mahal_pts_frame")
    sql = _MAHAL_SQL.replace("{MAT}", "")
    head = sql.index("m AS ")
    return pts.sparkSession.sql(
        "WITH pts AS (SELECT vec_id, CAST(x AS BIGINT) AS x,"
        " CAST(y AS BIGINT) AS y FROM mahal_pts_frame),\n" + sql[head:]
    )


# --------------------------------------------------------------------------
# Cronbach's alpha: internal consistency of the embedding dimensions
# --------------------------------------------------------------------------
_CRONBACH_SQL = """
WITH pts AS {MAT}(
  SELECT {ITEMS}, ({TOTAL}) AS tot FROM {embeddings}
),
m AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         {ITEM_MOMS},
         CAST(sum(tot) AS BIGINT) AS st,
         CAST(sum(tot * tot) AS BIGINT) AS stt
  FROM pts
),
v AS {MAT}(
  SELECT n,
         ({ITEM_VARS}) AS sum_item_var,
         (stt - CAST(st AS DOUBLE) * st / n) / (n - 1) AS var_total
  FROM m
)
SELECT n AS n_rows, CAST({K} AS BIGINT) AS k_items,
       round({K} / ({K} - 1.0)
             * (1.0 - sum_item_var / var_total) - 1e-9, 4) + 0.0
         AS cronbach_alpha,
       round(sum_item_var - 1e-9, 4) + 0.0 AS sum_item_variance,
       round(var_total - 1e-9, 4) + 0.0 AS total_variance
FROM v
"""

CRONBACH_K = 8


def _cronbach_sql(embeddings: str, idx: str, mat: str) -> str:
    items = ", ".join(
        f"CAST(floor({idx.format(i=i)} * 10000 + 0.5) AS BIGINT) AS e{i}"
        for i in range(1, CRONBACH_K + 1)
    )
    total = " + ".join(
        f"CAST(floor({idx.format(i=i)} * 10000 + 0.5) AS BIGINT)"
        for i in range(1, CRONBACH_K + 1)
    )
    moms = ", ".join(
        f"CAST(sum(e{i}) AS BIGINT) AS s{i}, "
        f"CAST(sum(e{i} * e{i}) AS BIGINT) AS q{i}"
        for i in range(1, CRONBACH_K + 1)
    )
    ivars = " + ".join(
        f"(q{i} - CAST(s{i} AS DOUBLE) * s{i} / n) / (n - 1)"
        for i in range(1, CRONBACH_K + 1)
    )
    return (
        _CRONBACH_SQL.replace("{ITEMS}", items)
        .replace("{TOTAL}", total)
        .replace("{ITEM_MOMS}", moms)
        .replace("{ITEM_VARS}", ivars)
        .replace("{K}", f"{CRONBACH_K}.0")
        .replace("{embeddings}", embeddings)
        .replace("{MAT}", mat)
    )


@query(
    "cronbach_alpha_embedding",
    _cronbach_sql(
        "embeddings", "CAST(embedding[{i}] AS DOUBLE)", "MATERIALIZED "
    ),
)
def cronbach_alpha_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha over the first 8 embedding dimensions treated
    as items of one scale: α = k/(k−1)·(1 − Σσᵢ²/σ²_total) — the
    psychometric internal-consistency coefficient, here answering "do
    these dimensions carry one shared factor (α → 1) or independent
    signal (α → 0)?" — the scalar cousin of the
    ``embedding_covariance_block`` redundancy screen, and exactly what
    a feature-dedup pass wants to know before dropping dims.

    Determinism: every item and the row total quantize to 1e-4
    integers at the scan, so all 17 moments are exact BIGINTs (the
    8-term item-variance sum is a FIXED left-to-right expression tree
    over them, identical in both engines); one division and the α
    arithmetic are the only floats.  tests/test_wave18.py pins the two
    poles on planted data: duplicated items ⇒ α ≈ 1, independent items
    ⇒ α ≈ 0.

    Scale shape: ONE pass, 17 shuffled numbers, O(1) arithmetic."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "cron_embeddings"
    )
    return spark.sql(
        _cronbach_sql(
            "cron_embeddings",
            "CAST(element_at(embedding, {i}) AS DOUBLE)",
            "",
        )
    )


# --------------------------------------------------------------------------
# Fleiss' kappa: do three quality heuristics agree beyond chance?
# --------------------------------------------------------------------------
_FLEISS_SQL = """
WITH votes AS {MAT}(
  SELECT CAST(r1 + r2 + r3 AS BIGINT) AS npos,
         r1, r2, r3
  FROM (
    SELECT CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS r1,
           CASE WHEN 10000 * (length(text)
                              - length(replace(text, ' ', '')))
                     < 1200 * length(text) THEN 0 ELSE 1 END AS r2,
           CASE WHEN 100 * length(regexp_replace(text, '[^0-9]', ''{G}))
                     < 5 * length(text) THEN 1 ELSE 0 END AS r3
    FROM {documents}
  )
),
m AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(npos) AS BIGINT) AS spos,
         CAST(sum(npos * npos + (3 - npos) * (3 - npos)) AS BIGINT)
           AS ssq,
         CAST(sum(r1) AS BIGINT) AS c1,
         CAST(sum(r2) AS BIGINT) AS c2,
         CAST(sum(r3) AS BIGINT) AS c3
  FROM votes
),
k AS {MAT}(
  SELECT n, c1, c2, c3,
         (CAST(ssq AS DOUBLE) - 3 * n) / (6.0 * n) AS pbar,
         (CAST(spos AS DOUBLE) / (3 * n))
           * (CAST(spos AS DOUBLE) / (3 * n))
         + (1.0 - CAST(spos AS DOUBLE) / (3 * n))
           * (1.0 - CAST(spos AS DOUBLE) / (3 * n)) AS pe
  FROM m
)
SELECT n AS n_docs,
       round(CAST(c1 AS DOUBLE) / n - 1e-9, 4) + 0.0 AS rate_length,
       round(CAST(c2 AS DOUBLE) / n - 1e-9, 4) + 0.0 AS rate_whitespace,
       round(CAST(c3 AS DOUBLE) / n - 1e-9, 4) + 0.0 AS rate_digits,
       round(pbar - 1e-9, 4) + 0.0 AS observed_agreement,
       round(pe - 1e-9, 4) + 0.0 AS chance_agreement,
       round((pbar - pe) / (1.0 - pe) - 1e-9, 4) + 0.0 AS fleiss_kappa
FROM k
"""


@query(
    "fleiss_kappa_heuristics",
    _FLEISS_SQL.replace("{documents}", "documents")
    .replace("{MAT}", "MATERIALIZED ")
    .replace("{G}", ", 'g'"),
)
def fleiss_kappa_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across THREE document-quality heuristics (length,
    whitespace share, digit share) voting keep/drop — the multi-rater
    generalization of ``cohens_kappa_heuristics``: observed per-item
    agreement P̄ = (Σ n_j² − k)/(k(k−1)) against the chance agreement
    of the pooled category rates.  κ ≈ 0 means the heuristics fire on
    unrelated slices (an ensemble is worth building); κ → 1 means they
    are one filter three times over.

    Determinism: every vote is an integer predicate (the whitespace
    and digit thresholds are cross-multiplied integer comparisons — no
    float boundary call exists); Σn_pos² and the category totals are
    exact BIGINTs, and κ is three divisions at the end.
    tests/test_wave18.py pins the poles on planted votes: unanimous
    raters ⇒ κ = 1, independent coin raters ⇒ κ ≈ 0.

    Scale shape: one corpus scan, six shuffled numbers, O(1) math."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "fleiss_documents"
    )
    # DuckDB regexp_replace is first-match-only without the 'g' flag;
    # Spark replaces all and takes no flag argument
    return spark.sql(
        _FLEISS_SQL.replace("{documents}", "fleiss_documents")
        .replace("{MAT}", "")
        .replace("{G}", "")
    )


def fleiss_frame(votes: DataFrame) -> DataFrame:
    """Fleiss' kappa over any (r1, r2, r3) binary-vote frame; see
    :func:`fleiss_kappa_heuristics`."""
    votes.createOrReplaceTempView("fleiss_votes_frame")
    sql = _FLEISS_SQL.replace("{MAT}", "").replace("{G}", "")
    head = sql.index("m AS ")
    return votes.sparkSession.sql(
        "WITH votes AS (SELECT CAST(r1 + r2 + r3 AS BIGINT) AS npos,"
        " r1, r2, r3 FROM fleiss_votes_frame),\n" + sql[head:]
    )


# --------------------------------------------------------------------------
# Taylor's power law: variance ~ mean^b across part demand series
# --------------------------------------------------------------------------
_TAYLOR_SQL = """
WITH per AS {MAT}(
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
  FROM {lineitem} GROUP BY l_partkey
  HAVING count(*) >= 5
),
mv AS {MAT}(
  -- 1e-4-quantized log mean / log variance per part: exact ints
  SELECT CAST(floor(ln(CAST(s1 AS DOUBLE) / n) * 10000 + 0.5)
              AS BIGINT) AS lx,
         CAST(floor(ln((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                    * 10000 + 0.5) AS BIGINT) AS ly
  FROM per
  WHERE s2 * n > s1 * s1
),
m AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         CAST(sum(lx * lx) AS BIGINT) AS sxx,
         CAST(sum(lx * ly) AS BIGINT) AS sxy,
         CAST(sum(ly * ly) AS BIGINT) AS syy
  FROM mv
)
SELECT n AS n_parts,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             - 1e-9, 4) + 0.0 AS taylor_b,
       round((CAST(sy AS DOUBLE)
              - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sx) / n / 10000.0 - 1e-9, 4) + 0.0 AS log_a,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             - 1e-9, 4) + 0.0 AS r2
FROM m
"""


@query(
    "taylor_power_law",
    _TAYLOR_SQL.replace("{lineitem}", "lineitem").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def taylor_power_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taylor's power law across part demand: regress ln(variance) on
    ln(mean) of per-part order quantities — the fluctuation-scaling
    exponent b that sizes safety stock (b ≈ 1 Poisson-like demand,
    b → 2 bursty/clustered demand where variance grows with the
    SQUARE of volume, and mean-based stock rules fail).  The ops
    sibling of ``degree_powerlaw_fit``/``zipf_slope`` on the demand
    axis.

    Determinism: per-part moments are exact BIGINTs; the strict
    integer predicate s2·n > s1² excludes zero-variance parts before
    any log; both log coordinates quantize to exact 1e-4 integers so
    the regression moments are exact; slope/intercept/R² are single
    Cramer ratios (2×2 — int64-safe products via DOUBLE casts).

    Scale shape: one fact pass to per-part moments (map-side
    combinable), one O(parts) log-quantize, O(1) fit."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "taylor_lineitem"
    )
    return spark.sql(
        _TAYLOR_SQL.replace("{lineitem}", "taylor_lineitem").replace(
            "{MAT}", ""
        )
    )


# --------------------------------------------------------------------------
# Cook's distance: which days single-handedly steer the revenue trend?
# --------------------------------------------------------------------------
_COOKS_SQL = """
WITH days AS {MAT}(
  SELECT {DD} AS t,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
  FROM {orders} GROUP BY 1
),
m AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * t) AS BIGINT) AS stt,
         CAST(sum(t * y) AS BIGINT) AS sty,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM days
),
fit AS {MAT}(
  SELECT n, st, stt,
         CAST(st AS DOUBLE) / n AS tbar,
         (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
           / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st) AS b,
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
            / (CAST(n AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
            * st) / n AS a,
         (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n) AS sxx,
         CAST(syy AS DOUBLE) AS syy_d, CAST(sy AS DOUBLE) AS sy_d,
         CAST(sty AS DOUBLE) AS sty_d
  FROM m
),
se AS {MAT}(
  -- SSE via the normal-equation identity, sigma^2 with p = 2
  SELECT n, tbar, a, b, sxx,
         (syy_d - a * sy_d - b * sty_d) / (n - 2) AS s2
  FROM fit
)
SELECT t AS day_idx, y AS revenue_usd,
       round(lev - 1e-9, 6) + 0.0 AS leverage,
       round(cook - 1e-9, 6) + 0.0 AS cooks_d,
       CASE WHEN round(cook - 1e-9, 6) > thr
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         AS influential_4_over_n
FROM (
  SELECT d.t, d.y,
         1.0 / f.n + (d.t - f.tbar) * (d.t - f.tbar) / f.sxx AS lev,
         (d.y - (f.a + f.b * d.t)) * (d.y - (f.a + f.b * d.t))
           * (1.0 / f.n + (d.t - f.tbar) * (d.t - f.tbar) / f.sxx)
           / (2.0 * f.s2
              * (1.0 - (1.0 / f.n
                        + (d.t - f.tbar) * (d.t - f.tbar) / f.sxx))
              * (1.0 - (1.0 / f.n
                        + (d.t - f.tbar) * (d.t - f.tbar) / f.sxx)))
           AS cook,
         4.0 / f.n AS thr,
         row_number() OVER (
           ORDER BY round((d.y - (f.a + f.b * d.t))
                          * (d.y - (f.a + f.b * d.t))
                          * (1.0 / f.n
                             + (d.t - f.tbar) * (d.t - f.tbar) / f.sxx)
                          / (2.0 * f.s2
                             * (1.0 - (1.0 / f.n + (d.t - f.tbar)
                                       * (d.t - f.tbar) / f.sxx))
                             * (1.0 - (1.0 / f.n + (d.t - f.tbar)
                                       * (d.t - f.tbar) / f.sxx)))
                          - 1e-9, 6) DESC, d.t
         ) AS rk
  FROM days d CROSS JOIN se f
) WHERE rk <= 10
ORDER BY cooks_d DESC, day_idx
"""


@query(
    "cooks_distance_days",
    _COOKS_SQL.replace("{orders}", "orders")
    .replace(
        "{DD}",
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
    )
    .replace("{MAT}", "MATERIALIZED "),
)
def cooks_distance_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance for the daily-revenue trend regression: which
    single days, if deleted, would most move the fitted line?
    D_i = r_i²·h_i / (p·s²·(1−h_i)²) with the exact simple-regression
    leverage h_i = 1/n + (t−t̄)²/Sxx; the top-10 with the 4/n
    influence flag — the influence layer on top of the residual
    diagnostics (``ols_residual_diagnostics``) and the robust
    alternatives (``ransac_trend_fit``, ``theil_sen_monthly_trend``):
    it names WHICH observations the non-robust fit is hostage to.

    Determinism: all six regression moments are exact BIGINTs; a, b,
    σ², leverage and D are fixed IEEE trees over them; the top-10 cut
    orders by the ROUNDED distance with the day index as tiebreak.
    tests/test_wave19.py plants one wild endpoint day and pins it to
    rank 1 with leverage near the theoretical endpoint maximum.

    Scale shape: one fact rollup to O(days), broadcast of the 1-row
    fit back over it, one global top-10."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "cooks_orders"
    )
    return spark.sql(
        _COOKS_SQL.replace("{orders}", "cooks_orders")
        .replace(
            "{DD}",
            "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')",
        )
        .replace("{MAT}", "")
    )


def cooks_frame(days: DataFrame) -> DataFrame:
    """Cook's distance over any (t, y) integer frame; see
    :func:`cooks_distance_days`."""
    days.createOrReplaceTempView("cooks_days_frame")
    sql = _COOKS_SQL.replace("{MAT}", "")
    head = sql.index("m AS ")
    return days.sparkSession.sql(
        "WITH days AS (SELECT t, CAST(y AS BIGINT) AS y"
        " FROM cooks_days_frame),\n" + sql[head:]
    )
