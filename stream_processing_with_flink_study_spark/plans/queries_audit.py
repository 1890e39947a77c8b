"""Data-audit / governance queries (ninth wave): ABC (Pareto)
inventory classification with integer class boundaries,
differentially-private counts via a seeded Laplace mechanism, and a KMV
(k-minimum-values) mergeable distinct sketch with an exact cross-engine
oracle.

Oracle-determinism notes (see plans/registry.py conventions):
- ABC class boundaries are INTEGER cross-multiplications of exact cent
  cumsums (cum·100 ≤ 80·total), so neither engine makes a float
  boundary call;
- Laplace noise and KMV ranks derive from md5 hex prefixes via the
  repo's (hexint+1)/2³²+1 uniform idiom — reproducible across engines,
  runs, and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query

# (hexint(md5) + 1) / 2^32+1  →  uniform in (0, 1]
_U_DENOM = 4294967297.0
DP_EPSILON = 0.5  # per-release privacy budget -> Laplace scale b = 2.0
KMV_K = 64


def _sql_uniform(expr: str) -> str:
    """DuckDB-side md5-seeded uniform in (0,1] for a VARCHAR expr."""
    return (
        f"((CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT) + 1.0)"
        f" / {_U_DENOM})"
    )


def _spark_uniform(col) -> F.Column:
    """Spark-side twin of :func:`_sql_uniform`."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("double") + 1.0
    ) / F.lit(_U_DENOM)


# --------------------------------------------------------------------------
# ABC (Pareto) inventory classification
# --------------------------------------------------------------------------
@query(
    "abc_inventory_classes",
    """
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, rev_cents,
             CAST(sum(rev_cents) OVER (
               ORDER BY rev_cents DESC, l_partkey
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
             CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
      FROM rev
    ),
    classed AS (
      SELECT *,
             CASE WHEN cum_cents * 100 <= total_cents * 80 THEN 'A'
                  WHEN cum_cents * 100 <= total_cents * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
           round(CAST(sum(rev_cents) AS DOUBLE) / max(total_cents) - 1e-9, 4)
             AS revenue_share,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER () - 1e-9, 4) AS part_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def abc_inventory_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification (the warehouse-ops Pareto cut):
    rank parts by discounted revenue, class A carries the first 80% of
    cumulative revenue, B the next 15%, C the tail — the standard
    stocking-policy segmentation.

    The class boundary is an INTEGER cross-multiplication
    (cum·100 ≤ 80·total on exact BIGINT cents), so no float boundary
    call exists for the engines to disagree on.  Scale shape: one fact
    scan collapses to |parts| rows; the ranking window runs on the
    collapsed frame (same order-by-revenue shape every retailer runs
    nightly)."""
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + 0.5
            )
            .cast("long")
            .alias("cents"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )
    w_cum = (
        Window.partitionBy()
        .orderBy(F.desc("rev_cents"), "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = rev.select(
        "l_partkey",
        "rev_cents",
        F.sum("rev_cents").over(w_cum).cast("long").alias("cum_cents"),
        F.sum("rev_cents").over(Window.partitionBy()).cast("long").alias(
            "total_cents"
        ),
    )
    classed = ranked.withColumn(
        "abc_class",
        F.when(
            F.col("cum_cents") * 100 <= F.col("total_cents") * 80, "A"
        )
        .when(F.col("cum_cents") * 100 <= F.col("total_cents") * 95, "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
            F.round(
                F.sum("rev_cents") / F.max("total_cents") - 1e-9, 4
            ).alias("revenue_share"),
            F.count(F.lit(1)).alias("_n"),
        )
        .withColumn(
            "part_share",
            F.round(
                F.col("_n") / F.sum("_n").over(Window.partitionBy()) - 1e-9,
                4,
            ),
        )
        .drop("_n")
        .orderBy("abc_class")
    )


# --------------------------------------------------------------------------
# differentially-private counts (seeded Laplace mechanism)
# --------------------------------------------------------------------------
@query(
    "dp_laplace_counts",
    f"""
    WITH counts AS (
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_true
      FROM orders GROUP BY o_orderpriority
    ),
    noised AS (
      SELECT o_orderpriority, n_true,
             {_sql_uniform("concat('dp0|', o_orderpriority)")} AS u
      FROM counts
    )
    SELECT o_orderpriority, n_true,
           round(n_true
                 - (1.0 / {DP_EPSILON})
                   * CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
                   * ln(1.0 - 2.0 * abs(u - 0.5)) - 1e-9, 4)
             AS noisy_count,
           {DP_EPSILON} AS epsilon
    FROM noised ORDER BY o_orderpriority
    """,
)
def dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private histogram release (Dwork et al. 2006):
    per-priority order counts plus Laplace(1/ε) noise, sensitivity 1
    per count.  The noise draw is the inverse-CDF transform of an
    md5-seeded uniform — deterministic here so the oracle can replay
    it bit-for-bit; a production release swaps the seed for entropy and
    DROPS `n_true` (kept for the test harness).

    Scale shape: noise is a per-GROUP scalar expression after the
    aggregate — DP release costs nothing over the plain histogram."""
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    )
    u = _spark_uniform(F.concat(F.lit("dp0|"), F.col("o_orderpriority")))
    noise = (
        -(1.0 / DP_EPSILON)
        * F.when(u >= 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return counts.select(
        "o_orderpriority",
        "n_true",
        F.round(F.col("n_true") + noise - 1e-9, 4).alias("noisy_count"),
        F.lit(DP_EPSILON).alias("epsilon"),
    ).orderBy("o_orderpriority")


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch
# --------------------------------------------------------------------------
@query(
    "kmv_distinct_sketch",
    f"""
    WITH hashed AS (
      SELECT DISTINCT o_orderpriority, o_custkey,
        {_sql_uniform("concat('kmv0|', o_custkey)")} AS h
      FROM orders
    ),
    ranked AS (
      SELECT o_orderpriority, h,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY h, o_custkey) AS rk,
             count(*) OVER (PARTITION BY o_orderpriority) AS ndv
      FROM hashed
    )
    SELECT o_orderpriority,
           CAST(max(ndv) AS BIGINT) AS true_ndv,
           CAST(count(*) AS BIGINT) AS n_hashes,
           round(CASE WHEN max(ndv) < {KMV_K}
                      THEN CAST(max(ndv) AS DOUBLE)
                      ELSE ({KMV_K} - 1) / max(CASE WHEN rk = {KMV_K}
                                                    THEN h END)
                 END - 1e-9, 4) AS kmv_estimate
    FROM ranked WHERE rk <= {KMV_K}
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002): keep the
    k = {KMV_K} smallest hash values per group; the unbiased NDV
    estimate is (k−1)/h_(k).  Unlike HLL it supports set EXPRESSIONS
    (union = merge bottom-k lists, intersection via Jaccard from the
    combined sketch), and because the hash depends only on the VALUE,
    sketches from different groups/partitions merge exactly — the
    mergeability law is pinned in `tests/test_wave9.py`.

    The estimator is fully deterministic (md5-uniform hashes), so this
    sketch gets an EXACT cross-engine oracle — something HLL's
    engine-specific registers cannot.  Scale shape: the distinct +
    rank form shown shuffles every distinct member once (exact, fine
    through sf10); at true retrieval scale the final rank becomes a
    two-level bottom-k — per-bucket window then a (k x buckets)-row
    merge — with the same estimator; the hash being value-keyed is
    what makes that merge (and any sketch union) exact."""
    hashed = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_custkey")
        .distinct()
        .withColumn(
            "h",
            _spark_uniform(F.concat(F.lit("kmv0|"), F.col("o_custkey"))),
        )
    )
    wr = Window.partitionBy("o_orderpriority").orderBy("h", "o_custkey")
    ranked = hashed.select(
        "o_orderpriority",
        "h",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("ndv"),
    ).filter(F.col("rk") <= KMV_K)
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("ndv").cast("long").alias("true_ndv"),
            F.count(F.lit(1)).cast("long").alias("n_hashes"),
            F.round(
                F.when(
                    F.max("ndv") < KMV_K, F.max("ndv").cast("double")
                ).otherwise(
                    (KMV_K - 1)
                    / F.max(F.when(F.col("rk") == KMV_K, F.col("h")))
                )
                - 1e-9,
                4,
            ).alias("kmv_estimate"),
        )
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# randomized response (local differential privacy)
# --------------------------------------------------------------------------
RR_FLIP = 0.25  # flip probability -> epsilon = ln((1-p)/p) = ln 3


@query(
    "randomized_response_survey",
    f"""
    WITH truth AS (
      SELECT o_orderkey,
             o_orderpriority = '1-URGENT' AS answer,
             {_sql_uniform("concat('rr0|', o_orderkey)")} AS u
      FROM orders
    ),
    reported AS (
      SELECT CASE WHEN u < {RR_FLIP} THEN NOT answer ELSE answer END
               AS reported,
             answer
      FROM truth
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN answer THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           CAST(sum(CASE WHEN reported THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reported,
           round((CAST(sum(CASE WHEN reported THEN 1 ELSE 0 END)
                       AS DOUBLE) / count(*) - {RR_FLIP})
                 / (1.0 - 2 * {RR_FLIP}) - 1e-9, 4) AS debiased_rate,
           round(CAST(sum(CASE WHEN answer THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*) - 1e-9, 4) AS true_rate,
           round(ln((1.0 - {RR_FLIP}) / {RR_FLIP}) - 1e-9, 4) AS epsilon
    FROM reported
    """,
)
def randomized_response_survey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response (Warner 1965 — the original LOCAL
    differential-privacy mechanism, the ancestor of RAPPOR): each
    respondent flips their sensitive yes/no answer with probability
    p={RR_FLIP} BEFORE it leaves the device, giving per-record
    plausible deniability (ε = ln((1−p)/p) ≈ 1.1); the aggregator
    inverts the known noise channel — rate = (observed − p)/(1 − 2p) —
    to recover the population rate without ever holding a truthful
    record.  Complements ``dp_laplace_counts`` (central DP: noise at
    release) with the collect-side mechanism.

    The flips are md5-seeded, so the oracle replays the exact channel;
    `true_rate` is emitted only to exhibit the debiasing accuracy.
    Scale shape: one scan, branch-free per-row flip, one aggregate."""
    truth = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderpriority") == "1-URGENT").alias("answer"),
        _spark_uniform(F.concat(F.lit("rr0|"), F.col("o_orderkey"))).alias(
            "u"
        ),
    )
    reported = truth.select(
        "answer",
        F.when(F.col("u") < RR_FLIP, ~F.col("answer"))
        .otherwise(F.col("answer"))
        .alias("reported"),
    )
    n = F.count(F.lit(1))
    n_rep = F.sum(F.when(F.col("reported"), 1).otherwise(0))
    return reported.agg(
        n.cast("long").alias("n"),
        F.sum(F.when(F.col("answer"), 1).otherwise(0))
        .cast("long")
        .alias("n_true"),
        n_rep.cast("long").alias("n_reported"),
        F.round(
            (n_rep.cast("double") / n - RR_FLIP) / (1.0 - 2 * RR_FLIP)
            - 1e-9,
            4,
        ).alias("debiased_rate"),
        F.round(
            F.sum(F.when(F.col("answer"), 1).otherwise(0)).cast("double")
            / n
            - 1e-9,
            4,
        ).alias("true_rate"),
        F.round(
            F.log((1.0 - RR_FLIP) / F.lit(RR_FLIP)) - 1e-9, 4
        ).alias("epsilon"),
    )
