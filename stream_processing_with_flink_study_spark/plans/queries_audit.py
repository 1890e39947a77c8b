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


# --------------------------------------------------------------------------
# IPF survey raking: reweight the customer base to order-activity margins
# --------------------------------------------------------------------------
IPF_ROUNDS = 6

_IPF_PREP = """
base AS {MAT}(
  SELECT r.r_name AS rg, c.c_mktsegment AS seg,
         CAST(count(*) AS BIGINT) AS c
  FROM {customer} c
  JOIN {nation} n ON n.n_nationkey = c.c_nationkey
  JOIN {region} r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
),
ct AS (SELECT CAST(sum(c) AS BIGINT) AS tc FROM base),
ocell AS {MAT}(
  SELECT r.r_name AS rg, c.c_mktsegment AS seg,
         CAST(count(*) AS BIGINT) AS o
  FROM {orders} o2
  JOIN {customer} c ON c.c_custkey = o2.o_custkey
  JOIN {nation} n ON n.n_nationkey = c.c_nationkey
  JOIN {region} r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
),
ot AS (SELECT CAST(sum(o) AS BIGINT) AS tot FROM ocell),
rt AS {MAT}(
  SELECT rg, CAST(floor(CAST(sum(o) AS DOUBLE)
                        / max(t.tot) * 1000000 + 0.5) AS BIGINT) AS tq
  FROM ocell CROSS JOIN ot t GROUP BY rg
),
st AS {MAT}(
  SELECT seg, CAST(floor(CAST(sum(o) AS DOUBLE)
                         / max(t.tot) * 1000000 + 0.5) AS BIGINT) AS tq
  FROM ocell CROSS JOIN ot t GROUP BY seg
),
w0 AS {MAT}(
  SELECT b.rg, b.seg,
         CAST(floor(CAST(b.c AS DOUBLE) / t.tc * 1000000 + 0.5)
              AS BIGINT) AS wq
  FROM base b CROSS JOIN ct t
)
"""

_IPF_ROW_STEP = """
  SELECT w.rg, w.seg,
         CAST(floor(CAST(t.tq AS DOUBLE) * w.wq / s.s + 0.5) AS BIGINT)
           AS wq
  FROM {W} w
  JOIN (SELECT rg, CAST(sum(wq) AS BIGINT) AS s FROM {W} GROUP BY rg) s
    ON s.rg = w.rg
  JOIN rt t ON t.rg = w.rg
"""
_IPF_COL_STEP = """
  SELECT w.rg, w.seg,
         CAST(floor(CAST(t.tq AS DOUBLE) * w.wq / s.s + 0.5) AS BIGINT)
           AS wq
  FROM {W} w
  JOIN (SELECT seg, CAST(sum(wq) AS BIGINT) AS s FROM {W} GROUP BY seg) s
    ON s.seg = w.seg
  JOIN st t ON t.seg = w.seg
"""

_IPF_FINAL = """
rowerr AS (
  SELECT CAST(max(abs(x.s - t.tq)) AS BIGINT) AS e
  FROM (SELECT rg, CAST(sum(wq) AS BIGINT) AS s FROM {WF} GROUP BY rg) x
  JOIN rt t ON t.rg = x.rg
),
colerr AS (
  SELECT CAST(max(abs(x.s - t.tq)) AS BIGINT) AS e
  FROM (SELECT seg, CAST(sum(wq) AS BIGINT) AS s FROM {WF} GROUP BY seg) x
  JOIN st t ON t.seg = x.seg
)
SELECT b.rg AS region, b.seg AS segment, b.c AS n_customers,
       round(w0.wq / 1000000.0 - 1e-9, 6) + 0.0 AS base_share,
       round(w.wq / 1000000.0 - 1e-9, 6) + 0.0 AS raked_share,
       CASE WHEN w0.wq > 0
            THEN round(CAST(w.wq AS DOUBLE) / w0.wq - 1e-9, 4) + 0.0
            ELSE CAST(NULL AS DOUBLE) END AS weight_factor,
       round(greatest(re.e, ce.e) / 1000000.0 - 1e-9, 6) + 0.0
         AS max_margin_err
FROM base b
JOIN {WF} w ON w.rg = b.rg AND w.seg = b.seg
JOIN w0 ON w0.rg = b.rg AND w0.seg = b.seg
CROSS JOIN rowerr re CROSS JOIN colerr ce
ORDER BY b.rg, b.seg
"""


def _ipf_oracle() -> str:
    rounds = []
    for k in range(1, IPF_ROUNDS + 1):
        rounds.append(
            f"wr{k} AS MATERIALIZED ("
            + _IPF_ROW_STEP.replace("{W}", f"w{k - 1}")
            + ")"
        )
        rounds.append(
            f"w{k} AS MATERIALIZED ("
            + _IPF_COL_STEP.replace("{W}", f"wr{k}")
            + ")"
        )
    prep = (
        _IPF_PREP.replace("{MAT}", "MATERIALIZED ")
        .replace("{customer}", "customer")
        .replace("{nation}", "nation")
        .replace("{region}", "region")
        .replace("{orders}", "orders")
    )
    return (
        "WITH "
        + prep.strip()
        + ",\n"
        + ",\n".join(rounds)
        + ",\n"
        + _IPF_FINAL.replace("{WF}", f"w{IPF_ROUNDS}")
    )


def ipf_loop(w: dict, rt: dict, st: dict) -> dict:
    """The exact-integer IPF fixed point (factored for law tests —
    identical arithmetic to the oracle's unrolled CTEs); see
    :func:`ipf_raking_weights`."""
    import math

    for _ in range(IPF_ROUNDS):
        rsum: dict = {}
        for (rg, _sg), v in w.items():
            rsum[rg] = rsum.get(rg, 0) + v
        w = {
            k: math.floor(float(rt[k[0]]) * v / float(rsum[k[0]]) + 0.5)
            for k, v in w.items()
        }
        csum: dict = {}
        for (_rg, sg), v in w.items():
            csum[sg] = csum.get(sg, 0) + v
        w = {
            k: math.floor(float(st[k[1]]) * v / float(csum[k[1]]) + 0.5)
            for k, v in w.items()
        }
    return w


@query("ipf_raking_weights", _ipf_oracle())
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (survey raking): reweight the
    region × segment CUSTOMER table so its margins match the
    ORDER-activity margins — the standard survey-weighting move when
    your frame (who exists) is demographically skewed relative to the
    population you need to represent (who transacts).  Six alternating
    row/column scalings; ``weight_factor`` is the per-cell design
    weight an analyst would attach, ``max_margin_err`` the convergence
    certificate (IPF preserves base interactions — odds ratios —
    exactly, which is why it beats naive cell replacement).

    Determinism (the ``sinkhorn_ot_segments`` pattern — IPF IS
    Sinkhorn with the observed table as kernel): shares and margin
    targets quantize to exact 1e-6 integers; each scaling is
    floor(T·w/S + 0.5) over exact ints, so the driver-side loop here
    and the oracle's 12 unrolled CTEs walk identical integer states.
    tests/test_wave17.py pins margin attainment, mass conservation,
    and the odds-ratio-preservation law on a planted table.

    Scale shape: corpus work is two grouped counts (customer,
    orders); the 25-cell fixed point is O(1) driver-side."""
    import math

    for t in ("customer", "nation", "region", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"ipf_{t}")
    prep = (
        _IPF_PREP.replace("{MAT}", "")
        .replace("{customer}", "ipf_customer")
        .replace("{nation}", "ipf_nation")
        .replace("{region}", "ipf_region")
        .replace("{orders}", "ipf_orders")
    )
    # ONE materialized prep frame serves both the driver collect and
    # the final assembly (the base tables are scanned exactly once)
    prepdf = spark.sql(
        "WITH "
        + prep.strip()
        + """
        SELECT b.rg, b.seg, b.c, w.wq, r.tq AS rtq, s.tq AS stq
        FROM base b
        JOIN w0 w ON w.rg = b.rg AND w.seg = b.seg
        JOIN rt r ON r.rg = b.rg
        JOIN st s ON s.seg = b.seg
        """
    ).localCheckpoint()
    prepdf.createOrReplaceTempView("ipf_prep_mat")
    rows = prepdf.collect()
    if not rows:
        # degenerate universe: no cells -> the oracle emits 0 rows; an
        # empty VALUES body would not even parse
        return spark.createDataFrame(
            [],
            "region string, segment string, n_customers bigint,"
            " base_share double, raked_share double,"
            " weight_factor double, max_margin_err double",
        )
    w = {(r["rg"], r["seg"]): int(r["wq"]) for r in rows}
    rt = {r["rg"]: int(r["rtq"]) for r in rows}
    st = {r["seg"]: int(r["stq"]) for r in rows}
    w = ipf_loop(w, rt, st)
    vals = ", ".join(
        f"('{rg}', '{sg}', {v})" for (rg, sg), v in sorted(w.items())
    )
    return spark.sql(
        f"""WITH base AS (SELECT rg, seg, c FROM ipf_prep_mat),
        w0 AS (SELECT rg, seg, wq FROM ipf_prep_mat),
        rt AS (SELECT rg, max(rtq) AS tq FROM ipf_prep_mat GROUP BY rg),
        st AS (SELECT seg, max(stq) AS tq FROM ipf_prep_mat GROUP BY seg),
        wf AS (SELECT rg, seg, CAST(wq AS BIGINT) AS wq
               FROM VALUES {vals} AS t(rg, seg, wq)),
        """
        + _IPF_FINAL.replace("{WF}", "wf")
    )


# --------------------------------------------------------------------------
# Functional-dependency audit (TANE-style g3 over candidate FDs)
# --------------------------------------------------------------------------
_FD_CANDIDATES = (
    # (table, lhs, rhs) — a mix of true PK-backed FDs and plausible
    # false ones, the shape a schema-profiling pass emits
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("part", "p_partkey", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
)


def _fd_candidate_sql(table: str, lhs: str, rhs: str) -> str:
    return f"""
  SELECT '{table}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(c) - sum(mx) AS BIGINT) AS g3_violations,
         CASE WHEN sum(c) = sum(mx) THEN CAST(1 AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS holds
  FROM (
    SELECT {lhs}, CAST(sum(cnt) AS BIGINT) AS c,
           CAST(max(cnt) AS BIGINT) AS mx
    FROM (
      SELECT {lhs}, {rhs}, CAST(count(*) AS BIGINT) AS cnt
      FROM {table} GROUP BY 1, 2
    ) GROUP BY 1
  )"""


@query(
    "functional_dependency_audit",
    " UNION ALL ".join(
        _fd_candidate_sql(t, a, b) for t, a, b in _FD_CANDIDATES
    )
    + " ORDER BY tbl, lhs, rhs",
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TANE-style functional-dependency audit over candidate X→Y pairs:
    per candidate, the exact g3 error (minimum rows to delete for the
    FD to hold = n − Σ_x max_y |x,y|) and a holds verdict — the schema
    profiling pass that discovers real keys (o_orderkey→status,
    p_partkey→brand hold) and debunks folk dependencies (brand→type,
    custkey→priority don't).  All counts exact BIGINTs.

    Scale shape: each candidate is one two-level hash aggregation with
    map-side partial combine on (lhs, rhs) — the heavy key never
    shuffles raw rows, only (pair, count) partials; candidates read
    ONLY their two columns (pruned scans) and union into a 6-row
    report."""
    out = None
    for t, a, b in _FD_CANDIDATES:
        base = load_table(spark, sf_dir, t).select(a, b)
        pair = base.groupBy(a, b).agg(F.count(F.lit(1)).alias("cnt"))
        g = pair.groupBy(a).agg(
            F.sum("cnt").alias("c"), F.max("cnt").alias("mx")
        )
        row = g.agg(
            F.lit(t).alias("tbl"),
            F.lit(a).alias("lhs"),
            F.lit(b).alias("rhs"),
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            (F.sum("c") - F.sum("mx")).cast("long").alias("g3_violations"),
            F.when(F.sum("c") == F.sum("mx"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("tbl", "lhs", "rhs")
