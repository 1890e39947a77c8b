"""TPC-H-shaped join/aggregation queries on the driver's star schema.

The reference has no SQL corpus (SURVEY.md §5); these queries are the
standing join/agg test battery (SURVEY §7.2 step 3 'TPC-H-shaped checks')
and the scale showcase: every join is annotated with the physical
strategy it should pick, and ``tests/test_plans.py`` asserts the
broadcast/pushdown expectations against ``explain()`` output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import ntz_lit, ntz_millis
from ..sources import load_table
from .registry import query


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      round(sum(l_quantity), 4) AS sum_qty,
      round(sum(l_extendedprice), 4) AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
      round(avg(l_quantity), 4) AS avg_qty,
      round(avg(l_extendedprice), 4) AS avg_price,
      round(avg(l_discount), 4) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates.  Catalyst
    pushes the shipdate predicate into the parquet scan and computes
    partial aggregates map-side — the shuffle carries ≤ (partitions × 6
    groups) rows regardless of input size."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= ntz_lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey AS o_orderkey,
      round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
      epoch_ms(o.o_orderdate) AS o_orderdate_ms,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10.
    customer and orders are small relative to lineitem — the filtered
    customer side broadcasts (verified in tests/test_plans.py), so
    lineitem only shuffles once for the aggregation."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ntz_lit("1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > ntz_lit("1998-01-01")
    )
    return (
        li.join(
            F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            li.l_orderkey.alias("o_orderkey"), "o_orderdate", "o_orderpriority"
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            ntz_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT
      n.n_name,
      round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join.  All dimensions (region, nation,
    customer, supplier) broadcast; the fact side flows through without a
    single pre-join shuffle — the only exchange is the final groupBy."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ntz_lit("1996-01-01"))
        & (F.col("o_orderdate") < ntz_lit("1999-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == n.n_nationkey)
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == dims.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+scan aggregate — the pushdown
    benchmark.  All four predicates reach the parquet reader
    (PushedFilters), so row groups outside the date range are skipped
    entirely."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ntz_lit("1996-01-01"))
            & (F.col("l_shipdate") < ntz_lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .groupBy()
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q4_priority_semi",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join): order counts by priority
    for orders with at least one returned line.  The semi join shuffles
    only the two key columns (lineitem projected to l_orderkey before the
    exchange) and emits each order at most once — no dedup stage."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ntz_lit("1996-01-01"))
        & (F.col("o_orderdate") < ntz_lit("1997-01-01"))
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated scalar subquery → pre-aggregated
    self-join): revenue from small-quantity lines of one brand.  The
    per-part average is computed ONLY over the brand's lines (restricting
    to a partkey subset cannot change that part's own average), so both
    passes over lineitem are brand-pruned by the broadcast part filter
    before any exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li_brand = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    )
    lim = li_brand.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        li_brand.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(lim), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .groupBy()
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           epoch_ms(o.o_orderdate) AS o_orderdate_ms,
           o.o_totalprice, big.sum_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 250) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (IN-subquery on a HAVING aggregate): top customers
    holding orders above 250 total units.  lineitem aggregates FIRST
    (map-side partials, one shuffle on l_orderkey); only the ~1% of
    orders surviving the HAVING join onward, with customer broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            ntz_millis("o_orderdate").alias("o_orderdate_ms"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunction of conjunctive band predicates across
    both join sides): broadcast-join part, then one OR-of-ANDs filter.
    Catalyst extracts the common l_quantity bounds (1..30) as a
    scan-level pushdown even though the full predicate needs both
    tables."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(20, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        joined.filter(clause)
        .groupBy()
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT p.p_partkey, p.p_name, l.l_suppkey,
             l.l_extendedprice / l.l_quantity AS unit_price
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_size = 15
    ), best AS (
      SELECT *, row_number() OVER (
        PARTITION BY p_partkey ORDER BY unit_price, l_suppkey) AS rn
      FROM offers
    )
    SELECT b.p_partkey, b.p_name, s.s_name,
           floor(b.unit_price * 10000 + 0.5) / 10000 AS best_unit_price
    FROM best b JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE rn = 1
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (per-group argmin over a supply relation): the
    cheapest supplier per size-15 part, unit price from observed lines.
    Part prunes via broadcast BEFORE the window, so the rank shuffle only
    carries the filtered offers; tie-break (unit_price, suppkey) matches
    the oracle's ORDER BY exactly — IEEE division gives bit-identical
    doubles in both engines.  The output rounding is the explicit
    ``floor(x*1e4 + 0.5)/1e4`` formula on BOTH sides: Spark's
    BigDecimal-exact ``round`` and DuckDB's float ``round`` disagree on
    half-up boundaries like 26.24125."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    offers = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_partkey",
        "p_name",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_price", "l_suppkey")
    return (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            (F.floor(F.col("unit_price") * 10000 + 0.5) / 10000).alias(
                "best_unit_price"
            ),
        )
    )


@query(
    "tpch_q22_idle_rich_customers",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_cust,
           round(sum(c.c_acctbal), 4) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT round(avg(c_acctbal), 4) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1998-07-01')
    GROUP BY c.c_mktsegment
    """,
)
def tpch_q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (scalar subquery + NOT EXISTS → anti join):
    above-average-balance customers with no recent order.  The global
    average is a 1-row aggregate broadcast back via crossJoin — never a
    driver-side collect; the anti join shuffles only (custkey) pairs.
    The threshold is rounded to 4dp on BOTH sides so engine-specific
    float summation order can't flip a boundary row."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .groupBy()
        .agg(F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
    )
    recent = o.filter(F.col("o_orderdate") >= ntz_lit("1998-07-01")).select(
        "o_custkey"
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


@query(
    "top_spenders_per_segment",
    oracle="""
    WITH spend AS (
      SELECT c.c_mktsegment, c.c_custkey, c.c_name,
             round(sum(o.o_totalprice), 4) AS total_spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, c.c_custkey, c.c_name
    )
    SELECT c_mktsegment, c_custkey, c_name, total_spend, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY c_mktsegment
        ORDER BY total_spend DESC, c_custkey) AS rnk
      FROM spend
    ) WHERE rnk <= 3
    """,
)
def top_spenders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (the guide's canonical OLAP pattern): top-3
    spenders per market segment, deterministic tie-break by custkey.
    Window over the aggregated (small) intermediate, never over raw
    orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("total_spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("total_spend").desc(), "c_custkey"
    )
    return spend.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 3
    )


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click')    AS click,
      count(*) FILTER (WHERE event_type = 'error')    AS error,
      count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide agg): per-user counts by event type.  The pivot value
    list is declared explicitly so the plan stays single-pass (no extra
    distinct-values job) — mandatory at scale."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@query(
    "rollup_order_stats",
    oracle="""
    SELECT
      coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
      coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
      count(*) AS n,
      round(sum(o_totalprice), 4) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup hierarchy totals (status → priority → grand total) in one
    pass; NULL grouping placeholders coalesced to 'ALL' so the hash
    compare is null-safe.

    The grand-total grain is computed as a separate groupless aggregate
    and unioned in (the rollup side drops its () set via grouping_id):
    SQL's GROUPING SETS emit the () row even over EMPTY input — DuckDB
    conforms, Spark's rollup emits nothing — and a groupless ``agg``
    is the one Spark construct that always yields exactly one row, so
    both engines now agree on the empty universe too (round-12
    degenerate-sweep finding)."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
    ]
    grouped = (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("_gid"), *aggs)
        .filter(F.col("_gid") < 3)
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n",
            "sum_price",
        )
    )
    total = o.agg(*aggs).select(
        F.lit("ALL").alias("o_orderstatus"),
        F.lit("ALL").alias("o_orderpriority"),
        "n",
        "sum_price",
    )
    return grouped.unionByName(total)


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
             AS avg_k,
           count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS n_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extension (SURVEY §1.2): extract a typed field
    from the JSON ``props`` column with ``get_json_object`` (JVM-side
    JSON path, no UDF) and aggregate it."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.countDistinct(k).alias("n_k"),
    )


# ---------------------------------------------------------------------------
# Completion of the 22-query battery.  The driver schema omits partsupp,
# l_commitdate/l_receiptdate/l_shipmode, and comment columns, so queries
# that need them are re-shaped onto available columns with the SAME
# plan-shape essence (noted per query); "late" is uniformly defined as
# l_shipdate > o_orderdate + 60 days.
# ---------------------------------------------------------------------------


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade volume by year — a 6-way join
    with a DISJUNCTIVE cross-side predicate.  supplier+nation and
    customer+nation broadcast into lineitem/orders; the only big
    exchange is lineitem⋈orders on orderkey; the nation-pair disjunction
    evaluates after both small joins (it references both sides, so it
    cannot push below either)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz_lit("1997-01-01"))
        & (F.col("l_shipdate") < ntz_lit("1999-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — conditional-sum ratio over
    an 8-way star join.  Every dimension (part, supplier+nation,
    customer+nation+region) broadcasts; lineitem⋈orders is again the one
    big exchange; the share is a single conditional aggregate, not a
    self-join."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 4) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year.
    The schema has no partsupp/ps_supplycost, so cost is re-shaped as
    0.6 × p_retailprice × quantity (same plan shape: profit expression
    spanning part×lineitem columns, LIKE-filtered part broadcast,
    lineitem⋈orders exchange, nation rollup)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey, sum(l.l_extendedprice * l.l_quantity) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, round(value, 4) AS part_value
    FROM val
    WHERE value > (SELECT sum(value) * 0.001 FROM val)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group value exceeding a fraction of the GLOBAL
    total (scalar-subquery HAVING).  partsupp is absent, so per-part
    value comes from NATION_5 suppliers' shipped lineitems.  The global
    total re-aggregates the grouped values (tiny) and broadcasts as a
    one-row cross join — the base table is read and shuffled once."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    val = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    # val feeds both the threshold agg and the filter — persist so the
    # lineitem join/agg runs once, not once per branch
    val = val.persist()
    val.count()
    threshold = val.agg((F.sum("value") * 0.001).alias("_thr"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_thr"))
        .select("p_partkey", F.round("value", 4).alias("part_value"))
    )


@query(
    "tpch_q12_late_shipments",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority counts over late shipments.  No
    l_shipmode/l_commitdate/l_receiptdate, so 'late' is shipdate more
    than 60 days after order date and the grouping dimension is
    l_returnflag.  Plan essence kept: big⋈big join with a CROSS-TABLE
    inequality predicate (evaluates post-join; the shipdate range still
    pushes into the scan) + conditional-count pivot."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz_lit("1997-01-01"))
        & (F.col("l_shipdate") < ntz_lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram — LEFT OUTER join
    (customers with no qualifying orders must appear with count 0,
    exercising null-preserving join + count(col) null semantics) into a
    double aggregation.  The comment-pattern exclusion is re-shaped as a
    priority exclusion, applied as a JOIN condition (not a WHERE — that
    would turn the join inner)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum (view + scalar-subquery equality; ties all surface —
    distinct from a top-1 LIMIT).  Revenue is rounded BEFORE the max
    compare on both engines so double summation order can't flip the
    equality.  The grouped view persists: max and filter both read it."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz_lit("1997-01-01"))
        & (F.col("l_shipdate") < ntz_lit("1997-04-01"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
        .persist()
    )
    rev.count()
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'STANDARD'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per part attribute
    triple, excluding blacklisted suppliers (NOT IN → broadcast
    left-anti join).  partsupp is absent, so lineitem serves as the
    part↔supplier relation.  The part filter broadcasts; count distinct
    rides the one groupBy exchange."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "STANDARD")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
    SELECT s.s_name, round(s.s_acctbal, 4) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 300)
    """,
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers qualified by an AGGREGATED subquery
    (IN over GROUP BY + HAVING → left-semi join on the aggregate
    result).  partsupp's available-quantity check is re-shaped to
    shipped-quantity-of-PROMO-parts > 300 in 1997.  The aggregate side
    reduces lineitem to ≤ |suppliers| rows before the semi join, so the
    join input is tiny regardless of corpus scale."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ntz_lit("1997-01-01"))
        & (F.col("l_shipdate") < ntz_lit("1998-01-01"))
    )
    qualified = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 300)
        .select("l_suppkey")
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(qualified),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 4).alias("s_acctbal"))
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH lines AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
      FROM lines GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lines l
    JOIN per_order po ON l.l_orderkey = po.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE l.late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
      AND n.n_name = 'NATION_9'
    GROUP BY s.s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders — the EXISTS(other supplier) / NOT EXISTS(other LATE
    supplier) pair re-shaped as a TWO-LEVEL aggregate with no distinct
    expansion.  Level 1 collapses lines to (l_orderkey, l_suppkey)
    grain carrying (any_late, late_lines); level 2 groups by
    l_orderkey with PLAIN count/sum/max — no count_distinct (which
    Catalyst expands into a two-level aggregate of its own) and no
    collect_set.  Both levels reuse the join's hash partitioning on
    l_orderkey (HashPartitioning(l_orderkey) satisfies clustering on
    (l_orderkey, l_suppkey)), so the aggregates add NO exchange beyond
    the join shuffle.  Because the filter demands exactly one late
    supplier per order, max(when(any_late, l_suppkey)) IS that
    supplier.  'late' is the 60-day shipdate re-shape (no
    l_commitdate/l_receiptdate in schema).  The orders side carries a
    merge hint: orders is NOT broadcastable at scale, and the SMJ's
    hash partitioning on l_orderkey is exactly what both aggregate
    levels reuse (broadcasting it would force two extra agg
    exchanges).  The nation filter is a scalar subquery (n_name is
    unique), not a join — one fewer broadcast.  Audited plan: 2 join
    exchanges + 1 final s_name exchange + 1 supplier broadcast = 4
    exchanges total."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lines = li.join(o.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("any_late"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).alias("late_lines"),
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum(F.when(F.col("any_late"), 1).otherwise(0)).alias("n_late_supp"),
            F.max(F.when(F.col("any_late"), F.col("l_suppkey"))).alias("l_suppkey"),
            F.sum(F.when(F.col("any_late"), F.col("late_lines")).otherwise(0)).alias(
                "n_late_lines"
            ),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_suppkey", "n_late_lines")
    )
    nk = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_9")
        .select("n_nationkey")
        .scalar()
    )
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == nk)
    return (
        per_order.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("bigint").alias("numwait"))
    )
