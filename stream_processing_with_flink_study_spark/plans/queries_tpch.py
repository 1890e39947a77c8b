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
    compare is null-safe."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n",
            "sum_price",
        )
    )


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
