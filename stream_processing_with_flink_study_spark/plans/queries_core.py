"""Flagship + stateless core (B1-B5) + keyed aggregations (K1-K10).

Each entry is a (Spark callable, DuckDB oracle SQL) pair over the driver
tables.  The ``events`` table plays the sensor-reading role
(FIXTURES.md §1: ``user_id`` ≈ sensor id, ``value`` ≈ temperature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import core, keyed
from ..schemas import TUPLE3_INT
from ..sources import from_elements, load_table
from .registry import query

HOUR_MS = 3_600_000


# --------------------------------------------------------------------------
# Flagship: AverageSensorReadings.java:67-76 — map F→C, keyBy sensor,
# tumbling window, avg.  Driver events: per-user 1h tumbling avg celsius.
# --------------------------------------------------------------------------
@query(
    "flagship_window_avg",
    oracle=f"""
    SELECT
      (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS window_start_ms,
      user_id,
      round(avg((value - 32) * (5.0 / 9.0)), 4) AS avg_celsius
    FROM events
    GROUP BY 1, 2
    """,
)
def flagship_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+K8 flagship (AverageSensorReadings.java:67-76): F→C map, keyed
    1h tumbling-window average.  One shuffle (window,key) with map-side
    partial agg — same topology as the reference's single keyBy exchange.
    """
    events = load_table(spark, sf_dir, "events")
    celsius = core.fahrenheit_to_celsius(
        events.withColumnRenamed("value", "temperature")
    )
    return (
        celsius.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.round(F.avg("temperature"), 4).alias("avg_celsius"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "user_id",
            "avg_celsius",
        )
    )


# --------------------------------------------------------------------------
# B1-B3: BasicTransformations.java:47-81 — filter, map, flatMap(split)
# --------------------------------------------------------------------------
@query(
    "basic_pipeline",
    oracle="""
    SELECT unnest(string_split('user_' || CAST(user_id AS VARCHAR), '_')) AS token
    FROM events
    WHERE value >= 25
    """,
)
def basic_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1+B2+B3 replay (BasicTransformations.java:54-74): filter
    value>=25 (pushed into the parquet scan), map to an id string, split
    + explode.  Entirely JVM-side — no Python in the row path."""
    events = load_table(spark, sf_dir, "events")
    filtered = core.filter_rows(events, F.col("value") >= 25)
    ids = filtered.select(
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("uid")
    )
    return core.flat_map_split(ids, "uid", "_", alias="token")


# --------------------------------------------------------------------------
# K2: RollingSum.java:34-41 — golden 4-row fixture, exact Flink semantics
# --------------------------------------------------------------------------
@query(
    "rolling_sum_tuples",
    oracle="""
    SELECT
      f0,
      CAST(sum(f1) OVER w AS BIGINT) AS f1,
      first_value(f2) OVER w AS f2
    FROM (VALUES (1,2,2,1), (2,3,1,2), (2,2,4,3), (1,5,3,4)) AS t(f0,f1,f2,seq)
    WINDOW w AS (PARTITION BY f0 ORDER BY seq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def rolling_sum_tuples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 golden fixture (RollingSum.java:34-35, FIXTURES.md §4): keyed
    rolling sum over the literal 4-tuple input; non-aggregated fields keep
    the key's first record's values (Flink field-mixing semantics).
    Expected: (1,2,2),(2,3,1),(2,5,1),(1,7,2)."""
    rows = [(1, 2, 2, 1), (2, 3, 1, 2), (2, 2, 4, 3), (1, 5, 3, 4)]
    # StructType.add MUTATES the receiver — build a copy, or every call
    # appends another field to the shared module-level schema
    schema = T.StructType(
        [*TUPLE3_INT.fields, T.StructField("seq", T.IntegerType(), False)]
    )
    df = from_elements(spark, rows, schema)
    rolled = keyed.rolling_sum_flink(df, "f0", "f1", ["seq"])
    return rolled.select("f0", F.col("f1").cast("long").alias("f1"), "f2")


# --------------------------------------------------------------------------
# K2/K3 on real data: per-key running aggregates
# --------------------------------------------------------------------------
@query(
    "rolling_aggs",
    oracle="""
    SELECT
      event_id,
      user_id,
      round(sum(value) OVER w, 4) AS running_sum,
      round(min(value) OVER w, 4) AS running_min,
      round(max(value) OVER w, 4) AS running_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def rolling_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2+K3 (KeyedStream.sum/min/max, 정리/3주차.md:59-64): per-key
    running sum/min/max in arrival order, one row out per row in.  One
    shuffle-sort; all three aggregates share the same window frame so
    Spark evaluates them in a single Window physical node."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_sum"),
        F.round(F.min("value").over(w), 4).alias("running_min"),
        F.round(F.max("value").over(w), 4).alias("running_max"),
    )


# --------------------------------------------------------------------------
# K4: minBy / maxBy — whole-row argmin/argmax per key (정리/3주차.md:64)
# --------------------------------------------------------------------------
@query(
    "min_by_max_by",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value, event_id,
        row_number() OVER (PARTITION BY user_id
                           ORDER BY value ASC,  event_id ASC)  AS rn_min,
        row_number() OVER (PARTITION BY user_id
                           ORDER BY value DESC, event_id DESC) AS rn_max
      FROM events
    )
    SELECT
      user_id,
      min(value) AS min_value,
      max(value) AS max_value,
      max(CASE WHEN rn_min = 1 THEN event_id END) AS min_event_id,
      max(CASE WHEN rn_max = 1 THEN event_id END) AS max_event_id
    FROM ranked
    GROUP BY user_id
    """,
)
def min_by_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 minBy/maxBy (정리/3주차.md:64): the record holding the per-key
    min/max, tie-broken deterministically by event_id (the reference's
    arrival-order tie rule is nondeterministic under parallelism — we
    define the lexicographic (value, event_id) rule).  Single-pass
    ``min_by``/``max_by`` on a struct — no join-back, one shuffle."""
    events = load_table(spark, sf_dir, "events")
    ord_ = F.struct("value", "event_id")
    return events.groupBy("user_id").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min_by("event_id", ord_).alias("min_event_id"),
        F.max_by("event_id", ord_).alias("max_event_id"),
    )


# --------------------------------------------------------------------------
# K5: rolling reduce keeping the max-temperature record per key
# (KeyedTransformations.java:55-62) — final-state form
# --------------------------------------------------------------------------
@query(
    "keyed_reduce_max",
    oracle="""
    SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value, event_type
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def keyed_reduce_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 rolling reduce (KeyedTransformations.java:55-62): per key, the
    full record with the highest value — the reduce's final state.  Ties
    broken by larger event_id on both sides."""
    events = load_table(spark, sf_dir, "events")
    ord_ = F.struct("value", "event_id")
    picked = events.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "ts", "value", "event_type"), ord_
        ).alias("r")
    )
    return picked.select(
        "user_id",
        F.col("r.event_id").alias("event_id"),
        F.unix_millis("r.ts").alias("ts_ms"),
        F.col("r.value").alias("value"),
        F.col("r.event_type").alias("event_type"),
    )


# --------------------------------------------------------------------------
# K1/K6/K7: keyed hash aggregation with the standard agg family
# --------------------------------------------------------------------------
@query(
    "keyed_agg_stats",
    oracle="""
    SELECT
      event_type,
      count(*) AS n,
      round(sum(value), 4) AS sum_value,
      round(avg(value), 4) AS avg_value,
      round(min(value), 4) AS min_value,
      round(max(value), 4) AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def keyed_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 keyBy + K6/K7 aggregate family (RollingSum.java:38,
    정리/4주차.md:186-226): hash-agg per key; Spark plans partial
    (map-side) + final agg so the shuffle carries one row per
    (partition, key) — the property that keeps this O(keys) at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    return keyed.keyed_agg(
        events,
        ["event_type"],
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


# --------------------------------------------------------------------------
# K10: distinct + count-distinct (exact and HLL sketch)
# --------------------------------------------------------------------------
@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10 distinct: hash-agg dedup on the projected pair (column-pruned
    scan; shuffle only the two columns)."""
    events = load_table(spark, sf_dir, "events")
    return keyed.distinct_rows(events, "user_id", "event_type")


@query(
    "count_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_user_id,
           true AS approx_ok
    FROM events
    GROUP BY event_type
    """,
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10 count-distinct, exact + HLL: the exact count plus a check that
    ``approx_count_distinct`` (fixed-size mergeable sketch — the 100 TB
    form) lands within its 5% rsd of the exact answer."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_user_id"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.05)
                - F.countDistinct("user_id")
            )
            <= F.countDistinct("user_id") * 0.15 + 1
        ).alias("approx_ok"),
    )


@query(
    "cube_order_priorities",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 4) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional aggregation: CUBE over (status, priority) with
    grouping_id disambiguating the subtotal levels (K-family
    completeness next to rollup_order_stats).  One pass: Spark expands
    the grouping sets BEFORE the exchange, so the shuffle still carries
    only partial aggregates per (set, group).  The () grain comes from
    a separate groupless agg (always exactly 1 row) unioned in, because
    Spark's cube — unlike the SQL standard and DuckDB — emits nothing
    over empty input (round-12 degenerate-sweep finding)."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    ]
    grouped = (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"), *aggs)
        .filter(F.col("gid") < 3)
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price"
        )
    )
    total = o.agg(*aggs).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit(3).cast("bigint").alias("gid"),
        "n_orders",
        "total_price",
    )
    return grouped.unionByName(total)


@query(
    "rank_customers_by_balance",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           round(percent_rank() OVER w, 4) AS prank,
           CAST(ntile(4) OVER w2 AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC),
           w2 AS (PARTITION BY c_mktsegment
                  ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def rank_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery (dense_rank / percent_rank / ntile) per
    market segment — one partitioned sort serves all three window
    functions.  ntile's window adds c_custkey to the ordering: ranks are
    tie-stable by definition, bucket boundaries are not."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    w2 = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.percent_rank().over(w), 4).alias("prank"),
        F.ntile(4).over(w2).cast("long").alias("quartile"),
    )


@query(
    "percentiles_order_value",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (JVM-side `percentile`,
    the holistic-agg complement to the approx/pandas paths).  Holistic:
    the shuffle carries the group's values, which is why the streaming
    engine pairs this with approx_percentile at scale."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


# --------------------------------------------------------------------------
# inter-purchase intervals: customer-cadence profile per market segment
# --------------------------------------------------------------------------
@query(
    "interpurchase_interval_stats",
    """
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders
    ),
    gaps AS MATERIALIZED (
      SELECT s.o_custkey, s.gap_days, c.c_mktsegment
      FROM seq s JOIN customer c ON c.c_custkey = s.o_custkey
      WHERE s.gap_days IS NOT NULL
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_intervals,
           round(avg(gap_days), 4) AS avg_gap_days,
           round(quantile_cont(gap_days, 0.5), 4) AS p50_gap_days,
           round(quantile_cont(gap_days, 0.9), 4) AS p90_gap_days,
           CAST(sum(CASE WHEN gap_days <= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_30d
    FROM gaps GROUP BY c_mktsegment
    """,
)
def interpurchase_interval_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per market segment: day gaps between each
    customer's consecutive orders (event-time ``lag`` per key — the
    batch twin of a keyed last-value state lookup), rolled up to
    count / mean / exact p50 / p90 / ≤30-day share per segment.  The
    repurchase-cadence profile behind churn models and
    next-order-date features.

    Scale shape: ONE window shuffle keyed by customer (order date +
    order key tiebreak makes the lag deterministic under date ties),
    the segment attach is a BROADCAST of the customer dimension
    projected to two columns, and the final rollup has
    segment-cardinality output.  Exact interpolated percentiles
    JVM-side (`percentile` ≡ DuckDB `quantile_cont`, both R-7); a
    production engine pairs this with approx_percentile at scale.

    Reference scope: keyed lag state, 정리/5주차.md ValueState
    examples."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    gaps = seq.join(
        F.broadcast(cust), seq["o_custkey"] == cust["c_custkey"]
    )
    return gaps.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
        F.round(F.percentile("gap_days", F.lit(0.5)), 4).alias(
            "p50_gap_days"
        ),
        F.round(F.percentile("gap_days", F.lit(0.9)), 4).alias(
            "p90_gap_days"
        ),
        F.sum(F.when(F.col("gap_days") <= 30, 1).otherwise(0))
        .cast("long")
        .alias("n_within_30d"),
    )


# --------------------------------------------------------------------------
# equi-depth (quantile) histogram: the scale-correct ntile
# --------------------------------------------------------------------------
@query(
    "equi_depth_histogram",
    """
    WITH b AS MATERIALIZED (
      SELECT [quantile_cont(o_totalprice, 0.1), quantile_cont(o_totalprice, 0.2),
              quantile_cont(o_totalprice, 0.3), quantile_cont(o_totalprice, 0.4),
              quantile_cont(o_totalprice, 0.5), quantile_cont(o_totalprice, 0.6),
              quantile_cont(o_totalprice, 0.7), quantile_cont(o_totalprice, 0.8),
              quantile_cont(o_totalprice, 0.9)] AS bounds
      FROM orders
    ),
    assigned AS (
      SELECT o_totalprice AS v,
             1 + len(list_filter((SELECT bounds FROM b), x -> v > x))
               AS bucket
      FROM orders
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(v), 4) AS lo,
           round(max(v), 4) AS hi,
           round(avg(v), 4) AS avg_v
    FROM assigned GROUP BY bucket
    """,
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH (decile) histogram of order value — equal-population
    buckets, the histogram optimizers and drift monitors actually want
    (equi-width ``value_histogram`` starves the tails).

    Scale shape: the naive form is ``ntile(10) OVER (ORDER BY v)`` — a
    GLOBAL sort through one partition, exactly what a 100 TB table
    cannot do.  This plan computes the 9 interior decile boundaries
    with ONE exact-percentile aggregate (mergeable partials; swap in
    approx_percentile at extreme scale), broadcasts the 9-double
    array, and assigns buckets map-side by counting boundaries below
    each value — no global sort, no second shuffle beyond the bucket
    rollup.  Bucket assignment uses strict ``>`` against interpolated
    boundaries, which both engines compute bit-identically from the
    same sorted doubles (no summation involved)."""
    orders = load_table(spark, sf_dir, "orders")
    qs = [i / 10 for i in range(1, 10)]
    # one exact-percentile aggregate, collected: 9 doubles come back to
    # the driver and re-enter the plan as LITERALS — the bucket rule
    # below folds into a flat comparison chain (no join, no
    # higher-order-function codegen).  Runtime is dominated by the
    # exact percentile itself; at extreme scale swap approx_percentile
    # and keep the same literal-bounds shape.
    # ONE percentile aggregate with the 9 fractions as an array: nine
    # scalar percentile() calls each buffer+sort the full column
    # independently (9x the work for identical interpolated values);
    # the array form sorts once and reads all nine boundaries off it
    bounds = orders.agg(
        F.percentile(
            "o_totalprice", F.array(*[F.lit(q) for q in qs])
        ).alias("qs")
    ).first()[0]
    if bounds is None:
        # empty universe: the array-percentile is one NULL, where the
        # former nine scalar percentiles were nine NULLs — restore the
        # per-boundary shape so the (empty) bucket assignment below
        # behaves identically (round-12 degenerate sweep)
        bounds = [None] * len(qs)
    bucket = F.lit(1)
    for b in bounds:
        bucket = bucket + F.when(
            F.col("o_totalprice") > F.lit(b), 1
        ).otherwise(0)
    assigned = orders.select(
        F.col("o_totalprice").alias("v"), bucket.alias("bucket")
    )
    return assigned.groupBy(
        F.col("bucket").cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("v"), 4).alias("lo"),
        F.round(F.max("v"), 4).alias("hi"),
        F.round(F.avg("v"), 4).alias("avg_v"),
    )


# --------------------------------------------------------------------------
# Pareto skyline: dominance query as one sorted window, not a self-join
# --------------------------------------------------------------------------
@query(
    "pareto_skyline_orders",
    """
    WITH pts AS MATERIALIZED (
      SELECT o_totalprice AS p, o_orderdate AS d, count(*) AS c
      FROM orders GROUP BY 1, 2
    )
    SELECT round(p, 4) AS price,
           CAST(date_diff('day', DATE '1970-01-01', CAST(d AS DATE))
                AS BIGINT) AS epoch_day,
           CAST(c AS BIGINT) AS n_orders
    FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.p >= a.p AND b.d >= a.d AND (b.p > a.p OR b.d > a.d)
    )
    """,
)
def pareto_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline of orders (maximize price AND recency): the
    set of orders no other order beats on both dimensions — the
    dominance query behind best-offer screens and multi-objective
    candidate pruning.  The ORACLE is the textbook quadratic
    NOT EXISTS (obviously correct ground truth); the Spark plan is the
    O(n log n) form: sort distinct points by (price DESC, date DESC)
    and keep a point iff its date strictly exceeds the running max
    date of everything sorted before it — every dominator sorts
    earlier, so one window pass decides dominance.  Exact (price,
    date) duplicates collapse to one counted point first (identical
    points never dominate each other).

    Scale shape: the distinct-point aggregate is the only fact-sized
    shuffle; the skyline window runs on the (much smaller) point set.
    The single global sort shown here becomes repartitionByRange +
    per-partition running max + a broadcast of per-partition prefix
    maxima at 100 TB — same algebra, two passes, no quadratic step
    anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.groupBy(
        F.col("o_totalprice").alias("p"),
        F.col("o_orderdate").alias("d"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("p"), F.desc("d")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        pts.withColumn("m0", F.max("d").over(w))
        .filter(F.col("m0").isNull() | (F.col("d") > F.col("m0")))
        .select(
            F.round("p", 4).alias("price"),
            F.datediff(F.to_date("d"), F.lit("1970-01-01"))
            .cast("long")
            .alias("epoch_day"),
            F.col("c").cast("long").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# Kaplan-Meier: time-to-second-order survival with right-censoring
# --------------------------------------------------------------------------
@query(
    "kaplan_meier_reorder",
    """
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
             CASE WHEN s.d2 IS NOT NULL
                  THEN date_diff('day', f.d1, s.d2)
                  ELSE date_diff('day', f.d1, (SELECT h FROM horizon))
             END AS t,
             CASE WHEN s.d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM firsts f LEFT JOIN seconds s ON s.k = f.k
    ),
    grp AS MATERIALIZED (
      SELECT t, CAST(sum(ev) AS BIGINT) AS d_i,
             count(*) AS c_all
      FROM obs GROUP BY t
    ),
    atrisk AS (
      SELECT t, d_i,
             (SELECT count(*) FROM obs) - coalesce(sum(c_all) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS n_i
      FROM grp
    ),
    terms AS (
      SELECT t, d_i, n_i, (n_i - d_i) * 1.0 / n_i AS term FROM atrisk
    ),
    km AS (
      SELECT t, d_i, n_i,
             CASE WHEN sum(CASE WHEN term = 0 THEN 1 ELSE 0 END) OVER (
                    ORDER BY t ROWS UNBOUNDED PRECEDING) > 0
                  THEN 0.0
                  ELSE exp(sum(CASE WHEN term > 0 THEN ln(term)
                               ELSE 0 END) OVER (
                    ORDER BY t ROWS UNBOUNDED PRECEDING)) END AS surv
      FROM terms
    )
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_i AS BIGINT) AS n_at_risk,
           d_i AS n_events,
           round(surv - 1e-9, 4) + 0.0 AS survival
    FROM km WHERE d_i > 0
    """,
)
def kaplan_meier_reorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for TIME TO SECOND ORDER, with
    right-censoring at the dataset horizon — the honest repurchase
    curve: customers who simply haven't reordered YET leave the
    at-risk set at their censor time instead of polluting the estimate
    (naive repeat-rate metrics get this wrong by construction).
    S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) over event times.

    Scale shape: one customer-keyed window ranks the orders; the curve
    itself lives on the DISTINCT-gap-day frame (~10³ rows), where the
    at-risk counts are a right-to-left cumulative and the product is
    exp(Σ ln(·)) — both single ordered windows over the tiny frame.
    Counts are exact integers in both engines; the product's window
    SUM differs across engines only by summation-tree order (~1e-15),
    absorbed by the round(x − 1e-9, 4) convention (see
    plans/registry.py header)."""
    orders = load_table(spark, sf_dir, "orders")
    wq = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        F.col("o_custkey").alias("k"),
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(wq).alias("rn"),
    ).persist()
    horizon = orders.agg(
        F.max(F.to_date("o_orderdate"))
    ).first()[0]
    firsts = seq.filter(F.col("rn") == 1).select(
        "k", F.col("d").alias("d1")
    )
    seconds = seq.filter(F.col("rn") == 2).select(
        "k", F.col("d").alias("d2")
    )
    obs = firsts.join(seconds, "k", "left").select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        )
        .otherwise(F.datediff(F.lit(horizon), F.col("d1")))
        .alias("t"),
        F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
    ).persist()
    total = obs.count()
    grp = obs.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d_i"),
        F.count(F.lit(1)).alias("c_all"),
    )
    wt = Window.orderBy("t")
    prev = F.coalesce(
        F.sum("c_all").over(wt.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    term = (F.col("n_i") - F.col("d_i")) * 1.0 / F.col("n_i")
    wcum = wt.rowsBetween(Window.unboundedPreceding, 0)
    hit_zero = F.sum(F.when(term == 0, 1).otherwise(0)).over(wcum)
    lnsum = F.sum(F.when(term > 0, F.log(term)).otherwise(0.0)).over(wcum)
    km = grp.withColumn("n_i", F.lit(total) - prev).withColumn(
        "surv",
        F.when(hit_zero > 0, F.lit(0.0)).otherwise(F.exp(lnsum)),
    )
    return km.filter(F.col("d_i") > 0).select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_i").cast("long").alias("n_at_risk"),
        F.col("d_i").alias("n_events"),
        (F.round(F.col("surv") - 1e-9, 4) + 0.0).alias("survival"),
    )


# --------------------------------------------------------------------------
# cohort LTV triangle: cumulative revenue per customer by cohort x age
# --------------------------------------------------------------------------
@query(
    "cohort_ltv_curve",
    """
    WITH firsts AS MATERIALIZED (
      SELECT o_custkey AS k, min(CAST(o_orderdate AS DATE)) AS d1
      FROM orders GROUP BY 1
    ),
    base AS (
      SELECT f.k, date_trunc('month', f.d1) AS cm,
             (year(CAST(o.o_orderdate AS DATE)) * 12
              + month(CAST(o.o_orderdate AS DATE)))
             - (year(f.d1) * 12 + month(f.d1)) AS age,
             o.o_totalprice AS rev
      FROM firsts f JOIN orders o ON o.o_custkey = f.k
    ),
    cell AS MATERIALIZED (
      SELECT cm, age, sum(rev) AS r FROM base GROUP BY 1, 2
    ),
    cn AS MATERIALIZED (
      SELECT date_trunc('month', d1) AS cm, count(*) AS n
      FROM firsts GROUP BY 1
    ),
    cum AS (
      SELECT cm, age,
             sum(r) OVER (PARTITION BY cm ORDER BY age
                          ROWS UNBOUNDED PRECEDING) AS cr
      FROM cell
    )
    SELECT strftime(cum.cm, '%Y-%m') AS cohort_month,
           CAST(age AS INT) AS age_months,
           CAST(cn.n AS BIGINT) AS cohort_size,
           round(cr / cn.n - 1e-9, 4) AS cum_ltv
    FROM cum JOIN cn ON cn.cm = cum.cm
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle — customers grouped by FIRST-order month,
    cumulative revenue per cohort member at each month of age: the
    payback-period / LTV:CAC artifact finance reads next to
    ``cohort_retention``'s activity view (retention says who came
    back; LTV says what they were worth).

    Scale shape: first-order dates are one keyed aggregate; the
    revenue attach joins orders back on the customer key (same
    shuffle key, AQE-coalesced); the triangle itself is
    cohort×age-sized, where the cumulative window runs per cohort.
    Month age is exact integer arithmetic (y·12+m differences) on both
    engines — no fractional months_between ambiguity."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        "o_totalprice",
    )
    firsts = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.min("d").alias("d1")
    )
    mnum = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    base = firsts.join(
        orders, orders["o_custkey"] == firsts["k"]
    ).select(
        F.date_trunc("month", "d1").cast("date").alias("cm"),
        (mnum(F.col("d")) - mnum(F.col("d1"))).alias("age"),
        F.col("o_totalprice").alias("rev"),
    )
    cell = base.groupBy("cm", "age").agg(F.sum("rev").alias("r"))
    cn = firsts.groupBy(
        F.date_trunc("month", "d1").cast("date").alias("cm")
    ).agg(F.count(F.lit(1)).alias("n"))
    wc = Window.partitionBy("cm").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cell.withColumn("cr", F.sum("r").over(wc))
    return cum.join(F.broadcast(cn), "cm").select(
        F.date_format("cm", "yyyy-MM").alias("cohort_month"),
        F.col("age").cast("int").alias("age_months"),
        F.col("n").cast("long").alias("cohort_size"),
        F.round(F.col("cr") / F.col("n") - 1e-9, 4).alias("cum_ltv"),
    )


# --------------------------------------------------------------------------
# price-volume bridge: revenue change decomposition between two years
# --------------------------------------------------------------------------
@query(
    "price_volume_decomposition",
    """
    WITH li AS (
      SELECT p.p_brand AS brand,
             year(CAST(o.o_orderdate AS DATE)) AS yr,
             l.l_quantity AS q, l.l_extendedprice AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE year(CAST(o.o_orderdate AS DATE)) IN (1996, 1997)
    ),
    per AS MATERIALIZED (
      SELECT brand, yr, sum(q) AS q, sum(rev) AS rev,
             sum(rev) / sum(q) AS p
      FROM li GROUP BY 1, 2
    ),
    ab AS (
      SELECT a.brand,
             a.q AS qa, a.rev AS ra, a.p AS pa,
             b.q AS qb, b.rev AS rb, b.p AS pb
      FROM per a JOIN per b ON b.brand = a.brand
      WHERE a.yr = 1996 AND b.yr = 1997
    )
    SELECT brand,
           round(ra, 4) AS rev_1996,
           round(rb, 4) AS rev_1997,
           round(rb - ra, 4) AS delta_rev,
           round((qb - qa) * pa, 4) AS volume_effect,
           round((pb - pa) * qb, 4) AS price_effect
    FROM ab
    """,
)
def price_volume_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume bridge per brand, 1996 → 1997: ΔRev decomposed as
    (Δquantity)·p₀ (volume effect, Laspeyres) + (Δprice)·q₁ (price
    effect, Paasche) — the two terms sum EXACTLY to ΔRev, which is
    what makes this the bridge chart finance actually signs off on.

    Scale shape: one pass over the date-pruned fact with two broadcast
    dimension attaches, a (brand × 2)-sized aggregate, and a self-join
    on the tiny per-period frame.  Unit price is revenue-weighted
    (Σrev/Σq), so the decomposition is exact by construction."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year(F.to_date("o_orderdate")).alias("yr")
    ).filter(F.col("yr").isin(1996, 1997))
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    j = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    per = j.groupBy(F.col("p_brand").alias("brand"), "yr").agg(
        F.sum("l_quantity").alias("q"),
        F.sum("l_extendedprice").alias("rev"),
    ).withColumn("p", F.col("rev") / F.col("q"))
    a = per.filter(F.col("yr") == 1996).select(
        "brand",
        F.col("q").alias("qa"),
        F.col("rev").alias("ra"),
        F.col("p").alias("pa"),
    )
    b = per.filter(F.col("yr") == 1997).select(
        F.col("brand").alias("b_brand"),
        F.col("q").alias("qb"),
        F.col("rev").alias("rb"),
        F.col("p").alias("pb"),
    )
    return a.join(b, a["brand"] == b["b_brand"]).select(
        "brand",
        F.round("ra", 4).alias("rev_1996"),
        F.round("rb", 4).alias("rev_1997"),
        F.round(F.col("rb") - F.col("ra"), 4).alias("delta_rev"),
        F.round(
            (F.col("qb") - F.col("qa")) * F.col("pa"), 4
        ).alias("volume_effect"),
        F.round(
            (F.col("pb") - F.col("pa")) * F.col("qb"), 4
        ).alias("price_effect"),
    )


# --------------------------------------------------------------------------
# growth accounting: new / retained / resurrected / churned per month
# --------------------------------------------------------------------------
@query(
    "growth_accounting_monthly",
    """
    WITH act AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS k,
             (year(CAST(o_orderdate AS DATE)) * 12
              + month(CAST(o_orderdate AS DATE))) AS m
      FROM orders
    ),
    firsts AS MATERIALIZED (SELECT k, min(m) AS fm FROM act GROUP BY k),
    lab AS MATERIALIZED (
      SELECT a.k, a.m,
             CASE WHEN a.m = f.fm THEN 'new'
                  WHEN p.k IS NOT NULL THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM act a
      JOIN firsts f ON f.k = a.k
      LEFT JOIN act p ON p.k = a.k AND p.m = a.m - 1
    ),
    churn AS (
      SELECT a.m + 1 AS m, count(*) AS n_churned
      FROM act a LEFT JOIN act nx ON nx.k = a.k AND nx.m = a.m + 1
      WHERE nx.k IS NULL AND a.m < (SELECT max(m) FROM act)
      GROUP BY a.m + 1
    )
    SELECT CAST(l.m AS INT) AS month_num,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(coalesce(max(c.n_churned), 0) AS BIGINT) AS n_churned
    FROM lab l LEFT JOIN churn c ON c.m = l.m
    GROUP BY l.m
    """,
)
def growth_accounting_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly GROWTH ACCOUNTING of the customer base — every active
    customer classified as new (first-ever month), retained (also
    active last month) or resurrected (returning after a gap), plus
    the churned count (active last month, gone this month): the
    net-MAU decomposition growth teams publish (new + retained +
    resurrected − churned_next explains every month-over-month
    delta).

    Scale shape: activity collapses to distinct (customer, month)
    pairs in one map-side-combined aggregate; first-month and
    adjacent-month lookups are self-joins ON THE SAME customer key
    (one shuffle partitioning reused three times); output is
    month-count-sized.  Month keys are exact y·12+m integers."""
    orders = load_table(spark, sf_dir, "orders")
    act = orders.select(
        F.col("o_custkey").alias("k"),
        (
            F.year(F.to_date("o_orderdate")) * 12
            + F.month(F.to_date("o_orderdate"))
        ).alias("m"),
    ).distinct().persist()
    act.count()
    firsts = act.groupBy("k").agg(F.min("m").alias("fm"))
    prev = act.select("k", (F.col("m") + 1).alias("m"), F.lit(1).alias("had_prev"))
    lab = (
        act.join(firsts, "k")
        .join(prev, ["k", "m"], "left")
        .select(
            "m",
            F.when(F.col("m") == F.col("fm"), "new")
            .when(F.col("had_prev").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("status"),
        )
    )
    max_m = act.agg(F.max("m")).first()[0]
    nxt = act.select("k", (F.col("m") - 1).alias("m"), F.lit(1).alias("has_next"))
    churn = (
        act.join(nxt, ["k", "m"], "left")
        .filter(F.col("has_next").isNull() & (F.col("m") < max_m))
        .groupBy((F.col("m") + 1).alias("m"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    agg = lab.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(
            F.when(F.col("status") == "retained", 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(F.col("status") == "resurrected", 1).otherwise(0)
        ).alias("n_resurrected"),
    )
    return agg.join(F.broadcast(churn), "m", "left").select(
        F.col("m").cast("int").alias("month_num"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_new").cast("long").alias("n_new"),
        F.col("n_retained").cast("long").alias("n_retained"),
        F.col("n_resurrected").cast("long").alias("n_resurrected"),
        F.coalesce(F.col("n_churned"), F.lit(0))
        .cast("long")
        .alias("n_churned"),
    )


# --------------------------------------------------------------------------
# dormancy risk: days-quiet vs the customer's OWN cadence
# --------------------------------------------------------------------------
@query(
    "dormancy_risk_screen",
    """
    WITH horizon AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS h FROM orders
    ),
    seq AS (
      SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d,
             date_diff('day',
                       lag(CAST(o_orderdate AS DATE)) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey),
                       CAST(o_orderdate AS DATE)) AS gap
      FROM orders
    ),
    per AS MATERIALIZED (
      SELECT k, max(d) AS last_d,
             CAST(count(gap) AS BIGINT) AS n_gaps,
             quantile_cont(gap, 0.5) AS med_gap
      FROM seq GROUP BY k HAVING count(gap) >= 3
    ),
    risk AS (
      SELECT k,
             date_diff('day', last_d, (SELECT h FROM horizon))
               AS days_quiet,
             med_gap,
             round(date_diff('day', last_d, (SELECT h FROM horizon))
                   / med_gap, 4) AS risk_ratio
      FROM per
    )
    SELECT CAST(count(*) AS BIGINT) AS n_screened,
           CAST(sum(CASE WHEN risk_ratio > 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_at_risk,
           round(avg(risk_ratio), 4) AS avg_risk_ratio,
           round(quantile_cont(risk_ratio, 0.9), 4) AS p90_risk_ratio,
           CAST(max(days_quiet) AS BIGINT) AS max_days_quiet
    FROM risk
    """,
)
def dormancy_risk_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy risk scaled to each customer's OWN cadence: days since
    last order divided by the customer's median inter-order gap — a
    weekly buyer quiet for a month screams churn; a quarterly buyer
    quiet for a month is on schedule.  Population-level thresholds
    (``customer_repeat_rate``) can't see the difference; this is the
    personalized churn screen CRM pipelines page on.

    Scale shape: one customer-keyed lag window (deterministic
    (date, orderkey) order), a per-customer rollup with an exact
    median, and a scalar summary — risk_ratio thresholds compare the
    ROUNDED ratio so both engines make the same boundary call."""
    orders = load_table(spark, sf_dir, "orders")
    horizon = orders.agg(F.max(F.to_date("o_orderdate"))).first()[0]
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        F.col("o_custkey").alias("k"),
        F.to_date("o_orderdate").alias("d"),
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).alias("gap"),
    )
    per = (
        seq.groupBy("k")
        .agg(
            F.max("d").alias("last_d"),
            F.count("gap").alias("n_gaps"),
            F.percentile("gap", F.lit(0.5)).alias("med_gap"),
        )
        .filter(F.col("n_gaps") >= 3)
    )
    risk = per.select(
        F.datediff(F.lit(horizon), F.col("last_d")).alias("days_quiet"),
        F.round(
            F.datediff(F.lit(horizon), F.col("last_d"))
            / F.col("med_gap"),
            4,
        ).alias("risk_ratio"),
    )
    return risk.agg(
        F.count(F.lit(1)).cast("long").alias("n_screened"),
        F.sum(F.when(F.col("risk_ratio") > 2, 1).otherwise(0))
        .cast("long")
        .alias("n_at_risk"),
        F.round(F.avg("risk_ratio"), 4).alias("avg_risk_ratio"),
        F.round(F.percentile("risk_ratio", F.lit(0.9)), 4).alias(
            "p90_risk_ratio"
        ),
        F.max("days_quiet").cast("long").alias("max_days_quiet"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap CI: the distributed bootstrap, deterministic weights
# --------------------------------------------------------------------------
BOOT_REPS = 20
# P(Poisson(1) <= k) for k = 0..3 as 32-bit hex thresholds; md5-derived
# uniforms compare as fixed-width lowercase hex strings on both engines
_BOOT_T = ("5e2d58d8", "bc5ab1b1", "eb715e1d", "fb239797")


def _boot_w_sql(r: int) -> str:
    h = f"substr(md5('bs{r}|' || o_orderkey), 1, 8)"
    return (
        f"CASE WHEN {h} < '{_BOOT_T[0]}' THEN 0"
        f" WHEN {h} < '{_BOOT_T[1]}' THEN 1"
        f" WHEN {h} < '{_BOOT_T[2]}' THEN 2"
        f" WHEN {h} < '{_BOOT_T[3]}' THEN 3 ELSE 4 END"
    )


def _boot_oracle() -> str:
    reps = ",\n             ".join(
        f"sum({_boot_w_sql(r)} * o_totalprice) * 1.0"
        f" / sum({_boot_w_sql(r)}) AS m{r}"
        for r in range(BOOT_REPS)
    )
    arr = ", ".join(f"m{r}" for r in range(BOOT_REPS))
    return f"""
    WITH m AS MATERIALIZED (
      SELECT avg(o_totalprice) AS point,
             {reps}
      FROM orders
    ),
    reps AS (SELECT point, unnest([{arr}]) AS mr FROM m)
    SELECT round(avg(point), 4) AS point_mean,
           CAST(count(*) AS BIGINT) AS n_reps,
           round(stddev_samp(mr), 4) AS boot_se,
           round(avg(point) - 1.96 * stddev_samp(mr), 4) AS ci_lo,
           round(avg(point) + 1.96 * stddev_samp(mr), 4) AS ci_hi
    FROM reps
    """


@query("poisson_bootstrap_ci", _boot_oracle())
def poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap standard error and 95% CI for mean order value via the
    POISSON bootstrap — the only bootstrap that works distributed:
    instead of resampling n rows with replacement (impossible without
    a global index), each row enters replicate r with weight
    ~ Poisson(1), and every replicate mean is a weighted aggregate in
    the SAME single scan.  Weights are deterministic md5 uniforms cut
    at the Poisson CDF (fixed-width hex string compares — identical
    in both engines), so the whole resampling procedure is
    reproducible and oracle-checkable.

    Scale shape: ONE pass computes the point estimate and all {reps}
    replicate (Σwx, Σw) pairs map-side combined; the replicate frame
    is {reps} rows.  This is how you bootstrap a 100 TB metric.""".format(
        reps=BOOT_REPS
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )

    def w(r: int):
        h = F.substring(
            F.md5(F.concat(F.lit(f"bs{r}|"), F.col("o_orderkey"))), 1, 8
        )
        return (
            F.when(h < _BOOT_T[0], 0)
            .when(h < _BOOT_T[1], 1)
            .when(h < _BOOT_T[2], 2)
            .when(h < _BOOT_T[3], 3)
            .otherwise(4)
        )

    aggs = [F.avg("o_totalprice").alias("point")]
    for r in range(BOOT_REPS):
        aggs.append(
            (
                F.sum(w(r) * F.col("o_totalprice"))
                * 1.0
                / F.sum(w(r))
            ).alias(f"m{r}")
        )
    m = orders.agg(*aggs)
    reps = m.select(
        "point",
        F.explode(
            F.array(*[F.col(f"m{r}") for r in range(BOOT_REPS)])
        ).alias("mr"),
    )
    return reps.agg(
        F.round(F.avg("point"), 4).alias("point_mean"),
        F.count(F.lit(1)).cast("long").alias("n_reps"),
        F.round(F.stddev_samp("mr"), 4).alias("boot_se"),
        F.round(
            F.avg("point") - 1.96 * F.stddev_samp("mr"), 4
        ).alias("ci_lo"),
        F.round(
            F.avg("point") + 1.96 * F.stddev_samp("mr"), 4
        ).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# revenue waterfall: gross -> discount -> net -> tax -> charged, by year
# --------------------------------------------------------------------------
@query(
    "revenue_waterfall_yearly",
    """
    SELECT year(CAST(l_shipdate AS DATE)) AS ship_year,
           round(sum(l_extendedprice), 4) AS gross,
           round(sum(l_extendedprice * l_discount), 4) AS discount_amt,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS net,
           round(sum(l_extendedprice * (1 - l_discount) * l_tax), 4)
             AS tax_amt,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
                 4) AS charged,
           round(sum(l_extendedprice * l_discount)
                 / sum(l_extendedprice), 6) AS discount_rate,
           round(sum(l_extendedprice * (1 - l_discount) * l_tax)
                 / sum(l_extendedprice * (1 - l_discount)), 6)
             AS effective_tax_rate
    FROM lineitem
    GROUP BY 1
    """,
)
def revenue_waterfall_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall by ship year — gross → −discount → net →
    +tax → charged, with the effective discount and tax rates: the
    bridge from list price to cash the finance close reconciles (and
    TPC-H q1's pricing summary re-cut as a time series with explicit
    step amounts, so consecutive columns difference to zero by
    construction).

    Scale shape: one map-side-combined aggregate over the fact table,
    year-cardinality output; every step amount is a second expression
    over the SAME scan — no second pass, no join."""
    li = load_table(spark, sf_dir, "lineitem")
    gross = F.sum("l_extendedprice")
    disc = F.sum(F.col("l_extendedprice") * F.col("l_discount"))
    net = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    tax = F.sum(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * F.col("l_tax")
    )
    charged = F.sum(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    return li.groupBy(
        F.year(F.to_date("l_shipdate")).alias("ship_year")
    ).agg(
        F.round(gross, 4).alias("gross"),
        F.round(disc, 4).alias("discount_amt"),
        F.round(net, 4).alias("net"),
        F.round(tax, 4).alias("tax_amt"),
        F.round(charged, 4).alias("charged"),
        F.round(disc / gross, 6).alias("discount_rate"),
        F.round(tax / net, 6).alias("effective_tax_rate"),
    )


RMST_TAUS = (90, 180, 365)


@query(
    "rmst_repurchase",
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
             CASE WHEN s.d2 IS NOT NULL
                  THEN date_diff('day', f.d1, s.d2)
                  ELSE date_diff('day', f.d1, (SELECT h FROM horizon))
             END AS t,
             CASE WHEN s.d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM firsts f LEFT JOIN seconds s ON s.k = f.k
    ),
    grp AS MATERIALIZED (
      SELECT t, CAST(sum(ev) AS BIGINT) AS d_i, count(*) AS c_all
      FROM obs GROUP BY t
    ),
    atrisk AS (
      SELECT t, d_i,
             (SELECT count(*) FROM obs) - coalesce(sum(c_all) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS n_i
      FROM grp
    ),
    terms AS (
      SELECT t, d_i, (n_i - d_i) * 1.0 / n_i AS term FROM atrisk
      WHERE d_i > 0
    ),
    km AS MATERIALIZED (
      SELECT t,
             CASE WHEN sum(CASE WHEN term = 0 THEN 1 ELSE 0 END) OVER (
                    ORDER BY t ROWS UNBOUNDED PRECEDING) > 0
                  THEN 0.0
                  ELSE exp(sum(CASE WHEN term > 0 THEN ln(term)
                               ELSE 0 END) OVER (
                    ORDER BY t ROWS UNBOUNDED PRECEDING)) END AS surv
      FROM terms
    ),
    taus(tau) AS (VALUES {", ".join(f"({t})" for t in RMST_TAUS)}),
    pieces AS (
      SELECT x.tau, k.t, k.surv,
             coalesce(lag(k.surv) OVER (
               PARTITION BY x.tau ORDER BY k.t), 1.0)
             * (least(k.t, x.tau)
                - least(coalesce(lag(k.t) OVER (
                    PARTITION BY x.tau ORDER BY k.t), 0), x.tau))
               AS piece,
             row_number() OVER (
               PARTITION BY x.tau ORDER BY k.t DESC) AS rdesc
      FROM km k CROSS JOIN taus x
    ),
    cum AS (
      SELECT tau, t, surv, rdesc,
             sum(piece) OVER (
               PARTITION BY tau ORDER BY t ROWS UNBOUNDED PRECEDING)
               AS cum_area,
             min(CASE WHEN t <= tau THEN surv END)
               OVER (PARTITION BY tau) AS surv_tau
      FROM pieces
    )
    SELECT CAST(tau AS BIGINT) AS tau_days,
           round(cum_area + surv * (tau - least(t, tau)) - 1e-9, 4)
             + 0.0 AS rmst_days,
           round(coalesce(surv_tau, 1.0) - 1e-9, 4) + 0.0
             AS surv_at_horizon
    FROM cum WHERE rdesc = 1
    """,
)
def rmst_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time of the repurchase curve at 90 /
    180 / 365-day horizons — the scalar the survival literature
    recommends OVER median survival when curves are censored-heavy
    (RMST(τ) = ∫₀^τ S(t) dt = expected reorder-free days within τ;
    τ − RMST is the expected 'active waiting' a retention team can
    claim back).  Extends ``kaplan_meier_reorder``: same observation /
    at-risk / product-limit chain, then the step-function integral as
    lag-width × previous-survival pieces accumulated through an
    ORDERED window (never a bag SUM — float accumulation stays
    order-deterministic across engines, the registry's windowed-sum
    convention), with the post-last-event tail S(t_last)·(τ − t_last)
    added on the final row.

    Scale shape: identical to the KM query — customer-keyed ranking,
    then every curve/integral op lives on the tiny distinct-gap frame
    × 3 horizon literals."""
    orders = load_table(spark, sf_dir, "orders")
    wq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_custkey").alias("k"),
        F.to_date("o_orderdate").alias("d"),
        F.row_number().over(wq).alias("rn"),
    )
    # first/second order dates in ONE pass: the groupBy(k) reuses the
    # window's hash partitioning (no second exchange, no self-join),
    # and the horizon max rides in as a broadcast scalar instead of an
    # eager .first() — the whole query is now a single lazy action
    horizon = orders.agg(F.max(F.to_date("o_orderdate")).alias("h"))
    obs = (
        seq.filter(F.col("rn") <= 2)
        .groupBy("k")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
            F.min(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
            .otherwise(F.datediff(F.col("h"), F.col("d1")))
            .alias("t"),
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    grp = obs.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d_i"),
        F.count(F.lit(1)).alias("c_all"),
    )
    wt = Window.orderBy("t")
    # at-risk count = suffix sum of the per-gap totals (exact ints,
    # identical to the old total-minus-prefix form, minus the count())
    n_at_risk = F.sum("c_all").over(
        wt.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    term = (F.col("n_i") - F.col("d_i")) * 1.0 / F.col("n_i")
    wcum = wt.rowsBetween(Window.unboundedPreceding, 0)
    hit_zero = F.sum(F.when(term == 0, 1).otherwise(0)).over(wcum)
    lnsum = F.sum(F.when(term > 0, F.log(term)).otherwise(0.0)).over(wcum)
    km = (
        grp.withColumn("n_i", n_at_risk)
        .filter(F.col("d_i") > 0)
        .withColumn(
            "surv",
            F.when(hit_zero > 0, 0.0).otherwise(F.exp(lnsum)),
        )
        .select("t", "surv")
    )
    taus = spark.createDataFrame([(t,) for t in RMST_TAUS], "tau int")
    wtau = Window.partitionBy("tau").orderBy("t")
    lag_surv = F.coalesce(F.lag("surv").over(wtau), F.lit(1.0))
    # coalesce BEFORE least: both engines' least() IGNORES nulls, so
    # least(lag(t)=NULL, tau) = tau — the planted RMST test caught both
    # engines sharing that bug (oracle green, answer wrong)
    lag_t = F.least(
        F.coalesce(F.lag("t").over(wtau), F.lit(0)), F.col("tau")
    )
    piece = lag_surv * (F.least(F.col("t"), F.col("tau")) - lag_t)
    pieces = km.crossJoin(F.broadcast(taus)).select(
        "tau",
        "t",
        "surv",
        piece.alias("piece"),
        F.row_number()
        .over(Window.partitionBy("tau").orderBy(F.desc("t")))
        .alias("rdesc"),
    )
    cum = pieces.withColumn(
        "cum_area",
        F.sum("piece").over(
            wtau.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        # S(tau) = surv at the LAST event time <= tau, NOT the surv on
        # the rdesc=1 row (the globally last event time — when events
        # run past tau that row reports S(t_max), identical for every
        # tau; round-9 advice).  KM surv is non-increasing in t, so
        # min over {t <= tau} IS the last step's value — min, not a
        # float accumulation, stays order-deterministic across engines.
        # No event <= tau -> curve hasn't stepped yet -> S(tau) = 1.
        "surv_tau",
        F.min(
            F.when(F.col("t") <= F.col("tau"), F.col("surv"))
        ).over(Window.partitionBy("tau")),
    )
    return cum.filter(F.col("rdesc") == 1).select(
        F.col("tau").cast("long").alias("tau_days"),
        (
            F.round(
                F.col("cum_area")
                + F.col("surv")
                * (F.col("tau") - F.least(F.col("t"), F.col("tau")))
                - 1e-9,
                4,
            )
            + 0.0
        ).alias("rmst_days"),
        (
            F.round(F.coalesce(F.col("surv_tau"), F.lit(1.0)) - 1e-9, 4)
            + 0.0
        ).alias("surv_at_horizon"),
    )
