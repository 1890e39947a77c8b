"""Scale-technique demonstrations as oracle-checked queries.

The reference hand-tunes physical distribution (``정리/3주차.md:86-108``
— shuffle/rebalance/broadcast/partitionCustom); at 100 TB the two
techniques Spark users add on top of Catalyst's defaults are (a)
two-phase salted aggregation for skewed keys and (b) bucket-binned band
joins when a range predicate has no selective equi-key.  Each is
implemented here as a first-class query whose oracle is the *unsalted /
un-binned* formulation — proving the rewrite is semantics-preserving,
which is the whole point of the technique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

BAND_MS = 900_000  # 15 minutes


@query(
    "salted_skew_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS sum_value,
           round(sum(value) / count(*), 4) AS avg_value
    FROM events GROUP BY event_type
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (D6 ``partitionCustom`` territory,
    ``정리/3주차.md:94-108``): ``event_type`` has ~5 values, so a naive
    groupBy sends every row for a hot key to ONE reducer.  Salting
    splits each key across 64 sub-keys (phase 1: partial per
    (key, salt)), then merges the 64 partials per key (phase 2: 64-row
    shuffle).  At 100 TB the second exchange carries key_count × 64
    rows — nothing — while phase 1 parallelizes across the cluster.
    The oracle is the unsalted groupBy: identical results required.

    Note Spark's map-side partial aggregation already does this when
    the upstream has many partitions; the explicit salt is the pattern
    for when partials DON'T help (e.g. high-cardinality accumulators
    like collect_set, or a skewed join key)."""
    events = load_table(spark, sf_dir, "events")
    salted = events.withColumn(
        "_salt", F.pmod(F.hash("event_id"), F.lit(64))
    )
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("value").alias("_sum"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("_n").cast("bigint").alias("n"),
            F.sum("_sum").alias("_sum_all"),
        )
        .select(
            "event_type",
            "n",
            F.round("_sum_all", 4).alias("sum_value"),
            F.round(F.col("_sum_all") / F.col("n"), 4).alias("avg_value"),
        )
    )


@query(
    "interval_join_binned",
    oracle=f"""
    SELECT
      p.event_id AS p_event_id,
      e.event_id AS e_event_id,
      p.user_id,
      (epoch_us(e.ts) - epoch_us(p.ts)) // 1000 AS diff_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND epoch_us(e.ts) >= epoch_us(p.ts) - {BAND_MS * 1000}
     AND epoch_us(e.ts) <= epoch_us(p.ts) + {BAND_MS * 1000}
    """,
)
def interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 interval join executed the bucket-binned way: bin both sides
    to band-width buckets, explode the probe side to its 3 adjacent
    bins, equi-join on (key, bin), then filter the exact band.

    Why it matters at scale: a band predicate alone forces a
    sort-merge/nested-loop over each key group; when a key is hot (or
    absent), runtime is O(n·m) within the group.  Binning turns the
    time dimension itself into an equi-join key, bounding every hash
    bucket to 3 band-widths of rows regardless of key skew.  Each true
    pair matches exactly once (the exploded bins are distinct), so no
    dedup pass is needed — the oracle is the plain band join."""
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        (F.unix_millis("ts") / BAND_MS).cast("long").alias("_pbin"),
    )
    e = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
        (F.unix_millis("ts") / BAND_MS).cast("long").alias("_bin"),
    )
    probe = p.withColumn(
        "_bin", F.explode(F.array(F.col("_pbin") - 1, F.col("_pbin"), F.col("_pbin") + 1))
    )
    diff_us = F.unix_micros("e_ts") - F.unix_micros("p_ts")
    return (
        probe.join(
            e,
            (F.col("user_id") == F.col("e_user_id")) & (probe["_bin"] == e["_bin"]),
        )
        .filter(
            (diff_us >= -BAND_MS * 1000) & (diff_us <= BAND_MS * 1000)
        )
        .select(
            "p_event_id",
            "e_event_id",
            "user_id",
            (diff_us / 1000).cast("long").alias("diff_ms"),
        )
    )


@query(
    "grouping_sets_priority",
    oracle="""
    SELECT
      CASE WHEN GROUPING(o_orderpriority) = 1 THEN '__all__'
           ELSE o_orderpriority END AS priority,
      CASE WHEN GROUPING(o_orderstatus) = 1 THEN '__all__'
           ELSE o_orderstatus END AS status,
      CAST(count(*) AS BIGINT) AS n,
      round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of the K+ cube/rollup
    family): four aggregation grains in ONE pass over the grouped sets
    — Spark expands the sets via a single Expand node feeding one hash
    aggregate, so the input is scanned once no matter how many grains
    are requested.  The () grain is a separate groupless aggregate
    UNION ALL-ed in: the SQL standard (and DuckDB) emit the global row
    even over empty input, Spark's grouping sets do not, and a
    groupless aggregate is the construct both engines agree always
    yields one row (round-12 degenerate-sweep finding)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT
          CASE WHEN GROUPING(o_orderpriority) = 1 THEN '__all__'
               ELSE o_orderpriority END AS priority,
          CASE WHEN GROUPING(o_orderstatus) = 1 THEN '__all__'
               ELSE o_orderstatus END AS status,
          count(*) AS n,
          round(sum(o_totalprice), 2) AS total
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
        UNION ALL
        SELECT '__all__' AS priority, '__all__' AS status,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM gs_orders
        """
    )


@query(
    "ohlc_hourly",
    oracle="""
    WITH ranked AS (
      SELECT user_id,
             (epoch_ms(ts) // 3600000) * 3600000 AS w_start,
             value,
             row_number() OVER (
               PARTITION BY user_id, epoch_ms(ts) // 3600000
               ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (
               PARTITION BY user_id, epoch_ms(ts) // 3600000
               ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT user_id, w_start,
           round(max(CASE WHEN rn_open = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(max(CASE WHEN rn_close = 1 THEN value END), 4) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked GROUP BY user_id, w_start
    """,
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling (the time-series rollup every metrics store
    runs): per (user, hour) the first/highest/lowest/last value.  Open
    and close are picked by row_number with a full (ts, event_id) tie
    order so both engines choose the same row; the window sort and the
    following aggregation share one (user, hour) exchange."""
    events = load_table(spark, sf_dir, "events")
    hour = (F.unix_millis("ts") / 3_600_000).cast("long")
    base = events.select(
        "user_id",
        (hour * 3_600_000).alias("w_start"),
        "value",
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id", "w_start")
    asc = w.orderBy("ts", "event_id")
    desc = w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = base.select(
        "user_id",
        "w_start",
        "value",
        F.row_number().over(asc).alias("rn_open"),
        F.row_number().over(desc).alias("rn_close"),
    )
    return ranked.groupBy("user_id", "w_start").agg(
        F.round(F.max(F.when(F.col("rn_open") == 1, F.col("value"))), 4).alias(
            "open"
        ),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.round(
            F.max(F.when(F.col("rn_close") == 1, F.col("value"))), 4
        ).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sample_reservoir_per_key",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT lang, doc_id, n_chars, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 20
    """,
)
def sample_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key reservoir sampling, the deterministic distributed way:
    ordering by a cryptographic hash of the row id IS a uniform random
    permutation (fixed across engines and runs — md5 gives both sides
    the same bytes), and top-20-per-key over that ordering is the
    reservoir.  Executes as one hash exchange on the key + per-group
    TakeOrdered; no RNG state, no driver round-trips, reproducible
    splits — the property that matters when a 100 TB corpus is sampled
    by 1000 executors independently."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 20)
    )


@query(
    "full_outer_reconcile",
    oracle="""
    WITH snap_a AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 != 0
    ), snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 != 0
    )
    SELECT
      coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      CASE WHEN a.o_orderkey IS NULL THEN 'added'
           WHEN b.o_orderkey IS NULL THEN 'removed'
           WHEN a.o_totalprice != b.o_totalprice THEN 'changed'
           ELSE 'same' END AS status,
      round(a.o_totalprice, 2) AS price_a,
      round(b.o_totalprice, 2) AS price_b
    FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
    """,
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (the CDC-diff every warehouse sync
    needs): FULL OUTER join of two table versions classifying each key
    added / removed / changed / same.  Full-outer is the one join shape
    that can never broadcast (both sides must survive), so it plans as
    a sort-merge join on the key — worth pinning in a test suite
    because it exercises the join path the optimizer can't shortcut."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price_a_raw")
    )
    b = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price_b_raw"),
    )
    j = a.join(b, "o_orderkey", "full_outer")
    return j.select(
        "o_orderkey",
        F.when(F.col("price_a_raw").isNull(), "added")
        .when(F.col("price_b_raw").isNull(), "removed")
        .when(F.col("price_a_raw") != F.col("price_b_raw"), "changed")
        .otherwise("same")
        .alias("status"),
        F.round("price_a_raw", 2).alias("price_a"),
        F.round("price_b_raw", 2).alias("price_b"),
    )


@query(
    "window_funcs_battery",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS price,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           round(first_value(o_totalprice) OVER w2, 2) AS first_price,
           round(last_value(o_totalprice) OVER w2, 2) AS last_price,
           round(nth_value(o_totalprice, 2) OVER w2, 2) AS second_price,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW
      w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window-function battery (the K+ ranking family's
    value-navigation half): lag/lead, first/last/nth over the full
    frame, cume_dist — per customer in (date, key) order.  All share
    ONE window sort: Catalyst collapses same-spec window nodes, so the
    plan is a single exchange + sort no matter how many functions ride
    it."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w2), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w2), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w2), 2).alias(
            "second_price"
        ),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "array_hof_battery",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 4) AS comp_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           round(CAST(list_max(embedding) AS DOUBLE), 4) AS comp_max,
           round(CAST(list_min(embedding) AS DOUBLE), 4) AS comp_min,
           round(CAST(embedding[1] AS DOUBLE)
                 + CAST(embedding[2] AS DOUBLE), 4) AS head2_sum
    FROM embeddings WHERE vec_id % 10 = 0
    """,
)
def array_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (the §2.9 family Spark adds beyond
    the reference's scalar surface): transform / filter / aggregate
    folds over the embedding vector — all JVM-side codegen'd lambdas,
    the idiomatic replacement for per-row Python when vector math stays
    elementwise.  DuckDB's list_* functions are the oracle mirror."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 10 == 0
    )
    dbl = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(
            F.sqrt(
                F.aggregate(
                    "embedding", F.lit(0.0), lambda a, x: a + dbl(x) * dbl(x)
                )
            ),
            4,
        ).alias("l2"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + dbl(x)), 4
        ).alias("comp_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias(
            "n_pos"
        ),
        F.round(dbl(F.array_max("embedding")), 4).alias("comp_max"),
        F.round(dbl(F.array_min("embedding")), 4).alias("comp_min"),
        F.round(
            dbl(F.element_at("embedding", 1)) + dbl(F.element_at("embedding", 2)),
            4,
        ).alias("head2_sum"),
    )


SALT_FANOUT = 8


@query(
    "salted_skew_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 4) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew JOIN (the join-side sibling of ``salted_skew_agg``):
    the fact side gets a deterministic salt in [0, R), the dimension
    side is replicated R times with every salt value, and the join key
    becomes (custkey, salt) — a hot customer's rows now spread over R
    reducers instead of one.  The oracle is the UNSALTED join + rollup,
    proving the rewrite is semantics-preserving (every fact row still
    meets exactly one replica of its dimension row).

    This is the manual form of AQE's skew-join splitting for when the
    skew is known ahead of time (or the dimension is too big to
    broadcast but small enough to replicate R×); with a broadcastable
    dimension, ``F.broadcast`` is strictly better — the technique
    matters at 100 TB where neither side fits."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    salted_fact = orders.withColumn(
        "_salt", F.pmod(F.xxhash64("o_custkey", "o_totalprice"), F.lit(SALT_FANOUT))
    )
    replicated_dim = cust.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(SALT_FANOUT - 1))),
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = salted_fact.join(
        replicated_dim,
        (F.col("o_custkey") == F.col("c_custkey"))
        & (salted_fact["_salt"] == replicated_dim["_salt"]),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
    )


@query(
    "order_backlog_over_time",
    oracle="""
    WITH life AS (
      SELECT o.o_orderkey,
             date_trunc('month', o.o_orderdate) AS m_open,
             date_trunc('month', max(l.l_shipdate)) AS m_close
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
      SELECT m_open AS m, 1 AS d FROM life
      UNION ALL
      SELECT m_close AS m, -1 AS d FROM life
    ),
    monthly AS (SELECT m, sum(d) AS delta FROM deltas GROUP BY m)
    SELECT epoch_ms(m) AS month_ms,
           CAST(delta AS BIGINT) AS delta,
           CAST(sum(delta) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS open_backlog
    FROM monthly
    """,
)
def order_backlog_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog time series via the event-sourcing collapse:
    each order contributes +1 in its open month and −1 in the month its
    LAST line ships, and the monthly running sum of those deltas IS the
    backlog — the interval-overlap count computed WITHOUT an
    interval×calendar join (which at 100 TB would fan every order out
    to its covering months).  One orderkey-keyed aggregate finds each
    order's lifetime, the ±1 deltas come from an array explode (single
    pass, no self-union), and the running sum runs over the tiny
    monthly frame.  All-integer arithmetic — engine-exact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    life = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.date_trunc("month", "o_orderdate").alias("m_open"),
            F.date_trunc("month", "last_ship").alias("m_close"),
        )
    )
    deltas = life.select(
        F.explode(
            F.array(
                F.struct(F.col("m_open").alias("m"), F.lit(1).alias("d")),
                F.struct(F.col("m_close").alias("m"), F.lit(-1).alias("d")),
            )
        ).alias("e")
    ).select("e.m", "e.d")
    monthly = deltas.groupBy("m").agg(F.sum("d").alias("delta"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        F.unix_millis("m").alias("month_ms"),
        F.col("delta").cast("long").alias("delta"),
        F.sum("delta").over(w).cast("long").alias("open_backlog"),
    )


@query(
    "revenue_concentration_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice), 2) AS revenue
      FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
      SELECT *, ntile(10) OVER (ORDER BY revenue DESC, l_suppkey)
               AS decile
      FROM rev
    ),
    d AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_suppliers,
             sum(revenue) AS decile_rev
      FROM ranked GROUP BY decile
    )
    SELECT decile, n_suppliers,
           round(decile_rev, 2) AS decile_revenue,
           round(sum(decile_rev) OVER (ORDER BY decile
                                       ROWS UNBOUNDED PRECEDING)
                 / sum(decile_rev) OVER (), 4) AS cum_share
    FROM d
    """,
)
def revenue_concentration_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve: suppliers ranked into
    revenue deciles with each decile's cumulative share of total
    revenue — the 80/20 diagnostic behind skew planning (a top-heavy
    curve predicts hot keys).  Per-supplier revenue is rounded to the
    price grain BEFORE ranking so the decile cut is engine-stable
    (float sums of quantized prices can tie exactly, and unrounded
    last-bit jitter would break ties differently per engine); the
    decile frame is 10 rows, so the share windows are trivial."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue")
    )
    ranked = rev.withColumn(
        "decile",
        F.ntile(10).over(
            Window.orderBy(F.desc("revenue"), F.asc("l_suppkey"))
        ),
    )
    d = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("revenue").alias("decile_rev"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    return d.select(
        "decile",
        "n_suppliers",
        F.round("decile_rev", 2).alias("decile_revenue"),
        F.round(
            F.sum("decile_rev").over(wcum) / F.sum("decile_rev").over(wall),
            4,
        ).alias("cum_share"),
    )


@query(
    "monthly_revenue_yoy",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             round(sum(o_totalprice), 2) AS revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT epoch_ms(month) AS month_ms, revenue, n_orders,
           round(revenue / lag(revenue, 12) OVER (ORDER BY month) - 1.0,
                 4) AS yoy_growth
    FROM m
    """,
)
def monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth: the reporting rollup
    every pipeline ends in — keyed month aggregate, then a lag-12
    window over the tiny month frame.  Revenue is rounded to the price
    grain BEFORE the ratio so the growth rate divides identical values
    in both engines (raw float sums differ in the last bits and a ratio
    amplifies them across a rounding boundary)."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    w = Window.orderBy("month")
    return m.select(
        F.unix_millis("month").alias("month_ms"),
        "revenue",
        "n_orders",
        F.round(
            F.col("revenue") / F.lag("revenue", 12).over(w) - 1.0, 4
        ).alias("yoy_growth"),
    )


@query(
    "priority_sla_attainment",
    """
    WITH first_ship AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             epoch_ms(min(l.l_shipdate)) - epoch_ms(o.o_orderdate)
               AS first_ship_ms
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN first_ship_ms <= 2592000000::BIGINT
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_sla,
           round(sum(CASE WHEN first_ship_ms <= 2592000000::BIGINT
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS sla_rate,
           round(avg(first_ship_ms) / 86400000.0, 4) AS avg_first_ship_days
    FROM first_ship GROUP BY o_orderpriority
    """,
)
def priority_sla_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA attainment by order priority: share of orders whose FIRST
    line ships within 30 days, plus the mean first-ship latency — the
    operational scorecard a fulfillment pipeline publishes.  One
    orderkey-keyed aggregate finds each order's first shipment; the
    priority rollup is a ≤5-row frame; rates divide exact counts."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    first_ship = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min(F.unix_millis("l_shipdate")).alias("first_ms"))
        .select(
            "o_orderpriority",
            (
                F.col("first_ms") - F.unix_millis("o_orderdate")
            ).alias("first_ship_ms"),
        )
    )
    within = F.when(
        F.col("first_ship_ms") <= 30 * 86_400_000, 1
    ).otherwise(0)
    return first_ship.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(within).cast("long").alias("n_within_sla"),
        F.round(F.sum(within) * 1.0 / F.count(F.lit(1)), 4).alias(
            "sla_rate"
        ),
        F.round(F.avg("first_ship_ms") / 86_400_000.0, 4).alias(
            "avg_first_ship_days"
        ),
    )


@query(
    "discount_elasticity",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(regr_slope(l_quantity, l_discount), 4) AS qty_per_discount,
           round(corr(l_quantity, l_discount), 4) AS qd_corr,
           round(avg(l_discount), 4) AS avg_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount→quantity response per return class: the least-squares
    slope of quantity on discount (does discounting move volume?) plus
    the correlation — the elasticity screen behind pricing analysis,
    computed entirely with JVM regression aggregates (``regr_slope`` /
    ``corr`` are algebraic: map-side partial moments, one tiny
    exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(
            F.expr("regr_slope(l_quantity, l_discount)"), 4
        ).alias("qty_per_discount"),
        F.round(F.corr("l_quantity", "l_discount"), 4).alias("qd_corr"),
        F.round(F.avg("l_discount"), 4).alias("avg_discount"),
    )


# --------------------------------------------------------------------------
# join-key skew diagnosis: the report that decides when to salt
# --------------------------------------------------------------------------
@query(
    "skew_diagnosis_report",
    """
    WITH c AS MATERIALIZED (
      SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, k) AS r FROM c
    )
    SELECT CAST(sum(n) AS BIGINT) AS n_rows,
           count(*) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           round(CAST(max(n) AS DOUBLE) * count(*) / sum(n), 4)
             AS max_key_skew,
           round((SELECT sum(n) FROM ranked WHERE r <= 10)
                 / CAST(sum(n) AS DOUBLE), 4) AS top10_share,
           CAST(ceil(max(n) * count(*) / CAST(sum(n) AS DOUBLE))
                AS BIGINT) AS suggested_salt
    FROM c
    """,
)
def skew_diagnosis_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row join-key skew report over orders.o_custkey — the
    diagnostic a 100 TB operator runs BEFORE choosing between a plain
    shuffle join and the salted forms (:func:`salted_skew_agg` /
    :func:`salted_skew_join` in this module):

    - ``max_key_skew`` = hottest key's rows ÷ mean rows/key.  1.0 means
      perfectly uniform; a shuffle partition is only as fast as its
      hottest key, so this ratio IS the straggler multiplier.
    - ``top10_share`` — how much of the table the 10 hottest keys own.
    - ``suggested_salt`` = ⌈max_key_skew⌉ — salting the hot key across
      that many sub-keys levels its partition back to the mean.

    Scale shape: one map-side-combined count per key (the same
    aggregate any of the joins would shuffle anyway), then a
    key-cardinality-sized rollup; the top-10 sum is a window rank over
    the (tiny) per-key count table, deterministically tie-broken."""
    c = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    r = Window.orderBy(F.desc("n"), F.asc("k"))
    top10 = (
        c.withColumn("_r", F.row_number().over(r))
        .filter(F.col("_r") <= 10)
        .agg(F.sum("n").alias("t10"))
    )
    return (
        c.agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").cast("long").alias("max_key_rows"),
        )
        .crossJoin(F.broadcast(top10))
        .select(
            "n_rows",
            "n_keys",
            "max_key_rows",
            F.round(
                F.col("max_key_rows") * F.col("n_keys")
                / F.col("n_rows").cast("double"),
                4,
            ).alias("max_key_skew"),
            F.round(
                F.col("t10") / F.col("n_rows").cast("double"), 4
            ).alias("top10_share"),
            F.ceil(
                F.col("max_key_rows") * F.col("n_keys")
                / F.col("n_rows").cast("double")
            ).cast("long").alias("suggested_salt"),
        )
    )
