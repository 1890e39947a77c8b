"""SQL-text API surface plus numeric/string/array function batteries.

The reference exposes no SQL front end (SURVEY.md §0: no parser, no
``flink-table`` dependency), but Spark's own SQL entry point is part of
this engine's API — queries here go through ``spark.sql`` over temp
views to prove the text path resolves against the same tables and
produces hash-identical results to the DataFrame path.  The function
batteries pin down the scalar-function surface of SURVEY.md §2.9
(arithmetic / comparison / string concat+split / abs — plus the date,
string, and array families Spark inherits wholesale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query


@query(
    "sql_text_nation_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def sql_text_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text entry point: the engine's ``spark.sql`` facade.  The
    reference has no SQL layer (``build.gradle:54-55`` pulls only
    flink-streaming-java); Spark gives one for free, and this query
    proves the text path (view registration -> parse -> Catalyst) yields
    the same plan/results as the DataFrame API.  Catalyst still pushes
    the status filter into the orders scan and broadcasts nation."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sqlv_{t}")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               count(DISTINCT o.o_orderkey) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM sqlv_orders o
        JOIN sqlv_customer c ON o.o_custkey = c.c_custkey
        JOIN sqlv_nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
        """
    )


@query(
    "value_histogram",
    oracle="""
    SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram over ``events.value`` — the
    classic distribution profile a training pipeline runs before
    thresholding.  One hash-agg, fully map-side combinable; bucket
    count is bounded (~value range / 10) so the shuffle is tiny at any
    scale factor."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.floor(F.col("value") / 10.0).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@query(
    "string_funcs_battery",
    oracle="""
    SELECT upper(substring(c_mktsegment, 1, 4)) AS seg4,
           length(c_name) AS name_len,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT)) AS BIGINT)
               AS min_custnum,
           min(concat(lower(c_mktsegment), '_', lpad(CAST(c_nationkey AS VARCHAR), 3, '0')))
               AS min_tag,
           CAST(sum(CASE WHEN c_name LIKE '%9' THEN 1 ELSE 0 END) AS BIGINT) AS n_like9
    FROM customer
    GROUP BY 1, 2
    """,
)
def string_funcs_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY.md §2.9 string family (concat from ``SensorReading
    .java:43``, split from ``BasicTransformations.java:72``, plus the
    upper/lower/substring/length/lpad/regexp/LIKE set Spark inherits):
    every function evaluated JVM-side inside one whole-stage-codegen
    span — no UDFs — then grouped so the oracle pins all derived
    values."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            F.upper(F.substring("c_mktsegment", 1, 4)).alias("seg4"),
            F.length("c_name").alias("name_len"),
            F.regexp_extract("c_name", "([0-9]+)", 1)
            .cast("bigint")
            .alias("custnum"),
            F.concat(
                F.lower("c_mktsegment"),
                F.lit("_"),
                F.lpad(F.col("c_nationkey").cast("string"), 3, "0"),
            ).alias("tag"),
            F.col("c_name").like("%9").cast("int").alias("is_like9"),
        )
        .groupBy("seg4", "name_len")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("custnum").alias("min_custnum"),
            F.min("tag").alias("min_tag"),
            F.sum("is_like9").cast("bigint").alias("n_like9"),
        )
    )


@query(
    "embedding_component_stats",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_c0,
           round(avg(CAST(embedding[2] AS DOUBLE)), 4) AS avg_c1,
           round(min(CAST(embedding[3] AS DOUBLE)), 4) AS min_c2,
           round(max(CAST(embedding[4] AS DOUBLE)), 4) AS max_c3,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm
    FROM embeddings
    GROUP BY 1
    """,
)
def embedding_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column profiling for the embedding table: per-label
    component statistics + mean L2 norm (sanity check that vectors are
    unit-normalized before cosine work).  ``element_at`` is 1-based like
    DuckDB's ``[i]``; the norm is a JVM-side ``aggregate`` fold over the
    array — no Python in the loop, one hash-agg by the tiny label key."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        emb.select(
            "label",
            F.element_at("embedding", 1).cast("double").alias("c0"),
            F.element_at("embedding", 2).cast("double").alias("c1"),
            F.element_at("embedding", 3).cast("double").alias("c2"),
            F.element_at("embedding", 4).cast("double").alias("c3"),
            norm.alias("norm"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("c0"), 4).alias("avg_c0"),
            F.round(F.avg("c1"), 4).alias("avg_c1"),
            F.round(F.min("c2"), 4).alias("min_c2"),
            F.round(F.max("c3"), 4).alias("max_c3"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
        )
    )


@query(
    "embedding_covariance_block",
    oracle="""
    SELECT i, j,
           round(covar_samp(CAST(embedding[i] AS DOUBLE),
                            CAST(embedding[j] AS DOUBLE)), 4) + 0.0 AS cov,
           round(corr(CAST(embedding[i] AS DOUBLE),
                      CAST(embedding[j] AS DOUBLE)), 4) + 0.0 AS pearson
    FROM embeddings,
         unnest(range(1, 9)) AS a(i),
         unnest(range(1, 9)) AS b(j)
    WHERE i <= j
    GROUP BY i, j
    """,
)
def embedding_covariance_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangular covariance/correlation block of the first 8
    embedding dimensions — the feature-drift and redundancy screen
    (near-1 off-diagonal correlation means dimensions carry duplicate
    signal; the full 64×64 Gram is the same plan 64/8 wider).

    Scale shape: the 36 (i, j) cells are 36 PAIRED AGGREGATES in ONE
    pass over the table (whole-stage-codegen'd ``covar_samp``/``corr``
    — Spark's built-in co-moment accumulators are mergeable partials,
    so the map side combines and only 36×4 numbers shuffle), then an
    unpivot via ``stack`` to rows.  Contrast with the oracle's lateral
    fan-out (corpus × 36 rows): at 100 TB the one-pass form moves
    constant data where the fan-out moves 36× the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = [(i, j) for i in range(1, 9) for j in range(i, 9)]
    cols = []
    # + 0.0 both sides: a near-zero covariance cell can round to -0.0
    # in DuckDB (tiny-negative accumulation) while Spark's HALF_UP
    # round lands on +0.0 — found by the round-12 sf0.1 re-check of
    # this query (latent: the signbit sweep covers sf0.001/sf0.01)
    for i, j in pairs:
        a = F.element_at("embedding", i).cast("double")
        b = F.element_at("embedding", j).cast("double")
        cols.append(
            (F.round(F.covar_samp(a, b), 4) + 0.0).alias(f"cov_{i}_{j}")
        )
        cols.append((F.round(F.corr(a, b), 4) + 0.0).alias(f"cor_{i}_{j}"))
    # the row-count rides along so the empty corpus yields 0 rows like
    # the oracle's GROUP BY over its empty fan-out (a groupless agg
    # alone would stack 36 NULL cells) — round-12 degenerate sweep
    wide = emb.agg(F.count(F.lit(1)).alias("_n"), *cols)
    stack_args = ", ".join(
        f"{i}L, {j}L, cov_{i}_{j}, cor_{i}_{j}" for i, j in pairs
    )
    return wide.filter(F.col("_n") > 0).selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (i, j, cov, pearson)"
    )


@query(
    "monthly_percentile_trend",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month, o_totalprice AS v
      FROM orders
    ),
    q AS (
      SELECT month,
             CAST(count(*) AS BIGINT) AS n_orders,
             round(quantile_cont(v, 0.5), 4) AS p50,
             round(quantile_cont(v, 0.9), 4) AS p90
      FROM m GROUP BY month
    )
    SELECT CAST(strftime(month, '%Y-%m') AS VARCHAR) AS month,
           n_orders, p50, p90,
           round(p50 - lag(p50) OVER (ORDER BY month), 4) AS p50_mom_delta
    FROM q
    """,
)
def monthly_percentile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact monthly p50/p90 of order value with month-over-month
    median drift — the distribution-shift trend a revenue/latency
    dashboard tracks (means hide tail movement; the p50→p90 spread
    widening IS the signal).  Exact interpolated percentiles on both
    engines (Spark ``percentile`` ≡ DuckDB ``quantile_cont``); at
    100 TB the exact form swaps for ``approx_percentile`` per the
    sketch battery's documented error bounds — same plan shape, one
    grouped aggregate plus a frame-free lag window over month rows."""
    orders = load_table(spark, sf_dir, "orders")
    q = (
        orders.select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
            F.col("o_totalprice").alias("v"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(v, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(v, 0.9)"), 4).alias("p90"),
        )
    )
    from pyspark.sql.window import Window as W

    return q.select(
        "month",
        "n_orders",
        "p50",
        "p90",
        F.round(
            F.col("p50") - F.lag("p50").over(W.orderBy("month")), 4
        ).alias("p50_mom_delta"),
    )


@query(
    "events_dow_hour_heatmap",
    oracle="""
    -- +1: DuckDB dayofweek is 0=Sunday..6, Spark's is 1=Sunday..7
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hour,
           count(*) AS n_events,
           round(count(*) * 1.0 / (SELECT count(*) FROM events), 6)
             AS share,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY dayofweek(ts) + 1, hour(ts)
    """,
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap with share-of-total — the
    capacity-planning profile (when to schedule compaction, what the
    peak-to-trough ratio is).  One map-side-combined aggregate over a
    168-cell key space; the share denominator is a broadcast one-row
    frame, not a second scan — Spark computes both aggregates from the
    same shuffle."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    total = cells.agg(F.sum("n_events").alias("tot"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow",
        "hour",
        "n_events",
        F.round(F.col("n_events") / F.col("tot"), 6).alias("share"),
        "sum_value",
    )


# --------------------------------------------------------------------------
# NULL-semantics battery: the cross-engine parity corners
# --------------------------------------------------------------------------
@query(
    "null_semantics_battery",
    """
    WITH v AS MATERIALIZED (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE round(o_totalprice, 0) END AS v,
             o_orderpriority AS grp
      FROM orders
    ),
    dv AS MATERIALIZED (SELECT DISTINCT v FROM v),
    nsj AS (
      SELECT count(*) AS n FROM dv a JOIN dv b
      ON a.v IS NOT DISTINCT FROM b.v
    ),
    grp_nulls AS (
      SELECT count(*) AS n_groups,
             CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_groups
      FROM (SELECT v, count(*) FROM v GROUP BY v)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(v) AS BIGINT) AS n_nonnull,
           CAST(count(*) - count(v) AS BIGINT) AS n_null,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_exnull,
           round(sum(v), 4) AS sum_ignoring_nulls,
           round(avg(v), 4) AS avg_ignoring_nulls,
           (SELECT CAST(n AS BIGINT) FROM nsj) AS nullsafe_selfjoin_rows,
           (SELECT CAST(n_groups AS BIGINT) FROM grp_nulls)
             AS n_groupby_groups,
           (SELECT null_groups FROM grp_nulls) AS n_null_groups
    FROM v
    """,
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling parity battery — the semantics every engine
    migration gets subtly wrong: count(*) vs count(col), DISTINCT
    excluding NULL, null-ignoring sum/avg, NULL forming its OWN
    group-by group, and the null-safe equality join (`<=>` /
    IS NOT DISTINCT FROM) where NULL matches NULL.  One synthetic
    nullable column (every 7th order key) keeps it deterministic.

    Scale shape: one pass builds the value frame; the null-safe
    self-join runs on the DISTINCT-value frame (tiny), never the fact
    table; everything else is one map-side-combined aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.round("o_totalprice", 0))
        .alias("v")
    ).persist()
    dv = v.distinct()
    nsj = dv.alias("a").join(
        dv.alias("b"), F.col("a.v").eqNullSafe(F.col("b.v"))
    )
    n_nsj = nsj.count()
    grp = v.groupBy("v").count()
    n_groups, null_groups = grp.agg(
        F.count(F.lit(1)),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
    ).first()
    return v.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_nonnull"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
        F.count_distinct("v").alias("n_distinct_exnull"),
        F.round(F.sum("v"), 4).alias("sum_ignoring_nulls"),
        F.round(F.avg("v"), 4).alias("avg_ignoring_nulls"),
        F.lit(n_nsj).cast("long").alias("nullsafe_selfjoin_rows"),
        F.lit(n_groups).cast("long").alias("n_groupby_groups"),
        F.lit(null_groups).cast("long").alias("n_null_groups"),
    )


# --------------------------------------------------------------------------
# correlated LATERAL subquery: per-key top-N as the SQL surface writes it
# --------------------------------------------------------------------------
@query(
    "lateral_topn_per_key",
    """
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 4) AS price
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
    """,
)
def lateral_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-2 orders via a correlated LATERAL subquery —
    the way analysts WRITE per-key top-N in modern SQL (DuckDB,
    Postgres, Spark 3.4+ all accept the same text).  Semantically this
    is ``top_spenders_per_segment``'s ranked window; the point of the
    battery entry is the SURFACE: Catalyst decorrelates the LATERAL
    into a ranked-window DomainJoin, so the executed plan is the same
    one shuffle-per-key rank — no nested-loop per-row subquery
    survives at scale (deterministic cut: price DESC, orderkey).

    Scale shape: dimension filter prunes customers at the scan;
    decorrelation turns the correlated LIMIT into a window over the
    orders side partitioned by custkey — one keyed exchange."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               round(t.o_totalprice, 4) AS price
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
        """
    )


# --------------------------------------------------------------------------
# hierarchical share-of-parent rollup: region -> nation -> segment
# --------------------------------------------------------------------------
@query(
    "hierarchical_share_rollup",
    """
    WITH base AS MATERIALIZED (
      SELECT r.r_name AS region, n.n_name AS nation,
             c.c_mktsegment AS segment,
             sum(o.o_totalprice) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2, 3
    )
    SELECT region, nation, segment,
           round(rev, 4) AS revenue,
           round(rev / sum(rev) OVER (PARTITION BY region, nation) - 1e-9,
                 4) AS share_of_nation,
           round(sum(rev) OVER (PARTITION BY region, nation)
                 / sum(rev) OVER (PARTITION BY region) - 1e-9, 4)
             AS nation_share_of_region,
           round(sum(rev) OVER (PARTITION BY region)
                 / sum(rev) OVER () - 1e-9, 4) AS region_share_of_total
    FROM base
    """,
)
def hierarchical_share_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent at every level of the region → nation → segment
    hierarchy in ONE pass — each leaf row carries its share of the
    nation, the nation's share of the region, and the region's share
    of the total: the drill-down decomposition BI tools render as a
    treemap/sunburst.

    Scale shape: the fact shuffles once into the leaf aggregate
    (dimension attaches are broadcasts); all three parent totals are
    WINDOW sums over the leaf frame (leaf-cardinality-sized, ~10²
    rows) — no second fact pass, no self-join per level, no
    grouping-sets re-aggregation.  Shares ride round(x − 1e-9, 4)
    since window-sum trees differ across engines."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    base = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w_nat = Window.partitionBy("region", "nation")
    w_reg = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return base.select(
        "region",
        "nation",
        "segment",
        F.round("rev", 4).alias("revenue"),
        F.round(
            F.col("rev") / F.sum("rev").over(w_nat) - 1e-9, 4
        ).alias("share_of_nation"),
        F.round(
            F.sum("rev").over(w_nat) / F.sum("rev").over(w_reg) - 1e-9,
            4,
        ).alias("nation_share_of_region"),
        F.round(
            F.sum("rev").over(w_reg) / F.sum("rev").over(w_all) - 1e-9,
            4,
        ).alias("region_share_of_total"),
    )


@query(
    "bitmap_distinct_users",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, user_id FROM events
    )
    SELECT event_type,
           CAST(count(DISTINCT d) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS nd_merged,
           CAST(count(DISTINCT user_id) AS BIGINT) AS nd_direct
    FROM daily GROUP BY event_type
    """,
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark's bitmap aggregate family
    (``bitmap_bit_position`` / ``bitmap_construct_agg`` /
    ``bitmap_or_agg`` / ``bitmap_count``) — the mergeable-but-exact
    alternative to HLL (`functions/sketch.py`) when the key domain is
    dense integers: per-day bitmaps OR-merge into the per-type total
    exactly, the same partial-merge shape a 1000-executor rollup or an
    incremental daily pipeline needs, with none of HLL's error.

    The query computes the distinct-user count BOTH ways — direct
    bitmap over the whole slice (``nd_direct``) and OR-merge of daily
    bitmaps (``nd_merged``) — and the oracle pins both to
    ``count(DISTINCT ...)``: the equality of the three IS the
    mergeability proof, hash-checked.  Keys group by
    ``bitmap_bucket_number`` first (each bitmap covers one 32768-bit
    bucket), so the pattern stays correct for arbitrarily large id
    domains — counts sum across buckets."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "user_id"
    )
    # per (type, day, bucket) bitmap partials — the "daily pipeline"
    daily = ev.groupBy(
        "event_type",
        "d",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    merged = (
        daily.groupBy("event_type", "bkt")
        .agg(
            F.expr("bitmap_or_agg(bm)").alias("bm"),
            F.countDistinct("d").alias("nd_days"),
        )
        .groupBy("event_type")
        .agg(
            F.max("nd_days").cast("long").alias("n_days"),
            F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("nd_merged"),
        )
    )
    direct = (
        ev.groupBy(
            "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
        )
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
                "bm"
            )
        )
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("nd_direct"))
    )
    return merged.join(direct, "event_type")


@query(
    "variant_props_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(k) AS BIGINT) AS k_min,
           CAST(max(k) AS BIGINT) AS k_max,
           round(avg(k * 1.0), 4) AS k_avg,
           CAST(count(DISTINCT k) AS BIGINT) AS k_distinct
    FROM (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    WHERE k IS NOT NULL
    GROUP BY event_type
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` extraction — the open-schema path that replaces
    per-access string re-parsing (``get_json_object``, exercised by
    ``json_props_extract``) with a parse-once binary column, the way a
    100 TB event lake should store ragged JSON.

    Same one-scan shape as any scalar pipeline: parse + extract are
    JVM expressions inside whole-stage codegen, aggregated per event
    type; the oracle extracts the same field with DuckDB's JSON
    functions, so values (exact ints, one 4dp-rounded mean) hash-match
    bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'long')")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
            F.round(F.avg(F.col("k") * 1.0), 4).alias("k_avg"),
            F.countDistinct("k").cast("long").alias("k_distinct"),
        )
    )


@query(
    "sql_pipe_syntax_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           round(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 / 100.0, 2) AS revenue_usd
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL *pipe syntax* (Spark 4 / GoogleSQL `FROM … |> …`): the
    pricing-summary rollup written as a linear pipeline of `|>`
    operators instead of nested SELECTs — the readability surface for
    analysts, compiled by Catalyst to EXACTLY the plan the ANSI form
    gets (the shipdate predicate still reaches the parquet scan as a
    pushed filter; money sums ride exact BIGINT cents)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "piped_lineitem"
    )
    return spark.sql(
        """
        FROM piped_lineitem
        |> WHERE l_shipdate <= DATE '1998-09-01'
        |> AGGREGATE
             count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                   AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue_usd
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_lines, sum_qty, revenue_usd
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "sql_scripting_var_rollup",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    thr AS (
      SELECT CAST(floor(quantile_cont(cents, 0.9)) AS BIGINT) AS t FROM c
    )
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_big,
           round(min(cents) / 100.0, 2) AS min_usd,
           round(max(cents) / 100.0, 2) AS max_usd
    FROM c WHERE cents > (SELECT t FROM thr)
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def sql_scripting_var_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL *scripting* (Spark 4 `BEGIN … END` compound statements with
    script-local variables): a two-statement procedure — compute the
    90th-percentile order value into a DECLAREd variable, then roll up
    the orders above it — the migration target for stored-procedure
    workloads.  The variable is script-scoped (no session leakage
    between registry queries); the second statement is an ordinary
    Catalyst plan whose `cents > thr` predicate is a folded literal by
    the time it reaches the scan.  Threshold and money are exact BIGINT
    cents on both engines (floor of the interpolated percentile), so
    the boundary comparison cannot fork."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "scripted_orders"
    )
    return spark.sql(
        """
        BEGIN
          DECLARE thr BIGINT DEFAULT 0;
          SET thr = (
            SELECT CAST(floor(percentile(
                     CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.9))
                   AS BIGINT)
            FROM scripted_orders);
          SELECT o_orderpriority AS priority,
                 CAST(count(*) AS BIGINT) AS n_big,
                 round(CAST(min(CAST(floor(o_totalprice * 100 + 0.5)
                       AS BIGINT)) AS DOUBLE) / 100.0, 2) AS min_usd,
                 round(CAST(max(CAST(floor(o_totalprice * 100 + 0.5)
                       AS BIGINT)) AS DOUBLE) / 100.0, 2) AS max_usd
          FROM scripted_orders
          WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > thr
          GROUP BY o_orderpriority
          ORDER BY priority;
        END
        """
    )


@query(
    "sql_execute_immediate_topn",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS balance
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
    ORDER BY round(c_acctbal, 2) DESC, c_custkey
    LIMIT 10
    """,
)
def sql_execute_immediate_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized dynamic SQL (`EXECUTE IMMEDIATE … USING`): the
    injection-safe template API — the segment and N arrive as BOUND
    PARAMETERS, never string-spliced, the pattern every multi-tenant
    report runner needs.  The bound predicate behaves exactly like a
    literal to Catalyst (segment filter pushed to the scan).
    Deterministic top-N: cents-rounded balance with key tiebreak."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "dyn_customer"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT c_custkey, c_name, round(c_acctbal, 2) AS balance
           FROM dyn_customer
           WHERE c_mktsegment = ?
           ORDER BY round(c_acctbal, 2) DESC, c_custkey
           LIMIT ?'
        USING 'BUILDING', 10
        """
    )


@query(
    "listagg_nation_suppliers",
    oracle="""
    SELECT n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY nation
    """,
)
def listagg_nation_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (`LISTAGG … WITHIN GROUP`, new in
    Spark 4 — the ISO form of the string_agg/group_concat every report
    writer reaches for): per-nation CSV of supplier names.  The WITHIN
    GROUP ordering makes the concatenation deterministic (unordered
    collect_list + array_join is the classic nondeterminism trap this
    function closes).  Scale: one dimension join + one groupBy; output
    size is the real limit (documented — listagg is a reporting
    aggregate, not a data-movement one)."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "la_supplier"
    )
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("la_nation")
    return spark.sql(
        """
        SELECT n_name AS nation,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)
                 AS supplier_csv
        FROM la_supplier JOIN la_nation ON n_nationkey = s_nationkey
        GROUP BY n_name
        ORDER BY nation
        """
    )


@query(
    "approx_topk_event_types",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type
    ORDER BY cnt DESC, event_type
    """,
)
def approx_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`approx_top_k` frequent-items sketch (Spark 4 datasketches
    surface): heavy hitters of the event-type column from ONE
    fixed-size mergeable sketch instead of a full groupBy — the
    shuffle-free path for "top values of a high-cardinality column"
    dashboards.  Driver parity holds because k (64) exceeds the
    column's distinct count, where the sketch is EXACT by
    construction; at real cardinalities the estimates carry the
    documented datasketches error bound and the exact twin
    (`token_heavy_hitters`'s two-pass recount) is the verify path.
    The result array is re-sorted (cnt desc, type) after explode so
    the output ordering never depends on sketch internals."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(F.expr("approx_top_k(event_type, 64)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").cast("long").alias("cnt"),
        )
        .orderBy(F.col("cnt").desc(), "event_type")
    )


@query(
    "sql_udf_tiered_revenue",
    """
    WITH tiers(tier, lo, hi) AS (
      VALUES ('SMALL', 1, 10), ('MEDIUM', 11, 30), ('LARGE', 31, 100)
    )
    SELECT l.l_returnflag AS returnflag, t.tier,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1.0 - l.l_discount)
                     * (1.0 + l.l_tax)) - 1e-9, 2) AS net_revenue
    FROM lineitem l
    JOIN tiers t ON l.l_quantity >= t.lo AND l.l_quantity <= t.hi
    GROUP BY l.l_returnflag, t.tier
    ORDER BY returnflag, tier
    """,
)
def sql_udf_tiered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-language UDFs (`CREATE FUNCTION ... RETURN expr` /
    `RETURNS TABLE`): a scalar SQL UDF computes the net price and a SQL
    TABLE FUNCTION defines the quantity-tier dimension — both are
    catalog objects written in pure SQL, and because the body is SQL
    (not Python), Catalyst INLINES them into the plan: the scalar UDF
    whole-stage-codegens and the table function folds to a 3-row local
    relation broadcast against the scan.  This is the governed-semantic
    layer pattern (shared business definitions) at zero UDF overhead —
    the oracle is the same query with both bodies inlined by hand,
    proving the inlining is semantics-preserving."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "sqludf_lineitem"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sqludf_net_price("
        "p DOUBLE, d DOUBLE, t DOUBLE) RETURNS DOUBLE "
        "RETURN p * (1.0 - d) * (1.0 + t)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sqludf_qty_tiers() "
        "RETURNS TABLE (tier STRING, lo INT, hi INT) RETURN "
        "SELECT * FROM VALUES ('SMALL', 1, 10), ('MEDIUM', 11, 30), "
        "('LARGE', 31, 100) AS t(tier, lo, hi)"
    )
    return spark.sql(
        """
        SELECT l.l_returnflag AS returnflag, t.tier,
               CAST(count(*) AS BIGINT) AS n_lines,
               round(sum(sqludf_net_price(l.l_extendedprice, l.l_discount,
                                          l.l_tax)) - 1e-9, 2)
                 AS net_revenue
        FROM sqludf_lineitem l
        JOIN sqludf_qty_tiers() t
          ON l.l_quantity >= t.lo AND l.l_quantity <= t.hi
        GROUP BY l.l_returnflag, t.tier
        ORDER BY returnflag, tier
        """
    )


@query(
    "collated_segment_rollup",
    """
    WITH mixed AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                  ELSE c_mktsegment END AS seg_mixed,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    dim(dim_seg, tier) AS (
      VALUES ('Machinery', 'industrial'), ('Building', 'industrial'),
             ('Automobile', 'consumer'), ('Household', 'consumer'),
             ('Furniture', 'consumer')
    )
    SELECT lower(min(m.seg_mixed)) AS segment,
           d.tier,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT m.seg_mixed) AS BIGINT) AS n_case_variants,
           CAST(sum(m.cents) AS BIGINT) AS acctbal_cents
    FROM mixed m JOIN dim d ON lower(m.seg_mixed) = lower(d.dim_seg)
    GROUP BY lower(m.seg_mixed), d.tier
    ORDER BY segment
    """,
)
def collated_segment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation support: group and JOIN on a mixed-case key
    under ``COLLATE UTF8_LCASE`` — governed case-insensitive semantics
    declared on the expression, with NO lower()/upper() rewrites in the
    query logic (the dim join matches 'Household' to both 'household'
    and 'HOUSEHOLD' natively).  The oracle replays the same query via
    explicit lower() normalization, PROVING the collation's equivalence
    contract on ASCII keys; ``n_case_variants`` counts the raw
    (binary-collation) spellings inside each collated group, showing
    both collations coexisting in one aggregate.

    Scale shape: collation comparison is JVM-side (no UDF); the
    grouping shuffles on the collated key exactly like any groupBy,
    and the 5-row dim broadcasts."""
    mixed = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment")
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_mixed"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )
    dim = spark.createDataFrame(
        [
            ("Machinery", "industrial"),
            ("Building", "industrial"),
            ("Automobile", "consumer"),
            ("Household", "consumer"),
            ("Furniture", "consumer"),
        ],
        "dim_seg string, tier string",
    )
    joined = mixed.join(
        F.broadcast(dim),
        F.expr("seg_mixed COLLATE UTF8_LCASE = dim_seg COLLATE UTF8_LCASE"),
    )
    return (
        joined.groupBy(
            F.expr("seg_mixed COLLATE UTF8_LCASE").alias("_ckey"), F.col("tier")
        )
        .agg(
            F.lower(F.min("seg_mixed")).alias("segment"),
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.count_distinct(F.expr("seg_mixed COLLATE UTF8_BINARY"))
            .cast("long")
            .alias("n_case_variants"),
            F.sum("cents").cast("long").alias("acctbal_cents"),
        )
        .select(
            "segment", "tier", "n_customers", "n_case_variants",
            "acctbal_cents",
        )
        .orderBy("segment")
    )


_LATERAL_SQL = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_top_lines,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(t.cents) AS BIGINT) AS top2_cents,
       round(CAST(sum(t.cents) AS DOUBLE)
             / count(DISTINCT o.o_orderkey) / 100.0 - 1e-9, 2)
         AS top2_usd_per_order
FROM {orders} o,
LATERAL (
  SELECT CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM {lineitem} l
  WHERE l.l_orderkey = o.o_orderkey
  ORDER BY l.l_extendedprice DESC, l.l_linenumber
  LIMIT 2
) t
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query(
    "lateral_top_lines_per_order",
    _LATERAL_SQL.format(orders="orders", lineitem="lineitem"),
)
def lateral_top_lines_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table,
    supported natively by Spark 4's analyzer): for EACH order, an
    inner ordered-and-limited subquery returns its top-2 line items by
    price — the "top-N per outer row" idiom SQL users reach for before
    learning window functions, now expressible verbatim.  Catalyst
    decorrelates it into the same ranked-window plan the hand-written
    form produces (DomainJoin rewrite), so the declarative form costs
    nothing — both engines run the IDENTICAL text.

    Scale shape: after decorrelation this is one co-partitioned
    join + per-key rank, not a per-row subquery execution — the plan
    to check is the absence of a nested-loop node."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "lateral_orders"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lateral_lineitem"
    )
    return spark.sql(
        _LATERAL_SQL.format(
            orders="lateral_orders", lineitem="lateral_lineitem"
        )
    )
