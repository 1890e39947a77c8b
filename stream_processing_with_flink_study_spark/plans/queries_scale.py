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
    family): four aggregation grains in ONE pass — Spark expands the
    sets via a single Expand node feeding one hash aggregate, so the
    input is scanned once no matter how many grains are requested."""
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
                                (o_orderpriority), (o_orderstatus), ())
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
