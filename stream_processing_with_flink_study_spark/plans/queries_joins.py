"""Multi-stream operators (SURVEY.md §2.6 M1-M7) as oracle-checked
queries.  The two event streams are carved out of ``events`` by type
(purchases = primary stream, errors = control/secondary stream), mirroring
the reference's sensor/smoke pair."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import joins
from ..sources import load_table
from .registry import query

HOUR_MS = 3_600_000


def _purchases(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
    )


def _errors(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("e_event_id"),
            "user_id",
            F.col("ts").alias("e_ts"),
            F.col("value").alias("e_value"),
        )
    )


@query(
    "union_streams",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM (
      SELECT event_type, value FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT event_type, value FROM events WHERE event_type = 'view' AND value > 100
    )
    GROUP BY event_type
    """,
)
def union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 union (정리/3주차.md:72-74): FIFO merge of two same-typed
    streams, no dedup (UNION ALL semantics), then a downstream agg."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select("event_type", "value")
    b = events.filter(
        (F.col("event_type") == "view") & (F.col("value") > 100)
    ).select("event_type", "value")
    return joins.union_all(a, b).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@query(
    "window_join_pairs",
    oracle=f"""
    SELECT
      p.user_id,
      (epoch_ms(p.ts) // {HOUR_MS}) * {HOUR_MS} AS window_start_ms,
      p.event_id AS p_event_id,
      e.event_id AS e_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND (epoch_ms(p.ts) // {HOUR_MS}) = (epoch_ms(e.ts) // {HOUR_MS})
    """,
)
def window_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 window join (정리/4주차.md:325-333): purchases x errors of the
    same user inside the same 1h tumbling window.  The window struct is
    part of the equi-join key → plain hash/sort-merge join, never a
    cross product."""
    p = _purchases(spark, sf_dir)
    e = _errors(spark, sf_dir)
    out = joins.window_join(p, e, ["user_id"], "p_ts", "e_ts", "1 hour")
    return out.select(
        "user_id",
        F.unix_millis("window.start").alias("window_start_ms"),
        "p_event_id",
        "e_event_id",
    )


@query(
    "interval_join_events",
    oracle="""
    SELECT
      p.event_id AS p_event_id,
      e.event_id AS e_event_id,
      p.user_id,
      (epoch_us(e.ts) - epoch_us(p.ts)) // 1000 AS diff_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND epoch_us(e.ts) >= epoch_us(p.ts) - 3600000000
     AND epoch_us(e.ts) <= epoch_us(p.ts) + 900000000
    """,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 interval join (정리/4주차.md:313-323): errors within
    [purchase.ts - 1h, purchase.ts + 15min] for the same user — the
    reference's ``.between(Time.hour(-1), Time.minute(15))``.  Keyed
    equi-join with a band residual; in streaming the same predicate plus
    watermarks bounds the join state."""
    p = _purchases(spark, sf_dir)
    e = _errors(spark, sf_dir)
    out = joins.interval_join(
        p, e, ["user_id"], "p_ts", "e_ts", "-1 hour", "15 minutes"
    )
    return out.select(
        "p_event_id",
        "e_event_id",
        p["user_id"].alias("user_id"),
        ((F.unix_micros("e_ts") - F.unix_micros("p_ts")) / 1000)
        .cast("long")
        .alias("diff_ms"),
    )


@query(
    "asof_join_keyed",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, value,
        row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'error'
    ), c AS (
      SELECT user_id, ts, value AS last_error_value FROM ranked WHERE rn = 1
    )
    SELECT r.event_id, r.user_id, epoch_ms(r.ts) AS ts_ms, r.value,
           c.last_error_value
    FROM events r
    ASOF LEFT JOIN c ON r.user_id = c.user_id AND r.ts >= c.ts
    """,
)
def asof_join_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 deterministic keyed as-of (the event-time semantic defined for
    the reference's arrival-order-dependent CoFlatMap,
    MultiStreamTransformations.java:83-100): every event carries its
    user's most recent error value at or before its timestamp.

    Union-tag + carry-forward: ONE shuffle-sort by (user, ts), zero join
    fan-out — at 100 TB this beats a range join outright.  Control rows
    are deduped per (user, ts) by max event_id so both engines break ties
    identically."""
    events = load_table(spark, sf_dir, "events")
    readings = events.select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    control = (
        events.filter(F.col("event_type") == "error")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", F.col("value").alias("last_error_value"))
    )
    out = joins.asof_join_union(
        readings, control, "ts", ["last_error_value"], ["user_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "value",
        "last_error_value",
    )


@query(
    "smoke_alert",
    oracle="""
    WITH ranked AS (
      SELECT ts, value,
        row_number() OVER (PARTITION BY ts ORDER BY event_id DESC) AS rn
      FROM events WHERE event_type = 'error'
    ), smoke AS (
      SELECT ts, CASE WHEN value > 150 THEN 'HIGH' ELSE 'LOW' END AS level
      FROM ranked WHERE rn = 1
    ), j AS MATERIALIZED (
      -- MATERIALIZED guards against DuckDB pushing the level filter
      -- below the ASOF join, which would change the as-of pick
      SELECT r.user_id, r.ts, r.value, s.level
      FROM events r
      ASOF LEFT JOIN smoke s ON r.ts >= s.ts
    )
    SELECT 'Risk of fire! user_' || CAST(user_id AS VARCHAR) AS message,
           epoch_ms(ts) AS ts_ms,
           value AS temperature
    FROM j
    WHERE level = 'HIGH' AND value > 180
    """,
)
def smoke_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+M3 the reference's flagship two-stream program
    (MultiStreamTransformations.java:50-74): a broadcast control stream
    gates alerts on the keyed stream.  Control = error events mapped to
    smoke levels (HIGH iff value > 150); alert when the current level is
    HIGH and the reading exceeds 180 (the reference's smoke==HIGH &&
    temp>100 at :88-93).

    Scale path: the tiny control stream becomes validity intervals and is
    BROADCAST (M3) — the 100 TB reading side never shuffles."""
    events = load_table(spark, sf_dir, "events")
    readings = events.select(
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("id"),
        "ts",
        F.col("value").alias("temperature"),
    )
    w = Window.partitionBy("ts").orderBy(F.col("event_id").desc())
    smoke = (
        events.filter(F.col("event_type") == "error")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "ts",
            F.when(F.col("value") > 150, "HIGH").otherwise("LOW").alias("level"),
        )
    )
    alerts = joins.smoke_alert(readings, smoke, temp_threshold=180.0)
    return alerts.select(
        "message", F.unix_millis("ts").alias("ts_ms"), "temperature"
    )
