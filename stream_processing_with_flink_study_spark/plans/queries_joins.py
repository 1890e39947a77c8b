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


# --------------------------------------------------------------------------
# Allen's interval algebra: relation census over consecutive order spans
# --------------------------------------------------------------------------
_ALLEN_CASE = """
  CASE WHEN s1 = s2 AND e1 = e2 THEN 'equals'
       WHEN s1 = s2 AND e1 < e2 THEN 'starts'
       WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
       WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
       WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
       WHEN e1 = s2 THEN 'meets'
       WHEN e2 = s1 THEN 'met_by'
       WHEN e1 < s2 THEN 'precedes'
       WHEN e2 < s1 THEN 'preceded_by'
       WHEN s1 > s2 AND e1 < e2 THEN 'during'
       WHEN s1 < s2 AND e1 > e2 THEN 'contains'
       WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
       WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'overlapped_by'
       ELSE 'other' END
"""

_ALLEN_SQL = f"""
WITH spans AS {{MAT}}(
  SELECT o.o_custkey AS cust, o.o_orderkey AS okey,
         CAST({{DDS}} AS BIGINT) AS s,
         CAST({{DDE}} AS BIGINT) AS e
  FROM {{orders}} o
  JOIN (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS last_ship
        FROM {{lineitem}} GROUP BY l_orderkey) li
    ON li.l_orderkey = o.o_orderkey
),
pairs AS {{MAT}}(
  SELECT s AS s1, e AS e1,
         lead(s) OVER w AS s2, lead(e) OVER w AS e2
  FROM spans
  WINDOW w AS (PARTITION BY cust ORDER BY s, okey)
),
rel AS {{MAT}}(
  SELECT {_ALLEN_CASE} AS relation
  FROM pairs WHERE s2 IS NOT NULL
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rel)
SELECT r.relation, CAST(count(*) AS BIGINT) AS n_pairs,
       round(CAST(count(*) AS DOUBLE) / max(tot.n) - 1e-9, 6) + 0.0
         AS share
FROM rel r CROSS JOIN tot
GROUP BY r.relation ORDER BY r.relation
"""


@query(
    "allen_interval_census",
    _ALLEN_SQL.replace("{orders}", "orders")
    .replace("{lineitem}", "lineitem")
    .replace(
        "{DDS}",
        "date_diff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE))",
    )
    .replace(
        "{DDE}", "date_diff('day', DATE '1992-01-01', li.last_ship)"
    )
    .replace("{MAT}", "MATERIALIZED "),
)
def allen_interval_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Census of Allen's 13 interval-algebra relations between each
    customer's CONSECUTIVE order fulfilment spans ([order date, last
    ship date]) — the temporal-reasoning vocabulary (precedes / meets
    / overlaps / starts / during / finishes / equals + inverses) that
    powers conflict detection and process-overlap analytics; here it
    answers "does a customer's next order start before the previous
    one finished shipping?".  The CASE ladder is ordered so
    equality-constrained relations match before their open-interval
    generalizations, making the 13 branches a PARTITION of all (s,e)
    configurations — the ``other`` bucket must be empty, and
    tests/test_wave13.py proves exactly that plus a 13-way hand-built
    fixture hitting every branch.

    Determinism: endpoints are integer day offsets; every branch is an
    integer comparison; shares are single divisions of exact counts.
    Scale shape: one lineitem rollup, one orders join, one
    per-customer window — the same partitioning every per-customer
    sequence query reuses (no extra shuffle class), then a 13-row
    aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "allen_orders"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "allen_lineitem"
    )
    return spark.sql(
        _ALLEN_SQL.replace("{orders}", "allen_orders")
        .replace("{lineitem}", "allen_lineitem")
        .replace(
            "{DDS}",
            "datediff(CAST(o.o_orderdate AS DATE), DATE '1992-01-01')",
        )
        .replace("{DDE}", "datediff(li.last_ship, DATE '1992-01-01')")
        .replace("{MAT}", "")
    )


def allen_census_frame(pairs: DataFrame) -> DataFrame:
    """Relation census over any (s1, e1, s2, e2) integer frame —
    factored out so tests can enumerate all 13 configurations; see
    :func:`allen_interval_census`."""
    pairs.createOrReplaceTempView("allen_pairs_frame")
    return pairs.sparkSession.sql(
        f"""
        WITH rel AS (
          SELECT {_ALLEN_CASE} AS relation FROM allen_pairs_frame
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rel)
        SELECT r.relation, CAST(count(*) AS BIGINT) AS n_pairs,
               round(CAST(count(*) AS DOUBLE) / max(tot.n) - 1e-9, 6)
                 + 0.0 AS share
        FROM rel r CROSS JOIN tot
        GROUP BY r.relation ORDER BY r.relation
        """
    )
