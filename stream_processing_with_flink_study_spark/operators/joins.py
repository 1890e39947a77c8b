"""Multi-stream operators (SURVEY.md §2.6 M1-M7).

Join strategy notes for scale (the part Flink users hand-tune that
Catalyst + AQE pick automatically here):

- window join (M4) and interval join (M5) are keyed equi-joins with an
  extra window/range predicate — the equi part keeps them
  shuffle-hash/sort-merge (NOT a cross product), so they scale linearly
  in rows per key.
- the as-of control-stream join (M2) deliberately avoids a join: a tiny
  control stream joined by range would still fan out; instead we union
  the tagged streams and run ONE window pass (``last(..., ignorenulls)``)
  — a single sort-shuffle, no row amplification, skew-safe.  This is the
  deterministic event-time semantic for the reference's arrival-order-
  dependent CoFlatMap (``MultiStreamTransformations.java:83-100`` —
  SURVEY §7.3 gap 2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def union_all(*dfs: DataFrame) -> DataFrame:
    """M1 ``union`` (``정리/3주차.md:72-74``): FIFO merge, no dedup —
    ``unionByName`` so column order never silently misaligns."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def window_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_left: str,
    ts_right: str,
    size: str,
    how: str = "inner",
) -> DataFrame:
    """M4 window join (``정리/4주차.md:325-333``): records joining iff
    same key AND same tumbling window.  The window struct is part of the
    equi-join key, so Catalyst plans a plain hash/sort-merge join."""
    lw = left.withColumn("window", F.window(ts_left, size))
    rw = right.withColumn("window", F.window(ts_right, size))
    return lw.join(rw, [*keys, "window"], how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_left: str,
    ts_right: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """M5 interval/band join (``정리/4주차.md:313-323``):
    ``right.ts ∈ [left.ts + lower, left.ts + upper]`` for same key.

    The key equality keeps it an equi-join with a range residual; in
    streaming the same predicate + watermarks bounds state (Spark
    stream-stream join).  ``lower``/``upper`` are INTERVAL strings,
    e.g. ``"-1 hour"`` / ``"15 minutes"`` matching
    ``.between(Time.hour(-1), Time.minute(15))``.
    """
    on = [left[k] == right[k] for k in keys]
    lo = left[ts_left] + F.expr(f"INTERVAL {lower}")
    hi = left[ts_left] + F.expr(f"INTERVAL {upper}")
    cond = on + [right[ts_right] >= lo, right[ts_right] <= hi]
    return left.join(right, functools_reduce_and(cond), how)


def functools_reduce_and(conds: list[Column]) -> Column:
    c = conds[0]
    for x in conds[1:]:
        c = c & x
    return c


def asof_join_union(
    readings: DataFrame,
    control: DataFrame,
    ts: str,
    control_cols: list[str],
    keys: list[str],
) -> DataFrame:
    """M2/M6 deterministic PER-KEY as-of: each reading gets the most
    recent control row for its key with ``control.ts <= reading.ts``.

    Union-tag-and-carry-forward: tag both streams, one shuffle-sort by
    (key, ts), then ``last(ctrl_col, ignorenulls=True)`` over the ordered
    per-key window carries the control value forward.  No join fan-out,
    parallel across keys, skew bounded by the hottest key.  For a GLOBAL
    (un-keyed) control stream use :func:`asof_join_broadcast` — a global
    sort here would serialize onto one partition.
    """
    r_cols = readings.columns
    tagged_r = readings.withColumn("_is_reading", F.lit(1))
    for c in control_cols:
        tagged_r = tagged_r.withColumn(c, F.lit(None).cast(control.schema[c].dataType))
    tagged_c = control.withColumn("_is_reading", F.lit(0))
    for c in r_cols:
        if c not in control.columns:
            tagged_c = tagged_c.withColumn(
                c, F.lit(None).cast(readings.schema[c].dataType)
            )
    cols = [*r_cols, *[c for c in control_cols if c not in r_cols], "_is_reading"]
    merged = tagged_r.select(*cols).unionByName(tagged_c.select(*cols))

    # control rows sort before readings at the same timestamp, so an
    # exactly-simultaneous control value applies to that reading
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts), F.col("_is_reading"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = merged
    for c in control_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out.filter(F.col("_is_reading") == 1).drop("_is_reading")


def asof_join_broadcast(
    readings: DataFrame,
    control: DataFrame,
    ts: str,
    control_cols: list[str],
) -> DataFrame:
    """M2 GLOBAL as-of for a small control stream (the reference's smoke
    stream runs at 1 event/s, parallelism 1 —
    ``MultiStreamTransformations.java:59``).

    Turn each control row into a validity interval ``[ts, next_ts)`` via
    ``lead`` (the control side is tiny, so its single-partition sort is
    free), broadcast it, and interval-join: every reading matches exactly
    one interval.  The big side never shuffles — this is the 100 TB path.
    """
    c = (
        control.withColumn(
            "_valid_to",
            F.lead(F.col(ts)).over(Window.orderBy(F.col(ts))),
        )
        .withColumnRenamed(ts, "_valid_from")
        .select("_valid_from", "_valid_to", *control_cols)
    )
    cond = (readings[ts] >= c["_valid_from"]) & (
        c["_valid_to"].isNull() | (readings[ts] < c["_valid_to"])
    )
    return (
        readings.join(F.broadcast(c), cond, "left")
        .drop("_valid_from", "_valid_to")
    )


def smoke_alert(
    readings: DataFrame,
    smoke: DataFrame,
    temp_threshold: float = 100.0,
) -> DataFrame:
    """The reference's two-stream alert
    (``MultiStreamTransformations.java:83-100``): emit when the latest
    smoke level is HIGH and temperature > threshold — deterministic
    event-time version (SURVEY §3.3).

    ``readings``: (id, ts, temperature); ``smoke``: (ts, level) — tiny
    and global, so the broadcast-intervals as-of applies.
    """
    joined = asof_join_broadcast(readings, smoke, "ts", ["level"])
    return joined.filter(
        (F.col("level") == "HIGH") & (F.col("temperature") > temp_threshold)
    ).select(
        F.concat(F.lit("Risk of fire! "), F.col("id")).alias("message"),
        F.col("ts"),
        F.col("temperature"),
    )
