"""Window operators (SURVEY.md §2.4 W1-W8).

Event-time windows are ``groupBy(window(ts, ...))`` — Spark computes the
bucket map-side (no pre-shuffle), then one hash exchange on (window, key)
with partial aggregation, the same single-exchange topology as the
reference's keyBy+window (``AverageSensorReadings.java:71-76``).

Custom pieces the built-ins lack (SURVEY §7.3):

- count windows (W5): ``row_number`` bucketing in batch; ListState in
  streaming (:mod:`.stateful`).
- late-data side output (W8): ``split_late`` filter pair — the engine's
  deterministic analogue of ``.sideOutputLateData`` (``정리/4주차.md:
  339-345``).
- session windows in batch (W4): lag+cumsum sessionization, which is the
  oracle-checkable twin of streaming ``session_window``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts: str, size: str, *keys: str):
    """W1/W2 tumbling window groups (``AverageSensorReadings.java:74``;
    ``정리/4주차.md:160-162``).  Returns GroupedData ready for ``.agg``."""
    return df.groupBy(F.window(ts, size), *keys)


def sliding(df: DataFrame, ts: str, size: str, slide: str, *keys: str):
    """W3 sliding window (``정리/4주차.md:164-166``) — each row lands in
    size/slide buckets; Spark expands map-side then aggregates."""
    return df.groupBy(F.window(ts, size, slide), *keys)


def session(df: DataFrame, ts: str, gap: str, *keys: str):
    """W4 session window, streaming/batch native form
    (``정리/4주차.md:168-171``)."""
    return df.groupBy(F.session_window(ts, gap), *keys)


def sessionize(df: DataFrame, keys: list[str], ts: str, gap_seconds: float) -> DataFrame:
    """W4 batch twin: assign a per-key ``session_id`` via lag+cumsum —
    a new session starts when the gap to the previous event exceeds
    ``gap_seconds``.  One shuffle+sort per key; SQL-expressible, so it is
    the DuckDB-oracle form of session windows."""
    w = Window.partitionBy(*keys).orderBy(ts)
    gap = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def count_window(df: DataFrame, keys: list[str], order: list[str], n: int) -> DataFrame:
    """W5 count window (``정리/1주차.md:152``) — batch form: bucket every
    N records per key in arrival order.  Adds ``count_window_id``."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(
        "count_window_id", ((F.row_number().over(w) - 1) / n).cast("long")
    )


def with_bounded_watermark(
    df: DataFrame, ts: str, slack_seconds: float, alias: str = "wm"
) -> DataFrame:
    """Attach a bounded-out-of-orderness watermark column for batch
    replays (``SensorTimeAssigner.java:26-46``, 5 s slack at :33):
    global ``max(ts) - slack``.

    The 1-row aggregate joins back via an explicit ``broadcast`` cross
    join — plan-side, no driver ``collect``, and still a single scan +
    one tiny broadcast at any scale.
    """
    agg = df.select(
        (F.max(F.col(ts).cast("double")) - F.lit(slack_seconds)).alias(alias)
    )
    return df.crossJoin(F.broadcast(agg))


def split_late(
    df: DataFrame, ts: str, slack_seconds: float
) -> tuple[DataFrame, DataFrame]:
    """W8 late-data side output (``.sideOutputLateData``, ``정리/4주차.md:
    339-345``): rows older than ``max(ts) - slack`` go to the late branch.

    Batch analogue of the streaming watermark cutoff; in streaming the
    on-time branch feeds the windowed agg and the late branch a side sink
    via ``foreachBatch``.  Both branches share one scan when the input is
    cached.
    """
    with_wm = with_bounded_watermark(df, ts, slack_seconds)
    on_time = with_wm.filter(F.col(ts).cast("double") >= F.col("wm")).drop("wm")
    late = with_wm.filter(F.col(ts).cast("double") < F.col("wm")).drop("wm")
    return on_time, late


def with_punctuated_watermark(
    df: DataFrame,
    ts: str,
    marker,
    arrival: str,
    key: str,
    alias: str = "pw",
) -> DataFrame:
    """Punctuated watermark, batch replay (``정리/4주차.md:71-96``):
    Flink's ``AssignerWithPunctuatedWatermarks`` emits a watermark AT
    designated marker records instead of on a timer.  Structured
    Streaming is periodic-only (SURVEY §7.3.4 — no per-record watermark
    hook), but the SEMANTICS replay exactly on the batch tier: the
    watermark visible at each record is the max event time over marker
    records at strictly earlier ``arrival`` positions (a marker never
    lateness-checks itself), per ``key`` — the per-source-partition
    watermark of the reference, before min-propagation.

    ``marker`` is a SQL boolean expression string or Column.  One
    window pass over the (key, arrival) sort; composes with
    :func:`split_late` semantics via :func:`split_late_punctuated`."""
    m = F.expr(marker) if isinstance(marker, str) else marker
    w = (
        Window.partitionBy(key)
        .orderBy(arrival)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        alias, F.max(F.when(m, F.col(ts))).over(w)
    )


def split_late_punctuated(
    df: DataFrame,
    ts: str,
    marker,
    arrival: str,
    key: str,
) -> tuple[DataFrame, DataFrame]:
    """W8 late split under a punctuated watermark: records whose event
    time is below the last marker-carried watermark at their arrival
    position go to the late branch."""
    with_pw = with_punctuated_watermark(df, ts, marker, arrival, key)
    late = with_pw.filter(
        F.col("pw").isNotNull() & (F.col(ts) < F.col("pw"))
    ).drop("pw")
    on_time = with_pw.filter(
        F.col("pw").isNull() | (F.col(ts) >= F.col("pw"))
    ).drop("pw")
    return on_time, late
