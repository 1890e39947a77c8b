"""Keyed aggregations (SURVEY.md §2.3 K1-K10).

``keyBy`` (``RollingSum.java:38``, ``KeyedTransformations.java:50-51``)
is ``groupBy`` — Catalyst inserts the hash exchange and does partial
(map-side) + final aggregation automatically, which is what makes these
plans survive a 100× scale-up: the shuffle moves one row per (partition,
key), not per input row.

Rolling (per-event) aggregations — the reference emits an updated result
per input record (``KeyedStream.sum`` at ``RollingSum.java:39``, rolling
``reduce`` at ``KeyedTransformations.java:55-62``) — are expressed in
batch as window functions over ``rowsBetween(unboundedPreceding,
currentRow)``; the streaming twin is an update-mode ``groupBy().agg()``
(same final answer, per-event emission micro-batched — SURVEY §7.3
semantic-gap note 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROLLING = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "count": F.count,
}


def keyed_agg(df: DataFrame, keys: list[str], *aggs: Column) -> DataFrame:
    """K1 + K6: hash-agg per key; one shuffle, partial agg map-side."""
    return df.groupBy(*keys).agg(*aggs)


def rolling_agg(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    agg: str,
    col: str,
    alias: str | None = None,
) -> DataFrame:
    """K2/K3: per-key running sum/min/max/avg/count in arrival order,
    one output row per input row (``RollingSum.java:39``;
    ``정리/3주차.md:59-64``).

    Single shuffle+sort per key: ``Window.partitionBy(keys).orderBy(order)
    .rowsBetween(unboundedPreceding, currentRow)``.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias or f"rolling_{agg}", _ROLLING[agg](col).over(w))


def min_by(df: DataFrame, keys: list[str], ord_col: str) -> DataFrame:
    """K4 ``minBy`` — whole row holding the per-key minimum
    (``정리/3주차.md:64``).  ``min_by(struct(*), ord)`` keeps the agg
    single-pass (no second join back)."""
    return _by(df, keys, ord_col, F.min_by)


def max_by(df: DataFrame, keys: list[str], ord_col: str) -> DataFrame:
    """K4 ``maxBy`` (``정리/3주차.md:64``)."""
    return _by(df, keys, ord_col, F.max_by)


def _by(df, keys, ord_col, agg_fn) -> DataFrame:
    others = [c for c in df.columns if c not in keys]
    row = F.struct(*[F.col(c) for c in others])
    out = df.groupBy(*keys).agg(agg_fn(row, F.col(ord_col)).alias("_row"))
    return out.select(*keys, *[F.col(f"_row.{c}").alias(c) for c in others])


def keyed_reduce_max(df: DataFrame, keys: list[str], ord_col: str) -> DataFrame:
    """K5 rolling ``reduce`` keeping the max-temperature record per key
    (``KeyedTransformations.java:55-62``).  Final-state form == max_by;
    the per-event trace uses :func:`rolling_agg` semantics; the exact
    Flink field-mixing behavior (first record's non-aggregated fields kept)
    is covered by :func:`rolling_sum_flink` below."""
    return max_by(df, keys, ord_col)


def rolling_sum_flink(
    df: DataFrame, key: str, sum_col: str, order: list[str]
) -> DataFrame:
    """K2 with exact Flink field semantics (``RollingSum.java:39``,
    FIXTURES.md §4): the summed field rolls, every *other* field keeps the
    value of the key's FIRST record.  One window spec, reused by all three
    projections, so Spark plans a single sort+shuffle."""
    w = Window.partitionBy(key).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    exprs = []
    for c in df.columns:
        if c == sum_col:
            exprs.append(F.sum(c).over(run).alias(c))
        elif c == key:
            exprs.append(F.col(c))
        else:
            exprs.append(F.first(c).over(run).alias(c))
    return df.select(*exprs)


def distinct_rows(df: DataFrame, *cols: str) -> DataFrame:
    """K10 distinct — hash-agg dedup (shuffles once on the selected cols)."""
    return (df.select(*cols) if cols else df).distinct()


def count_distinct_agg(
    df: DataFrame, keys: list[str], col: str, approx: bool = False, rsd: float = 0.05
) -> DataFrame:
    """K10 count-distinct; ``approx=True`` switches to HyperLogLog++
    (``approx_count_distinct``) — at 100 TB the exact form needs a
    two-level shuffle while HLL merges fixed-size sketches map-side."""
    agg = (
        F.approx_count_distinct(col, rsd)
        if approx
        else F.countDistinct(col)
    )
    return df.groupBy(*keys).agg(agg.alias(f"n_{col}"))
