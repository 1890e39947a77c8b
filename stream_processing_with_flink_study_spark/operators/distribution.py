"""Physical distribution operators (SURVEY.md §2.7 D1-D8).

Thin, named wrappers so the engine's API surface matches the reference's
distribution vocabulary (``정리/3주차.md:86-108``).  In Spark most of
these are hints to Catalyst rather than hard physical plans — AQE may
coalesce afterwards, which is the behavior we want at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle(df: DataFrame, n: int | None = None) -> DataFrame:
    """D1/D2 ``shuffle()``/``rebalance()`` (``정리/3주차.md:87-88``):
    round-robin redistribution."""
    return df.repartition(n) if n else df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def rescale(df: DataFrame, n: int) -> DataFrame:
    """D3 ``rescale()`` (``정리/3주차.md:89-90``): scale-down without a
    full shuffle."""
    return df.coalesce(n)


def broadcast_hint(df: DataFrame) -> DataFrame:
    """D4 ``broadcast()`` (``정리/3주차.md:91``): replicate to every task
    — the broadcast-join hint."""
    return F.broadcast(df)


def to_single_task(df: DataFrame) -> DataFrame:
    """D5 ``global()`` (``정리/3주차.md:92-93``): everything to one task.
    Deliberately explicit — a scale smell anywhere in a hot path."""
    return df.coalesce(1)


def partition_by_key(df: DataFrame, *cols: str | Column, n: int | None = None) -> DataFrame:
    """D6 ``partitionCustom()`` hash form (``정리/3주차.md:94-108``):
    co-locate rows by key ahead of repeated keyed ops so later
    joins/aggs on the same key reuse the exchange."""
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def partition_by_range(df: DataFrame, *cols: str | Column, n: int | None = None) -> DataFrame:
    """D6 range form — sorted/partition-pruned output layouts."""
    return df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)
