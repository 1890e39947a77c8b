"""Stateless record-at-a-time transforms (SURVEY.md §2.2 B1-B5).

The reference's ``map`` / ``filter`` / ``flatMap``
(``BasicTransformations.java:47-81``) map to declarative column
expressions so Catalyst can push predicates into the parquet scan and
whole-stage-codegen the projection.  Nothing here ever leaves the JVM:
``flat_map_split`` is ``explode(split(...))``, not a Python UDF.

``rich_map_partitions`` covers the ``RichFunction`` open()/close()
lifecycle (``정리/3주차.md:174-178``): per-task setup before the batch
loop, teardown after — the ``mapInPandas`` iterator form gives exactly
that hook structure, Arrow-batched.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def map_columns(df: DataFrame, **exprs: Column) -> DataFrame:
    """B1 ``map`` — 1→1 transform (``BasicTransformations.java:62-63``).

    Expressed as ``withColumns`` so consecutive maps fuse into one
    codegen'd projection (task chaining, ``정리/2주차.md:85-90``, is free).
    """
    return df.withColumns(dict(exprs))


def fahrenheit_to_celsius(df: DataFrame, col: str = "temperature") -> DataFrame:
    """The flagship map (``AverageSensorReadings.java:69``): F → C."""
    return df.withColumn(col, (F.col(col) - 32) * (5.0 / 9.0))


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """B2 ``filter`` (``BasicTransformations.java:54-55``,
    ``TemperatureFilter`` at :90-102) — Catalyst pushes this to the scan."""
    return df.filter(predicate)


def flat_map_split(df: DataFrame, col: str, sep: str, alias: str = "token") -> DataFrame:
    """B3 ``flatMap`` — the reference's id-split
    (``BasicTransformations.java:70-74``, ``IdSplitter`` at :118-129):
    1→N via ``explode(split(...))``, all JVM-side."""
    return df.select(F.explode(F.split(F.col(col), sep)).alias(alias))


def flat_map(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """B3 general 1→0..N flatMap for logic ``explode`` can't express:
    Arrow-batched ``mapInPandas`` (each input batch may yield any number
    of output rows)."""

    def _it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(_it, schema)


def rich_map_partitions(
    df: DataFrame,
    setup: Callable[[], object],
    fn: Callable[[object, pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
    teardown: Callable[[object], None] | None = None,
) -> DataFrame:
    """B5 RichFunction lifecycle (``정리/3주차.md:174-178``): ``setup`` runs
    once per task (== ``open()``), ``fn`` per Arrow batch, ``teardown``
    once at end (== ``close()``)."""

    def _it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = setup()
        try:
            for pdf in batches:
                yield fn(ctx, pdf)
        finally:
            if teardown is not None:
                teardown(ctx)

    return df.mapInPandas(_it, schema)
