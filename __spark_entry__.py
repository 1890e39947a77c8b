"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`stream_processing_with_flink_study_spark`;
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stream_processing_with_flink_study_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (AverageSensorReadings.java:67-76 semantics) on
    /root/testdata/sf0.001: keyed tumbling-window average after F→C map."""
    return plans.QUERIES["flagship_window_avg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted ⇒ rows-only check)."""
    return dict(plans.ORACLES)
