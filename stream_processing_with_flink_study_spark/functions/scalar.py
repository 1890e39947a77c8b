"""Scalar-function surface (SURVEY.md §2.9) + engine-wide helpers.

The reference's scalar usage (arithmetic, comparisons, concat, split,
abs, greatest/least, randn, epoch-millis conversions) maps 1:1 onto
``pyspark.sql.functions``; this module only adds the helpers Spark
doesn't ship.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ntz_millis(col: Column | str) -> Column:
    """Epoch-millis from a TIMESTAMP_NTZ column, independent of the
    session timezone.

    ``unix_millis`` rejects NTZ, and ``cast(ntz as timestamp)`` shifts by
    the session TZ.  ``to_utc_timestamp(ntz, 'UTC')`` pins the wall-clock
    value as a UTC instant first, so the result matches DuckDB's
    ``epoch_ms`` on the same stored value under ANY session TZ (the
    driver's session is not ours to configure).
    """
    return F.unix_millis(F.to_utc_timestamp(col, "UTC"))


def ntz_lit(value: str) -> Column:
    """TIMESTAMP_NTZ literal for comparisons against NTZ columns —
    avoids the ntz→ltz cast that both shifts semantics across session
    timezones and blocks parquet predicate pushdown."""
    return F.lit(value).cast("timestamp_ntz")


def fahrenheit_to_celsius(col: Column | str) -> Column:
    """(t-32)*(5/9) — AverageSensorReadings.java:69."""
    c = F.col(col) if isinstance(col, str) else col
    return (c - 32) * (5.0 / 9.0)
