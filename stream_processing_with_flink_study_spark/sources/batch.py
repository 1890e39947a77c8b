"""Bounded sources (SURVEY.md §2.1 S3, S5 batch half).

- ``from_elements``: the reference's in-memory collection source
  (``env.fromElements`` at ``RollingSum.java:34-35``).
- ``load_table`` / ``load_tables``: parquet table loaders for the driver
  corpus.  Parquet is the engine's canonical bounded source — columnar,
  with predicate pushdown and column pruning handled by Catalyst
  (check ``PushedFilters`` / ``ReadSchema`` in ``df.explain``).
- ``read_file``: the text/csv/json/parquet file source
  (``env.readFile`` PROCESS_ONCE mode, ``정리/6주차.md:95-120``); the
  PROCESS_CONTINUOUSLY twin lives in :mod:`..streaming.sources`.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLES


def from_elements(
    spark: SparkSession, rows: Iterable, schema: T.StructType | str
) -> DataFrame:
    """Bounded DataFrame from literal elements (``env.fromElements``,
    RollingSum.java:34-35)."""
    return spark.createDataFrame(list(rows), schema=schema)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver parquet table; schema comes from the parquet footer.

    Timestamp columns are normalized to Spark's session-timezone
    ``TimestampType`` (session tz forced to UTC — the DuckDB oracle
    treats the same values as UTC-naive) regardless of the physical
    encoding the driver generated:

    - TIMESTAMP(NANOS) (round-1 data): read as a nanos long via
      ``spark.sql.legacy.parquet.nanosAsLong`` and floor-converted to
      micros (integer ``div`` — ns epoch values exceed double precision).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round-2 data): Spark 4
      infers TIMESTAMP_NTZ; ``inferTimestampNTZEnabled=false`` reads it
      as a plain UTC-instant TimestampType instead, keeping
      ``unix_millis``/watermark/window operators working unchanged.

    All confs are set at runtime so this works under ANY SparkSession
    (the driver's verify session included), not just
    :func:`..session.get_spark`.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZEnabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.dataType.simpleString() == "timestamp_ntz":
            # belt-and-braces: value-preserving under UTC session tz
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several driver tables at once (all of TESTDATA.md by default)."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_file(
    spark: SparkSession,
    path: str,
    fmt: str = "text",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Bounded file read — PROCESS_ONCE (``정리/6주차.md:103``)."""
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
