"""Synthetic streaming generators (SURVEY.md §2.1 S1, S2).

Spark-first re-expression of the reference's source functions:

- S1 ``SensorSource`` (``SensorSource.java:32-77``): rich parallel source,
  10 sensors per subtask, initial temp ``65 + N(0,1)*20`` (°F), Gaussian
  random-walk step ``N(0,1)*0.5``, a batch of readings every 100 ms.
- S2 ``SmokeLevelSource`` (``SmokeLevelSource.java:27-63``): 1 event/s,
  ``HIGH`` iff ``N(0,1) > 0.8`` else ``LOW``, parallelism forced to 1
  (``MultiStreamTransformations.java:59``).

Implementation: Spark's built-in ``rate`` streaming source (per-partition
monotonically increasing ``value`` + ``timestamp``) with stateless column
synthesis on top.  The *random-walk* part of S1 is inherently stateful per
sensor; we reproduce its distribution with a deterministic hash-seeded
walk: step k for sensor s uses ``randn``-like values derived from
``xxhash64(s, k)``, summed over a bounded trailing horizon.  Exact
per-step state is available via the stateful operators
(:mod:`..streaming.stateful`) when required; the batch twin for all
correctness checks is the driver's ``events`` table (FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TWO63 = 2.0**63


def _hash_uniform(*cols) -> F.Column:
    """Deterministic U(0,1) from xxhash64 — JVM-side, codegen-friendly."""
    return (F.xxhash64(*cols).cast("double") / F.lit(_TWO63) + 1.0) / 2.0


def _hash_gauss(*cols) -> F.Column:
    """Deterministic ~N(0,1) via inverse-free 12-uniform CLT sum.

    Sum of 12 U(0,1) minus 6 is the classic Irwin-Hall normal
    approximation; each uniform comes from an independent hash salt so the
    stream stays stateless and reproducible across retries (important for
    exactly-once replay, ``정리/6주차.md:169-235``).
    """
    acc = F.lit(-6.0)
    for salt in range(12):
        acc = acc + _hash_uniform(F.lit(salt), *cols)
    return acc


def sensor_readings_stream(
    spark: SparkSession,
    sensors_per_partition: int = 10,
    partitions: int = 1,
    rows_per_second: int = 100,
) -> DataFrame:
    """Unbounded sensor-reading stream matching S1's shape and rates.

    Defaults give 100 events/s per partition — the reference's 10 sensors
    x 1 reading / 100 ms (``SensorSource.java:27,50,69``).
    Columns: ``id:string, ts:timestamp, temperature:double``.
    """
    n_sensors = sensors_per_partition * partitions
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second * partitions)
        .option("numPartitions", partitions)
        .load()
    )
    step = (F.col("value") / n_sensors).cast("long")
    sensor = F.col("value") % n_sensors
    init = F.lit(65.0) + _hash_gauss(F.lit("init"), sensor) * 20.0
    # bounded-horizon walk: sum of the last 64 hash-seeded steps; matches
    # the reference's N(0,1)*0.5 step distribution (SensorSource.java:63)
    walk = sum(
        (
            F.when(step >= k, _hash_gauss(F.lit(k), sensor, step - k) * 0.5).otherwise(
                0.0
            )
            for k in range(64)
        ),
        F.lit(0.0),
    )
    return rate.select(
        F.concat(F.lit("sensor_"), sensor.cast("string")).alias("id"),
        F.col("timestamp").alias("ts"),
        (init + walk).alias("temperature"),
    )


def smoke_level_stream(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """Unbounded smoke-level control stream (S2): 1 event/s, single
    partition, HIGH iff N(0,1) > 0.8 (``SmokeLevelSource.java:44-49``)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", 1)
        .load()
    )
    return rate.select(
        F.col("timestamp").alias("ts"),
        F.when(_hash_gauss(F.lit("smoke"), F.col("value")) > 0.8, "HIGH")
        .otherwise("LOW")
        .alias("level"),
    )
