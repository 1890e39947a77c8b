"""Custom Python DataSource (S6 — custom/resettable source) using the
PySpark 4 DataSource V2 Python API.

The reference implements ``SensorSource``/``SmokeLevelSource`` as
``SourceFunction`` subclasses with a run()/cancel() loop
(``util/SensorSource.java:27-69``).  The Spark-4-native equivalent is a
registered Python ``DataSource``: Spark plans its partitions, calls the
reader per partition on executors, and (for the stream form) tracks
offsets so a checkpointed restart RESUMES — the "resettable" property
the reference gets from checkpointed source state.

``sensors`` here is deterministic (seeded per partition + offset
range): every (partition, reading_n) pair always yields the same
temperature, so tests can assert values, restarts replay identical
data, and the batch and streaming forms agree row-for-row — the same
determinism discipline as ``sources/generators.py``, but through the
engine's own pluggable-source seam instead of rate-stream arithmetic.
"""

from __future__ import annotations

import math

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "sensor_id int, reading_n long, temperature double"


def _reading(sensor_id: int, n: int) -> float:
    """Deterministic pseudo-random walk: base 65 °F + a bounded
    sinusoid-plus-hash wobble — same value for the same (sensor, n)
    on every executor, every run."""
    h = (sensor_id * 1_000_003 + n * 7_919) % 1_000
    return round(65.0 + 10.0 * math.sin(n / 7.0 + sensor_id) + h / 100.0, 4)


class _SensorPartition(InputPartition):
    def __init__(self, sensor_id: int, start: int, end: int):
        self.sensor_id = sensor_id
        self.start = start
        self.end = end


class _SensorBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.n_sensors = int(options.get("sensors", 4))
        self.readings = int(options.get("readings", 100))

    def partitions(self):
        # one partition per sensor: the reference's per-subtask sensor
        # sharding (SensorSource.java:50) expressed as Spark partitions
        return [
            _SensorPartition(s, 0, self.readings)
            for s in range(self.n_sensors)
        ]

    def read(self, partition: _SensorPartition):
        for n in range(partition.start, partition.end):
            yield (
                partition.sensor_id,
                n,
                _reading(partition.sensor_id, n),
            )


class _SensorStreamReader(DataSourceStreamReader):
    """Micro-batch stream form: the offset is the global reading index;
    ``latestOffset`` reports everything currently AVAILABLE
    (``maxReadings`` — for a real feed this would be the upstream high
    watermark), and Spark's checkpoint decides where to start.
    ``initialOffset`` is consulted only on a FIRST start; a restarted
    query resumes from its committed offset — the resettable-source
    contract, asserted by growing ``maxReadings`` between restarts in
    tests/test_custom_datasource.py (the second run must emit ONLY the
    new range: no duplicates, no gaps)."""

    def __init__(self, schema: StructType, options: dict):
        self.n_sensors = int(options.get("sensors", 4))
        self.max_readings = int(options.get("maxReadings", 50))

    def initialOffset(self):  # noqa: N802 (Spark API casing)
        return {"reading": 0}

    def latestOffset(self):  # noqa: N802
        return {"reading": self.max_readings}

    def partitions(self, start: dict, end: dict):
        return [
            _SensorPartition(s, start["reading"], end["reading"])
            for s in range(self.n_sensors)
        ]

    def read(self, partition: _SensorPartition):
        for n in range(partition.start, partition.end):
            yield (
                partition.sensor_id,
                n,
                _reading(partition.sensor_id, n),
            )

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class SensorDataSource(DataSource):
    """``spark.read.format("sensors")`` / ``spark.readStream.format(
    "sensors")`` after :func:`register_sensor_source`."""

    @classmethod
    def name(cls) -> str:
        return "sensors"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SensorBatchReader(schema, self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:  # noqa: N802
        return _SensorStreamReader(schema, self.options)


def register_sensor_source(spark) -> None:
    """Idempotent registration of the ``sensors`` format."""
    spark.dataSource.register(SensorDataSource)
