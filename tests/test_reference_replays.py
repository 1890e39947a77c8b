"""Reference-program replays (SURVEY.md §5.2): the five example
programs re-expressed as batch queries over hand-built fixtures, with
expected outputs derived by hand from the reference's code.

- RollingSum.java:34-41         → rolling_sum_flink golden tuples
- BasicTransformations.java:47-81 → filter / F→C map / id-split
- KeyedTransformations.java:50-62 → rolling reduce keeps max-temp record
- AverageSensorReadings.java:63-79 → keyed tumbling-window average
- MultiStreamTransformations.java:50-71 → smoke-level alert (the
  deterministic event-time as-of semantic, SURVEY §3.3)
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.operators import core, joins, keyed

T0 = datetime(2024, 1, 1, 0, 0, 0, tzinfo=timezone.utc)


def ts(seconds: float) -> datetime:
    from datetime import timedelta

    return T0 + timedelta(seconds=seconds)


SENSOR_SCHEMA = "id string, ts timestamp, temperature double"


def test_rolling_sum_golden(spark):
    """RollingSum.java:35 input (1,2,2),(2,3,1),(2,2,4),(1,5,3) keyed on
    f0, .sum(1): Flink emits the running sum in f1 and keeps the FIRST
    record's other fields (ALL of them, the order column included) →
    (1,2,2),(2,3,1),(2,5,1),(1,7,2)."""
    rows = [(1, 2, 2, 1), (2, 3, 1, 2), (2, 2, 4, 3), (1, 5, 3, 4)]
    df = spark.createDataFrame(rows, "f0 int, f1 int, f2 int, seq int")
    got = {
        (r.f0, r.f1, r.f2)
        for r in keyed.rolling_sum_flink(df, "f0", "f1", ["seq"]).collect()
    }
    assert got == {(1, 2, 2), (2, 3, 1), (2, 5, 1), (1, 7, 2)}


def test_basic_transformations_replay(spark):
    """BasicTransformations.java:54-74: filter temp >= 25, extract +
    split ids on '_' → one token per part, only for qualifying rows."""
    rows = [
        ("sensor_1", ts(0), 20.0),  # filtered out
        ("sensor_7", ts(1), 30.0),
        ("probe_a_b", ts(2), 99.0),
    ]
    df = spark.createDataFrame(rows, SENSOR_SCHEMA)
    filtered = core.filter_rows(df, F.col("temperature") >= 25)
    toks = core.flat_map_split(filtered, "id", "_")
    assert sorted(r.token for r in toks.collect()) == [
        "7",
        "a",
        "b",
        "probe",
        "sensor",
    ]


def test_keyed_reduce_max_replay(spark):
    """KeyedTransformations.java:55-62: per key keep the record with the
    highest temperature seen (rolling reduce's FINAL state — the oracle
    semantics per SURVEY §7.3 gap 1)."""
    rows = [
        ("s1", ts(0), 10.0),
        ("s1", ts(1), 50.0),
        ("s1", ts(2), 30.0),
        ("s2", ts(0), -5.0),
        ("s2", ts(3), -1.0),
    ]
    df = spark.createDataFrame(rows, SENSOR_SCHEMA)
    got = {
        (r.id, r.temperature)
        for r in keyed.keyed_reduce_max(df, ["id"], "temperature").collect()
    }
    assert got == {("s1", 50.0), ("s2", -1.0)}


def test_average_sensor_readings_replay(spark):
    """AverageSensorReadings.java:67-76: F→C map, keyed 5 s tumbling
    window, average.  86 °F → 30 °C and 50 °F → 10 °C exactly."""
    rows = [
        ("s1", ts(1), 86.0),
        ("s1", ts(2), 86.0),
        ("s1", ts(7), 50.0),  # next window
        ("s2", ts(3), 32.0),  # 0 °C
    ]
    df = core.fahrenheit_to_celsius(spark.createDataFrame(rows, SENSOR_SCHEMA))
    win = (
        df.groupBy(F.window("ts", "5 seconds"), "id")
        .agg(F.round(F.avg("temperature"), 4).alias("avg_temp"))
        .select(
            F.unix_millis("window.start").alias("w"), "id", "avg_temp"
        )
    )
    base = int(T0.timestamp() * 1000)
    got = {(r.w - base, r.id, r.avg_temp) for r in win.collect()}
    assert got == {(0, "s1", 30.0), (5000, "s1", 10.0), (0, "s2", 0.0)}


def test_multi_stream_alert_replay(spark):
    """MultiStreamTransformations.java:83-100 (deterministic as-of form):
    alert iff temperature > 100 AND the latest smoke event at or before
    the reading is HIGH."""
    readings = spark.createDataFrame(
        [
            ("s1", ts(1), 120.0),  # smoke still LOW → no alert
            ("s1", ts(11), 120.0),  # smoke HIGH → alert
            ("s2", ts(12), 99.0),  # temp too low → no alert
            ("s1", ts(21), 150.0),  # smoke back LOW → no alert
        ],
        SENSOR_SCHEMA,
    )
    smoke = spark.createDataFrame(
        [(ts(0), "LOW"), (ts(10), "HIGH"), (ts(20), "LOW")],
        "ts timestamp, level string",
    )
    alerts = joins.smoke_alert(readings, smoke, temp_threshold=100.0)
    got = [(r.message, r.temperature) for r in alerts.collect()]
    assert got == [("Risk of fire! s1", 120.0)]
