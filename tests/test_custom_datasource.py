"""S6 custom/resettable source through the PySpark 4 Python DataSource
V2 seam: deterministic batch read, partition-per-sensor planning,
micro-batch streaming with offset tracking, and the resettable
property — a checkpointed restart resumes from committed offsets
without duplicating or skipping readings."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.sources.custom_datasource import (
    _reading,
    register_sensor_source,
)


def test_batch_read_deterministic_and_partitioned(spark):
    register_sensor_source(spark)
    df = (
        spark.read.format("sensors")
        .option("sensors", 3)
        .option("readings", 20)
        .load()
    )
    assert df.count() == 60
    assert df.rdd.getNumPartitions() == 3  # one per sensor
    rows = {(r.sensor_id, r.reading_n): r.temperature for r in df.collect()}
    assert rows[(1, 5)] == _reading(1, 5)
    again = {
        (r.sensor_id, r.reading_n): r.temperature
        for r in spark.read.format("sensors")
        .option("sensors", 3)
        .option("readings", 20)
        .load()
        .collect()
    }
    assert again == rows  # same values every run


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    register_sensor_source(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once(max_readings):
        q = (
            spark.readStream.format("sensors")
            .option("sensors", 2)
            .option("maxReadings", max_readings)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # first run drains the 10 available readings and commits offset 10;
    # the restart (with 30 now available) must resume AT 10 — emitting
    # only the new range; a third run with nothing new emits nothing
    run_once(10)
    got = spark.read.parquet(out)
    assert got.count() == 2 * 10
    run_once(30)
    run_once(30)  # already drained: committed offsets say nothing new
    got = spark.read.parquet(out)
    assert got.count() == 2 * 30  # no duplicates, no gaps, across restarts
    per = {
        r.sensor_id: r.n
        for r in got.groupBy("sensor_id").agg(F.count("*").alias("n")).collect()
    }
    assert per == {0: 30, 1: 30}
    vals = {(r.sensor_id, r.reading_n): r.temperature for r in got.collect()}
    assert vals[(0, 7)] == _reading(0, 7)
    # streaming values == batch values (same deterministic generator)
    batch = {
        (r.sensor_id, r.reading_n): r.temperature
        for r in spark.read.format("sensors")
        .option("sensors", 2)
        .option("readings", 30)
        .load()
        .collect()
    }
    assert vals == batch
