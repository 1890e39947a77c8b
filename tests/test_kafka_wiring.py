"""Kafka connector wiring (S4/O2) — protocol-level tests, no broker.

The sandbox has no Kafka, so these pin down everything testable short
of the network: option-map construction (topic routing, start modes,
backpressure), red paths for invalid configs, the JSON serde pair the
reference models as (De)SerializationSchema, and that the reader/writer
builders actually request the ``kafka`` format from Spark's source
resolution.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark import streaming as S


def test_source_options_green_paths():
    opts = S.kafka_source_options("b1:9092,b2:9092", subscribe="sensors,alerts")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "sensors,alerts",
        "startingOffsets": "earliest",
    }
    opts = S.kafka_source_options(
        "b:9092",
        assign='{"sensors": [0, 1]}',
        starting_offsets='{"sensors": {"0": 42, "1": -2}}',
        max_offsets_per_trigger=1000,
        fail_on_data_loss=False,
    )
    assert opts["assign"] == '{"sensors": [0, 1]}'
    assert opts["startingOffsets"] == '{"sensors": {"0": 42, "1": -2}}'
    assert opts["maxOffsetsPerTrigger"] == "1000"
    assert opts["failOnDataLoss"] == "false"
    assert S.kafka_source_options("b", subscribe_pattern="sensor-.*")[
        "subscribePattern"
    ] == "sensor-.*"


def test_source_options_red_paths():
    with pytest.raises(ValueError, match="exactly one"):
        S.kafka_source_options("b:9092")  # no topic spec
    with pytest.raises(ValueError, match="exactly one"):
        S.kafka_source_options("b:9092", subscribe="t", assign='{"t":[0]}')
    with pytest.raises(ValueError, match="starting_offsets"):
        S.kafka_source_options("b:9092", subscribe="t", starting_offsets="yesterday")
    with pytest.raises(ValueError, match="starting_offsets"):
        # offsets must be a topic->partition map, not a bare list
        S.kafka_source_options("b:9092", subscribe="t", starting_offsets="[1,2]")
    with pytest.raises(ValueError, match="positive"):
        S.kafka_source_options("b:9092", subscribe="t", max_offsets_per_trigger=0)


def test_json_serde_round_trip(spark):
    """encode → decode recovers the typed columns (the reference's
    SerializationSchema/DeserializationSchema pair) on the Kafka wire
    frame, entirely in-memory."""
    df = spark.createDataFrame(
        [("s1", 10.5, 3), ("s2", -1.25, 7)], "id string, temp double, n long"
    )
    wire = S.encode_kafka_records(df, key_col="id", topic="sensors")
    assert wire.columns == ["key", "value", "topic"]
    assert wire.select("topic").distinct().collect()[0][0] == "sensors"
    back = S.decode_json_value(
        wire.withColumnRenamed("topic", "_t"), "temp double, n long"
    ).withColumnRenamed("key", "id")
    want = df.select(F.col("id"), "temp", "n")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, want.collect()))


def test_per_record_topic_routing(spark):
    df = spark.createDataFrame(
        [("a", 1.0, "hot"), ("b", 2.0, "cold")], "id string, v double, dest string"
    )
    wire = S.encode_kafka_records(
        df, key_col="id", value_cols=["v"], topic_col="dest"
    )
    got = {r.key: r.topic for r in wire.collect()}
    assert got == {"a": "hot", "b": "cold"}
    with pytest.raises(ValueError, match="exactly one of topic"):
        S.encode_kafka_records(df, key_col="id")
    with pytest.raises(ValueError, match="exactly one of topic"):
        S.encode_kafka_records(df, key_col="id", topic="t", topic_col="dest")


def test_sink_requires_some_topic(spark, tmp_path):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="topic"):
        S.kafka_sink(df, "b:9092", str(tmp_path / "ck"))


def test_reader_requests_kafka_format(spark):
    """kafka_stream must reach Spark's data-source resolution asking for
    'kafka': with the connector jar absent the lookup fails NAMING the
    format; with it present a streaming frame with the Kafka wire schema
    comes back.  Either way the wiring is proven."""
    try:
        df = S.kafka_stream(spark, "localhost:9092", "sensors")
    except Exception as exc:  # noqa: BLE001 - py4j error type varies
        assert "kafka" in str(exc).lower()
        assert "DATA_SOURCE_NOT_FOUND" in str(exc) or "Failed to find" in str(exc)
    else:
        assert df.isStreaming
        assert {"key", "value", "topic", "partition", "offset"} <= set(df.columns)
