"""O4 connector upsert sink — LIVE against embedded Derby (bundled in
Spark's jars, so unlike the Kafka integration tests this round-trip
needs no external service and always runs)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark import streaming as S


def _url() -> str:
    return f"jdbc:derby:memory:db{uuid.uuid4().hex[:10]};create=true"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double, ts bigint")


def test_jdbc_upsert_last_write_wins_and_replay_idempotent(spark):
    url = _url()
    w = S.jdbc_upsert_writer(url, "TARGET", ["k"])
    w(_mk(spark, [(1, 10.0, 1), (2, 20.0, 1)]), 0)
    w(_mk(spark, [(1, 11.0, 2), (3, 30.0, 2)]), 1)
    got = {r.k: r.v for r in spark.read.jdbc(url, "TARGET").collect()}
    assert got == {1: 11.0, 2: 20.0, 3: 30.0}  # key 1 upserted
    # foreachBatch retry of the same batch: delete-then-insert converges
    w(_mk(spark, [(1, 11.0, 2), (3, 30.0, 2)]), 1)
    back = spark.read.jdbc(url, "TARGET")
    assert back.count() == 3
    assert {r.k: r.v for r in back.collect()} == got


def test_jdbc_upsert_multi_column_key(spark):
    url = _url()
    w = S.jdbc_upsert_writer(url, "T2", ["k", "ts"])
    w(_mk(spark, [(1, 1.0, 100), (1, 2.0, 200)]), 0)
    w(_mk(spark, [(1, 9.0, 100)]), 1)  # only the (1,100) cell moves
    got = {(r.k, r.ts): r.v for r in spark.read.jdbc(url, "T2").collect()}
    assert got == {(1, 100): 9.0, (1, 200): 2.0}


def test_jdbc_upsert_rejects_empty_key(spark):
    with pytest.raises(ValueError, match="non-empty"):
        S.jdbc_upsert_writer("jdbc:derby:memory:x", "T", [])


def test_jdbc_upsert_streaming_carrier(spark, tmp_path):
    """End-to-end through foreachBatch: a two-batch replay stream lands
    in Derby with last-write-wins per key."""
    url = _url()
    schema = "k bigint, v double, ts bigint"
    batches = [
        _mk(spark, [(1, 1.0, 1), (2, 2.0, 1)]),
        _mk(spark, [(2, 22.0, 2)]),
    ]
    src = S.memory_batches_stream(
        spark, batches, str(tmp_path / "src"), schema=schema
    )
    q = (
        S.foreach_batch_sink(
            src.select(F.col("k"), F.col("v"), F.col("ts")),
            S.jdbc_upsert_writer(url, "T3", ["k"]),
            str(tmp_path / "ck"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.k: r.v for r in spark.read.jdbc(url, "T3").collect()}
    assert got == {1: 1.0, 2: 22.0}
