"""D1-D8 distribution operators: partition-level behavior checks
(these have no value-level oracle — the contract IS the layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.operators import distribution as D
from stream_processing_with_flink_study_spark.sources import load_table

from .conftest import SF_SMALL


def n_parts(df) -> int:
    return df.rdd.getNumPartitions()


def test_shuffle_and_rescale_partition_counts(spark):
    events = load_table(spark, SF_SMALL, "events")
    assert n_parts(D.shuffle(events, 16)) == 16
    assert n_parts(D.rescale(D.shuffle(events, 16), 4)) == 4
    assert n_parts(D.to_single_task(events)) == 1


def test_partition_by_key_colocates(spark):
    """All rows of one key land in one partition (hash partitioning) —
    the keyBy contract (D6 / K1)."""
    events = load_table(spark, SF_SMALL, "events").select("user_id", "value")
    parted = D.partition_by_key(events, "user_id", n=8)
    spread = (
        parted.withColumn("pid", F.spark_partition_id())
        .groupBy("user_id")
        .agg(F.countDistinct("pid").alias("n_pids"))
        .agg(F.max("n_pids").alias("m"))
        .first()
        .m
    )
    assert spread == 1


def test_partition_by_range_orders_partitions(spark):
    """Range partitioning: partition ids are monotone in the key — the
    layout that enables partition-pruned range scans."""
    events = load_table(spark, SF_SMALL, "events").select("user_id")
    parted = D.partition_by_range(events, "user_id", n=4)
    rows = (
        parted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo


def test_broadcast_hint_plans_broadcast_join(spark):
    events = load_table(spark, SF_SMALL, "events")
    dim = load_table(spark, SF_SMALL, "customer").limit(50)
    joined = events.join(
        D.broadcast_hint(dim), events.user_id == dim.c_custkey
    )
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()
