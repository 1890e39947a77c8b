"""State-store introspection — Spark 4's ``statestore`` /
``state-metadata`` batch data sources over a Structured Streaming
checkpoint (the operational surface Flink exposes via queryable state
and the state processor API; reference scope: keyed state chapters,
``정리/5주차.md``).

Unlike :class:`QueryableState`'s snapshot-table pattern (which the
JOB must cooperatively maintain), these readers open the checkpoint's
actual state files AFTER (or while) the job runs — the debugging /
auditing / migration path: "what does operator 0's keyed state hold
right now, per partition, per batch?".

Scale notes: the readers are plain batch scans of the state backend's
files (HDFS-backed or RocksDB SST) — partition-parallel, no driver
materialization; filters on ``partition_id`` prune files.  Options
``batchId`` / ``operatorId`` / ``storeName`` / ``joinSide`` select
stores of multi-stateful pipelines (stream-stream joins keep four).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator/store inventory of a checkpoint: operator ids + names,
    state store names, partition counts, and the min/max batch ids
    whose state survives — the map you consult before `read_state`."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
    join_side: str | None = None,
) -> DataFrame:
    """Keyed state of one operator as (key struct, value struct,
    partition_id) rows — the committed accumulator contents, not a
    sample: for a streaming aggregation this IS the running aggregate
    per group, which makes full-value oracles possible
    (``plans.queries_stateful.statestore_inspect``)."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    if join_side is not None:
        r = r.option("joinSide", join_side)
    return r.load(checkpoint)
