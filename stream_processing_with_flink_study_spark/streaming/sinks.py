"""Streaming sinks (SURVEY.md §2.8 O1-O8).

Built-ins cover O1-O3 (console / kafka / file — Spark's file sink
already stage-then-commits a manifest per micro-batch, subsuming the
reference's WAL sink O7 and two-phase part-file commit O3,
``정리/6주차.md:122-147, 287-332``).  This module adds the two patterns
that need engine code:

- :class:`IdempotentKeyedUpsert` — O6 exactly-once-by-rerun: a
  ``foreachBatch`` MERGE keyed on (deterministic key, batchId), readable
  merge-on-read.  Reprocessing a batch overwrites the same files.
- :func:`two_phase_commit_writer` — O8 (``정리/6주차.md:334-401``):
  write to a staging dir at pre-commit, atomic-rename to the final dir
  at commit, mirroring the reference's TwoPhaseCommitSinkFunction file
  sink (its commit is the same rename, ``정리/6주차.md:380-387``).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def console_sink(sdf: DataFrame, output_mode: str = "append", **options):
    """O1 print() (``BasicTransformations.java:81``)."""
    return sdf.writeStream.format("console").outputMode(output_mode).options(**options)


def parquet_sink(
    sdf: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
):
    """O3 streaming file sink: exactly-once via per-batch manifest commit;
    ``maxRecordsPerFile`` ≈ the reference's 128 MB/60 s rolling policy
    (``정리/6주차.md:143-144``)."""
    w = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    return w


def encode_kafka_records(
    df: DataFrame,
    key_col: str,
    value_cols: list[str] | None = None,
    topic: str | None = None,
    topic_col: str | None = None,
) -> DataFrame:
    """Kafka-record JSON serialization (≈ Flink's
    ``SerializationSchema``, ``정리/6주차.md:62-68``): project typed
    columns into the Kafka wire frame ``(key, value[, topic])``.

    Per-record topic routing (the reference's ``KafkaSerializationSchema``
    target-topic override) comes from ``topic_col``; a constant
    ``topic`` emits a literal column instead — the sink-level option is
    then unnecessary.  Pure projection: unit-testable on a batch frame,
    and round-trips through :func:`..sources.decode_json_value`."""
    if (topic is None) == (topic_col is None):
        raise ValueError("exactly one of topic/topic_col required")
    vals = value_cols or [c for c in df.columns if c not in (key_col, topic_col)]
    t = F.col(topic_col) if topic_col else F.lit(topic)
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*vals)).alias("value"),
        t.cast("string").alias("topic"),
    )


def kafka_sink(
    sdf: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    topic: str | None = None,
):
    """O2 Kafka producer sink (at-least-once; ``정리/6주차.md:56-93``).
    Expects ``key``/``value`` string or binary columns (see
    :func:`encode_kafka_records`); ``topic=None`` routes per record via
    the frame's ``topic`` column, which must then exist."""
    if topic is None and "topic" not in sdf.columns:
        raise ValueError("no sink-level topic and no 'topic' column to route by")
    w = (
        sdf.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )
    if topic is not None:
        w = w.option("topic", topic)
    return w


class IdempotentKeyedUpsert:
    """O6 idempotent keyed upsert over a parquet directory.

    ``writer`` appends each micro-batch under ``batch=<id>`` using an
    overwrite of that batch's own directory — re-running a failed batch
    replaces its previous partial output (deterministic key + overwrite
    target = the reference's idempotency conditions,
    ``정리/6주차.md:276-279``).  ``read`` resolves upserts
    merge-on-read: latest (batch, event-time) wins per key — an O(1)
    window rank, no driver-side merge loop, so reads scale with
    executors not with history length.
    """

    def __init__(self, path: str, key_cols: list[str], ts_col: str):
        self.path = path
        self.key_cols = key_cols
        self.ts_col = ts_col

    def writer(self) -> Callable[[DataFrame, int], None]:
        def write(batch_df: DataFrame, batch_id: int) -> None:
            (
                batch_df.write.mode("overwrite").parquet(
                    os.path.join(self.path, f"batch={batch_id}")
                )
            )

        return write

    def read(self, spark: SparkSession) -> DataFrame:
        df = spark.read.option("basePath", self.path).parquet(
            os.path.join(self.path, "batch=*")
        )
        rank = F.row_number().over(
            Window.partitionBy(*self.key_cols).orderBy(
                F.col("batch").desc(), F.col(self.ts_col).desc()
            )
        )
        return df.withColumn("_rn", rank).filter("_rn = 1").drop("_rn", "batch")


def two_phase_commit_writer(
    final_dir: str, staging_dir: str
) -> Callable[[DataFrame, int], None]:
    """O8 transactional file sink: stage the micro-batch's files under
    ``staging_dir/batch-<id>`` (pre-commit), then atomically rename into
    ``final_dir`` (commit).  A batch re-run after a crash between the
    two steps finds the final dir present and skips — readers only ever
    see fully committed batches."""
    os.makedirs(final_dir, exist_ok=True)
    os.makedirs(staging_dir, exist_ok=True)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(final_dir, f"batch-{batch_id}")
        if os.path.exists(final):  # already committed: idempotent skip
            # ...but still materialize EVERY partition: stateful
            # operators upstream commit their state stores only when
            # the replayed batch is fully processed — an early return
            # trips Spark 4's STATE_STORE_COMMIT_VALIDATION ("expected
            # N commits but got 0") and fails the recovery the skip
            # exists for (caught by tests/test_chaos_restart.py)
            batch_df.write.format("noop").mode("overwrite").save()
            return
        stage = os.path.join(staging_dir, f"batch-{batch_id}")
        if os.path.exists(stage):  # crashed pre-commit: retry cleanly
            shutil.rmtree(stage)
        batch_df.write.mode("overwrite").parquet(stage)
        os.rename(stage, final)  # the commit (atomic on one filesystem)

    return write


def foreach_batch_sink(
    sdf: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """O5/O6/O8 carrier: ``foreachBatch`` with checkpointed batch ids —
    the engine's SinkFunction.invoke() surface (``정리/6주차.md:245-274``);
    exactly-once end-to-end when ``fn`` is idempotent or transactional."""
    return (
        sdf.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
    )


# --------------------------------------------------------------------------
# O2 exactly-once Kafka producer (Flink Semantic.EXACTLY_ONCE mapping)
# --------------------------------------------------------------------------
KAFKA_SEMANTICS = ("NONE", "AT_LEAST_ONCE", "EXACTLY_ONCE")


def kafka_exactly_once_writer(
    bootstrap_servers: str,
    topic: str,
    ledger_dir: str,
    key_col: str = "key",
    produce: Callable[[DataFrame, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Exactly-once-to-Kafka ``foreachBatch`` producer — the Spark
    mapping of the reference's transactional FlinkKafkaProducer
    (``정리/6주차.md:77-93``; its txn-timeout discussion at :84 is why
    Flink needs broker-side transactions at all: un-checkpointed
    produces must be invisible until commit).

    Spark's kafka sink has no broker transaction API, so the same
    guarantee is assembled from the two idempotency halves Spark DOES
    control, mirroring :func:`two_phase_commit_writer`:

    1. **Commit ledger** (skip-on-replay): a ``batch-<id>.committed``
       marker is written only AFTER the produce flush returns.  A
       restarted query re-offers the same deterministic batch id; a
       marker hit skips the produce entirely — the common replay path
       emits ZERO duplicate records.
    2. **Transactional keys** (dedup-on-read): every record's Kafka key
       is prefixed with the batch id, so a crash in the unprotected
       window (produce flushed, marker not yet written) re-emits
       byte-identical keys.  :func:`read_committed` — or topic
       compaction, its broker-side equivalent — collapses them, which
       is exactly the contract Kafka's read-committed isolation gives
       consumers of transactional producers.

    ``produce`` is injectable so the crash-replay contract is testable
    without a broker (tests/test_kafka_wiring.py); the default is the
    batch kafka-format write.  Expects the wire frame of
    :func:`encode_kafka_records` (string ``key``/``value``)."""

    os.makedirs(ledger_dir, exist_ok=True)

    def default_produce(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .save()
        )

    do_produce = produce or default_produce

    def write(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_dir, f"batch-{batch_id}.committed")
        if os.path.exists(marker):
            return  # replay of a committed batch: no duplicate produce
        stamped = batch_df.withColumn(
            key_col,
            F.concat_ws(":", F.lit(str(batch_id)), F.col(key_col)),
        )
        do_produce(stamped, batch_id)
        with open(marker, "w") as fh:  # the commit point
            fh.write("")

    return write


def read_committed(records: DataFrame, key_col: str = "key") -> DataFrame:
    """Consumer-side half of :func:`kafka_exactly_once_writer`: collapse
    residual transport duplicates by transactional key.  Replayed
    records are byte-identical (same batch-id-prefixed key, same
    value), so any one representative is THE record — one shuffle on
    the key, no window needed."""
    return records.dropDuplicates([key_col])


def kafka_sink_semantic(
    sdf: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    topic: str,
    semantic: str = "AT_LEAST_ONCE",
):
    """O2 producer with the reference's delivery-semantic option map
    (FlinkKafkaProducer.Semantic, ``정리/6주차.md:69-93``):

    - ``NONE`` / ``AT_LEAST_ONCE`` — Spark's kafka sink; offsets commit
      after the produce, so replays may duplicate (Flink's NONE is
      weaker on paper; Spark cannot be weaker than at-least-once here,
      which is documented rather than simulated).
    - ``EXACTLY_ONCE`` — ``foreachBatch`` +
      :func:`kafka_exactly_once_writer`, ledger under
      ``<checkpoint_dir>/_txn_commits``.

    Unknown semantics raise (red path tested)."""
    if semantic not in KAFKA_SEMANTICS:
        raise ValueError(
            f"unknown semantic {semantic!r}; expected one of {KAFKA_SEMANTICS}"
        )
    if semantic in ("NONE", "AT_LEAST_ONCE"):
        return kafka_sink(sdf, bootstrap_servers, checkpoint_dir, topic=topic)
    writer = kafka_exactly_once_writer(
        bootstrap_servers,
        topic,
        ledger_dir=os.path.join(checkpoint_dir, "_txn_commits"),
    )
    return foreach_batch_sink(sdf, writer, checkpoint_dir)


class QueryableState:
    """P9 queryable state (``정리/5주차.md:170-186``): read-only lookups
    over a keyed-state snapshot table.

    Flink's queryable state exposes a keyed operator's live state to an
    external KV client.  The Spark-idiomatic mapping (SURVEY §2.6 P9)
    is a SNAPSHOT TABLE: the query's ``foreachBatch`` upserts keyed
    state per micro-batch (:class:`IdempotentKeyedUpsert` — replay-safe
    by construction), and this class is the read endpoint a serving
    layer would wrap: point ``get``, full ``snapshot``, both stamped
    with a freshness watermark so callers can reason about staleness —
    the contract Flink's client gives up anyway (its reads are equally
    best-effort against a moving checkpoint).

    Freshness columns on every returned row:

    - ``state_updated_at`` — the key's own last-update event time
      (per-key staleness);
    - ``fresh_as_of`` — the max event time across the WHOLE snapshot
      (global watermark proxy: no key can be fresher than this, and a
      key older than it is genuinely stale, not just unwritten).

    Reads are plain partition-pruned parquet scans through any
    ``SparkSession`` — including one in a different process from the
    writing query, which is the queryable-state deployment shape."""

    def __init__(self, path: str, key_cols: list[str], ts_col: str):
        self.path = path
        self.key_cols = key_cols
        self.ts_col = ts_col
        self._upsert = IdempotentKeyedUpsert(path, key_cols, ts_col)

    def writer(self) -> Callable[[DataFrame, int], None]:
        """The state-publishing half — hand to ``foreachBatch``."""
        return self._upsert.writer()

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """Latest state per key, with both freshness columns."""
        latest = self._upsert.read(spark)
        fresh = latest.agg(F.max(self.ts_col).alias("fresh_as_of"))
        return latest.withColumn(
            "state_updated_at", F.col(self.ts_col)
        ).crossJoin(F.broadcast(fresh))

    def get(self, spark: SparkSession, **key: object) -> DataFrame:
        """Point lookup: rows for one key (empty frame if absent).
        Key-column predicates reach the scan as pushed filters."""
        unknown = set(key) - set(self.key_cols)
        if unknown:
            raise ValueError(f"not key columns: {sorted(unknown)}")
        df = self.snapshot(spark)
        for k, v in key.items():
            df = df.filter(F.col(k) == F.lit(v))
        return df


# --------------------------------------------------------------------------
# O4 connector upsert sink (JDBC — the Cassandra-sink mapping)
# --------------------------------------------------------------------------
def jdbc_upsert_writer(
    url: str,
    table: str,
    key_cols: list[str],
    staging_table: str | None = None,
    properties: dict[str, str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """O4 keyed connector sink — the reference's Cassandra upsert
    (``정리/6주차.md:149-167``: Cassandra INSERT is last-write-wins per
    primary key, which is exactly why the reference calls it naturally
    idempotent).  Spark's JDBC writer has no upsert mode, so the
    scalable shape is STAGE + SET-BASED SWAP:

    1. the micro-batch lands in ``staging_table`` through Spark's
       parallel JDBC writer (one connection per partition — executors
       write, the driver never sees rows);
    2. the driver runs one transaction of two set-based statements —
       ``DELETE FROM target WHERE keys IN (SELECT keys FROM staging)``
       then ``INSERT INTO target SELECT * FROM staging`` — keyed
       last-write-wins with per-statement cost on the DATABASE side,
       no per-row round-trips.

    Replaying a batch re-stages the same rows and converges to the same
    target state (delete-then-insert is idempotent), so a foreachBatch
    retry cannot duplicate — the same guarantee class as
    :class:`IdempotentKeyedUpsert`, delegated to the store's own
    atomicity the way the Cassandra sink delegates to LWW.

    The target table is created on first batch (``AS SELECT ... WITH NO
    DATA``).  Works against any JDBC database; the test rides Derby
    embedded (bundled with Spark) for a broker-free live round-trip.
    Multi-column keys pair up positionally in the correlated delete."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    stage = staging_table or f"{table}_STAGING"
    props = properties or {}

    def _connect(spark: SparkSession):
        jvm = spark._jvm  # noqa: SLF001 - py4j bridge is the JDBC client here
        p = jvm.java.util.Properties()
        for k, v in props.items():
            p.setProperty(k, v)
        return jvm.java.sql.DriverManager.getConnection(url, p)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        (
            batch_df.write.mode("overwrite")
            .options(**props)
            .jdbc(url, stage)
        )
        # correlate on the unaliased target name — Derby (among others)
        # rejects DELETE-with-alias syntax.  Key columns are DOUBLE-
        # QUOTED: Spark's JDBC writer creates case-sensitive quoted
        # identifiers, so an unquoted reference would fold to uppercase
        # and miss them.
        match = " AND ".join(
            f's."{k}" = {table}."{k}"' for k in key_cols
        )
        conn = _connect(spark)
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            meta = conn.getMetaData()
            rs = meta.getTables(None, None, table.upper(), None)
            exists = rs.next()
            rs.close()
            if not exists:
                st.executeUpdate(
                    f"CREATE TABLE {table} AS SELECT * FROM {stage} "
                    "WITH NO DATA"
                )
            st.executeUpdate(
                f"DELETE FROM {table} WHERE EXISTS "
                f"(SELECT 1 FROM {stage} s WHERE {match})"
            )
            st.executeUpdate(f"INSERT INTO {table} SELECT * FROM {stage}")
            conn.commit()
            st.close()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    return write
