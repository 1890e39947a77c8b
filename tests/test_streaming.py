"""Streaming–batch equivalence (SURVEY.md §5.3) + sink-pattern tests.

Each streaming twin replayed with ``Trigger.AvailableNow`` over the
events table (split into two micro-batches so state genuinely crosses a
batch boundary) must equal its oracle-checked batch query.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark import streaming as S
from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.sources import load_table

from .conftest import SF_SMALL


def _sorted_pdf(df) -> pd.DataFrame:
    p = df.toPandas() if not isinstance(df, pd.DataFrame) else df
    p = p[sorted(p.columns)]
    return p.sort_values(list(p.columns), ignore_index=True)


def assert_df_equal(a, b) -> None:
    pd.testing.assert_frame_equal(
        _sorted_pdf(a), _sorted_pdf(b), check_dtype=False, check_exact=False, rtol=1e-9
    )


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_SMALL, "events").cache()


@pytest.fixture()
def two_batch_stream(spark, events, tmp_path):
    """events split at the median ts into two replayed micro-batches."""
    mid = events.selectExpr("percentile_approx(ts, 0.5) AS m").first().m
    b0 = events.filter(F.col("ts") <= F.lit(mid))
    b1 = events.filter(F.col("ts") > F.lit(mid))
    return S.memory_batches_stream(
        spark, [b0, b1], str(tmp_path / "src"), files_per_trigger=1
    )


def test_windowed_avg_equivalence(spark, events, two_batch_stream, tmp_path):
    sdf = S.windowed_avg_stream(
        two_batch_stream, ts="ts", key="user_id", value="value",
        size="1 hour", watermark="1 minute",
    )
    got = S.run_available_now(sdf, str(tmp_path / "ck"), "complete")
    want = (
        events.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis("window.start").alias("w_start"),
            F.unix_millis("window.end").alias("w_end"),
            "user_id",
            F.round("avg_value", 4).alias("avg_value"),
            "n",
        )
    )
    assert_df_equal(got, want)


def test_basic_pipeline_stateless_append(spark, events, two_batch_stream, tmp_path):
    readings = two_batch_stream.select(
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("id"),
        "ts",
        F.col("value").alias("temperature"),
    )
    got = S.run_available_now(
        S.basic_pipeline_stream(readings), str(tmp_path / "ck"), "append"
    )
    want = S.basic_pipeline_stream(
        events.select(
            F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("id"),
            "ts",
            F.col("value").alias("temperature"),
        )
    )
    assert_df_equal(got, want)


def test_temp_delta_alerts_equivalence(spark, events, two_batch_stream, tmp_path):
    keyed = two_batch_stream.withColumn("id", F.col("user_id").cast("string"))
    got = S.run_available_now(
        S.temp_delta_alerts(
            keyed, key="id", ts="ts", value="value", threshold=50.0,
            order_by=["ts", "event_id"],
        ),
        str(tmp_path / "ck"),
        "append",
    )
    want = QUERIES["temp_delta_alert"](spark, SF_SMALL).select(
        F.col("user_id").cast("string").alias("id"),
        "ts_ms",
        "value",
        F.col("diff").alias("delta"),
    )
    assert_df_equal(got, want)


def test_dedup_first_equivalence(spark, events, two_batch_stream, tmp_path):
    keyed = two_batch_stream.select(
        F.col("user_id").cast("string").alias("user_id"), "event_type", "ts"
    )
    got = S.run_available_now(
        S.dedup_first(keyed, ["user_id", "event_type"], ts="ts"),
        str(tmp_path / "ck"),
        "append",
    )
    want = QUERIES["dedup_first_event"](spark, SF_SMALL).select(
        F.col("user_id").cast("string").alias("user_id"),
        "event_type",
        "first_ts_ms",
    )
    assert_df_equal(got, want)


def test_count_window_sum_complete_buckets(spark, events, two_batch_stream, tmp_path):
    keyed = two_batch_stream.withColumn("id", F.col("user_id").cast("string"))
    got = S.run_available_now(
        S.count_window_sum(keyed, key="id", ts="ts", value="value", n=10),
        str(tmp_path / "ck"),
        "append",
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    want = (
        events.withColumn("rn", F.row_number().over(w) - 1)
        .withColumn("window_idx", (F.col("rn") / 10).cast("long"))
        .groupBy(F.col("user_id").cast("string").alias("id"), "window_idx")
        .agg(F.round(F.sum("value"), 4).alias("win_sum"), F.count(F.lit(1)).alias("win_n"))
        .filter(F.col("win_n") == 10)
    )
    # ties on ts within a key may order differently between the streaming
    # handler and row_number — compare bucket counts and totals per key
    g, wnt = _sorted_pdf(got), _sorted_pdf(want)
    assert list(g["id"]) == list(wnt["id"])
    assert list(g["window_idx"]) == list(wnt["window_idx"])
    assert g["win_sum"].sum() == pytest.approx(wnt["win_sum"].sum(), rel=1e-9)


def test_keyed_rolling_reduce_final_state(spark, events, two_batch_stream, tmp_path):
    keyed = two_batch_stream.withColumn("id", F.col("user_id").cast("string"))
    got = S.run_available_now(
        S.keyed_rolling_reduce(keyed, key="id", ts="ts", value="value"),
        str(tmp_path / "ck"),
        "update",
    )
    # update mode re-emits on change: the max emission per key = final state
    final = got.groupBy("id").agg(F.max("max_value").alias("max_value"))
    want = events.groupBy(F.col("user_id").cast("string").alias("id")).agg(
        F.max("value").alias("max_value")
    )
    assert_df_equal(final, want)


def test_watermark_drops_late_rows(spark, tmp_path):
    """W7/W8: a row arriving below the watermark must not change its
    (already finalized) window — ``정리/1주차.md:174-192`` semantics."""
    from datetime import datetime, timezone

    t = lambda h, m, s: datetime(2024, 1, 1, h, m, s, tzinfo=timezone.utc)
    mk = lambda rows: spark.createDataFrame(rows, "id string, ts timestamp, v double")
    b0 = mk([("a", t(0, 0, 1), 1.0), ("a", t(1, 0, 0), 2.0)])
    b1 = mk([("a", t(1, 0, 1), 3.0)])  # advances the filter's watermark
    late = mk([("a", t(0, 0, 2), 100.0)])  # < watermark once b1 commits
    # NB: the input-side late filter uses the PREVIOUS batch's watermark
    # (one batch behind state eviction), hence the b1 spacer batch
    sdf = S.memory_batches_stream(spark, [b0, b1, late], str(tmp_path / "src"))
    agg = (
        sdf.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "5 seconds"), "id")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis("window.start").alias("w"), "id", "s", "n")
    )
    got = S.run_available_now(agg, str(tmp_path / "ck"), "append").toPandas()
    first = got[got.w == 1704067200000]
    assert len(first) == 1 and first.iloc[0].n == 1 and first.iloc[0].s == 1.0


def test_checkpoint_restart_resumes_offsets(spark, tmp_path):
    """Savepoint-restore analogue (SURVEY §7.2 step 8,
    ``정리/2주차.md:185-194``): a SECOND query started from the same
    checkpoint processes only files that arrived after the first run —
    committed offsets survive the restart and nothing replays (the
    parquet sink's manifest keeps the output exactly-once)."""
    src, ck, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")

    def write_batch(df, i):
        d = f"{src}/b{i:05d}"
        df.coalesce(1).write.mode("append").parquet(d)
        for root, _, files in os.walk(d):
            for f_ in files:
                os.utime(
                    os.path.join(root, f_),
                    (1_600_000_000 + i, 1_600_000_000 + i),
                )

    b0 = mk([("a", 1), ("b", 2)])
    write_batch(b0, 0)

    def run_once():
        q = (
            S.file_stream(spark, f"{src}/b*", schema=b0.schema)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {(r.k, r.v) for r in spark.read.parquet(out).collect()}

    assert run_once() == {("a", 1), ("b", 2)}
    write_batch(mk([("c", 3)]), 1)
    # same checkpoint, new query: only b1 is new; b0 must not duplicate
    assert run_once() == {("a", 1), ("b", 2), ("c", 3)}


def test_dedup_within_watermark_first_wins(spark, tmp_path):
    """Streaming exact dedup: duplicates of a key arriving later — in
    the same or a later micro-batch, within the watermark delay — are
    dropped, and the FIRST row's payload survives."""
    from datetime import datetime, timezone

    t = lambda s: datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)
    mk = lambda rows: spark.createDataFrame(rows, "k string, ts timestamp, v double")
    b0 = mk([("a", t(1), 1.0), ("a", t(2), 99.0), ("b", t(1), 2.0)])
    b1 = mk([("a", t(3), 98.0), ("b", t(4), 97.0), ("c", t(5), 3.0)])
    sdf = S.memory_batches_stream(
        spark, [b0, b1], str(tmp_path / "src"), files_per_trigger=1
    )
    out = S.run_available_now(
        S.dedup_within_watermark_stream(sdf, ["k"], ts="ts", delay="1 hour"),
        str(tmp_path / "ck"),
        "append",
    ).toPandas()
    got = {(r.k, r.v) for r in out.itertuples()}
    assert got == {("a", 1.0), ("b", 2.0), ("c", 3.0)}


def test_two_phase_commit_sink(spark, tmp_path):
    final, staging = str(tmp_path / "final"), str(tmp_path / "stage")
    mk = lambda rows: spark.createDataFrame(rows, "k string, v long")
    b0, b1 = mk([("a", 1), ("b", 2)]), mk([("a", 3)])
    sdf = S.memory_batches_stream(spark, [b0, b1], str(tmp_path / "src"))
    writer = S.two_phase_commit_writer(final, staging)
    q = S.foreach_batch_sink(sdf, writer, str(tmp_path / "ck")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination()
    committed = sorted(os.listdir(final))
    assert committed == ["batch-0", "batch-1"]
    assert os.listdir(staging) == []  # nothing left pre-commit
    total = spark.read.parquet(f"{final}/batch-*")
    assert total.count() == 3
    # idempotent re-run of an already-committed batch: no-op
    writer(b1, 1)
    assert spark.read.parquet(f"{final}/batch-*").count() == 3


def test_idempotent_keyed_upsert(spark, tmp_path):
    sink = S.IdempotentKeyedUpsert(str(tmp_path / "up"), ["k"], "ts")
    mk = lambda rows: spark.createDataFrame(rows, "k string, ts long, v double")
    w = sink.writer()
    w(mk([("a", 1, 10.0), ("b", 1, 20.0)]), 0)
    w(mk([("a", 2, 11.0)]), 1)
    got = {r.k: r.v for r in sink.read(spark).collect()}
    assert got == {"a": 11.0, "b": 20.0}
    w(mk([("a", 2, 11.0)]), 1)  # re-run same batch: unchanged
    assert {r.k: r.v for r in sink.read(spark).collect()} == got


def test_generator_streams_build(spark):
    from stream_processing_with_flink_study_spark.sources import (
        sensor_readings_stream,
        smoke_level_stream,
    )

    sensors = sensor_readings_stream(spark)
    smoke = smoke_level_stream(spark)
    assert sensors.isStreaming and smoke.isStreaming
    assert [f.name for f in sensors.schema.fields] == ["id", "ts", "temperature"]
    assert [f.name for f in smoke.schema.fields] == ["ts", "level"]


def test_interval_join_stream_equivalence(spark, events, tmp_path):
    """M5 streaming: purchases joined to errors within [-5m, +5m] per
    user — final emitted matches equal the batch band join."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    sp = S.memory_batches_stream(spark, [purchases], str(tmp_path / "p"))
    se = S.memory_batches_stream(spark, [errors], str(tmp_path / "e"))
    joined = S.interval_join_stream(
        sp, se, "user_id", "p_ts", "e_ts", "-5 minutes", "5 minutes",
        watermark="1 minute", key_right="e_user",
    ).select("user_id", "p_ts", "e_ts", "p_value")
    got = S.run_available_now(joined, str(tmp_path / "ck"), "append")
    want = purchases.join(
        errors,
        (purchases.user_id == errors.e_user)
        & (errors.e_ts >= purchases.p_ts - F.expr("INTERVAL 5 minutes"))
        & (errors.e_ts <= purchases.p_ts + F.expr("INTERVAL 5 minutes")),
    ).select("user_id", "p_ts", "e_ts", "p_value")
    assert_df_equal(got, want)


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# transformWithStateInPandas spawns a Python driver worker that needs
# google.protobuf (state-server protocol); absent in this container.
# The applyInPandasWithState operators above cover the same semantics.
tws = pytest.mark.skipif(
    not _has_protobuf(), reason="transformWithState needs google.protobuf"
)


@pytest.fixture()
def rocksdb(spark):
    """transformWithStateInPandas needs the RocksDB state store; restore
    the default provider afterwards so other tests keep HDFS-backed."""
    from stream_processing_with_flink_study_spark.streaming.process import (
        ROCKSDB_PROVIDER,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


@tws
def test_transform_with_state_running_max(spark, events, two_batch_stream, tmp_path, rocksdb):
    keyed = two_batch_stream.select(
        F.col("user_id").cast("string").alias("id"), "ts", "value"
    )
    got = S.run_available_now(
        S.running_max(keyed, "id", "value"), str(tmp_path / "ck"), "update"
    )
    final = got.groupBy("key").agg(F.max("max_value").alias("max_value"))
    want = events.groupBy(F.col("user_id").cast("string").alias("key")).agg(
        F.max("value").alias("max_value")
    )
    assert_df_equal(final, want)


@tws
def test_transform_with_state_count_window(spark, events, two_batch_stream, tmp_path, rocksdb):
    keyed = two_batch_stream.select(
        F.col("user_id").cast("string").alias("id"), "ts", "value"
    )
    got = S.run_available_now(
        S.count_window_sum_tws(keyed, "id", "ts", "value", n=10),
        str(tmp_path / "ck"),
        "append",
    )
    # bucket totals per key must match the applyInPandasWithState form's
    # invariants: every bucket full, per-key totals = sum of first
    # 10*floor(n/10) values by (ts) order
    agg = got.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_buckets"), F.sum("win_n").alias("rows_covered")
    )
    per_key = {r.key: (r.n_buckets, r.rows_covered) for r in agg.collect()}
    counts = {
        str(r.user_id): r.c
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for k, c in counts.items():
        expect_buckets = c // 10
        if expect_buckets:
            assert per_key[k] == (expect_buckets, expect_buckets * 10)
        else:
            assert k not in per_key


def test_session_window_stream_equivalence(spark, events, two_batch_stream, tmp_path):
    """W4 streaming session windows (complete mode) equal the batch
    session_window aggregation on the same data."""
    sdf = S.session_window_stream(
        two_batch_stream, gap="30 minutes", watermark="1 minute"
    )
    got = S.run_available_now(sdf, str(tmp_path / "ck"), "complete")
    want = (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_millis("session_window.start").alias("w_start"),
            F.unix_millis("session_window.end").alias("w_end"),
            "user_id",
            "n",
            "sum_value",
        )
    )
    assert_df_equal(got, want)


def test_funnel_matches_equivalence(spark, events, two_batch_stream, tmp_path):
    """Streaming funnel (O(1) state per key) must equal the batch
    chained-window query, including same-instant stage cascades."""
    got = S.run_available_now(
        S.funnel_matches(two_batch_stream),
        str(tmp_path / "ck"),
        "append",
    )
    want = QUERIES["funnel_conversions"](spark, SF_SMALL)
    assert want.count() > 0, "fixture should contain at least one funnel"
    assert_df_equal(got, want)


def test_interval_join_stream_left_outer_emits_nulls(spark, events, tmp_path):
    """Left-outer stream-stream join: unmatched purchases must surface
    with null error columns ONCE the watermark passes their match
    window (Spark can only emit the null after proving no future match)
    — driven by a far-future spacer batch on both inputs."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    far = F.expr("INTERVAL 30 DAYS")
    spacer_p = purchases.limit(1).select(
        F.lit(-1).alias("user_id"), (F.col("p_ts") + far).alias("p_ts"),
        F.lit(0.0).alias("p_value"),
    )
    spacer_e = errors.limit(1).select(
        F.lit(-1).alias("e_user"), (F.col("e_ts") + far).alias("e_ts")
    )
    sp = S.memory_batches_stream(spark, [purchases, spacer_p], str(tmp_path / "p"))
    se = S.memory_batches_stream(spark, [errors, spacer_e], str(tmp_path / "e"))
    joined = S.interval_join_stream(
        sp, se, "user_id", "p_ts", "e_ts", "-5 minutes", "5 minutes",
        watermark="1 minute", key_right="e_user", how="left_outer",
    ).select("user_id", "p_ts", "e_ts", "p_value")
    got = S.run_available_now(joined, str(tmp_path / "ck"), "append")
    # spacer rows are still in join state at stream end — exclude them
    got = got.filter(F.col("user_id") >= 0)
    want = purchases.join(
        errors,
        (purchases.user_id == errors.e_user)
        & (errors.e_ts >= purchases.p_ts - F.expr("INTERVAL 5 minutes"))
        & (errors.e_ts <= purchases.p_ts + F.expr("INTERVAL 5 minutes")),
        "left_outer",
    ).select("user_id", "p_ts", "e_ts", "p_value")
    n_unmatched = want.filter(F.col("e_ts").isNull()).count()
    assert n_unmatched > 0, "fixture must contain unmatched purchases"
    assert_df_equal(got, want)


def test_window_join_stream_equivalence(spark, events, tmp_path):
    """M4 stream-stream window join: purchase/error rows of the same
    user in the same 1 h tumbling window pair exactly as in the batch
    equi-join on (key, window)."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts"
    )
    sp = S.memory_batches_stream(spark, [purchases], str(tmp_path / "p"))
    se = S.memory_batches_stream(spark, [errors], str(tmp_path / "e"))
    got = S.run_available_now(
        S.window_join_stream(
            sp, se, "user_id", "ts", "ts", size="1 hour", watermark="1 minute"
        ),
        str(tmp_path / "ck"),
        "append",
    )
    lw = purchases.select(
        F.col("user_id").alias("k"),
        F.window("ts", "1 hour").alias("w"),
        F.col("ts").alias("ts_l"),
    )
    rw = errors.select(
        F.col("user_id").alias("k"),
        F.window("ts", "1 hour").alias("w"),
        F.col("ts").alias("ts_r"),
    )
    want = lw.join(rw, ["k", "w"]).select(
        "k",
        F.unix_millis("w.start").alias("w_start"),
        F.unix_millis("ts_l").alias("ts_l_ms"),
        F.unix_millis("ts_r").alias("ts_r_ms"),
    )
    assert want.count() > 0, "fixture should produce window-join pairs"
    assert_df_equal(got, want)


def test_sliding_window_stream_equivalence(spark, events, two_batch_stream, tmp_path):
    """W3 streaming sliding windows (2 h size / 1 h slide): every row
    lands in two window copies; complete-mode output equals batch."""
    sdf = S.windowed_avg_stream(
        two_batch_stream, ts="ts", key="user_id", value="value",
        size="2 hours", slide="1 hour", watermark="1 minute",
    )
    got = S.run_available_now(sdf, str(tmp_path / "ck"), "complete")
    want = (
        events.groupBy(F.window("ts", "2 hours", "1 hour"), "user_id")
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis("window.start").alias("w_start"),
            F.unix_millis("window.end").alias("w_end"),
            "user_id",
            F.round("avg_value", 4).alias("avg_value"),
            "n",
        )
    )
    assert_df_equal(got, want)


def test_continuous_aggregate_rollup_via_upsert_sink(spark, events, two_batch_stream, tmp_path):
    """Continuous aggregate: an update-mode windowed rollup maintained
    incrementally in the idempotent keyed upsert sink (foreachBatch)
    must converge to the batch rollup — the materialized-view pattern
    for 100 TB streams (each micro-batch rewrites only the windows it
    touched, never the whole aggregate)."""
    sdf = S.windowed_avg_stream(
        two_batch_stream, ts="ts", key="user_id", value="value",
        size="1 hour", watermark="1 minute",
    )
    sink = S.IdempotentKeyedUpsert(
        str(tmp_path / "rollup"), ["w_start", "user_id"], "w_end"
    )
    q = (
        S.foreach_batch_sink(
            sdf, sink.writer(), str(tmp_path / "ck"), output_mode="update"
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sink.read(spark)
    want = (
        events.groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis("window.start").alias("w_start"),
            F.unix_millis("window.end").alias("w_end"),
            "user_id",
            F.round("avg_value", 4).alias("avg_value"),
            "n",
        )
    )
    assert_df_equal(got, want)


def test_smoke_alert_stream_equivalence(spark, events, tmp_path):
    """M2 streaming (broadcast side input via foreachBatch): alerts from
    the two-batch readings stream against the static smoke control table
    must equal the batch smoke_alert query."""
    from stream_processing_with_flink_study_spark.sources import load_table
    from pyspark.sql import Window

    readings = events.select(
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias("id"),
        "ts",
        F.col("value").alias("temperature"),
    )
    w = Window.partitionBy("ts").orderBy(F.col("event_id").desc())
    smoke = (
        events.filter(F.col("event_type") == "error")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "ts",
            F.when(F.col("value") > 150, "HIGH").otherwise("LOW").alias("level"),
        )
    )
    mid = events.selectExpr("percentile_approx(ts, 0.5) AS m").first().m
    stream = S.memory_batches_stream(
        spark,
        [readings.filter(F.col("ts") <= F.lit(mid)),
         readings.filter(F.col("ts") > F.lit(mid))],
        str(tmp_path / "src"),
        files_per_trigger=1,
    )
    q = S.smoke_alert_stream(
        stream, smoke, str(tmp_path / "out"), str(tmp_path / "ck"),
        temp_threshold=180.0,
    )
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out"))
    want = QUERIES["smoke_alert"](spark, SF_SMALL)
    assert want.count() > 0
    got = got.select("message", F.unix_millis("ts").alias("ts_ms"), "temperature")
    assert_df_equal(got, want)


def _topk_want(events):
    w = Window.partitionBy("event_type").orderBy(
        F.col("cnt").desc(), F.col("user")
    )
    return (
        events.groupBy(
            "event_type", F.col("user_id").cast("string").alias("user")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("event_type").alias("key"), F.col("user").alias("term"),
            "cnt", F.col("rank").cast("long"),
        )
    )


def test_topk_counts_heavy_hitters(spark, events, two_batch_stream, tmp_path):
    """MapState-semantics top-k (GroupState dict form): per event type,
    the 5 most active users.  Counts accumulate across the two
    micro-batches; the final (cross-batch) emission per key must equal
    the batch groupBy count top-5."""
    keyed = two_batch_stream.select(
        "event_type", F.col("user_id").cast("string").alias("user")
    )
    got = S.run_available_now(
        S.topk_counts(keyed, "event_type", "user", k=5),
        str(tmp_path / "ck"),
        "update",
    )
    want = _topk_want(events)
    assert want.count() == 25
    missing = want.exceptAll(got.select("key", "term", "cnt", "rank"))
    assert missing.count() == 0, missing.limit(5).collect()


@tws
def test_transform_with_state_topk_counts(spark, events, two_batch_stream, tmp_path, rocksdb):
    """True MapState variant (transformWithStateInPandas) of the same
    top-k contract."""
    keyed = two_batch_stream.select(
        "event_type", F.col("user_id").cast("string").alias("user")
    )
    got = S.run_available_now(
        S.topk_counts_tws(keyed, "event_type", "user", k=5),
        str(tmp_path / "ck"),
        "update",
    )
    want = _topk_want(events)
    assert want.count() == 25
    missing = want.exceptAll(got.select("key", "term", "cnt", "rank"))
    assert missing.count() == 0, missing.limit(5).collect()


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_stream_encoding_aware(spark, tmp_path, unit):
    """``events_stream`` must yield identical TimestampType values for
    BOTH physical parquet encodings the driver has shipped: round-2
    TIMESTAMP(MICROS) and round-1 TIMESTAMP(NANOS) (the latter surfaces
    as a nanos long under ``nanosAsLong``).  Guards against the
    round-3 wrong-answer bug where a hardcoded ``ts long`` schema
    mis-scaled micros data 1000×."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000_000_000  # epoch micros
    rows = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(
            [
                v * (1000 if unit == "ns" else 1)
                for v in (base_us, base_us + 1_500_000, base_us + 3_700_000_000)
            ],
            pa.timestamp(unit),
        ),
        "user_id": pa.array([10, 10, 11], pa.int64()),
        "event_type": pa.array(["a", "b", "a"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"], pa.string()),
    }
    sf_dir = tmp_path / f"sf_{unit}"
    sf_dir.mkdir()
    pq.write_table(pa.table(rows), str(sf_dir / "events.parquet"))

    sdf = S.events_stream(spark, str(sf_dir))
    assert dict(sdf.dtypes)["ts"] == "timestamp"
    agg = S.windowed_avg_stream(
        sdf, ts="ts", key="user_id", value="value",
        size="1 hour", watermark="1 minute",
    )
    got = _sorted_pdf(
        S.run_available_now(agg, str(tmp_path / f"ck_{unit}"), "complete")
    )
    # identical logical values regardless of encoding: first window holds
    # user 10's two events, the 1h-later window holds user 11's one
    assert list(got["n"]) == [2, 1]
    assert list(got["avg_value"]) == [1.5, 3.0]
    assert got["w_end"].iloc[1] - got["w_start"].iloc[0] == 2 * 3600 * 1000


def test_vectorized_handler_cores_match_naive_loops():
    """The numpy formulations inside the stateful handlers must agree
    with the obvious sequential loops on randomized data, including the
    carry-in state across a simulated batch boundary.  (Speedup vs the
    iterrows baseline is printed when low but not asserted — wall-clock
    thresholds are flaky on loaded hosts.)"""
    import time

    import numpy as np

    from stream_processing_with_flink_study_spark.streaming.stateful import (
        _count_window_core,
        _delta_alerts_core,
        _funnel_core,
    )

    rng = np.random.default_rng(7)
    n_rows = 10_000

    # --- delta alerts ---
    vals = rng.normal(0, 1.5, n_rows).cumsum()
    ts = np.arange(n_rows, dtype="int64") * 1000
    for last in (None, 3.25):
        t0 = time.perf_counter()
        hit, delta = _delta_alerts_core(vals, ts, last, 1.7)
        t_vec = time.perf_counter() - t0
        # the baseline is the iterrows formulation the handler used to run
        pdf = pd.DataFrame({"value": vals, "ts_ms": ts})
        t0 = time.perf_counter()
        want, want_delta, lv = [], [], last
        for i, r in pdf.iterrows():
            v = float(r["value"])
            if lv is not None and abs(v - lv) > 1.7:
                want.append(i)
                want_delta.append(round(v - lv, 4))
            lv = v
        t_loop = time.perf_counter() - t0
        assert list(hit) == want
        assert np.allclose(delta[hit], want_delta)
        # informational only: a hard speedup threshold is flaky on a
        # loaded host; the equivalence asserts above are the real gate
        if t_loop / t_vec < 3:
            print(f"note: delta speedup only {t_loop/t_vec:.1f}x")

    # --- count window ---
    cvals = rng.uniform(0, 10, n_rows)
    wins, bs, bn, ni = _count_window_core(cvals, 2.5, 3, 7, 25)
    want, s, c, idx = [], 2.5, 3, 7
    for v in cvals:
        s += v; c += 1
        if c == 25:
            want.append((idx, round(s, 4))); s, c, idx = 0.0, 0, idx + 1
    assert [(i, round(w, 4)) for i, w in wins] == [(i, round(w, 4)) for i, w in want]
    assert bn == c and ni == idx and abs(bs - s) < 1e-6

    # --- funnel ---
    ord_us = np.sort(rng.integers(0, 10**9, n_rows))
    stage = rng.integers(0, 3, n_rows)
    step = 10**7
    for seed1, seed2 in ((None, None), (int(ord_us[0]) - 5 * 10**6, None)):
        t0 = time.perf_counter()
        hits, ns1, ns2 = _funnel_core(ord_us, stage, seed1, seed2, step)
        t_vec = time.perf_counter() - t0
        # baseline: the iterrows formulation the handler used to run
        pdf = pd.DataFrame({"ord_us": ord_us, "stage": stage})
        t0 = time.perf_counter()
        want, l1, l2 = [], seed1, seed2
        for i, r in pdf.iterrows():
            o, st = int(r["ord_us"]), int(r["stage"])
            if st == 0:
                l1 = o
            elif st == 1:
                if l1 is not None and l1 >= o - step:
                    l2 = o
            elif l2 is not None and l2 >= o - step:
                want.append(i)
        t_loop = time.perf_counter() - t0
        assert list(hits) == want
        assert ns1 == l1 and ns2 == l2
        if t_loop / t_vec < 3:
            print(f"note: funnel speedup only {t_loop/t_vec:.1f}x")


def test_idle_stream_side_holds_then_releases_watermark(spark, tmp_path):
    """Idle-partition handling (``정리/2주차.md:114-122``): one side of a
    union goes silent after a single early event.  Under the default
    ``multipleWatermarkPolicy=min`` (Flink's min-propagation) the idle
    side PINS the global watermark — none of the active side's later
    windows finalize in append mode.  The documented workaround
    (SURVEY §2.1 S7) is ``multipleWatermarkPolicy=max``: the watermark
    follows the fastest side and the active stream's windows emit."""
    from datetime import datetime, timezone

    t = lambda h: datetime(2024, 1, 1, h, 0, 0, tzinfo=timezone.utc)
    mk = lambda rows: spark.createDataFrame(rows, "id string, ts timestamp, v double")
    active = mk([("a", t(0), 1.0), ("a", t(1), 2.0), ("a", t(2), 3.0),
                 ("a", t(3), 4.0)])
    idle = mk([("b", t(0), 9.0)])  # then silence

    def run(policy: str, tag: str):
        spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", policy)
        try:
            sa = S.memory_batches_stream(
                spark, [active], str(tmp_path / f"a_{tag}")
            ).withWatermark("ts", "1 minute")
            si = S.memory_batches_stream(
                spark, [idle], str(tmp_path / f"i_{tag}")
            ).withWatermark("ts", "1 minute")
            agg = (
                sa.union(si)
                .groupBy(F.window("ts", "1 hour"), "id")
                .agg(F.sum("v").alias("s"))
                .select(F.unix_millis("window.start").alias("w"), "id", "s")
            )
            return S.run_available_now(
                agg, str(tmp_path / f"ck_{tag}"), "append"
            ).toPandas()
        finally:
            spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")

    stalled = run("min", "min")
    # min policy: watermark pinned at the idle side's (only) event minus
    # the delay -> no window at or past t(0) may finalize
    assert len(stalled) == 0, stalled
    released = run("max", "max")
    # max policy: watermark rides the active side (t(3) - 1min); every
    # window whose END <= watermark finalizes - [t2,t3) ends AT t(3),
    # above the watermark, so it correctly stays in state
    got = {(r.w, r.id): r.s for r in released.itertuples()}
    h = 3_600_000
    base = 1_704_067_200_000
    assert got == {
        (base, "a"): 1.0, (base + h, "a"): 2.0, (base, "b"): 9.0,
    }, released


def test_checkpoint_restart_with_evolved_schema(spark, tmp_path):
    """Savepoint state-migration analogue (``정리/5주차.md:150-168``).

    Supported evolution: restart a stateful query from its checkpoint
    after the SOURCE schema gains a nullable column — the state schema
    (same aggregates, same key) is unchanged, pre-restart keys keep
    their accumulated state, and the new column is usable in stateless
    stages of the restarted query.

    Documented limitation vs Flink savepoints: changing the STATE
    schema (adding an aggregate) is rejected by the state-store schema
    check rather than migrated — the explicit gap SURVEY §7.3 records."""
    import glob

    from pyspark.errors import StreamingQueryException

    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")

    def write_batch(df, i):
        d = f"{src}/b{i:05d}"
        df.coalesce(1).write.mode("append").parquet(d)
        for f_ in glob.glob(f"{d}/*"):
            os.utime(f_, (1_600_000_000 + i, 1_600_000_000 + i))

    v1 = spark.createDataFrame([("a", 1), ("a", 2), ("b", 5)], "k string, v long")
    write_batch(v1, 0)

    def run(schema, pre=None, aggs=None):
        sdf = S.file_stream(spark, f"{src}/b*", schema=schema)
        if pre is not None:
            sdf = pre(sdf)
        q = (
            sdf.groupBy("k")
            .agg(*(aggs or [F.sum("v").alias("s"), F.count("*").alias("n")]))
            .writeStream.format("memory")
            .queryName("evolved")
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {tuple(r) for r in spark.table("evolved").collect()}

    assert run("k string, v long") == {("a", 3, 2), ("b", 5, 1)}

    # source schema evolves: new nullable column w (old files lack it);
    # the restarted query USES it in a stateless pre-agg filter while
    # the state schema (sum, count per k) stays identical
    v2 = spark.createDataFrame(
        [("a", 10, 0.5), ("c", 7, 9.9)], "k string, v long, w double"
    )
    write_batch(v2, 1)
    evolved = "k string, v long, w double"
    got = run(evolved, pre=lambda d: d.filter(F.coalesce("w", F.lit(0.0)) < 5.0))
    # 'a' kept its pre-evolution state (1+2) and absorbed the new row;
    # 'c' (w=9.9) was dropped by the evolved filter before the state op
    assert got == {("a", 13, 3), ("b", 5, 1)}

    # the gap: widening the STATE schema is rejected, not migrated
    write_batch(spark.createDataFrame([("a", 1, 1.0)], evolved), 2)
    with pytest.raises(StreamingQueryException, match="[Ss]chema"):
        run(evolved, aggs=[
            F.sum("v").alias("s"), F.count("*").alias("n"),
            F.sum("w").alias("sw"),
        ])


def test_allowed_lateness_update_mode_refines_window(spark, tmp_path):
    """W7 allowed lateness (``정리/4주차.md:320-337``): Flink keeps a
    fired window's state for ``allowedLateness`` and re-fires a refined
    result when a late-but-admissible event arrives; events beyond the
    lateness are dropped.  Spark mapping (SURVEY §7.3.3): watermark =
    allowedLateness + UPDATE output mode + an idempotent keyed sink —
    each refinement is a new update row for the same window key, and
    the watermark drops what Flink's lateness bound would."""
    from datetime import datetime, timezone

    t = lambda h, m, s: datetime(2024, 1, 1, h, m, s, tzinfo=timezone.utc)
    mk = lambda rows: spark.createDataFrame(rows, "id string, ts timestamp, v double")
    b0 = mk([("a", t(0, 0, 1), 1.0), ("a", t(0, 5, 0), 2.0)])
    # late for window [00:00:00, 00:00:05) but within the 30 min
    # lateness bound -> must REFINE that window
    b1 = mk([("a", t(0, 0, 2), 10.0)])
    # spacer far ahead advances the watermark beyond 00:00 + 30 min;
    # the input-side late filter runs one batch behind the watermark
    # update (same lag as test_watermark_drops_late_rows), hence two
    # spacer batches before the too-late probe
    b2 = mk([("a", t(2, 0, 0), 3.0)])
    b2a = mk([("a", t(2, 0, 1), 4.0)])
    # beyond allowed lateness now -> dropped, no further refinement
    b3 = mk([("a", t(0, 0, 3), 100.0)])
    sdf = S.memory_batches_stream(
        spark, [b0, b1, b2, b2a, b3], str(tmp_path / "src"), files_per_trigger=1
    )
    agg = (
        sdf.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "5 seconds"), "id")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis("window.start").alias("w"), "id", "s", "n")
    )
    got = S.run_available_now(agg, str(tmp_path / "ck"), "update").toPandas()
    w0 = got[got.w == 1704067200000].reset_index(drop=True)
    # the window emitted an initial result then exactly one refinement
    # (the in-lateness event), never a third (the beyond-lateness event)
    assert list(w0.n) == [1, 2]
    assert list(w0.s) == [1.0, 11.0]


def test_state_migration_bootstrap_evolved_schema(spark, tmp_path):
    """Savepoint + evolved-state-schema migration
    (``정리/5주차.md:150-168``): a v1 rolling-max query's snapshot seeds
    a v2 query whose state layout WIDENED (max_value -> max_value +
    n_events), under a fresh checkpoint.  Carried state must survive
    (a v2 max emission can come from v1 history) and the new field
    counts from the migration point."""
    from stream_processing_with_flink_study_spark.streaming.migration import (
        rolling_max_v2_bootstrapped,
    )

    mk = lambda rows: spark.createDataFrame(rows, "id string, ts timestamp, v double")
    t = lambda s: pd.Timestamp(2024, 1, 1, 0, 0, s).to_pydatetime()
    # ---- v1 era: two batches through the v1 query ----
    a0 = mk([("a", t(0), 5.0), ("b", t(1), 7.0)])
    a1 = mk([("a", t(2), 9.0)])
    v1_stream = S.memory_batches_stream(spark, [a0, a1], str(tmp_path / "src1"))
    v1 = S.run_available_now(
        S.keyed_rolling_reduce(v1_stream, key="id", ts="ts", value="v"),
        str(tmp_path / "ck1"),
        "update",
    ).toPandas()
    # queryable-state snapshot = max emission per key (P9 pattern)
    snapshot = dict(v1.groupby("id")["max_value"].max())
    assert snapshot == {"a": 9.0, "b": 7.0}
    # ---- migration: v2 query, fresh checkpoint, evolved layout ----
    b0 = mk([("a", t(10), 6.0), ("c", t(11), 1.0)])  # a: below v1 max
    b1 = mk([("a", t(12), 11.0), ("b", t(13), 2.0)])  # a: new max; b: below
    v2_stream = S.memory_batches_stream(spark, [b0, b1], str(tmp_path / "src2"))
    got = S.run_available_now(
        rolling_max_v2_bootstrapped(
            v2_stream, "id", "ts", "v", snapshot
        ),
        str(tmp_path / "ck2"),
        "update",
    ).toPandas()
    # c is new post-migration: emits its own max with n counted here.
    # a's first v2 batch does NOT emit (6.0 < migrated 9.0) — the
    # carried state suppressed it — then 11.0 beats it with n=2 events
    # seen since migration.  b never emits (2.0 < migrated 7.0).
    got = got.sort_values(["id", "n_events"], ignore_index=True)
    assert list(got["id"]) == ["a", "c"]
    assert list(got["max_value"]) == [11.0, 1.0]
    assert list(got["n_events"]) == [2, 1]


def test_session_event_time_timer_fires_on_watermark(spark, tmp_path):
    """P2/W4 via EVENT-TIME TIMERS: a key with no further events closes
    its session only when the WATERMARK passes last-event + gap — the
    handler's hasTimedOut path (Flink onTimer).  Key a's first session
    closes inline (its own later event jumps the gap); key b's closes
    purely by timer; sessions still open at end-of-input never emit."""
    from datetime import datetime, timezone

    from stream_processing_with_flink_study_spark.streaming.stateful import (
        session_sum_event_timers,
    )

    t = lambda s: datetime(2024, 1, 1, 0, 0, 0, tzinfo=timezone.utc).replace(
        second=s % 60, minute=(s // 60) % 60, hour=s // 3600
    )
    mk = lambda rows: spark.createDataFrame(rows, "id string, ts timestamp, v double")
    b0 = mk([("a", t(0), 1.0), ("a", t(2), 2.0), ("b", t(0), 5.0)])
    b1 = mk([("a", t(100), 3.0)])   # closes a's session inline; advances wm
    b2 = mk([("c", t(110), 7.0)])   # next batch: b's timer fires at wm=95s
    sdf = S.memory_batches_stream(spark, [b0, b1, b2], str(tmp_path / "src"))
    out = session_sum_event_timers(
        sdf.withWatermark("ts", "5 seconds"), "id", "ts", "v", gap_seconds=10.0
    )
    got = (
        S.run_available_now(out, str(tmp_path / "ck"), "append")
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    assert list(got["id"]) == ["a", "b"]
    a, b = got.iloc[0], got.iloc[1]
    assert (a.start_ms, a.end_ms, a.win_sum, a.n) == (1704067200000, 1704067202000, 3.0, 2)
    assert (b.start_ms, b.end_ms, b.win_sum, b.n) == (1704067200000, 1704067200000, 5.0, 1)


def test_session_event_timers_match_batch_sessionize(spark, events, tmp_path):
    """Full equivalence: flush every key's open session by advancing the
    watermark far past end-of-data (two spacer batches — wm updates at
    batch end, timers fire the following batch), then compare against
    the batch sessionize twin."""
    from stream_processing_with_flink_study_spark.operators.windows import sessionize
    from stream_processing_with_flink_study_spark.streaming.stateful import (
        session_sum_event_timers,
    )

    keyed = events.select(
        F.col("user_id").cast("string").alias("id"), "ts", F.col("value").alias("v")
    )
    mid = events.selectExpr("percentile_approx(ts, 0.5) AS m").first().m
    far = events.selectExpr("max(ts) AS m").first().m
    import datetime as dt

    spacer = lambda d: spark.createDataFrame(
        [("_flush", far + dt.timedelta(days=d), 0.0)], "id string, ts timestamp, v double"
    )
    batches = [
        keyed.filter(F.col("ts") <= F.lit(mid)),
        keyed.filter(F.col("ts") > F.lit(mid)),
        spacer(30),
        spacer(31),
    ]
    sdf = S.memory_batches_stream(spark, batches, str(tmp_path / "src"), files_per_trigger=1)
    out = session_sum_event_timers(
        sdf.withWatermark("ts", "1 minute"), "id", "ts", "v", gap_seconds=6 * 3600.0
    )
    got = S.run_available_now(out, str(tmp_path / "ck"), "append").toPandas()
    got = got[got.id != "_flush"]
    want = (
        sessionize(keyed, ["id"], "ts", 6 * 3600.0)
        .groupBy("id", "session_id")
        .agg(
            F.unix_millis(F.min("ts")).alias("start_ms"),
            F.unix_millis(F.max("ts")).alias("end_ms"),
            F.round(F.sum("v"), 4).alias("win_sum"),
            F.count(F.lit(1)).alias("n"),
        )
        .drop("session_id")
    )
    pd.testing.assert_frame_equal(
        _sorted_pdf(got), _sorted_pdf(want), check_dtype=False
    )


def test_dynamic_broadcast_rules_update_between_batches(spark, tmp_path):
    """M3 broadcast state with UPDATES (Flink processBroadcastElement):
    a rules change between micro-batches re-routes subsequent records —
    each batch joins the rules table as read AT ITS OWN trigger, not as
    captured at query start.  Replayed as two availableNow rounds over
    one checkpoint (the deterministic way to interleave a control
    update with the data stream)."""
    from datetime import datetime, timezone

    from stream_processing_with_flink_study_spark.streaming.pipelines import (
        dynamic_rules_stream,
    )

    src, rules, out, ck = (str(tmp_path / d) for d in ("src", "rules", "out", "ck"))
    t = lambda s: datetime(2024, 1, 1, 0, 0, s, tzinfo=timezone.utc)
    mk = lambda rows: spark.createDataFrame(
        rows, "event_type string, ts timestamp, v double"
    )
    mk_rules = lambda rows: spark.createDataFrame(
        rows, "event_type string, route string"
    )
    read_stream = lambda: spark.readStream.schema(
        "event_type string, ts timestamp, v double"
    ).option("maxFilesPerTrigger", "1").parquet(f"{src}/b*")

    # round 1: rules v1 route clicks to 'web'
    mk_rules([("click", "web"), ("purchase", "billing")]).repartition(1)\
        .write.mode("overwrite").parquet(rules)
    mk([("click", t(0), 1.0), ("purchase", t(1), 2.0)]).repartition(1)\
        .write.parquet(f"{src}/b00000")
    q = dynamic_rules_stream(read_stream(), rules, out, ck)
    q.awaitTermination()
    # control update BETWEEN batches: clicks now route to 'mobile',
    # purchases lose their rule entirely
    mk_rules([("click", "mobile")]).repartition(1)\
        .write.mode("overwrite").parquet(rules)
    mk([("click", t(10), 3.0), ("purchase", t(11), 4.0)]).repartition(1)\
        .write.parquet(f"{src}/b00001")
    q = dynamic_rules_stream(read_stream(), rules, out, ck)
    q.awaitTermination()

    got = (
        spark.read.parquet(out)
        .select("event_type", "v", "route")
        .toPandas()
        .sort_values(["v"], ignore_index=True)
    )
    assert list(got["route"]) == ["web", "billing", "mobile", None]


def test_simhash_near_dup_stream_matches_batch_pairs(spark, tmp_path):
    """Streaming band-keyed Hamming matching must find exactly the
    batch ``simhash_band_pairs`` set — including pairs whose two docs
    arrive in DIFFERENT micro-batches (state carries the bucket)."""
    from stream_processing_with_flink_study_spark.functions import dedup, text

    docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("doc_id") < 300
    )
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.select("doc_id", "text").unionByName(copies)
    sims = corpus.select(
        "doc_id", text.simhash32("text").alias("simhash")
    ).cache()
    # originals in batch 0, copies in batch 1 → every planted hd=0 pair
    # crosses the micro-batch boundary
    b0 = sims.filter(F.col("doc_id") < 1_000_000)
    b1 = sims.filter(F.col("doc_id") >= 1_000_000)
    sdf = S.memory_batches_stream(spark, [b0, b1], str(tmp_path / "src"))
    got = S.run_available_now(
        S.simhash_near_dup_stream(sdf), str(tmp_path / "ck"), "append"
    )
    got_set = {
        (r.doc_a, r.doc_b, r.hd)
        for r in got.dropDuplicates(["doc_a", "doc_b", "hd"]).collect()
    }
    want_set = {
        (r.doc_a, r.doc_b, r.hd)
        for r in dedup.simhash_band_pairs(sims).collect()
    }
    assert got_set == want_set
    assert any(a < 1_000_000 <= b for a, b, _ in got_set)  # cross-batch pairs


def test_popcount32_matches_python_bit_count():
    import numpy as np

    from stream_processing_with_flink_study_spark.streaming.stateful import (
        _popcount32,
    )

    rng = np.random.default_rng(7)
    xs = rng.integers(0, 2**32, size=10_000, dtype="int64")
    got = _popcount32(xs)
    want = np.array([int(x).bit_count() for x in xs])
    assert (got == want).all()


def test_zscore_alerts_stream_matches_batch(spark, events, two_batch_stream, tmp_path):
    """Welford-style running moments in state must reproduce the batch
    expanding-window z-score alerts — including events whose baseline
    accumulated in an EARLIER micro-batch."""
    got = S.run_available_now(
        S.zscore_alerts(two_batch_stream), str(tmp_path / "ck"), "append"
    )
    want = QUERIES["running_zscore_alerts"](spark, SF_SMALL)
    got_set = {
        (r.user_id, r.event_id, r.ts_ms, round(r.z, 3)) for r in got.collect()
    }
    want_set = {
        (r.user_id, r.event_id, r.ts_ms, round(r.z, 3)) for r in want.collect()
    }
    assert got_set == want_set
    assert len(got_set) > 0


def test_psi_drift_stream_matches_batch(spark, events, two_batch_stream, tmp_path):
    """The windowed drift monitor's streaming form (literal reference
    vector, one stateful agg) must equal the batch per-day PSI."""
    got = S.run_available_now(
        S.psi_drift_stream(two_batch_stream, events),
        str(tmp_path / "ck"),
        "complete",
    )
    want = QUERIES["windowed_psi_drift"](spark, SF_SMALL)
    assert_df_equal(got, want)


def test_decayed_counts_stream_matches_batch(spark, events, two_batch_stream, tmp_path):
    """Forward-decay state re-based to the corpus max time must equal
    the batch decayed scores for every key (not just the top-20 cut)."""
    import math

    from stream_processing_with_flink_study_spark.plans.queries_mlops import (
        DECAY_LAMBDA,
    )

    got = S.run_available_now(
        S.decayed_counts(two_batch_stream), str(tmp_path / "ck"), "update"
    ).toPandas()
    # last emission per key = final state
    got = got.sort_values("last_ms").groupby("user_id").tail(1)
    t_ref = events.agg(F.max(F.unix_millis("ts"))).first()[0]
    got["score_ref"] = got.apply(
        lambda r: r.score * math.exp(-DECAY_LAMBDA * (t_ref - r.last_ms)),
        axis=1,
    )
    want = (
        events.select("user_id", F.unix_millis("ts").alias("ms"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.exp(F.lit(-DECAY_LAMBDA) * (F.lit(t_ref) - F.col("ms")))
            ).alias("score")
        )
        .toPandas()
    )
    merged = got.merge(want, on="user_id", suffixes=("_got", "_want"))
    assert len(merged) == len(want)
    assert (
        (merged.score_ref - merged.score_want).abs()
        / merged.score_want
    ).max() < 1e-9


def test_transition_counts_stream_matches_batch(spark, events, two_batch_stream, tmp_path):
    """Summed per-batch transition deltas must equal the batch Markov
    matrix counts — including transitions that STRADDLE the micro-batch
    boundary (carried by the one-value last-type state)."""
    got = S.run_available_now(
        S.transition_counts(two_batch_stream), str(tmp_path / "ck"), "update"
    ).toPandas()
    got = (
        got.groupby(["prev_t", "next_t"], as_index=False)["delta"]
        .sum()
        .rename(columns={"delta": "cnt"})
        .sort_values(["prev_t", "next_t"])
        .reset_index(drop=True)
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        events.select(
            F.col("event_type").alias("prev_t"),
            F.lead("event_type").over(w).alias("next_t"),
        )
        .filter(F.col("next_t").isNotNull())
        .groupBy("prev_t", "next_t")
        .count()
        .toPandas()
        .rename(columns={"count": "cnt"})
        .sort_values(["prev_t", "next_t"])
        .reset_index(drop=True)
    )
    assert got["cnt"].sum() == want["cnt"].sum()
    merged = got.merge(want, on=["prev_t", "next_t"], suffixes=("_s", "_b"))
    assert len(merged) == len(want) == len(got)
    assert (merged["cnt_s"] == merged["cnt_b"]).all()


def test_dynamic_gap_session_stream_equivalence(spark, events, two_batch_stream, tmp_path):
    """W4+ DYNAMIC-gap sessions (per-element gap column — Flink's
    SessionWindowTimeGapExtractor) through the same streaming pipeline:
    purchases extend a session by 2h, everything else 30min."""
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("2 hours")
    ).otherwise(F.lit("30 minutes"))
    sdf = S.session_window_stream(
        two_batch_stream, gap=gap, watermark="1 minute"
    )
    got = S.run_available_now(sdf, str(tmp_path / "ck"), "complete")
    want = (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_millis("session_window.start").alias("w_start"),
            F.unix_millis("session_window.end").alias("w_end"),
            "user_id",
            "n",
            "sum_value",
        )
    )
    assert_df_equal(got, want)


def test_interval_join_stream_full_outer(spark, events, tmp_path):
    """FULL-outer stream-stream join: unmatched rows from BOTH sides
    surface with nulls once the watermark proves no future match —
    completing the inner/left_outer interval-join family."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    far = F.expr("INTERVAL 30 DAYS")
    spacer_p = purchases.limit(1).select(
        F.lit(-1).alias("user_id"), (F.col("p_ts") + far).alias("p_ts"),
        F.lit(0.0).alias("p_value"),
    )
    spacer_e = errors.limit(1).select(
        F.lit(-1).alias("e_user"), (F.col("e_ts") + far).alias("e_ts")
    )
    sp = S.memory_batches_stream(spark, [purchases, spacer_p], str(tmp_path / "p"))
    se = S.memory_batches_stream(spark, [errors, spacer_e], str(tmp_path / "e"))
    joined = S.interval_join_stream(
        sp, se, "user_id", "p_ts", "e_ts", "-5 minutes", "5 minutes",
        watermark="1 minute", key_right="e_user", how="full_outer",
    ).select("user_id", "e_user", "p_ts", "e_ts", "p_value")
    got = S.run_available_now(joined, str(tmp_path / "ck"), "append")
    got = got.filter(
        (F.coalesce("user_id", F.lit(0)) >= 0)
        & (F.coalesce("e_user", F.lit(0)) >= 0)
    )
    want = purchases.join(
        errors,
        (purchases.user_id == errors.e_user)
        & (errors.e_ts >= purchases.p_ts - F.expr("INTERVAL 5 minutes"))
        & (errors.e_ts <= purchases.p_ts + F.expr("INTERVAL 5 minutes")),
        "full_outer",
    ).select("user_id", "e_user", "p_ts", "e_ts", "p_value")
    assert want.filter(F.col("p_ts").isNull()).count() > 0
    assert want.filter(F.col("e_ts").isNull()).count() > 0
    assert_df_equal(got, want)


def test_streaming_windowed_hll_matches_batch(spark, events, two_batch_stream, tmp_path):
    """Mergeable sketches under Structured Streaming: hourly
    approx-distinct users via HLL sketch aggregation across micro-batch
    partials must equal the batch estimate exactly (HLL merges are
    deterministic and associative — partial sketches from two batches
    merge to the same sketch the batch build produces)."""
    sdf = (
        two_batch_stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_u"),
        )
        .select(
            F.unix_millis("window.start").alias("w_start"), "approx_u"
        )
    )
    got = S.run_available_now(sdf, str(tmp_path / "ck"), "complete")
    want = (
        events.groupBy(F.window("ts", "1 hour"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_u"),
        )
        .select(F.unix_millis("window.start").alias("w_start"), "approx_u")
    )
    assert_df_equal(got, want)


def test_interval_join_stream_left_semi(spark, events, tmp_path):
    """Left-SEMI stream-stream join: purchases that had at least one
    error by the same user within ±5 minutes — existence filtering
    without duplicating the left row per match (the streaming EXISTS)."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    sp = S.memory_batches_stream(spark, [purchases], str(tmp_path / "p"))
    se = S.memory_batches_stream(spark, [errors], str(tmp_path / "e"))
    joined = S.interval_join_stream(
        sp, se, "user_id", "p_ts", "e_ts", "-5 minutes", "5 minutes",
        watermark="1 minute", key_right="e_user", how="left_semi",
    )
    got = S.run_available_now(joined, str(tmp_path / "ck"), "append")
    want = purchases.join(
        errors,
        (purchases.user_id == errors.e_user)
        & (errors.e_ts >= purchases.p_ts - F.expr("INTERVAL 5 minutes"))
        & (errors.e_ts <= purchases.p_ts + F.expr("INTERVAL 5 minutes")),
        "left_semi",
    )
    assert want.count() > 0, "fixture must contain matched purchases"
    assert_df_equal(got, want)


def test_streaming_cms_partials_equal_batch_sketch(spark, events, two_batch_stream, tmp_path):
    """Count-min sketch under Structured Streaming: the cell counts
    accumulated across micro-batches (update-mode keyed counts over
    (row, bucket)) must equal the batch-built sketch EXACTLY — the
    mergeable-partial law live in a stream."""
    from stream_processing_with_flink_study_spark.functions.sketch import (
        CMS_D,
        CMS_W,
        cms_build,
        _bucket,
    )

    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col("user_id"), r, CMS_W, "cms0").alias("bucket"),
            )
            for r in range(CMS_D)
        ]
    )
    sdf = (
        two_batch_stream.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = S.run_available_now(sdf, str(tmp_path / "ck"), "complete")
    want = cms_build(events.select(F.col("user_id")), "user_id")
    diff = (
        got.join(want, ["row", "bucket"], "full_outer")
        .filter(
            F.coalesce(got["c"], F.lit(0)) != F.coalesce(want["c"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_continuous_clustering_merges_across_batches(spark, tmp_path):
    """Iterative algorithm driven by a stream: batch 1's pairs form two
    separate clusters; batch 2 delivers a bridging edge that must MERGE
    them (relabeling members of both) — the case per-batch labels alone
    cannot handle.  Final snapshot must equal batch CC over all pairs."""
    from stream_processing_with_flink_study_spark.operators.graph import (
        connected_components,
    )

    b1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    b2 = spark.createDataFrame([(3, 10), (20, 21)], "id_a long, id_b long")
    sdf = S.memory_batches_stream(spark, [b1, b2], str(tmp_path / "src"))
    q = S.continuous_clustering_stream(
        sdf,
        str(tmp_path / "pairs"),
        str(tmp_path / "labels"),
        str(tmp_path / "ck"),
    )
    q.awaitTermination()
    got = {
        r.id: r.comp
        for r in spark.read.parquet(str(tmp_path / "labels")).collect()
    }
    # the bridge 3~10 merged {1,2,3} with {10,11} under min-label 1
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20}
    want = {
        r.id: r.comp
        for r in connected_components(b1.unionByName(b2)).collect()
    }
    assert got == want


def test_observed_metrics_track_stream_volume(spark, events, two_batch_stream, tmp_path):
    """Flink metrics/counters analog: ``observe()`` attaches named
    aggregates to the streaming plan and every micro-batch reports them
    through query progress — summed across batches they must equal the
    exact input volume (the operational accounting a pipeline exports,
    computed inline with zero extra passes)."""
    sdf = two_batch_stream.observe(
        "io_metrics",
        F.count(F.lit(1)).alias("rows"),
        F.round(F.sum("value"), 4).alias("sum_v"),
    )
    q = (
        sdf.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    observed = [
        p["observedMetrics"]["io_metrics"]
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("io_metrics")
    ]
    assert len(observed) >= 2  # one report per data micro-batch
    assert sum(m["rows"] for m in observed) == events.count()
    want_sum = events.agg(F.sum("value")).first()[0]
    assert abs(sum(m["sum_v"] for m in observed) - want_sum) < 1e-2


def test_streaming_query_listener_lifecycle(spark, two_batch_stream, tmp_path):
    """Flink job-listener analog: a StreamingQueryListener must observe
    the full lifecycle — start, at least one progress report per data
    micro-batch, and termination — for a query run to completion."""
    from pyspark.sql.streaming import StreamingQueryListener

    events_seen = {"started": 0, "progress": 0, "terminated": 0}

    class Probe(StreamingQueryListener):
        def onQueryStarted(self, event):
            events_seen["started"] += 1

        def onQueryProgress(self, event):
            events_seen["progress"] += 1

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            events_seen["terminated"] += 1

    listener = Probe()
    spark.streams.addListener(listener)
    try:
        q = (
            two_batch_stream.groupBy("event_type")
            .count()
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import time as _t

        # listener callbacks are delivered asynchronously
        for _ in range(40):
            if events_seen["terminated"]:
                break
            _t.sleep(0.25)
    finally:
        spark.streams.removeListener(listener)
    assert events_seen["started"] >= 1
    assert events_seen["progress"] >= 2  # one per data micro-batch
    assert events_seen["terminated"] >= 1


def test_idle_source_monitor_flags_idle_not_active(spark, tmp_path):
    """S7 operational half: a union query over one ACTIVE file source
    (five files, one per trigger) and one IDLE source (a single file,
    then silence) must flag exactly the idle source after n_triggers
    offset-stalled triggers, stamping the observed max event time the
    watermark froze at; the active source is never flagged."""
    import time as _time
    from datetime import datetime

    active_dir, idle_dir = str(tmp_path / "act"), str(tmp_path / "idl")
    schema = "k string, ts timestamp, v double"
    for i in range(5):
        spark.createDataFrame(
            [("a", datetime(2024, 1, 1, i), float(i))], schema
        ).repartition(1).write.mode("append").parquet(f"{active_dir}/f{i}")
    spark.createDataFrame(
        [("i", datetime(2024, 1, 1, 0), 0.0)], schema
    ).repartition(1).write.mode("append").parquet(f"{idle_dir}/f0")

    mon = S.IdleSourceMonitor(n_triggers=2)
    spark.streams.addListener(mon)
    try:
        # glob over the per-batch subdirs (same layout as
        # memory_batches_stream's replay source)
        act = S.file_stream(spark, f"{active_dir}/f*", schema=schema,
                            max_files_per_trigger=1)
        idl = S.file_stream(spark, f"{idle_dir}/f*", schema=schema,
                            max_files_per_trigger=1)
        union = S.observe_max_event_time(act.unionByName(idl), "ts")
        # processingTime, not availableNow: progress events for
        # available-now runs are not delivered to Python listeners
        # (observed on this Spark build) — a ticking trigger is also
        # the realistic idle-detection regime
        q = (
            union.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="300 milliseconds")
            .start()
        )
        try:
            # listener events arrive on a separate thread: poll
            deadline = _time.time() + 90
            while _time.time() < deadline and not mon.flags:
                _time.sleep(0.2)
        finally:
            q.stop()
        assert mon.flags, "idle source never flagged"
        assert all(idle_dir.split("/")[-1] in f["source"]
                   or "idl" in f["source"] for f in mon.flags), mon.flags
        assert all("act" not in f["source"] for f in mon.flags)
        flagged = mon.idle_sources()
        assert len(flagged) == 1 and "idl" in flagged[0]
        # the frozen watermark value rides the observation
        assert any(f["observed_max_event_time"] is not None
                   for f in mon.flags)
    finally:
        spark.streams.removeListener(mon)


def test_queryable_state_snapshot_and_point_lookup(spark, tmp_path):
    """P9: the read endpoint over the state snapshot — latest value per
    key, per-key state_updated_at, global fresh_as_of watermark, point
    get() with key validation, readable from a session that never saw
    the writer (here: same session, separate reader object)."""
    qs = S.QueryableState(str(tmp_path / "qs"), ["k"], "ts")
    mk = lambda rows: spark.createDataFrame(rows, "k string, ts long, v double")
    w = qs.writer()
    w(mk([("a", 1, 10.0), ("b", 3, 20.0)]), 0)
    w(mk([("a", 5, 11.0)]), 1)

    reader = S.QueryableState(str(tmp_path / "qs"), ["k"], "ts")
    snap = {r.k: r for r in reader.snapshot(spark).collect()}
    assert {k: r.v for k, r in snap.items()} == {"a": 11.0, "b": 20.0}
    assert snap["a"].state_updated_at == 5 and snap["b"].state_updated_at == 3
    assert all(r.fresh_as_of == 5 for r in snap.values())  # global max

    got = reader.get(spark, k="b").collect()
    assert len(got) == 1 and got[0].v == 20.0 and got[0].fresh_as_of == 5
    assert reader.get(spark, k="zzz").count() == 0
    with pytest.raises(ValueError, match="not key columns"):
        reader.get(spark, nope="x")
    # replayed batch does not disturb the endpoint (idempotent storage)
    w(mk([("a", 5, 11.0)]), 1)
    assert {r.k: r.v for r in reader.snapshot(spark).collect()} == {
        "a": 11.0, "b": 20.0,
    }


def test_transition_counts_drops_cross_batch_stragglers(spark, tmp_path):
    """An event arriving in a LATER batch with an EARLIER event time
    than the committed state seed is dropped — arrival-order
    transitions that contradict event-time order are never emitted."""
    from datetime import datetime

    schema = "user_id long, ts timestamp, event_type string, event_id long"
    t = lambda h: datetime(2024, 1, 1, h)
    batches = [
        spark.createDataFrame([(1, t(10), "A", 1)], schema),
        # straggler: event-time 09:00 arrives after the 10:00 seed
        spark.createDataFrame([(1, t(9), "B", 2)], schema),
        spark.createDataFrame([(1, t(11), "C", 3)], schema),
    ]
    src = S.memory_batches_stream(
        spark, batches, str(tmp_path / "src"), schema=schema
    )
    got = S.run_available_now(
        S.transition_counts(src), str(tmp_path / "ck"), "update"
    ).toPandas()
    summed = got.groupby(["prev_t", "next_t"])["delta"].sum().to_dict()
    # no A->B or B->C arrival-order artifacts; the straggler vanished
    # and the seed survived it: A->C is the only transition
    assert summed == {("A", "C"): 1}


def test_state_store_metrics_reports_stateful_operator(spark, tmp_path):
    """P5/P6 observability: a windowed aggregation run to completion
    must surface its state operator with a positive state row count;
    a stateless passthrough reports none."""
    from datetime import datetime

    schema = "k string, ts timestamp, v double"
    rows = [("a", datetime(2024, 1, 1, h), float(h)) for h in range(6)]
    df = spark.createDataFrame(rows, schema)
    src = S.memory_batches_stream(spark, [df], str(tmp_path / "src"), schema=schema)
    agg = (
        src.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "1 hour"), "k")
        .agg(F.sum("v").alias("s"))
    )
    q = (
        agg.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    mets = S.state_store_metrics(q)
    assert mets and mets[0]["rows_total"] > 0
    assert mets[0]["operator"] is not None

    q2 = (
        S.memory_batches_stream(spark, [df], str(tmp_path / "src2"), schema=schema)
        .select("k", "v")
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert S.state_store_metrics(q2) == []


def test_gap_deltas_stream_matches_batch(spark, events, two_batch_stream, tmp_path):
    """Merged per-batch gap partials must reproduce the batch cadence
    stats exactly — including the gap that STRADDLES the micro-batch
    boundary (carried by the one-value last-timestamp state)."""
    import numpy as np

    got = S.run_available_now(
        S.gap_deltas(two_batch_stream), str(tmp_path / "ck"), "update"
    ).toPandas()
    merged = got.groupby("user_id").agg(
        n=("delta_n", "sum"),
        s=("delta_sum", "sum"),
        ss=("delta_sumsq", "sum"),
        lo=("gap_min", "min"),
        hi=("gap_max", "max"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = (
        events.select(
            "user_id",
            (
                F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)
            ).alias("gap_ms"),
        )
        .filter(F.col("gap_ms").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_ms").alias("n"),
            F.sum("gap_ms").alias("s"),
            F.sum(F.col("gap_ms") * F.col("gap_ms")).alias("ss"),
            F.min("gap_ms").alias("lo"),
            F.max("gap_ms").alias("hi"),
        )
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    merged = merged.sort_index()
    assert list(merged.index) == list(want.index)
    assert (merged["n"].to_numpy() == want["n"].to_numpy()).all()
    assert (merged["lo"].to_numpy() == want["lo"].to_numpy()).all()
    assert (merged["hi"].to_numpy() == want["hi"].to_numpy()).all()
    assert np.allclose(merged["s"], want["s"], rtol=0, atol=0)
    # sum-of-squares overflows double's exact-integer range (~9e15), so
    # the float partial drifts ulps from the exact BIGINT batch sum
    assert np.allclose(merged["ss"], want["ss"], rtol=1e-12)
    # derived stats round-trip: mean and sample stddev from partials
    n, s, ss = merged["n"], merged["s"], merged["ss"]
    mean = s / n
    var = (ss - n * mean**2) / (n - 1).where(n > 1, np.nan)
    batch = want["s"] / want["n"]
    assert np.allclose(mean, batch)
    assert (var.dropna() >= -1e-9).all()


def test_drawdown_partials_carries_peak_across_batches(spark, tmp_path):
    """A trough in batch 2 must be measured against the PEAK committed
    in batch 1 (100 -> 50 = 0.5), not batch 2's own local peak (which
    would report 0.0) — the exact case a per-batch rollup gets wrong."""
    cols = "yr LONG, d_days LONG, price_c LONG"
    b1 = spark.createDataFrame(
        [(2020, 1, 60), (2020, 1, 40), (2020, 2, 80)], cols
    )  # day1 = 100 (peak), day2 = 80
    b2 = spark.createDataFrame([(2020, 3, 50), (2020, 4, 110)], cols)
    src = tmp_path / "src_ddp"
    sdf = S.memory_batches_stream(spark, [b1, b2], str(src), files_per_trigger=1)
    got = (
        S.run_available_now(
            S.drawdown_partials(sdf), str(tmp_path / "ck_ddp"), "update"
        )
        .toPandas()
        .sort_values("n_days", ignore_index=True)
    )
    # batch 1: peak 100, worst dd = 1 - 80/100
    assert got.loc[0, "n_days"] == 2
    assert got.loc[0, "peak_c"] == 100
    assert abs(got.loc[0, "max_dd"] - 0.2) < 1e-12
    # batch 2: day3 dips to 50 against the carried peak of 100 -> 0.5,
    # then day4 sets a new running peak of 110
    assert got.loc[1, "n_days"] == 4
    assert got.loc[1, "peak_c"] == 110
    assert abs(got.loc[1, "max_dd"] - 0.5) < 1e-12
