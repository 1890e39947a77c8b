"""Streaming reluctant-binding CEP (round-8 verdict item 6): the
capped-ListState variant must reproduce the batch reluctant form
exactly while the cap holds, and raise the overflow flag (without
emitting wrong matches) when it does not."""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark import streaming as S
from stream_processing_with_flink_study_spark.operators.cep import (
    match_pattern,
    match_pattern_stream,
)

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)
SCHEMA = "user_id long, ts timestamp, event_id long, event_type string"


def _mk_events():
    """Deterministic 3-step corpus: per user, interleaved A/B/C events
    with varying gaps so earliest-in-window bindings differ from
    latest-in-window ones (greedy vs reluctant observable)."""
    rows = []
    eid = 0
    for u in range(6):
        t = 0
        for r in range(40):
            t += 1 + ((r * 7 + u * 3) % 11)
            kind = ("A", "A", "B", "C", "B", "A", "C")[(r + u) % 7]
            rows.append(
                (u, BASE + timedelta(minutes=t), eid, kind)
            )
            eid += 1
    return rows


def _run_stream(spark, tmp_path, rows, split, **kw):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    frames = [rows[:split], rows[split:]]
    for i, chunk in enumerate(frames):
        d = f"{src}/b{i:05d}"
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        for root, _, files in os.walk(d):
            for f_ in files:
                os.utime(
                    os.path.join(root, f_),
                    (1_600_000_000 + i, 1_600_000_000 + i),
                )
    sdf = S.file_stream(
        spark, f"{src}/b*", schema=SCHEMA, max_files_per_trigger=1
    )
    q = (
        match_pattern_stream(
            sdf, "user_id", "ts", steps=("A", "B", "C"),
            within="30 minutes", mode="reluctant", emit="chain", **kw
        )
        .writeStream.format("memory")
        .queryName("t_rel_cep")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql("SELECT * FROM t_rel_cep").collect()


def test_reluctant_stream_equals_batch(spark, tmp_path):
    """With a roomy cap the streaming reluctant matcher emits the exact
    (key, id, ts, chain) set of the batch reluctant window form, split
    across 2 micro-batches, with overflow never raised."""
    rows = _mk_events()
    # split mid-corpus (event time still ascending per key overall:
    # users are interleaved but each batch is a time-prefix per user)
    rows.sort(key=lambda r: (r[1], r[2]))
    got = _run_stream(spark, tmp_path, rows, len(rows) // 2)
    assert got, "no matches generated — corpus too sparse"
    assert all(r["overflow"] is False for r in got)
    want = (
        match_pattern(
            spark.createDataFrame(rows, SCHEMA),
            "user_id", "ts", steps=("A", "B", "C"),
            within="30 minutes", mode="reluctant", emit="chain",
        )
        .collect()
    )
    assert {
        (r["user_id"], r["event_id"], r["ts_ms"], r["match_chain"])
        for r in got
    } == {
        (r["user_id"], r["event_id"], r["ts_ms"], r["match_chain"])
        for r in want
    }


def test_reluctant_stream_within_total(spark, tmp_path):
    """within_total measured on the EMITTED (earliest) binding prunes
    the same completions in both forms."""
    rows = _mk_events()
    rows.sort(key=lambda r: (r[1], r[2]))
    got = _run_stream(
        spark, tmp_path, rows, len(rows) // 2, within_total="40 minutes"
    )
    want = match_pattern(
        spark.createDataFrame(rows, SCHEMA),
        "user_id", "ts", steps=("A", "B", "C"),
        within="30 minutes", mode="reluctant", emit="chain",
        within_total="40 minutes",
    ).collect()
    assert {
        (r["user_id"], r["event_id"], r["match_chain"]) for r in got
    } == {
        (r["user_id"], r["event_id"], r["match_chain"]) for r in want
    }
    assert len(want) > 0


def test_reluctant_stream_cap_overflow_flags(spark, tmp_path):
    """cap=1 drops qualifiers: every emitted match is still a REAL
    batch match (false negatives only, never false positives), and the
    overflow flag turns on for keys that overflowed."""
    rows = _mk_events()
    rows.sort(key=lambda r: (r[1], r[2]))
    got = _run_stream(
        spark, tmp_path, rows, len(rows) // 2, reluctant_cap=1
    )
    want_keys = {
        (r["user_id"], r["event_id"], r["match_chain"])
        for r in match_pattern(
            spark.createDataFrame(rows, SCHEMA),
            "user_id", "ts", steps=("A", "B", "C"),
            within="30 minutes", mode="reluctant", emit="chain",
        ).collect()
    }
    got_keys = {
        (r["user_id"], r["event_id"], r["match_chain"]) for r in got
    }
    # capped matches whose full chain equals a batch chain: subset law
    # holds for the MATCH SET (completions may bind to later qualifiers
    # than batch when the earliest was dropped — those differ in chain,
    # so compare on completion identity only)
    got_completions = {(u, e) for (u, e, _) in got_keys}
    want_completions = {(u, e) for (u, e, _) in want_keys}
    assert got_completions <= want_completions
    assert any(r["overflow"] for r in got)


def test_reluctant_stream_optional_equals_batch(spark, tmp_path):
    """The round-9 NotImplementedError combo, closed: an OPTIONAL
    middle step in streaming reluctant mode reproduces the batch form
    exactly — including matches that SKIP the optional level (A>C
    chains with no B in between) via the lists[m-2] fallback."""
    rows = _mk_events()
    rows.sort(key=lambda r: (r[1], r[2]))
    got = _run_stream(
        spark, tmp_path, rows, len(rows) // 2,
        quantifiers=("one", "optional", "one"),
    )
    assert all(r["overflow"] is False for r in got)
    want = match_pattern(
        spark.createDataFrame(rows, SCHEMA),
        "user_id", "ts", steps=("A", "B", "C"),
        within="30 minutes", mode="reluctant", emit="chain",
        quantifiers=("one", "optional", "one"),
    ).collect()
    assert {
        (r["user_id"], r["event_id"], r["ts_ms"], r["match_chain"])
        for r in got
    } == {
        (r["user_id"], r["event_id"], r["ts_ms"], r["match_chain"])
        for r in want
    }
    assert len(want) > 0
    # the skip path genuinely fires: some chain has exactly 2 links
    assert any(r["match_chain"].count(">") == 1 for r in want)


def test_reluctant_stream_one_or_more_equals_batch(spark, tmp_path):
    """``oneOrMore`` collapses to ``one`` in completion-emission
    semantics (the documented batch behavior) — the streaming twin
    must accept the vector and agree with batch bit-for-bit."""
    rows = _mk_events()
    rows.sort(key=lambda r: (r[1], r[2]))
    got = _run_stream(
        spark, tmp_path, rows, len(rows) // 2,
        quantifiers=("one", "oneOrMore", "one"),
    )
    want = match_pattern(
        spark.createDataFrame(rows, SCHEMA),
        "user_id", "ts", steps=("A", "B", "C"),
        within="30 minutes", mode="reluctant", emit="chain",
        quantifiers=("one", "oneOrMore", "one"),
    ).collect()
    assert {
        (r["user_id"], r["event_id"], r["ts_ms"], r["match_chain"])
        for r in got
    } == {
        (r["user_id"], r["event_id"], r["ts_ms"], r["match_chain"])
        for r in want
    }
    assert len(want) > 0


def test_reluctant_stream_within_total_ignores_cap(spark, tmp_path):
    """within_total + a tiny cap: the cap is DISABLED (exactness wins —
    a dropped earliest binding could otherwise pass the total-window
    check batch rejects), so the stream matches batch bit-for-bit and
    overflow never raises even on data that overflows cap=1."""
    rows = _mk_events()
    rows.sort(key=lambda r: (r[1], r[2]))
    got = _run_stream(
        spark, tmp_path, rows, len(rows) // 2,
        within_total="40 minutes", reluctant_cap=1,
    )
    assert all(r["overflow"] is False for r in got)
    want = match_pattern(
        spark.createDataFrame(rows, SCHEMA),
        "user_id", "ts", steps=("A", "B", "C"),
        within="30 minutes", mode="reluctant", emit="chain",
        within_total="40 minutes",
    ).collect()
    assert {
        (r["user_id"], r["event_id"], r["ts_ms"], r["match_chain"])
        for r in got
    } == {
        (r["user_id"], r["event_id"], r["ts_ms"], r["match_chain"])
        for r in want
    }
    assert len(want) > 0


def test_stream_rejects_single_step(spark):
    """A 1-step pattern would index lists[n-2] == lists[-1] at runtime;
    it must fail fast at construction instead."""
    import pytest as _pt

    sdf = (
        spark.readStream.format("rate").load()
        .select(
            F.col("value").alias("user_id"),
            F.col("timestamp").alias("ts"),
            F.col("value").alias("event_id"),
            F.lit("A").alias("event_type"),
        )
    )
    with _pt.raises(ValueError, match="at least 2 steps"):
        match_pattern_stream(sdf, "user_id", "ts", steps=("A",))
    with _pt.raises(ValueError, match="at least 2 steps"):
        match_pattern_stream(
            sdf, "user_id", "ts", steps=("A",), mode="reluctant"
        )
