"""W6 generic trigger API: batch/stream equivalence across micro-batch
boundaries (with out-of-order arrival inside each batch), FIRE vs
FIRE_AND_PURGE, and plan shape."""

from __future__ import annotations

import re
from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark import streaming as S
from stream_processing_with_flink_study_spark.operators.triggers import (
    CountEvictor,
    CountTrigger,
    EventTimeIntervalTrigger,
    PredicateTrigger,
    TimeEvictor,
    triggered_window,
    triggered_window_stream,
)
from stream_processing_with_flink_study_spark.sources import load_table

from .conftest import SF_SMALL


def _sorted(df) -> pd.DataFrame:
    p = df.toPandas() if not isinstance(df, pd.DataFrame) else df
    p = p[sorted(p.columns)]
    return p.sort_values(list(p.columns), ignore_index=True)


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_SMALL, "events").cache()


def _scrambled_two_batch(spark, events, tmp_path):
    mid = events.selectExpr("percentile_approx(ts, 0.5) AS m").first().m
    b0 = events.filter(F.col("ts") <= F.lit(mid)).orderBy(F.rand(seed=1))
    b1 = events.filter(F.col("ts") > F.lit(mid)).orderBy(F.rand(seed=2))
    return S.memory_batches_stream(
        spark, [b0, b1], str(tmp_path / "src"), files_per_trigger=1
    )


TRIGGERS = [
    CountTrigger(10),
    CountTrigger(10, purge=True),
    PredicateTrigger("event_type = 'purchase'"),
    PredicateTrigger("event_type = 'purchase'", purge=True),
    EventTimeIntervalTrigger("6 hours"),
    EventTimeIntervalTrigger("6 hours", purge=True),
]


@pytest.mark.parametrize(
    "trigger", TRIGGERS, ids=lambda t: f"{type(t).__name__}-purge={t.purge}"
)
def test_stream_matches_batch(spark, events, tmp_path, trigger):
    want = triggered_window(events, "user_id", "ts", "value", trigger)
    assert want.count() > 0, "fixture must actually fire"
    sdf = _scrambled_two_batch(spark, events, tmp_path)
    got = S.run_available_now(
        triggered_window_stream(sdf, "user_id", "ts", "value", trigger),
        str(tmp_path / "ck"),
        "append",
    )
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_count_purge_windows_partition_the_stream(spark):
    """FIRE_AND_PURGE windows tile the per-key stream: consecutive
    fires carry disjoint element ranges whose sums add up to the
    running total."""
    rows = [(1, i, datetime(2024, 1, 1, 0, 0, i), float(i)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = _sorted(triggered_window(df, "user_id", "ts", "value", CountTrigger(3, purge=True)))
    assert list(got["n_in_window"]) == [3, 3, 3]
    assert list(got["win_sum"]) == [0.0 + 1 + 2, 3.0 + 4 + 5, 6.0 + 7 + 8]


def test_interval_final_bucket_never_fires(spark):
    rows = [
        (1, 0, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, 1, datetime(2024, 1, 1, 0, 0, 30), 2.0),
        (1, 2, datetime(2024, 1, 1, 0, 2, 0), 4.0),  # new bucket
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = _sorted(
        triggered_window(
            df, "user_id", "ts", "value", EventTimeIntervalTrigger("1 minute", purge=True)
        )
    )
    # only the first bucket fired (closed by event 2); the final partial
    # bucket stays open
    assert list(got["win_sum"]) == [3.0]
    assert list(got["n_in_window"]) == [2]


def test_single_exchange_plan(spark, events):
    from .test_plans import fplan

    for trig in (CountTrigger(10, purge=True), EventTimeIntervalTrigger("6 hours")):
        plan = fplan(triggered_window(events, "user_id", "ts", "value", trig))
        # formatted plans list each node twice (tree + details): count
        # the numbered detail entries only
        n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_ex <= 1, f"{trig}: {n_ex} exchanges"


def test_rejects_unknown_trigger(spark, events):
    with pytest.raises(TypeError):
        triggered_window(events, "user_id", "ts", "value", object())
    with pytest.raises(ValueError):
        EventTimeIntervalTrigger("0 seconds") and triggered_window(
            events, "user_id", "ts", "value", EventTimeIntervalTrigger("0 seconds")
        )


EVICTED = [
    (CountTrigger(10), CountEvictor(4)),
    (CountTrigger(10), TimeEvictor("6 hours")),
    (PredicateTrigger("event_type = 'purchase'"), TimeEvictor("6 hours")),
    (EventTimeIntervalTrigger("6 hours"), CountEvictor(4)),
]


@pytest.mark.parametrize(
    "trigger,evictor", EVICTED,
    ids=lambda x: type(x).__name__,
)
def test_evictor_stream_matches_batch(spark, events, tmp_path, trigger, evictor):
    want = triggered_window(
        events, "user_id", "ts", "value", trigger, evictor=evictor
    )
    assert want.count() > 0
    sdf = _scrambled_two_batch(spark, events, tmp_path)
    got = S.run_available_now(
        triggered_window_stream(
            sdf, "user_id", "ts", "value", trigger, evictor=evictor
        ),
        str(tmp_path / "ck"),
        "append",
    )
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_count_evictor_keeps_last_n(spark):
    rows = [(1, i, datetime(2024, 1, 1, 0, 0, i), float(i)) for i in range(9)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = _sorted(
        triggered_window(
            df, "user_id", "ts", "value", CountTrigger(3),
            evictor=CountEvictor(2),
        )
    )
    # fires at elements 2,5,8 (0-indexed values 2,5,8): last-2 sums
    assert list(got["win_sum"]) == [1.0 + 2, 4.0 + 5, 7.0 + 8]
    assert list(got["n_in_window"]) == [2, 2, 2]


def test_evictor_rejects_purging_trigger(spark, events):
    with pytest.raises(ValueError, match="non-purging"):
        triggered_window(
            events, "user_id", "ts", "value", CountTrigger(5, purge=True),
            evictor=CountEvictor(2),
        )
    with pytest.raises(ValueError, match="non-purging"):
        triggered_window_stream(
            events, "user_id", "ts", "value", CountTrigger(5, purge=True),
            evictor=CountEvictor(2),
        )
