"""The croston/holt recursions now run driver-side on their bounded
frames (48 demand days / one row per month) — these tests keep the
native Spark ``WITH RECURSIVE`` forms alive as equivalence witnesses:
the registered query must be BIT-equal to the recursive-CTE form, so
the driver-side recursion can never silently drift from the SQL
recurrence the DuckDB oracle still runs."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans.queries_eval import (
    holt_recursive_df,
    holt_smoothing_monthly,
)
from stream_processing_with_flink_study_spark.plans.queries_queueing import (
    croston_intermittent,
    croston_recursive_df,
)

from .conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_croston_driver_side_matches_recursive_cte(spark):
    got = croston_intermittent(spark, SF_SMALL)
    ref = croston_recursive_df(spark, SF_SMALL)
    assert got.columns == ref.columns
    assert _rows(got) == _rows(ref)


def test_holt_driver_side_matches_recursive_cte(spark):
    got = holt_smoothing_monthly(spark, SF_SMALL)
    ref = holt_recursive_df(spark, SF_SMALL)
    assert got.columns == ref.columns
    assert _rows(got) == _rows(ref)
