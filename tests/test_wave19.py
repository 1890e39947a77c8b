"""Law tests for wave 19: Taylor's power law, Cook's distance."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_diag import (
    cooks_frame,
)

from .conftest import SF_SMALL


def test_taylor_tpch_sane(spark):
    r = QUERIES["taylor_power_law"](spark, SF_SMALL).collect()[0]
    assert r["n_parts"] > 10
    # uniform-quantity TPC-H demand: near-Poisson scaling territory
    assert -1.0 < r["taylor_b"] < 3.0
    assert 0 <= r["r2"] <= 1


def test_cooks_distance_planted_endpoint_outlier(spark):
    # clean line plus one wild ENDPOINT day: max leverage AND max
    # residual => it must dominate the influence ranking
    rows = [(t, 1000 + 5 * t + (t % 3)) for t in range(300)]
    rows.append((299 + 1, 100_000))
    out = cooks_frame(
        spark.createDataFrame(rows, "t long, y long")
    ).collect()
    assert out[0]["day_idx"] == 300
    assert out[0]["influential_4_over_n"] == 1
    # endpoint leverage of an even spread ~ 4/n x the center's
    assert out[0]["leverage"] > 3.0 / len(rows)
    # and it dwarfs everything else
    assert out[0]["cooks_d"] > 100 * out[1]["cooks_d"]


def test_cooks_distance_tpch_sane(spark):
    rows = QUERIES["cooks_distance_days"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    vals = [r["cooks_d"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(0 <= r["leverage"] <= 1 for r in rows)
