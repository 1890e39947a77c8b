"""Law tests for wave 15: AMS F2, Diebold-Mariano, competing risks."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_eval import (
    diebold_mariano_frame,
)

from .conftest import SF_SMALL


def test_ams_f2_bounds_and_tpch(spark):
    r = QUERIES["ams_f2_sketch"](spark, SF_SMALL).collect()[0]
    # F2 bounds: N (all distinct) <= F2 <= N^2 (single token)
    assert r["n_tokens"] <= r["exact_f2"] <= r["n_tokens"] ** 2
    assert r["k_replicas"] == 32
    assert r["ams_f2_median"] > 0
    # median-of-32 on a realistic (Zipfian) stream: well inside 2x
    assert r["rel_error"] < 1.0


def test_dm_planted_forecasters(spark):
    # pure weekly pattern: seasonal naive is PERFECT, naive is awful
    weekly = [(t, [100, 400, 250, 900, 120, 777, 333][t % 7])
              for t in range(400)]
    w = diebold_mariano_frame(
        spark.createDataFrame(weekly, "t long, qy long")
    ).collect()[0]
    assert w["mse_seasonal_naive"] == 0.0
    assert w["mse_naive"] > 1000
    assert w["dm_stat"] < -1.96 and w["significant_5pct"] == 1

    # random walk: yesterday beats last week (variance grows with lag)
    import random

    rng = random.Random(3)
    y, walk = 10_000, []
    for t in range(400):
        y += rng.randint(-30, 30)
        walk.append((t, y))
    r = diebold_mariano_frame(
        spark.createDataFrame(walk, "t long, qy long")
    ).collect()[0]
    assert r["mse_naive"] < r["mse_seasonal_naive"]
    assert r["dm_stat"] > 0


def test_competing_risks_mass_conservation_and_monotone(spark):
    rows = QUERIES["competing_risks_cif"](spark, SF_SMALL).collect()
    assert [r["horizon_days"] for r in rows] == [7, 14, 30, 45, 60]
    for r in rows:
        # AJ identity: incidences + survival partition the mass
        assert abs(r["mass_check"] - 1.0) < 1e-3
        assert 0 <= r["cif_returned"] <= 1
        assert 0 <= r["cif_fulfilled"] <= 1
    # cumulative incidence is monotone in the horizon
    for k in ("cif_returned", "cif_fulfilled"):
        vals = [r[k] for r in rows]
        assert vals == sorted(vals)
    # survival is monotone down
    sv = [r["surviving"] for r in rows]
    assert sv == sorted(sv, reverse=True)
