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


def test_decision_stump_planted_separator(spark):
    from stream_processing_with_flink_study_spark.plans.queries_mlprep import (
        stump_frame,
    )

    # 'signal' reproduces y exactly; 'coin'/'coin2' are independent
    rows = []
    for i in range(1000):
        y = i % 2
        rows.append(("signal", y, y))
        rows.append(("coin", (i // 2) % 2, y))
        rows.append(("coin2", (i // 4) % 2, y))
    out = stump_frame(
        spark.createDataFrame(rows, "name string, v int, y int")
    ).collect()
    best = [r for r in out if r["is_best_split"] == 1]
    assert len(best) == 1 and best[0]["feature"] == "signal"
    # perfect separator: reduction equals the whole root Gini (0.5)
    assert abs(best[0]["gini_reduction"] - best[0]["gini_root"]) < 1e-6
    assert abs(best[0]["gini_root"] - 0.5) < 1e-6
    coins = [r for r in out if r["feature"] != "signal"]
    assert all(abs(r["gini_reduction"]) < 1e-3 for r in coins)


def test_decision_stump_tpch_sane(spark):
    rows = QUERIES["decision_stump_gini"](spark, SF_SMALL).collect()
    assert len(rows) == 4
    assert sum(r["is_best_split"] for r in rows) == 1
    assert all(r["gini_reduction"] >= -1e-9 for r in rows)
    assert all(0 <= r["gini_root"] <= 0.5 + 1e-9 for r in rows)
