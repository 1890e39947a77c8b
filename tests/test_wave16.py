"""Law tests for wave 16: Hill tail index, Gumbel return levels."""

from __future__ import annotations

import math

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_robust import (
    gumbel_frame,
    hill_frame,
)

from .conftest import SF_SMALL


def test_hill_recovers_planted_pareto_alpha(spark):
    # exact Pareto(alpha=2) by inverse CDF on a grid: x = xm/(1-u)^(1/2)
    n, alpha, xm = 5000, 2.0, 10_000.0
    rows = []
    for i in range(n):
        u = (i + 0.5) / n
        rows.append((int(round(xm / (1.0 - u) ** (1.0 / alpha))),))
    out = hill_frame(spark.createDataFrame(rows, "cents long")).collect()
    assert [r["top_k"] for r in out] == [50, 100, 200]
    for r in out:
        assert abs(r["tail_alpha"] - alpha) < 0.35
        assert abs(r["hill_gamma"] - 1.0 / alpha) < 0.1
    # threshold decreases as k grows (deeper into the distribution)
    th = [r["threshold_usd"] for r in out]
    assert th == sorted(th, reverse=True)


def test_hill_tpch_light_tail(spark):
    out = QUERIES["hill_tail_index"](spark, SF_SMALL).collect()
    # bounded order values: decidedly NOT alpha<2 heavy-tailed
    assert all(r["tail_alpha"] > 2 for r in out)
    assert all(r["hill_gamma"] > 0 for r in out)


def test_gumbel_recovers_planted_parameters(spark):
    # exact Gumbel(mu=5000, beta=800) grid sample via inverse CDF
    mu, beta, n = 5000.0, 800.0, 200
    rows = []
    for i in range(n):
        u = (i + 0.5) / n
        rows.append((int(round(mu - beta * math.log(-math.log(u)))),))
    out = gumbel_frame(spark.createDataFrame(rows, "m long")).collect()
    r5 = out[0]
    assert abs(r5["gumbel_mu_usd"] / 100.0 - mu) < 0.05 * mu
    assert abs(r5["gumbel_beta_usd"] / 100.0 - beta) < 0.1 * beta
    # exact return-level identity at the fitted parameters
    for r in out:
        t = r["t_years"]
        expect = (
            r["gumbel_mu_usd"]
            - r["gumbel_beta_usd"] * math.log(-math.log(1.0 - 1.0 / t))
        )
        assert abs(r["return_level_usd"] - expect) < 0.02
    levels = [r["return_level_usd"] for r in out]
    assert levels == sorted(levels)  # monotone in T


def test_gumbel_tpch_sane(spark):
    out = QUERIES["gumbel_return_levels"](spark, SF_SMALL).collect()
    assert [r["t_years"] for r in out] == [5, 10, 50]
    assert all(r["n_blocks"] >= 5 for r in out)
    assert all(
        r["return_level_usd"] >= r["gumbel_mu_usd"] - 1e-6 for r in out
    )
