"""Transport laws for the exact-integer Sinkhorn query."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_eval import (
    sinkhorn_from_counts,
)

from .conftest import SF_SMALL


def _run(spark, ra, rb):
    rows = [("a", i + 1, n) for i, n in enumerate(ra) if n] + [
        ("b", i + 1, n) for i, n in enumerate(rb) if n
    ]
    counts = spark.createDataFrame(rows, "seg string, i int, n long")
    return sinkhorn_from_counts(spark, counts).collect()[0]

def test_identical_marginals_give_zero_w1_and_tight_plan(spark):
    ra = [100, 200, 300, 400, 500, 500, 400, 300, 200, 100]
    r = _run(spark, ra, ra)
    assert r["w1_exact"] == 0.0
    # entropic plan still pays some blur cost, but converges tightly
    assert 0.0 <= r["sinkhorn_cost"] < 0.5
    assert r["max_marginal_err"] < 1e-3


def test_planted_two_decile_shift(spark):
    ra = [0, 0, 1000, 1000, 1000, 1000, 0, 0, 0, 0]
    rb = [0, 0, 0, 0, 1000, 1000, 1000, 1000, 0, 0]
    r = _run(spark, ra, rb)
    assert r["w1_exact"] == 2.0  # every unit of mass moves 2 deciles
    # a (near-)feasible plan can't beat the exact optimum materially
    assert r["sinkhorn_cost"] > 2.0 - 0.01
    assert r["sinkhorn_cost"] < 2.5  # ...and the blur is bounded
    assert r["max_marginal_err"] < 1e-3


def test_tpch_segments_query_sane(spark):
    r = QUERIES["sinkhorn_ot_segments"](spark, SF_SMALL).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    # two uniform-ish segments of the same distribution: near zero
    assert r["w1_exact"] < 1.0
    assert r["sinkhorn_cost"] >= 0.0
    assert r["max_marginal_err"] < 1e-2
