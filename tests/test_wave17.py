"""Law tests for wave 17: IPF survey raking."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_audit import (
    ipf_loop,
)

from .conftest import SF_SMALL


def test_ipf_attains_margins_and_preserves_odds_ratio():
    # planted 2x2 with odds ratio 6, raked to very different margins
    w = {("r1", "s1"): 300_000, ("r1", "s2"): 100_000,
         ("r2", "s1"): 100_000, ("r2", "s2"): 200_000}
    rt = {"r1": 700_000, "r2": 300_000}
    st = {"s1": 200_000, "s2": 800_000}
    out = ipf_loop(dict(w), rt, st)
    # margins attained to quantization precision
    assert abs(out[("r1", "s1")] + out[("r1", "s2")] - rt["r1"]) <= 5
    assert abs(out[("r2", "s1")] + out[("r2", "s2")] - rt["r2"]) <= 5
    assert abs(out[("r1", "s1")] + out[("r2", "s1")] - st["s1"]) <= 5
    # the IPF invariant: cell interactions (odds ratio) are preserved
    orat_base = (w[("r1", "s1")] * w[("r2", "s2")]) / (
        w[("r1", "s2")] * w[("r2", "s1")]
    )
    orat_rake = (out[("r1", "s1")] * out[("r2", "s2")]) / (
        out[("r1", "s2")] * out[("r2", "s1")]
    )
    assert abs(orat_rake - orat_base) < 0.01 * orat_base


def test_ipf_tpch_output_laws(spark):
    rows = QUERIES["ipf_raking_weights"](spark, SF_SMALL).collect()
    assert len(rows) == 25  # 5 regions x 5 segments
    assert abs(sum(r["base_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["raked_share"] for r in rows) - 1.0) < 1e-2
    assert all(r["max_margin_err"] < 1e-3 for r in rows)
    assert all(
        r["weight_factor"] is None or r["weight_factor"] > 0 for r in rows
    )
