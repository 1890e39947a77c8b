"""Law tests for wave 20: CvM two-sample, CUSUM-of-squares, KPSS."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_stattests import (
    cvm_frame,
)
from stream_processing_with_flink_study_spark.plans.queries_tsfeat import (
    css_frame,
    kpss_frame,
)

from .conftest import SF_SMALL


def test_cvm_identical_vs_shifted(spark):
    same = [("x", v, i) for i, v in enumerate(range(300))] + [
        ("y", v, 1000 + i) for i, v in enumerate(range(300))
    ]
    s = cvm_frame(
        spark.createDataFrame(same, "src string, v long, rid long")
    ).collect()[0]
    assert s["reject_same_dist_5pct"] == 0
    shifted = [("x", v, i) for i, v in enumerate(range(300))] + [
        ("y", v + 150, 1000 + i) for i, v in enumerate(range(300))
    ]
    t = cvm_frame(
        spark.createDataFrame(shifted, "src string, v long, rid long")
    ).collect()[0]
    assert t["reject_same_dist_5pct"] == 1
    assert t["cvm_t"] > s["cvm_t"] + 1.0


def test_cvm_tpch_sane(spark):
    r = QUERIES["cramer_von_mises_doclen"](spark, SF_SMALL).collect()[0]
    assert r["n_en"] > 0 and r["n_de"] > 0
    # T is bounded below by its theoretical minimum -1/6 - small
    assert r["cvm_t"] > -0.2


def test_css_detects_planted_volatility_break(spark):
    # quiet first half (|d|<=5), loud second half (|d|~100)
    rows = []
    for t in range(600):
        amp = 5 if t < 300 else 100
        rows.append((t, amp * (1 if t % 2 == 0 else -1)))
    r = css_frame(
        spark.createDataFrame(rows, "t long, dq long")
    ).collect()[0]
    assert r["variance_break_flag"] == 1
    assert abs(r["break_day_idx"] - 300) < 15
    assert r["css_max_dev"] > 0.4

    # homoscedastic control: stays inside the band
    flat = [(t, 50 * (1 if t % 2 == 0 else -1)) for t in range(600)]
    c = css_frame(
        spark.createDataFrame(flat, "t long, dq long")
    ).collect()[0]
    assert c["variance_break_flag"] == 0


def test_css_tpch_sane(spark):
    r = QUERIES["cusum_squares_variance_break"](spark, SF_SMALL).collect()[0]
    assert 0 <= r["css_max_dev"] <= 1
    assert r["n_obs"] > 100


def test_kpss_adf_agreement_corner(spark):
    # TPC-H daily revenue: ADF rejects unit root AND KPSS keeps
    # stationarity — the tests agree from opposite nulls
    k = QUERIES["kpss_stationarity"](spark, SF_SMALL).collect()[0]
    a = QUERIES["adf_unit_root"](spark, SF_SMALL).collect()[0]
    assert k["reject_stationarity_5pct"] == 0
    assert a["reject_unit_root_5pct"] == 1

    # planted random walk: the opposite corner (KPSS rejects)
    import random

    rng = random.Random(11)
    y, rows = 100_000, []
    for t in range(800):
        y += rng.randint(-300, 300)
        rows.append((t + 1, y))
    w = kpss_frame(
        spark.createDataFrame(rows, "k long, q long")
    ).collect()[0]
    assert w["reject_stationarity_5pct"] == 1
    assert w["kpss_eta"] > k["kpss_eta"]


def test_dunn_posthoc_planted_shift_lights_its_pairs(spark):
    from stream_processing_with_flink_study_spark.plans.queries_stattests import (
        _DUNN_SQL,
    )

    # group 'a' shifted far up; b/c/d/e identical => exactly the 4
    # a-pairs significant, the 6 others not
    rows = []
    for g in ("a", "b", "c", "d", "e"):
        for v in range(200):
            rows.append((g, float(v) + (5000.0 if g == "a" else 0.0)))
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).createOrReplaceTempView("dunn_orders")
    out = spark.sql(
        _DUNN_SQL.replace("{orders}", "dunn_orders").replace("{MAT}", "")
    ).collect()
    assert len(out) == 10
    hot = [r for r in out if r["significant_bonferroni_5pct"] == 1]
    assert len(hot) == 4
    assert all("a" in (r["grp_a"], r["grp_b"]) for r in hot)


def test_dunn_tpch_rank_identity(spark):
    rows = QUERIES["dunn_posthoc_priority"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    # every group appears in exactly 4 pairs
    from collections import Counter

    c = Counter()
    for r in rows:
        c[r["grp_a"]] += 1
        c[r["grp_b"]] += 1
    assert all(v == 4 for v in c.values())
