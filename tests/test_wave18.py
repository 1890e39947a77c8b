"""Law tests for wave 18: Mahalanobis, Cronbach's alpha, Fleiss kappa."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_diag import (
    fleiss_frame,
    mahalanobis_frame,
)

from .conftest import SF_SMALL


def test_mahalanobis_catches_off_ridge_point(spark):
    # cloud on the y = x ridge; the planted point (800, -800) is
    # MODEST on both marginals yet far off the correlation ridge
    rows = []
    for i in range(500):
        c = (i - 249.5) * 8
        rows.append((i, int(c), int(c) + ((i * 7) % 21 - 10)))
    rows.append((9999, 800, -800))
    out = mahalanobis_frame(
        spark.createDataFrame(rows, "vec_id long, x long, y long")
    ).collect()
    assert out[0]["vec_id"] == 9999
    assert out[0]["outlier_chi2_99"] == 1
    # marginal check: |800| is inside the cloud's 1-sigma x-range
    assert abs(800) < 249.5 * 8


def test_mahalanobis_tpch_sane(spark):
    rows = QUERIES["mahalanobis_outliers_2d"](spark, SF_SMALL).collect()
    assert len(rows) == 10
    vals = [r["mahalanobis_d2"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert all(v >= 0 for v in vals)


def test_cronbach_alpha_poles(spark, tmp_path):
    # pole 1: all 8 dims identical => perfect internal consistency
    import math

    rows_dup, rows_ind = [], []
    for i in range(400):
        v = math.sin(i * 0.37) * 0.3
        rows_dup.append((i, [float(v)] * 8, 0))
        ind = [
            0.3 * math.sin(i * 0.37 + 1.7 * d + 0.61 * i * d)
            for d in range(8)
        ]
        rows_ind.append((i, [float(x) for x in ind], 0))
    for tag, rows in (("dup", rows_dup), ("ind", rows_ind)):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / tag / "embeddings.parquet")
        )
    a_dup = QUERIES["cronbach_alpha_embedding"](
        spark, str(tmp_path / "dup")
    ).collect()[0]
    a_ind = QUERIES["cronbach_alpha_embedding"](
        spark, str(tmp_path / "ind")
    ).collect()[0]
    assert a_dup["cronbach_alpha"] > 0.99
    assert abs(a_ind["cronbach_alpha"]) < 0.35
    assert a_dup["cronbach_alpha"] > a_ind["cronbach_alpha"]


def test_fleiss_kappa_poles(spark):
    # unanimous raters: kappa exactly 1
    rows = [(v, v, v) for v in (0, 1) for _ in range(200)]
    u = fleiss_frame(
        spark.createDataFrame(rows, "r1 int, r2 int, r3 int")
    ).collect()[0]
    assert u["fleiss_kappa"] == 1.0
    assert u["observed_agreement"] == 1.0

    # independent coin raters (disjoint bit positions): kappa ~ 0
    rows2 = [
        (i % 2, (i // 2) % 2, (i // 4) % 2) for i in range(800)
    ]
    c = fleiss_frame(
        spark.createDataFrame(rows2, "r1 int, r2 int, r3 int")
    ).collect()[0]
    assert abs(c["fleiss_kappa"]) < 0.02
    assert abs(c["chance_agreement"] - 0.5) < 0.01


def test_fleiss_tpch_sane(spark):
    r = QUERIES["fleiss_kappa_heuristics"](spark, SF_SMALL).collect()[0]
    assert -1.0 <= r["fleiss_kappa"] <= 1.0
    assert 0 <= r["observed_agreement"] <= 1
    assert 0.5 - 1e-9 <= r["chance_agreement"] <= 1
