"""Planted-data law tests for the econometrics / causal wave.

These queries run the SAME SQL text in both engines, so the oracle
gate proves portability, not math.  Each estimator here must recover
a PLANTED truth: IV a confounded-away effect, RDD a jump, the Simpson
scan a constructed reversal, the ADF test a genuine random walk."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_econo import (
    iv_wald_frame,
    rdd_frame,
    simpson_frame,
)

from .conftest import SF_SMALL


def test_iv_recovers_effect_ols_misses(spark):
    # confounder u ∈ {0,1}: raises y by 50 AND makes treatment likelier;
    # instrument z is an independent coin that also nudges treatment.
    # true treatment effect = 10.  i%2 (z), (i//2)%2 (u), (i//4)%4
    # (noise) are exactly independent over range(1600).
    rows = []
    for i in range(1600):
        z = i % 2
        u = (i // 2) % 2
        x = 1 if (z + u + (1 if (i // 4) % 4 == 0 else 0)) >= 2 else 0
        y = 100 + 10 * x + 50 * u + (i // 4) % 4
        rows.append((z, x, y))
    base = spark.createDataFrame(rows, "z long, x long, y long")
    r = iv_wald_frame(base).collect()[0]
    # naive OLS absorbs the confounder (far above 10); IV does not
    assert r["ols_naive"] > 30
    assert abs(r["wald_iv"] - 10.0) < 5.0
    assert r["first_stage"] > 0.1  # strong instrument by construction
    assert r["first_stage_f"] > 10  # conventional relevance bar


def test_rdd_recovers_planted_jump(spark):
    # y = 100 + r/100 + 25·1[r ≥ 0] + tiny deterministic noise
    rows = []
    for i in range(-2000, 2000):
        r = i * 10  # running variable in [-20000, 20000)
        y = 100 + r // 100 + (25 if r >= 0 else 0) + (i % 3)
        rows.append((r, y))
    base = spark.createDataFrame(rows, "r long, y long")
    out = rdd_frame(base).collect()[0]
    assert abs(out["rd_effect"] - 25.0) < 1.5
    # both sides share the same true slope 0.01 => 100 per 10k
    assert abs(out["slope_left_per_10k"] - 100.0) < 5.0
    assert abs(out["slope_right_per_10k"] - 100.0) < 5.0


def test_simpson_scan_fires_on_constructed_reversal(spark):
    # two groups, each with slope -1, but group B sits far up AND far
    # right of group A => pooled slope is positive: the classic paradox
    rows = []
    for v in range(100):
        rows.append(("a", v, 200 - v))
        rows.append(("b", 1000 + v, 1300 - v))
    base = spark.createDataFrame(rows, "grp string, x long, y long")
    out = simpson_frame(base).collect()
    assert all(r["simpson_flag"] == 1 for r in out)
    assert all(abs(r["slope_within"] + 1.0) < 1e-6 for r in out)
    assert out[0]["slope_pooled"] > 0.5

    # control: aligned groups (no reversal) must NOT fire
    rows2 = [(g, v + off, 2 * (v + off)) for g, off in (("a", 0), ("b", 500))
             for v in range(100)]
    base2 = spark.createDataFrame(rows2, "grp string, x long, y long")
    assert all(r["simpson_flag"] == 0 for r in simpson_frame(base2).collect())


def test_adf_rejects_on_tpch_but_not_on_random_walk(spark):
    # registered query: daily TPC-H revenue is level-stationary
    r = QUERIES["adf_unit_root"](spark, SF_SMALL).collect()[0]
    assert r["reject_unit_root_5pct"] == 1
    assert r["phi"] < 0  # mean reversion pulls Δy against the level

    # planted random walk through the SAME SQL: must NOT reject
    from stream_processing_with_flink_study_spark.plans.queries_econo import (
        _ADF_SQL,
    )

    import random

    rng = random.Random(42)  # Mersenne Twister: stable across platforms
    steps = [rng.randint(-48, 48) for _ in range(800)]
    y, walk = 10_000, []
    for t, s in enumerate(steps):
        y += s
        walk.append((t, y))
    spark.createDataFrame(walk, "t long, y long").createOrReplaceTempView(
        "adf_walk"
    )
    sql = _ADF_SQL.replace("{MAT}", "")
    head = sql.index("lagged AS")
    out = spark.sql(
        "WITH " + sql[head:].replace("FROM days", "FROM adf_walk")
    ).collect()[0]
    assert out["reject_unit_root_5pct"] == 0
    assert abs(out["phi"]) < 0.05


def test_ljung_box_q_nonnegative_and_lags_complete(spark):
    rows = QUERIES["ljung_box_whiteness"](spark, SF_SMALL).collect()
    assert [r["lag"] for r in rows] == list(range(1, 8))
    assert rows[0]["ljung_box_q"] >= 0
    assert all(abs(r["acf"]) <= 1.0 + 1e-9 for r in rows)
    assert all(r["n_pairs"] <= rows[0]["n_obs"] for r in rows)


def test_engle_granger_tpch_yes_independent_walks_no(spark):
    from stream_processing_with_flink_study_spark.plans.queries_econo import (
        engle_granger_frame,
    )

    # common order flow drives both series: cointegrated
    r = QUERIES["engle_granger_cointegration"](spark, SF_SMALL).collect()[0]
    assert r["cointegrated_5pct"] == 1
    assert r["beta_long_run"] > 0

    # two INDEPENDENT random walks: the same machinery must refuse
    # (fixed seed — EG has 5% size by construction, so some draws DO
    # spuriously reject; seed 8 is a representative well-behaved walk)
    import random

    rng = random.Random(8)
    x = y = 10_000
    rows = []
    for t in range(800):
        x += rng.randint(-50, 50)
        y += rng.randint(-50, 50)
        rows.append((t, x, y))
    out = engle_granger_frame(
        spark.createDataFrame(rows, "t long, x long, y long")
    ).collect()[0]
    assert out["cointegrated_5pct"] == 0
