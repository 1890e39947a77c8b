"""Law tests for wave 13: RANSAC, Allen interval census, Bass
diffusion, adstock grid fit."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_joins import (
    allen_census_frame,
)
from stream_processing_with_flink_study_spark.plans.queries_robust import (
    ransac_frame,
)
from stream_processing_with_flink_study_spark.plans.queries_tsfeat import (
    adstock_frame,
    bass_fit_frame,
)

from .conftest import SF_SMALL


def test_ransac_survives_contamination_ols_does_not(spark):
    # true line y = 1000 + 5t; every 5th point replaced by a strong
    # COUNTER-trend outlier that drags OLS negative but cannot win a
    # consensus vote
    rows = []
    for t in range(400):
        y = 1000 + 5 * t
        if t % 5 == 0:
            y = 200_000 - 500 * t
        rows.append((t, y))
    out = ransac_frame(
        spark.createDataFrame(rows, "t long, y long")
    ).collect()[0]
    assert abs(out["slope_ransac"] - 5.0) < 0.5
    assert out["slope_ols"] < 0  # OLS dragged counter-trend
    assert out["best_inliers"] >= 300  # the clean 80% forms consensus


def test_ransac_tpch_sane(spark):
    r = QUERIES["ransac_trend_fit"](spark, SF_SMALL).collect()[0]
    assert r["n_candidates"] == 64
    assert 0 < r["best_inliers"] <= r["n_days"]
    assert 0 < r["inlier_share"] <= 1


def test_allen_census_all_13_relations_and_partition(spark):
    # one hand-built pair per relation: census must return each once
    fixtures = {
        "precedes": (0, 2, 5, 8),
        "preceded_by": (5, 8, 0, 2),
        "meets": (0, 5, 5, 8),
        "met_by": (5, 8, 0, 5),
        "overlaps": (0, 6, 4, 9),
        "overlapped_by": (4, 9, 0, 6),
        "starts": (3, 5, 3, 9),
        "started_by": (3, 9, 3, 5),
        "during": (4, 6, 2, 9),
        "contains": (2, 9, 4, 6),
        "finishes": (6, 9, 2, 9),
        "finished_by": (2, 9, 6, 9),
        "equals": (3, 7, 3, 7),
    }
    df = spark.createDataFrame(
        list(fixtures.values()), "s1 long, e1 long, s2 long, e2 long"
    )
    out = {r["relation"]: r["n_pairs"] for r in allen_census_frame(df).collect()}
    assert out == {k: 1 for k in fixtures}  # bijection, no 'other'


def test_allen_census_tpch_partitions_everything(spark):
    rows = QUERIES["allen_interval_census"](spark, SF_SMALL).collect()
    assert all(r["relation"] != "other" for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_bass_recovers_planted_curve(spark):
    # exact discrete Bass: p=.03, q=.38, M=10000
    p, q, big_m = 0.03, 0.38, 10_000.0
    cum, rows = 0.0, []
    for m in range(60):
        n_t = (p * big_m + (q - p) * cum - q / big_m * cum * cum)
        n_t = max(0.0, n_t)
        rows.append((m, int(round(n_t))))
        cum += int(round(n_t))
    out = bass_fit_frame(
        spark.createDataFrame(rows, "m long, a long")
    ).collect()[0]
    assert abs(out["p_innovation"] - p) < 0.01
    assert abs(out["q_imitation"] - q) < 0.05
    assert abs(out["m_saturation_frac"] - 1.0) < 0.05
    peak_true = __import__("math").log(q / p) / (p + q)
    assert abs(out["peak_month"] - peak_true) < 1.0


def test_adstock_grid_picks_planted_theta(spark):
    # y is an exact theta=0.5 adstock of x (0.5^k weights are exact
    # binary fractions scaled x1024 to stay integral)
    xs = [((i * 37) % 101) + 10 for i in range(60)]
    rows = []
    for t in range(len(xs)):
        y = sum(
            int(1024 * 0.5**k) * xs[t - k]
            for k in range(0, min(9, t + 1))
        )
        rows.append((t, xs[t], y))
    out = adstock_frame(
        spark.createDataFrame(rows, "t long, x long, y long")
    ).collect()
    best = [r for r in out if r["is_best"] == 1]
    assert len(best) == 1 and best[0]["theta"] == 0.5
    assert best[0]["r2"] > 0.999
    assert all(r["r2"] < best[0]["r2"] + 1e-9 for r in out)


def test_adstock_tpch_sane(spark):
    rows = QUERIES["adstock_grid_fit"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    assert sum(r["is_best"] for r in rows) == 1
    assert all(0 <= r["r2"] <= 1 + 1e-9 for r in rows)


def test_quantile_regression_grid_matches_numpy_replica(spark, tmp_path):
    """Independent numpy replay of the exact-integer pinball grid: write
    a planted orders table (bimodal prices, zero trend), recompute every
    candidate's loss10 in numpy over the SAME literal grid, and assert
    the query returns the replica's argmin for both taus."""
    import datetime

    import numpy as np

    from stream_processing_with_flink_study_spark.plans.queries_robust import (
        QR_EPOCH,
        QR_INTERCEPTS,
        QR_SLOPES,
        QR_TAUS10,
    )
    from stream_processing_with_flink_study_spark.plans import QUERIES

    base = datetime.datetime(1995, 1, 1)
    rows = []
    for i in range(400):
        price = 150_000.0 if i % 2 == 0 else 350_000.37
        # both price levels on the SAME day — a tilted line can't
        # exploit a parity/time correlation, so the planted optimum
        # is the flat envelope edge
        rows.append((price, base + datetime.timedelta(days=3 * (i // 2))))
    spark.createDataFrame(
        rows, "o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )

    yc = np.array(
        [int(np.floor(p * 100.0 + 0.5)) for p, _ in rows], dtype=np.int64
    )
    epoch = datetime.datetime.strptime(QR_EPOCH, "%Y-%m-%d")
    x = np.array([(d - epoch).days for _, d in rows], dtype=np.int64)
    want = {}
    for t10 in QR_TAUS10:
        best = None
        for a in QR_INTERCEPTS:
            for b in QR_SLOPES:
                r = yc - (a + b * x)
                loss10 = int(
                    (t10 * r[r >= 0]).sum() + ((10 - t10) * -r[r < 0]).sum()
                )
                key = (loss10, a, b)
                if best is None or key < best:
                    best = key
        want[t10 / 10.0] = best
    got = {
        r["tau"]: r
        for r in QUERIES["quantile_regression_grid"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {0.5, 0.9}
    for tau, (loss10, a, b) in want.items():
        assert got[tau]["pinball_loss10_cents"] == loss10
        assert got[tau]["intercept_usd"] == round(a / 100.0, 2)
        assert got[tau]["slope_cents_per_day"] == b
    # planted truth: flat bimodal data -> zero slope, 90th line above median
    assert got[0.5]["slope_cents_per_day"] == 0
    assert got[0.9]["slope_cents_per_day"] == 0
    assert got[0.9]["intercept_usd"] >= got[0.5]["intercept_usd"]


def test_propensity_match_att_planted_matches(spark, tmp_path):
    """Hand-checkable nearest-control matching: gaps, a tie broken by
    control key, and a boundary treated unit with only one side."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES

    # (key, bal, segment): treated = BUILDING
    cust = [
        (1, 100.00, "BUILDING"),   # controls at 90 / 105 -> 105 (5 < 10)
        (2, 200.00, "BUILDING"),   # controls at 195 / 205 -> tie -> key 20
        (3, 10.00, "BUILDING"),    # below every control -> nearest above 90
        (10, 90.00, "MACHINERY"),
        (11, 105.00, "MACHINERY"),
        (20, 195.00, "FURNITURE"),
        (21, 205.00, "FURNITURE"),
    ]
    spark.createDataFrame(
        [(k, "n", 0, b, s) for k, b, s in cust],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    # outcomes: spend = key * $10 (one order each), customers 3/21 idle
    d = datetime.datetime(1995, 6, 1)
    orders = [(k, k * 10.0, d) for k, _, _ in cust if k not in (3, 21)]
    spark.createDataFrame(
        orders, "o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    r = QUERIES["propensity_match_att"](spark, str(tmp_path)).collect()[0]
    assert r["n_treated"] == 3
    # matches: 1->11 (outc 110), 2->20 (tie on gap 5, smaller key), 3->10
    treated_out = [10.0, 20.0, 0.0]
    matched_out = [110.0, 200.0, 100.0]
    n = 3
    assert r["avg_treated_usd"] == round(sum(treated_out) / n, 4)
    assert r["avg_matched_usd"] == round(sum(matched_out) / n, 4)
    assert r["att_usd"] == round(
        sum(t - m for t, m in zip(treated_out, matched_out)) / n, 4
    )


def test_rmst_planted_half_censored(spark, tmp_path):
    """Hand-computable RMST with an event PAST the first horizon: 40
    customers order at day 0; 20 reorder at day 10, 10 more at day 150,
    10 never (censored at the day-400 horizon).  S(t) = 1 on [0,10),
    0.5 on [10,150), 0.25 on [150,400) =>
    RMST(90) = 10 + 80*0.5 = 50, RMST(180) = 10 + 140*0.5 + 30*0.25,
    RMST(365) = 10 + 140*0.5 + 215*0.25.  The day-150 step sitting
    BETWEEN tau=90 and tau=180 pins the round-9 advice fix:
    surv_at_horizon(90) must be S(10)=0.5 (last step <= 90), not the
    globally-last step S(150)=0.25."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES

    base = datetime.datetime(1995, 1, 1)
    rows = []
    for k in range(40):
        rows.append((k, 100 + k, 1000.0, base))
        if k % 2 == 0:
            rows.append((k, 200 + k, 1000.0, base + datetime.timedelta(days=10)))
        elif k % 4 == 1:
            rows.append((k, 300 + k, 1000.0, base + datetime.timedelta(days=150)))
    # one sentinel customer fixing the horizon at day 400
    rows.append((99, 999, 1000.0, base + datetime.timedelta(days=400)))
    spark.createDataFrame(
        rows,
        "o_custkey long, o_orderkey long, o_totalprice double,"
        " o_orderdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {
        r.tau_days: r
        for r in QUERIES["rmst_repurchase"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {90, 180, 365}
    # the sentinel customer is censored at t=0 and exits the risk set
    # BEFORE day 10, so S(10) = (40-20)/40 = 0.5 and
    # S(150) = 0.5 * (20-10)/20 = 0.25 exactly
    s10, s150 = 0.5, 0.25
    assert abs(out[90].rmst_days - (10 + 80 * s10)) < 1e-3
    assert abs(out[180].rmst_days - (10 + 140 * s10 + 30 * s150)) < 1e-3
    assert abs(out[365].rmst_days - (10 + 140 * s10 + 215 * s150)) < 1e-3
    # S(tau) is the LAST step at or before tau, per horizon
    assert out[90].surv_at_horizon == round(s10 - 1e-9, 4)
    assert out[180].surv_at_horizon == round(s150 - 1e-9, 4)
    assert out[365].surv_at_horizon == round(s150 - 1e-9, 4)
    # laws: monotone in tau, bounded by tau, >= tau * S(tau)
    assert out[90].rmst_days <= out[180].rmst_days <= out[365].rmst_days
    for tau, r in out.items():
        assert r.rmst_days <= tau + 1e-9
        assert r.rmst_days >= tau * 0  # nonneg


def test_kalman_planted_constant_series(spark, tmp_path):
    """A constant monthly series: innovations are exactly 0 after the
    seed row, the level never moves, and the data-independent gain
    ladder starts at (P0+Q)/(P0+Q+R) and decreases monotonically toward
    the steady state (the filter trusting its own level more each
    step)."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES
    from stream_processing_with_flink_study_spark.plans.queries_queueing import (
        KALMAN_Q,
        KALMAN_R,
    )

    rows = []
    for m in range(12):
        rows.append(
            (m, m, 100.0, datetime.datetime(1995, 1 + m % 12, 15))
        )
    spark.createDataFrame(
        rows,
        "o_custkey long, o_orderkey long, o_totalprice double,"
        " o_orderdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = sorted(
        QUERIES["kalman_local_level"](spark, str(tmp_path)).collect(),
        key=lambda r: r.idx,
    )
    assert len(out) == 12
    assert all(r.y_usd == 100.0 for r in out)
    assert all(r.level_usd == 100.0 for r in out)
    assert all(r.innovation_usd == 0.0 for r in out[1:])
    g1 = (KALMAN_R + KALMAN_Q) / (KALMAN_R + KALMAN_Q + KALMAN_R)
    assert abs(out[1].gain - round(g1, 6)) < 1e-9
    gains = [r.gain for r in out[1:]]
    assert gains == sorted(gains, reverse=True)  # monotone to steady state
    assert gains[-1] > 0.2  # steady-state gain for Q/R = 0.1 is ~0.27


def test_dtw_planted_ramp_scores_zero(spark, tmp_path):
    """A 12-hour window whose counts are exactly [1..8,8,8,8,8]
    min-max-normalizes to the ramp pattern on its first 8 points, so
    subsequence DTW (free end) must score it 0 and rank it first;
    every other window costs more."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES

    base = datetime.datetime(2024, 5, 1)
    counts = [3, 3, 3, 1, 2, 3, 4, 5, 6, 7, 8, 8, 8, 8, 8, 3, 3, 3, 3, 3]
    rows = []
    eid = 0
    for hour, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, "ramp", base + datetime.timedelta(hours=hour, minutes=eid % 50))
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = sorted(
        QUERIES["dtw_subsequence_match"](spark, str(tmp_path)).collect(),
        key=lambda r: r.rk,
    )
    assert out[0].rk == 1 and out[0].dtw_cost == 0
    # free start/end: EVERY window fully containing the ramp (starts
    # at hours 0..3) scores 0; the (cost, h) tie-break ranks the
    # earliest first
    zero_starts = [
        int((base + datetime.timedelta(hours=h)).timestamp() * 1000)
        for h in range(4)
    ]
    zeros = [r for r in out if r.dtw_cost == 0]
    assert [r.h_ms for r in zeros] == zero_starts
    assert all(r.dtw_cost > 0 for r in out[len(zeros):])
    # costs are ranked ascending with (cost, h) ties deterministic
    assert [r.dtw_cost for r in out] == sorted(r.dtw_cost for r in out)


def test_arch_lm_planted_volatility_clustering(spark, tmp_path):
    """Planted regime-switching series — 15 calm days (±$1 changes)
    then 15 wild days (±$400), repeated — has strongly autocorrelated
    squared changes: the LM statistic must blow past the chi²(1) 5%
    bar and rho must be positive and large."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES

    base = datetime.datetime(1995, 1, 1)
    rows, level, okey = [], 100_000.0, 0
    for d in range(120):
        calm = (d // 15) % 2 == 0
        mag = 1.0 if calm else 400.0
        level += mag if d % 2 == 0 else -mag
        rows.append((okey, okey, level, base + datetime.timedelta(days=d)))
        okey += 1
    spark.createDataFrame(
        rows,
        "o_custkey long, o_orderkey long, o_totalprice double,"
        " o_orderdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    r = QUERIES["arch_lm_test"](spark, str(tmp_path)).collect()[0]
    assert r.n_pairs == 118
    assert -1.0 - 1e-9 <= r.rho_sq_lag1 <= 1.0 + 1e-9
    assert r.rho_sq_lag1 > 0.5  # squares cluster by construction
    assert r.lm_stat >= 0
    assert bool(r.arch_at_5pct) is True


def test_ucb1_replay_planted_hand_trace(spark, tmp_path):
    """Hand-traced replay: init round-robin matches all 5 arms; a
    rewarded 'click' keeps UCB exploiting it for two more matched
    rounds; the third repeat is rejected (policy switches to explore
    'error') so the last logged event does NOT match."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES

    base = datetime.datetime(2024, 3, 1)
    # (arm, value): $60 > $50 is a win, $10 is not
    log = [
        ("click", 60.0), ("error", 10.0), ("purchase", 10.0),
        ("signup", 10.0), ("view", 10.0),
        ("click", 60.0),   # exploit: ucb_c max after its win -> match
        ("click", 10.0),   # still max (2.18 vs 1.97) -> match
        ("click", 10.0),   # now 1.84 < 2.04 -> policy picks error: NO
    ]
    rows = [
        (i, 7, t, base + datetime.timedelta(minutes=i), v)
        for i, (t, v) in enumerate(log)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.arm: r
        for r in QUERIES["ucb1_bandit_replay"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {"click", "error", "purchase", "signup", "view"}
    c = got["click"]
    assert (c.n_plays, c.n_wins) == (3, 2)
    assert c.win_rate == round(2 / 3 - 1e-9, 4)
    for a in ("error", "purchase", "signup", "view"):
        assert (got[a].n_plays, got[a].n_wins) == (1, 0)
    assert all(r.matched_rounds == 7 and r.steps == 8 for r in got.values())


def test_theta_constant_series_is_fixed_point(spark, tmp_path):
    """A constant monthly series is a fixed point of the whole Theta
    pipeline: OLS slope 0, theta-2 line == the series, SES == the
    level, every horizon's forecast == the level exactly."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES

    rows = [
        (m, m, 100.0, datetime.datetime(1995, 1 + m, 15))
        for m in range(12)
    ]
    spark.createDataFrame(
        rows,
        "o_custkey long, o_orderkey long, o_totalprice double,"
        " o_orderdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = sorted(
        QUERIES["theta_method_forecast"](spark, str(tmp_path)).collect(),
        key=lambda r: r.horizon,
    )
    assert [r.horizon for r in out] == [1, 2, 3, 4, 5, 6]
    for r in out:
        assert r.trend_usd == 100.0
        assert r.ses_theta2_usd == 100.0
        assert r.forecast_usd == 100.0
