"""Laws + planted-signal checks for the stat-tests wave.

Both engines run the SAME SQL text for these queries, so the oracle
gate proves dialect portability, not correctness — these tests pin the
math independently: exact rank-sum identities, completeness laws, and
planted shifts the statistics MUST detect (the Page-Hinkley lesson:
a telescoped-to-zero statistic passes a shared-SQL oracle forever)."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_stattests import (
    _KW_SQL,
    _SPARK,
    _render,
)

from .conftest import SF_MEDIUM, SF_SMALL


def test_kruskal_wallis_rank_identity_and_tie_correction(spark):
    rows = QUERIES["kruskal_wallis_priority"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    n = sum(r["n"] for r in rows)
    # average ranks are exact halves: Σ n_g·mean_rank_g == N(N+1)/2
    total_rank = sum(r["n"] * r["mean_rank"] for r in rows)
    assert abs(total_rank - n * (n + 1) / 2) < 1e-4 * n
    h, hc = rows[0]["h"], rows[0]["h_tie_corrected"]
    assert h >= 0
    assert hc >= h - 1e-9  # correction factor ≤ 1 inflates H


def test_kruskal_wallis_detects_planted_shift(spark):
    # same SQL the registered query runs, over synthetic groups:
    # identical distributions → H ≈ 0; one shifted group → H large
    base = [(g, float(v)) for g in ("a", "b", "c") for v in range(200)]
    shifted = [
        (g, float(v) + (1000.0 if g == "a" else 0.0))
        for g in ("a", "b", "c")
        for v in range(200)
    ]
    out = {}
    for tag, data in (("null", base), ("shift", shifted)):
        df = spark.createDataFrame(
            data, "o_orderpriority string, o_totalprice double"
        )
        df.createOrReplaceTempView("kw_orders")
        out[tag] = spark.sql(
            _render(_KW_SQL, _SPARK)
            .replace("{orders}", "kw_orders")
            .replace("{MAT}", "")
        ).collect()[0]["h_tie_corrected"]
    assert out["null"] < 1.0  # identical groups: no signal
    assert out["shift"] > 100.0  # one group dominates the top ranks


def test_friedman_rank_sum_identity(spark):
    # sf0.001 has no complete order-weeks (~0.6 orders/day); sf0.01 does
    rows = QUERIES["friedman_weekday_revenue"](spark, SF_MEDIUM).collect()
    assert len(rows) == 7
    b = rows[0]["n_weeks"]
    assert b > 0
    # within each complete week ranks sum to 28 → Σ rank_sums = 28b
    assert abs(sum(r["rank_sum"] for r in rows) - 28 * b) < 1e-3
    assert rows[0]["friedman_chi2"] >= -1e-9


def test_cliffs_delta_pair_completeness(spark):
    r = QUERIES["cliffs_delta_doclen"](spark, SF_SMALL).collect()[0]
    # every (en, de) pair is counted exactly once
    assert r["n_gt"] + r["n_lt"] + r["n_eq"] == r["n_en"] * r["n_de"]
    assert -1.0 <= r["cliffs_delta"] <= 1.0


def test_mcnemar_continuity_correction_bounds(spark):
    for r in QUERIES["mcnemar_doc_heuristics"](spark, SF_SMALL).collect():
        if r["mcnemar_chi2"] is not None:
            assert r["mcnemar_chi2"] >= 0
            assert r["mcnemar_cc"] <= r["mcnemar_chi2"] + 1e-9


def test_cmh_and_bartlett_laws(spark):
    cmh = QUERIES["cmh_lang_length"](spark, SF_SMALL).collect()[0]
    assert cmh["k_strata"] == 20
    assert cmh["cmh_chi2"] >= 0
    assert cmh["mh_common_odds_ratio"] > 0
    rows = QUERIES["bartlett_priority"](spark, SF_SMALL).collect()
    # Jensen: the Bartlett statistic is non-negative by log-concavity
    assert rows[0]["bartlett_stat"] >= -1e-9
    assert all(r["var_usd2"] > 0 for r in rows)


def test_brown_forsythe_outputs(spark):
    rows = QUERIES["brown_forsythe_priority"](spark, SF_SMALL).collect()
    assert len(rows) == 5
    assert rows[0]["brown_forsythe_w"] >= 0
    assert all(r["mean_abs_dev_usd"] >= 0 for r in rows)
    assert all(r["median_usd"] > 0 for r in rows)
    assert rows[0]["df1"] == 4
    assert rows[0]["df2"] == sum(r["n"] for r in rows) - 5


def test_newsvendor_fractile_beats_mean_stock(spark):
    # the empirical critical fractile MINIMIZES empirical newsvendor
    # cost, so it cannot lose to stocking the mean — an optimality law
    # the shared-SQL oracle could never certify
    r = QUERIES["newsvendor_stock_level"](spark, SF_SMALL).collect()[0]
    assert r["exp_cost_star"] <= r["exp_cost_mean_stock"] + 1e-9
    assert 0 <= r["savings_share"] <= 1
    assert r["q_star"] >= r["q_mean"]  # cu >> co pushes the stock UP


def test_var_cvar_tail_ordering(spark):
    r = QUERIES["var_cvar_daily_revenue"](spark, SF_SMALL).collect()[0]
    # the mean of the worst 5% is at least as bad as its best member
    assert r["cvar95_usd"] >= r["var95_usd"] - 1e-9
    assert r["n_days"] > 100


def test_dft_power_shares_partition(spark):
    rows = QUERIES["dft_periodogram_daily"](spark, SF_SMALL).collect()
    assert [r["period_days"] for r in rows] == [7, 30, 91, 365]
    assert abs(sum(r["power_share"] for r in rows) - 1.0) < 1e-3
    assert all(r["amplitude_usd"] >= 0 for r in rows)


def test_privacy_audit_consistency(spark):
    ld = QUERIES["l_diversity_audit"](spark, SF_SMALL).collect()[0]
    # entropy-l never exceeds distinct-l (Jensen), both >= 1
    assert 1 <= ld["entropy_l_min"] <= ld["l_min"] + 1e-9 or ld[
        "l_min"
    ] >= ld["entropy_l_min"] - 1e-9
    tc = QUERIES["t_closeness_audit"](spark, SF_SMALL).collect()[0]
    assert 0 <= tc["mean_emd"] <= tc["t_closeness"] <= 1


def test_naive_bayes_confusion_laws_and_planted_separability(spark):
    rows = QUERIES["naive_bayes_lang_eval"](spark, SF_SMALL).collect()
    n_test = sum(r["n_true"] for r in rows)
    assert sum(r["n_pred"] for r in rows) == n_test  # every doc predicted once
    assert all(r["tp"] <= min(r["n_true"], r["n_pred"]) for r in rows)
    total_tp = sum(r["tp"] for r in rows)
    assert abs(rows[0]["accuracy"] - total_tp / n_test) < 1e-3

    # planted separable corpus: disjoint vocabularies MUST classify
    # perfectly — catches any scoring/argmax bug the shared-pool
    # driver corpus (acc ~0.42 by data ceiling) would hide
    from stream_processing_with_flink_study_spark.plans.queries_lm import (
        nb_lang_eval_frame,
    )

    data = []
    for i in range(120):
        lang = ("aa", "bb", "cc")[i % 3]
        word = {"aa": "apfel", "bb": "baum", "cc": "chat"}[lang]
        data.append((i, lang, (word + " ") * 5 + "shared filler"))
    docs = spark.createDataFrame(data, "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in nb_lang_eval_frame(docs).collect()}
    assert out["aa"]["accuracy"] == 1.0
    assert all(r["f1"] == 1.0 for r in out.values())


def test_ipw_removes_planted_confounding(spark):
    # two strata; treatment assignment AND outcome both depend on the
    # stratum, treatment itself has zero effect: the naive diff must be
    # visibly nonzero, the stratified-IPW estimate near zero
    from stream_processing_with_flink_study_spark.plans.queries_cdc import (
        ipw_ate_frame,
    )

    rows = []
    # stratum A: 80% treated, outcome rate 0.6 regardless of t
    # stratum B: 20% treated, outcome rate 0.1 regardless of t
    # t keys off i%10, y off (i//10)%10 — exactly independent over
    # range(1000), so the within-stratum effect is exactly zero
    for i in range(1000):
        rows.append(
            ("A", 1 if i % 10 < 8 else 0, 1 if (i // 10) % 10 < 6 else 0)
        )
        rows.append(
            ("B", 1 if i % 10 < 2 else 0, 1 if (i // 10) % 10 < 1 else 0)
        )
    base = spark.createDataFrame(rows, "s string, t int, y int")
    r = ipw_ate_frame(base).collect()[0]
    assert abs(r["naive_diff"]) > 0.1  # confounding clearly visible
    assert abs(r["ate_ipw"]) < 0.005  # ...and removed by stratified IPW
    assert abs(r["confounding_bias"]) > 0.1


def test_chow_supf_positive_and_trimmed(spark):
    r = QUERIES["chow_supf_break_scan"](spark, SF_SMALL).collect()[0]
    assert r["sup_f"] >= 0  # split can only reduce SSE
    assert r["n_candidates"] > 10
    assert 0 < r["break_day_idx"]


def test_granger_both_directions(spark):
    rows = QUERIES["granger_count_revenue"](spark, SF_SMALL).collect()
    assert sorted(r["direction"] for r in rows) == [
        "count->revenue",
        "revenue->count",
    ]
    assert all(r["granger_f"] >= -1e-9 for r in rows)


def test_jarque_bera_planted_distributions(spark):
    from stream_processing_with_flink_study_spark.plans.queries_stattests import (
        jarque_bera_frame,
    )

    # near-uniform symmetric series: platykurtic but mild -> JB driven
    # by kurtosis; heavy-tailed spiky series must reject hard
    uniform = [(((i * 2654435761) % 2001) - 1000,) for i in range(2000)]
    # spikes sized so sum(d^4) stays inside int64 (the registered
    # query guarantees this via share units; a raw frame must too)
    spiky = [
        ((12_000 if i % 200 == 0 else 0) * (1 if i % 400 == 0 else -1)
         + ((i * 31) % 21) - 10,)
        for i in range(2000)
    ]
    u = jarque_bera_frame(
        spark.createDataFrame(uniform, "q long")
    ).collect()[0]
    s = jarque_bera_frame(
        spark.createDataFrame(spiky, "q long")
    ).collect()[0]
    # uniform: symmetric => skew ~ 0; kurtosis of uniform = -1.2
    assert abs(u["skewness"]) < 0.1
    assert abs(u["excess_kurtosis"] + 1.2) < 0.1
    # spiky: gigantic excess kurtosis, overwhelming rejection
    assert s["excess_kurtosis"] > 50
    assert s["reject_normality_5pct"] == 1
    assert s["jb_stat"] > u["jb_stat"]


def test_jarque_bera_tpch_sane(spark):
    r = QUERIES["jarque_bera_daily_changes"](spark, SF_SMALL).collect()[0]
    assert r["n_obs"] > 100
    assert r["jb_stat"] >= 0
