"""Hand-case / invariant tests for the eighth-wave queries (ledger
reflection identities, statistical diagnostics, LM screens, Hurst) —
the oracle gate proves engine parity; these pin the SEMANTICS: the
Lindley closed form is checked against the literal sequential
recurrence, the Brier decomposition against its algebraic identity,
κ/τ against tiny hand-computable inputs.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stream_processing_with_flink_study_spark.plans import QUERIES

from .conftest import SF_SMALL


def _lindley_loop(deltas: list[int]) -> list[int]:
    bal, out = 0, []
    for d in deltas:
        bal = max(0, bal + d)
        out.append(bal)
    return out


@given(st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_lindley_reflection_identity(deltas):
    """cs_t − min(0, running_min(cs_t)) IS the clamped recurrence
    max(0, b+Δ) — the identity every ledger query relies on."""
    cs, runmin, out = 0, 0, []
    for d in deltas:
        cs += d
        runmin = min(runmin, cs)
        out.append(cs - min(0, runmin))
    assert out == _lindley_loop(deltas)


def test_lindley_balance_spark_matches_loop(spark):
    """The windowed Spark form reproduces the sequential loop on a
    hand sequence that clamps twice."""
    deltas = [5, -10, 3, -1, -7, 20, -2]
    rows = [(1, i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(rows, "k long, i long, delta long")
    wo = (
        Window.partitionBy("k")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = (
        df.select(
            "i", F.sum("delta").over(wo).alias("cs")
        )
        .select(
            "i",
            (
                F.col("cs")
                - F.least(
                    F.min("cs").over(
                        Window.partitionBy()
                        .orderBy("i")
                        .rowsBetween(Window.unboundedPreceding, 0)
                    ),
                    F.lit(0),
                )
            ).alias("bal"),
        )
        .orderBy("i")
        .collect()
    )
    assert [r.bal for r in got] == _lindley_loop(deltas)


def test_lindley_registered_query_invariants(spark):
    out = QUERIES["lindley_clamped_balance"](spark, SF_SMALL).collect()
    assert len(out) > 0
    for r in out:
        assert r.final_balance_cents >= 0
        assert r.peak_balance_cents >= r.final_balance_cents
        assert 0 <= r.floor_hits <= r.n_events


def test_cusum_flags_planted_shift(spark):
    """A series that jumps +10σ halfway through must raise high-page
    alarms under the (0.5σ, 4σ) design; the pre-shift half must not."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randint(90, 110, size=200)
    shifted = np.concatenate([base[:100], base[100:] + 200])
    rows = [(1, i, int(v)) for i, v in enumerate(shifted)]
    df = spark.createDataFrame(rows, "k long, i long, cents long")
    n, s1, s2 = (
        df.agg(
            F.count("*"), F.sum("cents"), F.sum(F.col("cents") * F.col("cents"))
        ).first()
    )
    mu = s1 / n
    sigma = ((s2 - s1 * s1 / n) / (n - 1)) ** 0.5
    wo = (
        Window.partitionBy("k")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cs_hi = F.sum(F.col("cents") - F.lit(mu) - F.lit(0.5 * sigma)).over(wo)
    staged = df.select("i", cs_hi.alias("cs_hi"))
    sh = staged.select(
        "i",
        (
            F.col("cs_hi")
            - F.least(
                F.min("cs_hi").over(
                    Window.partitionBy()
                    .orderBy("i")
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
                F.lit(0),
            )
        ).alias("sh"),
    ).collect()
    alarms = [r.i for r in sh if r.sh > 4 * sigma]
    assert alarms and min(alarms) >= 100
    pre = [r.sh for r in sh if r.i < 100]
    assert max(pre) <= 4 * sigma


def test_interval_coverage_hand_case(spark):
    """[1,5] ∪ [3,8] ∪ [10,10] → coverage 9 days over 2 islands."""
    rows = [(1, 1, 5), (1, 3, 8), (1, 10, 10)]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    w_prev = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = df.select(
        "k",
        "s",
        "e",
        F.when(F.max("e").over(w_prev) >= F.col("s"), 0)
        .otherwise(1)
        .alias("ni"),
    )
    isl = g.select(
        "k",
        "s",
        "e",
        F.sum("ni")
        .over(
            Window.partitionBy("k")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("iid"),
    )
    per = (
        isl.groupBy("k", "iid")
        .agg((F.max("e") - F.min("s") + 1).alias("len"))
        .groupBy("k")
        .agg(F.sum("len").alias("cov"), F.count("*").alias("ni"))
        .first()
    )
    assert per.cov == 9 and per.ni == 2


def test_brier_decomposition_identity(spark):
    """BS = REL − RES + UNC holds exactly (constant-in-bin grid
    forecaster), up to the independent 6-dp output roundings."""
    r = QUERIES["brier_decomposition"](spark, SF_SMALL).first()
    assert r.brier_score == pytest.approx(
        r.reliability - r.resolution + r.uncertainty, abs=3e-6
    )
    assert 0.0 <= r.uncertainty <= 0.25 + 1e-9


def test_cohens_kappa_perfect_and_chance(spark):
    """Raters that always agree → κ=1; formula on hand counts."""
    # n11=40, n00=60, no disagreement
    po = (40 + 60) / 100
    pe = (40 / 100) ** 2 + (60 / 100) ** 2
    assert (po - pe) / (1 - pe) == pytest.approx(1.0)
    out = QUERIES["cohens_kappa_heuristics"](spark, SF_SMALL).collect()
    for r in out:
        assert r.n11 + r.n10 + r.n01 + r.n00 == r.n
        assert -1.0 - 1e-9 <= r.kappa <= 1.0 + 1e-9


def test_kendall_tau_hand_case(spark):
    """Perfectly concordant pairs → τ_b = 1; one swap drops it by
    exactly 2·swaps/n0 when tie-free."""
    xs = [1, 2, 3, 4]
    ys = [10, 20, 40, 30]  # one discordant pair (3,4)
    c = d = 0
    for i in range(4):
        for j in range(i + 1, 4):
            sx = (xs[j] - xs[i]) * (ys[j] - ys[i])
            c += sx > 0
            d += sx < 0
    assert (c, d) == (5, 1)
    assert (c - d) / 6 == pytest.approx(1 - 2 * 1 / 6)
    r = QUERIES["kendall_tau_monthly"](spark, SF_SMALL).first()
    assert r.concordant + r.discordant + r.ties_rev + r.ties_cnt >= (
        r.n_months * (r.n_months - 1) // 2
    ) - 1  # ties counted separately can overlap only on double ties
    assert -1.0 <= r.tau_b <= 1.0


def test_log_rank_chi2_nonnegative(spark):
    r = QUERIES["log_rank_survival"](spark, SF_SMALL).first()
    assert r.chi2 >= 0
    assert r.n_building > 0 and r.n_other > 0
    assert r.observed_events >= 0 and r.expected_events > 0
    assert r.reject_null == (r.chi2 > 3.8415)


def test_durbin_watson_in_range(spark):
    out = QUERIES["ols_residual_diagnostics"](spark, SF_SMALL).collect()
    assert len(out) == 3
    for r in out:
        assert 0.0 <= r.durbin_watson <= 4.0
        assert r.rho1 == pytest.approx(1 - r.durbin_watson / 2, abs=2e-4)
        assert r.bp_lm >= 0
        assert r.bp_reject == (r.bp_lm > 3.8415)


def test_pr_auc_bounds_and_prevalence_floor(spark):
    """AP is bounded by (prevalence, 1]; a random scorer's AP ≈
    prevalence, so AP must never dip meaningfully below it."""
    out = QUERIES["pr_auc_by_source"](spark, SF_SMALL).collect()
    assert out
    for r in out:
        assert 0.0 < r.average_precision <= 1.0 + 1e-9
        assert r.n_pos <= r.n


def test_jackknife_pseudovalues_average_to_theta(spark):
    """Mean of pseudovalues equals the plug-in estimate when group
    sizes are equal — and stays close for mildly unbalanced groups;
    influence must sum to ~G·(bias correction)."""
    out = QUERIES["jackknife_source_sensitivity"](spark, SF_SMALL).collect()
    assert out
    ses = {r.jackknife_se for r in out}
    assert len(ses) == 1 and ses.pop() > 0


def test_trigram_backoff_levels_partition(spark):
    out = QUERIES["trigram_backoff_xent"](spark, SF_SMALL).collect()
    assert out
    for r in out:
        assert (
            r.hits_trigram + r.hits_bigram + r.hits_unigram + r.oov
            == r.n_trigrams
        )
        assert r.xent_bits > 0


def test_flesch_reading_ease_formula_hand_case():
    """One 2-sentence 10-word doc with 14 syllables → FRE by hand."""
    words, sents, syl = 10, 2, 14
    fre = 206.835 - 1.015 * (words / sents) - 84.6 * (syl / words)
    assert fre == pytest.approx(206.835 - 5.075 - 118.44)


def test_hurst_output_shape(spark):
    out = QUERIES["hurst_rescaled_range"](spark, SF_SMALL).collect()
    assert [r.scale for r in out] == [8, 16, 32, 64, 128]
    hs = {r.hurst_exponent for r in out}
    assert len(hs) == 1
    h = hs.pop()
    assert 0.0 < h < 1.0
    rs_vals = [r.mean_rs for r in out]
    assert rs_vals == sorted(rs_vals)  # E[R/S] grows with scale


def test_proration_balances_every_order(spark):
    out = QUERIES["proration_largest_remainder"](spark, SF_SMALL).collect()
    assert len(out) == 5
    for r in out:
        assert r.balanced is True
        assert 0 <= r.lines_bumped <= r.n_lines


def test_proration_hand_case(spark):
    """T=100 cents over weights (1,1,1): base 33 each, 1 penny to the
    lowest line number among equal remainders — sums to exactly 100."""
    rows = [(1, i, 1, 100) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "ok long, ln long, w long, t long")
    base = df.withColumn(
        "ww", F.sum("w").over(Window.partitionBy("ok")).cast("long")
    ).select(
        "ok",
        "ln",
        "t",
        F.expr("t * w DIV ww").alias("a0"),
        F.expr("(t * w) % ww").alias("rem"),
    )
    wo = Window.partitionBy("ok")
    ranked = base.select(
        "*",
        F.row_number().over(wo.orderBy(F.desc("rem"), "ln")).alias("rk"),
        (F.col("t") - F.sum("a0").over(wo)).alias("left"),
    )
    alloc = {
        r.ln: r.a0 + (1 if r.rk <= r.left else 0)
        for r in ranked.collect()
    }
    assert alloc == {1: 34, 2: 33, 3: 33}
    assert sum(alloc.values()) == 100


def test_cdc_net_effect_synthetic_paths(spark):
    """All four net classes on a hand log: pre-existing updated key →
    UPDATE, pre-existing deleted → DELETE, new then deleted → NOOP,
    new surviving → INSERT."""
    from datetime import date

    rows = [
        # k=1: pre-window op, window update        -> UPDATE
        (1, date(1994, 1, 1), 1, "U"),
        (1, date(1996, 1, 1), 2, "U"),
        # k=2: pre-window op, window delete last   -> DELETE
        (2, date(1994, 2, 1), 3, "U"),
        (2, date(1996, 2, 1), 4, "U"),
        (2, date(1996, 3, 1), 5, "D"),
        # k=3: created and deleted inside window   -> NOOP
        (3, date(1996, 1, 1), 6, "U"),
        (3, date(1997, 1, 1), 7, "D"),
        # k=4: created inside window, survives     -> INSERT
        (4, date(1997, 5, 1), 8, "U"),
    ]
    log = spark.createDataFrame(rows, "k long, d date, okey long, op string")
    snap = date(1995, 1, 1)
    pre = (
        log.filter(F.col("d") < F.lit(snap))
        .select("k")
        .distinct()
        .withColumn("existed", F.lit(1))
    )
    win = (
        log.filter(F.col("d") >= F.lit(snap))
        .groupBy("k")
        .agg(
            F.max_by(
                "op",
                F.datediff("d", F.lit("1970-01-01")).cast("long")
                * F.lit(1000000000000)
                + F.col("okey"),
            ).alias("last_op")
        )
    )
    net = {
        r.k: r.net
        for r in win.join(pre, "k", "left")
        .select(
            "k",
            F.when(
                (F.col("last_op") == "D") & F.col("existed").isNotNull(),
                "DELETE",
            )
            .when(F.col("last_op") == "D", "NOOP")
            .when(F.col("existed").isNotNull(), "UPDATE")
            .otherwise("INSERT")
            .alias("net"),
        )
        .collect()
    }
    assert net == {1: "UPDATE", 2: "DELETE", 3: "NOOP", 4: "INSERT"}


def test_lindley_state_survives_checkpoint_restart(spark, tmp_path):
    """The clamped ledger's (cumsum, running-min) ValueState survives a
    query restart: batch 2 resumes from the committed floor instead of
    re-clamping from zero — post-restart balances equal the single-pass
    loop over the full delta sequence."""
    import os
    from datetime import datetime, timezone

    from stream_processing_with_flink_study_spark import streaming as S
    from stream_processing_with_flink_study_spark.streaming.stateful import (
        lindley_balance_partials,
    )

    deltas = [50, -120, 30, -10, 200, -500, 40, 40]
    rows = [
        (
            7,
            datetime(2024, 1, 1, 0, 0, i, tzinfo=timezone.utc),
            i,
            d,
        )
        for i, d in enumerate(deltas)
    ]
    mk = lambda rs: spark.createDataFrame(
        rs, "user_id long, ts timestamp, event_id long, delta long"
    )
    src, ck, out = (str(tmp_path / d) for d in ("src", "ck", "out"))

    def write_batch(df, i):
        d = f"{src}/b{i:05d}"
        df.coalesce(1).write.mode("append").parquet(d)
        for root, _, files in os.walk(d):
            for f_ in files:
                os.utime(
                    os.path.join(root, f_),
                    (1_600_000_000 + i, 1_600_000_000 + i),
                )

    schema = mk(rows[:1]).schema

    def run_once():
        sdf = S.file_stream(spark, f"{src}/b*", schema=schema)
        q = (
            lindley_balance_partials(sdf)
            .writeStream.outputMode("update")
            .foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch(mk(rows[:4]), 0)
    run_once()
    write_batch(mk(rows[4:]), 1)
    run_once()  # restart; only the second half is new input

    got = {r.t: r.bal for r in spark.read.parquet(out).collect()}
    assert len(got) == len(deltas)
    assert [got[i + 1] for i in range(len(deltas))] == _lindley_loop(deltas)


@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=12),
    st.integers(min_value=0, max_value=1_000_000),
)
@settings(max_examples=150, deadline=None)
def test_largest_remainder_properties(weights, target):
    """Hamilton proration: allocations sum EXACTLY to the target and
    each differs from the unrounded share by less than one cent."""
    ww = sum(weights)
    base = [target * w // ww for w in weights]
    rem = [(target * w) % ww for w in weights]
    leftover = target - sum(base)
    order = sorted(range(len(weights)), key=lambda i: (-rem[i], i))
    alloc = list(base)
    for i in order[:leftover]:
        alloc[i] += 1
    assert sum(alloc) == target
    for i, w in enumerate(weights):
        assert abs(alloc[i] - target * w / ww) < 1.0


def test_katz_hand_graph(spark):
    """Star graph: the hub's Katz score exceeds every leaf's, and a
    two-round hand computation matches the operator exactly."""
    from stream_processing_with_flink_study_spark.operators.graph import (
        katz_centrality,
    )

    # hub 0 <-> leaves 1..4, unit weights, symmetric
    edges = [(0, i, 1) for i in range(1, 5)] + [(i, 0, 1) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    out = {r.id: r.score for r in katz_centrality(df, iters=2).collect()}
    # dmax = weighted in-degree of hub = 4 -> alpha = 0.125
    a = 0.5 / 4
    # round 1: all scores = 1.  round 2: hub = 1 + a*4, leaf = 1 + a*1
    assert out[0] == pytest.approx(1 + a * 4, rel=1e-12)
    for leaf in range(1, 5):
        assert out[leaf] == pytest.approx(1 + a * 1, rel=1e-12)
    assert out[0] > out[1]


def test_littles_law_exact_identity(spark):
    r = QUERIES["concurrency_littles_law"](spark, SF_SMALL).first()
    assert r.little_exact is True
    assert r.busy_integral_ms == r.total_session_ms
    assert r.peak_concurrency >= 1
    # L = lambda * W in consistent units (identity, so near-exact)
    lam_per_min = r.lambda_per_hour / 60.0
    assert r.l_avg == pytest.approx(lam_per_min * r.w_mean_min, rel=1e-3)


def test_good_turing_bounds(spark):
    out = QUERIES["good_turing_vocab_richness"](spark, SF_SMALL).collect()
    assert out
    for r in out:
        assert 0.0 <= r.gt_unseen_mass <= 1.0
        assert r.chao1_richness >= r.vocab - 1e-9
        assert r.f1 + r.f2 <= r.vocab


def test_markov_entropy_bounded_by_log_states(spark):
    r = QUERIES["markov_entropy_rate"](spark, SF_SMALL).first()
    assert 0.0 <= r.entropy_rate_bits <= r.max_entropy_bits + 1e-9
    assert 0.0 <= r.predictability <= 1.0


def test_streaming_croston_matches_batch(spark):
    """The ValueState recursion and the recursive CTE agree row for
    row (bit-equal levels under identical rounding)."""
    batch = {
        r.idx: r for r in QUERIES["croston_intermittent"](
            spark, SF_SMALL
        ).collect()
    }
    stream = {
        r.idx: r for r in QUERIES["streaming_croston"](
            spark, SF_SMALL
        ).collect()
    }
    assert batch.keys() == stream.keys()
    for i in batch:
        assert batch[i].demand_level == stream[i].demand_level, i
        assert batch[i].interval_level == stream[i].interval_level, i
        assert batch[i].forecast_per_day == stream[i].forecast_per_day, i
