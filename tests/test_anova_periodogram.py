"""Planted-truth tests for the round-8 inference additions: one-way
ANOVA and the quantized-trig periodogram (the shared-bug-oracle
defense — the DuckDB gate proves engine agreement, these prove the
formulas point at the truth)."""

from __future__ import annotations

import math

from stream_processing_with_flink_study_spark.plans.queries_stattests import (
    _PRIORITIES,
    anova_frame,
)
from stream_processing_with_flink_study_spark.plans.queries_tsfeat import (
    periodogram_frame,
)


def _anova(spark, rows):
    return anova_frame(
        spark, spark.createDataFrame(rows, "grp string, q long")
    ).collect()[0]


def test_anova_null_pole_independent_groups(spark):
    """Group from i%5, value from disjoint digits of i: exactly zero
    planted effect — F must sit low and the 5% gate must not fire."""
    rows = [
        (_PRIORITIES[i % 5], 1000 + (i // 5) % 97 * 3) for i in range(2000)
    ]
    r = _anova(spark, rows)
    assert r["reject_equal_means_5pct"] == 0, r
    assert r["f_stat"] < 2.0


def test_anova_shifted_group_rejects(spark):
    """One group shifted by ~1 within-group SD on n=400/group: a
    textbook large-sample detection — F far over the bar."""
    rows = [
        (
            _PRIORITIES[i % 5],
            1000 + (i // 5) % 97 * 3 + (150 if i % 5 == 2 else 0),
        )
        for i in range(2000)
    ]
    r = _anova(spark, rows)
    assert r["reject_equal_means_5pct"] == 1, r
    assert r["f_stat"] > 10


def test_anova_sum_of_squares_decomposition(spark):
    """SSB + SSW equals the total sum of squares computed directly
    (within output rounding) and df's partition n-1."""
    rows = [
        (_PRIORITIES[i % 5], 500 + (i * 13) % 211) for i in range(1500)
    ]
    r = _anova(spark, rows)
    q = [v for _, v in rows]
    n = len(q)
    tot = sum(x * x for x in q) - sum(q) ** 2 / n
    assert abs((r["ss_between"] + r["ss_within"]) - tot) < 0.05
    assert r["df_between"] + r["df_within"] == n - 1


def _pg(spark, counts):
    out = periodogram_frame(
        spark, spark.createDataFrame(counts, "h long, nn long")
    ).collect()
    return {r["period_hours"]: r for r in out}


def test_periodogram_planted_daily_cycle(spark):
    counts = [
        (t, 100 + round(50 * math.cos(2 * math.pi * t / 24)))
        for t in range(720)
    ]
    r = _pg(spark, counts)
    assert r[24]["dominant"] == 1
    assert r[24]["power_share"] > 0.95
    assert r[168]["power_share"] < 0.05 and r[17]["power_share"] < 0.05


def test_periodogram_planted_weekly_cycle(spark):
    counts = [
        (t, 100 + round(40 * math.sin(2 * math.pi * t / 168)))
        for t in range(1008)  # 6 full weeks: 168 and 24 stay orthogonal
    ]
    r = _pg(spark, counts)
    assert r[168]["dominant"] == 1
    assert r[168]["power_share"] > 0.95


def test_periodogram_gap_hours_enter_as_zero(spark):
    """A daily cycle observed only every third hour still peaks at 24h
    — the spine must fill the missing hours with zero deviations from
    the CENTERED series, not drop them."""
    counts = [
        (t, 100 + round(50 * math.cos(2 * math.pi * t / 24)))
        for t in range(720)
        if t % 3 == 0
    ]
    r = _pg(spark, counts)
    assert r[24]["power_share"] > r[17]["power_share"]
    assert r[24]["power_share"] > r[168]["power_share"]


def test_periodogram_white_noise_no_dominant_peak(spark):
    """Deterministic pseudo-noise: no frequency should soak up the
    spectrum."""
    counts = [(t, 80 + (t * 2654435761) % 41) for t in range(720)]
    r = _pg(spark, counts)
    assert all(row["power_share"] < 0.9 for row in r.values())
    assert abs(sum(row["power_share"] for row in r.values()) - 1.0) < 1e-4


def test_holt_winters_recovers_planted_seasonality():
    """Planted level+trend+seasonal series: the HW recursion's seasonal
    states converge to the (centered) planted pattern and one-step
    fitted values beat the seasonal-naive baseline by a wide margin."""
    from stream_processing_with_flink_study_spark.plans.queries_eval import (
        hw_seasonal_loop,
    )

    pattern = [120, 80, -40, -100, -140, -60, 30, 90, 150, 60, -80, -110]
    rows = [
        (t, f"m{t:03d}", 1000.0 + 10.0 * t + pattern[t % 12])
        for t in range(80)
    ]
    out = hw_seasonal_loop(rows)
    assert len(out) == 80 - 12
    # late seasonal states track the centered planted pattern
    centered = [p - sum(pattern) / 12.0 for p in pattern]
    late = {t % 12: s for (t, _, _, _, _, s, _) in out if t >= 60}
    for ph, s in late.items():
        assert abs(s - centered[ph]) < 20, (ph, s, centered[ph])
    # one-step MAE beats seasonal naive on the second half
    ys = {t: y for t, _, y in rows}
    hw_err = [abs(y - f) for (t, _, y, _, _, _, f) in out if t >= 40]
    naive_err = [abs(ys[t] - ys[t - 12]) for t in range(40, 80)]
    assert sum(hw_err) / len(hw_err) < 0.5 * sum(naive_err) / len(naive_err)


def test_dsir_identity_and_ordering_laws(spark):
    """DSIR laws: (a) target ≡ raw ⇒ every per-bucket log-ratio is
    exactly ln(x)−ln(x) = 0, so every score is exactly 0; (b) with an
    English target on mixed data, English docs outrank Chinese ones on
    average."""
    from pyspark.sql import functions as F

    from stream_processing_with_flink_study_spark.plans.queries_mlprep import (
        dsir_frame,
    )
    from stream_processing_with_flink_study_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "text"
    )
    # (a) identity: target condition true for every row
    ident = dsir_frame(spark, docs, "1 = 1").collect()
    assert ident and all(r["log_importance"] == 0.0 for r in ident)
    # (b) ordering: with an en target, en documents carry the highest
    # MEAN importance (the synthetic corpus shares most vocabulary
    # across langs, so the separation shows in means, not in a
    # winner-take-all top slice)
    from stream_processing_with_flink_study_spark.plans.queries_mlprep import (
        _DSIR_SPARK,
        _dsir_render,
    )

    sql = _dsir_render(_DSIR_SPARK, "dsir_frame_docs", "lang = 'en'")
    full = spark.sql(
        sql[: sql.index("SELECT doc_id, n_tokens")]
        + "SELECT doc_id, CAST(w6 AS DOUBLE) / 1000000.0 AS li FROM sc"
    )
    means = {
        r["lang"]: r["m"]
        for r in full.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.avg("li").alias("m"))
        .collect()
    }
    assert all(
        means["en"] > means[lg] for lg in means if lg != "en"
    ), means


def test_tukey_null_data_no_significant_pairs(spark):
    """TPC-H priorities are independent of order value: the ANOVA
    omnibus does not reject, and no Tukey pair may claim significance
    (family consistency pin on fixed data)."""
    from stream_processing_with_flink_study_spark import plans

    sf = "/root/testdata/sf0.001"
    om = plans.QUERIES["anova_oneway_priority"](spark, sf).collect()[0]
    pairs = plans.QUERIES["tukey_hsd_priority"](spark, sf).collect()
    assert len(pairs) == 10
    if om["reject_equal_means_5pct"] == 0:
        assert all(p["sig_5pct"] == 0 for p in pairs), pairs


def test_woe_iv_reconstructs_from_counts(spark):
    """IV recomputed from the emitted per-bin counts matches iv_total,
    and WoE is negative exactly in bins whose bad rate exceeds the
    global rate."""
    import math as _m

    from stream_processing_with_flink_study_spark import plans

    rows = plans.QUERIES["woe_iv_value_deciles"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 10
    tg = sum(r["n_good"] for r in rows)
    tb = sum(r["n_bad"] for r in rows)
    iv = sum(
        (r["n_good"] / tg - r["n_bad"] / tb)
        * _m.log((r["n_good"] / tg) / (r["n_bad"] / tb))
        for r in rows
    )
    assert abs(iv - rows[0]["iv_total"]) < 1e-4
    for r in rows:
        bad_rate_rel = (r["n_bad"] / tb) - (r["n_good"] / tg)
        assert (r["woe"] < 0) == (bad_rate_rel > 0) or abs(r["woe"]) < 1e-9


def test_effect_size_planted_shift(spark):
    """Two planted groups with a known one-SD shift: d ≈ 1, CLES
    matches the brute-force P(X>Y)+0.5P(X=Y), and Hedges' g shrinks d
    toward zero."""
    from stream_processing_with_flink_study_spark.plans.queries_stattests import (
        _EFFECT_SQL,
    )

    vals1 = [(i * 37) % 100 for i in range(400)]  # weekday (wk=0)
    vals2 = [v + 29 for v in vals1]  # weekend, shifted ~1 SD
    rows = [(0, v * 100, i) for i, v in enumerate(vals1)] + [
        (1, v * 100, 10_000 + i) for i, v in enumerate(vals2)
    ]
    spark.createDataFrame(
        rows, "wk int, q long, rid long"
    ).createOrReplaceTempView("eff_frame")
    sql = _EFFECT_SQL.replace("{MAT}", "")
    head = sql.index("rk AS ")
    out = spark.sql(
        "WITH base AS (SELECT wk, q, rid FROM eff_frame),\n" + sql[head:]
    ).collect()[0]
    import statistics as st

    sd = st.stdev(vals1)
    want_d = 29 / sd  # equal variances -> pooled sd == sd
    assert abs(out["cohens_d"] - want_d) < 0.05, (out["cohens_d"], want_d)
    assert 0 < out["hedges_g"] < out["cohens_d"]
    wins = sum(
        (a > b) + 0.5 * (a == b) for a in vals2 for b in vals1
    )
    assert abs(out["cles"] - wins / (len(vals1) * len(vals2))) < 1e-3
    assert out["magnitude"] in ("medium", "large")


def test_readability_hand_counted_doc(spark):
    """One hand-counted document: ARI/CLI/LIX/RIX match the closed
    forms exactly."""
    from stream_processing_with_flink_study_spark.plans.queries_corpus import (
        _READ_SQL,
    )

    text = "The quick brown fox jumps. It runs extremely far! Wonderful."
    spark.createDataFrame(
        [("en", text)], "lang string, text string"
    ).createOrReplaceTempView("read_frame")
    out = spark.sql(
        _READ_SQL.replace("{documents}", "read_frame")
        .replace("{MAT}", "")
        .replace("{LETTERS}", "regexp_replace(text, '[^a-zA-Z]', '')")
        .replace("{WORDS}", r"size(split(lower(trim(text)), '\\s+'))")
        .replace("{SENTS}", "regexp_count(text, '[.!?]')")
        .replace("{LONGW}", r"regexp_count(text, '\\S{7,}')")
    ).collect()[0]
    letters = sum(ch.isalpha() for ch in text)
    words = len(text.split())
    sents = sum(text.count(c) for c in ".!?") + 1
    longw = sum(1 for w in text.split() if len(w) >= 7)
    ari = 4.71 * letters / words + 0.5 * words / sents - 21.43
    lix = words / sents + 100.0 * longw / words
    assert abs(out["ari"] - ari) < 1e-3
    assert abs(out["lix"] - lix) < 1e-3
    assert abs(out["rix"] - longw / sents) < 1e-3


def test_group_kfold_no_leakage_and_conservation(spark):
    """Every source lands in exactly one fold; fold doc counts conserve
    the corpus."""
    from stream_processing_with_flink_study_spark import plans
    from stream_processing_with_flink_study_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    folds = plans.QUERIES["group_kfold_assignment"](spark, sf).collect()
    docs = load_table(spark, sf, "documents")
    assert sum(r["n_docs"] for r in folds) == docs.count()
    assert sum(r["n_sources"] for r in folds) == (
        docs.select("source").distinct().count()
    )  # == implies no source appears in two folds


def test_nested_subsets_strictly_nested(spark):
    """Counts and token volumes are monotone up the rungs, and the 10%
    membership is a strict subset of the 80% membership."""
    from pyspark.sql import functions as F

    from stream_processing_with_flink_study_spark import plans
    from stream_processing_with_flink_study_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = sorted(
        plans.QUERIES["nested_learning_subsets"](spark, sf).collect(),
        key=lambda r: r["pct"],
    )
    assert [r["pct"] for r in rows] == [10, 20, 40, 80]
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] < b["n_docs"]
        assert a["total_tokens"] < b["total_tokens"]
    docs = load_table(spark, sf, "documents").select(
        "doc_id",
        F.substring(
            F.md5(F.concat(F.lit("lc0|"), F.col("doc_id").cast("string"))),
            1, 8,
        ).alias("hx"),
    )
    small = {r["doc_id"] for r in docs.filter(F.col("hx") < "19999999").collect()}
    big = {r["doc_id"] for r in docs.filter(F.col("hx") < "cccccccc").collect()}
    assert small < big
