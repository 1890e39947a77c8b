"""Law tests for wave 14: Burrows' Delta, negative-binomial fit."""

from __future__ import annotations

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_mining import (
    negbin_frame,
)
from stream_processing_with_flink_study_spark.plans.queries_textmining import (
    _BURROWS_SQL,
)

from .conftest import SF_SMALL


def test_burrows_delta_planted_style_clusters(spark):
    # twins share one function-word style; the divergent source uses
    # the same vocabulary at very different rates
    twin = ("the of and to in " * 40 + "alpha beta ") * 3
    divergent = ("zz qq " * 60 + "the of ") * 3
    rows = []
    for d in range(30):
        rows.append((d, "twin_a", twin))
        rows.append((100 + d, "twin_b", twin + " gamma"))
        rows.append((200 + d, "weird", divergent))
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).selectExpr(
        "source", "explode(split(lower(trim(text)), '\\\\s+')) AS tok"
    ).createOrReplaceTempView("burrows_toks_test")
    out = {
        (r["src_a"], r["src_b"]): r["burrows_delta"]
        for r in spark.sql(
            _BURROWS_SQL.replace("{MAT}", "").replace(
                "{EXPLODE}", "SELECT source, tok FROM burrows_toks_test"
            )
        ).collect()
    }
    assert len(out) == 3
    d_twins = out[("twin_a", "twin_b")]
    assert d_twins < out[("twin_a", "weird")] - 0.5
    assert d_twins < out[("twin_b", "weird")] - 0.5


def test_burrows_delta_tpch_symmetric_positive(spark):
    rows = QUERIES["burrows_delta_sources"](spark, SF_SMALL).collect()
    assert all(r["burrows_delta"] >= 0 for r in rows)
    assert all(r["src_a"] < r["src_b"] for r in rows)  # canonical pairs
    srcs = {r["src_a"] for r in rows} | {r["src_b"] for r in rows}
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2


def test_negbin_planted_poisson_vs_mixture(spark):
    # deterministic "Poisson-ish" sample: dispersion ~ 1, no excess 0s
    # (constructed by inverse-CDF over a fine grid of a Poisson(2))
    import math

    lam, probs, acc = 2.0, [], 0.0
    for k in range(15):
        acc += math.exp(-lam) * lam**k / math.factorial(k)
        probs.append(acc)
    n = 10_000
    pois = []
    for i in range(n):
        u = (i + 0.5) / n
        k = next((j for j, p in enumerate(probs) if u <= p), 15)
        pois.append((k,))
    p = negbin_frame(spark.createDataFrame(pois, "k long")).collect()[0]
    assert abs(p["mean_orders"] - 2.0) < 0.05
    assert abs(p["dispersion_index"] - 1.0) < 0.05
    assert p["zero_inflated_vs_poisson"] == 0

    # 50/50 mixture of Poisson(0.5) and Poisson(8): overdispersed,
    # zero-heavy => NB parameters exist and the flag fires
    mix = []
    for half, lam in ((0, 0.5), (1, 8.0)):
        probs, acc = [], 0.0
        for k in range(30):
            acc += math.exp(-lam) * lam**k / math.factorial(k)
            probs.append(acc)
        for i in range(n // 2):
            u = (i + 0.5) / (n // 2)
            k = next((j for j, p in enumerate(probs) if u <= p), 30)
            mix.append((k,))
    m = negbin_frame(spark.createDataFrame(mix, "k long")).collect()[0]
    assert m["dispersion_index"] > 3
    assert m["nb_r"] is not None and m["nb_r"] > 0
    assert 0 < m["nb_p"] < 1
    assert m["zero_inflated_vs_poisson"] == 1


def test_negbin_tpch_sane(spark):
    r = QUERIES["negbin_overdispersion_fit"](spark, SF_SMALL).collect()[0]
    assert r["n_customers"] > 0
    assert r["mean_orders"] > 0
    assert r["var_orders"] > 0
    assert 0 <= r["zero_share"] <= 1
