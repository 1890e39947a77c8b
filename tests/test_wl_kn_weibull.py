"""Law tests for the WL-refinement / Kneser-Ney / Weibull wave.

KN and Weibull are exercised through the REAL registered queries on
planted parquet corpora (a temp dir shaped like a driver sf_dir), so
the full pipeline — tokenization, train/heldout split, estimation — is
what gets pinned, not a test-only replica."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.plans import QUERIES

from .conftest import SF_SMALL


def test_wl_refinement_monotone_and_conserves_nodes(spark):
    rows = QUERIES["wl_refinement_classes"](spark, SF_SMALL).collect()
    assert [r["wl_round"] for r in rows] == [0, 1, 2]
    n_nodes = {r["n_nodes"] for r in rows}
    assert len(n_nodes) == 1  # refinement never creates/destroys nodes
    classes = [r["n_classes"] for r in rows]
    assert classes == sorted(classes)  # refinement only splits classes
    assert all(1 <= r["largest_class"] <= r["n_nodes"] for r in rows)
    # round 1 must actually refine a degree-labelled co-supplier graph
    assert classes[1] > classes[0]


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_kneser_ney_separates_formulaic_from_soup(spark, tmp_path):
    # formulaic: one repeating sentence => held-out bigrams all seen,
    # low xent.  soup: same token vocabulary but per-doc scrambled
    # orders => many held-out bigrams unseen, higher xent.
    vocab = [f"w{i}" for i in range(20)]
    sentence = " ".join(vocab) + " "
    rows = []
    # ids chosen so BOTH sources land docs in the %10==0 held-out split
    for d in range(40):
        rows.append((d, "formulaic", sentence * 5))
        toks = [vocab[(i * (2 * d + 7) + d) % 20] for i in range(100)]
        rows.append((1000 + d, "soup", " ".join(toks)))
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["source"]: r
        for r in QUERIES["kneser_ney_heldout_xent"](spark, sf).collect()
    }
    assert out["formulaic"]["xent_bits"] < out["soup"]["xent_bits"] - 1.0
    assert out["formulaic"]["oov_context_share"] == 0.0
    assert all(r["xent_bits"] > 0 for r in out.values())
    assert all(0.0 <= r["oov_context_share"] <= 1.0 for r in out.values())


def test_kneser_ney_backs_off_on_unseen_context(spark, tmp_path):
    # heldout (doc_id % 10 == 0) contains a context word that never
    # appears in training => every heldout bigram is an OOV context
    rows = [(1, "s", "a b a b a b"), (10, "s", "zz qq zz qq")]
    sf = _write_docs(spark, tmp_path, rows)
    r = QUERIES["kneser_ney_heldout_xent"](spark, sf).collect()[0]
    assert r["oov_context_share"] == 1.0
    assert r["xent_bits"] > 0


def test_weibull_mrr_recovers_planted_shape_and_scale(spark, tmp_path):
    # customers with exactly two orders spaced by inverse-CDF Weibull
    # draws (k = 2, lambda = 30): the fit must give those back
    import math

    n = 4000
    rows = []
    for i in range(1, n + 1):
        u = (i - 0.5) / n
        t = max(1, round(30.0 * (-math.log(1.0 - u)) ** 0.5))
        rows.append((i, 2 * i, "1995-01-01"))
        rows.append((i, 2 * i + 1, f"1995-01-01:{t}"))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderkey long, tag string"
    ).select(
        "o_custkey",
        "o_orderkey",
        F.when(
            F.col("tag") == "1995-01-01", F.to_date(F.lit("1995-01-01"))
        )
        .otherwise(
            F.date_add(
                F.to_date(F.lit("1995-01-01")),
                F.split(F.col("tag"), ":")[1].cast("int"),
            )
        )
        .alias("o_orderdate"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = QUERIES["weibull_interpurchase_fit"](
        spark, str(tmp_path)
    ).collect()[0]
    assert out["n_intervals"] == n
    assert abs(out["shape_k"] - 2.0) < 0.25  # day-rounding blurs a bit
    assert abs(out["scale_days"] - 30.0) < 3.0
    assert out["r2"] > 0.95


def test_weibull_on_tpch_is_sane(spark):
    r = QUERIES["weibull_interpurchase_fit"](spark, SF_SMALL).collect()[0]
    assert r["n_intervals"] > 100
    assert 0 < r["shape_k"] < 10
    assert r["scale_days"] > 1
    assert 0 <= r["r2"] <= 1
