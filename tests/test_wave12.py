"""Law tests for wave 12: lexical diversity, rich club, Erlang-C,
power-iteration top PC."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_graph import (
    _RICHCLUB_SQL,
)

from .conftest import SF_SMALL


def test_lexdiv_planted_spam_vs_diverse(spark, tmp_path):
    diverse = " ".join(f"tok{i}" for i in range(400))
    spam = "buy now " * 200
    rows = [(1, "diverse", diverse), (2, "spam", spam)]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["source"]: r
        for r in QUERIES["lexical_diversity_battery"](
            spark, str(tmp_path)
        ).collect()
    }
    # all-hapax corpus: K = 0, D = 0, TTR = 1, hapax share = 1
    d = out["diverse"]
    assert d["yules_k"] == 0.0 and d["simpson_d"] == 0.0
    assert d["ttr"] == 1.0 and d["hapax_share"] == 1.0
    s = out["spam"]
    assert s["yules_k"] > 1000  # two tokens repeated 200x: huge K
    assert s["simpson_d"] > 0.4
    assert s["ttr"] < 0.02 and s["hapax_share"] == 0.0


def test_lexdiv_tpch_sane(spark):
    rows = QUERIES["lexical_diversity_battery"](spark, SF_SMALL).collect()
    assert len(rows) >= 2
    for r in rows:
        assert 0 <= r["simpson_d"] <= 1
        assert 0 < r["ttr"] <= 1
        assert 0 <= r["hapax_share"] <= 1
        assert r["yules_k"] >= 0
        assert 0 < r["herdan_c"] <= 1.01


def test_rich_club_planted_core_periphery(spark):
    # 10-core clique, each core node also serving 10 degree-1 leaves:
    # every percentile threshold lands at degree 1, the club is the
    # core, and the within-club density is exactly 1
    core = list(range(10))
    edges = [
        (a, b) for a in core for b in core if a != b
    ]
    leaf = 10
    for c in core:
        for _ in range(10):
            edges.append((c, leaf))
            edges.append((leaf, c))
            leaf += 1
    spark.createDataFrame(edges, "src long, dst long").createOrReplaceTempView(
        "rc_test_edges"
    )
    out = spark.sql(
        "WITH edges AS (SELECT src, dst FROM rc_test_edges),\n"
        + _RICHCLUB_SQL.replace("{MAT}", "")
    ).collect()
    assert len(out) == 3
    for r in out:
        assert r["k_threshold"] == 1
        assert r["n_rich"] == 10
        assert r["edges_within"] == 90
        assert r["phi"] == 1.0
        assert r["density_ratio"] > 1.0


def test_rich_club_tpch_monotone(spark):
    rows = QUERIES["rich_club_coefficient"](spark, SF_SMALL).collect()
    ks = [r["k_threshold"] for r in rows]
    ns = [r["n_rich"] for r in rows]
    assert ks == sorted(ks)
    assert ns == sorted(ns, reverse=True)
    assert all(0.0 <= r["phi"] <= 1.0 for r in rows)


def test_erlang_c_staffing_laws(spark):
    r = QUERIES["erlang_c_staffing"](spark, SF_SMALL).collect()[0]
    assert r["peak_arrivals_per_hr"] > 0
    assert r["agents_needed"] >= 1
    # stability: c* > offered load, utilization strictly < 1
    assert r["agents_needed"] > r["offered_load_erlangs"]
    assert r["utilization"] is None or r["utilization"] < 1.0
    assert r["p_wait_at_staffing"] is None or (
        0.0 <= r["p_wait_at_staffing"] <= 0.2
    )


def test_power_iteration_recovers_planted_direction(spark, tmp_path):
    # spread along (0.6, 0.8, 0, ..., 0) with small noise elsewhere
    rows = []
    for i in range(500):
        c = (i - 249.5) / 50.0
        vec = [0.6 * c, 0.8 * c] + [0.0] * 6
        vec[2 + i % 6] += 0.01 * ((i * 7) % 11 - 5)
        rows.append((i, [float(v) for v in vec], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    r = QUERIES["power_iteration_top_pc"](spark, str(tmp_path)).collect()[0]
    assert r["n_vectors"] == 500
    # max-norm iterate: the dominant component pins to exactly 1
    loads = [r[f"loading_{i}"] for i in range(1, 9)]
    assert max(loads) == 1.0
    assert abs(r["loading_2"] - 1.0) < 1e-9
    assert abs(r["loading_1"] - 0.75) < 0.01  # 0.6/0.8
    assert all(abs(v) < 0.05 for v in loads[2:])
    # eigenvalue ~ var(c)*|dir|^2: var(c) ~ (n^2-1)/12/50^2 ~ 8.33
    assert 7.0 < r["top_eigenvalue"] < 10.0


def test_power_iteration_tpch_embeddings_sane(spark):
    r = QUERIES["power_iteration_top_pc"](spark, SF_SMALL).collect()[0]
    loads = [r[f"loading_{i}"] for i in range(1, 9)]
    assert max(loads) == 1.0  # sign fix forces the lead positive
    assert all(-1.0 - 1e-9 <= v <= 1.0 + 1e-9 for v in loads)
    assert r["top_eigenvalue"] > 0
