"""Round-9 layout wave laws: Z-order interleaving, zone-map pruning,
SMOTE oversampling plan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.plans.queries_layout import (
    Z_BITS,
    _interleave_expr,
    zone_map_pruning_eval,
)
from stream_processing_with_flink_study_spark.plans.queries_mlprep import (
    smote_oversample_plan,
)
from stream_processing_with_flink_study_spark.sources import load_table

from .conftest import SF_SMALL


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_interleave_expr_matches_python_reference(spark):
    """The unrolled shift/mask expression equals a bit-twiddling
    reference for a deterministic grid of (x, y) pairs — including the
    bit-width corners 0 and 2^bits − 1."""
    pairs = [(0, 0), (2**Z_BITS - 1, 2**Z_BITS - 1), (1, 0), (0, 1)]
    pairs += [((i * 37) % 4096, (i * 101) % 4096) for i in range(200)]
    df = spark.createDataFrame(pairs, "x long, y long").selectExpr(
        "x", "y", _interleave_expr("x", "y", Z_BITS, "spark") + " AS z"
    )
    for r in df.collect():
        assert r["z"] == _py_morton(r["x"], r["y"], Z_BITS), (r["x"], r["y"])


def test_interleave_is_injective_on_grid(spark):
    """Morton codes are a bijection on the bits×bits grid — distinct
    inputs must never collide (a wrong shift silently folds cells)."""
    pairs = [(x, y) for x in range(0, 64, 3) for y in range(0, 64, 3)]
    df = spark.createDataFrame(pairs, "x long, y long").selectExpr(
        _interleave_expr("x", "y", Z_BITS, "spark") + " AS z"
    )
    zs = [r["z"] for r in df.collect()]
    assert len(zs) == len(set(zs))


def test_zone_map_matching_rows_layout_invariant(spark):
    """rows_matching is a property of the predicate, not the layout —
    all three layouts must report the identical count; scanned rows
    must cover it; and the natural layout can never out-prune the
    purpose-built ones on this 2-D predicate."""
    rows = {r["layout"]: r for r in zone_map_pruning_eval(spark, SF_SMALL).collect()}
    assert set(rows) == {"natural", "date_sorted", "zorder", "hilbert"}
    matching = {r["rows_matching"] for r in rows.values()}
    assert len(matching) == 1
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_matching"]
        assert r["rows_total"] == rows["natural"]["rows_total"]
        assert r["blocks_scanned"] <= r["n_blocks"]
    assert (
        rows["zorder"]["rows_scanned"] <= rows["natural"]["rows_scanned"]
    )
    assert (
        rows["date_sorted"]["rows_scanned"] <= rows["natural"]["rows_scanned"]
    )
    assert (
        rows["hilbert"]["rows_scanned"] <= rows["natural"]["rows_scanned"]
    )


def _py_hilbert(n: int, x: int, y: int) -> int:
    """Textbook iterative xy→d walk with the level-size rotation — the
    independent reference for the SQL stage chain."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_stage_chain_matches_python_reference(spark):
    """The chained selectExpr stages equal the independent Python walk
    on a grid including the corners; the index is a bijection on the
    full small grid; and consecutive indices are ALWAYS grid neighbors
    (the unit-step adjacency Morton lacks — the reason hilbert exists
    as a second layout)."""
    from stream_processing_with_flink_study_spark.plans.queries_layout import (
        _hilbert_spark,
    )

    n = 2**Z_BITS
    pairs = [(0, 0), (n - 1, n - 1), (n - 1, 0), (0, n - 1)]
    pairs += [((i * 37) % n, (i * 101) % n) for i in range(200)]
    df = spark.createDataFrame(pairs, "x long, y long").selectExpr(
        "x", "y", "x AS hx", "y AS hy", "CAST(0 AS BIGINT) AS hd"
    )
    for r in _hilbert_spark(df, Z_BITS).collect():
        assert r["hd"] == _py_hilbert(n, r["x"], r["y"]), (r["x"], r["y"])
    # bijectivity + adjacency on a complete 16x16 grid via 4-bit stages
    m = 16
    grid = [(x, y) for x in range(m) for y in range(m)]
    gdf = spark.createDataFrame(grid, "x long, y long").selectExpr(
        "x", "y", "x AS hx", "y AS hy", "CAST(0 AS BIGINT) AS hd"
    )
    got = {r["hd"]: (r["x"], r["y"]) for r in _hilbert_spark(gdf, 4).collect()}
    assert sorted(got) == list(range(m * m))
    for i in range(m * m - 1):
        (x1, y1), (x2, y2) = got[i], got[i + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_truncated_walk_same_buckets(spark):
    """The production queries run only HILBERT_BUCKET_LEVELS stages;
    the dropped tail contributes < 2^Z_SHIFT, so hd >> Z_SHIFT must be
    IDENTICAL to the full walk's — pinned on a deterministic grid
    including the corners."""
    from stream_processing_with_flink_study_spark.plans.queries_layout import (
        HILBERT_BUCKET_LEVELS,
        Z_SHIFT,
        _hilbert_spark,
    )

    n = 2**Z_BITS
    pairs = [(0, 0), (n - 1, n - 1), (n - 1, 0), (0, n - 1)]
    pairs += [((i * 37) % n, (i * 101) % n) for i in range(300)]
    df = spark.createDataFrame(pairs, "x long, y long").selectExpr(
        "x", "y", "x AS hx", "y AS hy", "CAST(0 AS BIGINT) AS hd"
    )
    full = {
        (r["x"], r["y"]): r["hd"] >> Z_SHIFT
        for r in _hilbert_spark(df, Z_BITS).collect()
    }
    trunc = {
        (r["x"], r["y"]): r["hd"] >> Z_SHIFT
        for r in _hilbert_spark(df, Z_BITS, HILBERT_BUCKET_LEVELS).collect()
    }
    assert full == trunc


def test_hilbert_buckets_no_looser_than_zorder(spark):
    """Curve quality: averaged over equal-size buckets of the same
    plane, hilbert's zone spans must not exceed zorder's — the
    measurable form of the adjacency advantage."""
    from stream_processing_with_flink_study_spark.plans import QUERIES

    z = QUERIES["zorder_layout_keys"](spark, SF_SMALL).collect()
    h = QUERIES["hilbert_layout_keys"](spark, SF_SMALL).collect()
    z_mean = sum(r["zone_span"] * r["n_rows"] for r in z) / sum(
        r["n_rows"] for r in z
    )
    h_mean = sum(r["zone_span"] * r["n_rows"] for r in h) / sum(
        r["n_rows"] for r in h
    )
    assert sum(r["n_rows"] for r in h) == sum(r["n_rows"] for r in z)
    assert h_mean <= z_mean * 1.05  # never meaningfully looser


def test_smote_plan_targets_minorities_with_true_nearest(spark):
    """Every minority class contributes exactly n_class rows, the
    majority class is absent, deficits are consistent, and a sampled
    vector's chosen neighbor IS its numpy-brute-force nearest
    same-label neighbor."""
    plan = smote_oversample_plan(spark, SF_SMALL).collect()
    emb = load_table(spark, SF_SMALL, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(r)
    sizes = {lb: len(v) for lb, v in by_label.items()}
    maj = max(sizes.values())
    got_counts: dict[int, int] = {}
    for r in plan:
        got_counts[r["label"]] = got_counts.get(r["label"], 0) + 1
        assert r["n_class"] == sizes[r["label"]]
        assert r["n_needed"] == maj - sizes[r["label"]]
        assert r["n_class"] < maj
    assert got_counts == {lb: n for lb, n in sizes.items() if n < maj}

    # numpy cross-check on the largest minority class
    lb = max((n, lb) for lb, n in sizes.items() if n < maj)[1]
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in by_label[lb]}
    plan_nn = {r["vec_id"]: r["nn_id"] for r in plan if r["label"] == lb}
    for qid, qv in list(vecs.items())[:10]:
        best = None
        for nid, nv in vecs.items():
            if nid == qid:
                continue
            sim = float(qv @ nv / (np.linalg.norm(qv) * np.linalg.norm(nv)))
            key = (-sim, nid)
            if best is None or key < best[0]:
                best = (key, nid)
        assert plan_nn[qid] == best[1], qid


def test_hll_md5_estimate_quality_and_merge_law(spark):
    """Portable-HLL battery: estimates land within the ~1.04/sqrt(64)
    HLL error regime (generous 3-sigma band), the __all__ row is the
    register MERGE of the per-language sketches (max per bucket), and
    register counts are sane (<= m, <= n_exact)."""
    from stream_processing_with_flink_study_spark.plans.queries_mlprep import (
        HLL_M,
        hll_md5_distinct,
    )

    rows = {r["lang"]: r for r in hll_md5_distinct(spark, SF_SMALL).collect()}
    assert "__all__" in rows and len(rows) >= 3
    for lang, r in rows.items():
        assert 1 <= r["n_registers_set"] <= HLL_M
        assert r["n_registers_set"] <= r["n_exact"]
        rel = abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel < 0.40, (lang, r["hll_estimate"], r["n_exact"])
    # merge law: every per-lang sketch is dominated by the union
    assert rows["__all__"]["max_register"] == max(
        r["max_register"] for r in rows.values()
    )
    assert rows["__all__"]["n_exact"] == sum(
        r["n_exact"] for k, r in rows.items() if k != "__all__"
    )


def test_als_rank2_matches_python_replay_and_separates_groups(spark, tmp_path):
    """Full pure-Python replay of the ALS pipeline (same fixed-order
    float arithmetic, same 1e6 quantization) must reproduce every
    rounded output exactly; and on a planted two-community corpus the
    learned factors must keep each community's best_item inside its
    own item set."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES
    from stream_processing_with_flink_study_spark.plans.queries_mlprep import (
        ALS_ITEMS,
        ALS_LAM,
        ALS_Q0,
        ALS_SCALE,
    )

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    counts = {}
    for u in range(20):
        if u < 10:
            mine = {"click": 6 + u % 3, "view": 4 + u % 2}
        else:
            mine = {"error": 5 + u % 4, "signup": 3 + u % 2}
        counts[u] = {i: mine.get(i, 0) for i in ALS_ITEMS}
        for it, c in mine.items():
            for _ in range(c):
                rows.append(
                    (eid, u, it, base + datetime.timedelta(minutes=eid), 1.0)
                )
                eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    def solve(a11, a12, a22, b1, b2):
        det = a11 * a22 - a12 * a12
        return (a22 * b1 - a12 * b2) / det, (a11 * b2 - a12 * b1) / det

    def user_step(c, q):
        a11 = a12 = a22 = b1 = b2 = 0.0
        for i in ALS_ITEMS:
            qa, qb = q[i]
            a11 = a11 + c[i] * (qa * qa)
            a12 = a12 + c[i] * (qa * qb)
            a22 = a22 + c[i] * (qb * qb)
            b1 = b1 + c[i] * qa
            b2 = b2 + c[i] * qb
        return solve(a11 + ALS_LAM, a12, a22 + ALS_LAM, b1, b2)

    import math

    p1 = {u: user_step(counts[u], ALS_Q0) for u in counts}
    pq = {
        u: (
            math.floor(p1[u][0] * float(ALS_SCALE) + 0.5),
            math.floor(p1[u][1] * float(ALS_SCALE) + 0.5),
        )
        for u in p1
    }
    q2 = {}
    for i in ALS_ITEMS:
        s11 = sum(counts[u][i] * pq[u][0] * pq[u][0] for u in pq)
        s12 = sum(counts[u][i] * pq[u][0] * pq[u][1] for u in pq)
        s22 = sum(counts[u][i] * pq[u][1] * pq[u][1] for u in pq)
        t1 = sum(counts[u][i] * pq[u][0] for u in pq)
        t2 = sum(counts[u][i] * pq[u][1] for u in pq)
        sc2, sc1 = float(ALS_SCALE) * float(ALS_SCALE), float(ALS_SCALE)
        q2[i] = solve(
            s11 / sc2 + ALS_LAM, s12 / sc2, s22 / sc2 + ALS_LAM,
            t1 / sc1, t2 / sc1,
        )
    got = {
        r.user_id: r
        for r in QUERIES["als_implicit_rank2"](spark, str(tmp_path)).collect()
    }
    assert set(got) == set(counts)
    for u, c in counts.items():
        pu1, pu2 = user_step(c, q2)
        scores = {i: pu1 * q2[i][0] + pu2 * q2[i][1] for i in ALS_ITEMS}
        best = None
        for i in ALS_ITEMS:  # >=-chain in item order, like the CASE
            if all(scores[i] >= scores[j] for j in ALS_ITEMS if j != i):
                best = i
                break
        r = got[u]
        assert r.factor1 == round(pu1 - 1e-9, 4) + 0.0
        assert r.factor2 == round(pu2 - 1e-9, 4) + 0.0
        assert r.best_item == best
        # community separation: clickers never get error/signup and
        # vice versa
        if u < 10:
            assert r.best_item in ("click", "view")
        else:
            assert r.best_item in ("error", "signup")


def test_mrmr_redundancy_penalty_planted(spark, tmp_path):
    """Target = (U, V) with independent uniform bits; tax and status
    both encode U (duplicates), disc encodes V, qty is constant.
    Greedy: rank 1 ties at ln 2 → 'disc' alphabetically; rank 2
    'status' at full ln 2 (independent of disc); rank 3 'tax' at
    ln 2 − (0 + ln 2)/2 = ln 2 / 2 — the redundancy penalty in the
    flesh (pure relevance would score it ln 2)."""
    import math

    from stream_processing_with_flink_study_spark.plans import QUERIES

    rows = []
    for i in range(300):
        u, v = i % 2, (i // 2) % 2
        rows.append(
            (
                i, i, i, 1,          # keys
                5.0,                 # l_quantity -> bucket 0 (constant)
                100.0,               # l_extendedprice
                0.01 * v,            # l_discount -> bucket = V
                0.01 * u,            # l_tax -> bucket = U
                f"{u}{v}",           # l_returnflag = the 4-way target
                "X" if u else "Y",   # l_linestatus = U
                "1995-01-01",
            )
        )
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    ).selectExpr(
        "*",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = sorted(
        QUERIES["mrmr_feature_select"](spark, str(tmp_path)).collect(),
        key=lambda r: r.sel_rank,
    )
    ln2 = round(math.log(2) - 1e-9, 4)
    assert [r.feature for r in out] == ["disc", "status", "tax"]
    assert out[0].mrmr_score == ln2 and out[0].relevance_mi == ln2
    assert out[1].mrmr_score == ln2
    assert out[2].mrmr_score == round(math.log(2) / 2 - 1e-9, 4)
    assert out[2].relevance_mi == ln2  # full relevance, halved score
