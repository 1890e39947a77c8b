"""Connected components (operators/graph.py): multi-hop propagation,
isolated vertices, convergence on chains longer than one round."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.operators.graph import (
    connected_components,
)


def _comps(df) -> dict[int, int]:
    return {r["id"]: r["comp"] for r in df.collect()}


def test_chain_and_isolated_vertices(spark):
    # 1-2-3-4-5 chain (min label needs 4 propagation rounds), a pair
    # 10-11, and isolated vertex 99 supplied via `vertices`
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a long, id_b long"
    )
    verts = spark.range(1).select(F.lit(99).cast("long").alias("doc_id"))
    out = connected_components(
        edges, vertices=verts, vertex_col="doc_id"
    )
    assert _comps(out) == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 99: 99}


def test_cycle_and_cross_links(spark):
    # cycle 1-2-3-1 plus bridge 3-7; all one component rooted at 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 7)], "id_a long, id_b long"
    )
    out = connected_components(edges)
    assert _comps(out) == {1: 1, 2: 1, 3: 1, 7: 1}


def test_max_iter_caps_rounds(spark):
    # one materialized round = TWO propagation hops: with max_iter=1 the
    # far end of a 5-chain moves exactly two hops, not to convergence.
    # local_threshold=0 forces the DISTRIBUTED loop (the sequential
    # union-find tail always converges fully; round capping is a
    # distributed-path contract).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    out = _comps(
        connected_components(edges, max_iter=1, local_threshold=0)
    )
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[5] == 3  # two hops reached 3's initial label, not 1


def test_local_tail_matches_distributed(spark):
    # the size-gated union-find tail must emit the identical
    # (id, min-reachable-id) labels as the distributed propagation,
    # isolated vertices included
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        "id_a long, id_b long",
    )
    verts = spark.createDataFrame([(99,), (1,), (10,)], "doc_id long")
    local = _comps(
        connected_components(edges, vertices=verts, vertex_col="doc_id")
    )
    dist = _comps(
        connected_components(
            edges, vertices=verts, vertex_col="doc_id", local_threshold=0
        )
    )
    assert local == dist == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 99: 99
    }


def _sym(spark, undirected):
    """Symmetric weighted edge list from canonical (a, b, w) tuples."""
    rows = [(a, b, w) for a, b, w in undirected] + [
        (b, a, w) for a, b, w in undirected
    ]
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_pagerank_uniform_on_cycle(spark):
    from stream_processing_with_flink_study_spark.operators.graph import pagerank

    # 4-cycle, equal weights: PageRank is exactly uniform at every
    # iteration, and ranks must sum to 1
    edges = _sym(spark, [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 1, 1)])
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, iters=4).collect()}
    assert set(ranks) == {1, 2, 3, 4}
    for v in ranks.values():
        assert abs(v - 0.25) < 1e-12
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_pagerank_star_center_dominates(spark):
    from stream_processing_with_flink_study_spark.operators.graph import pagerank

    # star with center 1: leaves agree with each other, center wins,
    # total mass conserved at every iteration count
    edges = _sym(spark, [(1, 2, 1), (1, 3, 1), (1, 4, 1)])
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, iters=6).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    leaves = [ranks[2], ranks[3], ranks[4]]
    assert max(leaves) - min(leaves) < 1e-12
    assert ranks[1] > leaves[0] * 1.5


def test_pagerank_weight_sensitivity(spark):
    from stream_processing_with_flink_study_spark.operators.graph import pagerank

    # triangle with one heavy edge: the two heavy-edge endpoints must
    # outrank the third node
    edges = _sym(spark, [(1, 2, 10), (2, 3, 1), (1, 3, 1)])
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, iters=8).collect()}
    assert ranks[1] > ranks[3] and ranks[2] > ranks[3]
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_triangle_stats_complete_graphs(spark):
    from stream_processing_with_flink_study_spark.operators.graph import (
        triangle_stats,
    )

    # K4: C(4,3)=4 triangles, clustering coefficient exactly 1
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(k4, "src long, dst long")
    row = triangle_stats(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)
    assert row.clustering_coeff == 1.0

    # K5 minus one edge (4,5): 10-3=7 triangles
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6) if (a, b) != (4, 5)]
    row = triangle_stats(
        spark.createDataFrame(k5, "src long, dst long")
    ).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 9, 7)


def test_sssp_bounded_bellman_ford(spark):
    from stream_processing_with_flink_study_spark.operators.graph import sssp

    # directed path 1→2→3→4 plus a worse shortcut 1→3; K bounds hops
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 4.0), (1, 3, 5.0)],
        "src long, dst long, cost double",
    )
    d1 = {r.id: r.dist for r in sssp(edges, source=1, rounds=1).collect()}
    assert d1 == {1: 0.0, 2: 1.0, 3: 5.0}  # one hop: only direct edges
    d2 = {r.id: r.dist for r in sssp(edges, source=1, rounds=2).collect()}
    # two hops: 3 improves via 1→2→3; 4 reachable only via the shortcut
    assert d2 == {1: 0.0, 2: 1.0, 3: 3.0, 4: 9.0}
    d3 = {r.id: r.dist for r in sssp(edges, source=1, rounds=3).collect()}
    assert d3[4] == 7.0 and d3[3] == 3.0  # three hops: 1→2→3→4 wins


def test_kcore_peeling(spark):
    from stream_processing_with_flink_study_spark.operators.graph import kcore

    # K4 (every vertex degree 3) plus a pendant chain 4-5-6: the
    # 2-core is exactly the K4 — the chain peels away in two rounds
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (5, 6)], "src long, dst long"
    )
    core2 = {r.id: r.degree for r in kcore(edges, k=2).collect()}
    assert core2 == {1: 3, 2: 3, 3: 3, 4: 3}
    # 3-core of the same graph is still the K4; 4-core is empty
    core3 = {r.id: r.degree for r in kcore(edges, k=3).collect()}
    assert core3 == {1: 3, 2: 3, 3: 3, 4: 3}
    assert kcore(edges, k=4).count() == 0


def test_pagerank_shuffle_path_bit_identical(spark):
    """broadcast_threshold=0 forces the large-graph shuffle-hash path;
    ranks must be BIT-identical to the broadcast path (same edge cache
    partitioning -> same partial-sum combine order)."""
    from stream_processing_with_flink_study_spark.operators.graph import pagerank

    edges = _sym(
        spark, [(1, 2, 10), (2, 3, 1), (1, 3, 1), (3, 4, 2), (4, 1, 5)]
    )
    bc = {r["id"]: r["rank"] for r in pagerank(edges, iters=6).collect()}
    sh = {
        r["id"]: r["rank"]
        for r in pagerank(edges, iters=6, broadcast_threshold=0).collect()
    }
    assert bc == sh  # exact float equality, not approx
    assert abs(sum(sh.values()) - 1.0) < 1e-9


def test_pagerank_shuffle_path_plan_has_no_broadcast(spark):
    """The forced-shuffle round join must not contain a broadcast
    exchange of the rank vector (broadcast of a 1-row literal stats
    frame is fine -- there is none here)."""
    from pyspark.sql.window import Window
    from pyspark.sql import functions as F

    edges = _sym(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 1)])
    fedges = (
        edges.withColumn(
            "frac", F.col("w") / F.sum("w").over(Window.partitionBy("src"))
        )
        .select("src", "dst", "frac")
        .repartition(4, "src")
        .persist()
    )
    fedges.count()
    ranks = fedges.select(F.col("src").alias("id")).distinct().select(
        "id", F.lit(1.0).alias("rank")
    )
    joined = fedges.join(ranks.hint("shuffle_hash"), fedges.src == ranks.id)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    fedges.unpersist()


def test_sssp_shuffle_path_bit_identical(spark):
    from stream_processing_with_flink_study_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 4.0), (1, 3, 5.0), (2, 4, 9.5)],
        "src long, dst long, cost double",
    )
    bc = {r.id: r.dist for r in sssp(edges, source=1, rounds=3).collect()}
    sh = {
        r.id: r.dist
        for r in sssp(
            edges, source=1, rounds=3, broadcast_threshold=0
        ).collect()
    }
    assert bc == sh
    assert sh[4] == 7.0


def test_triangle_stats_shuffle_path_exact(spark):
    """Degree-ordered shuffle edge-iterator (broadcast_threshold=0)
    reproduces the broadcast path's exact counts on K4, K5-minus-edge,
    and a graph with skewed degrees (star + triangle)."""
    from stream_processing_with_flink_study_spark.operators.graph import (
        triangle_stats,
    )

    cases = {
        "k4": [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
        "k5m": [
            (a, b)
            for a in range(1, 6)
            for b in range(a + 1, 6)
            if (a, b) != (4, 5)
        ],
        # star center 1 -> 2..6 plus triangle 2-3 closing: exactly one
        # triangle (1,2,3); degree skew exercises the orientation
        "star_tri": [(1, x) for x in range(2, 7)] + [(2, 3)],
    }
    expect = {"k4": 4, "k5m": 7, "star_tri": 1}
    for name, es in cases.items():
        df = spark.createDataFrame(es, "src long, dst long")
        fast = triangle_stats(df).collect()[0]
        scale = triangle_stats(df, broadcast_threshold=0).collect()[0]
        assert fast.asDict() == scale.asDict(), name
        assert scale.n_triangles == expect[name], name


def test_star_cc_equals_min_propagation(spark):
    """Large-star/small-star CC must produce the identical labeling as
    min-propagation on chains (deep), cliques+bridge, and a seeded
    random graph (the regime mixing both shapes)."""
    import random

    from stream_processing_with_flink_study_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    cases = {
        "chain": [(i, i + 1) for i in range(1, 12)] + [(20, 21)],
        "cliquebridge": [
            (a, b) for a in range(1, 5) for b in range(a + 1, 5)
        ] + [(4, 10), (10, 11), (11, 12), (30, 31)],
    }
    rng = random.Random(7)
    cases["random"] = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(1, 60), rng.randrange(1, 60)) for _ in range(70)
            )
            if a != b
        }
    )
    for name, es in cases.items():
        df = spark.createDataFrame(es, "id_a long, id_b long")
        want = {r.id: r.comp for r in connected_components(df).collect()}
        got = {r.id: r.comp for r in connected_components_star(df).collect()}
        assert got == want, name


def test_edge_snapshot_fingerprint_invalidation(tmp_path):
    """Regenerating the dataset at sf_dir mid-process must change the
    snapshot cache key (round-8 advice: mtime/size fingerprint), so
    downstream graph queries never read stale edges."""
    import os
    import shutil

    from stream_processing_with_flink_study_spark.plans.queries_graph import (
        _dataset_fingerprint,
    )

    sf = "/root/testdata/sf0.001"
    d = tmp_path / "sfcopy"
    d.mkdir()
    for tbl in ("lineitem.parquet", "orders.parquet"):
        src = os.path.join(sf, tbl)
        dst = str(d / tbl)
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    f1 = _dataset_fingerprint(str(d))
    assert f1 == _dataset_fingerprint(str(d))  # stable fixture -> hit
    # "regenerate": bump mtime on one lineitem file
    root = str(d / "lineitem.parquet")
    victim = root
    if os.path.isdir(root):
        for dirp, _, files in os.walk(root):
            if files:
                victim = os.path.join(dirp, files[0])
                break
    st = os.stat(victim)
    os.utime(victim, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert _dataset_fingerprint(str(d)) != f1
