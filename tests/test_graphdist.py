"""Planted-truth tests for the graph-distance wave: the oracle proves
cross-engine agreement; these prove the FORMULAS against graphs whose
centralities are known in closed form (the shared-bug-oracle defense
every statistical wave carries)."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.plans.queries_graphdist import (
    BFS_ROUNDS,
    DELTA_SCALE,
    bfs_sigma_from,
    brandes_fixed_point_from,
)


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()


def _ref_brandes_int(pairs, seeds, rounds=BFS_ROUNDS):
    """Independent pure-python mirror of the fixed-point spec: BFS with
    exact σ, then δint_v = Σ (σv·(10⁶+δint_w)) // σw accumulated from
    the horizon inward."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    bet: dict[int, int] = {}
    for s in seeds:
        dist, sigma = {s: 0}, {s: 1}
        frontier = [s]
        for r in range(1, rounds + 1):
            nxt: dict[int, int] = {}
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        nxt[v] = nxt.get(v, 0) + sigma[u]
            for v, sg in nxt.items():
                dist[v], sigma[v] = r, sg
            frontier = list(nxt)
        dint = {v: 0 for v in dist}
        for r in range(rounds - 1, 0, -1):
            for v in [x for x in dist if dist[x] == r]:
                acc = 0
                for w in adj.get(v, ()):
                    if dist.get(w) == r + 1:
                        acc += (sigma[v] * (DELTA_SCALE + dint[w])) // sigma[w]
                dint[v] = acc
        for v in dist:
            if dist[v] > 0:
                bet[v] = bet.get(v, 0) + dint[v]
    return bet


def test_path_graph_middle_node_wins(spark):
    """Path 1-2-3-4-5: all σ = 1 so the fixed point is EXACT Brandes;
    node 3 carries the most shortest paths among seeds {1,2,3,4}."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    sym = _sym(spark, pairs)
    s, seeds, b = bfs_sigma_from(sym)
    got = {
        r["part_id"]: r["bet_int"]
        for r in brandes_fixed_point_from(sym, b).collect()
    }
    want = _ref_brandes_int(pairs, [1, 2, 3, 4])
    assert got == {k: v for k, v in want.items() if v or k in got}
    assert max(got, key=got.get) == 3
    # endpoints of the path never sit between anything
    assert got.get(5, 0) == 0


def test_diamond_splits_dependency_exactly(spark):
    """Diamond 1-2-4, 1-3-4 (+ tail 4-5): σ(1→4)=2 and each middle
    node carries exactly half a unit plus half the tail's dependency —
    fractions the micro-unit division must land exactly."""
    pairs = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    sym = _sym(spark, pairs)
    s, seeds, b = bfs_sigma_from(sym)
    got = {
        r["part_id"]: r["bet_int"]
        for r in brandes_fixed_point_from(sym, b).collect()
    }
    want = _ref_brandes_int(pairs, [1, 2, 3, 4])
    for k, v in want.items():
        assert got.get(k, 0) == v, (k, got.get(k), v)
    # from seed 1 alone: δ(2) = δ(3) = (1/2)(1 + δ(4)) with δ(4) = 1
    # (tail node 5): exactly one DELTA_SCALE unit each from that seed
    one_seed = _ref_brandes_int(pairs, [1])
    assert one_seed[2] == one_seed[3] == DELTA_SCALE


def test_fixed_point_tracks_true_brandes(spark):
    """On a richer graph the micro-unit truncation stays within
    (#accumulation terms)/10⁶ of true bounded-radius Brandes computed
    with exact Fractions."""
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 5), (3, 5), (4, 6), (5, 7),
        (6, 7), (2, 6), (3, 8), (8, 9), (4, 9), (7, 10),
    ]
    sym = _sym(spark, pairs)
    s, seeds, b = bfs_sigma_from(sym)
    got = {
        r["part_id"]: r["bet_int"]
        for r in brandes_fixed_point_from(sym, b).collect()
    }
    # true bounded-radius Brandes with Fractions
    adj: dict[int, set[int]] = {}
    for a, c in pairs:
        adj.setdefault(a, set()).add(c)
        adj.setdefault(c, set()).add(a)
    true_bet: dict[int, Fraction] = {}
    for sd in (1, 2, 3, 4):
        dist, sigma = {sd: 0}, {sd: 1}
        frontier = [sd]
        for r in range(1, BFS_ROUNDS + 1):
            nxt: dict[int, int] = {}
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        nxt[v] = nxt.get(v, 0) + sigma[u]
            for v, sg in nxt.items():
                dist[v], sigma[v] = r, sg
            frontier = list(nxt)
        delta = {v: Fraction(0) for v in dist}
        for r in range(BFS_ROUNDS - 1, 0, -1):
            for v in [x for x in dist if dist[x] == r]:
                for w in adj[v]:
                    if dist.get(w) == r + 1:
                        delta[v] += Fraction(sigma[v], sigma[w]) * (
                            1 + delta[w]
                        )
        for v in dist:
            if dist[v] > 0:
                true_bet[v] = true_bet.get(v, Fraction(0)) + delta[v]
    deg = max(len(v) for v in adj.values())
    tol = BFS_ROUNDS * deg * 4  # terms × seeds, in micro-units
    for k, v in true_bet.items():
        assert abs(got.get(k, 0) - int(v * DELTA_SCALE)) <= tol, (
            k, got.get(k), float(v),
        )


def test_bfs_sigma_counts_paths(spark):
    """σ is the exact number of shortest paths: complete bipartite
    K2,3 from one side's seed gives σ = 2 to the opposite-side mate
    via... verified directly against hand counts."""
    pairs = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12)]
    sym = _sym(spark, pairs)
    s, seeds, b = bfs_sigma_from(sym, n_seeds=1)  # seed = node 1
    rows = {
        (r["node"]): (r["dist"], r["sigma"])
        for r in b.filter(F.col("seed") == 1).collect()
    }
    assert rows[1] == (0, 1)
    assert rows[10] == rows[11] == rows[12] == (1, 1)
    assert rows[2] == (2, 3)  # three shortest paths via 10/11/12


def test_bfs_local_matches_distributed(spark):
    """The driver-side scatter-add BFS (under BFS_LOCAL_EDGE_GATE) must
    emit the IDENTICAL (seed, node, dist, sigma) set as the distributed
    join-per-round loop — the connected-components hybrid-tail pin,
    applied to the σ-levels build.  Graph mixes a diamond (σ > 1), a
    tail past the radius, and a disconnected component so reachability,
    path counts and the horizon cut are all exercised."""
    pairs = [
        (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 7),
        (2, 3),  # triangle edge: odd/even distance interplay
        (100, 101), (101, 102),  # disconnected component
    ]
    sym = _sym(spark, pairs)
    _, _, b_local = bfs_sigma_from(sym)  # ≤ gate → driver path
    _, _, b_dist = bfs_sigma_from(sym, local_threshold=0)  # forced loop
    got_local = {
        (r["seed"], r["node"]): (r["dist"], r["sigma"])
        for r in b_local.collect()
    }
    got_dist = {
        (r["seed"], r["node"]): (r["dist"], r["sigma"])
        for r in b_dist.collect()
    }
    assert got_local == got_dist
    assert got_local  # non-vacuous


def test_brandes_local_matches_distributed(spark):
    """Same pin for the backward pass: the driver-side scatter-add
    Brandes must emit the identical (part_id, bet_int, betweenness)
    rows — including WHICH zero-score nodes appear (the distributed
    join only emits v nodes with a one-level-deeper neighbor, and
    membership decides tie-broken top-20 cuts on tiny graphs)."""
    pairs = [
        (1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 7),
        (2, 3), (100, 101), (101, 102),
    ]
    sym = _sym(spark, pairs)
    _, _, b = bfs_sigma_from(sym, local_threshold=0)
    rows_local = brandes_fixed_point_from(sym, b).collect()
    rows_dist = brandes_fixed_point_from(sym, b, local_threshold=0).collect()
    as_tuples = lambda rows: [  # noqa: E731
        (r["part_id"], r["bet_int"], r["betweenness"]) for r in rows
    ]
    assert as_tuples(rows_local) == as_tuples(rows_dist)
    assert rows_local  # non-vacuous
