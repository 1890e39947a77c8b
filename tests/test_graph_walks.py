"""Deterministic random walks (`graph_random_walks`): full independent
replay — adjacency ranks, degrees, and md5 picks recomputed in plain
Python/hashlib over the same edge set, every emitted row matched."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from stream_processing_with_flink_study_spark.plans import QUERIES
from stream_processing_with_flink_study_spark.plans.queries_graph import (
    RW_STEPS,
    RW_WALKS,
    _cosupplier_edges,
)

SF_SMALL = "/root/testdata/sf0.001"


def _pick(seed: int, wid: int, step: int, node: int, deg: int) -> int:
    h = hashlib.md5(f"rw|{seed}|{wid}|{step}|{node}".encode()).hexdigest()
    return int(h[:8], 16) % deg


def test_random_walks_match_hashlib_replay(spark):
    pairs = _cosupplier_edges(spark, SF_SMALL).collect()
    adj = defaultdict(list)
    for r in pairs:
        adj[r.src].append(r.dst)
        adj[r.dst].append(r.src)
    for u in adj:
        adj[u].sort()

    expect = set()
    for seed in sorted(adj):
        if seed % 4 != 0:
            continue
        for wid in range(RW_WALKS):
            node = seed
            expect.add((seed, wid, 0, node))
            for t in range(1, RW_STEPS + 1):
                node = adj[node][_pick(seed, wid, t, node, len(adj[node]))]
                expect.add((seed, wid, t, node))

    got = {
        (r.seed, r.wid, r.step, r.node)
        for r in QUERIES["graph_random_walks"](spark, SF_SMALL).collect()
    }
    assert got == expect
    # structural laws: every walk is complete and edge-respecting
    per_walk = defaultdict(dict)
    for seed, wid, step, node in got:
        per_walk[(seed, wid)][step] = node
    for (seed, wid), steps in per_walk.items():
        assert sorted(steps) == list(range(RW_STEPS + 1))
        assert steps[0] == seed
        for t in range(1, RW_STEPS + 1):
            assert steps[t] in adj[steps[t - 1]]
