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
    # far end of a 5-chain moves exactly two hops, not to convergence
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    out = _comps(connected_components(edges, max_iter=1))
    assert out[1] == 1 and out[2] == 1 and out[3] == 1
    assert out[5] == 3  # two hops reached 3's initial label, not 1
