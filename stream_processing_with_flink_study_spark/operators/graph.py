"""Iterative graph operators — connected components for near-dup
clustering.

Near-dup *pairs* (MinHash/LSH output) are not yet a dedup decision:
A~B and B~C must collapse to ONE surviving document even when A~C was
never emitted.  That transitive closure is connected components, the
canonical iterative algorithm a training-data pipeline needs on top of
the pair stage.

The implementation is min-label propagation (the dataflow form of
union-find): every vertex starts labeled with its own id; each round
every vertex takes the min of its label and its neighbors' labels;
converged when no label changes.  Rounds = graph diameter (near-dup
clusters are shallow — typically 2-4 rounds).  Each round is one
shuffle join + one aggregation; lineage is truncated per round with
``localCheckpoint`` so the plan does not grow with the iteration count
(on a real cluster with a checkpoint dir, ``checkpoint`` — same call
shape).  Labels only ever decrease, so convergence is monotone and the
changed-check is a cheap anti-semi probe (`limit(1).count()`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    vertices: DataFrame | None = None,
    vertex_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list.

    Returns (id, comp) where ``comp`` is the min vertex id reachable
    from ``id``.  ``vertices`` (one column ``vertex_col``) optionally
    adds isolated vertices, which come back as singleton components.

    Scale shape: each round shuffles |E| label messages keyed by vertex
    — never materializes pairwise reachability.  For power-law dedup
    graphs the large-star/small-star variant halves rounds, but plain
    min-propagation is optimal for the shallow clusters dedup produces.

    Each materialized round propagates TWO hops (two join+min steps
    fused into one lineage before the ``localCheckpoint``): label reach
    doubles per round, so a diameter-d graph converges in ⌈d/2⌉+1
    rounds — at the dedup corpus's shallow diameters that halves the
    sequential job launches (checkpoint + convergence probe), which at
    small scale ARE the wall clock, without changing per-round shuffle
    volume at 100 TB (2×|E| messages per round either way).
    """
    sym = edges.select(
        F.col(src).cast("long").alias("id"), F.col(dst).cast("long").alias("nbr")
    ).unionByName(
        edges.select(
            F.col(dst).cast("long").alias("id"), F.col(src).cast("long").alias("nbr")
        )
    )
    verts = sym.select("id")
    if vertices is not None:
        verts = verts.unionByName(
            vertices.select(F.col(vertex_col).cast("long").alias("id"))
        )
    labels = (
        verts.distinct().select("id", F.col("id").alias("comp")).localCheckpoint()
    )
    sym = sym.localCheckpoint()  # pin the edge list; reused every round

    def step(lbl: DataFrame) -> DataFrame:
        msgs = sym.join(
            lbl.withColumnRenamed("id", "nbr"), "nbr"
        ).select("id", "comp")
        return (
            lbl.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )

    for rnd in range(max_iter):
        new_labels = step(step(labels)).localCheckpoint()
        # round 0 always changes labels on any non-empty edge list, so
        # the convergence probe (an extra job) starts at round 1
        if rnd > 0:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.comp") < F.col("o.comp"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels = new_labels
                break
        labels = new_labels
    return labels
