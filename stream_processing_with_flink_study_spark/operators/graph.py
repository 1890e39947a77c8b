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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 6,
    damping: float = 0.85,
    edge_partitions: int = 8,
) -> DataFrame:
    """Weighted PageRank over a DIRECTED edge list; returns (id, rank)
    with Σ rank = 1 after any number of iterations.

    Requires every node to appear as a source (symmetrize an undirected
    graph before calling) — then every node also receives contributions
    and there is no dangling-mass correction term.

    Scale shape: the outdegree-normalized edge list is persisted once
    (normalization is a window over the src partitioning — one
    exchange, no aggregate + join-back); each round BROADCASTS the
    dimension-bounded rank vector and runs one map-side join over the
    edge cache plus a partial-agg'd keyed sum.  Rounds materialize
    eagerly under a temporarily-disabled AQE (these are 8-task cached
    jobs + a |nodes|-row aggregate; per-stage re-planning costs more
    latency than it saves), and each round's tiny rank vector is
    persisted because broadcast exchanges are not cached — a lazy chain
    would recompute all previous rounds at every round.  A
    billion-node graph would flip the broadcast to a shuffle join on a
    src-partitioned edge cache; the contribution-sum shape is
    identical."""
    from pyspark.sql.window import Window

    spark = edges.sparkSession
    fedges = (
        edges.withColumn(
            "frac",
            F.col(weight) / F.sum(weight).over(Window.partitionBy(src)),
        )
        .select(F.col(src).alias("src"), F.col(dst).alias("dst"), "frac")
        .coalesce(edge_partitions)
        .persist()
    )
    nodes = fedges.select(F.col("src").alias("id")).distinct()
    n_nodes = nodes.count()
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(iters):
            acc = (
                fedges.join(F.broadcast(ranks), fedges.src == ranks.id)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("frac")).alias("acc"))
            )
            ranks = acc.select(
                F.col("dst").alias("id"),
                (F.lit(teleport) + F.lit(damping) * F.col("acc")).alias(
                    "rank"
                ),
            ).persist()
            ranks.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return ranks


def triangle_stats(
    pairs: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Triangle count + global clustering coefficient over a CANONICAL
    (src < dst) undirected edge list.  One row out: (n_nodes, n_edges,
    n_triangles, clustering_coeff = 3·triangles / wedges).

    Scale shape: canonical edges enumerate each triangle exactly once
    via two equi-joins (the edge-iterator algorithm) with both probe
    sides broadcast, so the wedge blow-up (Σ indeg·outdeg rows) stays
    map-side; the degree sum is a keyed count over 2|E| rows.  Callers
    should pre-thin dense co-occurrence graphs (weight threshold) —
    broadcastability of the edge list is the operating regime."""
    pairs = pairs.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).persist()
    deg = (
        pairs.select(F.col("src").alias("s"))
        .union(pairs.select(F.col("dst").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(F.broadcast(e2), F.col("e2.src") == F.col("e1.dst"))
        .join(
            F.broadcast(e3),
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("wedges"),
    )
    edge_ct = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(edge_ct))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_tri").cast("long").alias("n_triangles"),
            F.round(3.0 * F.col("n_tri") / F.col("wedges"), 4).alias(
                "clustering_coeff"
            ),
        )
    )


def sssp(
    edges: DataFrame,
    source: int,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
    cost: str = "cost",
    edge_partitions: int = 8,
) -> DataFrame:
    """Bounded Bellman-Ford single-source shortest paths over a
    DIRECTED weighted edge list: after K rounds the result is the exact
    shortest distance among paths of ≤ K edges (the K-hop truncation is
    the deterministic, oracle-checkable contract; graphs with small
    effective diameter — co-occurrence graphs — converge within it).

    Returns (id, dist) for every node reached within K hops.

    Scale shape: same broadcast-iterate skeleton as :func:`pagerank` —
    the edge list is persisted once; each round broadcasts the current
    (dimension-bounded) distance frontier, relaxes every out-edge
    map-side, and takes a keyed MIN (partial-agg'd).  Distances are
    pure min-plus values, so every per-node result is an exact min over
    identically-computed path sums — bit-stable across engines and
    partitionings."""
    spark = edges.sparkSession
    e = (
        edges.select(src, dst, cost)
        .coalesce(edge_partitions)
        .persist()
    )
    e.count()
    dist = spark.createDataFrame([(source, 0.0)], "id long, dist double")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for _ in range(rounds):
            relaxed = (
                e.join(F.broadcast(dist), e[src] == dist.id)
                .select(
                    F.col(dst).alias("id"),
                    (F.col("dist") + F.col(cost)).alias("dist"),
                )
            )
            dist = (
                dist.unionByName(relaxed)
                .groupBy("id")
                .agg(F.min("dist").alias("dist"))
                .persist()
            )
            dist.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    return dist


def kcore(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling over a CANONICAL (src < dst) undirected
    edge list: repeatedly drop vertices with degree < k (and their
    edges).  After R rounds the survivors are the fixpoint for any
    graph whose peeling cascade is ≤ R deep — the bounded-round
    contract (same style as :func:`sssp`) that an unrolled SQL oracle
    can replay; R=8 covers co-occurrence graphs whose cascades are
    shallow.  Returns (id, degree) for surviving vertices with their
    in-core degree.

    Scale shape: each round is one degree count over 2|E'| rows plus a
    semi-join filtering the edge list by surviving endpoints (the
    survivor set is dimension-bounded → broadcast); edges only ever
    shrink, and ``localCheckpoint`` truncates lineage per round like
    :func:`connected_components`."""
    e = edges.select(src, dst).localCheckpoint()
    for _ in range(rounds):
        deg = (
            e.select(F.col(src).alias("id"))
            .union(e.select(F.col(dst).alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("id")
        e = (
            e.join(
                F.broadcast(keep.withColumnRenamed("id", src)), src
            )
            .join(F.broadcast(keep.withColumnRenamed("id", dst)), dst)
            .select(src, dst)
            .localCheckpoint()
        )
    return (
        e.select(F.col(src).alias("id"))
        .union(e.select(F.col(dst).alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
