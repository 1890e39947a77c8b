"""Graph-analytics queries (fifth wave): weighted PageRank and triangle
counting over a co-occurrence graph derived from relational data — the
"entity graph from event/transaction logs" pattern (reference scope:
keyed iterative state, 정리/5주차.md state discussion; the iterative
driver mirrors ``operators/graph.py`` connected components).

Graph derivation is the scale-heavy part and is shaped for 100 TB: the
co-supplier edge list comes from ONE self-join of the distinct
(order, supplier) projection on its join key, aggregated to weighted
pairs; every iterative step afterwards runs on the aggregated edge
list (|E| bounded by |suppliers|², orders never re-scanned).

Float determinism vs the DuckDB oracle: PageRank per-iteration sums
run over identical operand sets in both engines; results are reported
as ``round(rank * N, 5)`` (relative-to-uniform scale) so summation-
order jitter (~1e-12 relative) can never flip a digit, and the top-k
cut orders by the ROUNDED value with the node id as tiebreak so the
cut itself is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

PR_DAMPING = 0.85
PR_ITERS = 6


def _cosupplier_edges_sql(min_weight: int = 1) -> str:
    """Symmetric weighted co-supplier edge list (shared-order count) as
    a DuckDB CTE body; ``pairs`` is canonical (src < dst)."""
    return f"""
    ok AS (
      SELECT DISTINCT l_orderkey AS okey, l_suppkey AS s FROM lineitem
    ),
    pairs AS (
      SELECT a.s AS src, b.s AS dst, count(*) AS w
      FROM ok a JOIN ok b ON a.okey = b.okey AND a.s < b.s
      GROUP BY a.s, b.s
      HAVING count(*) >= {min_weight}
    )"""


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank (recursive-term aggregation is
    not portable SQL, and {PR_ITERS} unrolled steps keep the oracle a
    plain chain of CTEs DuckDB executes directly)."""
    steps = []
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""
    pr{k} AS (
      SELECT n.id,
             (1 - {PR_DAMPING}) / (SELECT nn FROM nct)
               + {PR_DAMPING} * coalesce(s.acc, 0) AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS id, sum(p.rank * e.frac) AS acc
        FROM pr{k - 1} p JOIN fedges e ON e.src = p.id
        GROUP BY e.dst
      ) s ON s.id = n.id
    )""")
    chain = ",".join(steps)
    return f"""
    WITH {_cosupplier_edges_sql()},
    edges AS (
      SELECT src, dst, w FROM pairs
      UNION ALL
      SELECT dst AS src, src AS dst, w FROM pairs
    ),
    outdeg AS (SELECT src, sum(w) AS wout FROM edges GROUP BY src),
    fedges AS (
      SELECT e.src, e.dst, e.w * 1.0 / o.wout AS frac
      FROM edges e JOIN outdeg o ON o.src = e.src
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    nct AS (SELECT count(*) AS nn FROM nodes),
    pr0 AS (SELECT id, 1.0 / (SELECT nn FROM nct) AS rank FROM nodes),
    {chain}
    SELECT id AS s_suppkey,
           round(rank * (SELECT nn FROM nct), 5) AS rank_rel
    FROM pr{PR_ITERS}
    ORDER BY rank_rel DESC, s_suppkey
    LIMIT 20
    """


def _cosupplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (src < dst) weighted co-supplier pairs.  One shuffle:
    the self-join and the pair count both key on l_orderkey-derived
    groups; the distinct projection is 16 bytes/row."""
    ok = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = ok.alias("a")
    b = ok.select(F.col("okey"), F.col("s").alias("s2")).alias("b")
    return (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.s") < F.col("b.s2")))
        .groupBy(F.col("a.s").alias("src"), F.col("b.s2").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


@query("pagerank_cosupplier", _pagerank_oracle())
def pagerank_cosupplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the co-supplier graph (suppliers linked
    when they serve the same order; weight = shared orders), damping
    0.85, 6 synchronous iterations from a uniform start — the
    entity-importance pass of a graph feature pipeline.

    Scale shape: the orders table is touched ONCE (edge derivation);
    iterations run on the persisted, outdegree-normalized edge list
    (``frac = w/wout`` precomputed, so each round is one join + one
    keyed sum over |E| rows).  Lineage is truncated with
    ``localCheckpoint`` every 3 rounds exactly like
    ``operators/graph.py:connected_components``.  Symmetric edges →
    every node has outdegree ≥ 1, so there is no dangling-mass term.
    """
    edges = _cosupplier_edges(spark, sf_dir)
    sym = edges.union(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    outdeg = sym.groupBy("src").agg(F.sum("w").alias("wout"))
    fedges = (
        sym.join(outdeg, "src")
        .select("src", "dst", (F.col("w") / F.col("wout")).alias("frac"))
        .persist()
    )
    nodes = fedges.select(F.col("src").alias("id")).distinct().persist()
    n_nodes = nodes.count()  # one small action; node set is tiny vs |E|
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - PR_DAMPING) / n_nodes
    for it in range(PR_ITERS):
        acc = (
            fedges.join(ranks, fedges.src == ranks.id)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("frac")).alias("acc"))
        )
        ranks = (
            nodes.join(acc, nodes.id == acc.dst, "left")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(PR_DAMPING) * F.coalesce("acc", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if it % 3 == 2:
            ranks = ranks.localCheckpoint(eager=False)
    out = ranks.select(
        F.col("id").alias("s_suppkey"),
        F.round(F.col("rank") * n_nodes, 5).alias("rank_rel"),
    )
    return out.orderBy(F.desc("rank_rel"), F.asc("s_suppkey")).limit(20)


@query(
    "triangle_count_graph",
    f"""
    WITH {_cosupplier_edges_sql(min_weight=3)},
    deg AS (
      SELECT s, count(*) AS d FROM (
        SELECT src AS s FROM pairs UNION ALL SELECT dst AS s FROM pairs
      ) GROUP BY s
    ),
    tri AS (
      SELECT count(*) AS n_tri
      FROM pairs e1
      JOIN pairs e2 ON e2.src = e1.dst
      JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM pairs) AS n_edges,
           (SELECT n_tri FROM tri) AS n_triangles,
           round(3.0 * (SELECT n_tri FROM tri)
                 / (SELECT sum(d * (d - 1) / 2) FROM deg), 4)
             AS clustering_coeff
    """,
)
def triangle_count_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    co-supplier graph thresholded to edges with ≥3 shared orders (the
    thinning a real co-occurrence graph needs before motif counting).

    Scale shape: canonical ``src < dst`` edges mean each triangle is
    enumerated exactly once via two equi-joins (the standard
    edge-iterator algorithm); the degree sum for the wedge denominator
    is a keyed count over 2|E| rows.  No driver iteration, three
    shuffles total, all on supplier-id keys."""
    pairs = _cosupplier_edges(spark, sf_dir).filter(F.col("w") >= 3).persist()
    deg = (
        pairs.select(F.col("src").alias("s"))
        .union(pairs.select(F.col("dst").alias("s")))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
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
