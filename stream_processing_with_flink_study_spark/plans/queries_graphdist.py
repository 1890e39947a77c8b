"""Graph distance / centrality wave (round 8): bounded-radius BFS from
a deterministic seed set over the part co-purchase graph — closeness,
eccentricity/diameter bounds, and sampled Brandes betweenness in EXACT
fixed-point integer arithmetic (full DuckDB oracles for all three).

Scale shape: the co-purchase edge list is the shared materialized
snapshot (``queries_graph._copurchase_edges``); each BFS round is one
|E|-sized join keyed on node id + one groupBy (the PageRank shuffle
shape), R rounds total, frontier-filtered so later rounds touch only
the newly reached rim.  Path counts σ are exact BIGINTs (sums of
predecessor σ), and the Brandes dependency accumulation runs in
micro-unit integer division — (σ_v·(10⁶+δint_w)) DIV σ_w — so every
intermediate is an exact int64 in BOTH engines: no float sum-order
surface anywhere.  Sampled-source BFS (k seeds, bounded radius R) is
the standard scale decomposition for centrality on large graphs —
exact all-pairs Brandes is O(V·E) and never runs at 100 TB.

Reference scope: iterative keyed state (정리/5주차.md); the graph
family contract of ``plans/queries_graph.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .queries_graph import _copurchase_edges, _cosupplier_edges
from .registry import query

BFS_SEEDS = 4
BFS_ROUNDS = 3
DELTA_SCALE = 1_000_000  # Brandes dependencies in micro-units

_BFS_PREFIX_SQL = """
    ok AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS p FROM lineitem
    ),
    cp AS MATERIALIZED (
      SELECT a.p AS src, b.p AS dst
      FROM ok a JOIN ok b ON a.okey = b.okey AND a.p < b.p
      GROUP BY 1, 2
    ),
    sym AS MATERIALIZED (
      SELECT src, dst FROM cp UNION ALL SELECT dst, src FROM cp
    ),
    seeds AS MATERIALIZED (
      SELECT src AS seed FROM sym GROUP BY src ORDER BY src LIMIT {k}
    ),
    b0 AS MATERIALIZED (
      SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist,
             CAST(1 AS BIGINT) AS sigma
      FROM seeds
    )
"""


def _bfs_rounds_sql(rounds: int) -> str:
    parts = []
    for r in range(1, rounds + 1):
        parts.append(f"""
    e{r} AS MATERIALIZED (
      SELECT p.seed, e.dst AS node, CAST(sum(p.sigma) AS BIGINT) AS sigma
      FROM b{r - 1} p JOIN sym e ON e.src = p.node
      WHERE p.dist = {r - 1}
      GROUP BY 1, 2
    ),
    b{r} AS MATERIALIZED (
      SELECT seed, node, dist, sigma FROM b{r - 1}
      UNION ALL
      SELECT x.seed, x.node, CAST({r} AS BIGINT) AS dist, x.sigma
      FROM e{r} x LEFT JOIN b{r - 1} k
        ON k.seed = x.seed AND k.node = x.node
      WHERE k.node IS NULL
    )""")
    return ",".join(parts)


def _bfs_prefix(k: int = BFS_SEEDS, rounds: int = BFS_ROUNDS) -> str:
    return _BFS_PREFIX_SQL.format(k=k) + "," + _bfs_rounds_sql(rounds)


_SYM_ARRAYS: dict[tuple, tuple] = {}


def _copurchase_sym_arrays(spark: SparkSession, sf_dir: str):
    """(src, dst) int64 numpy arrays of the co-purchase sym edges,
    Arrow-collected ONCE per process and fingerprint-keyed exactly like
    the parquet edge snapshots (``queries_graph._edge_snapshot``): the
    local BFS build and the local Brandes pass both consume them, and
    re-collecting 2.4M rows per consumer was ~2 s each at bench scale.
    Returns None above the local gate (the distributed paths never
    collect).  Plain numpy arrays — invisible to ``clearCache``/the
    bench drain, rebuilt on data-fingerprint change, never cross-run."""
    import os as _os

    import numpy as np

    from .queries_graph import _dataset_fingerprint

    key = (_os.path.abspath(sf_dir), _dataset_fingerprint(sf_dir))
    if key not in _SYM_ARRAYS:
        sym = _copurchase_edges(spark, sf_dir)
        if sym.count() > BFS_LOCAL_EDGE_GATE:
            return None
        pdf = sym.select("src", "dst").toPandas()
        _SYM_ARRAYS[key] = (
            pdf["src"].to_numpy(dtype=np.int64),
            pdf["dst"].to_numpy(dtype=np.int64),
        )
    return _SYM_ARRAYS[key]


def _bfs_sigma(
    spark: SparkSession, sf_dir: str, rounds: int = BFS_ROUNDS
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(sym_edges, seeds, levels) over the co-purchase snapshot.

    The (seed, node, dist, sigma) level frame is deterministic derived
    data consumed identically by three queries (closeness,
    eccentricity, betweenness), so like the edge lists it is
    materialized once per process via the fingerprinted
    :func:`..queries_graph._edge_snapshot` mechanism — each consumer
    pays one parquet read instead of re-running the ``rounds``-deep
    sequential BFS (3 checkpointed join+anti-join rounds)."""
    from .queries_graph import _edge_snapshot

    # the co-purchase snapshot is itself a parquet scratch file — cheap
    # to re-scan per reference, no checkpoint job needed here (below
    # the local gate the build is one Arrow collect; the distributed
    # fallback re-scans the snapshot parquet once per round)
    sym = _copurchase_edges(spark, sf_dir)
    b = _edge_snapshot(
        spark,
        sf_dir,
        f"bfs_sigma_r{rounds}",
        lambda sp, sd: bfs_sigma_from(
            _copurchase_edges(sp, sd),
            rounds=rounds,
            sym_arrays=_copurchase_sym_arrays(sp, sd),
        )[2],
    )
    seeds = b.filter(F.col("dist") == 0).select(
        F.col("node").alias("seed")
    )
    return sym, seeds, b


BFS_LOCAL_EDGE_GATE = 4_000_000  # sym rows; ~64 MB of (src, dst) via Arrow


def _bfs_sigma_local(
    spark: SparkSession, src, dst, seed_ids: list[int], rounds: int
) -> DataFrame:
    """Driver-side BFS-σ over an Arrow-collected edge array — the
    connected-components hybrid-tail pattern (guide §5 bounded driver
    state): per seed and round, one masked int64 scatter-add replaces a
    join + groupBy + anti-join + localCheckpoint Spark round (~13
    scheduled jobs for the 4-seed/3-round build).  σ sums are exact
    int64 in both forms, so the labels are identical by construction
    (pinned by tests/test_graphdist.py::test_bfs_local_matches_distributed)."""
    import numpy as np
    import pandas as pd

    schema = "seed long, node long, dist long, sigma long"
    if not seed_ids:
        return spark.createDataFrame([], schema)
    nodes = np.unique(
        np.concatenate([src, dst, np.asarray(seed_ids, dtype=np.int64)])
    )
    s_idx = np.searchsorted(nodes, src)
    d_idx = np.searchsorted(nodes, dst)
    n = len(nodes)
    parts: list[pd.DataFrame] = []
    for sd in seed_ids:
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.int64)
        si = int(np.searchsorted(nodes, sd))
        dist[si] = 0
        sigma[si] = 1
        for r in range(1, rounds + 1):
            mask = dist[s_idx] == r - 1
            contrib = np.zeros(n, dtype=np.int64)
            np.add.at(contrib, d_idx[mask], sigma[s_idx[mask]])
            new = (dist == -1) & (contrib > 0)
            dist[new] = r
            sigma[new] = contrib[new]
        reached = dist >= 0
        parts.append(
            pd.DataFrame(
                {
                    "seed": np.full(int(reached.sum()), sd, dtype=np.int64),
                    "node": nodes[reached],
                    "dist": dist[reached],
                    "sigma": sigma[reached],
                }
            )
        )
    return spark.createDataFrame(pd.concat(parts, ignore_index=True), schema)


def bfs_sigma_from(
    sym: DataFrame,
    rounds: int = BFS_ROUNDS,
    n_seeds: int = BFS_SEEDS,
    seeds: DataFrame | None = None,
    local_threshold: int = BFS_LOCAL_EDGE_GATE,
    sym_arrays: tuple | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(sym, seeds, levels) where levels = (seed, node, dist, sigma)
    for every node reached within ``rounds`` hops of the ``n_seeds``
    smallest node ids (or an explicit ``seeds`` frame with one ``seed``
    column — the scale smoke seeds every replicated universe) — σ is
    the exact shortest-path count (sum of dist-(r-1) predecessor σs).
    ``sym`` must be symmetric (src, dst) and is assumed
    checkpointed/cheap to rescan.

    Graphs at or under ``local_threshold`` sym rows run the driver-side
    scatter-add form (:func:`_bfs_sigma_local`, identical exact-int
    labels); larger graphs — the 100 TB regime, and the 10x overflow
    sweep — keep the distributed join-per-round loop.  Pass
    ``local_threshold=0`` to force the distributed path;
    ``sym_arrays`` short-circuits the collect with pre-collected
    (src, dst) arrays (the per-process `_copurchase_sym_arrays` cache)."""
    if local_threshold and (
        sym_arrays is not None or sym.count() <= local_threshold
    ):
        import numpy as np

        spark = sym.sparkSession
        if sym_arrays is not None:
            e_src, e_dst = sym_arrays
        else:
            pdf = sym.select("src", "dst").toPandas()
            e_src = pdf["src"].to_numpy(dtype=np.int64)
            e_dst = pdf["dst"].to_numpy(dtype=np.int64)
        if seeds is None:
            # smallest-id seeds straight off the collected array — no
            # distinct+sort+limit Spark job (~1 s at bench scale)
            seed_ids = [int(x) for x in np.unique(e_src)[:n_seeds]]
            seeds = spark.createDataFrame(
                [(s,) for s in seed_ids], "seed long"
            )
        else:
            seed_ids = sorted(
                int(r[0]) for r in seeds.select("seed").collect()
            )
        return sym, seeds, _bfs_sigma_local(
            spark, e_src, e_dst, seed_ids, rounds
        )
    if seeds is None:
        seeds = (
            sym.select("src")
            .distinct()
            .orderBy("src")
            .limit(n_seeds)
            .select(F.col("src").alias("seed"))
        )
    b = seeds.select(
        "seed",
        F.col("seed").alias("node"),
        F.lit(0).cast("long").alias("dist"),
        F.lit(1).cast("long").alias("sigma"),
    ).localCheckpoint()
    for r in range(1, rounds + 1):
        frontier = b.filter(F.col("dist") == r - 1).select(
            "seed", F.col("node").alias("_fn"), "sigma"
        )
        exp = (
            frontier.join(sym, frontier["_fn"] == sym["src"])
            .groupBy("seed", "dst")
            .agg(F.sum("sigma").alias("sigma"))
            .select(
                "seed",
                F.col("dst").alias("node"),
                F.lit(r).cast("long").alias("dist"),
                "sigma",
            )
        )
        new = exp.join(b.select("seed", "node"), ["seed", "node"], "left_anti")
        # each round references b twice (union + anti join): checkpoint
        # so lineage can't grow 2^rounds (the WL/HITS staging rule)
        b = b.unionByName(new).localCheckpoint()
    return sym, seeds, b


@query(
    "closeness_bfs_seeds",
    f"""
    WITH {_bfs_prefix()},
    per AS MATERIALIZED (
      SELECT seed, dist, CAST(count(*) AS BIGINT) AS c
      FROM b{BFS_ROUNDS} WHERE dist > 0 GROUP BY 1, 2
    ),
    piv AS (
      SELECT seed,
             CAST(coalesce(max(CASE WHEN dist = 1 THEN c END), 0) AS BIGINT) AS c1,
             CAST(coalesce(max(CASE WHEN dist = 2 THEN c END), 0) AS BIGINT) AS c2,
             CAST(coalesce(max(CASE WHEN dist = 3 THEN c END), 0) AS BIGINT) AS c3
      FROM per GROUP BY seed
    )
    SELECT seed, c1 + c2 + c3 AS n_reached,
           c1 + 2 * c2 + 3 * c3 AS sum_dist,
           round(CAST(c1 + c2 + c3 AS DOUBLE)
                 / (c1 + 2 * c2 + 3 * c3) - 1e-9, 6) + 0.0 AS closeness,
           round(CAST(c1 AS DOUBLE) + CAST(c2 AS DOUBLE) / 2
                 + CAST(c3 AS DOUBLE) / 3 - 1e-9, 6) + 0.0 AS harmonic
    FROM piv ORDER BY seed
    """,
)
def closeness_bfs_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius closeness + harmonic centrality of {BFS_SEEDS}
    deterministic seed parts (smallest ids) in the co-purchase graph:
    closeness = reached/Σdist within {BFS_ROUNDS} hops, harmonic =
    Σ 1/dist — the sampled-landmark form production graph systems use
    (exact closeness needs all-pairs distances).  Per-distance counts
    are exact ints; both ratios are single fixed double expressions
    over them (c1 + c2/2 + c3/3 — bounded term count, no float
    sum-order surface)."""
    _, _, b = _bfs_sigma(spark, sf_dir)
    piv = (
        b.filter(F.col("dist") > 0)
        .groupBy("seed")
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("dist") == d, F.lit(1))), F.lit(0)
                )
                .cast("long")
                .alias(f"c{d}")
                for d in (1, 2, 3)
            ]
        )
    )
    c1, c2, c3 = (F.col(f"c{d}") for d in (1, 2, 3))
    return piv.select(
        "seed",
        (c1 + c2 + c3).alias("n_reached"),
        (c1 + 2 * c2 + 3 * c3).alias("sum_dist"),
        (
            F.round(
                (c1 + c2 + c3).cast("double") / (c1 + 2 * c2 + 3 * c3)
                - 1e-9,
                6,
            )
            + 0.0
        ).alias("closeness"),
        (
            F.round(
                c1.cast("double") + c2.cast("double") / 2
                + c3.cast("double") / 3
                - 1e-9,
                6,
            )
            + 0.0
        ).alias("harmonic"),
    ).orderBy("seed")


@query(
    "eccentricity_seeds",
    f"""
    WITH {_bfs_prefix()},
    ecc AS MATERIALIZED (
      SELECT seed, CAST(max(dist) AS BIGINT) AS ecc
      FROM b{BFS_ROUNDS} GROUP BY seed
    )
    SELECT seed, ecc,
           (SELECT CAST(max(ecc) AS BIGINT) FROM ecc) AS diameter_lb,
           (SELECT CAST(min(ecc) AS BIGINT) FROM ecc) AS radius_ub
    FROM ecc ORDER BY seed
    """,
)
def eccentricity_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed eccentricities within the {BFS_ROUNDS}-hop horizon, plus
    the classic sampled bounds they certify: max eccentricity over any
    node set lower-bounds the graph diameter, min upper-bounds the
    radius (the iFUB/sampling argument).  Pure integer hop counts."""
    _, _, b = _bfs_sigma(spark, sf_dir)
    ecc = b.groupBy("seed").agg(F.max("dist").alias("ecc"))
    agg = ecc.agg(
        F.max("ecc").alias("diameter_lb"), F.min("ecc").alias("radius_ub")
    )
    return ecc.crossJoin(F.broadcast(agg)).select(
        "seed", "ecc", "diameter_lb", "radius_ub"
    ).orderBy("seed")


@query(
    "betweenness_fixed_point",
    f"""
    WITH {_bfs_prefix()},
    d2 AS MATERIALIZED (
      SELECT v.seed, v.node,
             CAST(sum((v.sigma * {DELTA_SCALE}) // w.sigma) AS BIGINT)
               AS dint
      FROM b{BFS_ROUNDS} v
      JOIN sym e ON e.src = v.node
      JOIN b{BFS_ROUNDS} w
        ON w.seed = v.seed AND w.node = e.dst AND w.dist = 3
      WHERE v.dist = 2
      GROUP BY 1, 2
    ),
    d1 AS MATERIALIZED (
      SELECT v.seed, v.node,
             CAST(sum((v.sigma * ({DELTA_SCALE} + coalesce(d.dint, 0)))
                      // w.sigma) AS BIGINT) AS dint
      FROM b{BFS_ROUNDS} v
      JOIN sym e ON e.src = v.node
      JOIN b{BFS_ROUNDS} w
        ON w.seed = v.seed AND w.node = e.dst AND w.dist = 2
      LEFT JOIN d2 d ON d.seed = w.seed AND d.node = w.node
      WHERE v.dist = 1
      GROUP BY 1, 2
    ),
    bet AS (
      SELECT node, CAST(sum(dint) AS BIGINT) AS bet_int
      FROM (SELECT seed, node, dint FROM d2
            UNION ALL SELECT seed, node, dint FROM d1) u
      GROUP BY node
    )
    SELECT node AS part_id, bet_int,
           round(CAST(bet_int AS DOUBLE) / {DELTA_SCALE} - 1e-9, 4) + 0.0
             AS betweenness
    FROM bet ORDER BY bet_int DESC, part_id LIMIT 20
    """,
)
def betweenness_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled Brandes betweenness from {BFS_SEEDS} seed sources in
    EXACT micro-unit fixed-point: forward BFS carries exact σ path
    counts, the backward pass accumulates δint_v = Σ_w (σ_v·(10⁶ +
    δint_w)) DIV σ_w over the shortest-path DAG (succ = neighbor one
    level deeper), level by level from the horizon — every term is one
    exact integer division, so the ranking is bit-stable across
    engines and partitionings (truncation error ≤ succ-count/10⁶,
    bounded by the planted-path test in tests/test_graphdist.py).
    Top 20 interior parts by accumulated dependency."""
    sym, seeds, b = _bfs_sigma(spark, sf_dir)
    return brandes_fixed_point_from(
        sym, b, sym_arrays=_copurchase_sym_arrays(spark, sf_dir)
    ).limit(20)


def _brandes_local(
    sym: DataFrame, b: DataFrame, sym_arrays: tuple | None = None
) -> DataFrame:
    """Driver-side mirror of the distributed backward pass: per seed
    and level, one vectorized exact-int64 ``(σ_v·(10⁶+δint_w)) // σ_w``
    scatter-add over the Arrow-collected edge/level arrays.  Emits
    (node, dint) rows for EXACTLY the (seed, node) groups the
    distributed join emits (v nodes with ≥1 one-level-deeper
    neighbor — membership matters when 0-score rows reach the top-20
    cut), so the downstream aggregate is identical bit for bit."""
    import numpy as np
    import pandas as pd

    spark = sym.sparkSession
    if sym_arrays is not None:
        e_src, e_dst = sym_arrays
    else:
        pdf_e = sym.select("src", "dst").toPandas()
        e_src = pdf_e["src"].to_numpy(dtype=np.int64)
        e_dst = pdf_e["dst"].to_numpy(dtype=np.int64)
    pdf_b = b.select("seed", "node", "dist", "sigma").toPandas()
    schema = "node long, dint long"
    if not len(pdf_b):
        return spark.createDataFrame([], schema)
    nodes = np.unique(
        np.concatenate(
            [e_src, e_dst, pdf_b["node"].to_numpy(dtype=np.int64)]
        )
    )
    s_idx = np.searchsorted(nodes, e_src)
    d_idx = np.searchsorted(nodes, e_dst)
    n = len(nodes)
    out: list[pd.DataFrame] = []
    for sd, sub in pdf_b.groupby("seed"):
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.int64)
        bi = np.searchsorted(nodes, sub["node"].to_numpy(dtype=np.int64))
        dist[bi] = sub["dist"].to_numpy(dtype=np.int64)
        sigma[bi] = sub["sigma"].to_numpy(dtype=np.int64)
        dint = np.zeros(n, dtype=np.int64)
        for r in (2, 1):
            m = (dist[s_idx] == r) & (dist[d_idx] == r + 1)
            sv = sigma[s_idx[m]]
            sw = sigma[d_idx[m]]
            dw = dint[d_idx[m]]
            terms = (sv * (DELTA_SCALE + dw)) // sw
            acc = np.zeros(n, dtype=np.int64)
            cnt = np.zeros(n, dtype=np.int64)
            np.add.at(acc, s_idx[m], terms)
            np.add.at(cnt, s_idx[m], 1)
            emit = cnt > 0
            out.append(
                pd.DataFrame({"node": nodes[emit], "dint": acc[emit]})
            )
            dint = acc  # nonzero only at dist==r nodes; coalesce ≡ 0
    allp = pd.concat(out, ignore_index=True)
    if not len(allp):
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(allp, schema)


def brandes_fixed_point_from(
    sym: DataFrame,
    b: DataFrame,
    local_threshold: int = BFS_LOCAL_EDGE_GATE,
    sym_arrays: tuple | None = None,
) -> DataFrame:
    """Backward dependency accumulation in micro-unit integers over the
    (seed, node, dist, sigma) BFS levels; returns every scored node
    ordered by (bet_int desc, part_id).  Same hybrid gate as
    :func:`bfs_sigma_from`: at or under ``local_threshold`` sym rows
    the two level-joins run as driver-side scatter-adds
    (:func:`_brandes_local`); above it — 100 TB, 10x overflow sweep —
    the distributed join+checkpoint rounds are unchanged."""
    if local_threshold and (
        sym_arrays is not None or sym.count() <= local_threshold
    ):
        allints = _brandes_local(sym, b, sym_arrays)
        return (
            allints.groupBy("node")
            .agg(F.sum("dint").cast("long").alias("bet_int"))
            .select(
                F.col("node").alias("part_id"),
                "bet_int",
                (
                    F.round(
                        F.col("bet_int").cast("double") / DELTA_SCALE
                        - 1e-9,
                        4,
                    )
                    + 0.0
                ).alias("betweenness"),
            )
            .orderBy(F.desc("bet_int"), "part_id")
        )
    lvl = {
        d: b.filter(F.col("dist") == d).select(
            "seed", "node", "sigma"
        )
        for d in (1, 2, 3)
    }
    deltas = []
    prev: DataFrame | None = None  # δint of level r+1
    for r in (2, 1):
        v = lvl[r].select(
            F.col("seed"), F.col("node").alias("_v"), F.col("sigma").alias("_sv")
        )
        w = lvl[r + 1].select(
            F.col("seed").alias("_wseed"),
            F.col("node").alias("_w"),
            F.col("sigma").alias("_sw"),
        )
        j = (
            v.join(sym, v["_v"] == sym["src"])
            .join(
                w,
                (F.col("dst") == F.col("_w"))
                & (F.col("seed") == F.col("_wseed")),
            )
        )
        if prev is not None:
            p = prev.select(
                F.col("seed"), F.col("node").alias("_w"),
                F.col("dint").alias("_pd"),
            )
            j = j.join(p, ["seed", "_w"], "left")
        else:
            j = j.withColumn("_pd", F.lit(None).cast("long"))
        d = (
            j.select(
                "seed",
                F.col("_v").alias("node"),
                F.expr(
                    f"(_sv * ({DELTA_SCALE} + coalesce(_pd, 0))) DIV _sw"
                ).alias("term"),
            )
            .groupBy("seed", "node")
            .agg(F.sum("term").cast("long").alias("dint"))
            .localCheckpoint()  # referenced by the next level AND the sum
        )
        deltas.append(d)
        prev = d
    allints = deltas[0].unionByName(deltas[1])
    return (
        allints.groupBy("node")
        .agg(F.sum("dint").cast("long").alias("bet_int"))
        .select(
            F.col("node").alias("part_id"),
            "bet_int",
            (
                F.round(
                    F.col("bet_int").cast("double") / DELTA_SCALE - 1e-9, 4
                )
                + 0.0
            ).alias("betweenness"),
        )
        .orderBy(F.desc("bet_int"), "part_id")
    )


# --------------------------------------------------------------------------
# Densification power law of the growing co-supplier graph
# --------------------------------------------------------------------------
_DENSE_YEARS = tuple(range(1995, 2002))  # fixed order-date span


def _densification_sql() -> str:
    ys = _DENSE_YEARS
    opiv = ", ".join(
        f"CAST(sum(CASE WHEN fy <= {y} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS o{y}"
        for y in ys
    )
    npiv = ", ".join(
        f"CAST(sum(CASE WHEN fy <= {y} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n{y}"
        for y in ys
    )
    epiv = ", ".join(
        f"CAST(sum(CASE WHEN fy <= {y} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS e{y}"
        for y in ys
    )
    k = len(ys)
    sx = " + ".join(f"ln(CAST(o{y} AS DOUBLE))" for y in ys)
    sy = " + ".join(f"ln(CAST(e{y} AS DOUBLE))" for y in ys)
    sxy = " + ".join(
        f"ln(CAST(o{y} AS DOUBLE)) * ln(CAST(e{y} AS DOUBLE))" for y in ys
    )
    sxx = " + ".join(
        f"ln(CAST(o{y} AS DOUBLE)) * ln(CAST(o{y} AS DOUBLE))" for y in ys
    )
    rows = " UNION ALL ".join(
        f"SELECT CAST({y} AS BIGINT) AS yr, o{y} AS n_orders_cum,"
        f" n{y} AS n_nodes_cum, e{y} AS e_edges_cum, a FROM sl"
        for y in ys
    )
    return f"""
    WITH ok AS (
      SELECT DISTINCT l_orderkey AS okey, l_suppkey AS s FROM {{lineitem}}
      WHERE l_extendedprice >= 50000
    ),
    oy AS {{MAT}}(
      SELECT o_orderkey AS okey, year(o_orderdate) AS yr FROM {{orders}}
    ),
    od AS {{MAT}}(
      SELECT k.okey, CAST(min(o.yr) AS BIGINT) AS fy
      FROM (SELECT DISTINCT okey FROM ok) k JOIN oy o ON o.okey = k.okey
      GROUP BY 1
    ),
    pf AS {{MAT}}(
      SELECT a.s AS src, b.s AS dst, CAST(min(o.yr) AS BIGINT) AS fy
      FROM ok a JOIN ok b ON a.okey = b.okey AND a.s < b.s
      JOIN oy o ON o.okey = a.okey
      GROUP BY 1, 2
    ),
    nf AS {{MAT}}(
      SELECT src AS s, CAST(min(fy) AS BIGINT) AS fy
      FROM (SELECT src, fy FROM pf UNION ALL SELECT dst, fy FROM pf)
      GROUP BY 1
    ),
    op AS {{MAT}}(SELECT {opiv} FROM od),
    np AS {{MAT}}(SELECT {npiv} FROM nf),
    ep AS {{MAT}}(SELECT {epiv} FROM pf),
    sl AS {{MAT}}(
      SELECT op.*, np.*, ep.*,
             ({k} * ({sxy}) - ({sx}) * ({sy}))
               / ({k} * ({sxx}) - ({sx}) * ({sx})) AS a
      FROM op CROSS JOIN np CROSS JOIN ep
    )
    SELECT yr, n_orders_cum, n_nodes_cum, e_edges_cum,
           round(a - 1e-9, 4) + 0.0 AS densification_exp
    FROM ({rows})
    ORDER BY yr
    """


@query(
    "graph_densification_yearly",
    _densification_sql()
    .replace("{lineitem}", "lineitem")
    .replace("{orders}", "orders")
    .replace("{MAT}", "MATERIALIZED "),
)
def graph_densification_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densification power law (Leskovec et al. KDD'05) of the growing
    co-supplier graph: cumulative co-occurrence pair count vs cumulative significant-order
    count per year, with the log-log OLS exponent — e(t) ∝ v(t)^a,
    a > 1 being the superlinear-densification signature growing
    interaction graphs show (the node set saturates in year one on
    this domain, so transaction volume is the growth axis; cumulative
    node counts ride along as context).

    Determinism: first-appearance years are exact integer mins; the 7
    yearly cumulative counts pivot into ONE row so the OLS sums over
    log counts are FIXED 7-term expression trees (no variable-row
    float aggregation); ln over identical exact-int-cast doubles.

    Scale shape: the pair generation is the one-lineitem-pass packed
    pattern cost (shared shape with `_cosupplier_edges`); everything
    after is O(pairs) grouped mins and a 1-row statistic.  The
    year-stamped first-occurrence derivation is the standard
    temporal-graph rollup (one shuffle keyed on the pair)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "dens_l"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("dens_o")
    return _densification_spark(spark)


def _densification_spark(spark: SparkSession) -> DataFrame:
    """Spark execution with the one-row slope frame checkpointed: the
    plain-CTE form inlines the whole pair derivation into every one of
    the 7 output-year selects (77 scans — the duplicate-lineage class
    explain_audit exists to catch)."""
    sql = (
        _densification_sql()
        .replace("{lineitem}", "dens_l")
        .replace("{orders}", "dens_o")
        .replace("{MAT}", "")
    )
    cut = sql.index("    SELECT yr, n_orders_cum")
    head = sql[:cut].rstrip().rstrip(",")  # ends after sl AS (...)
    spark.sql(head + "\nSELECT * FROM sl").localCheckpoint(
    ).createOrReplaceTempView("dens_sl_v")
    return spark.sql(
        "WITH sl AS (SELECT * FROM dens_sl_v)\n" + sql[cut:]
    )


# --------------------------------------------------------------------------
# Graph robustness under targeted hub removal (percolation curve)
# --------------------------------------------------------------------------
_ATTACK_SHARES = (0, 5, 15, 30)  # percent of highest-degree nodes removed


def _robustness_sql() -> str:
    scen = []
    for pct in _ATTACK_SHARES:
        scen.append(f"""
    rm{pct} AS MATERIALIZED (
      SELECT u FROM ranked
      WHERE rk <= (SELECT nn * {pct} // 100 FROM nct)
    ),
    sv{pct} AS MATERIALIZED (
      SELECT d.u FROM deg d LEFT JOIN rm{pct} r ON r.u = d.u
      WHERE r.u IS NULL
    ),
    se{pct} AS MATERIALIZED (
      SELECT p.src, p.dst FROM pairs p
      LEFT JOIN rm{pct} a ON a.u = p.src
      LEFT JOIN rm{pct} b ON b.u = p.dst
      WHERE a.u IS NULL AND b.u IS NULL
    ),
    sy{pct} AS MATERIALIZED (
      SELECT src, dst FROM se{pct}
      UNION ALL SELECT dst, src FROM se{pct}
    ),
    reach{pct} AS (
      SELECT u AS id, u AS r FROM sv{pct}
      UNION
      SELECT re.id, e.dst FROM reach{pct} re JOIN sy{pct} e ON re.r = e.src
    ),
    comp{pct} AS MATERIALIZED (
      SELECT id, min(r) AS comp FROM reach{pct} GROUP BY id
    ),
    out{pct} AS (
      SELECT CAST({pct} AS BIGINT) AS remove_pct,
             (SELECT CAST(count(*) FILTER (u IS NOT NULL) AS BIGINT)
              FROM rm{pct}) AS n_removed,
             (SELECT CAST(count(*) AS BIGINT) FROM sv{pct}) AS n_nodes,
             (SELECT CAST(count(*) AS BIGINT) FROM se{pct}) AS n_edges,
             (SELECT CAST(max(c) AS BIGINT) FROM (
                SELECT count(*) AS c FROM comp{pct} GROUP BY comp))
               AS lcc_size,
             round((SELECT CAST(max(c) AS BIGINT) FROM (
                      SELECT count(*) AS c FROM comp{pct} GROUP BY comp))
                   * 1.0
                   / (SELECT count(*) FROM sv{pct}) - 1e-9, 4) + 0.0
               AS lcc_share
    )""")
    unions = " UNION ALL ".join(
        f"SELECT * FROM out{p}" for p in _ATTACK_SHARES
    )
    return f"""
    WITH RECURSIVE ok AS (
      SELECT DISTINCT l_orderkey AS okey, l_suppkey AS s FROM lineitem
      WHERE l_extendedprice >= 50000
    ),
    pairs AS MATERIALIZED (
      SELECT a.s AS src, b.s AS dst
      FROM ok a JOIN ok b ON a.okey = b.okey AND a.s < b.s
      GROUP BY 1, 2
    ),
    deg AS MATERIALIZED (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT src AS u FROM pairs UNION ALL SELECT dst FROM pairs
      ) GROUP BY u
    ),
    nct AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM deg),
    ranked AS MATERIALIZED (
      SELECT u, row_number() OVER (ORDER BY d DESC, u) AS rk FROM deg
    ),
    {",".join(scen)}
    SELECT * FROM ({unions}) ORDER BY remove_pct
    """


@query("graph_robustness_attack", _robustness_sql())
def graph_robustness_attack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted-attack percolation curve of the co-supplier graph:
    remove the top 0/5/15/30% highest-degree hubs and measure the
    surviving largest connected component — the classic scale-free
    fragility experiment (Albert-Jeong-Barabási): interaction graphs
    shrug off random failures but shatter under hub removal.  The
    supply-chain readout: how concentrated is connectivity risk.

    Determinism: hub ranking breaks degree ties on node id; removal
    counts are exact integer shares; LCC sizes are label-free counts
    (min-label component ids cancel out).  The oracle replays each
    scenario's component structure with a recursive min-label closure;
    Spark runs the iterative min-propagation operator
    (operators/graph.py) per scenario on the SHARED materialized edge
    snapshot — the only fact-table pass is the one edge derivation.

    Scale shape: per scenario one anti-join (hub set is tiny and
    broadcast) + the CC rounds (|E| label messages each)."""
    from ..operators.graph import connected_components

    pairs = (
        _cosupplier_edges(spark, sf_dir)
        .select("src", "dst")
        .localCheckpoint()
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    n = deg.count()
    from pyspark.sql.window import Window as W

    ranked = deg.select(
        F.col("src").alias("u"),
        F.row_number()
        .over(W.orderBy(F.desc("d"), F.col("src")))
        .alias("rk"),
    ).localCheckpoint()
    def scenario(pct: int):
        """One percolation scenario — independent of the others, so the
        four run as OVERLAPPED driver-thread jobs (guide §2.6): each
        scenario's iterative-CC tail leaves most executors idle, and
        the next scenario's rounds back-fill them.  Wall drops from the
        sum of the four CC walls to roughly the slowest one; per-job
        shuffle volume is unchanged at any scale."""
        n_rm = n * pct // 100
        removed = ranked.filter(F.col("rk") <= n_rm).select("u")
        survivors = ranked.filter(F.col("rk") > n_rm).select("u")
        se = pairs.join(
            removed.withColumnRenamed("u", "src"), "src", "left_anti"
        ).join(removed.withColumnRenamed("u", "dst"), "dst", "left_anti")
        comps = connected_components(
            se, "src", "dst", vertices=survivors, vertex_col="u"
        )
        sizes = comps.groupBy("comp").count()
        lcc = sizes.agg(F.max("count")).first()[0] or 0
        n_left = n - n_rm
        if n_left == 0:
            # empty scenario: the oracle's max-over-nothing and x/0
            # both yield NULL — mirror, never divide (round-12 sweep)
            return (pct, n_rm, n_left, se.count(), None, None)
        return (
            pct,
            n_rm,
            n_left,
            se.count(),
            int(lcc),
            round(lcc * 1.0 / n_left - 1e-9, 4) + 0.0,
        )

    from concurrent.futures import ThreadPoolExecutor

    # INVARIANT (round-12 advice): every operator `scenario` routes
    # through must not mutate session conf — the threads share one
    # SparkSession, so a try/finally conf toggle (pagerank, sssp, katz,
    # boruvka all do this) would race across scenarios.  Today only
    # connected_components runs here, and it toggles nothing; route any
    # conf-toggling operator through per-thread spark.newSession()
    # clones instead.
    with ThreadPoolExecutor(max_workers=len(_ATTACK_SHARES)) as pool:
        rows = list(pool.map(scenario, _ATTACK_SHARES))
    return spark.createDataFrame(
        rows,
        "remove_pct long, n_removed long, n_nodes long, n_edges long, "
        "lcc_size long, lcc_share double",
    ).orderBy("remove_pct")
