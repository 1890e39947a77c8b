"""Scale smoke for the round-8 graph-distance family (round-8 verdict
item 3): BFS σ / Brandes betweenness / eccentricity / targeted-attack
percolation — 3 of the top-7 bench entries had no 1×/4×/16× smoke.

Replicates the co-purchase edge list into N disjoint universes (node
ids offset by copy·1e6) and asserts the invariants that distinguish
linear-by-design iteration from accidental cross-universe leaks:

- symmetric edge count scales EXACTLY N×;
- BFS σ LINEARITY: seeding every universe's copy of the base seeds,
  the (seed-residue, node-residue, dist, σ) level sets are IDENTICAL
  across mults and total level rows scale exactly N× — any
  cross-universe frontier leak inflates σ or adds phantom nodes;
- Brandes betweenness: per-node bet_int for each copy equals the 1×
  value of its residue node exactly (integer fixed point), row count
  scales N×;
- eccentricity per seed residue is invariant across mults;
- percolation scenarios (per-universe hub removal at 5/15/30%):
  LCC SIZE is invariant (disjoint copies cannot merge components),
  survivor counts and edge counts scale exactly N× — so the
  within-universe LCC share is invariant per scenario;
- wall clock grows sublinearly vs the copy count.

    python tools/wave_r8_scale_smoke.py [--sf /root/testdata/sf0.01]

Exit status non-zero on any violated invariant (CI-shaped, like
wave_r7_scale_smoke / graph_scale_smoke).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from stream_processing_with_flink_study_spark.operators.graph import (  # noqa: E402
    connected_components,
)
from stream_processing_with_flink_study_spark.plans.queries_graph import (  # noqa: E402
    _copurchase_edges,
)
from stream_processing_with_flink_study_spark.plans.queries_graphdist import (  # noqa: E402
    BFS_SEEDS,
    bfs_sigma_from,
    brandes_fixed_point_from,
)
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402

OFF = 1_000_000
SHARES = (5, 15, 30)


def replicate(spark, sym, mult: int):
    if mult == 1:
        return sym
    return (
        sym.crossJoin(spark.range(mult).select(F.col("id").alias("_c")))
        .select(
            (F.col("src") + F.col("_c") * OFF).alias("src"),
            (F.col("dst") + F.col("_c") * OFF).alias("dst"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_spark("wave_r8_scale_smoke")
    base = _copurchase_edges(spark, args.sf).localCheckpoint()
    e1 = base.count()
    base_seeds = [
        r["seed"]
        for r in base.select(F.col("src").alias("seed"))
        .distinct()
        .orderBy("seed")
        .limit(BFS_SEEDS)
        .collect()
    ]

    ref: dict = {}
    walls: dict[int, float] = {}
    failures: list[str] = []

    for mult in (1, 4, 16):
        t0 = time.time()
        sym = replicate(spark, base, mult).localCheckpoint()

        # --- edge linearity
        ec = sym.count()
        if ec != e1 * mult:
            failures.append(f"mult={mult}: edges {ec} != {e1}*{mult}")

        # --- BFS sigma with per-universe seeds
        seeds = spark.createDataFrame(
            [(s + c * OFF,) for c in range(mult) for s in base_seeds],
            "seed long",
        )
        sym, seeds, levels = bfs_sigma_from(sym, seeds=seeds)
        lv = levels.select(
            (F.col("seed") % OFF).alias("sr"),
            (F.col("node") % OFF).alias("nr"),
            "dist",
            "sigma",
        )
        n_levels = levels.count()
        residue_set = {
            (r["sr"], r["nr"], r["dist"], r["sigma"])
            for r in lv.distinct().collect()
        }
        ecc = {
            r["sr"]: r["ecc"]
            for r in lv.groupBy("sr").agg(F.max("dist").alias("ecc")).collect()
        }

        # --- Brandes fixed point
        bet = brandes_fixed_point_from(sym, levels)
        bet_rows = bet.collect()
        bet_res = {(r["part_id"] % OFF, r["bet_int"]) for r in bet_rows}
        n_bet_rows = len(bet_rows)

        # --- percolation: per-universe hub removal
        perc = {}
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        ranked = deg.select(
            F.col("src").alias("u"),
            F.row_number()
            .over(
                Window.partitionBy((F.col("src") / OFF).cast("long")).orderBy(
                    F.desc("d"), F.col("src")
                )
            )
            .alias("rk"),
        ).localCheckpoint()
        n_nodes = deg.count()
        per_uni = n_nodes // mult
        for pct in SHARES:
            n_rm = per_uni * pct // 100  # per universe, exact
            removed = ranked.filter(F.col("rk") <= n_rm).select("u")
            survivors = ranked.filter(F.col("rk") > n_rm).select("u")
            se = (
                base_pairs(sym)
                .join(removed.withColumnRenamed("u", "src"), "src", "left_anti")
                .join(removed.withColumnRenamed("u", "dst"), "dst", "left_anti")
            )
            comps = connected_components(
                se, "src", "dst", vertices=survivors, vertex_col="u"
            )
            sizes = comps.groupBy("comp").count()
            lcc = sizes.agg(F.max("count")).first()[0] or 0
            n_left = n_nodes - n_rm * mult
            perc[pct] = (int(lcc), n_left, se.count())
        walls[mult] = time.time() - t0

        if mult == 1:
            ref = {
                "n_levels": n_levels,
                "residues": residue_set,
                "ecc": ecc,
                "bet": bet_res,
                "n_bet_rows": n_bet_rows,
                "perc": perc,
                "n_nodes": n_nodes,
            }
            continue

        if n_levels != ref["n_levels"] * mult:
            failures.append(
                f"mult={mult}: BFS level rows {n_levels} != "
                f"{ref['n_levels']}*{mult} (sigma linearity broken)"
            )
        if residue_set != ref["residues"]:
            failures.append(
                f"mult={mult}: per-residue (dist, sigma) sets differ — "
                "cross-universe frontier leak"
            )
        if ecc != ref["ecc"]:
            failures.append(f"mult={mult}: eccentricity drifted {ecc}")
        if bet_res != ref["bet"]:
            failures.append(
                f"mult={mult}: Brandes bet_int residues differ from 1x"
            )
        if n_bet_rows != ref["n_bet_rows"] * mult:
            failures.append(
                f"mult={mult}: betweenness rows {n_bet_rows} != "
                f"{ref['n_bet_rows']}*{mult}"
            )
        for pct in SHARES:
            lcc, n_left, n_se = perc[pct]
            lcc1, n_left1, n_se1 = ref["perc"][pct]
            if lcc != lcc1:
                failures.append(
                    f"mult={mult} pct={pct}: LCC {lcc} != 1x {lcc1} "
                    "(disjoint universes must not merge)"
                )
            if n_left != n_left1 * mult or n_se != n_se1 * mult:
                failures.append(
                    f"mult={mult} pct={pct}: survivor/edge counts not N-linear"
                )

    if walls[16] >= walls[1] * 16:
        failures.append(
            f"wall clock superlinear: 16x={walls[16]:.1f}s vs "
            f"1x={walls[1]:.1f}s"
        )

    print(
        json.dumps(
            {
                "edges_1x": e1,
                "levels_1x": ref.get("n_levels"),
                "walls_s": {str(k): round(v, 2) for k, v in walls.items()},
                "failures": failures,
            }
        )
    )
    return 1 if failures else 0


def base_pairs(sym):
    """Canonical (src < dst) pairs from a symmetric edge frame — the
    percolation anti-joins run on the half-sized pair list like the
    production query does."""
    return sym.filter(F.col("src") < F.col("dst"))


if __name__ == "__main__":
    raise SystemExit(main())
