"""Scale smoke for the seventh wave (recsys / robust / text-mining):
verify the boundedness claims those module docstrings make.

    python tools/wave7_scale_smoke.py [--mult 8] [--sf /root/testdata/sf0.1]

Checks (exit nonzero on violation):

- item-item similarity: the per-basket 2-combination explode is LINEAR
  in orders — mult× the orders (distinct keys, identical baskets) must
  produce exactly mult× the pair rows, never a quadratic blowup;
- geo grid join: the 3×3-cell candidate set admits a VANISHING fraction
  of the cross product (the prune is the whole point) while returning
  the identical within-radius pair set;
- gapped sequential patterns: the successor-window explode is bounded
  by GAP·|events| exactly, and grows linearly with users;
- Bradley-Terry: the fitted-state frame is bounded by the brand
  ALPHABET (25), regardless of fact-table size.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from stream_processing_with_flink_study_spark.plans.queries_recsys import (  # noqa: E402
    SEQ_GAP,
)
from stream_processing_with_flink_study_spark.plans.queries_robust import (  # noqa: E402
    GEO_LAT_CELL,
    GEO_LON_CELL,
    GEO_RADIUS_KM,
    _GEO_C_LAT,
    _GEO_C_LON,
    _GEO_S_LAT,
    _GEO_S_LON,
)
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402
from stream_processing_with_flink_study_spark.sources import load_table  # noqa: E402


def pair_explode_count(li) -> int:
    baskets = li.groupBy("okey").agg(F.collect_set("p").alias("arr"))
    return (
        baskets.select(
            (F.size("arr") * (F.size("arr") - 1) / 2).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
        or 0
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark()
    failures: list[str] = []

    # --- item-item: linear pair explode -----------------------------
    t0 = time.time()
    li = load_table(spark, args.sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("p")
    )
    copies = spark.range(args.mult).withColumnRenamed("id", "copy")
    li_big = li.crossJoin(copies).select(
        (F.col("okey") * args.mult + F.col("copy")).alias("okey"), "p"
    )
    p1 = int(pair_explode_count(li))
    p2 = int(pair_explode_count(li_big))
    print(
        f"item-item: {p1} pair rows at 1x, {p2} at {args.mult}x "
        f"(linear bound {p1 * args.mult})  [{time.time()-t0:.1f}s]"
    )
    if p2 != p1 * args.mult:
        failures.append(f"pair explode not linear ({p1} -> {p2})")

    # --- geo grid: candidate fraction + losslessness ----------------
    t0 = time.time()
    c = load_table(spark, args.sf, "customer").selectExpr(
        "c_custkey", f"{_GEO_C_LAT} AS lat", f"{_GEO_C_LON} AS lon"
    )
    s = load_table(spark, args.sf, "supplier").selectExpr(
        "s_suppkey", f"{_GEO_S_LAT} AS lat", f"{_GEO_S_LON} AS lon"
    )
    n_lon = 360 // GEO_LON_CELL
    cc = c.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor((F.col("lat") + 90) / GEO_LAT_CELL).alias("la"),
        F.floor((F.col("lon") + 180) / GEO_LON_CELL).alias("lo"),
    )
    off = F.expr(
        "explode(transform(sequence(0, 8), i -> "
        "struct(i div 3 - 1 AS dla, i % 3 - 1 AS dlo)))"
    )
    sc = (
        s.select(
            "s_suppkey",
            F.col("lat").alias("s_lat"),
            F.col("lon").alias("s_lon"),
            F.floor((F.col("lat") + 90) / GEO_LAT_CELL).alias("sla"),
            F.floor((F.col("lon") + 180) / GEO_LON_CELL).alias("slo"),
        )
        .select("*", off.alias("o"))
        .select(
            "s_suppkey",
            "s_lat",
            "s_lon",
            (F.col("sla") + F.col("o.dla")).alias("la"),
            F.pmod(F.col("slo") + F.col("o.dlo"), F.lit(n_lon)).alias("lo"),
        )
    )
    n_cand = cc.join(sc, ["la", "lo"]).count()
    n_cross = c.count() * s.count()
    frac = n_cand / n_cross

    def havers(lat1, lon1, lat2, lon2):
        return F.round(
            2
            * 6371.0
            * F.asin(
                F.sqrt(
                    F.pow(F.sin(F.radians(lat2 - lat1) / 2), 2)
                    + F.cos(F.radians(lat1))
                    * F.cos(F.radians(lat2))
                    * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
                )
            )
            - 1e-9,
            3,
        )

    d = havers(F.col("lat"), F.col("lon"), F.col("s_lat"), F.col("s_lon"))
    got = (
        cc.join(sc, ["la", "lo"])
        .select("c_custkey", "s_suppkey", d.alias("d"))
        .filter(F.col("d") <= GEO_RADIUS_KM)
        .count()
    )
    d2 = havers(
        F.col("clat"), F.col("clon"), F.col("slat"), F.col("slon")
    )
    want = (
        c.selectExpr("c_custkey", "lat AS clat", "lon AS clon")
        .crossJoin(s.selectExpr("s_suppkey", "lat AS slat", "lon AS slon"))
        .select(d2.alias("d"))
        .filter(F.col("d") <= GEO_RADIUS_KM)
        .count()
    )
    print(
        f"geo-grid: {n_cand}/{n_cross} candidates ({frac:.4f} of cross), "
        f"{got} within-radius (cross join finds {want})  "
        f"[{time.time()-t0:.1f}s]"
    )
    if frac > 0.05:
        failures.append(f"grid admitted {frac:.3f} of the cross product")
    if got != want:
        failures.append(f"grid prune lost pairs ({got} != {want})")

    # --- sequential patterns: exact GAP-bounded fan-out -------------
    t0 = time.time()
    ev = load_table(spark, args.sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, SEQ_GAP)
    )
    fan = (
        ev.select(F.size(F.collect_list("event_type").over(w)).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    n_ev = ev.count()
    ev_big = ev.crossJoin(copies).select(
        (F.col("user_id") * args.mult + F.col("copy")).alias("user_id"),
        "ts",
        "event_id",
        "event_type",
    )
    fan_big = (
        ev_big.select(
            F.size(F.collect_list("event_type").over(w)).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
    )
    print(
        f"seq-patterns: fanout {fan} <= {SEQ_GAP}*{n_ev}; "
        f"{args.mult}x users -> {fan_big} (= {args.mult}x)  "
        f"[{time.time()-t0:.1f}s]"
    )
    if fan > SEQ_GAP * n_ev:
        failures.append("successor fan-out exceeded GAP*N")
    if fan_big != fan * args.mult:
        failures.append(f"fan-out not linear in users ({fan} -> {fan_big})")

    # --- Bradley-Terry: alphabet-bounded state ----------------------
    t0 = time.time()
    part = load_table(spark, args.sf, "part").select(
        "p_partkey",
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit(""))
        .cast("int")
        .alias("bk"),
    )
    li_full = load_table(spark, args.sf, "lineitem")
    n_brands = (
        li_full.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("bk")
        .distinct()
        .count()
    )
    li_rep = li_full.crossJoin(copies).select(
        (F.col("l_orderkey") * args.mult + F.col("copy")).alias("l_orderkey"),
        "l_partkey",
    )
    n_brands_big = (
        li_rep.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("bk")
        .distinct()
        .count()
    )
    print(
        f"bradley-terry: strength frame {n_brands} brands at 1x, "
        f"{n_brands_big} at {args.mult}x fact rows  [{time.time()-t0:.1f}s]"
    )
    if n_brands_big != n_brands:
        failures.append("BT state grew with fact size")

    if failures:
        print("FAIL:", "; ".join(failures))
        return 1
    print("wave7 scale smoke OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
