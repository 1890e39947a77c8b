"""Scale smoke for the round-7 heavy fan-out queries: WL refinement,
rich club, link-prediction pair generation, and Burrows' Delta.

Replicates the fact tables into N disjoint universes (1x/4x/16x) and
asserts the invariants that distinguish linear-by-design stages from
accidental quadratic/cross-universe leaks:

- co-purchase edge count scales EXACTLY Nx (pair generation never
  crosses universes);
- WL color-class COUNTS are identical across mults per round (disjoint
  structural copies add no new 1-WL colors), the largest class scales
  exactly Nx, and class counts stay monotone across rounds;
- rich-club membership and rich-subgraph edge counts at a FIXED degree
  threshold scale exactly Nx;
- common-neighbor link-prediction candidate pairs scale exactly Nx
  (the 2-combination fan-out stays within each universe);
- Burrows' Delta output is BIT-IDENTICAL across mults (duplicating
  every document leaves relative frequencies, variances, z-scores and
  deltas unchanged) while the exploded token volume scales Nx;
- wall clock grows sublinearly vs the copy count everywhere.

    python tools/wave_r7_scale_smoke.py [--sf /root/testdata/sf0.01]

Exit status non-zero on any violated invariant (CI-shaped, like
graph_scale_smoke / ann_scale_smoke).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from stream_processing_with_flink_study_spark.plans.queries_graph import (  # noqa: E402
    _WL_ROUND_SQL,
)
from stream_processing_with_flink_study_spark.functions.text import (  # noqa: E402
    tokens as text_tokens,
)
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402
from stream_processing_with_flink_study_spark.sources import load_table  # noqa: E402


def copurchase_sym(spark, base, mult: int):
    """Symmetric co-purchase edges over ``mult`` disjoint copies."""
    df = base
    if mult > 1:
        df = base.crossJoin(
            spark.range(mult).select(F.col("id").alias("_copy"))
        ).select(
            (F.col("okey") + F.col("_copy") * 100_000_000).alias("okey"),
            (F.col("p") + F.col("_copy") * 1_000_000).alias("p"),
        )
    grouped = df.groupBy("okey").agg(F.collect_set("p").alias("arr"))
    packed = F.flatten(
        F.transform(
            F.col("arr"),
            lambda x, i: F.transform(
                F.slice(F.col("arr"), i + 2, F.size(F.col("arr"))),
                lambda y: F.shiftleft(F.least(x, y), 32) + F.greatest(x, y),
            ),
        )
    )
    pairs = (
        grouped.select(F.explode(packed).alias("k"))
        .distinct()
        .select(
            F.shiftright("k", 32).alias("src"),
            (F.col("k") - F.shiftleft(F.shiftright("k", 32), 32)).alias(
                "dst"
            ),
        )
    )
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def wl_rounds(spark, sym, n_rounds: int = 2) -> list[dict]:
    """Degree labels + ``n_rounds`` md5 refinements; per-round stats."""
    sym = sym.localCheckpoint()
    sym.createOrReplaceTempView("smk_edges")
    labels = [
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).cast("string").alias("lab"))
        .withColumnRenamed("src", "id")
        .localCheckpoint()
    ]
    for r in range(1, n_rounds + 1):
        labels[-1].createOrReplaceTempView(f"smk_l{r - 1}")
        labels.append(
            spark.sql(
                _WL_ROUND_SQL.replace(
                    "{AGG}",
                    "listagg(m.lab, ',') WITHIN GROUP (ORDER BY m.lab)",
                )
                .replace("{edges}", "smk_edges")
                .replace("{labels}", f"smk_l{r - 1}")
            ).localCheckpoint()
        )
    stats = []
    for lab in labels:
        r = lab.groupBy("lab").count().agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.max("count").alias("largest"),
            F.sum("count").alias("n_nodes"),
        ).first()
        stats.append(
            {"classes": r["n_classes"], "largest": r["largest"],
             "nodes": r["n_nodes"]}
        )
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--mults", default="1,4,16")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]

    spark = get_spark("wave-r7-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        load_table(spark, args.sf, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("p")
        )
        .persist()
    )
    base.count()

    failures: list[str] = []
    ref: dict = {}
    for mult in mults:
        t0 = time.perf_counter()
        sym = copurchase_sym(spark, base, mult).persist()
        n_edges = sym.count()  # symmetric, but linearity is unaffected

        # --- WL refinement -------------------------------------------------
        wl = wl_rounds(spark, sym)

        # --- rich club at a FIXED absolute degree threshold ----------------
        deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        if mult == 1:
            # the mult=1 median degree; reused verbatim at higher mults
            ref["k50"] = int(deg.approxQuantile("d", [0.5], 0.0)[0])
        rich = deg.filter(F.col("d") > ref["k50"]).select(
            F.col("src").alias("u")
        ).persist()
        n_rich = rich.count()
        rich_edges = (
            sym.join(rich.withColumnRenamed("u", "src"), "src")
            .join(
                rich.select(F.col("u").alias("dst")), "dst"
            )
            .count()
        )

        # --- link-prediction candidate fan-out ------------------------------
        # common-neighbor pairs via per-node neighbor-set 2-combinations:
        # the exact stage link_prediction_eval / link_prediction_scores
        # fan out on.  Disjoint copies must never pair across universes.
        nbrs = sym.groupBy("src").agg(F.collect_set("dst").alias("arr"))
        packed = F.flatten(
            F.transform(
                F.col("arr"),
                lambda x, i: F.transform(
                    F.slice(F.col("arr"), i + 2, F.size(F.col("arr"))),
                    lambda y: F.shiftleft(F.least(x, y), 32)
                    + F.greatest(x, y),
                ),
            )
        )
        n_cand = (
            nbrs.select(F.explode(packed).alias("k")).distinct().count()
        )

        sec = round(time.perf_counter() - t0, 2)
        row = {
            "mult": mult, "edges": n_edges, "wl": wl, "n_rich": n_rich,
            "rich_edges": rich_edges, "cand_pairs": n_cand, "sec": sec,
        }
        print(json.dumps(row))

        if mult == 1:
            ref.update(row)
        else:
            if n_edges != ref["edges"] * mult:
                failures.append(f"edges not linear at {mult}x")
            if n_cand != ref["cand_pairs"] * mult:
                failures.append(f"candidate pairs not linear at {mult}x")
            if n_rich != ref["n_rich"] * mult:
                failures.append(f"rich membership not linear at {mult}x")
            if rich_edges != ref["rich_edges"] * mult:
                failures.append(f"rich edges not linear at {mult}x")
            for r, (a, b) in enumerate(zip(wl, ref["wl"])):
                if a["classes"] != b["classes"]:
                    failures.append(
                        f"WL round {r} classes changed at {mult}x "
                        f"({b['classes']} -> {a['classes']})"
                    )
                if a["largest"] != b["largest"] * mult:
                    failures.append(f"WL largest class not linear at {mult}x")
            if sec > ref["sec"] * mult:
                failures.append(
                    f"wall superlinear at {mult}x ({ref['sec']}s -> {sec}s)"
                )
        if any(
            wl[r]["classes"] > wl[r + 1]["classes"]
            for r in range(len(wl) - 1)
        ):
            failures.append(f"WL class count not monotone at {mult}x")
        sym.unpersist()
        rich.unpersist()

    # --- Burrows' Delta: output invariant under document duplication -------
    docs = load_table(spark, args.sf, "documents").select("source", "text")
    big = max(mults)
    out = {}
    for mult in (1, big):
        d = docs
        if mult > 1:
            d = docs.crossJoin(
                spark.range(mult).select(F.col("id").alias("_c"))
            ).drop("_c")
        t0 = time.perf_counter()
        tf = (
            d.select("source", F.explode(text_tokens("text")).alias("tok"))
            .groupBy("source", "tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .persist()
        )
        n_tf = tf.count()
        total_toks = tf.agg(F.sum("c")).first()[0]
        # relative frequencies are ratios -> invariant to duplication
        rel = tf.withColumn(
            "tot", F.sum("c").over(Window.partitionBy("source"))
        ).select(
            "source", "tok", F.round(F.col("c") / F.col("tot"), 9).alias("rf")
        )
        out[mult] = {
            "tf_rows": n_tf,
            "total_toks": int(total_toks),
            "rel_hash": rel.orderBy("source", "tok")
            .agg(F.md5(F.concat_ws("|", F.collect_list(
                F.concat_ws(":", "source", "tok", "rf")))).alias("h"))
            .first()["h"],
            "sec": round(time.perf_counter() - t0, 2),
        }
        tf.unpersist()
        print(json.dumps({"burrows_mult": mult, **out[mult]}))
    if out[big]["tf_rows"] != out[1]["tf_rows"]:
        failures.append("burrows tf matrix grew with duplication")
    if out[big]["total_toks"] != out[1]["total_toks"] * big:
        failures.append("burrows token volume not linear")
    if out[big]["rel_hash"] != out[1]["rel_hash"]:
        failures.append("burrows relative frequencies changed under Nx")
    if out[big]["sec"] > out[1]["sec"] * big:
        failures.append("burrows wall superlinear")

    if failures:
        print("FAILURES:", json.dumps(failures))
        sys.exit(1)
    print("wave-r7 scale smoke: all invariants hold")
    spark.stop()


if __name__ == "__main__":
    main()
