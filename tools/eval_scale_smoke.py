"""Scale smoke for the eval/clustering wave: verify the claims the
module docstrings make about what grows with the corpus and what is
bounded by a domain.

    python tools/eval_scale_smoke.py [--mult 8] [--sf /root/testdata/sf0.1]

Checks (exit nonzero on violation):

- grid-DBSCAN: the OCCUPIED-CELL count is bounded by the eps-grid, not
  by N — at mult× the points (re-jittered inside their cells so ids
  differ), occupied cells may grow toward the grid bound but the
  cells-per-point ratio must COLLAPSE (that is the whole scale story);
- Markov attribution: the transition-matrix row count depends on the
  event-type ALPHABET, not the event count — mult× the events must
  yield an identically-sized matrix (and identical state list);
- k-means: per-iteration state is k centroids regardless of N — the
  assignment frame grows linearly (k·N), never quadratically.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from stream_processing_with_flink_study_spark.plans.queries_eval import (  # noqa: E402
    DBSCAN_EPS,
    KMEANS_K,
)
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402
from stream_processing_with_flink_study_spark.sources import load_table  # noqa: E402


def multiplied_points(spark, sf_dir: str, mult: int):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    copies = spark.range(mult).withColumnRenamed("id", "copy")
    # deterministic sub-cell jitter: stays inside the copy's own cell
    jit = (F.xxhash64("vec_id", "copy") % 1000) / 1000.0 * DBSCAN_EPS * 0.01
    return emb.crossJoin(copies).select(
        (F.col("vec_id") * mult + F.col("copy")).alias("vec_id"),
        (F.col("x") + jit).alias("x"),
        (F.col("y") + jit).alias("y"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = get_spark()
    failures: list[str] = []

    # --- grid-DBSCAN cell boundedness -------------------------------
    def occupied_cells(pts) -> tuple[int, int]:
        cells = (
            pts.select(
                F.floor(F.col("x") / DBSCAN_EPS).alias("ix"),
                F.floor(F.col("y") / DBSCAN_EPS).alias("iy"),
            )
            .groupBy("ix", "iy")
            .count()
        )
        return cells.count(), pts.count()

    t0 = time.time()
    base = multiplied_points(spark, args.sf, 1)
    big = multiplied_points(spark, args.sf, args.mult)
    c1, n1 = occupied_cells(base)
    c2, n2 = occupied_cells(big)
    ratio1, ratio2 = c1 / n1, c2 / n2
    print(
        f"dbscan-grid: {n1} pts -> {c1} cells ({ratio1:.4f}/pt); "
        f"{n2} pts -> {c2} cells ({ratio2:.4f}/pt)  [{time.time()-t0:.1f}s]"
    )
    if not (ratio2 < ratio1 / 2):
        failures.append(
            "occupied-cells per point did not collapse at scale "
            f"({ratio1:.4f} -> {ratio2:.4f})"
        )

    # --- Markov attribution: alphabet-bounded matrix ----------------
    t0 = time.time()
    ev = load_table(spark, args.sf, "events")
    copies = spark.range(args.mult).withColumnRenamed("id", "copy")
    ev_big = ev.crossJoin(copies).select(
        (F.col("user_id") * args.mult + F.col("copy")).alias("user_id"),
        "event_type",
        "ts",
        (F.col("event_id") * args.mult + F.col("copy")).alias("event_id"),
    )

    def matrix_states(events) -> set[tuple[str, str]]:
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        tr = events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        ).filter(F.col("dst").isNotNull())
        return {
            (r["src"], r["dst"])
            for r in tr.select("src", "dst").distinct().collect()
        }

    m1 = matrix_states(ev)
    m2 = matrix_states(ev_big)
    print(
        f"markov: matrix {len(m1)} cells at 1x, {len(m2)} at "
        f"{args.mult}x  [{time.time()-t0:.1f}s]"
    )
    if m2 != m1:
        failures.append(
            f"transition matrix changed with corpus size ({len(m1)} -> {len(m2)})"
        )

    # --- k-means: state is k centroids, assignment linear -----------
    t0 = time.time()
    c = base.orderBy("vec_id").limit(KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("x").alias("cx"), F.col("y").alias("cy")
    )
    a1 = base.crossJoin(F.broadcast(c)).count()
    a2 = big.crossJoin(F.broadcast(c)).count()
    print(
        f"kmeans: assignment frame {a1} at 1x, {a2} at {args.mult}x "
        f"(linear bound {n2 * KMEANS_K})  [{time.time()-t0:.1f}s]"
    )
    if a2 != n2 * KMEANS_K:
        failures.append("assignment frame is not exactly k*N")

    if failures:
        print("FAIL:", "; ".join(failures))
        return 1
    print("eval scale smoke OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
