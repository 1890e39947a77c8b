"""Scale smoke for the round-9 waves (kNN label-noise / hubness,
k-center coreset, Bloom filter, quantile-regression grid, PSM matching,
random walks): 1×/4×/16× disjoint universes with EXACT invariance laws
wherever the algebra provides one.

Universe construction (written as real parquet dirs shaped like
sf_dir, so the REGISTERED query callables run unmodified):

- ``embeddings``: copy u offsets vec_id by u·1e6 (divisible by every
  sampling stride, so membership is preserved) and keeps vectors +
  labels IDENTICAL.  Consequences the smoke asserts exactly:
  * ``knn_label_noise``: duplication legitimately CHANGES the votes
    — self-exclusion is by id, not by vector, so a query's strongest
    neighbors become ITS OWN COPIES at cosine 1.0 (two drafts of this
    smoke asserted per-residue invariance, then 1×-top-1 prediction;
    the engine refuted both — the copies win).  At mult ≥ k+1 the
    whole k-list is self-copies, so EVERY query must report
    majority == own label, n_agree == k, flag == 0; row count scales
    N×.  (Real dedup runs BEFORE kNN labels for exactly this reason.)
  * ``knn_hubness_stats``: occurrence mass conservation
    Σ total_occ = k · |queries| holds at every mult (neighbor
    structure may shift to low ids; the handed-out mass cannot).
  * ``kcenter_coreset_select``: distances to identical copies tie and
    the (dmin DESC, vec_id) argmax resolves to universe 0 — the
    selected residues AND every covering radius equal the 1× run
    exactly.
- ``customer`` + ``orders``: copy u offsets custkey by u·1e7 and
  shifts balances by u·$1e6 (disjoint covariate ranges → matches stay
  in-universe) while keeping spend identical → ``propensity_match_att``
  n_treated scales exactly N× and ATT / means are bit-invariant.
  ``quantile_regression_grid`` sees N identical (x, y) multisets →
  same argmin line, loss10 EXACTLY N× the 1× loss.
- ``lineitem``: copy u offsets orderkey/suppkey by u·1e7 → disjoint
  co-supplier graphs; ``graph_random_walks`` rows scale exactly N×
  (md5 picks differ per universe — structural laws are pinned by the
  hashlib replay test at 1×).
- ``bloom_filter_probe``: keys/probes scale exactly N×.

Brute-force kNN cost is quadratic BY DESIGN at this tier — the scale
path is the IVF/LSH ladder whose flat candidate rates
``tools/ann_scale_smoke.py`` already pins; this smoke asserts the
SEMANTIC laws above plus completion, not subquadratic wall for knn.

    python tools/wave_r9_scale_smoke.py [--sf /root/testdata/sf0.01]

Exit status non-zero on any violated invariant (CI-shaped).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from stream_processing_with_flink_study_spark import plans  # noqa: E402
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402
from stream_processing_with_flink_study_spark.sources import load_table  # noqa: E402

EMB_OFF = 1_000_000  # divisible by strides 2, 5, 25
KEY_OFF = 10_000_000
BAL_OFF_CENTS = 100_000_000  # $1e6 per universe


def build_universe(spark, sf_dir: str, out_dir: str, mult: int) -> None:
    emb = load_table(spark, sf_dir, "embeddings")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    emb_u, cust_u, ord_u, li_u = [], [], [], []
    for u in range(mult):
        emb_u.append(
            emb.select(
                (F.col("vec_id") + u * EMB_OFF).alias("vec_id"),
                "embedding",
                "label",
            )
        )
        cust_u.append(
            cust.select(
                (F.col("c_custkey") + u * KEY_OFF).alias("c_custkey"),
                "c_name",
                "c_nationkey",
                (
                    F.col("c_acctbal") + F.lit(u * BAL_OFF_CENTS / 100.0)
                ).alias("c_acctbal"),
                "c_mktsegment",
            )
        )
        ord_u.append(
            orders.select(
                (F.col("o_custkey") + u * KEY_OFF).alias("o_custkey"),
                "o_totalprice",
                "o_orderdate",
                (F.col("o_orderkey") + u * KEY_OFF).alias("o_orderkey"),
            )
        )
        li_u.append(
            li.select(
                (F.col("l_orderkey") + u * KEY_OFF).alias("l_orderkey"),
                (F.col("l_suppkey") + u * KEY_OFF).alias("l_suppkey"),
                "l_extendedprice",
            )
        )

    def union_all(dfs):
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    union_all(emb_u).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    union_all(cust_u).write.mode("overwrite").parquet(
        f"{out_dir}/customer.parquet"
    )
    union_all(ord_u).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )
    union_all(li_u).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--mults", default="1,4,16")
    args = ap.parse_args()
    mults = [int(m) for m in args.mults.split(",")]
    spark = get_spark()
    Q = plans.QUERIES
    scratch = tempfile.mkdtemp(prefix="r9_smoke_")
    failures: list[str] = []
    base: dict[str, object] = {}
    report: dict[int, dict] = {}

    def check(cond: bool, msg: str) -> None:
        if not cond:
            failures.append(msg)
            print(f"FAIL {msg}")

    try:
        for m in mults:
            d = f"{scratch}/x{m}"
            build_universe(spark, args.sf, d, m)
            t0 = time.time()

            noise_rows = Q["knn_label_noise"](spark, d).collect()
            noise = {
                r.vec_id: (r.label, r.knn_majority, r.n_agree, r.flag_noise)
                for r in noise_rows
            }
            hub = Q["knn_hubness_stats"](spark, d).collect()
            kc = [
                (r.sel_rank, r.vec_id % EMB_OFF, r.radius)
                for r in Q["kcenter_coreset_select"](spark, d)
                .orderBy("sel_rank")
                .collect()
            ]
            psm = Q["propensity_match_att"](spark, d).collect()[0]
            qr = {
                r.tau: (r.intercept_usd, r.slope_cents_per_day,
                        r.pinball_loss10_cents)
                for r in Q["quantile_regression_grid"](spark, d).collect()
            }
            walks_n = Q["graph_random_walks"](spark, d).count()
            bloom = Q["bloom_filter_probe"](spark, d).collect()[0]
            wall = time.time() - t0

            n_q = spark.read.parquet(f"{d}/embeddings.parquet").filter(
                (F.col("vec_id") % 25) == 0
            ).count()
            tot_occ = sum(r.total_occ for r in hub)
            check(tot_occ == 10 * n_q,
                  f"x{m}: hubness mass {tot_occ} != 10*{n_q}")

            if m == mults[0]:
                base.update(noise=noise, kc=kc, psm=psm, qr=qr,
                            walks=walks_n, n_treated=psm.n_treated,
                            bloom_keys=bloom.n_keys)
            else:
                mr = m // mults[0]
                check(len(noise_rows) == len(base["noise"]) * mr,
                      f"x{m}: label-noise rows {len(noise_rows)}")
                if m >= 11:  # the whole 10-list is the query's own copies
                    for vid, (own, majv, agr, flg) in noise.items():
                        ok = (majv == own and agr == 10 and flg == 0)
                        check(ok,
                              f"x{m}: knn self-copy law at {vid}:"
                              f" ({own},{majv},{agr},{flg})")
                check(kc == base["kc"],
                      f"x{m}: kcenter selection/radii changed: {kc[:3]}...")
                check(psm.n_treated == base["psm"].n_treated * mr,
                      f"x{m}: psm n_treated {psm.n_treated}")
                for c in ("att_usd", "avg_treated_usd", "avg_matched_usd"):
                    check(getattr(psm, c) == getattr(base["psm"], c),
                          f"x{m}: psm {c} {getattr(psm, c)} != {getattr(base['psm'], c)}")
                for tau, (i0, s0, l0) in base["qr"].items():
                    i1, s1, l1 = qr[tau]
                    check((i1, s1) == (i0, s0),
                          f"x{m}: quantile tau={tau} line moved")
                    check(l1 == l0 * mr,
                          f"x{m}: quantile loss {l1} != {l0}*{mr}")
                check(walks_n == base["walks"] * mr,
                      f"x{m}: walk rows {walks_n} != {base['walks']}*{mr}")
                check(bloom.n_keys == base["bloom_keys"] * mr,
                      f"x{m}: bloom keys {bloom.n_keys}")
                check(bloom.n_probes == bloom.n_keys,
                      f"x{m}: bloom probes {bloom.n_probes}")

            report[m] = {"wall_s": round(wall, 2),
                         "knn_rows": len(noise_rows),
                         "walk_rows": walks_n,
                         "bloom_load": bloom.load_factor}
            print(f"x{m}: wall {wall:.1f}s  {report[m]}")
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    print(json.dumps({"report": {str(k): v for k, v in report.items()},
                      "failures": failures}))
    if failures:
        print(f"{len(failures)} invariant(s) violated")
        return 1
    print("all round-9 scale invariants hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
