"""Scale smoke: run the near-dup dedup pipeline on a corpus N× the
sf0.1 documents table and report per-stage wall clock — the check that
the pipeline's cost curve is linear-ish in corpus size (candidate
generation must never go pairwise).

    python tools/scale_smoke.py [--mult 20] [--sf /root/testdata/sf0.1]

Each copy gets distinct doc_ids and EVERY token salted with the copy
index — a one-token marker is not enough: it only changes the first few
shingles and leaves the copies ~0.95-Jaccard near-dups of each other,
which silently turns the experiment quadratic (1.2M "true" pairs at
mult=20).  With per-token salting the planted every-20th-doc
perturbations stay within-copy, the true-pair count scales linearly,
and recall is checkable at any multiplier.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from stream_processing_with_flink_study_spark.functions import dedup  # noqa: E402
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402
from stream_processing_with_flink_study_spark.sources import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=20)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("scale-smoke")
    base = load_table(spark, args.sf, "documents").select(
        "doc_id", F.lower(F.trim("text")).alias("text")
    )

    copies = []
    for i in range(args.mult):
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), r"\s+"),
                lambda tok: F.concat(tok, F.lit(f"_{i}")),
            ),
            " ",
        )
        c = base.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            salted.alias("text"),
        )
        toks = F.split(F.col("text"), r"\s+")
        near = c.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(F.slice(toks, 2, F.size(toks) - 1), " ").alias("text"),
        )
        copies.append(c.unionByName(near))
    corpus = copies[0]
    for c in copies[1:]:
        corpus = corpus.unionByName(c)

    t = {}
    t0 = time.perf_counter()
    # persist: the salted-union corpus build stands in for a parquet
    # table; without it every downstream consumer replays the 2×mult
    # union + md5-salt projection instead of a table scan
    corpus = corpus.persist()
    n_docs = corpus.count()
    t["corpus_build"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_shingles = dedup.doc_shingles(
        corpus, "text", "doc_id", distinct=False
    ).count()
    t["shingles"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    sig = dedup.minhash_signatures(corpus, "text", "doc_id")
    buckets = dedup.lsh_band_buckets(sig, "doc_id").persist()
    buckets.count()
    t["signatures_buckets"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cands = dedup.lsh_candidate_pairs(buckets=buckets, id_col="doc_id")
    # per-pair Arrow verify, mirroring the registered query
    pairs = dedup.jaccard_verify_pairs(corpus, cands, "text", "doc_id", 0.5)
    n_pairs = pairs.count()
    t["candidates_verify"] = round(time.perf_counter() - t0, 2)

    expected_pairs_per_copy = (
        base.filter(F.col("doc_id") % 20 == 0).count()
    )
    print(
        json.dumps(
            {
                "mult": args.mult,
                "n_docs": n_docs,
                "n_shingles": n_shingles,
                "near_dup_pairs": n_pairs,
                "planted_per_copy": expected_pairs_per_copy,
                "stage_seconds": t,
                "total_seconds": round(sum(t.values()), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
