"""Bench-scale (sf0.1) pre-pass: fully evaluate every registered query
once BEFORE the definitive bench run.

Why this exists: the sf0.01 oracle gate does NOT catch errors that only
trigger at bench scale — round 6 lost a definitive bench run mid-flight
to ARITHMETIC_OVERFLOW (Σcents² passing 2^63 near a million fact rows,
ANSI mode on).  This sweep is the standing gate for that class: every
query is materialized end-to-end via the `noop` writer (all columns
evaluated, nothing collected to the driver), so any ANSI overflow,
cast error, or scale-only crash surfaces here, not mid-bench.

    python tools/sf01_sweep.py [--sf /root/testdata/sf0.1] [--new] [name ...]

``--new`` restricts to registry queries absent from BENCH_FULL.json —
the "sweep each new query once at sf0.1 before the definitive bench"
workflow.  Exit status is non-zero on any failure (CI-shaped).
Referenced from BASELINE.md's bench protocol.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, ".")

from stream_processing_with_flink_study_spark import plans  # noqa: E402
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--new",
        action="store_true",
        help="only queries not yet recorded in BENCH_FULL.json",
    )
    args = ap.parse_args()

    names = args.names or sorted(plans.QUERIES)
    if args.new:
        try:
            with open("BENCH_FULL.json") as f:
                benched = set(json.load(f).get("queries", {}))
        except FileNotFoundError:
            benched = set()
        names = [n for n in names if n not in benched]
        print(f"{len(names)} queries not in BENCH_FULL.json")

    spark = get_spark("sf01-sweep")
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            df = plans.QUERIES[name](spark, args.sf)
            # noop write evaluates every column of every row (unlike
            # count(), which lets Spark prune projections) without
            # collecting anything to the driver
            df.write.format("noop").mode("overwrite").save()
            print(f"OK   {name:34s} {time.time() - t0:6.1f}s")
        except Exception:
            print(f"FAIL {name:34s} {time.time() - t0:6.1f}s")
            traceback.print_exc(limit=6)
            failures += 1
        finally:
            spark.catalog.clearCache()
    print(f"\n{len(names) - failures}/{len(names)} evaluated clean at {args.sf}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
