"""Per-query profiling harness (optimization round instrumentation).

For each named query: wall-clock over BENCH_REPEATS runs (median), the
number of Spark JOBS the query launches (sequential driver round trips
— at bench scale these ARE most of the wall), and optionally the
formatted physical plan dumped to a file.

    python tools/profile_query.py [--repeats 3] [--plans-dir plans/r12] \
        [--suffix before] name [name ...]

Job counting uses a job group: every action the query triggers inside
the timed region is tagged, then counted via the status tracker.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession  # noqa: E402

from stream_processing_with_flink_study_spark import plans  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up identical in spirit to bench.py
    plans.QUERIES["flagship_window_avg"](spark, args.sf).collect()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(1000, numPartitions=int(cpus)).select(
        F.sum(_warm(F.col("id").cast("double")))
    ).collect()
    if any(n.startswith("streaming_") for n in args.names):
        plans.QUERIES["streaming_lindley_balance"](spark, args.sf).collect()
        spark.catalog.clearCache()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    jsc = sc._jsc.sc()

    def drain_leftovers() -> None:
        # same untimed inter-query hygiene as bench.py: cached frames
        # AND leftover localCheckpoint RDDs, removed BLOCKING so the
        # cleanup provably completes outside the next timed region
        spark.catalog.clearCache()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(True)

    for name in args.names:
        times = []
        n_jobs = 0
        for i in range(args.repeats):
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            plans.QUERIES[name](spark, args.sf).collect()
            times.append(time.perf_counter() - t0)
            sc.setJobGroup(f"prof-idle", "idle")
            n_jobs = len(tracker.getJobIdsForGroup(group))
            drain_leftovers()
        times.sort()
        med = times[len(times) // 2]
        print(
            f"{name:40s} med={med:7.3f}s min={times[0]:7.3f}s "
            f"jobs={n_jobs}"
        )
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = plans.QUERIES[name](spark, args.sf)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
