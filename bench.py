"""Benchmark harness: wall-clock every registered query at the driver's
scale factor and print ONE JSON line.

    SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] threads (default 32)
    BENCH_QUERIES       comma-separated subset (default: all registered)
    BENCH_REPEATS       runs per query, median reported (default 1 — the
                        driver's single-pass mode; use 3+ locally to
                        separate plan cost from codegen/JIT compile and
                        host-load noise)

The headline ``value`` is the summed wall-clock of all queries (sec);
per-query seconds are in ``queries``.  Each query is fully materialized
via ``collect()`` (result sets are aggregate-sized).  One flagship
warm-up run amortizes JVM/codegen start-up out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

from stream_processing_with_flink_study_spark import plans  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stream_processing_with_flink_study_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = sorted(plans.QUERIES)
    subset = os.environ.get("BENCH_QUERIES")
    if subset:
        names = [n for n in subset.split(",") if n in plans.QUERIES]

    # warm-up: JVM + codegen (flagship), parquet footers for every table,
    # and the Python/Arrow UDF worker pool — otherwise the first
    # pandas-UDF query pays ~32 worker forks + Arrow init inside its
    # measured time
    plans.QUERIES["flagship_window_avg"](spark, sf_dir).collect()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(s):
        return s * 1.0

    spark.range(1000, numPartitions=int(cpus)).select(
        F.sum(_warm(F.col("id").cast("double")))
    ).collect()
    from stream_processing_with_flink_study_spark.sources import load_table

    for t in ("events", "documents", "embeddings", "lineitem", "orders"):
        load_table(spark, sf_dir, t).limit(1).collect()

    repeats = int(os.environ.get("BENCH_REPEATS", "1"))
    per_query: dict[str, float] = {}
    for name in names:
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            plans.QUERIES[name](spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
            # queries may persist intermediates (LSH buckets, minhash
            # signatures); drop them so caches never accumulate across
            # the run and later queries aren't measured under GC noise
            spark.catalog.clearCache()
        times.sort()
        per_query[name] = round(times[len(times) // 2], 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(per_query.values()), 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
