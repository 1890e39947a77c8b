"""Dump `explain("formatted")` for named queries to files.

    python tools/dump_plans.py --out plans/r12 --suffix before name ...

Runs from whichever repo root it lives in (worktrees included), so the
same command produces before/after plan evidence across commits.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import SparkSession  # noqa: E402

from stream_processing_with_flink_study_spark import plans  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", required=True)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = plans.QUERIES[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(args.out, f"{name}_{args.suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print("dumped", name)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
