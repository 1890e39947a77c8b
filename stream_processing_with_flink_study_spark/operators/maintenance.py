"""Storage-layout maintenance — the operational half of a 100 TB
pipeline: small-file compaction and date-partitioned layout with
partition-pruned reads.

Neither exists in the reference (its sinks stop at rolling part files,
``정리/6주차.md:122-147``); both are what keeps a petabyte parquet lake
scannable: compaction bounds file-count (NameNode/listing pressure,
task-scheduling overhead ∝ files), and partition layout turns time
predicates into directory pruning instead of footer reads.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files
    (the reference's 128 MB rolling-policy default,
    ``정리/6주차.md:143-144``, applied as after-the-fact compaction).

    Sizing uses the source's on-disk bytes — metadata only, no data
    scan — then one round-robin repartition to the target count.
    Returns the file count written.  At cluster scale the same call
    shape runs per partition-directory, parallel across partitions."""
    # on-disk size via the Hadoop FS API (driver metadata call, no scan)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = path.getFileSystem(conf)
    total_bytes = fs.getContentSummary(path).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    (
        spark.read.parquet(src_dir)
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
    out = jvm.org.apache.hadoop.fs.Path(dst_dir)
    return sum(
        1
        for f in fs.listStatus(out)
        if f.getPath().getName().endswith(".parquet")
    )


def write_date_partitioned(
    df: DataFrame, dst_dir: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Lay a stream table out as ``dt=YYYY-MM-DD/`` hive partitions so
    time-range queries prune directories before any footer is opened —
    the batch twin of the streaming file sink's DateTimeBucketAssigner
    (``정리/6주차.md:139-141``)."""
    (
        df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode(mode)
        .partitionBy("dt")
        .parquet(dst_dir)
    )


def read_pruned(
    spark: SparkSession, src_dir: str, start_dt: str, end_dt: str
) -> DataFrame:
    """Read a date-partitioned table with a partition-pruning predicate
    (``dt`` comparisons bind to directory names, not data)."""
    return spark.read.parquet(src_dir).filter(
        (F.col("dt") >= start_dt) & (F.col("dt") <= end_dt)
    )
