"""Incremental batch rollup — the batch sibling of the streaming
continuous aggregate (``tests/test_streaming.py``'s update-mode rollup
through the upsert sink): new data arrives in INGESTION STEPS, each
step persists only its own ALGEBRAIC PARTIALS (count + sums per key),
and reads merge-on-read by summing partials across steps.

Why partials, not final values: algebraic aggregates (count/sum/avg)
merge associatively, so ingesting a step costs one aggregation over
THAT step's data only — the accumulated history is never re-scanned
(the property that makes nightly 100 TB ingestion O(new data)).  A
step re-run overwrites its own ``step=<n>`` directory, giving the same
idempotency contract as ``streaming/sinks.IdempotentKeyedUpsert``.
Holistic aggregates (exact percentiles) cannot ride this path — that
is the fundamental algebraic/holistic split, and the sketch battery
(``plans/queries_mlprep.sketch_battery``) is the mergeable alternative.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalRollup:
    """Keyed count/sum rollup maintained across ingestion steps."""

    def __init__(self, path: str, key_cols: list[str], sum_cols: list[str]):
        self.path = path
        self.key_cols = key_cols
        self.sum_cols = sum_cols

    def ingest(self, df: DataFrame, step: int) -> None:
        """Aggregate ONE step's new data to partials and publish them
        under ``step=<n>`` (overwrite → re-runs are idempotent)."""
        partial = df.groupBy(*self.key_cols).agg(
            F.count(F.lit(1)).alias("_cnt"),
            *[F.sum(c).alias(f"_sum_{c}") for c in self.sum_cols],
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(self.path, f"step={step}")
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """Merge-on-read: sum partials across every published step;
        derived means come from merged sums / merged counts, so they
        are exact, not averages-of-averages."""
        df = spark.read.option("basePath", self.path).parquet(
            os.path.join(self.path, "step=*")
        )
        merged = df.groupBy(*self.key_cols).agg(
            F.sum("_cnt").alias("n"),
            *[F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in self.sum_cols],
        )
        for c in self.sum_cols:
            merged = merged.withColumn(
                f"avg_{c}", F.col(f"sum_{c}") / F.col("n")
            )
        return merged
