"""Count-min sketch as a DataFrame: a mergeable frequency sketch for
heavy-hitter queries at scales where exact per-key counts are too wide
to hold (reference scope: keyed aggregation state, 정리/5주차.md; the
mergeable-partials design note in ``plans/queries_mlprep.sketch_battery``
covers the HLL/quantile siblings).

The sketch IS a (row, bucket, c) table with d·w cells regardless of key
cardinality: each input key increments one bucket per hash row, and a
point estimate is the MIN over its d buckets — an upper bound on the
true count that overshoots by ≤ εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.  Everything is JVM-side (xxhash64 + pmod), one
scan + one keyed count to build; merging two sketches of the same
layout is a union + keyed sum, and ``merge(build(A), build(B)) ==
build(A ∪ B)`` EXACTLY (tested), which is the law that lets partial
sketches combine map-side at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_W = 1024
CMS_D = 4


def _bucket(key: Column, row: int, w: int, seed: str) -> Column:
    return F.pmod(F.xxhash64(F.lit(f"{seed}|{row}"), key), F.lit(w))


def cms_build(
    df: DataFrame,
    key: str,
    w: int = CMS_W,
    d: int = CMS_D,
    seed: str = "cms0",
) -> DataFrame:
    """Build the sketch table (row, bucket, c) from one column.  One
    scan, one shuffle of (row, bucket) pairs — d rows per input row,
    partial-aggregated map-side to at most d·w groups."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col(key), r, w, seed).alias("bucket"),
            )
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (w, d, seed) layout —
    union + keyed sum, the mergeable-partial law."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key: str,
    w: int = CMS_W,
    d: int = CMS_D,
    seed: str = "cms0",
) -> DataFrame:
    """Point-estimate the count of every key in ``keys``: compute the
    key's d buckets, broadcast-join them against the sketch (≤ d·w
    rows — always broadcastable), and take the min; a missing bucket
    is an exact zero.  Returns (key, est)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                _bucket(F.col(key), r, w, seed).alias("bucket"),
            )
            for r in range(d)
        ]
    )
    probes = keys.select(key, F.explode(cells).alias("cell")).select(
        key, F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )
