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


# --------------------------------------------------------------------------
# Misra-Gries heavy hitters: per-partition summaries + candidate recount
# --------------------------------------------------------------------------
def misra_gries_partials(
    items: DataFrame, item_col: str = "item", capacity: int = 512
) -> DataFrame:
    """Per-PARTITION Misra-Gries summaries: each partition keeps at most
    ``capacity`` counters; every key whose in-partition count exceeds
    n_partition/capacity is guaranteed a surviving counter.  Pigeonhole
    lifts that to the corpus: a key with global count > N/capacity is
    over-threshold in at least one partition, so the UNION of partial
    key sets is a guaranteed SUPERSET of the global heavy hitters —
    which is all pass 2 needs (counts here are MG lower bounds, not
    estimates to report).

    Output: (item, mg_count) — at most capacity rows per partition.
    Implemented as one arrow-batched pass (pandas value_counts per
    batch + dict decrement-compress), state bounded by capacity."""
    import pandas as pd

    def _mg(batches):
        counters: dict = {}
        for pdf in batches:
            for val, cnt in pdf[item_col].value_counts().items():
                counters[val] = counters.get(val, 0) + int(cnt)
                if len(counters) > 2 * capacity:
                    _compress(counters, capacity)
        _compress(counters, capacity)
        if counters:
            yield pd.DataFrame(
                {
                    "item": list(counters.keys()),
                    "mg_count": list(counters.values()),
                }
            )

    def _compress(counters: dict, cap: int) -> None:
        if len(counters) <= cap:
            return
        # decrement by the (cap+1)-th largest count: classic MG step,
        # batched — at most cap counters survive
        med = sorted(counters.values(), reverse=True)[cap]
        for k in list(counters):
            counters[k] -= med
            if counters[k] <= 0:
                del counters[k]

    return items.select(F.col(item_col).alias(item_col)).mapInPandas(
        _mg, "item string, mg_count long"
    )


def heavy_hitters_two_pass(
    items: DataFrame,
    item_col: str = "item",
    k: int = 20,
    capacity: int = 512,
) -> DataFrame:
    """Exact top-k heavy hitters WITHOUT a full-cardinality shuffle:
    pass 1 runs :func:`misra_gries_partials` (candidate superset,
    ≤ capacity rows/partition), pass 2 recounts ONLY the candidates via
    a broadcast semi-join and ranks them exactly.

    Correct whenever the true k-th count exceeds N/capacity (the MG
    guarantee) — at capacity=512 on a Zipfian token stream that holds
    by orders of magnitude.  Scale win: the full-stream groupBy that a
    naive top-k pays (vocabulary-sized shuffle) collapses to a
    candidate-set recount — the two-pass shape every production top-k
    uses.  Output: (item, n, rank), deterministic (count desc, item
    asc) tiebreak."""
    from pyspark.sql.window import Window

    cand = (
        misra_gries_partials(items, item_col, capacity)
        .select("item")
        .distinct()
    )
    exact = (
        items.join(
            F.broadcast(cand.withColumnRenamed("item", item_col)), item_col
        )
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc(item_col))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(item_col).alias("item"), "n", "rank")
    )
