"""Physical distribution operators (SURVEY.md §2.7 D1-D8).

Thin, named wrappers so the engine's API surface matches the reference's
distribution vocabulary (``정리/3주차.md:86-108``).  In Spark most of
these are hints to Catalyst rather than hard physical plans — AQE may
coalesce afterwards, which is the behavior we want at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shuffle(df: DataFrame, n: int | None = None) -> DataFrame:
    """D1/D2 ``shuffle()``/``rebalance()`` (``정리/3주차.md:87-88``):
    round-robin redistribution."""
    return df.repartition(n) if n else df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def rescale(df: DataFrame, n: int) -> DataFrame:
    """D3 ``rescale()`` (``정리/3주차.md:89-90``): scale-down without a
    full shuffle."""
    return df.coalesce(n)


def broadcast_hint(df: DataFrame) -> DataFrame:
    """D4 ``broadcast()`` (``정리/3주차.md:91``): replicate to every task
    — the broadcast-join hint."""
    return F.broadcast(df)


def to_single_task(df: DataFrame) -> DataFrame:
    """D5 ``global()`` (``정리/3주차.md:92-93``): everything to one task.
    Deliberately explicit — a scale smell anywhere in a hot path."""
    return df.coalesce(1)


def partition_by_key(df: DataFrame, *cols: str | Column, n: int | None = None) -> DataFrame:
    """D6 ``partitionCustom()`` hash form (``정리/3주차.md:94-108``):
    co-locate rows by key ahead of repeated keyed ops so later
    joins/aggs on the same key reuse the exchange."""
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def partition_by_range(df: DataFrame, *cols: str | Column, n: int | None = None) -> DataFrame:
    """D6 range form — sorted/partition-pruned output layouts."""
    return df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)


_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe two-stage aggregation: salt the key with a random
    bucket, pre-aggregate per (key, salt), then merge per key.

    A hot key that would pin one reducer is spread over
    ``salt_buckets`` partial aggregates; the merge stage handles
    ``salt_buckets`` rows per key regardless of skew.  Only algebraic
    aggregates decompose this way — ``aggs`` maps output name →
    (fn, column) with fn ∈ sum/count/min/max (count merges as sum).
    AQE's skew-join handling covers the join-side analogue; this is the
    groupBy-side tool for when a single key dominates (e.g. one URL at
    30% of a 100 TB crawl).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{name}: non-algebraic agg {fn!r} cannot be salted")
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_PARTIAL[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key with a random bucket
    and replicate the small side once per bucket, so a hot key's rows
    spread over ``salt_buckets`` reducers instead of pinning one.

    The price is writing the small side ``salt_buckets`` × through the
    shuffle — worth it exactly when the small side is too large to
    broadcast outright but small relative to the skewed fact (the
    gap AQE's skew-split also targets; this is the explicit form for
    when runtime stats aren't available, e.g. first contact with a
    100 TB crawl keyed by URL host).  Join column set must be a single
    equi-key; the salt columns never leave the join."""
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """D6's durable form: persist a table hash-bucketed (and optionally
    sorted) by key so later equi-joins/aggs on that key need NO exchange
    — the co-located-join layout for fact tables that join repeatedly
    (lineitem⋈orders at 100 TB amortizes its shuffle exactly once, at
    write time).  Catalyst proves co-partitioning from catalog metadata;
    see tests/test_distribution.py for the shuffle-free join assertion.
    """
    spark = df.sparkSession
    if mode == "overwrite" and not spark.catalog.tableExists(table):
        # a crashed prior run can leave the warehouse dir on disk with no
        # catalog entry (fresh in-memory metastore) → LOCATION_ALREADY_EXISTS;
        # overwrite semantics say the orphan dir must go
        import shutil
        from urllib.parse import urlparse

        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        parsed = urlparse(wh)
        if parsed.scheme in ("", "file"):
            # qualified names live under <db>.db/<tbl>; unqualified and
            # default-db ones directly under the warehouse root
            parts = table.lower().split(".")
            rel = (
                os.path.join(f"{parts[-2]}.db", parts[-1])
                if len(parts) > 1 and parts[-2] != "default"
                else parts[-1]
            )
            shutil.rmtree(
                os.path.join(parsed.path or wh, rel),
                ignore_errors=True,
            )
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
