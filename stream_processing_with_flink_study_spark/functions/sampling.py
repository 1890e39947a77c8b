"""Deterministic sampling for reproducible training-data pipelines.

Random `df.sample()` draws differ run-to-run and executor-to-executor;
a 100 TB pipeline needs membership to be a PURE FUNCTION of the row key
so re-runs, backfills, and train/eval splits agree byte-for-byte.  Both
operators here decide membership by hashing the key with md5 and
comparing a fixed-width hex prefix against a threshold — engine-portable
(DuckDB computes identical md5 hex), so the driver oracles check them
exactly, and embarrassingly parallel (a pure per-row filter: no shuffle,
no RNG state, survives any repartitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_WIDTH = 8  # 32 bits of the md5 — plenty for per-mille rates


def _threshold_hex(fraction: float) -> str:
    """fraction ∈ [0, 1] → fixed-width lowercase hex cut-off; rows whose
    hash prefix sorts strictly below it are in the sample."""
    cut = int(fraction * (16**HEX_WIDTH))
    if cut >= 16**HEX_WIDTH:
        return "g" * HEX_WIDTH  # 'g' > 'f': admits every row
    return format(max(cut, 0), f"0{HEX_WIDTH}x")


def _hash_prefix(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, HEX_WIDTH)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by ``md5(salt|key) < cut``.
    Same key + salt → same decision on every run, engine, and partition
    layout; different salts give independent samples (e.g. train vs
    eval splits that provably never overlap when thresholds partition
    the hex space)."""
    return df.filter(
        _hash_prefix(F.col(key_col), salt) < F.lit(_threshold_hex(fraction))
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "w0",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws u = hash-uniform(0,1]
    from its key and scores ``ln(u)/w``; the k largest scores are the
    sample, giving inclusion probability proportional to weight.

    Scale shape: the score is a pure per-row expression (no RNG state),
    and top-k-by-score compiles to TakeOrderedAndProject — per-partition
    partial top-k then a k-row merge on the driver, never a global
    sort-shuffle.  Deterministic across runs, engines, and partition
    layouts; the DuckDB oracle reproduces the identical hash → score →
    ORDER BY/LIMIT pipeline."""
    hex_int = F.conv(_hash_prefix(F.col(key_col), salt), 16, 10).cast("double")
    u = (hex_int + 1.0) / float(16**HEX_WIDTH + 1)
    score = F.log(u) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_score", score)
        .orderBy(F.col("es_score").desc(), F.col(key_col))
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "s0",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample dominant
    languages, keep all of rare ones).  One scan, one per-row hash, no
    shuffle: the rate lookup is a literal CASE chain, not a join."""
    cut = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(cut)
    return df.filter(_hash_prefix(F.col(key_col), salt) < cut)
