"""Decorator-based registry: one entry per SURVEY.md §2 operator.

Conventions that keep the DuckDB oracle hash-stable (the driver sorts
columns by name and hashes values — column NAMES and VALUES must match
bit-for-bit):

- every computed/aggregate column is aliased identically in the Spark
  query and the oracle SQL;
- timestamp outputs are emitted as epoch-millis BIGINT (Spark
  ``unix_millis`` / DuckDB ``epoch_ms``) so engine-specific
  datetime dtypes can never skew the hash;
- floating-point aggregates are rounded to 4 decimals on both sides to
  absorb summation-order differences (double sums are not associative).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def scratch_dir(prefix: str) -> "_ScratchDir":
    """Self-cleaning temp directory for streaming query plumbing
    (replay-source spill dirs, checkpoints).  The memory-sink table
    :func:`..streaming.run_available_now` returns is fully materialized
    driver-side, so the backing dirs can be deleted the moment the run
    returns — without this, every bench/gate invocation of a streaming
    query leaked a mkdtemp directory."""
    return _ScratchDir(prefix)


class _ScratchDir:
    def __init__(self, prefix: str):
        import tempfile

        self.path = tempfile.mkdtemp(prefix=prefix)

    def __enter__(self) -> str:
        return self.path

    def __exit__(self, *exc) -> None:
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)
