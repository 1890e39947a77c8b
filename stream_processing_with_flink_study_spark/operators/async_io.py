"""P10 async I/O — Flink ``AsyncDataStream.orderedWait`` /
``unorderedWait`` (``정리/6주차.md:403-418``) re-expressed Spark-first.

Two tiers, matching how the reference frames the problem:

1. If the lookup source is JOINABLE (a table, a file, anything Spark
   can read), the right answer is a broadcast join — see
   ``plans.queries_ext.async_lookup_enrich``.  No code here.
2. If the lookup is a genuine per-key SERVICE call (HTTP/RPC — not
   broadcastable), :func:`async_lookup` runs the calls CONCURRENTLY
   inside ``mapInPandas``: one asyncio event loop per Arrow batch, a
   semaphore bounding in-flight requests (Flink's ``capacity``), a
   per-request timeout, and ordered vs unordered emission.  There is no
   per-row sequential ``await`` — all of a batch's requests are
   gathered under the semaphore, so wall-clock per batch is
   ``ceil(n / capacity) × latency``, not ``n × latency``.

Scale shape: the event loop lives per (executor, batch) — no driver
participation, no global coordination, state bounded by one Arrow
batch (``spark.sql.execution.arrow.maxRecordsPerBatch``).  Retries and
connection pooling belong INSIDE the user coroutine (it is created
once per batch via ``session_factory`` when provided, so a pooled
client amortizes across the batch exactly like Flink's
``RichAsyncFunction.open``).
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

_ON_TIMEOUT = ("error", "null", "drop")


def async_lookup(
    df: DataFrame,
    lookup: Callable[..., Awaitable[Any]],
    key_col: str,
    out_col: str,
    out_type: str = "string",
    capacity: int = 64,
    timeout: float = 10.0,
    ordered: bool = True,
    on_timeout: str = "error",
    session_factory: Callable[[], Any] | None = None,
) -> DataFrame:
    """Enrich ``df`` with ``out_col = await lookup(key)`` evaluated
    concurrently per Arrow batch.

    ``lookup(key)`` (or ``lookup(session, key)`` when
    ``session_factory`` is given) is a coroutine function; it must be
    picklable (module-level or closure — cloudpickle ships it to
    executors).  ``capacity`` bounds in-flight requests per batch
    (Flink's AsyncDataStream capacity); ``timeout`` is per request,
    seconds.  ``on_timeout``: ``"error"`` fails the task (Flink
    default), ``"null"`` emits NULL for that key, ``"drop"`` drops the
    row (Flink's empty ``resultFuture.complete``).

    ``ordered=True`` (orderedWait) emits results in input order within
    the batch; ``ordered=False`` (unorderedWait) emits in COMPLETION
    order — same rows, lower latency-to-first-result in a true
    streaming sink, observable here as a permuted batch."""
    if on_timeout not in _ON_TIMEOUT:
        raise ValueError(f"on_timeout must be one of {_ON_TIMEOUT}")
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    schema = StructType.fromDDL(
        ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
            + [f"`{out_col}` {out_type}"]
        )
    )

    def run_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def run_one(pdf: pd.DataFrame) -> pd.DataFrame:
            session = session_factory() if session_factory is not None else None
            try:
                if session is not None and hasattr(session, "__aenter__"):
                    session = await session.__aenter__()
                keys = pdf[key_col].tolist()
                results: list[Any] = [None] * len(keys)
                timed_out = [False] * len(keys)
                completion: list[int] = []
                # worker pool, not task-per-row: `capacity` workers pull
                # the next index off a shared cursor (single-threaded
                # loop — no lock needed), so a 100k-row batch creates
                # `capacity` tasks instead of 100k.  In-flight requests
                # are bounded by the pool size itself.
                cursor = iter(range(len(keys)))

                async def worker() -> None:
                    for i in cursor:
                        coro = (
                            lookup(keys[i])
                            if session is None
                            else lookup(session, keys[i])
                        )
                        try:
                            results[i] = await asyncio.wait_for(coro, timeout)
                        except asyncio.TimeoutError:
                            if on_timeout == "error":
                                raise
                            timed_out[i] = True
                        completion.append(i)

                await asyncio.gather(
                    *(worker() for _ in range(min(capacity, len(keys))))
                )
                out = pdf.iloc[completion if not ordered else slice(None)]
                out = out.reset_index(drop=True).assign(
                    **{
                        out_col: [
                            results[i]
                            for i in (
                                completion
                                if not ordered
                                else range(len(keys))
                            )
                        ]
                    }
                )
                if on_timeout == "drop":
                    keep = [
                        not timed_out[i]
                        for i in (
                            completion if not ordered else range(len(keys))
                        )
                    ]
                    out = out[keep].reset_index(drop=True)
                return out
            finally:
                if session is not None and hasattr(session, "__aexit__"):
                    await session.__aexit__(None, None, None)

        for pdf in pdfs:
            if len(pdf):
                yield asyncio.run(run_one(pdf))

    return df.mapInPandas(run_batches, schema)
