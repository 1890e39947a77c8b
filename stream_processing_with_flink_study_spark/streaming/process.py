"""`transformWithStateInPandas` processors — the engine's full
ProcessFunction surface (SURVEY.md §2.5 P1/P2/P5/P7): typed keyed state
(ValueState / ListState / MapState), per-state TTL, and timers, on the
new StatefulProcessor API (requires the RocksDB state store provider —
:func:`rocksdb_conf`).

`..streaming.stateful` keeps the `applyInPandasWithState` versions
(HDFS-backed store, broader deployment surface); these processors are
the feature-complete path — Flink keyed-state parity per
``정리/5주차.md:7-13`` with TTL per ``정리/5주차.md:142-148``.

Runtime dependency: the transformWithState Python worker speaks a
protobuf protocol to the state server — ``google.protobuf`` must be
importable on driver and executors (tests skip when it isn't).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_conf() -> dict[str, str]:
    """SQL conf enabling the state backend transformWithState needs —
    the analogue of picking Flink's RocksDB backend
    (``정리/5주차.md:113-134``)."""
    return {"spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER}


class RunningMaxProcessor(StatefulProcessor):
    """ValueState running max per key (K5's accumulator as a
    ProcessFunction): emits ``(key, max_value)`` whenever a micro-batch
    raises the key's max — per-record emission micro-batched, final
    state equal to the batch ``groupBy(key).max`` twin."""

    def __init__(self, value_col: str, ttl_ms: int | None = None):
        self.value_col = value_col
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._max = handle.getValueState("max", "max_value double", self.ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        cur = self._max.get()
        cur_val = cur[0] if cur is not None else None
        m = cur_val
        for pdf in rows:
            b = float(pdf[self.value_col].max())
            if m is None or b > m:
                m = b
        if m is not None and m != cur_val:
            self._max.update((m,))
            yield pd.DataFrame({"key": [key[0]], "max_value": [m]})

    def close(self) -> None:
        pass


class CountWindowProcessor(StatefulProcessor):
    """ListState count window (W5): buffer each key's values, emit
    ``(key, window_idx, win_sum, win_n)`` per complete bucket of ``n``.
    The buffer holds the open bucket only — O(n) state per key."""

    def __init__(self, ts_col: str, value_col: str, n: int):
        self.ts_col = ts_col
        self.value_col = value_col
        self.n = n

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._buf = handle.getListState("buf", "v double")
        self._meta = handle.getValueState("meta", "next_idx long")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        buf = [r[0] for r in self._buf.get()]
        meta = self._meta.get()
        next_idx = meta[0] if meta is not None else 0
        pdf = pd.concat(list(rows), ignore_index=True).sort_values(self.ts_col)
        out = []
        for v in pdf[self.value_col]:
            buf.append(float(v))
            if len(buf) == self.n:
                out.append((key[0], next_idx, round(sum(buf), 4), len(buf)))
                buf, next_idx = [], next_idx + 1
        self._buf.clear()
        if buf:
            self._buf.appendList([(v,) for v in buf])
        self._meta.update((next_idx,))
        if out:
            yield pd.DataFrame(
                out, columns=["key", "window_idx", "win_sum", "win_n"]
            )

    def close(self) -> None:
        pass


def running_max(
    df: DataFrame, key: str, value_col: str, ttl_ms: int | None = None
) -> DataFrame:
    return df.groupBy(key).transformWithStateInPandas(
        RunningMaxProcessor(value_col, ttl_ms),
        outputStructType="key string, max_value double",
        outputMode="Update",
        timeMode="None",
    )


def count_window_sum_tws(
    df: DataFrame, key: str, ts_col: str, value_col: str, n: int
) -> DataFrame:
    return df.groupBy(key).transformWithStateInPandas(
        CountWindowProcessor(ts_col, value_col, n),
        outputStructType="key string, window_idx long, win_sum double, win_n long",
        outputMode="Append",
        timeMode="None",
    )


class TopKCountsProcessor(StatefulProcessor):
    """MapState heavy hitters (P5's MapState primitive as a streaming
    top-k): per key, a term -> count map accumulates across micro-
    batches; after each batch the key's current top-k (count desc, term
    asc) is re-emitted in update mode, so the final emission equals the
    batch ``groupBy(key, term).count`` top-k.

    State is vocabulary-bounded per key (a map entry per distinct term,
    never per event); for unbounded term domains compose with a TTL or
    a space-saving sketch upstream."""

    def __init__(self, term_col: str, k: int = 5):
        self.term_col = term_col
        self.k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("counts", "term string", "cnt long")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows), ignore_index=True)
        for term, n in batch[self.term_col].astype(str).value_counts().items():
            prev = self._counts.getValue((term,))
            cur = (prev[0] if prev is not None else 0) + int(n)
            self._counts.updateValue((term,), (cur,))
        top = sorted(
            ((t[0], c[0]) for t, c in self._counts.iterator()),
            key=lambda tc: (-tc[1], tc[0]),
        )[: self.k]
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(top),
                "term": [t for t, _ in top],
                "cnt": [c for _, c in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    def close(self) -> None:
        pass


def topk_counts_tws(df: DataFrame, key: str, term_col: str, k: int = 5) -> DataFrame:
    return df.groupBy(key).transformWithStateInPandas(
        TopKCountsProcessor(term_col, k),
        outputStructType="key string, term string, cnt long, rank long",
        outputMode="Update",
        timeMode="None",
    )
