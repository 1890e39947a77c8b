"""Keyed stateful streaming operators (SURVEY.md §2.5 P1-P7) via
``applyInPandasWithState`` — the engine's ProcessFunction surface.

Each operator is the streaming twin of an oracle-checked batch query in
:mod:`..plans.queries_stateful`; tests/test_streaming.py asserts the
equivalence at micro-batch granularity.  Handlers receive each key's
rows per micro-batch as Arrow-backed pandas frames (never row-at-a-time
Python), sort by event time *inside* the handler (intra-batch order is
not guaranteed), and keep O(1) state per key — the properties that let
the same code run over millions of keys on a cluster where per-key state
lives in the executor state store, not on the driver.

Flink mapping: ValueState pattern ``정리/5주차.md:24-59``; state
primitives ``정리/5주차.md:7-13``; TTL ``정리/5주차.md:142-148`` →
``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.remove()``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def temp_delta_alerts(
    df: DataFrame,
    key: str = "id",
    ts: str = "ts",
    value: str = "temperature",
    threshold: float = 1.7,
    order_by: list[str] | None = None,
) -> DataFrame:
    """ValueState showcase (P4, ``정리/5주차.md:24-54``): remember the
    last value per key, emit ``(key, ts, value, delta)`` whenever
    ``|value - last| > threshold``.  ``order_by`` breaks event-time ties
    deterministically (default: event time only).  Batch twin: ``lag``
    window fn (plans.queries_stateful.temp_delta_alert)."""
    out_schema = f"{key} string, ts_ms long, value double, delta double"
    state_schema = "last_value double, last_ts_ms long"
    sort_cols = order_by or [ts]

    def handle(
        k: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_value, last_ts = state.get if state.exists else (None, None)
        rows = []
        # a key's micro-batch rows may arrive as several Arrow chunks:
        # concat before sorting or the event-time order is per-chunk only
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(sort_cols)
        for _, r in pdf.iterrows():
            t_ms = int(r[ts].value // 1_000_000)
            v = float(r[value])
            if last_value is not None and abs(v - last_value) > threshold:
                rows.append((k[0], t_ms, v, round(v - last_value, 4)))
            last_value, last_ts = v, t_ms
        state.update((last_value, last_ts))
        if rows:
            yield pd.DataFrame(rows, columns=[key, "ts_ms", "value", "delta"])

    return df.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def dedup_first(
    df: DataFrame,
    key_cols: list[str],
    ts: str = "ts",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit only the first event per key (min
    event time), suppress the rest.  ``ttl_ms`` bounds state per key
    (P7 leak prevention, ``정리/5주차.md:142-148``): after the TTL the
    key's seen-marker is dropped and a later duplicate would pass —
    the standard windowed-dedup trade-off at 100 TB key cardinality."""
    out_schema = ", ".join(f"{c} string" for c in key_cols) + ", first_ts_ms long"
    state_schema = "seen boolean"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def handle(
        k: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if not state.exists:
            first_ts = None
            for pdf in pdfs:
                m = pdf[ts].min()
                if first_ts is None or m < first_ts:
                    first_ts = m
            state.update((True,))
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                [(*[str(x) for x in k], int(first_ts.value // 1_000_000))],
                columns=[*key_cols, "first_ts_ms"],
            )
        else:
            for _ in pdfs:  # drain: duplicates suppressed
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)

    return df.groupBy(*key_cols).applyInPandasWithState(
        handle, out_schema, state_schema, "append", timeout
    )


def count_window_sum(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    n: int,
) -> DataFrame:
    """Count window (W5, ``정리/1주차.md:152``): per key, every ``n``
    events emit ``(key, window_idx, sum, n)``; the partial bucket stays
    in state (ListState semantics folded into a scalar accumulator —
    sum+count, not the raw rows, so state is O(1) not O(n))."""
    out_schema = f"{key} string, window_idx long, win_sum double, win_n long"
    state_schema = "buf_sum double, buf_n long, next_idx long"

    def handle(
        k: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        buf_sum, buf_n, next_idx = state.get if state.exists else (0.0, 0, 0)
        out = []
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts)
        for v in pdf[value]:
            buf_sum += float(v)
            buf_n += 1
            if buf_n == n:
                out.append((k[0], next_idx, round(buf_sum, 4), buf_n))
                buf_sum, buf_n, next_idx = 0.0, 0, next_idx + 1
        state.update((buf_sum, buf_n, next_idx))
        if out:
            yield pd.DataFrame(out, columns=[key, "window_idx", "win_sum", "win_n"])

    return df.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def keyed_rolling_reduce(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
) -> DataFrame:
    """Rolling reduce (K5, ``KeyedTransformations.java:55-62``): keep the
    per-key max-so-far and emit the updated ``(key, max_value)`` once per
    micro-batch in which it changed — Flink's per-record emission
    micro-batched (SURVEY §7.3 gap 1); final state identical."""
    out_schema = f"{key} string, max_value double"
    state_schema = "max_value double"

    def handle(
        k: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (cur,) = state.get if state.exists else (None,)
        changed = False
        for pdf in pdfs:
            m = float(pdf[value].max())
            if cur is None or m > cur:
                cur, changed = m, True
        state.update((cur,))
        if changed:
            yield pd.DataFrame([(k[0], cur)], columns=[key, "max_value"])

    return df.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def funnel_matches(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
    step_us: int = 12 * 3600 * 1_000_000,
) -> DataFrame:
    """Streaming CEP funnel (P1 ProcessFunction pattern): emit the final
    step of a ``steps`` sequence whose consecutive stages each occur
    within ``step_us`` — the stateful twin of the batch
    ``funnel_conversions`` chained-window query.

    Per-key state is just two timestamps (latest stage-1, latest
    QUALIFIED stage-2) — O(1) per key regardless of history length,
    the reason the pattern streams at 100 TB while the naive join
    buffers windows of raw events.  Same-instant cascades (view, click,
    purchase sharing one timestamp) match the batch RANGE-frame
    semantics because rows sort by (ts, stage rank): earlier stages
    update state before later stages test it."""
    s1, s2, s3 = steps
    out_schema = f"{key} long, event_id long, ts_ms long"
    state_schema = "last_s1_us long, last_s2_us long"

    def handle(
        k: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_s1, last_s2 = state.get if state.exists else (None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        rank = {s1: 0, s2: 1, s3: 2}
        pdf["_rank"] = pdf[type_col].map(rank)
        pdf = pdf.dropna(subset=["_rank"]).sort_values([ts, "_rank", "event_id"])
        rows = []
        for _, r in pdf.iterrows():
            ord_us = int(r[ts].value // 1_000)
            t = r[type_col]
            if t == s1:
                last_s1 = ord_us
            elif t == s2:
                if last_s1 is not None and last_s1 >= ord_us - step_us:
                    last_s2 = ord_us
            elif t == s3:
                if last_s2 is not None and last_s2 >= ord_us - step_us:
                    rows.append((k[0], int(r["event_id"]), ord_us // 1_000))
        state.update((last_s1, last_s2))
        if rows:
            yield pd.DataFrame(rows, columns=[key, "event_id", "ts_ms"])

    return df.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def topk_counts(
    df: DataFrame, key: str, term_col: str, k: int = 5
) -> DataFrame:
    """Streaming heavy hitters (MapState semantics on the GroupState
    API): per key, term counts accumulate across micro-batches as a
    dict-valued state; after each batch the key's current top-k
    (count desc, term asc) re-emits in update mode, so the final
    emission equals the batch top-k.  State is vocabulary-bounded per
    key — an entry per distinct term, never per event.  The
    transformWithState twin is ``process.topk_counts_tws`` (true
    per-entry MapState instead of a serialized dict)."""
    import json

    out_schema = "key string, term string, cnt long, rank long"
    state_schema = "counts string"

    def handle(
        k_: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = (
            json.loads(state.get[0]) if state.exists else {}
        )
        batch = pd.concat(list(pdfs), ignore_index=True)
        for term, n in batch[term_col].astype(str).value_counts().items():
            counts[term] = counts.get(term, 0) + int(n)
        state.update((json.dumps(counts),))
        top = sorted(counts.items(), key=lambda tc: (-tc[1], tc[0]))[:k]
        yield pd.DataFrame(
            {
                "key": [str(k_[0])] * len(top),
                "term": [t for t, _ in top],
                "cnt": [c for _, c in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return df.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
