"""Generic CEP sequence-pattern matching (``정리/1주차.md:22-25`` — the
book's complex-event-processing surface, of which ``funnel_conversions``
is the fixed 3-step instance).

``match_pattern`` detects an N-step event-type sequence per key with a
``within`` timeout between consecutive steps, under two contiguity
modes mirroring Flink CEP's quantifiers:

- ``relaxed`` (CEP ``followedBy``): other events may interleave; each
  step matches the LATEST qualified previous-step event within the
  timeout.
- ``strict`` (CEP ``next``): the N events must be consecutive in the
  key's stream — any interleaved event breaks the match.

Both have a batch form (chained conditional running-max windows /
lag battery — ONE exchange + ONE sort regardless of N, linear in
events, the 100 TB shape; the naive alternative is N-1 self-joins) and
a streaming twin over ``applyInPandasWithState`` with O(1) state per
key (``relaxed``: N-1 timestamps; ``strict``: the last N-1 events),
so per-key state is independent of history length.

Match ordering is (ts, step-rank, tiebreak); predecessors are taken
from STRICTLY earlier positions, so one event never satisfies two
steps of the same match, while same-instant cascades (view, click at
one timestamp) still match — update-before-test, exactly the loop
semantics of a per-record ProcessFunction.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _rank_expr(type_col: str, steps: tuple[str, ...]):
    """First-matching-step index (sort tiebreak so earlier stages of a
    same-instant cascade update state before later stages test it)."""
    expr = F.lit(len(steps))
    for i in range(len(steps) - 1, -1, -1):
        expr = F.when(F.col(type_col) == steps[i], F.lit(i)).otherwise(expr)
    return expr


def match_pattern(
    df: DataFrame,
    key: str,
    ts: str,
    steps: tuple[str, ...],
    within: str = "12 hours",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    contiguity: str = "relaxed",
) -> DataFrame:
    """Batch sequence-pattern match: emit ``(key, event_id, ts_ms)`` of
    every event completing the ``steps`` sequence.

    ``relaxed``: N-1 conditional running-max Window expressions share
    one (key, order) sort — level k's qualifier is "latest
    level-(k-1)-qualified timestamp within ``within``", evaluated over
    a ROWS frame ending 1 PRECEDING so a step never self-satisfies its
    predecessor.  ``strict``: one lag battery checks the N-1 immediately
    preceding events' types and pairwise gaps.  Either way Catalyst
    plans a single exchange + sort — the pattern length N changes only
    the projection, never the shuffle topology.
    """
    if len(steps) < 2:
        raise ValueError("a pattern needs at least 2 steps")
    step_us = int(pd.Timedelta(within).total_seconds() * 1_000_000)
    base = df.select(
        key,
        tiebreak,
        ts,
        type_col,
        F.unix_micros(ts).alias("_ord"),
        _rank_expr(type_col, steps).alias("_rank"),
    )
    if contiguity == "strict":
        w = Window.partitionBy(key).orderBy("_ord", tiebreak)
        cond = F.col(type_col) == steps[-1]
        prev_ord = F.col("_ord")
        for m in range(1, len(steps)):
            cond = cond & (F.lag(type_col, m).over(w) == steps[-1 - m])
            lagged = F.lag("_ord", m).over(w)
            cond = cond & (prev_ord - lagged <= step_us)
            prev_ord = lagged
        return base.withColumn("_m", cond).filter("_m").select(
            key, tiebreak, F.unix_millis(ts).alias("ts_ms")
        )
    if contiguity != "relaxed":
        raise ValueError(f"unknown contiguity: {contiguity}")
    w = (
        Window.partitionBy(key)
        .orderBy("_ord", "_rank", tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = base
    qual = F.col(type_col) == steps[0]
    for i in range(1, len(steps)):
        out = out.withColumn(
            f"_l{i - 1}", F.max(F.when(qual, F.col("_ord"))).over(w)
        )
        qual = (F.col(type_col) == steps[i]) & (
            F.col(f"_l{i - 1}") >= F.col("_ord") - step_us
        )
    return out.filter(qual).select(key, tiebreak, F.unix_millis(ts).alias("ts_ms"))


def _relaxed_scan(
    ord_us: np.ndarray,
    type_idx: list[np.ndarray],
    seeds: list[int | None],
    step_us: int,
) -> tuple[np.ndarray, list[int | None]]:
    """Vectorized relaxed-contiguity scan over one key's sorted batch:
    N-1 chained forward-fills, each the "latest qualified level-k
    timestamp" visible at every STRICTLY EARLIER position (shift(1))."""
    nan = np.nan
    ordf = ord_us.astype("float64")
    fills: list[float] = []
    qual = type_idx[0]
    new_seeds: list[int | None] = []
    hits = np.zeros(0, dtype="int64")
    for i in range(1, len(type_idx) + 1):
        seed = seeds[i - 1]
        filled = (
            pd.Series(np.where(qual, ordf, nan))
            .ffill()
            .fillna(nan if seed is None else float(seed))
            .to_numpy()
        )
        new_seeds.append(None if np.isnan(filled[-1]) else int(filled[-1]))
        prev = np.empty_like(filled)
        prev[0] = nan if seed is None else float(seed)
        prev[1:] = filled[:-1]
        if i == len(type_idx):
            break
        with np.errstate(invalid="ignore"):
            qual = type_idx[i] & (prev >= ordf - step_us)
        if i == len(type_idx) - 1:
            with np.errstate(invalid="ignore"):
                hits = np.flatnonzero(qual)
    return hits, new_seeds


def match_pattern_stream(
    df: DataFrame,
    key: str,
    ts: str,
    steps: tuple[str, ...],
    within: str = "12 hours",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    contiguity: str = "relaxed",
) -> DataFrame:
    """Streaming twin of :func:`match_pattern` (P1 ProcessFunction
    shape): per key, ``relaxed`` keeps N-1 last-qualified timestamps,
    ``strict`` the last N-1 raw events — O(1) state either way, which
    is what lets the pattern run over millions of keys with state in
    the executor state store.  Batch rows are sorted by (ts, rank,
    tiebreak) inside the handler, so out-of-order arrival WITHIN a
    micro-batch is handled; cross-batch order relies on the source's
    event-time alignment (same contract as every handler in
    :mod:`..streaming.stateful`)."""
    if len(steps) < 2:
        raise ValueError("a pattern needs at least 2 steps")
    step_us = int(pd.Timedelta(within).total_seconds() * 1_000_000)
    n = len(steps)
    out_schema = f"{key} long, {tiebreak} long, ts_ms long"
    rank = {}
    for i, s in enumerate(steps):
        rank.setdefault(s, i)

    def _prep(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf["_ord"] = pdf[ts].to_numpy().astype("datetime64[us]").astype("int64")
        pdf["_rank"] = pdf[type_col].map(rank).fillna(n)
        return pdf.sort_values(["_ord", "_rank", tiebreak], ignore_index=True)

    if contiguity == "relaxed":
        state_schema = ", ".join(f"l{i} long" for i in range(n - 1))

        def handle(
            k: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            seeds = list(state.get) if state.exists else [None] * (n - 1)
            pdf = _prep(pdfs)
            types = pdf[type_col].to_numpy()
            type_idx = [types == s for s in steps]
            hits, new_seeds = _relaxed_scan(
                pdf["_ord"].to_numpy(), type_idx, seeds + [None], step_us
            )
            state.update(tuple(new_seeds[: n - 1]))
            if len(hits):
                yield pd.DataFrame(
                    {
                        key: [k[0]] * len(hits),
                        tiebreak: pdf[tiebreak].to_numpy(dtype="int64")[hits],
                        "ts_ms": pdf["_ord"].to_numpy()[hits] // 1_000,
                    }
                )

    elif contiguity == "strict":
        state_schema = "tail string"

        def handle(
            k: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            tail = json.loads(state.get[0]) if state.exists else []
            pdf = _prep(pdfs)
            carry = len(tail)
            types = np.concatenate(
                [np.array([t for t, _ in tail], dtype=object), pdf[type_col].to_numpy()]
            )
            ords = np.concatenate(
                [np.array([o for _, o in tail], dtype="int64"),
                 pdf["_ord"].to_numpy()]
            )
            cond = types == steps[-1]
            for m in range(1, n):
                lag_t = np.roll(types, m)
                lag_o = np.roll(ords, m)
                lag_t[:m], lag_o[:m] = None, 0
                prev_o = np.roll(ords, m - 1) if m > 1 else ords
                ok = np.zeros(len(types), dtype=bool)
                ok[m:] = (lag_t[m:] == steps[-1 - m]) & (
                    prev_o[m:] - lag_o[m:] <= step_us
                )
                cond = cond & ok
            hits = np.flatnonzero(cond) - carry
            hits = hits[hits >= 0]  # only emit completions in THIS batch
            keep = [(str(t), int(o)) for t, o in zip(types, ords)][-(n - 1):]
            state.update((json.dumps(keep),))
            if len(hits):
                yield pd.DataFrame(
                    {
                        key: [k[0]] * len(hits),
                        tiebreak: pdf[tiebreak].to_numpy(dtype="int64")[hits],
                        "ts_ms": pdf["_ord"].to_numpy()[hits] // 1_000,
                    }
                )

    else:
        raise ValueError(f"unknown contiguity: {contiguity}")

    return df.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
