"""W6 — generic Trigger API over the global window
(``정리/4주차.md:286-311``: Flink ``Trigger`` returns CONTINUE / FIRE /
PURGE / FIRE_AND_PURGE; evictor-free form).

All of a key's events form one global window; a trigger decides the
emission points and whether window state resets after each emission:

- :class:`CountTrigger` — FIRE after every ``n`` elements,
- :class:`PredicateTrigger` — FIRE at each element satisfying an
  arbitrary SQL predicate (Flink's delta/custom trigger shape),
- :class:`EventTimeIntervalTrigger` — FIRE when event time crosses an
  interval boundary (ContinuousEventTimeTrigger: timers on an
  epoch-aligned grid; the emission binds to the last element before
  the boundary, and the final partial bucket never fires — a stream
  cannot know it ended, and the batch twin matches that exactly).

``purge=False`` is FIRE (running aggregate keeps growing);
``purge=True`` is FIRE_AND_PURGE (the window restarts after each
emission — CountTrigger+purge is Flink's count window,
EventTimeIntervalTrigger+purge a tumbling event-time window; both fall
out of ONE parameterized operator here).

Both forms emit ``(key, fire_ts_ms, n_in_window, win_sum)``:

- :func:`triggered_window` — batch twin: one window-function pass
  (single exchange + per-key sort; the trigger changes projections,
  never the shuffle topology — same design rule as :mod:`.cep`).
- :func:`triggered_window_stream` — streaming twin over
  ``applyInPandasWithState`` with O(1) state per key (running totals +
  totals-at-last-purge + the interval trigger's last bucket), so state
  never scales with history.

Aggregation surface is sum+count (the book's running-aggregate
examples); richer aggregates compose by pre-projecting ``value``.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


@dataclass(frozen=True)
class CountTrigger:
    """FIRE every ``n`` elements (since last purge)."""

    n: int
    purge: bool = False


@dataclass(frozen=True)
class PredicateTrigger:
    """FIRE at each element satisfying the SQL boolean ``predicate``."""

    predicate: str
    purge: bool = False


@dataclass(frozen=True)
class EventTimeIntervalTrigger:
    """FIRE when event time enters a new epoch-aligned ``interval``
    bucket; see the module docstring for boundary semantics."""

    interval: str
    purge: bool = False


Trigger = CountTrigger | PredicateTrigger | EventTimeIntervalTrigger


def _interval_us(interval: str) -> int:
    us = int(pd.Timedelta(interval).total_seconds() * 1_000_000)
    if us <= 0:
        raise ValueError(f"interval must be positive: {interval!r}")
    return us


def triggered_window(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    trigger: Trigger,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Batch twin: emission points + emitted state via one
    window-function pass over (key) ordered by (ts, tiebreak)."""
    if isinstance(trigger, PredicateTrigger):
        fire = F.coalesce(F.expr(trigger.predicate), F.lit(False))
    else:
        fire = F.lit(False)  # placeholder, replaced below
    b = df.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.col(value).alias("_v"),
        fire.alias("_fire"),
    )
    w = Window.partitionBy("_k").orderBy("_ts", "_tb")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b = b.select(
        "_k",
        "_ts",
        "_tb",
        "_fire",
        F.unix_millis("_ts").alias("_ts_ms"),
        F.row_number().over(w).alias("_rn"),
        F.sum("_v").over(run).alias("_rs"),
    )
    if isinstance(trigger, CountTrigger):
        b = b.withColumn("_fire", F.col("_rn") % trigger.n == 0)
    elif isinstance(trigger, EventTimeIntervalTrigger):
        us = _interval_us(trigger.interval)
        # integer division — a double quotient can floor wrong exactly
        # on a bucket boundary (the streaming twin uses int64 //)
        b = b.withColumn("_bk", F.expr(f"unix_micros(_ts) div {us}"))
        nxt = F.lead("_bk").over(w)
        b = b.withColumn("_fire", nxt.isNotNull() & (nxt > F.col("_bk")))
    elif not isinstance(trigger, PredicateTrigger):
        raise TypeError(f"unknown trigger type: {type(trigger).__name__}")
    if trigger.purge:
        # totals at the previous fire = the purge floor; strictly-
        # earlier frame so a fire row never floors itself
        prev = w.rowsBetween(Window.unboundedPreceding, -1)
        b = b.withColumn(
            "_prs",
            F.coalesce(
                F.max(F.when(F.col("_fire"), F.col("_rs"))).over(prev),
                F.lit(0.0),
            ),
        ).withColumn(
            "_prn",
            F.coalesce(
                F.max(F.when(F.col("_fire"), F.col("_rn"))).over(prev),
                F.lit(0),
            ),
        )
    else:
        b = b.withColumn("_prs", F.lit(0.0)).withColumn("_prn", F.lit(0))
    return b.filter("_fire").select(
        F.col("_k").alias(key),
        F.col("_ts_ms").alias("fire_ts_ms"),
        (F.col("_rn") - F.col("_prn")).cast("long").alias("n_in_window"),
        F.round(F.col("_rs") - F.col("_prs"), 4).alias("win_sum"),
    )


def _fire_points(
    t_n: np.ndarray,
    t_s: np.ndarray,
    ts_ms: np.ndarray,
    fire_idx: np.ndarray,
    purge: bool,
    purged_n: int,
    purged_sum: float,
) -> tuple[list[tuple[int, int, float]], int, float]:
    """Shared emission math: given running totals (cumulative count and
    sum INCLUDING carried state) and fire indices, build
    (fire_ts_ms, n_in_window, win_sum) rows and the new purge floor."""
    rows: list[tuple[int, int, float]] = []
    pn, ps = purged_n, purged_sum
    for i in fire_idx:
        rows.append(
            (int(ts_ms[i]), int(t_n[i] - pn), round(float(t_s[i] - ps), 4))
        )
        if purge:
            pn, ps = int(t_n[i]), float(t_s[i])
    return rows, pn, ps


def triggered_window_stream(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    trigger: Trigger,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Streaming twin: per-key state is (total_n, total_sum, purged_n,
    purged_sum, last_bucket, last_ts) — O(1) regardless of history.
    Predicate triggers are projected JVM-side before the stateful scan
    (same rule as :mod:`.cep`)."""
    is_pred = isinstance(trigger, PredicateTrigger)
    is_cnt = isinstance(trigger, CountTrigger)
    is_int = isinstance(trigger, EventTimeIntervalTrigger)
    if not (is_pred or is_cnt or is_int):
        raise TypeError(f"unknown trigger type: {type(trigger).__name__}")
    us = _interval_us(trigger.interval) if is_int else 0
    purge = trigger.purge
    out_schema = f"{key} long, fire_ts_ms long, n_in_window long, win_sum double"
    state_schema = "tn long, ts double, pn long, ps double, lb long, lt long"
    prepared = df.withColumn(
        "_fire",
        F.coalesce(F.expr(trigger.predicate), F.lit(False))
        if is_pred
        else F.lit(False),
    )

    def handle(
        k: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        tn0, ts0, pn0, ps0, lb0, lt0 = (
            state.get if state.exists else (0, 0.0, 0, 0.0, None, None)
        )
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf["_ord"] = pdf[ts].to_numpy().astype("datetime64[us]").astype("int64")
        pdf = pdf.sort_values(["_ord", tiebreak], ignore_index=True)
        vals = pdf[value].to_numpy(dtype="float64")
        ord_us = pdf["_ord"].to_numpy()
        ts_ms = ord_us // 1_000
        t_n = tn0 + np.arange(1, len(vals) + 1, dtype="int64")
        t_s = ts0 + np.cumsum(vals)
        rows: list[tuple[int, int, float]] = []
        pn, ps = pn0, ps0
        if is_cnt:
            fire_idx = np.flatnonzero((t_n - pn0) % trigger.n == 0)
            rows, pn, ps = _fire_points(t_n, t_s, ts_ms, fire_idx, purge, pn0, ps0)
        elif is_pred:
            fire_idx = np.flatnonzero(pdf["_fire"].to_numpy(dtype=bool))
            rows, pn, ps = _fire_points(t_n, t_s, ts_ms, fire_idx, purge, pn0, ps0)
        else:
            bk = ord_us // us
            if lb0 is not None and len(bk) and bk[0] > lb0:
                # this batch's first element closes the carried bucket
                rows.append(
                    (int(lt0 // 1_000), int(tn0 - pn0), round(ts0 - ps0, 4))
                )
                if purge:
                    pn, ps = tn0, ts0
            fire_idx = np.flatnonzero(np.diff(bk) > 0)
            got, pn, ps = _fire_points(t_n, t_s, ts_ms, fire_idx, purge, pn, ps)
            rows.extend(got)
            if len(bk):
                lb0, lt0 = int(bk[-1]), int(ord_us[-1])
        state.update(
            (
                int(t_n[-1]) if len(t_n) else tn0,
                float(t_s[-1]) if len(t_s) else ts0,
                int(pn),
                float(ps),
                lb0,
                lt0,
            )
        )
        if rows:
            yield pd.DataFrame(
                [(k[0], *r) for r in rows],
                columns=[key, "fire_ts_ms", "n_in_window", "win_sum"],
            )

    return prepared.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
