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

import json
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


@dataclass(frozen=True)
class CountEvictor:
    """At each fire, the window is evicted down to its last ``n``
    elements before aggregating (Flink ``CountEvictor`` / evictBefore:
    "every trigger, report the last n")."""

    n: int


@dataclass(frozen=True)
class TimeEvictor:
    """At each fire, only elements within ``window`` of the fire's
    event time aggregate (Flink ``TimeEvictor``)."""

    window: str


Evictor = CountEvictor | TimeEvictor


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
    evictor: Evictor | None = None,
) -> DataFrame:
    """Batch twin: emission points + emitted state via one
    window-function pass over (key) ordered by (ts, tiebreak).

    ``evictor`` (Flink evictBefore semantics) restricts every fire's
    aggregate to the retained suffix — the last ``n`` elements
    (:class:`CountEvictor`, a ROWS frame) or the last ``window`` of
    event time (:class:`TimeEvictor`, a RANGE frame over µs epochs).
    Evictors compose with non-purging triggers ("every 25 events,
    report the last 10" / "at every purchase, the last 6 hours");
    FIRE_AND_PURGE already restarts the window, so the combination is
    rejected rather than given ambiguous semantics."""
    if evictor is not None and trigger.purge:
        raise ValueError("evictor requires a non-purging trigger")
    if evictor is not None and not isinstance(evictor, (CountEvictor, TimeEvictor)):
        raise TypeError(f"unknown evictor type: {type(evictor).__name__}")
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
        "_v",
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
    if isinstance(evictor, CountEvictor):
        wn = w.rowsBetween(-(evictor.n - 1), Window.currentRow)
        b = b.withColumn("_es", F.sum("_v").over(wn)).withColumn(
            "_en", F.least(F.col("_rn"), F.lit(evictor.n)).cast("long")
        )
    elif isinstance(evictor, TimeEvictor):
        ev_us = _interval_us(evictor.window)
        wt = (
            Window.partitionBy("_k")
            .orderBy(F.unix_micros("_ts"))
            .rangeBetween(-ev_us, 0)
        )
        b = b.withColumn("_es", F.sum("_v").over(wt)).withColumn(
            "_en", F.count(F.lit(1)).over(wt)
        )
    if evictor is not None:
        return b.filter("_fire").select(
            F.col("_k").alias(key),
            F.col("_ts_ms").alias("fire_ts_ms"),
            F.col("_en").alias("n_in_window"),
            F.round("_es", 4).alias("win_sum"),
        )
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


def _load_buf(buf: str | None) -> tuple[np.ndarray, np.ndarray]:
    if not buf:
        return np.zeros(0, dtype="int64"), np.zeros(0, dtype="float64")
    o, v = json.loads(buf)
    return np.asarray(o, dtype="int64"), np.asarray(v, dtype="float64")


def _suffix_lo(
    ord_arr: np.ndarray, g: int, ev_n: int | None, ev_us: int | None
) -> int:
    """Start index of the evictor-retained suffix ending at ``g``."""
    if ev_n is not None:
        return max(0, g + 1 - ev_n)
    return int(np.searchsorted(ord_arr[: g + 1], ord_arr[g] - ev_us, side="left"))


def triggered_window_stream(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    trigger: Trigger,
    tiebreak: str = "event_id",
    evictor: Evictor | None = None,
) -> DataFrame:
    """Streaming twin: per-key state is (total_n, total_sum, purged_n,
    purged_sum, last_bucket, last_ts) — O(1) regardless of history.
    Predicate triggers are projected JVM-side before the stateful scan
    (same rule as :mod:`.cep`).

    With an ``evictor`` the state additionally carries the retained
    suffix — the last ``n`` (ord, value) pairs or the last ``window``
    of them — bounded by the EVICTOR horizon, not by history (the same
    contents Flink's evictable window keeps)."""
    is_pred = isinstance(trigger, PredicateTrigger)
    is_cnt = isinstance(trigger, CountTrigger)
    is_int = isinstance(trigger, EventTimeIntervalTrigger)
    if not (is_pred or is_cnt or is_int):
        raise TypeError(f"unknown trigger type: {type(trigger).__name__}")
    if evictor is not None and trigger.purge:
        raise ValueError("evictor requires a non-purging trigger")
    if evictor is not None and not isinstance(evictor, (CountEvictor, TimeEvictor)):
        raise TypeError(f"unknown evictor type: {type(evictor).__name__}")
    ev_n = evictor.n if isinstance(evictor, CountEvictor) else None
    ev_us = (
        _interval_us(evictor.window) if isinstance(evictor, TimeEvictor) else None
    )
    us = _interval_us(trigger.interval) if is_int else 0
    purge = trigger.purge
    out_schema = f"{key} long, fire_ts_ms long, n_in_window long, win_sum double"
    state_schema = "tn long, ts double, pn long, ps double, lb long, lt long, buf string"
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
        tn0, ts0, pn0, ps0, lb0, lt0, buf0 = (
            state.get if state.exists else (0, 0.0, 0, 0.0, None, None, None)
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
        elif is_pred:
            fire_idx = np.flatnonzero(pdf["_fire"].to_numpy(dtype=bool))
        else:
            bk = ord_us // us
            if lb0 is not None and len(bk) and bk[0] > lb0:
                # this batch's first element closes the carried bucket
                if evictor is None:
                    rows.append(
                        (int(lt0 // 1_000), int(tn0 - pn0), round(ts0 - ps0, 4))
                    )
                else:
                    b_ord, b_val = _load_buf(buf0)
                    lo = _suffix_lo(b_ord, len(b_ord) - 1, ev_n, ev_us)
                    rows.append(
                        (
                            int(lt0 // 1_000),
                            len(b_ord) - lo,
                            round(float(np.sum(b_val[lo:])), 4),
                        )
                    )
                if purge:
                    pn, ps = tn0, ts0
            fire_idx = np.flatnonzero(np.diff(bk) > 0)
            if len(bk):
                lb0, lt0 = int(bk[-1]), int(ord_us[-1])
        new_buf = buf0
        if evictor is None:
            got, pn, ps = _fire_points(
                t_n, t_s, ts_ms, fire_idx, purge, pn, ps
            )
            rows.extend(got)
        else:
            b_ord, b_val = _load_buf(buf0)
            carry = len(b_ord)
            all_ord = np.concatenate([b_ord, ord_us])
            all_val = np.concatenate([b_val, vals])
            cs = np.concatenate([[0.0], np.cumsum(all_val)])
            for i in fire_idx:
                g = carry + int(i)
                lo = _suffix_lo(all_ord, g, ev_n, ev_us)
                rows.append(
                    (
                        int(ts_ms[i]),
                        g + 1 - lo,
                        round(float(cs[g + 1] - cs[lo]), 4),
                    )
                )
            # retain only the evictor horizon relative to the newest
            # element — older rows can never aggregate again
            end = len(all_ord)
            lo = _suffix_lo(all_ord, end - 1, ev_n, ev_us) if end else 0
            new_buf = json.dumps(
                [all_ord[lo:].tolist(), all_val[lo:].tolist()]
            )
        state.update(
            (
                int(t_n[-1]) if len(t_n) else tn0,
                float(t_s[-1]) if len(t_s) else ts0,
                int(pn),
                float(ps),
                lb0,
                lt0,
                new_buf,
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
