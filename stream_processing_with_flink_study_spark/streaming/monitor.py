"""Idle-source detection (SURVEY §2.1 S7, the operational half).

Flink lets a source ``markAsTemporarilyIdle`` so an empty partition
stops pinning the global watermark (``정리/2주차.md:114-122``,
``정리/6주차.md:237-243``).  Spark has no per-partition watermark
control — ``multipleWatermarkPolicy`` is the single global knob (the
documented semantic gap, SURVEY §7.3.3) — so the closable half is
OPERATIONAL: detect that a source has gone idle and surface it, so an
operator can fix the feed or restart the query with a different
policy.

:class:`IdleSourceMonitor` is a ``StreamingQueryListener`` that walks
every trigger's per-source progress: a source whose end offset does not
advance for ``n_triggers`` consecutive triggers (with zero input rows)
is flagged.  When the query also carries an
:func:`observe_max_event_time` observation, the flag records the last
observed max event time — the value the stalled watermark is frozen
at — which is exactly the report Flink's idleness marker would have
acted on.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "idle_monitor"


def observe_max_event_time(
    sdf: DataFrame, ts_col: str, name: str = OBSERVATION_NAME
) -> DataFrame:
    """Attach an ``observe()`` observation carrying the trigger's max
    event time and row count — exact values computed inline with the
    query (no second scan), delivered to every listener through
    ``progress.observedMetrics[name]``.  The monitor stamps them onto
    its idle flags."""
    return sdf.observe(
        name,
        F.max(F.col(ts_col)).alias("max_event_time"),
        F.count(F.lit(1)).alias("rows"),
    )


class IdleSourceMonitor(StreamingQueryListener):
    """Flags sources whose offsets stop advancing for ``n_triggers``
    consecutive triggers.

    ``flags`` accumulates one record per (query, source) transition
    into the idle state: ``{"query_id", "source", "idle_triggers",
    "last_end_offset", "observed_max_event_time"}``.
    ``idle_sources(query_id)`` returns the sources currently idle.
    Listener callbacks run on the engine's event thread — state
    mutation is append/replace-only on plain dicts (the GIL makes each
    update atomic; readers only ever see a consistent snapshot).
    """

    def __init__(self, n_triggers: int = 3):
        super().__init__()
        self.n_triggers = n_triggers
        self._streak: dict[tuple[str, int], int] = {}
        self._last_offset: dict[tuple[str, int], Any] = {}
        self._desc: dict[tuple[str, int], str] = {}
        self._flagged: set[tuple[str, int]] = set()
        self.flags: list[dict[str, Any]] = []

    # -- listener surface ---------------------------------------------------
    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        obs = None
        metrics = p.observedMetrics or {}
        if OBSERVATION_NAME in metrics:
            row = metrics[OBSERVATION_NAME]
            obs = row["max_event_time"] if "max_event_time" in row else None
        qid = str(p.id)
        for i, s in enumerate(p.sources):
            key = (qid, i)
            self._desc[key] = s.description
            advanced = (
                key not in self._last_offset
                or s.endOffset != self._last_offset[key]
                or (s.numInputRows or 0) > 0
            )
            self._last_offset[key] = s.endOffset
            if advanced:
                self._streak[key] = 0
                self._flagged.discard(key)
                continue
            self._streak[key] = self._streak.get(key, 0) + 1
            if self._streak[key] >= self.n_triggers and key not in self._flagged:
                self._flagged.add(key)
                self.flags.append(
                    {
                        "query_id": qid,
                        "source": s.description,
                        "idle_triggers": self._streak[key],
                        "last_end_offset": s.endOffset,
                        "observed_max_event_time": obs,
                    }
                )

    # -- operator surface ---------------------------------------------------
    def idle_sources(self, query_id: str | None = None) -> list[str]:
        """Source descriptions currently in the idle state (optionally
        restricted to one query)."""
        return [
            self._desc[k]
            for k in sorted(self._flagged)
            if query_id is None or k[0] == str(query_id)
        ]


def state_store_metrics(query) -> list[dict[str, Any]]:
    """State-size observability for a running (or just-finished)
    streaming query — the operational companion to Flink's state-backend
    metrics (``정리/5주차.md``'s state-size concerns): one record per
    stateful operator from the query's last progress, with the fields an
    operator watches for unbounded-state bugs:

    - ``rows_total`` / ``rows_updated`` — state cardinality and churn;
      total growing linearly across triggers while updates stay flat is
      the classic missing-TTL signature;
    - ``memory_used_bytes`` — provider-reported resident state;
    - ``commit_ms`` — state-store commit latency (checkpoint pressure).

    Pure read of ``lastProgress`` — no listener required, works after
    ``Trigger.AvailableNow`` runs where Python listeners receive no
    progress events (see :class:`IdleSourceMonitor`)."""
    p = query.lastProgress
    if not p:
        return []
    out = []
    for op in p.get("stateOperators", []) or []:
        out.append(
            {
                "operator": op.get("operatorName"),
                "rows_total": op.get("numRowsTotal"),
                "rows_updated": op.get("numRowsUpdated"),
                "memory_used_bytes": op.get("memoryUsedBytes"),
                "commit_ms": op.get("commitTimeMs"),
            }
        )
    return out
