"""State migration across a query restart — the savepoint-with-evolved-
state-schema recipe (``정리/2주차.md:185-194``, ``정리/5주차.md:150-168``).

Structured Streaming pins a stateful query's state layout at first
start: a checkpoint written with ``state_schema`` v1 cannot restart
with v2 (SURVEY §7.3.7's documented rejection).  Flink's answer is a
savepoint + state-migration; the Spark-first equivalent is
BOOTSTRAP-FROM-SNAPSHOT:

1. the v1 query maintains a queryable-state snapshot table (the P9
   pattern — :class:`..streaming.sinks.IdempotentKeyedUpsert`, or here
   simply its final update-mode emissions);
2. the v2 query starts with a FRESH checkpoint and an EVOLVED state
   layout, seeding each key's first-touch state from the v1 snapshot.

Seeds ship as a plain dict captured by the handler closure (cloudpickle
broadcasts it with the task — right for snapshots that fit executor
memory).  At larger scale the same recipe joins the snapshot table into
the stream's first micro-batch instead, or — where the RocksDB/protobuf
stack is available — hands the snapshot to
``transformWithStateInPandas(initialState=...)``, whose
``handleInitialState`` hook is the API-native form of this module.

The demo operator evolves K5's running max: v1 state ``(max_value)``
→ v2 state ``(max_value, n_events)`` — the carried field seeds from
the snapshot, the new field starts at its migration default.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def rolling_max_v2_bootstrapped(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    snapshot: dict[str, float],
) -> DataFrame:
    """The EVOLVED rolling-max query: state widens from ``(max_value)``
    to ``(max_value, n_events)``.  ``snapshot`` is the v1 query's
    queryable-state table as ``{key: max_value}``; a key's first touch
    under the new checkpoint seeds ``max_value`` from it (``n_events``
    — the new field — starts at 0, counting from the migration point).
    Emits ``(key, max_value, n_events)`` per micro-batch in which the
    max changed, like its v1 ancestor."""
    out_schema = f"{key} string, max_value double, n_events long"
    state_schema = "max_value double, n long"

    def handle(
        k: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur, n = state.get
        else:
            cur, n = snapshot.get(k[0]), 0  # ← migrated v1 state
        changed = False
        for pdf in pdfs:
            n += len(pdf)
            m = float(pdf[value].max())
            if cur is None or m > cur:
                cur, changed = m, True
        state.update((cur, n))
        if changed:
            yield pd.DataFrame(
                [(k[0], cur, n)], columns=[key, "max_value", "n_events"]
            )

    return df.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
