"""Custom stateful streaming operators via applyInPandasWithState.

Where built-in windowed aggregation can't express the semantics —
running lifetime counters, cross-batch exact dedup — the state-store
API holds per-key state across micro-batches. State size is the scale
constraint: keep per-key state O(1) (counters, sketches), never O(rows)
(the exact-dedup variant bounds its seen-set per key and is marked
accordingly).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_running(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Lifetime per-user counters, one updated row per user per
    micro-batch. O(1) state per key — the shape that scales to any
    stream length."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_SCHEMA = "user_id long, event_id long, value double"
DEDUP_STATE_SCHEMA = "seen array<long>"


def _update_dedup(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (seen,) = state.get if state.exists else ([],)
    seen_set = set(seen)
    out = []
    for pdf in pdfs:
        for eid, val in zip(pdf["event_id"], pdf["value"]):
            if int(eid) not in seen_set:
                seen_set.add(int(eid))
                out.append((key[0], int(eid), float(val)))
    state.update((sorted(seen_set),))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "value"])


def stream_dedup(events: DataFrame) -> DataFrame:
    """Cross-batch exact dedup by (user_id, event_id): emits each event
    id at most once across the whole stream.

    State is O(ids per key) — fine for bounded id spaces / keyed
    sessions; at open-ended 100 TB scale swap the seen-list for a Bloom
    filter or rely on watermarked dropDuplicates instead.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_dedup,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
