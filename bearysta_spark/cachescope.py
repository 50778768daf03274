"""Scoped lifetime for the caches query helpers pin.

Several operators cache a mid-plan frame that is BOTH materialized
in-helper (a measured count for a broadcast gate) and referenced more
than once by the returned plan — the shingle table in the LSH verify,
BM25's per-doc norms, the HLL register frame. `.cache()` alone leaks:
Spark's CacheManager keeps the entry until someone unpersists it, so a
long-lived multi-query session accumulates pinned storage (r05 VERDICT
finding #3).

The fix is an explicit scope: library code registers every cache it
creates via ``scoped_cache`` and the registered query wrappers
(queries._finalize) release the whole scope after the query's terminal
action. Contract: a registered query is a ONE-SHOT report — its helper
returns a materialized result and leaves no pinned block behind
(asserted by tests/test_plans.py against getPersistentRDDs). Library
functions called directly still cache lazily for plan-reuse speed;
callers embedding them in a long-lived session call
``release_scoped_caches()`` themselves after their terminal action.

The registry is process-local and append-only between releases — the
same shape as Spark's own CleanerListener queues, without relying on
GC timing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """`.cache()` plus registration for scope-end release."""
    df = df.cache()
    _SCOPED.append(df)
    return df


def release_scoped_caches() -> int:
    """Unpersist every scope-registered cache; returns how many."""
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n
