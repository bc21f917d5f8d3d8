"""Scoped persist registry — deterministic release of shared-computation
caches.

Some operators persist an intermediate frame consumed by several branches
of ONE query plan (e.g. the shingle frame feeding both LSH candidate
generation and the two verify joins).  Those persists are pure caches:
evicting them at any time only costs recomputation, never correctness
(correctness-load-bearing persists — like the deciles pid-consistency
slice — are instead materialized eagerly and unpersisted before return).

Left alone, each invocation in a long-lived session would accumulate
cached blocks until LRU eviction.  `scoped_persist` registers the frame
so the query registry releases every PRIOR query's caches when the next
query is built (`release_scoped`) — at most one registry query's caches
are ever live, and a harness can drain storage completely at the end of
a sweep (tests assert `getRDDStorageInfo` is empty afterwards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register for the next `release_scoped()` drain."""
    df = df.persist()
    _SCOPED.append(df)
    return df


def release_scoped() -> int:
    """Unpersist every scoped cache (non-blocking); returns the count."""
    n = len(_SCOPED)
    for df in _SCOPED:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
    _SCOPED.clear()
    return n
