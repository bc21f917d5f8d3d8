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

import threading
from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []

# Guards _SHARED: registry ops can run from the ThreadingHTTPServer or a
# parallel harness; unguarded, two threads could double-persist one key
# or evict-and-unpersist a frame another thread just received.  Builds
# run OUTSIDE the lock (they trigger Spark jobs); the losing duplicate
# build is discarded unpersisted.
_SHARED_LOCK = threading.Lock()

# Keyed tier: frames SEVERAL registry queries derive from the same
# immutable input (the xxhash64 shingle frame over documents at one
# sf_dir feeds both op_ngram_jaccard and op_minhash_candidates).  Unlike
# scoped persists these survive the between-queries drain — re-deriving
# the corpus shingles per query was the single largest redundant
# computation in a bench/driver sweep.  Bounded LRU so a long session
# holds at most SHARED_MAX frames; keys must embed the applicationId so
# a frame never outlives its session.
_SHARED: "OrderedDict[str, DataFrame]" = OrderedDict()
SHARED_MAX = 4


def shared_persist(key: str, builder: Callable[[], DataFrame]) -> DataFrame:
    """Return the cached frame for `key`, building + persisting on first
    use.  Assumes the underlying input is immutable for the session
    (true for the testdata sf_dir contract); eviction only costs
    recomputation."""
    with _SHARED_LOCK:
        df = _SHARED.get(key)
        if df is not None:
            _SHARED.move_to_end(key)
            return df
    built = builder().persist()
    evicted: list[DataFrame] = []
    with _SHARED_LOCK:
        df = _SHARED.get(key)
        if df is not None:
            # another thread won the race — keep its frame, drop ours
            _SHARED.move_to_end(key)
            evicted.append(built)
        else:
            _SHARED[key] = df = built
            while len(_SHARED) > SHARED_MAX:
                _, old = _SHARED.popitem(last=False)
                evicted.append(old)
    for old in evicted:
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def release_shared() -> int:
    """Drop every keyed cache (end-of-sweep / harness drain)."""
    with _SHARED_LOCK:
        frames = list(_SHARED.values())
        _SHARED.clear()
    for df in frames:
        try:
            df.unpersist()
        except Exception:
            pass
    return len(frames)


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() + register for the next `release_scoped()` drain."""
    df = df.persist()
    _SCOPED.append(df)
    return df


def adopt_scoped(dfs: list[DataFrame]) -> None:
    """Register ALREADY-persisted frames (e.g. an Evaluator's
    shared-subtree caches) for the next `release_scoped()` drain without
    re-persisting them."""
    _SCOPED.extend(dfs)


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
