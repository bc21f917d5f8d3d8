"""Memoized parquet relation handles for the immutable test tables.

`spark.read.parquet(path)` performs schema inference on EVERY call — the
JVM lists the path and reads parquet footers before returning, ~70 ms
even for a single local file.  Query builders call it once per build, and
the bench/driver rebuild every query per pass, so the same footer was
being re-read dozens of times per sweep (measured 1.9 s of a 9.1 s
build-phase total, r16 profile).

The returned DataFrame is an immutable lazy relation: one handle per
(session, path) serves every build, and caching it caches NO data — every
action still scans the parquet files.  Keyed by applicationId so a handle
never outlives its session.  Only the static testdata tables go through
here; paths written during a run (stream spools, bronze/silver tables,
staged shingles) must keep calling `spark.read.parquet` directly because
their contents change between reads.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.Lock()
_RELATIONS: dict[tuple[str, str], DataFrame] = {}
_MAX = 32  # a handful of tables x a few sf_dirs; plain FIFO bound


def app_id(spark: SparkSession) -> str:
    """`spark.sparkContext.applicationId` without the per-call py4j round
    trip: the id is fixed for the lifetime of the session object, so pin
    it on the Python wrapper after the first lookup."""
    aid = getattr(spark, "_atlas_app_id", None)
    if aid is None:
        aid = spark.sparkContext.applicationId
        spark._atlas_app_id = aid
    return aid


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Memoized `spark.read.parquet(path)` for session-immutable inputs."""
    key = (app_id(spark), path)
    with _LOCK:
        df = _RELATIONS.get(key)
    if df is not None:
        return df
    df = spark.read.parquet(path)
    with _LOCK:
        if len(_RELATIONS) >= _MAX:
            _RELATIONS.pop(next(iter(_RELATIONS)))
        _RELATIONS[key] = df
    return df


_PLANS: dict[tuple, object] = {}
_MAX_PLANS = 256


def memo_plan(spark: SparkSession, key: tuple, build):
    """Memoized immutable LAZY value (a DataFrame plan handle, a
    DatapointSource of plan handles, ...) keyed by session + caller key.

    Same safety argument as `read_parquet`: the memoized object is pure
    plan, never materialized data — every action on it still computes
    from the parquet inputs.  It only removes the py4j round-trips of
    re-constructing an identical expression tree on every query build.
    Callers must only memoize plans over session-immutable inputs."""
    k = (app_id(spark),) + key
    with _LOCK:
        v = _PLANS.get(k)
    if v is not None:
        return v
    v = build()
    with _LOCK:
        if len(_PLANS) >= _MAX_PLANS:
            _PLANS.pop(next(iter(_PLANS)))
        _PLANS[k] = v
    return v


def memo_get(spark: SparkSession, key: tuple):
    """Conditional-memo lookup half of `memo_plan` (for callers that must
    decide AFTER building whether the plan is safe to share)."""
    k = (app_id(spark),) + key
    with _LOCK:
        return _PLANS.get(k)


def memo_put(spark: SparkSession, key: tuple, v) -> None:
    k = (app_id(spark),) + key
    with _LOCK:
        if len(_PLANS) >= _MAX_PLANS:
            _PLANS.pop(next(iter(_PLANS)))
        _PLANS[k] = v


def memo_factory(fn):
    """Decorator form of `memo_plan` for `(spark, sf_dir, *hashable)`
    plan factories over the immutable testdata (datapoint sources, LSH
    pipelines): one plan handle per (session, factory, args).  The
    factory must return pure lazy plans — every action on the memoized
    result still computes from the parquet inputs."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str, *args, **kwargs):
        key = ("factory", fn.__name__, sf_dir, args, tuple(sorted(kwargs.items())))
        return memo_plan(spark, key, lambda: fn(spark, sf_dir, *args, **kwargs))

    return wrapper
