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


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Memoized `spark.read.parquet(path)` for session-immutable inputs."""
    key = (spark.sparkContext.applicationId, path)
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
