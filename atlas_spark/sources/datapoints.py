"""Datapoint sources.

Canonical datapoint relation (SURVEY §1.4): one row per (series, step) with

    <one string column per tag key> , t (long, epoch seconds, step aligned),
    value (double)

Tag keys are *promoted* to top-level string columns so Catalyst can push
predicates down to the parquet scan — the Spark-native replacement for the
reference's inverted tag index (`RoaringTagIndex.scala`): partition/file
pruning + min-max stats do the index's job at scale.  A generic
`tags: map<string,string>` column is supported by the query compiler as a
fallback for open-schema sources, but the hot path is promoted columns.

Ingest normalization (reference `norm/NormalizationCache.scala`): multiple
raw datapoints landing in the same (series, step) cell are consolidated at
ingest.  This source uses rate-style SUM rollup.

`DatapointSource.sql_cte` is the equivalent DuckDB relation used by the
oracle SQL generator so both engines see identical inputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DEFAULT_STEP = 3600  # seconds; events testdata spans 30 days -> 720 steps


def sanitize(key: str) -> str:
    """Tag key -> safe column name (e.g. ``nf.cluster`` -> ``k_nf_cluster``)."""
    import re

    return "k_" + re.sub(r"[^A-Za-z0-9_]", "_", key)


@dataclass
class DatapointSource:
    df: DataFrame
    step: int
    colmap: dict[str, str]  # tag key -> column name in df
    sql_cte: str  # DuckDB SQL producing the same relation (same col names)

    @property
    def tag_keys(self) -> tuple[str, ...]:
        return tuple(self.colmap)

    def tag_col(self, key: str) -> F.Column | None:
        c = self.colmap.get(key)
        return F.col(c) if c is not None else None


def events_datapoints(spark: SparkSession, sf_dir: str, step: int = DEFAULT_STEP) -> DatapointSource:
    """Datapoint view over the driver `events` table.

    Series identity: tags ``name`` (= event_type) and ``bucket``
    (= "u" + user_id % 8).  Value: SUM of event values in the step cell.

    `ts` is read as epoch-nanos long (spark.sql.legacy.parquet.nanosAsLong)
    so the step bucketing is exact integer arithmetic, bit-identical to the
    DuckDB oracle's ``floor(epoch(ts))`` path.
    """
    from ..session import configure_existing

    configure_existing(spark)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ns = 1_000_000_000
    dp = (
        ev.select(
            F.col("event_type").alias("k_name"),
            F.concat(F.lit("u"), (F.col("user_id") % 8).cast("string")).alias("k_bucket"),
            # exact integer arithmetic on epoch-nanos (no double rounding)
            F.expr(f"ts div {ns} div {step} * {step}").alias("t"),
            F.col("value"),
        )
        .groupBy("k_name", "k_bucket", "t")
        .agg(F.sum("value").alias("value"))
    )
    cte = f"""
  SELECT event_type AS k_name,
         'u' || CAST(user_id % 8 AS VARCHAR) AS k_bucket,
         (epoch_ns(ts) // 1000000000 // {step}) * {step} AS t,
         sum(value) AS value
  FROM events
  GROUP BY 1, 2, 3
"""
    return DatapointSource(
        df=dp,
        step=step,
        colmap={"name": "k_name", "bucket": "k_bucket"},
        sql_cte=cte,
    )


# Eval window covering the events testdata (2024-01-01 .. 2024-01-31 UTC).
EVENTS_START = 1704067200
EVENTS_END = EVENTS_START + 30 * 86400
