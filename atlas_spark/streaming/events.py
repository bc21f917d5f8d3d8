"""Streaming event matching — the atlas-lwc-events role.

The reference matches live event streams against subscription queries
and either forwards projected rows (`:table`) or periodically emits
per-group counts with sample payloads (`:sample`)
(`atlas-lwc-events/.../LwcEventClient.scala`, `EventExpr.scala:50-82`).

Spark-first mapping:

- `:table` is STATELESS — the same Query column + projection the batch
  path compiles (`sources/events.py`) applied to a `readStream` frame;
  matched rows flow with per-micro-batch latency, nothing accumulates.
- `:sample` needs per-interval aggregation — a watermarked tumbling
  window per sample group with `count(*)` + a deterministic `min_by`
  sample payload, the streaming twin of the batch rollup (late events
  beyond the watermark are dropped, mirroring TimeGrouped).

Both reuse `EventSource`'s field/query compilation verbatim, so a
subscription behaves identically whether replayed in batch or matched
live.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..model import expr as E
from ..sources.events import EventSource


def table_stream(stream: DataFrame, e: E.EventTableExpr) -> DataFrame:
    """`q,(,cols,),:table` over a streaming event frame: filter +
    projection, append mode, no state."""
    src = EventSource.from_df(stream)
    matched = src.df.filter(src.query_col(e.query))
    cols = [
        (src.field(c) if c == "value" else src.field_str(c)).alias(
            c.replace(".", "_")
        )
        for c in e.cols
    ]
    return matched.select(*cols)


def sample_stream(
    stream: DataFrame,
    e: E.EventSampleExpr,
    step: int,
    num_buffers: int = 2,
) -> DataFrame:
    """`q,(,by,),(,proj,),:sample` over a streaming event frame: one
    watermarked tumbling-window aggregate per (sample group, interval).

    Output schema: (t, by..., n_events, sample) — one row per finalized
    interval per group, exactly the batch `sample()` computed over that
    interval's rows."""
    src = EventSource.from_df(stream)
    matched = src.df.filter(src.query_col(e.query))
    by_names = [b.replace(".", "_") for b in e.by]
    by_cols = [src.field_str(b).alias(n) for b, n in zip(e.by, by_names)]
    proj = F.to_json(
        F.struct(*[src.field_str(p).alias(p.replace(".", "_")) for p in e.proj])
    )
    watermark = f"{num_buffers * step} seconds"
    return (
        matched.select(
            "ts", *by_cols, F.col("event_id"), proj.alias("_proj")
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{step} seconds").alias("w"), *by_names)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min_by("_proj", "event_id").alias("sample"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("t"),
            *by_names,
            "n_events",
            "sample",
        )
    )
