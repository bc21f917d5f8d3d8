"""Publish-path bronze sink: payload stream -> partitioned parquet.

Closes the storage leg of the publish API (SURVEY §2.8): the reference
ingests validated datapoints into its memory/block store
(`atlas-webapi/.../PublishApi.scala:1-147` feeding the in-memory
database); here the durable landing zone is a date-partitioned parquet
table written by Structured Streaming with exactly-once file commits
(checkpointed sink), which the batch sources then scan with partition
pruning + predicate pushdown.

Layout (per row): `tags` map, promoted `name` column, step-aligned
epoch-second `t`, `value`, and a `date` partition column derived from
`t` in UTC.  Promoting `name` keeps the most selective predicate a
plain column filter at scan time (same decision as the batch layout,
`sources/layout.py`); the date partitioning makes time-ranged queries
prune whole directories before any file is opened — at 100 TB the scan
set is bounded by the query's time window, not the table's history.

Rejected rows (validation chain, `validation.rejection_reason`) land in
the same table under the `status=rejected` partition with their reason,
so ingest quality is queryable instead of silently dropped — and the
whole pipeline is ONE streaming query: a two-sink design (data +
rejects as separate queries) was measured decoding and validating every
payload twice, which at 100 TB doubles the ingest CPU for nothing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..session import configure_existing
from .norm import decode_publish_payloads
from .validation import rejection_reason


def _decode_payloads(df: DataFrame, payload_col: str, fmt: str) -> DataFrame:
    """Wire-format dispatch (the content-type routing of
    CustomDirectives.scala:74-108 / PublishPayloads.scala): json and the
    compact batch decode JVM-side; smile (binary) decodes in an
    Arrow-batched mapInPandas — the opaque-codec case."""
    if fmt == "json":
        return decode_publish_payloads(df, payload_col, drop_undecodable=False)
    if fmt == "compact":
        from .norm import decode_compact_batch_payloads

        return decode_compact_batch_payloads(df, payload_col, drop_undecodable=False)
    if fmt == "smile":
        from .smile import decode_smile_payloads

        return decode_smile_payloads(df, payload_col)
    raise ValueError(f"unknown publish payload format {fmt!r}")


def bronze_rows(
    df: DataFrame,
    payload_col: str = "payload",
    step: int = 60,
    fmt: str = "json",
    extra_rules=(),
) -> DataFrame:
    """Bronze rows (valid and rejected, discriminated by `status`) from a
    payload frame/stream.

    Pure projections end to end (`from_json` + explode + map ops), so the
    same function serves batch backfill and the live stream.  Timestamps
    arrive in epoch millis (publish API); `t` is floored to the step so
    the bronze table is directly scannable by the datapoint sources.
    Decode and validation run ONCE per row; the keep/reject split is a
    partition column, not a second pipeline.  `fmt` picks the wire codec
    (json | compact | smile); every format lands through the SAME
    rejection chain and table layout.
    """
    decoded = _decode_payloads(df, payload_col, fmt)
    # Rejection precedence: shape first (a payload that failed to parse or
    # lacks timestamp/value can never be stored, whatever its tags say),
    # then the tag-validation chain.  Without the shape checks such rows
    # would land in status=ok with a null t — unscannable yet unreported,
    # breaking the "ingest quality is queryable" contract.
    rejection = F.coalesce(
        F.when(
            F.col("timestamp").isNull() & F.col("value").isNull() & (F.size("tags") == 0),
            F.lit("undecodable or empty payload"),
        ),
        F.when(
            F.col("timestamp").isNull() | F.col("value").isNull(),
            F.lit("missing timestamp or value"),
        ),
        rejection_reason(F.col("tags"), extra_rules),
    )
    checked = decoded.withColumn("rejection", rejection)
    t = (F.floor(F.col("timestamp") / (1000 * step)) * step).cast("long")
    return checked.select(
        F.col("tags"),
        F.col("tags")["name"].alias("name"),
        t.alias("t"),
        F.col("value"),
        F.col("rejection"),
        F.when(F.col("rejection").isNull(), F.lit("ok"))
        .otherwise(F.lit("rejected"))
        .alias("status"),
        F.to_date(F.timestamp_seconds(t)).alias("date"),
    )


def publish_to_bronze(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    payload_col: str = "payload",
    step: int = 60,
    fmt: str = "json",
    extra_rules=(),
):
    """Start the bronze sink for a payload stream; returns the
    StreamingQuery handle.

    A single parquet file sink partitioned by (status, date): commits
    are atomic per micro-batch against the checkpoint log, so replays
    after failure never double-write a batch (the exactly-once story the
    reference gets from its in-memory overwrite semantics), valid rows
    and rejects separate at the DIRECTORY level (readers of either side
    prune the other entirely), and each payload is decoded and validated
    exactly once.
    """
    configure_existing(stream_df.sparkSession)
    rows = bronze_rows(stream_df, payload_col, step, fmt, extra_rules)
    return (
        rows.writeStream.format("parquet")
        .option("path", f"{path}/data")
        .option("checkpointLocation", f"{checkpoint}/data")
        .partitionBy("status", "date")
        .outputMode("append")
        .queryName("bronze_data")
        .start()
    )


def bronze_datapoints(spark, path: str, step: int = 60, tag_keys=("name", "app")):
    """DatapointSource over a bronze table written by `publish_to_bronze`
    — the read side of the publish->store->query loop.

    `name` is the promoted column; other tag keys project out of the
    `tags` map at scan time.  The ranged scan applies the static
    `status=ok` and date-partition bounds (directory pruning — literals,
    so rejected rows and out-of-window dates never open a file) and the
    `t` range (row-group stats): a time-windowed graph query over years
    of bronze history opens only the files its window touches.
    """
    from ..sources.datapoints import DatapointSource, date_t_range, sanitize

    configure_existing(spark)
    df = spark.read.parquet(f"{path}/data").filter(F.col("status") == "ok")
    kcols = {k: sanitize(k) for k in tag_keys}

    def project(d):
        cols = [
            (F.col("name") if k == "name" else F.col("tags")[k]).alias(c)
            for k, c in kcols.items()
        ]
        return d.select(
            *cols,
            ((F.col("t") / step).cast("long") * step).alias("t"),
            F.col("value"),
        )

    def build(d):
        return (
            project(d)
            .groupBy(*kcols.values(), "t")
            .agg(F.sum("value").alias("value"))
        )

    def _range(lo: int, hi: int):
        return date_t_range(df, lo, hi)

    return DatapointSource(
        df=build(df),
        step=step,
        colmap=dict(zip(tag_keys, kcols.values())),
        sql_cte="",
        ranged=lambda lo, hi: build(_range(lo, hi)),
        raw_ranged=lambda lo, hi: project(_range(lo, hi)),
    )


def publish_eval_stream(
    stream_df: DataFrame,
    asl: str,
    step: int = 60,
    tag_keys=("name", "app"),
    payload_col: str = "payload",
    num_buffers: int = 2,
):
    """Live ASL evaluation directly over a publish payload stream — the
    lwcapi role end-to-end: payloads decode and validate in-stream (one
    pass, rejects dropped), then feed the StreamingEvaluator, which runs
    the expression through the executor state store.

    Returns (evaluator, query_handle); results accumulate on
    ``evaluator.results`` exactly as for any other datapoint stream.
    """
    from ..sources.datapoints import sanitize
    from .evaluator import StreamingEvaluator

    configure_existing(stream_df.sparkSession)
    rows = bronze_rows(stream_df, payload_col, step).filter(
        F.col("status") == "ok"
    )
    kcols = {k: sanitize(k) for k in tag_keys}
    dp = rows.select(
        *[
            (F.col("name") if k == "name" else F.col("tags")[k]).alias(c)
            for k, c in kcols.items()
        ],
        F.timestamp_seconds(F.col("t")).alias("ts"),
        "value",
    )
    sev = StreamingEvaluator(
        stream_df.sparkSession, asl, step, dict(zip(tag_keys, kcols.values())),
        num_buffers=num_buffers,
    )
    return sev, sev.start(dp, query_name="publish_eval")
