"""Continuous bronze -> silver rollup maintenance.

The reference rolls publishes up into step cells inside its in-memory
database as they arrive (`atlas-core/.../norm/NormalizationCache.scala`,
block store update path); the Spark-first equivalent is a Structured
Streaming windowed aggregation that continuously maintains a SILVER
parquet table of finalized (series, step) cells:

    bronze (status=ok)  --readStream-->  watermark + window(step) sum
        --append file sink-->  silver/ (date-partitioned)

Batch queries then read silver directly: the read-time ingest rollup the
datapoint sources perform today (groupBy series,t per query) is already
materialized, so a graph query is a pure scan + expression plan.  The
watermark bounds state: a cell finalizes once event time passes its end
by `late` seconds, late rows beyond that are dropped (the same contract
the streaming evaluator enforces), and the append-mode file sink commits
atomically per micro-batch (exactly-once on replay).

Also here: `dedup_stream`, exactly-once event dedup for at-least-once
transports — the standard `dropDuplicates` + watermark pattern with
per-key state bounded by the watermark horizon.

State-store provider recommendation (r14 measurement, PERF.md "RocksDB
vs default state store"): keep the DEFAULT HDFS-backed provider for the
small-state twins here (dedup_exact / chunk_dedup: state tops out at a
few hundred thousand fixed-width rows per horizon, and the default
provider's cheaper commit path wins ~15-45% throughput), but set
`spark.sql.streaming.stateStore.providerClass` to the RocksDB provider
for the banded-candidate twins (operators/dedup.py
minhash_candidate/verified_stream): their state runs MILLIONS of rows
per window (3.7M at the 200k replay), where RocksDB measured 1.4-1.8x
the throughput with tracked state memory bounded at ~290MB vs ~2GB —
on-heap state at a 100TB horizon would exhaust executor memory before
the watermark fills, so RocksDB is the at-scale default for any
twin whose state grows with corpus content rather than key cardinality.
(Spark 4 additionally mandates RocksDB for transformWithStateInPandas,
streaming/stateful.py.)
"""

from __future__ import annotations

import contextlib
import os
import threading

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import configure_existing
from ..sources.datapoints import sanitize

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)

# Twins whose state grows with corpus CONTENT (candidate pairs / grams
# per window — millions of rows at the 200k-doc replay) rather than key
# cardinality.  Measured back-to-back (r14 + r15 A/B, PERF.md provider
# tables): for the minhash WINDOWED-AGGREGATION twins RocksDB wins both
# ways (1.4-1.8x throughput, ~290MB vs ~2GB tracked); for the span
# dropDuplicates twin RocksDB costs ~1.2x wall at 200k docs but bounds
# state memory 274MB vs 986MB ON-HEAP at a 2.6M-row horizon — on-heap
# grows with the horizon and exhausts executor heap long before a
# 100TB feed's watermark fills, so RocksDB is still the at-scale
# default there (memory headroom, not local speed).  Small-fixed-state
# twins keep the default provider: 1.1x faster AND smaller (chunk at
# 340k rows: 120MB on-heap vs RocksDB's ~270MB floor).
_CONTENT_SCALED_TWINS = frozenset(
    {
        "minhash_candidate_stream",
        "minhash_verified_stream",
        "span_dedup_stream",
    }
)

# Spark 4 requires the RocksDB provider for transformWithStateInPandas
# regardless of state size (streaming/stateful.py::stateful_stream_tws)
_ROCKSDB_MANDATED = frozenset({"stateful_tws"})


def recommended_state_store(twin: str) -> str:
    """Provider class the r14 A/B recommends for a streaming twin."""
    if twin in _CONTENT_SCALED_TWINS or twin in _ROCKSDB_MANDATED:
        return ROCKSDB_PROVIDER
    return HDFS_PROVIDER


def apply_state_store(spark: SparkSession, twin: str) -> str:
    """Set `spark.sql.streaming.stateStore.providerClass` to the twin's
    recommended provider and return the class applied.  Overridable:
    the `ATLAS_STATE_STORE` env var or the
    `spark.atlas.stateStore.provider` session conf (values `rocksdb` |
    `default`) pin one provider for every twin — e.g. the A/B scripts.
    The conf is read once per query START, so call this immediately
    before starting the twin's stream (sequential starts only — two
    threads starting twins with different regimes would race on the
    session conf)."""
    override = os.environ.get("ATLAS_STATE_STORE") or spark.conf.get(
        "spark.atlas.stateStore.provider", None
    )
    if override and override.lower() not in ("", "auto"):
        cls = ROCKSDB_PROVIDER if override.lower() == "rocksdb" else HDFS_PROVIDER
    else:
        cls = recommended_state_store(twin)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
    return cls


# Serializes (set provider conf -> start()) sections across threads: the
# provider class is read from the SESSION conf at query start, so two
# threads starting twins with different regimes would otherwise race and
# one query could start under the other's provider.
_START_LOCK = threading.RLock()


@contextlib.contextmanager
def scoped_state_store(spark: SparkSession, twin: str):
    """Provider conf scoped to one query start.

    Usage::

        with scoped_state_store(spark, "span_dedup_stream") as cls:
            q = df.writeStream...start()

    Holds a process-wide lock from setting the provider until the
    ``start()`` inside the block returns (when Spark has captured the
    conf into the query), then restores the previous session value — so
    concurrent starts from different threads each get their own
    recommended provider and nothing leaks into the session.
    """
    with _START_LOCK:
        prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        cls = apply_state_store(spark, twin)
        try:
            yield cls
        finally:
            if prev is None:
                try:
                    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
                except Exception:
                    pass
            else:
                spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def silver_rollup_stream(
    spark: SparkSession,
    bronze_path: str,
    step: int = 60,
    tag_keys=("name", "app"),
    late: int = 120,
) -> DataFrame:
    """Streaming frame of finalized (series, t) sum cells from a bronze
    table (status=ok partition).  Columns: one `k_*` per tag key, `t`
    (window start, epoch sec), `value`, `date`.
    """
    configure_existing(spark)
    # scan only the ok partition; the directory IS the predicate
    stream = spark.readStream.schema(
        "tags map<string,string>, name string, t long, value double, "
        "rejection string, date date"
    ).parquet(f"{bronze_path}/data/status=ok")
    kcols = {k: sanitize(k) for k in tag_keys}
    # dsType from the atlas.dstype tag (DsType.scala:22-31: "gauge" ->
    # Gauge, anything else incl. absent -> Rate).  Gauge cells roll up by
    # MAX (duplicate gauge publishes keep the max, AggrDatapoint.scala:
    # 195-222), rate cells by SUM — so the silver table preserves the
    # per-type ingest semantics and downstream `avg` consolidation can
    # apply the right denominator per type.
    ds = (
        F.when(F.col("tags")["atlas.dstype"] == "gauge", F.lit("gauge"))
        .otherwise(F.lit("rate"))
    )
    rows = stream.select(
        *[
            (F.col("name") if k == "name" else F.col("tags")[k]).alias(c)
            for k, c in kcols.items()
        ],
        ds.alias("ds_type"),
        F.timestamp_seconds(F.col("t")).alias("ets"),
        "value",
    )
    agg = (
        rows.withWatermark("ets", f"{late} seconds")
        .groupBy(F.window("ets", f"{step} seconds"), *kcols.values(), "ds_type")
        .agg(
            F.when(F.col("ds_type") == "gauge", F.max("value"))
            .otherwise(F.sum("value"))
            .alias("value")
        )
    )
    t = F.col("window.start").cast("long")
    return agg.select(
        *kcols.values(),
        "ds_type",
        t.alias("t"),
        "value",
        F.to_date(F.col("window.start")).alias("date"),
    )


def start_silver_rollup(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    checkpoint: str,
    step: int = 60,
    tag_keys=("name", "app"),
    late: int = 120,
):
    """Start the continuous silver maintenance job; returns the
    StreamingQuery.  Append mode: a cell is written exactly once, when
    the watermark finalizes it — the silver table only ever contains
    closed cells, so readers never see partial sums.
    """
    cells = silver_rollup_stream(spark, bronze_path, step, tag_keys, late)
    return (
        cells.writeStream.format("parquet")
        .option("path", silver_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("date")
        .outputMode("append")
        .queryName("silver_rollup")
        .start()
    )


def dedup_stream(
    df: DataFrame, keys=("user_id", "event_id"), ts_col: str = "ts", late: int = 3600
) -> DataFrame:
    """Exactly-once event stream from an at-least-once transport:
    duplicates (same key tuple) within the watermark horizon are dropped;
    per-key state expires with the watermark, so state size is bounded by
    arrival rate x `late`, not by history.  Keyed state distributes across
    executors on the dedup key — the same scale story as any keyed agg.
    """
    return df.withWatermark(ts_col, f"{late} seconds").dropDuplicates(
        [*keys, ts_col]
    )


def silver_datapoints(
    spark: SparkSession,
    silver_path: str,
    step: int = 60,
    tag_keys=("name", "app"),
    ds_type: str | None = None,
):
    """DatapointSource over a silver table: the stored rows ARE the
    finalized step cells, so queries skip the read-time ingest rollup
    entirely — a graph query is scan -> expression plan, no groupBy
    before the ASL semantics.  `raw_ranged` returns the same cells
    (sum-of-sums == sum), so the `:sum` fast path folds them directly.

    `ds_type` ("rate" | "gauge") filters a mixed-type silver table to one
    type and marks the source, so `avg` consolidation applies the right
    denominator (TimeSeq.scala:203-210).  With ds_type=None a mixed
    table is served as-is and treated as rate (the reference default for
    untyped series, DsType.scala:22-31).
    """
    from ..sources.datapoints import DatapointSource, date_t_range, sanitize

    configure_existing(spark)
    df = spark.read.parquet(silver_path)
    if ds_type is not None and "ds_type" in df.columns:
        df = df.filter(F.col("ds_type") == ds_type)
    kcols = {k: sanitize(k) for k in tag_keys}

    def _range(lo: int, hi: int):
        return date_t_range(df, lo, hi).select(*kcols.values(), "t", "value")

    return DatapointSource(
        df=df.select(*kcols.values(), "t", "value"),
        step=step,
        colmap=dict(zip(tag_keys, kcols.values())),
        sql_cte="",
        ranged=_range,
        raw_ranged=_range,
        ds_type=ds_type or "rate",
    )


def sessionize_stream(
    events_stream: DataFrame, gap: int = 1800, late: int = 3600
) -> DataFrame:
    """Streaming sessionization with Spark's NATIVE session windows —
    the per-user gap-session rollup (`operators/text.py::sessionize`)
    maintained continuously: a session finalizes when the watermark
    passes its close, and emits exactly the batch row (user, start,
    count, value sum, duration).

    Semantics pinned to the batch op: batch starts a new session when
    the gap STRICTLY exceeds `gap`, and Spark merges session windows
    INCLUSIVELY (an event exactly at the previous session's end joins
    it), so a window duration of exactly `gap` merges iff delta <= gap —
    the same boundary.  Duration subtracts the trailing gap extension,
    making the output bit-equal to batch.

    Expects columns [user_id long, event_id long, ts timestamp,
    value double].  State is per OPEN session keyed by user — bounded by
    concurrent active users, not history; the session-window merge is
    Spark's built-in state-store operator, no custom kernel.
    """
    win = F.session_window("ts", f"{gap} seconds")
    agg = (
        events_stream.withWatermark("ts", f"{late} seconds")
        .groupBy(win, "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )
    return agg.select(
        "user_id",
        F.col("session_window.start").cast("long").alias("session_start"),
        "n_events",
        "value_sum",
        (
            F.col("session_window.end").cast("long")
            - F.col("session_window.start").cast("long")
            - gap
        ).alias("duration_s"),
    )


def dedup_exact_stream(docs_stream: DataFrame, within: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup for continuous corpus intake — the
    streaming twin of `operators/dedup.py::dedup_exact`: each distinct
    text's FIRST arrival passes through; re-arrivals are dropped
    executor-side by `dropDuplicatesWithinWatermark` keyed on the
    256-bit content hash.

    Scale shape: state is one row per distinct hash seen WITHIN the
    watermark window (`within`), expired automatically as the watermark
    advances — bounded by the dedup horizon, never by corpus history;
    the hash key is uniformly distributed so the state store has no hot
    partitions.  Batch keeps min(doc_id) per hash; streaming keeps the
    first ARRIVAL (arrival order replaces id order), emitting
    (h, doc_id) — the survivor assignment an ingest pipeline applies
    before landing documents.  Expects columns
    [doc_id long, text string, ts timestamp]."""
    hashed = docs_stream.select(
        F.sha2(F.col("text").cast("binary"), 256).alias("h"), "doc_id", "ts"
    )
    return (
        hashed.withWatermark("ts", within)
        .dropDuplicatesWithinWatermark(["h"])
        .select("h", "doc_id")
    )


def chunk_dedup_stream(
    docs_stream: DataFrame, k: int = 10, within: str = "10 minutes"
) -> DataFrame:
    """Streaming chunk-level boilerplate filter — the streaming twin of
    `operators/dedup.py::chunk_dedup`'s keeper pass: documents explode
    into consecutive `k`-word chunks and each distinct chunk's FIRST
    arrival passes through; re-arrivals (boilerplate) are dropped
    executor-side by `dropDuplicatesWithinWatermark` keyed on the chunk
    hash.  Emits (ch, doc_id, chunk_idx) — the keeper assignment an
    intake pipeline applies to strip repeated headers/footers before
    landing documents.

    Scale shape: state is one row per distinct chunk hash within the
    watermark horizon (bounded by the horizon, never corpus history);
    a HOT boilerplate chunk costs ONE state row however often it
    recurs, and the 256-bit hash key spreads the state store uniformly.
    Which occurrence survives depends on arrival order (as with
    `dedup_exact_stream`), but the surviving chunk-hash SET is
    arrival-independent — the driver-checkable value.  Expects columns
    [doc_id long, text string, ts timestamp]."""
    # word array staged in its own projection — inlined into the slice
    # lambda, the split re-ran once per chunk (see
    # operators/dedup.ngram_shingles, r17)
    n_chunks = F.ceil(F.size("_w") / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.sha2(
                F.concat_ws(
                    " ", F.slice(F.col("_w"), (i - 1) * k + 1, k)
                ).cast("binary"),
                256,
            ).alias("ch"),
        ),
    )
    occ = docs_stream.select(
        "doc_id", "ts", F.split(F.col("text"), " ").alias("_w")
    ).select(F.explode(chunks).alias("c"), "doc_id", "ts").select(
        F.col("c.ch").alias("ch"), "doc_id", F.col("c.chunk_idx"), "ts"
    )
    return (
        occ.withWatermark("ts", within)
        .dropDuplicatesWithinWatermark(["ch"])
        .select("ch", "doc_id", "chunk_idx")
    )


def span_dedup_stream(
    docs_stream: DataFrame, k: int = 10, within: str = "10 minutes"
) -> DataFrame:
    """Streaming twin of `operators/dedup.py::span_dedup`'s keeper pass:
    documents explode into SLIDING `k`-word grams and each distinct
    gram's first arrival passes through; re-arrivals are dropped
    executor-side by `dropDuplicatesWithinWatermark` on the gram hash.
    Emits (gh, doc_id, pos) — the mark stream an intake pipeline joins
    back per document to drop duplicated spans before landing.

    Scale shape: like chunk_dedup_stream but with ~k x the state rows
    (one per distinct SLIDING gram in the horizon, still horizon-bounded
    and one row per gram however hot) — the regime where the RocksDB
    state-store provider is the right default (module docstring; PERF.md
    r14 provider table).  Expects [doc_id long, text string,
    ts timestamp]."""
    # word array staged in its own projection — inlined into the slice
    # lambda, the split re-ran once per gram (see
    # operators/dedup.ngram_shingles, r17)
    grams = F.when(
        F.size("_w") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("_w") - k),
            lambda p: F.struct(
                p.cast("int").alias("pos"),
                F.sha2(
                    F.concat_ws(" ", F.slice(F.col("_w"), p + 1, k)).cast("binary"),
                    256,
                ).alias("gh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,gh:string>>"))
    occ = docs_stream.select(
        "doc_id", "ts", F.split(F.col("text"), " ").alias("_w")
    ).select(F.explode(grams).alias("g"), "doc_id", "ts").select(
        F.col("g.gh").alias("gh"), "doc_id", F.col("g.pos"), "ts"
    )
    return (
        occ.withWatermark("ts", within)
        .dropDuplicatesWithinWatermark(["gh"])
        .select("gh", "doc_id", "pos")
    )


def cascade_rollup_stream(
    spark: SparkSession,
    fine_silver_path: str,
    factor: int,
    fine_step: int = 60,
    tag_keys=("name", "app"),
    late: int = 120,
) -> DataFrame:
    """Streaming frame of FOUR-FOLD coarse cells from a fine silver
    table — the reference's rollup-on-write block
    (`Block.scala:823-900` RollupBlock keeps sum/count/min/max per cell
    so ANY consolidation function is answerable from the rollup without
    re-reading raw data).

    Input rows are finalized fine cells (one `value` per series/step),
    so the coarse folds are exact: coarse sum of fine sums == raw sum
    (rate semantics), coarse max of fine maxes == raw max (gauge), and
    `count` counts REPORTING fine intervals — exactly the non-NaN
    sub-interval count the gauge `avg` denominator needs
    (TimeSeq.scala:203-210).  A fine cell appears exactly once (append
    sink upstream), so no double counting on replay.
    """
    configure_existing(spark)
    kcols = [sanitize(k) for k in tag_keys]
    stream = spark.readStream.schema(
        ", ".join(f"{c} string" for c in kcols)
        + ", ds_type string, t long, value double, date date"
    ).parquet(fine_silver_path)
    ns = factor * fine_step
    agg = (
        stream.select(
            *kcols, "ds_type", F.timestamp_seconds(F.col("t")).alias("ets"), "value"
        )
        .withWatermark("ets", f"{late} seconds")
        .groupBy(F.window("ets", f"{ns} seconds"), *kcols, "ds_type")
        .agg(
            F.sum("value").alias("sum"),
            F.count("value").cast("long").alias("count"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
    )
    t = F.col("window.start").cast("long")
    return agg.select(
        *kcols,
        "ds_type",
        t.alias("t"),
        "sum",
        "count",
        "min",
        "max",
        F.to_date(F.col("window.start")).alias("date"),
    )


def start_cascade_rollup(
    spark: SparkSession,
    fine_silver_path: str,
    coarse_path: str,
    checkpoint: str,
    factor: int,
    fine_step: int = 60,
    tag_keys=("name", "app"),
    late: int = 120,
):
    """Continuous fine->coarse rollup maintenance (append mode: a coarse
    cell is written once, when the watermark finalizes it)."""
    cells = cascade_rollup_stream(
        spark, fine_silver_path, factor, fine_step, tag_keys, late
    )
    return (
        cells.writeStream.format("parquet")
        .option("path", coarse_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("date")
        .outputMode("append")
        .queryName("cascade_rollup")
        .start()
    )


def rollup_datapoints(
    spark: SparkSession,
    coarse_path: str,
    step: int,
    tag_keys=("name", "app"),
    cf: str = "sum",
    ds_type: str | None = None,
):
    """DatapointSource over a four-fold rollup table, serving the value
    column that answers `cf` exactly: sum/min/max/count directly, and
    `avg` as sum/count for gauges (present-interval denominator) vs
    sum/m-at-eval for rates (the Evaluator's rate branch divides by the
    multiple, so the stored SUM is the right input).  This is the
    query-time leg of rollup-on-write: a coarse-step graph reads cells
    at its own resolution — scan volume drops by the rollup factor and
    no read-time re-aggregation happens at all.
    """
    from ..sources.datapoints import DatapointSource, date_t_range, sanitize

    configure_existing(spark)
    df = spark.read.parquet(coarse_path)
    if ds_type is not None:
        df = df.filter(F.col("ds_type") == ds_type)
    kcols = {k: sanitize(k) for k in tag_keys}
    if cf == "avg" and (ds_type or "rate") == "gauge":
        val = (F.col("sum") / F.col("count")).alias("value")
    elif cf == "avg":
        val = F.col("sum").alias("value")  # evaluator divides by m (rate)
    elif cf == "count":
        val = F.col("count").cast("double").alias("value")
    else:
        val = F.col(cf).alias("value")

    def _range(lo: int, hi: int):
        return date_t_range(df, lo, hi).select(*kcols.values(), "t", val)

    return DatapointSource(
        df=df.select(*kcols.values(), "t", val),
        step=step,
        colmap=dict(zip(tag_keys, kcols.values())),
        sql_cte="",
        ranged=_range,
        raw_ranged=_range if cf == "sum" else None,
        ds_type=ds_type or "rate",
    )


def pick_rollup_step(available_steps, ctx_step: int) -> int:
    """Coarsest maintained rollup resolution that can serve a query at
    `ctx_step` exactly: the largest step <= ctx_step that divides it
    (the remaining factor, if any, is the Evaluator's data-level
    consolidation).  The scan-volume analogue of the reference reading
    rollup blocks instead of raw blocks for coarse graphs.

    Routing is deliberately EXPLICIT (callers build the source with
    `rollup_datapoints(cf=...)` for their workload) rather than an
    automatic per-request swap inside the Engine: per-series rollups are
    only exact for aggregate/cf pairs that commute with time-regrouping
    (sum with sum/avg, max with max, min with min).  A shape like
    `:max,:cf-avg` — avg over time of CROSS-SERIES per-primary-step
    maxes — is not derivable from any per-series rollup column, so a
    transparent swap could silently change semantics; the reference has
    the same constraint (RollupBlock serves the matching aggr column,
    Block.scala:842-849)."""
    fits = [s for s in available_steps if s <= ctx_step and ctx_step % s == 0]
    if not fits:
        raise ValueError(f"no rollup step divides {ctx_step}: {available_steps}")
    return max(fits)
