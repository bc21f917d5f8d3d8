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

from dataclasses import dataclass
from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import LongType

from ..util.io import read_parquet

DEFAULT_STEP = 3600  # seconds; events testdata spans 30 days -> 720 steps

_NS = 1_000_000_000

# Local-bench parallelism guard (see lineitem_datapoints.project): spread
# single-row-group scans so partial aggregation parallelizes on local[32].
_SPREAD = 32


def _epoch_sec(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-seconds long expression for ``col``, adaptive to the driver
    testdata schema: epoch-nanos BIGINT (legacy, via nanosAsLong),
    TIMESTAMP, or TIMESTAMP_NTZ (current driver data; UTC wall time —
    `configure_existing` pins the session zone to UTC so the NTZ->LTZ cast
    is the identity instant).  Integer arithmetic end-to-end, matching the
    DuckDB oracle's ``epoch_ns(ts) // 1e9`` floor exactly for the
    post-1970 test range."""
    if isinstance(df.schema[col].dataType, LongType):
        return F.expr(f"{col} div {_NS}")
    return F.col(col).cast("timestamp").cast("long")


def _step_t(df: DataFrame, step: int, col: str = "ts") -> Column:
    e = _epoch_sec(df, col)
    return (e - e % F.lit(step)).alias("t")


def _ts_range(df: DataFrame, lo: int, hi: int, col: str = "ts") -> DataFrame:
    """Range-filter on the RAW timestamp column with a literal of the
    column's own type, so the predicate reaches the parquet scan
    (row-group min/max pruning) without a cast on the column side."""
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df.filter((F.col(col) >= lo * _NS) & (F.col(col) < hi * _NS))
    tname = dt.typeName().upper()  # TIMESTAMP or TIMESTAMP_NTZ
    def lit(sec: int) -> str:
        iso = datetime.fromtimestamp(sec, timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        return f"{tname} '{iso}'"
    return df.filter(F.expr(f"{col} >= {lit(lo)} AND {col} < {lit(hi)}"))


def sanitize(key: str) -> str:
    """Tag key -> safe column name (e.g. ``nf.cluster`` -> ``k_nf_cluster``)."""
    import re

    return "k_" + re.sub(r"[^A-Za-z0-9_]", "_", key)


# Session-scoped memo for DatapointSource factories over the immutable
# testdata: the returned object holds only lazy plan handles (df + ranged
# builders), so sharing one instance per (session, sf_dir, step) caches
# NO data — it removes the ~15 py4j round-trips of re-constructing the
# identical projection/rollup tree on every query build (r16 profile).
# DatapointSource is treated as immutable everywhere (dataclasses.replace
# for variants).
from ..util.io import memo_factory as _memo_source  # noqa: E402


def _memo_range(fn):
    """Memoize a (lo, hi) -> DataFrame ranged-plan builder.  The factory
    that owns it is itself session-memoized, so this cache lives exactly
    as long as its session; plans only, no data.  Evaluators call
    ranged_df once per DataExpr reference with a handful of distinct
    windows, so a small FIFO bound suffices."""
    cache: dict = {}

    def call(lo: int, hi: int) -> DataFrame:
        v = cache.get((lo, hi))
        if v is None:
            if len(cache) >= 64:
                cache.pop(next(iter(cache)))
            v = fn(lo, hi)
            cache[(lo, hi)] = v
        return v

    return call


def date_t_range(df: DataFrame, lo: int, hi: int) -> DataFrame:
    """Ranged scan over a `date`-partitioned table with an epoch-second
    `t` column: the date bounds are computed driver-side (UTC) so Catalyst
    sees literals and prunes partition DIRECTORIES, and the `t` range
    prunes row groups inside the surviving files.  Shared by the bronze
    and silver table sources."""
    import datetime as _dt

    def day(sec: int) -> str:
        return (
            _dt.datetime.fromtimestamp(sec, tz=_dt.timezone.utc).date().isoformat()
        )

    return df.filter(
        (F.col("date") >= F.lit(day(lo)))
        & (F.col("date") <= F.lit(day(hi)))
        & (F.col("t") >= lo)
        & (F.col("t") < hi)
    )


@dataclass
class DatapointSource:
    df: DataFrame
    step: int
    colmap: dict[str, str]  # tag key -> column name in df
    sql_cte: str  # DuckDB SQL producing the same relation (same col names)
    # Optional time-range scan builder: (lo_sec, hi_sec) -> DataFrame with
    # the range predicate applied to the RAW timestamp column *before* any
    # rollup, so Parquet row-group stats prune the scan.  Without it the
    # evaluator filters the derived `t` column post-projection, which
    # cannot use scan statistics.
    ranged: "object" = None
    # Optional pre-rollup rows (same columns, one row per raw datapoint).
    # Valid when the consuming aggregation merges exactly like the ingest
    # rollup (`raw_fold` below): those aggregations then fold raw rows
    # directly (sum-of-sums == sum, max-of-max == max), removing one full
    # shuffle + hash aggregate from the most common query shape.
    raw_ranged: "object" = None
    # The ingest rollup the raw path replaces: a consuming aggregation may
    # fold `raw_ranged` rows directly only when its fn EQUALS this fold
    # and the fold is mergeable ("sum": sum-of-sums == sum, counts are a
    # sum of 1.0 rows so the equality is exact in doubles below 2^53;
    # "max"/"min": idempotent, max-of-max == max).  "count" is NOT a
    # valid fold: a `:count` aggregation counts series CELLS, not raw
    # rows.
    raw_fold: str = "sum"
    # DsType of every series in this source ("rate" | "gauge",
    # DsType.scala:18-36).  Consolidation `avg` divides by the number of
    # sub-intervals for rates but by the NON-NULL count for gauges — a
    # sampled gauge that starts reporting mid-interval must not show a
    # false drop (TimeSeq.scala:203-210: "should be 90.0 not 45.0").
    ds_type: str = "rate"
    # Optional cheap raw-path grouping: tag key -> (component column
    # names present in `raw_ranged`'s output, label builder from those
    # components).  When a raw-path aggregation groups by such a key, the
    # evaluator groups on the components and synthesizes the display
    # label AFTER the aggregate — the per-row label expression (string
    # concat / format) then runs once per series cell instead of once
    # per raw row, and the per-row work sits in the scan stage, which a
    # single-row-group input serializes onto one task (guide §1.2).
    # Contract (holds for every registered mapping): the label is
    # injective over its components, AND the label is null exactly when
    # some component is null — so grouping and null-dropping on the
    # components is grouping and null-dropping on the label.
    raw_components: "dict[str, tuple[tuple[str, ...], object]] | None" = None

    @property
    def tag_keys(self) -> tuple[str, ...]:
        return tuple(self.colmap)

    def tag_col(self, key: str) -> F.Column | None:
        c = self.colmap.get(key)
        return F.col(c) if c is not None else None

    def ranged_df(self, lo: int, hi: int) -> DataFrame:
        if self.ranged is not None:
            return self.ranged(lo, hi)
        return self.df.filter((F.col("t") >= lo) & (F.col("t") < hi))


@_memo_source
def events_datapoints(spark: SparkSession, sf_dir: str, step: int = DEFAULT_STEP) -> DatapointSource:
    """Datapoint view over the driver `events` table.

    Series identity: tags ``name`` (= event_type) and ``bucket``
    (= "u" + user_id % 8).  Value: SUM of event values in the step cell.

    Step bucketing is exact integer arithmetic on epoch seconds
    (schema-adaptive via `_epoch_sec`), bit-identical to the DuckDB
    oracle's ``epoch_ns(ts) // 1e9`` path.
    """
    from ..session import configure_existing

    configure_existing(spark)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")

    def project(ev_df: DataFrame) -> DataFrame:
        # `_ub` rides along so raw-path aggregations can group on the
        # cheap ordinal and label post-agg (`raw_components` below);
        # column pruning drops whichever of k_bucket/_ub goes unused
        return ev_df.select(
            F.col("event_type").alias("k_name"),
            F.concat(F.lit("u"), (F.col("user_id") % 8).cast("string")).alias("k_bucket"),
            (F.col("user_id") % 8).cast("int").alias("_ub"),
            _step_t(ev_df, step),
            F.col("value"),
        )

    def build(ev_df: DataFrame) -> DataFrame:
        # group on the raw bucket ordinal and synthesize the display label
        # AFTER the rollup: the concat then runs once per cell instead of
        # once per raw row, and the per-row work sits in the scan stage,
        # which a single-row-group input serializes onto one task (guide
        # §1.2 per-task work; r16 A/B).  'u' + int is injective, so the
        # grouping is unchanged; a NULL user_id yields a NULL label either
        # way.
        return (
            ev_df.select(
                F.col("event_type").alias("k_name"),
                (F.col("user_id") % 8).cast("int").alias("_ub"),
                _step_t(ev_df, step),
                F.col("value"),
            )
            .groupBy("k_name", "_ub", "t")
            .agg(F.sum("value").alias("value"))
            .select(
                "k_name",
                F.concat(F.lit("u"), F.col("_ub").cast("string")).alias("k_bucket"),
                "t",
                "value",
            )
        )

    def _range(lo: int, hi: int) -> DataFrame:
        return _ts_range(ev, lo, hi)

    return DatapointSource(
        df=build(ev),
        step=step,
        colmap={"name": "k_name", "bucket": "k_bucket"},
        sql_cte=events_cte(step),
        # raw-ts bounds reach the parquet scan (row-group pruning)
        ranged=_memo_range(lambda lo, hi: build(_range(lo, hi))),
        raw_ranged=_memo_range(lambda lo, hi: project(_range(lo, hi))),
        raw_components={
            "bucket": (
                ("_ub",),
                lambda: F.concat(F.lit("u"), F.col("_ub").cast("string")),
            ),
        },
    )


# Eval window covering the events testdata (2024-01-01 .. 2024-01-31 UTC).
EVENTS_START = 1704067200
EVENTS_END = EVENTS_START + 30 * 86400

# Eval window covering lineitem shipdates (1995-01-01 .. 2002-01-01 UTC).
LINEITEM_START = 788918400
LINEITEM_END = 1009843200
LINEITEM_STEP = 86400


@_memo_source
def lineitem_datapoints(
    spark: SparkSession, sf_dir: str, step: int = LINEITEM_STEP
) -> DatapointSource:
    """Datapoint view over the lineitem fact table — the volume source for
    the TSDB core (rows scale with SF: 600k at sf0.1, 6M at sf1).

    Series identity: name = returnflag+linestatus (e.g. "AF"),
    pbucket = part hash bucket.  Value: SUM of quantity per day cell.
    """
    from ..session import configure_existing

    configure_existing(spark)
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")

    def project(df: DataFrame) -> DataFrame:
        # component columns ride along for cheap raw-path grouping
        # (`raw_components` below); pruning drops unused ones
        return df.select(
            F.concat(F.col("l_returnflag"), F.col("l_linestatus")).alias("k_name"),
            F.concat(F.lit("p"), (F.col("l_partkey") % 16).cast("string")).alias(
                "k_pbucket"
            ),
            F.col("l_returnflag").alias("_rf"),
            F.col("l_linestatus").alias("_ls"),
            (F.col("l_partkey") % 16).cast("int").alias("_pb"),
            (
                F.unix_timestamp("l_shipdate")
                - F.unix_timestamp("l_shipdate") % step
            ).cast("long").alias("t"),
            F.col("l_quantity").alias("value"),
        )

    def build(df: DataFrame) -> DataFrame:
        # group on the raw flag/bucket columns and synthesize the display
        # labels AFTER the rollup: the two per-row concats then run once
        # per cell instead of once per 600k-row scan, and the scan stage
        # is single-task on a single-row-group file (guide §1.2; r16 A/B
        # 1.05 s -> 0.92 s on the grouped-share shape).  Equivalence:
        # l_returnflag / l_linestatus are CHAR(1) flags (TPC-H spec), so
        # concat is injective over the pair and the grouping is unchanged.
        return (
            df.select(
                F.col("l_returnflag").alias("_rf"),
                F.col("l_linestatus").alias("_ls"),
                (F.col("l_partkey") % 16).cast("int").alias("_pb"),
                (
                    F.unix_timestamp("l_shipdate")
                    - F.unix_timestamp("l_shipdate") % step
                ).cast("long").alias("t"),
                F.col("l_quantity").alias("value"),
            )
            .groupBy("_rf", "_ls", "_pb", "t")
            .agg(F.sum("value").alias("value"))
            .select(
                F.concat("_rf", "_ls").alias("k_name"),
                F.concat(F.lit("p"), F.col("_pb").cast("string")).alias("k_pbucket"),
                "t",
                "value",
            )
        )

    def _range(lo: int, hi: int) -> DataFrame:
        return li.filter(
            (F.col("l_shipdate") >= F.timestamp_seconds(F.lit(lo)))
            & (F.col("l_shipdate") < F.timestamp_seconds(F.lit(hi)))
        )

    return DatapointSource(
        df=build(li),
        step=step,
        colmap={"name": "k_name", "pbucket": "k_pbucket"},
        sql_cte=lineitem_cte(step),
        ranged=_memo_range(lambda lo, hi: build(_range(lo, hi))),
        raw_ranged=_memo_range(lambda lo, hi: project(_range(lo, hi))),
        raw_components={
            # CHAR(1) flags: concat is injective over the pair
            "name": (
                ("_rf", "_ls"),
                lambda: F.concat(F.col("_rf"), F.col("_ls")),
            ),
            "pbucket": (
                ("_pb",),
                lambda: F.concat(F.lit("p"), F.col("_pb").cast("string")),
            ),
        },
    )


def lineitem_cte(step: int = LINEITEM_STEP) -> str:
    return f"""
  SELECT l_returnflag || l_linestatus AS k_name,
         'p' || CAST(l_partkey % 16 AS VARCHAR) AS k_pbucket,
         (CAST(epoch(l_shipdate) AS BIGINT) // {step}) * {step} AS t,
         sum(l_quantity) AS value
  FROM lineitem
  GROUP BY 1, 2, 3
"""

PCT_STEP = 86400  # coarser step so bucket counts have meaningful mass

# Gauge fixture: only high events carry a sample, so most (series, step)
# cells are EMPTY — the shape where the gauge-vs-rate `avg` consolidation
# denominator actually differs (TimeSeq.scala:203-210).
GAUGE_MIN_VALUE = 100.0


@_memo_source
def gauge_datapoints(
    spark: SparkSession, sf_dir: str, step: int = DEFAULT_STEP
) -> DatapointSource:
    """Gauge-typed datapoint view over the driver `events` table: a
    sampled "peak value" gauge per (event_type, user bucket) that only
    reports when an event exceeds `GAUGE_MIN_VALUE`, giving the gap-y
    series gauge consolidation semantics exist for.  Ingest rollup is
    MAX (duplicate gauge publishes in a step keep the max,
    `AggrDatapoint.scala:195-222` / `norm.gauge_dedup_batch`), so the
    raw fast path applies to `:max` consumers only (`raw_fold="max"`,
    idempotent max-of-max); `:sum`/`:count` over gauge series must go
    through the per-series rollup.
    """
    from ..session import configure_existing

    configure_existing(spark)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")

    def build(ev_df: DataFrame) -> DataFrame:
        # label post-agg (same pattern + rationale as events_datapoints)
        return (
            ev_df.filter(F.col("value") > GAUGE_MIN_VALUE)
            .select(
                F.col("event_type").alias("k_name"),
                (F.col("user_id") % 8).cast("int").alias("_ub"),
                _step_t(ev_df, step),
                F.col("value"),
            )
            .groupBy("k_name", "_ub", "t")
            .agg(F.max("value").alias("value"))
            .select(
                "k_name",
                F.concat(F.lit("u"), F.col("_ub").cast("string")).alias("k_bucket"),
                "t",
                "value",
            )
        )

    def project(ev_df: DataFrame) -> DataFrame:
        # pre-rollup rows for the raw `:max` path (idempotent fold): a
        # consuming `:max` that drops series keys folds raw gauge
        # publishes straight to its own keys, skipping the
        # (name, bucket, t) ingest exchange.  Cell sets are identical
        # (a cell exists iff any raw publish survives the gauge filter),
        # so gauge consolidation semantics (non-null denominator) are
        # unchanged.
        return ev_df.filter(F.col("value") > GAUGE_MIN_VALUE).select(
            F.col("event_type").alias("k_name"),
            (F.col("user_id") % 8).cast("int").alias("_ub"),
            F.concat(F.lit("u"), (F.col("user_id") % 8).cast("string")).alias(
                "k_bucket"
            ),
            _step_t(ev_df, step),
            F.col("value"),
        )

    return DatapointSource(
        df=build(ev),
        step=step,
        colmap={"name": "k_name", "bucket": "k_bucket"},
        sql_cte=gauge_cte(step),
        ranged=_memo_range(lambda lo, hi: build(_ts_range(ev, lo, hi))),
        raw_ranged=_memo_range(lambda lo, hi: project(_ts_range(ev, lo, hi))),
        raw_fold="max",
        raw_components={
            "bucket": (
                ("_ub",),
                lambda: F.concat(F.lit("u"), F.col("_ub").cast("string")),
            ),
        },
        ds_type="gauge",
    )


def gauge_cte(step: int = DEFAULT_STEP) -> str:
    return f"""
  SELECT event_type AS k_name,
         'u' || CAST(user_id % 8 AS VARCHAR) AS k_bucket,
         (epoch_ns(ts) // 1000000000 // {step}) * {step} AS t,
         max(value) AS value
  FROM events
  WHERE value > {GAUGE_MIN_VALUE}
  GROUP BY 1, 2, 3
"""


def events_cte(step: int = DEFAULT_STEP) -> str:
    """DuckDB relation equivalent to `events_datapoints` (oracle input)."""
    return f"""
  SELECT event_type AS k_name,
         'u' || CAST(user_id % 8 AS VARCHAR) AS k_bucket,
         (epoch_ns(ts) // 1000000000 // {step}) * {step} AS t,
         sum(value) AS value
  FROM events
  GROUP BY 1, 2, 3
"""


@_memo_source
def percentile_datapoints(
    spark: SparkSession, sf_dir: str, step: int = PCT_STEP
) -> DatapointSource:
    """Spectator-style bucket-counter series derived from events: each
    event's value maps to a log-linear bucket (see
    `functions.percentile_buckets`); one series per (event_type, bucket)
    holding the per-step count.  Input fixture for `:percentiles`,
    `:median`, `:sample-count` (FIXTURES.md F3)."""
    from ..functions.percentile_buckets import index_of_sql_expr
    from ..session import configure_existing

    configure_existing(spark)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    amount = F.greatest(F.lit(1), F.ceil(F.col("value") * 10).cast("long"))
    # O(1) arithmetic bucket index (exact-equal to the 276-element scan;
    # see index_of_sql_expr) — the scan cost ~276 comparisons per event
    idx = F.expr(index_of_sql_expr("_amt"))

    def build(ev_df):
        # group on the INT bucket index and format the hex label AFTER
        # the rollup: format_string goes through java.util.Formatter and
        # was the dominant per-row cost of the single-task scan stage
        # (r16 A/B: 0.26-0.48 s -> 0.21-0.28 s on the source rollup).
        # D%04X is injective over the index range, so grouping by the
        # index is grouping by the label.
        return (
            ev_df.select(
                F.col("event_type").alias("k_name"),
                _step_t(ev_df, step),
                amount.alias("_amt"),
            )
            .select("k_name", idx.alias("_idx"), "t")
            .groupBy("k_name", "_idx", "t")
            .agg(F.count("*").cast("double").alias("value"))
            .select(
                "k_name",
                F.format_string("D%04X", F.col("_idx")).alias("k_percentile"),
                "t",
                "value",
            )
        )

    def project(ev_df):
        # pre-rollup rows for the raw `:sum` path: the ingest rollup is a
        # COUNT, i.e. a SUM over value=1.0 rows, so a consuming `:sum`
        # that drops `name` can fold raw rows straight to its own
        # (coarser) keys — one exchange of (bucket, t) partials instead
        # of a full (name, bucket, t) rollup exchange plus a regroup.
        # The label column rides along for tag-filter queries and is
        # pruned when unused; grouping paths use the `_idx` component.
        return (
            ev_df.select(
                F.col("event_type").alias("k_name"),
                _step_t(ev_df, step),
                amount.alias("_amt"),
            )
            .select(
                "k_name",
                idx.alias("_idx"),
                F.format_string("D%04X", idx).alias("k_percentile"),
                "t",
                F.lit(1.0).alias("value"),
            )
        )

    return DatapointSource(
        df=build(ev),
        step=step,
        colmap={"name": "k_name", "percentile": "k_percentile"},
        sql_cte=percentile_cte(step),
        ranged=_memo_range(lambda lo, hi: build(_ts_range(ev, lo, hi))),
        raw_ranged=_memo_range(lambda lo, hi: project(_ts_range(ev, lo, hi))),
        raw_components={
            # D%04X is injective over the index range and null iff the
            # index is null
            "percentile": (
                ("_idx",),
                lambda: F.format_string("D%04X", F.col("_idx")),
            ),
        },
    )


@_memo_source
def distinct_datapoints(
    spark: SparkSession, sf_dir: str, step: int = PCT_STEP
) -> DatapointSource:
    """Max-rho register series for `:approx-distinct` (FIXTURES.md F5).

    Hashing is md5-of-user_id (identical hex in Spark and DuckDB, so the
    oracle sees bit-identical registers): first hex byte -> register
    index (mod 64), next 8 hex chars -> 32-bit value whose
    leading-zero count + 1 is rho.
    """
    from ..session import configure_existing

    configure_existing(spark)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    h = F.md5(F.col("user_id").cast("string"))
    reg = (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % 64).alias("_reg")
    sub = F.substring(h, 3, 8)
    # rho = leading-zero BITS of the 32-bit value + 1.  The definitional
    # form walks the hex string (z = leading zero hex chars via regexp,
    # plus the first non-zero digit's own leading bits); arithmetically
    # that is exactly 33 - bit_length(v) with v = the 32-bit value and
    # bit_length via bin() — pinned value-equal in the r16 A/B, and the
    # regexp per raw row was the dominant scan-stage cost (0.39-0.44 s
    # -> 0.26-0.30 s).  v = 0 (all 32 bits zero) is rho 33.
    v32 = F.conv(sub, 16, 10).cast("long")
    rho = F.when(v32 == 0, F.lit(33)).otherwise(F.lit(33) - F.length(F.bin(v32)))

    def build(ev_df):
        # label post-agg: R%02X is injective over the register index
        return (
            ev_df.select(
                F.col("event_type").alias("k_name"),
                reg,
                _step_t(ev_df, step),
                rho.cast("double").alias("rho"),
            )
            .groupBy("k_name", "_reg", "t")
            .agg(F.max("rho").alias("value"))
            .select(
                "k_name",
                F.format_string("R%02X", F.col("_reg")).alias("k_distinct"),
                "t",
                "value",
            )
        )

    def project(ev_df):
        # pre-rollup rows for the raw `:max` path: the ingest rollup is a
        # MAX over per-event rho values — idempotent, so a consuming
        # `:max` that drops `name` (the `:approx-distinct` register merge)
        # folds raw rows straight to its own (register, t) keys, skipping
        # the (name, register, t) ingest exchange.  The label column
        # rides along for tag-filter queries; grouping uses `_reg`.
        return ev_df.select(
            F.col("event_type").alias("k_name"),
            reg,
            F.format_string("R%02X", reg).alias("k_distinct"),
            _step_t(ev_df, step),
            rho.cast("double").alias("value"),
        )

    return DatapointSource(
        df=build(ev),
        step=step,
        colmap={"name": "k_name", "distinct": "k_distinct"},
        sql_cte=distinct_cte(step),
        ranged=_memo_range(lambda lo, hi: build(_ts_range(ev, lo, hi))),
        raw_ranged=_memo_range(lambda lo, hi: project(_ts_range(ev, lo, hi))),
        raw_fold="max",
        raw_components={
            # R%02X is injective over the register index and null iff the
            # index is null
            "distinct": (
                ("_reg",),
                lambda: F.format_string("R%02X", F.col("_reg")),
            ),
        },
    )


def distinct_cte(step: int = PCT_STEP) -> str:
    return f"""
  SELECT event_type AS k_name,
         printf('R%02X', CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS INTEGER) % 64) AS k_distinct,
         (epoch_ns(ts) // 1000000000 // {step}) * {step} AS t,
         max(CASE
           WHEN len(regexp_extract(substr(md5(CAST(user_id AS VARCHAR)), 3, 8), '^(0*)', 1)) = 8 THEN 33.0
           ELSE 4 * len(regexp_extract(substr(md5(CAST(user_id AS VARCHAR)), 3, 8), '^(0*)', 1))
                + (CASE substr(substr(md5(CAST(user_id AS VARCHAR)), 3, 8), len(regexp_extract(substr(md5(CAST(user_id AS VARCHAR)), 3, 8), '^(0*)', 1)) + 1, 1)
                     WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                     WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                     ELSE 0 END)
                + 1.0
         END) AS value
  FROM events
  GROUP BY 1, 2, 3
"""


@_memo_source
def dist_datapoints(
    spark: SparkSession, sf_dir: str, step: int = DEFAULT_STEP
) -> DatapointSource:
    """Spectator timer/distribution statistic series (FIXTURES.md F4): per
    (event_type, step) four series tagged
    statistic in {count, totalAmount, totalOfSquares, max} with
    self-consistent values, input for the dist-* macros."""
    from ..session import configure_existing

    configure_existing(spark)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    def build(ev_df):
        base = (
            ev_df.select(
                F.col("event_type").alias("k_name"),
                _step_t(ev_df, step),
                "value",
            )
            .groupBy("k_name", "t")
            .agg(
                F.count("*").cast("double").alias("_cnt"),
                F.sum("value").alias("_sum"),
                F.sum(F.col("value") * F.col("value")).alias("_sumsq"),
                F.max("value").alias("_max"),
            )
        )
        return base.selectExpr(
            "k_name",
            "t",
            "stack(4, 'count', _cnt, 'totalAmount', _sum, 'totalOfSquares', _sumsq, 'max', _max) AS (k_statistic, value)",
        )

    return DatapointSource(
        df=build(ev),
        step=step,
        colmap={"name": "k_name", "statistic": "k_statistic"},
        sql_cte=dist_cte(step),
        ranged=_memo_range(lambda lo, hi: build(_ts_range(ev, lo, hi))),
    )


def dist_cte(step: int = DEFAULT_STEP) -> str:
    base = f"""
    SELECT event_type AS k_name,
           (epoch_ns(ts) // 1000000000 // {step}) * {step} AS t,
           CAST(count(*) AS DOUBLE) AS cnt,
           sum(value) AS s,
           sum(value * value) AS sq,
           max(value) AS mx
    FROM events GROUP BY 1, 2
"""
    return f"""
  SELECT k_name, 'count' AS k_statistic, t, cnt AS value FROM ({base})
  UNION ALL SELECT k_name, 'totalAmount', t, s FROM ({base})
  UNION ALL SELECT k_name, 'totalOfSquares', t, sq FROM ({base})
  UNION ALL SELECT k_name, 'max', t, mx FROM ({base})
"""


def percentile_cte(step: int = PCT_STEP) -> str:
    from ..functions.percentile_buckets import boundaries_sql_array

    arr = boundaries_sql_array()
    amount = "greatest(1, CAST(ceil(value * 10) AS BIGINT))"
    idx = f"len(list_filter({arr}, b -> b < {amount}))"
    return f"""
  SELECT event_type AS k_name,
         printf('D%04X', {idx}) AS k_percentile,
         (epoch_ns(ts) // 1000000000 // {step}) * {step} AS t,
         CAST(count(*) AS DOUBLE) AS value
  FROM events
  GROUP BY 1, 2, 3
"""
