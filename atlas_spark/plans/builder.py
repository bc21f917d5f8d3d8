"""Plan builder: expression AST -> Spark DataFrame DAG.

Spark-first equivalents of the reference's evaluation pipeline
(`atlas-core/.../model/DataExpr.scala` eval, `MathExpr.scala`,
`StatefulExpr.scala`, `FilterExpr.scala`):

  - scan filters      -> `df.filter` on promoted tag columns (Catalyst
                         pushes them into the parquet scan)
  - first aggregation -> `groupBy(t).agg` / `groupBy(keys..., t).agg`
                         (Spark's partial/final hash agg replaces the
                         reference's AggregateCollector partial fold)
  - binary math       -> equi-join on (common group keys, t); constants and
                         global aggregates broadcast to the grouped side
  - stateful ops      -> window functions over the dense step grid
  - top-k             -> rank over per-line summary stats

"no data" is NULL (SURVEY §4.3 #1); frames are kept *sparse* (rows only
where data exists) until an operator needs gap visibility (binary math,
stateful windows, generators), at which point the frame is densified
against the EvalContext grid.  At scale the grid side is tiny
(n_steps rows) and always broadcast; the series-key side is derived by a
distinct over the already-aggregated (small) result.

ResultFrame df schema: [<key cols: string>..., t: long, value: double].
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions import nanmath
from ..model import expr as E
from ..model import query as Q
from ..sources.datapoints import DatapointSource, sanitize
from .context import EvalContext


@dataclass
class ResultFrame:
    df: DataFrame  # [key cols..., t long, value double]
    keys: tuple[str, ...] | None  # group tag keys; None = per-series (:all)
    colmap: dict[str, str]  # tag key -> column name
    static_tags: dict[str, str]  # exact-match tags common to all lines
    dense: bool = False
    # zero LINES (standalone :stat-*, FilterExpr.scala:69-87), as opposed to
    # an empty ungrouped aggregate which is one NO_DATA line of NaNs
    # (DataExpr.scala:150-153); densify must not manufacture a line here
    no_lines: bool = False

    @property
    def key_cols(self) -> list[str]:
        if self.keys is None:
            return list(self.colmap.values())
        return [self.colmap[k] for k in self.keys]


def query_to_column(q: Q.Query, source: DatapointSource):
    """Compile a Query to a boolean Column over promoted tag columns.

    Falls back to `tags[key]` map access when a key is not promoted and the
    source carries a `tags` map column.  Missing key -> NULL -> treated as
    non-match, mirroring `Query.matches` (Query.scala:293-331).
    """

    def tag(k: str):
        c = source.tag_col(k)
        if c is not None:
            return c
        if "tags" in source.df.columns:
            return F.col("tags").getItem(k)
        return F.lit(None).cast("string")

    def go(q: Q.Query):
        if isinstance(q, Q.TrueQuery):
            return F.lit(True)
        if isinstance(q, Q.FalseQuery):
            return F.lit(False)
        if isinstance(q, Q.HasKeyQuery):
            return tag(q.k).isNotNull()
        if isinstance(q, Q.EqualQuery):
            return tag(q.k) == q.v
        # :lt/:le/:gt/:ge are lexicographic *string* comparisons
        # (Query.scala:361-403) — promoted columns are strings, no cast.
        if isinstance(q, Q.LessThanQuery):
            return tag(q.k) < q.v
        if isinstance(q, Q.LessThanEqualQuery):
            return tag(q.k) <= q.v
        if isinstance(q, Q.GreaterThanQuery):
            return tag(q.k) > q.v
        if isinstance(q, Q.GreaterThanEqualQuery):
            return tag(q.k) >= q.v
        if isinstance(q, Q.RegexQuery):
            return tag(q.k).rlike("^" + q.v)
        if isinstance(q, Q.RegexIgnoreCaseQuery):
            return tag(q.k).rlike("(?i)^" + q.v)
        if isinstance(q, Q.InQuery):
            return tag(q.k).isin(*q.vs)
        if isinstance(q, Q.AndQuery):
            return go(q.q1) & go(q.q2)
        if isinstance(q, Q.OrQuery):
            return go(q.q1) | go(q.q2)
        if isinstance(q, Q.NotQuery):
            # NULL (missing key) must not match the negation result of a
            # missing-key comparison either — coalesce inner to false first.
            return ~F.coalesce(go(q.q), F.lit(False))
        raise TypeError(f"unknown query node {q!r}")

    # No outer coalesce: SQL filter semantics already drop NULL results, and
    # a coalesce wrapper would block predicate pushdown into the scan
    # (PushedFilters would show nothing).  NOT is handled above.
    return go(q)


_BOUNDARY_SQL: str | None = None


def _boundary_array_sql() -> str:
    """The 276-element percentile bucket boundary array as ONE SQL string.

    The former `F.array(*[F.lit(float(b)) ...])` form cost ~550 py4j
    round-trips (~0.3 s) on every percentile query build; a single
    `F.expr` is one round-trip for the identical literal array.
    D-suffixed literals keep the exact double values `F.lit(float(b))`
    produced — Python float repr round-trips to the same IEEE double via
    Double.parseDouble — and parse ~10x faster than the earlier
    per-element CAST('..' AS DOUBLE) form (Catalyst re-parses this
    string on every percentile build)."""
    global _BOUNDARY_SQL
    if _BOUNDARY_SQL is None:
        from ..functions.percentile_buckets import BOUNDARIES

        _BOUNDARY_SQL = (
            "array(" + ",".join(f"{float(b)!r}D" for b in BOUNDARIES) + ")"
        )
    return _BOUNDARY_SQL


class _CommonBaseBail(Exception):
    """Internal: abort the common-base collapse mid-build (unmappable
    regroup key) and fall back to the generic binary path."""


_AGG = {
    "sum": lambda c: F.sum(c),
    "count": lambda c: F.count(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    # used by :topk-others-avg / :bottomk-others-avg (AvgAggregator:
    # null-skipping mean across lines)
    "avg": lambda c: F.avg(c),
}

_STAT_FUNS = {
    "avg": lambda c: F.avg(c),
    "max": lambda c: F.max(c),
    "min": lambda c: F.min(c),
    "last": lambda c: F.last(c, ignorenulls=True),
    "total": lambda c: F.sum(c),
    "count": lambda c: F.count(c),
}


def time_value_col(mode: str):
    """`mode,:time` value as a pure function of the interval-start `t`
    column - shared by the batch generator and the streaming stateless
    steps (a generator side of binary math streams as a projection)."""
    t = F.col("t")
    ts = F.timestamp_seconds(t)
    # calendar fields are integer ZonedDateTime.get(chronoField) values
    # (MathExpr.scala:213-215), hence the floors; only the "seconds".."weeks"
    # modes are fractional sinceEpoch divisions (MathExpr.scala:200-211)
    iso_dow = (F.dayofweek(ts) + 5) % 7 + 1  # Spark Sunday=1 -> ISO Monday=1
    dom, doy = F.dayofmonth(ts), F.dayofyear(ts)
    hour = F.floor((t % 86400) / F.lit(3600))
    table = {
        "secondOfMinute": t % 60,
        "secondOfDay": t % 86400,
        "minuteOfHour": F.floor((t % 3600) / F.lit(60)),
        "minuteOfDay": F.floor((t % 86400) / F.lit(60)),
        "hourOfDay": hour,
        "dayOfWeek": iso_dow,
        "dayOfMonth": dom,
        "dayOfYear": doy,
        "monthOfYear": F.month(ts),
        "yearOfCentury": F.year(ts) % 100,
        "yearOfEra": F.year(ts),
        "seconds": t,
        "minutes": t / F.lit(60),
        "hours": t / F.lit(3600),
        "days": t / F.lit(86400),
        "weeks": t / F.lit(604800),
    }
    if mode in table:
        return table[mode]
    # any other mode is ChronoField.valueOf(s) (MathExpr.scala:197),
    # evaluated on the UTC calendar; grid t is whole seconds so the
    # sub-second fields are exact zeros
    h12 = F.floor((t % 43200) / F.lit(3600))
    chrono = {
        "NANO_OF_SECOND": F.lit(0),
        "NANO_OF_DAY": (t % 86400) * F.lit(1_000_000_000),
        "MICRO_OF_SECOND": F.lit(0),
        "MICRO_OF_DAY": (t % 86400) * F.lit(1_000_000),
        "MILLI_OF_SECOND": F.lit(0),
        "MILLI_OF_DAY": (t % 86400) * F.lit(1000),
        "SECOND_OF_MINUTE": t % 60,
        "SECOND_OF_DAY": t % 86400,
        "MINUTE_OF_HOUR": F.floor((t % 3600) / F.lit(60)),
        "MINUTE_OF_DAY": F.floor((t % 86400) / F.lit(60)),
        "HOUR_OF_AMPM": h12,
        "CLOCK_HOUR_OF_AMPM": (h12 + 11) % 12 + 1,
        "HOUR_OF_DAY": hour,
        "CLOCK_HOUR_OF_DAY": (hour + 23) % 24 + 1,
        "AMPM_OF_DAY": F.floor((t % 86400) / F.lit(43200)),
        "DAY_OF_WEEK": iso_dow,
        "ALIGNED_DAY_OF_WEEK_IN_MONTH": (dom - 1) % 7 + 1,
        "ALIGNED_DAY_OF_WEEK_IN_YEAR": (doy - 1) % 7 + 1,
        "DAY_OF_MONTH": dom,
        "DAY_OF_YEAR": doy,
        "EPOCH_DAY": F.floor(t / F.lit(86400)),
        "ALIGNED_WEEK_OF_MONTH": F.floor((dom - 1) / F.lit(7)) + 1,
        "ALIGNED_WEEK_OF_YEAR": F.floor((doy - 1) / F.lit(7)) + 1,
        "MONTH_OF_YEAR": F.month(ts),
        "PROLEPTIC_MONTH": F.year(ts) * 12 + F.month(ts) - 1,
        "YEAR_OF_ERA": F.year(ts),
        "YEAR": F.year(ts),
        "ERA": F.lit(1),
        "INSTANT_SECONDS": t,
        "OFFSET_SECONDS": F.lit(0),
    }
    if mode not in chrono:
        raise ValueError(f"unknown :time mode {mode}")
    return chrono[mode]


class Evaluator:
    """Evaluates expression trees against one DatapointSource + EvalContext.

    DataExpr subplans are memoized per canonical string, mirroring the
    reference's DataExpr dedup across expressions (GraphApi.scala:72-76).
    """

    def __init__(
        self,
        source: DatapointSource,
        ctx: EvalContext,
        collect_stats: bool = False,
    ):
        self.source = source
        self.ctx = ctx
        self.spark: SparkSession = source.df.sparkSession
        self._data_cache: dict[str, ResultFrame] = {}
        # stateful subtrees referenced more than once (the des-epic macro
        # binds pred = :des once but the tree references it 4x): one
        # built frame per distinct StatefulMathExpr, marked reused on the
        # second reference so the scale persist flag collapses the
        # repeated pandas-kernel executions to one
        self._stateful_cache: dict[E.StatefulMathExpr, ResultFrame] = {}
        # CollectorStats-style input accounting (CollectorStats.scala):
        # when enabled, each post-predicate scan frame is RECORDED for a
        # later bounded stats aggregation (input_stats) — the standard
        # _eval_data path plus the rollup/condagg binary rewrites.
        # Deliberately NOT an Observation: CollectMetrics registers a
        # listener on the SHARED SparkContext bus, and a measured 16-
        # client A/B showed one observed URI in the mix halving TOTAL
        # server throughput (cross-request p95 blowups); a separate tiny
        # agg job costs only the requesting format.  Off by default so
        # registry/bench plan pins stay exact.
        self.collect_stats = collect_stats
        self.stat_frames: list[DataFrame] = []
        # frames persisted by _mark_reused (multi-consumer subtrees);
        # released by release() / the registry's scoped drain
        self.persisted: list[DataFrame] = []
        self._reuse_persist: bool | None = None  # lazy conf read

    # ------------------------------------------------- shared-subtree reuse

    def _mark_reused(self, df: DataFrame) -> DataFrame:
        """Persist a frame whose plan is about to be consumed by more than
        one branch of the final DAG (densify's key-distinct + grid join,
        topk's stats + join-back, a DataExpr referenced twice, ...).

        Without the persist Spark re-executes the whole subtree — scan
        included — once per consumer: st_rolling_sum's pre-change plan
        scanned events twice (PERF.md r16).  These frames are already
        aggregated (series-cells, not raw rows), so the cache is small at
        any scale while the saving is a full input scan + shuffle per
        extra consumer.  Pure cache: eviction only costs recomputation.
        Streaming frames cannot be cached and pass through unchanged.
        The caller must arrange release (Evaluator.release(), or the
        registry adopts into the scoped drain).

        Conf-gated, DEFAULT OFF (`spark.atlas.reuse.persist=true` to
        enable): a measured r16 A/B at sf0.1 showed the persist 2-3x
        SLOWER (li_topk 1.74 s vs 0.60 s, math_pct 0.77 s vs 0.29 s warm
        min-of-3) — the duplicate subtrees execute as parallel stages
        over idle cores while the cache serializes them and pays
        columnar materialization for a scan that is memory-resident
        anyway.  On a deployment where the input relation is large
        enough that a second full scan dominates (the 100 TB case), set
        the conf to true: the cached frame is aggregate-sized while the
        saving is a full scan + shuffle per extra consumer."""
        if df.isStreaming or getattr(df, "_atlas_reused", False):
            return df
        if self._reuse_persist is None:
            self._reuse_persist = (
                str(
                    self.spark.conf.get("spark.atlas.reuse.persist", "false")
                ).lower()
                == "true"
            )
        if not self._reuse_persist:
            return df
        df.persist()
        df._atlas_reused = True
        self.persisted.append(df)
        return df

    def release(self) -> None:
        """Unpersist every shared-subtree cache this evaluator created.
        Call after the query's results are collected (API render,
        streaming foreachBatch); registry queries instead hand the frames
        to the scoped drain, released when the next query is built."""
        for df in self.persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self.persisted.clear()

    def input_stats(self) -> dict | None:
        """Aggregate the recorded scan frames into CollectorStats input
        counts: rows + EXACT distinct series per recorded scan, summed,
        as ONE Spark job (the per-frame 1-row aggregates union before a
        final sum).  Exact (not approx_count_distinct) because the
        reference's CollectorStats counts the lines it actually
        processed (CollectorStats.scala); the distinct shuffle is
        per-request opt-in (json formats only) and partial-aggregated
        map-side.  Returns None — stats unknown — when
        nothing was recorded or the follow-up job fails (the graph data
        was already fetched; a stats failure must never fail the
        request).  Note: the job re-reads the source AFTER the render's
        collect, so on a live-ingesting source the counts reflect the
        data at stats time, not the exact rows the collect saw — the
        alternative (an Observation riding the collect) measurably
        poisons concurrent renders via the shared listener bus (r15
        server A/B; PERF.md)."""
        if not self.stat_frames:
            return None
        try:
            cols = list(self.source.colmap.values())
            series = F.struct(*cols) if cols else F.lit(1)
            aggs = [
                df.agg(
                    F.count(F.lit(1)).alias("datapoints"),
                    F.count_distinct(series).alias("lines"),
                )
                for df in self.stat_frames
            ]
            combined = aggs[0]
            for a in aggs[1:]:
                combined = combined.unionAll(a)
            row = combined.agg(
                F.sum("datapoints").alias("datapoints"),
                F.sum("lines").alias("lines"),
            ).first()
            return {
                "lines": int(row["lines"]),
                "datapoints": int(row["datapoints"]),
            }
        except Exception:
            return None

    # ---------------------------------------------------------- grid helpers

    def grid_df(self, ctx: EvalContext | None = None) -> DataFrame:
        ctx = ctx or self.ctx
        return self.spark.range(ctx.n_steps).select(
            (F.lit(ctx.start) + F.col("id") * ctx.step).cast("long").alias("t")
        )

    # above this many steps the one-pass densify would carry a per-key
    # cell array of O(steps) structs (~16 B each) through the generator
    # row, so the join-based path (which streams the frame) takes over.
    # The walk itself is linear — sorted cells merged against the step
    # sequence, one sequence segment per gap — so unlike the earlier
    # map-lookup form (O(steps x cells)) the bound is purely a row-width
    # guard: 65536 steps ~ 1 MB per key row.  Every registry/render
    # context is far below it (auto-step aligns rendered contexts to the
    # canvas width; the widest fixture grid is 2557 steps).
    _DENSIFY_ONEPASS_MAX_STEPS = 65536

    def densify(self, rf: ResultFrame) -> ResultFrame:
        """Expand to the full [start, end) grid with NULL gaps.

        Keyed frames densify in ONE pass over the aggregate: collect each
        key's (t, value) cells, sort them, and walk the sorted array once
        — each cell expands to `sequence(prev.t + step, t)` grid points
        (the gap nulls before it, then itself), and a phantom cell at
        `last + step` expands the trailing gap (dropped after the
        explode).  One groupBy exchange, the aggregate subtree executes
        once, and the per-key fill is O(cells log cells + steps) — no
        map lookup, no grid join.  The former shape (`keys.distinct()` ×
        broadcast grid, left join back) executed the subtree TWICE (the
        key-distinct is a second consumer) and shuffled both join sides;
        it remains the fallback for contexts wider than
        _DENSIFY_ONEPASS_MAX_STEPS, where the per-key cell array would
        outgrow a sane row width.
        """
        if rf.dense:
            return rf
        if rf.no_lines:
            return replace(rf, dense=True)
        kc = rf.key_cols
        ctx = self.ctx
        if kc and ctx.n_steps <= self._DENSIFY_ONEPASS_MAX_STEPS:
            start, step = ctx.start, ctx.step
            last = start + (ctx.n_steps - 1) * step
            g = rf.df.groupBy(*kc).agg(
                F.collect_list(F.struct("t", "value")).alias("_raw")
            )
            # on-grid cells only (both prior densify shapes dropped
            # off-grid ts), sorted, plus the phantom trailing cell
            g = g.select(
                *kc,
                F.expr(
                    f"concat(array_sort(filter(_raw, c -> c.t >= {start}L"
                    f" AND c.t <= {last}L AND (c.t - {start}L) % {step}L = 0)),"
                    f" array(struct({last + step}L AS t,"
                    f" CAST(NULL AS DOUBLE) AS value)))"
                ).alias("_cs"),
            )
            # aggregate ts are unique per key, so consecutive cells are
            # >= one step apart and every sequence below is non-empty
            walk = (
                "flatten(transform(_cs, (c, i) -> transform("
                f"sequence(CASE WHEN i = 0 THEN {start}L"
                f" ELSE element_at(_cs, i).t + {step}L END, c.t, {step}L),"
                " tt -> struct(tt AS t,"
                " IF(tt = c.t, c.value, CAST(NULL AS DOUBLE)) AS value))))"
            )
            df = (
                g.select(*kc, F.explode(F.expr(walk)).alias("_c"))
                .select(
                    *kc,
                    F.col("_c.t").alias("t"),
                    F.col("_c.value").alias("value"),
                )
                .filter(F.col("t") <= last)  # drop the phantom cell
            )
            return replace(rf, df=df, dense=True)
        grid = F.broadcast(self.grid_df())
        if kc:
            # the frame feeds BOTH the key-distinct and the grid join —
            # persist so the aggregate subtree (and its source scan)
            # executes once, not once per consumer
            src = self._mark_reused(rf.df)
            keys = src.select(*kc).distinct()
            shell = keys.crossJoin(grid)
            df = shell.join(src, on=kc + ["t"], how="left")
        else:
            df = grid.join(rf.df, on="t", how="left")
        df = df.select(*kc, "t", "value")
        return replace(rf, df=df, dense=True)

    def _trim(self, df: DataFrame) -> DataFrame:
        return df.filter((F.col("t") >= self.ctx.start) & (F.col("t") < self.ctx.end))

    # ----------------------------------------------------------------- entry

    def eval(self, e: E.TimeSeriesExpr) -> ResultFrame:
        if isinstance(e, E.StyleExpr):
            return self._eval_style(e)
        return self._eval(e)

    def _eval(self, e: E.TimeSeriesExpr) -> ResultFrame:
        if isinstance(e, E.DataExpr):
            key = e.display()
            if key not in self._data_cache:
                self._data_cache[key] = self._eval_data(e)
            else:
                # second reference to the same DataExpr (`:pct`'s
                # line/total, `:stat-*` filter predicates, `:dup` without
                # offset): persist so the shared fetch+aggregate runs
                # once.  Safe pre-action — Spark's cache lookup is by
                # logical plan, so the first consumer hits it too.
                rf0 = self._data_cache[key]
                self._mark_reused(rf0.df)
            return self._data_cache[key]
        if isinstance(e, E.ConstExpr):
            return self._generator(F.lit(float(e.v)))
        if isinstance(e, E.TimeExpr):
            return self._generator(self._time_col(e.mode))
        if isinstance(e, E.TimeSpanExpr):
            return self._eval_time_span(e)
        if isinstance(e, E.RandomExpr):
            return self._generator(self._random_col(e.seed))
        if isinstance(e, E.UnaryMathExpr):
            rf = self._eval(e.expr)
            if e.op == "per-step":
                # rate/sec -> per-interval (MathExpr.scala:437-454)
                df = rf.df.withColumn("value", F.col("value") * F.lit(float(self.ctx.step)))
            else:
                df = rf.df.withColumn("value", nanmath.unary_op(e.op, F.col("value"), e.param))
            return replace(rf, df=df)
        if isinstance(e, E.BinaryMathExpr):
            return self._eval_binary(e)
        if isinstance(e, E.AggrMathExpr):
            return self._eval_aggr_math(e)
        if isinstance(e, E.MathGroupByExpr):
            return self._eval_math_group_by(e)
        if isinstance(e, E.AsExpr):
            return self._eval_as(e)
        if isinstance(e, E.NamedRewrite):
            return self._eval(e.evaluated)
        if isinstance(e, E.ApproxDistinctExpr):
            return self._eval_approx_distinct(e)
        if isinstance(e, E.PercentilesExpr):
            return self._eval_percentiles(e)
        if isinstance(e, E.SampleCountExpr):
            return self._eval_sample_count(e)
        if isinstance(e, E.StatefulMathExpr):
            if e not in self._stateful_cache:
                self._stateful_cache[e] = self._eval_stateful(e)
            else:
                # second reference to the same stateful subtree: persist
                # (flag-gated) so the window/DES computation runs once
                self._mark_reused(self._stateful_cache[e].df)
            return self._stateful_cache[e]
        if isinstance(e, E.StatExpr):
            return self._eval_stat(e)
        if isinstance(e, E.StatPlaceholder):
            # standalone `:stat-*` outside a :filter predicate evaluates to
            # an empty result set (FilterExpr.scala:69-87 StatExpr.eval ->
            # ResultSet(this, Nil)); downstream binary math over the empty
            # side stays empty, matching the reference pairing
            df = self.grid_df().withColumn("value", F.lit(0.0)).where(F.lit(False))
            return ResultFrame(df, (), {}, {}, no_lines=True)
        if isinstance(e, E.FilterOpExpr):
            return self._eval_filter(e)
        if isinstance(e, E.TopKExpr):
            return self._eval_topk(e)
        if isinstance(e, E.ConsolidateExpr):
            return self._eval_consolidate(e)
        if isinstance(e, E.StyleExpr):
            return self._eval_style(e)
        raise TypeError(f"cannot evaluate {type(e).__name__}")

    # ------------------------------------------------------------ data exprs

    # default consolidation fn per aggregate when fetching at a coarser
    # step than storage (DataExpr.scala:173,197 Sum/Count default to Avg;
    # :min/:max consolidate with themselves, :all with Sum)
    _CF_DEFAULT = {"sum": "avg", "count": "avg", "min": "min", "max": "max"}

    def _consolidate_cells(self, df: DataFrame, key_cols, cf: str) -> DataFrame:
        """Time-consolidate source-step cells onto the (coarser) ctx grid
        (DataExpr.scala:52-59 -> MapStepTimeSeq).  `avg` divides by the
        sub-interval count for RATE sources but by the non-null sample
        count for GAUGE sources (TimeSeq.scala:203-210: a temperature
        gauge reporting NaN, 90.0 must consolidate to 90.0, not 45.0).
        Missing cells are absent ROWS here, so plain AVG over present
        rows is exactly the gauge denominator."""
        m = self.ctx.step // self.source.step
        start = self.ctx.start
        tc = (
            F.lit(start)
            + ((F.col("t") - start) - (F.col("t") - start) % self.ctx.step)
        ).cast("long")
        grouped = df.groupBy(*key_cols, tc.alias("t"))
        if cf == "avg":
            if self.source.ds_type == "gauge":
                return grouped.agg(F.avg("value").alias("value"))
            return grouped.agg((F.sum("value") / F.lit(float(m))).alias("value"))
        return grouped.agg(_AGG[cf]("value").alias("value"))

    def _cheap_components(self, keys, cm: dict) -> dict | None:
        """Component grouping for RAW-path aggregations
        (`DatapointSource.raw_components`): per grouped tag key, the cheap
        component columns to group on and the label expression to apply
        AFTER the aggregate.  Moving label synthesis (string concat /
        format) past the aggregate runs it once per series cell instead of
        once per raw row — and the per-row work sits in the scan stage,
        which a single-row-group input serializes onto one task (guide
        §1.2; r16 A/B 1.05 s -> 0.92 s on the lineitem grouped-share
        shape).  Valid because every registered label is injective over
        its components, so the grouping is unchanged; returns None when no
        grouped key has a mapping (then label-column grouping is already
        cheapest)."""
        comp = getattr(self.source, "raw_components", None) or {}
        if not any(k in comp for k in keys):
            return None
        out = {}
        for k in keys:
            entry = comp.get(k)
            if entry is None:
                out[k] = ([cm[k]], F.col(cm[k]))
            else:
                cols, label_fn = entry
                out[k] = (list(cols), label_fn())
        return out

    def _eval_data(self, e: E.DataExpr) -> ResultFrame:
        off = getattr(e, "offset", 0)  # seconds
        if isinstance(e, E.GroupByExpr):
            off = e.af.offset
        offset = off // self.ctx.step  # whole steps
        ctx = self.ctx.with_offset(offset) if offset else self.ctx
        fn = e.af.fn if isinstance(e, E.GroupByExpr) else getattr(e, "fn", None)
        raw_base = (
            fn is not None
            and fn == self.source.raw_fold
            and self.source.raw_ranged is not None
            and not isinstance(e, E.AllExpr)
        )
        if raw_base:
            # the aggregation merges exactly like the ingest rollup
            # (sum-of-sums == sum; max-of-max == max): skip the
            # per-series ingest rollup shuffle
            base = self.source.raw_ranged(ctx.start, ctx.end)
        else:
            base = self.source.ranged_df(ctx.start, ctx.end)
        df = base.filter(query_to_column(e.query, self.source))
        if self.collect_stats:
            self.stat_frames.append(df)
        if offset:
            # report shifted data at the unshifted timestamp
            # (MemoryDatabase.scala:288-297)
            df = df.withColumn("t", (F.col("t") + offset * self.ctx.step).cast("long"))

        static = e.query.exact_keys()

        consolidating = self.ctx.step > self.source.step

        if isinstance(e, E.AllExpr):
            cm = dict(self.source.colmap)
            out = df.select(*cm.values(), "t", "value")
            if consolidating:
                out = self._consolidate_cells(out, list(cm.values()), "sum")
            return ResultFrame(out, None, cm, static)

        if isinstance(e, E.GroupByExpr):
            for k in e.keys:
                if k not in self.source.colmap:
                    # every series lacks the key -> empty result
                    # (DataExpr.scala:108-122)
                    empty = self.source.df.sparkSession.createDataFrame(
                        [],
                        ", ".join(
                            [f"{sanitize(k)} string" for k in e.keys]
                            + ["t long", "value double"]
                        ),
                    )
                    return ResultFrame(
                        empty, e.keys, {k: sanitize(k) for k in e.keys}, static
                    )
            cm = {k: self.source.colmap[k] for k in e.keys}
            cols = list(cm.values())
            cc = self._cheap_components(e.keys, cm) if raw_base else None
            if cc is not None:
                # group on components; null-drop on the component columns
                # (equivalent by the raw_components contract, and the
                # plain-column IsNotNull reaches the parquet scan instead
                # of re-evaluating the label per row); label per CELL
                gcols = [c for k in e.keys for c in cc[k][0]]
                for c in gcols:
                    df = df.filter(F.col(c).isNotNull())
                out = (
                    df.groupBy(*gcols, "t")
                    .agg(_AGG[e.af.fn]("value").alias("value"))
                    .select(
                        *[cc[k][1].alias(cm[k]) for k in e.keys], "t", "value"
                    )
                )
            else:
                for c in cols:
                    df = df.filter(F.col(c).isNotNull())
                out = df.groupBy(*cols, "t").agg(
                    _AGG[e.af.fn]("value").alias("value")
                )
            if consolidating:
                cf = e.af.cf or self._CF_DEFAULT[e.af.fn]
                out = self._consolidate_cells(out, cols, cf)
            return ResultFrame(out, e.keys, cm, static)

        assert isinstance(e, E.AggrExpr)
        out = df.groupBy("t").agg(_AGG[e.fn]("value").alias("value"))
        if consolidating:
            out = self._consolidate_cells(out, [], e.cf or self._CF_DEFAULT[e.fn])
        return ResultFrame(out, (), {}, static)

    # ------------------------------------------------------------ generators

    def _generator(self, value_col) -> ResultFrame:
        df = self.grid_df().withColumn("value", value_col.cast("double"))
        return ResultFrame(df, (), {}, {}, dense=True)

    def _time_col(self, mode: str):
        return time_value_col(mode)

    def _random_col(self, seed: int):
        # deterministic noise: hash of (seed + step index) -> [0, 1)
        # (MathExpr.scala:125-177 uses Hash.lowbias64; we use the top 60
        # bits of md5, which DuckDB computes identically — so :random has
        # a full value-level oracle, unlike an engine-specific hash)
        idx = ((F.col("t") / self.ctx.step).cast("long") + F.lit(seed)).cast("string")
        h = F.conv(F.substring(F.md5(idx), 1, 15), 16, 10).cast("long")
        return (F.pmod(h, F.lit(1000000)) / F.lit(1000000.0)).cast("double")

    def _eval_time_span(self, e: E.TimeSpanExpr) -> ResultFrame:
        from ..util.strings import time_range

        s, t_end = time_range(e.s, e.e, self.ctx, zone=e.zone)
        c = F.when(
            (F.col("t") >= F.lit(s)) & (F.col("t") <= F.lit(t_end)), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        return self._generator(c)

    # ------------------------------------------------------------ binary math

    # strict-null ops: a missing input always yields a missing output, so
    # evaluating them on the dense grid only manufactures rows that the
    # final null-drop discards — sparse inner join is equivalent and
    # skips the densification shuffles entirely
    _STRICT_OPS = frozenset({"mul", "div", "fmul", "fdiv", "fadd", "fsub"})

    # subset-side re-aggregation fn for the grouped-rollup rewrite:
    # count of raw rows == SUM of per-supergroup counts
    _ROLLUP2 = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    # non-strict comparison/boolean ops coalesce missing inputs to 0/1,
    # so their value is non-null at EVERY grid cell
    _SIGNAL_OPS = frozenset({"gt", "ge", "lt", "le", "and", "or"})
    # data-independent generator leaves: value is a pure column function
    # of t, defined (non-null) at every grid cell
    _GEN_TYPES = (E.ConstExpr, E.RandomExpr, E.TimeExpr, E.TimeSpanExpr)

    def _gen_col(self, g):
        """Generator leaf as a column over `t` (same expressions the
        standalone `_generator` path uses)."""
        if isinstance(g, E.ConstExpr):
            return F.lit(float(g.v))
        if isinstance(g, E.TimeExpr):
            return self._time_col(g.mode)
        if isinstance(g, E.RandomExpr):
            return self._random_col(g.seed)
        assert isinstance(g, E.TimeSpanExpr)
        from ..util.strings import time_range

        s, t_end = time_range(g.s, g.e, self.ctx, zone=g.zone)
        return F.when(
            (F.col("t") >= F.lit(s)) & (F.col("t") <= F.lit(t_end)), F.lit(1.0)
        ).otherwise(F.lit(0.0))

    def _try_common_base(self, e: E.BinaryMathExpr) -> ResultFrame | None:
        """Collapse a math tree whose every data leaf is the SAME subtree
        into one evaluation of that base plus column arithmetic — the
        macro family (`:stddev`, `:avg`, `:pct`, trig chains, signal
        bands) references its input 2-7 times via `:dup`/`:over`, and the
        generic path re-evaluates the whole base (scan + aggregate +
        shuffle) per reference and joins the copies (guide §2.4: remove
        shuffles outright; measured 7 scans / 15 exchanges for
        `:stddev`, 1 scan / 2 exchanges after).

        Shape: leaves are the base X (structurally equal everywhere),
        generators (:const/:pi/:time/:random/:time-span — pure column
        functions of t), and second-level aggregates
        (AggrMathExpr/MathGroupByExpr) whose inner is a pointwise chain
        over X.  Aggregates become window functions over X's frame (or
        one groupBy when no bare-X line-level leaf remains), everything
        else becomes nanmath column arithmetic — bit-identical per cell
        because both paths apply the same nanmath column functions and
        every join the generic path performs is 1:1 per cell (all sides
        derive from the same X).

        Row-presence semantics: a cell the generic path materializes
        with a NULL value and a cell this path omits are equivalent —
        the output null-drop (AslSpec.run / oracle drop_nulls) and every
        downstream consumer (null-skipping stats, densify-before-window)
        treat them identically.  Cells where the generic path produces
        NON-null values out of missing inputs (signal ops' 0.0,
        `pow(x,0)=1`, addNaN with a generator side) are reproduced by
        evaluating on the DENSIFIED base (`need_dense` below simulates,
        per cell, whether a missing base value can surface as a non-null
        result anywhere in the tree; one densify replaces the generic
        path's per-operand densifies).  The result keeps dense=False
        unless the root op is non-strict AND the frame is actually
        dense, so downstream densify never skips a fill it still needs.
        """
        bases: list[E.TimeSeriesExpr] = []
        state = {"refs": 0, "bare": False, "bail": False}
        agg_leaves: list[tuple] = []  # (leaf expr, fn, inner, part_keys)
        V_ABSENT, V_NULL, V_NONNULL = 0, 1, 2

        def scan(node, in_agg: bool) -> int:
            if state["bail"]:
                return V_ABSENT
            if isinstance(node, E.NamedRewrite):
                return scan(node.evaluated, in_agg)
            if isinstance(node, self._GEN_TYPES):
                state["gens"] = True
                return V_NONNULL
            if isinstance(node, E.UnaryMathExpr):
                return scan(node.expr, in_agg)
            if isinstance(node, E.BinaryMathExpr):
                lv = scan(node.lhs, in_agg)
                rv = scan(node.rhs, in_agg)
                op = node.op
                if op in self._STRICT_OPS:
                    if V_ABSENT in (lv, rv):
                        return V_ABSENT
                    if V_NULL in (lv, rv):
                        return V_NULL
                    return V_NONNULL
                if op in self._SIGNAL_OPS:
                    return V_NONNULL
                if op == "pow":
                    # pow(x, 0) == 1 even for missing x
                    return V_NONNULL if rv == V_NONNULL else V_NULL
                # add / sub: addNaN — missing side contributes nothing
                return V_NONNULL if V_NONNULL in (lv, rv) else V_NULL
            if isinstance(node, (E.AggrMathExpr, E.MathGroupByExpr)):
                if in_agg:  # nested second-level aggregates: generic path
                    state["bail"] = True
                    return V_ABSENT
                if isinstance(node, E.MathGroupByExpr):
                    fn, inner, keys = node.af.fn, node.af.expr, tuple(node.keys)
                else:
                    fn, inner, keys = node.fn, node.expr, ()
                if fn not in _AGG:
                    state["bail"] = True
                    return V_ABSENT
                n0 = state["refs"]
                iv = scan(inner, True)
                if state["refs"] == n0:  # aggregate over pure generators
                    state["bail"] = True
                    return V_ABSENT
                agg_leaves.append((node, fn, inner, keys))
                if iv == V_ABSENT:
                    return V_ABSENT
                if iv == V_NONNULL:
                    # absent lines surface as non-null values inside the
                    # aggregate input: only the densified frame shows the
                    # aggregate the same rows the generic path aggregates
                    state["force_dense"] = True
                    return V_NONNULL
                # null cells are skipped by sum/min/max; count() of an
                # all-null group is 0 — non-null — like the generic cell
                return V_NONNULL if fn == "count" else V_NULL
            # anything else is a data leaf: must be THE single base
            if bases and node != bases[0]:
                state["bail"] = True
                return V_ABSENT
            if not bases:
                bases.append(node)
            state["refs"] += 1
            if not in_agg:
                state["bare"] = True
            return V_ABSENT

        root_v = scan(e, False)
        if state["bail"] or not bases:
            return None
        # fire only when the collapse saves at least one join: a second
        # base reference, an aggregate leaf, or a generator side
        if state["refs"] < 2 and not agg_leaves and not state.get("gens"):
            return None
        need_dense = root_v == V_NONNULL or state.get("force_dense", False)

        rf = self._eval(bases[0])
        if rf.keys is None or rf.no_lines or rf.dense:
            return None  # :all / empty-placeholder / pre-dense: generic path
        if need_dense:
            rf = self.densify(rf)
        kc = rf.key_cols

        scalar_only = not state["bare"]
        if scalar_only:
            # every aggregate must share one partitioning for the single
            # groupBy; differing regroup keys fall back to the generic path
            part_sets = {keys for (_, _, _, keys) in agg_leaves}
            if len(part_sets) > 1:
                return None
            part_keys = next(iter(part_sets)) if part_sets else ()
            if any(k not in rf.colmap for k in part_keys):
                return None
        agg_cols: dict = {}

        def col(node, frame_keys=None):
            if isinstance(node, E.NamedRewrite):
                return col(node.evaluated)
            if isinstance(node, self._GEN_TYPES):
                return self._gen_col(node)
            if isinstance(node, E.UnaryMathExpr):
                c = col(node.expr)
                if node.op == "per-step":
                    return c * F.lit(float(self.ctx.step))
                return nanmath.unary_op(node.op, c, node.param)
            if isinstance(node, E.BinaryMathExpr):
                return nanmath.binary_op(node.op, col(node.lhs), col(node.rhs))
            if isinstance(node, (E.AggrMathExpr, E.MathGroupByExpr)):
                if node in agg_cols:
                    return agg_cols[node]
                if isinstance(node, E.MathGroupByExpr):
                    fn, inner, keys = node.af.fn, node.af.expr, tuple(node.keys)
                else:
                    fn, inner, keys = node.fn, node.expr, ()
                if scalar_only:
                    # filled in by the groupBy below
                    raise AssertionError("scalar agg resolved via groupBy")
                if any(k not in rf.colmap for k in keys):
                    raise _CommonBaseBail()
                pcols = [rf.colmap[k] for k in keys] + ["t"]
                c = _AGG[fn](col(inner)).over(Window.partitionBy(*pcols))
                agg_cols[node] = c
                return c
            return F.col("value")

        try:
            if scalar_only:
                # one aggregate column per DISTINCT aggregate leaf, one
                # groupBy, then scalar arithmetic over the aggregated frame
                distinct = []
                for leaf in agg_leaves:
                    if leaf[0] not in agg_cols:
                        alias = f"_cb{len(distinct)}"
                        agg_cols[leaf[0]] = F.col(alias)
                        distinct.append((alias, leaf))
                pcols = [rf.colmap[k] for k in part_keys]
                g = rf.df.groupBy(*pcols, "t").agg(
                    *[
                        _AGG[fn](col(inner)).alias(alias)
                        for alias, (_, fn, inner, _) in distinct
                    ]
                )
                value = col(e)
                out = g.select(*pcols, "t", value.cast("double").alias("value"))
                cm = {k: rf.colmap[k] for k in part_keys}
                dense_flag = False  # grouped output: cells at observed t's
                if need_dense and e.op not in self._STRICT_OPS:
                    dense_flag = True
                res = ResultFrame(
                    out, tuple(part_keys), cm, dict(rf.static_tags),
                    dense=dense_flag, no_lines=rf.no_lines,
                )
            else:
                value = col(e)
                out = rf.df.select(
                    *kc, "t", value.cast("double").alias("value")
                )
                keys = e.group_keys()
                cm = {k: rf.colmap[k] for k in keys}
                dense_flag = need_dense and e.op not in self._STRICT_OPS
                res = ResultFrame(
                    out, tuple(keys), cm, dict(rf.static_tags),
                    dense=dense_flag, no_lines=rf.no_lines,
                )
        except _CommonBaseBail:
            return None
        return res

    def _try_rollup_binary(self, e: E.BinaryMathExpr) -> ResultFrame | None:
        """`q,:f,(,K,),:by  OP  q,:f,(,k⊆K,),:by` (share-of-total shapes):
        the subset-side rollup is a re-aggregation of the superset-side
        aggregate, so derive it with a window over the SAME aggregated
        frame instead of scanning + shuffling the raw source twice and
        sort-merge-joining two aggregates.  Plan: one scan, one
        partial+final agg shuffle of combined data, one aggregate-sized
        window exchange — the shape that survives a 100x fact table,
        where the former second raw shuffle and SMJ dominated (PERF.md
        names the grouped `:div` join as the steepest scaler, 5.4x at
        100x rows).

        Only fires for STRICT ops (no densify on either side) when both
        sides aggregate the identical query with the identical
        decomposable fn/offset/cf.  The superset-only-key null drop
        (DataExpr.scala:108-122) is deferred until after the window:
        null-keyed rows form their own super-groups and still belong in
        the subset totals, exactly as the raw-side aggregation sees them.
        """
        if e.op not in self._STRICT_OPS:
            return None
        if self.ctx.step > self.source.step:
            return None  # generic path applies data-level consolidation
        for sup_e, sub_e, flipped in ((e.lhs, e.rhs, False), (e.rhs, e.lhs, True)):
            if not isinstance(sup_e, E.GroupByExpr):
                continue
            if isinstance(sub_e, E.GroupByExpr):
                sub_af, sub_keys = sub_e.af, sub_e.keys
            elif type(sub_e) is E.AggrExpr:
                sub_af, sub_keys = sub_e, ()
            else:
                continue
            if sub_af != sup_e.af or sub_e.query != sup_e.query:
                continue
            if sup_e.af.fn not in self._ROLLUP2:
                continue
            if not set(sub_keys) < set(sup_e.keys):
                continue
            if any(k not in self.source.colmap for k in sup_e.keys):
                return None  # empty-result path; generic code handles it
            return self._eval_rollup_binary(e, sup_e, tuple(sub_keys), flipped)
        return None

    def _eval_rollup_binary(
        self, e: E.BinaryMathExpr, sup_e: E.GroupByExpr, sub_keys: tuple, flipped: bool
    ) -> ResultFrame:
        offset = sup_e.af.offset // self.ctx.step
        ctx = self.ctx.with_offset(offset) if offset else self.ctx
        fn = sup_e.af.fn
        raw_base = fn == self.source.raw_fold and self.source.raw_ranged is not None
        if raw_base:
            # the aggregation merges exactly like the ingest rollup
            # (sum-of-sums == sum; max-of-max == max): skip the
            # per-series ingest rollup shuffle
            base = self.source.raw_ranged(ctx.start, ctx.end)
        else:
            base = self.source.ranged_df(ctx.start, ctx.end)
        df = base.filter(query_to_column(sup_e.query, self.source))
        if self.collect_stats:
            self.stat_frames.append(df)
        if offset:
            df = df.withColumn("t", (F.col("t") + offset * self.ctx.step).cast("long"))
        cm = {k: self.source.colmap[k] for k in sup_e.keys}
        sub_cols = [cm[k] for k in sub_keys]
        sup_cols = [cm[k] for k in sup_e.keys]
        # No explicit repartition before the aggregate: the groupBy's own
        # shuffle moves map-side PARTIAL aggregates (series-cell-sized),
        # while a raw repartition would ship every raw row — measured
        # slower at 10M rows and categorically wrong at 100 TB (an early
        # round used one to spread the single-row-group local scan; the
        # partial-agg path now wins at every scale tested).
        cc = self._cheap_components(sup_e.keys, cm) if raw_base else None
        if cc is not None:
            # group + window on components; synthesize labels per cell at
            # the end (see _cheap_components).  Null drops act on the
            # component columns — equivalent by the raw_components
            # contract, and plain-column IsNotNull reaches the scan.
            sub_gcols = [c for k in sub_keys for c in cc[k][0]]
            for c in sub_gcols:
                df = df.filter(F.col(c).isNotNull())
            gcols = [c for k in sup_e.keys for c in cc[k][0]]
            agg = df.groupBy(*gcols, "t").agg(_AGG[fn]("value").alias("_v_sup"))
            w = Window.partitionBy(*sub_gcols, "t")
            total = _AGG[self._ROLLUP2[fn]]("_v_sup").over(w)
            joined = agg.select(*gcols, "t", "_v_sup", total.alias("_v_sub"))
            for k in sup_e.keys:
                if k not in sub_keys:
                    for c in cc[k][0]:
                        joined = joined.filter(F.col(c).isNotNull())
            a = F.col("_v_sub") if flipped else F.col("_v_sup")
            b = F.col("_v_sup") if flipped else F.col("_v_sub")
            value = nanmath.binary_op(e.op, a, b)
            out = joined.select(
                *[cc[k][1].alias(cm[k]) for k in sup_e.keys],
                "t",
                value.alias("value"),
            )
            return ResultFrame(out, sup_e.keys, cm, dict(sup_e.query.exact_keys()))
        for c in sub_cols:
            df = df.filter(F.col(c).isNotNull())
        agg = df.groupBy(*sup_cols, "t").agg(_AGG[fn]("value").alias("_v_sup"))
        w = Window.partitionBy(*sub_cols, "t")
        total = _AGG[self._ROLLUP2[fn]]("_v_sup").over(w)
        joined = agg.select(*sup_cols, "t", "_v_sup", total.alias("_v_sub"))
        for k in sup_e.keys:
            if k not in sub_keys:
                joined = joined.filter(F.col(cm[k]).isNotNull())
        a = F.col("_v_sub") if flipped else F.col("_v_sup")
        b = F.col("_v_sup") if flipped else F.col("_v_sub")
        value = nanmath.binary_op(e.op, a, b)
        out = joined.select(*sup_cols, "t", value.alias("value"))
        return ResultFrame(out, sup_e.keys, cm, dict(sup_e.query.exact_keys()))

    def _try_condagg_binary(self, e: E.BinaryMathExpr) -> ResultFrame | None:
        """`q1,:f1,(,K,),:by  OP  q2,:f2,(,K,),:by` (equal key SETS,
        possibly different queries/fns): both aggregates derive from ONE
        scan with conditional aggregation — `f1(value WHERE q1)`,
        `f2(value WHERE q2)` per (K, t) cell over rows matching either
        query — instead of two scans, two shuffles, and a join.  Strict
        ops only: a cell must have rows from BOTH queries (the generic
        path's inner join), which the post-agg null filter reproduces —
        `fN(value WHERE qN)` is null exactly when side N contributed no
        rows (count uses nullif(.., 0) for the same reason).  At scale
        this halves raw-scan volume and removes a join for the
        compare-two-signals family (`a,:sum,b,:sum,:fsub` etc.).
        """
        if e.op not in self._STRICT_OPS:
            return None
        if self.ctx.step > self.source.step:
            return None  # generic path applies data-level consolidation
        sides = []
        for s in (e.lhs, e.rhs):
            if isinstance(s, E.GroupByExpr):
                if s.af.offset or s.af.cf is not None:
                    return None
                sides.append((s.query, s.af.fn, tuple(s.keys)))
            elif type(s) is E.AggrExpr:
                if s.offset or s.cf is not None:
                    return None
                sides.append((s.query, s.fn, ()))
            else:
                return None
        (q1, f1, k1), (q2, f2, k2) = sides
        if set(k1) != set(k2):
            return None  # proper-subset shapes: rollup rewrite / generic
        if f1 not in ("sum", "count", "min", "max") or f2 not in (
            "sum", "count", "min", "max"
        ):
            return None
        if any(k not in self.source.colmap for k in k1):
            return None  # empty-result path; generic code handles it
        # base choice mirrors _eval_data: the raw-scan shortcut is only
        # sum-exact, so a non-sum side forces the rolled-up view (sum over
        # the rollup is still exact — sum-of-sums)
        raw_base = f1 == f2 == "sum" and self.source.raw_ranged is not None
        if raw_base:
            base = self.source.raw_ranged(self.ctx.start, self.ctx.end)
        else:
            base = self.source.ranged_df(self.ctx.start, self.ctx.end)
        c1 = query_to_column(q1, self.source)
        c2 = query_to_column(q2, self.source)
        df = base.filter(c1 | c2)
        if self.collect_stats:
            self.stat_frames.append(df)
        cm = {k: self.source.colmap[k] for k in k1}

        def side(fn, cond, alias):
            col = F.when(cond, F.col("value"))
            if fn == "count":
                return F.nullif(F.count(col), F.lit(0)).alias(alias)
            return _AGG[fn](col).alias(alias)

        # output key order follows the rhs (the generic path's `sup` for
        # equal key sets)
        out_keys = k2 if k2 else k1
        out_cols = [cm[k] for k in out_keys]
        cc = self._cheap_components(out_keys, cm) if raw_base else None
        if cc is not None:
            # group on components; key-null-drop on component columns
            # (equivalent by the raw_components contract); label per CELL
            gcols = [c for k in out_keys for c in cc[k][0]]
            for c in gcols:
                df = df.filter(F.col(c).isNotNull())
            g = (
                df.groupBy(*gcols, "t")
                .agg(side(f1, c1, "_v1"), side(f2, c2, "_v2"))
                .filter(F.col("_v1").isNotNull() & F.col("_v2").isNotNull())
            )
            value = nanmath.binary_op(e.op, F.col("_v1"), F.col("_v2"))
            out = g.select(
                *[cc[k][1].alias(cm[k]) for k in out_keys],
                "t",
                value.alias("value"),
            )
        else:
            for c in cm.values():
                df = df.filter(F.col(c).isNotNull())
            g = (
                df.groupBy(*out_cols, "t")
                .agg(side(f1, c1, "_v1"), side(f2, c2, "_v2"))
                .filter(F.col("_v1").isNotNull() & F.col("_v2").isNotNull())
            )
            value = nanmath.binary_op(e.op, F.col("_v1"), F.col("_v2"))
            out = g.select(*out_cols, "t", value.alias("value"))
        static = dict(q1.exact_keys())
        static.update(q2.exact_keys())
        return ResultFrame(out, out_keys, cm, static)

    def _eval_binary(self, e: E.BinaryMathExpr) -> ResultFrame:
        rw = (
            self._try_common_base(e)
            or self._try_rollup_binary(e)
            or self._try_condagg_binary(e)
        )
        if rw is not None:
            return rw
        lhs, rhs = self._eval(e.lhs), self._eval(e.rhs)
        if lhs.keys is None or rhs.keys is None:
            raise ValueError(":all results cannot be used in binary math")
        if e.op not in self._STRICT_OPS:
            # non-strict ops are defined at every grid point (NaN :gt 0 -> 0,
            # NaN :add x -> x), so both sides must be dense
            lhs, rhs = self.densify(lhs), self.densify(rhs)

        s1, s2 = set(lhs.keys), set(rhs.keys)
        if s1 <= s2:
            sup, sub, flipped = rhs, lhs, True
        elif s2 <= s1:
            sup, sub, flipped = lhs, rhs, False
        else:  # unreachable: validated at AST construction
            raise ValueError("incompatible groupings")

        common = [k for k in sub.keys]
        sup_df = sup.df.select(
            *[F.col(sup.colmap[k]).alias(sup.colmap[k]) for k in sup.keys],
            "t",
            F.col("value").alias("_v_sup"),
        )
        sub_cols = [F.col(sub.colmap[k]).alias(sup.colmap[k]) for k in common]
        sub_df = sub.df.select(*sub_cols, "t", F.col("value").alias("_v_sub"))
        if not common:
            # ungrouped side joins on time only; broadcast it (one row per t)
            sub_df = F.broadcast(sub_df)
        join_on = [sup.colmap[k] for k in common] + ["t"]
        # opt-in salting for CELL-SPACE skew (scripts/vol_skew_grouped.py
        # finding B): a hot common key whose superset side carries a large
        # share of the aggregate cells lands that share in ONE join
        # partition, and AQE cannot split it — the subset side's exchange
        # IS its final-aggregate distribution.  With saltPartitions=K the
        # superset rows spread over K sub-partitions by a hash of their
        # EXTRA key columns (deterministic, so values are unchanged), and
        # the subset side replicates K ways — bounded, it is the smaller
        # aggregate by construction.  The join stays 1:1 per superset
        # cell, so no post-join merge is needed.  Off by default: the
        # extra exchange width only pays for itself on a skewed corpus.
        extra = [k for k in sup.keys if k not in set(common)]
        salt_n = int(
            sup.df.sparkSession.conf.get("spark.atlas.binary.saltPartitions", "0")
        )
        if common and extra and salt_n > 1:
            salt = F.pmod(
                F.xxhash64(*[F.col(sup.colmap[k]) for k in extra]), F.lit(salt_n)
            ).cast("int")
            sup_df = sup_df.withColumn("_salt", salt)
            sub_df = sub_df.withColumn(
                "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
            )
            join_on = [sup.colmap[k] for k in common] + ["_salt", "t"]
        # inner join: lines whose common key has no match on the other side
        # are dropped (MathExpr.scala:552-575 "case null => Nil")
        joined = sup_df.join(sub_df, on=join_on, how="inner")

        a = F.col("_v_sub") if flipped else F.col("_v_sup")
        b = F.col("_v_sup") if flipped else F.col("_v_sub")
        value = nanmath.binary_op(e.op, a, b)
        out = joined.select(
            *[sup.colmap[k] for k in sup.keys], "t", value.alias("value")
        )
        static = dict(sub.static_tags)
        static.update(sup.static_tags)
        dense = e.op not in self._STRICT_OPS
        return ResultFrame(
            out, sup.keys, dict(sup.colmap), static, dense=dense,
            no_lines=lhs.no_lines or rhs.no_lines,
        )

    # ----------------------------------------------- second-level aggregation

    def _eval_aggr_math(self, e: E.AggrMathExpr) -> ResultFrame:
        rf = self._eval(e.expr)
        # pointwise fold of all lines (MathExpr.scala:711-794); null-skipping
        # aggregate == addNaN fold
        out = rf.df.groupBy("t").agg(_AGG[e.fn]("value").alias("value"))
        return ResultFrame(
            out, (), {}, dict(rf.static_tags), dense=rf.dense, no_lines=rf.no_lines
        )

    def _eval_math_group_by(self, e: E.MathGroupByExpr) -> ResultFrame:
        rf = self._eval(e.af.expr)
        cm = {k: rf.colmap[k] for k in e.keys}
        out = rf.df.groupBy(*cm.values(), "t").agg(
            _AGG[e.af.fn]("value").alias("value")
        )
        return ResultFrame(out, e.keys, cm, dict(rf.static_tags), dense=rf.dense)

    def _eval_as(self, e: E.AsExpr) -> ResultFrame:
        rf = self._eval(e.expr)
        if e.orig not in rf.colmap:
            return rf
        new_col = sanitize(e.repl)
        df = rf.df.withColumnRenamed(rf.colmap[e.orig], new_col)
        cm = {(e.repl if k == e.orig else k): (new_col if k == e.orig else v) for k, v in rf.colmap.items()}
        keys = rf.keys if rf.keys is None else tuple(e.repl if k == e.orig else k for k in rf.keys)
        return ResultFrame(df, keys, cm, dict(rf.static_tags), dense=rf.dense)

    # -------------------------------------------------------------- stateful

    def _eval_stateful(self, e: E.StatefulMathExpr) -> ResultFrame:
        rf = self.densify(self._eval(e.expr))
        kc = rf.key_cols
        w = Window.partitionBy(*[F.col(c) for c in kc]) if kc else Window.partitionBy(F.lit(1))
        w = w.orderBy("t")
        v = F.col("value")
        p = e.params
        op = e.op

        if op == "delay":
            n = int(p[0])
            out = F.lag(v, n).over(w)
        elif op == "rolling-count":
            n = int(p[0])
            out = F.sum(nanmath.truthy(v).cast("int")).over(w.rowsBetween(-(n - 1), 0)).cast("double")
        elif op == "rolling-min":
            n = int(p[0])
            out = F.min(v).over(w.rowsBetween(-(int(p[0]) - 1), 0))
        elif op == "rolling-max":
            out = F.max(v).over(w.rowsBetween(-(int(p[0]) - 1), 0))
        elif op == "rolling-mean":
            n, min_n = int(p[0]), int(p[1])
            ww = w.rowsBetween(-(n - 1), 0)
            out = F.when(F.count(v).over(ww) >= min_n, F.avg(v).over(ww))
        elif op == "rolling-sum":
            out = F.sum(v).over(w.rowsBetween(-(int(p[0]) - 1), 0))
        elif op == "trend":
            # moving SUM divided by the window SIZE (not the non-NaN count),
            # NaN until the window has fully filled (OnlineTrend.scala:33-49)
            n = max(1, int(p[0]) // self.ctx.step)
            ww = w.rowsBetween(-(n - 1), 0)
            out = F.when(
                (F.count("*").over(ww) >= n) & (F.count(v).over(ww) > 0),
                F.sum(v).over(ww) / F.lit(float(n)),
            )
        elif op == "integral":
            out = F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0))
        elif op == "cumulative-max":
            out = F.max(v).over(w.rowsBetween(Window.unboundedPreceding, 0))
        elif op == "derivative":
            out = v - F.lag(v, 1).over(w)
        elif op in ("des", "sdes"):
            return self._eval_des(e, rf)
        else:
            raise ValueError(f"unknown stateful op {op}")

        df = rf.df.withColumn("value", out.cast("double"))
        return replace(rf, df=df)

    def _eval_des(self, e: E.StatefulMathExpr, rf: ResultFrame) -> ResultFrame:
        """Double exponential smoothing via applyInPandas per series
        (OnlineDes.scala / OnlineSlidingDes.scala recurrences)."""
        import pandas as pd

        n, alpha, beta = int(e.params[0]), float(e.params[1]), float(e.params[2])
        sliding = e.op == "sdes"
        kc = rf.key_cols
        # the kernel writes smoothed DOUBLES: an integer-typed input (a
        # bare `:count` aggregate) would make Arrow reject the output
        # batch ("float truncated converting to int64"), so normalize to
        # the reference's all-double value model first
        rf = replace(rf, df=rf.df.withColumn("value", F.col("value").cast("double")))
        # warm-up rows are null even when the input column is non-nullable
        # (e.g. a :const generator), so relax nullability for the Arrow batch
        schema = T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in rf.df.schema.fields]
        )

        def des(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            pdf = pdf.sort_values("t").reset_index(drop=True)
            vals = pdf["value"].to_numpy(dtype=float)
            out = _des_kernel(vals, n, alpha, beta, sliding)
            # NaN -> null: "no data" is null in the engine (SURVEY §4.3 #1)
            pdf["value"] = [None if np.isnan(x) else float(x) for x in out]
            return pdf

        if kc:
            df = rf.df.groupBy(*kc).applyInPandas(des, schema=schema)
        else:
            df = rf.df.withColumn("_g", F.lit(1)).groupBy("_g").applyInPandas(
                lambda pdf: des(pdf.drop(columns=["_g"])), schema=schema
            )
        return replace(rf, df=df)

    # ------------------------------------------------------- sketch operators

    def _pct_indexed(self, e) -> tuple[DataFrame, list[str]]:
        """Common prep for bucket-counter estimators: decode the hex bucket
        index and attach the bucket boundary value (broadcast array lookup,
        stays in codegen)."""
        from ..functions.percentile_buckets import BOUNDARIES, N_BUCKETS

        inner = self._eval(e.expr)
        pcol = inner.colmap["percentile"]
        ek_cols = [inner.colmap[k] for k in e.eval_keys()]
        # single-string expressions: the per-Column py4j round-trips of
        # the former filter/withColumn chain were pure driver latency
        # (guide §1 measure-first; r16 build profile) — the resolved plan
        # is identical
        df = inner.df.filter(
            F.expr(f"{pcol} IS NOT NULL AND value IS NOT NULL AND value > 0")
        )
        idx = f"CAST(conv(substring({pcol}, 2, 4), 16, 10) AS INT)"
        df = df.select(
            "*",
            F.expr(f"least({idx}, {N_BUCKETS - 1}) AS _idx"),
            F.expr(f"substring({pcol}, 1, 1) = 'T' AS _timer"),
        ).withColumn(
            "_bval", F.expr(f"element_at({_boundary_array_sql()}, _idx + 1)")
        )
        return df, ek_cols

    def _eval_percentiles(self, e: E.PercentilesExpr) -> ResultFrame:
        """Histogram percentile estimation entirely with window functions —
        rank walk + linear interpolation inside the crossing bucket
        (MathExpr.scala:992-1010), no Python in the loop."""
        from ..functions.percentile_buckets import pct_label

        df, ek_cols = self._pct_indexed(e)
        # whole stage as SQL strings — one py4j round-trip per select /
        # agg instead of one per Column operator (~0.4 s of driver build
        # latency per :percentiles query, r16 profile); identical plan
        part_sql = ", ".join([*ek_cols, "t"])
        # Lower bound for interpolation is the PREVIOUS BOUNDARY by bucket
        # index (Spectator walks every bucket, so empty buckets still advance
        # the boundary) — NOT the previous non-empty row.  element_at is
        # 1-based: element_at(barr, _idx) == BOUNDARIES[_idx - 1].
        df = df.select(
            "*",
            F.expr(
                f"sum(value) OVER (PARTITION BY {part_sql} ORDER BY _idx"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum"
            ),
            F.expr(f"sum(value) OVER (PARTITION BY {part_sql}) AS _total"),
            F.expr(
                "CASE WHEN _idx = 0 THEN 0.0D ELSE"
                f" element_at({_boundary_array_sql()}, _idx) END AS _prev_b"
            ),
        ).select(
            "*",
            F.expr("100.0D * (_cum - value) / _total AS _prev_p"),
            F.expr("100.0D * _cum / _total AS _next_p"),
        )

        pcts = sorted(set(e.pcts))
        # First crossing bucket per percentile (while-loop order in the
        # reference) via min_by over the bucket index — one hash aggregate
        # that REUSES the window stage's (keys, t) partitioning, instead of
        # a broadcast crossjoin with the pct list + a second exchange and
        # sort for a row_number rank.  The pct list is a plan-time literal.
        aggs = [F.expr("first(_timer) AS _timer")]
        for i, p in enumerate(pcts):
            aggs.append(
                F.expr(
                    "min_by(struct(_prev_p, _next_p, _prev_b, _bval),"
                    f" CASE WHEN _prev_p <= {float(p)!r}D AND {float(p)!r}D <= _next_p"
                    f" THEN _idx END) AS _c{i}"
                )
            )
        g = df.groupBy(*[F.col(c) for c in ek_cols], F.col("t")).agg(*aggs)
        stack_sql = ", ".join(
            f"'{pct_label(p)}', {float(p)!r}D, _c{i}" for i, p in enumerate(pcts)
        )
        g = g.select(
            *ek_cols,
            "t",
            "_timer",
            F.expr(
                f"stack({len(pcts)}, {stack_sql}) AS (k_percentile, _p, _c)"
            ),
        )
        est_sql = (
            "_c._prev_b + (CASE WHEN _c._next_p = _c._prev_p THEN 0.0D"
            " ELSE (_p - _c._prev_p) / (_c._next_p - _c._prev_p) END)"
            " * (_c._bval - _c._prev_b)"
        )
        out = g.select(
            *ek_cols,
            "k_percentile",
            "t",
            F.expr(
                f"CASE WHEN _timer THEN ({est_sql}) * 1e-09D ELSE {est_sql} END"
                " AS value"
            ),
        )
        cm = {k: self.source.colmap.get(k, sanitize(k)) for k in e.eval_keys()}
        cm["percentile"] = "k_percentile"
        return ResultFrame(out, e.group_keys(), cm, e.expr.query.exact_keys())

    def _eval_approx_distinct(self, e: E.ApproxDistinctExpr) -> ResultFrame:
        """HLL estimator over max-rho registers, one hash-agg per interval
        (MathExpr.scala:1053-1181; estimator formula in
        functions/distinct_sketch.py) — all JVM-side."""
        from ..functions.distinct_sketch import ALPHA, M

        inner = self._eval(e.expr)
        dcol = inner.colmap["distinct"]
        ek_cols = [inner.colmap[k] for k in e.eval_keys()]
        df = inner.df.filter(
            F.col(dcol).isNotNull() & F.col("value").isNotNull() & (F.col("value") > 0)
        )
        agg = df.groupBy(*ek_cols, "t").agg(
            F.sum(F.pow(F.lit(2.0), -F.col("value"))).alias("_sp"),
            F.count("*").alias("_n"),
        )
        sum_pow = F.col("_sp") + (F.lit(M) - F.col("_n"))
        zeros = F.lit(M) - F.col("_n")
        e_raw = F.lit(ALPHA * M * M) / sum_pow
        est = F.when(
            (e_raw <= 2.5 * M) & (zeros > 0), F.lit(M) * F.log(F.lit(float(M)) / zeros)
        ).otherwise(e_raw)
        out = agg.select(*ek_cols, "t", est.alias("value"))
        cm = {k: inner.colmap[k] for k in e.eval_keys()}
        return ResultFrame(out, e.eval_keys(), cm, dict(inner.static_tags))

    def _eval_sample_count(self, e: E.SampleCountExpr) -> ResultFrame:
        """Sum of counts for buckets whose range lies within [lo, hi)
        (MathVocabulary.scala:1361-1404)."""
        from ..functions.percentile_buckets import index_of
        import math as _math

        df, ek_cols = self._pct_indexed(e)
        lo_idx = index_of(_math.ceil(e.lo)) if e.lo > 0 else 0
        hi_idx = index_of(_math.ceil(e.hi)) if _math.isfinite(e.hi) else 1 << 30
        # Keep the bucket-range filter at CELL level (the reference
        # filters the series set, MathVocabulary.scala:1373): `_idx` is
        # parsed from the label, and an unguarded range conjunct is
        # deterministic, so Catalyst pushes it through the (fused)
        # rollup aggregate and inlines format_string -> conv(substring)
        # per RAW row, twice — java.util.Formatter per event was
        # measured at 4-5x the whole query (1.8 s vs 0.4 s at sf0.1).
        # Guarding on the aggregated `value` pins the filter above the
        # rollup; semantics unchanged (_pct_indexed already drops
        # value IS NULL rows), and the cell count a step holds is
        # bounded by the bucket count, so the un-pushed filter costs
        # O(buckets x steps), not O(events), at every scale.
        guarded = F.when(F.col("value").isNotNull(), F.col("_idx"))
        df = df.filter((guarded >= lo_idx) & (guarded < hi_idx))
        out = df.groupBy(*ek_cols, "t").agg(F.sum("value").alias("value"))
        cm = {k: self.source.colmap.get(k, sanitize(k)) for k in e.eval_keys()}
        return ResultFrame(out, e.eval_keys(), cm, e.expr.query.exact_keys())

    # ------------------------------------------------------------ filter ops

    def _eval_stat(self, e: E.StatExpr) -> ResultFrame:
        rf = self._eval(e.expr)
        kc = rf.key_cols
        w = Window.partitionBy(*[F.col(c) for c in kc]) if kc else Window.partitionBy(F.lit(1))
        w = w.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        stat = _STAT_FUNS[e.stat](F.col("value")).over(w)
        df = rf.df.withColumn("value", stat.cast("double"))
        return replace(rf, df=df)

    def _resolve_placeholders(self, pred: E.TimeSeriesExpr, base: E.TimeSeriesExpr) -> E.TimeSeriesExpr:
        """Substitute `:stat-*` placeholders with the stat of the filtered
        expression (FilterVocabulary.scala:166-226)."""
        if isinstance(pred, E.StatPlaceholder):
            return E.StatExpr(base, pred.stat)
        if isinstance(pred, E.BinaryMathExpr):
            return E.BinaryMathExpr(
                pred.op,
                self._resolve_placeholders(pred.lhs, base),
                self._resolve_placeholders(pred.rhs, base),
            )
        if isinstance(pred, E.UnaryMathExpr):
            return E.UnaryMathExpr(pred.op, self._resolve_placeholders(pred.expr, base), pred.param)
        return pred

    def _eval_filter(self, e: E.FilterOpExpr) -> ResultFrame:
        pred = self._resolve_placeholders(e.pred, e.expr)
        rf = self._eval(e.expr)
        pf = self._eval(pred)
        truthy_rows = pf.df.filter(nanmath.truthy(F.col("value")))
        if pf.keys:  # keep groups whose pred line is truthy anywhere
            keep = truthy_rows.select(
                *[F.col(pf.colmap[k]).alias(rf.colmap[k]) for k in pf.keys]
            ).distinct()
            df = rf.df.join(F.broadcast(keep), on=[rf.colmap[k] for k in pf.keys], how="left_semi")
            return replace(rf, df=df)
        # ungrouped predicate: keep everything iff any point is truthy
        df = rf.df.join(
            F.broadcast(truthy_rows.select(F.lit(1).alias("_keep")).limit(1)), how="cross"
        ).drop("_keep")
        return replace(rf, df=df)

    def _eval_topk(self, e: E.TopKExpr) -> ResultFrame:
        rf = self._eval(e.expr)
        kc = rf.key_cols
        if not kc:
            return rf
        # the line frame feeds the per-key stat AND the join-back below —
        # persist so the upstream aggregation (and its scan) runs once
        rf = replace(rf, df=self._mark_reused(rf.df))
        stats = rf.df.groupBy(*kc).agg(_STAT_FUNS[e.stat](F.col("value")).alias("_stat"))
        order = [F.col("_stat").asc_nulls_last() if e.bottom else F.col("_stat").desc_nulls_last()]
        order += [F.col(c).asc() for c in kc]  # deterministic tie-break
        # orderBy().limit() compiles to TakeOrderedAndProject — partial
        # per-partition top-k then a k-row merge, never a global
        # single-partition window sort
        top = stats.orderBy(*order).limit(e.k).select(*kc)
        if not e.others:
            kept = rf.df.join(F.broadcast(top), on=kc, how="left_semi")
            return replace(rf, df=kept)
        # single pass for the -others- variants: mark top keys with one
        # broadcast join, fold everything else into the --others-- line in
        # the same aggregation (a kept series is a single row per (keys, t),
        # so the agg fn is identity on it) — the upstream is scanned once
        marked = rf.df.join(
            F.broadcast(top.withColumn("_in", F.lit(1))), on=kc, how="left"
        )
        out_keys = [
            F.when(F.col("_in") == 1, F.col(c)).otherwise(F.lit("--others--")).alias(c)
            for c in kc
        ]
        df = (
            marked.select(*out_keys, "t", "value")
            .groupBy(*kc, "t")
            .agg(_AGG[e.others]("value").alias("value"))
        )
        return replace(rf, df=df)

    def _eval_consolidate(self, e: E.ConsolidateExpr) -> ResultFrame:
        rf = self._eval(e.expr)
        m = e.multiple
        new_step = m * self.ctx.step
        start = self.ctx.start
        tc = (F.lit(start) + ((F.col("t") - start) - (F.col("t") - start) % new_step)).cast("long")
        kc = rf.key_cols
        grouped = rf.df.groupBy(*kc, tc.alias("t"))
        if e.cf == "avg":
            if self.source.ds_type == "gauge":
                # gauge: divide by the NON-NULL sample count, not the
                # sub-interval count — a sampled gauge reporting NaN, 90.0
                # must consolidate to 90.0, not 45.0 (TimeSeq.scala:203-210)
                df = grouped.agg(F.avg("value").alias("value"))
            else:
                # rate: average over the ENTIRE interval, dividing by the
                # number of sub-intervals
                # (ConsolidationFunction.scala:56-80, TimeSeq.scala:189-214)
                df = grouped.agg((F.sum("value") / F.lit(float(m))).alias("value"))
        else:
            df = grouped.agg(_AGG[e.cf]("value").alias("value"))
        return replace(rf, df=df, dense=False)

    # ----------------------------------------------------------------- style

    def _eval_style(self, e: E.StyleExpr) -> ResultFrame:
        rf = self._eval(e.expr)
        s = e.settings_dict()
        if "limit" in s:
            # :sort/:order without :limit only affects presentation order
            # (row order is not part of the result set); :limit selects the
            # first N keys under that order via TakeOrderedAndProject
            stat = s.get("sort", "max")
            desc = s.get("order", "desc") != "asc"
            kc = rf.key_cols
            if kc:
                rf = replace(rf, df=self._mark_reused(rf.df))
                stats = rf.df.groupBy(*kc).agg(_STAT_FUNS.get(stat, F.max)(F.col("value")).alias("_stat"))
                order = [F.col("_stat").desc_nulls_last() if desc else F.col("_stat").asc_nulls_last()]
                order += [F.col(c).asc() for c in kc]
                top = stats.orderBy(*order).limit(int(s["limit"])).select(*kc)
                kept = rf.df.join(F.broadcast(top), on=kc, how="left_semi")
                rf = replace(rf, df=kept)
        return rf


class _Des:
    """Faithful port of the reference recurrence (OnlineDes.scala:28-52):
    emits the *previous* smoothed value once `training` non-NaN samples
    have been seen; NaN inputs do not advance the sample count."""

    def __init__(self, training: int, alpha: float, beta: float):
        self.training = training
        self.alpha = alpha
        self.beta = beta
        self.reset()

    def reset(self):
        self.current = 0
        self.sp = float("nan")
        self.bp = 0.0

    def next(self, v: float) -> float:
        import math

        ret = self.sp if self.current >= self.training else float("nan")
        if not math.isnan(v):
            if self.current == 0:
                self.sp, self.bp = v, 0.0
            else:
                sn = self.alpha * v + (1 - self.alpha) * (self.sp + self.bp)
                self.bp = self.beta * (sn - self.sp) + (1 - self.beta) * self.bp
                self.sp = sn
            self.current += 1
        return ret


def _des_kernel(vals, n: int, alpha: float, beta: float, sliding: bool):
    """DES / sliding DES over one series.  Sliding (OnlineSlidingDes.scala):
    two DES instances fed every value; the active one is reset and swapped
    every `n` samples, bounding the training-history dependence."""
    import numpy as np

    out = np.full(len(vals), np.nan)
    if not sliding:
        d = _Des(n, alpha, beta)
        for i, v in enumerate(vals):
            out[i] = d.next(v)
        return out
    d1, d2 = _Des(n, alpha, beta), _Des(n, alpha, beta)
    use_one = True
    cs = 0
    for i, v in enumerate(vals):
        cs += 1
        v1, v2 = d1.next(v), d2.next(v)
        out[i] = v1 if use_one else v2
        if cs % n == 0:
            (d1 if use_one else d2).reset()
            use_one = not use_one
    return out
