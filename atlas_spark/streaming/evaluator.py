"""Streaming expression evaluator.

Spark-first mirror of the reference's streaming path (entry point C,
SURVEY §3.3):

  reference                         | this engine
  ----------------------------------+----------------------------------
  TimeGrouped rolling buffers        | tumbling `window(step)` +
  (flush on evict, late -> dropped)  | `withWatermark(num_buffers*step)`
  publisher partial aggregates       | Spark streaming partial agg
  (AggrDatapoint merge)              | (map-side combine per micro-batch)
  FinalExprEval per time bucket      | `foreachBatch` running the batch
  (carries stateful-op state)        | planner over a rolling lookback
                                     | buffer of finalized intervals

The expression is evaluated per finalized step interval; stateful
operators (rolling windows, DES) see a bounded lookback of previously
finalized intervals so their values match the batch evaluation exactly
once an interval is final.  Late data beyond the watermark is dropped by
Spark, mirroring TimeGrouped's `droppedOld` behavior
(`atlas-eval/.../stream/TimeGrouped.scala:89-141`).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import nanmath
from ..model import expr as E
from ..plans.builder import Evaluator, query_to_column
from ..plans.context import EvalContext
from ..sources.datapoints import DatapointSource
from ..stacklang.vocab import parse as parse_asl
from .stateful import stateful_stream, stateful_stream_tws

_SERIES_SEP = "\x1f"
_NO_KEY = "__all__"

# ops executable in the executor-side state store (stateful.py kernel)
_STATE_OPS = frozenset(
    {
        "delay", "rolling-count", "rolling-min", "rolling-max",
        "rolling-sum", "rolling-mean", "derivative", "integral",
        "cumulative-max", "trend", "des", "sdes",
    }
)


@dataclass(frozen=True)
class _StatePlan:
    """Decomposition of an ASL tree into the state-store streaming shape:
    a core (data aggregation, or a binary-math join of two sub-plans with
    identical group keys) -> alternating stateless / stateful op groups.
    Each stateful op becomes its own chained streaming stage, and each
    join side spools before the stream-stream join (parquet spool between
    stages — Spark forbids `applyInPandasWithState` or a join downstream
    of a streaming agg / another stateful op in one query)."""

    core: tuple  # ("agg", query, fn) | ("join", op, left_plan, right_plan)
    keys: tuple[str, ...]
    chain: tuple  # ((op, params), ...) stateful ops, innermost-first
    steps: tuple  # len(chain)+1 stateless step groups, innermost-first:
    #               steps[0] before chain[0], steps[i] between chain[i-1]
    #               and chain[i]; ALL groups apply in-stream
    renames: tuple = ()  # ((orig_key, new_key), ...) from outermost `:as`
    #               wrappers — keys keep their SOURCE names through the
    #               plan (key_cols lookups) and rename only at emission,
    #               matching the batch ResultFrame's display-level rename
    consolidate: tuple | None = None  # outermost (cf, multiple): a second
    #               watermarked window stage regroups finalized intervals
    #               onto the coarser grid (cells align to the EPOCH, so
    #               batch parity requires an ns-aligned eval start)


def _is_gen(x) -> bool:
    """Generator SUBTREES that are pure functions of the interval-start t
    — computable in-stream as a projection (no data, no state).  Math
    over generators is itself a generator, so macro shapes like `:cos`
    (sin(pi/2 - x)) peel cleanly instead of forcing the buffered path."""
    if isinstance(x, E.NamedRewrite):
        return _is_gen(x.evaluated)
    if isinstance(x, (E.ConstExpr, E.TimeExpr, E.RandomExpr)):
        return True
    if isinstance(x, E.UnaryMathExpr):
        return _is_gen(x.expr)
    if isinstance(x, E.BinaryMathExpr):
        return _is_gen(x.lhs) and _is_gen(x.rhs)
    return False


def _stat1_col(stat: str, col):
    """Per-interval summary stat (reference streaming evaluates each
    interval with a ONE-POINT context, FinalExprEval.scala:246 +
    FilterExpr.scala:58-66 SummaryStats): avg/max/min/last/total of one
    point are the point; count is 1 for a present value."""
    if stat == "count":
        return F.when(col.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
    return col


def _pred_streamable(pred: E.TimeSeriesExpr) -> bool:
    """A :filter predicate streams per-interval when it is pure math over
    stat placeholders of the filtered line, constants, and
    time-generators — no independent data subtree."""
    if isinstance(pred, E.NamedRewrite):
        return _pred_streamable(pred.evaluated)
    if isinstance(pred, (E.StatPlaceholder, E.ConstExpr, E.TimeExpr, E.RandomExpr)):
        return True
    if isinstance(pred, E.UnaryMathExpr):
        return _pred_streamable(pred.expr)
    if isinstance(pred, E.BinaryMathExpr):
        return _pred_streamable(pred.lhs) and _pred_streamable(pred.rhs)
    return False


def _pred_col(pred: E.TimeSeriesExpr, value_col, step: int):
    """Column for a streamable :filter predicate at one interval:
    placeholders resolve to the line's own per-interval stat."""
    if isinstance(pred, E.NamedRewrite):
        return _pred_col(pred.evaluated, value_col, step)
    if isinstance(pred, E.StatPlaceholder):
        return _stat1_col(pred.stat, value_col)
    if isinstance(pred, (E.ConstExpr, E.TimeExpr, E.RandomExpr)):
        return _gen_col(pred, step)
    if isinstance(pred, E.UnaryMathExpr):
        return nanmath.unary_op(pred.op, _pred_col(pred.expr, value_col, step), pred.param)
    if isinstance(pred, E.BinaryMathExpr):
        return nanmath.binary_op(
            pred.op,
            _pred_col(pred.lhs, value_col, step),
            _pred_col(pred.rhs, value_col, step),
        )
    raise TypeError(f"non-streamable predicate node {type(pred).__name__}")


def _peel_stateless(e: E.TimeSeriesExpr):
    """Strip a chain of stateless per-point wrappers, returning (inner,
    steps innermost-first).  Supported: unary math and binary math with a
    constant or time-generator side (`:const`, `:time`, `:random`) —
    everything that needs no cross-series join."""
    steps: list[tuple] = []
    while True:
        if isinstance(e, E.NamedRewrite):
            e = e.evaluated
        elif isinstance(e, E.UnaryMathExpr):
            steps.append(("unary", e.op, e.param))
            e = e.expr
        elif isinstance(e, E.BinaryMathExpr) and _is_gen(e.rhs):
            steps.append(("binary_r", e.op, e.rhs))
            e = e.lhs
        elif isinstance(e, E.BinaryMathExpr) and _is_gen(e.lhs):
            steps.append(("binary_l", e.op, e.lhs))
            e = e.rhs
        elif isinstance(e, E.StatExpr):
            # one-interval summary stat (reference streaming semantics;
            # NOTE: differs from batch whole-window stats by design —
            # the reference's own streaming evaluator has the same split)
            steps.append(("stat1", e.stat, None))
            e = e.expr
        elif isinstance(e, E.FilterOpExpr) and _pred_streamable(e.pred):
            steps.append(("filter1", e.pred, None))
            e = e.expr
        else:
            return e, tuple(reversed(steps))


def _decompose_state_plan(
    expr: E.TimeSeriesExpr, step: int, all_keys: tuple | None = None
) -> _StatePlan | None:
    """Match the tree against the state-store shape; None -> caller falls
    back to the driver-buffer path.  `all_keys` (the evaluator's full tag
    key set) lets `q,:all` decompose as the per-series ingest rollup."""
    e = expr
    off = 0
    renames: list[tuple] = []  # outermost `:as` key renames, display-level
    while isinstance(e, (E.NamedRewrite, E.AsExpr)):
        if isinstance(e, E.AsExpr):
            renames.append((e.orig, e.repl))
        e = e.evaluated if isinstance(e, E.NamedRewrite) else e.expr
    consolidate = None
    if isinstance(e, E.ConsolidateExpr):
        # outermost render-time consolidation: the reference applies it in
        # the final eval stage (FinalExprEval); here it becomes one more
        # watermarked window stage over the finalized stream
        consolidate = (e.cf, e.multiple)
        e = e.expr
        while isinstance(e, E.NamedRewrite):
            e = e.evaluated
    groups: list[tuple] = []  # stateless step groups, outermost-first
    ops: list[tuple] = []  # stateful ops, outermost-first
    while True:
        e, steps = _peel_stateless(e)
        groups.append(steps)
        if isinstance(e, E.StatefulMathExpr):
            if e.op not in _STATE_OPS:
                return None
            params = e.params
            if e.op == "trend":
                # duration seconds -> whole steps for the kernel window
                params = (max(1, int(params[0]) // step),)
            ops.append((e.op, params))
            e = e.expr
            continue
        if isinstance(e, E.TopKExpr):
            # per-interval top-k (the reference streaming evaluator ranks
            # lines by their one-interval stat, FinalExprEval.scala:246);
            # the -others- variants fold the remainder per interval
            ops.append(("topk1", (e.stat, e.k, e.bottom, e.others)))
            e = e.expr
            continue
        break
    groups.reverse()
    ops.reverse()
    if isinstance(e, E.GroupByExpr):
        core, keys, off = ("agg", e.query, e.af.fn), tuple(e.keys), e.af.offset
    elif isinstance(e, E.AllExpr) and all_keys is not None:
        # `q,:all`: one line per series = the ingest SUM rollup grouped by
        # every tag key (events-source semantic, sources/datapoints.py)
        core, keys, off = ("agg", e.query, "sum"), tuple(all_keys), e.offset
    elif isinstance(e, E.AggrExpr):
        core, keys, off = ("agg", e.query, e.fn), (), e.offset
    elif isinstance(e, E.BinaryMathExpr):
        # cross-line join: both sides must decompose and one side's keys
        # must be a subset of the other's (constant sides were already
        # peeled as stateless steps; the batch evaluator enforces the same
        # subset rule)
        lp = _decompose_state_plan(e.lhs, step, all_keys)
        rp = _decompose_state_plan(e.rhs, step, all_keys)
        if lp is None or rp is None:
            return None
        if lp.renames or rp.renames:
            # `:as` inside a binary branch rewrites result tags BEFORE the
            # reference's key matching (MathExpr.scala binary grouping), so
            # the join would have to run on post-rename keys; sub-plan
            # renames are only applied at the top-level sink, so stream
            # this shape via the buffered batch-planner fallback instead of
            # silently joining on pre-rename keys
            return None
        if not (set(lp.keys) <= set(rp.keys) or set(rp.keys) <= set(lp.keys)):
            return None
        sup_keys = lp.keys if set(rp.keys) <= set(lp.keys) else rp.keys
        core, keys = ("join", e.op, lp, rp), sup_keys
    elif isinstance(e, E.AggrMathExpr):
        # second-level aggregation: pointwise fold of all inner lines
        ip = _decompose_state_plan(e.expr, step, all_keys)
        if ip is None:
            return None
        if ip.renames:
            # `:as` inside the sub-plan rewrites result tags BEFORE this
            # stage's key handling (same hazard as the binary-join branch
            # above): renames are only applied at the top-level sink, so
            # decomposing here would operate on pre-rename keys while the
            # batch evaluator/reference operate on post-rename keys.
            # Stream via the buffered batch-planner fallback instead.
            return None
        core, keys = ("fold", e.fn, ip), ()
    elif isinstance(e, E.ApproxDistinctExpr):
        # HLL estimator: the register collapse is a plain per-interval
        # aggregate + closed-form projection (builder._eval_approx_distinct)
        # so it streams as a spooled watermarked fold over the inner
        # register series — cross-interval sketch chains (e.g. the
        # cumulative variant's :cumulative-max under the estimator, or a
        # rolling op above it) compose through the same stages
        ip = _decompose_state_plan(e.expr, step, all_keys)
        if ip is None or "distinct" not in ip.keys:
            return None
        if ip.renames:
            # `:as` inside the sub-plan rewrites result tags BEFORE this
            # stage's key handling (same hazard as the binary-join branch
            # above): renames are only applied at the top-level sink, so
            # decomposing here would operate on pre-rename keys while the
            # batch evaluator/reference operate on post-rename keys.
            # Stream via the buffered batch-planner fallback instead.
            return None
        core, keys = ("hll", ip), tuple(k for k in ip.keys if k != "distinct")
    elif isinstance(e, E.PercentilesExpr):
        # histogram percentile estimator: per finalized interval the
        # estimate is a pure fold over that interval's bucket-count rows
        # (no cross-interval state), so it streams as a spooled watermarked
        # collect + closed-form crossing search — making chains like
        # `...,:percentiles,:rolling-max` fully state-store
        ip = _decompose_state_plan(e.expr, step, all_keys)
        if ip is None or "percentile" not in ip.keys:
            return None
        if ip.renames:
            # `:as` inside the sub-plan rewrites result tags BEFORE this
            # stage's key handling (same hazard as the binary-join branch
            # above): renames are only applied at the top-level sink, so
            # decomposing here would operate on pre-rename keys while the
            # batch evaluator/reference operate on post-rename keys.
            # Stream via the buffered batch-planner fallback instead.
            return None
        core = ("pct", tuple(sorted(set(e.pcts))), ip)
        keys = tuple(e.eval_keys()) + ("percentile",)
    elif isinstance(e, E.SampleCountExpr):
        ip = _decompose_state_plan(e.expr, step, all_keys)
        if ip is None or "percentile" not in ip.keys:
            return None
        if ip.renames:
            # `:as` inside the sub-plan rewrites result tags BEFORE this
            # stage's key handling (same hazard as the binary-join branch
            # above): renames are only applied at the top-level sink, so
            # decomposing here would operate on pre-rename keys while the
            # batch evaluator/reference operate on post-rename keys.
            # Stream via the buffered batch-planner fallback instead.
            return None
        core, keys = ("pctsc", e.lo, e.hi, ip), tuple(e.eval_keys())
    elif isinstance(e, E.MathGroupByExpr):
        # grouped second-level aggregation (regroup to subset keys,
        # MathExpr.scala:795-851): spooled watermarked fold of the inner
        # stream onto the subset series — the piece that makes
        # differently-grouped cross-line chains fully state-store
        # (formerly the last driver-buffer fallback)
        ip = _decompose_state_plan(e.af.expr, step, all_keys)
        if ip is None:
            return None
        if not set(e.keys) <= set(ip.keys):
            return None
        if ip.renames:
            # `:as` inside the sub-plan rewrites result tags BEFORE this
            # stage's key handling (same hazard as the binary-join branch
            # above): renames are only applied at the top-level sink, so
            # decomposing here would operate on pre-rename keys while the
            # batch evaluator/reference operate on post-rename keys.
            # Stream via the buffered batch-planner fallback instead.
            return None
        core, keys = ("regroup", e.af.fn, ip), tuple(e.keys)
    else:
        return None
    if off:
        # data `dur,:offset` = the same aggregate DELAYED by off/step
        # intervals (shifted read reported at the unshifted timestamp),
        # so it streams as an innermost :delay stage; the first off/step
        # intervals are a cold start, exactly like the reference's
        # streaming eval joining a not-yet-seen past
        if off % step:
            return None
        ops.insert(0, ("delay", (off // step,)))
        groups.insert(0, ())
    return _StatePlan(
        core, keys, tuple(ops), tuple(groups), tuple(renames), consolidate
    )


def _gen_col(gen, step: int):
    """Value column for a pure-time generator SUBTREE, computed from the
    stream's interval-start `t` (shares the batch builder's time
    arithmetic and NaN math)."""
    if isinstance(gen, E.NamedRewrite):
        return _gen_col(gen.evaluated, step)
    if isinstance(gen, E.UnaryMathExpr):
        if gen.op == "per-step":
            return _gen_col(gen.expr, step) * F.lit(float(step))
        return nanmath.unary_op(gen.op, _gen_col(gen.expr, step), gen.param)
    if isinstance(gen, E.BinaryMathExpr):
        return nanmath.binary_op(
            gen.op, _gen_col(gen.lhs, step), _gen_col(gen.rhs, step)
        )
    if isinstance(gen, E.ConstExpr):
        return F.lit(float(gen.v))
    if isinstance(gen, E.TimeExpr):
        from ..plans.builder import time_value_col

        return time_value_col(gen.mode).cast("double")
    # RandomExpr: same md5-derived noise as Evaluator._random_col
    idx = ((F.col("t") / step).cast("long") + F.lit(gen.seed)).cast("string")
    h = F.conv(F.substring(F.md5(idx), 1, 15), 16, 10).cast("long")
    return (F.pmod(h, F.lit(1000000)) / F.lit(1000000.0)).cast("double")


def _stateless_col(steps: tuple, col, step: int):
    """Apply peeled stateless steps (innermost-first) to a value column.
    Binary steps carry the generator-side EXPRESSION (const/time/random),
    evaluated from `t` in-stream."""
    for kind, op, param in steps:
        if kind == "unary":
            if op == "per-step":
                col = col * F.lit(float(step))
            else:
                col = nanmath.unary_op(op, col, param)
        elif kind == "binary_r":
            col = nanmath.binary_op(op, col, _gen_col(param, step))
        else:
            col = nanmath.binary_op(op, _gen_col(param, step), col)
    return col


def _pct_estimates(lst_col, total_col, timer_col, pcts):
    """Closed-form Spectator crossing search over a sorted (idx, cnt)
    bucket list — the streaming mirror of `builder._eval_percentiles`'
    min_by crossing (same prev-boundary-by-index interpolation), built
    from `aggregate()` lambdas so it runs inside one watermarked agg
    projection.  Returns [(pct label, estimate column), ...]."""
    from ..functions.percentile_buckets import BOUNDARIES, pct_label

    barr = F.array(*[F.lit(float(b)) for b in BOUNDARIES])
    out = []
    def make_merge(pl):
        # pyspark derives the lambda arity from the python signature, so
        # the merge fn must take EXACTLY (acc, x) — bind pl via closure
        def merge(acc, x):
            cum2 = acc["cum"] + x["cnt"]
            prevp = F.lit(100.0) * acc["cum"] / total_col
            nextp = F.lit(100.0) * cum2 / total_col
            # previous BOUNDARY by bucket index (empty buckets still
            # advance the boundary); element_at is 1-based
            prevb = F.when(x["idx"] == 0, F.lit(0.0)).otherwise(
                F.element_at(barr, x["idx"])
            )
            bval = F.element_at(barr, x["idx"] + 1)
            crossing = (~acc["found"]) & (prevp <= pl) & (pl <= nextp)
            return F.struct(
                cum2.alias("cum"),
                F.when(crossing, prevp).otherwise(acc["prevp"]).alias("prevp"),
                F.when(crossing, nextp).otherwise(acc["nextp"]).alias("nextp"),
                F.when(crossing, prevb).otherwise(acc["prevb"]).alias("prevb"),
                F.when(crossing, bval).otherwise(acc["bval"]).alias("bval"),
                (acc["found"] | crossing).alias("found"),
            )

        return merge

    for p in pcts:
        pl = F.lit(float(p))

        init = F.struct(
            F.lit(0.0).alias("cum"),
            F.lit(0.0).alias("prevp"),
            F.lit(0.0).alias("nextp"),
            F.lit(0.0).alias("prevb"),
            F.lit(0.0).alias("bval"),
            F.lit(False).alias("found"),
        )
        acc = F.aggregate(lst_col, init, make_merge(pl))
        frac = F.when(acc["nextp"] == acc["prevp"], F.lit(0.0)).otherwise(
            (pl - acc["prevp"]) / (acc["nextp"] - acc["prevp"])
        )
        est = acc["prevb"] + frac * (acc["bval"] - acc["prevb"])
        est = F.when(
            acc["found"], F.when(timer_col, est * 1e-9).otherwise(est)
        )
        out.append((pct_label(p), est))
    return out


class _ChainedQueries:
    """Handle over the chained finalize -> stateful streaming stages.

    `processAllAvailable` drains the stages in topological order (twice:
    stage 2 may only see stage 1's output after stage 1 flushed its spool
    files); `stop` tears down in reverse and removes the spool dirs.
    """

    def __init__(self, queries, tmp_dirs):
        self.queries = queries
        self._tmp_dirs = tmp_dirs

    def processAllAvailable(self):  # noqa: N802 (mirrors StreamingQuery API)
        # one pass per stage: each pass propagates data one spool further
        for _ in range(max(2, len(self.queries))):
            for q in self.queries:
                q.processAllAvailable()

    def stop(self):
        for q in reversed(self.queries):
            q.stop()
        for d in self._tmp_dirs:
            shutil.rmtree(d, ignore_errors=True)

    @property
    def isActive(self):  # noqa: N802
        return any(q.isActive for q in self.queries)


def _max_lookback_steps(e: E.TimeSeriesExpr) -> int:
    """Steps of history a stateful operator needs for exact results."""
    need = 1
    if isinstance(e, E.StatefulMathExpr):
        if e.op in ("delay", "rolling-count", "rolling-min", "rolling-max", "rolling-sum"):
            need = int(e.params[0]) + 1
        elif e.op == "rolling-mean":
            need = int(e.params[0]) + 1
        elif e.op == "trend":
            need = 64  # duration-based; bounded via ctx step at eval
        elif e.op in ("integral", "cumulative-max", "des", "sdes"):
            need = 1 << 20  # full-window state; cap applied by caller
        elif e.op == "derivative":
            need = 2
    for c in e.children():
        need = max(need, _max_lookback_steps(c))
    return need


@dataclass
class StreamingEvaluator:
    """Evaluates one ASL program over a datapoint stream.

    Input stream schema: one string column per tag key (same promoted
    layout as DatapointSource), `ts` timestamp, `value` double.
    Results accumulate in `results` as (t, key..., value) rows per
    finalized interval, in processing order.
    """

    spark: SparkSession
    asl: str
    step: int
    key_cols: dict[str, str]  # tag key -> column name
    num_buffers: int = 2  # late-data window, TimeGrouped.numBuffers
    max_lookback: int = 512
    ds_type: str = "rate"  # avg-consolidation denominator (gauge | rate)

    def __post_init__(self):
        exprs = parse_asl(self.asl, step=self.step)
        if len(exprs) != 1:
            raise ValueError("streaming evaluator takes a single expression")
        self.expr = exprs[0]
        ev = self.expr
        while isinstance(ev, E.StyleExpr):
            ev = ev.expr
        self.state_plan = _decompose_state_plan(
            ev, self.step, all_keys=tuple(self.key_cols)
        )
        self.lookback = min(_max_lookback_steps(self.expr), self.max_lookback)
        self._buffer = None  # rolling DISTRIBUTED buffer of finalized rows
        self._buffer_rdd_id = None  # checkpoint RDD id of the live buffer
        self._t_max = None  # running max finalized interval (O(1) per batch)
        self.results: list[dict] = []
        self._queries_live: list = []  # StreamingQuery handles for counters
        self._ingest_obs_names: set[str] = set()  # observe() names of guards
        self.intervals_seen: set[int] = set()
        self._tmp_dirs: list[str] = []
        self._use_tws: bool | None = None  # memoized capability decision
        # True while the stream under construction contains an un-started
        # transformWithState operator (forces RocksDB at that start)
        self._pending_tws = False

    # ---------------------------------------------------------------- query

    def start(self, stream: DataFrame, query_name: str = "atlas_stream"):
        """Wire the streaming DAG.

        Expressions matching the state-store shape (data agg or same-key
        cross-line binary math at the core -> any alternation of stateless
        math and windowed/rolling/DES ops) run fully distributed:
        watermarked step-window aggregation, stream-stream joins for
        binary math, and one chained `applyInPandasWithState` stage per
        stateful op keyed by series — state lives in the executor state
        store, never in driver memory.  This covers every §2.4 op
        including DES, multi-op chains (`:rolling-sum,:des`), joins
        (`a,b,:sub,:rolling-max`), differently-grouped regroups
        (`...,:by,:dup,:sum,(,k,),:by,:div`), and both sketch families
        (:approx-distinct and the :percentiles/:median/:sample-count
        bucket estimators, incl. under cross-interval chains).  The
        driver-buffer path remains only for shapes that fail
        decomposition outright (e.g. a non-subset-key cross-line join),
        matching the reference's own single-node FinalExprEval state.
        """
        if self.state_plan is not None:
            return self._start_state_store(stream, query_name)
        return self._start_buffered(stream, query_name)

    def _tws_enabled(self) -> bool:
        """Multi-op stateful chains run as chained
        `transformWithStateInPandas` operators inside ONE streaming query
        when the Spark 4 API is usable
        (stateful.py::supports_transform_with_state — needs the API, a
        `google.protobuf` runtime for the state-server protocol, and a
        JVM launched with it exported).  `ATLAS_TWS_CHAIN=0|off|spool`
        forces the spooled `applyInPandasWithState` fallback, which is
        also taken automatically when the capability probe fails."""
        if self._use_tws is None:
            env = os.environ.get("ATLAS_TWS_CHAIN", "auto").lower()
            if env in ("0", "off", "spool", "false"):
                self._use_tws = False
            else:
                from .stateful import supports_transform_with_state

                self._use_tws = supports_transform_with_state(self.spark)
        return self._use_tws

    def _scoped_start(self, start_fn):
        """Start a streaming query under the right state-store provider:
        RocksDB when the query contains a transformWithState operator
        (Spark 4 mandate), else the subscription-evaluator regime's
        recommendation — key-cardinality state, where the default
        provider's cheaper commit path wins (rollup.py r14 A/B).  The
        provider conf is scoped + lock-serialized around the start so
        concurrent twins keep their own regimes (rollup.py
        scoped_state_store)."""
        from .rollup import scoped_state_store

        twin = "stateful_tws" if self._pending_tws else "subscription_evaluator"
        self._pending_tws = False
        with scoped_state_store(self.spark, twin):
            return start_fn()

    def _windowed(self, stream: DataFrame, plan: _StatePlan | None) -> DataFrame:
        """Watermarked tumbling-window aggregation of finalized intervals.

        With a state plan the query predicate filters the raw stream and
        the plan's aggregate fn runs directly (map-side partial agg);
        missing group keys drop rows (DataExpr.scala:108-122).
        """
        cols = list(self.key_cols.values())
        watermark = f"{self.num_buffers * self.step} seconds"
        if plan is None:
            agg_fn = F.sum
            group_cols = cols
            filtered = stream
        else:
            _, query, fn = plan.core
            agg_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[fn]
            group_cols = [self.key_cols[k] for k in plan.keys]
            src = DatapointSource(
                df=stream, step=self.step, colmap=dict(self.key_cols), sql_cte=""
            )
            filtered = stream.filter(query_to_column(query, src))
            for c in group_cols:
                filtered = filtered.filter(F.col(c).isNotNull())
        filtered = self._ingest_guard(filtered)
        return (
            filtered.withWatermark("ts", watermark)
            .groupBy(
                F.window("ts", f"{self.step} seconds").alias("w"),
                *[F.col(c) for c in group_cols],
            )
            .agg(agg_fn("value").alias("value"))
            .select(
                F.unix_timestamp(F.col("w.start")).cast("long").alias("t"),
                *group_cols,
                "value",
            )
        )

    def _ingest_guard(self, df: DataFrame) -> DataFrame:
        """TimeGrouped ingest-observability parity
        (TimeGrouped.scala:77-86,166-173): count what the subscription
        receives and drop rows timestamped in the future (`t > now` ->
        droppedFuture; one bogus far-future row would otherwise advance
        the event-time watermark and make ALL honest traffic look late).
        Rows behind the watermark are dropped by Spark itself and counted
        from `numRowsDroppedByWatermark` (droppedOld) — both surfaced by
        `drop_counters()`.  The observe() metrics are computed JVM-side
        inside the existing stage (no extra stream or shuffle)."""
        import uuid

        name = f"ingest_{uuid.uuid4().hex[:8]}"
        self._ingest_obs_names.add(name)  # one guard per join side / stage
        null_ts = F.col("ts").isNull()
        future = F.col("ts").isNotNull() & (F.col("ts") > F.current_timestamp())
        return df.observe(
            name,
            F.count(F.lit(1)).alias("received"),
            F.count(F.when(future, 1)).alias("dropped_future"),
            F.count(F.when(null_ts, 1)).alias("dropped_null_ts"),
        ).filter(~future & ~null_ts)

    def drop_counters(self) -> dict[str, int]:
        """Per-subscription ingest counters: received / dropped_future
        from the ingest guard's observed metrics, dropped_old from the
        state operators' numRowsDroppedByWatermark — the reference's
        droppedOld/droppedFuture/buffered counter row
        (TimeGrouped.scala:77-86).  Sums recentProgress of every stage
        query (Spark keeps the last ~100 progress events; for bounded
        test/diagnostic windows that is the full history)."""
        out = {
            "received": 0,
            "dropped_future": 0,
            "dropped_old": 0,
            "dropped_null_ts": 0,
        }
        for q in self._queries_live:
            for p in q.recentProgress:
                prog = p if isinstance(p, dict) else json.loads(p.json)
                om = prog.get("observedMetrics") or {}
                for name, row in om.items():
                    if name not in self._ingest_obs_names or not row:
                        continue
                    # recentProgress yields pyspark Row values here, not dicts
                    vals = row.asDict() if hasattr(row, "asDict") else row
                    out["received"] += int(vals.get("received") or 0)
                    out["dropped_future"] += int(vals.get("dropped_future") or 0)
                    out["dropped_null_ts"] += int(vals.get("dropped_null_ts") or 0)
                for so in prog.get("stateOperators") or []:
                    out["dropped_old"] += int(
                        so.get("numRowsDroppedByWatermark") or 0
                    )
        return out

    def _start_state_store(self, stream: DataFrame, query_name: str):
        """Fully state-store execution of a decomposed plan.

        Stateful CHAIN ops run as chained `transformWithStateInPandas`
        operators inside one streaming query when the Spark 4 API is
        usable (`_tws_enabled`) — a plain agg-core chain is then a SINGLE
        query end to end.  Shapes that still need their own stage get a
        parquet spool + re-stream between queries (the Kafka/Delta
        bronze->silver topology): cross-line joins and the sketch/fold/
        regroup cores (their watermarked agg must advance from its own
        finalized source), per-interval top-k stages, and — when the TWS
        capability is absent — every stateful chain op, since
        `applyInPandasWithState` cannot sit downstream of another
        stateful operator in one query.  State for every stage lives in
        the executor state store; the driver buffer is never involved for
        state-plan shapes, including multi-op chains (`:rolling-sum,:des`)
        and cross-line joins (`a,b,:sub`)."""
        queries: list = []
        current = self._build_plan_stream(stream, self.state_plan, query_name, queries)
        if self.state_plan.consolidate:
            current = self._consolidate_stream(current, query_name, queries)
        queries.append(
            self._scoped_start(
                lambda: current.writeStream.outputMode("append")
                .queryName(f"{query_name}_sink")
                .foreachBatch(self._collect_batch)
                .start()
            )
        )
        self._queries_live = queries
        return _ChainedQueries(queries, self._tmp_dirs)

    def _consolidate_stream(self, current: DataFrame, name: str, queries: list) -> DataFrame:
        """Outermost `:consolidate` as its own watermarked window stage:
        finalized step cells regroup onto the m-step grid; a coarse cell
        closes when the watermark passes its end (its sub-intervals are
        already final, so one step of slack suffices).  `avg` divides by
        the sub-interval count for rates but by the PRESENT sample count
        for gauges (TimeSeq.scala:203-210), exactly as the batch path.
        Cells align to the epoch (`window()` default) — matching batch
        output whenever the eval start is a multiple of the coarse step.
        """
        cf, m = self.state_plan.consolidate
        ns = m * self.step
        q, re = self._spool(current, f"{name}_precons")
        queries.append(q)
        rows = re.select(
            "series", F.timestamp_seconds(F.col("t")).alias("ets"), "value"
        ).withWatermark("ets", f"{self.step} seconds")
        if cf == "avg":
            val = (
                F.avg("value")
                if self.ds_type == "gauge"
                else (F.sum("value") / F.lit(float(m)))
            )
        else:
            val = {"sum": F.sum, "min": F.min, "max": F.max}[cf]("value")
        agg = rows.groupBy("series", F.window("ets", f"{ns} seconds")).agg(
            val.alias("value")
        )
        return agg.select(
            "series", F.col("window.start").cast("long").alias("t"), "value"
        )

    def _spool(self, df: DataFrame, name: str):
        """Write a (series, t, value) stream to a fresh parquet spool and
        return (query, re-streamed reader)."""
        spool = tempfile.mkdtemp(prefix="atlas_spool_")
        ck = tempfile.mkdtemp(prefix="atlas_ck_")
        self._tmp_dirs += [spool, ck]
        q = self._scoped_start(
            lambda: df.writeStream.outputMode("append")
            .queryName(name)
            .option("checkpointLocation", ck)
            .format("parquet")
            .option("path", spool)
            .start()
        )
        re = self.spark.readStream.schema(
            "series string, t long, value double"
        ).parquet(spool)
        return q, re

    # ops whose missing input always yields missing output: per-interval
    # inner join suffices (builder._STRICT_OPS); the rest use a full-outer
    # join with NaN fill so e.g. `NaN :add x = x` at intervals where one
    # side has no row
    _STRICT_OPS_JOIN = frozenset({"mul", "div", "fmul", "fdiv", "fadd", "fsub"})

    def _build_plan_stream(
        self, stream: DataFrame, plan: _StatePlan, name: str, queries: list
    ) -> DataFrame:
        """Streaming (series, t, value) frame with `plan` fully applied:
        core, then alternating stateless groups and spooled stateful
        stages.  Appends every intermediate StreamingQuery to `queries`."""
        if plan.core[0] == "agg":
            finalized = self._windowed(stream, plan)
            key_cols = [self.key_cols[k] for k in plan.keys]
            series = (
                F.concat_ws(_SERIES_SEP, *[F.col(c) for c in key_cols])
                if key_cols
                else F.lit(_NO_KEY)
            )
            current = finalized.select(
                series.alias("series"), "t", F.col("value").cast("double").alias("value")
            )
        elif plan.core[0] == "hll":
            # distinct-count estimator over max-rho registers: spool the
            # inner register stream, project each series onto the eval
            # keys (dropping the `distinct` register dimension), one
            # watermarked agg + the closed-form estimate
            from ..functions.distinct_sketch import ALPHA, M

            _, ip = plan.core
            inner = self._build_plan_stream(stream, ip, f"{name}_inner", queries)
            qh, rereg = self._spool(inner, f"{name}_hllspool")
            queries.append(qh)
            wm = f"{self.num_buffers * self.step} seconds"
            if plan.keys:
                parts = F.split(F.col("series"), _SERIES_SEP)
                idxs = [ip.keys.index(k) for k in plan.keys]
                ek_series = F.concat_ws(
                    _SERIES_SEP, *[parts.getItem(i) for i in idxs]
                )
            else:
                ek_series = F.lit(_NO_KEY)
            agg = (
                rereg.filter(F.col("value").isNotNull() & (F.col("value") > 0))
                .withColumn("ets", F.timestamp_seconds("t"))
                .withColumn("series", ek_series)
                .withWatermark("ets", wm)
                .groupBy("series", "ets")
                .agg(
                    F.sum(F.pow(F.lit(2.0), -F.col("value"))).alias("_sp"),
                    F.count("*").alias("_n"),
                )
            )
            sum_pow = F.col("_sp") + (F.lit(M) - F.col("_n"))
            zeros = F.lit(M) - F.col("_n")
            e_raw = F.lit(ALPHA * M * M) / sum_pow
            est = F.when(
                (e_raw <= 2.5 * M) & (zeros > 0),
                F.lit(M) * F.log(F.lit(float(M)) / zeros),
            ).otherwise(e_raw)
            current = agg.select(
                "series",
                F.unix_timestamp("ets").cast("long").alias("t"),
                est.cast("double").alias("value"),
            )
        elif plan.core[0] in ("pct", "pctsc"):
            # percentile-bucket estimators: spool the inner register
            # stream, decode the bucket index from the percentile label,
            # and collapse per (eval-key series, interval) in ONE
            # watermarked agg — estimates are a closed-form projection
            # (`_pct_estimates`), never driver-side
            import math as _math

            from ..functions.percentile_buckets import N_BUCKETS, index_of

            ip = plan.core[-1]
            inner = self._build_plan_stream(stream, ip, f"{name}_inner", queries)
            qp, repct = self._spool(inner, f"{name}_pctspool")
            queries.append(qp)
            wm = f"{self.num_buffers * self.step} seconds"
            parts = F.split(F.col("series"), _SERIES_SEP)
            label = parts.getItem(ip.keys.index("percentile"))
            ek = [k for k in ip.keys if k != "percentile"]
            ek_series = (
                F.concat_ws(
                    _SERIES_SEP, *[parts.getItem(ip.keys.index(k)) for k in ek]
                )
                if ek
                else F.lit(_NO_KEY)
            )
            idx = F.least(
                F.conv(F.substring(label, 2, 4), 16, 10).cast("int"),
                F.lit(N_BUCKETS - 1),
            )
            timer = F.substring(label, 1, 1) == F.lit("T")
            pre = repct.filter(
                F.col("value").isNotNull()
                & (F.col("value") > 0)
                & label.rlike("^[DT]")
            ).withColumn("ets", F.timestamp_seconds("t"))
            if plan.core[0] == "pctsc":
                _, lo, hi, _ip = plan.core
                lo_idx = index_of(_math.ceil(lo)) if lo > 0 else 0
                hi_idx = index_of(_math.ceil(hi)) if _math.isfinite(hi) else 1 << 30
                current = (
                    pre.filter((idx >= lo_idx) & (idx < hi_idx))
                    .select(ek_series.alias("series"), "ets", "value")
                    .withWatermark("ets", wm)
                    .groupBy("series", "ets")
                    .agg(F.sum("value").alias("value"))
                    .select(
                        "series",
                        F.unix_timestamp("ets").cast("long").alias("t"),
                        F.col("value").cast("double").alias("value"),
                    )
                )
            else:
                _, pcts, _ip = plan.core
                agg = (
                    pre.select(
                        ek_series.alias("series"),
                        "ets",
                        idx.alias("_idx"),
                        timer.alias("_timer"),
                        F.col("value").alias("_cnt"),
                    )
                    .withWatermark("ets", wm)
                    .groupBy("series", "ets")
                    .agg(
                        F.sort_array(
                            F.collect_list(
                                F.struct(
                                    F.col("_idx").alias("idx"),
                                    F.col("_cnt").alias("cnt"),
                                )
                            )
                        ).alias("_lst"),
                        F.sum("_cnt").alias("_total"),
                        F.max("_timer").alias("_timer"),
                    )
                )
                ests = _pct_estimates(
                    F.col("_lst"), F.col("_total"), F.col("_timer"), pcts
                )
                stack_args: list = [F.lit(len(ests))]
                for lbl, est in ests:
                    stack_args += [F.lit(lbl), est]
                unpacked = agg.select(
                    "series",
                    F.unix_timestamp("ets").cast("long").alias("t"),
                    F.stack(*stack_args).alias("_plabel", "value"),
                )
                out_series = (
                    F.concat_ws(_SERIES_SEP, "series", "_plabel")
                    if ek
                    else F.col("_plabel")
                )
                current = unpacked.select(
                    out_series.alias("series"),
                    "t",
                    F.col("value").cast("double").alias("value"),
                )
        elif plan.core[0] == "regroup":
            # grouped second-level aggregation: spool the inner result,
            # re-stream, project each inner series onto the subset keys,
            # watermarked per-(sub-series, interval) fold.  Same spool
            # rationale as "fold": a streaming agg cannot sit downstream
            # of another stateful op in one query.
            from ..plans.builder import _AGG

            _, fn, ip = plan.core
            inner = self._build_plan_stream(stream, ip, f"{name}_inner", queries)
            qg, regrp = self._spool(inner, f"{name}_regroupspool")
            queries.append(qg)
            wm = f"{self.num_buffers * self.step} seconds"
            if plan.keys:
                parts = F.split(F.col("series"), _SERIES_SEP)
                idxs = [ip.keys.index(k) for k in plan.keys]
                sub_series = F.concat_ws(
                    _SERIES_SEP, *[parts.getItem(i) for i in idxs]
                )
            else:
                sub_series = F.lit(_NO_KEY)
            current = (
                regrp.withColumn("ets", F.timestamp_seconds("t"))
                .withColumn("series", sub_series)
                .withWatermark("ets", wm)
                .groupBy("series", "ets")
                .agg(_AGG[fn]("value").alias("value"))
                .select(
                    "series",
                    F.unix_timestamp("ets").cast("long").alias("t"),
                    F.col("value").cast("double").alias("value"),
                )
            )
        elif plan.core[0] == "fold":
            # second-level aggregation (MathExpr.scala:711-794): spool the
            # inner result, re-stream, watermarked per-interval fold — a
            # streaming agg cannot sit downstream of another stateful op in
            # one query, hence the spool stage
            from ..plans.builder import _AGG

            _, fn, ip = plan.core
            inner = self._build_plan_stream(stream, ip, f"{name}_inner", queries)
            qf, refold = self._spool(inner, f"{name}_foldspool")
            queries.append(qf)
            wm = f"{self.num_buffers * self.step} seconds"
            current = (
                refold.withColumn("ets", F.timestamp_seconds("t"))
                .withWatermark("ets", wm)
                .groupBy("ets")
                .agg(_AGG[fn]("value").alias("value"))
                .select(
                    F.lit(_NO_KEY).alias("series"),
                    F.unix_timestamp("ets").cast("long").alias("t"),
                    F.col("value").cast("double").alias("value"),
                )
            )
        else:
            _, op, lp, rp = plan.core
            # each side's pending-TWS flag must scope to ITS spool start:
            # both sides build before either starts, so a single sticky
            # flag would start the second spool under the wrong provider
            lcur = self._build_plan_stream(stream, lp, f"{name}_L", queries)
            l_tws, self._pending_tws = self._pending_tws, False
            rcur = self._build_plan_stream(stream, rp, f"{name}_R", queries)
            r_tws, self._pending_tws = self._pending_tws, l_tws
            ql, lre = self._spool(lcur, f"{name}_Lspool")
            self._pending_tws = r_tws
            qr, rre = self._spool(rcur, f"{name}_Rspool")
            queries += [ql, qr]
            wm = f"{self.num_buffers * self.step} seconds"
            left = (
                lre.withColumn("ets", F.timestamp_seconds("t"))
                .withWatermark("ets", wm)
                .alias("l")
            )
            right = (
                rre.withColumn("ets", F.timestamp_seconds("t"))
                .withWatermark("ets", wm)
                .alias("r")
            )
            # per-interval join — the reference's FinalExprEval evaluates
            # the expression per finalized interval, so the batch densify
            # collapses to a per-t join on the COMMON (subset) keys:
            # same keys -> (series, t); subset keys -> the superset side's
            # series projected onto the common keys
            flipped = not (set(rp.keys) <= set(lp.keys))
            sup, sub = (rp, lp) if flipped else (lp, rp)
            supc, subc = ("r", "l") if flipped else ("l", "r")
            if sup.keys == sub.keys:
                sup_common = F.col(f"{supc}.series")
            elif not sub.keys:
                sup_common = F.lit(_NO_KEY)
            else:
                parts = F.split(F.col(f"{supc}.series"), _SERIES_SEP)
                idxs = [sup.keys.index(k) for k in sub.keys]
                sup_common = F.concat_ws(
                    _SERIES_SEP, *[parts.getItem(i) for i in idxs]
                )
            cond = [
                sup_common == F.col(f"{subc}.series"),
                F.col("l.ets") == F.col("r.ets"),
            ]
            if op in self._STRICT_OPS_JOIN:
                # strict ops: missing input -> missing output, inner join
                how = "inner"
            elif sup.keys == sub.keys:
                how = "full_outer"
            else:
                # subset keys: output lines are the superset side's series;
                # a sub row without any sup partner has no line to land on
                how = "left_outer" if supc == "l" else "right_outer"
            joined = left.join(right, on=cond, how=how)
            nan = F.lit(float("nan"))
            value = nanmath.binary_op(
                op,
                F.coalesce(F.col("l.value"), nan),
                F.coalesce(F.col("r.value"), nan),
            )
            current = joined.select(
                F.coalesce(
                    F.col(f"{supc}.series"), F.col(f"{subc}.series")
                ).alias("series"),
                F.coalesce(F.col("l.t"), F.col("r.t")).alias("t"),
                value.cast("double").alias("value"),
            )

        def apply_steps(df: DataFrame, steps: tuple) -> DataFrame:
            for st in steps:
                if st[0] == "filter1":
                    df = df.filter(
                        nanmath.truthy(_pred_col(st[1], F.col("value"), self.step))
                    )
                elif st[0] == "stat1":
                    df = df.select(
                        "series",
                        "t",
                        _stat1_col(st[1], F.col("value")).cast("double").alias("value"),
                    )
                else:
                    df = df.select(
                        "series",
                        "t",
                        _stateless_col((st,), F.col("value"), self.step)
                        .cast("double")
                        .alias("value"),
                    )
            return df

        current = apply_steps(current, plan.steps[0])
        use_tws = self._tws_enabled()
        for i, (op, params) in enumerate(plan.chain):
            if op == "topk1":
                # per-interval watermarked agg: keep the spool boundary so
                # its watermark advances from its own finalized source
                q, respooled = self._spool(current, f"{name}_stage{i}")
                queries.append(q)
                current = self._topk_interval_stage(respooled, *params, plan.keys)
            elif use_tws:
                # Spark 4: transformWithState composes downstream of the
                # windowed agg and of other stateful operators, so the
                # whole chain stays in ONE query — no parquet spool, no
                # extra query round-trip per op (same `_advance` kernel)
                current = stateful_stream_tws(current, op, params, self.step)
                self._pending_tws = True
            else:
                q, respooled = self._spool(current, f"{name}_stage{i}")
                queries.append(q)
                current = stateful_stream(respooled, op, params, self.step)
            current = apply_steps(current, plan.steps[i + 1])
        return current

    def _topk_interval_stage(
        self,
        stream: DataFrame,
        stat: str,
        k: int,
        bottom: bool,
        others: str | None,
        plan_keys: tuple,
    ) -> DataFrame:
        """Per-interval top/bottom-k over the finalized line stream: one
        watermarked interval-keyed aggregation collects that interval's
        lines (aggregate-sized: one row per live series), an array_sort
        lambda ranks them by the one-interval stat with a deterministic
        series tie-break, and the top k explode back out.  Emitted lines
        carry their ORIGINAL values (the rank key is only the ordering),
        matching FilterExpr TopK.  The -others- variants fold the
        remainder into one `--others--` line per interval with the
        requested aggregate — all inside the same array expressions."""
        rows = stream.select(
            "series",
            F.timestamp_seconds(F.col("t")).alias("ets"),
            "t",
            "value",
            _stat1_col(stat, F.col("value")).alias("_rk"),
        ).withWatermark("ets", f"{self.step} seconds")
        agg = rows.groupBy("ets", "t").agg(
            F.collect_list(F.struct("_rk", "series", "value")).alias("lines")
        )
        lt, gt = (-1, 1) if bottom else (1, -1)
        cmp = (
            f"(l, r) -> CASE WHEN l._rk < r._rk THEN {lt} WHEN l._rk > r._rk THEN {gt} "
            "WHEN l.series < r.series THEN -1 WHEN l.series > r.series THEN 1 ELSE 0 END"
        )
        ranked = F.expr(f"array_sort(lines, {cmp})")
        topk = F.slice(ranked, 1, k)
        if others:
            # fold the non-top remainder into one line; the series key is
            # '--others--' for every tag key (the batch fold's labels).
            # Arity comes from the ENCLOSING plan's keys, not the top-level
            # state_plan: a top-k inside a join/fold branch may carry a
            # different key set, and a wrong segment count would misalign
            # key unpacking in every downstream stage
            n_keys = max(1, len(plan_keys))
            others_series = _SERIES_SEP.join(["--others--"] * n_keys)
            rest = F.expr(
                f"CASE WHEN size(array_sort(lines, {cmp})) > {k} "
                f"THEN slice(array_sort(lines, {cmp}), {k + 1}, size(lines)) "
                "ELSE array() END"
            ).cast("array<struct<_rk double, series string, value double>>")
            vals = F.expr(
                "filter(transform(_rest, x -> x.value), v -> v IS NOT NULL)"
            )
            total = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
            if others == "sum":
                ov = total
            elif others == "avg":
                ov = total / F.size(vals)
            elif others == "min":
                ov = F.array_min(vals)
            else:
                ov = F.array_max(vals)
            with_rest = agg.withColumn("_rest", rest)
            folded = with_rest.select(
                "t",
                F.when(
                    F.size("_rest") > 0,
                    F.array_append(
                        F.slice(ranked, 1, k),
                        F.struct(
                            F.lit(0.0).alias("_rk"),
                            F.lit(others_series).alias("series"),
                            ov.cast("double").alias("value"),
                        ),
                    ),
                ).otherwise(F.slice(ranked, 1, k)).alias("out"),
            )
            return folded.select("t", F.explode("out").alias("x")).select(
                F.col("x.series").alias("series"), "t", F.col("x.value").alias("value")
            )
        return agg.select("t", F.explode(topk).alias("x")).select(
            F.col("x.series").alias("series"), "t", F.col("x.value").alias("value")
        )

    def _collect_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Sink for the state-store path: unpack the series key (all
        stateless steps were applied in-stream).  Rows arrive exactly once
        (append mode downstream of the watermark)."""
        ren = dict(self.state_plan.renames)
        keys = [ren.get(k, k) for k in self.state_plan.keys]
        for r in batch_df.collect():
            row = {"t": r["t"], "value": r["value"]}
            if keys:
                parts = (r["series"] or "").split(_SERIES_SEP)
                for k, v in zip(keys, parts):
                    row[k] = v
            self.results.append(row)

    def _start_buffered(self, stream: DataFrame, query_name: str):
        """Fallback for non-decomposable expressions: per-batch re-eval of
        the full expression with the batch planner.

        Expressions with NO cross-interval state (`:percentiles`,
        `:approx-distinct`, cross-key regroups — lookback of one step)
        evaluate DISTRIBUTED per micro-batch: the batch planner runs
        directly on the finalized-interval DataFrame, no pandas buffer.
        Only genuinely cross-interval shapes that failed decomposition
        keep the bounded driver-side lookback buffer."""
        on_batch = (
            self._on_batch_stateless if self.lookback <= 1 else self._on_batch
        )
        q = self._scoped_start(
            lambda: self._windowed(stream, None)
            .writeStream.outputMode("append")
            .queryName(query_name)
            .foreachBatch(on_batch)
            .start()
        )
        self._queries_live = [q]
        return q

    # ------------------------------------------------------------ internals

    def _on_batch_stateless(self, batch_df: DataFrame, batch_id: int) -> None:
        """Per-batch distributed evaluation for stateless expressions:
        each interval finalizes in exactly one batch (append mode behind
        the watermark) and the expression needs no history, so the batch
        planner runs on the batch itself — fully distributed, driver
        memory bounded by result lines."""
        agg = batch_df.agg(F.min("t"), F.max("t")).head()
        if agg is None or agg[0] is None:
            return
        t_lo, t_max = int(agg[0]), int(agg[1])
        ctx = EvalContext(t_lo, t_max + self.step, self.step)
        source = DatapointSource(
            df=batch_df, step=self.step, colmap=dict(self.key_cols), sql_cte=""
        )
        ev = Evaluator(source, ctx)
        rf = ev.eval(self.expr)
        kc = rf.key_cols
        try:
            for r in rf.df.collect():
                row = {"t": r["t"], "value": r["value"]}
                for k, c in zip(rf.keys or (), kc):
                    row[k] = r[c]
                self.results.append(row)
        finally:
            ev.release()  # per-batch shared-subtree caches

    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """FinalExprEval equivalent: merge finalized intervals into the
        lookback buffer and re-evaluate the expression for new intervals.

        The buffer is a DISTRIBUTED DataFrame (union of finalized batches,
        trimmed to the lookback horizon, lineage truncated per batch by an
        eager `localCheckpoint`): rows stay in executor storage and the
        re-evaluation runs through the batch planner's normal distributed
        plans, so series cardinality never accumulates in driver memory —
        the driver holds only interval bookkeeping.  (The reference holds
        the equivalent state on one node in FinalExprEval,
        atlas-eval/.../stream/FinalExprEval.scala:74-75,243-249.)"""
        batch_ts = {int(r[0]) for r in batch_df.select("t").distinct().collect()}
        new_ts = sorted(batch_ts - self.intervals_seen)
        if not new_ts:
            # Exactly-once premise: the splitter finalizes each interval
            # ONCE, so a batch of only already-seen intervals means replay
            # of duplicate rows.  Merging them would double-count in later
            # lookback evaluations (the buffer sums overlapping rows), so
            # they are dropped — loudly, because silently losing a
            # re-finalized interval would be a correctness bug if the
            # premise is ever violated upstream.
            if batch_ts:
                import logging

                logging.getLogger(__name__).warning(
                    "streaming evaluator: dropping replayed batch for "
                    "already-finalized intervals %s (exactly-once premise)",
                    sorted(batch_ts),
                )
            return
        if len(new_ts) < len(batch_ts):
            # partial replay: merge ONLY the unseen intervals — rows for
            # already-finalized intervals would double-count in every
            # later lookback evaluation (the buffer sums overlapping rows)
            import logging

            logging.getLogger(__name__).warning(
                "streaming evaluator: batch mixes new intervals %s with "
                "replayed already-finalized intervals %s; replayed rows "
                "dropped (exactly-once premise)",
                new_ts,
                sorted(batch_ts - set(new_ts)),
            )
            batch_df = batch_df.filter(F.col("t").isin(new_ts))
        self.intervals_seen.update(new_ts)
        buf = (
            batch_df
            if self._buffer is None
            else self._buffer.unionByName(batch_df)
        )
        self._t_max = (
            new_ts[-1] if self._t_max is None else max(self._t_max, new_ts[-1])
        )
        t_max = self._t_max
        # bound the buffer to the lookback horizon, but never trim intervals
        # that still need to be evaluated in this batch
        horizon = min(t_max - self.lookback * self.step, new_ts[0])
        buf = buf.filter(F.col("t") >= horizon).localCheckpoint()
        # free the SUPERSEDED buffer generation: localCheckpoint blocks are
        # not CacheManager entries, so Dataset.unpersist would be a no-op —
        # unpersist the previous checkpoint RDD itself (id recorded from
        # the LogicalRDD plan node), keeping executor storage at one
        # buffer copy instead of every generation until driver GC
        # NOTE executor-loss failure mode: localCheckpoint truncates
        # lineage, so losing an executor holding checkpoint blocks is
        # unrecoverable for this stream (the reference's FinalExprEval is
        # likewise single-node state, FinalExprEval.scala:74-75).  With a
        # reliable checkpoint dir, swap localCheckpoint for checkpoint.
        prev_id = self._buffer_rdd_id
        try:
            self._buffer_rdd_id = (
                buf._jdf.queryExecution().analyzed().rdd().id()
            )
        except Exception:
            # fall back to generation-leak mode (one superseded buffer
            # copy retained until driver GC) — log so leaks are observable
            import logging

            logging.getLogger(__name__).warning(
                "streaming evaluator: buffer RDD-id probe failed; "
                "superseded buffer generation will not be unpersisted",
                exc_info=True,
            )
            self._buffer_rdd_id = None
        if prev_id is not None:
            jrdd = self.spark.sparkContext._jsc.getPersistentRDDs().get(prev_id)
            if jrdd is not None:
                jrdd.unpersist(False)
        self._buffer = buf

        # evaluate with the batch planner over the buffered window
        agg = buf.agg(F.min("t")).head()
        if agg is None or agg[0] is None:
            return
        t_lo = int(agg[0])
        ctx = EvalContext(t_lo, t_max + self.step, self.step)
        source = DatapointSource(
            df=buf, step=self.step, colmap=dict(self.key_cols), sql_cte=""
        )
        ev = Evaluator(source, ctx)
        rf = ev.eval(self.expr)
        kc = rf.key_cols
        try:
            out = rf.df.filter(F.col("t").isin(new_ts)).collect()
        finally:
            ev.release()  # per-batch shared-subtree caches
        for r in out:
            row = {"t": r["t"], "value": r["value"]}
            for k, c in zip(rf.keys or (), kc):
                row[k] = r[c]
            self.results.append(row)
