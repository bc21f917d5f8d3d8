"""Differential tests for the common-base collapse
(`Evaluator._try_common_base`): a math tree whose every data leaf is the
same subtree evaluates the base ONCE (column arithmetic + window/grouped
aggregates over one frame) and must be row-identical — after the output
null-drop both paths share — to the generic per-reference join path.

The macro family this optimizes (`:stddev`, `:pct`, `:avg`, trig chains,
signal bands) re-evaluated the base per `:dup`/`:over` reference: 7
parquet scans / 15 exchanges for `:stddev` before, 1 scan / 2 exchanges
after (r16).
"""

from __future__ import annotations

import pytest

from atlas_spark.plans.builder import Evaluator
from atlas_spark.plans.context import EvalContext
from atlas_spark.sources.datapoints import EVENTS_START, events_datapoints
from atlas_spark.stacklang.vocab import parse


class _GenericEvaluator(Evaluator):
    """Evaluator with the common-base collapse disabled."""

    def _try_common_base(self, e):
        return None


@pytest.fixture(scope="module")
def ev_src(spark, sf_dir):
    return events_datapoints(spark, sf_dir)


@pytest.fixture(scope="module")
def ev_ctx():
    return EvalContext(EVENTS_START, EVENTS_START + 10 * 86400, 3600)


def _expr(asl: str, step: int):
    exprs = parse(asl, step=step)
    assert len(exprs) == 1
    return exprs[0]


def _rows(src, ctx, expr, cls=Evaluator):
    rf = cls(src, ctx).eval(expr)
    # the declared-output contract drops null-valued cells (AslSpec.run /
    # oracle drop_nulls); the collapse is free to omit rows the generic
    # path materializes with NULL, so compare after the drop
    df = rf.df.filter(rf.df["value"].isNotNull())
    return sorted((tuple(r) for r in df.collect()), key=repr)


def _assert_close(a, b):
    assert len(a) == len(b) and len(a) > 0
    for x, y in zip(a, b):
        assert x[:-1] == y[:-1]
        assert x[-1] == pytest.approx(y[-1], rel=1e-9, abs=1e-9)


CASES = [
    # scalar-only aggregate fusion (sum/count/sum-of-squares, one groupBy)
    ":true,:sum,(,name,),:by,:stddev",
    # mixed line/aggregate -> window over the same frame
    ":true,:sum,(,name,),:by,:pct",
    ":true,:sum,(,name,),:by,:avg",
    # self-operand square (dup/mul), strict
    ":true,:sum,(,name,),:by,:dup,:mul",
    # generator under a non-strict op (Mode D: densified base)
    ":true,:count,:cos",
    ":true,:count,:tan,:true,:count,:sec,:mul",
    # signal ops are non-null at every grid cell (Mode D)
    ":true,:sum,(,name,),:by,200,:gt,:true,:sum,(,name,),:by,600,:lt,:and",
    ":true,:sum,(,name,),:by,400,:gt",
    # pow(x, 0) == 1 even for missing x (Mode D via const rhs)
    ":true,:sum,(,name,),:by,0,:const,:pow",
    # aggregate over a const-shifted chain: absent lines surface as
    # non-null inside the aggregate input (force_dense path)
    ":true,:sum,(,name,),:by,5,:const,:sub,:sum",
    # keyed regroup window (MathGroupByExpr leaf)
    ":true,:sum,(,name,bucket,),:by,:dup,:sum,(,name,),:by,:div",
    # per-step chain under a self-op
    ":true,:count,:per-step,:dup,:mul",
    # sumsq / sum via explicit aggregates (scalar-only, two distinct fns)
    ":true,:sum,(,name,),:by,:dup,:mul,:sum,:true,:sum,(,name,),:by,:sum,:div",
]


@pytest.mark.parametrize("asl", CASES)
def test_collapse_matches_generic(spark, ev_src, ev_ctx, asl):
    e = _expr(asl, ev_ctx.step)
    a = _rows(ev_src, ev_ctx, e)
    b = _rows(ev_src, ev_ctx, e, _GenericEvaluator)
    _assert_close(a, b)


def test_collapse_preserves_rows_windows_downstream(spark, ev_src, ev_ctx):
    """A stateful rows-window over a collapsed result must see the same
    row grid as over the generic result (the collapse may not mislabel a
    sparse frame as dense — densify would skip the fill and shift every
    rows-based window)."""
    asl = ":true,:sum,(,name,),:by,:dup,:sub,3,:rolling-sum"
    e = _expr(asl, ev_ctx.step)
    a = _rows(ev_src, ev_ctx, e)
    b = _rows(ev_src, ev_ctx, e, _GenericEvaluator)
    _assert_close(a, b)


def test_collapse_single_scan_plans(spark, ev_src, ev_ctx):
    """Plan pins: the collapsed :stddev and tan*sec trees read the source
    once and join nothing (was 7 scans / 15 exchanges for :stddev)."""
    for asl in (
        ":true,:sum,(,name,),:by,:stddev",
        ":true,:count,:tan,:true,:count,:sec,:mul",
        ":true,:sum,(,name,),:by,:pct",
    ):
        rf = Evaluator(ev_src, ev_ctx).eval(_expr(asl, ev_ctx.step))
        plan = rf.df._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, (asl, plan)
        assert plan.count("Location: InMemoryFileIndex") <= 1, asl


def test_collapse_bails_to_generic(spark, ev_src, ev_ctx):
    """Distinct bases / offsets / nested second-level aggregates fall
    back to the generic (or sibling-rewrite) paths."""
    ev = Evaluator(ev_src, ev_ctx)
    for asl in (
        # different queries -> two bases
        "name,click,:eq,:sum,name,view,:eq,:sum,:div",
        # offset clone is a different leaf
        "name,click,:eq,:sum,:dup,1d,:offset,:sub",
        # nested second-level aggregate
        ":true,:sum,(,name,),:by,:sum,:dup,:sum,:div",
    ):
        assert ev._try_common_base(_expr(asl, ev_ctx.step)) is None, asl


def test_densify_map_path_matches_join_path(spark, ev_src, ev_ctx):
    """One-pass sorted-walk densify (contexts <= _DENSIFY_ONEPASS_MAX_STEPS)
    is row-identical to the join-based fallback, and executes the
    aggregate subtree once (single scan, no NLJ grid join)."""
    from atlas_spark.stacklang.vocab import parse

    e = parse(":true,:sum,(,name,),:by,3,:rolling-sum", step=ev_ctx.step)[0]

    class _JoinDensify(Evaluator):
        _DENSIFY_ONEPASS_MAX_STEPS = 0  # force the fallback

    a = _rows(ev_src, ev_ctx, e)
    b = _rows(ev_src, ev_ctx, e, _JoinDensify)
    _assert_close(a, b)

    rf = Evaluator(ev_src, ev_ctx).eval(e)
    plan = rf.df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Location: InMemoryFileIndex") <= 1
    assert "NestedLoop" not in plan
