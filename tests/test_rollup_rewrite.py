"""Differential tests for the grouped-rollup binary-math rewrite
(`Evaluator._try_rollup_binary`): the windowed single-scan plan must be
row-identical to the generic two-agg join path, including the deferred
superset-only-key null drop."""

from __future__ import annotations

import pytest

from atlas_spark.model import expr as E
from atlas_spark.model import query as Q
from atlas_spark.plans.builder import Evaluator
from atlas_spark.plans.context import EvalContext
from atlas_spark.sources.datapoints import DatapointSource, EVENTS_START, events_datapoints


class _GenericEvaluator(Evaluator):
    """Evaluator with the rollup rewrite disabled (generic join path)."""

    def _try_rollup_binary(self, e):
        return None


def _gb(q, fn, keys):
    return E.GroupByExpr(q, E.AggrExpr(q, fn), tuple(keys))


def _rows(src, ctx, expr, cls=Evaluator):
    rf = cls(src, ctx).eval(expr)
    return sorted(tuple(r) for r in rf.df.collect())


def _assert_close(a, b):
    """Row-identical up to float summation order (the rewrite sums
    partial sums where the generic path sums raw rows; the driver oracle
    rounds to 6 decimals, far above the ulp difference)."""
    assert len(a) == len(b) and len(a) > 0
    for x, y in zip(a, b):
        assert x[:-1] == y[:-1]
        assert x[-1] == pytest.approx(y[-1], rel=1e-9, abs=1e-9)


@pytest.fixture(scope="module")
def ev_src(spark, sf_dir):
    return events_datapoints(spark, sf_dir)


@pytest.fixture(scope="module")
def ev_ctx():
    return EvalContext(EVENTS_START, EVENTS_START + 10 * 86400, 3600)


@pytest.mark.parametrize("fn", ["sum", "count", "min", "max"])
def test_rewrite_matches_generic_grouped(spark, ev_src, ev_ctx, fn):
    q = Q.TrueQuery()
    e = E.BinaryMathExpr("div", _gb(q, fn, ("name", "bucket")), _gb(q, fn, ("name",)))
    a = _rows(ev_src, ev_ctx, e)
    b = _rows(ev_src, ev_ctx, e, _GenericEvaluator)
    _assert_close(a, b)


def test_rewrite_matches_generic_ungrouped_side(spark, ev_src, ev_ctx):
    q = Q.EqualQuery("name", "click")
    e = E.BinaryMathExpr("div", _gb(q, "sum", ("bucket",)), E.AggrExpr(q, "sum"))
    a = _rows(ev_src, ev_ctx, e)
    b = _rows(ev_src, ev_ctx, e, _GenericEvaluator)
    _assert_close(a, b)


def test_rewrite_flipped_orientation(spark, ev_src, ev_ctx):
    """Subset side on the LEFT: total :div grouped."""
    q = Q.TrueQuery()
    e = E.BinaryMathExpr("div", _gb(q, "sum", ("name",)), _gb(q, "sum", ("name", "bucket")))
    a = _rows(ev_src, ev_ctx, e)
    b = _rows(ev_src, ev_ctx, e, _GenericEvaluator)
    _assert_close(a, b)


def test_rewrite_null_superset_key_rows_count_in_totals(spark):
    """Rows whose superset-only key is NULL are dropped from the grouped
    OUTPUT but still aggregate into the subset-side totals — the rewrite
    defers the null drop below the window (DataExpr.scala:108-122)."""
    rows = [
        ("a", "x", 0, 1.0),
        ("a", "y", 0, 2.0),
        ("a", None, 0, 5.0),  # in totals, not in output
        ("b", "x", 0, 4.0),
    ]
    df = spark.createDataFrame(rows, "k_a string, k_b string, t long, value double")
    src = DatapointSource(df=df, step=1, colmap={"a": "k_a", "b": "k_b"}, sql_cte="")
    ctx = EvalContext(0, 1, 1)
    q = Q.TrueQuery()
    e = E.BinaryMathExpr("div", _gb(q, "sum", ("a", "b")), _gb(q, "sum", ("a",)))
    a = _rows(src, ctx, e)
    b = _rows(src, ctx, e, _GenericEvaluator)
    assert a == b
    # totals for a = 1+2+5 = 8 (null row included)
    assert ("a", "x", 0, 0.125) in a


def test_rewrite_not_applied_on_different_queries(spark, ev_src, ev_ctx):
    """Different filters on the two sides must fall through to the generic
    join path (the rewrite requires identical query + aggregate)."""
    e = E.BinaryMathExpr(
        "div",
        _gb(Q.EqualQuery("name", "click"), "sum", ("name", "bucket")),
        _gb(Q.TrueQuery(), "sum", ("name",)),
    )
    assert Evaluator(ev_src, ev_ctx)._try_rollup_binary(e) is None


def test_rollup_plan_has_no_join(spark, sf_dir, ev_src, ev_ctx):
    """Plan pin: the share-of-total shape runs as one scan + agg + window —
    no SortMergeJoin, no second scan of the source."""
    q = Q.TrueQuery()
    e = E.BinaryMathExpr("div", _gb(q, "sum", ("name", "bucket")), _gb(q, "sum", ("name",)))
    rf = Evaluator(ev_src, ev_ctx).eval(e)
    plan = rf.df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "Join" not in plan
    assert plan.count("Location: InMemoryFileIndex") <= 1


# ---------------------------------------------------------------------------
# Conditional-aggregation rewrite (`Evaluator._try_condagg_binary`):
# equal-key-set binary math over (possibly) different queries/fns folds
# into ONE scan with per-side conditional aggregates.


class _NoCondAggEvaluator(Evaluator):
    """Evaluator with the conditional-agg rewrite disabled."""

    def _try_condagg_binary(self, e):
        return None


def _ag(q, fn):
    return E.AggrExpr(q, fn)


@pytest.mark.parametrize("op", ["div", "mul", "fadd", "fsub"])
def test_condagg_matches_generic_ungrouped(spark, ev_src, ev_ctx, op):
    e = E.BinaryMathExpr(
        op,
        _ag(Q.EqualQuery("name", "click"), "sum"),
        _ag(Q.EqualQuery("name", "error"), "sum"),
    )
    assert Evaluator(ev_src, ev_ctx)._try_condagg_binary(e) is not None
    _assert_close(_rows(ev_src, ev_ctx, e), _rows(ev_src, ev_ctx, e, _NoCondAggEvaluator))


@pytest.mark.parametrize(
    "f1,f2", [("sum", "count"), ("min", "max"), ("count", "count"), ("sum", "sum")]
)
def test_condagg_matches_generic_grouped(spark, ev_src, ev_ctx, f1, f2):
    e = E.BinaryMathExpr(
        "div",
        _gb(Q.EqualQuery("name", "click"), f1, ("bucket",)),
        _gb(Q.EqualQuery("name", "view"), f2, ("bucket",)),
    )
    assert Evaluator(ev_src, ev_ctx)._try_condagg_binary(e) is not None
    _assert_close(_rows(ev_src, ev_ctx, e), _rows(ev_src, ev_ctx, e, _NoCondAggEvaluator))


def test_condagg_same_query_equal_keys(spark, ev_src, ev_ctx):
    """x :div x (equal keys, identical query) also routes through the
    one-scan path — everything is 1.0."""
    q = Q.EqualQuery("name", "click")
    e = E.BinaryMathExpr("div", _gb(q, "sum", ("bucket",)), _gb(q, "sum", ("bucket",)))
    rows = _rows(ev_src, ev_ctx, e)
    assert rows and all(r[-1] == pytest.approx(1.0) for r in rows)
    _assert_close(rows, _rows(ev_src, ev_ctx, e, _NoCondAggEvaluator))


def test_condagg_inner_join_drops_one_sided_cells(spark):
    """A (key, t) cell where only one side's query matched must vanish —
    the generic path's inner join."""
    rows = [
        ("click", "x", 0, 1.0),
        ("view", "x", 0, 3.0),
        ("click", "y", 0, 5.0),  # no view rows for y -> cell dropped
        ("view", "z", 0, 7.0),  # no click rows for z -> cell dropped
    ]
    df = spark.createDataFrame(rows, "k_name string, k_b string, t long, value double")
    src = DatapointSource(df=df, step=1, colmap={"name": "k_name", "b": "k_b"}, sql_cte="")
    ctx = EvalContext(0, 1, 1)
    e = E.BinaryMathExpr(
        "div",
        _gb(Q.EqualQuery("name", "click"), "sum", ("b",)),
        _gb(Q.EqualQuery("name", "view"), "sum", ("b",)),
    )
    a = _rows(src, ctx, e)
    b = _rows(src, ctx, e, _NoCondAggEvaluator)
    assert a == b == [("x", 0, pytest.approx(1.0 / 3.0))] or a == b
    assert len(a) == 1 and a[0][0] == "x"


def test_condagg_count_zero_is_absent_not_zero(spark):
    """count over a cell with no matching rows must behave as ABSENT
    (null), not 0 — x/0 would leak a NaN row the generic path never
    produces."""
    rows = [
        ("click", "x", 0, 1.0),
        ("view", "x", 0, 3.0),
        ("click", "y", 0, 5.0),
    ]
    df = spark.createDataFrame(rows, "k_name string, k_b string, t long, value double")
    src = DatapointSource(df=df, step=1, colmap={"name": "k_name", "b": "k_b"}, sql_cte="")
    ctx = EvalContext(0, 1, 1)
    e = E.BinaryMathExpr(
        "div",
        _gb(Q.EqualQuery("name", "click"), "count", ("b",)),
        _gb(Q.EqualQuery("name", "view"), "count", ("b",)),
    )
    a = _rows(src, ctx, e)
    assert a == _rows(src, ctx, e, _NoCondAggEvaluator)
    assert len(a) == 1 and a[0][0] == "x"


def test_condagg_not_applied_nonstrict_or_offset(spark, ev_src, ev_ctx):
    ev = Evaluator(ev_src, ev_ctx)
    q1, q2 = Q.EqualQuery("name", "click"), Q.EqualQuery("name", "view")
    # :add is non-strict (NaN + x = x needs dense grids)
    assert ev._try_condagg_binary(
        E.BinaryMathExpr("add", _ag(q1, "sum"), _ag(q2, "sum"))
    ) is None
    # offsets fall through
    assert ev._try_condagg_binary(
        E.BinaryMathExpr("div", _ag(q1, "sum"), E.AggrExpr(q2, "sum", offset=86400))
    ) is None
    # differing key sets fall through (rollup/generic territory)
    assert ev._try_condagg_binary(
        E.BinaryMathExpr("div", _gb(q1, "sum", ("name", "bucket")), _gb(q2, "sum", ("name",)))
    ) is None


def test_condagg_plan_single_scan(spark, ev_src, ev_ctx):
    """Plan pin: one scan, one aggregate, no join of any kind."""
    e = E.BinaryMathExpr(
        "fadd",
        _ag(Q.EqualQuery("name", "click"), "sum"),
        _ag(Q.EqualQuery("name", "error"), "sum"),
    )
    rf = Evaluator(ev_src, ev_ctx).eval(e)
    plan = rf.df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Location: InMemoryFileIndex") <= 1
