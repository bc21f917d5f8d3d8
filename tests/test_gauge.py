"""Gauge DsType consolidation semantics.

The reference divides an `avg` consolidation by the number of
sub-intervals for RATE series but by the NON-NaN sample count for GAUGE
series — "gauge showing current temperature that starts reporting in the
middle of an consolidated interval has primary points NaN, 90.0.  The
consolidated value should be 90.0 not 45.0" (TimeSeq.scala:203-210,
ConsolidationFunction.scala:37-55).  These tests pin that exact case on
both the render-time `:consolidate` word and the data-level fetch
consolidation (storage step < eval step, DataExpr.scala:52-59).
"""

import pyspark.sql.functions as F
import pytest

from atlas_spark.model import expr as E
from atlas_spark.model import query as Q
from atlas_spark.plans.builder import Evaluator
from atlas_spark.plans.context import EvalContext
from atlas_spark.sources.datapoints import DatapointSource

STEP = 60
START = 0


def _source(spark, ds_type):
    # one series, values at t=0..3 (minutes): NaN, 90, NaN, NaN — the
    # missing minutes are ABSENT rows (null = no data)
    df = spark.createDataFrame(
        [("temp", 60, 90.0)], "k_name string, t long, value double"
    )
    return DatapointSource(
        df=df,
        step=STEP,
        colmap={"name": "k_name"},
        sql_cte="",
        ds_type=ds_type,
    )


def _consolidate_expr():
    # name,temp,:eq,:max,(,name,),:by,cf-avg,4m-worth,:consolidate
    by = E.GroupByExpr(
        Q.EqualQuery("name", "temp"),
        E.AggrExpr(Q.EqualQuery("name", "temp"), "max"),
        ("name",),
    )
    return E.ConsolidateExpr(by, "avg", 4)


def _run(spark, ds_type, expr, ctx=None):
    ctx = ctx or EvalContext(START, START + 4 * STEP, STEP)
    rf = Evaluator(_source(spark, ds_type), ctx).eval(expr)
    rows = rf.df.filter(F.col("value").isNotNull()).collect()
    assert len(rows) == 1
    return rows[0]["value"]


def test_consolidate_gauge_90_not_45(spark):
    """`:consolidate cf-avg` on a gauge divides by the sample count."""
    assert _run(spark, "gauge", _consolidate_expr()) == pytest.approx(90.0)


def test_consolidate_rate_divides_by_multiple(spark):
    """The same series as a rate divides by the sub-interval count."""
    assert _run(spark, "rate", _consolidate_expr()) == pytest.approx(90.0 / 4)


def test_data_level_cf_avg_gauge(spark):
    """Fetching at a coarser step consolidates data-level with the af's
    cf; gauge avg uses the non-null denominator (90, not 22.5)."""
    by = E.GroupByExpr(
        Q.TrueQuery(),
        E.AggrExpr(Q.TrueQuery(), "max", 0, "avg"),
        ("name",),
    )
    coarse = EvalContext(START, START + 4 * STEP, 4 * STEP)
    assert _run(spark, "gauge", by, coarse) == pytest.approx(90.0)
    assert _run(spark, "rate", by, coarse) == pytest.approx(90.0 / 4)


def test_data_level_default_cf_is_avg_for_sum(spark):
    """`:sum` fetched coarse consolidates with AVG by default
    (DataExpr.scala:173), not SUM."""
    agg = E.AggrExpr(Q.TrueQuery(), "sum")
    coarse = EvalContext(START, START + 4 * STEP, 4 * STEP)
    assert _run(spark, "rate", agg, coarse) == pytest.approx(90.0 / 4)
    # min/max consolidate with themselves
    mx = E.AggrExpr(Q.TrueQuery(), "max")
    assert _run(spark, "rate", mx, coarse) == pytest.approx(90.0)
