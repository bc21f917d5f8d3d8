"""Partitioned/bucketed layout: pruning + result equivalence."""

from __future__ import annotations

import io
import contextlib
import shutil
import tempfile

import pytest

from atlas_spark.model import expr as E
from atlas_spark.model import query as Q
from atlas_spark.plans.builder import Evaluator
from atlas_spark.plans.context import EvalContext
from atlas_spark.sources.datapoints import EVENTS_START, events_datapoints
from atlas_spark.sources.layout import table_source, write_datapoints


@pytest.fixture(scope="module")
def dp_table(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="atlas_layout_")
    src = events_datapoints(spark, sf_dir)
    write_datapoints(src.df, "dp_test", path=f"{d}/dp", buckets=4)
    yield "dp_test"
    spark.sql("DROP TABLE IF EXISTS dp_test")
    shutil.rmtree(d, ignore_errors=True)


def test_table_matches_direct(spark, sf_dir, dp_table):
    ctx = EvalContext(EVENTS_START + 5 * 86400, EVENTS_START + 7 * 86400, 3600)
    expr = E.GroupByExpr(
        Q.EqualQuery("name", "click"),
        E.AggrExpr(Q.EqualQuery("name", "click"), "sum"),
        ("bucket",),
    )
    direct = Evaluator(events_datapoints(spark, sf_dir), ctx).eval(expr)
    tbl_src = table_source(spark, dp_table, 3600, {"name": "k_name", "bucket": "k_bucket"})
    via_table = Evaluator(tbl_src, ctx).eval(expr)
    a = sorted(tuple(r) for r in direct.df.collect())
    b = sorted(tuple(r) for r in via_table.df.collect())
    assert a == b and len(a) > 0


def test_partition_pruning(spark, dp_table):
    """A 2-day eval range must scan only the matching date partitions."""
    ctx = EvalContext(EVENTS_START + 5 * 86400, EVENTS_START + 7 * 86400, 3600)
    src = table_source(spark, dp_table, 3600, {"name": "k_name", "bucket": "k_bucket"})
    df = src.ranged_df(ctx.start, ctx.end)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    txt = buf.getvalue()
    assert "PartitionFilters" in txt
    # the partition filter narrows on d
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", txt)
    assert m and "d#" in m.group(1), m.group(0) if m else txt[:500]


def test_bucketed_aggregation_has_no_exchange(spark, dp_table):
    """The layout's whole point at 100 TB: `bucketBy(N, name)` makes the
    scan's hashpartitioning(k_name) satisfy the (k_name, t) grouping
    distribution, so a `(,name,),:by` ASL aggregation over the table
    runs with ZERO exchanges — scan -> partial agg -> final agg, no
    shuffle of the fact stream at all — while the date partition still
    prunes and the t-range still pushes down."""
    ctx = EvalContext(EVENTS_START, EVENTS_START + 7 * 86400, 3600)
    expr = E.GroupByExpr(Q.TrueQuery(), E.AggrExpr(Q.TrueQuery(), "sum"), ("name",))
    src = table_source(spark, dp_table, 3600, {"name": "k_name", "bucket": "k_bucket"})
    rf = Evaluator(src, ctx).eval(expr)
    plan = rf.df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert "SelectedBucketsCount" in plan, plan
    assert "PartitionFilters" in plan and "PushedFilters" in plan
