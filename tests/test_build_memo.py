"""Build-latency memoization internals (r16 optimization round).

These pin the SAFETY properties of the plan-handle memos, not their
speed: memoized objects are lazy plans keyed per (session, inputs), so
re-use can never serve stale or cross-corpus data — every action still
computes from the parquet files.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from atlas_spark.sources.datapoints import (
    events_datapoints,
    lineitem_datapoints,
)
from atlas_spark.util.io import app_id, memo_factory, read_parquet


def test_read_parquet_memo_identity(spark, sf_dir):
    a = read_parquet(spark, f"{sf_dir}/events.parquet")
    b = read_parquet(spark, f"{sf_dir}/events.parquet")
    assert a is b
    # distinct paths get distinct handles
    c = read_parquet(spark, f"{sf_dir}/documents.parquet")
    assert c is not a


def test_source_factory_memo_identity_and_keying(spark, sf_dir):
    s1 = events_datapoints(spark, sf_dir)
    s2 = events_datapoints(spark, sf_dir)
    assert s1 is s2
    # a different step is a different source
    s3 = events_datapoints(spark, sf_dir, step=86400)
    assert s3 is not s1 and s3.step == 86400
    # a different corpus dir is a different source
    s4 = events_datapoints(spark, "/root/testdata/sf0.001")
    assert s4 is not s1


def test_ranged_builder_memo_still_prunes(spark, sf_dir):
    """The per-(lo, hi) ranged memo must return the SAME pruned plan the
    un-memoized builder produced: raw-ts bounds visible in the scan."""
    src = lineitem_datapoints(spark, sf_dir)
    lo, hi = 788918400, 788918400 + 30 * 86400
    r1 = src.ranged_df(lo, hi)
    r2 = src.ranged_df(lo, hi)
    assert r1 is r2  # memo hit
    plan = r1._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "GreaterThanOrEqual" in pushed, pushed


def test_memo_factory_computes_fresh_data(spark, sf_dir, tmp_path):
    """The memo holds PLANS, not results: a re-read after the underlying
    relation changes (possible only for mutable paths, which must not use
    the memo) is out of scope, but an action on a memoized plan must
    re-execute — two actions see independent computation."""

    calls = []

    @memo_factory
    def fake_source(spark, sf_dir):
        calls.append(1)
        return read_parquet(spark, f"{sf_dir}/events.parquet").select("event_type")

    d1 = fake_source(spark, sf_dir)
    d2 = fake_source(spark, sf_dir)
    assert d1 is d2 and len(calls) == 1  # one build per session+args
    # the handle is lazy: count executes the scan each time
    assert d1.count() == d2.count() > 0


def test_app_id_cached_on_session(spark):
    a = app_id(spark)
    assert a == spark.sparkContext.applicationId
    assert getattr(spark, "_atlas_app_id") == a


def test_configure_existing_idempotent(spark):
    from atlas_spark.session import configure_existing

    configure_existing(spark)
    assert getattr(spark, "_atlas_configured", False) is True
    # second call is a no-op flag check (and must not raise)
    configure_existing(spark)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_asl_plan_cache_identity_and_recompute(spark, sf_dir):
    """AslSpec.run memoizes the built frame per (session, spec, corpus):
    same handle on rebuild, lazy (actions re-execute), keyed per
    corpus dir."""
    from atlas_spark import registry

    qs = registry.all_queries()
    d1 = qs["data_by_sum"](spark, sf_dir)
    d2 = qs["data_by_sum"](spark, sf_dir)
    assert d1 is d2
    assert d1.count() == d2.count() > 0  # each action recomputes
    d3 = qs["data_by_sum"](spark, "/root/testdata/sf0.001")
    assert d3 is not d1


def test_boundary_array_literals_exact(spark):
    """D-suffixed double literals must reproduce float(b) for every
    bucket boundary bit-for-bit (Double.parseDouble of Python repr)."""
    from atlas_spark.functions.percentile_buckets import BOUNDARIES
    from atlas_spark.plans.builder import _boundary_array_sql

    row = spark.range(1).select(F.expr(_boundary_array_sql()).alias("a")).collect()[0]
    assert row["a"] == [float(b) for b in BOUNDARIES]
