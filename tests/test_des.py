"""DES kernel semantics — mirrors OnlineDes/OnlineSlidingDes behavior."""

from __future__ import annotations

import math

import numpy as np
import pytest

from atlas_spark.plans.builder import _Des, _des_kernel


def test_des_constant_series():
    """Constant input: NaN during training, then the constant."""
    vals = np.full(20, 7.0)
    out = _des_kernel(vals, 5, 0.1, 0.5, sliding=False)
    assert all(math.isnan(x) for x in out[:5])
    assert all(abs(x - 7.0) < 1e-12 for x in out[5:])


def test_des_emits_previous_estimate():
    """The emitted value is the estimate BEFORE seeing the current sample
    (OnlineDes.scala:36: retval computed before the update)."""
    d = _Des(1, 0.5, 0.5)
    assert math.isnan(d.next(10.0))  # training
    first = d.next(20.0)
    assert first == 10.0  # previous sp, not the updated one


def test_des_nan_does_not_advance_training():
    d = _Des(2, 0.1, 0.5)
    d.next(float("nan"))
    d.next(1.0)
    assert math.isnan(d.next(float("nan")))  # still training (1 sample)
    assert math.isnan(d.next(2.0))  # 2nd sample; emits NaN (current==... )
    out = d.next(3.0)
    assert not math.isnan(out)


def test_sliding_des_constant():
    vals = np.full(30, 4.0)
    out = _des_kernel(vals, 5, 0.1, 0.5, sliding=True)
    # after the initial training both instances track the constant
    assert all(abs(x - 4.0) < 1e-12 for x in out[10:])


def test_sliding_des_bounded_history():
    """A level shift stops influencing sliding DES after ~2 training
    periods (the alternating reset bounds history)."""
    vals = np.concatenate([np.full(10, 100.0), np.full(40, 1.0)])
    out = _des_kernel(vals, 5, 0.9, 0.9, sliding=True)
    assert abs(out[-1] - 1.0) < 1e-6


def test_des_through_engine(spark):
    """Engine-level: DES of a constant grouped series equals the constant
    after training (uses the constants fixture shape)."""
    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext
    from atlas_spark.sources.datapoints import DatapointSource
    from atlas_spark.stacklang.vocab import parse

    START, STEP, N = 1704067200, 60, 30
    rows = [("c", START + i * STEP, 9.0) for i in range(N)]
    df = spark.createDataFrame(rows, "k_name string, t long, value double")
    src = DatapointSource(df=df, step=STEP, colmap={"name": "k_name"}, sql_cte="")
    (se,) = parse("name,c,:eq,:sum,10,0.1,0.5,:des", step=STEP)
    rf = Evaluator(src, EvalContext(START, START + N * STEP, STEP)).eval(se)
    out = {r["t"]: r["value"] for r in rf.df.collect()}
    for i in range(10, N):
        v = out.get(START + i * STEP)
        assert v is not None and abs(v - 9.0) < 1e-9
    for i in range(0, 10):
        assert out.get(START + i * STEP) is None


def test_des_over_count_aggregate(spark, sf_dir):
    """A bare `:count` aggregate is integer-typed; the DES kernel writes
    smoothed doubles, so the input must normalize to double or Arrow
    rejects the batch ("float truncated converting to int64") — found by
    the differential fuzzer (seed 7214)."""
    import pyspark.sql.functions as F

    from atlas_spark.model import expr as E
    from atlas_spark.model import query as Q
    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext
    from atlas_spark.sources.datapoints import EVENTS_START, events_datapoints

    ctx = EvalContext(EVENTS_START, EVENTS_START + 2 * 86400, 3600)
    e = E.StatefulMathExpr(
        "sdes", E.AggrExpr(Q.TrueQuery(), "count"), (8, 0.1, 0.02)
    )
    rf = Evaluator(events_datapoints(spark, sf_dir), ctx).eval(e)
    rows = rf.df.filter(F.col("value").isNotNull()).collect()
    assert rows, "sdes over :count produced no rows"
    assert all(isinstance(r["value"], float) for r in rows)
