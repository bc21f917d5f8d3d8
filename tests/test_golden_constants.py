"""Table-driven golden tests over the constants fixture.

Port of the reference's workhorse suite
(`atlas-core/src/test/.../model/TimeSeriesExprSuite.scala:32-105`,
FIXTURES.md F1): 11 series tagged name="0".."10" whose value is constant
int(name) at every step.  Each ASL program must produce a line (or lines)
with the expected constant value at every timestamp.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from atlas_spark.plans.builder import Evaluator
from atlas_spark.plans.context import EvalContext
from atlas_spark.sources.datapoints import DatapointSource
from atlas_spark.stacklang.vocab import parse

STEP = 60
START = 1704067200
N_STEPS = 60
END = START + N_STEPS * STEP


@pytest.fixture(scope="module")
def constants_source(spark):
    rows = [
        (str(i), START + s * STEP, float(i))
        for i in range(11)
        for s in range(N_STEPS)
    ]
    df = spark.createDataFrame(rows, "k_name string, t long, value double")
    return DatapointSource(df=df, step=STEP, colmap={"name": "k_name"}, sql_cte="")


def eval_asl(source, asl: str):
    (se,) = parse(asl, step=STEP)
    ev = Evaluator(source, EvalContext(START, END, STEP))
    return ev.eval(se)


# (asl, expected constant value of the single result line; None = all-NaN)
GOLDENS = [
    (":true,:sum", 55.0),
    (":true,:count", 11.0),
    (":true,:avg", 5.0),
    (":true,:min", 0.0),
    (":true,:max", 10.0),
    ("name,1,:eq,:sum", 1.0),
    ("name,(,1,10,),:in,:sum", 11.0),
    ("name,5,:lt,:sum", 20.0),  # lexicographic: 0,1,10,2,3,4
    ("name,5,:ge,:sum", 35.0),  # 5..9
    ("name,1,:re,:sum", 11.0),  # ^1: "1","10"
    ("name,42,:eq,:sum,0,:fadd", None),  # no match -> all NaN
    ("name,42,:eq,:count", None),
    (":false,:sum", None),
    ("name,4,:eq,:sum,name,2,:eq,:sum,:div", 2.0),
    ("name,4,:eq,:sum,name,0,:eq,:sum,:div", None),  # 4/0 -> NaN
    ("name,0,:eq,:sum,name,0,:eq,:sum,:div", 0.0),  # 0/0 -> 0
    (":true,:sum,4,:add", 59.0),
    (":true,:sum,4,:sub", 51.0),
    (":true,:sum,2,:mul", 110.0),
    (":true,:sum,5,:div", 11.0),
    ("2,:const,3,:const,:pow", 8.0),
    (":true,:sum,50,:gt", 1.0),
    (":true,:sum,50,:lt", 0.0),
    (":true,:sum,55,:ge", 1.0),
    (":true,:sum,56,:le", 1.0),
    ("name,3,:eq,:sum,:neg", -3.0),
    ("name,3,:eq,:sum,:neg,:abs", 3.0),
    ("name,9,:eq,:sum,:sqrt", 3.0),
    (":true,:sum,60,:clamp-min", 60.0),
    (":true,:sum,50,:clamp-max", 50.0),
    (":true,:sum,:per-step", 55.0 * 60),
    # single aggregated line -> stddev 0 (TimeSeriesExprSuite.scala:195)
    (":true,:stddev", 0.0),
    # across the 11 group-member lines -> population stddev of 0..10
    # (TimeSeriesExprSuite.scala:190)
    (":true,(,name,),:by,:stddev", math.sqrt(10.0)),
    (":true,:sum,:true,:count,:fdiv", 5.0),
    # raw IEEE division (MathExpr.scala FDivide): x/0 = ±Inf, 0/0 = NaN
    ("name,4,:eq,:sum,name,0,:eq,:sum,:fdiv", math.inf),
    ("name,4,:eq,:sum,:neg,name,0,:eq,:sum,:fdiv", -math.inf),
    ("name,0,:eq,:sum,name,0,:eq,:sum,:fdiv", None),
    ("name,1,:eq,:sum,name,2,:eq,:sum,:fadd", 3.0),
    ("name,42,:eq,:sum,name,2,:eq,:sum,:add", 2.0),  # NaN + 2 = 2
    ("name,42,:eq,:sum,name,2,:eq,:sum,:fadd", None),  # strict: NaN
    (":true,:sum,0,:gt,:true,:sum,100,:lt,:and", 1.0),
    (":true,:sum,0,:lt,:true,:sum,100,:gt,:or", 0.0),
    (":true,(,name,),:by,:sum", 55.0),  # regroup collapses back
    (":true,(,name,),:by,:max", 10.0),
    (":true,(,name,),:by,:count", 11.0),
    (":true,:sum,3,:rolling-sum,3,:delay,:true,:sum,3,:rolling-sum,3,:delay,:sub", 0.0),
    (":true,:sum,:cumulative-max", 55.0),
    (":true,:sum,:derivative,0,:fadd,name,0,:eq,:sum,:fadd", 0.0),  # d/dt const = 0 (first NaN)
    ("1,:const,:true,:sum,:and", 1.0),
    ("0,:const,:true,:sum,:and", 0.0),
    (":true,:sum,dummy,value,:as", 55.0),
    (":true,:sum,avg,:stat", 55.0),
    (":true,:sum,last,:stat", 55.0),
    (":true,:sum,total,:stat", 55.0 * 60),
    (":true,:sum,count,:stat", 60.0),
]


@pytest.mark.parametrize("asl,expected", GOLDENS, ids=[g[0] for g in GOLDENS])
def test_golden(constants_source, asl, expected):
    rf = eval_asl(constants_source, asl)
    rows = rf.df.collect()
    values = [r["value"] for r in rows]
    non_null = [v for v in values if v is not None and not math.isnan(v)]
    if expected is None:
        assert not non_null, f"expected all-NaN, got {non_null[:3]}"
        return
    assert non_null, "expected values, got empty/all-null result"
    for v in non_null:
        if math.isinf(expected):
            assert v == expected, f"{asl}: {v} != {expected}"
        else:
            assert abs(v - expected) < 1e-9, f"{asl}: {v} != {expected}"


def test_golden_group_by_lines(constants_source):
    rf = eval_asl(constants_source, ":true,:sum,(,name,),:by")
    rows = rf.df.collect()
    by_name = {}
    for r in rows:
        by_name.setdefault(r["k_name"], set()).add(r["value"])
    assert set(by_name) == {str(i) for i in range(11)}
    for name, vals in by_name.items():
        assert vals == {float(name)}


def test_golden_pct(constants_source):
    rf = eval_asl(constants_source, ":true,:sum,(,name,),:by,:pct")
    rows = rf.df.collect()
    for r in rows:
        expected = 100.0 * float(r["k_name"]) / 55.0
        assert abs(r["value"] - expected) < 1e-9


def test_golden_topk(constants_source):
    rf = eval_asl(constants_source, ":true,:sum,(,name,),:by,total,3,:topk")
    names = {r["k_name"] for r in rf.df.collect()}
    assert names == {"10", "9", "8"}


def test_golden_trend(constants_source):
    """Trend of a constant: NaN during window fill, then the constant
    (sum/window-size semantics, OnlineTrend.scala:33-49)."""
    rf = eval_asl(constants_source, "name,4,:eq,:sum,5m,:trend")
    rows = sorted(rf.df.collect(), key=lambda r: r["t"])
    vals = [r["value"] for r in rows]
    assert all(v is None or math.isnan(v) for v in vals[:4])
    assert all(v is not None and abs(v - 4.0) < 1e-9 for v in vals[4:])


def test_golden_stateful_integral(constants_source):
    rf = eval_asl(constants_source, "name,2,:eq,:sum,:integral")
    rows = sorted(rf.df.collect(), key=lambda r: r["t"])
    for i, r in enumerate(rows):
        assert abs(r["value"] - 2.0 * (i + 1)) < 1e-9


def test_golden_time_span(constants_source):
    # span end references the graph range (ge); `e` as the span's own end
    # would be a self-reference error (MathExpr.scala TimeSpan.parseDates)
    rf = eval_asl(constants_source, "ge-30m,ge,:time-span")
    rows = sorted(rf.df.collect(), key=lambda r: r["t"])
    assert len(rows) == N_STEPS
    flips = [r["value"] for r in rows]
    assert flips[0] == 0.0 and flips[-1] == 1.0
    assert sorted(set(flips)) == [0.0, 1.0]


def test_golden_time_span_self_reference_errors(constants_source):
    import pytest

    with pytest.raises(ValueError, match="relative to itself"):
        eval_asl(constants_source, "e-30m,e,:time-span")
    with pytest.raises(ValueError, match="relative to each other"):
        eval_asl(constants_source, "e-30m,s+30m,:time-span")


def test_chrono_time_fields_vs_python_datetime(spark):
    """Third-implementation golden: every ChronoField :time mode evaluated
    by the plan builder must equal an independent python-datetime port of
    java.time semantics (the DuckDB oracle alone can't catch a bug shared
    by both SQL translations).  Instants cover midnight (CLOCK_HOUR 24),
    noon (AMPM flip), year boundary, and a leap day."""
    import datetime as dt

    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext
    from atlas_spark.model import expr as E
    from atlas_spark.sources.datapoints import events_datapoints

    def java_chrono(t: int, mode: str) -> float:
        d = dt.datetime.fromtimestamp(t, dt.timezone.utc)
        doy = d.timetuple().tm_yday
        table = {
            "SECOND_OF_MINUTE": d.second,
            "SECOND_OF_DAY": d.hour * 3600 + d.minute * 60 + d.second,
            "MINUTE_OF_HOUR": d.minute,
            "MINUTE_OF_DAY": d.hour * 60 + d.minute,
            "HOUR_OF_AMPM": d.hour % 12,
            "CLOCK_HOUR_OF_AMPM": (d.hour % 12) or 12,
            "HOUR_OF_DAY": d.hour,
            "CLOCK_HOUR_OF_DAY": d.hour or 24,
            "AMPM_OF_DAY": d.hour // 12,
            "DAY_OF_WEEK": d.isoweekday(),
            "ALIGNED_DAY_OF_WEEK_IN_MONTH": (d.day - 1) % 7 + 1,
            "ALIGNED_DAY_OF_WEEK_IN_YEAR": (doy - 1) % 7 + 1,
            "DAY_OF_MONTH": d.day,
            "DAY_OF_YEAR": doy,
            "EPOCH_DAY": t // 86400,
            "ALIGNED_WEEK_OF_MONTH": (d.day - 1) // 7 + 1,
            "ALIGNED_WEEK_OF_YEAR": (doy - 1) // 7 + 1,
            "MONTH_OF_YEAR": d.month,
            "PROLEPTIC_MONTH": d.year * 12 + d.month - 1,
            "YEAR_OF_ERA": d.year,
            "YEAR": d.year,
            "ERA": 1,
            "INSTANT_SECONDS": t,
            "OFFSET_SECONDS": 0,
        }
        return float(table[mode])

    # midnight Jan 1 2024, 11:00, noon, 23:00 Dec 31, leap day 2024-02-29
    instants = [1704067200, 1704106800, 1704110400, 1704063600, 1709164800]
    modes = [
        "SECOND_OF_MINUTE", "SECOND_OF_DAY", "MINUTE_OF_HOUR",
        "MINUTE_OF_DAY", "HOUR_OF_AMPM", "CLOCK_HOUR_OF_AMPM",
        "HOUR_OF_DAY", "CLOCK_HOUR_OF_DAY", "AMPM_OF_DAY", "DAY_OF_WEEK",
        "ALIGNED_DAY_OF_WEEK_IN_MONTH", "ALIGNED_DAY_OF_WEEK_IN_YEAR",
        "DAY_OF_MONTH", "DAY_OF_YEAR", "EPOCH_DAY",
        "ALIGNED_WEEK_OF_MONTH", "ALIGNED_WEEK_OF_YEAR", "MONTH_OF_YEAR",
        "PROLEPTIC_MONTH", "YEAR_OF_ERA", "YEAR", "ERA",
        "INSTANT_SECONDS", "OFFSET_SECONDS",
    ]
    src = events_datapoints(spark, "/root/testdata/sf0.001")
    for t0 in instants:
        ctx = EvalContext(t0, t0 + 3600, 3600)  # one-step grid at t0
        ev = Evaluator(src, ctx)
        got = {}
        for mode in modes:
            rows = ev.eval(E.TimeExpr(mode)).df.collect()
            assert len(rows) == 1, (mode, rows)
            got[mode] = rows[0]["value"]
        for mode in modes:
            want = java_chrono(t0, mode)
            assert got[mode] == want, (t0, mode, got[mode], want)
