"""Typed event-dimension matching parity (TypedLwcEventFilter.scala via
TypedLwcEventFilterSuite.scala:27-230): designated dimensions compare
typed — durations parse `42ms`/`PT0.042S` against numeric nano fields,
instants parse dates against epoch numerics, longs/doubles numerically —
while every other dimension keeps the lexical string semantics, and
regex words never match a typed dimension."""

from __future__ import annotations

import json

import pytest

from atlas_spark.sources.events import EventSource
from atlas_spark.stacklang.vocab import parse as parse_asl


def _source(spark, props: dict):
    df = spark.createDataFrame(
        [("ev", 7, json.dumps(props), 1.0)],
        "event_type string, user_id long, props string, value double",
    )
    return EventSource.from_df(df).with_typed(
        {
            "duration": "duration",
            "responseSize": "long",
            "ratio": "double",
            "timestamp": "instant",
        }
    )


def _matches(spark, src, q: str) -> bool:
    from atlas_spark.model import query as Q
    from atlas_spark.stacklang.interpreter import Context, split_and_trim
    from atlas_spark.stacklang.vocab import default_interpreter

    interp = default_interpreter(60)
    ctx = Context(interp)
    interp.execute_program(split_and_trim(q), ctx)
    (query,) = ctx.stack
    assert isinstance(query, Q.Query)
    return src.df.filter(src.query_col(query)).count() == 1


# event carries duration = 42ms as NANOS (the wire convention), like
# LwcEvent(Map("duration" -> 42_000_000L))
DUR_CASES = [
    ("duration,42ms,:eq", True),
    ("duration,PT0.042S,:eq", True),
    ("duration,41ms,:eq", False),
    ("duration,50ms,:lt", True),
    ("duration,42ms,:lt", False),
    ("duration,30ms,:lt", False),
    ("duration,50ms,:le", True),
    ("duration,42ms,:le", True),
    ("duration,30ms,:le", False),
    ("duration,30ms,:gt", True),
    ("duration,42ms,:gt", False),
    ("duration,50ms,:gt", False),
    ("duration,30ms,:ge", True),
    ("duration,42ms,:ge", True),
    ("duration,50ms,:ge", False),
    ("duration,(,10ms,42ms,100ms,),:in", True),
    ("duration,(,PT0.042S,),:in", True),
    ("duration,(,10ms,100ms,),:in", False),
    ("duration,42ms,:re", False),
    ("duration,42ms,:reic", False),
    # boolean composition with an untyped string dimension
    ("app,www,:eq,duration,42ms,:eq,:or", True),
    ("app,www,:eq,duration,43ms,:eq,:or", True),
    ("app,foo,:eq,duration,42ms,:eq,:or", True),
    ("app,foo,:eq,duration,43ms,:eq,:or", False),
    ("app,www,:eq,app,foo,:eq,:not,:and,duration,42ms,:eq,:or", True),
    ("app,www,:re,app,www,:eq,:not,:and,duration,43ms,:eq,:or", False),
]


@pytest.mark.parametrize("q,want", DUR_CASES, ids=[c[0] for c in DUR_CASES])
def test_typed_duration_dimension(spark, q, want):
    src = _source(spark, {"app": "www", "duration": 42_000_000})
    assert _matches(spark, src, q) is want


def test_typed_long_double_and_instant(spark):
    src = _source(
        spark,
        {
            "responseSize": 1024,
            "ratio": 0.5,
            "timestamp": 1712880000,  # 2024-04-12T00:00:00Z in epoch SECONDS
        },
    )
    # numeric, not lexicographic: "1024" < "9" as strings
    assert _matches(spark, src, "responseSize,9,:gt")
    assert _matches(spark, src, "responseSize,1024,:eq")
    assert not _matches(spark, src, "responseSize,2048,:ge")
    assert _matches(spark, src, "ratio,0.25,:gt")
    assert not _matches(spark, src, "ratio,0.75,:gt")
    # instants: date string query vs epoch-seconds field
    assert _matches(spark, src, "timestamp,2024-04-11,:gt")
    assert not _matches(spark, src, "timestamp,2024-04-13,:gt")
    assert _matches(spark, src, "timestamp,2024-04-12T00:00,:eq")
    # epoch millis field would auto-detect magnitude identically
    src_ms = _source(spark, {"timestamp": 1712880000000})
    assert _matches(spark, src_ms, "timestamp,2024-04-12T00:00,:eq")


def test_untyped_dimensions_stay_lexical(spark):
    src = _source(spark, {"app": "www", "code": "404"})
    # `code` is NOT typed: lexicographic like tag queries
    assert _matches(spark, src, "code,50,:lt")  # "404" < "50" lexically
    assert _matches(spark, src, "code,4,:starts")
