"""Auto-step: allowed step ladder + effective-step computation.

Parity: atlas-core util/Step.scala:42-99 (ladder, round, compute,
forBlockStep) and atlas-eval graph/GraphConfig.scala:70-82 (explicit
`step` rounds UP the ladder; effective step budgets
min(max-datapoints=1440, width) pixels; start/end re-round to the
effective step).
"""

from __future__ import annotations

import pytest

from atlas_spark.api import resolve_context
from atlas_spark.util.step import (
    ALLOWED_STEP_SIZES,
    MAX_DATAPOINTS,
    ONE_DAY,
    ONE_HOUR,
    ONE_MINUTE,
    ONE_SECOND,
    Step,
)

MINUTE_BLOCK = Step.for_block_step(ONE_MINUTE)
HOUR_BLOCK = Step.for_block_step(ONE_HOUR)


def test_ladder_contents():
    # divisors of minute/hour/day only (Step.scala:56-64)
    assert 90 * ONE_SECOND not in ALLOWED_STEP_SIZES
    assert 7 * ONE_HOUR not in ALLOWED_STEP_SIZES
    for v in (ONE_SECOND, 30 * ONE_SECOND, ONE_MINUTE, 15 * ONE_MINUTE,
              ONE_HOUR, 12 * ONE_HOUR):
        assert v in ALLOWED_STEP_SIZES
    assert MAX_DATAPOINTS == 1440  # reference.conf:148


@pytest.mark.parametrize(
    "requested,expected",
    [
        (90 * ONE_SECOND, 2 * ONE_MINUTE),   # the canonical 90s -> 2m
        (ONE_MINUTE, ONE_MINUTE),            # exact rung unchanged
        (1, ONE_MINUTE),                     # below primary -> primary
        (7 * ONE_HOUR, 8 * ONE_HOUR),        # up, never down to a multiple
        (61 * ONE_MINUTE, 2 * ONE_HOUR),
    ],
)
def test_round_up_the_ladder(requested, expected):
    assert MINUTE_BLOCK.round(ONE_MINUTE, requested) == expected


def test_round_beyond_ladder_goes_to_day_boundary():
    # ladder tops at 12h; larger requests round up to whole days
    assert MINUTE_BLOCK.round(ONE_MINUTE, 13 * ONE_HOUR) == ONE_DAY
    assert MINUTE_BLOCK.round(ONE_MINUTE, ONE_DAY) == ONE_DAY
    assert MINUTE_BLOCK.round(ONE_MINUTE, 25 * ONE_HOUR) == 2 * ONE_DAY


def test_for_block_step_filters_incompatible_rungs():
    # a 7-minute block admits only rungs dividing it or whole multiples
    # of it (Step.forBlockStep:89-99)
    s = Step.for_block_step(7 * ONE_MINUTE)
    assert ONE_MINUTE in s._allowed        # 7m % 1m == 0
    assert 2 * ONE_MINUTE not in s._allowed  # 7m % 2m != 0
    assert 10 * ONE_MINUTE not in s._allowed  # 10m % 7m != 0
    # rounding an 8m request skips the incompatible rungs entirely
    assert s.round(7 * ONE_MINUTE, 8 * ONE_MINUTE) not in (
        10 * ONE_MINUTE, 12 * ONE_MINUTE, 15 * ONE_MINUTE,
    )


def test_compute_one_datapoint_per_pixel():
    # 1 week at 1m storage = 10080 points; 700px budget -> ceil = 15m
    week = 7 * ONE_DAY
    assert MINUTE_BLOCK.compute(ONE_MINUTE, 700, 0, week) == 15 * ONE_MINUTE
    # window already within budget: storage step unchanged
    assert MINUTE_BLOCK.compute(ONE_MINUTE, 700, 0, ONE_HOUR) == ONE_MINUTE
    # degenerate window smaller than the primary step never yields 0
    assert MINUTE_BLOCK.compute(ONE_MINUTE, 700, 0, 10) == ONE_MINUTE


# ---------------------------------------------------------------- API wiring

WINDOW = (1704067200, 1704067200 + 30 * 86400)  # 30d, hourly storage


def _ctx(qs: dict[str, list[str]], src_step: int = 3600):
    return resolve_context(qs, src_step, WINDOW)


def test_resolve_explicit_step_rounds_up():
    # step=90s on a 60s source -> 2m (GraphConfig.roundedStepSize)
    ctx = _ctx({"step": ["90s"], "s": ["e-3h"]}, src_step=60)
    assert ctx.step == 120
    # and never down: 7h -> 8h on the hourly source
    assert _ctx({"step": ["7h"], "s": ["e-1d"]}).step == 8 * 3600


def test_resolve_auto_step_from_width():
    # 30d/1h = 720 points; w=300 -> ceil(720/300)=3 -> 3h
    ctx = _ctx({"s": ["e-30d"], "w": ["300"]})
    assert ctx.step == 3 * 3600
    assert (ctx.end - ctx.start) // ctx.step == 240
    # default w=700: 720 points need 2 per pixel -> 2h
    assert _ctx({"s": ["e-30d"]}).step == 2 * 3600
    # s=e-1w on a 60s source at default width: 10080 -> 15m, <=700 points
    ctx = _ctx({"s": ["e-1w"]}, src_step=60)
    assert ctx.step == 900
    assert (ctx.end - ctx.start) // ctx.step <= 700


def test_resolve_width_capped_at_max_datapoints():
    # an ultra-wide (or unclamped w=99999) canvas budgets 1440 points max
    ctx = _ctx({"s": ["e-30d"], "w": ["99999"]}, src_step=60)
    n = (ctx.end - ctx.start) // ctx.step
    assert n <= 1440
    # 43200 minute-points / 1440 = 30 -> 30m rung
    assert ctx.step == 30 * 60


def test_resolve_window_rounds_to_effective_step():
    ctx = _ctx({"s": ["e-30d"], "w": ["300"]})
    assert ctx.start % ctx.step == 0 and ctx.end % ctx.step == 0


def test_resolve_small_window_backward_extension():
    # both instants flooring into one cell serve [end-step, end)
    ctx = _ctx({"s": ["e-30m"], "e": ["2024-01-15T12:10"]})
    assert ctx.end - ctx.start == ctx.step == 3600


# ------------------------------------------------------- property checks

from hypothesis import given, settings, strategies as st

_BLOCKS = st.sampled_from(
    [ONE_SECOND, ONE_MINUTE, 5 * ONE_MINUTE, ONE_HOUR, ONE_DAY]
)


@settings(max_examples=300, deadline=None)
@given(
    block=_BLOCKS,
    req=st.integers(min_value=1, max_value=3 * ONE_DAY),
)
def test_round_properties(block, req):
    s = Step.for_block_step(block)
    out = s.round(block, req)
    # never below the primary or the request
    assert out >= block and out >= req
    # always block-compatible: divides the block or is a whole multiple
    assert (block % out == 0) if out <= block else (out % block == 0)
    # idempotent: a returned step is itself a fixed point
    assert s.round(block, out) == out


@settings(max_examples=300, deadline=None)
@given(
    block=_BLOCKS,
    width=st.integers(min_value=1, max_value=2000),
    span=st.integers(min_value=1, max_value=90 * ONE_DAY),
)
def test_compute_properties(block, width, span):
    s = Step.for_block_step(block)
    out = s.compute(block, width, 0, span)
    assert out >= block
    # the defining guarantee: at most one datapoint per pixel (modulo
    # the ladder's day-boundary fallback, which only rounds UP — so the
    # point count can only shrink further)
    assert span // out <= width
    # block-compatible like round()
    assert (block % out == 0) if out <= block else (out % block == 0)
