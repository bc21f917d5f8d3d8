"""Date/duration grammar parity (Strings.scala / IsoDateTimeParser.scala)."""

from __future__ import annotations

import datetime as dt

import pytest

from atlas_spark.util.strings import (
    is_relative_date,
    parse_date,
    parse_duration,
    parse_duration_td,
    time_range,
)


def _ep(s: str, zone: str = "UTC", **kw) -> int:
    return int(parse_date(s, zone, **kw).timestamp())


def test_at_durations():
    assert parse_duration("30s") == 30
    assert parse_duration("5m") == 300
    assert parse_duration("3h") == 10800
    assert parse_duration("2d") == 172800
    assert parse_duration("1w") == 604800
    assert parse_duration("1wk") == 604800
    assert parse_duration("2minutes") == 120
    # fixed-length calendar units (Strings.scala:579-581)
    assert parse_duration("1month") == 30 * 86400
    assert parse_duration("1y") == 365 * 86400
    assert parse_duration_td("500ms") == dt.timedelta(milliseconds=500)
    assert parse_duration_td("250us") == dt.timedelta(microseconds=250)


def test_iso_durations():
    assert parse_duration("PT30M") == 1800
    assert parse_duration("PT1H") == 3600
    assert parse_duration("P1D") == 86400
    assert parse_duration("P1DT2H3M4S") == 86400 + 7384


def test_unix_epoch_magnitude():
    # seconds up to 2^31-1, then millis / micros / nanos by magnitude
    assert _ep("1704067200") == 1704067200
    assert _ep("1704067200000") == 1704067200
    assert _ep("1704067200000000") == 1704067200
    assert _ep("1704067200000000000") == 1704067200


def test_unix_with_offset():
    assert _ep("1704067200-1h") == 1704067200 - 3600
    assert _ep("1704067200+30m") == 1704067200 + 1800


def test_iso_zone_handling():
    # naive ISO string interpreted in the requested zone
    assert _ep("2024-01-10") == 1704844800
    assert _ep("2024-01-10", "US/Pacific") == 1704844800 + 8 * 3600
    # explicit offset in the string wins over the default zone
    assert _ep("2024-01-10T00:00Z", "US/Pacific") == 1704844800
    assert _ep("2024-01-10T05:00+05:00", "US/Pacific") == 1704844800
    # DST: summer Pacific is UTC-7
    assert _ep("2024-07-10", "US/Pacific") == _ep("2024-07-10") + 7 * 3600


def test_relative_refs():
    now = dt.datetime.fromtimestamp(1704067200, tz=dt.timezone.utc)
    assert _ep("now-1w", now=now) == 1704067200 - 604800
    assert _ep("epoch+1d") == 86400
    assert is_relative_date("now-5m")
    assert not is_relative_date("now-5m", custom_ref=True)
    assert is_relative_date("e-30m", custom_ref=True)


class _Ctx:
    start = 1704067200
    end = 1704153600


def test_time_range_cross_refs():
    # end relative to start
    s, e = time_range("gs", "s+30m", _Ctx)
    assert (s, e) == (_Ctx.start, _Ctx.start + 1800)
    # start relative to end
    s, e = time_range("e-30m", "ge", _Ctx)
    assert (s, e) == (_Ctx.end - 1800, _Ctx.end)


def test_time_range_errors():
    with pytest.raises(ValueError, match="relative to each other"):
        time_range("e-30m", "s+30m", _Ctx)
    with pytest.raises(ValueError, match="start time is relative to itself"):
        time_range("s-30m", "ge", _Ctx)
    with pytest.raises(ValueError, match="end time is relative to itself"):
        time_range("gs", "e-1h", _Ctx)
    with pytest.raises(ValueError, match="start must be <= end"):
        time_range("ge", "gs", _Ctx)


def test_time_span_zone_via_tz_var():
    """The tz interpreter variable reaches the TimeSpan AST node."""
    from atlas_spark.stacklang.vocab import parse

    (se,) = parse("2024-01-10,2024-01-20,:time-span", vars={"tz": "US/Pacific"})
    expr = se.expr
    assert expr.zone == "US/Pacific"
    (se2,) = parse("2024-01-10,2024-01-20,:time-span")
    assert se2.expr.zone == "UTC"


def test_duration_to_string_zero_renders_weeks():
    """Strings.toString(Duration.ZERO) hits the first case (0 % oneWeek ==
    0) and renders '0w' — parity kept even though Engine.rewrite
    special-cases zero offsets before rendering (ADVICE r11)."""
    from atlas_spark.util.strings import duration_to_string

    assert duration_to_string(0) == "0w"
    assert duration_to_string(120) == "2m"
    assert duration_to_string(604800) == "1w"
    assert duration_to_string(90) == "90s"
