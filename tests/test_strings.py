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


# ------------------------------------------- graph_time_range (Strings.timeRange)


def _now_dt():
    import datetime as dt

    return dt.datetime.fromtimestamp(1704672000, tz=dt.timezone.utc)  # 2024-01-08


def test_graph_time_range_branches():
    """Strings.timeRange (Strings.scala:605-628): custom-relative or
    bare-`e` start resolves end first; otherwise start first with `e`
    allowed to reference it."""
    from atlas_spark.util.strings import graph_time_range

    now = _now_dt()
    # relative s against absolute e
    s, e = graph_time_range("e-6h", "2024-01-02T06:00", now=now)
    assert (s, e) == (1704153600, 1704175200)
    # absolute s, e references it
    s2, e2 = graph_time_range("2024-01-02", "s+6h", now=now)
    assert (s2, e2) == (s, e)
    # bare "e" start is branch A even though not RelativeDate
    s3, e3 = graph_time_range("e", "2024-01-02T06:00", now=now)
    assert s3 == e3 == 1704175200  # start == end allowed
    # now-relative s is NOT custom-relative -> branch B, e may ref s
    s4, e4 = graph_time_range("now-1h", "s+30m", now=now)
    assert e4 - s4 == 1800 and s4 == 1704672000 - 3600


def test_graph_time_range_tz_and_errors():
    from atlas_spark.util.strings import graph_time_range

    now = _now_dt()
    # absolute literals parse in the request zone (PST = UTC-8 in Jan)
    s_utc, _ = graph_time_range("2024-01-02", "s+1h", "UTC", now=now)
    s_pst, _ = graph_time_range("2024-01-02", "s+1h", "US/Pacific", now=now)
    assert s_pst - s_utc == 8 * 3600
    # explicit zone in the literal wins over the request zone
    s_z, _ = graph_time_range("2024-01-02T00:00Z", "s+1h", "US/Pacific", now=now)
    assert s_z == s_utc
    import pytest

    with pytest.raises(ValueError, match="both relative"):
        graph_time_range("e-3h", "s+1h", now=now)
    with pytest.raises(ValueError, match="before start"):
        graph_time_range("2024-01-03", "2024-01-02", now=now)
    # form-decoded '+' (space) still parses as the offset op
    s5, e5 = graph_time_range("2024-01-02", "s 6h", now=now)
    assert e5 - s5 == 6 * 3600
    s6, e6 = graph_time_range("e 0h", "2024-01-02", now=now)
    assert s6 == e6


def test_graph_time_range_properties():
    """Invariants over random relative offsets and zones: a custom-
    relative s always lands exactly its offset before e; e=s+d always
    spans d; results are zone-independent for relative-only forms."""
    from hypothesis import given, settings, strategies as st

    from atlas_spark.util.strings import graph_time_range

    now = _now_dt()

    @settings(max_examples=200, deadline=None)
    @given(
        mins=st.integers(min_value=1, max_value=10 * 24 * 60),
        zone=st.sampled_from(["UTC", "US/Pacific", "Asia/Tokyo", "+05:30"]),
        form=st.sampled_from(["s_rel", "e_rel"]),
    )
    def check(mins, zone, form):
        if form == "s_rel":
            s, e = graph_time_range(f"e-{mins}m", "2024-01-05T12:00Z", zone, now=now)
        else:
            s, e = graph_time_range("2024-01-05T12:00Z", f"s+{mins}m", zone, now=now)
        assert e - s == mins * 60
        # the absolute anchor carried its own zone: result zone-free
        anchor = 1704456000  # 2024-01-05T12:00Z
        assert (s if form == "e_rel" else e) == anchor

    check()


def test_graph_time_range_reference_suite_cases():
    """StringsSuite timeRange cases pinned one-for-one
    (StringsSuite.scala:724-770)."""
    import pytest

    from atlas_spark.util.strings import graph_time_range

    now = _now_dt()
    # plain absolute range
    s, e = graph_time_range("2018-07-24", "2018-07-24T00:05", now=now)
    assert e - s == 300
    # end before start rejected
    with pytest.raises(ValueError):
        graph_time_range("2018-07-24T00:05", "2018-07-24", now=now)
    # start == end allowed
    s, e = graph_time_range("2018-07-24", "2018-07-24", now=now)
    assert s == e
    # both relative rejected
    with pytest.raises(ValueError, match="both relative"):
        graph_time_range("e-5m", "s+5m", now=now)
    # unix time WITH op is not relative: e anchors, s references it
    s, e = graph_time_range("e-5m", "1733292000+5m", now=now)
    assert e == 1733292000 + 300 and s == 1733292000
    # start relative to end / end relative to start
    s, e = graph_time_range("e-5m", "2018-07-24T00:05", now=now)
    assert e - s == 300
    s2, e2 = graph_time_range("2018-07-24", "s+5m", now=now)
    assert (s2, e2) == (s, e)
