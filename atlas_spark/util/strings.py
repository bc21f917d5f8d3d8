"""Duration / date parsing.

Faithful port of the reference grammar (`atlas-core/.../util/Strings.scala`
and `IsoDateTimeParser.scala`):

  - durations: "at" form `<n><unit>` with units ns us/μs ms s m h d w
    (7 days) month (30 days) y (365 days) and word aliases
    (Strings.scala:560-589), or ISO-8601 `PnDTnHnMnS` — all FIXED-LENGTH
    `Duration`s, never calendar periods, so relative offsets are
    zone-independent (Strings.scala:510-518 applyDateOffset).
  - dates (Strings.scala:488-507 parseDate): `<ref><+|-><duration>`
    relative form, bare named refs, unix epoch numbers with automatic
    unit by magnitude (Strings.scala:520-532: seconds up to 2^31-1, then
    millis/micros/nanos with year-2400 cutoffs), unix with offset, and
    ISO date/time strings where the zone applies only when not explicit
    in the string (IsoDateTimeParser.scala:28-90).
  - time ranges (MathExpr.scala TimeSpan.parseDates / Strings.timeRange):
    start/end may reference each other (`s`/`e`) exactly once, plus the
    graph range refs `gs`/`ge`; self/mutual references are errors.

Engine determinism note: the reference resolves `now` (and unknown refs)
to the wall clock; this engine resolves `now` to the evaluation context
end so oracle-checked results are reproducible.

Sub-second precision: durations keep microsecond resolution (`ns`
truncates to µs); results are epoch SECONDS, matching the engine's step
grid.
"""

from __future__ import annotations

import datetime as dt
import re

_AT_PERIOD = re.compile(r"^(\d+)([a-zμ]+)$")
_ISO_PERIOD = re.compile(
    r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)
_RELATIVE = re.compile(r"^([a-z]+)([\-+])([^\-+]+)$")
_NAMED = re.compile(r"^([a-z]+)$")
_UNIX = re.compile(r"^([0-9]+)$")
_UNIX_OP = re.compile(r"^([0-9]+)([\-+])([^\-+]+)$")

_SECONDS_CUTOFF = (1 << 31) - 1
_MILLIS_CUTOFF = int(
    dt.datetime(2400, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000
)
_MICROS_CUTOFF = _MILLIS_CUTOFF * 1000

# "at" duration units -> seconds factor (fractional for sub-second)
_AT_UNITS: dict[str, float] = {
    "ns": 1e-9,
    "us": 1e-6, "μs": 1e-6,
    "ms": 1e-3,
    "s": 1, "second": 1, "seconds": 1,
    "m": 60, "min": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 604800, "wk": 604800, "week": 604800, "weeks": 604800,
    "month": 2592000, "months": 2592000,  # 30 days
    "y": 31536000, "year": 31536000, "years": 31536000,  # 365 days
}


def parse_duration_td(s: str) -> dt.timedelta:
    """Duration string -> timedelta (Strings.scala:550-589)."""
    s = s.strip()
    m = _AT_PERIOD.match(s)
    if m and m.group(2) in _AT_UNITS:
        return dt.timedelta(seconds=int(m.group(1)) * _AT_UNITS[m.group(2)])
    m = _ISO_PERIOD.match(s)
    if m and any(m.groups()):
        d, h, mi, sec = m.groups()
        return dt.timedelta(
            days=int(d or 0),
            hours=int(h or 0),
            minutes=int(mi or 0),
            seconds=float(sec or 0),
        )
    raise ValueError(f"invalid period {s!r}")


def parse_duration(s: str) -> int:
    """Duration string -> whole seconds (engine step-grid resolution);
    bare digits are seconds."""
    s = s.strip()
    if s.isdigit():
        return int(s)
    return int(parse_duration_td(s).total_seconds())


def duration_to_string(seconds: int) -> str:
    """Canonical duration rendering (Strings.scala:657-666): the largest
    unit that divides evenly — weeks, days, hours, minutes, else seconds
    (e.g. 120s -> `2m`, 3600s -> `1h`).  Zero renders as `0w` exactly like
    the reference (0 % oneWeek == 0 hits the first case)."""
    for unit, suffix in ((604800, "w"), (86400, "d"), (3600, "h"), (60, "m")):
        if seconds % unit == 0:
            return f"{seconds // unit}{suffix}"
    return f"{seconds}s"


def is_relative_date(s: str, custom_ref: bool = False) -> bool:
    """Strings.scala:461-471."""
    m = _RELATIVE.match(s)
    if not m:
        return False
    return not custom_ref or m.group(1) not in ("now", "epoch")


def extract_reference_point(s: str) -> str | None:
    """Strings.scala:477-480."""
    m = _RELATIVE.match(s)
    if m:
        return m.group(1)
    m = _NAMED.match(s)
    if m:
        return m.group(1)
    return None


def _zoneinfo(zone: str) -> dt.tzinfo:
    if zone in ("UTC", "Z", "utc"):
        return dt.timezone.utc
    m = re.match(r"^([+-])(\d{2}):?(\d{2})$", zone)
    if m:
        sign = 1 if m.group(1) == "+" else -1
        return dt.timezone(
            sign * dt.timedelta(hours=int(m.group(2)), minutes=int(m.group(3)))
        )
    from zoneinfo import ZoneInfo

    return ZoneInfo(zone)


_ISO_ZONE_TAIL = re.compile(r"^(.*?)(Z|[+-]\d{2}(?::?\d{2})?(?::?\d{2})?)$")


def _parse_iso(s: str, tzinfo: dt.tzinfo) -> dt.datetime:
    """IsoDateTimeParser.parse: normalize partial forms, explicit zone in
    the string wins over the default zone."""
    explicit = None
    body = s
    m = _ISO_ZONE_TAIL.match(s)
    if m and ("T" in m.group(1) or m.group(2) == "Z" or len(m.group(1)) == 10):
        body, z = m.group(1), m.group(2)
        if z == "Z":
            explicit = dt.timezone.utc
        else:
            zm = re.match(r"^([+-])(\d{2}):?(\d{2})?:?(\d{2})?$", z)
            sign = 1 if zm.group(1) == "+" else -1
            explicit = dt.timezone(
                sign
                * dt.timedelta(
                    hours=int(zm.group(2)),
                    minutes=int(zm.group(3) or 0),
                    seconds=int(zm.group(4) or 0),
                )
            )
    for fmt in (
        "%Y-%m-%dT%H:%M:%S.%f",
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%dT%H:%M",
        "%Y-%m-%d",
    ):
        try:
            naive = dt.datetime.strptime(body, fmt)
        except ValueError:
            continue
        return naive.replace(tzinfo=explicit or tzinfo)
    raise ValueError(f"invalid date {s!r}")


def _of_epoch(v: int, tzinfo: dt.tzinfo) -> dt.datetime:
    """Automatic epoch unit by magnitude (Strings.scala:520-532)."""
    if v <= _SECONDS_CUTOFF:
        sec = float(v)
    elif v <= _MILLIS_CUTOFF:
        sec = v / 1e3
    elif v <= _MICROS_CUTOFF:
        sec = v / 1e6
    else:
        sec = v / 1e9
    return dt.datetime.fromtimestamp(sec, tz=tzinfo)


def parse_date(
    s: str,
    zone: str = "UTC",
    refs: dict[str, dt.datetime] | None = None,
    now: dt.datetime | None = None,
) -> dt.datetime:
    """Strings.parseDate -> aware datetime."""
    # Form-decoding (parse_qs) turns an un-escaped `+` into a space
    # (`e=s+6h` arrives as "s 6h"); no form of the date grammar contains
    # a space, so restore it rather than reject the common URI spelling.
    s = s.strip().replace(" ", "+")
    refs = refs or {}
    tzinfo = _zoneinfo(zone)

    def ref(name: str) -> dt.datetime:
        if name in refs:
            return refs[name]
        if name == "epoch":
            return dt.datetime.fromtimestamp(0, tz=dt.timezone.utc)
        return now or dt.datetime.now(tz=dt.timezone.utc)

    m = _RELATIVE.match(s)
    if m:
        base, op, p = ref(m.group(1)), m.group(2), m.group(3)
        d = parse_duration_td(p)
        return base - d if op == "-" else base + d
    if _NAMED.match(s):
        return ref(s)
    if _UNIX.match(s):
        return _of_epoch(int(s), tzinfo)
    m = _UNIX_OP.match(s)
    if m:
        base = _of_epoch(int(m.group(1)), tzinfo)
        d = parse_duration_td(m.group(3))
        return base - d if m.group(2) == "-" else base + d
    return _parse_iso(s, tzinfo)


def _epoch_s(d: dt.datetime) -> int:
    return int(d.timestamp())


def time_range(s: str, e: str, ctx, zone: str = "UTC") -> tuple[int, int]:
    """TimeSpan.parseDates (MathExpr.scala:239-282): `s`/`e` cross-refs
    resolve against each other, `gs`/`ge` against the graph range; self
    and mutual references are errors."""
    sref = extract_reference_point(s)
    eref = extract_reference_point(e)
    if sref == "e" and eref == "s":
        raise ValueError("start and end time are relative to each other")
    if sref == "s":
        raise ValueError("start time is relative to itself")
    if eref == "e":
        raise ValueError("end time is relative to itself")

    gs = dt.datetime.fromtimestamp(ctx.start, tz=dt.timezone.utc)
    ge = dt.datetime.fromtimestamp(ctx.end, tz=dt.timezone.utc)
    refs = {"gs": gs, "ge": ge, "now": ge}

    if sref == "e":
        end = parse_date(e, zone, refs, now=ge)
        start = parse_date(s, zone, {**refs, "e": end}, now=ge)
    elif eref == "s":
        start = parse_date(s, zone, refs, now=ge)
        end = parse_date(e, zone, {**refs, "s": start}, now=ge)
    else:
        start = parse_date(s, zone, refs, now=ge)
        end = parse_date(e, zone, refs, now=ge)
    if _epoch_s(start) > _epoch_s(end):
        raise ValueError("start must be <= end")
    return _epoch_s(start), _epoch_s(end)


def graph_time_range(
    s: str, e: str, zone: str = "UTC", now: dt.datetime | None = None
) -> tuple[int, int]:
    """Strings.timeRange (Strings.scala:605-628) — the GRAPH param
    layer's s/e resolution, distinct from the `:time-span` grammar in
    `time_range`: when `s` is custom-relative (ref other than
    now/epoch) or the bare named ref `e`, the end parses FIRST and `s`
    may reference it; otherwise `s` parses first and `e` may reference
    it (`e=s+6h`).  Both custom-relative is rejected.  Absolute date
    literals parse in the REQUEST timezone (`tz = timezoneIds.head`,
    GraphConfig.scala:59-65); unknown named refs fall back to `now`
    like the reference's parseRefVar.  start == end is allowed — the
    step-rounding backward extension serves one cell."""
    # restore form-decoded `+` BEFORE the branch test, else `s=e+3h`
    # (arriving "e 3h") would misclassify as absolute
    s = s.strip().replace(" ", "+")
    e = e.strip().replace(" ", "+")
    if is_relative_date(s, custom_ref=True) or s == "e":
        if is_relative_date(e, custom_ref=True):
            raise ValueError("start and end are both relative")
        end = parse_date(e, zone, now=now)
        start = parse_date(s, zone, {"e": end}, now=now)
    else:
        start = parse_date(s, zone, now=now)
        end = parse_date(e, zone, {"s": start}, now=now)
    rs, re_ = _epoch_s(start), _epoch_s(end)
    if re_ < rs:
        raise ValueError("end time is before start time")
    return rs, re_


_VAR_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789._-"
)


def substitute(s: str, f) -> str:
    """Variable substitution (Strings.scala:435-456): `$var` reads chars
    from `allowedInVarName` ([A-Za-z0-9._-]); `$(var)` reads to the
    closing paren.  `f(key)` supplies the value; an empty key (`$$`,
    trailing `$`, `$()`, or an unterminated `$(`) renders a literal `$`
    with the scanned delimiter chars consumed — exactly the reference's
    parenVar/simpleVar advance behavior."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "$" or i == n - 1:
            out.append(c)
            i += 1
            continue
        j = i + 1
        key = ""
        if s[j] == "(":
            end = s.find(")", j + 1)
            if end < 0:
                # unterminated: key cleared, scan restarts after "$("
                # (Strings.scala:405-417 parenVar returns its start index)
                key, j = "", i + 2
            else:
                key, j = s[j + 1 : end], end + 1
        else:
            k = j
            while k < n and s[k] in _VAR_CHARS:
                k += 1
            key, j = s[j:k], k
        if key == "":
            out.append("$")
            i = max(j, i + 1)
        else:
            out.append(f(key))
            i = j
    return "".join(out)
