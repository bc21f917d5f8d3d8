"""Duration / time-reference parsing.

Subset of the reference's `Strings.parseDuration` / `parseDate` grammar
(`atlas-core/.../util/Strings.scala`): ISO-ish durations (`30s`, `5m`,
`3h`, `2d`, `1w`), relative refs (`now`, `s`, `e`, `epoch`, `e-3h`), and
epoch-seconds integers.
"""

from __future__ import annotations

import re

_UNITS = {
    "s": 1,
    "m": 60,
    "h": 3600,
    "d": 86400,
    "w": 604800,
}

_DUR_RE = re.compile(r"^(\d+)(s|m|h|d|w)$")


def parse_duration(s: str) -> int:
    """Duration string -> seconds."""
    s = s.strip()
    m = _DUR_RE.match(s)
    if m:
        return int(m.group(1)) * _UNITS[m.group(2)]
    # ISO-8601 subset: PT30M, PT1H, P1D
    m = re.match(r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$", s)
    if m and any(m.groups()):
        d, h, mi, sec = (int(g) if g else 0 for g in m.groups())
        return d * 86400 + h * 3600 + mi * 60 + sec
    if s.isdigit():
        return int(s)
    raise ValueError(f"cannot parse duration: {s!r}")


def parse_time_ref(s: str, ctx) -> int:
    """Time reference -> epoch seconds, resolved against an EvalContext."""
    s = s.strip()
    if s in ("now", "e"):
        return ctx.end
    if s in ("s", "gs", "ge"):
        return ctx.start if s in ("s", "gs") else ctx.end
    if s == "epoch":
        return 0
    m = re.match(r"^(now|e|s)([+-])(.+)$", s)
    if m:
        base = parse_time_ref(m.group(1), ctx)
        d = parse_duration(m.group(3))
        return base + d if m.group(2) == "+" else base - d
    if re.match(r"^\d+$", s):
        v = int(s)
        # values that look like epoch millis are normalized to seconds
        return v // 1000 if v > 10_000_000_000 else v
    # ISO date/time
    import datetime as dt

    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M", "%Y-%m-%d"):
        try:
            d = dt.datetime.strptime(s, fmt).replace(tzinfo=dt.timezone.utc)
            return int(d.timestamp())
        except ValueError:
            continue
    raise ValueError(f"cannot parse time reference: {s!r}")
