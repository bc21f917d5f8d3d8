"""Log-linear percentile bucket scheme.

Same shape as the Spectator `PercentileBuckets` histogram used by the
reference's `:percentiles` operator (`MathExpr.scala:873-1026`): a fixed
global table of bucket boundaries, dense at small values and exponentially
spaced with linear subdivision above, so any long value maps to a bucket
with bounded relative error.  Bucket tags are encoded `D%04X` / `T%04X`
(timer values in nanoseconds, scaled by 1e-9 after estimation —
`MathExpr.scala:984-988`).

Table construction: seed buckets 1,2,3; then for each even power of two
`base = 2^exp` add boundaries `base, base+delta, ...` with `delta = base/3`
up to `4*base - delta`; terminate with Long.MAX_VALUE.  Estimation
linearly interpolates within the bucket containing the target rank
(standard histogram quantile estimation).
"""

from __future__ import annotations

import bisect
from functools import lru_cache

LONG_MAX = (1 << 63) - 1


def _to_java_long(v: int) -> int:
    """Wrap an unbounded int to Java 64-bit signed overflow semantics."""
    return ((v + (1 << 63)) % (1 << 64)) - (1 << 63)


def _build_boundaries() -> list[int]:
    buckets = [1, 2, 3]
    exp = 2
    while exp < 64:
        base = 1 << exp
        delta = base // 3
        # Java: `(current << 2) - delta` overflows at exp=62 (2^64 - delta
        # wraps negative), so that level contributes NO buckets — the table
        # has exactly 276 entries, matching Spectator's encoding.
        end = _to_java_long((base << 2) - delta)
        cur = base
        while cur < end:
            buckets.append(cur)
            cur += delta
        exp += 2
    buckets.append(LONG_MAX)
    return buckets


BOUNDARIES: list[int] = _build_boundaries()
N_BUCKETS = len(BOUNDARIES)


def index_of(v: int) -> int:
    """Bucket index for a long value: number of boundaries strictly below
    v, i.e. bucket i covers (BOUNDARIES[i-1], BOUNDARIES[i]]."""
    if v <= 0:
        return 0
    return bisect.bisect_left(BOUNDARIES, v)


def bucket_value(i: int) -> int:
    return BOUNDARIES[min(i, N_BUCKETS - 1)]


def tag_for(v: int, timer: bool = False) -> str:
    return ("T" if timer else "D") + format(index_of(v), "04X")


def percentiles(counts: dict[int, float], pcts: list[float]) -> list[float]:
    """Reference estimator (python, used by tests): Spectator's
    `PercentileBuckets.percentiles` walks EVERY bucket, so the interpolation
    lower bound at the crossing bucket `i` is always ``BOUNDARIES[i-1]``
    (0 for i==0) — even when the intervening buckets are empty.  Empty
    buckets advance the boundary but not the cumulative mass."""
    total = sum(c for c in counts.values() if c > 0)
    out = [float("nan")] * len(pcts)
    if total <= 0:
        return out
    order = sorted(i for i, c in counts.items() if c > 0)
    targets = sorted(range(len(pcts)), key=lambda k: pcts[k])
    ti = 0
    prev_p = 0.0
    cum = 0.0
    for i in order:
        prev_b = float(BOUNDARIES[i - 1]) if i > 0 else 0.0
        cum += counts[i]
        next_p = 100.0 * cum / total
        next_b = float(bucket_value(i))
        while ti < len(targets) and prev_p <= pcts[targets[ti]] <= next_p:
            p = pcts[targets[ti]]
            f = 0.0 if next_p == prev_p else (p - prev_p) / (next_p - prev_p)
            out[targets[ti]] = f * (next_b - prev_b) + prev_b
            ti += 1
        prev_p = next_p
    return out


def pct_label(p: float) -> str:
    """Percentile output tag, space-padded so decimals align
    (MathExpr.scala:1012-1019)."""
    if p < 10.0:
        return f"  {p:.1f}" if p == int(p) else f"  {p}"
    if p < 100.0:
        return f" {p:.1f}" if p == int(p) else f" {p}"
    return f"{p:.1f}" if p == int(p) else f"{p}"


@lru_cache(maxsize=1)
def boundaries_sql_array() -> str:
    """DuckDB list literal of the bucket boundaries."""
    return "[" + ", ".join(str(b) for b in BOUNDARIES) + "]"


def index_of_sql_expr(v: str) -> str:
    """Spark SQL expression computing `index_of({v})` in O(1) integer
    arithmetic instead of a 276-element array scan per row.

    Exploits the table's log-linear construction: above the 1,2,3 seeds,
    each even power-of-two level `base = 2^e` contributes boundaries
    `base + j*(base div 3)` — 11 entries at e=2, exactly 9 per level for
    e >= 4 (the e=62 level contributes none due to Java overflow, so
    values past the e=60 level clamp to the Long.MAX_VALUE boundary 275).
    `length(bin(v))` is the exact bit length, so every step is exact
    64-bit integer arithmetic.  Verified equal to `index_of` over all
    boundary neighborhoods and 20k random 63-bit values
    (tests/test_sketches.py::test_index_of_sql_expr_matches).
    """
    bl = f"length(bin({v}))"
    e = f"(({bl} - 1) - ({bl} - 1) % 2)"
    base = f"shiftleft(cast(1 as bigint), {e})"
    delta = f"({base} div 3)"
    within = f"(({v} - {base} + {delta} - 1) div {delta})"
    m = f"(CASE WHEN {e} = 2 THEN 11 ELSE 9 END)"
    start = f"(CASE WHEN {e} = 2 THEN 3 ELSE 14 + 9 * (({e} - 4) div 2) END)"
    return (
        f"cast(CASE WHEN {v} <= 0 THEN 0 WHEN {v} <= 3 THEN {v} - 1 "
        f"ELSE least({start} + least({within}, {m}), 275) END as int)"
    )
