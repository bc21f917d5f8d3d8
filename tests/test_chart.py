"""Chart renderer tests: axis scales (Scales.scala semantics) and stacked
area compositing (TimeSeriesStack.scala semantics).  Structural checks on
decoded pixels — not pixel parity with atlas-chart."""

from __future__ import annotations

import struct
import zlib

import pytest

from atlas_spark.api import GraphLine, GraphResult
from atlas_spark.chart import (
    PALETTE,
    _ll_bucket,
    _ll_bucket_index,
    _vizlog,
    make_yscale,
    render_png,
)


def _decode(png: bytes):
    """-> (w, h, pixel(x, y) -> (r, g, b))."""
    w, h = struct.unpack(">II", png[16:24])
    idat = png[png.index(b"IDAT") + 4 :]
    raw = zlib.decompress(idat[: idat.index(b"IEND") - 8])

    def px(x: int, y: int):
        i = y * (w * 3 + 1) + 1 + x * 3
        return tuple(raw[i : i + 3])

    return w, h, px


# ---------------------------------------------------------------- scales


def test_vizlog_reference_semantics():
    """Scales.scala:61-68: vizlog(0)=0; positives log10(v+1); negatives
    mirror so the map is odd and monotone through zero."""
    assert _vizlog(0.0) == 0.0
    assert _vizlog(9.0) == 1.0  # log10(10)
    assert _vizlog(-9.0) == -1.0
    vals = [-100.0, -1.0, 0.0, 1.0, 100.0]
    imgs = [_vizlog(v) for v in vals]
    assert imgs == sorted(imgs)


def test_log_scale_lifts_small_values():
    """On [0, 100], v=10 sits at 10% height linearly but >40% under log —
    the whole point of o=log (spread small values)."""
    lin = make_yscale("linear", 0.0, 100.0, 0, 100)
    log = make_yscale("log", 0.0, 100.0, 0, 100)
    assert lin(0.0) == 100 and lin(100.0) == 0
    assert log(0.0) == 100 and log(100.0) == 0
    assert lin(10.0) == 90
    assert log(10.0) < 60  # lifted well above its linear position
    # monotone
    ys = [log(v) for v in (0.0, 0.5, 1.0, 5.0, 10.0, 50.0, 100.0)]
    assert ys == sorted(ys, reverse=True)


def test_pow_scales():
    """pow2 compresses small values, sqrt lifts them; both sign-preserving
    and monotone (Scales.scala power)."""
    p2 = make_yscale("pow2", 0.0, 100.0, 0, 100)
    sq = make_yscale("sqrt", 0.0, 100.0, 0, 100)
    lin = make_yscale("linear", 0.0, 100.0, 0, 100)
    assert p2(10.0) > lin(10.0)  # pushed down toward the axis
    assert sq(10.0) < lin(10.0)  # lifted up
    for f in (p2, sq):
        ys = [f(v) for v in (0.0, 10.0, 50.0, 100.0)]
        assert ys == sorted(ys, reverse=True)


def test_log_linear_buckets_round_trip():
    """LogLinear.scala bucket/bucketIndex: 9 linear buckets per decade;
    bucket(i) is the max value of bucket i, so bucket(index(v)) bounds v
    from above and the previous bucket bounds it from below."""
    assert _ll_bucket_index(0.0) == 0
    for v in (1e-9, 0.5, 1.0, 1.5, 2.0, 9.0, 10.0, 123.0, 1e6):
        i = _ll_bucket_index(v)
        assert _ll_bucket(i) >= v * (1 - 1e-12), (v, i)
        assert _ll_bucket(i - 1) < v * (1 + 1e-12), (v, i)
    # negatives mirror
    assert _ll_bucket_index(-1.0) == -_ll_bucket_index(1.0) - 1


def test_log_linear_scale_monotone():
    f = make_yscale("log-linear", 0.0, 1000.0, 0, 200)
    ys = [f(v) for v in (0.0, 0.1, 1.0, 9.0, 50.0, 400.0, 1000.0)]
    assert ys == sorted(ys, reverse=True)
    assert ys[0] >= 195 and ys[-1] <= 5


# ---------------------------------------------------------------- stacking


def _result(lines, **kw):
    return GraphResult(start=0, end=3600 * 24, step=3600, lines=lines, **kw)


def _classify(rgb):
    r, g, b = rgb
    if r > 200 and g > 200 and b > 200:
        return "bg"
    if r > g and r > b:
        return "red"
    if g > r and g > b:
        return "green"
    return "other"


def test_stack_composites_on_running_offset():
    """Two constant stacked lines (1.0 red under 2.0 green): in any data
    column the green band must sit strictly ABOVE the red band (fills from
    the running offset, TimeSeriesStack.draw), and the y-range must cover
    the stacked TOTAL (3.0), not the max single line."""
    n = 24
    lines = [
        GraphLine({}, "a", [1.0] * n, {"ls": "stack"}),
        GraphLine({}, "b", [2.0] * n, {"ls": "stack"}),
    ]
    png = render_png(_result(lines), width=300, height=200)
    w, h, px = _decode(png)
    x = 150  # middle data column
    reds = [y for y in range(h) if _classify(px(x, y)) == "red"]
    greens = [y for y in range(h) if _classify(px(x, y)) == "green"]
    assert reds and greens
    # stacked: every green pixel above (smaller y) every red pixel
    assert max(greens) < min(reds), (min(reds), max(greens))
    # red band bottom at the axis, green top near the plot top (value 3 of
    # auto-range [0, 3]) — the two bands tile the full column
    span = max(reds) - min(greens)
    assert span > (h - 30) * 0.8, span
    # green band twice the red band (2.0 vs 1.0 of the 3.0 total)
    assert len(greens) > 1.5 * len(reds)


def test_axis_stack_param_defaults_lines_to_stack():
    """stack=1 on the axis stacks lines that don't set ls explicitly
    (Grapher newAxis -> PlotDef); with it off the same lines overdraw."""
    n = 24
    mk = lambda **kw: [  # noqa: E731
        GraphLine({}, "a", [1.0] * n, {}),
        GraphLine({}, "b", [2.0] * n, {}),
    ]
    png = render_png(_result(mk(), axis_stack=True), width=300, height=200)
    w, h, px = _decode(png)
    x = 150
    reds = [y for y in range(h) if _classify(px(x, y)) == "red"]
    greens = [y for y in range(h) if _classify(px(x, y)) == "green"]
    assert reds and greens and max(greens) < min(reds)


def test_stack_zero_draws_axis_marker():
    """TimeSeriesStack: a 0.0 value with no accumulated offsets still
    paints one pixel at the axis so 0 is distinguishable from NO_DATA."""
    n = 24
    data = [0.0] * n
    data[5] = None  # a NaN gap: nothing drawn there
    lines = [GraphLine({}, "a", data, {"ls": "stack"})]
    png = render_png(_result(lines), width=300, height=200)
    w, h, px = _decode(png)
    cols_with_red = {
        x for x in range(w) for y in range(h) if _classify(px(x, y)) == "red"
    }
    assert cols_with_red  # zero markers drawn
    # the y-range is [0,1] default; markers sit on the zero line (bottom)
    marker_ys = {
        y for x in cols_with_red for y in range(h) if _classify(px(x, y)) == "red"
    }
    assert max(marker_ys) - min(marker_ys) <= 2


def test_negative_values_stack_downward():
    """Negatives accumulate on their own offset below zero."""
    n = 24
    lines = [
        GraphLine({}, "a", [-1.0] * n, {"ls": "stack"}),
        GraphLine({}, "b", [-2.0] * n, {"ls": "stack"}),
    ]
    png = render_png(_result(lines), width=300, height=200)
    w, h, px = _decode(png)
    x = 150
    reds = [y for y in range(h) if _classify(px(x, y)) == "red"]
    greens = [y for y in range(h) if _classify(px(x, y)) == "green"]
    assert reds and greens
    # downward stack: green (second line) extends BELOW red
    assert min(greens) > max(reds)


def test_png_log_scale_renders(spark, sf_dir):
    """End-to-end: o=1 (legacy) and scale=log both select the log axis and
    render; the log image lifts a low-amplitude line visibly higher than
    the linear image."""
    from atlas_spark.api import Engine

    engine = Engine(spark, sf_dir)
    base = "/api/v1/graph?q=:true,:sum,(,name,),:by&s=2024-01-02&e=2024-01-03"
    g_legacy = engine.graph(base + "&o=1")
    assert g_legacy.scale == "log"
    g_scale = engine.graph(base + "&scale=log")
    assert g_scale.scale == "log"
    assert engine.graph(base).scale == "linear"
    png = engine.graph_png(base + "&scale=log", width=300, height=200)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
