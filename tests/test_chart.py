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


# ------------------------------------------------- bounds / legend / theme


def test_explicit_axis_bounds():
    """u/l pin the y-range (PlotDef.upper/lower): a constant 5 with
    l=0,u=10 sits mid-plot; out-of-range values clamp to the plot edge
    instead of spilling into labels."""
    n = 24
    lines = [GraphLine({}, "a", [5.0] * n, {})]
    png = render_png(_result(lines, lower=0.0, upper=10.0), width=300, height=200)
    w, h, px = _decode(png)
    ys = [y for y in range(h) if _classify(px(150, y)) == "red"]
    assert ys, "line not drawn"
    mid = sum(ys) / len(ys)
    # plot area ~ rows 8..180; value 5 of [0,10] -> middle third
    assert h * 0.3 < mid < h * 0.65, mid
    # u below the data: clamped to the top edge, not drawn outside
    png2 = render_png(_result(lines, lower=0.0, upper=2.0), width=300, height=200)
    w2, h2, px2 = _decode(png2)
    ys2 = [y for y in range(h2) if _classify(px2(150, y)) == "red"]
    assert ys2 and max(ys2) < h2 * 0.2, ys2[:5]


def test_auto_bounds_tight_for_lines_zero_for_fills():
    """auto-style bounds (PlotBound.AutoStyle): pure line plots get tight
    data bounds; any area/stack line forces 0 into the range."""
    n = 24
    # constant 100 line, tight bounds -> degenerate range [100, 101] puts
    # the line at the bottom of the plot
    line_png = render_png(
        _result([GraphLine({}, "a", [100.0] * n, {})]), width=300, height=200
    )
    w, h, px = _decode(line_png)
    line_ys = [y for y in range(h) if _classify(px(150, y)) == "red"]
    assert line_ys and min(line_ys) > h * 0.7, line_ys[:5]
    # same data as area -> range [0, 100], fill spans most of the plot
    area_png = render_png(
        _result([GraphLine({}, "a", [100.0] * n, {"ls": "area"})]),
        width=300,
        height=200,
    )
    w2, h2, px2 = _decode(area_png)
    area_ys = [y for y in range(h2) if _classify(px2(150, y)) == "red"]
    assert area_ys and (max(area_ys) - min(area_ys)) > h2 * 0.7


def test_legend_with_stats_renders():
    """show_legend extends the image below the time axis (canvas layout):
    color boxes and stat-row text, image height grows by the legend."""
    n = 24
    lines = [
        GraphLine({}, "alpha", [1.0] * n, {}),
        GraphLine({}, "beta", [2.0] * n, {}),
    ]
    png = render_png(
        _result(lines, show_legend=True, show_legend_stats=True),
        width=300,
        height=200,
    )
    w, h, px = _decode(png)
    # canvas 300x200 + y-axis margins (48+8) and title/time-axis/legend
    # rows (8 + 20 + 2*33)
    assert (w, h) == (356, 294)
    # legend strip = bottom 2 * (9 + 24) = 66 rows; the first entry's
    # color box is the palette red at x in [4, 10]
    strip0 = h - 66
    box_red = [
        (x, y)
        for x in range(4, 11)
        for y in range(strip0, strip0 + 9)
        if _classify(px(x, y)) == "red"
    ]
    assert box_red, "first legend color box missing"
    box_green = [
        (x, y)
        for x in range(4, 11)
        for y in range(strip0 + 33, strip0 + 42)
        if _classify(px(x, y)) == "green"
    ]
    assert box_green, "second legend color box missing"
    # stat rows render text pixels right of the box
    text_px = sum(
        1
        for x in range(14, w)
        for y in range(strip0 + 9, strip0 + 33)
        if _classify(px(x, y)) not in ("bg",)
    )
    assert text_px > 50, text_px
    # no legend -> the image simply lacks the legend band
    png2 = render_png(_result(lines), width=300, height=200)
    w2, h2, px2 = _decode(png2)
    assert (w2, h2) == (356, 294 - 66)


def test_dark_theme():
    """theme=dark swaps the background; line colors stay from the
    palette."""
    n = 24
    lines = [GraphLine({}, "a", [1.0] * n, {})]
    png = render_png(_result(lines, theme="dark"), width=300, height=200)
    w, h, px = _decode(png)
    assert px(0, 0) == (16, 16, 16)
    assert any(_classify(px(150, y)) == "red" for y in range(h))


def test_graph_uri_legend_and_theme_params(spark, sf_dir):
    """URI flags (Grapher.scala:147-149): legend on by default, no_legend
    / only_graph turn it off, no_legend_stats keeps labels only; u/l and
    theme params flow through."""
    from atlas_spark.api import Engine

    engine = Engine(spark, sf_dir)
    base = "/api/v1/graph?q=:true,:sum,(,name,),:by&s=2024-01-02&e=2024-01-03"
    g = engine.graph(base)
    assert g.show_legend and g.show_legend_stats
    assert engine.graph(base + "&no_legend=1").show_legend is False
    assert engine.graph(base + "&only_graph=1").show_legend is False
    assert engine.graph(base + "&no_legend_stats=1").show_legend_stats is False
    g2 = engine.graph(base + "&l=0&u=1e3&theme=dark")
    assert g2.lower == 0.0 and g2.upper == 1000.0 and g2.theme == "dark"
    g3 = engine.graph(base + "&l=auto-data")
    assert g3.lower == "auto-data"
    png = engine.graph_png(base + "&theme=dark", width=320, height=200)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_named_and_list_palettes():
    """palette=reds cycles the reference reds list; a colors: list and a
    (,..,) expression list parse to explicit colors (Palette.create)."""
    from atlas_spark.chart import PALETTES, palette_colors

    assert palette_colors("reds") == PALETTES["reds"]
    assert palette_colors("colors:ff0000,00ff00") == ((255, 0, 0), (0, 255, 0))
    assert palette_colors("(,ff0000,0000ff,)") == ((255, 0, 0), (0, 0, 255))
    assert palette_colors("nope") is None and palette_colors(None) is None
    n = 24
    lines = [
        GraphLine({}, "a", [1.0] * n, {}),
        GraphLine({}, "b", [2.0] * n, {}),
    ]
    png = render_png(
        _result(lines, palette="colors:ff0000,ff0000"), width=300, height=200
    )
    w, h, px = _decode(png)
    # both lines red now: no green anywhere
    assert not any(
        _classify(px(x, y)) == "green" for x in range(w) for y in range(h)
    )


def test_per_line_palette_cycles_within_group():
    """A line-level :palette setting cycles its own palette per line in
    the group, independent of the axis palette."""
    n = 24
    lines = [
        GraphLine({}, "a", [1.0] * n, {"palette": "colors:00ff00,00cc00"}),
        GraphLine({}, "b", [2.0] * n, {"palette": "colors:00ff00,00cc00"}),
        GraphLine({}, "c", [3.0] * n, {}),
    ]
    png = render_png(_result(lines), width=300, height=200)
    w, h, px = _decode(png)
    greens = sum(1 for x in range(w) for y in range(h) if _classify(px(x, y)) == "green")
    assert greens > 50  # the palette-group lines are green shades
    # the third line took the FIRST default-palette slot (its own group)
    reds = sum(1 for x in range(w) for y in range(h) if _classify(px(x, y)) == "red")
    assert reds > 20


def test_title_and_ylabel():
    """title renders centered at the top; ylabel renders down the far
    left column; both shift the plot area rather than overdrawing it."""
    n = 24
    lines = [GraphLine({}, "a", [1.0] * n, {})]
    png = render_png(
        _result(lines, title="REQS PER SEC", ylabel="RPS"), width=300, height=200
    )
    w, h, px = _decode(png)
    top_text = sum(
        1 for x in range(w) for y in range(0, 9) if _classify(px(x, y)) != "bg"
    )
    assert top_text > 20, top_text
    left_text = sum(
        1 for x in range(0, 6) for y in range(10, h - 40) if _classify(px(x, y)) != "bg"
    )
    assert left_text > 10, left_text
    plain = render_png(_result(lines), width=300, height=200)
    assert plain != png


def test_vision_filter_matrices():
    """VisionType matrices: protanopia collapses pure red toward yellow-
    brown (no red-green separation), achromatopsia is luminance-gray."""
    from atlas_spark.chart import vision_filter

    assert vision_filter((255, 0, 0), "normal") == (255, 0, 0)
    assert vision_filter((255, 0, 0), None) == (255, 0, 0)
    p = vision_filter((255, 0, 0), "protanopia")
    assert p == (145, 142, 0), p  # 0.567*255, 0.558*255
    g = vision_filter((255, 0, 0), "achromatopsia")
    assert g[0] == g[1] == g[2] == 76  # 0.299*255
    n = 24
    lines = [GraphLine({}, "a", [1.0] * n, {})]
    png_n = render_png(_result(lines), width=300, height=200)
    png_v = render_png(_result(lines, vision="protanopia"), width=300, height=200)
    assert png_n != png_v


def test_axis_sort_params(spark, sf_dir):
    """sort/order URL params reorder lines by legend stats
    (Grapher.scala:480-525); order=desc alone sorts by legend
    descending."""
    from atlas_spark.api import Engine

    engine = Engine(spark, sf_dir)
    base = "/api/v1/graph?q=:true,:sum,(,name,),:by,$(name),:legend&s=2024-01-02&e=2024-01-03"
    labels = [ln.label for ln in engine.graph(base + "&sort=legend").lines]
    assert labels == sorted(labels)
    desc = [ln.label for ln in engine.graph(base + "&order=desc").lines]
    assert desc == sorted(labels, reverse=True)
    by_max = engine.graph(base + "&sort=max&order=desc").lines
    maxes = [max(v for v in ln.data if v is not None) for ln in by_max]
    assert maxes == sorted(maxes, reverse=True)
    by_tot = engine.graph(base + "&sort=total").lines
    tots = [sum(v for v in ln.data if v is not None) for ln in by_tot]
    assert tots == sorted(tots)


def test_tick_label_modes():
    """TickLabelMode: decimal metric prefixes, 1024-based binary, w/d/h/m
    durations, and off (labels suppressed)."""
    from atlas_spark.chart import _fmt_value

    assert _fmt_value(2_500_000) == "2.5M"
    assert _fmt_value(2048, "binary") == "2.0KI"
    assert _fmt_value(3 * (1 << 30), "binary") == "3.0GI"
    assert _fmt_value(90, "duration") == "1.5M"
    assert _fmt_value(7200, "duration") == "2.0H"
    assert _fmt_value(86400 * 14, "duration") == "2.0W"
    n = 24
    lines = [GraphLine({}, "a", [1.0] * n, {})]
    on = render_png(_result(lines), width=300, height=200)
    off = render_png(_result(lines, tick_labels="off"), width=300, height=200)
    w, h, px = _decode(off)
    # left label gutter (plot rows only — the time-axis row below starts
    # at x=34) is empty when labels are off
    left = sum(
        1 for x in range(0, 40) for y in range(0, h - 30) if _classify(px(x, y)) != "bg"
    )
    won, hon, pxon = _decode(on)
    left_on = sum(
        1
        for x in range(0, 40)
        for y in range(0, hon - 30)
        if _classify(pxon(x, y)) != "bg"
    )
    assert left == 0 and left_on > 0


def test_multi_axis_independent_scaling(spark, sf_dir):
    """Lines assigned to axis 1 via :axis scale against their own bounds
    (per-axis u.N/l.N overrides); the right margin gains the second
    axis's tick labels."""
    from atlas_spark.api import Engine

    engine = Engine(spark, sf_dir)
    base = (
        "/api/v1/graph?q=name,click,:eq,:sum,name,view,:eq,:sum,1,:axis"
        "&s=2024-01-02&e=2024-01-03"
    )
    g = engine.graph(base + "&u.1=1e6")
    assert g.axes == {1: {"upper": 1e6}}
    assert g.lines[1].settings.get("axis") == "1"
    png = engine.graph_png(base + "&u.1=1e6", width=400, height=200)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, px = _decode(png)
    # right-margin tick labels present (text pixels right of the plot)
    right = sum(
        1
        for x in range(w - 40, w)
        for y in range(0, h - 30)
        if _classify(px(x, y)) != "bg"
    )
    assert right > 10, right
    # per-axis scaling: with u.1 huge, the axis-1 line pins to the
    # bottom; without it both lines span the plot similarly
    g1 = engine.graph(base)
    assert g1.axes == {}


def test_axis_overrides_parse(spark, sf_dir):
    from atlas_spark.api import Engine

    engine = Engine(spark, sf_dir)
    base = "/api/v1/graph?q=:true,:sum&s=2024-01-02&e=2024-01-03"
    g = engine.graph(
        base + "&scale.1=log&l.2=auto-data&stack.3=1&tick_labels.1=binary&o.2=1"
    )
    assert g.axes[1] == {"scale": "log", "tick_labels": "binary"}
    assert g.axes[2] == {"lower": "auto-data", "scale": "log"}
    assert g.axes[3] == {"stack": True}


def test_named_colors_resolve_per_theme():
    """Theme-scoped named colors (reference.conf named-colors;
    GrapherSuite 'named color with alpha applies alpha to resolved
    color'): blue1 in light is 6BAED6, red2 is CB181D; dark remaps the
    same names; :alpha composes on the resolved color."""
    from atlas_spark.chart import _parse_color

    c, a = _parse_color("blue1", None, theme="light")
    assert c == (0x6B, 0xAE, 0xD6) and a == 1.0
    c, _ = _parse_color("red2", None, theme="light")
    assert c == (0xCB, 0x18, 0x1D)
    c, _ = _parse_color("blue1", None, theme="dark")
    assert c == (0xC6, 0xDB, 0xEF)
    # hex strings still parse, unknown names fall back to the default
    c, a = _parse_color("40ff0000", None)
    assert c == (0xFF, 0, 0) and abs(a - 0x40 / 255) < 1e-9
    c, _ = _parse_color("nosuch", (1, 2, 3))
    assert c == (1, 2, 3)


def test_heatmap_edges_linear_pinned():
    """Linear tick ladder row semantics (Ticks.value -> normalTicks via
    Heatmap.scala yTicks): 0..100 at a 160px plot asks for
    160//24 = 6 major ticks -> the (20, 5) decade size (100/20 = 5 <= 6),
    a tick every MINOR step of 5 -> 21 ticks, 22 cells including the
    zero-width edge rows where a tick coincides with an axis bound."""
    from atlas_spark.chart import heatmap_edges, value_ticks

    ticks = value_ticks(0.0, 100.0, 6, "linear")
    assert [v for v, _ in ticks] == [float(5 * i) for i in range(21)]
    # majors every minor_per_major = 4 minors (20/5)
    assert [m for _, m in ticks] == [i % 4 == 0 for i in range(21)]
    edges = heatmap_edges(0.0, 100.0, 160, "linear")
    assert edges == [0.0] + [float(5 * i) for i in range(21)] + [100.0]


def test_heatmap_edges_log_pinned():
    """Log tick ladder row semantics (decimalTicks LOGARITHMIC ->
    logScaleTicks): 0..50000 spans 5 decades (> the 2-decade linear
    cutoff) -> ticks at 0 (zero lower bound stands in for 10^0) and the
    powers of ten up to 10^4; 10^5 > 50000 trims.  A <= 2 decade log
    range falls back to the linear ladder."""
    from atlas_spark.chart import heatmap_edges, value_ticks

    ticks = value_ticks(0.0, 50000.0, 6, "log")
    assert [v for v, _ in ticks] == [0.0, 10.0, 100.0, 1000.0, 10000.0]
    assert all(m for _, m in ticks)  # 5 decades <= n=6 -> all major
    edges = heatmap_edges(0.0, 50000.0, 160, "log")
    assert edges == [0.0, 0.0, 10.0, 100.0, 1000.0, 10000.0, 50000.0]
    # narrow log range: linear ladder (logDistance <= 2)
    lin = value_ticks(1.0, 50.0, 6, "log")
    assert [v for v, _ in lin] == [float(2 * i) for i in range(1, 26)]


def test_heatmap_cells_tick_buckets():
    """findBucket parity (Heatmap.scala:139-152): a value equal to a
    tick advances to the NEXT bucket (strict <); values outside the
    axis bounds drop."""
    from atlas_spark.chart import heatmap_cells

    class _Ln:
        tags = {}

        def __init__(self, data):
            self.data = data

    edges = [0.0, 10.0, 20.0, 30.0]  # ticks at 10, 20
    counts = heatmap_cells([_Ln([5.0, 10.0, 29.0, 30.0, 31.0, -1.0])], 6, edges)
    assert counts[0] == [1.0, 0.0, 0.0]  # 5 < 10 -> bucket 0
    assert counts[1] == [0.0, 1.0, 0.0]  # 10 == tick -> next bucket
    assert counts[2] == [0.0, 0.0, 1.0]
    assert counts[3] == [0.0, 0.0, 1.0]  # == axis max: included
    assert counts[4] == [0.0, 0.0, 0.0]  # > axis max: dropped
    assert counts[5] == [0.0, 0.0, 0.0]  # < axis min: dropped
