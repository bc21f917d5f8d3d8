"""`layout` and `hints` graph parameters.

Layout modes (Layout.java, Grapher.scala:153) control whether `w`/`h`
size the data canvas or the final image: CANVAS (default) grows the
image around the canvas to fit axes/title/legend; IMAGE fixes the final
image (legend shut off, GraphDef.legendTypeForLayout); `iw`/`ih` fix one
dimension each.  Rendering hints (Grapher.processHints): the
`ambiguous-multi-y` hint restores legacy neutral multi-Y axis coloring
(GraphDef.ambiguousMultiY, Axis.scala:68).
"""

from __future__ import annotations

import struct
import zlib

import pytest

from atlas_spark.api import Engine

# one y-axis: pad_l=48, pad_r=8; title off: pad_t=8; one tz row: pad_b=20
PAD_W, PAD_H = 48 + 8, 8 + 20
ENTRY_H = 9 + 3 * 8  # legend entry: label row + 3 stat rows

WINDOW = "s=2024-01-02&e=2024-01-03"
BASE = f"/api/v1/graph?q=:true,:sum,(,name,),:by&{WINDOW}"
W, H = 320, 160
N_LINES = 5  # event names at sf0.001


def _dims(png: bytes) -> tuple[int, int]:
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    return struct.unpack(">II", png[16:24])


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark, "/root/testdata/sf0.001")


@pytest.mark.parametrize(
    "layout,expect",
    [
        # canvas (default): image = canvas + axes + time rows + legend
        ("canvas", (W + PAD_W, H + PAD_H + N_LINES * ENTRY_H)),
        # image: w/h are final; legend off (legendTypeForLayout -> OFF)
        ("image", (W, H)),
        # iw: width fixed, height grows like canvas
        ("iw", (W, H + PAD_H + N_LINES * ENTRY_H)),
        # ih: height fixed (legend off), width grows like canvas
        ("ih", (W + PAD_W, H)),
    ],
)
def test_layout_modes_pin_dimensions(engine, layout, expect):
    png = engine.graph_png(f"{BASE}&layout={layout}", width=W, height=H)
    assert _dims(png) == expect


def test_layout_default_is_canvas(engine):
    png = engine.graph_png(BASE, width=W, height=H)
    assert _dims(png) == (W + PAD_W, H + PAD_H + N_LINES * ENTRY_H)


def test_layout_unknown_rejected(engine):
    with pytest.raises(ValueError, match="unknown layout"):
        engine.graph(f"{BASE}&layout=bogus")


def test_only_graph_fixes_both_dimensions(engine):
    # TimeSeriesGraph.scala:38,52 — onlyGraph keeps w/h as given even in
    # canvas layout
    png = engine.graph_png(f"{BASE}&only_graph=1", width=W, height=H)
    assert _dims(png) == (W, H)


def _pixels(png: bytes):
    w, h = struct.unpack(">II", png[16:24])
    idat = png[png.index(b"IDAT") + 4 :]
    raw = zlib.decompress(idat[: idat.index(b"IEND") - 8])

    def px(x, y):
        i = y * (w * 3 + 1) + 1 + x * 3
        return tuple(raw[i : i + 3])

    return w, h, px


MULTI_Y = (
    "/api/v1/graph?q=name,click,:eq,:sum,name,view,:eq,:sum,1,:axis"
    f"&no_legend=1&{WINDOW}"
)


def _label_colors(png: bytes) -> set:
    """Colors used in the y-axis tick-label margins (left of the plot at
    x<48 and the right-margin labels), excluding background/grid."""
    w, h, px = _pixels(png)
    cols = set()
    for y in range(8, h - 20):
        for x in list(range(2, 46)) + list(range(w - 42, w - 2)):
            c = px(x, y)
            if c not in ((255, 255, 255), (224, 224, 224), (96, 96, 96)):
                cols.add(c)
    return cols


def test_multi_y_axis_labels_take_line_colors(engine):
    # default multi-Y: axis-0 labels drawn in line 0's color, axis-1
    # labels in line 1's color (Axis.scala:68 axisColor = first line)
    from atlas_spark.chart import PALETTE

    png = engine.graph_png(MULTI_Y, width=W, height=H)
    cols = _label_colors(png)
    assert PALETTE[0] in cols and PALETTE[1] in cols
    # neutral text color no longer used for y tick labels
    assert (64, 64, 64) not in cols


def test_ambiguous_multi_y_hint_restores_neutral_labels(engine):
    png = engine.graph_png(f"{MULTI_Y}&hints=ambiguous-multi-y", width=W, height=H)
    cols = _label_colors(png)
    assert (64, 64, 64) in cols
    from atlas_spark.chart import PALETTE

    assert PALETTE[0] not in cols and PALETTE[1] not in cols


def test_hints_param_is_trimmed_comma_set(engine):
    # Grapher.processHints: split on comma, trim, drop empties; unknown
    # hints are carried but ignored by the renderer
    r = engine.graph(f"{MULTI_Y}&hints=%20ambiguous-multi-y%20,,foo")
    assert r.hints == frozenset({"ambiguous-multi-y", "foo"})


def test_per_axis_palette_param(engine):
    # palette.1 gives axis 1 its own palette iterator (Grapher newAxis
    # axisPalette); axis 0 stays on the global default.  Under multi-Y
    # coloring the axis labels take the first line's color, so the label
    # margins show default-red for axis 0 and the reds-palette head for
    # axis 1.
    from atlas_spark.chart import PALETTE, PALETTES

    png = engine.graph_png(f"{MULTI_Y}&palette.1=reds", width=W, height=H)
    cols = _label_colors(png)
    assert PALETTE[0] in cols          # axis 0: default palette head
    assert PALETTES["reds"][0] in cols  # axis 1: reds head
    assert PALETTE[1] not in cols       # default no longer reaches axis 1


def test_per_axis_sort_param(engine):
    # sort.N applies within one axis's line group only (Grapher.scala:450
    # sorts each plot's lines with that axis's sort/order); the other
    # axis keeps expression order, and plots assemble in axis-id order.
    uri = (
        "/api/v1/graph?q="
        "name,view,:eq,:sum,name,click,:eq,:sum,"          # axis 0: view, click
        "name,signup,:eq,:sum,1,:axis,name,error,:eq,:sum,1,:axis"  # axis 1
        f"&{WINDOW}"
    )
    r = engine.graph(uri + "&sort.1=legend")
    labels = [ln.label for ln in r.lines]
    # axis 0 untouched (expression order), axis 1 legend-sorted
    # (labels are the SimpleLegends-derived tag values)
    assert labels == ["view", "click", "error", "signup"]
    # unsuffixed sort falls back onto every axis (getAxisParam)
    r2 = engine.graph(uri + "&sort=legend")
    labels2 = [ln.label for ln in r2.lines]
    assert labels2 == sorted(labels2[:2]) + sorted(labels2[2:])
    # desc alone implies sort=legend, per axis
    r3 = engine.graph(uri + "&order=desc")
    labels3 = [ln.label for ln in r3.lines]
    assert labels3 == sorted(labels3[:2], reverse=True) + sorted(labels3[2:], reverse=True)
    # no sort params: expression order preserved verbatim
    r4 = engine.graph(uri)
    assert [ln.label for ln in r4.lines] == ["view", "click", "signup", "error"]


def test_heatmap_color_params(engine):
    # heatmap_palette picks the cell colors (highest count -> FIRST
    # palette color, Heatmap.scala lookupColor/colorScale), heatmap_u/l
    # bound the color scale, heatmap_scale=log compresses it; the
    # getAxisParam fallback accepts the unsuffixed form.
    from atlas_spark.api import Engine
    from atlas_spark.chart import PALETTES
    from atlas_spark.sources.datapoints import percentile_datapoints

    pct_engine = Engine(
        engine.spark,
        source=percentile_datapoints(engine.spark, "/root/testdata/sf0.01"),
    )
    uri = (
        "/api/v1/graph?q=name,click,:eq,:sum,:percentiles-heatmap"
        "&s=2024-01-02&e=2024-01-03"
    )

    def colors(extra: str) -> set:
        png = pct_engine.graph_png(uri + extra, width=320, height=160)
        w, h, px = _pixels(png)
        return {px(x, y) for y in range(8, h - 20) for x in range(50, w - 10)}

    blues = set(PALETTES["blues"])
    default = colors("")
    assert not (default & blues)
    pal = colors("&heatmap_palette=blues")
    assert pal & blues
    # with l pinned far above every count, every cell bounds to the same
    # count -> exactly ONE palette color
    sat = colors("&heatmap_palette=blues&heatmap_l=1e9&heatmap_u=1e9")
    assert len(sat & blues) == 1
    # log scale shifts the color distribution but stays within the palette
    log_pal = colors("&heatmap_palette=blues&heatmap_scale=log")
    assert log_pal & blues and log_pal != pal


def test_only_graph_hides_axes_and_labels(engine):
    # TimeSeriesGraph.scala:119-123: showAxes=false under only_graph —
    # no y-axis labels/lines, no time labels; the plot fills the image
    # except a thin strip.  Text pixels use the theme text color; the
    # only_graph render must have none, and the plot must extend left of
    # the normal pad_l=48 margin.
    png = engine.graph_png(f"{BASE}&only_graph=1", width=W, height=H)
    w, h, px = _pixels(png)
    all_px = {(x, y): px(x, y) for y in range(h) for x in range(w)}
    assert (64, 64, 64) not in set(all_px.values())  # no label text
    from atlas_spark.chart import PALETTE

    pal = set(PALETTE[:5])
    line_xs = [x for (x, y), c in all_px.items() if c in pal]
    assert line_xs and min(line_xs) < 20  # plot reaches the left edge


def test_size_clamp_notices(engine):
    # GraphConstants.validate: over-limit w/h/zoom clamp WITH the
    # reference's warning strings, surfaced as JSON `notices` and an
    # amber band at the bottom of the PNG (growable layouts)
    uri = f"{BASE}&format=png&w=99999&h=99999&zoom=9"
    png = engine.render(uri)
    w, h, px = _pixels(png)
    # w clamps at 2000 and zoom at 2.0 BEFORE zoom scales the image
    # (the reference scales the final image by the clamped zoom, so the
    # rendered width exceeds MaxWidth)
    assert w >= 2000
    # amber notice band at the bottom
    band = {px(x, h - 5) for x in range(0, w, 50)}
    assert (0xFF, 0xC8, 0x00) in band
    # notices in the JSON output: result-level warnings come from the
    # render layer, so check via graph_png result plumbing instead
    r = engine.graph(BASE)
    r.warnings.append("Restricted graph width to 2000.")
    assert "Restricted graph width to 2000." in r.to_json()["notices"]


def test_per_axis_ylabel_param(engine):
    # ylabel.1 labels the secondary axis down the right margin in that
    # axis's color; ylabel.0 / unsuffixed ylabel label the left axis
    png0 = engine.graph_png(f"{MULTI_Y}&ylabel.1=RATE", width=W, height=H)
    png1 = engine.graph_png(MULTI_Y, width=W, height=H)
    assert png0 != png1  # right-margin glyphs drawn
    w, h, px = _pixels(png0)
    from atlas_spark.chart import PALETTE

    # glyph pixels in the far-right column take axis 1's line color
    right = {px(x, y) for x in range(w - 8, w - 1) for y in range(8, h - 20)}
    assert PALETTE[1] in right
    w1, h1, px1 = _pixels(png1)
    right1 = {px1(x, y) for x in range(w1 - 8, w1 - 1) for y in range(8, h1 - 20)}
    assert PALETTE[1] not in right1


def test_ylabel_tag_substitution(engine):
    """Axis.scala:52-63: ylabel supports $(tag) substitution against the
    INTERSECTION of the axis's line tags; a key not in the common tags
    renders as the key itself (Strings.substitute Map overload)."""
    one = f"/api/v1/graph?q=name,click,:eq,:sum,(,name,),:by&{WINDOW}"
    sub = engine.graph_png(f"{one}&ylabel=$(name)+rate", width=W, height=H)
    lit = engine.graph_png(f"{one}&ylabel=click+rate", width=W, height=H)
    assert sub == lit
    # multi-name axis: `name` is NOT common -> renders as the key
    multi = engine.graph_png(f"{BASE}&ylabel=$(name)+rate", width=W, height=H)
    key = engine.graph_png(f"{BASE}&ylabel=name+rate", width=W, height=H)
    assert multi == key


def test_clamp_notice_order_matches_reference():
    # GraphConstants.validate:48-58 emits height, width, zoom in that
    # order when all three exceed their caps
    from atlas_spark.api import _validate_image_dims

    w, h, warnings = _validate_image_dims(
        {"w": ["99999"], "h": ["99999"], "zoom": ["9"]}
    )
    assert warnings == [
        "Restricted graph height to 1000.",
        "Restricted graph width to 2000.",
        "Restricted zoom to 2.0.",
    ]
    # zoom clamps at 2.0 and scales the clamped dims
    assert (w, h) == (4000, 2000)


def test_invalid_sort_mode_warns_and_falls_back(engine):
    # Grapher.scala:509-511: unknown sort mode -> warning + legend sort
    uri = (
        "/api/v1/graph?q=name,view,:eq,:sum,name,click,:eq,:sum"
        f"&{WINDOW}&sort=bogus"
    )
    r = engine.graph(uri)
    assert "Invalid sort mode 'bogus'. Using default of 'legend'." in r.warnings
    assert [ln.label for ln in r.lines] == ["click", "view"]
    assert "Invalid sort mode 'bogus'. Using default of 'legend'." in (
        r.to_json()["notices"]
    )


def test_empty_lines_sort_last_both_directions(engine):
    # Lines with no data (NaN legendStats) sort LAST in both directions
    # (Grapher.compare JDouble semantics, atlas#586)
    uri = (
        "/api/v1/graph?q="
        "name,nosuchname,:eq,:sum,name,view,:eq,:sum,name,click,:eq,:sum"
        f"&{WINDOW}"
    )
    asc = engine.graph(uri + "&sort=max")
    assert [ln.label for ln in asc.lines][-1] == "NO DATA"
    desc = engine.graph(uri + "&sort=max&order=desc")
    assert [ln.label for ln in desc.lines][-1] == "NO DATA"
    # and the valued lines actually flipped
    assert [ln.label for ln in asc.lines][:2] == list(
        reversed([ln.label for ln in desc.lines][:2])
    )
    # EXCEPTION: sort=count — SummaryStats.empty has count=0, a real
    # number (not NaN), so an empty line sorts FIRST ascending and last
    # descending (ADVICE r14)
    casc = engine.graph(uri + "&sort=count")
    assert [ln.label for ln in casc.lines][0] == "NO DATA"
    cdesc = engine.graph(uri + "&sort=count&order=desc")
    assert [ln.label for ln in cdesc.lines][-1] == "NO DATA"


def test_only_graph_multi_axis_fills_width(engine):
    # only_graph suppresses all labels, so the 44px right-margin strip
    # for secondary-axis labels must not be reserved — line pixels reach
    # the right edge
    png = engine.graph_png(f"{MULTI_Y}&only_graph=1", width=W, height=H)
    w, h, px = _pixels(png)
    assert (w, h) == (W, H)
    from atlas_spark.chart import PALETTE

    pal = set(PALETTE[:5])
    line_xs = [
        x for y in range(h) for x in range(w) if px(x, y) in pal
    ]
    assert line_xs and max(line_xs) > w - 20


def _text_chunks(png: bytes) -> dict[str, str]:
    """Parse tEXt/zTXt chunks out of PNG bytes."""
    out: dict[str, str] = {}
    pos = 8
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + ln]
        if tag == b"tEXt":
            k, _, v = data.partition(b"\x00")
            out[k.decode("latin-1")] = v.decode("latin-1")
        elif tag == b"zTXt":
            k, _, rest = data.partition(b"\x00")
            out[k.decode("latin-1")] = zlib.decompress(rest[1:]).decode("latin-1")
        pos += 12 + ln
    return out


def test_png_text_metadata_roundtrip(engine):
    # PngGraphEngine.scala:29-33: Source = the graph URI, Description =
    # the resolved window; gated on png-metadata-enabled (default off,
    # reference.conf:168).  Values >100 chars compress (zTXt).
    meta_engine = Engine(
        engine.spark, "/root/testdata/sf0.001", png_metadata=True
    )
    short_uri = f"{BASE}&layout=image"
    png = meta_engine.graph_png(short_uri, width=W, height=H)
    meta = _text_chunks(png)
    assert meta["Source"] == short_uri
    assert meta["Description"].startswith("start=2024-01-02T00:00:00Z")
    assert "end=2024-01-03T00:00:00Z" in meta["Description"]
    # a >100-char source goes through the zTXt path and still round-trips
    long_uri = BASE + "&title=" + "x" * 120
    meta2 = _text_chunks(meta_engine.graph_png(long_uri, width=W, height=H))
    assert meta2["Source"] == long_uri
    # default engine embeds nothing (reference default is off)
    assert _text_chunks(engine.graph_png(short_uri, width=W, height=H)) == {}
