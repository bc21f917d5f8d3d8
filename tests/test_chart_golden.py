"""Chart golden-image regression baseline.

The reference pins its renderer with 495 golden PNGs
(`atlas-chart/src/test/resources/pngimage/`); this is the engine's own
checked-in baseline (rendered BY this renderer, not reference pixels —
feature parity is covered by the structural tests in test_chart.py; this
file guards against silent rendering REGRESSIONS).  Rendering is fully
deterministic (own rasterizer + single-chunk zlib PNG over deterministic
testdata), so the comparison is pixel-exact on the decoded raster, not
byte-exact on the container — a zlib level change must not fail the
suite, a moved pixel must.

Regenerate after an INTENTIONAL rendering change with:
    ATLAS_REGEN_GOLDENS=1 python -m pytest tests/test_chart_golden.py
then review the image diffs before committing.
"""

import os
import struct
import zlib

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden_charts")
REGEN = os.environ.get("ATLAS_REGEN_GOLDENS") == "1"

W, H = 320, 160
WINDOW = "s=2024-01-02&e=2024-01-03"

# name -> graph URI (rendered at sf0.001, fixed 320x160)
CASES = {
    "basic_sum": f"/api/v1/graph?q=name,click,:eq,:sum&{WINDOW}",
    "by_lines": f"/api/v1/graph?q=:true,:sum,(,name,),:by&{WINDOW}",
    "stacked": f"/api/v1/graph?q=:true,:sum,(,name,),:by,:stack&{WINDOW}",
    "stack_negative": f"/api/v1/graph?q=:true,:sum,(,name,),:by,:neg,:stack&{WINDOW}",
    "area_fill": f"/api/v1/graph?q=name,click,:eq,:sum,:area&{WINDOW}",
    "log_scale": f"/api/v1/graph?q=:true,:sum,(,name,),:by&scale=log&{WINDOW}",
    "pow2_scale": f"/api/v1/graph?q=:true,:sum,(,name,),:by&scale=pow2&{WINDOW}",
    "dark_theme": f"/api/v1/graph?q=:true,:sum,(,name,),:by&theme=dark&{WINDOW}",
    "palette_reds": f"/api/v1/graph?q=:true,:sum,(,name,),:by&palette=reds&{WINDOW}",
    "vision_protanopia": f"/api/v1/graph?q=:true,:sum,(,name,),:by&vision=protanopia&{WINDOW}",
    "multi_axis": f"/api/v1/graph?q=name,click,:eq,:sum,name,view,:eq,:sum,1,:axis&{WINDOW}",
    "explicit_bounds": f"/api/v1/graph?q=:true,:sum,(,name,),:by&l=0&u=500&{WINDOW}",
    "legend_stats": f"/api/v1/graph?q=name,click,:eq,:sum&features=unstable&stats=1&{WINDOW}",
    "title_ylabel": f"/api/v1/graph?q=name,click,:eq,:sum&title=Clicks&ylabel=count&{WINDOW}",
    "no_legend": f"/api/v1/graph?q=:true,:sum,(,name,),:by&no_legend=1&{WINDOW}",
    "line_styles": f"/api/v1/graph?q=name,click,:eq,:sum,2,:lw,name,view,:eq,:sum,:vspan,40,:alpha&{WINDOW}",
    "sort_limit": f"/api/v1/graph?q=:true,:sum,(,name,),:by,max,:sort,2,:limit&{WINDOW}",
    "offset_compare": f"/api/v1/graph?q=name,click,:eq,:sum,:dup,1d,:offset&{WINDOW}",
    "des_viz": f"/api/v1/graph?q=name,click,:eq,:sum,10,0.1,0.5,0.2,0.2,40,:des-epic-viz&{WINDOW}",
    "time_gen_heat": f"/api/v1/graph?q=hourOfDay,:time,minuteOfHour,:time,:mul&{WINDOW}",
}


def _decode(png: bytes):
    """PNG -> (w, h, raw scanline bytes) for the single-IDAT writer."""
    w, h = struct.unpack(">II", png[16:24])
    idat = png[png.index(b"IDAT") + 4 :]
    raw = zlib.decompress(idat[: idat.index(b"IEND") - 8])
    return w, h, raw


@pytest.fixture(scope="module")
def engine(spark):
    from atlas_spark.api import Engine

    return Engine(spark, "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(CASES))
def test_chart_golden(engine, name):
    png = engine.graph_png(CASES[name], width=W, height=H)
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(png)
        pytest.skip("regenerated golden")
    assert os.path.exists(path), f"missing golden {name} (run with ATLAS_REGEN_GOLDENS=1)"
    with open(path, "rb") as fh:
        golden = fh.read()
    gw, gh, graw = _decode(golden)
    nw, nh, nraw = _decode(png)
    assert (nw, nh) == (gw, gh), f"{name}: size changed {gw}x{gh} -> {nw}x{nh}"
    if nraw != graw:
        ndiff = sum(a != b for a, b in zip(graw, nraw)) + abs(len(graw) - len(nraw))
        raise AssertionError(
            f"{name}: raster changed ({ndiff} byte deltas of {len(graw)}); "
            "if intentional, regenerate with ATLAS_REGEN_GOLDENS=1 and review"
        )
