"""Quantified per-pixel gap vs the REFERENCE renderer's golden images.

Pixel parity with atlas-chart is a declared non-goal (SURVEY §7) — the
reference rasterizes with Java2D and JVM fonts — but the residual gap
should be a MEASURED number with a regression budget, not an unknown.
For five scenarios from PngGraphEngineSuite (rendered at the golden's
exact canvas size, with the golden's exact Palette.default colors
pinned via `:color` so the palette choice doesn't pollute the
geometry/font measurement), this module computes the fraction of
pixels whose max channel delta exceeds 32 and asserts it under a
per-scenario budget pinned from the round-10 measurement.

Measured gaps (round 10, after the opaque-fill fix brought the area
case from 44.4%): line 6.2%, dark 10.8%, double 7.3%, area 24.9%,
stack 30.1%.  The remainder is structural — gutter widths, legend
band height, and font rasterization shift the plot rectangle a few
pixels, which a filled chart amplifies — so the budgets are regression
rails around today's value, not a parity claim.  A budget breach means
a rendering change moved AWAY from the reference.
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "_tcrs", os.path.join(os.path.dirname(__file__), "test_chart_reference_structural.py")
)
_tcrs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_tcrs)

GOLDEN = _tcrs.GOLDEN
WINDOW = _tcrs.WINDOW
_wave = _tcrs._wave

requires_golden = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="reference golden images not available"
)

# scenario -> (golden name, our URI with the golden's colors pinned,
#              number of lines, budget)
CASES = {
    "single_line": (
        "default_single_line",
        f"q={_wave(400)},ff0000,:color&{WINDOW}",
        1,
        0.09,
    ),
    "single_line_dark": (
        "dark_default_single_line",
        f"q={_wave(400)},ff0000,:color&theme=dark&{WINDOW}",
        1,
        0.14,
    ),
    "double_line": (
        "default_double_line",
        f"q={_wave(400)},ff0000,:color,{_wave(150)},00ff00,:color&{WINDOW}",
        2,
        0.10,
    ),
    "single_line_area": (
        "default_single_line_area",
        f"q={_wave(400)},ff0000,:color,:area&{WINDOW}",
        1,
        0.28,
    ),
    "double_line_stack": (
        "default_double_line_stack",
        f"q={_wave(400)},ff0000,:color,:stack,{_wave(150)},00ff00,:color,:stack&{WINDOW}",
        2,
        0.33,
    ),
}


def _render_at_image_dims(engine, qs: str, n_lines: int, w: int, h: int):
    """Render OUR chart so the final image is exactly (w, h): the golden
    was produced in canvas layout, so back out our canvas size by
    subtracting our fixed margins (y axis 48+8, title/time rows 8+20)
    and the legend band (n_lines entries of 9+3*8 rows)."""
    cw = w - (48 + 8)
    ch = h - (8 + 20) - n_lines * (9 + 3 * 8)
    return _tcrs._decode_png(
        engine.graph_png("/api/v1/graph?" + qs, width=cw, height=ch)
    )


@pytest.fixture(scope="module")
def engine(spark):
    from atlas_spark.api import Engine

    return Engine(spark, "/root/testdata/sf0.001")


@pytest.mark.parametrize("name", sorted(CASES))
@requires_golden
def test_pixel_gap_within_budget(engine, name):
    golden, qs, n_lines, budget = CASES[name]
    with open(os.path.join(GOLDEN, f"{golden}.png"), "rb") as fh:
        ref = _tcrs._decode_png(fh.read())
    h, w, _ = ref.shape
    ours = _render_at_image_dims(engine, qs, n_lines, w, h)
    assert ours.shape == ref.shape
    delta = np.abs(ref[..., :3].astype(int) - ours[..., :3].astype(int)).max(-1)
    gap = float((delta > 32).mean())
    print(f"pixel-gap {name}: {gap * 100:.2f}% (budget {budget * 100:.0f}%)")
    assert gap <= budget, (
        f"{name}: pixel gap {gap * 100:.2f}% exceeds budget {budget * 100:.0f}% — "
        "a rendering change moved away from the reference golden"
    )


@requires_golden
def test_fill_is_opaque_like_reference(engine):
    """The reference draws area/stack fills with the line color AS-IS
    (TimeSeriesArea/Stack style.configure, no implicit alpha): the
    dominant fill color in our render must be the exact pinned color,
    not a blend with the background."""
    golden, qs, n_lines, _ = CASES["single_line_area"]
    with open(os.path.join(GOLDEN, f"{golden}.png"), "rb") as fh:
        ref = _tcrs._decode_png(fh.read())
    h, w, _ = ref.shape
    ours = _render_at_image_dims(engine, qs, n_lines, w, h)
    for img, who in ((ref, "ref"), (ours, "ours")):
        m = _tcrs._strong(img)
        vals, counts = np.unique(img[m][:, :3].reshape(-1, 3), axis=0, return_counts=True)
        top = tuple(vals[counts.argmax()])
        assert top == (255, 0, 0), f"{who}: dominant fill {top}, want opaque ff0000"
