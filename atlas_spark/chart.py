"""Minimal PNG chart renderer for the graph API.

A deliberately small, dependency-free subset of the reference's
`atlas-chart` module (52 Scala files of themes, layouts, heatmaps and
text layout): time-series lines/areas/vspans on a pixel grid with axis
ticks and the default palette, encoded as PNG with stdlib zlib/struct.
NOT a pixel-parity port — it exists so `format=png` returns a real
image; JSON/CSV remain the data-fidelity outputs.

Reference behaviors kept: default palette order (Palette.scala
"armytage" head), per-line `color`/`alpha`/`ls` settings, NaN gaps break
the line, auto y-range including zero, vspan rendering as translucent
fill.
"""

from __future__ import annotations

import math
import struct
import zlib

# head of the reference default palette (armytage): red, green, blue,
# orange, purple, cyan ...
PALETTE = (
    (0xF0, 0x00, 0x00),
    (0x00, 0xA8, 0x00),
    (0x00, 0x00, 0xFF),
    (0xFF, 0x80, 0x00),
    (0x76, 0x00, 0x8A),
    (0x00, 0x98, 0xC0),
    (0xD1, 0x61, 0x00),
    (0x10, 0x00, 0x80),
)

_BG = (255, 255, 255)
_GRID = (224, 224, 224)
_AXIS = (96, 96, 96)


class Canvas:
    def __init__(self, w: int, h: int):
        self.w, self.h = w, h
        self.px = bytearray(w * h * 3)
        for i in range(0, len(self.px), 3):
            self.px[i : i + 3] = bytes(_BG)

    def put(self, x: int, y: int, rgb, alpha: float = 1.0) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            i = (y * self.w + x) * 3
            if alpha >= 1.0:
                self.px[i : i + 3] = bytes(rgb)
            else:
                for c in range(3):
                    self.px[i + c] = int(self.px[i + c] * (1 - alpha) + rgb[c] * alpha)

    def vline(self, x: int, y0: int, y1: int, rgb, alpha: float = 1.0) -> None:
        for y in range(min(y0, y1), max(y0, y1) + 1):
            self.put(x, y, rgb, alpha)

    def hline(self, y: int, x0: int, x1: int, rgb, alpha: float = 1.0) -> None:
        for x in range(min(x0, x1), max(x0, x1) + 1):
            self.put(x, y, rgb, alpha)

    def line(self, x0: int, y0: int, x1: int, y1: int, rgb) -> None:
        """Bresenham segment."""
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        while True:
            self.put(x0, y0, rgb)
            if x0 == x1 and y0 == y1:
                return
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    def to_png(self) -> bytes:
        raw = b"".join(
            b"\x00" + bytes(self.px[y * self.w * 3 : (y + 1) * self.w * 3])
            for y in range(self.h)
        )

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", self.w, self.h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )


def _parse_color(s: str | None, default):
    if not s:
        return default, 1.0
    s = s.strip().lstrip("#")
    try:
        if len(s) == 8:  # AARRGGBB
            a = int(s[0:2], 16) / 255.0
            return (int(s[2:4], 16), int(s[4:6], 16), int(s[6:8], 16)), a
        if len(s) == 6:
            return (int(s[0:2], 16), int(s[2:4], 16), int(s[4:6], 16)), 1.0
        if len(s) == 3:
            return tuple(int(c * 2, 16) for c in s), 1.0
    except ValueError:
        pass
    return default, 1.0


def render_png(result, width: int = 700, height: int = 300) -> bytes:
    """Render a GraphResult (api.GraphResult) to PNG bytes."""
    pad_l, pad_r, pad_t, pad_b = 48, 8, 8, 20
    plot_w = width - pad_l - pad_r
    plot_h = height - pad_t - pad_b
    cv = Canvas(width, height)

    finite = [
        v for ln in result.lines for v in ln.data if v is not None and math.isfinite(v)
    ]
    lo = min([0.0] + finite) if finite else 0.0
    hi = max([1.0] + finite) if finite else 1.0
    if hi == lo:
        hi = lo + 1.0
    n_steps = max(1, (result.end - result.start) // result.step)

    def ty(v: float) -> int:
        return pad_t + int(round((hi - v) / (hi - lo) * (plot_h - 1)))

    def tx(i: int) -> int:
        return pad_l + int(round(i / max(1, n_steps - 1) * (plot_w - 1)))

    # grid: 5 horizontal ticks, vertical tick per ~6 hours of steps
    for g in range(5):
        y = pad_t + int(g * (plot_h - 1) / 4)
        cv.hline(y, pad_l, pad_l + plot_w - 1, _GRID)
    for i in range(0, n_steps, max(1, n_steps // 8)):
        cv.vline(tx(i), pad_t, pad_t + plot_h - 1, _GRID)

    # axes
    cv.vline(pad_l - 1, pad_t, pad_t + plot_h, _AXIS)
    cv.hline(pad_t + plot_h, pad_l - 1, pad_l + plot_w - 1, _AXIS)

    zero_y = ty(0.0) if lo <= 0.0 <= hi else None

    for idx, ln in enumerate(result.lines):
        settings = getattr(ln, "settings", {}) or {}
        color, alpha = _parse_color(settings.get("color"), PALETTE[idx % len(PALETTE)])
        if "alpha" in settings:
            try:
                alpha = int(settings["alpha"], 16) / 255.0
            except ValueError:
                pass
        style = settings.get("ls", "line")
        prev = None
        for i, v in enumerate(ln.data[:n_steps]):
            if v is None or not math.isfinite(v):
                prev = None
                continue
            x, y = tx(i), ty(v)
            if style == "vspan":
                # truthy points shade the full plot height
                if abs(v) >= 1e-12:
                    cv.vline(x, pad_t, pad_t + plot_h - 1, color, min(alpha, 0.5))
            elif style in ("area", "stack") and zero_y is not None:
                cv.vline(x, y, zero_y, color, min(alpha, 0.6))
            else:
                if prev is not None:
                    cv.line(prev[0], prev[1], x, y, color)
                else:
                    cv.put(x, y, color)
                prev = (x, y)
    return cv.to_png()
