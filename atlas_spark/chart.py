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
fill, y-axis scales (`scale=log|log-linear|pow2|sqrt`, legacy `o=1` —
Scales.scala/LogLinear.scala semantics incl. the vizlog 0/negative
handling), stacked-area compositing on running positive/negative
offsets per step with the stacked total driving the y-range
(TimeSeriesStack.scala, axis `stack=1` defaulting line style), explicit
`u`/`l` axis bounds with auto-style/auto-data defaults (PlotBound),
legend entries with Max/Min/Avg/Last/Tot/Cnt stat rows (LegendEntry,
`no_legend`/`no_legend_stats`/`only_graph` flags), and light/dark
themes.
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


def _hexes(*hs: str) -> tuple:
    return tuple((int(h[0:2], 16), int(h[2:4], 16), int(h[4:6], 16)) for h in hs)


# named palettes mirroring the reference's resource lists
# (atlas-chart/src/main/resources/palettes/{name}_palette.txt)
PALETTES = {
    "armytage": _hexes(
        "0075DC", "993F00", "9DCC00", "4C005C", "00998F", "FFA405",
        "5EF1F2", "F0A3FF", "94FFB5", "FF0010", "2BCE48", "740AFF",
        "191919", "FF5005", "005C31", "FFCC99", "808080", "8F7C00",
        "C20088", "003380", "FFA8BB", "426600", "990000", "FFE100",
    ),
    "epic": _hexes(
        "FF0000", "00FF00", "0000FF", "880000", "008800", "000088",
        "A3F6C2", "0F0F0F", "3366FF", "6633FF", "CC33FF", "FF33CC",
        "33CCFF", "003DF5", "002EB8", "FF3366", "33FFCC", "B88A00",
        "F5B800", "FF6633", "33FF66", "66FF33", "CCFF33", "FFCC33",
    ),
    "blues": _hexes("08306B", "08519C", "2171B5", "4292C6", "6BAED6", "9ECAE1", "C6DBEF"),
    "reds": _hexes("67000D", "A50F15", "CB181D", "EF3B2C", "FB6A4A", "FC9272", "FCBBA1"),
    "greens": _hexes("00441B", "006D2C", "238B45", "41AB5D", "74C476", "A1D99B", "C7E9C0"),
    "oranges": _hexes("7F2704", "A63603", "D94801", "F16913", "FD8D3C", "FDAE6B", "FDD0A2"),
    "purples": _hexes("3F007D", "54278F", "6A51A3", "807DBA", "9E9AC8", "BCBDDC", "DADAEB"),
    "bw": _hexes("000000", "444444", "888888", "BBBBBB"),
}


# color-deficiency simulation matrices (VisionType.java; colormatrix
# RGB rows, alpha row omitted — we carry alpha separately)
VISION = {
    "normal": None,
    "protanopia": (0.567, 0.433, 0.0, 0.558, 0.442, 0.0, 0.0, 0.242, 0.758),
    "protanomaly": (0.817, 0.183, 0.0, 0.333, 0.667, 0.0, 0.0, 0.125, 0.875),
    "deuteranopia": (0.625, 0.375, 0.0, 0.7, 0.3, 0.0, 0.0, 0.3, 0.7),
    "deuteranomaly": (0.8, 0.2, 0.0, 0.258, 0.742, 0.0, 0.0, 0.142, 0.858),
    "tritanopia": (0.95, 0.05, 0.0, 0.0, 0.433, 0.567, 0.0, 0.475, 0.525),
    "tritanomaly": (0.967, 0.033, 0.0, 0.0, 0.733, 0.267, 0.0, 0.183, 0.817),
    "achromatopsia": (0.299, 0.587, 0.114) * 3,
}


def vision_filter(rgb, vision: str | None):
    """Apply a VisionType color matrix to an (r, g, b) tuple."""
    m = VISION.get(vision or "normal")
    if m is None:
        return rgb
    r, g, b = rgb
    return tuple(
        max(0, min(255, int(round(m[3 * i] * r + m[3 * i + 1] * g + m[3 * i + 2] * b))))
        for i in range(3)
    )


def palette_colors(desc: str | None) -> tuple | None:
    """Resolve a palette description (Palette.create): a known name, a
    `colors:RRGGBB,...` list, or a `(,RRGGBB,RRGGBB,)` expression list.
    None/unknown -> None (caller falls back to the default)."""
    if not desc:
        return None
    if desc.startswith("colors:") or desc.startswith("("):
        body = desc[len("colors:"):] if desc.startswith("colors:") else desc
        cols = []
        for tok in body.split(","):
            tok = tok.strip().lstrip("#")
            if not tok or tok in ("(", ")"):
                continue
            c, _ = _parse_color(tok, None)
            if c is not None:
                cols.append(c)
        return tuple(cols) or None
    return PALETTES.get(desc)

_BG = (255, 255, 255)
_GRID = (224, 224, 224)
_AXIS = (96, 96, 96)
_TEXT = (64, 64, 64)

# light/dark chart themes (ChartSettings theme config): background, grid,
# axis, and text colors; line palette is shared
# warnings background, both themes (reference.conf warnings
# background-color FFFFC800)
_WARN_BG = (0xFF, 0xC8, 0x00)

_THEMES = {
    "light": {"bg": _BG, "grid": _GRID, "axis": _AXIS, "text": _TEXT},
    "dark": {
        "bg": (16, 16, 16),
        "grid": (52, 52, 52),
        "axis": (168, 168, 168),
        "text": (208, 208, 208),
    },
}

# 5x7 bitmap glyphs (each row a 5-bit pattern, MSB left) for axis labels:
# digits, uppercase letters used by zone ids / months, and punctuation.
_FONT = {
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    ":": (0x00, 0x04, 0x00, 0x00, 0x04, 0x00, 0x00),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x04, 0x00),
    "/": (0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
    "+": (0x00, 0x04, 0x04, 0x1F, 0x04, 0x04, 0x00),
    "_": (0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x1F),
    " ": (0, 0, 0, 0, 0, 0, 0),
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
}


class Canvas:
    def __init__(self, w: int, h: int, bg=_BG):
        self.w, self.h = w, h
        # single repeated-bytes fill — a per-pixel Python loop here was
        # 84% of render_png wall and serialized concurrent renders on
        # the GIL (r14 concurrency profile)
        self.px = bytearray(bytes(bg) * (w * h))

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

    def line(self, x0: int, y0: int, x1: int, y1: int, rgb, width: int = 1) -> None:
        """Bresenham segment.  `width` > 1 thickens the stroke by
        stamping a run perpendicular to the segment's dominant direction
        (vertical run for shallow segments, horizontal for steep), the
        raster analogue of BasicStroke's perpendicular widening in the
        reference renderer (TimeSeriesGraph.scala:139, PngGraphEngine)."""
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        steep = -dy > dx
        err = dx + dy
        half_up = (width - 1) // 2
        while True:
            if width <= 1:
                self.put(x0, y0, rgb)
            elif steep:
                for off in range(-half_up, width - half_up):
                    self.put(x0 + off, y0, rgb)
            else:
                for off in range(-half_up, width - half_up):
                    self.put(x0, y0 + off, rgb)
            if x0 == x1 and y0 == y1:
                return
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    def text(self, x: int, y: int, s: str, rgb=_TEXT) -> None:
        """Render `s` with the built-in 5x7 font, top-left at (x, y)."""
        cx = x
        for ch in s.upper():
            glyph = _FONT.get(ch)
            if glyph is None:
                glyph = _FONT[" "]
            for r, rowbits in enumerate(glyph):
                for c in range(5):
                    if rowbits & (1 << (4 - c)):
                        self.put(cx + c, y + r, rgb)
            cx += 6

    def to_png(self, metadata: dict[str, str] | None = None) -> bytes:
        """Encode to PNG.  `metadata` entries become text chunks between
        IHDR and IDAT — tEXt for short values, zTXt (zlib) past 100 chars
        like the reference's `compression = if (v.length > 100) "zip"`
        (PngImage.scala:233-238); keys/values are Latin-1 per the PNG
        spec (the reference's ImageIO writer enforces the same)."""
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

        text_chunks = b""
        for k, v in (metadata or {}).items():
            kw = k.encode("latin-1", "replace")[:79]
            tv = v.encode("latin-1", "replace")
            if len(v) > 100:
                text_chunks += chunk(b"zTXt", kw + b"\x00\x00" + zlib.compress(tv))
            else:
                text_chunks += chunk(b"tEXt", kw + b"\x00" + tv)

        ihdr = struct.pack(">IIBBBBB", self.w, self.h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + text_chunks
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )


# Theme-scoped named colors (atlas-eval reference.conf:87-145
# named-colors): `blue1,:color` resolves per theme before hex parsing.
NAMED_COLORS = {
    "light": {
        "blue1": "6BAED6", "blue2": "2171B5", "blue3": "08306B",
        "gray1": "888888", "gray2": "444444", "gray3": "000000",
        "green1": "74C476", "green2": "238B45", "green3": "00441B",
        "orange1": "FD8D3C", "orange2": "D94801", "orange3": "7F2704",
        "purple1": "9E9AC8", "purple2": "6A51A3", "purple3": "3F007D",
        "red1": "FB6A4A", "red2": "CB181D", "red3": "67000D",
    },
    "dark": {
        "blue1": "C6DBEF", "blue2": "6BAED6", "blue3": "2171B5",
        "gray1": "FFFFFF", "gray2": "BBBBBB", "gray3": "777777",
        "green1": "C7E9C0", "green2": "74C476", "green3": "238B45",
        "orange1": "FDD0A2", "orange2": "FD8D3C", "orange3": "D94801",
        "purple1": "DADAEB", "purple2": "9E9AC8", "purple3": "6A51A3",
        "red1": "FCBBA1", "red2": "FB6A4A", "red3": "CB181D",
    },
}


def _parse_color(s: str | None, default, theme: str = "light"):
    if not s:
        return default, 1.0
    s = s.strip().lstrip("#")
    s = NAMED_COLORS.get(theme, NAMED_COLORS["light"]).get(s, s)
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


def _pct_bucket_range(tags: dict) -> tuple[float, float] | None:
    """Value range of a percentile-bucket line (Heatmap.scala:237-259): the
    `percentile` tag (D/T hex label) maps to (BOUNDARIES[i-1], BOUNDARIES[i]].
    Timer buckets (T....) are in nanoseconds -> seconds."""
    label = (tags or {}).get("percentile")
    if not label or len(label) != 5 or label[0] not in "DT":
        return None
    from .functions.percentile_buckets import BOUNDARIES

    try:
        i = int(label[1:], 16)
    except ValueError:
        return None
    if not 0 <= i < len(BOUNDARIES):
        return None
    lo = float(BOUNDARIES[i - 1]) if i > 0 else 0.0
    hi = float(BOUNDARIES[i])
    if label[0] == "T":
        lo, hi = lo / 1e9, hi / 1e9
    return lo, hi


# Smallest vertical space per labeled tick: the renderer's 8px font x 3,
# mirroring ValueAxis.minTickLabelHeight = smallFontDims.height * 3
# (ValueAxis.scala:307) at this renderer's font metrics.
_MIN_TICK_LABEL_H = 24

_BASE_TICK_SIZES = ((10.0, 2.0), (20.0, 5.0), (30.0, 10.0), (40.0, 10.0), (50.0, 10.0))


def _log_floor(v: float) -> int:
    return 0 if v <= 1 else int(math.floor(math.log10(v)))


def _log_ceil(v: float) -> int:
    return int(math.ceil(math.log10(v))) if v > 0 else 0


def _linear_ticks(v1: float, v2: float, n: int) -> list:
    """normalTicks (Ticks.scala:326-346): the smallest decade-scaled
    (major, minor) pair with <= n majors across the range, one tick per
    MINOR step inside [v1, v2] (major flag every minor_per_major)."""
    r = v2 - v1
    for i in range(-25, 26):
        f = 10.0**i
        for major_b, minor_b in _BASE_TICK_SIZES:
            major, minor = major_b * f, minor_b * f
            if r / major <= n:
                mpm = int(round(major / minor))
                base = major * math.floor(v1 / major)
                out = []
                for pos in range(int((v2 - base) / minor) + 2):
                    v = base + pos * minor
                    if v1 <= v <= v2:
                        out.append((v, pos % mpm == 0))
                return out
    return [(v1, True), (v2, True)]  # sciTicks stand-in (beyond 1e27)


def _log_pow10_ticks(v1: float, v2: float, step: int) -> list:
    """logScaleTicks (Ticks.scala:461-477): one tick per power of ten
    from logFloor(v1) to logCeil(v2); a zero lower bound puts the first
    tick at 0 instead of 10^0; majors every `step` decades."""
    lo_e, hi_e = _log_floor(v1), _log_ceil(v2)
    out = []
    for e in range(lo_e, hi_e + 1):
        v = 0.0 if (v1 == 0 and e == 0) else 10.0**e
        out.append((v, (e - lo_e) % step == 0))
    return out


def value_ticks(v1: float, v2: float, n: int, scale: str = "linear") -> list:
    """Value-axis tick ladder, Ticks.value semantics (Ticks.scala:
    253-263 with decimalTicks' LOGARITHMIC branches): returns
    [(value, is_major)].  `log` uses powers of ten when the range spans
    more than two decades (mirrored for negative ranges, split at zero
    for mixed ones, endpoints trimmed to the range), else — and for
    every other scale — the linear minor-step ladder."""
    if not (math.isfinite(v1) and math.isfinite(v2)) or v2 <= v1:
        return []
    n = max(1, n)
    if scale != "log":
        return _linear_ticks(v1, v2, n)

    def neg(ticks):  # toNegTicks: mirror and reverse
        return [(-v, m) for v, m in reversed(ticks)]

    if v1 >= 0:
        ld = _log_ceil(v2) - _log_floor(v1)
        if ld <= 2:
            return _linear_ticks(v1, v2, n)
        ticks = _log_pow10_ticks(v1, v2, ld // n + (1 if ld % n else 0) if ld > n else 1)
    elif v2 <= 0:
        ld = _log_ceil(-v1) - _log_floor(-v2)
        if ld <= 2:
            return _linear_ticks(v1, v2, n)
        step = ld // n + (1 if ld % n else 0) if ld > n else 1
        ticks = neg(_log_pow10_ticks(-v2, -v1, step))
    else:
        pos_ld = _log_ceil(v2) - _log_floor(0)
        neg_ld = _log_ceil(-v1) - _log_floor(0)
        ld = pos_ld + neg_ld
        if pos_ld <= 2 and neg_ld <= 2:
            return _linear_ticks(v1, v2, n)
        step = ld // n + (1 if ld % n else 0) if ld > n else 1
        ticks = neg(_log_pow10_ticks(0, -v1, step))[:-1] + _log_pow10_ticks(
            0, v2, step
        )
    if ticks and ticks[0][0] < v1:
        ticks = ticks[1:]
    if ticks and ticks[-1][0] > v2:
        ticks = ticks[:-1]
    return ticks


def heatmap_plot_height(result, height: int) -> int:
    """The data-canvas height render_png would use for a requested
    `height` — the heatmap grid's tick count derives from it
    (Heatmap.scala canvasHeight -> yaxis.ticks).  Mirrors the layout
    arithmetic in render_png: growable layouts (canvas / iw) size the
    canvas directly; fixed-height layouts (image / ih / only_graph)
    carve title, time-axis rows and pads out of the image height (the
    legend is dropped for fixed heights, so it never shrinks the
    plot)."""
    layout = (getattr(result, "layout", None) or "canvas").lower()
    only_graph = bool(getattr(result, "only_graph", False))
    if only_graph:
        return height - 2 - 10  # pad_t=2, pad_b=10
    if layout in ("image", "ih"):
        pad_t = 8 + (10 if getattr(result, "title", None) else 0)
        tzs = getattr(result, "timezones", None) or ["UTC"]
        pad_b = 9 + 11 * len(tzs)  # zone_row_h = 11
        return height - pad_t - pad_b
    return height


def heatmap_edges(lo: float, hi: float, plot_h: int, scale: str = "linear") -> list:
    """Cell edges for the heatmap value grid, derived from the axis tick
    ladder exactly like the reference (Heatmap.scala:63 yTicks =
    yaxis.ticks(0, canvasHeight); rows = [min, t0), [t0, t1), ...,
    [t_last, max]).  Every tick — major and minor — bounds a row."""
    n = max(1, plot_h // _MIN_TICK_LABEL_H)
    ticks = [v for v, _ in value_ticks(lo, hi, n, scale)]
    return [lo] + ticks + [hi]


def heatmap_cells(hm_lines, n_steps: int, edges: list) -> list:
    """Heatmap cell counts per (time step, y cell) on the tick-derived
    grid, following Heatmap.scala:139-210: percentile-bucket lines
    spread their count over the y-cells overlapping the bucket's value
    range, weighted by overlap; plain lines count 1 in the first cell
    whose upper tick exceeds their value (ties advance to the next
    cell, findBucket's strict `<`).  `edges` come from heatmap_edges;
    returns counts[n_steps][len(edges)-1]."""
    import bisect

    lo, hi = edges[0], edges[-1]
    ticks = edges[1:-1]  # interior tick values
    n_cells = len(edges) - 1
    counts = [[0.0] * n_cells for _ in range(n_steps)]
    for ln in hm_lines:
        rng = _pct_bucket_range(getattr(ln, "tags", {}))
        for i, v in enumerate(ln.data[:n_steps]):
            if v is None or not math.isfinite(v):
                continue
            if rng is not None:
                mn, mx = rng
                if v <= 0.0 or mx <= mn:
                    continue
                for c in range(n_cells):
                    c_lo, c_hi = edges[c], edges[c + 1]
                    if c_hi < mn or c_lo > mx:
                        continue
                    w = (min(mx, c_hi) - max(mn, c_lo)) / (mx - mn)
                    counts[i][c] += v * w
            else:
                if lo <= v <= hi:
                    counts[i][bisect.bisect_right(ticks, v)] += 1.0
    return counts


def _render_heatmap(
    cv, hm_lines, n_steps, tx, ty, lo, hi, pad_t, plot_h, scale="linear", opts=None
):
    """Draw heatmap cells on the tick-derived value grid (heatmap_edges
    from the actual plot height and axis scale — the same rows
    Heatmap.scala buckets by, so the PNG and the v2.json cell block
    describe identical geometry).

    Color (Heatmap.scala:96-101,231): the count is bounded to
    [heatmap_l, heatmap_u] (defaults: smallest positive count, max count)
    and mapped through the heatmap_scale (linear | log) onto the
    heatmap_palette's color list with the HIGHEST count taking the FIRST
    color (the reference's Scales.factory(lower -> size, upper -> 0));
    without a palette a red intensity ramp stands in for
    Palette.gradient(line color)."""
    opts = opts or {}
    cell_edges = heatmap_edges(lo, hi, plot_h, scale)
    counts = heatmap_cells(hm_lines, n_steps, cell_edges)
    n_cells = len(cell_edges) - 1
    max_count = max((c for row in counts for c in row), default=0.0)
    if max_count <= 0.0:
        return
    pos = [c for row in counts for c in row if c > 0.0]
    lo_c = opts.get("heatmap_l")
    lo_c = float(lo_c) if lo_c is not None else min(pos)
    hi_c = opts.get("heatmap_u")
    hi_c = float(hi_c) if hi_c is not None else max_count
    if hi_c <= lo_c:
        hi_c = lo_c + 1.0
    hm_scale = (opts.get("heatmap_scale") or "linear").lower()
    hm_pal = palette_colors(opts.get("heatmap_palette"))

    def _cfrac(cnt: float) -> float:
        cnt = min(max(cnt, lo_c), hi_c)
        if hm_scale == "log":
            return (_vizlog(cnt) - _vizlog(lo_c)) / (
                _vizlog(hi_c) - _vizlog(lo_c) or 1.0
            )
        return (cnt - lo_c) / (hi_c - lo_c)

    for i in range(n_steps):
        x0 = tx(i)
        x1 = tx(i + 1) - 1 if i + 1 < n_steps else x0 + max(1, tx(1) - tx(0))
        for c in range(n_cells):
            cnt = counts[i][c]
            if cnt <= 0.0:
                continue
            frac = _cfrac(cnt)
            if hm_pal:
                # highest count -> first palette color (lookupColor idx 0)
                color = hm_pal[
                    min(len(hm_pal) - 1, int(round((1 - frac) * (len(hm_pal) - 1))))
                ]
            else:
                # red gradient: low count = pale, high = saturated
                color = (0xF0, int(0xE0 * (1 - frac)), int(0xD0 * (1 - frac)))
            y_hi = ty(cell_edges[c])  # larger y = lower value
            y_lo = ty(cell_edges[c + 1])
            for x in range(x0, max(x0 + 1, x1)):
                cv.vline(x, max(pad_t, y_lo), min(pad_t + plot_h - 1, y_hi), color)


# ---------------------------------------------------------------- y scales
# Scale semantics follow atlas-chart's Scales.scala / LogLinear.scala:
# `log` is a visualization log (vizlog(0)=0, vizlog(-v)=-vizlog(v));
# `log-linear` is logarithmic across powers of 10 and linear within each;
# `pow2` / `sqrt` are sign-preserving power maps.


def _vizlog(v: float) -> float:
    """Scales.scala:61-68 log10: >0 -> log10(v+1), <0 -> -log10(-(v-1))."""
    if v > 0.0:
        return math.log10(v + 1.0)
    if v < 0.0:
        return -math.log10(-(v - 1.0))
    return 0.0


def _vizlog_inv(x: float) -> float:
    """Inverse of `_vizlog` (sign-symmetric log10 with the +-1 shifts)."""
    if x > 0.0:
        return math.pow(10.0, x) - 1.0
    if x < 0.0:
        return -(math.pow(10.0, -x) - 1.0)
    return 0.0


def _vizpow(v: float, exp: float) -> float:
    """Sign-preserving power map (Scales.scala:98-104)."""
    if v > 0.0:
        return math.pow(v, exp)
    if v < 0.0:
        return -math.pow(-v, exp)
    return 0.0


def _ll_bucket_span(i: int) -> float:
    idx = -i - 1 if i < 0 else i
    return math.pow(10, idx // 9 - 9)


def _ll_bucket(i: int) -> float:
    """Max value of log-linear bucket i (LogLinear.scala:29-34)."""
    if i < 0:
        return -_ll_bucket(-i - 1)
    return _ll_bucket_span(i) * (i % 9 + 1)


def _ll_bucket_index(v: float) -> int:
    """LogLinear.scala:60-83 bucketIndex (9 linear buckets per decade,
    decades from 1e-9 up; negatives mirror)."""
    if v < 0.0:
        return -_ll_bucket_index(-v) - 1
    if v == 0.0:
        return 0
    lg = max(-9.0, math.floor(math.log10(v)))
    prev_buckets = (int(lg) + 9) * 9
    e = 6.0 - lg
    if e >= 0.0:
        n = int(v * math.pow(10, e))
        p10 = 10 ** (int(lg) + int(e))
        return (n - 1) // p10 + prev_buckets
    p10 = math.pow(10, lg)
    return int(math.ceil((v - p10) / p10)) + prev_buckets


def _ll_ratio(v: float, i: int) -> float:
    if v < 0.0:
        return 1.0 - _ll_ratio(-v, -i - 1)
    span = _ll_bucket_span(i)
    boundary = _ll_bucket(i) - span
    return (v - boundary) / span


def _ll_position(v: float, mn: int, ppb: float) -> float:
    i = _ll_bucket_index(v)
    offset = max(0.0, i - mn - 1) * ppb
    return _ll_ratio(v, i) * ppb + offset


def make_yscale(scale: str, lo: float, hi: float, y_top: int, y_bot: int):
    """Return v -> pixel-y for the axis scale name (`linear`, `log`,
    `log-linear`, `pow2`, `sqrt` — Scale enum / Scales.factory), mapping
    lo -> y_bot (bottom) and hi -> y_top (top, pixel y grows downward)."""
    if scale in ("log", "logarithmic"):
        xform = _vizlog
    elif scale == "pow2":
        xform = lambda v: _vizpow(v, 2.0)  # noqa: E731
    elif scale == "sqrt":
        xform = lambda v: _vizpow(v, 0.5)  # noqa: E731
    elif scale == "log-linear":
        b1 = _ll_bucket_index(lo) - 1
        b2 = _ll_bucket_index(hi)
        if b1 != b2:
            ppb = (y_bot - y_top) / abs(b2 - b1)

            def ty(v: float) -> int:
                return y_bot - int(_ll_position(v, b1, ppb))

            return ty
        xform = lambda v: v  # noqa: E731 — single bucket: linear
    else:
        xform = lambda v: v  # noqa: E731
    t_lo, t_hi = xform(lo), xform(hi)
    if t_hi == t_lo:
        t_hi = t_lo + 1.0

    def ty(v: float) -> int:
        return y_top + int(round((t_hi - xform(v)) / (t_hi - t_lo) * (y_bot - y_top)))

    return ty


def _fmt_value(v: float, mode: str = "decimal") -> str:
    """Tick label formatting per TickLabelMode: decimal metric prefixes,
    binary (1024-based Ki/Mi/Gi, for byte data), duration (w/d/h/m/s)."""
    if v == 0:
        return "0"
    a = abs(v)
    if mode == "binary":
        for div, suf in ((1 << 40, "TI"), (1 << 30, "GI"), (1 << 20, "MI"), (1 << 10, "KI")):
            if a >= div:
                return f"{v / div:.1f}{suf}"
        return f"{v:.1f}" if a >= 1 else f"{v:.2g}"
    if mode == "duration":
        for div, suf in ((604800, "W"), (86400, "D"), (3600, "H"), (60, "M")):
            if a >= div:
                return f"{v / div:.1f}{suf}"
        return f"{v:.1f}S" if a >= 1 else f"{v:.2g}S"
    for div, suf in ((1e9, "G"), (1e6, "M"), (1e3, "K")):
        if a >= div:
            return f"{v / div:.1f}{suf}"
    if a >= 1:
        return f"{v:.1f}"
    return f"{v:.2g}"


def line_axis(ln) -> int:
    """Axis id a line renders on (`:axis` style setting); out-of-range
    ids are client errors (GraphConstants max-yaxes = 5, axes 0-4)."""
    try:
        aid = int((getattr(ln, "settings", {}) or {}).get("axis", 0) or 0)
    except (TypeError, ValueError):
        return 0
    if not 0 <= aid <= 4:
        raise ValueError(f"invalid axis id {aid} (max-yaxes = 5)")
    return aid


def axis_config(result, aid: int) -> dict:
    """Effective per-axis config: the axis's `.N` overrides fall back to
    the unsuffixed/global values (Grapher getAxisParam)."""
    o = (dict(getattr(result, "axes", None) or {})).get(aid) or {}
    return {
        "scale": o.get("scale") or (getattr(result, "scale", None) or "linear"),
        "upper": o.get("upper", getattr(result, "upper", None)),
        "lower": o.get("lower", getattr(result, "lower", None)),
        "stack": o.get("stack", bool(getattr(result, "axis_stack", False))),
        "tick_labels": (
            o.get("tick_labels")
            or (getattr(result, "tick_labels", None) or "decimal")
        ).lower(),
    }


def line_style(result, ln, axis_cfg=None) -> str:
    """Effective line style: explicit `:ls` wins, else the axis's
    stack-by-default flag (`stack`/`stack.N`), else line.  `axis_cfg`
    lets a caller supply a cached axis_config lookup."""
    s = (getattr(ln, "settings", {}) or {}).get("ls")
    if s:
        return s
    cfg = (axis_cfg or (lambda aid: axis_config(result, aid)))(line_axis(ln))
    return "stack" if cfg["stack"] else "line"


def resolve_line_colors(result) -> dict:
    """Resolved (rgb, alpha) per line keyed by id(line): explicit
    `color` wins; otherwise cycle the line's own `:palette` (per
    palette-group), else the per-axis `palette.N` param (its own
    iterator per axis, Grapher axisPalette), else the global `palette`
    param or the default palette; vision simulation applied last
    (Palette.create / StyleExpr color resolution)."""
    axes_over = dict(getattr(result, "axes", None) or {})
    axis_pal = palette_colors(getattr(result, "palette", None)) or PALETTE
    _pal_counters: dict = {}
    out: dict = {}
    for ln in result.lines:
        settings = getattr(ln, "settings", {}) or {}
        pdesc = settings.get("palette")
        key = pdesc
        pal = palette_colors(pdesc)
        if pal is None:
            aid = line_axis(ln)
            adesc = (axes_over.get(aid) or {}).get("palette")
            pal = palette_colors(adesc)
            if pal is not None:
                key = f"axis{aid}:{adesc}"
        pal = pal or axis_pal
        i = _pal_counters.get(key, 0)
        _pal_counters[key] = i + 1
        c, a = _parse_color(
            settings.get("color"),
            pal[i % len(pal)],
            theme=getattr(result, "theme", None) or "light",
        )
        out[id(ln)] = (vision_filter(c, getattr(result, "vision", None)), a)
    return out


def axis_bounds(result, aid: int, n_steps: int, axis_cfg=None) -> tuple:
    """y bounds for one axis (PlotDef.finalBounds / PlotBound): explicit
    u/l win; auto-style includes 0 when any filled style is present
    (area, stack, heatmap), else tight data bounds; l=auto-data is
    always tight.  Stacked lines contribute their per-step
    positive/negative TOTALS, not individual values.  Heatmap lines
    render on axis 0 only."""
    cfgf = axis_cfg or (lambda a: axis_config(result, a))

    def _st(ln):
        return line_style(result, ln, cfgf)

    hm_lines = [ln for ln in result.lines if _st(ln) == "heatmap"]
    hm_ids = {id(ln) for ln in hm_lines}
    lines = [
        ln
        for ln in result.lines
        if id(ln) not in hm_ids and line_axis(ln) == aid
    ]
    pos_tot = [0.0] * n_steps
    neg_tot = [0.0] * n_steps
    for ln in lines:
        if _st(ln) == "stack":
            for i, v in enumerate(ln.data[:n_steps]):
                if v is None or not math.isfinite(v):
                    continue
                if v > 0.0:
                    pos_tot[i] += v
                elif v < 0.0:
                    neg_tot[i] += v
    hm = hm_lines if aid == 0 else []
    if hm and all(_pct_bucket_range(ln.tags) for ln in hm):
        # percentile heatmap: y axis spans the bucket ranges present
        ranges = [_pct_bucket_range(ln.tags) for ln in hm]
        finite = [b for r in ranges for b in r]
    else:
        finite = [
            v
            for ln in lines
            if _st(ln) != "stack"
            for v in ln.data
            if v is not None and math.isfinite(v)
        ] + [v for v in pos_tot + neg_tot if v != 0.0]
        finite += [
            v
            for ln in hm
            for v in ln.data
            if v is not None and math.isfinite(v)
        ]
    data_lo = min(finite) if finite else 0.0
    data_hi = max(finite) if finite else 1.0
    has_fill = bool(hm) or any(_st(ln) in ("area", "stack") for ln in lines)
    cfg = cfgf(aid)
    lower, upper = cfg["lower"], cfg["upper"]
    if isinstance(lower, (int, float)):
        lo = float(lower)
    elif lower == "auto-data":
        lo = data_lo
    else:
        lo = min(0.0, data_lo) if has_fill else data_lo
    if isinstance(upper, (int, float)):
        hi = float(upper)
    else:
        # fills anchor at the axis, so 0 joins the range on BOTH sides
        # (an all-negative stack still shows the zero line at the top)
        hi = max(0.0, data_hi) if has_fill else data_hi
    if hi <= lo:
        hi = lo + 1.0
    return lo, hi


def _sub_ylabel(label: str, lines) -> str:
    """Axis ylabel `$(tag)` substitution (Axis.scala:52-63 newPlotDef):
    variables resolve against the INTERSECTION of the axis's line tags;
    a key absent from the common tags renders as the key itself
    (Strings.substitute Map overload, Strings.scala:428-430)."""
    if not label or "$" not in label:
        return label
    from .util.strings import substitute

    tag_sets = [set((getattr(ln, "tags", None) or {}).items()) for ln in lines]
    common = dict(set.intersection(*tag_sets)) if tag_sets else {}
    return substitute(label, lambda k: common.get(k, k))


def render_png(result, width: int = 700, height: int = 300,
               source: str | None = None) -> bytes:
    """Render a GraphResult (api.GraphResult) to PNG bytes.

    One time-axis label row is drawn per entry in `result.timezones`
    (GraphDef.timezones, Grapher.scala:169-196): tick instants are
    identical across rows; the labels show each zone's local time, with
    the zone id at the left of its row.

    `source` (the graph URI/expression) embeds as PNG text metadata —
    `Source` plus a `Description` of the resolved window — so the query
    is recoverable from a saved image (PngGraphEngine.scala:29-33)."""
    from datetime import datetime, timezone as _tz
    from zoneinfo import ZoneInfo

    tzs = list(getattr(result, "timezones", None) or ["UTC"])
    th = _THEMES.get(getattr(result, "theme", None) or "light", _THEMES["light"])
    title = getattr(result, "title", None)
    # axis-0 label: ylabel.0 wins over the unsuffixed ylabel (getAxisParam)
    ylabel = ((getattr(result, "axes", None) or {}).get(0) or {}).get(
        "ylabel"
    ) or getattr(result, "ylabel", None)
    only_graph = bool(getattr(result, "only_graph", False))
    if only_graph:
        # only the chart (TimeSeriesGraph.scala:119-123: showAxes=false,
        # time axis collapses to a 10px strip): no title/ylabel/labels,
        # plot fills the image
        title = None
        ylabel = None
    zone_row_h = 11
    ylab_w = 8 if ylabel else 0
    pad_l, pad_r = (4, 4) if only_graph else (48 + ylab_w, 8)
    pad_t = 2 if only_graph else 8 + (10 if title else 0)
    pad_b = 10 if only_graph else 9 + zone_row_h * len(tzs)

    # axis-level params (Grapher.scala newAxis: `scale`/`o` pick the y
    # scale; `stack=1` makes stack the default line style for the axis).
    # Lines choose their y-axis via the `:axis` style setting; per-axis
    # URL params (`u.1`, `scale.1`, ...) arrive in `result.axes` and fall
    # back to the unsuffixed params (getAxisParam).
    axes_over = dict(getattr(result, "axes", None) or {})

    axis_of = line_axis
    _cfg_cache: dict = {}

    def axis_cfg(aid: int) -> dict:
        if aid not in _cfg_cache:
            _cfg_cache[aid] = axis_config(result, aid)
        return _cfg_cache[aid]

    def _style(ln) -> str:
        return line_style(result, ln, axis_cfg)

    hm_lines = [ln for ln in result.lines if _style(ln) == "heatmap"]
    ts_lines = [ln for ln in result.lines if ln not in hm_lines]
    n_steps = max(1, (result.end - result.start) // result.step)

    axis_ids = sorted({axis_of(ln) for ln in ts_lines} | {0})
    if len(axis_ids) > 1 and not only_graph:
        # secondary axes label on the right: widen the right margin —
        # unless only_graph suppresses all labels (the plot fills the
        # image, TimeSeriesGraph.scala:38,52), where widening would
        # leave a blank right strip
        pad_r = 44

    # layout mode (Layout.java, Grapher.scala:153): which dimensions the
    # caller's `w`/`h` fix.  CANVAS (default) sizes the data canvas and
    # the image grows to fit axes/title/legend; IMAGE fixes the final
    # image (legend shut off per GraphDef.legendTypeForLayout,
    # GraphDef.scala:137-139, other elements carved out of w/h); `iw`
    # fixes only the width, `ih` only the height.  `only_graph` keeps
    # both dimensions as given (TimeSeriesGraph.scala:38,52).
    layout = (getattr(result, "layout", None) or "canvas").lower()
    if layout not in ("canvas", "image", "iw", "ih"):
        raise ValueError(f"unknown layout: {layout}")
    fixed_w = only_graph or layout in ("image", "iw")
    fixed_h = only_graph or layout in ("image", "ih")

    # legend sizing (LegendEntry.height): one 9px label row per line,
    # plus three 8px stat rows when stats are shown.  Fixed-height
    # layouts drop the legend entirely (legendTypeForLayout -> OFF);
    # otherwise it extends the image below the time axis, capped at
    # MaxLinesInLegend entries (GraphConstants: 50).
    show_legend = bool(getattr(result, "show_legend", False)) and not fixed_h
    show_stats = bool(getattr(result, "show_legend_stats", True))
    entry_h = 9 + (3 * 8 if show_stats else 0)
    n_entries = 0
    legend_h = 0
    if show_legend and result.lines:
        n_entries = min(len(result.lines), 50)
        legend_h = n_entries * entry_h

    # notices (GraphDef.warnings): one amber 11px band row per warning
    # below the legend in growable layouts; fixed-height layouts can't
    # grow, so the background tints amber instead
    # (DefaultGraphEngine.scala:185-196)
    notices = [str(wmsg) for wmsg in (getattr(result, "warnings", None) or [])]
    notice_h = 11 * len(notices) if notices and not fixed_h else 0

    # translate canvas dims -> image dims for non-fixed dimensions
    if not fixed_w:
        width = width + pad_l + pad_r
    if not fixed_h:
        height = height + pad_t + pad_b + legend_h + notice_h
    plot_w = width - pad_l - pad_r
    plot_h = height - pad_t - pad_b - legend_h - notice_h
    bg = _WARN_BG if notices and fixed_h else th["bg"]
    cv = Canvas(width, height, bg=bg)

    bounds = {
        aid: axis_bounds(result, aid, n_steps, axis_cfg) for aid in axis_ids
    }
    tys = {}
    for aid in axis_ids:
        a_lo, a_hi = bounds[aid]
        raw = make_yscale(
            axis_cfg(aid)["scale"], a_lo, a_hi, pad_t, pad_t + plot_h - 1
        )
        # explicit bounds can put values outside the plot; clamp so marks
        # never spill into the axis labels or legend region
        tys[aid] = (
            lambda v, _raw=raw: min(pad_t + plot_h - 1, max(pad_t, _raw(v)))
        )
    lo, hi = bounds[0]
    ty = tys[0]

    def tx(i: int) -> int:
        return pad_l + int(round(i / max(1, n_steps - 1) * (plot_w - 1)))

    # grid + y tick labels: 5 horizontal ticks at linearly spaced VALUES,
    # placed through the axis scale (so a log axis shows its characteristic
    # compressed-at-the-top tick spacing)
    if title:
        tw = min(len(title), width // 6) * 6
        cv.text(max(0, (width - tw) // 2), 1, title[: width // 6], th["text"])
    if ylabel:
        # $(tag) substitution from the INTERSECTION of the axis's line
        # tags (Axis.scala:63 newPlotDef: Strings.substitute(ylabel,
        # getAxisTags); unknown keys render as the key itself)
        ylabel = _sub_ylabel(
            ylabel, [ln for ln in result.lines if axis_of(ln) == 0]
        )
        # vertical label: one glyph per row down the far-left column
        start = max(pad_t, pad_t + (plot_h - len(ylabel) * 8) // 2)
        for k, ch in enumerate(ylabel[: plot_h // 8]):
            cv.text(0, start + k * 8, ch, th["text"])
    # per-line colors (resolve_line_colors: explicit color > line
    # :palette group > per-axis palette.N iterator > global palette)
    line_color = resolve_line_colors(result)

    # multi-Y axis disambiguation (Grapher.scala:335, Axis.scala:68,
    # GraphDef.ambiguousMultiY): with >1 y-axis each axis's labels take
    # the color of its first line, unless the `ambiguous-multi-y`
    # rendering hint restores the legacy neutral coloring
    hints = {h for h in (getattr(result, "hints", None) or ()) if h}
    multi_y = len(axis_ids) > 1 and "ambiguous-multi-y" not in hints

    def _axis_label_color(aid: int):
        if multi_y:
            first = next((ln for ln in ts_lines if axis_of(ln) == aid), None)
            if first is not None:
                return line_color[id(first)][0]
        return th["text"]

    for g in range(5):
        val = hi - (hi - lo) * g / 4
        y = ty(val)
        cv.hline(y, pad_l, pad_l + plot_w - 1, th["grid"])
        if axis_cfg(0)["tick_labels"] != "off" and not only_graph:
            cv.text(
                2 + ylab_w,
                y - 3,
                _fmt_value(val, axis_cfg(0)["tick_labels"])[:7],
                _axis_label_color(0),
            )
    # secondary-axis labels on the right margin (first non-zero axis)
    if len(axis_ids) > 1 and not only_graph:
        aid2 = [a for a in axis_ids if a != 0][0]
        lo2, hi2 = bounds[aid2]
        for g in range(5):
            val = hi2 - (hi2 - lo2) * g / 4
            y = tys[aid2](val)
            if axis_cfg(aid2)["tick_labels"] != "off":
                cv.text(
                    pad_l + plot_w + 3,
                    y - 3,
                    _fmt_value(val, axis_cfg(aid2)["tick_labels"])[:6],
                    _axis_label_color(aid2),
                )
        # ylabel.N for the secondary axis: vertical glyphs down the far
        # right column (Axis.ylabel per axis, Grapher newAxis)
        yl2 = (axes_over.get(aid2) or {}).get("ylabel")
        if yl2:
            yl2 = _sub_ylabel(
                yl2, [ln for ln in result.lines if axis_of(ln) == aid2]
            )
            start = max(pad_t, pad_t + (plot_h - len(yl2) * 8) // 2)
            for k, ch in enumerate(yl2[: plot_h // 8]):
                cv.text(width - 7, start + k * 8, ch, _axis_label_color(aid2))
    tick_is = list(range(0, n_steps, max(1, n_steps // 8)))
    for i in tick_is:
        cv.vline(tx(i), pad_t, pad_t + plot_h - 1, th["grid"])

    # axes + time labels (suppressed by only_graph: showAxes=false and
    # the time strip stays empty)
    if not only_graph:
        cv.vline(pad_l - 1, pad_t, pad_t + plot_h, th["axis"])
        cv.hline(pad_t + plot_h, pad_l - 1, pad_l + plot_w - 1, th["axis"])

    # per-zone time tick labels (one row per zone, same tick instants)
    for zi, zone in enumerate(tzs if not only_graph else []):
        try:
            z = ZoneInfo(zone)
        except Exception:  # noqa: BLE001 — invalid zone falls back to UTC
            z = _tz.utc
        row_y = pad_t + plot_h + 3 + zi * zone_row_h
        for i in tick_is:
            t = result.start + i * result.step
            local = datetime.fromtimestamp(t, tz=z)
            label = local.strftime("%H:%M")
            x = tx(i) - 14
            if x + 30 <= width:
                cv.text(max(pad_l - 14, x), row_y, label, th["text"])
        if len(tzs) > 1:
            # zone id marker in the left margin of its row
            cv.text(2, row_y, zone.rsplit("/", 1)[-1][:7], th["text"])

    # ty clamps, so with bounds excluding 0 the area fill meets the
    # nearest plot edge (reference behavior for clipped area fills)
    zero_ys = {aid: tys[aid](0.0) for aid in axis_ids}

    if hm_lines:
        _render_heatmap(
            cv,
            hm_lines,
            n_steps,
            tx,
            ty,
            lo,
            hi,
            pad_t,
            plot_h,
            scale=axis_cfg(0)["scale"],
            opts=axes_over.get(0) or {},
        )

    # running stack offsets per step and per axis (TimeSeriesStack.
    # Offsets): positive values pile on pos_y, negative on neg_y — a
    # stacked line fills from the previous stacked total to its own
    # contribution on top of it
    pos_ys = {aid: [0.0] * n_steps for aid in axis_ids}
    neg_ys = {aid: [0.0] * n_steps for aid in axis_ids}

    for ln in ts_lines:
        settings = getattr(ln, "settings", {}) or {}
        color, alpha = line_color[id(ln)]
        if "alpha" in settings:
            try:
                alpha = int(settings["alpha"], 16) / 255.0
            except ValueError:
                pass
        style = _style(ln)
        # `:lw` stroke width (LineDef.lineWidth; only LINE style strokes
        # are widened, matching TimeSeriesLine).  The reference passes the
        # raw double to BasicStroke unclamped; a raster stamp needs an int,
        # so round, with a defensive cap well above any sane chart width.
        try:
            lw = max(1, min(100, int(round(float(settings.get("lw", 1))))))
        except (TypeError, ValueError):
            lw = 1
        aid = axis_of(ln)
        ty = tys[aid]
        zero_y = zero_ys[aid]
        pos_y, neg_y = pos_ys[aid], neg_ys[aid]
        prev = None
        for i, v in enumerate(ln.data[:n_steps]):
            if v is None or not math.isfinite(v):
                prev = None
                continue
            x = tx(i)
            # area/stack/vspan fill the full span to the next step
            # (TimeSeriesStack.draw fills the px1..px2 rect per interval)
            x_end = tx(i + 1) - 1 if i + 1 < n_steps else pad_l + plot_w - 1
            x_end = max(x, x_end)
            # Fills draw with the line's style AS-IS — the reference
            # applies NO implicit translucency to area/stack/vspan
            # (TimeSeriesArea/Stack/Span draw with style.configure(g)
            # directly; alpha comes only from an explicit `:alpha` or an
            # ARGB color, Grapher.scala:420-426).  Earlier rounds capped
            # fill alpha at 0.5-0.9, which pixel-diffed 33-44% vs the
            # reference goldens on filled charts.
            if style == "vspan":
                # truthy points shade the full plot height
                if abs(v) >= 1e-12:
                    for xx in range(x, x_end + 1):
                        cv.vline(xx, pad_t, pad_t + plot_h - 1, color, alpha)
            elif style == "stack":
                # TimeSeriesStack.draw: fill from the current offset to
                # offset+v, then advance the offset; v == 0 with empty
                # offsets draws a 1px marker so 0 and NO_DATA differ
                if v > 0.0:
                    y0, y1 = ty(pos_y[i]), ty(v + pos_y[i])
                    for xx in range(x, x_end + 1):
                        cv.vline(xx, min(y0, y1), max(y0, y1), color, alpha)
                    pos_y[i] += v
                elif v < 0.0:
                    y0, y1 = ty(neg_y[i]), ty(v + neg_y[i])
                    for xx in range(x, x_end + 1):
                        cv.vline(xx, min(y0, y1), max(y0, y1), color, alpha)
                    neg_y[i] += v
                elif pos_y[i] == 0.0 and neg_y[i] == 0.0:
                    cv.hline(ty(0.0), x, x_end, color)
            elif style == "area" and zero_y is not None:
                for xx in range(x, x_end + 1):
                    cv.vline(xx, ty(v), zero_y, color, alpha)
            else:
                y = ty(v)
                if prev is not None:
                    cv.line(prev[0], prev[1], x, y, color, width=lw)
                else:
                    cv.put(x, y, color)
                prev = (x, y)

    # ---------------------------------------------------------------- legend
    # LegendEntry.draw: color box + label row, then Max/Min | Avg/Last |
    # Tot/Cnt stat rows from the line's data (LineDef.legendStats)
    if notice_h:
        ny0 = height - notice_h
        for ni, msg in enumerate(notices):
            ry = ny0 + ni * 11
            for yy in range(ry, ry + 11):
                cv.hline(yy, 0, width - 1, _WARN_BG)
            cv.text(4, ry + 2, msg[: (width - 8) // 6], (32, 32, 32))
    if n_entries:
        y0 = height - legend_h - notice_h
        for li in range(n_entries):
            ln = result.lines[li]
            color, _ = line_color[id(ln)]
            ey = y0 + li * entry_h
            for yy in range(ey + 1, ey + 8):
                cv.hline(yy, 4, 10, color)
            cv.text(14, ey + 1, (ln.label or "")[: (width - 18) // 6], th["text"])
            if show_stats:
                vals = [
                    v for v in ln.data if v is not None and math.isfinite(v)
                ]
                if vals:
                    # legend stats format with the LINE'S plot tick label
                    # mode (LegendEntry.format -> plot.tickLabelMode),
                    # which may differ per axis via tick_labels.N
                    lt_mode = axis_cfg(axis_of(ln))["tick_labels"]
                    fmt = lambda x: _fmt_value(x, lt_mode)  # noqa: E731
                    stats = [
                        ("MAX", fmt(max(vals)), "MIN", fmt(min(vals))),
                        (
                            "AVG",
                            fmt(sum(vals) / len(vals)),
                            "LAST",
                            fmt(vals[-1]),
                        ),
                        ("TOT", fmt(sum(vals)), "CNT", str(len(vals))),
                    ]
                else:
                    stats = [("MAX", "-", "MIN", "-"), ("AVG", "-", "LAST", "-"), ("TOT", "-", "CNT", "-")]
                for si, (k1, v1, k2, v2) in enumerate(stats):
                    row = f"{k1} {v1:<9}{k2} {v2:<9}"
                    cv.text(14, ey + 9 + si * 8, row[: (width - 18) // 6], th["text"])
    metadata = None
    if source:
        iso = lambda t: (  # noqa: E731 — Instant.toString rendering
            datetime.fromtimestamp(t, tz=_tz.utc)
            .isoformat()
            .replace("+00:00", "Z")
        )
        metadata = {
            "Source": source,
            "Description": f"start={iso(result.start)}, end={iso(result.end)}",
        }
    return cv.to_png(metadata)


def error_png(
    msg: str, width: int = 700, height: int = 300, user_error: bool = True
) -> bytes:
    """Error image for failed graph requests from a browser
    (PngImage.userError/systemError, PngImage.scala:90-130): user errors
    render black-on-yellow (0xFFCF00), system errors white-on-red
    (0xF82000), message word-wrapped to the clamped canvas
    (GraphConstants max 2000x1000)."""
    w = max(48, min(width, 2000))
    h = max(16, min(height, 1000))
    if user_error:
        bg, fg, prefix = (0xFF, 0xCF, 0x00), (0, 0, 0), "USER ERROR:"
    else:
        bg, fg, prefix = (0xF8, 0x20, 0x00), (255, 255, 255), "SYSTEM ERROR:"
    canvas = Canvas(w, h, bg=bg)
    # 5x7 font at 6px advance; wrap words to the drawable width
    max_chars = max(1, (w - 8) // 6)
    lines: list[str] = []
    cur = ""
    for word in f"{prefix} {msg}".split():
        cand = f"{cur} {word}".strip()
        if len(cand) <= max_chars:
            cur = cand
        else:
            if cur:
                lines.append(cur)
            while len(word) > max_chars:  # single over-long token
                lines.append(word[:max_chars])
                word = word[max_chars:]
            cur = word
    if cur:
        lines.append(cur)
    for i, line in enumerate(lines):
        y = 4 + i * 9
        if y + 7 > h:
            break
        canvas.text(4, y, line, rgb=fg)
    return canvas.to_png()
