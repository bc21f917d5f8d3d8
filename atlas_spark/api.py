"""Driver-facing query APIs — the Spark equivalent of the reference's HTTP
surface (`atlas-webapi`):

  Engine.graph(uri)  ~ GET /api/v1/graph   (GraphApi.scala:37-48)
  Engine.fetch(uri)  ~ GET /api/v2/fetch   (GraphApi.scala:49-58)
  Engine.tags(...)   ~ GET /api/v1/tags    (TagsApi.scala:44-127)
  Engine.expr(q)     ~ GET /api/v1/expr    (ExprApi.scala)

`graph` renders evaluated expressions to JSON- or CSV-compatible
structures (one TimeSeriesMessage-like dict per line, mirroring
`atlas-eval/.../model/TimeSeriesMessage.scala`).  Collecting is bounded by
the number of *lines* x steps, never raw datapoints — aggregation happens
distributed before any collect.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any
from urllib.parse import parse_qs, urlparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .model import expr as E
from .plans.builder import Evaluator, ResultFrame
from .plans.context import EvalContext
from .sources.datapoints import DatapointSource, EVENTS_END, EVENTS_START, events_datapoints
from .stacklang.vocab import parse as parse_asl
from .util.strings import duration_to_string, parse_duration


@dataclass
class GraphLine:
    tags: dict[str, str]
    label: str
    data: list[float | None]  # one value per step, None = no data
    settings: dict[str, str] = field(default_factory=dict)  # style words


import math as _math


def _finite_vals(data) -> list[float]:
    """Samples a SummaryStats would count: None (no data) and float NaN
    are both excluded (SummaryStats.scala:29-40 skips v.isNaN)."""
    return [
        v
        for v in data
        if v is not None and not (isinstance(v, float) and _math.isnan(v))
    ]


def _json_value(v):
    """Standard-JSON value spelling shared by the json/std.json, v2.json
    and stats.json engines: non-finite values become the QUOTED strings
    NaN / Infinity / -Infinity (StdJsonGraphEngine convention); finite
    values pass through."""
    if v is None or (isinstance(v, float) and _math.isnan(v)):
        return "NaN"
    if v == _math.inf:
        return "Infinity"
    if v == -_math.inf:
        return "-Infinity"
    return v


@dataclass
class GraphResult:
    start: int
    end: int
    step: int
    lines: list[GraphLine]
    # GraphDef.timezones (Grapher.scala:169-196): first zone drives
    # expression semantics (the `tz` interpreter var); every zone gets its
    # own time-axis label row in the PNG rendering
    timezones: list[str] = field(default_factory=lambda: ["UTC"])
    # axis config (Grapher.scala newAxis): y scale name (`scale` param,
    # legacy `o=1` -> log) and whether lines default to stacked (`stack=1`)
    scale: str = "linear"
    axis_stack: bool = False
    # explicit y bounds (`u`/`l` params, PlotDef.upper/lower); lower also
    # accepts "auto-data" (tight data min even with area lines present)
    upper: float | None = None
    lower: float | str | None = None
    # legend config (GraphConfig legendType: OFF / LABELS_ONLY /
    # LABELS_WITH_STATS via no_legend / no_legend_stats / only_graph).
    # Default False so directly constructed results render graph-only;
    # the /graph URI path turns it on unless no_legend=1.
    show_legend: bool = False
    show_legend_stats: bool = True
    theme: str = "light"
    # axis palette (Palette.create: name / colors: list / (,..,) list),
    # chart title and y-axis label (`palette`/`title`/`ylabel` params)
    palette: str | None = None
    title: str | None = None
    ylabel: str | None = None
    # color-deficiency simulation (`vision` param, VisionType.java)
    vision: str = "normal"
    # y tick label mode (`tick_labels` param, TickLabelMode:
    # off/decimal/binary/duration)
    tick_labels: str = "decimal"
    # per-axis overrides (`u.1`, `scale.1`, `stack.1`, ... — Grapher's
    # getAxisParam falls back to the unsuffixed value): {axis id: {key:
    # value}}; lines select their axis via the `:axis` style setting
    axes: dict[int, dict] = field(default_factory=dict)
    # layout mode (`layout` param, Layout.java / Grapher.scala:153):
    # canvas (default — w/h size the data canvas, the image grows to fit
    # axes/title/legend) | image (w/h size the final image) | iw | ih
    layout: str = "canvas"
    # only_graph also fixes both dimensions (TimeSeriesGraph.scala:38,52)
    only_graph: bool = False
    # rendering hints (`hints` param, Grapher.processHints): free-form
    # comma set; `ambiguous-multi-y` restores legacy multi-Y coloring
    hints: frozenset = frozenset()
    # user-facing notices (GraphDef.warnings): size/zoom clamp messages
    # etc. — rendered as a notice band and written as `notices` in JSON
    warnings: list = field(default_factory=list)
    # CollectorStats-style scan accounting (CollectorStats.scala) and
    # data-fetch wall time; None / -1 = unknown (no explain/stats blocks)
    stats: dict | None = None
    load_time_ms: int = -1

    def to_json(self) -> dict[str, Any]:
        """json / std.json payload (JsonGraphEngine.write,
        JsonGraphEngine.scala:32-75): `start` + `step` only (no end/tz
        keys), legend, metrics with tags SORTED by key, and `values` as
        one row PER TIMESTAMP (each row holds one value per series —
        the transpose of the per-line arrays).  Non-numeric values are
        spelled as quoted strings ("NaN"/"Infinity"), the std.json
        behavior the `json` name now shares (StdJsonGraphEngine.scala:
        20-28)."""
        n = (self.end - self.start) // self.step
        out: dict[str, Any] = {
            "start": self.start * 1000,
            "step": self.step * 1000,
            "legend": [ln.label for ln in self.lines],
            "metrics": [dict(sorted(ln.tags.items())) for ln in self.lines],
            "values": [
                [_json_value(ln.data[i]) for ln in self.lines]
                for i in range(n)
            ],
            # JsonGraphEngine.scala:72-73 writes warnings as `notices`
            "notices": list(self.warnings),
        }
        # explain block (JsonGraphEngine.scala:77-92): written when the
        # collector stats are known (inputLines > 0)
        if self.stats and self.stats.get("inputLines", 0) > 0:
            graph_lines = len(self.lines)
            # the reference writes steps+1 per line because ITS window
            # convention carries one extra inclusive cell; this engine's
            # [start, end) window has exactly n cells, so the explain
            # totals stay cross-checkable against len(values)
            graph_datapoints = graph_lines * (
                (self.end - self.start) // self.step
            )
            out["explain"] = {
                "dataFetchTime": self.load_time_ms,
                "inputLines": self.stats["inputLines"],
                "intermediateLines": self.stats["outputLines"],
                "graphLines": graph_lines,
                "inputDatapoints": self.stats["inputDatapoints"],
                "intermediateDatapoints": self.stats["outputDatapoints"],
                "graphDatapoints": graph_datapoints,
            }
        return out

    def to_csv(self, sep: str = ",") -> str:
        """CsvGraphEngine.write parity (CsvGraphEngine.scala:31-60):
        quoted header labels, timestamps as ISO-offset date-times in the
        graph's FIRST timezone (seconds omitted when zero, `Z` for UTC —
        DateTimeFormatter.ISO_OFFSET_DATE_TIME), values through the `%f`
        number format with Java's NaN/Infinity spellings for missing or
        infinite data; every row newline-terminated."""
        from .util.strings import _zoneinfo

        tz = _zoneinfo((self.timezones or ["UTC"])[0])
        header = ['"timestamp"'] + [f'"{ln.label}"' for ln in self.lines]
        rows = [sep.join(header)]
        for i in range((self.end - self.start) // self.step):
            t = _dt.datetime.fromtimestamp(self.start + i * self.step, tz=tz)
            ts = t.strftime("%Y-%m-%dT%H:%M")
            if t.second or t.microsecond:
                ts += f":{t.second:02d}"
            off = t.utcoffset() or _dt.timedelta(0)
            if not off:
                ts += "Z"
            else:
                total = int(off.total_seconds())
                sign = "+" if total >= 0 else "-"
                total = abs(total)
                ts += f"{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}"
            vals = []
            for ln in self.lines:
                x = _json_value(ln.data[i])
                vals.append(x if isinstance(x, str) else "%f" % x)
            rows.append(sep.join([ts] + vals))
        return "\n".join(rows) + "\n"

    def to_txt(self) -> str:
        """Tab-separated variant (TabSepGraphEngine)."""
        return self.to_csv(sep="\t")

    def to_stats_json(self) -> dict[str, Any]:
        """Per-line summary stats instead of raw data
        (StatsJsonGraphEngine.scala:27-87: start/end/step, legend, metrics
        with tags sorted by key, stats objects with count always present
        and avg/total/max/min/last written for EVERY line — "NaN"-quoted
        when the line has no data, SummaryStats.empty)."""
        stats = []
        for ln in self.lines:
            vals = _finite_vals(ln.data)
            s: dict[str, Any] = {"count": len(vals)}
            if vals:
                s.update(
                    avg=sum(vals) / len(vals),
                    total=sum(vals),
                    max=max(vals),
                    min=min(vals),
                    last=vals[-1],
                )
            else:
                s.update(avg="NaN", total="NaN", max="NaN", min="NaN", last="NaN")
            stats.append(s)
        return {
            "start": self.start * 1000,
            "end": self.end * 1000,
            "step": self.step * 1000,
            "legend": [ln.label for ln in self.lines],
            "metrics": [dict(sorted(ln.tags.items())) for ln in self.lines],
            "stats": stats,
            "notices": list(self.warnings),
        }

    def to_v2_json(
        self, width: int = 700, height: int = 300, zoom: float = 1.0
    ) -> list[dict[str, Any]]:
        """Incremental message-array format (V2JsonGraphEngine via
        JsonCodec.writeGraphDef, JsonCodec.scala:95-364): graph-image (a
        base64 PNG data URI, suppressed by the `no-image` rendering
        hint), graph-metadata with the full chart config, one
        plot-metadata per axis in use (scale/bounds/tick mode as the
        reference's enum spellings), then one timeseries message per
        line with its RESOLVED color (8-hex ARGB), line style/width,
        tags, and "NaN"-quoted standard-JSON values.  Plots carrying
        heatmap lines additionally emit a `heatmap` message whose cell
        grid, bounds and color mapping are THIS engine's rendering
        (the reference derives its grid from axis ticks instead)."""
        import base64

        from . import chart as _chart

        hints = {h for h in (getattr(self, "hints", None) or ()) if h}
        out: list[dict[str, Any]] = []
        if "no-image" not in hints:
            # DefaultGraphEngine applies zoom after clamping, so the
            # embedded image scales while width/height stay canvas dims
            png = _chart.render_png(
                self, max(64, int(width * zoom)), max(64, int(height * zoom))
            )
            out.append(
                {
                    "type": "graph-image",
                    "data": "data:image/png;base64,"
                    + base64.b64encode(png).decode(),
                }
            )
        if not self.show_legend:
            legend_type = "OFF"
        elif self.show_legend_stats:
            legend_type = "LABELS_WITH_STATS"
        else:
            legend_type = "LABELS_ONLY"
        meta: dict[str, Any] = {
            "type": "graph-metadata",
            "startTime": self.start * 1000,
            "endTime": self.end * 1000,
            "timezones": list(self.timezones),
            "step": self.step * 1000,
            "width": width,
            "height": height,
            "layout": {
                "canvas": "CANVAS",
                "image": "IMAGE",
                "iw": "IMAGE_WIDTH",
                "ih": "IMAGE_HEIGHT",
            }.get(self.layout, "CANVAS"),
            "zoom": zoom,
        }
        if self.title:
            meta["title"] = self.title
        meta["legendType"] = legend_type
        meta["onlyGraph"] = bool(self.only_graph)
        meta["theme"] = self.theme
        if self.load_time_ms > 0:
            meta["loadTime"] = self.load_time_ms
        if self.stats:
            meta["stats"] = {
                "inputLines": self.stats["inputLines"],
                "inputDatapoints": self.stats["inputDatapoints"],
                "outputLines": self.stats["outputLines"],
                "outputDatapoints": self.stats["outputDatapoints"],
            }
        meta["warnings"] = list(self.warnings)
        if hints:
            meta["renderingHints"] = sorted(hints)
        out.append(meta)

        scale_names = {
            "linear": "LINEAR",
            "log": "LOGARITHMIC",
            "log-linear": "LOG_LINEAR",
            "pow2": "POWER_2",
            "sqrt": "SQRT",
        }
        tick_names = {
            "off": "OFF",
            "decimal": "DECIMAL",
            "binary": "BINARY",
            "duration": "DURATION",
        }

        def bound(v) -> str:
            # PlotBound.toString: auto-style default, auto-data keyword,
            # explicit values via Double.toString
            if v is None:
                return "auto-style"
            if isinstance(v, str):
                return v
            return repr(float(v))

        # plot ids are DENSE positional indexes over the axes actually in
        # use, in sorted axis order (JsonCodec writes plots.zipWithIndex —
        # Grapher groups lines by axis and sorts, so an all-axis-1 graph
        # has ONE plot with id 0); lines emit grouped by plot
        used_axes = sorted({_chart.line_axis(ln) for ln in self.lines}) or [0]
        for pid, aid in enumerate(used_axes):
            cfg = _chart.axis_config(self, aid)
            pm: dict[str, Any] = {"type": "plot-metadata", "id": pid}
            yl = ((self.axes or {}).get(aid) or {}).get("ylabel") or (
                self.ylabel if aid == 0 else None
            )
            if yl:
                pm["ylabel"] = _chart._sub_ylabel(
                    yl, [ln for ln in self.lines if _chart.line_axis(ln) == aid]
                )
            pm["scale"] = scale_names.get(cfg["scale"], "LINEAR")
            pm["upper"] = bound(cfg["upper"])
            pm["lower"] = bound(cfg["lower"])
            pm["tickLabelMode"] = tick_names.get(cfg["tick_labels"], "DECIMAL")
            out.append(pm)

        # heatmap cell block (JsonCodec.writeHeatmapDef): emitted when a
        # plot carries heatmap lines — cell rows derive from the axis
        # TICK ladder at the render plot height (Heatmap.scala:63 yTicks
        # -> yaxis.ticks(0, canvasHeight)), the same grid the PNG
        # renderer buckets by, so a reference client consuming the cell
        # blocks sees the reference's bucket boundaries.  The grid uses
        # the UNZOOMED height: zoom scales the embedded image, not the
        # layout the cells were computed on.
        n = (self.end - self.start) // self.step
        hm_lines = [
            ln
            for ln in self.lines
            if _chart.line_style(self, ln) == "heatmap"
        ]
        if hm_lines and n > 0:
            aid0 = 0  # heatmap lines render on axis 0
            pid0 = used_axes.index(aid0) if aid0 in used_axes else 0
            lo, hi = _chart.axis_bounds(self, aid0, n)
            edges = _chart.heatmap_edges(
                lo,
                hi,
                _chart.heatmap_plot_height(self, height),
                _chart.axis_config(self, aid0)["scale"],
            )
            counts = _chart.heatmap_cells(hm_lines, n, edges)
            if any(c > 0.0 for row in counts for c in row):
                opts = (self.axes or {}).get(aid0) or {}
                hm_scale = (opts.get("heatmap_scale") or "linear").lower()
                y_mode = _chart.axis_config(self, aid0)["tick_labels"]
                hmsg: dict[str, Any] = {
                    "type": "heatmap",
                    "plot": pid0,
                    "colorScale": scale_names.get(hm_scale, "LINEAR"),
                    "upper": bound(opts.get("heatmap_u")),
                    "lower": bound(opts.get("heatmap_l")),
                }
                if opts.get("heatmap_label"):
                    hmsg["label"] = opts["heatmap_label"]
                # one yTick entry per TICK — [min, t0], [t0, t1], ...,
                # [t_{k-1}, t_k] — while the data rows carry k+1 values
                # (the open [t_k, max] bucket has counts but no tick
                # row), exactly JsonCodec.writeHeatmapDef:212-227's
                # asymmetry; labels use the axis's tick label mode
                hmsg["yTicks"] = [
                    {
                        "min": edges[c],
                        "max": edges[c + 1],
                        "label": _chart._fmt_value(edges[c + 1], y_mode),
                    }
                    for c in range(len(edges) - 2)
                ]
                pal = _chart.palette_colors(opts.get("heatmap_palette"))
                if pal:
                    # ascending-count segments whose boundaries are the
                    # EXACT counts where the renderer's color changes:
                    # color index = round((1-frac)*(k-1)) over the
                    # (linear | vizlog) count fraction between the
                    # bounds — explicit heatmap_l/u of 0 are honored
                    # (is-not-None, matching _render_heatmap)
                    pos = [c for row in counts for c in row if c > 0.0]
                    hl, hu = opts.get("heatmap_l"), opts.get("heatmap_u")
                    lo_c = float(hl) if hl is not None else min(pos)
                    hi_c = float(hu) if hu is not None else max(pos)
                    if hi_c <= lo_c:
                        hi_c = lo_c + 1.0
                    k = len(pal)

                    if hm_scale == "log":
                        vlo, vhi = _chart._vizlog(lo_c), _chart._vizlog(hi_c)

                        def from_frac(f: float) -> float:
                            return _chart._vizlog_inv(vlo + f * (vhi - vlo))

                    else:

                        def from_frac(f: float) -> float:
                            return lo_c + f * (hi_c - lo_c)

                    ticks = []
                    if k == 1:
                        ticks.append(
                            {
                                "color": "ff"
                                + "".join(f"{v:02x}" for v in pal[0]),
                                "min": lo_c,
                                "max": hi_c,
                                "label": _chart._fmt_value(hi_c, y_mode),
                            }
                        )
                        k = 0  # skip the loop below
                    for j in range(k):  # ascending count
                        i = k - 1 - j  # renderer color index
                        f0 = 0.0 if j == 0 else 1 - (i + 0.5) / (k - 1)
                        f1 = 1.0 if j == k - 1 else 1 - (i - 0.5) / (k - 1)
                        c0, c1 = from_frac(max(0.0, f0)), from_frac(min(1.0, f1))
                        ticks.append(
                            {
                                "color": "ff"
                                + "".join(f"{v:02x}" for v in pal[i]),
                                "min": c0,
                                "max": c1,
                                "label": _chart._fmt_value(c1, y_mode),
                            }
                        )
                    hmsg["colorTicks"] = ticks
                hmsg["data"] = {"type": "heatmap", "values": counts}
                out.append(hmsg)

        colors = _chart.resolve_line_colors(self)
        for pid, aid in enumerate(used_axes):
            for ln in self.lines:
                if _chart.line_axis(ln) != aid:
                    continue
                (r, g, b), a = colors[id(ln)]
                settings = getattr(ln, "settings", {}) or {}
                # `:alpha` overrides the color's alpha at render time
                # (StyleExpr folds it into LineDef.color) — fold it into
                # the emitted ARGB the same way
                if "alpha" in settings:
                    try:
                        a = int(settings["alpha"], 16) / 255.0
                    except ValueError:
                        pass
                try:
                    lw = float(settings.get("lw", 1.0) or 1.0)
                except (TypeError, ValueError):
                    lw = 1.0
                out.append(
                    {
                        "type": "timeseries",
                        "plot": pid,
                        "label": ln.label,
                        "color": f"{int(round(a * 255)):02x}{r:02x}{g:02x}{b:02x}",
                        "lineStyle": _chart.line_style(self, ln).upper(),
                        "lineWidth": lw,
                        "tags": ln.tags,
                        "data": {
                            "type": "array",
                            "values": [_json_value(v) for v in ln.data],
                        },
                    }
                )
        return out


def from_v2_json(msgs: list[dict]) -> "GraphResult":
    """Decode a v2.json message stream back into a renderable
    GraphResult (JsonCodec.readGraphDef role): the graph re-renders
    from the decoded config — the format's stated purpose is that the
    output "can be used to precisely recreate the image".  Plot ids
    are dense, so decoded lines land on axis == plot id; decoded
    colors/styles/widths become explicit line settings (they were the
    RESOLVED values), and "NaN" values decode to gaps.  graph-image
    and heatmap messages are skipped — the image re-renders and
    heatmap cells recompute from the heatmap timeseries lines."""
    scale_rev = {
        "LINEAR": "linear",
        "LOGARITHMIC": "log",
        "LOG_LINEAR": "log-linear",
        "POWER_2": "pow2",
        "SQRT": "sqrt",
    }
    tick_rev = {
        "OFF": "off",
        "DECIMAL": "decimal",
        "BINARY": "binary",
        "DURATION": "duration",
    }
    layout_rev = {
        "CANVAS": "canvas",
        "IMAGE": "image",
        "IMAGE_WIDTH": "iw",
        "IMAGE_HEIGHT": "ih",
    }

    def unbound(v: str):
        if v == "auto-style":
            return None
        if v == "auto-data":
            return v
        return float(v)

    meta = next(m for m in msgs if m["type"] == "graph-metadata")
    step = meta["step"] // 1000
    axes: dict[int, dict] = {}
    for m in msgs:
        if m["type"] != "plot-metadata":
            continue
        sub: dict = {
            "scale": scale_rev.get(m.get("scale", "LINEAR"), "linear"),
            "tick_labels": tick_rev.get(m.get("tickLabelMode"), "decimal"),
        }
        up = unbound(m.get("upper", "auto-style"))
        lo = unbound(m.get("lower", "auto-style"))
        if up is not None:
            sub["upper"] = up
        if lo is not None:
            sub["lower"] = lo
        if m.get("ylabel"):
            sub["ylabel"] = m["ylabel"]
        axes[m["id"]] = sub
    # heatmap messages carry the color config: restore it onto the
    # plot's axis so heatmap graphs re-render with the same palette,
    # scale, bounds and label (the palette rebuilds as an explicit
    # colors: list from the colorTicks, first color = highest count)
    for m in msgs:
        if m["type"] != "heatmap":
            continue
        sub = axes.setdefault(m["plot"], {})
        sub["heatmap_scale"] = scale_rev.get(m.get("colorScale"), "linear")
        up = unbound(m.get("upper", "auto-style"))
        lo = unbound(m.get("lower", "auto-style"))
        if up is not None and up != "auto-data":
            sub["heatmap_u"] = up
        if lo is not None and lo != "auto-data":
            sub["heatmap_l"] = lo
        if m.get("label"):
            sub["heatmap_label"] = m["label"]
        if m.get("colorTicks"):
            cols = [t["color"][2:] for t in reversed(m["colorTicks"])]
            sub["heatmap_palette"] = "colors:" + ",".join(cols)
    lines: list[GraphLine] = []
    for m in msgs:
        if m["type"] != "timeseries":
            continue
        settings = {
            "color": m["color"],  # AARRGGBB — _parse_color's 8-hex form
            "ls": m["lineStyle"].lower(),
            "lw": str(m.get("lineWidth", 1.0)),
        }
        if m["plot"]:
            settings["axis"] = str(m["plot"])
        lines.append(
            GraphLine(
                tags=dict(m.get("tags") or {}),
                label=m.get("label", ""),
                data=[
                    None
                    if v == "NaN"
                    else _math.inf
                    if v == "Infinity"
                    else -_math.inf
                    if v == "-Infinity"
                    else v
                    for v in m["data"]["values"]
                ],
                settings=settings,
            )
        )
    legend_type = meta.get("legendType", "LABELS_WITH_STATS")
    return GraphResult(
        start=meta["startTime"] // 1000,
        end=meta["endTime"] // 1000,
        step=step,
        lines=lines,
        timezones=list(meta.get("timezones") or ["UTC"]),
        show_legend=legend_type != "OFF",
        show_legend_stats=legend_type == "LABELS_WITH_STATS",
        theme=meta.get("theme", "light"),
        title=meta.get("title"),
        axes=axes,
        layout=layout_rev.get(meta.get("layout", "CANVAS"), "canvas"),
        only_graph=bool(meta.get("onlyGraph", False)),
        hints=frozenset(meta.get("renderingHints") or ()),
        warnings=list(meta.get("warnings") or []),
    )


def _type_summary(stack: list) -> str:
    """Interpreter.typeSummary parity (Interpreter.scala:388-397):
    bottom-first `[Type1,Type2]` with lists collapsed to `List`."""

    def name(v) -> str:
        if isinstance(v, list):
            return "List"
        if isinstance(v, str):
            return "String"
        return type(v).__name__

    return "[" + ",".join(name(v) for v in stack) + "]"


def _verify_stack_contents(vocab: str, stack: list) -> None:
    """Result-contract check per vocabulary layer
    (ExprApi.verifyStackContents, ExprApi.scala:94-123): `std` accepts
    anything; `query` requires exactly one query; every other layer
    requires a non-empty stack of presentation-coercible items."""
    from .model import query as Qm
    from .stacklang.interpreter import is_number

    if vocab == "std":
        return
    if vocab == "query":
        if not stack:
            raise ValueError("expected a single query, stack is empty")
        if len(stack) > 1:
            raise ValueError(
                f"expected a single query, found {_type_summary(stack)}"
            )
        return
    for item in stack:
        ok = isinstance(item, (E.TimeSeriesExpr, Qm.Query)) or (
            isinstance(item, str) and is_number(item)
        )
        if not ok:
            raise ValueError(
                f"expected an expression, found {_type_summary([item])}"
            )
    if not stack:
        raise ValueError("expected an expression, stack is empty")


# Words excluded from /api/v1/expr/complete suggestions — always-matching
# stack words, deprecated spellings, and internal placeholders
# (atlas-webapi reference.conf:160-227 `expr.complete.excluded-words`,
# consumed via ApiSettings.excludedWords in ExprApi.matches).
EXCLUDED_COMPLETE_WORDS = frozenset(
    {
        # stack manipulation
        "-rot", "2over", "call", "clear", "depth", "drop", "dup", "each",
        "fcall", "format", "freeze", "get", "list", "map", "ndrop", "nip",
        "nlist", "over", "pick", "roll", "rot", "set", "sset", "swap",
        "tuck",
        # queries
        "true", "false", "reic", "not",
        # data aggregations
        "all", "cf-avg", "cf-sum", "cf-min", "cf-max", "head",
        # math
        "des", "des-simple", "des-fast", "des-slow", "des-slower",
        "des-epic-signal", "des-epic-viz", "random",
        # filter
        "stat-avg", "stat-max", "stat-min", "stat-last", "stat-count",
        "stat-total", "stat-min-mf", "stat-max-mf", "stat-avg-mf",
    }
)


def resolve_context(
    qs: dict[str, list[str]],
    src_step: int,
    default_window: tuple[int, int],
) -> EvalContext:
    """URI time params -> evaluation context, with the reference's
    auto-step: the effective step is derived from the canvas width and
    the time window so each datapoint gets at least a pixel
    (GraphConfig.scala:70-82 — roundedStepSize rounds an explicit `step`
    param UP the allowed ladder, stepSize = Step.compute over
    min(max-datapoints, width)).  Seconds-domain wrapper around the
    millisecond Step util; start/end round to the EFFECTIVE step, with
    the rs==re backward extension."""
    from .util.step import MAX_DATAPOINTS, Step

    step_util = Step.for_block_step(src_step * 1000)
    # roundedStepSize: explicit step rounds UP the ladder, never down
    # (Step.round via GraphConfig.scala:72-76); absent -> storage step
    if "step" in qs:
        step = step_util.round(
            src_step * 1000, parse_duration(qs["step"][0]) * 1000
        ) // 1000
    else:
        step = src_step
    d_start, d_end = default_window
    # Window resolution is tz-aware and cross-referencing
    # (GraphConfig.scala:59-65: tz = timezoneIds.head resolves BEFORE
    # Strings.timeRange): absolute date literals parse in the REQUEST
    # timezone, `e` may reference an absolute `s` (`e=s+6h`), a
    # custom-relative `s` references `e`, and both-relative is a client
    # error.  Defaults per atlas-eval reference.conf: s=e-3h, e=now —
    # `now` (and any unknown named ref) resolves to the default window
    # end, this engine's deterministic stand-in for the wall clock.
    from .util.strings import graph_time_range

    tz = qs.get("tz", ["UTC"])[0]
    now = _dt.datetime.fromtimestamp(d_end, tz=_dt.timezone.utc)
    start, end = graph_time_range(
        qs.get("s", ["e-3h"])[0], qs.get("e", ["now"])[0], tz, now=now
    )
    # effective step: one datapoint per pixel within the width budget,
    # capped at max-datapoints=1440 (GraphConfig.stepSize).  The UNCLAMPED
    # `w` participates (GraphConstants.validate clamps at render time,
    # after the step is fixed), so w=99999 still budgets 1440 points.
    # Non-positive w is a client error for EVERY format, like
    # _validate_image_dims — clamping silently coarsened json/csv steps.
    try:
        width = int(qs.get("w", ["700"])[0])
    except (TypeError, ValueError):
        width = 700
    if width <= 0:
        raise ValueError(f"w must be positive (got {width})")
    step = step_util.compute(
        step * 1000, min(MAX_DATAPOINTS, width), start * 1000, end * 1000
    ) // 1000
    start_f = (start // step) * step
    end_f = (end // step) * step
    # end is exclusive; both instants flooring to the same cell would
    # give an empty window — the reference extends the window BACKWARD
    # one step (FetchRequestSource.scala:164-169: adjustedStart =
    # rs - step when rs == re), serving [end_f - step, end_f).
    if end_f <= start_f:
        start_f, end_f = end_f - step, end_f
    return EvalContext(start_f, end_f, step)


def _validate_image_dims(qs: dict[str, list[str]]) -> tuple[int, int, list[str]]:
    """Clamp `w`/`h`/`zoom` per GraphConstants.validate:41-58 — caps
    w<=2000, h<=1000, zoom<=2.0, emitting the reference's warning strings
    in ITS order (height, width, zoom); the final image scales by the
    clamped zoom (DefaultGraphEngine applies zoom after clamping, so the
    rendered width may exceed MaxWidth).  Non-positive sizes are client
    errors, never clamped (GrapherSuite)."""
    warnings: list[str] = []
    try:
        zoom = float(qs.get("zoom", ["1"])[0])
    except (TypeError, ValueError):
        zoom = 1.0

    def _dim(name: str, default: int) -> int:
        try:
            v = int(qs.get(name, [default])[0])
        except (TypeError, ValueError):
            v = default
        if v <= 0:
            raise ValueError(f"{name} must be positive (got {v})")
        return v

    w, h = _dim("w", 700), _dim("h", 300)
    if h > 1000:
        warnings.append("Restricted graph height to 1000.")
        h = 1000
    if w > 2000:
        warnings.append("Restricted graph width to 2000.")
        w = 2000
    if zoom > 2.0:
        warnings.append("Restricted zoom to 2.0.")
        zoom = 2.0
    zoom = max(0.1, zoom)
    return max(64, int(w * zoom)), max(64, int(h * zoom)), warnings


def _clamped_canvas_dims(
    qs: dict[str, list[str]]
) -> tuple[int, int, float, list[str]]:
    """Like `_validate_image_dims` but returns the PRE-zoom clamped
    canvas dims plus the clamped zoom separately — the quantities
    GraphDef records (width/height/zoom as independent fields, JsonCodec
    graph-metadata).  Parsed directly rather than divided back out of
    the scaled image dims, so the 64px image floor can't distort them;
    the validator still runs first for the clamp notices and the
    non-positive-size client error."""
    _, _, warnings = _validate_image_dims(qs)

    def _dim(name: str, default: int, cap: int) -> int:
        try:
            v = int(qs.get(name, [default])[0])
        except (TypeError, ValueError):
            v = default
        return min(v, cap)

    try:
        zoom = float(qs.get("zoom", ["1"])[0])
    except (TypeError, ValueError):
        zoom = 1.0
    return (
        _dim("w", 700, 2000),
        _dim("h", 300, 1000),
        max(0.1, min(2.0, zoom)),
        warnings,
    )


class Engine:
    """Evaluation engine bound to a datapoint source."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        source: DatapointSource | None = None,
        default_window: tuple[int, int] = (EVENTS_START, EVENTS_END),
        catalog=None,
        host_rewrite: dict | None = None,
        png_metadata: bool = False,
    ):
        self.spark = spark
        # embed the graph URI as PNG text metadata so the query is
        # recoverable from a saved image; off by default like the
        # reference's png-metadata-enabled (reference.conf:168,
        # GraphConfig.scala:155)
        self.png_metadata = png_metadata
        # retained so the HTTP layer can rebind the engine to a cloned
        # session (render-pool parallelism cap); None for custom sources
        self.sf_dir = sf_dir
        # config-driven host -> restriction-query rewrite for multi-DNS-view
        # deployments (HostRewriter.scala:40-67; reference.conf:179-183
        # default matches no host)
        from .util.host_rewriter import HostRewriter

        self.host_rewriter = HostRewriter(host_rewrite)
        # whether the source is the default sf_dir derivation: only then
        # can the HTTP layer clone this engine onto a new session (a
        # custom source's frames stay bound to THEIR session, so a clone
        # would silently serve the default events source instead)
        self.default_source = source is None
        if source is None:
            if sf_dir is None:
                raise ValueError("need sf_dir or source")
            source = events_datapoints(spark, sf_dir)
        self.source = source
        self.default_window = default_window
        # a path-configured catalog can be re-read in a cloned session;
        # a DataFrame catalog cannot
        self.catalog_path = catalog if isinstance(catalog, str) else None
        # series catalog for the tags API (sources/catalog.py): a
        # DataFrame, or a path to a maintained catalog table.  When set,
        # metadata requests scan series-cardinality rows instead of the
        # fact table (RoaringTagIndex parity at scale); when None, tags()
        # falls back to the distinct scan (fine for ad-hoc sources).
        if isinstance(catalog, str):
            from .sources.catalog import read_series_catalog

            catalog = read_series_catalog(spark, catalog)
        self._catalog_df = catalog

    # ------------------------------------------------------------- parsing

    def _ctx_from_params(self, qs: dict[str, list[str]]) -> EvalContext:
        return resolve_context(qs, self.source.step, self.default_window)

    def expr(self, q: str, features: str = "stable") -> list[E.StyleExpr]:
        """Parse without evaluating (ExprApi parity).  `features=unstable`
        (URI param) enables words marked unstable; the default rejects
        them (Interpreter.scala:44-47)."""
        return parse_asl(q, step=self.source.step, features=features)

    def normalize(self, q: str, vocab: str | None = None) -> list[str]:
        """Canonical normalized expression strings (ExprApi.scala:305-325
        via ExprNormalizer.scala): legend vars to `$(var)`, `:stat` inside
        filters to `:stat-*` placeholders, every leaf query simplified +
        clause-sorted by key importance with redundant disjuncts removed,
        and explicit `,:const`/`,:line` suffixes stripped from the
        rendered string.  `vocab` scopes parsing to a layered vocabulary
        (ExprApi.scala:47-73)."""
        from .model.normalizer import ExprNormalizer

        norm = ExprNormalizer()
        return [
            norm.normalize_to_string(se)
            for se in parse_asl(q, step=self.source.step, vocab=vocab)
        ]

    def queries(self, q: str, vocab: str | None = None) -> list[str]:
        """Distinct data queries used by an expression, sorted
        (ExprApi.scala:184-206 /api/v1/expr/queries) — for UIs exploring
        the tag space behind a graph expression."""
        seen: set[str] = set()

        def collect(qq):
            seen.add(qq.display())
            return qq

        for se in parse_asl(q, step=self.source.step, vocab=vocab):
            se.rewrite_queries(collect)
        return sorted(seen)

    def strip(
        self, q: str, keys: set[str], vocabs: tuple[str, ...] = ()
    ) -> list[str]:
        """Strip query clauses mentioning any key in `keys`
        (ExprApi.scala:208-238 /api/v1/expr/strip): the clause becomes
        :true and is then simplified away with OR-ignore semantics.
        `vocabs` (the repeated `r` parameter) additionally strips whole
        vocabulary layers (ExprApi.scala:238-261 stripVocabulary):
        `filter` unwraps :stat/:filter/:topk-family nodes, `style`
        unwraps the top-level style settings; anything else errors."""
        from .model import query as Qm

        def strip_q(qq: Qm.Query) -> Qm.Query:
            if isinstance(qq, Qm.AndQuery):
                return Qm.AndQuery(strip_q(qq.q1), strip_q(qq.q2))
            if isinstance(qq, Qm.OrQuery):
                return Qm.OrQuery(strip_q(qq.q1), strip_q(qq.q2))
            if isinstance(qq, Qm.NotQuery):
                return Qm.NotQuery(strip_q(qq.q))
            if isinstance(qq, Qm.KeyQuery) and qq.k in keys:
                return Qm.TRUE
            return qq

        def strip_filter_node(e):
            if isinstance(e, (E.StatExpr, E.TopKExpr, E.FilterOpExpr)):
                return e.expr
            return e

        def strip_vocabs(e):
            for v in vocabs:
                if v == "filter":
                    e = E.rewrite_tree(e, strip_filter_node)
                elif v == "style":
                    e = e.expr if isinstance(e, E.StyleExpr) else e
                else:
                    raise ValueError(f"vocabulary '{v}' not supported")
            return e

        out = []
        for se in parse_asl(q, step=self.source.step):
            stripped = se.rewrite_queries(
                lambda qq: Qm.simplify(strip_q(qq), ignore=True)
            )
            out.append(strip_vocabs(stripped).display())
        return out

    def rewrite(self, q: str) -> list[str]:
        """Phase out the deprecated list-form style offset
        (ExprApi.scala:330-385 /api/v1/expr/rewrite): no offsets -> the
        canonical display; a single zero offset -> setting removed; a
        single non-zero offset -> the data-variant `dur,:offset`;
        multiple offsets -> the base expression bound to a `QueryN`
        variable and one `:get`(+`:offset`) per duration.  Durations are
        re-rendered canonically via `duration_to_string`
        (Strings.toString(d), e.g. `120s` -> `2m`), matching the
        reference's migrated output."""
        out = []
        for i, se in enumerate(parse_asl(q, step=self.source.step)):
            out.append(self._rewrite_offset(se, i))
        return out

    def _rewrite_offset(self, se, i: int) -> str:
        s = se.settings_dict() if isinstance(se, E.StyleExpr) else {}
        off = s.get("offset", "")
        if not (off.startswith("(,") and off.endswith(",)")):
            return se.display()
        durs = [parse_duration(t) for t in off[2:-2].split(",") if t]
        if not durs:
            # Nil offsets: expression returned unchanged
            # (ExprApi.scala:360-363 rewriteOffset)
            return se.display()
        base = E.StyleExpr(
            se.expr, tuple((k, v) for k, v in se.settings if k != "offset")
        )
        if len(durs) == 1:
            d = durs[0]
            if d == 0:
                return base.display()
            return f"{base.display()},{duration_to_string(d)},:offset"
        var = f"Query{i}"
        gets = ",".join(
            f"{var},:get"
            if d == 0
            else f"{var},:get,{duration_to_string(d)},:offset"
            for d in durs
        )
        return f"{var},{base.display()},:set,{gets}"

    def complete(self, q: str, vocab: str | None = None) -> list[dict]:
        """Candidate next words for the program's current stack
        (ExprApi.scala:160-182 /api/v1/expr/complete): a word is offered
        when one of its overloads matches AND actually executes, minus
        the reference's excluded-words list (always-matching stack words
        and deprecated spellings, reference.conf expr.complete).  Each
        candidate is the reference's descriptor object — {name,
        signature, description} (ExprApi.scala:175-179), signatures in
        the `inputs -- outputs` stack-effect convention.  With `vocab`,
        both the parse and the candidate pool are scoped to that layered
        vocabulary."""
        from .stacklang.interpreter import Context, split_and_trim
        from .stacklang.vocab import (
            WORDS,
            interpreter_for_vocab,
            words_for_vocab,
        )

        interp = interpreter_for_vocab(vocab, self.source.step)
        pool = WORDS if vocab is None else words_for_vocab(vocab)
        base = Context(interp)
        interp.execute_program(split_and_trim(q), base)
        from .lsp import GLOSSARY

        out = []
        for name in sorted(
            {w.name for w in pool} - EXCLUDED_COMPLETE_WORDS
        ):
            trial = Context(
                interp, stack=list(base.stack), vars=dict(base.vars),
                frozen=list(base.frozen), initial_vars=dict(base.initial_vars),
            )
            try:
                interp.execute_word(name, trial)
            except Exception:  # noqa: BLE001 — non-matching overloads
                continue
            doc = GLOSSARY.get(name, {})
            out.append(
                {
                    "name": name,
                    "signature": doc.get("signature", ""),
                    "description": doc.get("summary", ""),
                }
            )
        return out

    def debug(
        self, q: str, features: str = "stable", vocab: str | None = None
    ) -> list[dict]:
        """Token-by-token execution trace (ExprApi.scala:137-152
        /api/v1/expr/debug): the INITIAL state (full remaining program,
        empty stack — Interpreter.debug includes Step(program, context)
        itself, Interpreter.scala:159-170) followed by the state after
        each step, exprs rendered via their canonical display.  Unstable
        words fail the trace unless `features=unstable`.  The final stack
        is ALWAYS verified against the vocabulary's result contract
        (verifyStackContents, ExprApi.scala:94-123 — the reference
        verifies with the graph vocabulary when none is given, so
        trailing garbage like `...,:legend,foo` is a client error); an
        explicit `vocab` scopes both the interpreter and the contract to
        that layer."""
        from .model import query as Qm
        from .stacklang.interpreter import Context, split_and_trim
        from .stacklang.vocab import interpreter_for_vocab

        def disp(v) -> str:
            if isinstance(v, (E.TimeSeriesExpr, Qm.Query)):
                return v.display()
            return str(v)

        interp = interpreter_for_vocab(vocab, self.source.step)
        ctx = Context(interp, features=features)
        tokens = split_and_trim(q)
        steps = [
            {
                "program": list(tokens),
                "context": {"stack": [], "variables": {}},
            }
        ]
        i = 0
        while i < len(tokens):
            t = tokens[i]
            if t == "(":
                lst, i = interp._collect_list(tokens, i + 1)
                ctx.push(lst)
            elif t.startswith(":"):
                interp.execute_word(t[1:], ctx)
                i += 1
            else:
                ctx.push(t)
                i += 1
            steps.append(
                {
                    "program": list(tokens[i:]),
                    "context": {
                        "stack": [disp(x) for x in reversed(ctx.stack)],
                        "variables": {k: disp(v) for k, v in ctx.vars.items()},
                    },
                }
            )
        # the reference verifies unconditionally — the trace always has at
        # least the initial step (Interpreter.scala:159-170), so an empty
        # program under a non-std contract is "stack is empty"
        _verify_stack_contents(vocab or "style", ctx.stack)
        return steps

    # ---------------------------------------------------------------- graph

    def graph(self, uri: str, collect_stats: bool = False) -> GraphResult:
        parsed = urlparse(uri)
        qs = parse_qs(parsed.query)
        if "q" not in qs:
            raise ValueError("missing q parameter")
        ctx = self._ctx_from_params(qs)
        # repeated tz params -> GraphDef.timezones (Grapher.scala:169-171):
        # the FIRST zone wins for expression semantics (`tz` interpreter
        # var, used by :time-span); every zone gets its own time-axis row
        # in the rendered chart
        tzs = qs.get("tz", ["UTC"])
        features = qs.get("features", ["stable"])[0]
        exprs = parse_asl(
            qs["q"][0], step=ctx.step, vars={"tz": tzs[0]}, features=features
        )
        # global common query (`cq` param, Grapher.scala:163-168): ANDed
        # onto every leaf query of every expression, across freeze (unlike
        # the `:cq` word, which exempts frozen parts)
        cq_raw = qs.get("cq", [None])[0]
        if cq_raw:
            from .model import query as _Q
            from .stacklang.interpreter import Context, split_and_trim
            from .stacklang.vocab import default_interpreter

            interp = default_interpreter(ctx.step)
            cctx = Context(interp)
            interp.execute_program(split_and_trim(cq_raw), cctx)
            if len(cctx.stack) != 1 or not isinstance(cctx.stack[0], _Q.Query):
                raise ValueError("cq must be a single query expression")
            cquery = cctx.stack[0]
            exprs = [
                se.rewrite_queries(
                    lambda q: _Q.simplify(_Q.AndQuery(q, cquery))
                )
                for se in exprs
            ]
        # host-view restriction (Grapher.scala rewriteBasedOnHost): when the
        # graph URI is absolute, its authority host is matched against the
        # configured pattern and `key,$1,:eq` is ANDed onto every expression
        if parsed.hostname:
            exprs = self.host_rewriter.rewrite(parsed.hostname, exprs)
        import time as _time

        t_fetch0 = _time.perf_counter()
        # CollectorStats accounting only when the caller's output format
        # emits it (render() enables for json/std.json/v2.json): the
        # CollectMetrics node costs ~20% wall (and the HLL series
        # estimate more), which the png/csv dashboard hot path must not
        # pay for metadata it never writes
        ev = Evaluator(self.source, ctx, collect_stats=collect_stats)

        # simple legends (Grapher.scala:184-188, default-enabled like
        # simple-legends-enabled): after per-offset expansion, derive the
        # shortest distinguishing legend for lines without an explicit one
        pairs = [
            (se2, off)
            for se in exprs
            for se2, off in self._expand_offsets(se)
        ]
        from .model.simple_legends import generate as _simple_legends

        styled = _simple_legends(
            [se2 for se2, _ in pairs], [bool(off) for _, off in pairs]
        )

        from .model.simple_legends import expr_offset
        from .util.strings import duration_to_string

        lines: list[GraphLine] = []
        try:
            for (se2, off_label), se3 in zip(pairs, styled):
                rf = ev.eval(se3)
                legend_fmt = (
                    se3.settings_dict().get("legend")
                    if isinstance(se3, E.StyleExpr)
                    else None
                )
                # inline `dur,:offset` lines carry the atlas.offset tag too
                # (the reference tags every shifted data expr), so legends
                # referencing $(atlas.offset) resolve on both offset forms
                inline_off = expr_offset(se3)
                if not off_label and inline_off > 0:
                    off_label = duration_to_string(inline_off)
                for ln in self._collect_lines(se3, rf, ctx):
                    if off_label:
                        ln.tags["atlas.offset"] = off_label
                        if legend_fmt is not None:
                            # re-substitute now that atlas.offset exists; an
                            # explicit legend never gets the automatic
                            # " (offset=)" suffix (StyleExpr.scala:47-62)
                            ln.label = _legend(legend_fmt, ln.tags)
                        else:
                            ln.label += f" (offset={off_label})"
                    lines.append(ln)
        finally:
            # every line is collected above — drop the evaluator's
            # shared-subtree caches before the (collect-free) format work
            ev.release()
        # axis_per_line=1: every line gets its own y-axis (ImageFlags.
        # axisPerLine), capped at the renderer's 5 axes
        if qs.get("axis_per_line", [None])[0] == "1":
            for i, ln in enumerate(lines):
                ln.settings["axis"] = str(min(i, 4))

        # axis-level line sort (Grapher.scala:450,480-525): the URL sort
        # applies WITHIN each axis's line group (`sort.N`/`order.N` with
        # getAxisParam fallback to the unsuffixed value), by legend or a
        # legend stat; `order=desc` flips (and implies sort=legend when
        # alone).  URL sort takes precedence over expression-level :sort.
        # When sorting, plots assemble in axis-id order like the
        # reference's plotExprs.sortWith; with no sort param anywhere the
        # expression order is preserved untouched.
        def _ax_param(name: str, aid: int) -> str | None:
            v = qs.get(f"{name}.{aid}", [None])[0]
            return v if v is not None else qs.get(name, [None])[0]

        sort_warnings: list[str] = []
        if any(
            k in ("sort", "order") or k.startswith(("sort.", "order."))
            for k in qs
        ):
            def _stat(ln: GraphLine, mode: str):
                # SummaryStats counts only non-NaN samples, so an
                # all-NaN line is EMPTY for every stat mode
                vals = _finite_vals(ln.data)
                if mode == "legend":
                    return ln.label
                if not vals:
                    # SummaryStats.empty has count=0 (a real number) while
                    # min/max/avg/total/last are NaN — so sort=count places
                    # empty lines FIRST ascending; None (NaN-last) only for
                    # the other stats (Grapher.scala:509-535 + SummaryStats)
                    return 0.0 if mode == "count" else None
                return {
                    "min": min(vals),
                    "max": max(vals),
                    "avg": sum(vals) / len(vals),
                    "count": float(len(vals)),
                    "total": sum(vals),
                    "last": vals[-1],
                }[mode]

            groups: dict[int, list[GraphLine]] = {}
            for ln in lines:
                try:
                    aid = int((ln.settings or {}).get("axis", 0) or 0)
                except (TypeError, ValueError):
                    aid = 0
                groups.setdefault(aid, []).append(ln)
            lines = []
            for aid in sorted(groups):
                sort_by = _ax_param("sort", aid)
                desc = _ax_param("order", aid) == "desc"
                if desc and sort_by is None:
                    sort_by = "legend"
                g = groups[aid]
                if sort_by is not None:
                    if sort_by in (
                        "legend", "min", "max", "avg", "count", "total", "last"
                    ):
                        mode = sort_by
                    else:
                        # unknown mode -> warn + legend fallback
                        # (Grapher.scala:509-511)
                        sort_warnings.append(
                            f"Invalid sort mode '{sort_by}'. "
                            "Using default of 'legend'."
                        )
                        mode = "legend"
                    if mode == "legend":
                        g = sorted(g, key=lambda ln: ln.label, reverse=desc)
                    else:
                        # NaN legendStats (lines with no data) sort LAST in
                        # both directions (Grapher.compare: JDouble NaN
                        # semantics, atlas#586) — sort only the valued
                        # lines, then append the empties in input order
                        valued = [
                            ln for ln in g if _stat(ln, mode) is not None
                        ]
                        empty = [ln for ln in g if _stat(ln, mode) is None]
                        g = sorted(
                            valued, key=lambda ln: _stat(ln, mode),
                            reverse=desc,
                        ) + empty
                lines.extend(g)

        # y-axis scale: prefer `scale`, fall back to legacy boolean `o`
        # (Grapher.scala:222-232); `stack=1` stacks the axis's lines
        scale = qs.get("scale", [None])[0] or (
            "log" if qs.get("o", [None])[0] == "1" else "linear"
        )
        axis_stack = qs.get("stack", [None])[0] == "1"

        def _bound(name: str) -> float | str | None:
            raw = qs.get(name, [None])[0]
            if raw is None or raw in ("auto-style",):
                return None
            if raw == "auto-data":
                return "auto-data"
            try:
                return float(raw)
            except ValueError:
                return None

        # legend flags (Grapher.scala:147-149): on by default, stats on by
        # default, only_graph suppresses everything outside the plot area
        only_graph = qs.get("only_graph", [None])[0] == "1"
        show_legend = not only_graph and qs.get("no_legend", [None])[0] != "1"
        show_stats = qs.get("no_legend_stats", [None])[0] != "1"
        # layout mode (Layout.create, Grapher.scala:153) — unknown names
        # are client errors like the reference's IllegalArgumentException
        layout = qs.get("layout", ["canvas"])[0]
        if layout not in ("canvas", "image", "iw", "ih"):
            raise ValueError(f"unknown layout: {layout}")
        # rendering hints: comma set, trimmed, empties dropped
        # (Grapher.processHints)
        hints = frozenset(
            h.strip()
            for raw in qs.get("hints", [])
            for h in raw.split(",")
            if h.strip()
        )
        # CollectorStats-style accounting via a bounded follow-up
        # aggregation per DataExpr (see Evaluator.input_stats for why
        # this is NOT an Observation); a generator-only graph has no
        # scans, leaving stats unknown — CollectorStats.unknown
        load_time_ms = int((_time.perf_counter() - t_fetch0) * 1000)
        stats = None
        inp = ev.input_stats() if collect_stats else None
        if inp is not None:
            n_steps = (ctx.end - ctx.start) // ctx.step
            stats = {
                "inputLines": inp["lines"],
                "inputDatapoints": inp["datapoints"],
                "outputLines": len(lines),
                "outputDatapoints": len(lines) * n_steps,
            }
        return GraphResult(
            ctx.start,
            ctx.end,
            ctx.step,
            lines,
            timezones=tzs,
            scale=scale,
            axis_stack=axis_stack,
            upper=_bound("u"),
            lower=_bound("l"),
            show_legend=show_legend,
            show_legend_stats=show_stats,
            theme=qs.get("theme", ["light"])[0],
            palette=qs.get("palette", [None])[0],
            title=qs.get("title", [None])[0] or None,
            ylabel=qs.get("ylabel", [None])[0] or None,
            vision=qs.get("vision", ["normal"])[0],
            tick_labels=qs.get("tick_labels", ["decimal"])[0],
            axes=self._axis_overrides(qs),
            layout=layout,
            only_graph=only_graph,
            hints=hints,
            warnings=sort_warnings,
            stats=stats,
            load_time_ms=load_time_ms,
        )

    @staticmethod
    def _axis_overrides(qs: dict) -> dict[int, dict]:
        """Per-axis `.N`-suffixed params (Grapher newAxis with id): only
        the keys present are recorded; the renderer falls back to the
        unsuffixed value for the rest."""
        axes: dict[int, dict] = {}
        for aid in range(5):
            sub: dict = {}
            sc = qs.get(f"scale.{aid}", [None])[0] or (
                "log" if qs.get(f"o.{aid}", [None])[0] == "1" else None
            )
            if sc:
                sub["scale"] = sc
            for pname, key in (("u", "upper"), ("l", "lower")):
                raw = qs.get(f"{pname}.{aid}", [None])[0]
                if raw is None:
                    continue
                if raw == "auto-data":
                    sub[key] = "auto-data"
                else:
                    try:
                        sub[key] = float(raw)
                    except ValueError:
                        pass
            if qs.get(f"stack.{aid}", [None])[0] is not None:
                sub["stack"] = qs[f"stack.{aid}"][0] == "1"
            tl = qs.get(f"tick_labels.{aid}", [None])[0]
            if tl:
                sub["tick_labels"] = tl
            # ylabel.N (getAxisParam fallback to the unsuffixed ylabel)
            yl = qs.get(f"ylabel.{aid}", [None])[0] or qs.get("ylabel", [None])[0]
            if yl:
                sub["ylabel"] = yl
            # palette.N has NO unsuffixed fallback (Grapher newAxis reads
            # params.get(s"palette.$id") directly): absent means the
            # axis's lines draw from the global palette iterator
            pal = qs.get(f"palette.{aid}", [None])[0]
            if pal:
                sub["palette"] = pal
            # heatmap color config (Grapher newAxis heatmap* via
            # getAxisParam, so the unsuffixed form is the fallback)
            for pname, key in (
                ("heatmap_scale", "heatmap_scale"),
                ("heatmap_palette", "heatmap_palette"),
                ("heatmap_label", "heatmap_label"),
            ):
                v = qs.get(f"{pname}.{aid}", [None])[0] or qs.get(pname, [None])[0]
                if v:
                    sub[key] = v
            for pname, key in (("heatmap_u", "heatmap_u"), ("heatmap_l", "heatmap_l")):
                raw = qs.get(f"{pname}.{aid}", [None])[0] or qs.get(pname, [None])[0]
                if raw is None:
                    continue
                try:
                    sub[key] = float(raw)
                except ValueError:
                    pass
            if sub:
                axes[aid] = sub
        return axes

    def graph_png(
        self, uri: str, width: int = 700, height: int = 300, warnings=()
    ) -> bytes:
        """format=png rendering — a minimal dependency-free chart (see
        atlas_spark/chart.py; not atlas-chart pixel parity).  `warnings`
        carries size/zoom clamp notices from the URL layer
        (GraphConstants.validate) into the render."""
        from .chart import render_png

        result = self.graph(uri)
        if warnings:
            result.warnings.extend(warnings)
        return render_png(
            result, width, height,
            source=uri if self.png_metadata else None,
        )

    def render(self, uri: str):
        """Dispatch on the `format` query param like the reference's graph
        engine registry (GraphEngine name -> output): json/std.json,
        v2.json, stats.json, csv, txt, png."""
        qs = parse_qs(urlparse(uri).query)
        fmt = qs.get("format", ["json"])[0]
        if fmt == "png":
            # `w`/`h` size the canvas or the image per the `layout` param
            # (Layout.java; default canvas), `zoom` scales both.  Clamps
            # follow GraphConstants.validate: w <= 2000, h <= 1000,
            # zoom <= 2.0, each over-limit value clamped WITH a notice
            # (the reference's exact warning strings); canvas floor 64
            # (MinCanvasWidth/Height) is silent like TimeSeriesGraph's.
            width, height, warnings = _validate_image_dims(qs)
            return self.graph_png(uri, width=width, height=height,
                                  warnings=warnings)
        g = self.graph(uri, collect_stats=fmt in ("json", "std.json", "v2.json"))
        if fmt in ("json", "std.json"):
            return g.to_json()
        if fmt == "v2.json":
            # metadata carries the PRE-zoom canvas dims + zoom like
            # GraphDef; the embedded graph-image renders at the same
            # scaled size as the png engine; clamp notices join warnings
            width, height, zoom, warnings = _clamped_canvas_dims(qs)
            g.warnings = warnings + list(g.warnings)
            return g.to_v2_json(width=width, height=height, zoom=zoom)
        if fmt == "stats.json":
            return g.to_stats_json()
        if fmt == "csv":
            return g.to_csv()
        if fmt == "txt":
            return g.to_txt()
        raise ValueError(f"unknown graph format {fmt!r}")

    @staticmethod
    def _expand_offsets(se: E.StyleExpr):
        """Legacy list-offset: one evaluation per offset in the list
        (StyleExpr.scala:178-200 perOffset)."""
        s = se.settings_dict() if isinstance(se, E.StyleExpr) else {}
        off = s.get("offset", "")
        if not (off.startswith("(,") and off.endswith(",)")):
            return [(se, None)]
        from .stacklang.vocab import apply_offset

        out = []
        for tok in (t for t in off[2:-2].split(",") if t):
            d = parse_duration(tok)
            settings = tuple((k, v) for k, v in se.settings if k != "offset")
            out.append(
                (E.StyleExpr(apply_offset(se.expr, d), settings), tok if d else None)
            )
        return out

    def fetch(self, uri: str) -> DataFrame:
        """Data-only endpoint: returns the result DataFrame(s) unioned with
        a line-id column — stays distributed (no collect)."""
        parsed = urlparse(uri)
        qs = parse_qs(parsed.query)
        if "q" not in qs:
            raise ValueError("missing q parameter")
        ctx = self._ctx_from_params(qs)
        exprs = parse_asl(qs["q"][0], step=ctx.step)
        ev = Evaluator(self.source, ctx)
        outs = []
        from .util.caching import adopt_scoped
        for i, se in enumerate(exprs):
            rf = ev.eval(se)
            kc = rf.key_cols
            tags_col = (
                F.map_from_arrays(
                    F.array(*[F.lit(k) for k in (rf.keys or ())]),
                    F.array(*[F.col(c).cast("string") for c in kc]),
                )
                if kc
                else F.create_map()
            )
            outs.append(
                rf.df.select(
                    F.lit(i).alias("line_set"),
                    tags_col.alias("tags"),
                    "t",
                    "value",
                )
            )
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        # the result stays distributed (consumed after return): hand any
        # shared-subtree caches to the scoped drain instead of releasing
        adopt_scoped(ev.persisted)
        return out

    def fetch_sse(self, uri: str, chunk_steps: int = 60):
        """SSE-shaped chunked fetch (FetchRequestSource.scala:55-115): the
        time range is partitioned into chunks of `chunk_steps` steps; each
        chunk re-runs the batch planner over a window extended backwards by
        the expression's stateful lookback, so rolling/DES values at chunk
        boundaries equal the one-shot evaluation (EvalFlow state carry).

        Yields message dicts in stream order: one graph-metadata message,
        then per chunk one `timeseries` message per line, then a close
        message.  Driver memory per chunk is bounded by lines x
        chunk_steps, never the full range.  Unbounded-state ops
        (:integral, :cumulative-max, :des) replay at most 512 steps of
        history per chunk — exact for ranges up to that horizon.
        """
        from .streaming.evaluator import _max_lookback_steps

        parsed = urlparse(uri)
        qs = parse_qs(parsed.query)
        if "q" not in qs:
            raise ValueError("missing q parameter")
        ctx = self._ctx_from_params(qs)
        exprs = parse_asl(qs["q"][0], step=ctx.step)
        if not exprs:
            raise ValueError("empty expression")
        yield {
            "type": "graph-metadata",
            "startTime": ctx.start * 1000,
            "endTime": ctx.end * 1000,
            "step": ctx.step * 1000,
        }
        raw_lookback = max(
            _max_lookback_steps(se.expr if isinstance(se, E.StyleExpr) else se)
            for se in exprs
        )
        lookback = min(raw_lookback, 512)
        if raw_lookback > 512 and (ctx.end - ctx.start) // ctx.step > 512:
            # unbounded-state ops (:integral, :des, ...) replay at most 512
            # steps; surface the approximation instead of diverging silently
            yield {
                "type": "notice",
                "message": (
                    "stateful lookback clamped to 512 steps; chunked values "
                    "for unbounded-state operators are approximate beyond "
                    "that horizon"
                ),
                "lookbackSteps": lookback,
            }
        chunk = chunk_steps * ctx.step
        t0 = ctx.start
        while t0 < ctx.end:
            t1 = min(t0 + chunk, ctx.end)
            # evaluate with backward-extended context, emit only this
            # chunk's intervals (state warm-up replays the lookback);
            # never before the request start — stateful ops start cold
            # there in the one-shot evaluation too
            ectx = EvalContext(max(ctx.start, t0 - lookback * ctx.step), t1, ctx.step)
            ev = Evaluator(self.source, ectx)
            try:
                for i, se in enumerate(exprs):
                    for se2, _off in self._expand_offsets(se):
                        rf = ev.eval(se2)
                        for ln in self._collect_lines(se2, rf, ectx):
                            skip = (t0 - ectx.start) // ctx.step
                            yield {
                                "type": "timeseries",
                                "id": str(i),
                                "tags": ln.tags,
                                "label": ln.label,
                                "start": t0 * 1000,
                                "end": t1 * 1000,
                                "step": ctx.step * 1000,
                                "data": {
                                    "type": "array",
                                    "values": ln.data[skip : skip + (t1 - t0) // ctx.step],
                                },
                            }
            finally:
                ev.release()  # per-chunk caches die with the chunk
            t0 = t1
        yield {"type": "close"}

    # ----------------------------------------------------------------- tags

    def tags(
        self,
        q=None,
        key: str | None = None,
        offset: str = "",
        limit: int | None = None,
        verbose: bool = False,
    ) -> DataFrame:
        """Tag discovery (TagsApi.scala:87-176 parity).

        Modes: keys (no `key`, not verbose), values of one key, or verbose
        (key, value, count) tags where count is the number of distinct
        matching series.  `offset` resumes AFTER the given value ("k,v"
        form in verbose mode), `limit` caps the page; use
        `tags_next_offset` on the collected page to get the resume token.

        With a maintained series catalog (`catalog=` at construction, see
        `sources/catalog.py`) the scan below runs over series-cardinality
        rows, never the fact table; the Query filtering and counting code
        is identical either way because the catalog carries the same
        promoted tag columns.
        """
        from .plans.builder import query_to_column

        df = self._catalog_df if self._catalog_df is not None else self.source.df
        if q is not None:
            df = df.filter(query_to_column(q, self.source))
        series_cols = sorted(self.source.colmap.values())

        def page(frame: DataFrame, order: list[str]) -> DataFrame:
            out = frame.orderBy(*order)
            return out.limit(limit) if limit is not None else out

        if verbose:
            keys = [key] if key is not None else sorted(self.source.colmap)
            parts = []
            for k in keys:
                col = self.source.colmap.get(k)
                if col is None:
                    continue
                parts.append(
                    df.where(F.col(col).isNotNull())
                    .groupBy(F.col(col).alias("value"))
                    .agg(F.count_distinct(*[F.col(c) for c in series_cols]).alias("count"))
                    .select(F.lit(k).alias("key"), "value", "count")
                )
            if not parts:
                return self.spark.createDataFrame([], "key string, value string, count long")
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            if offset:
                ok, _, ov = offset.partition(",")
                out = out.filter(
                    (F.col("key") > ok) | ((F.col("key") == ok) & (F.col("value") > ov))
                )
            return page(out, ["key", "value"])
        if key is not None:
            col = self.source.colmap.get(key)
            if col is None:
                return self.spark.createDataFrame([], "value string")
            vals = (
                df.select(F.col(col).alias("value"))
                .where(F.col(col).isNotNull())
                .distinct()
            )
            if offset:
                vals = vals.filter(F.col("value") > offset)
            return page(vals, ["value"])
        keys_df = self.spark.createDataFrame(
            [(k,) for k in sorted(self.source.colmap)], "key string"
        )
        if offset:
            keys_df = keys_df.filter(F.col("key") > offset)
        return page(keys_df, ["key"])

    @staticmethod
    def tags_next_offset(rows, limit: int | None, verbose: bool = False) -> str | None:
        """Resume token for the next page (TagsApi.scala offsetString/
        offsetTag): None when the page was not full."""
        if limit is None or not rows or len(rows) < limit:
            return None
        last = rows[-1]
        if verbose:
            return f"{last['key']},{last['value']}"
        return last["value"] if "value" in last else last["key"]

    # ------------------------------------------------------------ internals

    def _collect_lines(
        self, se: E.StyleExpr, rf: ResultFrame, ctx: EvalContext
    ) -> list[GraphLine]:
        settings = se.settings_dict() if isinstance(se, E.StyleExpr) else {}
        kc = rf.key_cols
        keys = list(rf.keys or ())
        rows = rf.df.collect()
        by_line: dict[tuple, list[float | None]] = {}
        n = ctx.n_steps
        for r in rows:
            lk = tuple(r[c] for c in kc)
            arr = by_line.setdefault(lk, [None] * n)
            idx = (r["t"] - ctx.start) // ctx.step
            if 0 <= idx < n:
                v = r["value"]
                arr[idx] = None if v is None else float(v)
        lines = []
        for lk in sorted(by_line, key=repr):
            tags = dict(rf.static_tags)
            tags.update({k: v for k, v in zip(keys, lk) if v is not None})
            label = _legend(settings.get("legend"), tags) or _default_label(se, tags, keys, lk)
            lines.append(GraphLine(tags, label, by_line[lk], dict(settings)))
        if not lines and (rf.keys == () or rf.keys is None):
            # empty aggregate renders a NO_DATA line (TimeSeries.scala:34-54,
            # MemoryDatabase.scala:277-286)
            lines.append(GraphLine({"name": "NO_DATA"}, "NO DATA", [None] * n, dict(settings)))
        return lines


def _legend(fmt: str | None, tags: dict[str, str]) -> str | None:
    """`$(tag)` substitution (StyleExpr.scala:47-62): one grammar with
    expr normalization via the shared Strings.substitute port; a missing
    key renders the KEY itself (Strings.scala:428-430 getOrElse(k, k)),
    not the raw `$key` text."""
    if not fmt:
        return None
    from .util.strings import substitute

    return substitute(fmt, lambda k: tags.get(k, k))


def _default_label(se, tags: dict[str, str], keys: list[str], lk: tuple) -> str:
    if keys:
        return " ".join(str(v) for v in lk)
    if tags:
        return tags.get("name", next(iter(tags.values())))
    expr = se.expr if isinstance(se, E.StyleExpr) else se
    return expr.display()


# ------------------------------------------------------------ driver gates

# CollectorStats explain-block driver gate (VERDICT r15 #2): render a
# json graph with stats collection on and pin every deterministic
# explain field against a DuckDB oracle computing the same counts from
# the same resolved context (dataFetchTime is wall clock — excluded).
# `name,click,:eq,:sum` takes the raw_ranged scan (sum-of-sums), so
# inputDatapoints counts RAW event rows under the predicate inside the
# window and inputLines the exact distinct (name, bucket) series among
# them; output/graph lines are the `:by` groups, datapoints = lines *
# n_steps on the [start, end) grid (api.py::to_json explain block).
EXPLAIN_GATE_Q = "name,click,:eq,:sum,(,bucket,),:by"
# explicit absolute s/e spanning the whole events window (720 hourly
# cells) — the URI default is e-3h, which would gate only 3 cells — and
# a canvas wide enough (w=1000 >= 720) that auto-step keeps the 1h grid
EXPLAIN_GATE_WINDOW = "s=2024-01-01T00:00:00Z&e=2024-01-31T00:00:00Z&w=1000"


def explain_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row frame of the json explain block's deterministic fields,
    produced by the REAL render path (Engine.graph with collect_stats →
    GraphResult.to_json), not a re-computation."""
    eng = Engine(spark, sf_dir)
    payload = eng.graph(
        f"/api/v1/graph?q={EXPLAIN_GATE_Q}&{EXPLAIN_GATE_WINDOW}&format=json",
        collect_stats=True,
    ).to_json()
    ex = payload["explain"]
    row = {
        "graph_datapoints": int(ex["graphDatapoints"]),
        "graph_lines": int(ex["graphLines"]),
        "input_datapoints": int(ex["inputDatapoints"]),
        "input_lines": int(ex["inputLines"]),
        "intermediate_datapoints": int(ex["intermediateDatapoints"]),
        "intermediate_lines": int(ex["intermediateLines"]),
    }
    return spark.createDataFrame(
        [row],
        "graph_datapoints long, graph_lines long, input_datapoints long, "
        "input_lines long, intermediate_datapoints long, "
        "intermediate_lines long",
    )


# Same counts from the raw events table over the default window: the
# scan frame is project(range(start, end)) filtered by the predicate,
# BEFORE the per-series step rollup (raw_ranged), so datapoints = raw
# rows and lines = exact distinct (event_type, bucket) pairs; each
# surviving `:by` group contributes one line x 720 hourly cells.
EXPLAIN_STATS_SQL = f"""
WITH scan AS (
  SELECT event_type, 'u' || CAST(user_id % 8 AS VARCHAR) AS bucket
  FROM events
  WHERE epoch_ns(ts) // 1000000000 >= {EVENTS_START}
    AND epoch_ns(ts) // 1000000000 < {EVENTS_END}
    AND event_type = 'click'
)
SELECT
  CAST(count(DISTINCT bucket) * {(EVENTS_END - EVENTS_START) // 3600} AS BIGINT)
    AS graph_datapoints,
  CAST(count(DISTINCT bucket) AS BIGINT) AS graph_lines,
  CAST(count(*) AS BIGINT) AS input_datapoints,
  CAST(count(DISTINCT event_type || '|' || bucket) AS BIGINT) AS input_lines,
  CAST(count(DISTINCT bucket) * {(EVENTS_END - EVENTS_START) // 3600} AS BIGINT)
    AS intermediate_datapoints,
  CAST(count(DISTINCT bucket) AS BIGINT) AS intermediate_lines
FROM scan
"""
