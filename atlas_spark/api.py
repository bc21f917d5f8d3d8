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

from dataclasses import dataclass
from typing import Any
from urllib.parse import parse_qs, urlparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .model import expr as E
from .plans.builder import Evaluator, ResultFrame
from .plans.context import EvalContext
from .sources.datapoints import DatapointSource, EVENTS_END, EVENTS_START, events_datapoints
from .stacklang.vocab import parse as parse_asl
from .util.strings import parse_duration, parse_time_ref


@dataclass
class GraphLine:
    tags: dict[str, str]
    label: str
    data: list[float | None]  # one value per step, None = no data


@dataclass
class GraphResult:
    start: int
    end: int
    step: int
    lines: list[GraphLine]

    def to_json(self) -> dict[str, Any]:
        """std.json-style payload (one message per line)."""
        return {
            "start": self.start * 1000,
            "end": self.end * 1000,
            "step": self.step * 1000,
            "legend": [ln.label for ln in self.lines],
            "metrics": [ln.tags for ln in self.lines],
            "values": [ln.data for ln in self.lines],
        }

    def to_csv(self) -> str:
        header = ["timestamp"] + [ln.label for ln in self.lines]
        rows = [",".join(header)]
        for i in range((self.end - self.start) // self.step):
            t = self.start + i * self.step
            vals = [
                "" if ln.data[i] is None else repr(ln.data[i]) for ln in self.lines
            ]
            rows.append(",".join([str(t)] + vals))
        return "\n".join(rows)


class Engine:
    """Evaluation engine bound to a datapoint source."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        source: DatapointSource | None = None,
        default_window: tuple[int, int] = (EVENTS_START, EVENTS_END),
    ):
        self.spark = spark
        if source is None:
            if sf_dir is None:
                raise ValueError("need sf_dir or source")
            source = events_datapoints(spark, sf_dir)
        self.source = source
        self.default_window = default_window

    # ------------------------------------------------------------- parsing

    def _ctx_from_params(self, qs: dict[str, list[str]]) -> EvalContext:
        step = self.source.step
        if "step" in qs:
            step = parse_duration(qs["step"][0])
            step = max(self.source.step, (step // self.source.step) * self.source.step)
        d_start, d_end = self.default_window
        ref = EvalContext(d_start, d_end, step)
        end = parse_time_ref(qs.get("e", ["e"])[0], ref)
        # `s` defaults to e-3h in the reference (atlas-eval reference.conf:74)
        sref = EvalContext(d_start, max(end, d_start + step), step)
        start = parse_time_ref(qs.get("s", ["e-3h"])[0], sref)
        start = (start // step) * step
        end = (end // step) * step
        if end <= start:
            raise ValueError(f"end ({end}) must be after start ({start})")
        return EvalContext(start, end, step)

    def expr(self, q: str) -> list[E.StyleExpr]:
        """Parse without evaluating (ExprApi parity)."""
        return parse_asl(q, step=self.source.step)

    def normalize(self, q: str) -> list[str]:
        """Canonical normalized expression strings (ExprApi.scala:305-325):
        parse, simplify leaf queries to canonical simplified form, emit the
        canonical display of each expression."""
        from .model import query as Qm

        out = []
        for se in parse_asl(q, step=self.source.step):
            norm = se.rewrite_queries(Qm.simplify)
            out.append(norm.display())
        return out

    # ---------------------------------------------------------------- graph

    def graph(self, uri: str) -> GraphResult:
        parsed = urlparse(uri)
        qs = parse_qs(parsed.query)
        if "q" not in qs:
            raise ValueError("missing q parameter")
        ctx = self._ctx_from_params(qs)
        # tz param -> interpreter variable; first zone wins for expression
        # semantics (Grapher.scala:169-171; extra zones are axis-rendering
        # only, a chart concern out of scope here)
        tz = qs.get("tz", ["UTC"])[0]
        exprs = parse_asl(qs["q"][0], step=ctx.step, vars={"tz": tz})
        ev = Evaluator(self.source, ctx)

        lines: list[GraphLine] = []
        for se in exprs:
            for se2, off_label in self._expand_offsets(se):
                rf = ev.eval(se2)
                for ln in self._collect_lines(se2, rf, ctx):
                    if off_label:
                        ln.tags["atlas.offset"] = off_label
                        ln.label += f" (offset={off_label})"
                    lines.append(ln)
        return GraphResult(ctx.start, ctx.end, ctx.step, lines)

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
        ctx = self._ctx_from_params(qs)
        exprs = parse_asl(qs["q"][0], step=ctx.step)
        ev = Evaluator(self.source, ctx)
        outs = []
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
        return out

    # ----------------------------------------------------------------- tags

    def tags(self, q=None, key: str | None = None) -> DataFrame:
        """Tag discovery (TagsApi parity): distinct keys, or distinct values
        of one key, over series matching the optional Query `q`."""
        from .plans.builder import query_to_column

        df = self.source.df
        if q is not None:
            df = df.filter(query_to_column(q, self.source))
        if key is not None:
            col = self.source.colmap.get(key)
            if col is None:
                return self.spark.createDataFrame([], "value string")
            return (
                df.select(F.col(col).alias("value"))
                .where(F.col(col).isNotNull())
                .distinct()
                .orderBy("value")
            )
        return self.spark.createDataFrame(
            [(k,) for k in sorted(self.source.colmap)], "key string"
        )

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
            lines.append(GraphLine(tags, label, by_line[lk]))
        if not lines and (rf.keys == () or rf.keys is None):
            # empty aggregate renders a NO_DATA line (TimeSeries.scala:34-54,
            # MemoryDatabase.scala:277-286)
            lines.append(GraphLine({"name": "NO_DATA"}, "NO DATA", [None] * n))
        return lines


def _legend(fmt: str | None, tags: dict[str, str]) -> str | None:
    """`$(tag)` substitution (StyleExpr.scala:47-62, Strings.substitute)."""
    if not fmt:
        return None
    import re

    def sub(m):
        return tags.get(m.group(1) or m.group(2), m.group(0))

    return re.sub(r"\$\((\w[\w.\-]*)\)|\$(\w[\w.\-]*)", sub, fmt)


def _default_label(se, tags: dict[str, str], keys: list[str], lk: tuple) -> str:
    if keys:
        return " ".join(str(v) for v in lk)
    if tags:
        return tags.get("name", next(iter(tags.values())))
    expr = se.expr if isinstance(se, E.StyleExpr) else se
    return expr.display()
