"""Time-series expression AST.

Mirrors the reference expression model in capability, not implementation:
  - DataExpr      (`atlas-core/.../model/DataExpr.scala`)    — scan + first aggregation
  - MathExpr      (`atlas-core/.../model/MathExpr.scala`)    — per-point map / join / regroup
  - StatefulExpr  (`atlas-core/.../model/StatefulExpr.scala`)— windowed online ops
  - FilterExpr    (`atlas-core/.../model/FilterExpr.scala`)  — stat/filter/topk
  - StyleExpr     (`atlas-core/.../model/StyleExpr.scala`)   — presentation settings
  - EventExpr     (`atlas-core/.../model/EventExpr.scala`)   — event table/sample

Nodes are pure data; evaluation lives in `atlas_spark/plans/builder.py`
(Spark) and `atlas_spark/oracle/sqlgen.py` (DuckDB oracle SQL).

`group_keys()` is the reference's `finalGrouping`: the tag keys the result
rows are keyed by.  `None` means ungrouped-by-key but still multi-line
(`:all`); `()` means a single aggregate line.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .query import Query

# ---------------------------------------------------------------------------
# base


class TimeSeriesExpr:
    def display(self) -> str:
        raise NotImplementedError

    def __str__(self) -> str:  # pragma: no cover
        return self.display()

    def group_keys(self) -> tuple[str, ...] | None:
        """Tag keys the result is grouped by.  () = single line."""
        return ()

    def data_exprs(self) -> list["DataExpr"]:
        """Leaf data expressions (storage reads) under this node."""
        out: list[DataExpr] = []
        for child in self.children():
            out.extend(child.data_exprs())
        return out

    def children(self) -> list["TimeSeriesExpr"]:
        return []

    def rewrite_queries(self, f) -> "TimeSeriesExpr":
        """Rebuild the tree applying `f: Query -> Query` to leaf queries
        (used for `:cq`, QueryVocabulary.scala:598-635)."""
        raise NotImplementedError


# ---------------------------------------------------------------------------
# data expressions (DataExpr.scala)

AGGR_FNS = ("sum", "count", "min", "max")
CFS = ("sum", "avg", "min", "max")


@dataclass(frozen=True)
class DataExpr(TimeSeriesExpr):
    """Base for expressions that read storage."""

    query: Query

    def data_exprs(self):
        return [self]

    def rewrite_queries(self, f):
        return type(self)(**{**self.__dict__, "query": f(self.query)})


@dataclass(frozen=True)
class AllExpr(DataExpr):
    """`q,:all` — every matching series, no aggregation (DataExpr.scala:128-140)."""

    offset: int = 0  # seconds

    def group_keys(self):
        return None

    def display(self):
        return f"{self.query.display()},:all"


@dataclass(frozen=True)
class AggrExpr(DataExpr):
    """`q,:sum|:count|:min|:max` with optional consolidation fn and offset
    (DataExpr.scala:171-255; ConsolidationFunction.scala:27-119)."""

    fn: str = "sum"
    offset: int = 0  # seconds (applied as shifted read window, DataVocabulary.scala:202)
    cf: str | None = None  # explicit consolidation fn (:cf-*)

    def __post_init__(self):
        assert self.fn in AGGR_FNS, self.fn

    def group_keys(self):
        return ()

    def display(self):
        s = f"{self.query.display()},:{self.fn}"
        if self.cf:
            s += f",:cf-{self.cf}"
        if self.offset:
            s += f",{self.offset},:offset"
        return s


@dataclass(frozen=True)
class GroupByExpr(DataExpr):
    """`af,(,k1,...,),:by` (DataExpr.scala:285-346).

    Series missing any group key are dropped (DataExpr.scala:108-122).
    """

    af: AggrExpr = None  # type: ignore[assignment]
    keys: tuple[str, ...] = ()

    def group_keys(self):
        return self.keys

    def display(self):
        ks = ",".join(self.keys)
        return f"{self.af.display()},(,{ks},),:by"

    def rewrite_queries(self, f):
        return GroupByExpr(f(self.query), AggrExpr(f(self.af.query), self.af.fn, self.af.offset, self.af.cf), self.keys)


# ---------------------------------------------------------------------------
# math expressions (MathExpr.scala)


@dataclass(frozen=True)
class ConstExpr(TimeSeriesExpr):
    """`N,:const` (MathExpr.scala:89-118)."""

    v: float

    def display(self):
        return f"{_fmt_double(self.v)},:const"

    def rewrite_queries(self, f):
        return self


@dataclass(frozen=True)
class RandomExpr(TimeSeriesExpr):
    """`:random` / `seed,:srandom` — deterministic hash-of-timestamp noise
    (MathExpr.scala:125-177): lowbias64(seed ^ timestamp) % 1000 / 1000."""

    seed: int = 0

    def display(self):
        return ":random" if self.seed == 0 else f"{self.seed},:srandom"

    def rewrite_queries(self, f):
        return self


TIME_MODES = (
    "secondOfMinute", "secondOfDay", "minuteOfHour", "minuteOfDay",
    "hourOfDay", "dayOfWeek", "dayOfMonth", "dayOfYear", "monthOfYear",
    "yearOfCentury", "yearOfEra", "seconds", "minutes", "hours", "days", "weeks",
)


@dataclass(frozen=True)
class TimeExpr(TimeSeriesExpr):
    """`mode,:time` — calendar field / since-epoch value (MathExpr.scala:179-237)."""

    mode: str

    def display(self):
        return f"{self.mode},:time"

    def rewrite_queries(self, f):
        return self


@dataclass(frozen=True)
class TimeSpanExpr(TimeSeriesExpr):
    """`s,e,:time-span` — 1.0 within [s,e] else 0.0 (MathExpr.scala:239-308).

    `zone` comes from the `tz` interpreter variable (graph param) and
    applies to absolute date strings without an explicit offset
    (MathVocabulary.scala:508-527)."""

    s: str
    e: str
    zone: str = "UTC"

    def display(self):
        return f"{self.s},{self.e},:time-span"

    def rewrite_queries(self, f):
        return self


UNARY_OPS = ("abs", "neg", "sin", "sqrt", "per-step")
CLAMP_OPS = ("clamp-min", "clamp-max")


@dataclass(frozen=True)
class UnaryMathExpr(TimeSeriesExpr):
    """Per-point unary map (MathExpr.scala:372-454); clamp has a parameter
    (MathExpr.scala:310-370)."""

    op: str
    expr: TimeSeriesExpr
    param: float | None = None

    def group_keys(self):
        return self.expr.group_keys()

    def children(self):
        return [self.expr]

    def display(self):
        if self.op in CLAMP_OPS:
            return f"{self.expr.display()},{_fmt_double(self.param)},:{self.op}"
        return f"{self.expr.display()},:{self.op}"

    def rewrite_queries(self, f):
        return UnaryMathExpr(self.op, self.expr.rewrite_queries(f), self.param)


BINARY_OPS = (
    "add", "sub", "mul", "div", "pow", "gt", "ge", "lt", "le",
    "fadd", "fsub", "fmul", "fdiv", "and", "or",
)


@dataclass(frozen=True)
class BinaryMathExpr(TimeSeriesExpr):
    """Pointwise binary op; grouping-join rules from MathExpr.scala:456-576:
    if both sides grouped, one side's keys must be a subset of the other's;
    join on common keys, keep the superset side's grouping."""

    op: str
    lhs: TimeSeriesExpr
    rhs: TimeSeriesExpr

    def __post_init__(self):
        assert self.op in BINARY_OPS, self.op
        self.group_keys()  # validate subset rule at construction

    def group_keys(self):
        g1, g2 = self.lhs.group_keys(), self.rhs.group_keys()
        if g1 is None or g2 is None:
            raise ValueError(":all results cannot be used with binary math ops")
        if not g1:
            return g2
        if not g2:
            return g1
        s1, s2 = set(g1), set(g2)
        if s1 <= s2:
            return g2
        if s2 <= s1:
            return g1
        raise ValueError(
            f"both sides of :{self.op} are grouped but neither grouping is a "
            f"subset of the other: {g1} vs {g2}"
        )

    def children(self):
        return [self.lhs, self.rhs]

    def display(self):
        return f"{self.lhs.display()},{self.rhs.display()},:{self.op}"

    def rewrite_queries(self, f):
        return BinaryMathExpr(self.op, self.lhs.rewrite_queries(f), self.rhs.rewrite_queries(f))


@dataclass(frozen=True)
class AggrMathExpr(TimeSeriesExpr):
    """Second-level aggregation collapsing all result lines pointwise into
    one (MathExpr.scala:711-794)."""

    fn: str
    expr: TimeSeriesExpr

    def __post_init__(self):
        assert self.fn in AGGR_FNS, self.fn

    def group_keys(self):
        return ()

    def children(self):
        return [self.expr]

    def display(self):
        return f"{self.expr.display()},:{self.fn}"

    def rewrite_queries(self, f):
        return AggrMathExpr(self.fn, self.expr.rewrite_queries(f))


@dataclass(frozen=True)
class MathGroupByExpr(TimeSeriesExpr):
    """Multi-level group by: regroup a grouped result by a subset of its keys
    (MathExpr.scala:796-857; subset check :806-809)."""

    af: AggrMathExpr
    keys: tuple[str, ...]

    def __post_init__(self):
        inner = self.af.expr.group_keys()
        if inner is None or not set(self.keys) <= set(inner):
            raise ValueError(
                f"multi-level group by keys {self.keys} must be a subset of "
                f"the inner grouping {inner}"
            )

    def group_keys(self):
        return self.keys

    def children(self):
        return [self.af]

    def display(self):
        ks = ",".join(self.keys)
        return f"{self.af.display()},(,{ks},),:by"

    def rewrite_queries(self, f):
        return MathGroupByExpr(self.af.rewrite_queries(f), self.keys)


@dataclass(frozen=True)
class AsExpr(TimeSeriesExpr):
    """`orig,repl,:as` — rename a result tag key (MathExpr.scala:52-87)."""

    expr: TimeSeriesExpr
    orig: str
    repl: str

    def group_keys(self):
        g = self.expr.group_keys()
        if g is None:
            return None
        return tuple(self.repl if k == self.orig else k for k in g)

    def children(self):
        return [self.expr]

    def display(self):
        return f"{self.expr.display()},{self.orig},{self.repl},:as"

    def rewrite_queries(self, f):
        return AsExpr(self.expr.rewrite_queries(f), self.orig, self.repl)


@dataclass(frozen=True)
class NamedRewrite(TimeSeriesExpr):
    """Macro display preservation (MathExpr.scala:1202-1340): `evaluated` is
    what runs; `display_obj` (the original Query/expression the macro was
    applied to, kept STRUCTURALLY like the reference's `displayExpr`) plus
    `suffix` (text after `,:name`, e.g. a trailing `,(,k,),:by`) is what
    prints.  Keeping the display structural lets query rewrites — notably
    ExprNormalizer's clause sort — flow into the display the way the
    reference's `Expr.rewrite` does.

    `groupby_rewrite`, when set, overrides how `:cg` groups the macro body
    (MathExpr.scala NamedRewrite.groupBy with a custom rewrite fn — used
    by CustomVocabulary averages): called with (display query, keys) and
    returns the grouped evaluated tree."""

    name: str
    display_obj: object
    evaluated: TimeSeriesExpr
    suffix: str = ""
    groupby_rewrite: object | None = field(default=None, compare=False)

    def group_keys(self):
        return self.evaluated.group_keys()

    def children(self):
        return [self.evaluated]

    def display(self):
        base = (
            self.display_obj.display()
            if hasattr(self.display_obj, "display")
            else str(self.display_obj)
        )
        return f"{base},:{self.name}{self.suffix}"

    def rewrite_queries(self, f):
        dob = self.display_obj
        if isinstance(dob, Query):
            dob = f(dob)
        elif isinstance(dob, TimeSeriesExpr):
            dob = dob.rewrite_queries(f)
        return NamedRewrite(
            self.name, dob, self.evaluated.rewrite_queries(f), self.suffix
        )


@dataclass(frozen=True)
class PercentilesExpr(TimeSeriesExpr):
    """`q,(,pcts,),:percentiles` — estimate percentiles from bucket-counter
    series grouped on the `percentile` tag (MathExpr.scala:873-1026).

    `expr` must be a GroupByExpr whose keys contain `percentile`; output is
    grouped by (eval keys + `percentile` label of the estimate).  Timer
    buckets (`T####`) are scaled 1e-9 to seconds (MathExpr.scala:984-988).
    """

    expr: GroupByExpr = None  # type: ignore[assignment]
    pcts: tuple[float, ...] = ()

    def __post_init__(self):
        if "percentile" not in self.expr.keys:
            raise ValueError(":percentiles requires grouping on the percentile key")
        for p in self.pcts:
            if not 0.0 <= p <= 100.0:
                raise ValueError(f"invalid percentile {p}")
        # canonical order: distinct ascending (MathExpr.scala:886 `pcts`)
        object.__setattr__(self, "pcts", tuple(sorted(set(self.pcts))))

    def eval_keys(self) -> tuple[str, ...]:
        return tuple(k for k in self.expr.keys if k != "percentile")

    def group_keys(self):
        return self.eval_keys() + ("percentile",)

    def children(self):
        return [self.expr]

    def display(self):
        # the reference renders the QUERY (not the bucket :sum aggregate)
        # before the optional grouping (MathExpr.scala:887-897)
        base = self.expr.query.display()
        ks = self.eval_keys()
        if ks:
            base += f",(,{','.join(ks)},),:by"
        ps = ",".join(_fmt_double(p) for p in self.pcts)
        return f"{base},(,{ps},),:percentiles"

    def rewrite_queries(self, f):
        return PercentilesExpr(self.expr.rewrite_queries(f), self.pcts)


@dataclass(frozen=True)
class SampleCountExpr(TimeSeriesExpr):
    """`q,min,max,:sample-count` — count of samples recorded between two
    bucket boundaries (MathVocabulary.scala:1361)."""

    expr: GroupByExpr = None  # type: ignore[assignment]
    lo: float = 0.0
    hi: float = float("inf")

    def eval_keys(self) -> tuple[str, ...]:
        return tuple(k for k in self.expr.keys if k != "percentile")

    def group_keys(self):
        return self.eval_keys()

    def children(self):
        return [self.expr]

    def display(self):
        # NamedRewrite display form (MathExpr.scala:1217-1237): the base
        # QUERY (not the rewritten bucket aggregate), Double-rendered
        # display params, and any grouping appended AFTER the word —
        # `q,0.0,5.0,:sample-count,(,app,),:by`
        base = f"{self.expr.query.display()},{_fmt_double(self.lo)},{_fmt_double(self.hi)},:sample-count"
        ks = self.eval_keys()
        if ks:
            base += f",(,{','.join(ks)},),:by"
        return base

    def rewrite_queries(self, f):
        return SampleCountExpr(self.expr.rewrite_queries(f), self.lo, self.hi)


@dataclass(frozen=True)
class ApproxDistinctExpr(TimeSeriesExpr):
    """`q,:approx-distinct` — HLL-style distinct estimate from max-rho
    register series tagged `distinct=R##` (MathExpr.scala:1053-1181).

    `expr` groups on `distinct` (possibly under a `:cumulative-max`
    wrapper for the cumulative variant); registers merge across publishers
    by max (the inner aggregation), then the estimator collapses the
    register dimension per interval.
    """

    expr: TimeSeriesExpr = None  # type: ignore[assignment]

    def __post_init__(self):
        if "distinct" not in (self.expr.group_keys() or ()):
            raise ValueError(":approx-distinct requires grouping on the distinct key")

    def eval_keys(self) -> tuple[str, ...]:
        return tuple(k for k in self.expr.group_keys() if k != "distinct")

    def group_keys(self):
        return self.eval_keys()

    def children(self):
        return [self.expr]

    def display(self):
        return f"{self.expr.display()},:approx-distinct"

    def rewrite_queries(self, f):
        return ApproxDistinctExpr(self.expr.rewrite_queries(f))


# ---------------------------------------------------------------------------
# stateful expressions (StatefulExpr.scala, algorithm/*)

STATEFUL_OPS = (
    "delay", "rolling-count", "rolling-min", "rolling-max", "rolling-mean",
    "rolling-sum", "trend", "integral", "cumulative-max", "derivative",
    "des", "sdes",
)


@dataclass(frozen=True)
class StatefulMathExpr(TimeSeriesExpr):
    """Online windowed op over the dense step grid.  State is per output
    series; series absent in an interval still tick with NaN
    (StatefulExpr.scala:313-321)."""

    op: str
    expr: TimeSeriesExpr
    params: tuple[float, ...] = ()

    def __post_init__(self):
        assert self.op in STATEFUL_OPS, self.op

    def group_keys(self):
        return self.expr.group_keys()

    def children(self):
        return [self.expr]

    def display(self):
        ps = ",".join(_fmt_num(p) for p in self.params)
        return f"{self.expr.display()}{',' + ps if ps else ''},:{self.op}"

    def rewrite_queries(self, f):
        return StatefulMathExpr(self.op, self.expr.rewrite_queries(f), self.params)


# ---------------------------------------------------------------------------
# filter expressions (FilterExpr.scala)

STATS = ("avg", "max", "min", "last", "total", "count")


@dataclass(frozen=True)
class StatExpr(TimeSeriesExpr):
    """`expr,stat,:stat` — each line becomes a constant line of its summary
    stat over the window (FilterExpr.scala:40-67, SummaryStats.scala)."""

    expr: TimeSeriesExpr
    stat: str

    def group_keys(self):
        return self.expr.group_keys()

    def children(self):
        return [self.expr]

    def display(self):
        return f"{self.expr.display()},{self.stat},:stat"

    def rewrite_queries(self, f):
        return StatExpr(self.expr.rewrite_queries(f), self.stat)


@dataclass(frozen=True)
class StatPlaceholder(TimeSeriesExpr):
    """`:stat-avg` etc. inside the predicate of `:filter`
    (FilterExpr.scala:69-118); resolved at plan build."""

    stat: str

    def group_keys(self):
        return ()

    def display(self):
        return f":stat-{self.stat}"

    def rewrite_queries(self, f):
        return self


@dataclass(frozen=True)
class FilterOpExpr(TimeSeriesExpr):
    """`expr,pred,:filter` — keep lines where the pred line is truthy at any
    point in the window (FilterExpr.scala:120-167)."""

    expr: TimeSeriesExpr
    pred: TimeSeriesExpr

    def group_keys(self):
        return self.expr.group_keys()

    def children(self):
        return [self.expr, self.pred]

    def display(self):
        return f"{self.expr.display()},{self.pred.display()},:filter"

    def rewrite_queries(self, f):
        return FilterOpExpr(self.expr.rewrite_queries(f), self.pred.rewrite_queries(f))


@dataclass(frozen=True)
class TopKExpr(TimeSeriesExpr):
    """`expr,stat,k,:topk` / `:bottomk` and the `-others-*` variants
    (FilterExpr.scala:172-336)."""

    expr: TimeSeriesExpr
    stat: str
    k: int
    bottom: bool = False
    others: str | None = None  # aggregation fn for the --others-- line

    def group_keys(self):
        return self.expr.group_keys()

    def children(self):
        return [self.expr]

    def display(self):
        word = "bottomk" if self.bottom else "topk"
        if self.others:
            word += f"-others-{self.others}"
        return f"{self.expr.display()},{self.stat},{self.k},:{word}"

    def rewrite_queries(self, f):
        return TopKExpr(self.expr.rewrite_queries(f), self.stat, self.k, self.bottom, self.others)


@dataclass(frozen=True)
class ConsolidateExpr(TimeSeriesExpr):
    """`expr,cf,step,:consolidate` — render-time consolidation to a larger
    step (FilterExpr.scala:364-391)."""

    expr: TimeSeriesExpr
    cf: str
    multiple: int  # new step = multiple * base step

    def group_keys(self):
        return self.expr.group_keys()

    def children(self):
        return [self.expr]

    def display(self):
        return f"{self.expr.display()},:cf-{self.cf},{self.multiple},:consolidate"

    def rewrite_queries(self, f):
        return ConsolidateExpr(self.expr.rewrite_queries(f), self.cf, self.multiple)


# ---------------------------------------------------------------------------
# style (StyleExpr.scala) — settings attached to an expression


@dataclass(frozen=True)
class StyleExpr(TimeSeriesExpr):
    expr: TimeSeriesExpr
    settings: tuple[tuple[str, str], ...] = ()

    def settings_dict(self) -> dict[str, str]:
        return dict(self.settings)

    def with_setting(self, k: str, v: str) -> "StyleExpr":
        s = dict(self.settings)
        s[k] = v
        return StyleExpr(self.expr, tuple(sorted(s.items())))

    def group_keys(self):
        return self.expr.group_keys()

    def children(self):
        return [self.expr]

    def display(self):
        # reference rendering (StyleExpr.scala:29-45): settings in
        # DESCENDING key order (explicit alpha survives palette on
        # re-parse), `ls` as its style word (`:stack`, not `stack,:ls`).
        # Values render raw — the reference escapes specials via
        # Interpreter.escape, which only matters for values carrying
        # comment/paren tokens.
        out = self.expr.display()
        for k, v in sorted(self.settings, key=lambda kv: kv[0], reverse=True):
            out += f",:{v}" if k == "ls" else f",{v},:{k}"
        return out

    def rewrite_queries(self, f):
        return StyleExpr(self.expr.rewrite_queries(f), self.settings)


# ---------------------------------------------------------------------------
# events (EventExpr.scala)


@dataclass(frozen=True)
class EventTableExpr(TimeSeriesExpr):
    """`q,(,cols,),:table` (EventExpr.scala:50-57)."""

    query: Query
    cols: tuple[str, ...]

    def display(self):
        return f"{self.query.display()},(,{','.join(self.cols)},),:table"

    def rewrite_queries(self, f):
        return EventTableExpr(f(self.query), self.cols)


@dataclass(frozen=True)
class EventSampleExpr(TimeSeriesExpr):
    """`q,(,by,),(,proj,),:sample` (EventExpr.scala:70-82)."""

    query: Query
    by: tuple[str, ...]
    proj: tuple[str, ...] = ()

    def display(self):
        return (
            f"{self.query.display()},(,{','.join(self.by)},),"
            f"(,{','.join(self.proj)},),:sample"
        )

    def rewrite_queries(self, f):
        return EventSampleExpr(f(self.query), self.by, self.proj)


# ---------------------------------------------------------------------------


def rewrite_tree(e: TimeSeriesExpr, f) -> TimeSeriesExpr:
    """Bottom-up structural rewrite (the reference core's `Expr.rewrite`):
    rebuild every TimeSeriesExpr-typed field (and tuples of them) through
    the rewrite, then apply `f` to the rebuilt node.  Query leaves are
    untouched — use `rewrite_queries` for those."""
    import dataclasses

    if dataclasses.is_dataclass(e):
        changes = {}
        for fld in dataclasses.fields(e):
            v = getattr(e, fld.name)
            if isinstance(v, TimeSeriesExpr):
                nv = rewrite_tree(v, f)
                if nv is not v:
                    changes[fld.name] = nv
            elif isinstance(v, tuple) and any(
                isinstance(x, TimeSeriesExpr) for x in v
            ):
                changes[fld.name] = tuple(
                    rewrite_tree(x, f) if isinstance(x, TimeSeriesExpr) else x
                    for x in v
                )
        if changes:
            e = dataclasses.replace(e, **changes)
    return f(e)


def _fmt_num(v: float | None) -> str:
    if v is None:
        return ""
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _fmt_double(v: float | None) -> str:
    """Java `Double.toString` rendering — the form the reference's
    `Interpreter.appendValue` emits for Double-typed display params
    (Interpreter.scala:424-431), e.g. `2.0`, `0.001`, `1.0E7`,
    `Infinity`: decimal form for 1e-3 <= |v| < 1e7, otherwise
    `d.dddEx` scientific; always at least one digit after the point."""
    if v is None:
        return ""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0.0:
        return "-0.0" if math.copysign(1.0, v) < 0 else "0.0"
    sign = "-" if v < 0 else ""
    s = repr(abs(float(v)))  # shortest round-trip digits
    if "e" in s:
        mant, exp = s.split("e")
        exp = int(exp)
    else:
        mant, exp = s, 0
    ip, _, fp = mant.partition(".")
    if ip != "0":
        dexp = len(ip) - 1 + exp
    else:
        lead = len(fp) - len(fp.lstrip("0"))
        dexp = -lead - 1 + exp
    digits = (ip + fp).lstrip("0").rstrip("0") or "0"
    a = abs(v)
    if 1e-3 <= a < 1e7:
        if dexp >= 0:
            ip2 = digits[: dexp + 1].ljust(dexp + 1, "0")
            fp2 = digits[dexp + 1 :] or "0"
            return f"{sign}{ip2}.{fp2}"
        return f"{sign}0.{'0' * (-dexp - 1)}{digits}"
    fp2 = digits[1:] or "0"
    return f"{sign}{digits[0]}.{fp2}E{dexp}"


def _merge_keys(ks1: tuple[str, ...], ks2: tuple[str, ...]) -> tuple[str, ...]:
    """Existing keys first, new keys appended if absent
    (MathVocabulary.scala:575-578 mergeKeys)."""
    have = set(ks1)
    return ks1 + tuple(k for k in ks2 if k not in have)


def _group_leaves(expr: TimeSeriesExpr, keys: tuple[str, ...]) -> TimeSeriesExpr:
    """Bottom-up shallow group-by rewrite used for ungrouped macro bodies
    and ungrouped `:by` (MathVocabulary.scala:368-374): every aggregate
    leaf becomes a group-by on `keys`, every math aggregate a regroup,
    and NamedRewrites group via their custom rewrite when they carry one
    (NamedRewrite.groupBy)."""
    if isinstance(expr, NamedRewrite):
        grouped = (
            expr.groupby_rewrite(keys)
            if expr.groupby_rewrite is not None
            else _group_leaves(expr.evaluated, keys)
        )
        suffix = f"{expr.suffix},(,{','.join(keys)},),:by"
        return NamedRewrite(
            expr.name, expr.display_obj, grouped, suffix,
            groupby_rewrite=expr.groupby_rewrite,
        )
    kids = expr.children()
    if isinstance(expr, AggrExpr):
        return GroupByExpr(expr.query, expr, keys)
    if isinstance(expr, AggrMathExpr):
        inner = _group_leaves(expr.expr, keys)
        return MathGroupByExpr(AggrMathExpr(expr.fn, inner), keys)
    if not kids:
        return expr
    return _rebuild(expr, [_group_leaves(c, keys) for c in kids])


def _rebuild(expr: TimeSeriesExpr, kids: list[TimeSeriesExpr]) -> TimeSeriesExpr:
    """Reconstruct a node with replaced children (structural recursion)."""
    if isinstance(expr, UnaryMathExpr):
        return UnaryMathExpr(expr.op, kids[0], expr.param)
    if isinstance(expr, BinaryMathExpr):
        return BinaryMathExpr(expr.op, kids[0], kids[1])
    if isinstance(expr, StatefulMathExpr):
        return StatefulMathExpr(expr.op, kids[0], expr.params)
    if isinstance(expr, AsExpr):
        return AsExpr(kids[0], expr.orig, expr.repl)
    if isinstance(expr, StatExpr):
        return StatExpr(kids[0], expr.stat)
    if isinstance(expr, FilterOpExpr):
        return FilterOpExpr(kids[0], kids[1])
    if isinstance(expr, TopKExpr):
        return TopKExpr(kids[0], expr.stat, expr.k, expr.bottom, expr.others)
    if isinstance(expr, ConsolidateExpr):
        return ConsolidateExpr(kids[0], expr.cf, expr.multiple)
    if isinstance(expr, StyleExpr):
        return StyleExpr(kids[0], expr.settings)
    if isinstance(expr, PercentilesExpr):
        return PercentilesExpr(kids[0], expr.pcts)
    if isinstance(expr, SampleCountExpr):
        return SampleCountExpr(kids[0], expr.lo, expr.hi)
    if isinstance(expr, ApproxDistinctExpr):
        return ApproxDistinctExpr(kids[0])
    if isinstance(expr, NamedRewrite):
        return NamedRewrite(
            expr.name, expr.display_obj, kids[0], expr.suffix,
            groupby_rewrite=expr.groupby_rewrite,
        )
    raise TypeError(f"cannot rebuild {type(expr).__name__}")


def group_ungrouped(expr: TimeSeriesExpr, keys: tuple[str, ...]) -> TimeSeriesExpr:
    """Ungrouped `(,keys,),:by` across math operations
    (MathVocabulary.scala:368-374)."""
    return _group_leaves(expr, keys)


def add_common_keys(expr: TimeSeriesExpr, keys: tuple[str, ...]) -> TimeSeriesExpr:
    """`:cg` common group by (MathVocabulary.scala:556-609 addCommonKeys):
    recursively add `keys` to every grouping in the tree — aggregate leaves
    become group-bys, existing group-bys merge the keys, math aggregates
    regroup their (recursively rewritten) input."""
    if isinstance(expr, NamedRewrite):
        ev = expr.evaluated
        if ev.group_keys():
            return NamedRewrite(
                expr.name, expr.display_obj, add_common_keys(ev, keys), expr.suffix,
                groupby_rewrite=expr.groupby_rewrite,
            )
        return _group_leaves(expr, keys)
    if isinstance(expr, AggrExpr):
        return GroupByExpr(expr.query, expr, keys)
    if isinstance(expr, GroupByExpr):
        return GroupByExpr(expr.query, expr.af, _merge_keys(expr.keys, keys))
    if isinstance(expr, MathGroupByExpr):
        af = expr.af
        new_af = AggrMathExpr(af.fn, add_common_keys(af.expr, keys))
        return MathGroupByExpr(new_af, _merge_keys(expr.keys, keys))
    if isinstance(expr, AggrMathExpr):
        return MathGroupByExpr(
            AggrMathExpr(expr.fn, add_common_keys(expr.expr, keys)), keys
        )
    kids = expr.children()
    if not kids:
        return expr
    return _rebuild(expr, [add_common_keys(c, keys) for c in kids])


def macro_avg(q: Query) -> TimeSeriesExpr:
    """`q,:avg` -> sum/count with display preservation (MathVocabulary.scala:92-108)."""
    ev = BinaryMathExpr("div", AggrExpr(q, "sum"), AggrExpr(q, "count"))
    return NamedRewrite("avg", q, ev)


def macro_pct(expr: TimeSeriesExpr) -> TimeSeriesExpr:
    """`:pct` — each line as percent of the pointwise total
    (MathVocabulary.scala:155-171)."""
    total = AggrMathExpr("sum", expr)
    ev = BinaryMathExpr("mul", BinaryMathExpr("div", expr, total), ConstExpr(100.0))
    return NamedRewrite("pct", expr, ev)
