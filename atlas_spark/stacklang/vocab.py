"""ASL vocabularies — every word from the reference's 7 vocabulary stack
(StandardVocabulary -> QueryVocabulary -> DataVocabulary -> MathVocabulary ->
StatefulVocabulary -> FilterVocabulary -> StyleVocabulary -> EventVocabulary).

Overload dispatch preserves the reference's vocabulary ordering: a word
with multiple overloads tries them in registration order (query-level
overloads win over math-level ones when both match, mirroring
`Interpreter.executeWord`, Interpreter.scala:40-72).

Words that produce sketch estimates (`:percentiles`, `:approx-distinct`,
`:sample-count`, `dist-*`) build AST nodes once those land in the plan
builder; until then they raise a clear AslError naming the word.
"""

from __future__ import annotations

import re
from typing import Any

from ..model import expr as E
from ..model import query as Q
from ..util.strings import parse_duration
from .interpreter import (
    AslError,
    Context,
    Interpreter,
    Word,
    is_number,
    is_ts_like,
    string_list,
    to_style,
    to_ts_expr,
)

# ---------------------------------------------------------------------------
# matcher helpers: predicates applied to the stack top-down


def _match(*preds):
    def m(stack: list[Any]) -> bool:
        if len(stack) < len(preds):
            return False
        for i, p in enumerate(preds):
            if not p(stack[-1 - i]):
                return False
        return True

    return m


ANY = lambda v: True  # noqa: E731
STR = lambda v: isinstance(v, str)  # noqa: E731
LST = lambda v: isinstance(v, list)  # noqa: E731
QRY = lambda v: isinstance(v, Q.Query)  # noqa: E731
TS = is_ts_like
TSE = lambda v: isinstance(v, E.TimeSeriesExpr)  # noqa: E731
NUM = lambda v: is_number(v)  # noqa: E731
INT = lambda v: isinstance(v, str) and v.isdigit()  # noqa: E731
AGF = lambda v: isinstance(v, E.AggrExpr)  # noqa: E731
AGM = lambda v: isinstance(v, E.AggrMathExpr)  # noqa: E731
DUR = lambda v: isinstance(v, str) and _is_duration(v)  # noqa: E731
PRES = lambda v: TS(v) or isinstance(v, E.StyleExpr)  # noqa: E731

_DUR_RE = re.compile(r"^(\d+)(s|m|h|d|w)$|^P", re.IGNORECASE)


def _is_duration(s: str) -> bool:
    return bool(_DUR_RE.match(s)) or s.isdigit()


def _steps(tok: str, step: int) -> int:
    """Window parameter -> step count: plain int = intervals, duration ->
    rounded up to whole steps (StatefulVocabulary duration handling)."""
    if tok.isdigit():
        return int(tok)
    d = parse_duration(tok)
    return max(1, d // step)


# ---------------------------------------------------------------------------
# vocabulary definition

WORDS: list[Word] = []

# Layered vocabulary tracking (Vocabulary.scala dependsOn chains): each
# section below stamps its words with the owning vocabulary name, so
# /api/v1/expr can build an interpreter scoped to any layer
# (ExprApi.scala:47-73 `vocab` parameter).  The dependency chain is the
# reference's: std <- query <- data <- math <- stateful <- filter <-
# style; event depends on query only (EventVocabulary.scala:33).
_CURRENT_VOCAB = "std"

_VOCAB_DEPS: dict[str, tuple[str, ...]] = {
    "std": ("std",),
    "query": ("std", "query"),
    "data": ("std", "query", "data"),
    "math": ("std", "query", "data", "math"),
    "stateful": ("std", "query", "data", "math", "stateful"),
    "filter": ("std", "query", "data", "math", "stateful", "filter"),
    "style": ("std", "query", "data", "math", "stateful", "filter", "style"),
    "event": ("std", "query", "event"),
}


def words_for_vocab(name: str) -> list[Word]:
    """All words of the named vocabulary plus its dependency chain
    (Vocabulary.allWords).  Unknown names raise ValueError (the
    reference's vocabularies(name) lookup failure)."""
    layers = _VOCAB_DEPS.get(name)
    if layers is None:
        raise ValueError(
            f"unknown vocabulary: {name!r} (expected one of "
            f"{', '.join(sorted(_VOCAB_DEPS))})"
        )
    keep = set(layers)
    return [word for word in WORDS if word.vocab in keep]


def w(name: str, matcher, executor, stable: bool = True) -> None:
    WORDS.append(Word(name, matcher, executor, stable=stable, vocab=_CURRENT_VOCAB))


def macro(name: str, body: str, stable: bool = True) -> None:
    """Word defined as an ASL program over the existing words."""

    def run(ctx: Context) -> None:
        from .interpreter import split_and_trim

        ctx.interpreter.execute_program(split_and_trim(body), ctx)

    w(name, lambda s: True, run, stable=stable)


# --------------------------------------------------------------- standard

w("clear", lambda s: True, lambda c: c.stack.clear())
w("depth", lambda s: True, lambda c: c.push(str(len(c.stack))))
w("drop", _match(ANY), lambda c: c.pop())
w("dup", _match(ANY), lambda c: c.push(c.stack[-1]))
w("over", _match(ANY, ANY), lambda c: c.push(c.stack[-2]))


def _swap(c: Context) -> None:
    a, b = c.pop(), c.pop()
    c.push(a)
    c.push(b)


w("swap", _match(ANY, ANY), _swap)


def _rot(c: Context) -> None:
    # bottom item moves to the top (StandardVocabulary.scala:522-541)
    c.push(c.stack.pop(0))


def _rrot(c: Context) -> None:
    # top item moves to the bottom
    c.stack.insert(0, c.pop())


w("rot", lambda s: len(s) > 0, _rot)
w("-rot", lambda s: len(s) > 0, _rrot)


def _pick(c: Context) -> None:
    n = int(c.pop())
    if n >= len(c.stack):
        raise AslError(":pick index out of range")
    c.push(c.stack[-1 - n])


def _roll(c: Context) -> None:
    n = int(c.pop())
    if n >= len(c.stack):
        raise AslError(":roll index out of range")
    c.push(c.stack.pop(-1 - n))


w("pick", _match(INT, ANY), _pick)
w("roll", _match(INT, ANY), _roll)


def _ndrop(c: Context) -> None:
    n = int(c.pop())
    del c.stack[len(c.stack) - n :]


def _nlist(c: Context) -> None:
    n = int(c.pop())
    items = c.stack[len(c.stack) - n :]
    del c.stack[len(c.stack) - n :]
    c.push(list(items))


w("ndrop", _match(INT), _ndrop)
w("nlist", _match(INT), _nlist)


def _tolist(c: Context) -> None:
    # pop everything, push as one list (top-first, StandardVocabulary.scala:616-624)
    items = list(reversed(c.stack))
    c.stack.clear()
    c.push(items)


w("list", lambda s: True, _tolist)


def _call(c: Context) -> None:
    prog = c.pop()
    if not isinstance(prog, list):
        raise AslError(":call expects a list")
    c.interpreter.execute_program(prog, c)


w("call", _match(LST), _call)


def _each(c: Context) -> None:
    prog = c.pop()
    items = c.pop()
    for v in items:
        c.push(v)
        c.interpreter.execute_program(prog, c)


w("each", _match(LST, LST), _each)


def _map(c: Context) -> None:
    prog = c.pop()
    items = c.pop()
    out = []
    for v in items:
        c.push(v)
        c.interpreter.execute_program(prog, c)
        out.append(c.pop())
    c.push(out)


w("map", _match(LST, LST), _map)


def _get(c: Context) -> None:
    k = c.pop()
    if k not in c.vars:
        raise AslError(f"unknown variable {k!r}")
    c.push(c.vars[k])


def _set(c: Context) -> None:
    v, k = c.pop(), c.pop()
    c.vars[k] = v


w("get", _match(STR), _get)
w("set", _match(ANY, STR), _set)


def _format(c: Context) -> None:
    args = c.pop()
    pattern = c.pop()
    # printf-style substitution.  Stack args arrive as STRINGS, so
    # numeric conversions parse their arg first (float for e/f/g, int
    # for d/o/x); a failed parse or arity mismatch is a client ERROR,
    # never a silent passthrough (Format word -> String.format).
    convs = [m for m in re.findall(r"%[-#0-9+ .]*([a-zA-Z%])", pattern) if m != "%"]
    try:
        coerced = []
        for i, a in enumerate(args):
            conv = convs[i] if i < len(convs) else "s"
            if isinstance(a, str) and conv in "eEfgG":
                a = float(a)
            elif isinstance(a, str) and conv in "doxX":
                a = int(float(a))
            coerced.append(a)
        c.push(pattern % tuple(coerced))
    except (TypeError, ValueError) as ex:
        raise AslError(f":format failed for pattern {pattern!r}: {ex}") from ex


w("format", _match(LST, STR), _format)


def _freeze(c: Context) -> None:
    # isolate current stack from later operations (StandardVocabulary.scala:280-287)
    c.frozen.extend(c.stack)
    c.stack.clear()


w("freeze", lambda s: True, _freeze)

macro("2over", ":over,:over")
macro("nip", ":swap,:drop")
macro("tuck", ":swap,:over")
macro("fcall", ":get,:call")
macro("sset", ":swap,:set")
macro("head", ":limit")

# ----------------------------------------------------------------- query

_CURRENT_VOCAB = "query"

w("true", lambda s: True, lambda c: c.push(Q.TRUE))
w("false", lambda s: True, lambda c: c.push(Q.FALSE))
w("has", _match(STR), lambda c: c.push(Q.HasKeyQuery(c.pop())))


def _kv(cls):
    def run(c: Context) -> None:
        v, k = c.pop(), c.pop()
        c.push(cls(k, v))

    return run


w("eq", _match(STR, STR), _kv(Q.EqualQuery))
w("lt", _match(STR, STR), _kv(Q.LessThanQuery))
w("le", _match(STR, STR), _kv(Q.LessThanEqualQuery))
w("gt", _match(STR, STR), _kv(Q.GreaterThanQuery))
w("ge", _match(STR, STR), _kv(Q.GreaterThanEqualQuery))
w("re", _match(STR, STR), _kv(Q.RegexQuery))
w("reic", _match(STR, STR), _kv(Q.RegexIgnoreCaseQuery))


def _contains(c: Context) -> None:
    v, k = c.pop(), c.pop()
    c.push(Q.RegexQuery(k, ".*" + re.escape(v)))


def _starts(c: Context) -> None:
    v, k = c.pop(), c.pop()
    c.push(Q.RegexQuery(k, re.escape(v)))


def _ends(c: Context) -> None:
    v, k = c.pop(), c.pop()
    c.push(Q.RegexQuery(k, ".*" + re.escape(v) + "$"))


w("contains", _match(STR, STR), _contains)
w("starts", _match(STR, STR), _starts)
w("ends", _match(STR, STR), _ends)


def _in(c: Context) -> None:
    vs, k = string_list(c.pop()), c.pop()
    if len(vs) == 0:
        c.push(Q.FALSE)
    elif len(vs) == 1:
        c.push(Q.EqualQuery(k, vs[0]))
    else:
        c.push(Q.InQuery(k, tuple(vs)))


w("in", _match(LST, STR), _in)

w("and", _match(QRY, QRY), lambda c: c.push(Q.simplify(Q.AndQuery(*_pop2q(c)))))
w("or", _match(QRY, QRY), lambda c: c.push(Q.simplify(Q.OrQuery(*_pop2q(c)))))
w("not", _match(QRY), lambda c: c.push(Q.simplify(Q.NotQuery(c.pop()))))


def _pop2q(c: Context) -> tuple[Q.Query, Q.Query]:
    q2, q1 = c.pop(), c.pop()
    return q1, q2


def _cq(c: Context) -> None:
    common = c.pop()
    v = c.pop()
    if isinstance(v, Q.Query):
        c.push(Q.simplify(Q.AndQuery(v, common)))
    else:
        expr = v if isinstance(v, E.TimeSeriesExpr) else to_ts_expr(v)
        c.push(expr.rewrite_queries(lambda q: Q.simplify(Q.AndQuery(q, common))))


w("cq", _match(QRY, ANY), _cq)

# ------------------------------------------------------------------ data

_CURRENT_VOCAB = "data"

w("all", _match(QRY), lambda c: c.push(E.AllExpr(c.pop())))


def _data_aggr(fn: str):
    def run(c: Context) -> None:
        c.push(E.AggrExpr(c.pop(), fn))

    return run


w("sum", _match(QRY), _data_aggr("sum"))
w("count", _match(QRY), _data_aggr("count"))
w("min", _match(QRY), _data_aggr("min"))
w("max", _match(QRY), _data_aggr("max"))


def _by(c: Context) -> None:
    """Data group by (DataVocabulary) + the math overloads
    (MathVocabulary.scala:345-375): explicit math aggregate regroup,
    implicit :sum regroup of a grouped result, and the ungrouped case
    that rewrites aggregate leaves / NamedRewrites across math ops."""
    keys = tuple(string_list(c.pop()))
    v = c.pop()
    if isinstance(v, Q.Query):
        # AggrType coercion: bare query -> default sum aggregation
        # (ModelDataTypes.scala AggrType)
        v = E.AggrExpr(v, "sum")
    if isinstance(v, E.AggrExpr):
        c.push(E.GroupByExpr(v.query, v, keys))
    elif isinstance(v, E.SampleCountExpr) and not v.eval_keys():
        # canonical-display round-trip: the named-rewrite form renders the
        # grouping AFTER the word (`q,0.0,5.0,:sample-count,(,app,),:by`,
        # MathExpr.scala:1232-1237); the keys regroup the underlying
        # percentile-bucket aggregate (percentile key stays prepended)
        g = v.expr
        c.push(
            E.SampleCountExpr(
                E.GroupByExpr(g.query, g.af, ("percentile",) + keys), v.lo, v.hi
            )
        )
    elif isinstance(v, E.AggrMathExpr) and v.expr.group_keys():
        c.push(E.MathGroupByExpr(v, keys))
    elif isinstance(v, E.TimeSeriesExpr) and v.group_keys():
        c.push(E.MathGroupByExpr(E.AggrMathExpr("sum", v), keys))
    elif isinstance(v, E.TimeSeriesExpr):
        c.push(E.group_ungrouped(v, keys))
    else:
        raise AslError(":by requires an aggregation function")


w(
    "by",
    lambda s: len(s) >= 2
    and isinstance(s[-1], list)
    and isinstance(s[-2], (E.TimeSeriesExpr, Q.Query)),
    _by,
)


def apply_offset(expr: E.TimeSeriesExpr, seconds: int) -> E.TimeSeriesExpr:
    """Set the read offset on every data expr of the tree
    (DataVocabulary.scala:202)."""

    def add_off(x):
        if isinstance(x, E.AggrExpr):
            return E.AggrExpr(x.query, x.fn, seconds, x.cf)
        if isinstance(x, E.AllExpr):
            return E.AllExpr(x.query, seconds)
        if isinstance(x, E.GroupByExpr):
            return E.GroupByExpr(x.query, add_off(x.af), x.keys)
        if isinstance(x, E.DataExpr):
            return x
        return _rewrite_data(x, add_off)

    return add_off(expr)


def _offset(c: Context) -> None:
    top = c.pop()
    if isinstance(top, list):
        # style multi-offset: one line per offset (StyleExpr.scala:178-200)
        se = to_style(c.pop())
        c.push(se.with_setting("offset", "(," + ",".join(top) + ",)"))
        return
    d = parse_duration(top)
    v = c.pop()
    expr = v if isinstance(v, E.TimeSeriesExpr) else to_ts_expr(v)
    c.push(apply_offset(expr, d))


def _rewrite_data(x: E.TimeSeriesExpr, f):
    """Apply f to DataExpr leaves of any math tree."""
    if isinstance(x, E.DataExpr):
        return f(x)
    if isinstance(x, E.UnaryMathExpr):
        return E.UnaryMathExpr(x.op, _rewrite_data(x.expr, f), x.param)
    if isinstance(x, E.BinaryMathExpr):
        return E.BinaryMathExpr(x.op, _rewrite_data(x.lhs, f), _rewrite_data(x.rhs, f))
    if isinstance(x, E.AggrMathExpr):
        return E.AggrMathExpr(x.fn, _rewrite_data(x.expr, f))
    if isinstance(x, E.MathGroupByExpr):
        return E.MathGroupByExpr(_rewrite_data(x.af, f), x.keys)
    if isinstance(x, E.StatefulMathExpr):
        return E.StatefulMathExpr(x.op, _rewrite_data(x.expr, f), x.params)
    if isinstance(x, E.NamedRewrite):
        return E.NamedRewrite(
            x.name, x.display_obj, _rewrite_data(x.evaluated, f), x.suffix
        )
    return x


w("offset", _match(lambda v: LST(v) or DUR(v), ANY), _offset)


def _cf(cf: str):
    def run(c: Context) -> None:
        v = c.pop()
        if isinstance(v, E.AggrExpr):
            c.push(E.AggrExpr(v.query, v.fn, v.offset, cf))
        elif isinstance(v, E.GroupByExpr):
            c.push(E.GroupByExpr(v.query, E.AggrExpr(v.af.query, v.af.fn, v.af.offset, cf), v.keys))
        else:
            raise AslError(f":cf-{cf} requires a data aggregation")

    return run


for _c in ("sum", "avg", "min", "max"):
    w(f"cf-{_c}", _match(lambda v: isinstance(v, (E.AggrExpr, E.GroupByExpr))), _cf(_c))

# ------------------------------------------------------------------ math

_CURRENT_VOCAB = "math"


def _unary(op: str):
    def run(c: Context) -> None:
        c.push(E.UnaryMathExpr(op, to_ts_expr(c.pop())))

    return run


for _op in ("abs", "neg", "sin", "sqrt", "per-step"):
    w(_op, _match(TS), _unary(_op))


def _clamp(op: str):
    def run(c: Context) -> None:
        v = float(c.pop())
        c.push(E.UnaryMathExpr(op, to_ts_expr(c.pop()), param=v))

    return run


w("clamp-min", _match(NUM, TS), _clamp("clamp-min"))
w("clamp-max", _match(NUM, TS), _clamp("clamp-max"))


def _binary(op: str):
    def run(c: Context) -> None:
        rhs = to_ts_expr(c.pop())
        lhs = to_ts_expr(c.pop())
        c.push(E.BinaryMathExpr(op, lhs, rhs))

    return run


for _op in ("add", "sub", "mul", "div", "pow", "fadd", "fsub", "fmul", "fdiv"):
    w(_op, _match(TS, TS), _binary(_op))
# comparison + boolean ops: query overloads were registered above and win
# when both args are plain strings / queries
for _op in ("gt", "ge", "lt", "le", "and", "or"):
    w(_op, _match(TS, TS), _binary(_op))


def _math_aggr(fn: str):
    def run(c: Context) -> None:
        c.push(E.AggrMathExpr(fn, to_ts_expr(c.pop())))

    return run


# TimeSeriesExpr overloads of :sum/:count/:min/:max (MathVocabulary.scala:1204-1246)
for _fn in ("sum", "count", "min", "max"):
    w(_fn, _match(TS), _math_aggr(_fn))


def _cg(c: Context) -> None:
    """Common group by: recursively add the keys to every grouping in the
    TOP expression's tree (MathVocabulary.scala:556-609) — aggregate
    leaves become group-bys, existing group-bys merge keys."""
    keys = tuple(string_list(c.pop()))
    v = c.pop()
    if isinstance(v, Q.Query):
        v = E.AggrExpr(v, "sum")
    if not isinstance(v, E.TimeSeriesExpr):
        raise AslError(":cg requires a time-series expression input")
    c.push(E.add_common_keys(v, keys))


w("cg", _match(LST), _cg)

w("const", _match(NUM), lambda c: c.push(E.ConstExpr(float(c.pop()))))
w("pi", lambda s: True, lambda c: c.push(E.ConstExpr(3.141592653589793)))
w("random", lambda s: True, lambda c: c.push(E.RandomExpr()))
w("srandom", _match(NUM), lambda c: c.push(E.RandomExpr(int(float(c.pop())))))
w("time", _match(STR), lambda c: c.push(E.TimeExpr(c.pop())))


def _time_span(c: Context) -> None:
    """Zone from the `tz` interpreter variable, UTC default
    (MathVocabulary.scala:508-527)."""
    e_tok, s_tok = c.pop(), c.pop()
    c.push(E.TimeSpanExpr(s_tok, e_tok, str(c.vars.get("tz", "UTC"))))


w("time-span", _match(STR, STR), _time_span)


def _as(c: Context) -> None:
    repl, orig = c.pop(), c.pop()
    c.push(E.AsExpr(to_ts_expr(c.pop()), orig, repl))


w("as", _match(STR, STR, TS), _as)


def _named_rewrite(c: Context) -> None:
    name = c.pop()
    rewritten = to_ts_expr(c.pop())
    original = c.pop()
    c.push(E.NamedRewrite(name, original, rewritten))


w("named-rewrite", _match(STR, TS, ANY), _named_rewrite)

# macros with display preservation (MathVocabulary.scala:92-275).  The
# stack programs mirror the reference macro definitions (they are the
# public ASL expansion of these operators).
macro("avg", ":dup,:dup,:sum,:swap,:count,:div,avg,:named-rewrite")
macro("pct", ":dup,:dup,:sum,:div,100,:const,:mul,pct,:named-rewrite")
macro(
    "stddev",
    ":dup,0,:fadd,:dup,:count,:over,:dup,:mul,:sum,:mul,:over,:sum,:dup,:mul,"
    ":sub,:swap,:count,:dup,:mul,:div,:sqrt,stddev,:named-rewrite",
)
macro(
    "dist-avg",
    ":dup,statistic,(,totalTime,totalAmount,),:in,:sum,"
    "statistic,count,:eq,:sum,:div,:swap,:cq,dist-avg,:named-rewrite",
)
macro(
    "dist-max",
    ":dup,statistic,max,:eq,:max,:swap,:cq,dist-max,:named-rewrite",
)
macro(
    "dist-stddev",
    ":dup,statistic,count,:eq,:sum,statistic,totalOfSquares,:eq,:sum,:mul,"
    "statistic,(,totalAmount,totalTime,),:in,:sum,:dup,:mul,:sub,"
    "statistic,count,:eq,:sum,:dup,:mul,:div,:sqrt,:swap,:cq,dist-stddev,:named-rewrite",
)


# trig macros (MathVocabulary.scala:276-315)
macro("cos", ":pi,2,:div,:swap,:sub,:sin")
macro("tan", ":dup,:sin,:swap,:cos,:div")
macro("cot", ":dup,:cos,:swap,:sin,:div")
macro("sec", "1,:swap,:cos,:div")
macro("csc", "1,:swap,:sin,:div")


def _to_pct_group(v) -> E.GroupByExpr:
    """Rewrite the input to group on the percentile tag
    (MathVocabulary.scala:1277-1291).  Bucket counters must be SUMMED, so
    any aggregate is converted via `toSum` — plain Sum with only the query
    and offset preserved (cf dropped) — and the percentile key is
    PREPENDED to an existing group-by's keys."""
    if isinstance(v, Q.Query):
        v = E.AggrExpr(v, "sum")
    if isinstance(v, E.AggrExpr):
        return E.GroupByExpr(v.query, E.AggrExpr(v.query, "sum", v.offset), ("percentile",))
    if isinstance(v, E.GroupByExpr):
        keys = v.keys if "percentile" in v.keys else ("percentile",) + v.keys
        return E.GroupByExpr(v.query, E.AggrExpr(v.query, "sum", v.af.offset), keys)
    raise AslError(":percentiles requires a data aggregation input")


def _percentiles(c: Context) -> None:
    pcts = tuple(float(x) for x in string_list(c.pop()))
    c.push(E.PercentilesExpr(_to_pct_group(c.pop()), pcts))


w(
    "percentiles",
    lambda s: len(s) >= 2 and isinstance(s[-1], list),
    _percentiles,
)

macro("median", "(,50,),:percentiles")


def _to_distinct_group(v):
    """Rewrite input to group on the distinct register tag with max merge
    (MathVocabulary.scala:1317-1360); cumulative-max wrappers are rewritten
    through (StatefulVocabulary.scala:70-96)."""
    if isinstance(v, E.StatefulMathExpr) and v.op == "cumulative-max":
        return E.StatefulMathExpr(v.op, _to_distinct_group(v.expr), v.params)
    if isinstance(v, Q.Query):
        v = E.AggrExpr(v, "max")
    if isinstance(v, E.AggrExpr):
        return E.GroupByExpr(v.query, E.AggrExpr(v.query, "max", v.offset, v.cf), ("distinct",))
    if isinstance(v, E.GroupByExpr):
        keys = v.keys if "distinct" in v.keys else v.keys + ("distinct",)
        return E.GroupByExpr(v.query, E.AggrExpr(v.query, "max", v.af.offset, v.af.cf), keys)
    raise AslError(":approx-distinct requires a data aggregation input")


def _approx_distinct(c: Context) -> None:
    c.push(E.ApproxDistinctExpr(_to_distinct_group(c.pop())))


w("approx-distinct", _match(ANY), _approx_distinct)

macro(
    "approx-distinct-cumulative",
    ":dup,:cumulative-max,:approx-distinct,approx-distinct-cumulative,:named-rewrite",
)


def _sample_count(c: Context) -> None:
    hi_tok, lo_tok = c.pop(), c.pop()
    hi = float("inf") if hi_tok in ("Infinity", "inf") else float(hi_tok)
    lo = float(lo_tok)
    c.push(E.SampleCountExpr(_to_pct_group(c.pop()), lo, hi))


w("sample-count", _match(STR, STR), _sample_count)

# ------------------------------------------------------------- stateful

_CURRENT_VOCAB = "stateful"


def _stateful1(op: str):
    def run(c: Context) -> None:
        n = _steps(c.pop(), c.interpreter.step)
        c.push(E.StatefulMathExpr(op, to_ts_expr(c.pop()), (n,)))

    return run


for _op in ("delay", "rolling-count", "rolling-min", "rolling-max", "rolling-sum"):
    w(_op, _match(lambda v: INT(v) or DUR(v), TS), _stateful1(_op))


def _rolling_mean(c: Context) -> None:
    min_n = int(c.pop())
    n = _steps(c.pop(), c.interpreter.step)
    c.push(E.StatefulMathExpr("rolling-mean", to_ts_expr(c.pop()), (n, min_n)))


w("rolling-mean", _match(INT, lambda v: INT(v) or DUR(v), TS), _rolling_mean)


def _trend(c: Context) -> None:
    d = parse_duration(c.pop())
    c.push(E.StatefulMathExpr("trend", to_ts_expr(c.pop()), (d,)))


w("trend", _match(DUR, TS), _trend)

for _op in ("integral", "cumulative-max", "derivative"):
    w(
        _op,
        _match(TS),
        (lambda op: lambda c: c.push(E.StatefulMathExpr(op, to_ts_expr(c.pop()), ())))(_op),
    )


def _des(op: str):
    def run(c: Context) -> None:
        beta = float(c.pop())
        alpha = float(c.pop())
        n = int(c.pop())
        c.push(E.StatefulMathExpr(op, to_ts_expr(c.pop()), (n, alpha, beta)))

    return run


w("des", _match(NUM, NUM, INT, TS), _des("des"))
w("sdes", _match(NUM, NUM, INT, TS), _des("sdes"))

# DES alerting band signal (StatefulVocabulary.scala:664-763): the stack
# program is the reference's public macro expansion, verbatim.
macro(
    "des-epic-signal",
    "noise,:sset,minPercent,:sset,maxPercent,:sset,beta,:sset,alpha,:sset,"
    "trainingSize,:sset,line,:sset,"
    "pred,line,:get,trainingSize,:get,alpha,:get,beta,:get,:des,:set,"
    "minPredNoiseBound,pred,:get,noise,:get,:sub,:set,"
    "minPredPercentBound,pred,:get,1.0,:const,minPercent,:get,:const,:fsub,:fmul,:set,"
    "maxPredNoiseBound,pred,:get,noise,:get,:add,:set,"
    "maxPredPercentBound,pred,:get,2.0,:const,1.0,:const,maxPercent,:get,:const,:fsub,:fsub,:fmul,:set,"
    "line,:get,minPredNoiseBound,:get,:lt,"
    "line,:get,minPredPercentBound,:get,:lt,:and,"
    "line,:get,maxPredNoiseBound,:get,:gt,"
    "line,:get,maxPredPercentBound,:get,:gt,:and,:or",
)

# legacy epic-expression visualization (StyleVocabulary.scala:124,605-636):
# the signal as a translucent vspan plus the raw line and the four
# prediction bounds, each pulled from the variables that
# :des-epic-signal leaves in the context
macro(
    "des-epic-viz",
    ":des-epic-signal,vspan,:ls,40,:alpha,triggered,:legend,"
    "line,:get,line,:legend,"
    "minPredNoiseBound,:get,minPredNoiseBound,:legend,"
    "minPredPercentBound,:get,minPredPercentBound,:legend,"
    "maxPredNoiseBound,:get,maxPredNoiseBound,:legend,"
    "maxPredPercentBound,:get,maxPredPercentBound,:legend",
)

# preset macros (StatefulVocabulary.scala:53-60)
for _nm, _ps in (
    ("des-simple", "10,0.1,0.5,:des"),
    ("des-fast", "10,0.1,0.02,:des"),
    ("des-slower", "10,0.05,0.03,:des"),
    ("des-slow", "10,0.03,0.04,:des"),
    ("sdes-simple", "10,0.1,0.5,:sdes"),
    ("sdes-fast", "10,0.1,0.02,:sdes"),
    ("sdes-slower", "10,0.05,0.03,:sdes"),
    ("sdes-slow", "10,0.03,0.04,:sdes"),
):
    macro(_nm, f":dup,{_ps},{_nm},:named-rewrite")

# --------------------------------------------------------------- filter

_CURRENT_VOCAB = "filter"

_STATS = ("avg", "max", "min", "last", "total", "count")


def _stat(c: Context) -> None:
    stat = c.pop()
    if stat not in _STATS:
        raise AslError(f"unknown summary stat {stat!r}")
    c.push(E.StatExpr(to_ts_expr(c.pop()), stat))


w("stat", _match(STR, TS), _stat)

for _s in _STATS:
    w(
        f"stat-{_s}",
        lambda s: True,
        (lambda st: lambda c: c.push(E.StatPlaceholder(st)))(_s),
    )

# legacy macros (FilterVocabulary.scala:49-72)
macro("stat-min-mf", "min,:stat")
macro("stat-max-mf", "max,:stat")
macro("stat-avg-mf", "avg,:stat")


w(
    "filter",
    lambda s: len(s) >= 2
    and (TS(s[-1]) or isinstance(s[-1], E.StatPlaceholder))
    and TS(s[-2]),
    lambda c: _filter_impl(c),
)


def _filter_impl(c: Context) -> None:
    pred = c.pop()
    if not isinstance(pred, E.TimeSeriesExpr):
        pred = to_ts_expr(pred)
    expr = to_ts_expr(c.pop())
    c.push(E.FilterOpExpr(expr, pred))


def _topk_word(bottom: bool, others: str | None):
    def run(c: Context) -> None:
        k = int(c.pop())
        stat = c.pop()
        if stat not in _STATS:
            raise AslError(f"unknown summary stat {stat!r}")
        c.push(E.TopKExpr(to_ts_expr(c.pop()), stat, k, bottom, others))

    return run


w("topk", _match(INT, STR, TS), _topk_word(False, None))
w("bottomk", _match(INT, STR, TS), _topk_word(True, None))
for _o in ("min", "max", "sum", "avg"):
    w(f"topk-others-{_o}", _match(INT, STR, TS), _topk_word(False, _o))
    w(f"bottomk-others-{_o}", _match(INT, STR, TS), _topk_word(True, _o))


def _consolidate(c: Context) -> None:
    d = parse_duration(c.pop())
    cf = c.pop()
    if isinstance(cf, str):
        cf = cf.removeprefix("cf-")
    if cf not in ("sum", "avg", "min", "max"):
        raise AslError(f"unknown consolidation fn {cf!r}")
    step = c.interpreter.step
    m = max(1, -(-d // step))  # round up to whole multiple (FilterExpr.scala:364-391)
    c.push(E.ConsolidateExpr(to_ts_expr(c.pop()), cf, m))


w("consolidate", _match(DUR, STR, TS), _consolidate)

# ---------------------------------------------------------------- style

_CURRENT_VOCAB = "style"


def _style_setting(key: str):
    def run(c: Context) -> None:
        v = c.pop()
        c.push(to_style(c.pop()).with_setting(key, v))

    return run


for _k in ("alpha", "color", "palette", "ls", "lw", "axis", "legend", "decode", "limit", "sort", "order"):
    w(_k, _match(STR, PRES), _style_setting(_k))


def _sed(c: Context) -> None:
    r, s = c.pop(), c.pop()
    se = to_style(c.pop())
    c.push(se.with_setting("s", f"{s},{r}"))


w("s", _match(STR, STR, PRES), _sed)

for _m in ("line", "area", "stack", "vspan", "heatmap"):
    macro(_m, f"{_m},:ls")
# group by the percentile tag, render as heatmap (StyleVocabulary.scala:108-112)
macro("percentiles-heatmap", "(,percentile,),:cg,heatmap,:ls")


def _strip_style(c: Context) -> None:
    v = c.pop()
    c.push(v.expr if isinstance(v, E.StyleExpr) else to_ts_expr(v))


w("strip-style", _match(PRES), _strip_style)

# ---------------------------------------------------------------- events

_CURRENT_VOCAB = "event"


def _ev_table(c: Context) -> None:
    cols = tuple(string_list(c.pop()))
    q = c.pop()
    c.push(E.EventTableExpr(q, cols))


w("table", _match(LST, QRY), _ev_table)


def _ev_sample(c: Context) -> None:
    proj = tuple(string_list(c.pop()))
    by = tuple(string_list(c.pop()))
    q = c.pop()
    c.push(E.EventSampleExpr(q, by, proj))


w("sample", _match(LST, LST, QRY), _ev_sample)


# ---------------------------------------------------------------------------


def default_interpreter(step: int = 3600) -> Interpreter:
    return Interpreter(WORDS, step=step)


def interpreter_for_vocab(name: str | None, step: int = 3600) -> Interpreter:
    """Interpreter scoped to the named vocabulary layer + dependencies
    (ExprApi.newInterpreter, ExprApi.scala:89-92); None = the full
    default vocabulary (all layers — unchanged default behavior)."""
    if name is None:
        return default_interpreter(step)
    return Interpreter(words_for_vocab(name), step=step)


def parse(
    program: str,
    step: int = 3600,
    vars: dict | None = None,
    features: str = "stable",
    vocab: str | None = None,
) -> list[E.TimeSeriesExpr]:
    """Execute a program and coerce the result stack to expressions the way
    the graph API does (bottom-first plot order)."""
    interp = interpreter_for_vocab(vocab, step)
    ctx = Context(interp, vars=dict(vars or {}), features=features)
    from .interpreter import split_and_trim

    interp.execute_program(split_and_trim(program), ctx)
    return coerce_stack(ctx)


def coerce_stack(ctx: Context) -> list[E.StyleExpr]:
    """Coerce a result stack to presentation expressions the way the graph
    API does (frozen items first, bottom-first plot order).  A leftover
    that is NOT presentation-coercible is a client error, not silently
    dropped (GraphConfig.parsedQuery, Grapher.scala:178-183:
    'expecting time series expr, found String ...')."""
    items = ctx.frozen + ctx.stack
    out = []
    for v in items:
        if isinstance(v, (E.TimeSeriesExpr, Q.Query)) or (
            isinstance(v, str) and is_number(v)
        ):
            out.append(to_style(v))
        else:
            tpe = type(v).__name__ if not isinstance(v, str) else "String"
            raise ValueError(f"expecting time series expr, found {tpe} '{v}'")
    return out
