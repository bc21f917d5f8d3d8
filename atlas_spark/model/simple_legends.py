"""Automatic human-readable legends (SimpleLegends.scala:29-150).

Enabled by default like the reference (`simple-legends-enabled = true`,
atlas-eval reference.conf:176): analyze the full expression list, find
the key/value pairs common to every expression, and give each line the
shortest label that still distinguishes it — the unique pairs when any
exist, the common ones otherwise, preferring the bare `name` value and
`$(key)` templates for grouped expressions.  Expressions carrying an
explicit `:legend` are honored untouched, and any failure falls back to
the default labels (presentation nicety, never an error).
"""

from __future__ import annotations

from functools import reduce

from . import expr as E
from . import query as Qm

_META = set(".^$*+?{}[]|()")


def _literal(pattern: str) -> str | None:
    """The literal string a pattern matches, or None if it carries any
    un-escaped regex construct (PatternMatcher prefix()/containedString()
    for the pure-literal patterns `:re`/`:starts`/`:ends`/`:contains`
    emit)."""
    out = []
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            out.append(pattern[i + 1])
            i += 2
        elif c in _META:
            return None
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _regex_presentation(q: Qm.RegexQuery) -> str:
    """Prefix/contains matchers display their literal; anything else —
    including end-anchored patterns like `:ends` — the raw pattern
    (SimpleLegends.scala:96-104: only isPrefixMatcher/isContainsMatcher
    get literal presentation)."""
    p = q.v
    body = p[2:] if p.startswith(".*") else p
    lit = _literal(body)
    return lit if lit is not None else q.v


def _key_values(q: Qm.Query) -> dict[str, str]:
    """Key/value pairs implied by a query (SimpleLegends.scala:82-94)."""
    if isinstance(q, Qm.AndQuery):
        return {**_key_values(q.q1), **_key_values(q.q2)}
    if isinstance(q, Qm.EqualQuery):
        return {q.k: q.v}
    if isinstance(
        q,
        (
            Qm.LessThanQuery,
            Qm.LessThanEqualQuery,
            Qm.GreaterThanQuery,
            Qm.GreaterThanEqualQuery,
        ),
    ):
        return {q.k: q.v}
    if isinstance(q, Qm.RegexQuery) and not isinstance(
        q, Qm.RegexIgnoreCaseQuery
    ):
        return {q.k: _regex_presentation(q)}
    if isinstance(q, Qm.RegexIgnoreCaseQuery):
        return {q.k: q.v}
    if isinstance(q, Qm.NotQuery) and isinstance(q.q, Qm.KeyValueQuery):
        return {k: f"!{v}" for k, v in _key_values(q.q).items()}
    return {}


def _strip_named_rewrites(e: E.TimeSeriesExpr) -> E.TimeSeriesExpr:
    """Custom averages (:avg, :dist-avg, :node-avg) are rewrites whose
    eval trees would confuse the legend; use the display side
    (SimpleLegends.scala:120-136)."""

    def fix(node):
        if isinstance(node, E.NamedRewrite):
            dob = node.display_obj
            if isinstance(dob, Qm.Query):
                aggr = E.AggrExpr(dob, "sum")
                keys = node.evaluated.group_keys()
                return E.GroupByExpr(dob, aggr, tuple(keys)) if keys else aggr
            if isinstance(dob, E.TimeSeriesExpr):
                return dob
        return node

    return E.rewrite_tree(e, fix)


def _extract_key_values(e: E.TimeSeriesExpr) -> dict[str, str]:
    data = _strip_named_rewrites(e).data_exprs()
    if not data:
        return {}
    return reduce(_intersect, [_key_values(d.query) for d in data])


def _intersect(m1: dict, m2: dict) -> dict:
    return {k: v for k, v in m1.items() if m2.get(k) == v}


def _with_legend(e: E.TimeSeriesExpr, legend: str, offset: bool) -> E.TimeSeriesExpr:
    if offset:
        legend = f"{legend} (offset=$(atlas.offset))"
    if isinstance(e, E.StyleExpr):
        return e.with_setting("legend", legend)
    return E.StyleExpr(e, (("legend", legend),))


def _generate_legend(
    e: E.TimeSeriesExpr, kv: dict[str, str], offset: bool
) -> E.TimeSeriesExpr:
    inner = e.expr if isinstance(e, E.StyleExpr) else e
    keys = inner.group_keys()
    if keys:
        fmt = " ".join(f"$({k})" for k in keys)
        return _with_legend(e, fmt, offset)
    if "name" in kv:
        return _with_legend(e, kv["name"], offset)
    legend = " ".join(v for _, v in sorted(kv.items()))
    return _with_legend(e, legend, offset)


def expr_offset(e: E.TimeSeriesExpr) -> int:
    """Seconds the expression's data reads are shifted by — the
    reference's StyleExpr.offset (min over data exprs); an inline
    `dur,:offset` sets it on the data expr (or a group-by's inner
    aggregate)."""
    offs = []
    for d in e.data_exprs():
        off = getattr(d, "offset", None)
        if off is None:
            off = getattr(getattr(d, "af", None), "offset", 0)
        offs.append(off or 0)
    return min(offs) if offs else 0


def generate(
    exprs: list[E.TimeSeriesExpr], offsets: list[bool] | None = None
) -> list[E.TimeSeriesExpr]:
    """Set legends in place of the long default expression labels
    (SimpleLegends.generate, SimpleLegends.scala:31-69).  `offsets[i]`
    marks expressions shifted via the legacy list-offset expansion; an
    inline `dur,:offset` is detected from the data exprs themselves —
    either way the legend gains the `(offset=$(atlas.offset))`
    annotation (withLegend checks expr.offset > 0)."""
    offsets = [
        bool(flag) or expr_offset(e) > 0
        for e, flag in zip(exprs, offsets or [False] * len(exprs))
    ]
    try:
        kvs = [_extract_key_values(e) for e in exprs]
        nonempty = [kv for kv in kvs if kv]
        if not nonempty:
            return exprs
        common = reduce(_intersect, nonempty)
        out = []
        for e, kv, off in zip(exprs, kvs, offsets):
            has_legend = (
                isinstance(e, E.StyleExpr) and "legend" in e.settings_dict()
            )
            if has_legend or not kv:
                out.append(e)
                continue
            uniq = {k: v for k, v in kv.items() if common.get(k) != v}
            if uniq:
                out.append(_generate_legend(e, uniq, off))
            elif common:
                out.append(_generate_legend(e, common, off))
            else:
                out.append(e)
        return out
    except Exception:  # noqa: BLE001 — presentation nicety, never an error
        return exprs
