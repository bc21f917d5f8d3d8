"""Expression splitter for streaming subscriptions.

Port of the lwcapi splitter semantics
(`atlas-lwcapi/.../ExpressionSplitter.scala:39-160`): a complete graph
expression is split into one subscription per underlying data expression
— the unit pushed back to the systems supplying data — each carrying a
"compressed" scoping query that keeps only the infrastructure keys used
to route subscriptions to clusters.  The wire protocol (SSE endpoints,
sync batching, Caffeine caching) is out of scope; the splitting and
compression semantics are what the streaming evaluator consumes.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from ..model import expr as E
from ..model import query as Q
from ..stacklang.vocab import parse as parse_asl

KEEP_KEYS = frozenset({"nf.app", "nf.cluster", "nf.shard1", "nf.shard2", "nf.stack"})


def compute_id(expression: str, expr_type: str, frequency: int) -> str:
    """ExpressionMetadata.computeId parity: sha1 of "freq~type~expr"
    (ExpressionMetadata.scala:51-53).  The single id formula for BOTH
    planes — data-plane Subscription and wire-plane ExpressionMetadata —
    so ids are interoperable across request and data planes."""
    return hashlib.sha1(f"{frequency}~{expr_type}~{expression}".encode()).hexdigest()


@dataclass(frozen=True)
class Subscription:
    """One data-expression subscription (Subscription + ExpressionMetadata)."""

    match_query: Q.Query  # compressed infrastructure-scoping query
    expr: str  # canonical data expression string
    expr_type: str = "TIME_SERIES"
    frequency: int = 60000
    id: str = field(default="")

    @staticmethod
    def make(match_query: Q.Query, expr: str, expr_type: str, frequency: int) -> "Subscription":
        sid = compute_id(expr, expr_type, frequency)
        return Subscription(match_query, expr, expr_type, frequency, sid)


def _cluster_of_asg(asg: str) -> str | None:
    """Frigga-style server-group name -> cluster: strip a trailing
    `-v###` sequence; invalid stems yield None."""
    m = re.match(r"^(.*)-v\d+$", asg)
    stem = m.group(1) if m else asg
    if not stem or not re.match(r"^[a-zA-Z0-9]", stem) or stem.endswith("-"):
        return None
    return stem


def _simplify(q: Q.Query) -> Q.Query:
    """The splitter's own simplification (ExpressionSplitter.scala:120-139):
    like constant folding but `:not` of a REMOVED (:true) clause must stay
    :true — the subscription scope may only widen, never exclude."""
    if isinstance(q, Q.AndQuery):
        q1, q2 = _simplify(q.q1), _simplify(q.q2)
        if isinstance(q1, Q.FalseQuery) or isinstance(q2, Q.FalseQuery):
            return Q.FALSE
        if isinstance(q1, Q.TrueQuery):
            return q2
        if isinstance(q2, Q.TrueQuery):
            return q1
        return Q.AndQuery(q1, q2)
    if isinstance(q, Q.OrQuery):
        q1, q2 = _simplify(q.q1), _simplify(q.q2)
        if isinstance(q1, Q.TrueQuery) or isinstance(q2, Q.TrueQuery):
            return Q.TRUE
        if isinstance(q1, Q.FalseQuery):
            return q2
        if isinstance(q2, Q.FalseQuery):
            return q1
        return Q.OrQuery(q1, q2)
    if isinstance(q, Q.NotQuery):
        inner = _simplify(q.q)
        if isinstance(inner, Q.TrueQuery):
            return Q.TRUE  # Not(True) stays True (scope only widens)
        if isinstance(inner, Q.FalseQuery):
            return Q.TRUE
        return Q.NotQuery(inner)
    return q


def compress(q: Q.Query, keep_keys: frozenset[str] = KEEP_KEYS) -> Q.Query:
    """Scope query: nf.asg matches map to their cluster, all non-keep
    key queries are dropped (ExpressionSplitter.scala:140-160)."""

    def go(q: Q.Query) -> Q.Query:
        if isinstance(q, Q.AndQuery):
            return Q.AndQuery(go(q.q1), go(q.q2))
        if isinstance(q, Q.OrQuery):
            return Q.OrQuery(go(q.q1), go(q.q2))
        if isinstance(q, Q.NotQuery):
            return Q.NotQuery(go(q.q))
        if isinstance(q, Q.EqualQuery) and q.k == "nf.asg":
            c = _cluster_of_asg(q.v)
            q = q if c is None else Q.EqualQuery("nf.cluster", c)
        elif isinstance(q, Q.InQuery) and q.k == "nf.asg":
            cs = tuple(c for c in (_cluster_of_asg(v) for v in q.vs) if c)
            q = q if not cs else Q.InQuery("nf.cluster", cs)
        if isinstance(q, Q.KeyQuery) and q.k not in keep_keys:
            return Q.TRUE
        return q

    return _simplify(go(q))


def _check_offsets(se: E.TimeSeriesExpr) -> None:
    for de in se.data_exprs():
        off = getattr(de, "offset", 0) or getattr(getattr(de, "af", None), "offset", 0)
        if off:
            raise ValueError(
                f":offset not supported for streaming evaluation [[{de.display()}]]"
            )


def split(
    expression: str,
    frequency: int = 60000,
    expr_type: str = "TIME_SERIES",
    keep_keys: frozenset[str] = KEEP_KEYS,
    step: int = 60,
) -> list[Subscription]:
    """Split a graph expression into data-expression subscriptions."""
    subs: list[Subscription] = []
    seen: set[str] = set()
    for se in parse_asl(expression, step=step):
        if expr_type == "EVENTS":
            node = se.expr if isinstance(se, E.StyleExpr) else se
            if isinstance(node, (E.EventTableExpr, E.EventSampleExpr)):
                subs.append(
                    Subscription.make(
                        compress(node.query, keep_keys), node.display(), expr_type, frequency
                    )
                )
            continue
        _check_offsets(se)
        for de in se.expr.data_exprs() if isinstance(se, E.StyleExpr) else se.data_exprs():
            ds = de.display()
            if ds in seen:
                continue
            seen.add(ds)
            subs.append(
                Subscription.make(compress(de.query, keep_keys), ds, expr_type, frequency)
            )
    return subs
