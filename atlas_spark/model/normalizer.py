"""Canonical expression normalization (ExprNormalizer.scala:23-186).

Normalizes style expressions into consistent, comparable string forms —
the engine behind `/api/v1/expr/normalize`:

 - legend variables always use the parenthesised form `$(var)`
   (ExprNormalizer.scala:76-81)
 - `expr,stat,:stat` inside a `:filter` predicate collapses to the
   aggregate placeholder `:stat-<s>` when it references the filtered
   expression itself (ExprNormalizer.scala:83-104)
 - every leaf query is simplified, expanded to DNF, each disjunct's
   clauses normalized (`:in` sorted/distinct, single-value `:in` ->
   `:eq`), deduped and sorted by key importance (prefix keys first,
   regular keys lexical, suffix keys last: ExprNormalizer.scala:128-166
   + atlas.core.normalize reference.conf), redundant disjuncts removed
   (ExprNormalizer.scala:112-126), then rebuilt left-associated
 - the rendered string drops explicit `,:const` / `,:line` suffixes
   (ExprNormalizer.scala:42-46)
"""

from __future__ import annotations

import functools

from ..util.strings import substitute
from . import expr as E
from . import query as Qm

# atlas.core.normalize defaults (atlas-core reference.conf:28-47)
PREFIX_KEYS = (
    "name",
    "nf.app",
    "nf.stack",
    "nf.cluster",
    "nf.asg",
    "nf.region",
    "nf.zone",
    "nf.node",
)
SUFFIX_KEYS = ("statistic",)


def _leading_key(q: Qm.Query) -> str:
    """First key down the left spine (ExprNormalizer.scala:168-178)."""
    while True:
        if isinstance(q, Qm.KeyQuery):
            return q.k
        if isinstance(q, (Qm.AndQuery, Qm.OrQuery)):
            q = q.q1
        elif isinstance(q, Qm.NotQuery):
            q = q.q
        else:
            return ""


def _cmp(a, b) -> int:
    return (a > b) - (a < b)


def _query_cmp(
    q1: Qm.Query,
    q2: Qm.Query,
    prefix: dict[str, int],
    suffix: dict[str, int],
) -> int:
    """newQueryOrdering (ExprNormalizer.scala:128-166): prefix keys by
    position, then regular keys, then suffix keys by position; ties by
    the full clause string."""
    k1, k2 = _leading_key(q1), _leading_key(q2)
    if k1 == k2:
        return _cmp(q1.display(), q2.display())
    p1, p2 = prefix.get(k1, -1), prefix.get(k2, -1)
    s1, s2 = suffix.get(k1, -1), suffix.get(k2, -1)
    if p1 >= 0 and p2 >= 0:
        return _cmp(p1, p2)
    if p1 >= 0:
        return -1
    if p2 >= 0:
        return 1
    if s1 >= 0 and s2 < 0:
        return 1
    if s2 >= 0 and s1 < 0:
        return -1
    if s1 >= 0 and s2 >= 0:
        return _cmp(s1, s2)
    return _cmp(q1.display(), q2.display())


def _normalize_clauses(q: Qm.Query) -> Qm.Query:
    """`:in` values sorted/distinct; single-value `:in` -> `:eq`
    (ExprNormalizer.scala:106-114)."""
    if isinstance(q, Qm.InQuery):
        values = tuple(sorted(set(q.vs)))
        if len(values) == 1:
            return Qm.EqualQuery(q.k, values[0])
        return Qm.InQuery(q.k, values)
    return q


def _remove_redundant(disjuncts: list[list[Qm.Query]]) -> list[list[Qm.Query]]:
    """Drop any disjunct that is a superset of EVERY other disjunct — it
    can never broaden the match (ExprNormalizer.scala:116-132).

    Deliberately a verbatim port of the reference's `forall` condition,
    quirk included: with three or more disjuncts, a disjunct implied by
    ONE sibling but not all of them survives (e.g. `(a AND b) OR a OR c`
    keeps the `a AND b` term), exactly as the reference endpoint
    renders it."""
    if len(disjuncts) <= 1:
        return disjuncts
    indexed = [(qs, frozenset(c.display() for c in qs)) for qs in disjuncts]
    return [
        qs
        for qs, qset in indexed
        if not all(s <= qset for _, s in indexed)
    ]


class ExprNormalizer:
    """Port of the reference normalizer; prefix/suffix key lists are the
    shipping defaults but overridable like `atlas.core.normalize`."""

    def __init__(
        self,
        prefix_keys: tuple[str, ...] = PREFIX_KEYS,
        suffix_keys: tuple[str, ...] = SUFFIX_KEYS,
    ):
        self._prefix = {k: i for i, k in enumerate(prefix_keys)}
        self._suffix = {k: i for i, k in enumerate(suffix_keys)}

    # -- query canonicalization ------------------------------------------

    def sort_query(self, query: Qm.Query) -> Qm.Query:
        simplified = Qm.simplify(query)
        key_fn = functools.cmp_to_key(
            lambda a, b: _query_cmp(a, b, self._prefix, self._suffix)
        )
        seen: set[tuple[str, ...]] = set()
        normalized: list[list[Qm.Query]] = []
        for d in Qm.dnf_list(simplified):
            clauses = [_normalize_clauses(c) for c in Qm.cnf_list(d)]
            uniq: list[Qm.Query] = []
            displays: set[str] = set()
            for c in clauses:
                if c.display() not in displays:
                    displays.add(c.display())
                    uniq.append(c)
            uniq.sort(key=key_fn)
            sig = tuple(c.display() for c in uniq)
            if sig not in seen:
                seen.add(sig)
                normalized.append(uniq)
        kept = _remove_redundant(normalized)
        ands = [functools.reduce(Qm.AndQuery, qs) for qs in kept]
        ands.sort(key=lambda q: q.display())
        return functools.reduce(Qm.OrQuery, ands)

    # -- expression-level passes -----------------------------------------

    @staticmethod
    def normalize_legend_vars(se: E.TimeSeriesExpr) -> E.TimeSeriesExpr:
        if isinstance(se, E.StyleExpr):
            legend = se.settings_dict().get("legend")
            if legend is not None:
                return se.with_setting(
                    "legend", substitute(legend, lambda k: f"$({k})")
                )
        return se

    @staticmethod
    def normalize_stat(se: E.TimeSeriesExpr) -> E.TimeSeriesExpr:
        def fix(node):
            if isinstance(node, E.FilterOpExpr):
                ts1 = node.expr

                def sub(n):
                    if (
                        isinstance(n, E.StatExpr)
                        and n.expr == ts1
                        and n.stat in E.STATS
                    ):
                        return E.StatPlaceholder(n.stat)
                    return n

                return E.FilterOpExpr(ts1, E.rewrite_tree(node.pred, sub))
            return node

        return E.rewrite_tree(se, fix)

    def normalize(self, se: E.TimeSeriesExpr) -> E.TimeSeriesExpr:
        out = self.normalize_legend_vars(se)
        out = self.normalize_stat(out)
        return out.rewrite_queries(self.sort_query)

    def normalize_to_string(self, se: E.TimeSeriesExpr) -> str:
        # the textual strips are verbatim reference behavior
        # (ExprNormalizer.scala:42-46), quirks included
        return (
            self.normalize(se).display().replace(",:const", "").replace(",:line", "")
        )
