"""Query AST — tag-predicate algebra.

Semantics follow the reference query model
(`atlas-core/.../model/Query.scala`): queries are boolean predicates over a
string->string tag map.  Comparisons (`:lt`, `:gt`, ...) are *lexicographic
string* comparisons (Query.scala:361-403); regexes are anchored at the start
(Query.scala:410-434).

The AST is pure Python (no Spark imports) so that both the Spark plan
builder (`atlas_spark/plans/builder.py`) and the DuckDB oracle SQL generator
(`atlas_spark/oracle/sqlgen.py`) can walk it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class Query:
    """Base class for tag-map predicates."""

    # -- evaluation against a plain python dict (used for tests / events) --
    def matches(self, tags: dict[str, str]) -> bool:
        raise NotImplementedError

    def could_match(self, tags: dict[str, str]) -> bool:
        """Whether the query could match given only a PARTIAL tag map —
        keys absent from `tags` are unconstrained (Query.scala:321-341,
        466-501).  Used for cluster-scoped subscription routing."""
        return self.matches(tags)

    def display(self) -> str:
        """Canonical ASL (RPN) string form."""
        raise NotImplementedError

    def __str__(self) -> str:  # pragma: no cover
        return self.display()

    # -- algebra utilities (Query.scala:71-240) --
    def exact_keys(self) -> dict[str, str]:
        """Tag keys with exact `:eq` values under top-level `:and` chains.

        Mirrors `Query.tags` (Query.scala:96-107): used to compute result
        tags of aggregate expressions.
        """
        return _exact_tags(self)

    def all_keys(self) -> set[str]:
        return _all_keys(self)

    def and_(self, other: "Query") -> "Query":
        return simplify(AndQuery(self, other))

    def or_(self, other: "Query") -> "Query":
        return simplify(OrQuery(self, other))

    def not_(self) -> "Query":
        return simplify(NotQuery(self))


@dataclass(frozen=True)
class TrueQuery(Query):
    def matches(self, tags):
        return True

    def display(self):
        return ":true"


@dataclass(frozen=True)
class FalseQuery(Query):
    def matches(self, tags):
        return False

    def display(self):
        return ":false"


@dataclass(frozen=True)
class KeyQuery(Query):
    """Base for single-key predicates."""

    k: str

    def could_match(self, tags):
        return self.k not in tags or self.matches(tags)


@dataclass(frozen=True)
class HasKeyQuery(KeyQuery):
    def matches(self, tags):
        return self.k in tags

    def could_match(self, tags):
        # a partial map never disproves key presence (Query.scala:341)
        return True

    def display(self):
        return f"{self.k},:has"


@dataclass(frozen=True)
class KeyValueQuery(KeyQuery):
    v: str


@dataclass(frozen=True)
class EqualQuery(KeyValueQuery):
    def matches(self, tags):
        return tags.get(self.k) == self.v

    def display(self):
        return f"{self.k},{self.v},:eq"


@dataclass(frozen=True)
class LessThanQuery(KeyValueQuery):
    def matches(self, tags):
        t = tags.get(self.k)
        return t is not None and t < self.v

    def display(self):
        return f"{self.k},{self.v},:lt"


@dataclass(frozen=True)
class LessThanEqualQuery(KeyValueQuery):
    def matches(self, tags):
        t = tags.get(self.k)
        return t is not None and t <= self.v

    def display(self):
        return f"{self.k},{self.v},:le"


@dataclass(frozen=True)
class GreaterThanQuery(KeyValueQuery):
    def matches(self, tags):
        t = tags.get(self.k)
        return t is not None and t > self.v

    def display(self):
        return f"{self.k},{self.v},:gt"


@dataclass(frozen=True)
class GreaterThanEqualQuery(KeyValueQuery):
    def matches(self, tags):
        t = tags.get(self.k)
        return t is not None and t >= self.v

    def display(self):
        return f"{self.k},{self.v},:ge"


def _check_re_features(v: str) -> None:
    """The reference's pattern matcher supports neither inline flag groups
    (`(?i)`) nor back references (`\\1`); both must surface as CLIENT
    errors (ExprApiSuite.scala:52-60; Query.scala:410-434 via spectator's
    PatternMatcher).  Non-capturing groups `(?:` stay allowed.  The scan
    walks escape PAIRS so escaping is handled exactly: `\\1` is a back
    reference, `\\\\1` is an escaped backslash followed by a literal `1`
    (what `re.escape` emits for a value containing `\\1`), and `\\\\(?i)`
    is still a real inline-flag group."""
    i, n = 0, len(v)
    while i < n:
        c = v[i]
        if c == "\\":
            if i + 1 < n and v[i + 1] in "123456789":
                raise ValueError(
                    f"unsupported regex feature '\\{v[i + 1]}' in pattern: {v}"
                )
            i += 2  # escape pair (trailing lone backslash: re.compile errors)
        elif c == "(" and i + 1 < n and v[i + 1] == "?":
            if i + 2 >= n or v[i + 2] != ":":
                raise ValueError(
                    f"unsupported regex feature '(?' in pattern: {v}"
                )
            i += 3
        else:
            i += 1


@dataclass(frozen=True)
class RegexQuery(KeyValueQuery):
    """Regex anchored at the start (Query.scala:410-421)."""

    def __post_init__(self):
        _check_re_features(self.v)

    def _pattern(self) -> re.Pattern:
        return re.compile("^" + self.v)

    def matches(self, tags):
        t = tags.get(self.k)
        return t is not None and self._pattern().search(t) is not None

    def display(self):
        return f"{self.k},{self.v},:re"


@dataclass(frozen=True)
class RegexIgnoreCaseQuery(KeyValueQuery):
    def __post_init__(self):
        _check_re_features(self.v)

    def _pattern(self) -> re.Pattern:
        return re.compile("^" + self.v, re.IGNORECASE)

    def matches(self, tags):
        t = tags.get(self.k)
        return t is not None and self._pattern().search(t) is not None

    def display(self):
        return f"{self.k},{self.v},:reic"


@dataclass(frozen=True)
class InQuery(KeyQuery):
    vs: tuple[str, ...]

    def matches(self, tags):
        return tags.get(self.k) in self.vs

    def display(self):
        return f"{self.k},(,{','.join(self.vs)},),:in"


@dataclass(frozen=True)
class AndQuery(Query):
    q1: Query
    q2: Query

    def matches(self, tags):
        return self.q1.matches(tags) and self.q2.matches(tags)

    def could_match(self, tags):
        return self.q1.could_match(tags) and self.q2.could_match(tags)

    def display(self):
        return f"{self.q1.display()},{self.q2.display()},:and"


@dataclass(frozen=True)
class OrQuery(Query):
    q1: Query
    q2: Query

    def matches(self, tags):
        return self.q1.matches(tags) or self.q2.matches(tags)

    def could_match(self, tags):
        return self.q1.could_match(tags) or self.q2.could_match(tags)

    def display(self):
        return f"{self.q1.display()},{self.q2.display()},:or"


@dataclass(frozen=True)
class NotQuery(Query):
    q: Query

    def matches(self, tags):
        return not self.q.matches(tags)

    def could_match(self, tags):
        # deliberately `matches`, not `could_match` (Query.scala:501):
        # Not(k,:has) over a map missing k must stay possible
        return not self.q.matches(tags)

    def display(self):
        return f"{self.q.display()},:not"


TRUE = TrueQuery()
FALSE = FalseQuery()


def simplify(q: Query, ignore: bool = False) -> Query:
    """Constant folding (Query.scala:218-256).

    With `ignore=True` a `:true` inside an OR is treated as "ignore this
    clause" and dropped rather than collapsing the OR to true — used when
    rewriting away query clauses (e.g. CustomVocabulary common-query
    extraction)."""
    if isinstance(q, AndQuery):
        q1, q2 = simplify(q.q1, ignore), simplify(q.q2, ignore)
        if isinstance(q1, FalseQuery) or isinstance(q2, FalseQuery):
            return FALSE
        if isinstance(q1, TrueQuery):
            return q2
        if isinstance(q2, TrueQuery):
            return q1
        return AndQuery(q1, q2)
    if isinstance(q, OrQuery):
        q1, q2 = simplify(q.q1, ignore), simplify(q.q2, ignore)
        if isinstance(q1, TrueQuery) or isinstance(q2, TrueQuery):
            if not ignore:
                return TRUE
            if isinstance(q1, TrueQuery) and isinstance(q2, TrueQuery):
                return TRUE
            return q2 if isinstance(q1, TrueQuery) else q1
        if isinstance(q1, FalseQuery):
            return q2
        if isinstance(q2, FalseQuery):
            return q1
        return OrQuery(q1, q2)
    if isinstance(q, NotQuery):
        inner = simplify(q.q, ignore)
        if isinstance(inner, TrueQuery):
            return FALSE
        if isinstance(inner, FalseQuery):
            return TRUE
        if isinstance(inner, NotQuery):
            return inner.q
        return NotQuery(inner)
    return q


def cq(q: Query, common: Query) -> Query:
    """`:cq` — AND `common` into the query (applied per leaf data expr by the
    expr layer; at the query level it is a plain conjunction,
    QueryVocabulary.scala:598-635)."""
    return simplify(AndQuery(q, common))


def cnf_list(q: Query) -> list[Query]:
    """Conjunctive normal form clause list (Query.scala:110-135)."""
    q = simplify(q)
    if isinstance(q, AndQuery):
        return cnf_list(q.q1) + cnf_list(q.q2)
    if isinstance(q, OrQuery):
        l1 = cnf_list(q.q1)
        l2 = cnf_list(q.q2)
        return [_or_all([a, b]) for a in l1 for b in l2]
    if isinstance(q, NotQuery):
        inner = q.q
        if isinstance(inner, AndQuery):
            return cnf_list(OrQuery(NotQuery(inner.q1), NotQuery(inner.q2)))
        if isinstance(inner, OrQuery):
            return cnf_list(AndQuery(NotQuery(inner.q1), NotQuery(inner.q2)))
        return [q]
    return [q]


def dnf_list(q: Query) -> list[Query]:
    """Disjunctive normal form clause list (Query.scala:137-159)."""
    q = simplify(q)
    if isinstance(q, OrQuery):
        return dnf_list(q.q1) + dnf_list(q.q2)
    if isinstance(q, AndQuery):
        l1 = dnf_list(q.q1)
        l2 = dnf_list(q.q2)
        return [_and_all([a, b]) for a in l1 for b in l2]
    if isinstance(q, NotQuery):
        inner = q.q
        if isinstance(inner, AndQuery):
            return dnf_list(OrQuery(NotQuery(inner.q1), NotQuery(inner.q2)))
        if isinstance(inner, OrQuery):
            return dnf_list(AndQuery(NotQuery(inner.q1), NotQuery(inner.q2)))
        return [q]
    return [q]


def _and_all(qs: list[Query]) -> Query:
    out: Query = TRUE
    for q in qs:
        out = simplify(AndQuery(out, q)) if not isinstance(out, TrueQuery) else q
    return out


def _or_all(qs: list[Query]) -> Query:
    out: Query = FALSE
    for q in qs:
        out = simplify(OrQuery(out, q)) if not isinstance(out, FalseQuery) else q
    return out


def _exact_tags(q: Query) -> dict[str, str]:
    if isinstance(q, EqualQuery):
        return {q.k: q.v}
    if isinstance(q, AndQuery):
        out = dict(_exact_tags(q.q1))
        out.update(_exact_tags(q.q2))
        return out
    return {}


def _all_keys(q: Query) -> set[str]:
    if isinstance(q, KeyQuery):
        return {q.k}
    if isinstance(q, AndQuery) or isinstance(q, OrQuery):
        return _all_keys(q.q1) | _all_keys(q.q2)
    if isinstance(q, NotQuery):
        return _all_keys(q.q)
    return set()
