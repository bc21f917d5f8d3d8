"""Config-driven vocabulary extensions.

Port of the reference's `CustomVocabulary`
(`atlas-core/.../model/CustomVocabulary.scala`): operators loaded from
configuration on top of the standard vocabulary.

Config is a plain dict (no HOCON dependency):

    {
      "words": [
        {"name": "square", "body": ":dup,:mul"},
      ],
      "custom-averages": [
        {
          "name": "node-avg",
          "base-query": "name,num.nodes,:eq",
          "keys": ["app", "cluster", "node"],
        },
      ],
    }

`words` become macros; `custom-averages` become words that pop a Query
and produce `Sum(q) / Sum(baseQuery AND commonQuery(q))` where the
common query is the user query restricted to the configured keys
(CustomVocabulary.scala:183-209 extractCommonQuery).  The result is a
NamedRewrite whose group-by rewrite (through `:cg`) groups the
numerator by all requested keys and the denominator only by keys the
base metric actually has.
"""

from __future__ import annotations

from ..model import expr as E
from ..model import query as Q
from .interpreter import AslError, Context, Interpreter, Word, split_and_trim
from .vocab import WORDS


def _restrict(q: Q.Query, keys: set[str]) -> Q.Query:
    """Rewrite key-query leaves for keys outside `keys` to :true, then
    simplify in ignore mode (extractCommonQuery)."""

    def go(q: Q.Query) -> Q.Query:
        if isinstance(q, Q.AndQuery):
            return Q.AndQuery(go(q.q1), go(q.q2))
        if isinstance(q, Q.OrQuery):
            return Q.OrQuery(go(q.q1), go(q.q2))
        if isinstance(q, Q.NotQuery):
            return Q.NotQuery(go(q.q))
        if isinstance(q, Q.KeyQuery) and q.k not in keys:
            return Q.TRUE
        return q

    return Q.simplify(go(q), ignore=True)


def _parse_query(s: str) -> Q.Query:
    from .vocab import default_interpreter

    stack = default_interpreter().execute(s)
    if len(stack) != 1 or not isinstance(stack[0], Q.Query):
        raise AslError(f"base-query must produce a single query: {s!r}")
    return stack[0]


def _custom_avg_word(name: str, base_query: Q.Query, keys: set[str]) -> Word:
    def build(q: Q.Query, ks: tuple[str, ...] = ()) -> E.TimeSeriesExpr:
        nq = _restrict(q, keys)
        num = E.AggrExpr(q, "sum")
        den = E.AggrExpr(Q.simplify(Q.AndQuery(base_query, nq)), "sum")
        if not ks:
            return E.BinaryMathExpr("div", num, den)
        # numerator grouped by all requested keys; denominator only by
        # the keys the base metric actually has (CustomAvg.apply)
        den_keys = tuple(k for k in ks if k in keys)
        gnum = E.GroupByExpr(q, num, tuple(ks))
        if den_keys:
            return E.BinaryMathExpr(
                "div", gnum, E.GroupByExpr(den.query, den, den_keys)
            )
        return E.BinaryMathExpr("div", gnum, den)

    def run(c: Context) -> None:
        q = c.pop()
        if not isinstance(q, Q.Query):
            raise AslError(f":{name} requires a query input")
        c.push(
            E.NamedRewrite(
                name,
                q,
                build(q),
                groupby_rewrite=lambda ks, q=q: build(q, tuple(ks)),
            )
        )

    return Word(name, lambda s: len(s) >= 1 and isinstance(s[-1], Q.Query), run)


def custom_words(config: dict) -> list[Word]:
    out: list[Word] = []
    for w in config.get("words", ()):
        body = w["body"]

        def run(c: Context, body=body) -> None:
            c.interpreter.execute_program(split_and_trim(body), c)

        # config words may be marked unstable (TypedMacro.scala:51 `stable`
        # flag): they then execute only under features=unstable
        out.append(Word(w["name"], lambda s: True, run, stable=w.get("stable", True)))
    for a in config.get("custom-averages", ()):
        out.append(
            _custom_avg_word(a["name"], _parse_query(a["base-query"]), set(a["keys"]))
        )
    return out


def custom_interpreter(config: dict, step: int = 3600) -> Interpreter:
    """Standard vocabulary + config-defined words."""
    return Interpreter(WORDS + custom_words(config), step=step)


def parse_custom(
    program: str,
    config: dict,
    step: int = 3600,
    vars: dict | None = None,
    features: str = "stable",
) -> list[E.TimeSeriesExpr]:
    """`vocab.parse` against a custom vocabulary."""
    from .vocab import coerce_stack

    interp = custom_interpreter(config, step)
    ctx = Context(interp, vars=dict(vars or {}), features=features)
    interp.execute_program(split_and_trim(program), ctx)
    return coerce_stack(ctx)
