"""ASL (Atlas Stack Language) interpreter.

A comma-separated RPN program is executed by a pure stack machine
(reference: `atlas-core/.../stacklang/Interpreter.scala`):

  - tokens are comma-split and trimmed (Interpreter.scala:449-460)
  - `(` ... `)` collects the *raw tokens* into a list without executing
    them (Interpreter.scala:79-104); nesting allowed
  - `:word` dispatches to the first overload whose stack pattern matches
    (Interpreter.scala:40-72)
  - anything else is pushed as a string

Guards mirror the reference: max stack 1024, max call depth 10
(Interpreter.scala:29-33,120-135).

The result stack holds strings / lists / Query / TimeSeriesExpr /
StyleExpr items; `parse_exprs` coerces to presentation expressions the way
the graph API does (ModelDataTypes.PresentationType).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from ..model import expr as E
from ..model import query as Q

MAX_STACK = 1024
MAX_CALL_DEPTH = 10


class AslError(ValueError):
    pass


class UnknownWord(AslError):
    pass


def split_and_trim(program: str) -> list[str]:
    """Tokenize: split on commas, trim, drop empties (Interpreter.scala:449-460)."""
    out = []
    for part in program.split(","):
        part = part.strip()
        if part:
            out.append(part)
    return out


@dataclass
class Context:
    interpreter: "Interpreter"
    stack: list[Any] = field(default_factory=list)
    vars: dict[str, Any] = field(default_factory=dict)
    frozen: list[Any] = field(default_factory=list)
    call_depth: int = 0
    # initial variable bindings (for :get of URI params etc.)
    initial_vars: dict[str, Any] = field(default_factory=dict)
    # feature set for vocabulary gating (Context.scala:46, Features.java):
    # "stable" (default) rejects words marked unstable; "unstable" allows
    # early-adopter words
    features: str = "stable"

    def push(self, v: Any) -> None:
        self.stack.append(v)
        if len(self.stack) > MAX_STACK:
            raise AslError(f"stack overflow: exceeds limit of {MAX_STACK}")

    def pop(self) -> Any:
        if not self.stack:
            raise AslError("pop on empty stack")
        return self.stack.pop()


@dataclass
class Word:
    """One overload of a word: `matcher` inspects the stack top-down.

    `stable=False` marks early-adopter words that execute only when the
    context enables unstable features (Word.scala:41,
    Interpreter.scala:44-47)."""

    name: str
    matcher: Callable[[list[Any]], bool]
    executor: Callable[[Context], None]
    stable: bool = True
    # owning vocabulary layer (std/query/data/math/stateful/filter/
    # style/event) — the reference's Vocabulary membership, used by the
    # /api/v1/expr `vocab` parameter to build layered interpreters
    vocab: str = "std"


class Interpreter:
    def __init__(self, words: list[Word], step: int = 3600):
        self.step = step  # used to resolve duration params to step counts
        self.words: dict[str, list[Word]] = {}
        for w in words:
            self.words.setdefault(w.name, []).append(w)

    # ------------------------------------------------------------------ run

    def execute(
        self,
        program: str,
        vars: dict[str, Any] | None = None,
        features: str = "stable",
    ) -> list[Any]:
        ctx = Context(
            self, vars=dict(vars or {}), initial_vars=dict(vars or {}),
            features=features,
        )
        self.execute_program(split_and_trim(program), ctx)
        return ctx.stack

    def execute_program(self, tokens: list[Any], ctx: Context) -> None:
        ctx.call_depth += 1
        if ctx.call_depth > MAX_CALL_DEPTH:
            raise AslError("looping detected")
        i = 0
        while i < len(tokens):
            t = tokens[i]
            if t == "(":
                lst, i = self._collect_list(tokens, i + 1)
                ctx.push(lst)
                continue
            if t == ")":
                raise AslError("unmatched closing parenthesis")
            if isinstance(t, str) and t.startswith(":"):
                self.execute_word(t[1:], ctx)
            else:
                ctx.push(t)
            i += 1
        ctx.call_depth -= 1

    def _collect_list(self, tokens: list[Any], i: int) -> tuple[list[Any], int]:
        out: list[Any] = []
        depth = 0
        while i < len(tokens):
            t = tokens[i]
            if t == "(":
                depth += 1
                out.append(t)
            elif t == ")":
                if depth == 0:
                    return out, i + 1
                depth -= 1
                out.append(t)
            else:
                out.append(t)
            i += 1
        raise AslError("unmatched opening parenthesis")

    def execute_word(self, name: str, ctx: Context) -> None:
        overloads = self.words.get(name)
        if not overloads:
            raise UnknownWord(f"unknown word ':{name}'")
        for w in overloads:
            if w.matcher(ctx.stack):
                # stability gate runs on the MATCHED overload, before
                # execution (Interpreter.scala:44-47)
                if not w.stable and ctx.features != "unstable":
                    raise AslError(f"to use :{name} enable unstable features")
                w.executor(ctx)
                return
        raise AslError(
            f"no matching overload for ':{name}' on stack "
            f"{[type(x).__name__ for x in reversed(ctx.stack[-3:])]}"
        )


# ---------------------------------------------------------------------------
# type coercions (ModelDataTypes.scala:83-116)


def is_number(v: Any) -> bool:
    if not isinstance(v, str):
        return isinstance(v, (int, float))
    try:
        float(v)
        return True
    except ValueError:
        return False


def to_ts_expr(v: Any) -> E.TimeSeriesExpr:
    """TimeSeriesExprType coercion: numeric string -> Const, Query -> Sum."""
    if isinstance(v, E.TimeSeriesExpr):
        return v
    if isinstance(v, Q.Query):
        return E.AggrExpr(v, "sum")
    if isinstance(v, (int, float)):
        return E.ConstExpr(float(v))
    if isinstance(v, str) and is_number(v):
        return E.ConstExpr(float(v))
    raise AslError(f"cannot coerce {v!r} to TimeSeriesExpr")


def is_ts_like(v: Any) -> bool:
    return (
        isinstance(v, (E.TimeSeriesExpr, Q.Query))
        or (isinstance(v, str) and is_number(v))
        or isinstance(v, (int, float))
    )


def to_style(v: Any) -> E.StyleExpr:
    if isinstance(v, E.StyleExpr):
        return v
    return E.StyleExpr(to_ts_expr(v))


def string_list(v: Any) -> list[str]:
    if not isinstance(v, list) or not all(isinstance(x, str) for x in v):
        raise AslError(f"expected list of strings, got {v!r}")
    return v
