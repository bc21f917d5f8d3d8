"""ASL editor tooling (LSP-lite).

The reference ships a language-server module for the stack language:
per-token diagnostics with source positions, hover documentation from a
word glossary, completion, and semantic tokens
(atlas-lsp/.../AslDocumentAnalyzer.scala, Glossary.scala,
AslTokenTypes.scala:25-52), framed over a WebSocket LSP endpoint
(atlas-lspapi/.../LspApi.scala).  This module provides the same analyzer
outputs as plain JSON-shaped dicts, served by `http_api` under
`/api/v1/lsp/*` (HTTP JSON in place of WebSocket LSP framing — the
documented stdlib-equivalent substitution, like SSE for the push
channel).

Driver-side pure Python: the analyzer replays the expression through the
stack interpreter (`stacklang/interpreter.py`), so diagnostics reflect
the REAL vocabulary and overload matching, not a parallel grammar.
"""

from __future__ import annotations

import difflib
from dataclasses import dataclass
from typing import Any

from .stacklang.interpreter import AslError, Context, UnknownWord
from .stacklang.vocab import WORDS, default_interpreter

# Semantic token type indices (AslTokenTypes.scala:25-52; the legend the
# reference registers maps these to LSP SemanticTokenTypes).
TT_WORD = 0
TT_STRING = 1
TT_NUMBER = 2
TT_PAREN = 3
TT_UNKNOWN_WORD = 4
TT_COMMENT = 5
TT_PARAMETER = 6
TT_URI_OPERATOR = 7
TT_PATH = 8

TOKEN_LEGEND = [
    "function", "string", "number", "operator", "variable",
    "comment", "parameter", "operator", "namespace",
]


@dataclass(frozen=True)
class Token:
    """One source token with its character span (half-open)."""

    text: str
    start: int
    end: int


def tokenize(text: str) -> list[Token]:
    """Comma-split tokenizer that keeps character offsets — the span-aware
    variant of `split_and_trim` (Interpreter.scala:449-460): tokens are
    trimmed, empties dropped, offsets index the ORIGINAL text."""
    out: list[Token] = []
    pos = 0
    for part in text.split(","):
        stripped = part.strip()
        if stripped:
            start = pos + part.index(stripped[0])
            out.append(Token(stripped, start, start + len(stripped)))
        pos += len(part) + 1  # +1 for the comma
    return out


def _position(text: str, offset: int) -> dict[str, int]:
    """Absolute offset -> LSP Position {line, character} (the reference's
    offsetToPosition, AslDocumentAnalyzer.scala:1370-1374)."""
    line = text.count("\n", 0, offset)
    nl = text.rfind("\n", 0, offset)
    return {"line": line, "character": offset - (nl + 1)}


def _range(text: str, start: int, end: int) -> dict:
    return {"start": _position(text, start), "end": _position(text, end)}


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


# --------------------------------------------------------------- glossary

_SIG_Q = "String String -- Query"
_SIG_TS1 = "TimeSeriesExpr -- TimeSeriesExpr"
_SIG_TS2 = "TimeSeriesExpr TimeSeriesExpr -- TimeSeriesExpr"
_SIG_STYLE = "TimeSeriesExpr String -- StyleExpr"


def _entry(signature: str, summary: str, *examples: str) -> dict:
    return {"signature": signature, "summary": summary, "examples": list(examples)}


def _build_glossary() -> dict[str, dict]:
    """Hover documentation for every vocabulary word — the word-docs role
    of the reference Glossary (Glossary.scala) plus Word.signature /
    Word.summary surfaced in wordHover (AslDocumentAnalyzer.scala:821-842).
    Text is original; signatures use the reference's `inputs -- outputs`
    stack-effect convention."""
    g: dict[str, dict] = {}

    # ----- query predicates
    g["true"] = _entry("-- Query", "Query matching every datapoint.", ":true,:sum")
    g["false"] = _entry("-- Query", "Query matching nothing.", ":false,:sum")
    g["has"] = _entry("String -- Query", "Match series where the tag key is present.", "cluster,:has")
    for name, op in [
        ("eq", "equals"), ("lt", "is lexicographically less than"),
        ("le", "is at most"), ("gt", "is greater than"), ("ge", "is at least"),
    ]:
        g[name] = _entry(_SIG_Q, f"Match series where the tag value {op} the given string.", f"name,cpu,:{name}")
    g["re"] = _entry(_SIG_Q, "Match the tag value against a start-anchored regular expression.", "name,cpu.*,:re")
    g["reic"] = _entry(_SIG_Q, "Case-insensitive start-anchored regex match on the tag value.", "name,CPU.*,:reic")
    g["contains"] = _entry(_SIG_Q, "Match series whose tag value contains the substring.", "name,user,:contains")
    g["starts"] = _entry(_SIG_Q, "Match series whose tag value starts with the prefix.", "name,sys,:starts")
    g["ends"] = _entry(_SIG_Q, "Match series whose tag value ends with the suffix.", "name,Time,:ends")
    g["in"] = _entry("String List -- Query", "Match series whose tag value is one of the listed strings.", "name,(,cpu,disk,),:in")
    g["and"] = _entry("Query Query -- Query", "Both sub-queries must match.  On two time series: truthy intersection signal.")
    g["or"] = _entry("Query Query -- Query", "Either sub-query may match.  On two time series: truthy union signal.")
    g["not"] = _entry("Query -- Query", "Invert the query.")
    g["cq"] = _entry("Expr Query -- Expr", "AND a common query onto every data query in the expression (frozen stack exempt).", "name,cpu,:eq,:sum,nf.app,www,:eq,:cq")

    # ----- data expressions
    g["all"] = _entry("Query -- DataExpr", "One line per matching series, no aggregation.")
    for name in ("sum", "count", "min", "max"):
        g[name] = _entry(
            "Query -- DataExpr",
            f"Aggregate matching series into one line with {name} (also folds N lines when applied to an expression list).",
            f"name,cpu,:eq,:{name}",
        )
    g["by"] = _entry("DataExpr List -- DataExpr", "Group the aggregate by the listed tag keys; series missing a key drop out.", "name,cpu,:eq,:sum,(,nf.node,),:by")
    g["offset"] = _entry("TimeSeriesExpr Duration -- TimeSeriesExpr", "Shift the data window back by the duration (data variant; list form is deprecated).", "name,cpu,:eq,:sum,1w,:offset")
    for cf in ("sum", "avg", "min", "max"):
        g[f"cf-{cf}"] = _entry("DataExpr -- DataExpr", f"Select the {cf} consolidation function for mapping step cells onto the output grid.")
    g["avg"] = _entry("Query -- TimeSeriesExpr", "Average of matching series (sum divided by count).", "name,cpu,:eq,:avg")
    g["stddev"] = _entry("Query -- TimeSeriesExpr", "Population standard deviation across matching series.")
    g["pct"] = _entry("TimeSeriesExpr -- TimeSeriesExpr", "Each grouped line as a percentage of the group total per interval.")
    g["dist-avg"] = _entry("Query -- TimeSeriesExpr", "Average from Spectator percentile-distribution counters (totalAmount/count).")
    g["dist-max"] = _entry("Query -- TimeSeriesExpr", "Max statistic from percentile-distribution counters.")
    g["dist-stddev"] = _entry("Query -- TimeSeriesExpr", "Standard deviation from percentile-distribution counters.")
    g["median"] = _entry("Query -- TimeSeriesExpr", "50th percentile estimate from percentile bucket counters.")
    g["percentiles"] = _entry("Query List -- TimeSeriesExpr", "Percentile estimates from Spectator bucket counters, one line per level.", "name,latency,:eq,(,50,90,99,),:percentiles")
    g["sample-count"] = _entry("Query String String -- TimeSeriesExpr", "Rate of samples whose measured value falls between the two bounds, from percentile buckets.")
    g["approx-distinct"] = _entry("Query -- TimeSeriesExpr", "Approximate distinct-value count per interval (register sketch).")
    g["approx-distinct-cumulative"] = _entry("Query -- TimeSeriesExpr", "Running approximate distinct count from the window start.")

    # ----- math
    for name, desc in [
        ("abs", "absolute value"), ("neg", "negation"), ("sin", "sine"),
        ("sqrt", "square root"), ("cos", "cosine"), ("tan", "tangent"),
        ("cot", "cotangent"), ("sec", "secant"), ("csc", "cosecant"),
    ]:
        g[name] = _entry(_SIG_TS1, f"Apply {desc} to each value.")
    g["per-step"] = _entry(_SIG_TS1, "Convert a per-second rate to an amount per step interval.")
    g["clamp-min"] = _entry("TimeSeriesExpr Double -- TimeSeriesExpr", "Raise values below the floor to the floor.")
    g["clamp-max"] = _entry("TimeSeriesExpr Double -- TimeSeriesExpr", "Lower values above the cap to the cap.")
    g["add"] = _entry(_SIG_TS2, "Pairwise addition treating NaN as missing (NaN+x=x).")
    g["sub"] = _entry(_SIG_TS2, "Pairwise subtraction treating NaN as missing.")
    g["mul"] = _entry(_SIG_TS2, "Pairwise multiplication (0*NaN rules apply).")
    g["div"] = _entry(_SIG_TS2, "Pairwise division: 0/0 is 0, x/0 is NaN.")
    g["pow"] = _entry(_SIG_TS2, "Pairwise exponentiation.")
    for name in ("fadd", "fsub", "fmul", "fdiv"):
        g[name] = _entry(_SIG_TS2, f"Strict IEEE-754 float {name[1:]} — NaN propagates.")
    g["const"] = _entry("Double -- TimeSeriesExpr", "Constant-valued line.", "42,:const")
    g["pi"] = _entry("-- TimeSeriesExpr", "Constant line with the value of pi.")
    g["random"] = _entry("-- TimeSeriesExpr", "Deterministic pseudo-random noise line seeded by the timestamp.")
    g["srandom"] = _entry("TimeSeriesExpr -- TimeSeriesExpr", "Seeded pseudo-random noise line.")
    g["time"] = _entry("String -- TimeSeriesExpr", "Time component line (a ChronoField name, or seconds since the epoch).", "hourOfDay,:time")
    g["time-span"] = _entry("String String -- TimeSeriesExpr", "1 inside the [start, end] span, 0 outside.", "e-30m,e,:time-span")
    g["as"] = _entry("TimeSeriesExpr String String -- TimeSeriesExpr", "Rename a result tag key.")
    g["named-rewrite"] = _entry("Expr Expr String -- Expr", "Wrap an expression so it displays under the original form's name.")
    g["cg"] = _entry("TimeSeriesExpr List -- TimeSeriesExpr", "Common group-by: apply :by to every data expression within.")
    g["stat"] = _entry("TimeSeriesExpr String -- TimeSeriesExpr", "Summary statistic of each line spread across the window (avg/max/min/last/total/count).", "name,cpu,:eq,:sum,max,:stat")
    for s in ("avg", "max", "min", "count", "last", "total"):
        g[f"stat-{s}"] = _entry("-- TimeSeriesExpr", f"Placeholder for the line's {s} statistic inside a :filter predicate.")
    for s in ("avg", "max", "min"):
        g[f"stat-{s}-mf"] = _entry("-- TimeSeriesExpr", f"Legacy alias of :stat-{s} (math-filter naming).")

    # ----- stateful
    g["delay"] = _entry("TimeSeriesExpr Int -- TimeSeriesExpr", "Shift values forward by N intervals without refetching.")
    for s in ("count", "min", "max", "sum", "mean"):
        g[f"rolling-{s}"] = _entry(
            "TimeSeriesExpr Int -- TimeSeriesExpr",
            f"Rolling {s} over the last N intervals (NaN-aware).",
            f"name,cpu,:eq,:sum,5,:rolling-{s}" if s != "mean" else "name,cpu,:eq,:sum,5,5,:rolling-mean",
        )
    g["rolling-mean"]["signature"] = "TimeSeriesExpr Int Int -- TimeSeriesExpr"
    g["trend"] = _entry("TimeSeriesExpr Duration -- TimeSeriesExpr", "Centered moving average over the duration (deprecated in favor of :rolling-mean).")
    g["integral"] = _entry(_SIG_TS1, "Running sum from the window start.")
    g["cumulative-max"] = _entry(_SIG_TS1, "Running maximum from the window start.")
    g["derivative"] = _entry(_SIG_TS1, "Difference between successive values.")
    g["des"] = _entry(
        "TimeSeriesExpr Int Double Double -- TimeSeriesExpr",
        "Double exponential smoothing with training window, alpha, beta.",
        "name,cpu,:eq,:sum,10,0.1,0.02,:des",
    )
    g["sdes"] = _entry("TimeSeriesExpr Int Double Double -- TimeSeriesExpr", "Step-aware DES that resets each calendar day.")
    for p in ("fast", "slow", "slower", "simple"):
        g[f"des-{p}"] = _entry(_SIG_TS1, f"DES with the {p} preset parameters.")
        g[f"sdes-{p}"] = _entry(_SIG_TS1, f"Step-aware DES with the {p} preset parameters.")
    g["des-epic-signal"] = _entry(
        "TimeSeriesExpr ... -- TimeSeriesExpr",
        "Alerting signal comparing the line against DES prediction bands.",
    )
    g["des-epic-viz"] = _entry("TimeSeriesExpr ... -- Expr", "Visualization of the DES prediction bands used by :des-epic-signal.")

    # ----- filter / ranking
    g["filter"] = _entry("TimeSeriesExpr TimeSeriesExpr -- TimeSeriesExpr", "Keep grouped lines where the predicate expression is nonzero anywhere.", "name,cpu,:eq,:sum,(,nf.node,),:by,:stat-avg,5,:gt,:filter")
    g["topk"] = _entry("TimeSeriesExpr String Int -- TimeSeriesExpr", "Keep the K highest-ranked grouped lines by the statistic.", "name,cpu,:eq,:sum,(,nf.node,),:by,max,3,:topk")
    g["bottomk"] = _entry("TimeSeriesExpr String Int -- TimeSeriesExpr", "Keep the K lowest-ranked grouped lines by the statistic.")
    for agg in ("sum", "min", "max", "avg"):
        g[f"topk-others-{agg}"] = _entry("TimeSeriesExpr String Int -- TimeSeriesExpr", f"Top-K lines plus an 'others' line folding the rest with {agg}.")
        g[f"bottomk-others-{agg}"] = _entry("TimeSeriesExpr String Int -- TimeSeriesExpr", f"Bottom-K lines plus an 'others' line folding the rest with {agg}.")
    g["consolidate"] = _entry("TimeSeriesExpr Int -- TimeSeriesExpr", "Regrid onto a coarser step that is a multiple of the base step.")

    # ----- style / presentation
    g["sort"] = _entry("Expr String -- Expr", "Sort legend entries by a statistic or label.")
    g["order"] = _entry("Expr String -- Expr", "Sort direction: asc or desc.")
    g["limit"] = _entry("Expr Int -- Expr", "Keep only the first N lines after sorting.")
    g["head"] = _entry("Expr Int -- Expr", "Deprecated alias of :limit.")
    g["legend"] = _entry(_SIG_STYLE, "Legend label pattern; $(tag) substitutes tag values.", "name,cpu,:eq,:sum,cpu on $(nf.node),:legend")
    g["s"] = _entry(_SIG_STYLE, "Shorthand for :sed substitution on the legend.")
    g["decode"] = _entry(_SIG_STYLE, "Decode hex/none escapes in the legend text (deprecated).")
    g["alpha"] = _entry(_SIG_STYLE, "Two-hex-digit alpha channel for the line color.")
    g["color"] = _entry(_SIG_STYLE, "Explicit line color (hex RGB or named).", "name,cpu,:eq,:sum,ff0000,:color")
    g["palette"] = _entry(_SIG_STYLE, "Color palette for this expression's lines.")
    g["ls"] = _entry(_SIG_STYLE, "Line style: line, area, stack, or vspan.")
    g["lw"] = _entry(_SIG_STYLE, "Line stroke width.")
    g["axis"] = _entry(_SIG_STYLE, "Y-axis id the lines plot against.")
    g["line"] = _entry("Expr -- StyleExpr", "Draw as a plain line.")
    g["area"] = _entry("Expr -- StyleExpr", "Draw filled to zero.")
    g["stack"] = _entry("Expr -- StyleExpr", "Draw stacked on previously stacked lines.")
    g["vspan"] = _entry("Expr -- StyleExpr", "Draw nonzero spans as vertical background bands.")
    g["heatmap"] = _entry("Expr -- StyleExpr", "Draw grouped lines as a density heatmap.")
    g["percentiles-heatmap"] = _entry("Expr -- StyleExpr", "Heatmap from percentile bucket counters.")
    g["strip-style"] = _entry("Expr -- Expr", "Remove presentation settings, keeping the data expression.")

    # ----- events
    g["table"] = _entry("Query List -- EventExpr", "Raw matching events projected to the listed fields.")
    g["sample"] = _entry("Query List List -- EventExpr", "Datapoints counting matching events, with sampled projected values.")

    # ----- stack manipulation & programming
    g["dup"] = _entry("a -- a a", "Duplicate the top stack item.")
    g["drop"] = _entry("a --", "Discard the top stack item.")
    g["swap"] = _entry("a b -- b a", "Exchange the top two items.")
    g["over"] = _entry("a b -- a b a", "Copy the second item to the top.")
    g["2over"] = _entry("a b c d -- a b c d a b", "Copy the second pair to the top.")
    g["nip"] = _entry("a b -- b", "Discard the second item.")
    g["tuck"] = _entry("a b -- b a b", "Copy the top item below the second.")
    g["rot"] = _entry("a b c -- b c a", "Rotate the third item to the top.")
    g["-rot"] = _entry("a b c -- c a b", "Rotate the top item to third position.")
    g["pick"] = _entry("... n -- ... a", "Copy the item N deep to the top.")
    g["roll"] = _entry("... n -- ... a", "Move the item N deep to the top.")
    g["ndrop"] = _entry("... n --", "Discard the top N items.")
    g["nlist"] = _entry("... n -- List", "Collect the top N items into a list.")
    g["clear"] = _entry("... --", "Empty the stack.")
    g["depth"] = _entry("-- Int", "Push the current stack depth.")
    g["list"] = _entry("... -- List", "Collect the whole stack into a single list.")
    g["call"] = _entry("List --", "Execute a list as a program.")
    g["fcall"] = _entry("String --", "Execute the named frozen program.")
    g["each"] = _entry("List List --", "Run the program once per list element.")
    g["map"] = _entry("List List -- List", "Transform each list element with the program.")
    g["get"] = _entry("String -- a", "Push the value of a variable.")
    g["set"] = _entry("String a --", "Bind a variable.")
    g["sset"] = _entry("String --", "Bind a variable from the URI parameters (string set).")
    g["format"] = _entry("String List -- String", "printf-style formatting of the pattern with list arguments.")
    g["freeze"] = _entry("... --", "Move the stack to the frozen section, exempt from :cq.")

    return g


GLOSSARY: dict[str, dict] = _build_glossary()


# --------------------------------------------------------------- analyzer


def _classify(tok: Token, known: bool) -> int:
    if tok.text in ("(", ")"):
        return TT_PAREN
    if tok.text.startswith(":"):
        return TT_WORD if known else TT_UNKNOWN_WORD
    return TT_NUMBER if _is_number(tok.text) else TT_STRING


def _encode_semantic_tokens(text: str, classified: list[tuple[Token, int]]) -> list[int]:
    """LSP delta encoding: [deltaLine, deltaStart, length, type, modifiers]
    per token (AslDocumentAnalyzer.scala:1288-1337)."""
    out: list[int] = []
    prev_line = prev_col = 0
    for tok, tt in classified:
        p = _position(text, tok.start)
        line, col = p["line"], p["character"]
        delta_line = line - prev_line
        delta_start = col - prev_col if delta_line == 0 else col
        out.extend([delta_line, delta_start, tok.end - tok.start, tt, 0])
        prev_line, prev_col = line, col
    return out


def analyze(text: str, step: int = 3600) -> dict[str, Any]:
    """Diagnostics + semantic tokens for an ASL expression.

    Replays the token stream through the real interpreter so overload
    mismatches are detected exactly where evaluation detects them.  After
    the first execution error, later words are classified by name lookup
    only (the stack state is no longer trustworthy) — matching the
    reference's single-error-per-region behavior for invalid programs.
    """
    interp = default_interpreter(step)
    tokens = tokenize(text)
    diagnostics: list[dict] = []
    classified: list[tuple[Token, int]] = []
    ctx = Context(interp)
    failed = False
    depth = 0
    list_tokens: list[str] = []
    open_spans: list[Token] = []

    def diag(tok: Token, message: str, severity: int = 1) -> None:
        diagnostics.append(
            {
                "range": _range(text, tok.start, tok.end),
                "message": message,
                "severity": severity,  # 1=error 2=warning 3=info
                "source": "atlas",
            }
        )

    # parallel span stack: which source token produced each stack item —
    # the reference's buildStackSourceMap role
    # (AslDocumentAnalyzer.scala:184-232), maintained during the replay
    # instead of reconstructed backwards
    span_stack: list[Token | None] = []

    def word_effect(tok: Token, name: str) -> None:
        """Advance span_stack using the glossary stack effect."""
        entry = GLOSSARY.get(name)
        if entry is None or "..." in entry["signature"]:
            # variadic/unknown effect: resync with unknown provenance
            span_stack[:] = [None] * len(ctx.stack)
            return
        ins, _, outs = entry["signature"].partition("--")
        n_in, n_out = len(ins.split()), len(outs.split())
        del span_stack[len(span_stack) - min(n_in, len(span_stack)) :]
        span_stack.extend([tok] * n_out)
        if len(span_stack) != len(ctx.stack):  # defensive resync
            span_stack[:] = [None] * len(ctx.stack)

    for tok in tokens:
        t = tok.text
        known = True
        if t == "(":
            if depth:
                list_tokens.append(t)
            depth += 1
            open_spans.append(tok)
        elif t == ")":
            if depth == 0:
                diag(tok, "unmatched closing parenthesis")
                failed = True
            else:
                depth -= 1
                opened = open_spans.pop()
                if depth:
                    list_tokens.append(t)
                elif not failed:
                    ctx.push(list(list_tokens))
                    span_stack.append(opened)
                    list_tokens = []
        elif depth:
            list_tokens.append(t)
        elif t.startswith(":"):
            name = t[1:]
            known = name in interp.words
            if not known:
                msg = f"unknown word ':{name}'"
                close = difflib.get_close_matches(name, interp.words, n=1)
                if close:
                    msg += f" — did you mean ':{close[0]}'?"
                diag(tok, msg)
                failed = True
            elif not failed:
                # executors can raise raw ValueError (bad numeric literal,
                # invalid duration, ...) — an analyzer must turn EVERY
                # execution failure into a positioned diagnostic, never a
                # 500/400 on the endpoint
                try:
                    interp.execute_word(name, ctx)
                    word_effect(tok, name)
                except Exception as ex:  # noqa: BLE001
                    msg = str(ex) if isinstance(ex, AslError) else f"{type(ex).__name__}: {ex}"
                    diag(tok, msg)
                    if "no matching overload" in msg:
                        for arg in _argument_mismatches(name, ctx.stack, span_stack):
                            diag(arg[0] or tok, arg[1])
                    failed = True
            if name in _DEPRECATED and not failed:
                diag(tok, f":{name} is deprecated: {_DEPRECATED[name]}", severity=2)
        elif t.startswith(";") and len(t) > 1 and t[1:] in interp.words:
            # reference typo quick-fix shape (computeTypoCodeActions)
            diag(tok, f"did you mean ':{t[1:]}'? (semicolon instead of colon)", severity=2)
            known = False
        elif not failed:
            ctx.push(t)
            span_stack.append(tok)
        classified.append((tok, _classify(tok, known)))

    for tok in open_spans:
        diag(tok, "unmatched opening parenthesis")

    return {
        "diagnostics": diagnostics,
        "tokens": _encode_semantic_tokens(text, classified),
        "legend": TOKEN_LEGEND,
    }


_DEPRECATED = {
    "head": "use :limit",
    "trend": "use :rolling-mean",
    "decode": "legend decoding is a no-op escape hatch",
}


def _type_ok(ptype: str, v: Any) -> bool:
    """Best-effort stack-value check against a glossary signature type
    name (the TypedWord parameter-type role)."""
    from .model import expr as Em
    from .model import query as Qm
    from .stacklang.interpreter import is_ts_like

    t = ptype.strip()
    if t == "String":
        return isinstance(v, str)
    if t in ("Int", "Double"):
        return isinstance(v, (int, float)) or (isinstance(v, str) and _is_number(v))
    if t == "Duration":
        if isinstance(v, (int, float)):
            return True
        try:
            from .util.strings import parse_duration

            parse_duration(str(v))
            return True
        except Exception:  # noqa: BLE001
            return False
    if t == "Query":
        return isinstance(v, Qm.Query)
    if t in ("TimeSeriesExpr", "DataExpr"):
        return is_ts_like(v) or isinstance(v, Em.StyleExpr)
    if t in ("Expr", "StyleExpr"):
        return is_ts_like(v) or isinstance(v, (Em.StyleExpr, Qm.Query))
    if t == "List":
        return isinstance(v, list)
    return True  # a/b/c placeholders, EventExpr, anything else


def _brief(v: Any) -> str:
    """Short value description for argument diagnostics
    (formatValueBrief, AslDocumentAnalyzer.scala:234-247)."""
    if isinstance(v, str):
        s = v if len(v) <= 37 else v[:37] + "..."
        return f'String "{s}"'
    if isinstance(v, (int, float)):
        return f"{type(v).__name__} {v}"
    if isinstance(v, list):
        return f"List ({len(v)} items)"
    s = str(v)
    return f"{type(v).__name__} {s[:37] + '...' if len(s) > 40 else s}"


def _argument_mismatches(
    name: str, stack: list, span_stack: list
) -> list[tuple["Token | None", str]]:
    """Per-argument type mismatches for a word that matched no overload
    (computeParameterDiagnostics parity): compare the signature's input
    types against the actual stack items and point each mismatch at the
    token that PRODUCED the offending value."""
    entry = GLOSSARY.get(name)
    if entry is None or "..." in entry["signature"]:
        return []
    ins = entry["signature"].split("--")[0].split()
    out: list[tuple[Token | None, str]] = []
    for k in range(min(len(ins), len(stack))):
        ptype = ins[len(ins) - 1 - k]  # deepest first in the signature
        value = stack[-1 - k]
        if not _type_ok(ptype, value):
            span = span_stack[-1 - k] if k < len(span_stack) else None
            out.append((span, f"expected {ptype}, got {_brief(value)}"))
    return out


def _token_at(tokens: list[Token], offset: int) -> Token | None:
    for tok in tokens:
        if tok.start <= offset <= tok.end:
            return tok
    return None


def hover(text: str, offset: int, step: int = 3600) -> dict | None:
    """Glossary hover for the word under the cursor
    (AslDocumentAnalyzer.scala:648-658,821-842): markdown with the word
    name, stack-effect signature, summary, and examples."""
    tok = _token_at(tokenize(text), offset)
    if tok is None or not tok.text.startswith(":"):
        return None
    name = tok.text[1:]
    entry = GLOSSARY.get(name)
    if entry is None:
        return None
    md = [f"**:{name}**", "", f"`{entry['signature']}`", "", entry["summary"]]
    if entry["examples"]:
        md += ["", "**Examples:**"]
        md += [f"- `{ex}`" for ex in entry["examples"]]
    return {
        "contents": {"kind": "markdown", "value": "\n".join(md)},
        "range": _range(text, tok.start, tok.end),
    }


# Curated unicode characters commonly needed in ASL
# (AslDocumentAnalyzer.scala:1209-1219 curatedUnicode).
_CURATED_UNICODE: list[tuple[int, str]] = [
    (0x0020, "Space"),
    (0x0009, "Tab"),
    (0x000A, "Newline"),
    (0x002C, "Comma"),
    (0x003A, "Colon"),
    (0x0028, "Left Parenthesis"),
    (0x0029, "Right Parenthesis"),
    (0x005C, "Backslash"),
]

_HEX_DIGITS = set("0123456789abcdef")


def _unicode_prefix(before: str) -> tuple[str, int] | None:
    """If the cursor sits inside a `\\`, `\\u`, or `\\uXXXX` sequence in
    the current token, return (prefix after `\\u`, absolute offset of the
    backslash) (AslDocumentAnalyzer.scala:981-1000 unicodePrefix)."""
    token_start = before.rfind(",") + 1
    token = before[token_start:]
    idx = token.rfind("\\")
    if idx < 0:
        return None
    after = token[idx + 1 :]
    backslash_offset = token_start + idx
    if after == "":
        return ("", backslash_offset)
    if after.startswith("u"):
        return (after[1:], backslash_offset)
    return None


def _unicode_item(cp: int, desc: str, text: str, start: int, end: int) -> dict:
    """One `\\uXXXX` completion item
    (AslDocumentAnalyzer.scala:1268-1282 unicodeCompletionItem)."""
    hx = f"{cp:04X}"
    display = "" if cp < 0x21 else f"{chr(cp)} "
    return {
        "label": f"{display}\\u{hx} {desc}",
        "kind": "Text",
        "detail": f"U+{hx}",
        "filterText": f"\\u{hx} {desc}",
        "textEdit": {"range": _range(text, start, end), "newText": f"\\u{hx}"},
    }


def _unicode_name(cp: int) -> str | None:
    """Character name, None for undefined code points (the Python twin of
    Character.isDefined/getName).  Defined-but-UNNAMED code points (Cc
    controls, whose UnicodeData name field is `<control>`) also return
    None so no completion item ever carries an empty description — a
    deliberate divergence from Java's getName, which fabricates
    `BLOCK NAME + hex` for them (ADVICE r11; Python's unicodedata has no
    block table to mirror that)."""
    import unicodedata

    ch = chr(cp)
    if unicodedata.category(ch) == "Cn":
        return None
    return unicodedata.name(ch, "") or None


def _unicode_completions(
    prefix: str, text: str, start: int, end: int
) -> list[dict]:
    """Completions inside a unicode escape
    (AslDocumentAnalyzer.scala:1221-1266): bare `\\u` offers the curated
    set; a hex prefix filters the curated set by code (plus the exact
    code point at 4 digits); anything else searches character names
    across the BMP (capped at 50)."""
    lower = prefix.lower()
    if not lower:
        return [_unicode_item(cp, d, text, start, end) for cp, d in _CURATED_UNICODE]
    if all(c in _HEX_DIGITS for c in lower):
        items = [
            _unicode_item(cp, d, text, start, end)
            for cp, d in _CURATED_UNICODE
            if f"{cp:04x}".startswith(lower)
        ]
        if len(lower) == 4:
            cp = int(lower, 16)
            name = _unicode_name(cp)
            if name is not None and all(c != cp for c, _ in _CURATED_UNICODE):
                items.append(_unicode_item(cp, name, text, start, end))
        return items
    terms = lower.split()
    items = []
    for cp in range(0x20, 0x10000):
        name = _unicode_name(cp)
        if not name:
            continue
        lname = name.lower()
        if all(t in lname for t in terms):
            items.append(_unicode_item(cp, name, text, start, end))
            if len(items) >= 50:
                break
    return items


def complete(text: str, offset: int, step: int = 3600) -> list[dict]:
    """Completion items at the cursor
    (AslDocumentAnalyzer.scala:1001-1051): execute the program before the
    token being typed, then offer every word with a matching overload,
    prefix-filtered when the user is mid-word.  Inside a `\\uXXXX`
    escape, unicode completions take over
    (AslDocumentAnalyzer.scala:967-978)."""
    before = text[: max(0, min(offset, len(text)))]
    up = _unicode_prefix(before)
    if up is not None:
        prefix, backslash_offset = up
        return _unicode_completions(prefix, text, backslash_offset, len(before))
    last_comma = before.rfind(",")
    partial = before[last_comma + 1 :].strip()
    if partial.startswith(":"):
        program, prefix = before[: last_comma + 1], partial[1:]
    else:
        program, prefix = before, ""
    interp = default_interpreter(step)
    base = Context(interp)
    try:
        from .stacklang.interpreter import split_and_trim

        interp.execute_program(split_and_trim(program), base)
    except Exception:  # noqa: BLE001 — any error before the cursor: no completions
        return []
    items = []
    for name in sorted({w.name for w in WORDS}):
        if not name.startswith(prefix):
            continue
        trial = Context(
            interp, stack=list(base.stack), vars=dict(base.vars),
            frozen=list(base.frozen), initial_vars=dict(base.initial_vars),
        )
        try:
            interp.execute_word(name, trial)
        except Exception:  # noqa: BLE001 — no matching overload
            continue
        entry = GLOSSARY.get(name, {})
        items.append(
            {
                "label": f":{name}",
                "kind": "Function",
                "detail": entry.get("signature", ""),
                "documentation": entry.get("summary", ""),
                "insertText": f":{name},",
            }
        )
    return items


def definition(text: str, offset: int, step: int = 3600) -> dict | None:
    """Go-to-definition for variable references
    (AslDocumentAnalyzer.scala:901-965): from a `:get` word (or the
    variable-name literal before it), return the range of the most
    recent `:set`/`:sset` that binds the same name before the cursor.
    Resolution is SEMANTIC — the bound name comes from the replayed
    pre-execution stack (`name,value,:set` binds stack[-2] even when the
    value is a multi-token expression), matching the reference's
    setVarName over recorded word stacks."""
    interp = default_interpreter(step)
    tokens = tokenize(text)
    idx = next(
        (i for i, t in enumerate(tokens) if t.start <= offset <= t.end), None
    )
    if idx is None:
        return None
    tok = tokens[idx]
    ctx = Context(interp)
    bindings: list[tuple[str, Token]] = []  # (var name, :set/:sset token)
    var: str | None = None
    if (
        not tok.text.startswith(":")
        and idx + 1 < len(tokens)
        and tokens[idx + 1].text == ":get"
    ):
        var = tok.text
    depth = 0
    list_tokens: list[str] = []
    for i, t in enumerate(tokens):
        txt = t.text
        if txt == "(":
            if depth:
                list_tokens.append(txt)
            depth += 1
            continue
        if txt == ")":
            if depth == 0:
                break
            depth -= 1
            if depth:
                list_tokens.append(txt)
            else:
                ctx.push(list(list_tokens))
                list_tokens = []
            continue
        if depth:
            list_tokens.append(txt)
            continue
        if txt.startswith(":"):
            name = txt[1:]
            if i == idx and name == "get":
                top = ctx.stack[-1] if ctx.stack else None
                var = top if isinstance(top, str) else None
            if name == "set" and len(ctx.stack) >= 2 and isinstance(ctx.stack[-2], str):
                if t.end <= offset:
                    bindings.append((ctx.stack[-2], t))
            elif name == "sset" and ctx.stack and isinstance(ctx.stack[-1], str):
                if t.end <= offset:
                    bindings.append((ctx.stack[-1], t))
            try:
                interp.execute_word(name, ctx)
            except Exception:  # noqa: BLE001 — resolve with what we have
                break
        else:
            ctx.push(txt)
        if i >= idx and var is not None:
            break
    if var is None and tok.text == ":get" and idx > 0:
        # replay can stop early (e.g. :sset without URI params); fall back
        # to the literal token before the :get
        prev = tokens[idx - 1].text
        if not prev.startswith(":") and prev not in ("(", ")"):
            var = prev
    if var is None:
        return None
    for bound, t in reversed(bindings):
        if bound == var:
            return {"range": _range(text, t.start, t.end)}
    return None


# ------------------------------------------------- symbols + code actions


def _arity(name: str) -> int | None:
    """Input arity parsed from the glossary stack-effect signature —
    the role TypedWord.parameters plays for the reference's symbol tree
    (AslDocumentAnalyzer.scala:407-455).  None = variadic/unknown."""
    entry = GLOSSARY.get(name)
    if entry is None:
        return None
    ins = entry["signature"].split("--")[0].split()
    if "..." in ins:
        return None
    return len(ins)


def document_symbols(text: str) -> list[dict]:
    """Hierarchical document symbols (computeDocumentSymbols parity):
    literals are Number/String leaves, lists are Array nodes with
    children, words are Function nodes consuming `arity` prior symbols
    as children (range spans from the first consumed child to the word;
    selectionRange is the word token itself)."""
    tokens = tokenize(text)
    stack: list[dict] = []
    marks: list[int] = []  # indices of open "(" in `stack`

    def rng(start: int, end: int) -> dict:
        return _range(text, start, end)

    for tok in tokens:
        t = tok.text
        if t == "(":
            marks.append(len(stack))
            stack.append({"_open": tok.start})
        elif t == ")":
            if not marks:
                continue  # unmatched — diagnostics cover it
            at = marks.pop()
            children = [s for s in stack[at + 1 :] if "_open" not in s]
            open_start = stack[at]["_open"]
            del stack[at:]
            stack.append(
                {
                    "name": "(...)",
                    "kind": "Array",
                    "range": rng(open_start, tok.end),
                    "selectionRange": rng(open_start, open_start + 1),
                    "children": children,
                    "_abs_start": open_start,
                }
            )
        elif t.startswith(":"):
            name = t[1:]
            known = name in {w.name for w in WORDS}
            arity = _arity(name) if known else None
            n = 0 if arity is None else min(arity, len(stack))
            children = []
            if n:
                take = stack[-n:]
                if all("_open" not in s for s in take):
                    children = take
                    del stack[-n:]
            start = (
                # children ranges are absolute offsets encoded as positions;
                # recover the raw start from the first child token we saw
                children[0]["_abs_start"]
                if children
                else tok.start
            )
            sym = {
                "name": t,
                "kind": "Function",
                "range": rng(start, tok.end),
                "selectionRange": rng(tok.start, tok.end),
                "detail": GLOSSARY.get(name, {}).get("signature", "")
                if known
                else "unresolved",
                "children": children,
                "_abs_start": start,
            }
            stack.append(sym)
        else:
            kind = "Number" if _is_number(t) else "String"
            stack.append(
                {
                    "name": t,
                    "kind": kind,
                    "range": rng(tok.start, tok.end),
                    "selectionRange": rng(tok.start, tok.end),
                    "children": [],
                    "_abs_start": tok.start,
                }
            )

    def strip(sym: dict) -> dict:
        sym.pop("_abs_start", None)
        for c in sym.get("children", []):
            strip(c)
        return sym

    return [strip(s) for s in stack if "_open" not in s]


def compress_expression(text: str) -> str:
    """Strip whitespace, empty tokens, and line breaks
    (compressExpression parity): the canonical compact comma form."""
    return ",".join(t.text for t in tokenize(text))


def format_expression(text: str) -> str:
    """Multi-line pretty form (formatExpression parity, simplified):
    each word groups with its consumed arguments; groups whose
    arguments are all simple render inline, groups containing nested
    command groups break across lines; top-level expressions separate
    with a blank line.  compress(format(x)) == compress(x) always."""
    syms = document_symbols(text)

    def render(sym: dict) -> str:
        if sym["kind"] == "Array":
            inner = ",".join(render(c) for c in sym["children"])
            return f"(,{inner},)" if inner else "(,)"
        if sym["kind"] != "Function" or not sym["children"]:
            return sym["name"]
        args = [render(c) for c in sym["children"]]
        complex_args = any(
            c["kind"] == "Function" and c["children"] for c in sym["children"]
        )
        sep = ",\n" if complex_args else ","
        return sep.join(args) + f"{sep if complex_args else ','}{sym['name']}"

    return ",\n\n".join(render(s) for s in syms)


def normalize_expression(text: str, step: int = 3600) -> str | None:
    """Canonical normalized display of the parsed expressions (the
    reference's Normalize code action via ExprNormalizer); None when
    the program does not parse/execute."""
    try:
        from .stacklang.vocab import parse as parse_asl

        return ",".join(se.display() for se in parse_asl(text, step=step))
    except Exception:  # noqa: BLE001
        return None


def code_actions(text: str, step: int = 3600) -> list[dict]:
    """Code actions (computeCodeActions parity): semicolon-typo quick
    fixes, then whole-document Format / Compress / Normalize rewrites
    when they change the text (refactor actions are suppressed while
    the program has error diagnostics, like the reference)."""
    actions: list[dict] = []
    analysis = analyze(text, step=step)
    for d in analysis["diagnostics"]:
        msg = d["message"]
        if msg.startswith("did you mean ':") and msg.endswith(
            "'? (semicolon instead of colon)"
        ):
            name = msg[len("did you mean ':") : -len("'? (semicolon instead of colon)")]
            actions.append(
                {
                    "title": f"Replace with ':{name}'",
                    "kind": "quickfix",
                    "edit": {"range": d["range"], "newText": f":{name}"},
                }
            )
    if any(d["severity"] == 1 for d in analysis["diagnostics"]):
        return actions
    full = _range(text, 0, len(text))
    formatted = format_expression(text)
    if formatted != text:
        actions.append(
            {
                "title": "Format expression",
                "kind": "refactor.rewrite",
                "edit": {"range": full, "newText": formatted},
            }
        )
    compressed = compress_expression(text)
    if compressed != text:
        actions.append(
            {
                "title": "Compress expression",
                "kind": "refactor.rewrite",
                "edit": {"range": full, "newText": compressed},
            }
        )
    normalized = normalize_expression(text, step=step)
    if normalized is not None and normalized != text:
        actions.append(
            {
                "title": "Normalize expression",
                "kind": "refactor.rewrite",
                "edit": {"range": full, "newText": normalized},
            }
        )
    return actions


# ------------------------------------------------------------ URI analyzer
#
# The reference's second analyzer works over full graph URIs
# (`/api/v1/graph?q=...&s=e-3h`), delegating `q`/`cq` values to the
# expression analyzer with positions shifted through a percent-decoding
# offset map (atlas-lsp/.../UriDocumentAnalyzer.scala).  The document
# model is a single-line compact URI: every position is line 0.

EXPRESSION_PARAMS = frozenset({"q", "cq"})

# graph-parameter glossary (UriDocumentAnalyzer.scala:134-172 knownParams)
KNOWN_PARAMS: dict[str, str] = {
    "q": "Atlas Stack Language query expression.",
    "cq": "Common query ANDed onto every expression.",
    "s": "Start time (e.g. e-3h, 2024-01-01T00:00).",
    "e": "End time (e.g. now, 2024-01-01T06:00).",
    "tz": "Time zone (e.g. US/Pacific, UTC); repeatable.",
    "step": "Step size (e.g. 1m, 60s), rounded to a multiple of the source step.",
    "format": "Output format (png, json, std.json, v2.json, stats.json, csv, txt).",
    "w": "Image width in pixels.",
    "h": "Image height in pixels.",
    "zoom": "Zoom factor applied to the rendered image.",
    "layout": "Graph layout: canvas (default; w/h size the data canvas), image (w/h size the final image, legend off), iw (width fixed), ih (height fixed).",
    "title": "Title displayed above the graph.",
    "palette": "Color palette name or (,hex,...,) list.",
    "theme": "Graph theme (light, dark).",
    "no_legend": "Disable the legend (1 to enable).",
    "no_legend_stats": "Disable legend statistics (1 to enable).",
    "only_graph": "Show only the graph area (1 to enable).",
    "no_border": "Disable the border (1 to enable).",
    "axis_per_line": "One axis per line (1 to enable).",
    "u": "Upper bound for the Y axis.",
    "l": "Lower bound for the Y axis (or auto-data).",
    "scale": "Y-axis scale (linear, log, log-linear, pow2, sqrt).",
    "o": "Legacy log scale flag (1 to enable).",
    "stack": "Stack lines by default (1 to enable).",
    "ylabel": "Label for the Y axis.",
    "tick_labels": "Tick label mode (decimal, binary, duration, off).",
    "sort": "Legend sort mode (name, min, max, avg, last, count).",
    "order": "Legend sort order (asc, desc).",
    "features": "Vocabulary feature set (stable, unstable).",
    "id": "Identifier for the graph.",
    "vision": "Color vision simulation (protanopia, deuteranopia, tritanopia, ...).",
    "hints": "Rendering hints.",
    "heatmap_palette": "Color palette for heatmap cells.",
    "heatmap_scale": "Scale for the heatmap color axis.",
    "heatmap_u": "Upper bound for the heatmap color axis.",
    "heatmap_l": "Lower bound for the heatmap color axis.",
    "heatmap_label": "Label for the heatmap color axis.",
}

# parameters accepting a `.N` per-axis suffix (u.1, scale.0, ...)
AXIS_SUFFIX_PARAMS = frozenset(
    {
        "u", "l", "scale", "o", "stack", "ylabel", "tick_labels", "sort",
        "order", "palette", "heatmap_palette", "heatmap_scale", "heatmap_u",
        "heatmap_l", "heatmap_label",
    }
)


def _param_description(name: str) -> str | None:
    if name in KNOWN_PARAMS:
        return KNOWN_PARAMS[name]
    base, dot, suffix = name.partition(".")
    if dot and suffix.isdigit() and base in AXIS_SUFFIX_PARAMS:
        return f"{KNOWN_PARAMS[base]} (axis {suffix})"
    return None


@dataclass(frozen=True)
class QueryParam:
    """One key=value with raw spans and the percent-decoded value plus a
    decoded-index -> raw-offset map (UriParser.buildOffsetMap role)."""

    key: str
    key_start: int
    key_end: int
    value: str  # RAW (encoded) text
    value_start: int
    value_end: int
    decoded: str
    offset_map: tuple[int, ...]  # decoded char index -> raw offset

    def raw_to_decoded(self, raw_offset: int) -> int:
        rel = raw_offset - self.value_start
        di = 0
        m = self.offset_map
        while di + 1 < len(m) and m[di + 1] <= rel:
            di += 1
        return di

    def decoded_to_raw(self, decoded_offset: int) -> int:
        m = self.offset_map
        rel = m[decoded_offset] if decoded_offset < len(m) else (
            m[-1] if m else 0
        )
        return self.value_start + rel


def _decode_with_map(raw: str) -> tuple[str, tuple[int, ...]]:
    """Percent-decode with a decoded-char -> raw-offset map.  %XX escapes
    decode as BYTES, so multi-byte UTF-8 sequences collapse to one char —
    matching urllib's unquote, which the real graph endpoint uses; each
    decoded char maps to the raw offset of its first byte (undecodable
    bytes survive as surrogate escapes, one raw byte each)."""
    byte_vals: list[int] = []
    byte_offs: list[int] = []
    i = 0
    hexd = "0123456789abcdefABCDEF"
    while i < len(raw):
        c = raw[i]
        if (
            c == "%"
            and i + 3 <= len(raw)
            and raw[i + 1] in hexd
            and raw[i + 2] in hexd
        ):
            byte_vals.append(int(raw[i + 1 : i + 3], 16))
            byte_offs.append(i)
            i += 3
            continue
        for bv in (" " if c == "+" else c).encode("utf-8"):
            byte_vals.append(bv)
            byte_offs.append(i)
        i += 1
    decoded = bytes(byte_vals).decode("utf-8", errors="surrogateescape")
    offsets: list[int] = []
    bpos = 0
    for ch in decoded:
        offsets.append(byte_offs[bpos])
        if 0xDC80 <= ord(ch) <= 0xDCFF:  # surrogateescape: one raw byte
            bpos += 1
        else:
            bpos += len(ch.encode("utf-8"))
    offsets.append(len(raw))  # sentinel: one past the last decoded char
    return decoded, tuple(offsets)


@dataclass(frozen=True)
class ParsedUri:
    path: str
    path_start: int
    path_end: int
    query: tuple[QueryParam, ...]


def parse_uri(text: str) -> ParsedUri:
    qpos = text.find("?")
    path_end = qpos if qpos >= 0 else len(text)
    params: list[QueryParam] = []
    if qpos >= 0:
        pos = qpos + 1
        for part in text[qpos + 1 :].split("&"):
            eq = part.find("=")
            if eq >= 0:
                key, raw_val = part[:eq], part[eq + 1 :]
                vstart = pos + eq + 1
            else:
                key, raw_val = part, ""
                vstart = pos + len(part)
            decoded, omap = _decode_with_map(raw_val)
            if key:
                params.append(
                    QueryParam(
                        key, pos, pos + len(key),
                        raw_val, vstart, vstart + len(raw_val),
                        decoded, omap,
                    )
                )
            pos += len(part) + 1
    return ParsedUri(text[:path_end], 0, path_end, tuple(params))


def _find_param(parsed: ParsedUri, offset: int) -> QueryParam | None:
    for p in parsed.query:
        if p.key_start <= offset <= p.value_end:
            return p
    return None


def _line_starts(s: str) -> list[int]:
    starts = [0]
    for i, ch in enumerate(s):
        if ch == "\n":
            starts.append(i + 1)
    return starts


def _shift_range(rng: dict, param: QueryParam) -> dict:
    """Decoded-expression (line, character) -> raw URI offset.  The raw
    URI is a single line, but the DECODED expression may contain %0A
    newlines, so positions on line > 0 must be flattened through the
    decoded line-start table before mapping to raw offsets."""
    starts = _line_starts(param.decoded)

    def shift(pos: dict) -> dict:
        line = min(pos["line"], len(starts) - 1)
        abs_off = starts[line] + pos["character"]
        return {"line": 0, "character": param.decoded_to_raw(abs_off)}

    return {"start": shift(rng["start"]), "end": shift(rng["end"])}


def analyze_uri(text: str, step: int = 3600) -> dict[str, Any]:
    """Diagnostics + semantic tokens for a full graph URI
    (UriDocumentAnalyzer.scala:303-354,497-545): missing-q error,
    unknown-parameter warnings, expression params delegated to the ASL
    analyzer with ranges shifted back to raw URI offsets."""
    parsed = parse_uri(text)
    diagnostics: list[dict] = []
    tokens: list[tuple[int, int, int]] = []  # (offset, length, type)

    if parsed.query and not any(p.key == "q" for p in parsed.query):
        diagnostics.append(
            {
                "range": _range(text, 0, len(text)),
                "message": "Missing required 'q' parameter",
                "severity": 1,
                "source": "atlas-uri",
            }
        )
    if parsed.path_end > 0:
        tokens.append((0, parsed.path_end, TT_PATH))
    qpos = text.find("?")
    if qpos >= 0:
        tokens.append((qpos, 1, TT_URI_OPERATOR))
    for p in parsed.query:
        if p.key_start > parsed.path_end + 1 and text[p.key_start - 1] == "&":
            tokens.append((p.key_start - 1, 1, TT_URI_OPERATOR))
        tokens.append((p.key_start, p.key_end - p.key_start, TT_PARAMETER))
        if p.key_end < p.value_start:
            tokens.append((p.key_end, 1, TT_URI_OPERATOR))
        if _param_description(p.key) is None:
            diagnostics.append(
                {
                    "range": _range(text, p.key_start, p.key_end),
                    "message": f"Unknown parameter '{p.key}'",
                    "severity": 2,
                    "source": "atlas-uri",
                }
            )
        if p.key in EXPRESSION_PARAMS:
            sub = analyze(p.decoded, step=step)
            for d in sub["diagnostics"]:
                diagnostics.append({**d, "range": _shift_range(d["range"], p)})
            # re-base the expression's delta-encoded tokens to raw offsets;
            # the decoded value may contain %0A newlines, so track the
            # (line, col) pair and flatten through the line-start table
            starts = _line_starts(p.decoded)
            line = col = 0
            data = sub["tokens"]
            for i in range(0, len(data), 5):
                dl, ds, ln, tt, _mods = data[i : i + 5]
                if dl > 0:
                    line += dl
                    col = ds
                else:
                    col += ds
                abs_off = starts[min(line, len(starts) - 1)] + col
                start = p.decoded_to_raw(abs_off)
                end = p.decoded_to_raw(abs_off + ln)
                tokens.append((start, end - start, tt))
        elif p.value_end > p.value_start:
            tokens.append((p.value_start, p.value_end - p.value_start, TT_STRING))

    tokens.sort(key=lambda t: t[0])
    encoded: list[int] = []
    prev = 0
    for start, length, tt in tokens:
        encoded.extend([0, start - prev, length, tt, 0])
        prev = start
    return {"diagnostics": diagnostics, "tokens": encoded, "legend": TOKEN_LEGEND}


def hover_uri(text: str, offset: int, step: int = 3600) -> dict | None:
    """Hover over a full graph URI (UriDocumentAnalyzer.scala:222-248):
    path, parameter descriptions, and expression-word hovers shifted to
    raw positions."""
    parsed = parse_uri(text)
    if parsed.path_start <= offset < parsed.path_end:
        return {
            "contents": {
                "kind": "markdown",
                "value": f"**Path:** `{parsed.path}`",
            }
        }
    p = _find_param(parsed, offset)
    if p is None:
        return None
    if p.key_start <= offset < p.key_end or p.key not in EXPRESSION_PARAMS:
        desc = _param_description(p.key)
        if desc is None:
            return None
        return {
            "contents": {"kind": "markdown", "value": f"**{p.key}:** {desc}"}
        }
    h = hover(p.decoded, p.raw_to_decoded(offset), step=step)
    if h is not None and "range" in h:
        h = {**h, "range": _shift_range(h["range"], p)}
    return h


def complete_uri(text: str, offset: int, step: int = 3600) -> list[dict]:
    """Completions over a full graph URI
    (UriDocumentAnalyzer.scala:260-297): inside q/cq values delegate to
    the expression completer; elsewhere offer known parameter names."""
    parsed = parse_uri(text)
    p = _find_param(parsed, offset)
    if p is not None and p.key in EXPRESSION_PARAMS and offset >= p.value_start:
        return complete(p.decoded, p.raw_to_decoded(offset), step=step)
    start = offset
    while start > 0 and text[start - 1] not in "?&":
        start -= 1
    prefix = text[start:offset]
    return [
        {
            "label": name,
            "kind": "Property",
            "detail": desc,
            "insertText": f"{name}=",
        }
        for name, desc in sorted(KNOWN_PARAMS.items())
        if name.startswith(prefix)
    ]
