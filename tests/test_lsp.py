"""ASL editor tooling (LSP-lite, atlas_spark/lsp.py): glossary coverage,
span-aware diagnostics, semantic tokens, hover, completion — mirroring
the analyzer outputs of the reference's language server
(atlas-lsp/.../AslDocumentAnalyzer.scala, Glossary.scala) — plus the
/api/v1/lsp/* HTTP framing (LspApi.scala, HTTP JSON in place of
WebSocket)."""

from __future__ import annotations

import json
import urllib.request
from urllib.error import HTTPError

import pytest

from atlas_spark import http_api, lsp
from atlas_spark.api import Engine
from atlas_spark.stacklang.vocab import WORDS

CORPUS = "/root/reference/atlas-core/src/test/resources/queries.txt"


# ---------------------------------------------------------------- glossary


def test_glossary_covers_every_vocabulary_word():
    names = {w.name for w in WORDS}
    assert set(lsp.GLOSSARY) == names
    for name, entry in lsp.GLOSSARY.items():
        assert entry["signature"], name
        assert entry["summary"].endswith("."), name
        assert isinstance(entry["examples"], list), name


# ---------------------------------------------------------------- tokenize


def test_tokenize_spans_index_original_text():
    text = " name , cpu ,:eq, :sum "
    toks = lsp.tokenize(text)
    assert [t.text for t in toks] == ["name", "cpu", ":eq", ":sum"]
    for t in toks:
        assert text[t.start : t.end] == t.text


def test_position_is_line_character():
    text = "name,cpu,:eq,\n:sum"
    toks = lsp.tokenize(text)
    sum_tok = toks[-1]
    r = lsp.analyze(text)
    assert not r["diagnostics"]
    # semantic tokens restart the column delta on the new line
    assert text[sum_tok.start : sum_tok.end] == ":sum"


# -------------------------------------------------------------- diagnostics


def test_unknown_word_diagnostic_with_suggestion():
    r = lsp.analyze("name,cpu,:eqq,:sum")
    (d,) = r["diagnostics"]
    assert d["severity"] == 1
    assert "unknown word ':eqq'" in d["message"]
    assert "did you mean ':eq'" in d["message"]
    assert d["range"]["start"] == {"line": 0, "character": 9}
    assert d["range"]["end"] == {"line": 0, "character": 13}


def test_overload_mismatch_diagnostic_positioned_on_word():
    text = "name,cpu,:eq,:by"
    r = lsp.analyze(text)
    word, arg = r["diagnostics"]
    assert "no matching overload for ':by'" in word["message"]
    assert word["range"]["start"]["character"] == 13
    # argument-level diagnostic (computeParameterDiagnostics parity):
    # :by wants a List on top; the Query produced by :eq is flagged AT
    # the token that produced it
    assert arg["message"].startswith("expected List, got")
    s = arg["range"]["start"]["character"]
    assert text[s : s + 3] == ":eq"


def test_argument_mismatch_points_at_offending_literal():
    text = "name,cpu,:eq,:sum,xyz,:clamp-min"
    r = lsp.analyze(text)
    arg = next(d for d in r["diagnostics"] if d["message"].startswith("expected"))
    assert arg["message"] == 'expected Double, got String "xyz"'
    s, e = arg["range"]["start"]["character"], arg["range"]["end"]["character"]
    assert text[s:e] == "xyz"


def test_unmatched_parens_diagnostics():
    r = lsp.analyze("name,(,cpu,:eq")
    assert any("unmatched opening" in d["message"] for d in r["diagnostics"])
    r = lsp.analyze("name,cpu,),:eq")
    assert any("unmatched closing" in d["message"] for d in r["diagnostics"])


def test_semicolon_typo_warning():
    r = lsp.analyze("name,cpu,:eq,;sum")
    assert any(
        "did you mean ':sum'? (semicolon instead of colon)" == d["message"]
        and d["severity"] == 2
        for d in r["diagnostics"]
    )


def test_deprecated_word_warning():
    r = lsp.analyze("name,cpu,:eq,:sum,2,:head")
    warns = [d for d in r["diagnostics"] if d["severity"] == 2]
    assert warns and ":head is deprecated" in warns[0]["message"]
    # deprecation is a warning, not an error
    assert not [d for d in r["diagnostics"] if d["severity"] == 1]


# ---------------------------------------------------------- semantic tokens


def test_semantic_token_classification():
    r = lsp.analyze("name,42,:eq,(,a,),:bogus")
    toks = r["tokens"]
    assert len(toks) % 5 == 0
    types = [toks[i + 3] for i in range(0, len(toks), 5)]
    # name=string, 42=number, :eq=word, ( paren, a string, ) paren, :bogus unknown
    assert types == [
        lsp.TT_STRING,
        lsp.TT_NUMBER,
        lsp.TT_WORD,
        lsp.TT_PAREN,
        lsp.TT_STRING,
        lsp.TT_PAREN,
        lsp.TT_UNKNOWN_WORD,
    ]
    assert r["legend"] == lsp.TOKEN_LEGEND


def test_semantic_tokens_delta_encoding_multiline():
    text = "name,cpu,:eq,\n:sum"
    toks = lsp.analyze(text)["tokens"]
    rows = [toks[i : i + 5] for i in range(0, len(toks), 5)]
    # the :sum row starts a new line: deltaLine 1, absolute column 0
    assert rows[-1][0] == 1 and rows[-1][1] == 0 and rows[-1][2] == 4


# -------------------------------------------------------------------- hover


def test_hover_on_word_returns_glossary_markdown():
    text = "name,cpu,:eq,:sum"
    h = lsp.hover(text, text.index(":eq") + 1)
    v = h["contents"]["value"]
    assert "**:eq**" in v
    assert "`String String -- Query`" in v
    assert "**Examples:**" in v
    assert h["range"]["start"]["character"] == text.index(":eq")


def test_hover_on_literal_or_gap_is_none():
    assert lsp.hover("name,cpu,:eq", 1) is None  # literal
    assert lsp.hover("name,cpu,:eq", 200) is None  # past end


# --------------------------------------------------------------- completion


def test_completion_prefix_filters_and_matches_stack():
    text = "name,cpu,:e"
    items = lsp.complete(text, len(text))
    labels = [i["label"] for i in items]
    assert ":eq" in labels and ":ends" in labels
    assert ":each" not in labels  # needs two lists on the stack
    eq = next(i for i in items if i["label"] == ":eq")
    assert eq["detail"] == "String String -- Query"
    assert eq["insertText"] == ":eq,"


def test_completion_after_completed_word_offers_next_tokens():
    text = "name,cpu,:eq,"
    labels = [i["label"] for i in lsp.complete(text, len(text))]
    assert ":sum" in labels and ":not" in labels
    assert ":by" not in labels  # needs a list on the stack


def test_completion_on_broken_program_is_empty():
    text = "name,cpu,:bogus,:e"
    assert lsp.complete(text, len(text)) == []


def test_unicode_completion_curated_after_backslash_u():
    """`\\` or `\\u` at the cursor offers the curated set
    (AslDocumentAnalyzer.scala:967-978, 1221-1230)."""
    for text in ("name,a\\", "name,a\\u"):
        items = lsp.complete(text, len(text))
        assert len(items) == 8
        labels = [i["label"] for i in items]
        assert "\\u0020 Space" in labels  # cp < 0x21: no display char
        assert ", \\u002C Comma" in labels
        comma = next(i for i in items if "Comma" in i["label"])
        assert comma["textEdit"]["newText"] == "\\u002C"
        assert comma["detail"] == "U+002C"
        # the edit replaces from the backslash to the cursor
        assert comma["textEdit"]["range"]["start"]["character"] == 6
        assert comma["textEdit"]["range"]["end"]["character"] == len(text)


def test_unicode_completion_hex_prefix_and_exact():
    """A hex prefix filters the curated set; four digits add the exact
    code point when not already curated."""
    text = "name,a\\u00"
    items = lsp.complete(text, len(text))
    assert len(items) == 8  # all curated chars are U+00XX
    text = "name,a\\u0041"
    items = lsp.complete(text, len(text))
    assert len(items) == 1
    assert items[0]["textEdit"]["newText"] == "\\u0041"
    assert "LATIN CAPITAL LETTER A" in items[0]["label"]
    # an exact match that IS curated does not duplicate
    text = "name,a\\u0020"
    items = lsp.complete(text, len(text))
    assert len(items) == 1 and "Space" in items[0]["label"]


def test_unicode_completion_name_search():
    """A non-hex prefix searches character names across the BMP, all
    terms must match, capped at 50."""
    text = "name,a\\uleft arrow"
    items = lsp.complete(text, len(text))
    assert items and len(items) <= 50
    assert all(
        "LEFT" in i["label"].upper() and "ARROW" in i["label"].upper()
        for i in items
    )
    labels = [i["label"] for i in items]
    assert any("LEFTWARDS ARROW" in l for l in labels)
    # a broad term hits the cap
    assert len(lsp.complete("name,a\\uletter", len("name,a\\uletter"))) == 50


def test_unicode_completion_only_inside_escape():
    """A backslash followed by a non-u char is not an escape context and
    word completions proceed normally."""
    text = "name,cpu,:e"
    assert all(i["label"].startswith(":") for i in lsp.complete(text, len(text)))
    items = lsp.complete("name,a\\x", 8)
    # plain word completions (the token is just a string literal here),
    # never unicode items
    assert items and all(i["label"].startswith(":") for i in items)


# ------------------------------------------------------------------- corpus


def test_corpus_expressions_analyze_clean():
    """Every reference corpus expression must analyze with zero ERROR
    diagnostics and produce a full semantic-token row per source token —
    the analyzer must accept everything the evaluator accepts."""
    from urllib.parse import parse_qs, urlparse

    qs = []
    for line in open(CORPUS):
        q = parse_qs(urlparse(line.strip()).query).get("q", [None])[0]
        if q:
            qs.append(q)
    assert len(qs) > 300
    for q in qs:
        r = lsp.analyze(q)
        errors = [d for d in r["diagnostics"] if d["severity"] == 1]
        assert not errors, (q[:100], errors[:2])
        assert len(r["tokens"]) == 5 * len(lsp.tokenize(q))


def test_executor_value_errors_become_diagnostics_not_exceptions():
    """Word executors can raise raw ValueError (bad numeric literal in
    :percentiles etc.) — the analyzer must yield a positioned diagnostic,
    never propagate (the HTTP endpoint would 400 with no tokens)."""
    text = "name,cpu,:eq,:sum,(,a,),:percentiles"
    r = lsp.analyze(text)
    (d,) = [d for d in r["diagnostics"] if d["severity"] == 1]
    start = d["range"]["start"]["character"]
    assert text[start:].startswith(":percentiles")
    assert len(r["tokens"]) == 5 * len(lsp.tokenize(text))
    # completion over the same broken prefix degrades to empty, not a raise
    assert lsp.complete(text + ",:e", len(text) + 3) == []


# --------------------------------------------------------------- definition


def test_definition_get_resolves_to_latest_set():
    text = "v,name,a,:eq,:set,v,name,b,:eq,:set,v,:get,:sum"
    # cursor on the :get word
    off = text.rindex(":get") + 1
    d = lsp.definition(text, off)
    s = d["range"]["start"]["character"]
    # resolves to the SECOND (latest preceding) :set
    assert text[:s].count(":set") == 1 and text[s : s + 4] == ":set"
    # cursor on the variable literal before :get resolves identically
    d2 = lsp.definition(text, text.rindex("v,:get"))
    assert d2 == d


def test_definition_sset_and_misses():
    text = "u,:sset,u,:get"
    d = lsp.definition(text, text.index(":get") + 1)
    assert text[d["range"]["start"]["character"] :].startswith(":sset")
    assert lsp.definition("w,:get", 3) is None  # no binding
    assert lsp.definition("name,cpu,:eq", 2) is None  # not a reference


# ------------------------------------------------- symbols + code actions


def test_document_symbols_consumption_tree():
    text = "name,sps,:eq,:sum,(,nf.asg,),:by"
    (by,) = lsp.document_symbols(text)
    assert by["name"] == ":by" and by["kind"] == "Function"
    agg, arr = by["children"]
    assert agg["name"] == ":sum" and arr["kind"] == "Array"
    assert arr["children"][0] == {
        "name": "nf.asg",
        "kind": "String",
        "range": lsp._range(text, 20, 26),
        "selectionRange": lsp._range(text, 20, 26),
        "children": [],
    }
    (eq,) = agg["children"]
    assert [c["name"] for c in eq["children"]] == ["name", "sps"]
    # the :by range spans from its first consumed child to the word
    assert by["range"]["start"]["character"] == 0
    assert by["range"]["end"]["character"] == len(text)


def test_format_compress_roundtrip_on_corpus():
    """format() breaks groups across lines, compress() restores the
    compact form: for every corpus expression the compress(format(q))
    round-trip must be token-identical to compress(q), and the formatted
    text must re-analyze without NEW errors."""
    from urllib.parse import parse_qs, urlparse

    qs = []
    for line in open(CORPUS):
        q = parse_qs(urlparse(line.strip()).query).get("q", [None])[0]
        if q:
            qs.append(q)
    for q in qs:
        f = lsp.format_expression(q)
        assert lsp.compress_expression(f) == lsp.compress_expression(q), q[:80]


def test_code_actions_typo_and_rewrites():
    acts = lsp.code_actions("name,cpu,:eq,;sum")
    assert acts[0]["title"] == "Replace with ':sum'"
    assert acts[0]["kind"] == "quickfix"
    text = "name , cpu,:eq,:sum"
    titles = [a["title"] for a in lsp.code_actions(text)]
    assert "Compress expression" in titles
    comp = next(a for a in lsp.code_actions(text) if a["title"] == "Compress expression")
    assert comp["edit"]["newText"] == "name,cpu,:eq,:sum"
    # error programs get quickfixes only, no refactor rewrites
    assert all(
        a["kind"] == "quickfix" for a in lsp.code_actions("name,cpu,:eq,:pow")
    )


def test_normalize_action_canonicalizes():
    n = lsp.normalize_expression("name,cpu,:eq,:true,:and,:sum")
    assert n == "name,cpu,:eq,:sum"  # :true folds away
    assert lsp.normalize_expression("name,cpu,:bogus") is None


# ------------------------------------------------------------- URI analyzer


def test_parse_uri_spans_and_decoding():
    text = "/api/v1/graph?q=name,a%20b,:eq&w=700"
    parsed = lsp.parse_uri(text)
    assert parsed.path == "/api/v1/graph"
    q, w = parsed.query
    assert (q.key, w.key) == ("q", "w")
    assert q.decoded == "name,a b,:eq"
    assert text[q.value_start : q.value_end] == "name,a%20b,:eq"
    # offset round-trip through the %20: decoded index of ':' in ':eq'
    di = q.decoded.index(":eq")
    raw = q.decoded_to_raw(di)
    assert text[raw : raw + 3] == ":eq"
    assert q.raw_to_decoded(raw) == di


def test_uri_missing_q_is_error():
    r = lsp.analyze_uri("/api/v1/graph?w=700")
    assert any(
        d["message"] == "Missing required 'q' parameter" and d["severity"] == 1
        for d in r["diagnostics"]
    )


def test_uri_unknown_param_warning_known_axis_suffix_ok():
    r = lsp.analyze_uri("/api/v1/graph?q=name,a,:eq,:sum&bogus=1&u.1=5")
    msgs = [d["message"] for d in r["diagnostics"]]
    assert "Unknown parameter 'bogus'" in msgs
    assert not any("u.1" in m for m in msgs)


def test_uri_expression_diagnostics_shift_to_raw_offsets():
    text = "/api/v1/graph?w=700&q=name,cpu,:eqq"
    r = lsp.analyze_uri(text)
    d = next(d for d in r["diagnostics"] if "unknown word" in d["message"])
    start = d["range"]["start"]["character"]
    end = d["range"]["end"]["character"]
    assert text[start:end] == ":eqq"


def test_uri_semantic_tokens_classify_path_params_expression():
    text = "/api/v1/graph?q=name,42,:eq&w=700"
    r = lsp.analyze_uri(text)
    rows = [r["tokens"][i : i + 5] for i in range(0, len(r["tokens"]), 5)]
    types = [row[3] for row in rows]
    # path, ?, q, =, name, 42, :eq, &, w, =, 700
    assert types == [
        lsp.TT_PATH,
        lsp.TT_URI_OPERATOR,
        lsp.TT_PARAMETER,
        lsp.TT_URI_OPERATOR,
        lsp.TT_STRING,
        lsp.TT_NUMBER,
        lsp.TT_WORD,
        lsp.TT_URI_OPERATOR,
        lsp.TT_PARAMETER,
        lsp.TT_URI_OPERATOR,
        lsp.TT_STRING,
    ]
    # absolute offsets reconstruct from the deltas (all line 0)
    offs, pos = [], 0
    for row in rows:
        pos += row[1]
        offs.append(pos)
    assert offs[0] == 0 and text[offs[2]] == "q" and text[offs[8]] == "w"


def test_uri_hover_path_param_and_expression():
    text = "/api/v1/graph?q=name,cpu,:eq,:sum&tz=UTC"
    assert "**Path:**" in lsp.hover_uri(text, 3)["contents"]["value"]
    h = lsp.hover_uri(text, text.index("tz="))
    assert "**tz:**" in h["contents"]["value"]
    h = lsp.hover_uri(text, text.index(":eq") + 1)
    assert "**:eq**" in h["contents"]["value"]
    start = h["range"]["start"]["character"]
    assert text[start : start + 3] == ":eq"


def test_uri_completion_params_and_expression():
    text = "/api/v1/graph?q=name,cpu,:eq,:sum&the"
    items = lsp.complete_uri(text, len(text))
    assert [i["label"] for i in items] == ["theme"]
    assert items[0]["insertText"] == "theme="
    text2 = "/api/v1/graph?q=name,cpu,:e"
    labels = [i["label"] for i in lsp.complete_uri(text2, len(text2))]
    assert ":eq" in labels and ":ends" in labels


def test_uri_utf8_percent_decoding_offsets():
    """%XX escapes decode as UTF-8 BYTES: café is 4 decoded chars from 6
    raw ones, and offsets after the escape map to the right raw spans."""
    text = "/api/v1/graph?q=name,caf%C3%A9,:eq"
    parsed = lsp.parse_uri(text)
    q = parsed.query[0]
    assert q.decoded == "name,café,:eq"
    di = q.decoded.index(":eq")
    raw = q.decoded_to_raw(di)
    assert text[raw : raw + 3] == ":eq"
    assert q.raw_to_decoded(raw) == di
    r = lsp.analyze_uri(text)
    assert not [d for d in r["diagnostics"] if d["severity"] == 1]


def test_uri_encoded_newline_positions():
    """A %0A inside q makes the DECODED expression multi-line; token
    spans and diagnostic ranges must still land on the right raw URI
    characters (flattened through the decoded line starts)."""
    text = "/api/v1/graph?q=name,cpu,:eq%0A,:summ"
    r = lsp.analyze_uri(text)
    d = next(d for d in r["diagnostics"] if "unknown word" in d["message"])
    s, e = d["range"]["start"]["character"], d["range"]["end"]["character"]
    assert text[s:e] == ":summ"
    assert d["range"]["start"]["line"] == 0  # raw URI is single-line
    # the :summ token's span covers the raw characters
    rows = [r["tokens"][i : i + 5] for i in range(0, len(r["tokens"]), 5)]
    offs, pos = [], 0
    for row in rows:
        pos += row[1]
        offs.append((pos, row[2]))
    spans = [text[o : o + ln] for o, ln in offs]
    assert ":summ" in spans and ":eq" in spans


def test_uri_counter_summary_never_raises():
    from atlas_spark.streaming import lwc_wire

    sm = lwc_wire.StreamSubscriptionManager(step=60)
    meta = lwc_wire.StreamMetadata("s1")
    sm.register(meta, lwc_wire.QueueHandler(meta))

    def boom():
        raise RuntimeError("session torn down")

    sm.attach_counters("s1", boom)
    summary = sm.stream_summary("s1")
    assert summary["ingest"]["error"] == "RuntimeError: session torn down"
    assert summary["metadata"]["streamId"] == "s1"


def test_uri_corpus_analyzes_clean():
    """Every reference corpus URI analyzes with zero ERROR diagnostics
    (warnings for unknown params are allowed — the corpus includes
    legacy params by design)."""
    uris = [line.strip() for line in open(CORPUS) if line.strip()]
    assert len(uris) > 300
    for u in uris:
        r = lsp.analyze_uri(u)
        errors = [d for d in r["diagnostics"] if d["severity"] == 1]
        assert not errors, (u[:100], errors[:2])


# --------------------------------------------------------------- http layer


@pytest.fixture(scope="module")
def served(spark, sf_dir):
    engine = Engine(spark, sf_dir)
    srv, thread = http_api.start(engine, port=0)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url: str, obj) -> tuple[int, dict]:
    req = urllib.request.Request(url, data=json.dumps(obj).encode(), method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_lsp_analyze_diagnostics(served):
    status, out = _post(
        f"{served}/api/v1/lsp/analyze", {"expression": "name,cpu,:eqq,:sum"}
    )
    assert status == 200
    assert "did you mean ':eq'" in out["diagnostics"][0]["message"]
    assert out["tokens"] and out["legend"] == lsp.TOKEN_LEGEND
    assert "hover" not in out  # no offset given


def test_http_lsp_analyze_hover_and_completions(served):
    expr = "name,cpu,:eq,:su"
    status, out = _post(
        f"{served}/api/v1/lsp/analyze",
        {"expression": expr, "offset": len(expr)},
    )
    assert status == 200
    labels = [i["label"] for i in out["completions"]]
    # only :sum matches — :sub needs TWO series on the stack
    assert labels == [":sum"]
    # hover at the cursor: partial word, not in glossary -> null
    assert out["hover"] is None
    status, out = _post(
        f"{served}/api/v1/lsp/analyze",
        {"expression": "name,cpu,:eq,:sum", "offset": 10},
    )
    assert "**:eq**" in out["hover"]["contents"]["value"]


def test_http_lsp_analyze_requires_expression(served):
    status, out = _post(f"{served}/api/v1/lsp/analyze", {"offset": 3})
    assert status == 400
    assert "expression" in out["message"]


def test_http_lsp_analyze_uri(served):
    text = "/api/v1/graph?w=700&q=name,cpu,:eqq"
    status, out = _post(
        f"{served}/api/v1/lsp/analyze-uri",
        {"expression": text, "offset": text.index(":eqq") + 1},
    )
    assert status == 200
    d = next(d for d in out["diagnostics"] if "unknown word" in d["message"])
    s, e = d["range"]["start"]["character"], d["range"]["end"]["character"]
    assert text[s:e] == ":eqq"
    assert out["hover"] is None  # unknown word has no glossary hover
    status, out = _post(
        f"{served}/api/v1/lsp/analyze-uri",
        {"expression": "/api/v1/graph?q=name,cpu,:eq,:sum&f", "offset": 35},
    )
    assert [i["label"] for i in out["completions"]] == ["features", "format"]


def test_http_lsp_glossary(served):
    with urllib.request.urlopen(f"{served}/api/v1/lsp/glossary") as resp:
        assert resp.status == 200
        words = json.loads(resp.read())["words"]
    assert set(words) == {w.name for w in WORDS}
    assert words["eq"]["signature"] == "String String -- Query"


# ------------------------------------------------------------------ fuzzing


def test_analyzer_total_over_corrupted_corpus():
    """Editors feed the analyzer every intermediate keystroke state: all
    entry points must be TOTAL over corrupted input — never raise.
    Deterministic corruption sweep: for a sample of corpus expressions,
    delete/duplicate/swap characters, inject stray colons/semicolons/
    parens/percent junk, truncate mid-token; run analyze/hover/complete/
    symbols/actions and the URI layer on every variant."""
    import random
    from urllib.parse import parse_qs, urlparse

    rng = random.Random(20260815)
    qs = []
    for line in open(CORPUS):
        q = parse_qs(urlparse(line.strip()).query).get("q", [None])[0]
        if q:
            qs.append(q)
    sample = rng.sample(qs, 40)
    junk = [":", ";", ",", "(", ")", "%", "%2", "\\u0", "\n", " ", ":bogus"]

    def corruptions(q):
        yield q[: rng.randrange(len(q))]  # truncate
        i = rng.randrange(len(q))
        yield q[:i] + q[i + 1 :]  # delete
        yield q[:i] + rng.choice(junk) + q[i:]  # inject
        yield q[::-1]  # reverse
        yield q + ","  # trailing comma
        yield "," + q

    checked = 0
    for q in sample:
        for c in corruptions(q):
            r = lsp.analyze(c)
            assert isinstance(r["diagnostics"], list)
            assert len(r["tokens"]) % 5 == 0
            off = rng.randrange(len(c) + 1) if c else 0
            lsp.hover(c, off)
            lsp.complete(c, off)
            lsp.document_symbols(c)
            lsp.code_actions(c)
            uri = f"/api/v1/graph?q={c}&s=e-3h"
            lsp.analyze_uri(uri)
            lsp.hover_uri(uri, min(off + 16, len(uri)))
            lsp.complete_uri(uri, min(off + 16, len(uri)))
            checked += 1
    assert checked >= 200


def test_unicode_exact_hex_skips_unnamed_code_points():
    """Defined-but-unnamed code points (Cc controls like U+0007) must not
    produce a completion item with an empty description (ADVICE r11);
    named exact matches still complete."""
    from atlas_spark.lsp import _unicode_name, complete

    assert _unicode_name(0x0007) is None  # BEL: name field is <control>
    assert _unicode_name(0x0041) == "LATIN CAPITAL LETTER A"

    s = "name,\\u0007"
    items = complete(s, len(s))
    assert items == [], items
    s = "name,\\u0041"
    items = complete(s, len(s))
    assert any("LATIN CAPITAL LETTER A" in i["label"] for i in items), items
    assert all("  " not in i["label"] for i in items), items
