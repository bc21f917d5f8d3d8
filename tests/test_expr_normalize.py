"""ExprNormalizer parity (ExprNormalizer.scala + ExprApiSuite.scala).

Every case in this file is ported from the reference's ExprApiSuite
normalize/ordering sections (ExprApiSuite.scala:110-700) and pins the
EXACT normalized strings the reference's `/api/v1/expr/normalize`
endpoint returns — legend-var parenthesisation, `:stat`->`:stat-*`
collapse, query clause ordering by key importance (prefix keys, regular
keys, suffix keys), redundant-disjunct removal, and the `,:const` /
`,:line` display strips.
"""

from __future__ import annotations

import pytest

from atlas_spark.model.expr import _fmt_double
from atlas_spark.model.normalizer import ExprNormalizer
from atlas_spark.stacklang.vocab import parse
from atlas_spark.util.strings import substitute

_N = ExprNormalizer()


def norm(q: str) -> list[str]:
    return [_N.normalize_to_string(se) for se in parse(q, step=60)]


NORMALIZE_CASES = [
    # ExprApiSuite.scala:114-170 (endpoint goldens)
    ("name,sps,:eq", ["name,sps,:eq,:sum"]),
    (
        "name,sps,:eq,:dup,2,:mul,:swap",
        ["name,sps,:eq,:sum,2.0,:mul", "name,sps,:eq,:sum"],
    ),
    ("name,sps,:eq,:dup,:and", ["name,sps,:eq,:sum"]),
    ("name,sps,:eq,name,(,sps,),:in,:and", ["name,sps,:eq,:sum"]),
    ("name,sps,:eq,name,(,sps,sps,),:in,:and", ["name,sps,:eq,:sum"]),
    (
        "name,(,sps1,sps2,),:in,name,(,sps2,sps1,),:in,:and",
        ["name,(,sps1,sps2,),:in,:sum"],
    ),
    (
        "name,latency,:eq,0,5,:sample-count",
        ["name,latency,:eq,0.0,5.0,:sample-count"],
    ),
    (
        "name,latency,:eq,0,5,:sample-count,(,app,),:by",
        ["name,latency,:eq,0.0,5.0,:sample-count,(,app,),:by"],
    ),
    (
        "(,name,:swap,:eq,nf.cluster,foo,:eq,:and,:sum,),foo,:sset,"
        "cpu,foo,:fcall,disk,foo,:fcall",
        [
            "name,cpu,:eq,nf.cluster,foo,:eq,:and,:sum",
            "name,disk,:eq,nf.cluster,foo,:eq,:and,:sum",
        ],
    ),
    # ExprApiSuite.scala:339-500 (direct normalize section)
    ("app,foo,:eq,name,cpuUser,:eq,:and,:avg", ["name,cpuUser,:eq,app,foo,:eq,:and,:avg"]),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:dist-avg",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:dist-avg"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:dist-avg,(,nf.cluster,),:by",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:dist-avg,(,nf.cluster,),:by"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:dist-stddev",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:dist-stddev"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:dist-max",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:dist-max"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:dist-avg,"
        "name,cpuSystem,:eq,app,foo,:eq,:and,:max",
        [
            "name,cpuUser,:eq,app,foo,:eq,:and,:dist-avg",
            "name,cpuSystem,:eq,app,foo,:eq,:and,:max",
        ],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:avg,(,nf.cluster,),:by,:pct",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:avg,(,nf.cluster,),:by,:pct"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,nf.cluster,),:by,"
        ":stat-max,5.0,:gt,:filter",
        [
            "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,nf.cluster,),:by,"
            ":stat-max,5.0,:gt,:filter"
        ],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,nf.cluster,),:by,"
        ":stat-max,:filter",
        [
            "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,nf.cluster,),:by,"
            ":stat-max,:filter"
        ],
    ),
    (
        "name,sps,:eq,(,nf.cluster,),:by,:dup,max,:stat,5,:gt,:filter",
        ["name,sps,:eq,:sum,(,nf.cluster,),:by,:stat-max,5.0,:gt,:filter"],
    ),
    (
        "name,sps,:eq,(,nf.cluster,),:by,:dup,:dup,max,:stat,:swap,avg,"
        ":stat,:sub,5,:gt,:filter",
        [
            "name,sps,:eq,:sum,(,nf.cluster,),:by,:stat-max,:stat-avg,"
            ":sub,5.0,:gt,:filter"
        ],
    ),
    ("name,a,:eq,name,b,:eq,:or,name,a,:eq,:or", ["name,a,:eq,name,b,:eq,:or,:sum"]),
    (
        "name,a,:eq,:sum,b,:has,c,:has,:or,:cq,b,:has,c,:has,:or,:cq",
        ["name,a,:eq,b,:has,:and,name,a,:eq,c,:has,:and,:or,:sum"],
    ),
    (
        "app,foo,:eq,name,cpuUser,:eq,:and,:true,:and,:sum",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:sum"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,"
        "name,cpuUser2,:eq,app,bar,:eq,:and,:or,:sum",
        [
            "name,cpuUser,:eq,app,foo,:eq,:and,"
            "name,cpuUser2,:eq,app,bar,:eq,:and,:or,:sum"
        ],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:sum,:des-fast",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:sum,:des-fast"],
    ),
    ("name,cpuUser,:eq,:sum,$name,:legend", ["name,cpuUser,:eq,:sum,$(name),:legend"]),
    ("name,cpuUser,:eq,:sum,$(name),:legend", ["name,cpuUser,:eq,:sum,$(name),:legend"]),
    (
        "name,cpuUser,:eq,:sum,foo$name$abc bar$(def)baz,:legend",
        ["name,cpuUser,:eq,:sum,foo$(name)$(abc) bar$(def)baz,:legend"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by,:line",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by,:stack",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by,:stack"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by,:area",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by,:area"],
    ),
    (
        "name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by,:vspan",
        ["name,cpuUser,:eq,app,foo,:eq,:and,:sum,(,stack,),:by,:vspan"],
    ),
    # ExprApiSuite.scala:592-700 (ordering section)
    (
        "nf.cluster,foo,:eq,nf.app,bar,:eq,:and,:sum",
        ["nf.app,bar,:eq,nf.cluster,foo,:eq,:and,:sum"],
    ),
    (
        "nf.cluster,c,:eq,name,n,:eq,nf.stack,s,:eq,nf.app,a,:eq,"
        ":and,:and,:and,:sum",
        [
            "name,n,:eq,nf.app,a,:eq,:and,nf.stack,s,:eq,:and,"
            "nf.cluster,c,:eq,:and,:sum"
        ],
    ),
    ("app,foo,:eq,name,bar,:eq,:and,:sum", ["name,bar,:eq,app,foo,:eq,:and,:sum"]),
    (
        "zoo,z,:eq,app,a,:eq,foo,f,:eq,:and,:and,:sum",
        ["app,a,:eq,foo,f,:eq,:and,zoo,z,:eq,:and,:sum"],
    ),
    (
        "statistic,count,:eq,app,foo,:eq,:and,:sum",
        ["app,foo,:eq,statistic,count,:eq,:and,:sum"],
    ),
    (
        "statistic,count,:eq,name,foo,:eq,:and,:sum",
        ["name,foo,:eq,statistic,count,:eq,:and,:sum"],
    ),
    (
        "statistic,count,:eq,app,foo,:eq,name,bar,:eq,:and,:and,:sum",
        ["name,bar,:eq,app,foo,:eq,:and,statistic,count,:eq,:and,:sum"],
    ),
    (
        "nf.node,8,:eq,nf.zone,7,:eq,nf.region,6,:eq,nf.asg,5,:eq,"
        "nf.cluster,4,:eq,nf.stack,3,:eq,nf.app,2,:eq,name,1,:eq,"
        ":and,:and,:and,:and,:and,:and,:and,:sum",
        [
            "name,1,:eq,nf.app,2,:eq,:and,nf.stack,3,:eq,:and,"
            "nf.cluster,4,:eq,:and,nf.asg,5,:eq,:and,nf.region,6,:eq,:and,"
            "nf.zone,7,:eq,:and,nf.node,8,:eq,:and,:sum"
        ],
    ),
    ("name,aaa,:eq,:sum", ["name,aaa,:eq,:sum"]),
    ("name,zzz,:eq,:sum", ["name,zzz,:eq,:sum"]),
    (
        "name,zzz,:eq,name,aaa,:eq,:or,:sum",
        ["name,aaa,:eq,name,zzz,:eq,:or,:sum"],
    ),
    (
        "statistic,s,:eq,zoo,z,:eq,nf.app,na,:eq,foo,f,:eq,name,n,:eq,"
        "app,a,:eq,:and,:and,:and,:and,:and,:sum",
        [
            "name,n,:eq,nf.app,na,:eq,:and,app,a,:eq,:and,foo,f,:eq,:and,"
            "zoo,z,:eq,:and,statistic,s,:eq,:and,:sum"
        ],
    ),
    (
        "statistic,s,:eq,foo,f,:eq,bar,b,:eq,name,n,:eq,:and,:and,:and,:sum",
        ["name,n,:eq,bar,b,:eq,:and,foo,f,:eq,:and,statistic,s,:eq,:and,:sum"],
    ),
    (
        "nf.zone,z,:eq,nf.cluster,c,:eq,name,n,:eq,:and,:and,:sum",
        ["name,n,:eq,nf.cluster,c,:eq,:and,nf.zone,z,:eq,:and,:sum"],
    ),
]


@pytest.mark.parametrize("q,want", NORMALIZE_CASES, ids=[c[0][:60] for c in NORMALIZE_CASES])
def test_normalize_reference_case(q, want):
    assert norm(q) == want


def test_normalize_query_order_equivalence():
    # ExprApiSuite.scala:339-343
    assert norm("app,foo,:eq,name,cpu,:eq,:and") == norm(
        "name,cpu,:eq,app,foo,:eq,:and"
    )


def test_normalize_idempotent():
    for q, want in NORMALIZE_CASES:
        for w in want:
            assert norm(w) == [w], w


def test_regex_feature_rejection():
    """Inline flag groups and back references are client errors
    (ExprApiSuite.scala:52-60); non-capturing groups stay legal."""
    with pytest.raises(ValueError, match="unsupported regex"):
        parse("a,(?i)b,:re", step=60)
    with pytest.raises(ValueError, match="unsupported regex"):
        parse(r"a,\1,:re", step=60)
    with pytest.raises(ValueError, match="unsupported regex"):
        parse("a,(?i)b,:reic", step=60)
    assert parse("a,(?:b|c)d,:re", step=60)
    assert parse(r"a,\(?,:re", step=60)  # escaped paren + optional


def test_substitute_parity():
    """Strings.substitute (Strings.scala:435-456)."""
    f = lambda k: f"$({k})"  # noqa: E731
    assert substitute("$name", f) == "$(name)"
    assert substitute("$(name)", f) == "$(name)"
    assert substitute("foo$name$abc bar$(def)baz", f) == "foo$(name)$(abc) bar$(def)baz"
    assert substitute("a$", f) == "a$"
    assert substitute("$$name", f) == "$$(name)"
    assert substitute("50%$ of $total", f) == "50%$ of $(total)"


def test_fmt_double_java_parity():
    """Java Double.toString forms (decimal in [1e-3, 1e7), else
    scientific), used for Double-typed display params."""
    cases = {
        2.0: "2.0",
        0.1: "0.1",
        0.001: "0.001",
        0.0001: "1.0E-4",
        1e7: "1.0E7",
        9999999.0: "9999999.0",
        12345678.0: "1.2345678E7",
        123.456: "123.456",
        -2.5: "-2.5",
        1e15: "1.0E15",
        1.5e-8: "1.5E-8",
        float("inf"): "Infinity",
        float("-inf"): "-Infinity",
    }
    for v, want in cases.items():
        assert _fmt_double(v) == want, v
    assert _fmt_double(0.0) == "0.0"
    assert _fmt_double(-0.0) == "-0.0"
    assert _fmt_double(float("nan")) == "NaN"


def test_regex_rejection_escape_parity():
    """Escape-pair-aware scan: `re.escape`d values containing `\\1` are
    valid (the backslash is itself escaped), while a real back reference
    or an inline-flag group hiding behind an escaped backslash is still
    rejected."""
    # :contains escapes its value -> pattern carries \\1 (escaped backslash)
    assert parse(r"a,foo\1bar,:contains", step=60)
    with pytest.raises(ValueError, match="unsupported regex"):
        parse(r"a,\\(?i)b,:re", step=60)  # (?i) after an ESCAPED backslash


def test_remove_redundant_is_reference_quirk_faithful():
    """removeRedundantClauses drops a disjunct only when it is a superset
    of EVERY other disjunct (the reference's forall,
    ExprNormalizer.scala:116-132): with an unrelated third disjunct the
    implied term survives, exactly like the reference endpoint."""
    assert norm("a,1,:eq,a,1,:eq,b,2,:eq,:and,:or") == ["a,1,:eq,:sum"]
    assert norm("a,1,:eq,a,1,:eq,b,2,:eq,:and,:or,c,3,:eq,:or") == [
        "a,1,:eq,a,1,:eq,b,2,:eq,:and,:or,c,3,:eq,:or,:sum"
    ]


def test_substitute_empty_and_unterminated():
    """Empty `$()` and unterminated `$(` render a literal `$` with the
    scanned delimiters consumed (Strings.scala parenVar advance)."""
    f = lambda k: f"<{k}>"  # noqa: E731
    assert substitute("foo$()bar", f) == "foo$bar"
    assert substitute("foo$(bar", f) == "foo$bar"


def test_debug_empty_program_verifies_contract():
    """The reference verifies the final stack even for an empty program
    (the trace always carries the initial step)."""
    from atlas_spark.api import _verify_stack_contents

    with pytest.raises(ValueError, match="stack is empty"):
        _verify_stack_contents("query", [])
    _verify_stack_contents("std", [])  # std accepts anything


# --------------------------------------------------- property-based checks


def test_sort_query_properties_random_trees():
    """Adversarial complement to the ported cases: over random query
    trees, the normalizer's clause sort must (a) preserve matching
    semantics on random tag maps, (b) be idempotent, and (c) produce one
    canonical string for operand-order variants of the same tree."""
    import random

    from atlas_spark.model import query as Q
    from test_property_differential import BUCKETS, NAMES, rand_query

    norm_q = _N.sort_query
    rng = random.Random(2024)
    for _ in range(200):
        q = rand_query(rng)
        s = norm_q(q)
        # (a) semantics on random tag maps (incl. partial maps)
        for _ in range(20):
            tags = {}
            if rng.random() < 0.9:
                tags["name"] = rng.choice(NAMES)
            if rng.random() < 0.9:
                tags["bucket"] = rng.choice(BUCKETS)
            assert s.matches(tags) == q.matches(tags), (
                q.display(),
                s.display(),
                tags,
            )
        # (b) idempotent
        assert norm_q(s).display() == s.display()
        # (c) operand order canonical
        if isinstance(q, (Q.AndQuery, Q.OrQuery)):
            flipped = type(q)(q.q2, q.q1)
            assert norm_q(flipped).display() == s.display()
