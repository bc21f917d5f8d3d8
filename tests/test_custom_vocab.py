"""Config-driven vocabulary (CustomVocabulary.scala / its suite)."""

from __future__ import annotations

import pytest

from atlas_spark.model import expr as E
from atlas_spark.model import query as Q
from atlas_spark.stacklang.custom import parse_custom
from atlas_spark.stacklang.vocab import parse

CONFIG = {
    "words": [{"name": "square", "body": ":dup,:mul"}],
    "custom-averages": [
        {
            "name": "node-avg",
            "base-query": "name,num.nodes,:eq",
            "keys": ["app", "cluster", "zone"],
        }
    ],
}

CPU = "name,cpu.user,:eq"
NODES = "name,num.nodes,:eq"


def _unwrap(se):
    e = se.expr
    return e.evaluated if isinstance(e, E.NamedRewrite) else e


def test_custom_word_macro():
    (se,) = parse_custom(f"{CPU},:sum,:square", CONFIG)
    e = se.expr
    assert isinstance(e, E.BinaryMathExpr) and e.op == "mul"
    assert e.lhs == e.rhs


def test_simple_average():
    (se,) = parse_custom(f"{CPU},:node-avg", CONFIG)
    (want,) = parse(f"{CPU},:sum,{NODES},:sum,:div")
    assert _unwrap(se) == want.expr


def test_expr_with_cluster_scopes_denominator():
    (se,) = parse_custom(f"{CPU},cluster,foo,:eq,:and,:node-avg", CONFIG)
    (want,) = parse(
        f"{CPU},cluster,foo,:eq,:and,:sum,{NODES},cluster,foo,:eq,:and,:sum,:div"
    )
    assert _unwrap(se) == want.expr


def test_non_infrastructure_tags_dropped_from_denominator():
    # id is not in the configured keys -> denominator keeps only base query
    (se,) = parse_custom(f"{CPU},id,user,:eq,:and,:node-avg", CONFIG)
    (want,) = parse(f"{CPU},id,user,:eq,:and,:sum,{NODES},:sum,:div")
    assert _unwrap(se) == want.expr


def test_grouped_by_infrastructure_tags():
    (se,) = parse_custom(f"{CPU},:node-avg,(,zone,),:by", CONFIG)
    (want,) = parse(f"{CPU},:sum,(,zone,),:by,{NODES},:sum,(,zone,),:by,:div")
    assert _unwrap(se) == want.expr


def test_grouped_by_non_infrastructure_tags():
    # name is not an infrastructure key -> denominator stays ungrouped
    (se,) = parse_custom(f"{CPU},:node-avg,(,name,),:by", CONFIG)
    (want,) = parse(f"{CPU},:sum,(,name,),:by,{NODES},:sum,:div")
    assert _unwrap(se) == want.expr


def test_custom_avg_through_cg():
    (se,) = parse_custom(f"{CPU},:node-avg,(,cluster,),:cg", CONFIG)
    (want,) = parse(f"{CPU},:sum,(,cluster,),:by,{NODES},:sum,(,cluster,),:by,:div")
    assert _unwrap(se) == want.expr


def test_standard_vocab_unaffected():
    with pytest.raises(Exception):
        parse(f"{CPU},:node-avg")
