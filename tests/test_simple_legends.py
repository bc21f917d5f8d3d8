"""Simple-legend generation parity (SimpleLegends.scala via
SimpleLegendsSuite.scala:47-162).

Every case is ported from the reference suite (cases relying on the
reference test build's custom `:node-avg`/`:test-rewrite` words are
re-expressed at the bottom through OUR custom-vocabulary config, which
follows the same NamedRewrite/groupby_rewrite machinery)."""

from __future__ import annotations

import pytest

from atlas_spark.api import Engine
from atlas_spark.model import expr as E
from atlas_spark.model.simple_legends import generate
from atlas_spark.stacklang.vocab import parse

NOT_SET = "NOT_SET"


def legends(q: str) -> list[str]:
    exprs = parse(q, step=60)
    pairs = [p for se in exprs for p in Engine._expand_offsets(se)]
    gen = generate([se for se, _ in pairs], [bool(off) for _, off in pairs])
    return [
        se.settings_dict().get("legend", NOT_SET)
        if isinstance(se, E.StyleExpr)
        else NOT_SET
        for se in gen
    ]


CASES = [
    # SimpleLegendsSuite.scala:47-162
    ("name,cpu,:eq,:sum,foo,:legend", ["foo"]),
    ("4,5,:add,10,:mul", [NOT_SET]),
    ("name,cpu,:eq,:sum,seconds,:time", ["cpu", NOT_SET]),
    ("name,cpu,:eq,:sum", ["cpu"]),
    ("name,cpu,:eq,id,user,:eq,:and,:sum", ["cpu"]),
    ("name,cpu,:eq,:sum,(,app,id,),:by", ["$(app) $(id)"]),
    ("name,cpu,:eq,:sum,4,:add,6,:mul,:abs", ["cpu"]),
    ("name,cpu,:re,:sum", ["cpu"]),
    ("id,user,:eq,:sum", ["user"]),
    (
        "name,cpu,:eq,:sum,(,0h,1w,),:offset",
        ["cpu", "cpu (offset=$(atlas.offset))"],
    ),
    ("name,cpu,:eq,:avg", ["cpu"]),
    ("name,cpu,:eq,:dist-avg", ["cpu"]),
    ("name,cpu,:eq,:dist-stddev", ["cpu"]),
    ("name,cpu,:eq,:not,:sum", ["!cpu"]),
    ("name,sys.cpu,:starts,:sum", ["sys.cpu"]),
    ("name,sys.cpu,:contains,:sum", ["sys.cpu"]),
    (
        "name,cpu,:eq,:sum,(,id,),:by,(,0h,1w,),:offset",
        ["$(id)", "$(id) (offset=$(atlas.offset))"],
    ),
    ("name,cpu,:eq,:sum,:dup,:add", ["cpu"]),
    (
        "name,cpu,:eq,:dup,id,user,:eq,:and,:sum,:swap,id,user,:eq,:not,"
        ":and,:sum",
        ["user", "!user"],
    ),
    ("name,cpu,:eq,:sum,name,disk,:eq,:sum,:and", [NOT_SET]),
    ("name,cpu,:eq,:sum,name,disk,:eq,:sum", ["cpu", "disk"]),
    (
        "name,cpu,:eq,:sum,"
        "name,cpu,:eq,id,user,:eq,:and,:sum,"
        "name,cpu,:eq,id,system,:eq,:and,:sum,"
        "name,cpu,:eq,id,idle,:eq,:and,:sum",
        ["cpu", "user", "system", "idle"],
    ),
    ("name,cpu,:eq,:sum,:dup,4,:add", ["cpu", "cpu"]),
]


@pytest.mark.parametrize("q,want", CASES, ids=[c[0][:60] for c in CASES])
def test_simple_legend_reference_case(q, want):
    assert legends(q) == want


def test_simple_legend_custom_average_words():
    """The reference's :node-avg cases (SimpleLegendsSuite.scala:109-124)
    through our custom-vocabulary averages: the NamedRewrite is stripped
    to its display query so the legend comes out clean, and grouping
    wins over the name."""
    from atlas_spark.stacklang.custom import parse_custom

    config = {
        "words": [],
        "custom-averages": [
            {
                "name": "node-avg",
                "base-query": "name,num.nodes,:eq",
                "keys": ["app", "cluster", "zone"],
            }
        ],
    }

    def leg(q):
        exprs = parse_custom(q, config, step=60)
        gen = generate(exprs)
        return [
            se.settings_dict().get("legend", NOT_SET)
            if isinstance(se, E.StyleExpr)
            else NOT_SET
            for se in gen
        ]

    assert leg("name,cpu,:eq,:node-avg") == ["cpu"]
    assert leg("name,cpu,:eq,:node-avg,(,app,),:by") == ["$(app)"]
    assert leg("name,cpu,:eq,:node-avg,(,foo:bar,),:by") == ["$(foo:bar)"]


def test_graph_json_uses_simple_legends(spark, sf_dir):
    """End-to-end: the graph legend for two restricted expressions shows
    the distinguishing tag values, not the full expression strings."""
    eng = Engine(spark, sf_dir)
    out = eng.render(
        "/api/v1/graph?q=name,click,:eq,:sum,name,view,:eq,:sum"
        "&s=2024-01-02&e=2024-01-03"
    )
    assert out["legend"] == ["click", "view"]


def test_inline_offset_gets_annotation():
    """A single-duration `dur,:offset` (not just the legacy list form)
    marks the expression shifted, so its legend carries the
    (offset=$(atlas.offset)) annotation (withLegend checks
    StyleExpr.offset > 0)."""
    assert legends("name,cpu,:eq,:sum,name,cpu,:eq,:sum,1w,:offset") == [
        "cpu",
        "cpu (offset=$(atlas.offset))",
    ]


def test_ends_pattern_presents_raw():
    """End-anchored patterns are neither prefix nor contains matchers:
    the raw pattern is shown, not a stripped literal."""
    assert legends("name,cpu,:ends,:sum") == [".*cpu$"]


def test_graph_inline_offset_label(spark, sf_dir):
    """End-to-end: the inline-offset line carries the atlas.offset tag
    and its legend substitutes the actual duration."""
    eng = Engine(spark, sf_dir)
    g = eng.graph(
        "/api/v1/graph?q=name,click,:eq,:sum,name,click,:eq,:sum,1d,:offset"
        "&s=2024-01-02&e=2024-01-03"
    )
    labels = [ln.label for ln in g.lines]
    assert labels == ["click", "click (offset=1d)"]
    assert g.lines[1].tags.get("atlas.offset") == "1d"
