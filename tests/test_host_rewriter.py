"""HostRewriter parity (HostRewriter.scala:40-67, HostRewriterSuite.scala)
plus the graph-request wiring (Grapher.scala rewriteBasedOnHost)."""

from __future__ import annotations

import pytest

from atlas_spark.api import Engine
from atlas_spark.stacklang.vocab import parse as parse_asl
from atlas_spark.util.host_rewriter import HostRewriter


def _parse(s: str):
    return parse_asl(s, step=3600)


def _displays(exprs):
    return [e.display() for e in exprs]


def test_default_config_changes_nothing():
    """HostRewriterSuite 'default shouldn't change the expr': the shipped
    default pattern `$^` matches no host (reference.conf:179-183)."""
    rw = HostRewriter()
    exprs = _parse("name,sps,:eq,:sum")
    assert rw.rewrite("foo.example.com", exprs) == exprs


def test_restrict_by_region_extracted_from_host():
    """HostRewriterSuite 'restrict by region extracted from host'."""
    rw = HostRewriter({"pattern": r"^foo\.([^.]+)\.example.com$", "key": "region"})
    exprs = _parse("name,sps,:eq,:sum")
    expected = _parse("name,sps,:eq,region,us-east-1,:eq,:and,:sum")
    got = rw.rewrite("foo.us-east-1.example.com", exprs)
    assert _displays(got) == _displays(expected)


def test_first_group_wins_with_multiple_groups():
    """HostRewriterSuite 'use first group if multiple in pattern'."""
    rw = HostRewriter(
        {"pattern": r"^foo\.([^.]+)\.(example|example2).com$", "key": "region"}
    )
    exprs = _parse("name,sps,:eq,:sum")
    expected = _parse("name,sps,:eq,region,us-east-1,:eq,:and,:sum")
    got = rw.rewrite("foo.us-east-1.example.com", exprs)
    assert _displays(got) == _displays(expected)


def test_matching_pattern_without_group_errors():
    """HostRewriterSuite 'no group in pattern': a matching pattern without a
    capture group is a configuration error surfaced loudly (reference:
    IndexOutOfBoundsException; here IndexError)."""
    rw = HostRewriter({"pattern": r"^foo\.example\.com$", "key": "region"})
    exprs = _parse("name,sps,:eq,:sum")
    with pytest.raises(IndexError):
        rw.rewrite("foo.example.com", exprs)


def test_non_matching_host_unchanged():
    rw = HostRewriter({"pattern": r"^foo\.([^.]+)\.example\.com$", "key": "region"})
    exprs = _parse("name,sps,:eq,:sum")
    assert rw.rewrite("bar.example.com", exprs) == exprs


def test_restriction_wraps_topmost_query_once():
    """Expr.rewrite is top-down with early exit: a COMPOSED query gets ONE
    AND wrapper at the top, not one per leaf (Expr.scala:40-58)."""
    rw = HostRewriter({"pattern": r"^v\.([^.]+)\.x$", "key": "region"})
    exprs = _parse("name,a,:eq,name,b,:eq,:or,:sum")
    got = rw.rewrite("v.west.x", exprs)
    expected = _parse("name,a,:eq,name,b,:eq,:or,region,west,:eq,:and,:sum")
    assert _displays(got) == _displays(expected)


def test_graph_request_restricted_by_host(spark, sf_dir):
    """End-to-end graph wiring: an absolute graph URI whose host matches
    the engine's host-rewrite config returns the same data as the
    explicitly restricted query; a relative URI is unrestricted."""
    eng = Engine(
        spark,
        sf_dir,
        host_rewrite={"pattern": r"^view\.([^.]+)\.example\.com$", "key": "bucket"},
    )
    tail = "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03"
    restricted = eng.graph("http://view.u1.example.com" + tail)
    explicit = eng.graph(
        "/api/v1/graph?q=name,click,:eq,bucket,u1,:eq,:and,:sum"
        "&s=2024-01-02&e=2024-01-03"
    )
    unrestricted = eng.graph(tail)
    assert restricted.lines[0].data == explicit.lines[0].data
    assert restricted.lines[0].data != unrestricted.lines[0].data


def test_graph_request_host_no_match_unchanged(spark, sf_dir):
    eng = Engine(
        spark,
        sf_dir,
        host_rewrite={"pattern": r"^view\.([^.]+)\.example\.com$", "key": "bucket"},
    )
    tail = "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03"
    assert (
        eng.graph("http://other.example.com" + tail).lines[0].data
        == eng.graph(tail).lines[0].data
    )


def test_id_param_sanitizer_suite_parity():
    """IdParamSanitizerSuite.scala cases verbatim."""
    import uuid

    from atlas_spark.util.id_sanitizer import sanitize

    assert sanitize("foo") == "foo"
    assert sanitize("Foo") == "foo"
    assert sanitize("Foo2") == "foo2"
    assert sanitize("FooBarBaz") == "foobarbaz"
    assert sanitize("Foo_Bar-Baz") == "foo_bar-baz"
    assert sanitize("Foo.Bar.Baz") == "foo.bar.baz"
    assert sanitize(str(uuid.uuid4())) == "default"
    assert sanitize("i-%08x" % 1234567890) == "default"
    assert sanitize("1.2.3.4") == "default"
    assert sanitize("2001:0db8:85a3:0000:0000:8a2e:0370:7334") == "default"
    assert sanitize("::1") == "default"
    assert sanitize("foo-12345") == "default"
