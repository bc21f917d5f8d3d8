"""Expression splitter parity (ExpressionSplitterSuite)."""

from __future__ import annotations

import pytest

from atlas_spark.model import query as Q
from atlas_spark.streaming.splitter import KEEP_KEYS, Subscription, compress, split

QUERY1 = (
    "nf.cluster,skan-test,:eq,name,memUsed,:eq,:and,:avg,(,nf.node,),:by,"
    "4500000000,:gt,30,:rolling-count,15,:ge"
)


def test_splits_single_expression():
    subs = split(QUERY1, frequency=60000)
    exprs = sorted(s.expr for s in subs)
    assert len(subs) == 2  # :avg -> sum + count data exprs
    assert any(",:count," in e or e.endswith(":count,(,nf.node,),:by") for e in exprs)
    assert any(",:sum," in e or e.endswith(":sum,(,nf.node,),:by") for e in exprs)
    for s in subs:
        assert s.match_query == Q.EqualQuery("nf.cluster", "skan-test")
        assert s.frequency == 60000 and s.id


def test_compound_expression_dedupes():
    subs = split(f"{QUERY1},{QUERY1}", frequency=60000)
    assert len(subs) == 2  # identical data exprs collapse


def test_offset_rejected():
    with pytest.raises(ValueError, match=":offset not supported"):
        split("name,foo,:eq,:sum,1w,:offset")


def test_events_split():
    subs = split(
        "nf.app,www,:eq,msg,info,:starts,:and,(,timestamp,msg,),:table",
        expr_type="EVENTS",
    )
    assert len(subs) == 1
    assert subs[0].match_query == Q.EqualQuery("nf.app", "www")


def test_compress_keeps_infrastructure_keys():
    for k in ("nf.app", "nf.stack", "nf.cluster"):
        q = Q.EqualQuery(k, "skan")
        assert compress(q) == q


def test_compress_asg_to_cluster():
    assert compress(Q.EqualQuery("nf.asg", "skan-v001")) == Q.EqualQuery("nf.cluster", "skan")
    assert compress(Q.EqualQuery("nf.asg", "skan-test-v042")) == Q.EqualQuery(
        "nf.cluster", "skan-test"
    )
    # bad asg -> not mappable -> dropped like any non-keep key
    assert compress(Q.EqualQuery("nf.asg", "--v001")) == Q.TRUE


def test_compress_drops_other_keys():
    assert compress(Q.EqualQuery("xxx", "skan")) == Q.TRUE
    assert compress(Q.AndQuery(Q.EqualQuery("nf.app", "b"), Q.TRUE)) == Q.EqualQuery("nf.app", "b")
    assert compress(Q.AndQuery(Q.EqualQuery("nf.app", "b"), Q.FALSE)) == Q.FALSE


def test_compress_not_of_removed_stays_true():
    # removing a clause under :not must WIDEN the scope, never exclude
    q = Q.NotQuery(Q.EqualQuery("xxx", "skan"))
    assert compress(q) == Q.TRUE
    q2 = Q.AndQuery(Q.EqualQuery("nf.app", "b"), Q.NotQuery(Q.EqualQuery("id", "x")))
    assert compress(q2) == Q.EqualQuery("nf.app", "b")


def test_keep_keys_constant():
    assert KEEP_KEYS == {"nf.app", "nf.cluster", "nf.shard1", "nf.shard2", "nf.stack"}
    assert Subscription.make(Q.TRUE, "a,:sum", "TIME_SERIES", 60000).id
