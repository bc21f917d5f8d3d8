"""lwcapi subscription lifecycle (`streaming/subscriptions.py`): split,
dedup, drive multiple expressions over one shared stream, tagged payloads
equal to batch evaluation."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest

from atlas_spark.streaming.subscriptions import SubscriptionManager

STEP = 60
BASE = 1704067200


@pytest.fixture()
def stream_dir():
    d = tempfile.mkdtemp(prefix="atlas_subs_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_subscription_lifecycle(spark, stream_dir):
    import pyspark.sql.functions as F

    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext
    from atlas_spark.sources.datapoints import DatapointSource
    from atlas_spark.stacklang.vocab import parse as parse_asl

    mgr = SubscriptionManager(spark, STEP, {"name": "k_name"})
    e1 = mgr.subscribe("name,click,:eq,:sum,3,:rolling-sum")
    e2 = mgr.subscribe(":true,:sum,(,name,),:by")
    # re-subscribing the identical program dedups to the same entry
    assert mgr.subscribe("name,click,:eq,:sum,3,:rolling-sum") is e1
    assert len({e1.sub_id, e2.sub_id}) == 2
    # data-expression subscriptions dedup across expressions by id
    subs = mgr.subscriptions
    assert len(subs) == len({s.id for s in subs}) == 2

    rows = []
    for h in range(6):
        for name, v in (("click", float(h + 1)), ("view", 10.0 * (h + 1))):
            rows.append(
                {
                    "k_name": name,
                    "ts": pd.Timestamp(BASE + h * STEP + 5, unit="s"),
                    "value": v,
                }
            )
    pdf = pd.DataFrame(rows)
    schema = "k_name string, ts timestamp, value double"
    spark.createDataFrame(pdf.iloc[:6], schema).coalesce(1).write.mode(
        "append"
    ).parquet(stream_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    mgr.start(stream)
    try:
        mgr.process_all_available()
        spark.createDataFrame(pdf.iloc[6:], schema).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        mgr.process_all_available()
    finally:
        mgr.stop()

    payloads = mgr.payloads()
    assert payloads and all("id" in p for p in payloads)
    by_id = {e1.sub_id: [], e2.sub_id: []}
    for p in payloads:
        by_id[p["id"]].append(p)
    assert by_id[e1.sub_id] and by_id[e2.sub_id]

    # batch truth for each expression over the same rows
    dp = spark.createDataFrame(pdf, schema).select(
        "k_name",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % STEP)
        .cast("long")
        .alias("t"),
        "value",
    )
    src = DatapointSource(df=dp, step=STEP, colmap={"name": "k_name"}, sql_cte="")
    ctx = EvalContext(BASE, BASE + 6 * STEP, STEP)
    for entry in (e1, e2):
        rf = Evaluator(src, ctx).eval(parse_asl(entry.expression, step=STEP)[0])
        kc = rf.key_cols
        truth = {}
        for r in rf.df.collect():
            key = tuple(r[c] for c in kc) + (r["t"],)
            truth[key] = r["value"]
        for p in by_id[entry.sub_id]:
            key = tuple(p[k] for k in (rf.keys or ())) + (p["t"],)
            assert key in truth, (entry.expression, key)
            tv, v = truth[key], p["value"]
            if v is None or tv is None:
                assert v == tv
            else:
                assert abs(v - tv) < 1e-9, (entry.expression, key, v, tv)

    # unsubscribe removes the entry and its data subscriptions — from the
    # SHARED wire-plane registry too
    assert mgr.unsubscribe(e2.sub_id)
    assert len(mgr.subscriptions) == 1
    from atlas_spark.streaming.subscriptions import DATA_PLANE_STREAM

    wire_ids = {
        s.metadata.id for s in mgr.wire.subscriptions_for_stream(DATA_PLANE_STREAM)
    }
    assert wire_ids == {e1.sub_id}


def test_data_plane_shares_wire_registry_and_ttl(spark):
    """One registry for both planes (r10 verdict #6): the data plane's
    subscriptions live in the wire-plane StreamSubscriptionManager, and
    its TTL expiry drops the data plane's evaluator entry too — with no
    read traffic, just registry touches."""
    import time as _time

    from atlas_spark.streaming.subscriptions import DATA_PLANE_STREAM

    mgr = SubscriptionManager(spark, STEP, {"name": "k_name"}, sub_ttl=0.1)
    e1 = mgr.subscribe("name,click,:eq,:sum")
    assert {
        s.metadata.id for s in mgr.wire.subscriptions_for_stream(DATA_PLANE_STREAM)
    } == {e1.sub_id}
    _time.sleep(0.15)
    # a registry touch (new subscribe) triggers expiry of the stale sub
    e2 = mgr.subscribe(":true,:max")
    ids = {s.metadata.id for s in mgr.wire.subscriptions_for_stream(DATA_PLANE_STREAM)}
    assert ids == {e2.sub_id}
    assert {s.id for s in mgr.subscriptions} == {s.id for s in e2.data_subs}
    # re-subscribing the expired expression creates a FRESH entry
    e1b = mgr.subscribe("name,click,:eq,:sum")
    assert e1b.sub_id == e1.sub_id and e1b is not e1


def test_unsubscribe_and_expiry_stop_running_queries(spark, stream_dir):
    """A dropped subscription must not keep computing (ADVICE r11): on
    unsubscribe or TTL expiry the entry's started streaming query stops,
    surviving queries keep running, and a later start() wires only
    not-yet-started entries."""
    from atlas_spark.streaming.subscriptions import DATA_PLANE_STREAM

    mgr = SubscriptionManager(spark, STEP, {"name": "k_name"}, sub_ttl=60)
    e1 = mgr.subscribe("name,click,:eq,:sum")
    e2 = mgr.subscribe(":true,:max")

    schema = "k_name string, ts timestamp, value double"
    pdf = pd.DataFrame(
        [{"k_name": "click", "ts": pd.Timestamp(BASE + 5, unit="s"), "value": 1.0}]
    )
    spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").parquet(
        stream_dir
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    mgr.start(stream)
    try:
        assert e1.query is not None and e1.query.isActive
        assert e2.query is not None and e2.query.isActive
        q2 = e2.query
        assert mgr.unsubscribe(e2.sub_id)
        assert not q2.isActive and e2.query is None
        assert e1.query.isActive

        # TTL expiry (triggered by a registry touch) stops the stale
        # query; backdate the touch timestamp instead of sleeping so the
        # test is deterministic under load
        q1 = e1.query
        mgr.wire._sub_touched[(DATA_PLANE_STREAM, e1.sub_id)] -= 61
        e3 = mgr.subscribe(":true,:sum")
        assert not q1.isActive
        # start() wires only the new entry; e3 was not started yet
        assert e3.query is None
        mgr.start(stream)
        assert e3.query is not None and e3.query.isActive
    finally:
        mgr.stop()
    assert all(e.query is None for e in mgr._entries.values())
