"""lwcapi wire surface: registry/routing unit tests (streaming/lwc_wire.py)
and live-server protocol tests (http_api.py lwc routes) mirroring the
reference flow: register a stream, subscribe an expression, receive the
split data-expression subscriptions, POST evaluated data to /evaluate,
receive the datapoints on the stream (SubscribeApi/EvaluateApi/
ExpressionApi/StreamsApi.scala)."""

from __future__ import annotations

import hashlib
import json
import queue
import threading
import urllib.request
from urllib.error import HTTPError

import pytest

from atlas_spark.api import Engine
from atlas_spark import http_api
from atlas_spark.streaming import lwc_wire


# ------------------------------------------------------------------- unit


def test_compute_id_is_reference_formula():
    # ExpressionMetadata.computeId: sha1 of "freq~type~expr", 40 hex chars
    expr = "name,cpu,:eq,:sum"
    want = hashlib.sha1(f"60000~TIME_SERIES~{expr}".encode()).hexdigest()
    got = lwc_wire.compute_id(expr, "TIME_SERIES", 60000)
    assert got == want
    assert len(got) == 40


def test_parse_server_group():
    assert lwc_wire.parse_server_group("www-main-x1-y2-v012") == {
        "nf.cluster": "www-main-x1-y2",
        "nf.app": "www",
        "nf.stack": "main",
        "nf.shard1": "x1",
        "nf.shard2": "y2",
    }
    assert lwc_wire.parse_server_group("www") == {
        "nf.cluster": "www",
        "nf.app": "www",
    }
    assert lwc_wire.parse_server_group("") == {}


def test_queue_handler_bounded_drop_new():
    meta = lwc_wire.StreamMetadata("s1")
    h = lwc_wire.QueueHandler(meta, maxsize=2)
    assert h.offer([1, 2, 3]) == 2
    assert meta.received_messages == 2
    assert meta.dropped_messages == 1
    assert h.poll(timeout=0.01) == [1, 2]
    h.complete()
    assert h.offer([4]) == 0
    assert h.poll(timeout=0.01) == []


def _sm_with_stream(stream_id="s1"):
    sm = lwc_wire.StreamSubscriptionManager(step=60)
    meta = lwc_wire.StreamMetadata(stream_id)
    handler = lwc_wire.QueueHandler(meta)
    sm.register(meta, handler)
    return sm, handler


def test_register_drops_same_id_connection():
    sm, h1 = _sm_with_stream()
    meta2 = lwc_wire.StreamMetadata("s1")
    h2 = lwc_wire.QueueHandler(meta2)
    old = sm.register(meta2, h2)
    assert old is h1
    assert h1.done
    msgs = h1.poll(timeout=0.01)
    assert msgs and "another connection is using id: s1" in msgs[0]["message"]
    assert sm.handler_for_stream("s1") is h2


def test_subscribe_diff_and_routing():
    sm, h = _sm_with_stream()
    msgs = lwc_wire.subscribe_expressions(
        sm, "s1", [{"expression": "name,cpu,:eq,:sum"}], 60000
    )
    assert len(msgs) == 1
    assert msgs[0]["type"] == "subscription-v2"
    sub_id = msgs[0]["subExprs"][0]["id"]
    assert sm.handlers_for_subscription(sub_id) == [h]
    # re-subscribing the same expression adds nothing
    assert lwc_wire.subscribe_expressions(
        sm, "s1", [{"expression": "name,cpu,:eq,:sum"}], 60000
    ) == []
    # replacing the set unsubscribes the stale data expr
    msgs2 = lwc_wire.subscribe_expressions(
        sm, "s1", [{"expression": "name,disk,:eq,:max"}], 60000
    )
    assert len(msgs2) == 1
    assert sm.handlers_for_subscription(sub_id) == []
    assert [s.metadata.id for s in sm.subscriptions()] == [
        msgs2[0]["subExprs"][0]["id"]
    ]


def test_subscribe_bad_expression_yields_error_diagnostic():
    sm, _ = _sm_with_stream()
    msgs = lwc_wire.subscribe_expressions(
        sm, "s1", [{"expression": "name,cpu,:bogus"}], 60000
    )
    assert len(msgs) == 1
    assert msgs[0]["type"] == "error"
    assert "name,cpu,:bogus" in msgs[0]["message"]


def test_subscriptions_for_cluster_scoping():
    sm, _ = _sm_with_stream()
    lwc_wire.subscribe_expressions(
        sm,
        "s1",
        [
            {"expression": "name,cpu,:eq,nf.app,www,:eq,:and,:sum"},
            {"expression": "name,disk,:eq,:sum"},  # unscoped: matches all
        ],
        60000,
    )
    all_subs = sm.subscriptions()
    assert len(all_subs) == 2
    www = {s.metadata.expression for s in sm.subscriptions_for_cluster("www-main-v001")}
    db = {s.metadata.expression for s in sm.subscriptions_for_cluster("db-main-v001")}
    assert any("nf.app" in e for e in www)
    assert all("nf.app" not in e for e in db)
    assert any("disk" in e for e in db)  # unscoped sub matches every cluster


def test_evaluate_routes_and_counts_ignored():
    sm, h = _sm_with_stream()
    msgs = lwc_wire.subscribe_expressions(
        sm, "s1", [{"expression": "name,cpu,:eq,:sum"}], 60000
    )
    sub_id = msgs[0]["subExprs"][0]["id"]
    ignored = lwc_wire.evaluate(
        sm,
        {
            "timestamp": 120000,
            "metrics": [
                {"id": sub_id, "tags": {"name": "cpu"}, "value": 4.5},
                {"id": "f" * 40, "tags": {"name": "x"}, "value": 1.0},
            ],
        },
    )
    assert ignored == 1
    assert sm.ignored_items == 1
    got = h.poll(timeout=0.01)
    assert got == [
        {
            "type": "datapoint",
            "timestamp": 120000,
            "id": sub_id,
            "tags": {"name": "cpu"},
            "value": 4.5,
        }
    ]


def test_unregister_cleans_routing():
    sm, _ = _sm_with_stream()
    msgs = lwc_wire.subscribe_expressions(
        sm, "s1", [{"expression": "name,cpu,:eq,:sum"}], 60000
    )
    sub_id = msgs[0]["subExprs"][0]["id"]
    sm.unregister("s1")
    assert sm.handlers_for_subscription(sub_id) == []
    assert sm.subscriptions() == []
    assert sm.stream_summaries() == []


def test_heartbeat_is_step_aligned_and_delayed():
    hb = lwc_wire.heartbeat(60000, now_ms=7_260_123)
    assert hb == {"type": "heartbeat", "timestamp": 7_200_000, "step": 60000}
    assert hb["timestamp"] % hb["step"] == 0


def test_data_and_wire_plane_ids_interoperate():
    # splitter.Subscription and lwc_wire.ExpressionMetadata must derive
    # the SAME id for the same data expression (the reference computeId
    # formula), so publisher-fed and server-evaluated planes can route
    # each other's payloads.
    from atlas_spark.streaming.splitter import Subscription

    expr = "name,cpu,:eq,:sum"
    data_id = Subscription.make(None, expr, "TIME_SERIES", 60000).id
    wire_id = lwc_wire.ExpressionMetadata.make(expr, "TIME_SERIES", 60000).id
    assert data_id == wire_id == lwc_wire.compute_id(expr, "TIME_SERIES", 60000)


def test_subscription_ttl_expires_unrefreshed():
    """exprs-ttl parity (ExpressionApi.scala:61,132-180): a subscription
    not refreshed within the TTL disappears from the expression list; a
    refreshed one survives."""
    import time as _time

    sm = lwc_wire.StreamSubscriptionManager(step=60, sub_ttl=0.2)
    meta = lwc_wire.StreamMetadata("s1")
    sm.register(meta, lwc_wire.QueueHandler(meta))
    msgs = lwc_wire.subscribe_expressions(
        sm,
        "s1",
        [
            {"expression": "name,cpu,:eq,:sum"},
            {"expression": "name,disk,:eq,:max"},
        ],
        60000,
    )
    ids = sorted(m["subExprs"][0]["id"] for m in msgs)
    assert len(ids) == 2
    keep = next(
        s for s in sm.subscriptions() if "cpu" in s.metadata.expression
    )
    _time.sleep(0.15)
    sm.subscribe("s1", [keep])  # refresh only the cpu subscription
    _time.sleep(0.15)  # disk now past TTL, cpu refreshed 0.15s ago
    live = [s.metadata.id for s in sm.subscriptions()]
    assert live == [keep.metadata.id]
    assert sm.handlers_for_subscription(keep.metadata.id)
    gone = next(i for i in ids if i != keep.metadata.id)
    assert sm.handlers_for_subscription(gone) == []
    summary = sm.stream_summary("s1")
    assert [s["id"] for s in summary["subscriptions"]] == [keep.metadata.id]


def test_ttl_expiry_fires_on_evaluate_path_without_reads():
    """TTL expiry must not depend on read traffic: with NO calls to the
    read endpoints, data offered via evaluate() after the TTL elapses is
    ignored (the routing path itself expires stale subscriptions)."""
    import time as _time

    sm = lwc_wire.StreamSubscriptionManager(step=60, sub_ttl=0.1)
    meta = lwc_wire.StreamMetadata("s1")
    handler = lwc_wire.QueueHandler(meta)
    sm.register(meta, handler)
    msgs = lwc_wire.subscribe_expressions(
        sm, "s1", [{"expression": "name,cpu,:eq,:sum"}], 60000
    )
    sub_id = msgs[0]["subExprs"][0]["id"]
    payload = {
        "timestamp": 60_000,
        "metrics": [{"id": sub_id, "tags": {"name": "cpu"}, "value": 1.0}],
    }
    assert lwc_wire.evaluate(sm, payload) == 0
    assert handler.poll(timeout=0.1)
    _time.sleep(0.15)  # past TTL; no read-endpoint calls in between
    assert lwc_wire.evaluate(sm, payload) == 1
    assert handler.poll(timeout=0.05) == []
    assert sm.ignored_items == 1


def test_attach_counters_surface_in_summary():
    sm, _ = _sm_with_stream()
    sm.attach_counters(
        "s1", lambda: {"received": 6, "dropped_future": 1, "dropped_old": 0}
    )
    summary = sm.stream_summary("s1")
    assert summary["ingest"] == {
        "received": 6,
        "dropped_future": 1,
        "dropped_old": 0,
    }
    # unknown stream: attach is a no-op, summary untouched elsewhere
    sm.attach_counters("ghost", lambda: {"received": 1})
    assert sm.stream_summary("ghost") is None
    sm.unregister("s1")
    assert sm.stream_summary("s1") is None


# ------------------------------------------------------------ live server


@pytest.fixture(scope="module")
def served(spark, sf_dir):
    engine = Engine(spark, sf_dir)
    srv, thread = http_api.start(engine, port=0)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, srv
    srv.shutdown()


def _get(url: str, headers: dict | None = None):
    req = urllib.request.Request(url, headers=headers or {})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _post(url: str, obj) -> tuple[int, bytes]:
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except HTTPError as e:
        return e.code, e.read()


class SseClient:
    """Background reader for an SSE subscription stream."""

    def __init__(self, url: str):
        self.messages: queue.Queue = queue.Queue()
        self._resp = urllib.request.urlopen(url)
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        try:
            for line in self._resp:
                if line.startswith(b"data: "):
                    self.messages.put(json.loads(line[6:]))
        except Exception:
            pass

    def next(self, timeout: float = 10.0, want_type: str | None = None):
        import time

        deadline = time.monotonic() + timeout
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                raise AssertionError(f"no {want_type or 'message'} within {timeout}s")
            msg = self.messages.get(timeout=remaining)
            if want_type is None or msg.get("type") == want_type:
                return msg

    def close(self):
        self._resp.close()


def test_lwc_end_to_end_flow(served):
    """register stream -> subscribe expression -> data-expr splits on both
    the POST response and the stream -> evaluate -> datapoint delivered."""
    base, srv = served
    sse = SseClient(f"{base}/api/v2/subscribe/e2e?heartbeat=0.2")
    try:
        setup = sse.next(want_type="info")
        assert "setup stream e2e" in setup["message"]

        status, body = _post(
            f"{base}/api/v2/subscribe/e2e",
            {"expressions": [{"expression": "name,cpu,:eq,(,nf.app,),:by"}]},
        )
        assert status == 200
        msgs = json.loads(body)
        assert [m["type"] for m in msgs] == ["subscription-v2"]
        sub = msgs[0]["subExprs"][0]
        assert sub["step"] == srv.engine.source.step * 1000

        # same subscription message arrives on the push channel
        pushed = sse.next(want_type="subscription-v2")
        assert pushed["subExprs"][0]["id"] == sub["id"]

        # the expression list now serves the data expr to publishers
        status, headers, body = _get(f"{base}/lwc/api/v1/expressions")
        assert status == 200
        listed = json.loads(body)["expressions"]
        assert [e["id"] for e in listed] == [sub["id"]]
        etag = headers["ETag"]
        status, _, _ = _get(
            f"{base}/lwc/api/v1/expressions", {"If-None-Match": etag}
        )
        assert status == 304

        # a publisher posts evaluated data for the subscription id
        status, _ = _post(
            f"{base}/lwc/api/v1/evaluate",
            {
                "timestamp": 120000,
                "metrics": [
                    {"id": sub["id"], "tags": {"name": "cpu", "nf.app": "www"}, "value": 2.0}
                ],
            },
        )
        assert status == 200
        dp = sse.next(want_type="datapoint")
        assert dp == {
            "type": "datapoint",
            "timestamp": 120000,
            "id": sub["id"],
            "tags": {"name": "cpu", "nf.app": "www"},
            "value": 2.0,
        }

        # heartbeats flow when idle, step-aligned at the sub's frequency
        hb = sse.next(want_type="heartbeat")
        assert hb["step"] == sub["step"]
        assert hb["timestamp"] % hb["step"] == 0

        # stream metadata surfaces on the streams API
        status, _, body = _get(f"{base}/api/v1/streams")
        assert status == 200
        assert [s["streamId"] for s in json.loads(body)] == ["e2e"]
        status, _, body = _get(f"{base}/api/v1/streams/e2e")
        assert status == 200
        summary = json.loads(body)
        assert summary["metadata"]["streamId"] == "e2e"
        assert [s["id"] for s in summary["subscriptions"]] == [sub["id"]]
    finally:
        sse.close()


def test_lwc_expressions_cluster_scope(served):
    base, _ = served
    sse = SseClient(f"{base}/api/v2/subscribe/scoped?heartbeat=0.2")
    try:
        sse.next(want_type="info")
        status, body = _post(
            f"{base}/api/v2/subscribe/scoped",
            {"expressions": [
                {"expression": "name,cpu,:eq,nf.app,www,:eq,:and,:sum"},
            ]},
        )
        assert status == 200
        sub_id = json.loads(body)[0]["subExprs"][0]["id"]
        status, _, body = _get(f"{base}/lwc/api/v1/expressions/www-main-v001")
        assert status == 200
        assert sub_id in [e["id"] for e in json.loads(body)["expressions"]]
        status, _, body = _get(f"{base}/lwc/api/v1/expressions/db-main-v001")
        assert status == 200
        assert sub_id not in [e["id"] for e in json.loads(body)["expressions"]]
    finally:
        sse.close()


def test_lwc_subscribe_unregistered_stream_400(served):
    base, _ = served
    status, body = _post(
        f"{base}/api/v2/subscribe/ghost",
        {"expressions": [{"expression": "name,cpu,:eq,:sum"}]},
    )
    assert status == 400
    assert "not registered" in json.loads(body)["message"]


def test_lwc_streams_unknown_404(served):
    base, _ = served
    status, _, body = _get(f"{base}/api/v1/streams/nope")
    assert status == 404
    assert json.loads(body)["message"] == "no stream with id: nope"


def test_lwc_evaluate_requires_timestamp(served):
    base, _ = served
    status, body = _post(f"{base}/lwc/api/v1/evaluate", {"metrics": []})
    assert status == 400
    assert "timestamp" in json.loads(body)["message"]


def test_lwc_streams_summary_ingest_counters(served):
    """A server-evaluated stream's ingest counters (the TimeGrouped
    droppedOld/droppedFuture row) surface on /api/v1/streams/{id}."""
    base, srv = served
    sse = SseClient(f"{base}/api/v2/subscribe/ctrs?heartbeat=0.2")
    try:
        sse.next(want_type="info")
        srv.lwc.attach_counters(
            "ctrs",
            lambda: {"received": 6, "dropped_future": 1, "dropped_old": 2},
        )
        status, _, body = _get(f"{base}/api/v1/streams/ctrs")
        assert status == 200
        summary = json.loads(body)
        assert summary["ingest"] == {
            "received": 6,
            "dropped_future": 1,
            "dropped_old": 2,
        }
    finally:
        sse.close()


def test_lwc_subscribe_heartbeat_clamped(served):
    """heartbeat=0 must not busy-spin: the poll timeout is clamped, so
    an idle ~0.5 s window carries a bounded number of heartbeat frames
    (unclamped it would flood hundreds)."""
    import time as _time

    base, _ = served
    sse = SseClient(f"{base}/api/v2/subscribe/hb0?heartbeat=0")
    try:
        sse.next(want_type="info")
        _time.sleep(0.5)
        n = 0
        while not sse.messages.empty():
            if sse.messages.get_nowait().get("type") == "heartbeat":
                n += 1
        assert 1 <= n <= 10  # clamped to >=0.1s -> at most ~5-6 frames
    finally:
        sse.close()
