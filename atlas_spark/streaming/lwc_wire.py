"""lwcapi wire layer: stream registry, subscription routing, message shapes.

The reference's lwcapi service is the rendezvous between *publishers*
(clients that fetch the expression list, evaluate data expressions
locally, and POST results to /evaluate) and *consumers* (streams that
subscribe to full expressions and receive evaluated payloads).  This
module is the driver-side registry + routing for that wire protocol;
the HTTP endpoints live in `atlas_spark.http_api`:

- StreamSubscriptionManager: stream registry, subscription diffing,
  handler routing (SubscriptionManager.scala:140-300,
  StreamSubscriptionManager.scala)
- subscription ids: sha1 of "frequency~exprType~expression"
  (ExpressionMetadata.scala:51-53 computeId)
- subscribe semantics incl. unsubscribing expressions dropped from the
  request (SubscribeApi.scala:191-231)
- evaluate routing: datapoints grouped by id, offered to every handler
  subscribed to that id, counted as ignored otherwise
  (EvaluateApi.scala:45-83)
- message shapes: LwcSubscriptionV2 {type: subscription-v2, expression,
  exprType, subExprs: [LwcDataExpr {id, expression, step}]},
  LwcDatapoint {type: datapoint, timestamp, id, tags, value},
  LwcHeartbeat {type: heartbeat, timestamp, step} (atlas-eval model)
- cluster scoping: frigga server-group names parsed into nf.* tags and
  matched against each subscription's compressed scope query
  (SubscriptionManager.scala:253-264; the name grammar is the public
  Frigga convention app-stack-detail[-v###], as used by
  spectator-ipc's ServerGroup)

This is the REQUEST plane — pure driver-side Python, matching the role
the reference gives its pekko actors.  The Spark streaming evaluator
(`streaming/subscriptions.SubscriptionManager`) remains the DATA plane
for server-side evaluation; this layer is the client-facing protocol.
"""

from __future__ import annotations

import re
import threading
import time
from collections import deque
from dataclasses import dataclass

from .splitter import compute_id, split  # single id formula for both planes


def parse_server_group(name: str) -> dict[str, str]:
    """Frigga server-group/cluster name -> nf.* routing tags.

    `app-stack-detail[-v###]`: strip the version sequence to get the
    cluster, then app = first dash segment, stack = second, shard1/shard2
    = first two detail segments (the public frigga convention implemented
    by spectator-ipc ServerGroup, consumed in
    SubscriptionManager.scala:253-259)."""
    m = re.match(r"^(.*)-v\d+$", name)
    cluster = m.group(1) if m else name
    tags: dict[str, str] = {}
    if not cluster:
        return tags
    parts = cluster.split("-")
    tags["nf.cluster"] = cluster
    tags["nf.app"] = parts[0]
    if len(parts) > 1 and parts[1]:
        tags["nf.stack"] = parts[1]
    if len(parts) > 2 and parts[2]:
        tags["nf.shard1"] = parts[2]
    if len(parts) > 3 and parts[3]:
        tags["nf.shard2"] = parts[3]
    return tags


@dataclass(frozen=True)
class ExpressionMetadata:
    """One data-expression subscription's wire metadata
    (ExpressionMetadata.scala:24-39)."""

    expression: str
    expr_type: str = "TIME_SERIES"
    frequency: int = 60_000
    id: str = ""

    @staticmethod
    def make(expression: str, expr_type: str, frequency: int) -> "ExpressionMetadata":
        return ExpressionMetadata(
            expression, expr_type, frequency, compute_id(expression, expr_type, frequency)
        )

    def to_json(self) -> dict:
        return {
            "expression": self.expression,
            "exprType": self.expr_type,
            "frequency": self.frequency,
            "id": self.id,
        }


@dataclass(frozen=True)
class WireSubscription:
    """metadata + the compressed scope query used for cluster routing
    (Subscription.scala)."""

    metadata: ExpressionMetadata
    match_query: object = None  # model.query.Query or None (match-all)


@dataclass
class StreamMetadata:
    """StreamMetadata.scala: identity + receive/drop counters."""

    stream_id: str
    address: str = "unknown"
    received_messages: int = 0
    dropped_messages: int = 0

    def to_json(self) -> dict:
        return {
            "streamId": self.stream_id,
            "remoteAddress": self.address,
            "receivedMessages": self.received_messages,
            "droppedMessages": self.dropped_messages,
        }


class QueueHandler:
    """Bounded per-stream message queue (QueueHandler.scala + the
    drop-new StreamOps queue semantics): offer() drops when full and
    counts the drop on the stream's metadata; poll() blocks up to a
    timeout; complete() wakes consumers and rejects further offers."""

    def __init__(self, meta: StreamMetadata, maxsize: int = 1000):
        self.meta = meta
        self._q: deque = deque()
        self._maxsize = maxsize
        self._cv = threading.Condition()
        self._done = False

    def offer(self, msgs: list) -> int:
        """Enqueue; returns how many were accepted."""
        accepted = 0
        with self._cv:
            if self._done:
                self.meta.dropped_messages += len(msgs)
                return 0
            for m in msgs:
                if len(self._q) >= self._maxsize:
                    self.meta.dropped_messages += 1
                    continue
                self._q.append(m)
                accepted += 1
            self.meta.received_messages += accepted
            if accepted:
                self._cv.notify_all()
        return accepted

    def poll(self, timeout: float = 1.0) -> list:
        """All queued messages, blocking up to `timeout` for the first."""
        deadline = time.monotonic() + timeout
        with self._cv:
            while not self._q and not self._done:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return []
                self._cv.wait(remaining)
            out = list(self._q)
            self._q.clear()
            return out

    def complete(self) -> None:
        with self._cv:
            self._done = True
            self._cv.notify_all()

    @property
    def done(self) -> bool:
        return self._done


class StreamSubscriptionManager:
    """Stream registry + subscription routing
    (StreamSubscriptionManager.scala over SubscriptionManager.scala).

    All state driver-side and lock-guarded: registrations
    {stream_id -> (meta, handler, {sub_id -> WireSubscription})} and the
    routing map {sub_id -> {stream_id -> handler}}."""

    def __init__(self, step: int = 60, sub_ttl: float | None = None):
        self.step = step
        self.sub_ttl = sub_ttl  # seconds; None = never expire (exprs-ttl)
        self._lock = threading.RLock()
        self._streams: dict[str, tuple[StreamMetadata, QueueHandler, dict]] = {}
        self._sub_handlers: dict[str, dict[str, QueueHandler]] = {}
        self._subs: dict[str, WireSubscription] = {}
        self._sub_touched: dict[tuple[str, str], float] = {}  # (stream,sub)->t
        self._counter_fns: dict[str, object] = {}  # stream -> ingest counters
        self.ignored_items = 0  # EvaluateApi ignoredCounter
        # expiry callback (stream_id, sub_id) — lets a layered plane (the
        # streaming data plane) release per-subscription resources when
        # TTL expiry drops a subscription.  Called with the lock held;
        # keep it cheap and non-reentrant.
        self.on_expire = None

    # ------------------------------------------------------------ streams

    def register(self, meta: StreamMetadata, handler: QueueHandler) -> QueueHandler | None:
        """Register a stream; an existing stream with the same id is
        dropped first (SubscribeApi.dropSameIdConnections) — its handler
        is completed after an info diagnostic and returned."""
        with self._lock:
            old = self.unregister(meta.stream_id)
            if old is not None:
                old.offer(
                    [diagnostic("info", f"dropped: another connection is using id: {meta.stream_id}")]
                )
                old.complete()
            self._streams[meta.stream_id] = (meta, handler, {})
            return old

    def unregister(self, stream_id: str) -> QueueHandler | None:
        with self._lock:
            entry = self._streams.pop(stream_id, None)
            self._counter_fns.pop(stream_id, None)
            if entry is None:
                return None
            _, handler, subs = entry
            for sub_id in subs:
                self._sub_touched.pop((stream_id, sub_id), None)
                routes = self._sub_handlers.get(sub_id)
                if routes:
                    routes.pop(stream_id, None)
                    if not routes:
                        del self._sub_handlers[sub_id]
                        self._subs.pop(sub_id, None)
            return handler

    def attach_counters(self, stream_id: str, fn) -> None:
        """Attach a server-side ingest-counter provider (e.g. a
        StreamingEvaluator.drop_counters) for a stream whose
        subscriptions the server evaluates itself; surfaced in
        stream_summary the way the reference exposes its counters via
        StreamsApi/StreamMetadata (StreamsApi.scala:30-50)."""
        with self._lock:
            if stream_id in self._streams:
                self._counter_fns[stream_id] = fn

    def _expire_stale(self) -> None:
        """Drop subscriptions not refreshed within sub_ttl, mirroring the
        reference's exprs-ttl expiry (ExpressionApi.scala:61,132-180;
        splitter interner ExpressionSplitter.scala:58).  Runs on EVERY
        registry touch — reads, subscribe, and the evaluate routing path
        — so expiry never depends on read traffic.  Caller holds the
        lock."""
        if self.sub_ttl is None:
            return
        cutoff = time.monotonic() - self.sub_ttl
        stale = [k for k, t in self._sub_touched.items() if t < cutoff]
        for stream_id, sub_id in stale:
            self._sub_touched.pop((stream_id, sub_id), None)
            entry = self._streams.get(stream_id)
            if entry is not None:
                entry[2].pop(sub_id, None)
            routes = self._sub_handlers.get(sub_id)
            if routes:
                routes.pop(stream_id, None)
                if not routes:
                    del self._sub_handlers[sub_id]
                    self._subs.pop(sub_id, None)
            if self.on_expire is not None:
                self.on_expire(stream_id, sub_id)

    def handler_for_stream(self, stream_id: str) -> QueueHandler | None:
        with self._lock:
            entry = self._streams.get(stream_id)
            return entry[1] if entry else None

    def stream_summaries(self) -> list[StreamMetadata]:
        with self._lock:
            self._expire_stale()
            return [meta for meta, _, _ in self._streams.values()]

    def stream_summary(self, stream_id: str) -> dict | None:
        with self._lock:
            self._expire_stale()
            entry = self._streams.get(stream_id)
            if entry is None:
                return None
            meta, _, subs = entry
            out = {
                "metadata": meta.to_json(),
                "subscriptions": sorted(
                    (s.metadata.to_json() for s in subs.values()),
                    key=lambda d: d["id"],
                ),
            }
            fn = self._counter_fns.get(stream_id)
        if fn is not None:
            # server-evaluated stream: surface the evaluator's ingest
            # counters (received/droppedOld/droppedFuture — the
            # TimeGrouped.scala:77-86 counter row) on the summary.
            # Called outside the lock: drop_counters() walks Spark
            # progress events and must not block the registry.  A failing
            # provider (e.g. torn-down session) degrades to an error
            # field — the summary itself must always serve.
            try:
                out["ingest"] = dict(fn())
            except Exception as e:  # noqa: BLE001
                out["ingest"] = {"error": f"{type(e).__name__}: {e}"}
        return out

    # ------------------------------------------------------ subscriptions

    def subscribe(
        self, stream_id: str, subs: list[WireSubscription]
    ) -> tuple[QueueHandler, list[WireSubscription]]:
        """Add subscriptions to a registered stream; returns (handler,
        newly-added subs) (SubscriptionManager.scala:190-205)."""
        with self._lock:
            self._expire_stale()
            entry = self._streams.get(stream_id)
            if entry is None:
                raise ValueError(f"stream not registered: {stream_id}")
            _, handler, current = entry
            added = []
            now = time.monotonic()
            for sub in subs:
                sid = sub.metadata.id
                self._sub_touched[(stream_id, sid)] = now  # refresh TTL
                if sid not in current:
                    current[sid] = sub
                    self._subs[sid] = sub
                    self._sub_handlers.setdefault(sid, {})[stream_id] = handler
                    added.append(sub)
            return handler, added

    def unsubscribe(self, stream_id: str, sub_ids: list[str]) -> None:
        with self._lock:
            entry = self._streams.get(stream_id)
            if entry is None:
                return
            _, _, current = entry
            for sid in sub_ids:
                self._sub_touched.pop((stream_id, sid), None)
                if current.pop(sid, None) is not None:
                    routes = self._sub_handlers.get(sid)
                    if routes:
                        routes.pop(stream_id, None)
                        if not routes:
                            del self._sub_handlers[sid]
                            self._subs.pop(sid, None)

    def subscriptions(self) -> list[WireSubscription]:
        with self._lock:
            self._expire_stale()
            return sorted(self._subs.values(), key=lambda s: s.metadata.id)

    def subscriptions_for_stream(self, stream_id: str) -> list[WireSubscription]:
        with self._lock:
            self._expire_stale()
            entry = self._streams.get(stream_id)
            return sorted(entry[2].values(), key=lambda s: s.metadata.id) if entry else []

    def subscriptions_for_cluster(self, cluster: str) -> list[WireSubscription]:
        """Subscriptions whose compressed scope query could match the
        cluster's routing tags (SubscriptionManager.scala:253-264; the
        reference's QueryIndex.forEachMatch is a couldMatch over the
        partial tag map)."""
        tags = parse_server_group(cluster)
        out = []
        for sub in self.subscriptions():
            q = sub.match_query
            if q is None or q.could_match(tags):
                out.append(sub)
        return out

    def handlers_for_subscription(self, sub_id: str) -> list[QueueHandler]:
        # the evaluate routing path: expire here too, so a stale
        # subscription stops receiving data even when no one polls the
        # read endpoints
        with self._lock:
            self._expire_stale()
            routes = self._sub_handlers.get(sub_id)
            return list(routes.values()) if routes else []


# --------------------------------------------------------------- messages


def diagnostic(level: str, message: str) -> dict:
    return {"type": level, "message": message}


def heartbeat(step_ms: int, now_ms: int | None = None) -> dict:
    """LwcHeartbeat: last completed step boundary, delayed one interval
    (SubscribeApi.scala:163-181)."""
    now = int(time.time() * 1000) if now_ms is None else now_ms
    return {
        "type": "heartbeat",
        "timestamp": now // step_ms * step_ms - step_ms,
        "step": step_ms,
    }


def subscribe_expressions(
    sm: StreamSubscriptionManager,
    stream_id: str,
    expressions: list[dict],
    default_step_ms: int,
) -> list[dict]:
    """SubscribeApi.subscribe parity: split each expression, register the
    new data-expr subscriptions, unsubscribe ones no longer requested,
    and return one subscription-v2 message per added sub (errors become
    error diagnostics, not failures of the whole batch)."""
    if sm.handler_for_stream(stream_id) is None:
        raise ValueError(f"stream not registered: {stream_id}")
    messages: list[dict] = []
    in_use: set[str] = set()
    for item in expressions:
        expr = item.get("expression")
        expr_type = item.get("exprType", "TIME_SERIES")
        freq = int(item.get("frequency", item.get("step", default_step_ms)) or default_step_ms)
        if not expr:
            messages.append(diagnostic("error", "expression cannot be null or empty"))
            continue
        try:
            splits = split(expr, frequency=freq, expr_type=expr_type, step=default_step_ms // 1000)
            wire_subs = [
                WireSubscription(
                    ExpressionMetadata.make(s.expr, expr_type, freq), s.match_query
                )
                for s in splits
            ]
            _, added = sm.subscribe(stream_id, wire_subs)
            for sub in added:
                meta = sub.metadata
                messages.append(
                    {
                        "type": "subscription-v2",
                        "expression": expr,
                        "exprType": expr_type,
                        "subExprs": [
                            {
                                "id": meta.id,
                                "expression": meta.expression,
                                "step": meta.frequency,
                            }
                        ],
                    }
                )
            in_use.update(s.metadata.id for s in wire_subs)
        except Exception as e:  # noqa: BLE001 (diagnostic, not failure)
            messages.append(diagnostic("error", f"[{expr}] {e}"))
    stale = [
        s.metadata.id
        for s in sm.subscriptions_for_stream(stream_id)
        if s.metadata.id not in in_use
    ]
    sm.unsubscribe(stream_id, stale)
    return messages


def evaluate(sm: StreamSubscriptionManager, payload: dict) -> int:
    """EvaluateApi parity: group metrics by subscription id, offer
    LwcDatapoint messages to every handler for that id; returns the
    number of items with no subscription (counted on sm.ignored_items)."""
    ts = payload.get("timestamp")
    by_id: dict[str, list[dict]] = {}
    for m in payload.get("metrics") or []:
        by_id.setdefault(m["id"], []).append(
            {
                "type": "datapoint",
                "timestamp": m.get("timestamp", ts),
                "id": m["id"],
                "tags": m.get("tags") or {},
                "value": m.get("value"),
            }
        )
    for ev in payload.get("events") or []:
        by_id.setdefault(ev["id"], []).append({"type": "event", **ev})
    for msg in payload.get("messages") or []:
        by_id.setdefault(msg["id"], []).append(msg)
    ignored = 0
    for sub_id, msgs in by_id.items():
        handlers = sm.handlers_for_subscription(sub_id)
        if handlers:
            for h in handlers:
                h.offer(msgs)
        else:
            ignored += len(msgs)
    sm.ignored_items += ignored
    return ignored
