"""lwcapi-style subscription lifecycle over the streaming evaluator.

The reference's lwcapi accepts expression subscriptions, splits each
into data-expression subscriptions routed to publishers, and evaluates
the full expression per step interval as data arrives, emitting tagged
payloads per subscription (`atlas-lwcapi/.../SubscribeApi.scala`,
`atlas-eval/.../stream/EvaluatorImpl.scala`).

Spark-first mapping: one `StreamingEvaluator` per registered expression
over a SHARED datapoint stream (each evaluator filters with its own
query predicates executor-side); the splitter supplies the
data-expression subscriptions (the routing metadata a real deployment
pushes to publishers).  Results surface as (subscription id, interval,
series tags, value) — the evaluate-payload shape.

The registry itself — id computation, dedup, TTL expiry — is the
wire-plane `StreamSubscriptionManager` (lwc_wire.py): this module is a
thin EVALUATION layer registered as one synthetic stream on that
manager, so both planes share ONE subscription registry implementation
(the reference likewise layers EvaluatorImpl's subscriptions on the
same SubscriptionManager its apis use).  TTL expiry in the shared
registry releases the evaluator via the `on_expire` hook.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .evaluator import StreamingEvaluator
from .lwc_wire import (
    ExpressionMetadata,
    QueueHandler,
    StreamMetadata,
    StreamSubscriptionManager,
    WireSubscription,
)
from .splitter import Subscription, split

# the synthetic wire-plane stream id owned by the server-side evaluator
DATA_PLANE_STREAM = "data-plane"


@dataclass
class _Entry:
    sub_id: str
    expression: str
    evaluator: StreamingEvaluator
    data_subs: list[Subscription]
    query: object = None  # StreamingQuery once start() wires this entry


class SubscriptionManager:
    """Register / unregister streaming expression subscriptions and drive
    them over one datapoint stream.  Registry/dedup/TTL delegate to the
    wire-plane `StreamSubscriptionManager`; this class owns only the
    per-subscription evaluation state (StreamingEvaluator lifecycle)."""

    def __init__(
        self,
        spark: SparkSession,
        step: int,
        key_cols: dict[str, str],
        sub_ttl: float | None = None,
        wire: StreamSubscriptionManager | None = None,
    ):
        self.spark = spark
        self.step = step
        self.key_cols = dict(key_cols)
        self.wire = wire if wire is not None else StreamSubscriptionManager(
            step=step, sub_ttl=sub_ttl
        )
        meta = StreamMetadata(DATA_PLANE_STREAM, address="local")
        self.wire.register(meta, QueueHandler(meta))
        self.wire.on_expire = self._on_expire
        self._entries: dict[str, _Entry] = {}

    @staticmethod
    def _stop_entry(entry: _Entry | None) -> None:
        """Stop the entry's streaming query if start() wired one — an
        expired/unsubscribed expression must not keep computing (the
        orphaned query would run until a full manager stop and survive a
        re-start that only re-wires surviving entries)."""
        if entry is not None and entry.query is not None:
            try:
                entry.query.stop()
            except Exception:
                pass  # already terminated
            entry.query = None

    def _on_expire(self, stream_id: str, sub_id: str) -> None:
        """TTL expiry in the shared registry drops the evaluator AND stops
        its running query."""
        if stream_id == DATA_PLANE_STREAM:
            self._stop_entry(self._entries.pop(sub_id, None))

    def subscribe(self, expression: str, frequency: int | None = None) -> _Entry:
        """Register an expression; returns its entry.  The id and the
        dedup decision come from the shared wire-plane registry
        (compute_id = sha1 of freq~type~expr for both planes), so
        re-subscribing the same program is a no-op like lwcapi's
        subscription dedup — and refreshes its TTL."""
        freq = frequency if frequency is not None else self.step * 1000
        data_subs = split(expression, frequency=freq, step=self.step)
        meta = ExpressionMetadata.make(expression, "TIME_SERIES", freq)
        _, added = self.wire.subscribe(
            DATA_PLANE_STREAM, [WireSubscription(meta)]
        )
        if not added and meta.id in self._entries:
            return self._entries[meta.id]
        ev = StreamingEvaluator(
            self.spark, expression, self.step, dict(self.key_cols)
        )
        entry = _Entry(meta.id, expression, ev, data_subs)
        self._entries[meta.id] = entry
        return entry

    def unsubscribe(self, sub_id: str) -> bool:
        self.wire.unsubscribe(DATA_PLANE_STREAM, [sub_id])
        entry = self._entries.pop(sub_id, None)
        self._stop_entry(entry)
        return entry is not None

    @property
    def subscriptions(self) -> list[Subscription]:
        """The union of data-expression subscriptions to push to
        publishers, deduped by id across registered expressions."""
        live = {s.metadata.id for s in self.wire.subscriptions_for_stream(DATA_PLANE_STREAM)}
        seen: dict[str, Subscription] = {}
        for e in self._entries.values():
            if e.sub_id not in live:
                continue
            for s in e.data_subs:
                seen.setdefault(s.id, s)
        return list(seen.values())

    def start(self, stream: DataFrame) -> None:
        """Wire every not-yet-started registered expression onto the
        shared stream.  Query handles live on their entries, so
        expiry/unsubscribe can stop exactly the dropped expression and a
        later start() only wires the new ones."""
        for i, e in enumerate(self._entries.values()):
            if e.query is None:
                e.query = e.evaluator.start(
                    stream, query_name=f"sub_{i}_{e.sub_id[:8]}"
                )

    def process_all_available(self) -> None:
        for e in self._entries.values():
            if e.query is not None:
                e.query.processAllAvailable()

    def stop(self) -> None:
        for e in self._entries.values():
            self._stop_entry(e)

    def payloads(self) -> list[dict]:
        """Evaluate payloads: one dict per finalized result row, tagged
        with the owning subscription id (TimeSeriesMessage shape)."""
        out = []
        for e in self._entries.values():
            for row in e.evaluator.results:
                out.append({"id": e.sub_id, **row})
        return out
