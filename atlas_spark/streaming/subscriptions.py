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
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .evaluator import StreamingEvaluator
from .splitter import Subscription, split


@dataclass
class _Entry:
    sub_id: str
    expression: str
    evaluator: StreamingEvaluator
    data_subs: list[Subscription]
    query = None


class SubscriptionManager:
    """Register / unregister streaming expression subscriptions and drive
    them over one datapoint stream."""

    def __init__(self, spark: SparkSession, step: int, key_cols: dict[str, str]):
        self.spark = spark
        self.step = step
        self.key_cols = dict(key_cols)
        self._entries: dict[str, _Entry] = {}
        self._queries: list = []

    def subscribe(self, expression: str, frequency: int | None = None) -> _Entry:
        """Register an expression; returns its entry (id = the sha the
        splitter derives, so re-subscribing the same program is a no-op
        like lwcapi's subscription dedup)."""
        freq = frequency if frequency is not None else self.step * 1000
        data_subs = split(expression, frequency=freq, step=self.step)
        sub_id = Subscription.make(None, expression, "TIME_SERIES", freq).id
        if sub_id in self._entries:
            return self._entries[sub_id]
        ev = StreamingEvaluator(
            self.spark, expression, self.step, dict(self.key_cols)
        )
        entry = _Entry(sub_id, expression, ev, data_subs)
        self._entries[sub_id] = entry
        return entry

    def unsubscribe(self, sub_id: str) -> bool:
        return self._entries.pop(sub_id, None) is not None

    @property
    def subscriptions(self) -> list[Subscription]:
        """The union of data-expression subscriptions to push to
        publishers, deduped by id across registered expressions."""
        seen: dict[str, Subscription] = {}
        for e in self._entries.values():
            for s in e.data_subs:
                seen.setdefault(s.id, s)
        return list(seen.values())

    def start(self, stream: DataFrame) -> None:
        """Wire every registered expression onto the shared stream."""
        for i, e in enumerate(self._entries.values()):
            self._queries.append(
                e.evaluator.start(stream, query_name=f"sub_{i}_{e.sub_id[:8]}")
            )

    def process_all_available(self) -> None:
        for q in self._queries:
            q.processAllAvailable()

    def stop(self) -> None:
        for q in self._queries:
            q.stop()
        self._queries = []

    def payloads(self) -> list[dict]:
        """Evaluate payloads: one dict per finalized result row, tagged
        with the owning subscription id (TimeSeriesMessage shape)."""
        out = []
        for e in self._entries.values():
            for row in e.evaluator.results:
                out.append({"id": e.sub_id, **row})
        return out
