"""Streaming expression evaluator.

Spark-first mirror of the reference's streaming path (entry point C,
SURVEY §3.3):

  reference                         | this engine
  ----------------------------------+----------------------------------
  TimeGrouped rolling buffers        | tumbling `window(step)` +
  (flush on evict, late -> dropped)  | `withWatermark(num_buffers*step)`
  publisher partial aggregates       | Spark streaming partial agg
  (AggrDatapoint merge)              | (map-side combine per micro-batch)
  FinalExprEval per time bucket      | `foreachBatch` running the batch
  (carries stateful-op state)        | planner over a rolling lookback
                                     | buffer of finalized intervals

The expression is evaluated per finalized step interval; stateful
operators (rolling windows, DES) see a bounded lookback of previously
finalized intervals so their values match the batch evaluation exactly
once an interval is final.  Late data beyond the watermark is dropped by
Spark, mirroring TimeGrouped's `droppedOld` behavior
(`atlas-eval/.../stream/TimeGrouped.scala:89-141`).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..model import expr as E
from ..plans.builder import Evaluator
from ..plans.context import EvalContext
from ..sources.datapoints import DatapointSource
from ..stacklang.vocab import parse as parse_asl


def _max_lookback_steps(e: E.TimeSeriesExpr) -> int:
    """Steps of history a stateful operator needs for exact results."""
    need = 1
    if isinstance(e, E.StatefulMathExpr):
        if e.op in ("delay", "rolling-count", "rolling-min", "rolling-max", "rolling-sum"):
            need = int(e.params[0]) + 1
        elif e.op == "rolling-mean":
            need = int(e.params[0]) + 1
        elif e.op == "trend":
            need = 64  # duration-based; bounded via ctx step at eval
        elif e.op in ("integral", "cumulative-max", "des", "sdes"):
            need = 1 << 20  # full-window state; cap applied by caller
        elif e.op == "derivative":
            need = 2
    for c in e.children():
        need = max(need, _max_lookback_steps(c))
    return need


@dataclass
class StreamingEvaluator:
    """Evaluates one ASL program over a datapoint stream.

    Input stream schema: one string column per tag key (same promoted
    layout as DatapointSource), `ts` timestamp, `value` double.
    Results accumulate in `results` as (t, key..., value) rows per
    finalized interval, in processing order.
    """

    spark: SparkSession
    asl: str
    step: int
    key_cols: dict[str, str]  # tag key -> column name
    num_buffers: int = 2  # late-data window, TimeGrouped.numBuffers
    max_lookback: int = 512

    def __post_init__(self):
        exprs = parse_asl(self.asl, step=self.step)
        if len(exprs) != 1:
            raise ValueError("streaming evaluator takes a single expression")
        self.expr = exprs[0]
        self.lookback = min(_max_lookback_steps(self.expr), self.max_lookback)
        self._buffer = None  # rolling pandas buffer of finalized dp rows
        self.results: list[dict] = []
        self.intervals_seen: set[int] = set()

    # ---------------------------------------------------------------- query

    def start(self, stream: DataFrame, query_name: str = "atlas_stream"):
        """Wire the streaming DAG: step window + watermark + partial agg,
        then per-batch final evaluation."""
        cols = list(self.key_cols.values())
        watermark = f"{self.num_buffers * self.step} seconds"
        windowed = (
            stream.withWatermark("ts", watermark)
            .groupBy(
                F.window("ts", f"{self.step} seconds").alias("w"),
                *[F.col(c) for c in cols],
            )
            .agg(F.sum("value").alias("value"))
            .select(
                F.unix_timestamp(F.col("w.start")).cast("long").alias("t"),
                *cols,
                "value",
            )
        )
        return (
            windowed.writeStream.outputMode("append")
            .queryName(query_name)
            .foreachBatch(self._on_batch)
            .start()
        )

    # ------------------------------------------------------------ internals

    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """FinalExprEval equivalent: merge finalized intervals into the
        lookback buffer and re-evaluate the expression for new intervals."""
        import pandas as pd

        pdf = batch_df.toPandas()
        if pdf.empty:
            return
        if self._buffer is None:
            self._buffer = pdf
        else:
            self._buffer = pd.concat([self._buffer, pdf], ignore_index=True)
        t_max = int(self._buffer["t"].max())
        new_ts = sorted(set(int(t) for t in pdf["t"]) - self.intervals_seen)
        if not new_ts:
            return
        self.intervals_seen.update(new_ts)
        # bound the buffer to the lookback horizon, but never trim intervals
        # that still need to be evaluated in this batch
        horizon = min(t_max - self.lookback * self.step, new_ts[0])
        self._buffer = self._buffer[self._buffer["t"] >= horizon]

        # evaluate with the batch planner over the buffered window
        t_lo = int(self._buffer["t"].min())
        ctx = EvalContext(t_lo, t_max + self.step, self.step)
        src_df = self.spark.createDataFrame(self._buffer)
        source = DatapointSource(
            df=src_df, step=self.step, colmap=dict(self.key_cols), sql_cte=""
        )
        rf = Evaluator(source, ctx).eval(self.expr)
        kc = rf.key_cols
        out = rf.df.filter(F.col("t").isin(new_ts)).collect()
        for r in out:
            row = {"t": r["t"], "value": r["value"]}
            for k, c in zip(rf.keys or (), kc):
                row[k] = r[c]
            self.results.append(row)
