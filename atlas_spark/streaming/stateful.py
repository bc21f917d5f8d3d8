"""Distributed stateful operators for streams.

The scale-correct path for SURVEY §2.4 in streaming mode: per-series
online state lives in Spark's state store, partitioned by the series key
across executors (`applyInPandasWithState`), exactly like the reference
keeps `Map[StatefulExpr, Any]` per output series
(`FinalExprEval.scala:74-75,243-249`).

Parity detail (StatefulExpr.scala:313-321): series absent in an interval
still advance their state — the kernel ticks every missing step between
the last seen interval and the new one with NaN before applying the new
value.

Supported ops: delay, rolling-count/min/max/sum/mean, derivative,
integral, cumulative-max (the window-function ops; DES uses the same
shape with its own recurrence).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyspark.sql.types as T
from pyspark.sql import DataFrame

OUT_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("t", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# state: last processed step + the rolling buffer of recent values
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_t", T.LongType()),
        T.StructField("buf", T.ArrayType(T.DoubleType())),
        T.StructField("acc", T.DoubleType()),  # integral / cumulative-max
    ]
)


def _apply_op(op: str, params: tuple, buf: list[float], acc: float) -> tuple[float, float]:
    """One step: buf holds the last `n` values (newest last, NaN = gap).
    Returns (output value, new accumulator)."""
    import math

    v = buf[-1]
    if op == "delay":
        n = int(params[0])
        out = buf[-1 - n] if len(buf) > n else math.nan
        return out, acc
    if op == "derivative":
        prev = buf[-2] if len(buf) >= 2 else math.nan
        return v - prev, acc
    window = [x for x in buf[-int(params[0]) :] if not math.isnan(x)] if params else []
    if op == "rolling-sum":
        return (sum(window) if window else math.nan), acc
    if op == "rolling-min":
        return (min(window) if window else math.nan), acc
    if op == "rolling-max":
        return (max(window) if window else math.nan), acc
    if op == "rolling-mean":
        min_n = int(params[1])
        return (sum(window) / len(window) if len(window) >= min_n else math.nan), acc
    if op == "rolling-count":
        n = int(params[0])
        cnt = sum(1 for x in buf[-n:] if not math.isnan(x) and abs(x) >= 1e-12)
        return float(cnt), acc
    if op == "trend":
        # sum / window-size with fill warm-up (OnlineTrend.scala:33-49):
        # NaN until the buffer holds a full window; params[0] is the
        # window in STEPS (normalized by the caller)
        n = int(params[0])
        if len(buf) < n:
            return math.nan, acc
        w = buf[-n:]
        finite = [x for x in w if not math.isnan(x)]
        return (sum(finite) / n if finite else math.nan), acc
    if op == "integral":
        if not math.isnan(v):
            acc = v if math.isnan(acc) else acc + v
        return acc, acc
    if op == "cumulative-max":
        if not math.isnan(v):
            acc = v if math.isnan(acc) else max(acc, v)
        return acc, acc
    raise ValueError(f"unsupported streaming stateful op {op}")


def stateful_stream(
    finalized: DataFrame, op: str, params: tuple, step: int
) -> DataFrame:
    """Apply a stateful operator over a stream of finalized intervals.

    Input: streaming DataFrame [series string, t long (step aligned),
    value double] in append mode (one row per finalized interval).
    Output: [series, t, value] with the operator applied, state carried
    across micro-batches and NaN-ticked through gaps.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    keep = max(int(params[0]) + 1 if params else 2, 2)

    def update(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        rows = pd.concat(list(pdfs)).sort_values("t")
        if state.exists:
            last_t, buf, acc = state.get
            buf = list(buf)
        else:
            last_t, buf, acc = None, [], math.nan
        out_t, out_v = [], []
        for t, v in zip(rows["t"], rows["value"]):
            t = int(t)
            if last_t is not None:
                # NaN-tick the gap steps (StatefulExpr.scala:313-321)
                for _ in range(max(0, (t - last_t) // step - 1)):
                    buf.append(math.nan)
                    buf = buf[-keep:]
            buf.append(float(v) if v is not None else math.nan)
            buf = buf[-keep:]
            out, acc = _apply_op(op, params, buf, acc)
            out_t.append(t)
            out_v.append(None if (out is None or math.isnan(out)) else out)
            last_t = t
        state.update((last_t, buf, float(acc)))
        yield pd.DataFrame({"series": key[0], "t": out_t, "value": out_v})

    return finalized.groupBy("series").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
