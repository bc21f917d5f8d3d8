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
integral, cumulative-max, des, sdes.  DES carries its recurrence state
((sample count, smoothed, trend) per instance — two instances plus the
swap counters for sliding DES) in the same state row as the rolling
buffer, so the streaming evaluator never needs a driver-side history
buffer for it.
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

# state: last processed step + the rolling buffer of recent values + the
# DES recurrence registers [cur1, sp1, bp1, cur2, sp2, bp2, use_one, cs]
# (only the first triple is live for plain :des)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_t", T.LongType()),
        T.StructField("buf", T.ArrayType(T.DoubleType())),
        T.StructField("acc", T.DoubleType()),  # integral / cumulative-max
        T.StructField("des", T.ArrayType(T.DoubleType())),
    ]
)

_DES_INIT = [0.0, float("nan"), 0.0, 0.0, float("nan"), 0.0, 1.0, 0.0]


def _des_next(st: list[float], i: int, v: float, training: int, alpha: float, beta: float) -> float:
    """Advance one DES instance living at st[i:i+3] = [current, sp, bp]
    (OnlineDes.scala:28-52 via builder._Des): emits the previous smoothed
    value once `training` non-NaN samples were seen; NaN inputs do not
    advance the count."""
    import math

    ret = st[i + 1] if st[i] >= training else math.nan
    if not math.isnan(v):
        if st[i] == 0:
            st[i + 1], st[i + 2] = v, 0.0
        else:
            sn = alpha * v + (1 - alpha) * (st[i + 1] + st[i + 2])
            st[i + 2] = beta * (sn - st[i + 1]) + (1 - beta) * st[i + 2]
            st[i + 1] = sn
        st[i] += 1
    return ret


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


def _advance(
    op: str,
    params: tuple,
    step: int,
    state: tuple,
    ts: "list[int]",
    vs: "list[float]",
) -> tuple[list[int], list[object], tuple]:
    """Advance the per-series kernel over sorted (t, value) rows.

    `state` is (last_t, buf, acc, des) — the same row layout as
    STATE_SCHEMA — and the returned tuple is the successor state.  Shared
    by both streaming kernels (`applyInPandasWithState` and
    `transformWithStateInPandas`) so semantics cannot drift.
    """
    import math

    is_des = op in ("des", "sdes")
    keep = 2 if is_des else max(int(params[0]) + 1 if params else 2, 2)
    if is_des:
        n, alpha, beta = int(params[0]), float(params[1]), float(params[2])

    def des_step(des: list[float], v: float) -> float:
        if op == "des":
            return _des_next(des, 0, v, n, alpha, beta)
        # sliding (OnlineSlidingDes.scala via builder._des_kernel): two
        # instances fed every value; the active one is reset and swapped
        # every n samples
        des[7] += 1
        v1 = _des_next(des, 0, v, n, alpha, beta)
        v2 = _des_next(des, 3, v, n, alpha, beta)
        use_one = des[6] >= 1.0
        out = v1 if use_one else v2
        if des[7] % n == 0:
            i = 0 if use_one else 3
            des[i], des[i + 1], des[i + 2] = 0.0, math.nan, 0.0
            des[6] = 0.0 if use_one else 1.0
        return out

    last_t, buf, acc, des = state
    buf, des = list(buf), list(des)
    out_t: list[int] = []
    out_v: list[object] = []
    for t, v in zip(ts, vs):
        t = int(t)
        vv = float(v) if v is not None else math.nan
        if last_t is not None:
            # NaN-tick the gap steps (StatefulExpr.scala:313-321)
            for _ in range(max(0, (t - last_t) // step - 1)):
                if is_des:
                    des_step(des, math.nan)
                else:
                    buf.append(math.nan)
                    buf = buf[-keep:]
        if is_des:
            out = des_step(des, vv)
        else:
            buf.append(vv)
            buf = buf[-keep:]
            out, acc = _apply_op(op, params, buf, acc)
        out_t.append(t)
        out_v.append(None if (out is None or math.isnan(out)) else out)
        last_t = t
    return out_t, out_v, (last_t, buf, float(acc), des)


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

    def update(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        rows = pd.concat(list(pdfs)).sort_values("t")
        if state.exists:
            st = state.get
            st = (st[0], list(st[1]), st[2], list(st[3]))
        else:
            st = (None, [], math.nan, list(_DES_INIT))
        out_t, out_v, st = _advance(
            op, params, step, st, list(rows["t"]), list(rows["value"])
        )
        state.update(st)
        yield pd.DataFrame({"series": key[0], "t": out_t, "value": out_v})

    return finalized.groupBy("series").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def supports_transform_with_state(spark) -> bool:
    """Capability check for the Spark 4 `transformWithStateInPandas` API
    (arbitrary-state v2).  Requires the API itself, a usable
    `google.protobuf` runtime for the state-server protocol gencode, and
    a JVM launched with the runtime exported so the TWS worker processes
    it spawns inherit it (util/pbruntime.py)."""
    from pyspark.sql import GroupedData

    from ..util.pbruntime import ensure_protobuf_runtime, jvm_inherits_runtime

    if not hasattr(GroupedData, "transformWithStateInPandas"):
        return False
    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
        )
    except ImportError:
        return False
    return ensure_protobuf_runtime() and jvm_inherits_runtime(spark)


def stateful_stream_tws(
    finalized: DataFrame, op: str, params: tuple, step: int
) -> DataFrame:
    """`stateful_stream` on the Spark 4 `transformWithStateInPandas` API.

    Same kernel (`_advance`), but state lives in a named ValueState in the
    RocksDB state store instead of the applyInPandasWithState row — the
    migration path that retires the per-op spool chaining once the v2 API
    is the default (it composes downstream of other stateful operators).
    The caller must set
    `spark.sql.streaming.stateStore.providerClass` to the RocksDB
    provider before starting the query.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Kernel(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("kernel", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator["pd.DataFrame"]:
            pdf = pd.concat(list(rows)).sort_values("t")
            if self._state.exists():
                st = self._state.get()
                st = (st[0], list(st[1]), st[2], list(st[3]))
            else:
                st = (None, [], math.nan, list(_DES_INIT))
            out_t, out_v, st = _advance(
                op, params, step, st, list(pdf["t"]), list(pdf["value"])
            )
            self._state.update(st)
            yield pd.DataFrame({"series": key[0], "t": out_t, "value": out_v})

        def close(self) -> None:
            pass

    return finalized.groupBy("series").transformWithStateInPandas(
        statefulProcessor=_Kernel(),
        outputStructType=OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
