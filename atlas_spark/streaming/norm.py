"""Ingest normalization — counter->rate, gauge dedup, rolling sum.

Mirror of the reference's publish-path normalization
(`atlas-core/.../norm/NormalizationCache.scala:57-108`):

  - counters ("rate" dsType): publishers send cumulative counts; the
    stored value is the per-second rate `delta / delta_t`
    (`RateValueFunction.scala`); negative deltas (counter reset) clamp
    to 0
  - gauges: duplicate publishes in one step keep the max
  - sums: multiple deltas in one step add

Batch versions are plain window/group expressions.  The streaming
counter->rate keeps (last_ts, last_value) per series via
`applyInPandasWithState` — state scales with the number of live
series, partitioned across executors by the series key.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

RATE_SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("t", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_t", T.LongType()),
        T.StructField("last_v", T.DoubleType()),
    ]
)


def counter_to_rate_batch(df: DataFrame, series_cols: list[str]) -> DataFrame:
    """Batch counter->rate: per-series ordered delta / dt, resets clamp to 0.

    Input: [series_cols..., t (epoch sec), value (cumulative count)].
    """
    w = Window.partitionBy(*series_cols).orderBy("t")
    prev_v = F.lag("value").over(w)
    prev_t = F.lag("t").over(w)
    rate = F.when(
        prev_v.isNull() | prev_t.isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.greatest(F.col("value") - prev_v, F.lit(0.0)) / (F.col("t") - prev_t)
    )
    return df.withColumn("value", rate).filter(F.col("value").isNotNull())


def gauge_dedup_batch(df: DataFrame, series_cols: list[str], step: int) -> DataFrame:
    """Gauge normalization: duplicate publishes within a step keep the max
    (`AggrDatapoint.scala:195-222` GaugeSumAggregator dedup)."""
    tcell = (F.col("t") - F.col("t") % step).alias("t")
    return df.groupBy(*series_cols, tcell).agg(F.max("value").alias("value"))


def sum_rollup_batch(df: DataFrame, series_cols: list[str], step: int) -> DataFrame:
    """Sum normalization: deltas within a step add."""
    tcell = (F.col("t") - F.col("t") % step).alias("t")
    return df.groupBy(*series_cols, tcell).agg(F.sum("value").alias("value"))


def counter_to_rate_stream(df: DataFrame, timeout_s: int = 3600) -> DataFrame:
    """Streaming counter->rate with per-series state.

    Input stream schema: [series string, t long, value double] (cumulative).
    Output: [series, t, value (rate/sec)].  State = last (t, value) pair per
    series; series idle past `timeout_s` are expired (heartbeat expiry in
    NormalizationCache).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        rows = pd.concat(list(pdfs)).sort_values("t")
        if state.exists:
            last_t, last_v = state.get
        else:
            last_t, last_v = None, None
        out_t, out_v = [], []
        for t, v in zip(rows["t"], rows["value"]):
            if last_t is not None and t > last_t:
                delta = max(v - last_v, 0.0)
                out_t.append(t)
                out_v.append(delta / (t - last_t))
            last_t, last_v = int(t), float(v)
        state.update((last_t, last_v))
        yield pd.DataFrame({"series": key[0], "t": out_t, "value": out_v})

    return df.groupBy("series").applyInPandasWithState(
        update,
        outputStructType=RATE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------- publish payload

# PublishPayloads.scala:95-137 wire shape: common tags merged under each
# metric's tags (metric wins), legacy "start" (timestamp) and "values"
# (value) accepted
PUBLISH_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "metrics",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
                        T.StructField("timestamp", T.LongType()),
                        T.StructField("start", T.LongType()),
                        T.StructField("value", T.DoubleType()),
                        T.StructField("values", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def decode_publish_payloads(
    df: DataFrame, payload_col: str = "payload", drop_undecodable: bool = True
) -> DataFrame:
    """Decode publish-API JSON payloads to datapoint rows, JVM-side.

    Works identically on batch frames and streams (`from_json` + explode
    are pure projections — no UDF, no driver parsing).  Output columns:
    tags map, timestamp (ms), value.  Pair with
    `validation.validate_publish` for the reject-with-reason split.

    With ``drop_undecodable=False``, payloads that fail to parse (or
    carry no metrics) survive as one all-null row each (``explode_outer``)
    so an audit sink can count them instead of losing them silently.
    """
    p = F.from_json(F.col(payload_col), PUBLISH_PAYLOAD_SCHEMA)
    ex = F.explode if drop_undecodable else F.explode_outer
    m = ex(p["metrics"]).alias("m")
    base = df.select(p["tags"].alias("_common"), m)
    mtags = F.coalesce(
        F.col("m.tags"), F.from_json(F.lit("{}"), "map<string,string>")
    )
    common = F.coalesce(
        F.col("_common"), F.from_json(F.lit("{}"), "map<string,string>")
    )
    # metric tags win on key collision; map_filter avoids the duplicate-key
    # policy conf entirely
    merged = F.map_concat(
        F.map_filter(common, lambda k, _: ~F.map_contains_key(mtags, k)), mtags
    )
    return base.select(
        merged.alias("tags"),
        F.coalesce(F.col("m.timestamp"), F.col("m.start")).alias("timestamp"),
        F.coalesce(F.col("m.value"), F.col("m.values")).alias("value"),
    )


def decode_compact_batch_payloads(
    df: DataFrame, payload_col: str = "payload", drop_undecodable: bool = True
) -> DataFrame:
    """Decode compact-batch publish payloads JVM-side — a pure Catalyst
    fold, no UDF.

    Wire shape (`PublishPayloads.scala:284-304` decodeCompactBatch): one
    flattened JSON array
    `[tableSize, ...strings, nDatapoints, (id, nTags, kIdx, vIdx...,
    timestamp, value)*]` where tag keys/values are indexes into the
    string table.  The variable per-record stride (4 + 2*nTags) forces a
    sequential cursor walk, which `aggregate()` expresses as a
    fold carrying (cursor, rows) — the whole decode stays in whole-stage
    codegen and the same expression serves batch and streaming frames.

    Output matches `decode_publish_payloads`: (tags, timestamp, value)
    rows; undecodable payloads become one all-null row each when
    ``drop_undecodable=False``.  The wire `id` is redundant with the tags
    (it is the sha1 of them, ItemId.scala) and is not carried.

    Malformed wire data must never fail the micro-batch (a streaming
    sink restart is a fleet-wide outage; one publisher's corrupt payload
    is not): every count/index access goes through ``try_cast`` /
    ``try_element_at`` so corruption degrades to null fields or an
    all-null reject row, the datapoint-count iteration is guarded
    (``sequence(1, 0)`` is the *descending* [1,0] in Spark, and a
    negative or absurd count would otherwise throw or OOM — counts are
    clamped to what the payload could physically hold), and tag pairs
    whose string-table index is dangling are dropped instead of
    poisoning ``map_from_arrays`` with a null key.
    """
    # Tag pairs are built as entries and null-key entries filtered out:
    # a dangling string-table reference yields a null from
    # try_element_at, and map_from_entries would reject a null key.
    # A corrupt (or adversarial) record can also repeat the same key
    # index; map_from_entries would throw DUPLICATE_MAP_KEY under the
    # default spark.sql.mapKeyDedupPolicy=EXCEPTION and kill the
    # micro-batch, where the reference's Jackson decode last-write-wins
    # (PublishPayloads.scala) — so keep only the LAST entry per key
    # (index-lambda filter; O(nTags^2) per record, nTags is small).
    rec = (
        "named_struct("
        " 'tags', element_at(transform(array(filter("
        "   transform(sequence(1, _nt), j -> named_struct("
        "     'key', try_element_at(_a, try_cast(try_element_at(_a, acc.p + 2*j) AS INT) + 2),"
        "     'value', try_element_at(_a, try_cast(try_element_at(_a, acc.p + 2*j + 1) AS INT) + 2))),"
        "   e -> e.key IS NOT NULL)),"
        "  _es -> map_from_entries(filter(_es,"
        "    (en, ei) -> NOT exists(slice(_es, ei + 2, size(_es)), e2 -> e2.key = en.key)))), 1),"
        " 'timestamp', try_cast(try_element_at(_a, acc.p + 2*_nt + 2) AS BIGINT),"
        " 'value', try_cast(try_element_at(_a, acc.p + 2*_nt + 3) AS DOUBLE))"
    )
    # `transform(array(nTags), _nt -> ...)` is the lambda-binding trick:
    # it names the per-record tag count once instead of re-evaluating the
    # element_at chain at every use site.  nTags is clamped to [0,
    # size/2] — each tag pair needs two slots — so a corrupt count can't
    # build an unbounded sequence.
    # nDatapoints likewise clamped to [empty, size/4] (min record stride
    # is 4, so no payload can hold more than size/4 records); n < 1 must
    # yield an *empty* iteration, not sequence(1, 0).
    # least()/greatest() skip nulls in Spark, so a bare clamp would turn
    # a corrupt (null) count into the bound itself; CASE on nullness
    # first so corruption stays null and cascades to a null reject row.
    n_raw = "try_cast(try_element_at(_a, try_cast(try_element_at(_a, 1) AS INT) + 2) AS INT)"
    n_dp = f"CASE WHEN {n_raw} IS NULL THEN NULL ELSE least({n_raw}, cast(size(_a) / 4 AS INT)) END"
    nt_clamped = (
        "CASE WHEN _ntr IS NULL THEN NULL"
        " ELSE greatest(0, least(_ntr, cast(size(_a) / 2 AS INT))) END"
    )
    fold = (
        "aggregate("
        f" CASE WHEN {n_dp} < 1 THEN cast(array() AS ARRAY<INT>) ELSE sequence(1, {n_dp}) END,"
        " named_struct('p', try_cast(try_element_at(_a, 1) AS INT) + 3,"
        "              'rows', cast(array() AS ARRAY<STRUCT<tags MAP<STRING,STRING>, timestamp BIGINT, value DOUBLE>>)),"
        " (acc, i) -> element_at(transform(array(try_cast(try_element_at(_a, acc.p + 1) AS INT)),"
        f"   _ntr -> element_at(transform(array({nt_clamped}),"
        f"     _nt -> named_struct('p', acc.p + 4 + 2*_nt, 'rows', array_append(acc.rows, {rec}))), 1)), 1),"
        " acc -> acc.rows)"
    )
    parsed = df.select(F.from_json(F.col(payload_col), "array<string>").alias("_a"))
    ex = F.explode if drop_undecodable else F.explode_outer
    rows = parsed.select(ex(F.expr(fold)).alias("m"))
    return rows.select(
        F.col("m.tags").alias("tags"),
        F.col("m.timestamp").alias("timestamp"),
        F.col("m.value").alias("value"),
    )


def encode_compact_batch(datapoints: list) -> str:
    """Encode (tags, timestamp, value) tuples to the compact wire format
    (the test-side twin of `decode_compact_batch_payloads`; id = the
    tag-map identity placeholder — the decoder ignores it, matching the
    reference which recomputes ids from tags)."""
    import json

    table: list[str] = []
    index: dict[str, int] = {}

    def ref(s: str) -> int:
        if s not in index:
            index[s] = len(table)
            table.append(s)
        return index[s]

    body: list = []
    for tags, ts, value in datapoints:
        body.append("-")  # id placeholder (recomputed from tags on decode)
        body.append(len(tags))
        for k in sorted(tags):
            body.append(ref(k))
            body.append(ref(tags[k]))
        body.append(ts)
        body.append(value)
    return json.dumps([len(table), *table, len(datapoints), *body])
