"""Streaming event matching (`streaming/events.py`): the lwc-events role.
Matched `:table` rows flow statelessly; `:sample` rolls up per watermarked
interval — both equal to the batch computation over the same rows."""

from __future__ import annotations

import json
import shutil
import tempfile

import pandas as pd
import pytest

from atlas_spark.model import expr as E
from atlas_spark.model import query as Q
from atlas_spark.sources.events import EventSource
from atlas_spark.streaming.events import sample_stream, table_stream

STEP = 60
BASE = 1704067200

SCHEMA = (
    "event_id long, event_type string, user_id long, value double, "
    "props string, ts timestamp"
)


@pytest.fixture()
def ev_dir():
    d = tempfile.mkdtemp(prefix="atlas_ev_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows():
    rows = []
    for i in range(24):
        rows.append(
            {
                "event_id": i,
                "event_type": ["click", "view", "error"][i % 3],
                "user_id": 100 + i % 4,
                "value": float(i),
                "props": json.dumps({"k": str(40 + i)}),
                "ts": pd.Timestamp(BASE + (i // 4) * STEP + (i % 4), unit="s"),
            }
        )
    return pd.DataFrame(rows)


def _drive(spark, ev_dir, build, chunks):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_dir)
    )
    out = build(stream)
    collected = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    spark.createDataFrame(chunks[0], SCHEMA).coalesce(1).write.mode("append").parquet(ev_dir)
    q = out.writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        for c in chunks[1:]:
            spark.createDataFrame(c, SCHEMA).coalesce(1).write.mode("append").parquet(ev_dir)
            q.processAllAvailable()
    finally:
        q.stop()
    return collected


def test_table_stream_matches_batch(spark, ev_dir):
    pdf = _rows()
    e = E.EventTableExpr(Q.EqualQuery("name", "click"), ("user", "value"))
    got = _drive(
        spark,
        ev_dir,
        lambda s: table_stream(s, e),
        [pdf.iloc[:10], pdf.iloc[10:]],
    )
    batch = EventSource.from_df(spark.createDataFrame(pdf, SCHEMA))
    want = batch.table(e).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert got, "no matched rows"


def test_sample_stream_per_interval_rollup(spark, ev_dir):
    """Per finalized interval: count + deterministic min-by sample per
    group, equal to the batch aggregate over that interval's rows."""
    import pyspark.sql.functions as F

    pdf = _rows()
    e = E.EventSampleExpr(Q.GreaterThanEqualQuery("k", "44"), ("name",), ("user",))
    got = _drive(
        spark,
        ev_dir,
        lambda s: sample_stream(s, e, STEP),
        [pdf.iloc[:10], pdf.iloc[10:]],
    )
    # batch truth: same rollup keyed by (interval, name)
    src = EventSource.from_df(spark.createDataFrame(pdf, SCHEMA))
    matched = src.df.filter(src.query_col(e.query))
    proj = F.to_json(F.struct(src.field_str("user").alias("user")))
    want = (
        matched.select(
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % STEP)
            .cast("long")
            .alias("t"),
            src.field_str("name").alias("name"),
            "event_id",
            proj.alias("_proj"),
        )
        .groupBy("t", "name")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min_by("_proj", "event_id").alias("sample"),
        )
        .collect()
    )
    truth = {(r["t"], r["name"]): (r["n_events"], r["sample"]) for r in want}
    got_map = {(r["t"], r["name"]): (r["n_events"], r["sample"]) for r in got}
    assert got_map, "no streamed samples"
    for k, v in got_map.items():
        assert truth.get(k) == v, (k, v, truth.get(k))
