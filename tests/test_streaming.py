"""Streaming evaluator tests — TimeGrouped/watermark semantics and
counter->rate normalization state.

Uses a file stream fed chunk-by-chunk with `processAllAvailable()`
between chunks so watermark advancement is deterministic.
"""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from atlas_spark.streaming.evaluator import StreamingEvaluator
from atlas_spark.streaming.norm import counter_to_rate_batch, gauge_dedup_batch

STEP = 3600


@pytest.fixture()
def stream_dirs():
    d_in = tempfile.mkdtemp(prefix="atlas_stream_in_")
    d_ck = tempfile.mkdtemp(prefix="atlas_stream_ck_")
    yield d_in, d_ck
    shutil.rmtree(d_in, ignore_errors=True)
    shutil.rmtree(d_ck, ignore_errors=True)


def _dp_rows(spark, sf_dir):
    from atlas_spark.sources.datapoints import _epoch_sec

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_type").alias("k_name"),
        F.timestamp_seconds(_epoch_sec(ev)).alias("ts"),
        "value",
    )


def test_stream_matches_batch(spark, stream_dirs):
    d_in, d_ck = stream_dirs
    sf_dir = "/root/testdata/sf0.001"
    dp = _dp_rows(spark, sf_dir).orderBy("ts")
    pdf = dp.toPandas()
    n = len(pdf)
    chunks = [pdf.iloc[: n // 3], pdf.iloc[n // 3 : 2 * n // 3], pdf.iloc[2 * n // 3 :]]

    sev = StreamingEvaluator(
        spark, ":true,:sum,(,name,),:by", STEP, {"name": "k_name"}, num_buffers=2
    )
    stream = (
        spark.readStream.schema("k_name string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d_in)
    )
    spark.createDataFrame(chunks[0]).coalesce(1).write.mode("append").parquet(d_in)
    q = sev.start(stream)
    try:
        q.processAllAvailable()
        for c in chunks[1:]:
            spark.createDataFrame(c).coalesce(1).write.mode("append").parquet(d_in)
            q.processAllAvailable()
    finally:
        q.stop()

    assert len(sev.results) > 0
    # batch truth: per (name, step) sums
    truth = {
        (r["k_name"], r["t"]): r["value"]
        for r in dp.select(
            "k_name",
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % STEP).alias("t"),
            "value",
        )
        .groupBy("k_name", "t")
        .agg(F.sum("value").alias("value"))
        .collect()
    }
    for row in sev.results:
        key = (row["name"], row["t"])
        assert key in truth
        assert abs(row["value"] - truth[key]) < 1e-6, key
    # no duplicate emissions per (name, t)
    seen = [(r["name"], r["t"]) for r in sev.results]
    assert len(seen) == len(set(seen))


def test_late_data_dropped(spark, stream_dirs):
    """Rows older than the watermark (numBuffers*step) are dropped, like
    TimeGrouped droppedOld."""
    import pandas as pd

    d_in, d_ck = stream_dirs
    base = 1704067200
    mk = lambda ts_s, v: {"k_name": "a", "ts": pd.Timestamp(ts_s, unit="s"), "value": v}  # noqa: E731

    sev = StreamingEvaluator(
        spark, "name,a,:eq,:sum", STEP, {"name": "k_name"}, num_buffers=1
    )
    stream = (
        spark.readStream.schema("k_name string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d_in)
    )
    # chunk 1: hours 0..4 -> watermark ends up at hour 4 - 1h
    c1 = pd.DataFrame([mk(base + h * STEP + 60, 1.0) for h in range(5)])
    spark.createDataFrame(c1).coalesce(1).write.mode("append").parquet(d_in)
    q = sev.start(stream, query_name="late_test")
    try:
        q.processAllAvailable()
        finalized = {r["t"]: r["value"] for r in sev.results}
        assert finalized, "expected finalized intervals after chunk 1"
        # chunk 2: late row into hour 0 (far beyond watermark) + fresh row hour 5
        c2 = pd.DataFrame([mk(base + 120, 99.0), mk(base + 5 * STEP + 60, 1.0)])
        spark.createDataFrame(c2).coalesce(1).write.mode("append").parquet(d_in)
        q.processAllAvailable()
    finally:
        q.stop()
    after = {r["t"]: r["value"] for r in sev.results}
    # hour-0 value unchanged (late row dropped), no duplicate emission
    assert after[base] == finalized[base] == 1.0
    ts = [r["t"] for r in sev.results]
    assert len(ts) == len(set(ts))
    # the drop is OBSERVABLE, not silent: TimeGrouped droppedOld parity
    # counters (received / dropped_old / dropped_future) surface from the
    # query's progress metrics
    counters = sev.drop_counters()
    assert counters["received"] == 7  # 5 + 2 rows reached the subscription
    assert counters["dropped_old"] == 1  # the late hour-0 row
    assert counters["dropped_future"] == 0


def test_future_data_dropped_and_counted(spark, stream_dirs):
    """A row timestamped in the future is dropped at ingest (TimeGrouped
    droppedFuture) BEFORE it can advance the event-time watermark and
    make honest traffic look late — and the drop is counted."""
    import time as _time

    import pandas as pd

    d_in, d_ck = stream_dirs
    base = 1704067200
    mk = lambda ts_s, v: {"k_name": "a", "ts": pd.Timestamp(ts_s, unit="s"), "value": v}  # noqa: E731

    sev = StreamingEvaluator(
        spark, "name,a,:eq,:sum", STEP, {"name": "k_name"}, num_buffers=1
    )
    stream = (
        spark.readStream.schema("k_name string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d_in)
    )
    # honest hours 0..2 plus a bogus row ten years in the future: without
    # the guard the bogus row pushes the watermark past everything
    far_future = int(_time.time()) + 10 * 365 * 86400
    c1 = pd.DataFrame(
        [mk(base + h * STEP + 60, 1.0) for h in range(3)] + [mk(far_future, 99.0)]
    )
    spark.createDataFrame(c1).coalesce(1).write.mode("append").parquet(d_in)
    q = sev.start(stream, query_name="future_test")
    try:
        q.processAllAvailable()
        # a later honest chunk still finalizes (watermark not poisoned)
        c2 = pd.DataFrame([mk(base + h * STEP + 60, 1.0) for h in range(3, 5)])
        spark.createDataFrame(c2).coalesce(1).write.mode("append").parquet(d_in)
        q.processAllAvailable()
    finally:
        q.stop()
    finalized = {r["t"]: r["value"] for r in sev.results}
    assert base in finalized and base + STEP in finalized
    assert far_future // STEP * STEP not in finalized
    counters = sev.drop_counters()
    assert counters["dropped_future"] == 1
    assert counters["received"] == 6
    assert counters["dropped_old"] == 0
    # the counters surface on the streams API summary for a
    # server-evaluated stream (StreamsApi.scala:30-50 parity)
    from atlas_spark.streaming import lwc_wire

    sm = lwc_wire.StreamSubscriptionManager(step=STEP)
    meta = lwc_wire.StreamMetadata("obs")
    sm.register(meta, lwc_wire.QueueHandler(meta))
    sm.attach_counters("obs", sev.drop_counters)
    summary = sm.stream_summary("obs")
    assert summary["ingest"]["dropped_future"] == 1
    assert summary["ingest"]["received"] == 6


def _tags(d):
    return d


def test_publish_validation_rules(spark):
    from atlas_spark.streaming.validation import validate_publish

    rows = [
        ({"name": "ok.metric", "app": "www"}, 1.0),
        ({"app": "www"}, 2.0),  # missing name
        ({"name": "x"}, 3.0),  # name too short
        ({"name": "ok", "k": "v"}, 4.0),  # key too short
        ({"name": "ok", "bad key": "v"}, 5.0),  # invalid characters (space)
        ({"name": "ok", "app": "a b"}, 6.0),  # invalid characters in value
        ({"name": "ok", "atlas.custom": "v"}, 7.0),  # reserved prefix
        ({"name": "ok", "nf.app": "www", "atlas.dstype": "rate"}, 8.0),  # allowed reserved
        ({"name": "ok", **{f"u{i:02d}": "v" for i in range(21)}}, 9.0),  # >20 user tags
    ]
    df = spark.createDataFrame(rows, "tags map<string,string>, value double")
    valid, rejected = validate_publish(df)
    ok_vals = sorted(r["value"] for r in valid.collect())
    assert ok_vals == [1.0, 8.0]
    reasons = {r["value"]: r["rejection"] for r in rejected.collect()}
    assert "missing key 'name'" in reasons[2.0]
    assert "length" in reasons[3.0]
    assert "length" in reasons[4.0]
    assert "invalid characters in key" in reasons[5.0]
    assert "invalid characters in value" in reasons[6.0]
    assert "reserved prefix 'atlas.'" in reasons[7.0]
    assert "too many user tags" in reasons[9.0]


def test_publish_validation_streaming_counts(spark, stream_dirs):
    """Streaming ingest drops invalid datapoints and counts them by
    reason (PublishApi failure accounting)."""
    import pandas as pd

    from atlas_spark.streaming.validation import validate_publish

    d_in, d_ck = stream_dirs
    pdf = pd.DataFrame(
        {
            "tags": [
                {"name": "ok.metric", "app": "www"},
                {"app": "www"},
                {"name": "ok.metric", "bad key": "v"},
                {"name": "ok.metric2"},
            ],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(d_in)
    stream = spark.readStream.schema("tags map<string,string>, value double").parquet(d_in)
    valid, rejected = validate_publish(stream)
    got_valid, got_counts = [], {}

    def sink_valid(b, _):
        got_valid.extend(b.collect())

    def sink_rejected(b, _):
        for r in b.groupBy("rejection").count().collect():
            got_counts[r["rejection"]] = got_counts.get(r["rejection"], 0) + r["count"]

    q1 = valid.writeStream.outputMode("append").foreachBatch(sink_valid).start()
    q2 = rejected.writeStream.outputMode("append").foreachBatch(sink_rejected).start()
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()
    assert sorted(r["value"] for r in got_valid) == [1.0, 4.0]
    assert sum(got_counts.values()) == 2
    assert any("missing key" in k for k in got_counts)
    assert any("invalid characters" in k for k in got_counts)


def test_counter_to_rate_batch(spark):
    rows = [("s1", 0, 0.0), ("s1", 60, 120.0), ("s1", 120, 300.0), ("s1", 180, 100.0)]
    df = spark.createDataFrame(rows, "series string, t long, value double")
    out = {
        r["t"]: r["value"]
        for r in counter_to_rate_batch(df, ["series"]).collect()
    }
    assert out == {60: 2.0, 120: 3.0, 180: 0.0}  # reset clamps to 0


def test_gauge_dedup_batch(spark):
    rows = [("g", 30, 5.0), ("g", 45, 9.0), ("g", 70, 2.0)]
    df = spark.createDataFrame(rows, "series string, t long, value double")
    out = {r["t"]: r["value"] for r in gauge_dedup_batch(df, ["series"], 60).collect()}
    assert out == {0: 9.0, 60: 2.0}


def test_counter_to_rate_stream(spark, stream_dirs):
    """State carries across micro-batches: delta across the chunk boundary
    is computed from the last value of the previous chunk."""
    import pandas as pd

    from atlas_spark.streaming.norm import counter_to_rate_stream

    d_in, d_ck = stream_dirs
    c1 = pd.DataFrame({"series": ["s"] * 3, "t": [0, 60, 120], "value": [0.0, 60.0, 180.0]})
    c2 = pd.DataFrame({"series": ["s"] * 2, "t": [180, 240], "value": [300.0, 240.0]})

    stream = (
        spark.readStream.schema("series string, t long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d_in)
    )
    rates = counter_to_rate_stream(stream)
    collected = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    spark.createDataFrame(c1).coalesce(1).write.mode("append").parquet(d_in)
    q = (
        rates.writeStream.outputMode("append")
        .option("checkpointLocation", d_ck)
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(c2).coalesce(1).write.mode("append").parquet(d_in)
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["t"]: r["value"] for r in collected}
    # 180: (300-180)/60 = 2.0 uses state from chunk 1; 240: reset -> 0
    assert out == {60: 1.0, 120: 2.0, 180: 2.0, 240: 0.0}


def test_decode_publish_payloads(spark):
    """Wire decode: common tags merged (metric wins), legacy start/values
    accepted, then the validation split drops the bad datapoint."""
    import json

    from atlas_spark.streaming.norm import decode_publish_payloads
    from atlas_spark.streaming.validation import validate_publish

    payloads = [
        json.dumps(
            {
                "tags": {"app": "www", "name": "common"},
                "metrics": [
                    {"tags": {"name": "cpu"}, "timestamp": 1000, "value": 1.5},
                    {"tags": {"name": "mem"}, "start": 2000, "values": 2.5},
                ],
            }
        ),
        json.dumps(
            {
                "metrics": [
                    # no name tag -> rejected by HasKeyRule
                    {"tags": {"app": "db"}, "timestamp": 3000, "value": 3.0},
                ]
            }
        ),
    ]
    df = spark.createDataFrame([(p,) for p in payloads], ["payload"])
    rows = decode_publish_payloads(df).collect()
    assert len(rows) == 3
    by_name = {r["tags"].get("name"): r for r in rows}
    assert by_name["cpu"]["tags"] == {"app": "www", "name": "cpu"}  # metric wins
    assert by_name["cpu"]["timestamp"] == 1000 and by_name["cpu"]["value"] == 1.5
    assert by_name["mem"]["timestamp"] == 2000 and by_name["mem"]["value"] == 2.5

    valid, rejected = validate_publish(decode_publish_payloads(df))
    assert valid.count() == 2
    rej = rejected.collect()
    assert len(rej) == 1 and "name" in rej[0]["rejection"]


def test_stateless_complex_no_driver_buffer(spark, stream_dirs):
    """:percentiles decomposes to the state store (spooled bucket
    collapse + closed-form crossing search) — no pandas buffer — and
    matches batch evaluation per finalized interval."""
    import pandas as pd
    import pyspark.sql.functions as F

    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext
    from atlas_spark.sources.datapoints import DatapointSource
    from atlas_spark.stacklang.vocab import parse as parse_asl
    from atlas_spark.streaming.evaluator import StreamingEvaluator

    d_in, _ = stream_dirs
    asl = ":true,(,50,90,),:percentiles"
    step = 60
    base = 1704067200
    rows = []
    # percentile-bucket count series: two buckets per interval
    for h in range(6):
        for bucket, cnt in (("D0010", 5.0 + h), ("D0020", 2.0 + h)):
            rows.append(
                {
                    "k_name": "req",
                    "k_percentile": bucket,
                    "ts": pd.Timestamp(base + h * step + 1, unit="s"),
                    "value": cnt,
                }
            )
    pdf = pd.DataFrame(rows)
    chunks = [pdf.iloc[:6], pdf.iloc[6:]]

    sev = StreamingEvaluator(
        spark, asl, step, {"name": "k_name", "percentile": "k_percentile"}, num_buffers=2
    )
    assert sev.state_plan is not None and sev.state_plan.core[0] == "pct"
    stream = (
        spark.readStream.schema("k_name string, k_percentile string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d_in)
    )
    spark.createDataFrame(chunks[0]).coalesce(1).write.mode("append").parquet(d_in)
    q = sev.start(stream)
    try:
        q.processAllAvailable()
        spark.createDataFrame(chunks[1]).coalesce(1).write.mode("append").parquet(d_in)
        q.processAllAvailable()
    finally:
        q.stop()
    assert sev._buffer is None  # pandas buffer never touched

    dp = spark.createDataFrame(pdf).select(
        "k_name",
        "k_percentile",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts") % step).cast("long").alias("t"),
        "value",
    )
    src = DatapointSource(
        df=dp, step=step,
        colmap={"name": "k_name", "percentile": "k_percentile"}, sql_cte="",
    )
    ctx = EvalContext(base, base + 6 * step, step)
    rf = Evaluator(src, ctx).eval(parse_asl(asl, step=step)[0])
    kc = rf.key_cols
    truth = {(tuple(r[c] for c in kc), r["t"]): r["value"] for r in rf.df.collect()}

    got = {}
    for r in sev.results:
        key = tuple(r[k] for k in rf.keys or ())
        got[(key, r["t"])] = r["value"]
    assert got, "no streaming results"
    for key, v in got.items():
        assert key in truth, key
        assert v is not None and abs(v - truth[key]) < 1e-9, (key, v, truth[key])


def test_publish_to_bronze_sink(spark, tmp_path):
    """End-to-end publish path: JSON payload stream -> decode -> validate
    -> ONE (status, date)-partitioned parquet bronze table.  Asserts the
    partition directories exist (partition pruning surface), step
    alignment of t, exactly-once row counts across two micro-batches,
    and that invalid payloads land under status=rejected with a reason."""
    import json
    import os

    from atlas_spark.streaming.sink import publish_to_bronze

    d_in = tmp_path / "in"
    d_out = tmp_path / "bronze"
    d_ck = tmp_path / "ck"
    d_in.mkdir()

    def payload(name, ts_ms, value, extra_tags=None):
        tags = {"name": name, "app": "www"}
        tags.update(extra_tags or {})
        return json.dumps(
            {"tags": {"node": "i-1"}, "metrics": [{"tags": tags, "timestamp": ts_ms, "value": value}]}
        )

    day0 = 1700000000 // 86400 * 86400  # UTC midnight
    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                payload("cpu", (day0 + 30) * 1000, 1.0),
                payload("cpu", (day0 + 86400 + 75) * 1000, 2.0),
                # invalid: empty-name rule -> rejects
                payload("", (day0 + 30) * 1000, 9.0),
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    q_data = publish_to_bronze(stream, str(d_out), str(d_ck), step=60)
    q_data.processAllAvailable()

    (d_in / "c2.txt").write_text(payload("disk", (day0 + 119) * 1000, 3.0))
    q_data.processAllAvailable()
    q_data.stop()

    bronze = spark.read.parquet(str(d_out / "data")).filter("status = 'ok'")
    rows = {(r["name"], r["t"], r["value"]) for r in bronze.collect()}
    assert rows == {
        ("cpu", day0, 1.0),
        ("cpu", day0 + 86400 + 60, 2.0),
        ("disk", day0 + 60, 3.0),
    }
    # status/date partition directories on disk (the pruning surface)
    statuses = {p for p in os.listdir(d_out / "data") if p.startswith("status=")}
    assert statuses == {"status=ok", "status=rejected"}, statuses
    parts = {p for p in os.listdir(d_out / "data" / "status=ok") if p.startswith("date=")}
    assert len(parts) == 2, parts
    rej = spark.read.parquet(str(d_out / "data")).filter("status = 'rejected'").collect()
    assert len(rej) == 1 and rej[0]["rejection"] is not None


def test_bronze_roundtrip_asl_query(spark, tmp_path):
    """Full publish->store->query loop: payloads stream into the bronze
    table, then an ASL query evaluates over `bronze_datapoints` and
    returns the step-aligned sums — and the ranged scan's physical plan
    carries both the date partition filter and the t pushdown."""
    import json

    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext
    from atlas_spark.stacklang.vocab import parse as parse_asl
    from atlas_spark.streaming.sink import bronze_datapoints, publish_to_bronze

    d_in = tmp_path / "in"
    d_in.mkdir()
    day0 = 1700000000 // 86400 * 86400
    step = 60

    def payload(name, ts_s, value):
        return json.dumps(
            {"metrics": [{"tags": {"name": name, "app": "www"}, "timestamp": ts_s * 1000, "value": value}]}
        )

    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                payload("cpu", day0 + 10, 1.0),
                payload("cpu", day0 + 20, 2.0),  # same cell -> sums to 3.0
                payload("cpu", day0 + 70, 5.0),
                payload("disk", day0 + 10, 9.0),  # filtered out by :eq
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    q1 = publish_to_bronze(stream, str(tmp_path / "b"), str(tmp_path / "ck"), step=step)
    q1.processAllAvailable()
    q1.stop()

    src = bronze_datapoints(spark, str(tmp_path / "b"), step=step)
    ctx = EvalContext(day0, day0 + 2 * step, step)
    rf = Evaluator(src, ctx).eval(parse_asl("name,cpu,:eq,:sum", step=step)[0])
    vals = {int(r["t"]): r["value"] for r in rf.df.collect()}
    assert vals == {day0: 3.0, day0 + step: 5.0}
    plan = src.ranged_df(day0, day0 + 2 * step)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "date" in plan, plan


def test_silver_rollup_matches_batch(spark, tmp_path):
    """Continuous bronze->silver maintenance: the streamed, watermarked
    step rollup of the bronze table equals the batch groupBy over the
    same rows, cells appear only once (append-mode finalization), and
    the silver table is date-partitioned on disk."""
    import json
    import os

    from atlas_spark.streaming.rollup import start_silver_rollup
    from atlas_spark.streaming.sink import publish_to_bronze

    d_in = tmp_path / "in"
    d_in.mkdir()
    day0 = 1700000000 // 86400 * 86400

    def payload(name, ts_s, value):
        return json.dumps(
            {"metrics": [{"tags": {"name": name, "app": "www"}, "timestamp": ts_s * 1000, "value": value}]}
        )

    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                payload("cpu", day0 + 10, 1.0),
                payload("cpu", day0 + 20, 2.0),
                payload("cpu", day0 + 70, 5.0),
                payload("disk", day0 + 86400 + 10, 7.0),
                # watermark pusher: far-future row finalizes everything above
                payload("cpu", day0 + 7 * 86400, 0.5),
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    qb = publish_to_bronze(stream, str(tmp_path / "b"), str(tmp_path / "ckb"), step=60)
    qb.processAllAvailable()
    qb.stop()

    qs = start_silver_rollup(
        spark, str(tmp_path / "b"), str(tmp_path / "silver"), str(tmp_path / "cks"), step=60
    )
    qs.processAllAvailable()
    qs.stop()

    silver = spark.read.parquet(str(tmp_path / "silver"))
    got = {(r["k_name"], r["t"], r["value"]) for r in silver.collect()}
    # the far-future pusher cell itself is NOT finalized (nothing after it)
    assert got == {
        ("cpu", day0, 3.0),
        ("cpu", day0 + 60, 5.0),
        ("disk", day0 + 86400, 7.0),
    }, got
    parts = {p for p in os.listdir(tmp_path / "silver") if p.startswith("date=")}
    assert len(parts) == 2, parts


def test_publish_wire_formats_land_identically(spark, tmp_path):
    """The three publish wire codecs (JSON object, Smile binary, compact
    string-table batch — PublishPayloads.scala, CustomDirectives.scala:
    74-108) land byte-identical bronze rows through the same validation
    chain, rejects-with-reason preserved."""
    import json

    from atlas_spark.streaming.sink import publish_to_bronze
    from atlas_spark.streaming.smile import smile_encode

    day0 = 1700000000 // 86400 * 86400
    doc = {
        "tags": {"app": "www"},
        "metrics": [
            {"tags": {"name": "cpu"}, "timestamp": (day0 + 10) * 1000, "value": 1.5},
            {"tags": {"name": "disk", "id": "xvda"}, "timestamp": (day0 + 70) * 1000, "value": 7.0},
            # reject: reserved atlas.* key that is not an allowed suffix
            {"tags": {"name": "bad", "atlas.nope": "x"}, "timestamp": (day0 + 10) * 1000, "value": 1.0},
        ],
    }
    # compact batch carries the merged tag maps (the common-tag merge is
    # a JSON/Smile payload feature; compact is already flattened)
    from atlas_spark.streaming.norm import encode_compact_batch

    merged = [
        ({**doc["tags"], **m["tags"]}, m["timestamp"], m["value"])
        for m in doc["metrics"]
    ]

    results = {}
    for fmt in ("json", "smile", "compact"):
        d_in = tmp_path / f"in_{fmt}"
        d_in.mkdir()
        if fmt == "json":
            (d_in / "c.txt").write_text(json.dumps(doc))
            stream = (
                spark.readStream.schema("value string")
                .text(str(d_in))
                .withColumnRenamed("value", "payload")
            )
        elif fmt == "compact":
            (d_in / "c.txt").write_text(encode_compact_batch(merged))
            stream = (
                spark.readStream.schema("value string")
                .text(str(d_in))
                .withColumnRenamed("value", "payload")
            )
        else:
            # binary payloads: parquet-carried bytes column (the transport
            # for non-text wire formats)
            spark.createDataFrame(
                [(bytearray(smile_encode(doc)),)], "payload binary"
            ).write.parquet(str(d_in / "p"))
            stream = spark.readStream.schema("payload binary").parquet(str(d_in / "p"))
        q = publish_to_bronze(
            stream, str(tmp_path / f"b_{fmt}"), str(tmp_path / f"ck_{fmt}"), step=60, fmt=fmt
        )
        q.processAllAvailable()
        q.stop()
        rows = spark.read.parquet(f"{tmp_path}/b_{fmt}/data").collect()
        results[fmt] = {
            (
                r["status"],
                r["name"],
                r["t"],
                r["value"],
                tuple(sorted(r["tags"].items())),
                r["rejection"],
            )
            for r in rows
        }

    assert results["json"] == results["smile"] == results["compact"], results
    statuses = {s for s, *_ in results["json"]}
    assert statuses == {"ok", "rejected"}
    rej = [x for x in results["json"] if x[0] == "rejected"]
    assert len(rej) == 1 and "atlas." in rej[0][5]


def test_silver_rollup_gauge_aware(spark, tmp_path):
    """Mixed-type publishes: gauge-tagged series (atlas.dstype=gauge)
    roll up by MAX per cell, untyped/rate series by SUM
    (DsType.scala:22-31, AggrDatapoint.scala:195-222) — and querying the
    silver table per type through the Evaluator applies the matching
    `avg` consolidation denominator (TimeSeq.scala:203-210)."""
    import json

    from atlas_spark.streaming.rollup import silver_datapoints, start_silver_rollup
    from atlas_spark.streaming.sink import publish_to_bronze

    d_in = tmp_path / "in"
    d_in.mkdir()
    day0 = 1700000000 // 86400 * 86400

    def payload(name, ts_s, value, dstype=None):
        tags = {"name": name, "app": "www"}
        if dstype:
            tags["atlas.dstype"] = dstype
        return json.dumps(
            {"metrics": [{"tags": tags, "timestamp": ts_s * 1000, "value": value}]}
        )

    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                # gauge: two publishes in one cell keep the max
                payload("temp", day0 + 10, 40.0, "gauge"),
                payload("temp", day0 + 20, 90.0, "gauge"),
                # rate (untyped): two publishes in one cell add
                payload("reqs", day0 + 10, 1.0),
                payload("reqs", day0 + 20, 2.0),
                # watermark pusher
                payload("reqs", day0 + 7 * 86400, 0.5),
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    qb = publish_to_bronze(stream, str(tmp_path / "b"), str(tmp_path / "ckb"), step=60)
    qb.processAllAvailable()
    qb.stop()
    qs = start_silver_rollup(
        spark, str(tmp_path / "b"), str(tmp_path / "silver"), str(tmp_path / "cks"), step=60
    )
    qs.processAllAvailable()
    qs.stop()

    silver = spark.read.parquet(str(tmp_path / "silver"))
    got = {(r["k_name"], r["ds_type"], r["t"], r["value"]) for r in silver.collect()}
    assert got == {
        ("temp", "gauge", day0, 90.0),
        ("reqs", "rate", day0, 3.0),
    }, got

    # publish -> silver -> ASL loop: `:consolidate cf-avg` over a 4-cell
    # window holding ONE sample divides by 1 for the gauge (90, no false
    # drop), by 4 for the rate (0.75)
    import pyspark.sql.functions as F

    from atlas_spark.model import expr as E
    from atlas_spark.model import query as Q
    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext

    ctx = EvalContext(day0, day0 + 4 * 60, 60)

    def consolidated(name, ds):
        src = silver_datapoints(spark, str(tmp_path / "silver"), ds_type=ds)
        by = E.GroupByExpr(
            Q.EqualQuery("name", name),
            E.AggrExpr(Q.EqualQuery("name", name), "max"),
            ("name",),
        )
        rf = Evaluator(src, ctx).eval(E.ConsolidateExpr(by, "avg", 4))
        rows = rf.df.filter(F.col("value").isNotNull()).collect()
        assert len(rows) == 1
        return rows[0]["value"]

    assert consolidated("temp", "gauge") == 90.0
    assert consolidated("reqs", "rate") == 3.0 / 4


def test_dedup_stream_drops_transport_duplicates(spark, tmp_path):
    """At-least-once transport dedup: replayed rows (same key + ts inside
    the watermark horizon) are emitted exactly once."""
    import shutil

    from atlas_spark.streaming.rollup import dedup_stream

    d_in = tmp_path / "in"
    d_in.mkdir()
    rows1 = "\n".join(["1,100,a", "1,100,a", "2,100,b"])
    rows2 = "\n".join(["1,100,a", "3,200,c"])  # replay of (1,100) + new
    (d_in / "c1.csv").write_text(rows1)

    stream = (
        spark.readStream.schema("event_id long, sec long, v string")
        .csv(str(d_in))
        .withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).timestamp_seconds("sec"))
    )
    out = dedup_stream(stream, keys=("event_id",), ts_col="ts", late=3600)
    sink_rows = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, _: sink_rows.extend((r["event_id"], r["v"]) for r in df.collect()))
        .start()
    )
    q.processAllAvailable()
    (d_in / "c2.csv").write_text(rows2)
    q.processAllAvailable()
    q.stop()
    assert sorted(sink_rows) == [(1, "a"), (2, "b"), (3, "c")], sink_rows


def test_silver_datapoints_zero_rollup_query(spark, tmp_path):
    """ASL evaluation over the silver table returns the same values as
    the bronze-sourced evaluation, and the silver ranged scan contains NO
    aggregate below the expression plan (the rollup is already stored)."""
    import json

    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext
    from atlas_spark.stacklang.vocab import parse as parse_asl
    from atlas_spark.streaming.rollup import silver_datapoints, start_silver_rollup
    from atlas_spark.streaming.sink import bronze_datapoints, publish_to_bronze

    d_in = tmp_path / "in"
    d_in.mkdir()
    day0 = 1700000000 // 86400 * 86400

    def payload(name, ts_s, value):
        return json.dumps(
            {"metrics": [{"tags": {"name": name, "app": "www"}, "timestamp": ts_s * 1000, "value": value}]}
        )

    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                payload("cpu", day0 + 10, 1.0),
                payload("cpu", day0 + 20, 2.0),
                payload("cpu", day0 + 70, 5.0),
                payload("cpu", day0 + 7 * 86400, 0.5),  # watermark pusher
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    qb = publish_to_bronze(stream, str(tmp_path / "b"), str(tmp_path / "ckb"), step=60)
    qb.processAllAvailable()
    qb.stop()
    qs = start_silver_rollup(
        spark, str(tmp_path / "b"), str(tmp_path / "silver"), str(tmp_path / "cks"), step=60
    )
    qs.processAllAvailable()
    qs.stop()

    expr = parse_asl("name,cpu,:eq,:sum", step=60)[0]
    ctx = EvalContext(day0, day0 + 120, 60)
    silver_src = silver_datapoints(spark, str(tmp_path / "silver"), step=60)
    bronze_src = bronze_datapoints(spark, str(tmp_path / "b"), step=60)
    sv = {int(r["t"]): r["value"] for r in Evaluator(silver_src, ctx).eval(expr).df.collect()}
    bv = {int(r["t"]): r["value"] for r in Evaluator(bronze_src, ctx).eval(expr).df.collect()}
    assert sv == bv == {day0: 3.0, day0 + 60: 5.0}


def test_bronze_rejects_shapeless_payloads(spark, tmp_path):
    """Payloads that fail to decode, carry no metrics, or lack
    timestamp/value must land under status=rejected with a reason —
    never in status=ok with a null t, and never silently vanish."""
    import json

    from atlas_spark.streaming.sink import publish_to_bronze

    d_in = tmp_path / "in"
    d_in.mkdir()
    day0 = 1700000000 // 86400 * 86400
    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                "this is not json",
                json.dumps({"metrics": []}),
                json.dumps({"metrics": [{"tags": {"name": "cpu", "app": "www"}}]}),
                json.dumps({"metrics": [{"tags": {"name": "cpu", "app": "www"},
                                         "timestamp": (day0 + 30) * 1000, "value": 1.0}]}),
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    q = publish_to_bronze(stream, str(tmp_path / "b"), str(tmp_path / "ck"), step=60)
    q.processAllAvailable()
    q.stop()
    tbl = spark.read.parquet(str(tmp_path / "b" / "data"))
    ok = tbl.filter("status = 'ok'").collect()
    rej = {r["rejection"] for r in tbl.filter("status = 'rejected'").collect()}
    assert len(ok) == 1 and ok[0]["t"] == day0
    assert rej == {"undecodable or empty payload", "missing timestamp or value"}, rej
    assert tbl.count() == 4  # nothing vanished


def test_publish_eval_stream_live_asl(spark, tmp_path):
    """lwcapi end-to-end over raw publish payloads: decode + validate +
    streaming ASL evaluation in one DAG; finalized values equal the
    step-cell sums of the valid payloads (invalid ones dropped)."""
    import json

    from atlas_spark.streaming.sink import publish_eval_stream

    d_in = tmp_path / "in"
    d_in.mkdir()
    day0 = 1700000000 // 86400 * 86400

    def payload(name, ts_s, value):
        return json.dumps(
            {"metrics": [{"tags": {"name": name, "app": "www"}, "timestamp": ts_s * 1000, "value": value}]}
        )

    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                payload("cpu", day0 + 10, 1.0),
                payload("cpu", day0 + 20, 2.0),
                payload("disk", day0 + 30, 9.0),  # filtered by :eq
                '{"metrics": [{"tags": {"app": "www"}, "timestamp": 1, "value": 5}]}',  # invalid
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    sev, q = publish_eval_stream(stream, "name,cpu,:eq,:sum", step=60)
    try:
        q.processAllAvailable()
        # watermark pusher finalizes the first cell
        (d_in / "c2.txt").write_text(payload("cpu", day0 + 600, 0.5))
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["t"], r["value"]) for r in sev.results}
    assert (day0, 3.0) in got, sev.results


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Native session-window streaming sessionization emits exactly the
    batch sessionize rows (same strict-gap boundary semantics, same
    duration) once the watermark closes the sessions."""
    import pandas as pd

    from atlas_spark.operators.text import sessionize
    from atlas_spark.streaming.rollup import sessionize_stream

    base = 1704067200
    rows = [
        # user 1: 3 events in one session (incl. one at EXACTLY the gap),
        # then a 4th beyond the gap -> second session
        (1, 1, base + 0, 1.0),
        (1, 2, base + 1800, 2.0),
        (1, 3, base + 1900, 3.0),
        (1, 4, base + 1900 + 1801, 4.0),
        # user 2: single event
        (2, 5, base + 60, 7.0),
        # watermark pusher far in the future
        (3, 6, base + 10 * 86400, 0.0),
    ]
    pdf = pd.DataFrame(
        {
            "event_id": [r[1] for r in rows],
            "ts": [pd.Timestamp(r[2], unit="s") for r in rows],
            "user_id": [r[0] for r in rows],
            "event_type": ["click"] * len(rows),
            "value": [r[3] for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    spark.createDataFrame(pdf).coalesce(1).write.parquet(str(sf_dir / "events.parquet"))

    batch = {
        (r["user_id"], r["session_start"], r["n_events"], r["value_sum"], r["duration_s"])
        for r in sessionize(spark, str(sf_dir)).collect()
    }

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .parquet(str(sf_dir / "events.parquet"))
    )
    out = sessionize_stream(stream.select("user_id", "event_id", "ts", "value"))
    got = []
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(lambda df, _: got.extend(tuple(r) for r in df.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # every finalized streamed session equals its batch twin (the pusher's
    # own session stays open and is absent)
    streamed = set(got)
    finalized_batch = {b for b in batch if b[0] != 3}
    assert streamed == finalized_batch, (streamed, finalized_batch)


def test_dedup_exact_stream_matches_batch(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the
    content hash) passes each distinct text's first arrival and drops
    re-arrivals ACROSS microbatches; with arrival order == doc_id order
    the survivors equal the batch dedup_exact keep_ids."""
    import pandas as pd

    from atlas_spark.operators.dedup import dedup_exact
    from atlas_spark.streaming.rollup import dedup_exact_stream

    base = 1704067200
    # chunk 1: docs 0-3 (one internal duplicate); chunk 2: docs 4-6
    # (4 and 5 duplicate texts from chunk 1 -> cross-microbatch drops)
    c1 = [(0, "alpha beta"), (1, "gamma"), (2, "alpha beta"), (3, "delta")]
    c2 = [(4, "gamma"), (5, "delta"), (6, "epsilon")]

    def pdf(rows, t0):
        return pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "ts": [pd.Timestamp(t0 + i, unit="s") for i, _ in enumerate(rows)],
            }
        )

    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf(c1, base)).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(pdf(c2, base + 100)).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got = []
    q = (
        dedup_exact_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _: got.extend((r["h"], r["doc_id"]) for r in df.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # batch truth over the same rows (documents.parquet layout)
    sf = tmp_path / "sf"
    sf.mkdir()
    all_rows = [(i, t, "en", "s", 0) for i, t in c1 + c2]
    spark.createDataFrame(
        all_rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(sf / "documents.parquet"))
    batch = {(r["h"], r["keep_id"]) for r in dedup_exact(spark, str(sf)).collect()}

    assert set(got) == batch, (sorted(got), sorted(batch))
    assert len(got) == 4  # alpha-beta, gamma, delta, epsilon


def test_minhash_candidate_stream_matches_batch(spark, tmp_path):
    """Continuous LSH candidates: the watermark-bounded per-interval
    bucket aggregation over per-row band signatures emits exactly the
    batch banding's candidate pairs when all docs arrive within the
    interval — including pairs that span microbatches.  A far-future
    sentinel document (disjoint vocabulary, so it shares no bucket)
    advances the watermark past the interval end so the append-mode
    aggregation flushes; a live pipeline gets this for free from the
    next interval's arrivals."""
    import random

    import pandas as pd

    from atlas_spark.operators.dedup import (
        _band_candidates,
        minhash_bands_map,
        minhash_candidate_stream,
    )

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(300)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(40))) for i in range(40)]
    # plant near-dups, half inside chunk 2 so candidate pairs cross batches
    for j in range(8):
        words = docs[j * 3][1].split(" ")
        words[rng.randrange(len(words))] = rng.choice(vocab)
        docs.append((100 + j, " ".join(words)))

    base = 1704067200

    def pdf(rows, t0):
        return pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "ts": [pd.Timestamp(t0 + i, unit="s") for i in range(len(rows))],
            }
        )

    sentinel = [(9999, " ".join(f"sentinelword{i}" for i in range(40)))]

    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf(docs[:30], base)).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(pdf(docs[30:], base + 60)).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(pdf(sentinel, base + 10**6)).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got: set = set()
    q = (
        minhash_candidate_stream(stream, within="10 minutes")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _: got.update((r["id_a"], r["id_b"]) for r in df.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    batch_df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {
        tuple(r)
        for r in _band_candidates(
            minhash_bands_map(batch_df), max_bucket=None
        ).collect()
    }
    assert want, "corpus construction drifted: no candidate pairs"
    assert got == want, (sorted(got ^ want))

    # end-to-end: candidates verified by exact jaccard against the
    # landed corpus (stream-static joins) equal the batch verified set
    from atlas_spark.operators.dedup import (
        _verified_pairs,
        minhash_verified_stream,
        ngram_shingles,
    )
    import pyspark.sql.functions as F

    stream2 = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got_v: set = set()
    qv = (
        minhash_verified_stream(stream2, batch_df, threshold=0.5)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: got_v.update(
                (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
            )
        )
        .start()
    )
    qv.processAllAvailable()
    qv.stop()
    sh = ngram_shingles(batch_df, 3, hash_fn=F.xxhash64)
    want_v = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in _verified_pairs(
            sh,
            _band_candidates(minhash_bands_map(batch_df), max_bucket=None),
            0.5,
        ).select("id_a", "id_b", "jaccard").collect()
    }
    assert want_v, "corpus construction drifted: no verified pairs"
    assert got_v == want_v, sorted(got_v ^ want_v)


def test_minhash_candidate_stream_caps_hot_bucket(spark, tmp_path):
    """Planted hot bucket through the STREAMING candidate path: 25
    identical boilerplate docs share every band's bucket; with
    max_bucket=10 their C(25,2) pairs are dropped BEFORE pair
    generation, every other pair is emitted identically to the capped
    batch banding, and the companion drops stream counts the dropped
    buckets (one per band, size 25) — the streaming twin of the batch
    LSH_MAX_BUCKET guard + lsh_bucket_stats accounting."""
    import random

    import pandas as pd

    from atlas_spark.operators.dedup import (
        _band_candidates,
        minhash_bands_map,
        minhash_bucket_drops_stream,
        minhash_candidate_stream,
    )

    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(300)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(40))) for i in range(20)]
    for j in range(5):  # genuine near-dups that must survive the cap
        words = docs[j * 2][1].split(" ")
        words[rng.randrange(len(words))] = rng.choice(vocab)
        docs.append((100 + j, " ".join(words)))
    hot_text = " ".join(f"boiler{i}" for i in range(30))  # disjoint vocab
    hot = [(200 + i, hot_text) for i in range(25)]

    base = 1704067200

    def pdf(rows, t0):
        return pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "ts": [pd.Timestamp(t0 + i, unit="s") for i in range(len(rows))],
            }
        )

    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf(docs[:12] + hot[:13], base)).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    spark.createDataFrame(pdf(docs[12:] + hot[13:], base + 60)).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    sentinel = [(9999, " ".join(f"sentinelword{i}" for i in range(40)))]
    spark.createDataFrame(pdf(sentinel, base + 10**6)).coalesce(1).write.mode(
        "append"
    ).parquet(d)

    def src():
        return (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )

    got: set = set()
    q = (
        minhash_candidate_stream(src(), within="10 minutes", max_bucket=10)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _: got.update((r["id_a"], r["id_b"]) for r in df.collect()))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    batch_df = spark.createDataFrame(docs + hot, "doc_id long, text string")
    capped = {
        tuple(r)
        for r in _band_candidates(minhash_bands_map(batch_df), max_bucket=10).collect()
    }
    uncapped = {
        tuple(r)
        for r in _band_candidates(minhash_bands_map(batch_df), max_bucket=None).collect()
    }
    hot_ids = {h[0] for h in hot}
    assert capped, "corpus construction drifted: no pairs survive the cap"
    # the cap removed exactly the hot-bucket pairs (300 of them)
    assert uncapped - capped == {(a, b) for a, b in uncapped if a in hot_ids and b in hot_ids}
    assert len(uncapped - capped) == 25 * 24 // 2
    # stream == capped batch: over-cap pairs dropped, all others intact
    assert got == capped, sorted(got ^ capped)

    drops: list = []
    qd = (
        minhash_bucket_drops_stream(src(), within="10 minutes", max_bucket=10)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: drops.extend(
                (r["band"], r["bucket"], r["bucket_size"]) for r in df.collect()
            )
        )
        .start()
    )
    qd.processAllAvailable()
    qd.stop()
    # one dropped bucket per band (identical docs share every band) in
    # each of the two overlapping windows covering the arrivals (default
    # slide = within/2), each holding all 25 hot docs
    assert {b for b, _, _ in drops} == set(range(24)), drops
    assert len(drops) == 48
    assert all(sz == 25 for _, _, sz in drops), drops


def test_cascade_rollup_four_fold(spark, tmp_path):
    """Fine silver -> coarse four-fold rollup (RollupBlock parity,
    Block.scala:823-900): coarse sum/count/min/max cells equal the
    direct aggregation of fine cells, the count is the REPORTING
    fine-interval count (the gauge avg denominator), and
    `rollup_datapoints` serves each cf from the right column."""
    import json

    from atlas_spark.streaming.rollup import (
        pick_rollup_step,
        rollup_datapoints,
        start_cascade_rollup,
        start_silver_rollup,
    )
    from atlas_spark.streaming.sink import publish_to_bronze

    d_in = tmp_path / "in"
    d_in.mkdir()
    day0 = 1700000000 // 86400 * 86400

    def payload(name, ts_s, value, dstype=None):
        tags = {"name": name, "app": "www"}
        if dstype:
            tags["atlas.dstype"] = dstype
        return json.dumps(
            {"metrics": [{"tags": tags, "timestamp": ts_s * 1000, "value": value}]}
        )

    # rate series: minutes 0,1,3 of the first 5-minute cell; gauge
    # series: minutes 0,2 (gaps -> count discriminates the denominators)
    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                payload("reqs", day0 + 0 * 60 + 5, 1.0),
                payload("reqs", day0 + 1 * 60 + 5, 2.0),
                payload("reqs", day0 + 3 * 60 + 5, 4.0),
                payload("temp", day0 + 0 * 60 + 5, 50.0, "gauge"),
                payload("temp", day0 + 2 * 60 + 5, 90.0, "gauge"),
                # two pushers: the first finalizes the data cells in
                # SILVER; the second finalizes the first's own fine cell
                # so it reaches the cascade and pushes the COARSE
                # watermark past the data cells
                payload("reqs", day0 + 7 * 86400, 0.5),
                payload("reqs", day0 + 14 * 86400, 0.5),
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    qb = publish_to_bronze(stream, str(tmp_path / "b"), str(tmp_path / "ckb"), step=60)
    qb.processAllAvailable()
    qb.stop()
    qs = start_silver_rollup(
        spark, str(tmp_path / "b"), str(tmp_path / "silver"), str(tmp_path / "cks"), step=60
    )
    qs.processAllAvailable()
    qs.stop()
    qc = start_cascade_rollup(
        spark, str(tmp_path / "silver"), str(tmp_path / "coarse"), str(tmp_path / "ckc"),
        factor=5, fine_step=60,
    )
    qc.processAllAvailable()
    qc.stop()

    coarse = spark.read.parquet(str(tmp_path / "coarse"))
    cells = {
        (r["k_name"], r["t"]): (r["sum"], r["count"], r["min"], r["max"])
        for r in coarse.collect()
    }
    assert cells[("reqs", day0)] == (7.0, 3, 1.0, 4.0)
    assert cells[("temp", day0)] == (140.0, 2, 50.0, 90.0)

    # query-time leg: each cf served from its column; gauge avg uses the
    # present-interval denominator (140/2 = 70, not 140/5 = 28)
    assert pick_rollup_step([60, 300, 3600], 300) == 300
    assert pick_rollup_step([60, 300], 600) == 300
    def vals(src):
        return {
            (r["k_name"], r["value"])
            for r in src.df.filter(F.col("t") == day0).collect()
        }

    src_max = rollup_datapoints(spark, str(tmp_path / "coarse"), 300, cf="max", ds_type="gauge")
    assert vals(src_max) == {("temp", 90.0)}
    src_avg = rollup_datapoints(spark, str(tmp_path / "coarse"), 300, cf="avg", ds_type="gauge")
    assert vals(src_avg) == {("temp", 70.0)}
    src_sum = rollup_datapoints(spark, str(tmp_path / "coarse"), 300, cf="sum", ds_type="rate")
    assert vals(src_sum) == {("reqs", 7.0)}


def test_minhash_candidate_stream_slide_catches_boundary_pairs(spark, tmp_path):
    """Tumbling intervals miss a near-dup pair straddling a boundary;
    overlapping windows (duration `within`, slide s) guarantee detection
    of any pair within `within - s` of each other, and the pair dedup
    collapses the overlap duplicates."""
    import random

    import pandas as pd

    from atlas_spark.operators.dedup import minhash_candidate_stream

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(300)]
    text = " ".join(rng.choice(vocab) for _ in range(40))
    words = text.split(" ")
    words[5] = "replacementword"
    near = " ".join(words)
    base = 1704067200  # multiple of 600 -> window boundary at base+600
    rows = [(1, text, base + 599), (2, near, base + 601)]
    sentinel = [(9999, " ".join(f"sentinelword{i}" for i in range(40)), base + 10**6)]

    def pdf(rs):
        return pd.DataFrame(
            {
                "doc_id": [r[0] for r in rs],
                "text": [r[1] for r in rs],
                "ts": [pd.Timestamp(r[2], unit="s") for r in rs],
            }
        )

    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf(rows)).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(pdf(sentinel)).coalesce(1).write.mode("append").parquet(d)

    def run(slide):
        got: set = set()
        q = (
            minhash_candidate_stream(
                spark.readStream.schema("doc_id long, text string, ts timestamp")
                .option("maxFilesPerTrigger", "1")
                .parquet(d),
                within="10 minutes",
                slide=slide,
            )
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _: got.update(tuple(r) for r in df.collect()))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return got

    assert run(None) == set()  # tumbling: docs 2s apart, different intervals
    assert run("auto") == {(1, 2)}  # the DEFAULT overlap catches it, deduped once
    assert run("5 minutes") == {(1, 2)}  # explicit slide equivalent here


def test_minhash_candidate_stream_duplication_bounded(spark, tmp_path):
    """Delivery-semantics pin: EXACTLY-ONCE under the overlapping
    default — each pair is emitted only in its earliest common window
    (no cross-window dedup-state reliance), the distinct set equals the
    batch banding, and tumbling likewise emits once per detected
    pair."""
    import collections
    import random

    import pandas as pd

    from atlas_spark.operators.dedup import (
        _band_candidates,
        minhash_bands_map,
        minhash_candidate_stream,
    )

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(300)]
    base = 1704067200
    rows = []
    # near-dup pairs planted every 4 minutes across 30 minutes of event
    # time, so window closes span several micro-batches
    for j in range(8):
        text = " ".join(rng.choice(vocab) for _ in range(40))
        words = text.split(" ")
        words[3] = f"alt{j}"
        rows.append((2 * j, text, base + j * 240))
        rows.append((2 * j + 1, " ".join(words), base + j * 240 + 30))
    sentinel = [(9999, " ".join(f"sentinelword{i}" for i in range(40)), base + 10**6)]

    def pdf(rs):
        return pd.DataFrame(
            {
                "doc_id": [r[0] for r in rs],
                "text": [r[1] for r in rs],
                "ts": [pd.Timestamp(r[2], unit="s") for r in rs],
            }
        )

    d = str(tmp_path / "docs")
    for lo, hi in ((0, 6), (6, 12), (12, 16)):
        spark.createDataFrame(pdf(rows[lo:hi])).coalesce(1).write.mode(
            "append"
        ).parquet(d)
    spark.createDataFrame(pdf(sentinel)).coalesce(1).write.mode("append").parquet(d)

    def run(slide):
        got: list = []
        q = (
            minhash_candidate_stream(
                spark.readStream.schema("doc_id long, text string, ts timestamp")
                .option("maxFilesPerTrigger", "1")
                .parquet(d),
                within="10 minutes",
                slide=slide,
            )
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _: got.extend(tuple(r) for r in df.collect()))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return collections.Counter(got)

    want = {
        tuple(r)
        for r in _band_candidates(
            minhash_bands_map(spark.createDataFrame([r[:2] for r in rows],
                                                    "doc_id long, text string")),
            max_bucket=None,
        ).collect()
    }
    assert want, "corpus construction drifted: no candidate pairs"

    overlap = run("auto")
    assert set(overlap) == want, sorted(set(overlap) ^ want)
    assert all(v == 1 for v in overlap.values()), overlap  # exactly-once

    tumbling = run(None)
    # tumbling: exactly-once for every pair it detects, and it detects a
    # subset of the overlap run (boundary pairs may be missed)
    assert set(tumbling) <= want
    assert all(v == 1 for v in tumbling.values()), tumbling


def test_chunk_dedup_stream_keeper_semantics(spark, tmp_path):
    """Streaming chunk dedup passes each distinct chunk's FIRST arrival
    and drops re-arrivals across microbatches: a boilerplate chunk
    recurring in a later file survives only from the earlier document,
    and the surviving hash set equals the batch keeper set."""
    import pandas as pd

    from atlas_spark.streaming.rollup import chunk_dedup_stream

    base = 1704067200
    boiler = " ".join(f"b{i}" for i in range(10))  # one full 10-word chunk
    uniq1 = " ".join(f"u{i}" for i in range(10))
    uniq2 = " ".join(f"v{i}" for i in range(10))
    # doc 0: boiler + uniq1 (2 chunks); doc 1 (later file): boiler + uniq2
    c1 = [(0, f"{boiler} {uniq1}")]
    c2 = [(1, f"{boiler} {uniq2}")]

    def pdf(rows, t0):
        return pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "ts": [pd.Timestamp(t0 + i, unit="s") for i, _ in enumerate(rows)],
            }
        )

    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf(c1, base)).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(pdf(c2, base + 100)).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    got = []
    q = (
        chunk_dedup_stream(stream)
        .writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: got.extend(
                (r["ch"], r["doc_id"], r["chunk_idx"]) for r in df.collect()
            )
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # 3 distinct chunks survive; the boilerplate chunk's keeper is doc 0
    # (first arrival), so doc 1 contributes only its unique chunk
    assert len(got) == 3
    by_doc = {}
    for ch, doc, idx in got:
        by_doc.setdefault(doc, []).append(idx)
    assert sorted(by_doc[0]) == [1, 2]
    assert by_doc[1] == [2]


# --------------------------------------------- state-store provider selection


def test_state_store_provider_recommendations():
    """Each streaming twin requests the provider the r14 back-to-back A/B
    recommends (rollup.py module docstring + PERF.md provider table):
    RocksDB for content-scaled state (banded candidates / sliding grams),
    the default HDFS-backed provider for key-cardinality state."""
    from atlas_spark.streaming.rollup import (
        HDFS_PROVIDER,
        ROCKSDB_PROVIDER,
        recommended_state_store,
    )

    for twin in (
        "minhash_candidate_stream",
        "minhash_verified_stream",
        "span_dedup_stream",
        "stateful_tws",  # Spark 4 API mandate, not a sizing call
    ):
        assert recommended_state_store(twin) == ROCKSDB_PROVIDER, twin
    for twin in (
        "dedup_exact_stream",
        "chunk_dedup_stream",
        "subscription_evaluator",
        "silver_rollup",
    ):
        assert recommended_state_store(twin) == HDFS_PROVIDER, twin


def test_apply_state_store_override(spark, monkeypatch):
    """ATLAS_STATE_STORE env / spark.atlas.stateStore.provider conf pin
    one provider for every twin (the A/B protocol); 'auto' or unset
    falls through to the per-regime recommendation."""
    from atlas_spark.streaming.rollup import (
        HDFS_PROVIDER,
        ROCKSDB_PROVIDER,
        apply_state_store,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        monkeypatch.delenv("ATLAS_STATE_STORE", raising=False)
        assert apply_state_store(spark, "span_dedup_stream") == ROCKSDB_PROVIDER
        assert spark.conf.get(key) == ROCKSDB_PROVIDER
        assert apply_state_store(spark, "dedup_exact_stream") == HDFS_PROVIDER
        assert spark.conf.get(key) == HDFS_PROVIDER

        monkeypatch.setenv("ATLAS_STATE_STORE", "default")
        assert apply_state_store(spark, "span_dedup_stream") == HDFS_PROVIDER
        monkeypatch.setenv("ATLAS_STATE_STORE", "rocksdb")
        assert apply_state_store(spark, "dedup_exact_stream") == ROCKSDB_PROVIDER

        monkeypatch.delenv("ATLAS_STATE_STORE", raising=False)
        spark.conf.set("spark.atlas.stateStore.provider", "default")
        assert apply_state_store(spark, "span_dedup_stream") == HDFS_PROVIDER
        spark.conf.set("spark.atlas.stateStore.provider", "auto")
        assert apply_state_store(spark, "span_dedup_stream") == ROCKSDB_PROVIDER
    finally:
        spark.conf.unset("spark.atlas.stateStore.provider")
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_twin_surfaces_apply_recommended_provider(spark, sf_dir):
    """The driver-visible twin surfaces route through
    _run_stream_to_table(twin=...), which SCOPES the recommendation
    around the query start (rollup.py::scoped_state_store): the twin's
    provider is in the session conf while its query starts, and the
    previous session value is restored afterwards — no leak into later
    unrelated starts."""
    from atlas_spark.operators.dedup import (
        dedup_stream_hashes,
        span_dedup_stream_hashes,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    sentinel = "com.example.SentinelProvider"  # never a valid start value
    try:
        spark.conf.set(key, sentinel)
        assert span_dedup_stream_hashes(spark, sf_dir).count() > 0
        assert spark.conf.get(key) == sentinel  # restored, not leaked
        assert dedup_stream_hashes(spark, sf_dir).count() > 0
        assert spark.conf.get(key) == sentinel
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_scoped_state_store_concurrent_regimes(spark):
    """Two twins with different regimes started from two threads each see
    their OWN recommended provider inside the start section — the
    conf-set -> start() window is lock-serialized (rollup.py
    _START_LOCK), so the session-global conf cannot race — and the
    session value is restored once both finish."""
    import threading

    from atlas_spark.streaming.rollup import (
        HDFS_PROVIDER,
        ROCKSDB_PROVIDER,
        scoped_state_store,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    seen: dict[str, str] = {}
    errs: list[BaseException] = []

    def run(twin: str) -> None:
        try:
            with scoped_state_store(spark, twin) as cls:
                # simulate the work a .start() does while the conf must
                # hold this twin's provider
                import time

                time.sleep(0.05)
                seen[twin] = (cls, spark.conf.get(key))
        except BaseException as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    try:
        threads = [
            threading.Thread(target=run, args=("span_dedup_stream",)),
            threading.Thread(target=run, args=("dedup_exact_stream",)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, errs
        assert seen["span_dedup_stream"] == (ROCKSDB_PROVIDER, ROCKSDB_PROVIDER)
        assert seen["dedup_exact_stream"] == (HDFS_PROVIDER, HDFS_PROVIDER)
        assert spark.conf.get(key, None) == prev  # both scopes unwound
    finally:
        if prev is None:
            try:
                spark.conf.unset(key)
            except Exception:
                pass
        else:
            spark.conf.set(key, prev)
