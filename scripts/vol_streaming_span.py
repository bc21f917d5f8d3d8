"""Span-dedup streaming twin provider A/B at 200k documents (r14
protocol): the same replay corpus as vol_streaming_neardup.py (200,000
docs of 40 words each, 10 event-time-ordered chunks over 60 min of
event time, 10-minute horizon) run through

    span_dedup_stream   (dropDuplicatesWithinWatermark on SLIDING grams)

under BOTH state-store providers BACK-TO-BACK in one session (host
state varies ~2x between sessions, so cross-session A/B is
meaningless).  Span state is ~k x the chunk twin's (one row per
distinct sliding 10-gram in the horizon — ~31 grams/doc vs ~4 chunks),
which rollup.py predicts is the RocksDB regime; this script confirms
with docs/s, per-batch state rows, and peak state memory per provider.
chunk_dedup_stream runs under both providers too, as the small-state
contrast row.  Run artifact for PERF.md; not a test.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

N = 200_000
CHUNKS = 10
SPAN_SEC = 3600
BASE = 1704067200
WITHIN = "10 minutes"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from atlas_spark.streaming.rollup import (  # noqa: E402
    HDFS_PROVIDER,
    ROCKSDB_PROVIDER,
    chunk_dedup_stream,
    span_dedup_stream,
)

# same corpus construction as vol_streaming_neardup.py: 1% exact dups,
# 1% near dups (first word changed), deterministic hash words
stream_dir = tempfile.mkdtemp(prefix="atlas_span_ab_")
t0 = time.time()
ids = spark.range(N, numPartitions=32).select(F.col("id").alias("doc_id"))
m = F.col("doc_id") % 100
eff = (
    F.when(m == 98, F.col("doc_id") - 2)
    .when(m == 99, F.col("doc_id") - 3)
    .otherwise(F.col("doc_id"))
)
words = F.transform(
    F.sequence(F.lit(1), F.lit(40)),
    lambda i: F.concat(
        F.lit("w"), F.pmod(F.hash(eff, i), F.lit(5000)).cast("string")
    ),
)
words = F.when(
    m == 99, F.concat(F.array(F.lit("changed")), F.slice(words, 2, 39))
).otherwise(words)
docs = ids.select(
    "doc_id",
    F.array_join(words, " ").alias("text"),
    F.timestamp_seconds(
        F.lit(BASE) + (F.col("doc_id") % CHUNKS) * (SPAN_SEC // CHUNKS)
    ).alias("ts"),
).persist()
for i in range(CHUNKS):
    docs.filter((F.col("doc_id") % CHUNKS) == i).coalesce(4).write.mode(
        "append"
    ).parquet(stream_dir)
# far-future sentinel advances the watermark so append state drains
spark.createDataFrame(
    [(N + 1, " ".join(f"sentinelword{i}" for i in range(40)))],
    "doc_id long, text string",
).select(
    "doc_id", "text", F.timestamp_seconds(F.lit(BASE + 10**6)).alias("ts")
).coalesce(1).write.mode("append").parquet(stream_dir)
print(f"gen: {time.time() - t0:.1f}s  ({N} docs, {CHUNKS} chunks)", flush=True)


def src():
    return (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )


def run(label, provider, make_out, count_col):
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    emitted = [0]

    def sink(df, _):
        emitted[0] += df.count()

    t0 = time.time()
    q = make_out().writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    wall = time.time() - t0
    progress = [
        pr.asDict(True) if hasattr(pr, "asDict") else pr for pr in q.recentProgress
    ]
    state = [
        sum(op["numRowsTotal"] for op in p["stateOperators"])
        for p in progress
        if p.get("stateOperators")
    ]
    peak_mem = max(
        (
            sum(op.get("memoryUsedBytes", 0) for op in p["stateOperators"])
            for p in progress
            if p.get("stateOperators")
        ),
        default=0,
    )
    q.stop()
    short = provider.rsplit(".", 1)[-1].replace("StateStoreProvider", "")
    print(
        f"{label} [{short:7s}]: {wall:.1f}s  {N / wall:,.0f} docs/s  "
        f"emitted={emitted[0]}  peak_state_rows={max(state, default=0):,}  "
        f"peak_state_mem={peak_mem / 1e6:.1f}MB",
        flush=True,
    )
    return wall


results = {}
for prov in (HDFS_PROVIDER, ROCKSDB_PROVIDER):
    results[("span", prov)] = run(
        "span_dedup_stream ", prov, lambda: span_dedup_stream(src(), within=WITHIN), "gh"
    )
for prov in (HDFS_PROVIDER, ROCKSDB_PROVIDER):
    results[("chunk", prov)] = run(
        "chunk_dedup_stream", prov, lambda: chunk_dedup_stream(src(), within=WITHIN), "ch"
    )

for twin in ("span", "chunk"):
    d, r = results[(twin, HDFS_PROVIDER)], results[(twin, ROCKSDB_PROVIDER)]
    print(f"{twin}: rocksdb/default wall ratio {r / d:.2f} (ratio<1 => rocksdb faster)", flush=True)

docs.unpersist()
shutil.rmtree(stream_dir, ignore_errors=True)
