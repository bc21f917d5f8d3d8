"""Streaming state-store volume row: 100,000 series x 60 intervals (6M
raw rows, 3 chunks) through the FULL pipeline — watermarked finalize ->
parquet spool -> applyInPandasWithState rolling kernel.

Extends the round-6 10k-series row (PERF.md) by 10x in key cardinality,
the axis that stresses the per-group Arrow kernel invocation floor.
Values are spot-checked against the closed form; withheld tail must be
exactly (num_buffers+1) x series.  Run artifact for PERF.md; not a test.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

N_SERIES = 100_000
N_INTERVALS = 60
STEP = 60
BASE = 1704067200
WIN = 4  # rolling-sum window
NUM_BUFFERS = 2

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from atlas_spark.streaming.evaluator import StreamingEvaluator

stream_dir = tempfile.mkdtemp(prefix="atlas_vol100k_")

# value = (series % 7) + h  ->  rolling-sum(4) at h>=3 is 4*(s%7) + 4h - 6
def chunk(h_lo: int, h_hi: int):
    n = N_SERIES * (h_hi - h_lo)
    return (
        spark.range(n, numPartitions=32)
        .select(
            F.concat(F.lit("s"), (F.col("id") % N_SERIES).cast("string")).alias("k_name"),
            F.timestamp_seconds(
                F.lit(BASE) + (F.col("id") / N_SERIES + h_lo).cast("long") * STEP + 5
            ).alias("ts"),
            ((F.col("id") % N_SERIES) % 7 + (F.col("id") / N_SERIES + h_lo).cast("long")).cast(
                "double"
            ).alias("value"),
        )
    )

t0 = time.time()
bounds = [(0, 20), (20, 40), (40, 60)]
chunk_paths = []
for i, (lo, hi) in enumerate(bounds):
    p = os.path.join("/tmp", f"vol100k_chunk{i}.parquet")
    chunk(lo, hi).coalesce(1).write.mode("overwrite").parquet(p)
    chunk_paths.append(p)
print(f"gen: {time.time()-t0:.1f}s", flush=True)

asl = f":true,:sum,(,name,),:by,{WIN},:rolling-sum"
sev = StreamingEvaluator(spark, asl, STEP, {"name": "k_name"}, num_buffers=NUM_BUFFERS)
assert sev.state_plan is not None, "must take the distributed state-store path"

stream = (
    spark.readStream.schema("k_name string, ts timestamp, value double")
    .option("maxFilesPerTrigger", "1")
    .parquet(stream_dir)
)

def append_chunk(i: int):
    src = chunk_paths[i]
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), os.path.join(stream_dir, f"c{i}_{f}"))

t1 = time.time()
append_chunk(0)
q = sev.start(stream)
try:
    q.processAllAvailable()
    for i in range(1, len(bounds)):
        append_chunk(i)
        q.processAllAvailable()
    drive = time.time() - t1
finally:
    q.stop()

raw = N_SERIES * N_INTERVALS
expected = N_SERIES * (N_INTERVALS - (NUM_BUFFERS + 1))
got = len(sev.results)
print(
    f"drive: {drive:.1f}s raw={raw} finalized={got} expected={expected} "
    f"rate={raw/drive:.0f} raw-rows/s lines={got/drive:.0f} line-points/s",
    flush=True,
)
assert got == expected, (got, expected)

# closed-form spot check on 25 (series, interval) samples
import math

bad = 0
checked = 0
idx = {}
for r in sev.results:
    idx[(r["name"], r["t"])] = r["value"]
for s in range(0, N_SERIES, N_SERIES // 5):
    for h in range(3, N_INTERVALS - (NUM_BUFFERS + 1), 11):
        t = BASE + h * STEP
        want = 4 * (s % 7) + 4 * h - 6
        v = idx.get((f"s{s}", t))
        checked += 1
        if v is None or not math.isclose(v, want):
            bad += 1
            print("MISMATCH", s, h, v, want)
print(f"spot-check: {checked} sampled, {bad} bad", flush=True)
shutil.rmtree(stream_dir, ignore_errors=True)
assert bad == 0
