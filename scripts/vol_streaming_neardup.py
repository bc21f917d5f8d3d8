"""Streaming near-dup intake throughput row (r11 verdict #2): 200,000
documents replayed as 10 event-time-ordered chunks (60 min of event time,
10-minute horizon -> 6 intervals) through

  1. dedup_exact_stream            (dropDuplicatesWithinWatermark on sha2)
  2. minhash_candidate_stream      (windowed capped banding + pair dedup)
  3. minhash_verified_stream       (2. + stream-static jaccard verify)

Measures docs/s per pipeline and the state-store row count per micro-batch
(stateOperators.numRowsTotal from the progress events) — the scale claim
under test is that state growth goes FLAT once the watermark horizon fills
(eviction keeps pace with intake), not that the local[32] rate itself is
the 100 TB number.  Planted rows: 1% near-dups (one word changed from the
previous doc) and 1% exact dups, so emitted pair/drop counts have known
expectations.  Run artifact for PERF.md; not a test.
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
SPAN_SEC = 3600  # event-time span of the whole replay
BASE = 1704067200
WITHIN = "10 minutes"

builder = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
)
# ATLAS_STATE_STORE=rocksdb swaps the default HDFS-backed provider for
# RocksDB — the scale-safe choice for 100TB horizons (state spills to
# local disk instead of living on the executor heap; Spark 4 requires it
# for transformWithStateInPandas).  Both providers run for the PERF.md
# comparison row.
PROVIDER = os.environ.get("ATLAS_STATE_STORE", "default").lower()
if PROVIDER == "rocksdb":
    builder = builder.config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
print(f"state store provider: {PROVIDER}", flush=True)

from atlas_spark.operators.dedup import (  # noqa: E402
    dedup_exact,  # noqa: F401  (import sanity)
    minhash_candidate_stream,
    minhash_verified_stream,
)
from atlas_spark.streaming.rollup import (  # noqa: E402
    apply_state_store,
    dedup_exact_stream,
)


def docs_frame():
    """Deterministic corpus: eff_id collapses 1% of ids onto a neighbor
    (exact dup) and another 1% onto a neighbor with the first word
    changed (near dup)."""
    ids = spark.range(N, numPartitions=32).select(F.col("id").alias("doc_id"))
    m = F.col("doc_id") % 100
    # both special cases base their words on an id whose own text is the
    # plain f(id) (m==96), so the planted pairs actually exist:
    # (id-2, id) exact and (id-3, id) near within each block of 100
    eff = F.when(m == 98, F.col("doc_id") - 2).when(m == 99, F.col("doc_id") - 3).otherwise(
        F.col("doc_id")
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.concat(F.lit("w"), F.pmod(F.hash(eff, i), F.lit(5000)).cast("string")),
    )
    # near-dup: same word sequence with the first word replaced
    text = F.when(
        m == 99, F.concat_ws(" ", F.concat(F.array(F.lit("zz")), F.slice(words, 2, 39)))
    ).otherwise(F.concat_ws(" ", words))
    ts = F.timestamp_seconds(F.lit(BASE) + (F.col("doc_id") * SPAN_SEC / N).cast("long"))
    return ids.select("doc_id", text.alias("text"), ts.alias("ts"))


stream_dir = tempfile.mkdtemp(prefix="atlas_vol_neardup_")
t0 = time.time()
docs = docs_frame().persist()
per = N // CHUNKS
for c in range(CHUNKS):
    (
        docs.filter((F.col("doc_id") >= c * per) & (F.col("doc_id") < (c + 1) * per))
        .coalesce(1)
        .write.mode("append")
        .parquet(stream_dir)
    )
# far-future sentinel (disjoint vocab) so the final interval flushes
spark.createDataFrame(
    [(N + 1, " ".join(f"sentinelword{i}" for i in range(40)))], "doc_id long, text string"
).select(
    "doc_id", "text", F.timestamp_seconds(F.lit(BASE + 10**6)).alias("ts")
).coalesce(1).write.mode("append").parquet(stream_dir)
print(f"gen: {time.time()-t0:.1f}s  ({N} docs, {CHUNKS} chunks)", flush=True)


def src():
    return (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )


def run(label, out_df, count_cols, twin=None):
    # per-regime provider selection (streaming/rollup.py r14 A/B);
    # ATLAS_STATE_STORE still pins one provider for the A/B comparison
    if twin:
        provider = apply_state_store(spark, twin)
        print(f"{label.strip()}: provider {provider.rsplit('.', 1)[-1]}", flush=True)
    emitted = [0]
    distinct: set = set()

    def sink(df, _):
        rows = df.select(*count_cols).collect()
        emitted[0] += len(rows)
        distinct.update(tuple(r) for r in rows)

    t0 = time.time()
    q = out_df.writeStream.outputMode("append").foreachBatch(sink).start()
    q.processAllAvailable()
    wall = time.time() - t0
    progress = [
        pr.asDict(True) if hasattr(pr, "asDict") else pr for pr in q.recentProgress
    ]
    state = [
        [op["numRowsTotal"] for op in p["stateOperators"]]
        for p in progress
        if p.get("stateOperators")
    ]
    # peak state-store memory across batches (stateOperators report
    # memoryUsedBytes for both providers; RocksDB additionally spills)
    peak_mem = max(
        (
            sum(op.get("memoryUsedBytes", 0) for op in p["stateOperators"])
            for p in progress
            if p.get("stateOperators")
        ),
        default=0,
    )
    q.stop()
    rate = N / wall
    print(
        f"{label}: {wall:.1f}s  {rate:,.0f} docs/s  emitted={emitted[0]} "
        f"distinct={len(distinct)}  peak_state_mem={peak_mem/1e6:.1f}MB",
        flush=True,
    )
    print(f"  state rows/batch (per stateful op): {state}", flush=True)
    totals = [sum(s) for s in state]
    # flatness is judged MID-STREAM (intake still arriving): the final
    # batches are the sentinel-driven drain, which empties state entirely
    mid = totals[len(totals) // 2 : -2]
    drained = totals[-1] < max(totals) // 100 if totals else True
    flat = bool(mid) and max(mid) < 2 * min(mid)
    print(
        f"  mid-stream state: {mid}  flat={flat}  drained_at_end={drained}",
        flush=True,
    )
    return wall


run("dedup_exact_stream    ", dedup_exact_stream(src(), within=WITHIN), ("h",),
    twin="dedup_exact_stream")
from atlas_spark.streaming.rollup import chunk_dedup_stream  # noqa: E402

run("chunk_dedup_stream    ", chunk_dedup_stream(src(), within=WITHIN), ("ch",),
    twin="chunk_dedup_stream")
run(
    "minhash_candidates    ",
    minhash_candidate_stream(src(), within=WITHIN),
    ("id_a", "id_b"),
    twin="minhash_candidate_stream",
)
# the landed corpus is a LAKE TABLE in a real intake pipeline — and the
# landed column is the SHINGLE ARRAY, not raw text: a stream-static join
# re-executes its static plan on every micro-batch, so shingling at
# landing time turns the per-batch static-side work into a parquet scan
# (r12 landed raw text and re-shingled per batch: 255 docs/s)
from atlas_spark.operators.dedup import ngram_shingles  # noqa: E402

corpus_path = stream_dir + "_corpus"
ngram_shingles(docs.select("doc_id", "text"), 3, hash_fn=F.xxhash64).write.mode(
    "overwrite"
).parquet(corpus_path)
corpus = spark.read.parquet(corpus_path)
run(
    "minhash_verified      ",
    minhash_verified_stream(src(), corpus, within=WITHIN),
    ("id_a", "id_b"),
    twin="minhash_verified_stream",
)
shutil.rmtree(corpus_path, ignore_errors=True)

docs.unpersist()
shutil.rmtree(stream_dir, ignore_errors=True)
