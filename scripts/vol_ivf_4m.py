"""Volume row: fitted-KMeans IVF index (`ivf_build_index`) at 4M x 64-dim.

The designated 1B-vector path (PERF.md round-8 cap rationale) is the
ingest-time fitted index: Spark ML KMeans assignment, inverted lists
materialized partitionBy(cell), probes that prune partitions instead of
scanning the corpus.  This measures it end to end:

  1. build: KMeans fit + assignment + partitioned write at 4M vectors
  2. probe: ivf_topk-shaped queries against the stored inverted lists
  3. prune evidence: PartitionFilters on `cell` in the probe scan, and
     rows-scanned = sum of probed-cell sizes, not the corpus

Run artifact for PERF.md; not a test (the plan pin lives in
tests/test_plans.py::test_ivf_probe_prunes_partitions).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N, DIM, CELLS, N_PROBE, K = 4_000_000, 64, 1024, 8, 10
sf_dir = "/tmp/vol_ivf_sf"
corpus = os.path.join(sf_dir, "embeddings.parquet")

if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
    t0 = time.time()
    (
        spark.range(N, numPartitions=64)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda i: (
                    (F.pmod(F.hash(F.col("id"), i), F.lit(2000)) - 1000)
                    / 1000.0
                ).cast("float"),
            ).alias("embedding"),
            F.concat(F.lit("l"), F.pmod(F.col("id"), F.lit(100))).alias("label"),
        )
        .write.mode("overwrite")
        .parquet(corpus)
    )
    print(f"gen: {time.time()-t0:.1f}s", flush=True)

from atlas_spark.operators.similarity import _ivf_index_path, ivf_build_index, ivf_topk

# force a fresh build (the function memoizes on _SUCCESS markers)
import shutil

idx = _ivf_index_path(sf_dir, CELLS)
shutil.rmtree(idx, ignore_errors=True)

t0 = time.time()
path = ivf_build_index(spark, sf_dir, n_cells=CELLS)
build_s = time.time() - t0
print(f"build: {build_s:.1f}s ({N/build_s:.0f} vec/s ingest)", flush=True)

assigned = spark.read.parquet(os.path.join(path, "assignments"))
n_cells_actual = assigned.select("cell").distinct().count()
print(f"cells materialized: {n_cells_actual}", flush=True)

# probe latency: min/median over repeated probes at distinct query ids
lat = []
for qid in (0, 123_457, 999_999, 2_000_003, 3_999_991):
    t0 = time.time()
    rows = ivf_topk(spark, sf_dir, query_id=qid, k=K, n_cells=CELLS, n_probe=N_PROBE).collect()
    lat.append(time.time() - t0)
    assert len(rows) == K, (qid, len(rows))
lat.sort()
print(
    f"probe: min={lat[0]:.2f}s median={lat[len(lat)//2]:.2f}s "
    f"(k={K}, n_probe={N_PROBE}/{CELLS} cells)",
    flush=True,
)

# prune evidence: the probe's candidate scan must carry PartitionFilters
# on cell and read only the probed cells' rows
probe_cells = list(range(N_PROBE))
cand = assigned.filter(F.col("cell").isin(probe_cells))
plan = cand._jdf.queryExecution().executedPlan().toString()
has_pf = "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
rows_scanned = cand.count()
print(f"PartitionFilters-on-cell in probe scan: {has_pf}", flush=True)
print(
    f"rows scanned for {N_PROBE} cells: {rows_scanned} "
    f"({100.0*rows_scanned/N:.2f}% of corpus; even split would be "
    f"{100.0*N_PROBE/CELLS:.2f}%)",
    flush=True,
)
assert has_pf, "probe scan does not prune partitions"
assert rows_scanned < N * 0.25, "probe scanned most of the corpus"
print("OK", flush=True)
