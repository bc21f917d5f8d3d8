"""Volume row: 4M x 64-dim vectors assigned to the capped 1024 cells.

Generates a deterministic synthetic corpus (hash-derived floats) to
parquet, then times the JVM-side carrier build + argmin assignment
(`_assign_sampled_cells`) end to end.  Run artifact for PERF.md; not a
test.
"""
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

N, DIM, CELLS = 4_000_000, 64, 1024
path = "/tmp/vol_emb_4m.parquet"

import os

if not os.path.exists(path + "/_SUCCESS"):
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
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    print(f"gen: {time.time()-t0:.1f}s", flush=True)

from atlas_spark.operators.similarity import _assign_sampled_cells

emb = spark.read.parquet(path)
t0 = time.time()
assigned = _assign_sampled_cells(emb, CELLS)
res = assigned.agg(
    F.count("*").alias("n"), F.sum("cell").alias("cellsum")
).collect()[0]
dt = time.time() - t0
print(
    f"assign: {dt:.1f}s n={res['n']} cellsum={res['cellsum']} "
    f"rate={res['n']/dt:.0f} vec/s "
    f"row-cell={res['n']*CELLS/dt/1e6:.1f}M/s",
    flush=True,
)
plan = assigned._jdf.queryExecution().executedPlan().toString()
print("ExistingRDD in plan:", "ExistingRDD" in plan, flush=True)
print("plan chars:", len(plan), flush=True)

# cellsum from the round-8 Catalyst-fold run of this exact corpus — the
# Arrow kernel must reproduce it bit-identically (same IEEE op sequence)
CATALYST_CELLSUM = 2129410258
assert res["cellsum"] == CATALYST_CELLSUM, (res["cellsum"], CATALYST_CELLSUM)
print("cellsum matches catalyst-fold reference", flush=True)
