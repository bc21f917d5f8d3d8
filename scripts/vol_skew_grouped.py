"""Skew-resilience demo for the grouped binary-math family (r11 verdict
stretch #8): what happens when one group key is hot, at both skew
surfaces the share-of-total shape has.

A. RAW-ROW skew (one name carries 50% of raw rows).  The rollup-rewrite
   plan (`_eval_rollup_binary`: one scan -> partial+final agg -> window
   over AGGREGATE cells) absorbs it structurally: map-side partial
   aggregation bounds reducer input by distinct cells per mapper, and
   the window's per-(name, t) group is bounded by the name's BUCKET
   cardinality, never its raw row count.  Measured: hot vs uniform
   distribution of the same total rows, values exact (closed form).

B. CELL-SPACE skew (one name carries 1M distinct buckets, i.e. 50% of
   aggregate cells, at 1M-name cardinality so neither side broadcasts).
   The generic grouped join (forced here by sum-vs-count sides)
   sort-merge-joins two aggregates on (name, t).  FINDING: AQE skew-join
   CANNOT split this shape — the smaller side's final-aggregate exchange
   IS the join distribution (Sort over HashAggregate over the shuffle),
   and splitting it would break the aggregate — so the demo verifies the
   structural bound instead: the hot key's join-partition rows are its
   CELL count (tag-cardinality-bounded, the same bound the reference's
   per-series model imposes), never its raw row count, and values stay
   exact.

C. FACT-TO-FACT join skew (one l_orderkey carries 50% of an 8M-row
   lineitem side joining 2M orders) — the rel-family shape whose SMJ
   children ARE plain shuffles, where AQE skew-join applies: the demo
   pins `SortMergeJoin(skew=true)` / `AQEShuffleRead skewed` in the
   final adaptive plan with values exact.

Thresholds are lowered for the local corpus (the default 256 MB
skewed-partition threshold is sized for cluster shuffles, and these
synthetic columns compress ~20x); the MECHANISM is what the demo
verifies — at 100 TB the defaults trigger on the same plan.  Run
artifact for PERF.md; not a test.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

BASE = 1704067200
STEP = 3600

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    # local-scale thresholds so the 100 TB mechanism is observable here
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from atlas_spark.plans.builder import Evaluator  # noqa: E402
from atlas_spark.plans.context import EvalContext  # noqa: E402
from atlas_spark.sources.datapoints import DatapointSource  # noqa: E402
from atlas_spark.stacklang.vocab import parse as parse_asl  # noqa: E402


def run_expr(asl: str, dp, n_t: int):
    src = DatapointSource(
        df=dp, step=STEP, colmap={"name": "k_name", "bucket": "k_bucket"}, sql_cte=""
    )
    ctx = EvalContext(BASE, BASE + n_t * STEP, STEP)
    rf = Evaluator(src, ctx).eval(parse_asl(asl, step=STEP)[0])
    # run through the DataFrame's OWN QueryExecution so executedPlan()
    # afterwards is the FINAL adaptive plan (with any skew splits)
    qe = rf.df._jdf.queryExecution()
    t0 = time.perf_counter()
    qe.toRdd().count()
    wall = time.perf_counter() - t0
    return rf, wall, qe.executedPlan().toString()


# ---------------------------------------------------------------- part A
N_T, N_BUCKET, N_NAMES = 24, 200, 50
PER_CELL = 16  # rows per (name, bucket, t) cell in the uniform base
SHARE_ASL = ":true,:sum,(,name,bucket,),:by,:true,:sum,(,name,),:by,:div"


def factorial_rows(names_expr, n_groups: int, per_cell: int):
    """Exactly per_cell rows for every (name, bucket, t) cell: digits of
    the row id decompose factorially, so every share is exactly
    1/N_BUCKET regardless of a name's total row volume."""
    n = n_groups * N_BUCKET * N_T * per_cell
    ids = spark.range(n, numPartitions=32)

    def idiv(col, k):  # Column lacks //; ids are non-negative
        return (col / k).cast("long")

    return ids.select(
        names_expr(idiv(F.col("id"), N_BUCKET * N_T * per_cell)).alias("k_name"),
        F.concat(
            F.lit("b"), (idiv(F.col("id"), N_T * per_cell) % N_BUCKET).cast("string")
        ).alias("k_bucket"),
        (F.lit(BASE) + (idiv(F.col("id"), per_cell) % N_T) * STEP)
        .cast("long")
        .alias("t"),
        F.lit(1.0).alias("value"),
    )


def raw_rows(hot: bool):
    base = factorial_rows(
        lambda g: F.concat(F.lit("n"), (g % N_NAMES).cast("string")), N_NAMES, PER_CELL
    )
    if not hot:
        # same total volume as the hot variant, spread uniformly
        return base.unionByName(
            factorial_rows(
                lambda g: F.concat(F.lit("m"), (g % N_NAMES).cast("string")),
                N_NAMES,
                PER_CELL,
            )
        )
    # ONE name carrying 50% of all raw rows (50x any other name)
    return base.unionByName(
        factorial_rows(lambda g: F.lit("hot"), 1, PER_CELL * N_NAMES)
    )


print("A. raw-row skew through the rollup-rewrite share plan", flush=True)
run_expr(SHARE_ASL, raw_rows(False), N_T)  # warm up JVM/codegen
for label, hot in (("uniform", False), ("hot-50%", True)):
    dp = raw_rows(hot)
    rf, wall, plan = run_expr(SHARE_ASL, dp, N_T)
    vals = {round(r["value"], 9) for r in rf.df.select("value").distinct().collect()}
    ok = vals == {round(1.0 / N_BUCKET, 9)}
    print(
        f"  {label}: {wall:.1f}s  values-exact={ok}  "
        f"window={'Window' in plan}  smj={'SortMergeJoin' in plan}",
        flush=True,
    )

# ---------------------------------------------------------------- part B
N_T_B, N_ORD, N_HOT_BUCKETS = 4, 1_000_000, 1_000_000
JOIN_ASL = ":true,:sum,(,name,bucket,),:by,:true,:count,(,name,),:by,:div"


def cell_rows():
    """One raw row per aggregate cell: 1M ordinary names x 1 bucket, plus
    one hot name holding 1M distinct buckets (50% of all cells)."""
    ord_ids = spark.range(N_ORD * N_T_B, numPartitions=32).select(
        F.concat(F.lit("n"), (F.col("id") % N_ORD).cast("string")).alias("k_name"),
        F.lit("b0").alias("k_bucket"),
        (F.lit(BASE) + (F.col("id") / N_ORD).cast("long") * STEP).cast("long").alias("t"),
        F.lit(1.0).alias("value"),
    )
    hot_ids = spark.range(N_HOT_BUCKETS * N_T_B, numPartitions=32).select(
        F.lit("hot").alias("k_name"),
        F.concat(F.lit("b"), (F.col("id") % N_HOT_BUCKETS).cast("string")).alias(
            "k_bucket"
        ),
        (F.lit(BASE) + (F.col("id") / N_HOT_BUCKETS).cast("long") * STEP)
        .cast("long")
        .alias("t"),
        F.lit(1.0).alias("value"),
    )
    return ord_ids.unionByName(hot_ids)


print("B. cell-space skew through the generic grouped join", flush=True)
dp_b = cell_rows().persist()
dp_b.count()
rf, wall, plan = run_expr(JOIN_ASL, dp_b, N_T_B)
vals = {round(r["value"], 9) for r in rf.df.select("value").distinct().collect()}
ok = vals == {1.0, round(1.0 / N_HOT_BUCKETS, 9)}
print(
    f"  hot-50%-of-cells: {wall:.1f}s  values-exact={ok}  "
    f"smj={'SortMergeJoin' in plan}  "
    f"agg-fused-exchange={'HashAggregate' in plan and 'SortMergeJoin' in plan}  "
    f"skew-split-possible={'skew=true' in plan}",
    flush=True,
)

# the opt-in escape hatch (r12 verdict #6): salt the superset side by its
# extra key columns, replicate the subset side K ways — the hot key's
# reducer input drops from its full cell count to cells/K, values exact
spark.conf.set("spark.atlas.binary.saltPartitions", "8")
rf_s, wall_s, plan_s = run_expr(JOIN_ASL, dp_b, N_T_B)
vals_s = {round(r["value"], 9) for r in rf_s.df.select("value").distinct().collect()}
spark.conf.unset("spark.atlas.binary.saltPartitions")
# reducer-input bound: the superset side's per-join-key group size is the
# hot key's cells per salt partition — measure it with the same hash
max_group = (
    dp_b.groupBy(
        "k_name", F.pmod(F.xxhash64("k_bucket"), F.lit(8)).alias("s"), "t"
    )
    .count()
    .agg(F.max("count"))
    .first()[0]
)
print(
    f"  salted (K=8): {wall_s:.1f}s  values-exact={vals_s == vals}  "
    f"salt-in-join={'_salt' in plan_s}  "
    f"max-join-group={max_group:,} cells (vs {N_HOT_BUCKETS:,} unsalted)",
    flush=True,
)
dp_b.unpersist()

# ---------------------------------------------------------------- part C
N_LI, N_ORDERS, HOT_KEY = 8_000_000, 2_000_000, 7
print("C. fact-to-fact join skew (rel-family SMJ) with AQE skew split", flush=True)
li = spark.range(N_LI, numPartitions=32).select(
    F.when(F.col("id") % 2 == 0, F.lit(HOT_KEY))
    .otherwise(F.col("id") % N_ORDERS)
    .cast("long")
    .alias("l_orderkey"),
    (F.col("id") % 5 + 1.0).alias("l_extendedprice"),
)
orders = spark.range(N_ORDERS, numPartitions=32).select(
    F.col("id").alias("o_orderkey"),
    F.concat(F.lit("p"), (F.col("id") % 5).cast("string")).alias("o_orderpriority"),
)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the SMJ
for label, enabled in (("skewJoin OFF", "false"), ("skewJoin ON", "true")):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    qe = j._jdf.queryExecution()
    t0 = time.perf_counter()
    qe.toRdd().count()
    wall = time.perf_counter() - t0
    plan = qe.executedPlan().toString()
    rows = {(r["o_orderpriority"], r["rev"]) for r in j.collect()}
    # closed form: hot rows (even ids) all land on key 7 -> priority p2;
    # odd ids map id%N_ORDERS uniformly across priorities
    print(
        f"  {label}: {wall:.1f}s  rows={len(rows)}  "
        f"skew-split={'skew=true' in plan and 'AQEShuffleRead skewed' in plan}",
        flush=True,
    )
    if enabled == "false":
        baseline_rows = rows
    else:
        print(f"  values identical ON vs OFF: {rows == baseline_rows}", flush=True)
spark.stop()
