"""Generate a k-x scaled copy of a testdata sf dir for scaling-slope
measurements (PERF.md scaling table).

Design goal: the scaled corpus must be STATISTICALLY similar to the
base, so wall-time slopes measure the engine, not artifacts of naive
replication:

- documents: k replicas; every word in replica i>0 is salted with the
  replica index, so replica vocabularies are DISJOINT — each replica
  reproduces the base corpus's near-dup pair structure exactly and
  contributes zero cross-replica similarity.  Near-dup ground truth is
  therefore exactly k x base (linear by construction), while bucket
  cardinality, shingle counts, and signature work all scale k x.
- lineitem / orders: k replicas with key offsets (group-by cardinality
  on flags/dates unchanged, group sizes scale k x — the TPC-H scaling
  convention).
- events: k replicas with event_id and user_id offsets, so distinct
  cardinalities (sketch inputs) scale linearly too.
- dimension tables: copied as-is.

Usage: python scripts/gen_scale.py [k] [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

DIMS = ("region", "nation", "customer", "supplier", "part", "embeddings")
ID_OFF = 10_000_000


def replicate(df, k: int, exprs):
    frames = [df.select(*exprs(i)) for i in range(k)]
    res = frames[0]
    for f in frames[1:]:
        res = res.unionByName(f)
    return res


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/atlas_scale{k}"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(dst, ignore_errors=True)

    docs = spark.read.parquet(f"{src}/documents.parquet")

    if os.environ.get("SPARK_GRAFT_DOCS_ONLY") == "1":
        # documents-only scaling for large k (e.g. 1000x): one
        # crossJoin-with-replica-index pass instead of a k-frame union
        # (Catalyst chokes on thousand-leg unions), other tables
        # symlinked from the base dir
        os.makedirs(dst, exist_ok=True)
        rep = F.col("rep")
        salted = F.when(rep == 0, F.col("text")).otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit("_"), rep.cast("string")),
                ),
                " ",
            )
        )
        out = docs.crossJoin(
            spark.range(k).select(F.col("id").alias("rep"))
        ).select(
            (F.col("doc_id") + rep * ID_OFF).alias("doc_id"),
            salted.alias("text"),
            F.col("lang"),
            F.col("source"),
            F.length(salted).cast("long").alias("n_chars"),
        )
        out.repartition(32).write.parquet(f"{dst}/documents.parquet")
        for t in ("lineitem", "orders", "events") + DIMS:
            # abspath so a relative src doesn't leave dangling links;
            # drop any link from a previous run into the same dst
            link = f"{dst}/{t}.parquet"
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(os.path.abspath(f"{src}/{t}.parquet"), link)
        n = spark.read.parquet(f"{dst}/documents.parquet").count()
        print(f"documents: {n}")
        spark.stop()
        return

    def doc_replica(i: int):
        if i == 0:
            return [F.col(c) for c in docs.columns]
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "), lambda w: F.concat(w, F.lit(f"_{i}"))
            ),
            " ",
        )
        return [
            (F.col("doc_id") + i * ID_OFF).alias("doc_id"),
            salted.alias("text"),
            F.col("lang"),
            F.col("source"),
            # word-salting lengthens the text, so recompute the length —
            # a replica carrying the base row's n_chars would make any
            # n_chars-driven query (length_histogram) measure a
            # distribution inconsistent with its documents (ADVICE r11)
            F.length(salted).cast("long").alias("n_chars"),
        ]

    replicate(docs, k, doc_replica).coalesce(8).write.parquet(
        f"{dst}/documents.parquet"
    )

    li = spark.read.parquet(f"{src}/lineitem.parquet")

    def li_replica(i: int):
        return [
            (F.col("l_orderkey") + i * ID_OFF).alias("l_orderkey")
            if c == "l_orderkey"
            else F.col(c)
            for c in li.columns
        ]

    replicate(li, k, li_replica).coalesce(16).write.parquet(f"{dst}/lineitem.parquet")

    orders = spark.read.parquet(f"{src}/orders.parquet")

    def ord_replica(i: int):
        out = []
        for c in orders.columns:
            if c in ("o_orderkey",):
                out.append((F.col(c) + i * ID_OFF).alias(c))
            else:
                out.append(F.col(c))
        return out

    replicate(orders, k, ord_replica).coalesce(8).write.parquet(
        f"{dst}/orders.parquet"
    )

    ev = spark.read.parquet(f"{src}/events.parquet")

    def ev_replica(i: int):
        out = []
        for c in ev.columns:
            if c in ("event_id", "user_id"):
                out.append((F.col(c) + i * ID_OFF).alias(c))
            else:
                out.append(F.col(c))
        return out

    replicate(ev, k, ev_replica).coalesce(8).write.parquet(f"{dst}/events.parquet")

    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").coalesce(4).write.parquet(
            f"{dst}/{t}.parquet"
        )
    for t in ("documents", "lineitem", "orders", "events"):
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
