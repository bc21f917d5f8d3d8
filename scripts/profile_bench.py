"""Per-query breakdown of the headline bench: build vs first-exec vs warm
exec, plus job/stage counts per execution.

Usage: python scripts/profile_bench.py [query ...]

Prints one line per query:
  name build_s first_s warm_s warm2_s jobs stages tasks

`build` is the Python-side DataFrame construction (ASL parse + plan
builder), `first` the initial noop write (Catalyst + execution + AQE),
`warm*` repeat writes on the already-built DataFrame (execution only —
Catalyst re-analyzes per action but reuses the session plan caches).
Job/stage/task counts come from a StatusTracker delta around the warm
run: at sf0.1 scheduling overhead ~ stages x (scheduler latency), so a
query with 10 stages pays ~10x the per-stage fixed cost of a 1-stage
query regardless of data volume.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from bench import HEADLINE
    from atlas_spark.session import get_spark
    from atlas_spark import registry

    spark = get_spark(app="atlas-spark-profile")
    sc = spark.sparkContext
    queries = registry.all_queries()
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    print(f"{'query':28s} {'build':>7s} {'first':>7s} {'warm':>7s} {'warm2':>7s} {'jobs':>5s}")
    total = {"build": 0.0, "first": 0.0, "warm": 0.0}
    for name in names or HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        j0 = sc.statusTracker().getJobIdsForGroup(None)
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        j1 = sc.statusTracker().getJobIdsForGroup(None)
        njobs = len(set(j1) - set(j0))
        b, f, w, w2 = t1 - t0, t2 - t1, t3 - t2, t4 - t3
        total["build"] += b
        total["first"] += f
        total["warm"] += min(w, w2)
        print(f"{name:28s} {b:7.3f} {f:7.3f} {w:7.3f} {w2:7.3f} {njobs:5d}")
    print(
        f"{'TOTAL':28s} {total['build']:7.3f} {total['first']:7.3f} "
        f"{total['warm']:7.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
