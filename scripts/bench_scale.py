"""Scaling-slope measurement: time the most expensive headline queries
at 1x (sf0.1) and at a k-x scaled copy (scripts/gen_scale.py), printing
one JSON line with per-query times and slopes.

A near-linear slope (time_kx / time_1x ~ k, i.e. slope/k ~ 1) is the
evidence that an operator's plan has no super-linear stage — the
measured counterpart to the per-operator 100 TB design notes in
PERF.md.  Sub-linear slopes are expected where fixed per-query overhead
(planning, JVM, small-stage scheduling) dominates at 1x.

Usage: python scripts/bench_scale.py [k] [scaled_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "pct_percentiles",
    "op_ngram_jaccard",
    "op_minhash_candidates",
    "li_grouped_share",
    "ad_distinct",
    "op_simhash",
    "rel_pricing_summary",
]
# override the query set, e.g. the lineitem/relational family for the
# 100x fact-table row: SPARK_GRAFT_BENCH_QUERIES=li_grouped_share,li_topk
if os.environ.get("SPARK_GRAFT_BENCH_QUERIES"):
    QUERIES = os.environ["SPARK_GRAFT_BENCH_QUERIES"].split(",")

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def time_queries(spark, queries, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for _ in range(RUNS):
        for name in QUERIES:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            times[name] = min(dt, times.get(name, float("inf")))
    return times


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    scaled = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/atlas_scale{k}"
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from atlas_spark import registry
    from atlas_spark.session import get_spark

    spark = get_spark(app="atlas-spark-bench-scale", cpus=32)
    queries = registry.all_queries()
    spark.read.parquet(f"{base}/events.parquet").count()  # warm JVM

    t1 = time_queries(spark, queries, base)
    tk = time_queries(spark, queries, scaled)
    out = {
        "metric": "scaling_slopes",
        "k": k,
        "base": base,
        "scaled": scaled,
        "loadavg": round(os.getloadavg()[0], 2),
        "t_1x": t1,
        "t_kx": tk,
        "slope_over_k": {
            n: round(tk[n] / t1[n] / k, 3) for n in QUERIES if n in t1 and n in tk
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
