"""Multi-query concurrency measurement (r12 verdict stretch #8): an Atlas
deployment serves concurrent graph requests on ONE shared SparkSession,
so the number that matters operationally is request latency under
concurrency, not just the sequential bench.

Drives the real HTTP server (http_api.serve on a daemon thread, FAIR
scheduler so a long render round-robins with cheap lookups instead of
starving them) with a headline URI mix at 1 / 4 / 16 concurrent
closed-loop clients and reports per-URI p50/p95 and aggregate
throughput.  Run artifact for PERF.md; not a test.
"""

from __future__ import annotations

import os
import statistics
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
WINDOW = "s=2024-01-02&e=2024-01-03"
# headline mix: an expensive grouped render, a mid-weight percentile
# render, a cheap single-line render, a data fetch, and a tag lookup —
# roughly what a dashboard page load issues at once
MIX = [
    ("graph_by", f"/api/v1/graph?q=:true,:sum,(,name,bucket,),:by&format=png&{WINDOW}"),
    ("graph_pct", f"/api/v1/graph?q=:true,:sum,(,name,),:by,:pct&format=png&{WINDOW}"),
    ("graph_line", f"/api/v1/graph?q=name,click,:eq,:sum&format=png&{WINDOW}"),
    ("fetch_json", f"/api/v1/graph?q=:true,:sum,(,name,),:by&format=json&{WINDOW}"),
    ("tags", "/api/v1/tags/name"),
]
PER_CLIENT = 10  # requests per client per URI kind (closed loop)

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from atlas_spark.api import Engine  # noqa: E402
from atlas_spark import http_api  # noqa: E402

engine = Engine(spark, SF_DIR)
# ATLAS_RENDER_PARTITIONS=N caps each render's shuffle width via a cloned
# render session (r14: lets concurrent renders overlap instead of one
# render fanning across all 32 cores while the rest queue)
rp = os.environ.get("ATLAS_RENDER_PARTITIONS")
print(f"render_partitions: {rp or 'uncapped'}", flush=True)
srv, _thread = http_api.start(
    engine, port=0, render_partitions=int(rp) if rp else None
)
port = srv.server_address[1]
base = f"http://127.0.0.1:{port}"

# warm up every URI once (plan build + codegen out of the measurement)
for _, uri in MIX:
    urllib.request.urlopen(base + uri, timeout=120).read()


def client(latencies: dict, stop_at: float):
    while time.perf_counter() < stop_at:
        for name, uri in MIX:
            t0 = time.perf_counter()
            with urllib.request.urlopen(base + uri, timeout=300) as r:
                r.read()
            latencies.setdefault(name, []).append(time.perf_counter() - t0)


def pct(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


print(f"mix of {len(MIX)} URIs, closed loop, 30 s per concurrency level", flush=True)
for n_clients in (1, 4, 16):
    lat: dict[str, list[float]] = {}
    stop_at = time.perf_counter() + 30.0
    threads = [
        threading.Thread(target=client, args=(lat, stop_at)) for _ in range(n_clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total = sum(len(v) for v in lat.values())
    print(f"clients={n_clients:2d}  {total/wall:6.1f} req/s  ({total} reqs in {wall:.0f}s)", flush=True)
    for name, _ in MIX:
        xs = lat.get(name, [])
        if xs:
            print(
                f"    {name:10s} p50={statistics.median(xs)*1000:7.0f}ms "
                f"p95={pct(xs, 0.95)*1000:7.0f}ms n={len(xs)}",
                flush=True,
            )

srv.shutdown()
spark.stop()
