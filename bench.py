"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop write so the full plan (all columns)
materializes — `.count()` would let Spark prune the value computation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# representative mix: scan+agg, group-by, grouped join, window/stateful,
# top-k, sketches, dedup, minhash LSH, similarity search, simhash,
# relational joins over the 600k-row fact table
HEADLINE = [
    "data_by_sum",
    "math_grouped_join",
    "math_pct",
    "st_rolling_sum",
    "f_topk_others",
    "pct_percentiles",
    "ad_distinct",
    "op_dedup_exact",
    "op_ngram_jaccard",
    "op_minhash_candidates",
    "op_cosine_topk",
    "op_simhash",
    "op_lang_id",
    "li_by_sum",
    "li_grouped_share",
    "li_rolling_week",
    "li_topk",
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_top_customers",
    "rel_order_priority",
]


RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Host-load defense (round-8 artifact: a loadavg-20 host inflated every
# query a uniform ~30% with zero plan changes).  Before the timed runs,
# wait — bounded — for the 1-min loadavg to drop below the threshold; if
# it never does, raise the per-query pass count so min-of-n has more
# chances to dodge contention, and mark the output host_busy so a
# contaminated number is machine-detectable.
QUIET_LOAD = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "2.5"))
QUIET_WAIT_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "420"))
BUSY_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_BUSY_RUNS", "5"))
# Hypervisor steal defense (r16): loadavg cannot see CPU time stolen by
# the host — identical code measured 9.5 s and 15.2 s in two
# `busy_mins: []` windows whose only difference was ~30 stolen
# core-seconds (/proc/stat field 8 delta) during the slow run.  A query
# min recorded while more than STEAL_CORES cpu-cores-worth of time was
# being stolen is treated exactly like a loadavg-busy min: retried on
# the quiet budget and flagged in busy_mins if it never gets a clean
# sample.  Background steal on this sandbox is ~0.1-0.2 cores; the
# contaminating bursts measured 0.3-0.5+ cores.
STEAL_CORES = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_CORES", "0.25"))
_CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _steal_jiffies():
    """Absolute hypervisor-steal jiffies from /proc/stat, or None when
    unavailable (non-Linux): all steal logic degrades to a no-op."""
    try:
        with open("/proc/stat") as fh:
            f = fh.readline().split()
        return int(f[8])  # cpu user nice system idle iowait irq softirq steal
    except Exception:
        return None
# extra min-hunting passes for queries whose best time was recorded on a
# loaded host (loadavg >= QUIET_LOAD at measurement time)
RETRY_PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_RETRY_PASSES", "3"))
# dedicated quiet-wait budget for retrying EXPENSIVE (>1s) flagged
# queries — a busy min on a 2s query moves the total far more than on a
# 0.3s one, so it earns its own wait budget even after the shared gate
# budget is spent (r14: op_minhash_candidates flagged at loadavg 4.41
# while every cheap query had settled)
RETRY_QUIET_EXTRA = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_QUIET", "240"))


class _QuietGate:
    """Shared bounded wait budget: block until loadavg(1m) < QUIET_LOAD
    AND the recent hypervisor-steal rate is below STEAL_CORES, spending
    from ONE total budget so repeated gating (before every pass, not
    just at start — load can rise mid-bench) can't stall forever."""

    def __init__(self, budget: float):
        self.budget = budget
        self.waited = 0.0
        self._sj = _steal_jiffies()
        self._st = time.monotonic()

    def _steal_rate(self) -> float:
        """Stolen cores averaged since the previous call (0.0 when steal
        is unreadable or no time has passed yet)."""
        sj, st = _steal_jiffies(), time.monotonic()
        if sj is None or self._sj is None:
            return 0.0
        dt = st - self._st
        rate = (sj - self._sj) / dt / _CLK_TCK if dt >= 1.0 else 0.0
        if dt >= 1.0:
            self._sj, self._st = sj, st
        return rate

    def wait(self) -> bool:
        """Returns True if the host is quiet, False if the budget ran
        out while still busy."""
        while os.getloadavg()[0] >= QUIET_LOAD or self._steal_rate() >= STEAL_CORES:
            if self.waited >= self.budget:
                return False
            time.sleep(5.0)
            self.waited += 5.0
        return True


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    from atlas_spark.session import get_spark
    from atlas_spark import registry

    spark = get_spark(app="atlas-spark-bench", cpus=int(CPUS))
    queries = registry.all_queries()

    # warm the JVM + parquet footer caches with a trivial action
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    gate = _QuietGate(QUIET_WAIT_MAX)
    host_busy = not gate.wait()
    runs = max(1, BUSY_RUNS if host_busy else RUNS)

    # min-of-n per query so a host-contention spike on one pass doesn't
    # contaminate the round's number (r2's 46s-vs-34s artifact)
    times: dict[str, float] = {}
    load_at_min: dict[str, float] = {}
    steal_at_min: dict[str, float] = {}
    errors: dict[str, str] = {}
    loadavg = []

    def _busy(name: str) -> bool:
        """The recorded min never got a clean sample: loadavg-busy OR
        measured steal above the burst threshold during its window."""
        return (
            load_at_min.get(name, 0.0) >= QUIET_LOAD
            or steal_at_min.get(name, 0.0) >= STEAL_CORES
        )

    def _measure(name: str) -> None:
        fn = queries[name]
        la = os.getloadavg()[0]
        sj0 = _steal_jiffies()
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            dt = round(wall, 3)
            sj1 = _steal_jiffies()
            stolen = (
                (sj1 - sj0) / max(wall, 1e-3) / _CLK_TCK
                if sj0 is not None and sj1 is not None
                else 0.0
            )
            if dt < times.get(name, float("inf")):
                times[name] = dt
                load_at_min[name] = round(la, 2)
                steal_at_min[name] = round(stolen, 2)
        except Exception as ex:  # one bad query must not kill the run
            errors[name] = f"{type(ex).__name__}: {ex}"[:200]
            times.pop(name, None)

    for run in range(runs):
        gate.wait()  # re-gate between passes: load can rise mid-bench
        loadavg.append(round(os.getloadavg()[0], 2))
        # rotate the order per pass so a query's neighbors (whose cached
        # shuffle files / GC pressure bleed into its wall time) differ
        # across passes — min-of-n then samples independent orderings
        rot = (run * max(1, len(HEADLINE) // max(1, runs))) % len(HEADLINE)
        for name in HEADLINE[rot:] + HEADLINE[:rot]:
            if name not in errors:
                _measure(name)

    # targeted retries: any query whose recorded min was measured on a
    # loaded host gets extra quiet-host attempts (the whole-pass min can
    # still carry a busy-window artifact for late-in-pass queries).
    # Expensive (>1s) flagged queries draw on a dedicated quiet-wait
    # budget and get two attempts per pass — their busy mins dominate
    # the total, and a single attempt right after the wait often lands
    # on the loadavg tail of the wait's own decay.
    heavy_gate = _QuietGate(RETRY_QUIET_EXTRA)
    for _ in range(RETRY_PASSES):
        stale = [n for n in HEADLINE if n in times and _busy(n)]
        if not stale:
            break
        quiet = gate.wait()
        for name in stale:
            heavy = times.get(name, 0.0) > 1.0
            if heavy:
                quiet_h = heavy_gate.wait()
                if quiet_h or quiet:
                    _measure(name)
                    _measure(name)
            elif quiet:
                _measure(name)
        if not quiet and heavy_gate.waited >= heavy_gate.budget:
            break

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
        "runs": runs,
        "loadavg": loadavg,
        "query_loadavg": load_at_min,
        # stolen cores (hypervisor steal rate) during each recorded min;
        # 0.0 means clean or steal unreadable
        "query_steal": steal_at_min,
        "host_busy": host_busy,
        # queries whose recorded min never got a quiet-host sample
        # (loadavg OR steal) even after the retry passes — contamination
        # is machine-detectable
        "busy_mins": sorted(n for n in times if _busy(n)),
        "quiet_wait_sec": round(gate.waited, 1),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
