"""Plan-shape audit across the FULL registry (not just the headline 21).

For every registry query, build the DataFrame (no action) and scan its
formatted physical plan for scale anti-patterns (guide §2/§3/§4/§7.2):

- BatchEvalPython / ArrowEvalPython  (row-at-a-time Python boundary)
- CartesianProduct / BroadcastNestedLoopJoin  (accidental cross joins)
- SortMergeJoin  (review: should it be broadcast / shuffled-hash?)
- Exchange count  (shuffle count; flag outliers)
- scans whose PushedFilters is empty  (recorded, not auto-flagged:
  full-corpus ops legitimately scan everything)

Streaming twins (build starts a real stream) and driver-job builders
are skipped with a note.  Usage:
    python scripts/audit_plans.py [out.tsv]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# build() runs a bounded stream replay / driver-side jobs: plan shape is
# audited through the batch twin instead (same pipeline code), or the
# build is driver-job-bearing by design (documented collect rationale)
SKIP_SUBSTR = ("_stream",)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit.tsv"
    from atlas_spark.session import get_spark
    from atlas_spark import registry

    spark = get_spark(app="atlas-spark-plan-audit")
    queries = registry.all_queries()

    rows = []
    for name in sorted(queries):
        if any(s in name for s in SKIP_SUBSTR):
            rows.append((name, "SKIP(stream-twin)", "", "", "", "", ""))
            continue
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:
            rows.append((name, f"ERROR {type(ex).__name__}", "", "", "", "", ""))
            continue
        dt = time.perf_counter() - t0
        nex = len(re.findall(r"\(\d+\) Exchange", plan))
        smj = len(re.findall(r"\(\d+\) SortMergeJoin", plan))
        cart = len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan))
        pyev = len(re.findall(r"BatchEvalPython|ArrowEvalPython", plan))
        pandas_nodes = len(
            re.findall(r"FlatMapGroupsInPandas|MapInPandas|MapInArrow|FlatMapGroupsInPandasWithState|TransformWithStateInPandas", plan)
        )
        scans = re.findall(r"PushedFilters: \[(.*?)\]", plan)
        empty_push = sum(1 for s in scans if not s.strip())
        rows.append(
            (
                name,
                f"{dt:.2f}s",
                f"ex={nex}",
                f"smj={smj}",
                f"cart={cart}",
                f"pyudf={pyev} pandas={pandas_nodes}",
                f"scans={len(scans)} nopush={empty_push}",
            )
        )

    with open(out_path, "w") as fh:
        for r in rows:
            fh.write("\t".join(r) + "\n")
    flagged = [
        r for r in rows
        if ("cart=0" not in r[4] and r[4]) or ("pyudf=0" not in r[5] and r[5])
        or ("smj=0" not in r[3] and r[3])
    ]
    print(f"wrote {out_path}: {len(rows)} queries, {len(flagged)} flagged")
    for r in flagged:
        print("FLAG", "\t".join(r))
    spark.stop()


if __name__ == "__main__":
    main()
