"""Dump .explain("formatted") for the headline bench queries.

Usage: python scripts/dump_plans.py <outdir> [query ...]

Writes <outdir>/<query>_<suffix>.txt where suffix comes from
$PLAN_SUFFIX (default "before").  Used for the optimization-round
deliverable plans/r16/<query>_{before,after}.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    suffix = os.environ.get("PLAN_SUFFIX", "before")

    from bench import HEADLINE
    from atlas_spark.session import get_spark
    from atlas_spark import registry

    spark = get_spark(app="atlas-spark-plandump")
    queries = registry.all_queries()
    for name in names or HEADLINE:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
