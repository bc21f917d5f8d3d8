"""Property-based differential for the sketch family: random
:percentiles / :sample-count / :approx-distinct shapes over the
percentile and register fixture sources must match the DuckDB oracle.

Exercises the Spectator interpolation (index-based lower bounds across
empty buckets), the toSum aggregate rewrite, timer scaling, and the HLL
estimator under many parameterizations — the adversarial complement to
the handful of registry pct_/ad_ queries.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from atlas_spark.oracle.sqlgen import SqlGen
from atlas_spark.plans.builder import Evaluator
from atlas_spark.plans.context import EvalContext
from atlas_spark.registry import ROUND_EPS, SOURCES
from atlas_spark.sources.datapoints import EVENTS_END, EVENTS_START, PCT_STEP
from atlas_spark.stacklang.vocab import parse

N_SAMPLES = 10
CTX = EvalContext(EVENTS_START, EVENTS_END, PCT_STEP)


def rand_pct_asl(rng: random.Random) -> tuple[str, str]:
    """(asl, source) for a random sketch-family program."""
    roll = rng.random()
    if roll < 0.55:
        # percentiles with random targets / aggregate (toSum rewrite) / by
        pcts = sorted(rng.sample([1, 5, 9, 25, 37.5, 50, 75, 90, 99, 99.9, 100], rng.randint(1, 4)))
        plist = ",".join(str(p) for p in pcts)
        base = rng.choice(
            [":true", ":true,:sum", ":true,:max", ":true,:min", ":true,:count",
             ":true,:sum,(,name,),:by", ":true,:max,(,name,),:by"]
        )
        return f"{base},(,{plist},),:percentiles", "pct"
    if roll < 0.8:
        lo = rng.choice([0, 1, 37, 100, 900])
        hi = rng.choice([1000, 40000, "Infinity"])
        base = rng.choice([":true", ":true,:max", ":true,:sum,(,name,),:by"])
        return f"{base},{lo},{hi},:sample-count", "pct"
    base = rng.choice([":true", ":true,:sum", ":true,:max,(,name,),:by"])
    return f"{base},:approx-distinct", "sketch"


@pytest.fixture(scope="module")
def ducks(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("seed", range(N_SAMPLES))
def test_random_sketch_differential(seed, spark, ducks, sf_dir):
    rng = random.Random(9_100 + seed)
    asl, source_name = rand_pct_asl(rng)
    spec = SOURCES[source_name]
    factory, cte = spec.factory, spec.cte
    src = factory(spark, sf_dir)
    (se,) = parse(asl, step=CTX.step)
    expr = se.expr

    import pyspark.sql.functions as F

    rf = Evaluator(src, CTX).eval(expr)
    sdf = rf.df.filter(F.col("value").isNotNull()).select(
        *rf.key_cols, "t", F.round(F.col("value") + F.lit(ROUND_EPS), 6).alias("value")
    )
    s_rows = [tuple(r) for r in sdf.collect()]

    sql = SqlGen(cte, CTX).generate(expr, drop_nulls=True)
    sql = f"SELECT * REPLACE (round(value + {ROUND_EPS!r}, 6) AS value) FROM ({sql})"
    d_rows = ducks.execute(sql).fetchall()

    def norm(rows):
        out = []
        for r in rows:
            vals = []
            for v in r:
                if isinstance(v, float):
                    if math.isnan(v):
                        v = "NaN"
                    else:
                        v = round(v, 6)
                        v = 0.0 if v == 0 else v
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    a, b = norm(s_rows), norm(d_rows)
    assert len(a) == len(b), f"seed {seed}: {len(a)} vs {len(b)} rows for {asl}"
    bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not bad, f"seed {seed}: {len(bad)} mismatches for {asl}; first {a[bad[0]]} vs {b[bad[0]]}"
