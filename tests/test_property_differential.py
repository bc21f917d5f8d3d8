"""Property-based differential testing: random expression trees must
produce identical results from the Spark plan builder and the generated
DuckDB oracle SQL.

This is the adversarial complement to the hand-picked registry queries:
the generator composes queries, aggregations, group-bys, binary math,
stateful windows, and filters in random shapes, then both evaluation
paths (which share only the AST) are compared row-for-row.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from atlas_spark.model import expr as E
from atlas_spark.model import query as Q
from atlas_spark.oracle.sqlgen import SqlGen
from atlas_spark.plans.builder import Evaluator
from atlas_spark.plans.context import EvalContext
from atlas_spark.sources.datapoints import (
    EVENTS_END,
    EVENTS_START,
    events_cte,
    events_datapoints,
)

CTX = EvalContext(EVENTS_START, EVENTS_END, 3600)
N_SAMPLES = 24
KEYS = ("name", "bucket")
NAMES = ("click", "view", "error", "signup", "purchase", "zzz")
BUCKETS = tuple(f"u{i}" for i in range(8)) + ("u42",)


def rand_query(rng: random.Random, depth: int = 0) -> Q.Query:
    roll = rng.random()
    if depth < 2 and roll < 0.35:
        op = rng.choice(["and", "or", "not"])
        if op == "not":
            return Q.NotQuery(rand_query(rng, depth + 1))
        cls = Q.AndQuery if op == "and" else Q.OrQuery
        return cls(rand_query(rng, depth + 1), rand_query(rng, depth + 1))
    leaf = rng.random()
    if leaf < 0.3:
        return Q.EqualQuery("name", rng.choice(NAMES))
    if leaf < 0.45:
        return Q.InQuery("name", tuple(rng.sample(NAMES, 2)))
    if leaf < 0.55:
        return Q.RegexQuery("name", rng.choice(["c", "v", "s.g"]))
    if leaf < 0.65:
        return Q.LessThanQuery("bucket", rng.choice(BUCKETS))
    if leaf < 0.75:
        return Q.HasKeyQuery(rng.choice(KEYS))
    if leaf < 0.85:
        return Q.EqualQuery("bucket", rng.choice(BUCKETS))
    return Q.TRUE


# every :time mode with an oracle translation, camelCase and the
# ChronoField.valueOf fallthrough spellings
TIME_MODES = (
    "secondOfMinute", "secondOfDay", "minuteOfHour", "minuteOfDay",
    "hourOfDay", "dayOfWeek", "dayOfMonth", "dayOfYear", "monthOfYear",
    "days", "hours", "HOUR_OF_DAY", "MINUTE_OF_DAY", "CLOCK_HOUR_OF_DAY",
    "AMPM_OF_DAY", "DAY_OF_WEEK", "EPOCH_DAY", "SECOND_OF_DAY",
)


def rand_leaf(rng: random.Random) -> E.TimeSeriesExpr:
    q = rand_query(rng)
    fn = rng.choice(["sum", "count", "min", "max"])
    roll = rng.random()
    if roll < 0.4:
        return E.AggrExpr(q, fn)
    if roll < 0.8:
        keys = rng.choice([("name",), ("bucket",), ("name", "bucket")])
        return E.GroupByExpr(q, E.AggrExpr(q, fn), keys)
    if roll < 0.88:
        return E.TimeExpr(rng.choice(TIME_MODES))
    if roll < 0.92:
        return E.RandomExpr(rng.randint(0, 99)) if rng.random() < 0.5 else E.RandomExpr(0)
    if roll < 0.95:
        # standalone :stat-* = zero lines; exercises empty-result
        # propagation through whatever math wraps this leaf
        return E.StatPlaceholder(rng.choice(["avg", "max", "min", "total"]))
    return E.ConstExpr(float(rng.randint(-5, 100)))


def rand_expr(rng: random.Random, depth: int = 0) -> E.TimeSeriesExpr:
    if depth >= 2 or rng.random() < 0.3:
        return rand_leaf(rng)
    roll = rng.random()
    if roll < 0.22:
        op = rng.choice(["abs", "neg", "sqrt"])
        return E.UnaryMathExpr(op, rand_expr(rng, depth + 1))
    if roll < 0.28:
        op = rng.choice(["clamp-min", "clamp-max"])
        return E.UnaryMathExpr(op, rand_expr(rng, depth + 1), param=float(rng.randint(0, 200)))
    if roll < 0.52:
        op = rng.choice(["add", "sub", "mul", "div", "fadd", "gt", "le", "and", "or"])
        for _ in range(8):
            lhs, rhs = rand_expr(rng, depth + 1), rand_expr(rng, depth + 1)
            try:
                return E.BinaryMathExpr(op, lhs, rhs)
            except ValueError:
                continue  # incompatible groupings; redraw
        return rand_leaf(rng)
    if roll < 0.6:
        op = rng.choice(
            ["delay", "rolling-sum", "rolling-max", "derivative", "integral", "cumulative-max"]
        )
        params = (rng.randint(1, 6),) if op in ("delay", "rolling-sum", "rolling-max") else ()
        return E.StatefulMathExpr(op, rand_expr(rng, depth + 1), params)
    if roll < 0.64:
        # DES recurrence vs the recursive-CTE oracle
        op = rng.choice(["des", "sdes"])
        params = (rng.randint(2, 8), rng.choice([0.1, 0.3]), rng.choice([0.02, 0.5]))
        return E.StatefulMathExpr(op, rand_expr(rng, depth + 1), params)
    if roll < 0.72:
        inner = rand_expr(rng, depth + 1)
        return E.AggrMathExpr(rng.choice(["sum", "max", "count"]), inner)
    if roll < 0.78:
        return E.StatExpr(rand_expr(rng, depth + 1), rng.choice(["avg", "max", "min", "last", "total", "count"]))
    if roll < 0.84:
        return E.ConsolidateExpr(
            rand_expr(rng, depth + 1), rng.choice(["sum", "avg", "min", "max"]), rng.choice([2, 4, 6])
        )
    if roll < 0.88:
        inner = rand_leaf(rng)
        if inner.group_keys():
            pred = E.BinaryMathExpr(
                "gt", E.StatPlaceholder(rng.choice(["avg", "max"])), E.ConstExpr(float(rng.randint(0, 100)))
            )
            return E.FilterOpExpr(inner, pred)
        return inner
    if roll < 0.94:
        # :cg common group-by tree rewrite over arbitrary subtrees
        inner = rand_expr(rng, depth + 1)
        keys = rng.choice([(KEYS[0],), (KEYS[1],)])
        try:
            return E.add_common_keys(inner, keys)
        except (ValueError, TypeError):
            return inner
    inner = rand_leaf(rng)
    if inner.group_keys():
        others = rng.choice([None, "sum", "max", "avg", "min"])
        return E.TopKExpr(
            inner, rng.choice(["avg", "total", "max"]), rng.randint(1, 4),
            bottom=rng.random() < 0.3, others=others,
        )
    return inner


@pytest.fixture(scope="module")
def duck_events(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def ev_source(spark, sf_dir):
    return events_datapoints(spark, sf_dir)


@pytest.mark.parametrize("seed", range(N_SAMPLES))
def test_random_expr_differential(seed, spark, duck_events, ev_source):
    rng = random.Random(7_000 + seed)
    expr = rand_expr(rng)

    from atlas_spark.registry import ROUND_EPS

    ev = Evaluator(ev_source, CTX)
    rf = ev.eval(expr)
    import pyspark.sql.functions as F

    sdf = rf.df.filter(F.col("value").isNotNull()).select(
        *rf.key_cols, "t", F.round(F.col("value") + F.lit(ROUND_EPS), 6).alias("value")
    )
    s_rows = [tuple(r) for r in sdf.collect()]

    gen = SqlGen(events_cte(), CTX)
    sql = gen.generate(expr, drop_nulls=True)
    sql = f"SELECT * REPLACE (round(value + {ROUND_EPS!r}, 6) AS value) FROM ({sql})"
    d_rows = duck_events.execute(sql).fetchall()

    def norm(rows):
        out = []
        for r in rows:
            vals = []
            for v in r:
                if isinstance(v, float):
                    if math.isnan(v):
                        v = "NaN"
                    elif math.isinf(v):
                        v = "Inf" if v > 0 else "-Inf"
                    else:
                        v = round(v, 6)
                        v = 0.0 if v == 0 else v
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    a, b = norm(s_rows), norm(d_rows)
    assert len(a) == len(b), (
        f"seed {seed}: row count {len(a)} vs {len(b)} for {expr.display()}"
    )
    mismatch = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatch, (
        f"seed {seed}: {len(mismatch)} mismatches for {expr.display()}; "
        f"first: {a[mismatch[0]]} vs {b[mismatch[0]]}"
    )


# ----------------------------------------------------- gauge differential

GAUGE_CTX_FINE = EvalContext(EVENTS_START, EVENTS_END, 3600)
GAUGE_CTX_DAY = EvalContext(EVENTS_START, EVENTS_END, 86400)


@pytest.fixture(scope="module")
def gauge_source(spark, sf_dir):
    from atlas_spark.sources.datapoints import gauge_datapoints

    return gauge_datapoints(spark, sf_dir)


@pytest.mark.parametrize("seed", range(N_SAMPLES))
def test_random_expr_gauge_differential(seed, spark, duck_events, gauge_source):
    """Same adversarial generator over the GAUGE-typed source, half the
    seeds at the coarse daily context — so both gauge consolidation
    paths (`:consolidate cf-avg` render-time, and the data-level
    storage->eval regroup with per-af default cfs) are fuzzed against
    the oracle, not just pinned by the four hand-picked registry
    entries."""
    from atlas_spark.registry import ROUND_EPS
    from atlas_spark.sources.datapoints import gauge_cte

    rng = random.Random(61_000 + seed)
    expr = rand_expr(rng)
    ctx = GAUGE_CTX_DAY if seed % 2 else GAUGE_CTX_FINE

    ev = Evaluator(gauge_source, ctx)
    rf = ev.eval(expr)
    import pyspark.sql.functions as F

    sdf = rf.df.filter(F.col("value").isNotNull()).select(
        *rf.key_cols, "t", F.round(F.col("value") + F.lit(ROUND_EPS), 6).alias("value")
    )
    s_rows = [tuple(r) for r in sdf.collect()]

    gen = SqlGen(gauge_cte(), ctx, src_step=3600, ds_type="gauge")
    sql = gen.generate(expr, drop_nulls=True)
    sql = f"SELECT * REPLACE (round(value + {ROUND_EPS!r}, 6) AS value) FROM ({sql})"
    d_rows = duck_events.execute(sql).fetchall()

    def norm(rows):
        out = []
        for r in rows:
            vals = []
            for v in r:
                if isinstance(v, float):
                    if math.isnan(v):
                        v = "NaN"
                    elif math.isinf(v):
                        v = "Inf" if v > 0 else "-Inf"
                    else:
                        v = round(v, 6)
                        v = 0.0 if v == 0 else v
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    a, b = norm(s_rows), norm(d_rows)
    assert len(a) == len(b), (
        f"seed {seed}: row count {len(a)} vs {len(b)} for {expr.display()}"
    )
    mismatch = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatch, (
        f"seed {seed}: {len(mismatch)} mismatches for {expr.display()}; "
        f"first: {a[mismatch[0]]} vs {b[mismatch[0]]}"
    )


@pytest.mark.parametrize("seed", range(N_SAMPLES // 2))
def test_random_expr_rate_coarse_differential(seed, spark, duck_events, ev_source):
    """The generator over the RATE events source at a coarse DAILY
    context: fuzzes the data-level consolidation defaults
    (sum/count->avg dividing by the sub-interval count, min/max->self)
    against the oracle's mirrored regroup."""
    from atlas_spark.registry import ROUND_EPS

    rng = random.Random(63_000 + seed)
    expr = rand_expr(rng)
    ctx = EvalContext(EVENTS_START, EVENTS_END, 86400)

    ev = Evaluator(ev_source, ctx)
    rf = ev.eval(expr)
    import pyspark.sql.functions as F

    sdf = rf.df.filter(F.col("value").isNotNull()).select(
        *rf.key_cols, "t", F.round(F.col("value") + F.lit(ROUND_EPS), 6).alias("value")
    )
    s_rows = [tuple(r) for r in sdf.collect()]

    gen = SqlGen(events_cte(), ctx, src_step=3600)
    sql = gen.generate(expr, drop_nulls=True)
    sql = f"SELECT * REPLACE (round(value + {ROUND_EPS!r}, 6) AS value) FROM ({sql})"
    d_rows = duck_events.execute(sql).fetchall()

    def norm(rows):
        out = []
        for r in rows:
            vals = []
            for v in r:
                if isinstance(v, float):
                    if math.isnan(v):
                        v = "NaN"
                    elif math.isinf(v):
                        v = "Inf" if v > 0 else "-Inf"
                    else:
                        v = round(v, 6)
                        v = 0.0 if v == 0 else v
                vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    a, b = norm(s_rows), norm(d_rows)
    assert len(a) == len(b), (
        f"seed {seed}: row count {len(a)} vs {len(b)} for {expr.display()}"
    )
    mismatch = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatch, (
        f"seed {seed}: {len(mismatch)} mismatches for {expr.display()}; "
        f"first: {a[mismatch[0]]} vs {b[mismatch[0]]}"
    )
