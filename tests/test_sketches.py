"""Sketch-operator accuracy tests — reference-style goldens.

Mirrors the reference's PercentilesSuite approach (uniform 0..99 input,
estimates within +/-2 of the true percentile) and checks the HLL
estimator against the true distinct count within its published error
bound (~1.04/sqrt(64) ~ 13% std error; we allow 3 sigma).
"""

from __future__ import annotations

import duckdb
import pytest

from atlas_spark.functions.distinct_sketch import M, cardinality, rho_from_hex
from atlas_spark.functions.percentile_buckets import (
    BOUNDARIES,
    index_of,
    pct_label,
    percentiles,
)


def test_bucket_table_shape():
    assert BOUNDARIES[0] == 1
    assert BOUNDARIES[-1] == (1 << 63) - 1
    assert all(b2 > b1 for b1, b2 in zip(BOUNDARIES, BOUNDARIES[1:]))
    # dense at small values
    assert BOUNDARIES[:14] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14]


def test_bucket_table_spectator_length():
    """Spectator's table has exactly 276 entries: Java's `(current << 2) -
    delta` overflows at exp=62 so that level contributes no buckets."""
    assert len(BOUNDARIES) == 276


def test_percentiles_concentrated_bucket():
    """All mass in one bucket: the estimate must interpolate INSIDE that
    bucket — lower bound is the previous boundary by index, even though
    every other bucket is empty (Spectator walks the full table)."""
    i = index_of(100)
    lo, hi = BOUNDARIES[i - 1], BOUNDARIES[i]
    (est,) = percentiles({i: 10.0}, [50.0])
    assert lo < est <= hi, f"p50 {est} outside bucket ({lo}, {hi}]"
    assert est == lo + 0.5 * (hi - lo)


def test_index_of_roundtrip():
    for v in [1, 2, 3, 4, 15, 16, 100, 1000, 10**6, 10**12]:
        i = index_of(v)
        assert v <= BOUNDARIES[i]
        if i > 0:
            assert v > BOUNDARIES[i - 1]


def test_percentiles_uniform_golden():
    """TimeSeriesExprSuite-style golden: uniform 0..99, one count each."""
    counts: dict[int, float] = {}
    for i in range(100):
        counts[index_of(max(i, 1))] = counts.get(index_of(max(i, 1)), 0) + 1
    for p, est in zip([9, 25, 50, 90], percentiles(counts, [9, 25, 50, 90])):
        assert abs(est - p) <= 2.0, f"p{p} -> {est}"


def test_percentiles_empty():
    import math

    assert all(math.isnan(v) for v in percentiles({}, [50.0]))


def test_pct_labels():
    assert pct_label(9.0) == "  9.0"
    assert pct_label(50.0) == " 50.0"
    assert pct_label(100.0) == "100.0"


def test_hll_accuracy():
    """Estimator within 3x standard error of true cardinality."""
    import hashlib

    for true_n in (10, 50, 200, 1000):
        regs: dict[int, float] = {}
        for u in range(true_n):
            h = hashlib.md5(str(u).encode()).hexdigest()
            j = int(h[:2], 16) % M
            rho = rho_from_hex(h[2:10])
            regs[j] = max(regs.get(j, 0), rho)
        est = cardinality(regs)
        rel_err = abs(est - true_n) / true_n
        assert rel_err < 3 * 1.04 / (M**0.5), f"n={true_n} est={est}"


def test_engine_percentile_monotonic(spark, sf_dir):
    """p25 <= p50 <= p90 per interval through the full engine path."""
    from atlas_spark import registry

    df = registry.all_queries()["pct_percentiles"](spark, sf_dir)
    rows = df.collect()
    by_t: dict[int, dict[str, float]] = {}
    for r in rows:
        by_t.setdefault(r["t"], {})[r["k_percentile"].strip()] = r["value"]
    assert len(by_t) >= 25
    for t, ps in by_t.items():
        assert ps["25.0"] <= ps["50.0"] <= ps["90.0"] <= ps["99.0"]


def test_engine_distinct_tracks_truth(spark, sf_dir):
    """Engine estimate vs true per-day distinct user count from raw events."""
    from atlas_spark import registry

    df = registry.all_queries()["ad_distinct"](spark, sf_dir)
    est = {r["t"]: r["value"] for r in df.collect()}
    con = duckdb.connect()
    truth = dict(
        con.execute(
            f"""SELECT (epoch_ns(ts) // 1000000000 // 86400) * 86400,
                       count(DISTINCT user_id)
                FROM '{sf_dir}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    assert set(est) == set(truth)
    for t, n in truth.items():
        assert abs(est[t] - n) / n < 0.5, f"t={t} est={est[t]} true={n}"


def test_index_of_sql_expr_matches(spark):
    """The O(1) arithmetic bucket index must equal the reference table
    walk for every boundary neighborhood and random 63-bit values."""
    import random

    import pyspark.sql.functions as F

    from atlas_spark.functions.percentile_buckets import (
        BOUNDARIES,
        index_of,
        index_of_sql_expr,
    )

    rng = random.Random(7)
    vals = {1}
    for b in BOUNDARIES:
        vals.update((max(1, b - 1), b, min((1 << 63) - 1, b + 1)))
    vals.update(rng.randrange(1, (1 << 63) - 1) for _ in range(5000))
    df = spark.createDataFrame([(v,) for v in sorted(vals)], "v long")
    rows = df.withColumn("idx", F.expr(index_of_sql_expr("v"))).collect()
    bad = [(r.v, r.idx, index_of(r.v)) for r in rows if r.idx != index_of(r.v)]
    assert not bad, bad[:10]
