"""Driver-style correctness gate: every `queries()` entry with an oracle
must match the DuckDB result (row count + order-insensitive values).

This mirrors the driver's CORRECTNESS check so regressions surface in
`pytest` before a round submission.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _norm(rows, cols):
    """Sort columns by name, round floats, sort rows — order-insensitive
    canonical form (the driver hashes something equivalent)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    v = 0.0 if v == 0 else v
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    a = _norm(spark_rows, [c.lower() for c in spark_cols])
    b = _norm(duck_rows, [c.lower() for c in duck_cols])
    mismatches = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{a[mismatches[0]]} vs {b[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # runs without error; shape checked elsewhere


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
