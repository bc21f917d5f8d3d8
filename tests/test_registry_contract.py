"""Driver-contract invariants: the registry itself must be well-formed
regardless of which 50-entry window the driver's rotation samples."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_registry_names_unique_and_oracles_subset():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert len(qs) == len(set(qs)), "duplicate query names"
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"
    rows_only = set(qs) - set(os_)
    # every entry is oracle-checkable (the fitted-KMeans IVF pins its
    # recall@k property engine-side against a constant-bound oracle)
    assert rows_only == set(), rows_only


def test_registry_callables_and_sql_shapes():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in os_.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
