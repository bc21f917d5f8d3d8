"""Focused pins for bench.py's host-noise detector (r16: steal-aware).

The bench is the driver contract's timing surface; these tests pin the
pieces that must not silently break on a different host: /proc/stat
steal parsing (or clean degradation where it is unreadable), the quiet
gate's budget accounting, and the steal-rate arithmetic.
"""

import time


def _bench():
    import importlib

    return importlib.import_module("bench")


def test_steal_jiffies_parses_or_degrades():
    b = _bench()
    sj = b._steal_jiffies()
    # Linux: absolute jiffy counter (non-negative int, monotonic);
    # elsewhere: None and every consumer degrades to a no-op.
    assert sj is None or (isinstance(sj, int) and sj >= 0)
    if sj is not None:
        assert b._steal_jiffies() >= sj


def test_steal_jiffies_none_on_unreadable(monkeypatch):
    b = _bench()
    import builtins

    real_open = builtins.open

    def boom(path, *a, **k):
        if path == "/proc/stat":
            raise OSError("unreadable")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", boom)
    assert b._steal_jiffies() is None


def test_quiet_gate_steal_rate_non_negative_and_budgeted(monkeypatch):
    b = _bench()
    gate = b._QuietGate(budget=0.0)
    # first call: no elapsed window yet -> 0.0, never negative
    assert gate._steal_rate() == 0.0
    time.sleep(1.1)
    assert gate._steal_rate() >= 0.0
    # an exhausted budget must return busy instead of blocking when the
    # host looks loaded (force both signals busy)
    monkeypatch.setattr(b.os, "getloadavg", lambda: (1e9, 0.0, 0.0))
    t0 = time.monotonic()
    assert gate.wait() is False
    assert time.monotonic() - t0 < 1.0


def test_quiet_gate_passes_on_quiet_host(monkeypatch):
    b = _bench()
    gate = b._QuietGate(budget=10.0)
    monkeypatch.setattr(b.os, "getloadavg", lambda: (0.0, 0.0, 0.0))
    monkeypatch.setattr(gate, "_steal_rate", lambda: 0.0)
    assert gate.wait() is True
    assert gate.waited == 0.0  # no budget spent on a quiet host
