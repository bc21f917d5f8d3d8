"""Plan-build the reference's real-query corpus.

Every URI in the reference's `queries.txt` that parses must also compile
to a Spark plan against the events datapoint source (analysis only — no
execution): this catches evaluator gaps on real-world expression shapes
(style stacking, multi-expression graphs, offsets, :each-generated
lists, nested group-bys).
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

import pytest

from atlas_spark.plans.builder import Evaluator
from atlas_spark.plans.context import EvalContext
from atlas_spark.sources.datapoints import EVENTS_END, EVENTS_START, events_datapoints
from atlas_spark.stacklang.vocab import parse

CORPUS = "/root/reference/atlas-core/src/test/resources/queries.txt"
CTX = EvalContext(EVENTS_START, EVENTS_END, 3600)


def _corpus_queries():
    out = []
    for line in open(CORPUS):
        q = parse_qs(urlparse(line.strip()).query).get("q", [None])[0]
        if q:
            out.append(q)
    return out


def test_corpus_plan_build(spark, sf_dir):
    src = events_datapoints(spark, sf_dir)
    parsed = planned = 0
    failures = []
    total = 0
    for q in _corpus_queries():
        total += 1
        try:
            exprs = parse(q)
        except Exception as ex:
            failures.append((q, f"parse: {ex}"))
            continue
        parsed += 1
        try:
            ev = Evaluator(src, CTX)
            for se in exprs:
                rf = ev.eval(se)
                rf.df.schema  # force analysis
            planned += 1
        except Exception as ex:
            failures.append((q[:110], f"plan: {type(ex).__name__}: {str(ex)[:90]}"))
    msg = "\n".join(f"{q}\n  -> {e}" for q, e in failures[:10])
    assert parsed == total, f"parsed {parsed}/{total}; failures:\n{msg}"
    assert planned == parsed, f"planned {planned}/{parsed}; failures:\n{msg}"


def test_corpus_execute(spark):
    """Execute (not just analyze) every corpus query at sf0.001.

    Catches runtime-only failures that analysis can't: Arrow schema
    nullability in the DES kernel, codegen errors, UDF crashes.  Queries
    run concurrently — Spark schedules jobs from multiple threads onto
    the shared local executor, so the sweep is wall-clock bounded by the
    slowest chain, not the sum.
    """
    from concurrent.futures import ThreadPoolExecutor

    src = events_datapoints(spark, "/root/testdata/sf0.001")

    def run(q):
        try:
            ev = Evaluator(src, CTX)
            for se in parse(q):
                ev.eval(se).df.count()
            return None
        except Exception as ex:  # noqa: BLE001
            return (q[:110], f"{type(ex).__name__}: {str(ex)[:120]}")

    with ThreadPoolExecutor(max_workers=8) as px:
        failures = [f for f in px.map(run, _corpus_queries()) if f]
    msg = "\n".join(f"{q}\n  -> {e}" for q, e in failures[:10])
    assert not failures, f"{len(failures)} corpus queries failed to execute:\n{msg}"


def test_corpus_render_png(spark):
    """Render every corpus URI end-to-end to PNG through the Engine (the
    full graph-parameter surface: multi-tz, layouts, axes, palettes,
    stacking, heatmaps).  Catches render-path failures that plan/execute
    sweeps can't — this sweep found the default-window clamp on explicit
    pre-window `e` and the empty sub-step window."""
    from concurrent.futures import ThreadPoolExecutor

    from atlas_spark.api import Engine

    eng = Engine(spark, "/root/testdata/sf0.001")
    uris = [line.strip() for line in open(CORPUS) if line.strip()]

    def run(u):
        try:
            sep = "&" if "?" in u else "?"
            full = (
                u
                if ("s=" in u or "e=" in u)
                else u + f"{sep}s=2024-01-02&e=2024-01-03"
            )
            png = eng.graph_png(full, width=320, height=160)
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            return None
        except Exception as ex:  # noqa: BLE001
            return (u[:110], f"{type(ex).__name__}: {str(ex)[:120]}")

    with ThreadPoolExecutor(max_workers=8) as px:
        failures = [f for f in px.map(run, uris) if f]
    msg = "\n".join(f"{q}\n  -> {e}" for q, e in failures[:10])
    assert not failures, f"{len(failures)} corpus URIs failed to render:\n{msg}"


def _check_std_json(doc, n_steps):
    """Reference std.json shape (DefaultSettings.scala engine registry;
    JsonGraphEngine): parallel legend/metrics/values arrays over the
    ms-resolution window."""
    import json as _json

    assert isinstance(doc, dict)
    for k in ("start", "step"):
        assert isinstance(doc[k], int) and doc[k] % 1000 == 0
    n = len(doc["legend"])
    assert len(doc["metrics"]) == n
    # values: one row per timestamp, one column per series; non-numeric
    # values quoted like the reference's std.json behavior
    assert len(doc["values"]) == n_steps
    for row in doc["values"]:
        assert len(row) == n
        assert all(
            isinstance(v, (int, float)) or v in ("NaN", "Infinity", "-Infinity")
            for v in row
        )
    for label, tags in zip(doc["legend"], doc["metrics"]):
        assert isinstance(label, str)
        assert isinstance(tags, dict)
    _json.dumps(doc)  # serializable end-to-end (no numpy scalars)


def _check_stats_json(doc):
    """StatsJsonGraphEngine.scala:27-80: stats objects instead of data."""
    import json as _json
    import math

    n = len(doc["legend"])
    assert len(doc["metrics"]) == len(doc["stats"]) == n
    assert doc["notices"] == []
    for s in doc["stats"]:
        assert isinstance(s["count"], int) and s["count"] >= 0
        if s["count"]:
            for k in ("avg", "total", "max", "min", "last"):
                assert isinstance(s[k], (int, float))
            if not any(
                isinstance(s[k], float) and math.isnan(s[k])
                for k in ("min", "avg", "max")
            ):
                assert s["min"] <= s["max"]
    _json.dumps(doc)


def _check_v2_json(doc, n_steps, n_lines):
    """JsonCodec.writeGraphDef message order: graph-metadata (image
    suppressed by the no-image hint), one plot-metadata per axis in
    use, then one timeseries message per line referencing its plot."""
    import json as _json

    assert isinstance(doc, list) and len(doc) >= 2
    gm = doc[0]
    assert gm["type"] == "graph-metadata"
    assert gm["startTime"] < gm["endTime"] and gm["step"] > 0
    assert gm["layout"] in ("CANVAS", "IMAGE", "IMAGE_WIDTH", "IMAGE_HEIGHT")
    plots = [m for m in doc if m["type"] == "plot-metadata"]
    assert plots and all(
        m["scale"]
        in ("LINEAR", "LOGARITHMIC", "LOG_LINEAR", "POWER_2", "SQRT")
        for m in plots
    )
    plot_ids = {m["id"] for m in plots}
    series = [m for m in doc if m["type"] == "timeseries"]
    assert len(series) == n_lines
    for ts in series:
        assert ts["plot"] in plot_ids
        assert isinstance(ts["label"], str)
        assert isinstance(ts["tags"], dict)
        assert len(ts["color"]) == 8
        assert ts["lineStyle"] in ("LINE", "AREA", "STACK", "VSPAN", "HEATMAP")
        assert ts["data"]["type"] == "array"
        assert len(ts["data"]["values"]) == n_steps
    _json.dumps(doc)


def test_corpus_json_render_formats(spark):
    """Serialize every corpus graph through all three JSON render engines
    (std.json / stats.json / v2.json) and assert the reference-shaped
    structure per URI — one evaluation per URI, three serializations.
    Catches format-specific serialization bugs on real-world expression
    shapes that the single-smoke test_api checks can't."""
    from concurrent.futures import ThreadPoolExecutor

    from atlas_spark.api import Engine

    eng = Engine(spark, "/root/testdata/sf0.001")
    uris = [line.strip() for line in open(CORPUS) if line.strip()]

    def run(u):
        try:
            sep = "&" if "?" in u else "?"
            full = (
                u
                if ("s=" in u or "e=" in u)
                else u + f"{sep}s=2024-01-02&e=2024-01-03"
            )
            g = eng.graph(full)
            n_steps = (g.end - g.start) // g.step
            _check_std_json(g.to_json(), n_steps)
            _check_stats_json(g.to_stats_json())
            # no-image: skip the embedded PNG for the 372-URI sweep
            g.hints = frozenset(set(g.hints or ()) | {"no-image"})
            _check_v2_json(g.to_v2_json(), n_steps, len(g.lines))
            return None
        except Exception as ex:  # noqa: BLE001
            return (u[:110], f"{type(ex).__name__}: {str(ex)[:120]}")

    with ThreadPoolExecutor(max_workers=8) as px:
        failures = [f for f in px.map(run, uris) if f]
    msg = "\n".join(f"{q}\n  -> {e}" for q, e in failures[:10])
    assert not failures, f"{len(failures)} corpus URIs failed JSON formats:\n{msg}"
