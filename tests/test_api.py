"""Engine API tests: graph/fetch/tags surfaces."""

from __future__ import annotations

import pytest

from atlas_spark.api import Engine
from atlas_spark.model import query as Q


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_graph_basic(engine):
    g = engine.graph("/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03")
    assert g.step == 3600
    assert (g.end - g.start) == 86400
    assert len(g.lines) == 1
    assert len(g.lines[0].data) == 24
    assert any(v is not None for v in g.lines[0].data)


def test_graph_group_by_legend(engine):
    g = engine.graph(
        "/api/v1/graph?q=:true,:sum,(,name,),:by,$(name),:legend&s=2024-01-02&e=2024-01-03"
    )
    labels = sorted(ln.label for ln in g.lines)
    assert labels == ["click", "error", "purchase", "signup", "view"]
    for ln in g.lines:
        assert ln.tags["name"] == ln.label


def test_graph_tz_time_span(engine):
    """tz param shifts absolute time-span boundaries: 2024-01-02 in
    US/Pacific begins at 08:00 UTC (Grapher.scala:169-171).  The graph
    window is pinned with explicit-zone literals (which win over tz —
    IsoDateTimeParser) so only the span boundary moves here; the window
    shift itself is covered by test_graph_window_request_tz."""
    base = (
        "/api/v1/graph?q=2024-01-02,2024-01-03,:time-span"
        "&s=2024-01-02T00:00Z&e=2024-01-03T00:00Z"
    )
    utc = engine.graph(base)
    pac = engine.graph(base + "&tz=US/Pacific")
    # UTC: inside the span from the first interval; Pacific: first 8 hours out
    assert utc.lines[0].data[0] == 1.0
    assert pac.lines[0].data[:8] == [0.0] * 8
    assert pac.lines[0].data[8] == 1.0


def test_graph_multi_expr(engine):
    g = engine.graph(
        "/api/v1/graph?q=name,click,:eq,:sum,name,view,:eq,:sum&s=2024-01-02&e=2024-01-03"
    )
    assert len(g.lines) == 2


def test_graph_json_csv(engine):
    g = engine.graph("/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-02T06:00")
    js = g.to_json()
    assert js["step"] == 3600000
    # values: one row per timestamp, one column per series
    assert len(js["values"]) == 6 and len(js["values"][0]) == 1
    csv = g.to_csv()
    # CsvGraphEngine shape: quoted header, ISO-offset timestamps in the
    # graph tz (Z for UTC, seconds omitted when zero), %f values
    lines = csv.splitlines()
    assert lines[0] == '"timestamp","click"'
    assert len(lines) == 7
    assert lines[1].startswith("2024-01-02T00:00Z,")
    val = lines[1].split(",", 1)[1]
    assert val == "NaN" or "." in val  # %f renders 6 decimals
    # timestamps render in the graph's first timezone with its offset
    pac = engine.graph(
        "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02T00:00Z"
        "&e=2024-01-02T06:00Z&tz=US/Pacific"
    )
    assert pac.to_csv().splitlines()[1].startswith("2024-01-01T16:00-08:00,")


def test_graph_default_window(engine):
    g = engine.graph("/api/v1/graph?q=42,:const")
    # default: e-3h .. default end
    assert (g.end - g.start) == 3 * 3600
    assert all(v == 42.0 for v in g.lines[0].data)


def test_graph_step_param(engine):
    g = engine.graph(
        "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03&step=6h"
    )
    assert g.step == 21600 or g.step == 3600  # consolidated step honored


def test_graph_window_request_tz(engine):
    # Strings.timeRange parity (GraphConfig.scala:59-65): absolute date
    # literals parse in the REQUEST timezone, so tz=US/Pacific shifts
    # the whole window +8h vs UTC (PST, January).
    base = "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03"
    utc = engine.graph(base)
    pst = engine.graph(base + "&tz=US/Pacific")
    assert pst.start - utc.start == 8 * 3600
    assert pst.end - utc.end == 8 * 3600
    # explicit zone in the literal wins over the tz param
    z = engine.graph(
        "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02T00:00Z"
        "&e=2024-01-03T00:00Z&tz=US/Pacific"
    )
    assert (z.start, z.end) == (utc.start, utc.end)


def test_graph_window_e_references_s(engine):
    # absolute s, e=s+6h resolves against the request's s
    # (Strings.scala:617-620: refs + ("s" -> start))
    g = engine.graph("/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=s+6h")
    assert g.start == 1704153600  # 2024-01-02T00:00Z
    assert g.end - g.start == 6 * 3600
    # relative s resolves against an absolute e (refs + ("e" -> end))
    g2 = engine.graph("/api/v1/graph?q=name,click,:eq,:sum&s=e-6h&e=2024-01-02T06:00")
    assert (g2.start, g2.end) == (g.start, g.end)


def test_graph_window_both_relative_rejected(engine):
    with pytest.raises(ValueError, match="both relative"):
        engine.graph("/api/v1/graph?q=name,click,:eq,:sum&s=e-3h&e=s+1h")


def test_graph_nonpositive_width_rejected_all_formats(engine):
    # w<=0 is a client error for json/csv too, not a silent clamp
    for fmt in ("json", "csv"):
        with pytest.raises(ValueError, match="w must be positive"):
            engine.graph(
                "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02"
                f"&e=2024-01-03&w=0&format={fmt}"
            )


def test_fetch_distributed(engine):
    df = engine.fetch("/api/v2/fetch?q=:true,:sum,(,name,),:by&s=2024-01-02&e=2024-01-03")
    assert df.columns == ["line_set", "tags", "t", "value"]
    rows = df.collect()
    assert len(rows) > 0
    names = {r["tags"]["name"] for r in rows}
    assert "click" in names


def test_tags_keys_values(engine):
    keys = [r["key"] for r in engine.tags().collect()]
    assert keys == ["bucket", "name"]
    vals = [r["value"] for r in engine.tags(key="name").collect()]
    assert vals == ["click", "error", "purchase", "signup", "view"]
    vals = [
        r["value"]
        for r in engine.tags(q=Q.EqualQuery("name", "click"), key="name").collect()
    ]
    assert vals == ["click"]


def test_tags_pagination(engine):
    """Resume-from-offset walks the full value list in limit-sized pages
    (TagsApi.scala:71-113)."""
    full = [r["value"] for r in engine.tags(key="name").collect()]
    assert len(full) == 5
    pages, offset = [], ""
    while True:
        rows = engine.tags(key="name", offset=offset, limit=2).collect()
        pages.extend(r["value"] for r in rows)
        offset = engine.tags_next_offset(rows, 2)
        if offset is None:
            break
    assert pages == full
    # a full final page yields one extra empty fetch, not an infinite loop
    rows = engine.tags(key="name", offset=full[-1], limit=2).collect()
    assert rows == []


def test_tags_verbose_counts(engine):
    rows = engine.tags(key="name", verbose=True).collect()
    assert {r["key"] for r in rows} == {"name"}
    counts = {r["value"]: r["count"] for r in rows}
    assert set(counts) == {"click", "error", "purchase", "signup", "view"}
    assert all(c > 0 for c in counts.values())
    # verbose without key spans all tag keys, ordered (key, value)
    allrows = engine.tags(verbose=True, limit=3).collect()
    assert [(r["key"]) for r in allrows] == ["bucket"] * 3
    nxt = engine.tags_next_offset(allrows, 3, verbose=True)
    assert nxt.startswith("bucket,")


def test_tags_catalog_path_no_fact_scan(engine, spark, sf_dir, tmp_path):
    """tags() routed through a maintained series catalog returns the same
    pages as the distinct fact scan, and its plan reads the CATALOG
    parquet, never the fact table (TagsApi answers from the tag index,
    TagsApi.scala:44-127 / RoaringTagIndex.scala:85-107 — a metadata
    request must not scan datapoints at 100 TB)."""
    from atlas_spark.api import Engine
    from atlas_spark.sources.catalog import write_series_catalog

    cat = str(tmp_path / "catalog")
    write_series_catalog(engine.source, cat)
    ce = Engine(spark, sf_dir, catalog=cat)

    for kwargs in (
        {},
        {"key": "name"},
        {"key": "name", "q": Q.EqualQuery("name", "click")},
        {"verbose": True},
        {"key": "name", "verbose": True, "limit": 3},
    ):
        a = [tuple(r) for r in engine.tags(**kwargs).collect()]
        b = [tuple(r) for r in ce.tags(**kwargs).collect()]
        assert a == b, (kwargs, a, b)

    # plan pin: the catalog-backed scan never touches the fact parquet
    plan = ce.tags(key="name", verbose=True)._jdf.queryExecution().executedPlan().toString()
    assert "catalog" in plan and "events.parquet" not in plan, plan


def test_series_catalog_stream_maintenance(spark, tmp_path):
    """Continuous catalog maintenance from bronze: new series appear in
    the catalog as they publish; replays/duplicates fold to one row."""
    import json

    from atlas_spark.sources.catalog import (
        append_series_catalog_stream,
        read_series_catalog,
    )
    from atlas_spark.streaming.sink import publish_to_bronze

    d_in = tmp_path / "in"
    d_in.mkdir()

    def payload(name, app, ts_s):
        return json.dumps(
            {"metrics": [{"tags": {"name": name, "app": app}, "timestamp": ts_s * 1000, "value": 1.0}]}
        )

    (d_in / "c1.txt").write_text(
        "\n".join(
            [
                payload("cpu", "www", 1700000000),
                payload("cpu", "www", 1700000060),  # same series again
                payload("disk", "db", 1700000000),
            ]
        )
    )
    stream = spark.readStream.schema("value string").text(str(d_in)).withColumnRenamed(
        "value", "payload"
    )
    qb = publish_to_bronze(stream, str(tmp_path / "b"), str(tmp_path / "ckb"), step=60)
    qb.processAllAvailable()
    qb.stop()
    qc = append_series_catalog_stream(
        spark, str(tmp_path / "b"), str(tmp_path / "cat"), str(tmp_path / "ckc")
    )
    qc.processAllAvailable()
    # second chunk: one replayed series + one new one
    (d_in / "c2.txt").write_text(payload("cpu", "www", 1700000120) + "\n" + payload("mem", "www", 1700000000))
    qb2 = publish_to_bronze(stream, str(tmp_path / "b"), str(tmp_path / "ckb"), step=60)
    qb2.processAllAvailable()
    qb2.stop()
    qc.processAllAvailable()
    qc.stop()

    cat = read_series_catalog(spark, str(tmp_path / "cat"))
    rows = {(r["k_name"], r["k_app"]) for r in cat.collect()}
    assert rows == {("cpu", "www"), ("disk", "db"), ("mem", "www")}
    assert cat.count() == 3  # duplicates folded


def test_graph_png(engine):
    """format=png: a real PNG with plotted pixels (minimal renderer, not
    atlas-chart parity)."""
    import struct
    import zlib

    png = engine.graph_png(
        "/api/v1/graph?q=:true,:sum,(,name,),:by&s=2024-01-02&e=2024-01-03"
        "&layout=image",
        width=320,
        height=160,
    )
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (320, 160)
    # decode scanlines and confirm non-background pixels exist (lines drawn)
    idat = png[png.index(b"IDAT") + 4 :]
    raw = zlib.decompress(idat[: idat.index(b"IEND") - 8])
    non_bg = sum(
        1
        for y in range(h)
        for x in range(w)
        if raw[y * (w * 3 + 1) + 1 + x * 3 : y * (w * 3 + 1) + 4 + x * 3] not in (b"\xff\xff\xff",)
    )
    assert non_bg > 500


def test_normalize(engine):
    out = engine.normalize(":true,a,b,:eq,:and,:sum")
    assert out == ["a,b,:eq,:sum"]
    out = engine.normalize("name,x,:eq,:false,:or,:sum,name,y,:eq,:avg")
    assert out[0] == "name,x,:eq,:sum"
    assert out[1] == "name,y,:eq,:avg"


def test_graph_no_data_line(engine):
    g = engine.graph("/api/v1/graph?q=name,missing,:eq,:sum&s=2024-01-02&e=2024-01-03")
    assert len(g.lines) == 1
    assert g.lines[0].label == "NO DATA"
    assert all(v is None for v in g.lines[0].data)


def test_graph_multi_offset(engine):
    g = engine.graph(
        "/api/v1/graph?q=name,click,:eq,:sum,(,0h,1d,),:offset&s=2024-01-03&e=2024-01-04"
    )
    assert len(g.lines) == 2
    off_tags = sorted(ln.tags.get("atlas.offset", "") for ln in g.lines)
    assert off_tags == ["", "1d"]
    assert any("(offset=1d)" in ln.label for ln in g.lines)


def test_graph_bad_query(engine):
    with pytest.raises(Exception):
        engine.graph("/api/v1/graph?q=name,:frobnicate")
    with pytest.raises(ValueError):
        engine.graph("/api/v1/graph?e=2024-01-01&s=2024-01-05&q=42,:const")


def test_render_formats(engine):
    base = "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03"
    j = engine.render(base + "&format=json")
    assert j["legend"] and j["values"]
    # v2.json: graph-image (base64 data URI) leads unless the no-image
    # hint is set, then graph-metadata, plot-metadata per axis, lines
    v2 = engine.render(base + "&format=v2.json")
    assert v2[0]["type"] == "graph-image"
    assert v2[0]["data"].startswith("data:image/png;base64,")
    assert v2[1]["type"] == "graph-metadata" and v2[2]["type"] == "plot-metadata"
    assert v2[1]["legendType"] == "LABELS_WITH_STATS"
    assert (v2[1]["width"], v2[1]["height"], v2[1]["zoom"]) == (700, 300, 1.0)
    assert v2[2]["scale"] == "LINEAR" and v2[2]["upper"] == "auto-style"
    ts = v2[3]
    assert ts["type"] == "timeseries" and ts["data"]["values"]
    assert len(ts["color"]) == 8 and ts["lineStyle"] == "LINE"
    nov2 = engine.render(base + "&format=v2.json&hints=no-image")
    assert nov2[0]["type"] == "graph-metadata"
    assert nov2[0]["renderingHints"] == ["no-image"]
    # plot ids are DENSE over the axes in use (plots.zipWithIndex): a
    # graph whose only lines sit on axis 1 has ONE plot with id 0
    ax1 = engine.render(
        "/api/v1/graph?q=name,click,:eq,:sum,1,:axis"
        "&s=2024-01-02&e=2024-01-03&format=v2.json&hints=no-image"
    )
    plots = [m for m in ax1 if m["type"] == "plot-metadata"]
    assert [m["id"] for m in plots] == [0]
    assert all(m["plot"] == 0 for m in ax1 if m["type"] == "timeseries")
    st = engine.render(base + "&format=stats.json")
    s = st["stats"][0]
    # json values are rows per TIMESTAMP; series 0 = column 0, missing
    # spelled "NaN" (JsonGraphEngine via the std.json quoting)
    vals = [row[0] for row in j["values"] if row[0] != "NaN"]
    assert s["count"] == len(vals)
    assert abs(s["total"] - sum(vals)) < 1e-9
    assert s["max"] == max(vals) and s["min"] == min(vals) and s["last"] == vals[-1]
    txt = engine.render(base + "&format=txt")
    assert "\t" in txt.splitlines()[0]
    csv = engine.render(base + "&format=csv")
    assert csv.splitlines()[0].startswith('"timestamp",')
    png = engine.render(base + "&format=png")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_stats_json_empty_line_nan_quoted(engine):
    """StatsJsonGraphEngine writes avg/total/max/min/last for EVERY
    line; an empty line (SummaryStats.empty) carries count=0 and
    "NaN"-quoted stats rather than omitting the keys."""
    st = engine.render(
        "/api/v1/graph?q=name,nosuchname,:eq,:sum&s=2024-01-02&e=2024-01-03"
        "&format=stats.json"
    )
    s = st["stats"][0]
    assert s["count"] == 0
    for k in ("avg", "total", "max", "min", "last"):
        assert s[k] == "NaN"


def test_expr_queries_endpoint(engine):
    qs = engine.queries(
        "name,click,:eq,:sum,name,view,:eq,:max,:add,name,click,:eq,:count"
    )
    assert qs == sorted({"name,click,:eq", "name,view,:eq"})


def test_expr_strip_endpoint(engine):
    out = engine.strip("name,click,:eq,bucket,u1,:eq,:and,:sum", {"bucket"})
    assert out == ["name,click,:eq,:sum"]
    # stripping the only clause leaves :true
    out2 = engine.strip("bucket,u1,:eq,:sum", {"bucket"})
    assert out2 == [":true,:sum"]


def test_expr_strip_vocab_layers(engine):
    """Repeated `r` parameter (ExprApi.scala:238-261 stripVocabulary):
    `filter` unwraps :stat/:filter/:topk-family nodes anywhere in the
    tree, `style` unwraps the style settings, both compose with `k`
    stripping; unsupported layers error."""
    import pytest

    # :stat stripped
    assert engine.strip(
        "name,click,:eq,:sum,max,:stat", set(), ("filter",)
    ) == ["name,click,:eq,:sum"]
    # :topk (priority filter) stripped, group-by kept
    assert engine.strip(
        "name,click,:eq,:sum,(,name,),:by,max,2,:topk", set(), ("filter",)
    ) == ["name,click,:eq,:sum,(,name,),:by"]
    # :filter stripped (predicate side dropped with the node)
    assert engine.strip(
        "name,click,:eq,:sum,:stat-avg,50,:gt,:filter", set(), ("filter",)
    ) == ["name,click,:eq,:sum"]
    # style settings unwrapped
    assert engine.strip(
        "name,click,:eq,:sum,2,:lw", set(), ("style",)
    ) == ["name,click,:eq,:sum"]
    # both layers + key strip compose
    assert engine.strip(
        "name,click,:eq,bucket,u1,:eq,:and,:sum,max,:stat,2,:lw",
        {"bucket"},
        ("filter", "style"),
    ) == ["name,click,:eq,:sum"]
    # no r params: unchanged behavior
    assert engine.strip("name,click,:eq,:sum,max,:stat", set()) == [
        "name,click,:eq,:sum,max,:stat"
    ]
    with pytest.raises(ValueError, match="vocabulary 'math' not supported"):
        engine.strip("name,click,:eq,:sum", set(), ("math",))


def test_expr_rewrite_endpoint(engine):
    """ExprApi.rewrite parity (ExprApi.scala:350-385): migrate the
    deprecated list-form style offset to the data variant."""
    # no offsets: canonical display
    assert engine.rewrite("name,cpu,:eq,:sum") == ["name,cpu,:eq,:sum"]
    # single zero offset: setting removed
    assert engine.rewrite("name,cpu,:eq,:sum,(,0h,),:offset") == [
        "name,cpu,:eq,:sum"
    ]
    # single non-zero: data-variant :offset, spelling preserved
    assert engine.rewrite("name,cpu,:eq,:sum,(,1w,),:offset") == [
        "name,cpu,:eq,:sum,1w,:offset"
    ]
    # multiple: base bound to QueryN, one :get per duration
    assert engine.rewrite("name,cpu,:eq,:sum,(,0h,1w,),:offset") == [
        "Query0,name,cpu,:eq,:sum,:set,Query0,:get,Query0,:get,1w,:offset"
    ]
    # other style settings survive on the base expression
    assert engine.rewrite("name,cpu,:eq,:sum,2,:lw,(,1d,),:offset") == [
        "name,cpu,:eq,:sum,2,:lw,1d,:offset"
    ]
    # multi-expression programs index their variables
    out = engine.rewrite(
        "name,a,:eq,:sum,(,0h,1w,),:offset,name,b,:eq,:max,(,0h,1d,),:offset"
    )
    assert out[0].startswith("Query0,") and out[1].startswith("Query1,")
    # EMPTY offset list: expression returned unchanged (canonical display
    # — Nil renders as `(,,)`, Scala mkString("(,", ",", ",)") on Nil),
    # never a dangling :set with no :get (ExprApi.scala:360-363 Nil case)
    assert engine.rewrite("name,cpu,:eq,:sum,(,),:offset") == [
        "name,cpu,:eq,:sum,(,,),:offset"
    ]
    # durations re-render canonically (Strings.toString: 120s -> 2m,
    # 86400s -> 1d) in both single and multi forms
    assert engine.rewrite("name,cpu,:eq,:sum,(,120s,),:offset") == [
        "name,cpu,:eq,:sum,2m,:offset"
    ]
    assert engine.rewrite("name,cpu,:eq,:sum,(,0h,PT120S,),:offset") == [
        "Query0,name,cpu,:eq,:sum,:set,Query0,:get,Query0,:get,2m,:offset"
    ]


def test_expr_complete_endpoint(engine):
    # candidates are the reference's descriptor objects
    # (ExprApi.scala:175-179): {name, signature, description}
    cands = engine.complete("name,click,:eq")
    assert all({"name", "signature", "description"} == set(c) for c in cands)
    words = {c["name"] for c in cands}
    assert "sum" in words and "count" in words
    sig = next(c for c in cands if c["name"] == "sum")
    assert sig["signature"] and sig["description"]
    # excluded-words parity (reference.conf expr.complete.excluded-words):
    # always-matching / deprecated words are never suggested
    assert "not" not in words and "des" not in words
    empty = {c["name"] for c in engine.complete("")}
    assert "pi" in empty  # nullary words always apply
    assert "true" not in empty  # excluded (always matches)
    assert "dup" not in empty  # empty stack: nothing to dup


def test_expr_vocab_scoping(engine):
    """Layered `vocab` parameter (ExprApi.scala:47-73): the interpreter
    and, for complete, the candidate pool are scoped to the named
    vocabulary + its dependency chain; debug additionally verifies the
    result stack against the layer's contract (verifyStackContents)."""
    import pytest

    # a data word under the query-only vocabulary is unknown
    with pytest.raises(ValueError, match="unknown word ':sum'"):
        engine.debug("name,cpu,:eq,:sum", vocab="query")
    with pytest.raises(ValueError, match="unknown word ':sum'"):
        engine.normalize("name,cpu,:eq,:sum", vocab="query")
    # query vocab: exactly one query must remain on the stack
    steps = engine.debug("name,cpu,:eq", vocab="query")
    assert steps[-1]["context"]["stack"] == ["name,cpu,:eq"]
    with pytest.raises(ValueError, match="expected a single query"):
        engine.debug("name,cpu,:eq,name,disk,:eq", vocab="query")
    with pytest.raises(ValueError, match="stack is empty"):
        engine.debug(":clear", vocab="query")
    # std vocab accepts any stack; data words are still unknown there
    assert engine.debug("a,b", vocab="std")
    with pytest.raises(ValueError, match="unknown word ':eq'"):
        engine.debug("name,cpu,:eq", vocab="std")
    # full chain works under its own layer
    assert engine.debug("name,cpu,:eq,:sum", vocab="data")
    assert engine.normalize("name,cpu,:eq,:sum,$name,:legend", vocab="style")
    # complete scopes the candidate pool: the query layer offers :eq on
    # two strings but never :sum on a query; the default pool offers :sum
    q_words = {c["name"] for c in engine.complete("name,cpu", vocab="query")}
    assert "eq" in q_words and "sum" not in q_words
    full = {c["name"] for c in engine.complete("name,cpu,:eq")}
    assert "sum" in full
    # queries endpoint under a scoped vocab
    assert engine.queries("name,cpu,:eq,:sum", vocab="data") == ["name,cpu,:eq"]
    # unknown vocabulary name is a clear error
    with pytest.raises(ValueError, match="unknown vocabulary"):
        engine.debug("name,cpu,:eq", vocab="bogus")


def test_expr_debug_endpoint(engine):
    # the trace INCLUDES the initial state (Interpreter.scala:159-170:
    # debugImpl seeds with Step(program, context)), so steps = tokens + 1
    steps = engine.debug("name,click,:eq,:sum")
    assert len(steps) == 5
    assert steps[0]["context"]["stack"] == []
    assert steps[0]["program"] == ["name", "click", ":eq", ":sum"]
    assert steps[1]["context"]["stack"] == ["name"]
    assert steps[3]["context"]["stack"] == ["name,click,:eq"]
    assert steps[4]["context"]["stack"] == ["name,click,:eq,:sum"]
    assert steps[4]["program"] == []


def test_graph_multi_tz(engine):
    """Repeated tz params: first zone drives expression semantics (the
    `tz` interpreter var), all zones land in GraphResult.timezones and get
    their own axis row in the PNG (Grapher.scala:169-196,
    GraphDef.timezones).  Window pinned with explicit-zone literals so
    the span shift is isolated from the (also tz-driven) window shift."""
    base = (
        "/api/v1/graph?q=2024-01-02,2024-01-03,:time-span"
        "&s=2024-01-02T00:00Z&e=2024-01-03T00:00Z"
    )
    g = engine.graph(base + "&tz=US/Pacific&tz=UTC")
    assert g.timezones == ["US/Pacific", "UTC"]
    # expression semantics follow the FIRST zone (Pacific): first 8 h out
    assert g.lines[0].data[:8] == [0.0] * 8
    assert g.lines[0].data[8] == 1.0
    assert "timezones" not in g.to_json()  # JsonGraphEngine has no tz key

    # two-zone PNG is taller in its axis region than a one-zone PNG and
    # renders different tick labels; structural check: both parse as PNG
    # and differ in content
    png1 = engine.graph_png(base + "&tz=US/Pacific", width=320, height=160)
    png2 = engine.graph_png(base + "&tz=US/Pacific&tz=UTC", width=320, height=160)
    assert png1[:8] == b"\x89PNG\r\n\x1a\n" and png2[:8] == png1[:8]
    assert png1 != png2


def test_v2_json_heatmap_block(engine):
    """v2.json emits a heatmap message for plots carrying heatmap lines
    (JsonCodec.writeHeatmapDef): cell-count grid + yTicks reconstruct
    the renderer's cells; with a heatmap_palette, colorTicks map count
    segments to the palette colors."""
    from atlas_spark.api import Engine
    from atlas_spark.sources.datapoints import percentile_datapoints

    pct_engine = Engine(
        engine.spark,
        source=percentile_datapoints(engine.spark, "/root/testdata/sf0.01"),
    )
    uri = (
        "/api/v1/graph?q=name,click,:eq,:sum,:percentiles-heatmap"
        "&s=2024-01-02&e=2024-01-03&format=v2.json&hints=no-image"
        "&heatmap_palette=reds&heatmap_label=reqs"
    )
    msgs = pct_engine.render(uri)
    hms = [m for m in msgs if m["type"] == "heatmap"]
    assert len(hms) == 1
    hm = hms[0]
    assert hm["plot"] == 0 and hm["label"] == "reqs"
    assert hm["colorScale"] == "LINEAR"
    n_steps = (
        [m for m in msgs if m["type"] == "graph-metadata"][0]["endTime"]
        - [m for m in msgs if m["type"] == "graph-metadata"][0]["startTime"]
    ) // [m for m in msgs if m["type"] == "graph-metadata"][0]["step"]
    vals = hm["data"]["values"]
    assert hm["data"]["type"] == "heatmap"
    # JsonCodec.writeHeatmapDef asymmetry: one yTick entry per tick,
    # one MORE data column for the open [t_last, axis-max] bucket
    assert len(vals) == n_steps and len(vals[0]) == len(hm["yTicks"]) + 1
    assert sum(c for row in vals for c in row) > 0
    # yTicks tile the axis range contiguously
    for a, b in zip(hm["yTicks"], hm["yTicks"][1:]):
        assert a["max"] == b["min"]
    assert len(hm["colorTicks"]) == 7  # reds palette has 7 colors
    assert all(len(t["color"]) == 8 for t in hm["colorTicks"])
    # heatmap lines still emit as timeseries with lineStyle HEATMAP
    assert any(
        m["type"] == "timeseries" and m["lineStyle"] == "HEATMAP" for m in msgs
    )


def test_graph_png_heatmap(engine):
    """:percentiles-heatmap renders heatmap cells: the PNG must contain
    gradient-colored pixels (red channel ramp) that neither the palette
    lines nor the grid produce."""
    import struct
    import zlib

    from atlas_spark.api import Engine
    from atlas_spark.sources.datapoints import percentile_datapoints

    pct_engine = Engine(
        engine.spark, source=percentile_datapoints(engine.spark, "/root/testdata/sf0.01")
    )
    png = pct_engine.graph_png(
        "/api/v1/graph?q=name,click,:eq,:sum,:percentiles-heatmap"
        "&s=2024-01-02&e=2024-01-03",
        width=320,
        height=160,
    )
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", png[16:24])
    idat = png[png.index(b"IDAT") + 4 :]
    raw = zlib.decompress(idat[: idat.index(b"IEND") - 8])
    heat_px = 0
    for y in range(h):
        row = raw[y * (w * 3 + 1) + 1 : (y + 1) * (w * 3 + 1)]
        for x in range(w):
            r, g, b = row[x * 3 : x * 3 + 3]
            # heatmap ramp: r=0xF0 with g==scaled, b==scaled (g/b < 0xE0)
            if r == 0xF0 and g < 0xE0 and b < 0xD1 and (g or b):
                heat_px += 1
    assert heat_px > 50, heat_px


def test_fetch_sse_chunked_stateful(engine):
    """Chunked SSE fetch carries stateful-op state across chunk
    boundaries: a :rolling-sum evaluated in 6-step chunks must equal the
    one-shot graph evaluation (FetchRequestSource EvalFlow semantics)."""
    uri = (
        "/api/v1/fetch?q=name,click,:eq,:sum,3,:rolling-sum"
        "&s=2024-01-02&e=2024-01-03"
    )
    one_shot = engine.graph(uri.replace("/fetch", "/graph"))
    truth = one_shot.lines[0].data

    msgs = list(engine.fetch_sse(uri, chunk_steps=6))
    assert msgs[0]["type"] == "graph-metadata"
    assert msgs[-1]["type"] == "close"
    ts = [m for m in msgs if m["type"] == "timeseries"]
    assert len(ts) == 4  # 24 steps / 6 per chunk
    stitched = []
    for m in ts:
        stitched.extend(m["data"]["values"])
    assert len(stitched) == len(truth)
    for a, b in zip(stitched, truth):
        if a is None or b is None:
            assert a == b
        else:
            assert abs(a - b) < 1e-9


def test_fetch_sse_parity_at_coarse_auto_step(engine):
    """Auto-step (GraphConfig.stepSize) coarsens the effective step when
    the window outgrows the pixel budget; the SSE chunker's lookback and
    chunk-grid math must run at THAT step, so stitched chunked values
    still equal the one-shot evaluation (the r4 lookback tests predate
    auto-step and only covered step == storage step)."""
    # 30d window at w=300 -> 720 hourly cells / 300 px -> 3h effective
    # step (test_resolve_auto_step_from_width); 7-step chunks do NOT
    # divide the 240-cell range, exercising the tail chunk too
    uri = "/api/v1/fetch?q=name,click,:eq,:sum,4,:rolling-sum&s=e-30d&w=300"
    one_shot = engine.graph(uri.replace("/fetch", "/graph"))
    assert one_shot.step == 3 * 3600
    truth = one_shot.lines[0].data

    msgs = list(engine.fetch_sse(uri, chunk_steps=7))
    meta = msgs[0]
    assert meta["step"] == 3 * 3600 * 1000
    ts = [m for m in msgs if m["type"] == "timeseries"]
    stitched = []
    for m in ts:
        assert (m["end"] - m["start"]) // meta["step"] == len(m["data"]["values"])
        stitched.extend(m["data"]["values"])
    assert len(stitched) == len(truth) == 240
    for a, b in zip(stitched, truth):
        if a is None or b is None:
            assert a == b
        else:
            assert abs(a - b) < 1e-9


def test_render_png_size_params(engine):
    """`w`/`h` URL params size the PNG like the reference's GraphFlags,
    clamped to sane limits."""
    import struct

    base = (
        "/api/v1/graph?q=:true,:sum&s=2024-01-02&e=2024-01-03&format=png"
        "&layout=image"
    )
    png = engine.render(base + "&w=420&h=180")
    assert struct.unpack(">II", png[16:24]) == (420, 180)
    png2 = engine.render(base + "&w=999999&h=1")
    assert struct.unpack(">II", png2[16:24]) == (2000, 64)


def test_render_png_zoom(engine):
    """`zoom` scales both dimensions (GraphFlags.zoom)."""
    import struct

    base = (
        "/api/v1/graph?q=:true,:sum&s=2024-01-02&e=2024-01-03&format=png"
        "&layout=image"
    )
    png = engine.render(base + "&w=300&h=150&zoom=2")
    assert struct.unpack(">II", png[16:24]) == (600, 300)


def test_cq_param_applies_to_all_exprs(engine):
    """The `cq` URL param ANDs a common query onto every expression
    (Grapher.scala:163-168) — unlike the :cq word it also hits frozen
    parts."""
    base = "/api/v1/graph?s=2024-01-02&e=2024-01-03"
    plain = engine.graph(base + "&q=:true,:sum")
    scoped = engine.graph(base + "&q=:true,:sum&cq=name,click,:eq")
    direct = engine.graph(base + "&q=name,click,:eq,:sum")
    assert scoped.lines[0].data == direct.lines[0].data
    assert scoped.lines[0].data != plain.lines[0].data
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cq"):
        engine.graph(base + "&q=:true,:sum&cq=:true,:sum")


def test_axis_per_line_param(engine):
    """axis_per_line=1 gives each line its own y-axis."""
    g = engine.graph(
        "/api/v1/graph?q=:true,:sum,(,name,),:by&s=2024-01-02&e=2024-01-03"
        "&axis_per_line=1"
    )
    axes = [ln.settings.get("axis") for ln in g.lines]
    assert axes == [str(min(i, 4)) for i in range(len(g.lines))]
    png = engine.graph_png(
        "/api/v1/graph?q=:true,:sum,(,name,),:by&s=2024-01-02&e=2024-01-03"
        "&axis_per_line=1",
        width=400,
        height=220,
    )
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_graph_window_outside_default(engine):
    """An explicit e BEFORE the testdata window still resolves s=e-3h
    against the RAW parsed end (the old EvalContext-based ref clamped e
    to the default window and rejected the URI)."""
    g = engine.graph("/api/v1/graph?e=2012-01-01T00:00&q=name,click,:eq,:sum")
    assert g.end - g.start == 3 * 3600
    assert g.end == 1325376000


def test_graph_substep_window_covers_cell(engine):
    """A window shorter than one source step renders one interval: both
    instants floor to the same cell and the window extends BACKWARD one
    step (FetchRequestSource.scala:164-169 adjustedStart = rs - step),
    serving [end_f - step, end_f) instead of erroring with an empty
    range."""
    g = engine.graph("/api/v1/graph?e=2024-01-02T19:52&q=minuteOfHour,:time&s=e-10m")
    assert g.end - g.start == 3600
    assert g.start % 3600 == 0
    # cell-choice parity: ends at the floored end instant (19:00)
    assert g.end == 1704222000


def test_graph_end_before_start_rejected(engine):
    """Raw end earlier than raw start is rejected BEFORE flooring (both
    flooring into one cell must not mask a reversed window)."""
    import pytest

    with pytest.raises(ValueError, match="before start"):
        engine.graph(
            "/api/v1/graph?s=2024-01-02T19:52&e=2024-01-02T19:42&q=name,click,:eq,:sum"
        )


def test_graph_coarse_step_rounds_up_the_ladder(engine):
    """An explicit `step` that is not an allowed ladder size rounds UP to
    the next rung (Step.round via GraphConfig.roundedStepSize:70-76),
    never down to an arbitrary storage multiple: 7h -> 8h.  Ladder steps
    divide the day, so window rounding stays aligned."""
    g = engine.graph("/api/v1/graph?step=7h&q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03")
    assert g.step == 8 * 3600
    assert g.start % g.step == 0 and g.end % g.step == 0


def test_graph_rejects_invalid_sizes_axes_and_stack_garbage(engine):
    """GrapherSuite parity: non-positive w/h are client errors (never
    clamped); axis ids beyond max-yaxes=5 (0-4) are rejected; a leftover
    non-presentation stack item fails the parse with the reference's
    message rather than being silently dropped."""
    import pytest

    w = "s=2024-01-02&e=2024-01-03"
    for p in ("w=0", "w=-5", "h=0", "h=-5"):
        with pytest.raises(ValueError, match="must be positive"):
            engine.render(f"/api/v1/graph?q=name,click,:eq,:sum&{w}&{p}&format=png")
    with pytest.raises(ValueError, match="invalid axis id"):
        engine.render(
            f"/api/v1/graph?q=(,0,1,2,3,4,6,),(,:dup,:axis,),:each&{w}&format=png"
        )
    with pytest.raises(ValueError, match="expecting time series expr, found String 'foo'"):
        engine.graph(f"/api/v1/graph?q=name,click,:eq,:sum,(,name,),:by,foo&{w}")


def test_v2_json_round_trip_recreates_image(engine):
    """The v2.json contract is that the payload 'can be used to
    precisely recreate the image' (V2JsonGraphEngine header): decoding
    the message stream (from_v2_json, the JsonCodec.readGraphDef role)
    and re-rendering yields the SAME PNG as rendering the original
    GraphResult — styles, resolved colors, axes config, legend, theme
    and warnings all survive the round trip."""
    from atlas_spark.api import from_v2_json
    from atlas_spark.chart import render_png

    # lines already in plot-grouped order: the v2 stream groups lines
    # by plot (JsonCodec writes plot.data per plot), so decode order ==
    # original order only for plot-grouped inputs
    uri = (
        "/api/v1/graph?q="
        "name,click,:eq,:sum,f00,:color,2,:lw,"
        ":true,:count,40,:alpha,"
        "name,view,:eq,:sum,1,:axis,:area"
        "&s=2024-01-02&e=2024-01-03&scale.1=log&u=500&tick_labels=binary"
        "&theme=dark&ylabel=events"
    )
    g = engine.graph(uri)
    rt = from_v2_json(g.to_v2_json(width=320, height=160))
    assert render_png(rt, 320, 160) == render_png(g, 320, 160)
    # data fidelity: gaps and values identical line-for-line
    assert [ln.data for ln in rt.lines] == [ln.data for ln in g.lines]
    assert [ln.tags for ln in rt.lines] == [ln.tags for ln in g.lines]


def test_json_explain_block(engine):
    """format=json carries the explain block when collector stats are
    known (JsonGraphEngine.scala:77-92): input scan accounting rides the
    collect actions as Observation metrics (CollectMetrics in the same
    job, no extra Spark job)."""
    j = engine.render(
        "/api/v1/graph?q=:true,:sum,(,name,),:by&s=2024-01-02&e=2024-01-03"
        "&format=json"
    )
    ex = j["explain"]
    assert ex["graphLines"] == len(j["legend"]) == 5
    assert ex["intermediateLines"] == 5
    # the scan saw at least one input line per output group and at
    # least one datapoint per non-gap output cell
    assert ex["inputLines"] >= 5
    assert ex["inputDatapoints"] >= sum(
        1 for row in j["values"] for v in row if v != "NaN"
    )
    # lines * steps — consistent with len(values) (our [start,end) window)
    assert ex["graphDatapoints"] == 5 * 24 == len(j["values"]) * 5
    assert ex["dataFetchTime"] >= 0
    # generator-only graphs have no scans -> stats unknown, no explain
    g2 = engine.render(
        "/api/v1/graph?q=42,:const&s=2024-01-02&e=2024-01-03&format=json"
    )
    assert "explain" not in g2
    # v2.json graph-metadata carries the stats object (JsonCodec)
    v2 = engine.render(
        "/api/v1/graph?q=:true,:sum,(,name,),:by&s=2024-01-02&e=2024-01-03"
        "&format=v2.json&hints=no-image"
    )
    meta = [m for m in v2 if m["type"] == "graph-metadata"][0]
    assert meta["stats"]["inputLines"] >= 5
    assert meta["stats"]["outputLines"] == 5


def test_v2_canvas_dims_not_floor_distorted(engine):
    """graph-metadata width/height are the clamped PRE-zoom canvas dims
    (GraphDef fields), parsed directly — not divided back out of the
    64px-floored image size (w=65&zoom=0.1 would otherwise report 640)."""
    v2 = engine.render(
        "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03"
        "&format=v2.json&hints=no-image&w=65&h=80&zoom=0.1"
    )
    meta = [m for m in v2 if m["type"] == "graph-metadata"][0]
    assert (meta["width"], meta["height"], meta["zoom"]) == (65, 80, 0.1)
    # clamps still apply with their notices
    v2b = engine.render(
        "/api/v1/graph?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03"
        "&format=v2.json&hints=no-image&w=5000&zoom=9"
    )
    metab = [m for m in v2b if m["type"] == "graph-metadata"][0]
    assert (metab["width"], metab["zoom"]) == (2000, 2.0)
    assert any("Restricted" in w for w in metab["warnings"])


def test_v2_json_heatmap_round_trip(engine):
    """Heatmap graphs round-trip too: the heatmap message carries the
    color config (palette via colorTicks, scale, bounds, label), so
    decode + re-render matches the original PNG byte-for-byte."""
    from atlas_spark.api import Engine, from_v2_json
    from atlas_spark.chart import render_png
    from atlas_spark.sources.datapoints import percentile_datapoints

    pct_engine = Engine(
        engine.spark,
        source=percentile_datapoints(engine.spark, "/root/testdata/sf0.01"),
    )
    uri = (
        "/api/v1/graph?q=name,click,:eq,:sum,:percentiles-heatmap"
        "&s=2024-01-02&e=2024-01-03"
        "&heatmap_palette=reds&heatmap_label=reqs&heatmap_scale=log"
    )
    g = pct_engine.graph(uri)
    rt = from_v2_json(g.to_v2_json(width=320, height=160))
    assert render_png(rt, 320, 160) == render_png(g, 320, 160)


def test_json_explain_covers_rewrite_paths(engine):
    """The rollup/condagg binary rewrites scan without _eval_data; their
    scans are recorded too, so a rewrite-only json graph still carries
    an explain block with non-zero input counts."""
    j = engine.render(
        "/api/v1/graph?q=name,click,:eq,:sum,(,bucket,),:by,"
        "name,view,:eq,:sum,(,bucket,),:by,:fsub"
        "&s=2024-01-02&e=2024-01-03&format=json"
    )
    ex = j["explain"]
    assert ex["inputLines"] > 0 and ex["inputDatapoints"] > 0
