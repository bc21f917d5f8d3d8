"""HTTP serving layer tests (atlas_spark/http_api.py vs the reference's
atlas-webapi routes: GraphApi, TagsApi, ExprApi, PublishApi)."""

from __future__ import annotations

import json
import os
import time
import urllib.request
from urllib.error import HTTPError

import pytest
import pyspark.sql.functions as F

from atlas_spark.api import Engine
from atlas_spark import http_api
from atlas_spark.streaming.validation import rejection_reason


@pytest.fixture(scope="module")
def served(spark, sf_dir, tmp_path_factory):
    spool = str(tmp_path_factory.mktemp("spool"))
    engine = Engine(spark, sf_dir)
    srv, thread = http_api.start(engine, port=0, spool_dir=spool)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, engine, spool
    srv.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url) as resp:
        return resp.status, dict(resp.headers), resp.read()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except HTTPError as e:
        return e.code, e.read()


GRAPH_Q = "q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03"


def test_graph_png(served):
    base, _, _ = served
    status, headers, body = _get(f"{base}/api/v1/graph?{GRAPH_Q}&format=png")
    assert status == 200
    assert headers["Content-Type"] == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_graph_json_matches_engine(served):
    base, engine, _ = served
    status, headers, body = _get(f"{base}/api/v1/graph?{GRAPH_Q}")
    assert status == 200
    assert headers["Content-Type"] == "application/json"
    got = json.loads(body)
    want = json.loads(json.dumps(engine.render(f"/api/v1/graph?{GRAPH_Q}")))
    # dataFetchTime is wall time — nondeterministic between two renders
    # (the reference's loadTime varies the same way)
    for d in (got, want):
        d.get("explain", {}).pop("dataFetchTime", None)
    assert got == want


def test_graph_csv_content_type(served):
    base, engine, _ = served
    status, headers, body = _get(f"{base}/api/v1/graph?{GRAPH_Q}&format=csv")
    assert status == 200
    assert headers["Content-Type"] == "text/csv"
    assert body.decode() == engine.render(f"/api/v1/graph?{GRAPH_Q}&format=csv")


def test_graph_bad_expr_is_diagnostic_message(served):
    base, _, _ = served
    req = urllib.request.Request(f"{base}/api/v1/graph?q=name,click,:eq,:bogusword")
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    msg = json.loads(ei.value.read())
    assert msg["type"] == "error"
    assert "bogusword" in msg["message"]


def test_unknown_path_404(served):
    base, _, _ = served
    req = urllib.request.Request(f"{base}/api/v1/nope")
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 404


# ------------------------------------------------------------------- tags


def test_tags_keys(served):
    base, engine, _ = served
    status, headers, body = _get(f"{base}/api/v1/tags")
    assert status == 200
    keys = json.loads(body)
    assert keys == sorted(engine.source.colmap)


def test_tags_values_with_query_and_txt(served):
    base, _, _ = served
    status, headers, body = _get(
        f"{base}/api/v1/tags/name?q=name,click,:eq&format=txt"
    )
    assert status == 200
    assert headers["Content-Type"].startswith("text/plain")
    assert body.decode() == "click"


def test_tags_paging_offset_header(served):
    base, _, _ = served
    status, headers, body = _get(f"{base}/api/v1/tags/name?limit=2")
    assert status == 200
    page1 = json.loads(body)
    assert len(page1) == 2
    off = headers[http_api.OFFSET_HEADER]
    assert off == page1[-1]
    status, headers2, body2 = _get(f"{base}/api/v1/tags/name?limit=100&offset={off}")
    page2 = json.loads(body2)
    assert page1 + page2 == sorted(set(page1 + page2))
    assert http_api.OFFSET_HEADER not in headers2


def test_tags_verbose(served):
    base, _, _ = served
    status, _, body = _get(f"{base}/api/v1/tags?verbose=1&limit=5000")
    rows = json.loads(body)
    assert {"key", "value", "count"} == set(rows[0])
    assert any(r["key"] == "name" and r["value"] == "click" for r in rows)


# ------------------------------------------------------------------- expr


def test_expr_debug_and_normalize(served):
    base, _, _ = served
    _, _, body = _get(f"{base}/api/v1/expr?q=name,click,:eq,:sum")
    steps = json.loads(body)
    assert steps and {"program", "context"} == set(steps[0])
    _, _, body = _get(f"{base}/api/v1/expr/normalize?q=name,click,:eq,:sum")
    assert json.loads(body) == ["name,click,:eq,:sum"]


def test_expr_queries_and_strip(served):
    base, _, _ = served
    _, _, body = _get(
        f"{base}/api/v1/expr/queries?q=name,click,:eq,:sum,name,view,:eq,:max"
    )
    assert json.loads(body) == ["name,click,:eq", "name,view,:eq"]
    _, _, body = _get(f"{base}/api/v1/expr/strip?q=name,click,:eq,:sum&k=name")
    assert json.loads(body) == [":true,:sum"]
    # repeated r params strip vocabulary layers (filter then style)
    _, _, body = _get(
        f"{base}/api/v1/expr/strip?q=name,click,:eq,:sum,max,:stat,2,:lw"
        "&r=filter&r=style"
    )
    assert json.loads(body) == ["name,click,:eq,:sum"]
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(
            f"{base}/api/v1/expr/strip?q=name,click,:eq,:sum&r=query"
        )
    assert ei.value.code == 400
    _, _, body = _get(
        f"{base}/api/v1/expr/rewrite?q=name,click,:eq,:sum,(,1w,),:offset"
    )
    assert json.loads(body) == ["name,click,:eq,:sum,1w,:offset"]


def test_expr_complete(served):
    base, _, _ = served
    _, _, body = _get(f"{base}/api/v1/expr/complete?q=name,click,:eq")
    names = [c["name"] if isinstance(c, dict) else c for c in json.loads(body)]
    assert "sum" in names or ":sum" in names


def test_expr_missing_q_400(served):
    base, _, _ = served
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(f"{base}/api/v1/expr/normalize")
    assert ei.value.code == 400


def test_expr_vocab_param(served):
    """`vocab` scoping on /api/v1/expr/* (ExprApi.scala:47-73): a data
    word under vocab=query is the reference-shaped 400 error; the same
    program passes under its own layer and the default is unchanged."""
    base, _, _ = served
    q = "name,click,:eq,:sum"
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(f"{base}/api/v1/expr/debug?q={q}&vocab=query")
    assert ei.value.code == 400
    err = json.loads(ei.value.read())
    assert err["type"] == "error" and "unknown word ':sum'" in err["message"]
    _, _, body = _get(f"{base}/api/v1/expr/debug?q={q}&vocab=data")
    assert json.loads(body)
    _, _, body = _get(f"{base}/api/v1/expr/debug?q={q}")
    assert json.loads(body)
    # complete: the query layer never offers data words
    _, _, body = _get(f"{base}/api/v1/expr/complete?q=name,click&vocab=query")
    names = [c["name"] if isinstance(c, dict) else c for c in json.loads(body)]
    assert "sum" not in names and "eq" in names
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(f"{base}/api/v1/expr/normalize?q={q}&vocab=bogus")
    assert ei.value.code == 400


# -------------------------------------------------------------- fetch SSE


def test_fetch_sse_framing_matches_engine(served):
    base, engine, _ = served
    uri = f"/api/v2/fetch?q=name,click,:eq,:sum&s=2024-01-02&e=2024-01-03"
    with urllib.request.urlopen(base + uri) as resp:
        assert resp.headers["Content-Type"] == "text/event-stream"
        raw = resp.read().decode()
    frames = [f for f in raw.split("\n\n") if f]
    assert all(f.startswith("data: ") for f in frames)
    msgs = [json.loads(f[len("data: ") :]) for f in frames]
    direct = [json.loads(json.dumps(m)) for m in engine.fetch_sse(uri)]
    assert msgs == direct
    assert msgs[-1]["type"] == "close"


def test_fetch_sse_bad_request_is_clean_400(served):
    """fetch_sse is lazy; request errors must surface as a 400
    DiagnosticMessage BEFORE any 200/SSE headers are committed."""
    base, _, _ = served
    for uri in ("/api/v2/fetch", "/api/v2/fetch?q=name,click,:eq,:bogusword"):
        req = urllib.request.Request(base + uri)
        with pytest.raises(HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert ei.value.headers["Content-Type"] == "application/json"
        msg = json.loads(ei.value.read())
        assert msg["type"] == "error"


def test_post_unknown_path_keeps_connection_framing(served):
    """A 404 on POST must drain the request body so a keep-alive
    connection isn't corrupted; the next request on the same connection
    must still parse."""
    import http.client

    base, _, _ = served
    host = base[len("http://") :]
    conn = http.client.HTTPConnection(host, timeout=10)
    try:
        body = json.dumps({"pad": "x" * 2048})
        conn.request("POST", "/api/v1/nope", body=body)
        resp = conn.getresponse()
        assert resp.status == 404
        resp.read()
        # reuse the same socket: a clean second request proves the body
        # bytes were not left in the stream
        conn.request("GET", "/healthcheck")
        resp2 = conn.getresponse()
        assert resp2.status == 200
        assert resp2.read() == b"ok"
    finally:
        conn.close()


def test_data_plane_concurrency_tags_not_serialized(served):
    """A long graph render in flight must not serialize an /api/v1/tags
    lookup (or a publish) behind it: the server threads map onto
    concurrent Spark jobs (per-route scheduler pools under FAIR).  Bound:
    tags + publish finish while the render is still running, and in a
    small fraction of the render's wall clock."""
    import threading

    base, _, _ = served
    # warm both paths so the measured latencies are execution, not plan
    # compilation
    heavy = (
        f"{base}/api/v1/graph?q=name,:has,(,name,bucket,),:by,10,0.1,0.02,:des,"
        f"name,:has,(,25,50,90,),:percentiles&s=2024-01-01&e=2024-01-07&format=json"
    )
    _get(heavy)
    _get(f"{base}/api/v1/tags?verbose=1")

    render_done = threading.Event()
    render_t = {}

    def render():
        t0 = time.perf_counter()
        _get(heavy)
        render_t["sec"] = time.perf_counter() - t0
        render_done.set()

    t = threading.Thread(target=render)
    t.start()
    time.sleep(0.05)  # let the render job enter the scheduler first
    t0 = time.perf_counter()
    status, _, _ = _get(f"{base}/api/v1/tags?verbose=1")
    tags_sec = time.perf_counter() - t0
    assert status == 200
    tags_finished_first = not render_done.is_set()
    t1 = time.perf_counter()
    status, _ = _post(f"{base}/api/v1/publish", _payload([_metric()]))
    publish_sec = time.perf_counter() - t1
    assert status == 200
    t.join(timeout=60)
    assert "sec" in render_t, "render never finished"
    # the request plane must interleave: if tags/publish had been
    # serialized behind the render they would take >= its remaining
    # wall-clock; require they ran while it was still in flight (or the
    # render was too fast for the race to mean anything)
    assert tags_finished_first or render_t["sec"] < 0.5, (
        f"tags waited out the render: tags={tags_sec:.2f}s "
        f"render={render_t['sec']:.2f}s"
    )
    assert publish_sec < 2.0, f"publish serialized behind render: {publish_sec:.2f}s"


def test_tags_reference_suite_pins(served):
    """TagsApiSuite parity (TagsApiSuite.scala:68-119): a trailing slash
    is the same keys listing as no slash (pathEndOrSingleSlash,
    TagsApi.scala:53-60); non-positive or non-numeric limits are client
    errors (Request requires limit > 0, TagsApi.scala:145); the
    next-offset header is absent on a non-full page."""
    base, _, _ = served
    _, _, plain = _get(f"{base}/api/v1/tags")
    status, _, slash = _get(f"{base}/api/v1/tags/")
    assert status == 200 and json.loads(slash) == json.loads(plain)
    for bad in ("foo", "-1", "0"):
        with pytest.raises(HTTPError) as ei:
            urllib.request.urlopen(f"{base}/api/v1/tags?limit={bad}")
        assert ei.value.code == 400, bad
    # non-full page: no resume header
    status, headers, body = _get(f"{base}/api/v1/tags?limit=5000")
    assert status == 200
    assert not any(k.lower() == "x-nflx-atlas-next-offset" for k in headers)


# --------------------------------------------------------------- publish


def _payload(metrics):
    return json.dumps({"tags": {"app": "www"}, "metrics": metrics}).encode()


def _metric(name="server.requests", ts=None, value=1.0, **extra_tags):
    ts = int(time.time() * 1000) if ts is None else ts
    return {"tags": {"name": name, **extra_tags}, "timestamp": ts, "value": value}


def test_publish_ok_and_spool(served):
    base, _, spool = served
    before = set(os.listdir(spool))
    status, body = _post(f"{base}/api/v1/publish", _payload([_metric()]))
    assert status == 200
    new = set(os.listdir(spool)) - before
    assert len(new) == 1
    line = json.loads(open(os.path.join(spool, new.pop())).read())
    dp = line["metrics"][0]
    # common tags merged in, ready for the bronze text-stream decode
    assert dp["tags"]["app"] == "www" and dp["tags"]["name"] == "server.requests"


def test_publish_partial_202(served):
    base, _, spool = served
    before = set(os.listdir(spool))
    bad = _metric(name="server.requests")
    bad["tags"]["x!"] = "boom"
    status, body = _post(f"{base}/api/v1/publish", _payload([_metric(), bad]))
    assert status == 202
    msg = json.loads(body)
    assert msg["type"] == "partial" and msg["errorCount"] == 1
    assert "invalid characters in key" in msg["message"][0]
    # valid half still spooled
    assert len(set(os.listdir(spool)) - before) == 1


def test_publish_all_rejected_400(served):
    base, _, spool = served
    before = set(os.listdir(spool))
    status, body = _post(
        f"{base}/api/v1/publish",
        json.dumps({"metrics": [{"tags": {"no_name": "x"}, "timestamp": int(time.time() * 1000), "value": 1}]}).encode(),
    )
    assert status == 400
    msg = json.loads(body)
    assert msg["type"] == "error" and msg["errorCount"] == 1
    assert set(os.listdir(spool)) == before


def test_publish_empty_400(served):
    base, _, _ = served
    status, body = _post(f"{base}/api/v1/publish", b"")
    assert status == 400
    assert json.loads(body)["message"] == "empty payload"
    status, _ = _post(f"{base}/api/v1/publish-fast", _payload([_metric()]))
    assert status == 200


def test_publish_age_gate(served):
    base, _, _ = served
    status, body = _post(
        f"{base}/api/v1/publish", _payload([_metric(ts=1_000_000)])
    )
    assert status == 400
    assert "data is too old" in json.loads(body)["message"][0]


# ------------------------------------------------ validation twin parity


CASES = [
    {"name": "ok.metric", "app": "www"},
    {"app": "www"},                                   # missing name
    {"name": "ok", "k": "v"},                          # key length 1
    {"name": "x"},                                     # name value too short
    {"name": "ok.metric", "big": "v" * 121},           # other value too long
    {"name": "ok.metric", "bad key": "v"},             # invalid key chars
    {"name": "ok.metric", "k2": "bad value!"},         # invalid value chars
    {"name": "ok.metric", **{f"k{i:02d}": "v" for i in range(21)}},  # >20 user
    {"name": "ok.metric", "atlas.bogus": "v"},         # reserved atlas.*
    {"name": "ok.metric", "nf.bogus": "v"},            # reserved nf.*
    {"name": "ok.metric", "atlas.dstype": "rate", "nf.app": "www"},  # allowed
    {"name": "ok.metric", "nf.vpc": "vpc-123"},    # nf.vpc allowed (ref conf)
    {"name": "a" * 255, "zz": "v" * 120},              # boundary lengths ok
    {"name": "a" * 256},                               # name too long
    {"aa": "v", "name": "ok.metric", "ab cd": "v", "a!a": "v"},  # min bad key
]


def test_rejection_reason_py_matches_column_rules(served, spark):
    rows = [(json.dumps(t), t) for t in CASES]
    df = spark.createDataFrame(
        [(r[0],) for r in rows], "tags_json string"
    ).select(F.from_json("tags_json", "map<string,string>").alias("tags"))
    spark_reasons = [
        r["reason"] for r in df.select(rejection_reason(F.col("tags")).alias("reason")).collect()
    ]
    py_reasons = [http_api.rejection_reason_py(t) for _, t in rows]
    assert py_reasons == spark_reasons


def test_graph_host_header_restriction(spark, sf_dir, tmp_path_factory):
    """rewriteBasedOnHost wiring (Grapher.scala:90-101): the request's Host
    header becomes the graph URI authority, so a host matching the
    engine's host-rewrite config restricts every expression; the default
    local host does not match and leaves results unchanged."""
    spool = str(tmp_path_factory.mktemp("spool_host"))
    engine = Engine(
        spark,
        sf_dir,
        host_rewrite={"pattern": r"^view\.([^.]+)\.example\.com$", "key": "bucket"},
    )
    srv, thread = http_api.start(engine, port=0, spool_dir=spool)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        url = f"{base}/api/v1/graph?{GRAPH_Q}"
        req = urllib.request.Request(url)
        req.add_header("Host", "view.u1.example.com")
        with urllib.request.urlopen(req) as resp:
            restricted = json.loads(resp.read())
        _, _, plain = _get(url)
        explicit = json.loads(
            json.dumps(
                engine.render(
                    "/api/v1/graph?q=name,click,:eq,bucket,u1,:eq,:and,:sum"
                    "&s=2024-01-02&e=2024-01-03"
                )
            )
        )
        assert restricted["values"] == explicit["values"]
        assert restricted["values"] != json.loads(plain)["values"]
    finally:
        srv.shutdown()


# -------------------------------------- optional (config-activated) rules


OPT_RULES = [
    {"rule": "key-pattern", "pattern": r"[a-z][a-zA-Z0-9._]*"},
    {"rule": "value-pattern", "pattern": r"[a-zA-Z0-9]"},
    {"rule": "value-length", "min-length": 2, "max-length": 10},
    {
        "rule": "composite-tag",
        "rules": [
            {"rule": "value-length", "min-length": 1, "max-length": 20},
            {"rule": "value-pattern", "pattern": r"[^~]*$"},
        ],
    },
]

OPT_CASES = [
    {"name": "ok.metric", "app": "www"},                    # all pass
    {"name": "ok.metric", "Xapp": "www"},                   # key-pattern reject
    {"name": "ok.metric", "app": "~www"},                   # value-pattern reject
    {"name": "ok.metric", "app": "averylongvalue"},         # value too long
    {"name": "ok", "app": "www"},                           # boundary min length accepted
    # '~' is default-chain-valid, starts alnum, len<=10 -> only the
    # composite's sub-pattern rejects it
    {"name": "ok.metric", "app": "abc~def"},
]


def test_optional_rules_both_planes_parity(spark):
    """KeyPatternRule / ValuePatternRule / ValueLengthRule /
    CompositeTagRule (atlas-core validation/*.scala): the SAME TagRuleSpec
    objects evaluate as Columns on the streaming plane and as Python on
    the publish driver — results must agree message-for-message, accept
    and reject alike."""
    from atlas_spark.streaming.validation import specs_from_config

    specs = specs_from_config(OPT_RULES)
    rows = [(json.dumps(t), t) for t in OPT_CASES]
    df = spark.createDataFrame([(r[0],) for r in rows], "tags_json string").select(
        F.from_json("tags_json", "map<string,string>").alias("tags")
    )
    spark_reasons = [
        r["reason"]
        for r in df.select(
            rejection_reason(F.col("tags"), OPT_RULES).alias("reason")
        ).collect()
    ]
    py_reasons = [http_api.rejection_reason_py(t, specs) for _, t in rows]
    assert py_reasons == spark_reasons
    # at least one accept and one reject per rule family exercised
    assert spark_reasons[0] is None
    assert "key doesn't match pattern" in spark_reasons[1]
    assert "value doesn't match pattern" in spark_reasons[2]
    assert "value too long" in spark_reasons[3]
    assert spark_reasons[4] is None
    assert spark_reasons[5] == "value doesn't match pattern '[^~]*$': [abc~def]"


def test_optional_rules_messages_match_reference_shapes(spark):
    from atlas_spark.streaming.validation import (
        key_pattern_spec,
        value_length_spec,
        value_pattern_spec,
    )

    ks = key_pattern_spec(r"[a-z]+")
    assert ks.py({"name": "ok.metric", "BAD": "v"}) == (
        "key doesn't match pattern '[a-z]+': [BAD]"
    )
    vs = value_pattern_spec(r"[a-z]+")
    assert vs.py({"name": "ok.metric", "app": "123"}) == (
        "value doesn't match pattern '[a-z]+': [123]"
    )
    vl = value_length_spec(2, 5)
    assert vl.py({"name": "toolong"}) == "value too long: name = [toolong] (7 > 5)"
    assert vl.py({"name": "x"}) == "value too short: name = [x] (1 < 2)"
    # key-pattern is a WHOLE-match (Java Matcher.matches)
    assert ks.py({"name": "ok", "abcX": "v"}) is not None
    # value-pattern is start-anchored (spectator PatternMatcher / :re)
    assert vs.py({"name": "ok", "app": "abc123"}) is None


def test_optional_rules_streaming_split(spark):
    """validate_publish with extra_rules splits accept/reject on the
    Column plane with the configured optional chain."""
    from atlas_spark.streaming.validation import validate_publish

    df = spark.createDataFrame(
        [(json.dumps(t),) for t in OPT_CASES], "tags_json string"
    ).select(F.from_json("tags_json", "map<string,string>").alias("tags"))
    valid, rejected = validate_publish(df, extra_rules=OPT_RULES)
    from atlas_spark.streaming.validation import specs_from_config

    specs = specs_from_config(OPT_RULES)
    py_ok = sum(
        1 for t in OPT_CASES if http_api.rejection_reason_py(t, specs) is None
    )
    assert valid.count() == py_ok == 2
    assert rejected.count() == len(OPT_CASES) - py_ok


def test_publish_endpoint_with_optional_rules(spark, sf_dir, tmp_path_factory):
    """HTTP publish twin: a server started with validation_rules rejects a
    payload the default chain accepts, with the optional rule's message."""
    spool = str(tmp_path_factory.mktemp("spool_opt"))
    engine = Engine(spark, sf_dir)
    srv, thread = http_api.start(
        engine,
        port=0,
        spool_dir=spool,
        validation_rules=[{"rule": "key-pattern", "pattern": r"[a-z][a-zA-Z0-9._]*"}],
    )
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        now = int(time.time() * 1000)
        payload = {
            "metrics": [
                {"tags": {"name": "ok.metric", "app": "www"}, "timestamp": now, "value": 1.0},
                {"tags": {"name": "ok.metric", "Xapp": "www"}, "timestamp": now, "value": 1.0},
            ]
        }
        status, body = _post(f"{base}/api/v1/publish", json.dumps(payload).encode())
        assert status == 202, (status, body)
        msg = json.loads(body)
        assert any("key doesn't match pattern" in m for m in msg.get("message", [])), msg
    finally:
        srv.shutdown()


def test_graph_caller_id_sanitized_counter(spark, sf_dir, tmp_path_factory):
    """Grapher.scala:79-87: the caller id (id param / Origin header) tags
    per-caller request counters, sanitized so machine-generated ids
    collapse to 'default' instead of exploding cardinality
    (IdParamSanitizer)."""
    spool = str(tmp_path_factory.mktemp("spool_ids"))
    srv, thread = http_api.start(Engine(spark, sf_dir), port=0, spool_dir=spool)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        _get(f"{base}/api/v1/graph?{GRAPH_Q}&id=MyDash")
        _get(f"{base}/api/v1/graph?{GRAPH_Q}&id=1.2.3.4")
        # a real browser Origin: the HOSTNAME is sanitized, not the raw
        # header (Cors.normalizedOrigin extracts it before the
        # sanitizer — the scheme colon would otherwise match ':')
        req = urllib.request.Request(f"{base}/api/v1/graph?{GRAPH_Q}")
        req.add_header("Origin", "https://FooApp.example.com")
        with urllib.request.urlopen(req):
            pass
        # an id param that sanitizes away still falls back to Origin
        # (Grapher.scala:78-84 tests config.id AFTER sanitization)
        req = urllib.request.Request(f"{base}/api/v1/graph?{GRAPH_Q}&id=1.2.3.4")
        req.add_header("Origin", "BarApp")
        with urllib.request.urlopen(req):
            pass
        assert srv.graph_request_counts == {
            "mydash": 1, "default": 1, "fooapp.example.com": 1, "barapp": 1,
        }
    finally:
        srv.shutdown()


def test_expr_reference_suite_pins(served):
    """Endpoint behaviors pinned by the reference's ExprApiSuite
    (ExprApiSuite.scala:52-170): unsupported regex features are client
    errors, the debug trace includes the initial state (tokens + 1
    steps), and trailing non-expression stack garbage under the default
    vocabulary is a 400 (verifyStackContents with the graph vocab)."""
    base, _, _ = served

    def status(path):
        try:
            with urllib.request.urlopen(base + path) as r:
                return r.status, r.read()
        except HTTPError as e:
            return e.code, e.read()

    # inline regex flags / back references -> 400 ((?i) = %28%3Fi%29, \1 = %5C1)
    assert status("/api/v1/expr/normalize?q=a,%28%3Fi%29b,:re")[0] == 400
    assert status("/api/v1/expr/normalize?q=a,%5C1,:re")[0] == 400
    # debug includes the initial step: 3 tokens -> 4 steps
    st, body = status("/api/v1/expr?q=name,sps,:eq")
    assert st == 200 and len(json.loads(body)) == 4
    st, body = status(
        "/api/v1/expr/debug?q=name,sps,:eq,:sum,$name,:legend,foo,:sset,foo,:get"
    )
    assert st == 200 and len(json.loads(body)) == 11
    # trailing garbage / empty stack under the default vocab -> 400
    assert status("/api/v1/expr/debug?q=name,sps,:eq,:sum,$name,:legend,foo")[0] == 400
    assert (
        status("/api/v1/expr/debug?q=name,sps,:eq,:sum,$name,:legend,foo,:clear")[0]
        == 400
    )
    # normalize applies the ExprNormalizer pipeline end-to-end
    st, body = status(
        "/api/v1/expr/normalize?q=name,sps,:eq,:dup,2,:mul,:swap"
    )
    assert st == 200
    assert json.loads(body) == ["name,sps,:eq,:sum,2.0,:mul", "name,sps,:eq,:sum"]


def test_graph_error_image_for_browsers(served):
    """A failed png graph request from a browser returns the error AS an
    image with 200 OK (GraphRequestActor.scala:49-84, GraphApiMemDbSuite
    'sendError image if browser'); non-browser agents get the JSON
    DiagnosticMessage 400, txt format stays an error status."""
    base, _, _ = served
    agent = "Mozilla/5.0 (Android; Mobile; rv:13.0) Gecko/13.0 Firefox/13.0"
    req = urllib.request.Request(
        f"{base}/api/v1/graph?q=:foo&format=png", headers={"User-Agent": agent}
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/png"
        assert resp.read()[:8] == b"\x89PNG\r\n\x1a\n"
    # non-browser agent: JSON diagnostic 400
    req = urllib.request.Request(
        f"{base}/api/v1/graph?q=:foo&format=png", headers={"User-Agent": "java"}
    )
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    err = json.loads(ei.value.read())
    assert err["type"] == "error" and "unknown word" in err["message"]
    # browser but non-image format: still an error status
    req = urllib.request.Request(
        f"{base}/api/v1/graph?q=:foo&format=txt", headers={"User-Agent": agent}
    )
    with pytest.raises(HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400


def test_graph_error_image_requires_valid_config(served):
    """The error-image path only applies when the request CONFIG is
    well-formed (GraphRequestActor's `request != null`): a missing q or a
    non-positive/non-numeric size stays a 400 even for a browser, and a
    bad size never masks the original error."""
    base, _, _ = served
    agent = "Mozilla/5.0 Gecko/13.0 Firefox/13.0"
    for p in ("format=png", "q=:foo&format=png&w=0", "q=:foo&format=png&w=abc"):
        req = urllib.request.Request(
            f"{base}/api/v1/graph?{p}", headers={"User-Agent": agent}
        )
        with pytest.raises(HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400, p


def test_render_partitions_caps_render_session(spark, sf_dir):
    """render_partitions=N routes graph/fetch through a CLONED session
    whose shuffle width is capped (r13 concurrency finding a: one render
    fans across every core, so concurrent renders queue at cluster
    capacity).  The main session's conf must be untouched, and a real
    render through the server must still work."""
    engine = Engine(spark, sf_dir)
    srv, _t = http_api.start(engine, port=0, render_partitions=4)
    try:
        re = srv.render_engine
        assert re is not engine and re.spark is not engine.spark
        assert re.spark.conf.get("spark.sql.shuffle.partitions") == "4"
        # main session keeps the scale-adaptive width from configure_existing
        # (local-bench floor 32, never below the session's slot count)
        slots = engine.spark.sparkContext.defaultParallelism
        assert engine.spark.conf.get("spark.sql.shuffle.partitions") == str(
            max(32, slots)
        )
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        status, _, body = _get(f"{base}/api/v1/graph?{GRAPH_Q}&format=png")
        assert status == 200 and body[:4] == b"\x89PNG"[:4]
        # tags stay on the main (interactive) engine
        status, _, body = _get(f"{base}/api/v1/tags/name")
        assert status == 200 and json.loads(body)
    finally:
        srv.shutdown()


def test_render_partitions_default_auto_caps(spark, sf_dir):
    """serve()/start() WITHOUT the arg default to the auto cap
    max(2, cores//4) — library users get the measured concurrency
    behavior, not the saturating single session; 0 disables."""
    engine = Engine(spark, sf_dir)
    srv, _t = http_api.start(engine, port=0)
    try:
        re = srv.render_engine
        assert re is not engine and re.spark is not engine.spark
        cores = spark.sparkContext.defaultParallelism
        expect = max(2, cores // 4)
        assert re.spark.conf.get("spark.sql.shuffle.partitions") == str(expect)
    finally:
        srv.shutdown()
    srv, _t = http_api.start(engine, port=0, render_partitions=0)
    try:
        assert srv.render_engine is engine
    finally:
        srv.shutdown()


def test_render_partitions_custom_source_not_cloned(spark, sf_dir):
    """An engine with a CUSTOM source (or DataFrame catalog) must not be
    cloned — the rebuilt clone would silently render the default events
    source instead (the clone path rebuilds from sf_dir alone)."""
    from atlas_spark.sources.datapoints import events_datapoints

    src = events_datapoints(spark, sf_dir)
    engine = Engine(spark, sf_dir, source=src)
    srv, _t = http_api.start(engine, port=0, render_partitions=4)
    try:
        assert srv.render_engine is engine
    finally:
        srv.shutdown()
