"""HTTP serving layer over the Engine — reference atlas-webapi parity.

Routes (GraphApi.scala:37-58, TagsApi.scala:52-61, ExprApi.scala:55-87,
PublishApi.scala:50-60):

  GET  /api/v1/graph            rendered graph; `format` picks the engine
                                (png | csv | txt | json | std.json |
                                v2.json | stats.json) with the reference
                                content types (GraphEngine.contentType)
  GET  /api/v2/fetch            SSE stream of chunked line data
                                (FetchRequestSource.scala:160-162 framing:
                                `data: {json}\\n\\n`)
  GET  /api/v1/tags[/{key}]     tag discovery with paging; next-page token
                                in the `x-nflx-atlas-next-offset` header
                                (TagsApi.scala:131)
  GET  /api/v1/expr             stack-language introspection; sub-paths
       [/debug /normalize /complete /queries /strip /rewrite]
  POST /api/v1/publish          validate + spool; 200 all-accepted,
       /api/v1/publish-fast     202 partial (type=partial FailureMessage),
                                400 all-rejected/empty
                                (LocalPublishActor.scala:52-64)

Errors are DiagnosticMessage JSON `{"type": "error", "message": ...}`
with status 400 for user errors (DiagnosticMessage.scala:55-58).

Spark-first split: the REQUEST plane (parse, route, per-request publish
validation) is driver-side Python, exactly the role the reference gives
its pekko actors; the DATA plane stays distributed — graph/tags/fetch
execute on the shared SparkSession (Spark sessions are thread-safe for
concurrent actions, so the threading server maps requests onto
concurrent Spark jobs; set `spark.scheduler.mode=FAIR` in production so
a big render can't starve tag lookups), and accepted publish payloads
are spooled one-JSON-per-line for the Structured Streaming bronze sink
(`streaming/sink.publish_to_bronze`), which re-runs the SAME rule set
as Column expressions at ingest scale.  The synchronous validation here
is a driver-side twin of `streaming/validation.py` (parity-tested in
tests/test_http_api.py) so clients get the reference's 200/202/400
semantics without a per-request Spark job.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from .api import Engine

OFFSET_HEADER = "x-nflx-atlas-next-offset"

# ---------------------------------------------------------------------------
# Driver-side validation twin of streaming/validation.py (same rules, same
# messages, same first-failure short-circuit).  The Column versions use
# array_min over the failing keys, so "first" means lexicographically
# smallest failing key — mirrored here.

_VALID_CHARS = re.compile(r"^[-._A-Za-z0-9^~]*$")
_RESTRICTED_PREFIXES = ("atlas.", "nf.")
_ALLOWED_RESERVED = {
    "atlas.": ("aggr", "dstype", "offset", "legacy"),
    "nf.": (
        "account", "ami", "app", "asg", "cluster", "container", "country",
        "country.rollup", "job", "node", "process", "region", "shard1",
        "shard2", "stack", "subnet", "task", "vmtype", "vpc", "zone",
    ),
}
MAX_USER_TAGS = 20

# PublishApi.scala:75-80 age gate.  The reference default max-age is one
# step interval (1 minute); 24h is a deliberate relaxation here because the
# spool-based pipeline replays batches, so callers may override per-request
# semantics via validate_batch(max_age_ms=...).
MAX_DATAPOINT_AGE_MS = 86_400_000


def rejection_reason_py(tags: dict, extra_specs=()) -> str | None:
    """First failing rule's reason, None when valid.

    Must stay message-for-message identical to
    `streaming.validation.rejection_reason` (parity-tested).
    `extra_specs` are config-activated optional rules
    (validation.specs_from_config) evaluated after the default chain via
    each spec's Python form — the same TagRuleSpec objects drive the
    streaming Column plane."""
    if "name" not in tags:
        return "missing key 'name'"
    bad = min((k for k in tags if not 2 <= len(k) <= 60), default=None)
    if bad is not None:
        return f"key length out of [2,60]: [{bad}]"
    bad = min(
        (
            k
            for k, v in tags.items()
            if not (2 <= len(v) <= 255 if k == "name" else 1 <= len(v) <= 120)
        ),
        default=None,
    )
    if bad is not None:
        return f"value length out of range: {bad} = [{tags[bad]}]"
    bad = min((k for k in tags if not _VALID_CHARS.match(k)), default=None)
    if bad is not None:
        return f"invalid characters in key: [{bad}]"
    bad = min((k for k, v in tags.items() if not _VALID_CHARS.match(v)), default=None)
    if bad is not None:
        return f"invalid characters in value: {bad} = [{tags[bad]}]"
    n_user = sum(
        1 for k in tags if not any(k.startswith(p) for p in _RESTRICTED_PREFIXES)
    )
    if n_user > MAX_USER_TAGS:
        return f"too many user tags: {n_user} > {MAX_USER_TAGS}"
    for prefix, allowed in _ALLOWED_RESERVED.items():
        full = {prefix + a for a in allowed}
        bad = min(
            (k for k in tags if k.startswith(prefix) and k not in full),
            default=None,
        )
        if bad is not None:
            return f"invalid key for reserved prefix '{prefix}': {bad}"
    for spec in extra_specs:
        reason = spec.py(tags)
        if reason is not None:
            return reason
    return None


def decode_publish_batch(payload: dict) -> list[tuple[dict, int, float]]:
    """Request-plane decode of a publish payload: merge common tags with
    per-metric tags (metric wins — norm.decode_publish_payloads parity)
    and return (tags, timestamp_ms, value) tuples."""
    common = payload.get("tags") or {}
    out = []
    for m in payload.get("metrics") or []:
        tags = {**common, **(m.get("tags") or {})}
        ts = m.get("timestamp", m.get("start"))
        value = m.get("value", m.get("values"))
        if isinstance(value, list):
            value = value[0] if value else None
        out.append((tags, ts, value))
    return out


def validate_batch(
    datapoints: list[tuple[dict, int, float]],
    now_ms: int | None = None,
    max_age_ms: int = MAX_DATAPOINT_AGE_MS,
    extra_rules=(),
) -> tuple[list, list[tuple[str, dict]]]:
    """PublishApi.validate parity: age gate first, then the rule set.
    Returns (valid, [(reason, tags), ...])."""
    from .streaming.validation import specs_from_config

    extra_specs = specs_from_config(extra_rules)
    now = int(time.time() * 1000) if now_ms is None else now_ms
    good, bad = [], []
    for tags, ts, value in datapoints:
        if ts is None:
            bad.append(("missing timestamp", tags))
            continue
        diff = now - int(ts)
        if diff > max_age_ms:
            bad.append(
                (
                    f"data is too old: now = {now}, timestamp = {ts}, "
                    f"{diff} > {max_age_ms}",
                    tags,
                )
            )
            continue
        if diff < -max_age_ms:
            bad.append((f"data is from future: now = {now}, timestamp = {ts}", tags))
            continue
        reason = rejection_reason_py(tags, extra_specs)
        if reason is None:
            good.append((tags, ts, value))
        else:
            bad.append((reason, tags))
    return good, bad


def failure_message(level: str, failures: list[tuple[str, dict]]) -> dict:
    """PublishApi.FailureMessage: level, count, first-5 summaries."""
    summary = [
        f"{reason} (tags={json.dumps(tags, sort_keys=True, separators=(',', ':'))})"
        for reason, tags in failures[:5]
    ]
    return {"type": level, "errorCount": len(failures), "message": summary}


# ---------------------------------------------------------------------------


def _parse_tag_query(q: str, step: int):
    """TagsApi `q` param: a stack program that must leave exactly one
    query on the stack (TagsApi.toDbRequest -> expectation of a single
    TagQuery)."""
    from .model import query as Qm
    from .stacklang.interpreter import Context, split_and_trim
    from .stacklang.vocab import default_interpreter

    interp = default_interpreter(step)
    ctx = Context(interp)
    interp.execute_program(split_and_trim(q), ctx)
    queries = [v for v in ctx.stack if isinstance(v, Qm.Query)]
    if len(queries) != 1:
        raise ValueError(f"expected a single query, found {len(queries)}")
    return queries[0]


# web-browser detection for the error-image path
# (atlas-eval reference.conf:171 browser-agent-pattern)
_BROWSER_AGENT_RE = re.compile(
    "mozilla|msie|gecko|chrome|opera|webkit", re.IGNORECASE
)

_GRAPH_CONTENT_TYPES = {
    "png": "image/png",
    "csv": "text/csv",
    "txt": "text/plain",
    "json": "application/json",
    "std.json": "application/json",
    "v2.json": "application/json",
    "stats.json": "application/json",
}


class AtlasHandler(BaseHTTPRequestHandler):
    """One request-plane handler; Spark work happens via self.server.engine."""

    protocol_version = "HTTP/1.1"
    server_version = "atlas-spark"

    # silence default stderr access log (opt back in via server.verbose)
    def log_message(self, fmt, *args):
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    # ------------------------------------------------------------- helpers

    def _send(self, status: int, body: bytes, ctype: str, headers: dict | None = None):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _json(self, status: int, obj, headers: dict | None = None):
        self._send(
            status,
            json.dumps(obj).encode(),
            "application/json",
            headers,
        )

    def _error(self, status: int, message: str):
        self._json(status, {"type": "error", "message": message})

    def _set_pool(self, name: str | None) -> None:
        """Tag this request thread's Spark jobs with a scheduler pool.
        Requests run on per-connection threads, so the local property
        scopes cleanly; under spark.scheduler.mode=FAIR (set by serve()'s
        recommended config / main()) a long render job then round-robins
        with tag lookups instead of starving them.  No-op under FIFO.
        Dispatch resets with None first: the thread-local otherwise
        leaks the previous request's pool across a keep-alive
        connection to routes that assign none."""
        try:
            self.server.engine.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", name
            )
        except Exception:
            pass

    # -------------------------------------------------------------- routes

    def do_GET(self):  # noqa: N802 (stdlib API)
        parsed = urlparse(self.path)
        path = parsed.path.rstrip("/") or "/"
        self._set_pool(None)  # clear pool inherited from a prior request
        try:
            if path == "/api/v1/graph":
                self._set_pool("render")
                return self._graph()
            if path == "/api/v2/fetch":
                self._set_pool("render")
                return self._fetch_sse()
            if path == "/api/v1/tags" or path.startswith("/api/v1/tags/"):
                self._set_pool("interactive")
                return self._tags(parsed)
            if path.startswith("/api/v1/expr"):
                return self._expr(parsed)
            if path == "/lwc/api/v1/expressions" or path.startswith(
                "/lwc/api/v1/expressions/"
            ):
                return self._lwc_expressions(path)
            if path.startswith("/api/v2/subscribe/"):
                return self._lwc_subscribe_sse(parsed)
            if path == "/api/v1/streams" or path.startswith("/api/v1/streams/"):
                return self._lwc_streams(path)
            if path == "/api/v1/lsp/glossary":
                from . import lsp

                return self._json(200, {"words": lsp.GLOSSARY})
            if path == "/healthcheck":
                return self._send(200, b"ok", "text/plain")
            return self._error(404, f"unknown path: {path}")
        except (ValueError, KeyError, TypeError, NotImplementedError) as e:
            return self._error(400, f"{type(e).__name__}: {e}")

    def do_POST(self):  # noqa: N802
        path = urlparse(self.path).path.rstrip("/")
        self._set_pool(None)  # clear pool inherited from a prior request
        try:
            if path in ("/api/v1/publish", "/api/v1/publish-fast"):
                return self._publish()
            if path == "/lwc/api/v1/evaluate":
                return self._lwc_evaluate()
            if path.startswith("/api/v2/subscribe/"):
                return self._lwc_subscribe_post(path)
            if path in ("/api/v1/lsp/analyze", "/api/v1/lsp/analyze-uri"):
                return self._lsp_analyze(uri_mode=path.endswith("-uri"))
            # Unconsumed body bytes would be parsed as the start of the next
            # keep-alive request on this connection — drain before erroring.
            self._drain_body()
            return self._error(404, f"unknown path: {path}")
        except (ValueError, KeyError, TypeError) as e:
            return self._error(400, f"{type(e).__name__}: {e}")

    def _drain_body(self):
        length = int(self.headers.get("Content-Length") or 0)
        if length:
            self.rfile.read(length)
        else:
            self.close_connection = True

    # --------------------------------------------------------------- graph

    def _graph(self):
        qs = parse_qs(urlparse(self.path).query)
        fmt = qs.get("format", ["json"])[0]
        ctype = _GRAPH_CONTENT_TYPES.get(fmt)
        if ctype is None:
            return self._error(400, f"unknown graph format {fmt!r}")
        # per-caller request telemetry: the caller id comes from the `id`
        # param or the Origin header, sanitized so machine-generated ids
        # (UUIDs, IPs, instance ids) collapse to "default" instead of
        # exploding counter cardinality (Grapher.scala:79-87 +
        # IdParamSanitizer)
        from .util.id_sanitizer import sanitize

        # the Origin fallback applies whenever the id RESOLVES to
        # "default" — including an id param that sanitized away (e.g.
        # id=1.2.3.4) — not only when the param is absent
        # (Grapher.scala:78-84 checks config.id == "default" after
        # toGraphConfig already sanitized the param)
        caller = sanitize(qs.get("id", ["default"])[0])
        if caller == "default" and self.headers.get("Origin"):
            # the reference sanitizes the HOSTNAME, not the raw header
            # (Cors.normalizedOrigin extracts Uri(origin).authority.host
            # before IdParamSanitizer — the scheme colon would otherwise
            # collapse every real browser Origin to "default")
            origin = self.headers["Origin"]
            if origin.startswith(("http:", "https:")):
                origin = urlparse(origin).hostname or origin
            caller = sanitize(origin)
        counts = getattr(self.server, "graph_request_counts", None)
        if counts is not None:
            counts[caller] = counts.get(caller, 0) + 1
        # forward the request's Host as the URI authority so the engine's
        # host-view rewrite sees it (Grapher.scala rewriteBasedOnHost reads
        # the Host header; urlparse().hostname strips any :port)
        host = (self.headers.get("Host") or "").strip()
        uri = f"http://{host}{self.path}" if host else self.path
        try:
            out = self.server.render_engine.render(uri)
        except Exception as e:  # noqa: BLE001 — browser error-image path
            # Browsers asking for an image get the error rendered AS an
            # image with 200 OK (GraphRequestActor.scala:49-84 +
            # DefaultSettings.browserAgentPattern) — but only when the
            # request CONFIG itself is well-formed (the reference's
            # `request != null`: toGraphConfig builds q/w/h eagerly, so a
            # missing q or a bad size is a plain 400 even for browsers).
            agent = self.headers.get("User-Agent") or ""

            def _dim_ok(name: str, default: int) -> int | None:
                try:
                    v = int(qs.get(name, [str(default)])[0])
                except (TypeError, ValueError):
                    return None
                return v if v > 0 else None

            w, h = _dim_ok("w", 700), _dim_ok("h", 300)
            config_ok = "q" in qs and w is not None and h is not None
            if config_ok and fmt == "png" and _BROWSER_AGENT_RE.search(agent):
                from .chart import error_png

                user = isinstance(e, (ValueError, KeyError, TypeError))
                body = error_png(
                    f"{type(e).__name__}: {e}", w, h, user_error=user
                )
                return self._send(200, body, "image/png")
            raise
        if isinstance(out, bytes):
            body = out
        elif isinstance(out, str):
            body = out.encode()
        else:
            body = json.dumps(out).encode()
        self._send(200, body, ctype)

    # ----------------------------------------------------------- fetch SSE

    def _fetch_sse(self):
        # Body framed as `data: {json}\n\n` per message and terminated by
        # connection close (reference uses chunked; close-delimited is the
        # stdlib-friendly equivalent and legal for HTTP/1.1 responses).
        #
        # fetch_sse is a lazy generator, so request errors (missing q, bad
        # expression) surface on FIRST iteration.  Pull the first message
        # before committing the 200 status line so those become a clean 400
        # DiagnosticMessage instead of a corrupted in-flight stream; errors
        # after the first message can only be handled by closing the
        # connection (the client sees a truncated stream, the SSE contract).
        gen = self.server.render_engine.fetch_sse(self.path)
        try:
            first = next(gen, None)
        except (ValueError, KeyError, TypeError, NotImplementedError) as e:
            return self._error(400, f"{type(e).__name__}: {e}")
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Connection", "close")
        self.end_headers()
        try:
            if first is not None:
                self.wfile.write(b"data: " + json.dumps(first).encode() + b"\n\n")
                self.wfile.flush()
                for msg in gen:
                    self.wfile.write(b"data: " + json.dumps(msg).encode() + b"\n\n")
                    self.wfile.flush()
        except Exception:
            # mid-stream failure: never write a second status line into the
            # open 200 body — drop the connection instead.
            pass
        self.close_connection = True

    # ---------------------------------------------------------------- tags

    def _tags(self, parsed):
        qs = parse_qs(parsed.query)
        key = None
        # pathEndOrSingleSlash (TagsApi.scala:53-60): a trailing-slash
        # request (/api/v1/tags/) is the same keys listing as no slash
        rest = parsed.path[len("/api/v1/tags") :]
        if rest.startswith("/") and rest != "/":
            key = unquote(rest[1:].rstrip("/"))
        q = qs.get("q", [None])[0]
        query = None
        if q:
            query = _parse_tag_query(q, self.server.engine.source.step)
        fmt = qs.get("format", ["json"])[0]
        verbose = qs.get("verbose", ["0"])[0] == "1"
        offset = qs.get("offset", [""])[0]
        limit = int(qs.get("limit", ["1000"])[0])
        if limit <= 0:
            # TagsApi.Request requires a positive limit (TagsApi.scala:145)
            raise ValueError(f"limit must be positive (got {limit})")
        # actualLimit cap (TagsApi.scala:147, atlas.webapi.tags.max-limit =
        # 1000): a huge requested page must not become an unbounded driver
        # collect — clients page with the next-offset header instead
        limit = min(limit, 1000)
        eng: Engine = self.server.engine
        rows = eng.tags(
            q=query, key=key or None, offset=offset, limit=limit, verbose=verbose
        ).collect()
        next_off = Engine.tags_next_offset(rows, limit, verbose=verbose)
        headers = {OFFSET_HEADER: next_off} if next_off else {}
        if verbose:
            data = [
                {"key": r["key"], "value": r["value"], "count": r["count"]}
                for r in rows
            ]
            text = "\n".join(f"{r['key']}\t{r['value']}\t{r['count']}" for r in rows)
        else:
            col = "value" if key else "key"
            data = [r[col] for r in rows]
            text = "\n".join(data)
        if fmt == "txt":
            return self._send(200, text.encode(), "text/plain", headers)
        return self._json(200, data, headers)

    # ---------------------------------------------------------------- expr

    def _expr(self, parsed):
        qs = parse_qs(parsed.query)
        q = qs.get("q", [None])[0]
        if q is None:
            return self._error(400, "missing q parameter")
        sub = parsed.path.rstrip("/")[len("/api/v1/expr") :].lstrip("/")
        eng: Engine = self.server.engine
        # layered-vocabulary scoping for debug/normalize/complete/queries
        # (ExprApi.scala:47-73: parameters("q", "vocab" ? default));
        # rewrite/strip take no vocab, matching the reference routes
        vocab = qs.get("vocab", [None])[0]
        if sub in ("", "debug"):
            return self._json(200, eng.debug(q, vocab=vocab))
        if sub == "normalize":
            return self._json(200, eng.normalize(q, vocab=vocab))
        if sub == "queries":
            return self._json(200, eng.queries(q, vocab=vocab))
        if sub == "complete":
            return self._json(200, eng.complete(q, vocab=vocab))
        if sub == "strip":
            keys = set(qs.get("k", []))
            vocabs = tuple(qs.get("r", []))  # repeated: vocab layers to strip
            return self._json(200, eng.strip(q, keys, vocabs))
        if sub == "rewrite":
            return self._json(200, eng.rewrite(q))
        return self._error(404, f"unknown expr endpoint: {sub}")

    # ------------------------------------------------------ lwcapi routes
    # Wire surface for the light-weight-client protocol
    # (atlas-lwcapi): publishers fetch the expression list and POST
    # evaluated data; consumers subscribe per stream id and receive the
    # evaluated payloads.  Registry/routing in streaming/lwc_wire.py;
    # SSE replaces the reference's WebSocket (SubscribeApi.scala) as the
    # stdlib-friendly push channel.

    def _lwc_expressions(self, path):
        """ExpressionApi.scala:72-109: list all data-expression
        subscriptions (optionally scoped to a cluster segment) with
        ETag / If-None-Match caching."""
        from .streaming import lwc_wire

        rest = path[len("/lwc/api/v1/expressions") :].lstrip("/")
        sm: lwc_wire.StreamSubscriptionManager = self.server.lwc
        subs = (
            sm.subscriptions_for_cluster(unquote(rest))
            if rest
            else sm.subscriptions()
        )
        body = json.dumps(
            {"expressions": [s.metadata.to_json() for s in subs]},
            separators=(",", ":"),
        ).encode()
        import hashlib

        etag = '"' + hashlib.sha1(body).hexdigest()[:20] + '"'
        if etag in (self.headers.get("If-None-Match") or ""):
            return self._send(304, b"", "application/json", {"ETag": etag})
        return self._send(200, body, "application/json", {"ETag": etag})

    def _lwc_subscribe_post(self, path):
        """Register/refresh the expression set for a stream (the message
        the reference client sends over its WebSocket,
        SubscribeApi.scala:191-231).  The resulting subscription-v2
        messages are returned synchronously AND pushed onto the stream's
        SSE channel."""
        from .streaming import lwc_wire

        stream_id = unquote(path[len("/api/v2/subscribe/") :])
        length = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(length) if length else b""
        try:
            payload = json.loads(raw) if raw else {}
        except ValueError:
            return self._error(400, "invalid json payload")
        expressions = payload.get("expressions")
        if not isinstance(expressions, list):
            return self._error(400, "missing expressions array")
        sm = self.server.lwc
        step_ms = self.server.engine.source.step * 1000
        messages = lwc_wire.subscribe_expressions(sm, stream_id, expressions, step_ms)
        handler = sm.handler_for_stream(stream_id)
        if handler is not None:
            subs = [m for m in messages if m.get("type") == "subscription-v2"]
            if subs:
                handler.offer(subs)
        return self._json(200, messages)

    def _lwc_subscribe_sse(self, parsed):
        """The push channel: register the stream and deliver queued
        messages as SSE, with step-aligned heartbeats when idle
        (SubscribeApi.scala:140-188; SSE in place of WebSocket)."""
        from .streaming import lwc_wire

        stream_id = unquote(parsed.path.rstrip("/")[len("/api/v2/subscribe/") :])
        if not stream_id:
            return self._error(400, "missing stream id")
        qs = parse_qs(parsed.query)
        # clamp: heartbeat<=0 would make poll() return immediately and
        # turn the loop into a busy spin flooding heartbeat frames
        hb_s = max(0.1, float(qs.get("heartbeat", ["5"])[0]))
        sm = self.server.lwc
        meta = lwc_wire.StreamMetadata(stream_id, self.client_address[0])
        handler = lwc_wire.QueueHandler(meta)
        sm.register(meta, handler)
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Connection", "close")
        self.end_headers()

        def emit(msg) -> None:
            self.wfile.write(b"data: " + json.dumps(msg).encode() + b"\n\n")

        try:
            emit(
                lwc_wire.diagnostic(
                    "info", f"setup stream {stream_id} on atlas-spark"
                )
            )
            self.wfile.flush()
            while not handler.done:
                msgs = handler.poll(timeout=hb_s)
                if not msgs:
                    steps = {
                        s.metadata.frequency or 5000
                        for s in sm.subscriptions_for_stream(stream_id)
                    } or {5000}
                    msgs = [lwc_wire.heartbeat(step) for step in sorted(steps)]
                for m in msgs:
                    emit(m)
                self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError, OSError):
            pass
        finally:
            if sm.handler_for_stream(stream_id) is handler:
                sm.unregister(stream_id)
        self.close_connection = True

    def _lwc_evaluate(self):
        """EvaluateApi.scala:45-83: accept evaluated datapoints from
        publishers and route them to subscribed streams."""
        from .streaming import lwc_wire

        length = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(length) if length else b""
        try:
            payload = json.loads(raw) if raw else {}
        except ValueError:
            return self._error(400, "invalid json payload")
        if "timestamp" not in payload:
            return self._error(400, "missing timestamp")
        lwc_wire.evaluate(self.server.lwc, payload)
        return self._send(200, b"", "application/json")

    def _lsp_analyze(self, uri_mode: bool = False):
        """ASL editor analysis (LSP-lite): diagnostics + semantic tokens
        for the expression, plus hover and completions when an `offset`
        is given — the analyzer outputs the reference serves over its
        WebSocket LSP endpoints (atlas-lsp/.../AslDocumentAnalyzer.scala
        and UriDocumentAnalyzer.scala for `-uri`, framing
        atlas-lspapi/.../LspApi.scala), as HTTP JSON."""
        from . import lsp

        length = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(length) if length else b""
        try:
            payload = json.loads(raw) if raw else {}
        except ValueError:
            return self._error(400, "invalid json payload")
        expression = payload.get("expression")
        if not isinstance(expression, str):
            return self._error(400, "missing expression")
        step = self.server.engine.source.step
        an = lsp.analyze_uri if uri_mode else lsp.analyze
        out = an(expression, step=step)
        offset = payload.get("offset")
        if isinstance(offset, int):
            hv = lsp.hover_uri if uri_mode else lsp.hover
            cp = lsp.complete_uri if uri_mode else lsp.complete
            out["hover"] = hv(expression, offset, step=step)
            out["completions"] = cp(expression, offset, step=step)
            if not uri_mode:
                out["definition"] = lsp.definition(expression, offset)
        if not uri_mode:
            out["symbols"] = lsp.document_symbols(expression)
            out["actions"] = lsp.code_actions(expression, step=step)
        return self._json(200, out)

    def _lwc_streams(self, path):
        """StreamsApi.scala:30-50: stream metadata, 404 diagnostic for
        unknown ids."""
        rest = path[len("/api/v1/streams") :].lstrip("/")
        sm = self.server.lwc
        if not rest:
            return self._json(200, [m.to_json() for m in sm.stream_summaries()])
        summary = sm.stream_summary(unquote(rest))
        if summary is None:
            return self._json(
                404, {"type": "info", "message": f"no stream with id: {rest}"}
            )
        return self._json(200, summary)

    # ------------------------------------------------------------- publish

    def _publish(self):
        length = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(length) if length else b""
        if not raw:
            return self._error(400, "empty payload")
        try:
            payload = json.loads(raw)
        except ValueError:
            return self._error(400, "invalid json payload")
        datapoints = decode_publish_batch(payload)
        if not datapoints:
            return self._error(400, "empty payload")
        good, bad = validate_batch(
            datapoints, extra_rules=getattr(self.server, "validation_rules", ())
        )
        if good and self.server.spool_dir:
            self._spool(good)
        if not bad:
            return self._send(200, b"", "application/json")
        level = "error" if not good else "partial"
        status = 400 if not good else 202
        return self._json(status, failure_message(level, bad))

    def _spool(self, datapoints):
        """Durable handoff to the data plane: one single-line publish
        payload per request, atomically renamed into the spool dir the
        bronze sink watches (readStream.text -> publish_to_bronze)."""
        spool = self.server.spool_dir
        line = json.dumps(
            {
                "tags": {},
                "metrics": [
                    {"tags": tags, "timestamp": ts, "value": value}
                    for tags, ts, value in datapoints
                ],
            },
            separators=(",", ":"),
        )
        name = f"{int(time.time() * 1000)}-{uuid.uuid4().hex}.json"
        tmp = os.path.join(spool, f".{name}.tmp")
        with open(tmp, "w") as fh:
            fh.write(line + "\n")
        os.rename(tmp, os.path.join(spool, name))


def serve(
    engine: Engine,
    port: int = 7101,
    spool_dir: str | None = None,
    verbose: bool = False,
    sub_ttl: float | None = None,
    validation_rules=(),
    render_partitions: int | None = None,
) -> ThreadingHTTPServer:
    """Bind the API server (reference default port 7101, ApiSettings.port);
    returns the server — call serve_forever() (or use start() for a
    daemon thread).  `sub_ttl` expires subscriptions not refreshed
    within that many seconds (the reference's exprs-ttl,
    ExpressionApi.scala:61).

    `render_partitions=None` (default) auto-caps the render plane at
    max(2, cores//4) — the PERF.md r14 concurrency study showed the
    uncapped single session saturating the cluster per render; pass 0
    to disable the cloned render session entirely."""
    if render_partitions is None:
        try:
            cores = engine.spark.sparkContext.defaultParallelism
        except Exception:
            cores = os.cpu_count() or 8
        render_partitions = max(2, cores // 4)
    if spool_dir:
        os.makedirs(spool_dir, exist_ok=True)
    from .streaming.lwc_wire import StreamSubscriptionManager

    srv = ThreadingHTTPServer(("127.0.0.1", port), AtlasHandler)
    srv.engine = engine
    # Render fan-out cap (r13 concurrency finding a: ONE render fans its
    # stages across every core, so concurrent renders queue at cluster
    # capacity rather than sharing it).  FAIR pools cannot cap a job's
    # width — weight/minShare only order tasks — so graph/fetch requests
    # run on a CLONED session (shared SparkContext, independent SQLConf)
    # whose spark.sql.shuffle.partitions bounds each render's shuffle
    # stages, letting several renders overlap instead of serializing.
    srv.render_engine = engine
    # Clone ONLY an engine whose source derives from sf_dir (and whose
    # catalog, if any, is a re-readable path): a custom source's frames
    # are bound to the ORIGINAL session, so a rebuilt clone would
    # silently render against the default events source instead.  Such
    # engines keep the uncapped single-session path.
    clonable = (
        getattr(engine, "sf_dir", None)
        and getattr(engine, "default_source", False)
        and (
            getattr(engine, "_catalog_df", None) is None
            or getattr(engine, "catalog_path", None)
        )
    )
    if render_partitions and clonable:
        rspark = engine.spark.newSession()
        srv.render_engine = Engine(
            rspark,
            engine.sf_dir,
            default_window=engine.default_window,
            catalog=getattr(engine, "catalog_path", None),
            png_metadata=getattr(engine, "png_metadata", False),
        )
        srv.render_engine.host_rewriter = engine.host_rewriter
        # AFTER Engine construction — the source factory runs
        # configure_existing, which pins the standard 32
        rspark.conf.set("spark.sql.shuffle.partitions", str(render_partitions))
    srv.spool_dir = spool_dir
    srv.verbose = verbose
    srv.lwc = StreamSubscriptionManager(step=engine.source.step, sub_ttl=sub_ttl)
    # optional validation rules, activated by config like the reference's
    # atlas.core.validation.rules list: build the TagRuleSpec chain ONCE,
    # eagerly — a malformed config (unknown rule name, bad pattern) fails
    # at startup, not as a 400 on every publish request
    from .streaming.validation import specs_from_config

    srv.validation_rules = specs_from_config(validation_rules)
    # per-caller graph request counters (id param / Origin, sanitized)
    srv.graph_request_counts = {}
    return srv


def start(
    engine: Engine,
    port: int = 0,
    spool_dir: str | None = None,
    sub_ttl: float | None = None,
    validation_rules=(),
    render_partitions: int | None = None,
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """serve() on a daemon thread; port=0 picks a free port
    (server_address[1] has the bound port)."""
    srv = serve(
        engine,
        port=port,
        spool_dir=spool_dir,
        sub_ttl=sub_ttl,
        validation_rules=validation_rules,
        render_partitions=render_partitions,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, t


def main(argv=None):
    import argparse

    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser(description="atlas_spark HTTP API server")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--port", type=int, default=7101)
    ap.add_argument("--spool-dir", default=None)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    # default cap = cpus/4: four renders overlap instead of one job
    # fanning across every core (PERF.md r14 concurrency row: +13%
    # throughput and -13% heavy-render p95 on top of the render fix,
    # with single-client p50 slightly BETTER).  --render-partitions 0
    # disables the cloned render session.
    ap.add_argument("--render-partitions", type=int, default=None)
    args = ap.parse_args(argv)
    if args.render_partitions is None:
        args.render_partitions = max(2, int(args.cpus) // 4)

    from .session import configure_existing

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.ui.enabled", "false")
        .config("spark.scheduler.mode", "FAIR")
        .getOrCreate()
    )
    configure_existing(spark)
    spark.sparkContext.setLogLevel("ERROR")
    srv = serve(
        Engine(spark, args.sf_dir),
        port=args.port,
        spool_dir=args.spool_dir,
        verbose=True,
        render_partitions=args.render_partitions,
    )
    print(f"atlas_spark api on http://127.0.0.1:{srv.server_address[1]}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
