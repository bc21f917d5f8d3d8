"""Caller-id sanitization for request telemetry (IdParamSanitizer.scala).

Graph requests are tagged with a caller id (the `id` param or the
request Origin) for per-caller metrics; ids that embed UUIDs, IP
addresses, instance ids, or arbitrary numbers would explode the metric
cardinality, so anything matching those shapes collapses to "default"
(IdParamSanitizer.scala:16-42; suite parity in
tests/test_host_rewriter.py)."""

from __future__ import annotations

import re

_PATTERN = re.compile(r"[0-9a-f]{8}|[0-9]{3}|[0-9][.][0-9]|:")


def sanitize(id_value: str) -> str:
    """Lower-cased id, or "default" when it looks machine-generated."""
    lower = id_value.lower()
    return "default" if _PATTERN.search(lower) else lower
