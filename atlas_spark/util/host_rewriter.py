"""Host-based expression restriction (HostRewriter.scala:40-67).

Multi-DNS-view deployments serve the same backend under several host
names, each meant to present a restricted view (e.g.
`foo.us-east-1.example.com` shows only `region=us-east-1`).  A config
pair

    {"pattern": r"^foo\\.([^.]+)\\.example\\.com$", "key": "region"}

rewrites every expression of a matching request by AND-ing
`key,$1,:eq` onto it, where `$1` is the pattern's first capture group
applied to the request host.

Semantics mirrored from the reference:

- the pattern must match the WHOLE host (Java `Matcher.matches` ->
  `re.fullmatch`);
- the restriction wraps the topmost Query node of each data expression
  exactly once (`Expr.rewrite`'s top-down early exit over `case q:
  Query` — our `rewrite_queries` hits each expression's query tree the
  same way), without simplification (`Query.And(q, r)` verbatim);
- a matching pattern WITHOUT a capture group is a configuration error
  surfaced as an exception (reference: IndexOutOfBoundsException from
  `matcher.group(1)`; here: IndexError from `m.group(1)`);
- the default config (`pattern = "$^"`, key = "") matches no host, so
  rewrites are off unless configured (atlas-eval reference.conf:179-183).
"""

from __future__ import annotations

import re

from ..model import query as Q

DEFAULT_CONFIG = {"pattern": "$^", "key": ""}


class HostRewriter:
    def __init__(self, config: dict | None = None):
        config = config or DEFAULT_CONFIG
        self.pattern = re.compile(config["pattern"])
        self.key = config["key"]

    def rewrite(self, host: str, exprs: list) -> list:
        """Return `exprs` with the host-derived restriction ANDed onto
        each expression's query, or unchanged when the host does not
        match (HostRewriter.scala:45-56)."""
        m = self.pattern.fullmatch(host)
        if m is None:
            return exprs
        restriction = Q.EqualQuery(self.key, m.group(1))
        return [e.rewrite_queries(lambda q: Q.AndQuery(q, restriction)) for e in exprs]
