"""Publish-path validation rules.

Spark-side port of the reference's ingest validation
(`atlas-core/.../validation/*.scala`) with the default rule config from
`atlas-webapi/src/main/resources/reference.conf`:

  HasKeyRule(name), KeyLengthRule(2,60), NameValueLengthRule(name 2..255,
  others 1..120), ValidCharactersRule(-._A-Za-z0-9^~), MaxUserTagsRule(20),
  ReservedKeyRule(atlas.*, nf.*).

Every rule is a pure Column expression over a `map<string,string>` tags
column (higher-order functions, no UDFs), producing the FIRST failing
rule's reason like the reference's composite rule short-circuit
(`Rule.validate` returns the first failure).  Rejected rows keep the
reason so the publish path can count and report per-reason drops
(`PublishApi` failure messages).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# default-pattern from the reference config; ^~ are literal characters
_VALID_CHARS_RE = "^[-._A-Za-z0-9^~]*$"

_RESTRICTED_PREFIXES = ("atlas.", "nf.")  # TagKey.isRestricted

_ALLOWED_RESERVED = {
    "atlas.": ("aggr", "dstype", "offset", "legacy"),
    "nf.": (
        "account", "ami", "app", "asg", "cluster", "container", "country",
        "country.rollup", "job", "node", "process", "region", "shard1",
        "shard2", "stack", "subnet", "task", "vmtype", "vpc", "zone",
    ),
}

MAX_USER_TAGS = 20


def _keys(tags: Column) -> Column:
    return F.map_keys(tags)


def _first_bad_key(tags: Column, pred) -> Column:
    """First key failing `pred` (null when none)."""
    return F.array_min(F.filter(_keys(tags), lambda k: ~pred(k)))


def _fmt(template: str, *cols: Column) -> Column:
    return F.format_string(template, *cols)


def has_key_rule(tags: Column, key: str = "name") -> Column:
    return F.when(
        ~F.map_contains_key(tags, F.lit(key)), F.lit(f"missing key '{key}'")
    )


def key_length_rule(tags: Column, min_len: int = 2, max_len: int = 60) -> Column:
    bad = _first_bad_key(
        tags, lambda k: (F.length(k) >= min_len) & (F.length(k) <= max_len)
    )
    return F.when(bad.isNotNull(), _fmt("key length out of [%d,%d]: [%s]", F.lit(min_len), F.lit(max_len), bad))


def name_value_length_rule(
    tags: Column,
    name_min: int = 2,
    name_max: int = 255,
    other_min: int = 1,
    other_max: int = 120,
) -> Column:
    def ok(k, v):
        name_ok = (F.length(v) >= name_min) & (F.length(v) <= name_max)
        other_ok = (F.length(v) >= other_min) & (F.length(v) <= other_max)
        return F.when(k == "name", name_ok).otherwise(other_ok)

    bad = F.array_min(
        F.filter(F.map_keys(tags), lambda k: ~ok(k, F.element_at(tags, k)))
    )
    return F.when(
        bad.isNotNull(),
        _fmt("value length out of range: %s = [%s]", bad, F.element_at(tags, bad)),
    )


def valid_characters_rule(tags: Column) -> Column:
    bad_key = _first_bad_key(tags, lambda k: k.rlike(_VALID_CHARS_RE))
    bad_val_key = F.array_min(
        F.filter(_keys(tags), lambda k: ~F.element_at(tags, k).rlike(_VALID_CHARS_RE))
    )
    return F.coalesce(
        F.when(bad_key.isNotNull(), _fmt("invalid characters in key: [%s]", bad_key)),
        F.when(
            bad_val_key.isNotNull(),
            _fmt("invalid characters in value: %s = [%s]", bad_val_key, F.element_at(tags, bad_val_key)),
        ),
    )


def max_user_tags_rule(tags: Column, limit: int = MAX_USER_TAGS) -> Column:
    def restricted(k):
        c = F.lit(False)
        for p in _RESTRICTED_PREFIXES:
            c = c | k.startswith(p)
        return c

    n_user = F.size(F.filter(_keys(tags), lambda k: ~restricted(k)))
    return F.when(n_user > limit, _fmt("too many user tags: %d > %d", n_user, F.lit(limit)))


def reserved_key_rule(tags: Column) -> Column:
    out = None
    for prefix, allowed in _ALLOWED_RESERVED.items():
        full = [prefix + a for a in allowed]
        bad = _first_bad_key(
            tags,
            lambda k, p=prefix, fl=full: F.when(
                k.startswith(p), k.isin(*fl)
            ).otherwise(F.lit(True)),
        )
        col = F.when(
            bad.isNotNull(),
            _fmt(f"invalid key for reserved prefix '{prefix}': %s", bad),
        )
        out = col if out is None else F.coalesce(out, col)
    return out


# ---------------------------------------------------------------------------
# Optional (config-activatable) tag rules — the reference ships these but
# does not enable them by default (`atlas-core/.../validation/
# KeyPatternRule.scala`, `ValuePatternRule.scala`, `ValueLengthRule.scala`,
# `CompositeTagRule.scala`; activation list `atlas.core.validation.rules`).
#
# Each rule is a TagRuleSpec carrying BOTH planes' evaluation: the Column
# form (per-key first-failure like the default chain: lexicographically
# smallest failing key) and the plain-Python form the HTTP publish driver
# uses (http_api.rejection_reason_py) — one spec, two executions, so the
# parity is structural rather than maintained by hand.


class TagRuleSpec:
    """A per-(key, value) rule: `ok` predicates and `msg` renderers in
    Column and Python forms (TagRule.scala `validate(k, v)`)."""

    def __init__(self, ok, msg, py_ok, py_msg):
        self.ok = ok  # (Column k, Column v) -> Column[bool]
        self.msg = msg  # (Column k, Column v) -> Column[str]
        self.py_ok = py_ok  # (str, str) -> bool
        self.py_msg = py_msg  # (str, str) -> str

    def column(self, tags: Column) -> Column:
        """First (smallest) failing key's message, null when all pass."""
        bad = F.array_min(
            F.filter(_keys(tags), lambda k: ~self.ok(k, F.element_at(tags, k)))
        )
        return F.when(bad.isNotNull(), self.msg(bad, F.element_at(tags, bad)))

    def py(self, tags: dict) -> str | None:
        bad = min((k for k, v in tags.items() if not self.py_ok(k, v)), default=None)
        return None if bad is None else self.py_msg(bad, tags[bad])


def key_pattern_spec(pattern: str) -> TagRuleSpec:
    """KeyPatternRule.scala: keys must match the pattern WHOLLY (Java
    `Matcher.matches`).  Patterns must stay in the Python/Java-portable
    regex subset — the same string compiles on both planes (re here,
    rlike's Java regex on the Column plane); Python-invalid patterns
    fail HERE, at config time."""
    rx = re.compile(pattern)
    full = f"^(?:{pattern})$"
    # format_string treats '%' as a conversion: escape the interpolated
    # pattern so e.g. '[0-9]+%' renders instead of crashing the batch
    tmpl = "key doesn't match pattern '" + pattern.replace("%", "%%") + "': [%s]"
    return TagRuleSpec(
        ok=lambda k, v: k.rlike(full),
        msg=lambda k, v: _fmt(tmpl, k),
        py_ok=lambda k, v: rx.fullmatch(k) is not None,
        py_msg=lambda k, v: f"key doesn't match pattern '{pattern}': [{k}]",
    )


def value_pattern_spec(pattern: str) -> TagRuleSpec:
    """ValuePatternRule.scala: values must match the pattern from the
    START (spectator `PatternMatcher` semantics — the same start-anchored
    search the `:re` query word uses).  Portable-regex-subset contract as
    `key_pattern_spec`."""
    rx = re.compile(f"^(?:{pattern})")
    anchored = f"^(?:{pattern})"
    tmpl = "value doesn't match pattern '" + pattern.replace("%", "%%") + "': [%s]"
    return TagRuleSpec(
        ok=lambda k, v: v.rlike(anchored),
        msg=lambda k, v: _fmt(tmpl, v),
        py_ok=lambda k, v: rx.search(v) is not None,
        py_msg=lambda k, v: f"value doesn't match pattern '{pattern}': [{v}]",
    )


def value_length_spec(min_length: int, max_length: int) -> TagRuleSpec:
    """ValueLengthRule.scala: value length within bounds, too-long checked
    before too-short."""
    return TagRuleSpec(
        ok=lambda k, v: (F.length(v) >= min_length) & (F.length(v) <= max_length),
        msg=lambda k, v: F.when(
            F.length(v) > max_length,
            _fmt(f"value too long: %s = [%s] (%d > {max_length})", k, v, F.length(v)),
        ).otherwise(
            _fmt(f"value too short: %s = [%s] (%d < {min_length})", k, v, F.length(v))
        ),
        py_ok=lambda k, v: min_length <= len(v) <= max_length,
        py_msg=lambda k, v: (
            f"value too long: {k} = [{v}] ({len(v)} > {max_length})"
            if len(v) > max_length
            else f"value too short: {k} = [{v}] ({len(v)} < {min_length})"
        ),
    )


def composite_tag_spec(subspecs: list[TagRuleSpec]) -> TagRuleSpec:
    """CompositeTagRule.scala: all sub-rules must pass per (k, v); the
    first failing sub-rule's message wins."""
    if not subspecs:
        # an empty composite would pass everything on the Python plane
        # but build F.coalesce() with zero args on the Column plane —
        # reject the config loudly instead
        raise ValueError("composite-tag rule needs at least one sub-rule")

    def ok(k, v):
        out = F.lit(True)
        for s in subspecs:
            out = out & s.ok(k, v)
        return out

    def msg(k, v):
        return F.coalesce(*[F.when(~s.ok(k, v), s.msg(k, v)) for s in subspecs])

    def py_ok(k, v):
        return all(s.py_ok(k, v) for s in subspecs)

    def py_msg(k, v):
        return next(s.py_msg(k, v) for s in subspecs if not s.py_ok(k, v))

    return TagRuleSpec(ok, msg, py_ok, py_msg)


_RULE_FACTORIES = {
    "key-pattern": lambda c: key_pattern_spec(c["pattern"]),
    "value-pattern": lambda c: value_pattern_spec(c["pattern"]),
    "value-length": lambda c: value_length_spec(c["min-length"], c["max-length"]),
    "composite-tag": lambda c: composite_tag_spec(specs_from_config(c["rules"])),
}


def specs_from_config(cfgs) -> list[TagRuleSpec]:
    """Build the optional-rule chain from config dicts, e.g.

        [{"rule": "key-pattern", "pattern": "^[a-z][a-zA-Z0-9.]*$"},
         {"rule": "value-length", "min-length": 2, "max-length": 60}]

    — the activation analogue of `atlas.core.validation.rules`.  Entries
    already built as TagRuleSpec pass through, so callers may mix."""
    out = []
    for c in cfgs or ():
        if isinstance(c, TagRuleSpec):
            out.append(c)
        else:
            out.append(_RULE_FACTORIES[c["rule"]](c))
    return out


def rejection_reason(tags: Column, extra_rules=()) -> Column:
    """First failing rule's reason, null when the datapoint is valid —
    the default chain in reference config order, then any
    config-activated optional rules (`specs_from_config`)."""
    return F.coalesce(
        has_key_rule(tags),
        key_length_rule(tags),
        name_value_length_rule(tags),
        valid_characters_rule(tags),
        max_user_tags_rule(tags),
        reserved_key_rule(tags),
        *[s.column(tags) for s in specs_from_config(extra_rules)],
    )


def validate_publish(
    df: DataFrame, tags_col: str = "tags", extra_rules=()
) -> tuple[DataFrame, DataFrame]:
    """Split a publish batch/stream into (valid, rejected-with-reason).

    Works on batch and streaming frames alike (pure projections); the
    rejected side carries `rejection` for per-reason drop counters.
    `extra_rules` are optional-rule config dicts (`specs_from_config`).
    """
    checked = df.withColumn(
        "rejection", rejection_reason(F.col(tags_col), extra_rules)
    )
    valid = checked.filter(F.col("rejection").isNull()).drop("rejection")
    rejected = checked.filter(F.col("rejection").isNotNull())
    return valid, rejected
