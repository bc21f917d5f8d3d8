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


def rejection_reason(tags: Column) -> Column:
    """First failing rule's reason, null when the datapoint is valid —
    rules evaluate in the reference config order."""
    return F.coalesce(
        has_key_rule(tags),
        key_length_rule(tags),
        name_value_length_rule(tags),
        valid_characters_rule(tags),
        max_user_tags_rule(tags),
        reserved_key_rule(tags),
    )


def validate_publish(df: DataFrame, tags_col: str = "tags") -> tuple[DataFrame, DataFrame]:
    """Split a publish batch/stream into (valid, rejected-with-reason).

    Works on batch and streaming frames alike (pure projections); the
    rejected side carries `rejection` for per-reason drop counters.
    """
    checked = df.withColumn("rejection", rejection_reason(F.col(tags_col)))
    valid = checked.filter(F.col("rejection").isNull()).drop("rejection")
    rejected = checked.filter(F.col("rejection").isNotNull())
    return valid, rejected
