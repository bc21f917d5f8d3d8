"""Event source — schemaless event rows matched by the Query AST.

Mirror of the reference's event model (`atlas-core/.../model/EventExpr.scala`,
`atlas-lwc-events/.../LwcEvent.scala`): events are log-like rows; the same
tag Query matches against named fields, `:table` projects columns,
`:sample` counts per group with a few sample payloads.

Field mapping for the driver `events` table:
  name  -> event_type
  user  -> user_id (as string)
  level -> json path $.k of props (example of path access)
Any other key falls back to a JSON path lookup in `props`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..model import expr as E
from ..model import query as Q
from ..session import configure_existing


def _duration_nanos_col(s: Column) -> Column:
    """String duration -> nanos as double, JVM-side: ISO `P..T..` forms
    and `<n><unit>` suffixes (Strings.parseDuration grammar subset)."""
    iso_d = F.coalesce(
        F.regexp_extract(s, r"^P(\d+)D", 1).cast("double"), F.lit(0.0)
    )
    iso_h = F.coalesce(
        F.regexp_extract(s, r"T(?:(\d+)H)", 1).cast("double"), F.lit(0.0)
    )
    iso_m = F.coalesce(
        F.regexp_extract(s, r"T(?:\d+H)?(?:(\d+)M)", 1).cast("double"),
        F.lit(0.0),
    )
    iso_s = F.coalesce(
        F.regexp_extract(s, r"(\d+(?:\.\d+)?)S$", 1).cast("double"), F.lit(0.0)
    )
    iso = (iso_d * 86400 + iso_h * 3600 + iso_m * 60 + iso_s) * 1e9
    n = F.regexp_extract(s, r"^(\d+(?:\.\d+)?)", 1).cast("double")
    unit = F.regexp_extract(s, r"^\d+(?:\.\d+)?([a-zμ]+)$", 1)
    factor = (
        F.when(unit == "ns", F.lit(1.0))
        .when(unit.isin("us", "μs"), F.lit(1e3))
        .when(unit == "ms", F.lit(1e6))
        .when(unit.isin("s", "second", "seconds"), F.lit(1e9))
        .when(unit.isin("m", "min", "minute", "minutes"), F.lit(60e9))
        .when(unit.isin("h", "hour", "hours"), F.lit(3600e9))
        .when(unit.isin("d", "day", "days"), F.lit(86400e9))
        .when(unit.isin("w", "wk", "week", "weeks"), F.lit(604800e9))
    )
    return F.when(s.rlike(r"^P"), iso).otherwise(n * factor)


# epoch magnitude cutoffs (Strings.ofEpoch auto-detection: seconds,
# millis, micros, nanos by value range)
_EPOCH_S_CUTOFF = float((1 << 31) - 1)
_EPOCH_MS_CUTOFF = 13569465600000.0  # 2400-01-01 in millis
_EPOCH_US_CUTOFF = _EPOCH_MS_CUTOFF * 1000


def _epoch_nanos_col(num: Column) -> Column:
    return (
        F.when(num <= _EPOCH_S_CUTOFF, num * 1e9)
        .when(num <= _EPOCH_MS_CUTOFF, num * 1e6)
        .when(num <= _EPOCH_US_CUTOFF, num * 1e3)
        .otherwise(num)
    )


def _epoch_nanos_py(v: str) -> float:
    import datetime as dt

    s = v.strip()
    if s.isdigit():
        n = float(s)
        if n <= _EPOCH_S_CUTOFF:
            return n * 1e9
        if n <= _EPOCH_MS_CUTOFF:
            return n * 1e6
        if n <= _EPOCH_US_CUTOFF:
            return n * 1e3
        return n
    from ..util.strings import parse_date

    d = parse_date(s, "UTC", {}, now=dt.datetime.now(dt.timezone.utc))
    return d.timestamp() * 1e9


class EventSource:
    PROMOTED = {
        "name": "event_type",
        "user": "user_str",
        "value": "value",
    }

    def __init__(self, spark: SparkSession, sf_dir: str):
        configure_existing(spark)
        from ..util.io import read_parquet

        self.df = (
            read_parquet(spark, f"{sf_dir}/events.parquet")
            .withColumn("user_str", F.col("user_id").cast("string"))
        )

    @classmethod
    def from_df(cls, df: DataFrame) -> "EventSource":
        """Source over an arbitrary (possibly STREAMING) event frame with
        the driver schema — the match/projection logic is identical."""
        src = cls.__new__(cls)
        src.df = df.withColumn("user_str", F.col("user_id").cast("string"))
        return src

    def field(self, key: str) -> Column:
        col = self.PROMOTED.get(key)
        if col is not None:
            return F.col(col)
        # JSON path access into the props payload (LwcEvent path lookup)
        return F.get_json_object(F.col("props"), f"$.{key}")

    def field_str(self, key: str) -> Column:
        c = self.field(key)
        return c.cast("string")

    # ------------------------------------------------- typed dimensions
    #
    # TypedLwcEventFilter parity (atlas-lwc-events/.../TypedLwcEventFilter
    # .scala:146-290): designated event dimensions compare TYPED instead
    # of lexically — `duration,42ms,:gt` matches spans longer than 42ms
    # numerically.  Matcher types: long / double (plain numerics),
    # duration (numeric field value = NANOS, the wire convention; string
    # values parse the duration grammar incl. ISO `PT..` forms), instant
    # (numeric epoch with s/ms/us/ns magnitude detection like
    # Strings.ofEpoch; strings parse as ISO date-times).  Regex words on
    # a typed dimension never match (the reference pins `:re`/`:reic`
    # false on typed dims).  All comparisons canonicalize to a DOUBLE
    # column so the predicates stay in whole-stage codegen.

    typed_dimensions: dict[str, str] = {}

    def with_typed(self, dims: dict[str, str]) -> "EventSource":
        self.typed_dimensions = dict(dims)
        return self

    @staticmethod
    def typed_value(tpe: str, v: str) -> float:
        """Parse a query literal to the canonical comparable double."""
        from ..util.strings import parse_duration_td

        if tpe == "duration":
            s = v.strip()
            if s.replace(".", "", 1).isdigit():
                return float(s) * 1e9  # bare digits: seconds (parseDuration)
            return parse_duration_td(s).total_seconds() * 1e9
        if tpe == "instant":
            return _epoch_nanos_py(v)
        return float(v)

    def typed_col(self, key: str, tpe: str) -> Column:
        s = F.trim(self.field_str(key))
        num = s.cast("double")
        if tpe in ("long", "double"):
            return num
        if tpe == "duration":
            return F.when(s.rlike(r"^[0-9]+(\.[0-9]+)?$"), num).otherwise(
                _duration_nanos_col(s)
            )
        if tpe == "instant":
            return F.when(s.rlike(r"^[0-9]+$"), _epoch_nanos_col(num)).otherwise(
                F.unix_micros(F.to_timestamp(s)).cast("double") * 1e3
            )
        raise ValueError(f"unknown typed dimension type {tpe!r}")

    def query_col(self, q: Q.Query) -> Column:
        def go(q: Q.Query) -> Column:
            tpe = (
                self.typed_dimensions.get(q.k)
                if isinstance(q, Q.KeyQuery)
                else None
            )
            if isinstance(q, Q.TrueQuery):
                return F.lit(True)
            if isinstance(q, Q.FalseQuery):
                return F.lit(False)
            if isinstance(q, Q.HasKeyQuery):
                return self.field_str(q.k).isNotNull()
            if tpe is not None and isinstance(
                q, (Q.RegexQuery, Q.RegexIgnoreCaseQuery)
            ):
                # regex never matches a typed dimension
                # (TypedLwcEventFilterSuite 'duration: regex')
                return F.lit(False)
            if tpe is not None and isinstance(q, Q.InQuery):
                vals = [self.typed_value(tpe, v) for v in q.vs]
                return self.typed_col(q.k, tpe).isin(*vals)
            if tpe is not None and isinstance(q, Q.KeyValueQuery):
                c, v = self.typed_col(q.k, tpe), self.typed_value(tpe, q.v)
                if isinstance(q, Q.EqualQuery):
                    return c == v
                if isinstance(q, Q.LessThanQuery):
                    return c < v
                if isinstance(q, Q.LessThanEqualQuery):
                    return c <= v
                if isinstance(q, Q.GreaterThanQuery):
                    return c > v
                if isinstance(q, Q.GreaterThanEqualQuery):
                    return c >= v
            if isinstance(q, Q.EqualQuery):
                return self.field_str(q.k) == q.v
            if isinstance(q, Q.LessThanQuery):
                return self.field_str(q.k) < q.v
            if isinstance(q, Q.LessThanEqualQuery):
                return self.field_str(q.k) <= q.v
            if isinstance(q, Q.GreaterThanQuery):
                return self.field_str(q.k) > q.v
            if isinstance(q, Q.GreaterThanEqualQuery):
                return self.field_str(q.k) >= q.v
            if isinstance(q, Q.RegexQuery):
                return self.field_str(q.k).rlike("^" + q.v)
            if isinstance(q, Q.RegexIgnoreCaseQuery):
                return self.field_str(q.k).rlike("(?i)^" + q.v)
            if isinstance(q, Q.InQuery):
                return self.field_str(q.k).isin(*q.vs)
            if isinstance(q, Q.AndQuery):
                return go(q.q1) & go(q.q2)
            if isinstance(q, Q.OrQuery):
                return go(q.q1) | go(q.q2)
            if isinstance(q, Q.NotQuery):
                return ~F.coalesce(go(q.q), F.lit(False))
            raise TypeError(f"unknown query node {q!r}")

        return F.coalesce(go(q), F.lit(False))

    # ------------------------------------------------------------------ ops

    def table(self, e: E.EventTableExpr) -> DataFrame:
        """`q,(,cols,),:table` (EventExpr.scala:50-57).

        Numeric event fields keep their native type (double-to-string
        formatting differs between engines)."""
        matched = self.df.filter(self.query_col(e.query))
        cols = [
            (self.field(c) if c == "value" else self.field_str(c)).alias(
                c.replace(".", "_")
            )
            for c in e.cols
        ]
        return matched.select(*cols)

    def sample(self, e: E.EventSampleExpr, k: int = 3) -> DataFrame:
        """`q,(,by,),(,proj,),:sample` (EventExpr.scala:70-82): count per
        sampleBy group plus a deterministic sample projection (min by
        event_id so the oracle can reproduce it)."""
        matched = self.df.filter(self.query_col(e.query))
        by_cols = [self.field_str(b).alias(b.replace(".", "_")) for b in e.by]
        proj = F.to_json(
            F.struct(*[self.field_str(p).alias(p.replace(".", "_")) for p in e.proj])
        )
        return (
            matched.select(*by_cols, F.col("event_id"), proj.alias("_proj"))
            .groupBy(*[b.replace(".", "_") for b in e.by])
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.min_by("_proj", "event_id").alias("sample"),
            )
        )


# DuckDB oracle equivalents ------------------------------------------------

EV_TABLE_SQL = """
SELECT CAST(user_id AS VARCHAR) AS "user",
       value
FROM events
WHERE COALESCE(event_type = 'click', FALSE)
"""

EV_SAMPLE_SQL = """
SELECT event_type AS name,
       CAST(count(*) AS BIGINT) AS n_events,
       min_by('{"user":"' || CAST(user_id AS VARCHAR) || '"}', event_id) AS sample
FROM events
WHERE COALESCE(json_extract_string(props, '$.k') >= '50', FALSE)
GROUP BY event_type
"""


def ev_table_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = EventSource(spark, sf_dir)
    e = E.EventTableExpr(Q.EqualQuery("name", "click"), ("user", "value"))
    return src.table(e)


def ev_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = EventSource(spark, sf_dir)
    e = E.EventSampleExpr(
        Q.GreaterThanEqualQuery("k", "50"), ("name",), ("user",)
    )
    return src.sample(e)
