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


class EventSource:
    PROMOTED = {
        "name": "event_type",
        "user": "user_str",
        "value": "value",
    }

    def __init__(self, spark: SparkSession, sf_dir: str):
        configure_existing(spark)
        self.df = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
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

    def query_col(self, q: Q.Query) -> Column:
        def go(q: Q.Query) -> Column:
            if isinstance(q, Q.TrueQuery):
                return F.lit(True)
            if isinstance(q, Q.FalseQuery):
                return F.lit(False)
            if isinstance(q, Q.HasKeyQuery):
                return self.field_str(q.k).isNotNull()
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
