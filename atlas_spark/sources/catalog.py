"""Maintained series/tag catalog — the metadata index for the tags API.

The reference answers `/api/v1/tags` from its inverted tag index
(`RoaringTagIndex.scala:85-107`, served by `TagsApi.scala:44-127`), never
from the datapoint store.  The Spark-native equivalent is a SERIES
CATALOG: one row per distinct series (the promoted tag columns only, no
timestamps or values), materialized once and refreshed incrementally —
so a metadata request scans rows proportional to series CARDINALITY, not
to datapoint volume.  At 100 TB the fact table has ~10^12 rows but only
~10^6-10^7 series; routing tags() through the catalog turns a full-fact
distinct into a megabyte-scale scan.

Because the catalog rows carry the same promoted `k_*` columns as the
fact frame, the tags API's Query filtering, value listing, and verbose
(key, value, n_series) counting run UNCHANGED against it — it is a
drop-in smaller relation, not a second code path.

Maintenance:
  - `write_series_catalog` — batch (re)build from any DatapointSource.
  - `append_series_catalog_stream` — continuous maintenance from the
    bronze publish stream: each micro-batch appends its *new* distinct
    series (log-structured; readers `distinct()` the union, which stays
    cheap because appends are series-cardinality-sized).  With a
    table format that supports MERGE (Delta/Iceberg) the append+distinct
    pair becomes a keyed upsert; plain parquet keeps the pipeline
    dependency-free here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .datapoints import DatapointSource, sanitize


def build_series_catalog(source: DatapointSource) -> DataFrame:
    """Distinct series (all promoted tag columns) of a datapoint source.
    One scan + one distinct shuffle; output is series-cardinality-sized."""
    return source.df.select(*source.colmap.values()).distinct()


def write_series_catalog(source: DatapointSource, path: str) -> None:
    """Batch (re)build of the catalog table."""
    build_series_catalog(source).write.mode("overwrite").parquet(path)


def read_series_catalog(spark: SparkSession, path: str) -> DataFrame:
    """Catalog relation for the tags API.  The `distinct()` folds
    log-structured appends from the streaming maintainer; on a freshly
    rebuilt catalog it is a no-op on already-unique rows."""
    return spark.read.parquet(path).distinct()


def append_series_catalog_stream(
    spark: SparkSession,
    bronze_path: str,
    catalog_path: str,
    checkpoint: str,
    tag_keys=("name", "app"),
):
    """Continuous catalog maintenance from the bronze publish table:
    foreachBatch extracts the batch's distinct series, anti-joins the
    current catalog, and appends only the NEW ones.  State lives in the
    catalog table itself (no streaming state store); exactly-once comes
    from the checkpointed batch ids — a replayed batch re-appends rows
    the anti-join has already seen, which the reader's distinct folds.
    """
    from ..session import configure_existing

    configure_existing(spark)
    stream = spark.readStream.schema(
        "tags map<string,string>, name string, t long, value double, "
        "rejection string, date date"
    ).parquet(f"{bronze_path}/data/status=ok")
    kcols = {k: sanitize(k) for k in tag_keys}
    rows = stream.select(
        *[
            (F.col("name") if k == "name" else F.col("tags")[k]).alias(c)
            for k, c in kcols.items()
        ]
    )

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        new = batch_df.distinct()
        try:
            cur = batch_df.sparkSession.read.parquet(catalog_path)
            new = new.join(cur, on=list(kcols.values()), how="left_anti")
        except Exception:
            pass  # first batch: no catalog yet
        new.write.mode("append").parquet(catalog_path)

    return (
        rows.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .queryName("series_catalog")
        .start()
    )


def catalog_source(
    source: DatapointSource, catalog_df: DataFrame
) -> DatapointSource:
    """The source with its frame swapped for the catalog relation: the
    tags API code paths (Query filtering, per-key distincts, series
    counting) see identical columns over the much smaller relation."""
    from dataclasses import replace

    return replace(source, df=catalog_df, ranged=None, raw_ranged=None)
