"""Storage layout for datapoints at scale.

The reference's retention model is a ring of hour blocks
(`atlas-core/.../db/BlockStore.scala`); the Spark-native equivalent is a
date-partitioned, series-bucketed Parquet table:

  - partition column `d` (UTC date of the step) -> partition pruning turns
    the eval time range into file pruning, replacing block-window lookup
  - `bucketBy(N, name)` + `sortBy(t)` -> co-located series so group-bys
    and joins keyed on the series name avoid a shuffle on the fact side,
    replacing the tag index's locality
  - Parquet encodings replace the reference's custom block compression
    (constant/sparse/float packing)

Retention = dropping date partitions; compaction = rewriting one date.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .datapoints import DatapointSource


def write_datapoints(
    dp: DataFrame,
    table: str,
    path: str | None = None,
    buckets: int = 16,
    bucket_col: str = "k_name",
) -> None:
    """Persist a datapoint frame as a partitioned + bucketed table."""
    out = dp.withColumn("d", F.to_date(F.timestamp_seconds(F.col("t"))))
    writer = (
        out.write.mode("overwrite")
        .partitionBy("d")
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col, "t")
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def table_source(
    spark: SparkSession, table: str, step: int, colmap: dict[str, str]
) -> DatapointSource:
    """DatapointSource over a persisted table; the eval range becomes a
    partition filter on `d` (file pruning) plus the `t` bounds."""
    tbl = spark.table(table)

    def ranged(lo: int, hi: int) -> DataFrame:
        return tbl.filter(
            (F.col("d") >= F.to_date(F.timestamp_seconds(F.lit(lo))))
            & (F.col("d") <= F.to_date(F.timestamp_seconds(F.lit(hi - 1))))
            & (F.col("t") >= lo)
            & (F.col("t") < hi)
        ).drop("d")

    return DatapointSource(
        df=tbl.drop("d"),
        step=step,
        colmap=colmap,
        sql_cte="",
        ranged=ranged,
    )
