"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)`   — flagship query smoke check at sf0.001.
`queries()`      — named queries per SURVEY.md §2 operator inventory plus
                   the LLM-pipeline operators (dedup / similarity / text /
                   multimodal).
`oracle_sql()`   — DuckDB-equivalent SQL per query, generated from the same
                   expression AST by `atlas_spark.oracle.sqlgen`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from atlas_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: grouped aggregate over the
    events datapoint view (`name,click,:eq,(,bucket,),:by,:sum` shape)."""
    q = registry.all_queries()["data_by_sum"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
