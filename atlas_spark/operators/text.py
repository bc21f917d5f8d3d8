"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in `pyspark.sql.functions` (JVM side, whole
stage codegen) — no Python UDFs.  Designed for 100 TB layouts: every op is
a narrow projection + optional aggregation; no collects, no driver loops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count per document."""
    docs = load_documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )


TOKEN_COUNT_SQL = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / word-shape quality features per document."""
    docs = load_documents(spark, sf_dir)
    n_words = F.size(F.split(F.col("text"), " "))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        n_words.cast("long").alias("n_words"),
        F.round((F.length("text") - (n_words - 1)) / n_words, 6).alias("avg_word_len"),
        F.round(
            F.size(F.split(F.col("text"), " ")) / F.length("text"), 6
        ).alias("word_density"),
    )


QUALITY_SCORE_SQL = """
SELECT doc_id,
       CAST(len(text) AS BIGINT) AS n_chars_m,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       round((len(text) - (len(string_split(text, ' ')) - 1)) / len(string_split(text, ' ')), 6) AS avg_word_len,
       round(len(string_split(text, ' ')) / len(text), 6) AS word_density
FROM documents
"""


def lang_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup by (lang, source)."""
    docs = load_documents(spark, sf_dir)
    return docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


LANG_SOURCE_STATS_SQL = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang, source
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprint (content hash + 64-bit rolling id).

    `xxhash64` is Spark-side; the content sha is the cross-engine check.
    """
    docs = load_documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.sha2(F.col("text").cast("binary"), 256).alias("sha"),
        F.length("text").cast("long").alias("n_bytes"),
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id, sha256(text) AS sha, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
FROM documents
"""
