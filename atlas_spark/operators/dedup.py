"""Deduplication operators.

Scale design: exact dedup is a hash-groupBy (one shuffle on the content
hash, map-side partial agg).  Near-dup (MinHash / SimHash / n-gram
Jaccard) reduces the candidate space via banding so the join is on short
bucket keys, never an all-pairs cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .text import load_documents


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one surviving doc_id per distinct text.

    At 100 TB: shuffle keyed on a 256-bit hash is uniformly distributed (no
    skew); the groupBy benefits from partial aggregation.
    """
    docs = load_documents(spark, sf_dir)
    return (
        docs.select(F.sha2(F.col("text").cast("binary"), 256).alias("h"), "doc_id")
        .groupBy("h")
        .agg(
            F.min("doc_id").cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


DEDUP_EXACT_SQL = """
SELECT sha256(text) AS h,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY sha256(text)
"""


def ngram_shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """Word n-gram shingle set per doc (input for Jaccard / MinHash)."""
    words = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    shingle = lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))  # noqa: E731
    return df.select(
        "doc_id",
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws("", F.slice(words, i + 1, n)))
        ).alias("shingles"),
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard.

    Candidate generation: explode shingles and join on shingle (docs
    sharing at least one shingle), then exact Jaccard on the candidate
    pairs.  At scale the shingle join replaces the quadratic cross join;
    frequent-shingle skew is bounded by dropping shingles appearing in more
    than `max_df` docs (standard LSH trick).
    """
    docs = load_documents(spark, sf_dir)
    sh = ngram_shingles(docs, n).withColumn("n_sh", F.size("shingles"))
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("s"))
    # bound worst-case skew: drop shingles present in >1% of docs (min 100)
    total = docs.count()
    max_df = max(100, total // 100)
    freq = ex.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df)
    ex = ex.join(F.broadcast(freq.select("s")), on="s")
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), on="s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def minhash_lsh_candidates(
    spark: SparkSession, sf_dir: str, n: int = 3, num_hashes: int = 32, bands: int = 8
) -> DataFrame:
    """MinHash + LSH banding candidate pairs.

    shingle -> 64-bit hash -> per-permutation min  -> band signature ->
    bucket join.  All JVM-side (`xxhash64` + higher-order array functions);
    no Python in the loop.
    """
    rows_per_band = num_hashes // bands
    docs = load_documents(spark, sf_dir)
    sh = ngram_shingles(docs, n)
    # minhash signature: for seed i, min over shingles of xxhash64(s, i)
    sig = sh.select(
        "doc_id",
        F.array(
            *[
                F.array_min(
                    F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(i)))
                ).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        ).alias("sig"),
    )
    bands_df = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    cand = (
        bands_df.alias("a")
        .join(bands_df.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    return cand


def simhash(spark: SparkSession, sf_dir: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash per document over word features.

    Classic Charikar sketch: sign-sum of per-feature hash bits.  Vectorized
    as array ops; the per-bit fold stays in codegen.
    """
    docs = load_documents(spark, sf_dir)
    words = F.array_distinct(F.split(F.col("text"), " "))
    hashed = F.transform(words, lambda w: F.xxhash64(w))
    # bit i of the simhash = sign of sum over features of (bit i ? 1 : -1);
    # bit positions are compile-time literals so the whole fold stays in
    # codegen (one aggregate per bit over the word-hash array)
    def bit_vote(i: int):
        def merge(acc, h):
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(hashed, F.lit(0), merge)

    sim = F.lit(0).cast("long")
    for i in range(bits):
        vote = bit_vote(i)
        sim = sim.bitwiseOR(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return docs.select("doc_id", sim.alias("simhash"))
