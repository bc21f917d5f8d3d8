"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k with the dot product computed by
JVM-side higher-order functions (`zip_with` + `aggregate`) — no Python in
the loop, scans distribute trivially.

Scale path: LSH bucketing (random hyperplane signs) so the candidate set
per query is a bucket, not the full corpus; IVF-style coarse quantization
can reuse the same bucket-join shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    # sequential left-to-right fold in double precision: deterministic and
    # bit-identical to the DuckDB oracle's list_sum(list_transform(...))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Top-k nearest neighbours (cosine) of one corpus vector.

    The query vector is a one-row lookup joined via broadcast — the scan
    side streams; no collect of the corpus.
    """
    emb = load_embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q_emb")
    )
    sims = (
        emb.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("q_emb"))
                / (
                    F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    # TakeOrderedAndProject: no full sort at scale
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def cosine_topk_sql(query_id: int = 0, k: int = 10, dim: int = 64) -> str:
    dot = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))"
    ).format(d=dim)
    na = (
        "sqrt(list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
    ).format(d=dim)
    nq = (
        "sqrt(list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))"
    ).format(d=dim)
    return f"""
SELECT a.vec_id, round({dot} / ({na} * {nq}), 6) AS cos_sim
FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = {query_id}) q
WHERE a.vec_id != {query_id}
ORDER BY cos_sim DESC, a.vec_id ASC
LIMIT {k}
"""


def embedding_near_dup(
    spark: SparkSession, sf_dir: str, threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Exact all-pairs at oracle scale; the scale path swaps the pair source
    for LSH bucket candidates (`lsh_bucketed_topk` machinery) — the
    verification expression is identical.  Label equality is reported so
    dedup quality can be judged against ground truth.
    """
    emb = load_embeddings(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"), F.col("label").alias("l_a")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"), F.col("label").alias("l_b")
    )
    sim = _dot(F.col("e_a"), F.col("e_b")) / (
        F.sqrt(_dot(F.col("e_a"), F.col("e_a"))) * F.sqrt(_dot(F.col("e_b"), F.col("e_b")))
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select(
            "id_a",
            "id_b",
            "cos_sim",
            (F.col("l_a") == F.col("l_b")).cast("int").alias("same_label"),
        )
    )


def embedding_near_dup_sql(threshold: float = 0.35, dim: int = 64) -> str:
    dot = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    ).format(d=dim)
    na = (
        "sqrt(list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
    ).format(d=dim)
    nb = (
        "sqrt(list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))"
    ).format(d=dim)
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({dot} / ({na} * {nb}), 6) AS cos_sim,
       CAST(a.label = b.label AS INTEGER) AS same_label
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND round({dot} / ({na} * {nb}), 6) >= {threshold}
"""


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbours.

    Classic two-stage ANN: a KMeans coarse quantizer assigns every vector
    to a cell (the "inverted lists"); a query probes the `n_probe` nearest
    cells and exact-cosine re-ranks only those candidates.  At 100 TB the
    cell assignment is a narrow column on the stored table (computed once
    at ingest), so a query scans |corpus| * n_probe / n_cells vectors.

    Deterministic: fixed KMeans seed + fixed init.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_embeddings(spark, sf_dir)
    vecs = emb.withColumn("features", array_to_vector(F.col("embedding").cast("array<double>")))
    km = KMeans(k=n_cells, seed=42, initMode="k-means||", maxIter=10)
    model = km.fit(vecs)
    assigned = model.transform(vecs).withColumnRenamed("prediction", "cell")

    # query vector + its n_probe nearest cells (centroid table is tiny —
    # computed driver-side, broadcast as a literal filter)
    q_row = assigned.filter(F.col("vec_id") == query_id).select("embedding", "features").head()
    q_emb = q_row["embedding"]
    import numpy as np

    qv = np.array(q_emb, dtype=float)
    centers = model.clusterCenters()
    dists = [float(np.linalg.norm(qv - np.asarray(c))) for c in centers]
    probe_cells = sorted(range(len(centers)), key=lambda i: dists[i])[:n_probe]

    cands = assigned.filter(F.col("cell").isin(probe_cells)).filter(
        F.col("vec_id") != query_id
    )
    q_lit = F.array(*[F.lit(float(x)) for x in q_emb])
    sims = cands.select(
        "vec_id",
        "cell",
        F.round(
            _dot(F.col("embedding"), q_lit)
            / (
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot(q_lit, q_lit))
            ),
            6,
        ).alias("cos_sim"),
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def lsh_bucketed_topk(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10, planes: int = 12
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Bucket key = sign bits of `planes` pseudo-random hyperplanes (seeded
    from the dimension index via xxhash64 — fully deterministic, no stored
    model).  Candidates = vectors sharing the query's bucket; exact cosine
    re-rank inside the bucket.  At 100 TB the bucket join replaces the full
    scan per query.
    """
    emb = load_embeddings(spark, sf_dir)

    def bucket_col(vec):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.sequence(F.lit(0), F.size(vec) - 1),
                        lambda x, i: x.cast("double")
                        * (
                            (
                                F.pmod(F.xxhash64(i, F.lit(p)), F.lit(2000)) - 1000
                            ).cast("double")
                            / 1000.0
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit(1),
            ).otherwise(F.lit(0))
            * (2**p)
            for p in range(planes)
        ]
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    with_b = emb.withColumn("bucket", bucket_col(F.col("embedding")))
    qb = with_b.filter(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("q_emb")
    )
    cands = with_b.filter(F.col("vec_id") != query_id).join(
        F.broadcast(qb), F.col("bucket") == F.col("qbucket")
    )
    sims = cands.select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), F.col("q_emb"))
            / (
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot(F.col("q_emb"), F.col("q_emb")))
            ),
            6,
        ).alias("cos_sim"),
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)
