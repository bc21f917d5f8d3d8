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

from ..util.io import memo_factory as _memo_factory
from pyspark.sql import DataFrame, SparkSession


# The corpus embedding dimensionality — the ONE default threaded through
# every engine function AND its oracle-SQL twin.  A non-64-dim corpus
# passes the matching dim to BOTH sides (pinned by
# tests/test_similarity.py::test_non64_dim_corpus_matches_oracles).
EMBEDDING_DIM = 64


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..util.io import read_parquet

    return read_parquet(spark, f"{sf_dir}/embeddings.parquet")


def _dot_sql(a: str, b: str) -> str:
    # sequential left-to-right fold in double precision: deterministic and
    # bit-identical to the DuckDB oracle's list_sum(list_transform(...))
    return (
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0D, (acc, x) -> acc + x)"
    )


def _sqdist_sql(a: str, b: str) -> str:
    """Squared-L2 fold over two array expressions (SQL strings), same
    left-to-right double accumulation as the former Column lambdas."""
    return (
        f"aggregate(zip_with({a}, {b},"
        " (x, y) -> power(CAST(x AS DOUBLE) - y, 2)),"
        " 0.0D, (acc, x) -> acc + x)"
    )


def _dot(a: str, b: str):
    """Dot product of two array columns given as SQL expression STRINGS.

    One `F.expr` round-trip instead of the former per-lambda
    `F.zip_with`/`F.aggregate` Column construction (~50 ms of py4j
    latency per call, x4 per cosine query build — r16 profile); the
    parsed plan is the identical aggregate/zip_with fold."""
    return F.expr(_dot_sql(a, b))


@_memo_factory
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
                _dot("embedding", "q_emb")
                / (
                    F.sqrt(_dot("embedding", "embedding"))
                    * F.sqrt(_dot("q_emb", "q_emb"))
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    # TakeOrderedAndProject: no full sort at scale
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def cosine_topk_sql(query_id: int = 0, k: int = 10, dim: int = EMBEDDING_DIM) -> str:
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


# Sign-LSH banding for the near-dup candidate join: `NEAR_DUP_BANDS` bands
# of `NEAR_DUP_ROWS` hyperplane sign bits each.  Plane weights are drawn
# once from a fixed-seed RandomState (legacy numpy generator — guaranteed
# stable across versions), so the bucketing is fully deterministic.
#
# Tuning: per-plane sign-agreement probability for a pair at cosine s is
# 1 - acos(s)/pi; a pair survives if it matches all ROWS bits of at least
# one band.  At the demo threshold 0.35 that probability is only ~0.61, so
# full recall needs wide banding (2x24 gives 0 misses at sf0.01 AND sf0.1,
# verified empirically) and the candidate set prunes little — the win at
# this threshold is the JOIN SHAPE, not the row count.  At a realistic
# near-dup threshold (>=0.85, agreement >=0.82) the same machinery with
# e.g. 8x8 banding prunes candidates by orders of magnitude.
NEAR_DUP_ROWS = 2
NEAR_DUP_BANDS = 24
_PLANE_SEED = 7


def _plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(_PLANE_SEED)
    return rng.standard_normal((n_planes, dim)).tolist()


def _band_keys_col(dots: list, rows: int, bands: int):
    """Combine per-plane dot signs into one int key per band:
    key = band_id * 2^rows + sign bits (so a single equi-join column)."""
    keys = []
    for j in range(bands):
        key = F.lit(j * (1 << rows))
        for i in range(rows):
            bit = (dots[j * rows + i] > 0).cast("int")
            key = key + bit * (1 << (rows - 1 - i))
        keys.append(key)
    return F.array(*keys)


def near_dup_candidates(
    emb: DataFrame,
    dim: int = EMBEDDING_DIM,
    rows: int = NEAR_DUP_ROWS,
    bands: int = NEAR_DUP_BANDS,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing at least one LSH band.

    Plan shape: posexplode embedding -> one hash-agg computing all plane
    dots (explode + multi-expression agg, same pattern as minhash) ->
    posexplode band keys -> self equi-join on the band key.  A pair
    sharing several bands would appear once per band; instead of a
    `distinct` shuffle, each side carries its (small) full key array and a
    filter keeps only the FIRST matching band — exactly-once emission with
    no extra exchange.  Sub-quadratic whenever the banding prunes; never a
    cartesian.
    """
    n_planes = rows * bands
    W = _plane_weights(n_planes, dim)
    # numbered repartition: the single-file test corpus scans in one task
    # and AQE would size-coalesce the byte-tiny, compute-heavy plane-dot
    # aggregation to one partition
    ex = emb.repartition(32, "vec_id").select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )
    dots_agg = [
        F.sum(
            F.col("val").cast("double")
            * F.element_at(F.array(*[F.lit(w) for w in W[p]]), F.col("pos") + 1)
        ).alias(f"d{p}")
        for p in range(n_planes)
    ]
    sig = ex.groupBy("vec_id").agg(*dots_agg)
    dots = [F.col(f"d{p}") for p in range(n_planes)]
    keyed = sig.select(
        "vec_id", _band_keys_col(dots, rows, bands).alias("karr")
    )
    banded = keyed.select(
        "vec_id", "karr", F.posexplode("karr").alias("band_id", "band_key")
    )
    # explicit co-partitioning on the band key: the shuffled band rows are
    # tiny but each key's bucket produces |bucket|^2 join rows, so letting
    # AQE size-coalesce the exchange would serialize the pair production
    n_part = min(256, 2 ** (rows + (bands - 1).bit_length()))
    a = banded.select(
        F.col("vec_id").alias("id_a"), F.col("karr").alias("ka"), "band_id", "band_key"
    ).repartition(n_part, "band_key")
    b = banded.select(F.col("vec_id").alias("id_b"), F.col("karr").alias("kb"), "band_key")
    first_match = F.array_position(
        F.zip_with(F.col("ka"), F.col("kb"), lambda x, y: x == y), F.lit(True)
    )
    return (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(first_match == F.col("band_id") + 1)
        .select("id_a", "id_b")
    )


def embedding_near_dup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    rows: int = NEAR_DUP_ROWS,
    bands: int = NEAR_DUP_BANDS,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    LSH band-bucketed candidates + exact cosine verification on candidates
    only (same shape as `ngram_jaccard_pairs`): the banding is tuned for
    recall 1.0 at the oracle scales, so the result is identical to the
    exact all-pairs oracle while the plan is a bucket equi-join, not a
    cartesian.  Label equality is reported so dedup quality can be judged
    against ground truth.
    """
    emb = load_embeddings(spark, sf_dir)
    cands = near_dup_candidates(emb, dim=dim, rows=rows, bands=bands)
    # per-vector norm computed ONCE (identical expression to the oracle's
    # sqrt(sum(x^2)) so the float result is bit-equal); verify then needs a
    # single dot per candidate pair
    with_norm = emb.select(
        "vec_id", "embedding", "label", F.sqrt(_dot("embedding", "embedding")).alias("nrm")
    )
    a = with_norm.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"),
        F.col("label").alias("l_a"), F.col("nrm").alias("n_a"),
    )
    b = with_norm.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"),
        F.col("label").alias("l_b"), F.col("nrm").alias("n_b"),
    )
    sim = _dot("e_a", "e_b") / (F.col("n_a") * F.col("n_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select(
            "id_a",
            "id_b",
            "cos_sim",
            (F.col("l_a") == F.col("l_b")).cast("int").alias("same_label"),
        )
    )


# Strict-threshold banding (the regime the LSH design is FOR): at >=0.85
# per-plane agreement is >=0.82, so 8-bit bands keep P(band hit) ~0.2 per
# band for true pairs (16 bands -> miss ~(0.8)^16 ~ 3%; at the 0.95+
# similarities of real embedding near-dups, miss < 1e-3) while a random
# pair (agreement ~0.5) passes a band with P = 2^-8 — candidates shrink
# ~16x vs all-pairs even on THIS corpus, orders of magnitude on corpora
# whose random pairs are near-orthogonal.  The driver corpus has no pairs
# above 0.61, so the registered strict query returns the (correct) empty
# set; recall in the pruning regime is pinned by
# tests/test_plans.py::test_strict_near_dup_* on planted duplicates.
STRICT_NEAR_DUP_ROWS = 8
STRICT_NEAR_DUP_BANDS = 16


def embedding_near_dup_strict(
    spark: SparkSession, sf_dir: str, dim: int = EMBEDDING_DIM
) -> DataFrame:
    """`embedding_near_dup` at a realistic near-dup threshold (0.85) with
    banding tight enough to actually prune (8 sign bits x 16 bands)."""
    return embedding_near_dup(
        spark,
        sf_dir,
        threshold=0.85,
        rows=STRICT_NEAR_DUP_ROWS,
        bands=STRICT_NEAR_DUP_BANDS,
        dim=dim,
    )


def embedding_near_dup_sql(threshold: float = 0.35, dim: int = EMBEDDING_DIM) -> str:
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


def _lsh_topk_sql(query_id: int = 0, k: int = 10, planes: int = 6, dim: int = EMBEDDING_DIM) -> str:
    """DuckDB oracle computing the identical md5-derived LSH buckets +
    exact cosine rerank (mirrors `lsh_bucketed_topk`)."""
    def weight(p: int) -> str:
        h = f"('0x' || substr(md5(CAST(i - 1 AS VARCHAR) || ':{p}'), 1, 15))::BIGINT"
        return f"(CAST({h} % 2000 AS DOUBLE) - 1000) / 1000.0"

    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST(embedding[i] AS DOUBLE) * {weight(p)})) > 0 THEN {2**p} ELSE 0 END)"
        for p in range(planes)
    )
    dot = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))"
    )
    na = (
        f"sqrt(list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
    )
    nq = (
        f"sqrt(list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))"
    )
    return f"""
WITH b AS (SELECT vec_id, embedding, {bits} AS bucket FROM embeddings),
q AS (SELECT bucket AS qb, embedding AS qe FROM b WHERE vec_id = {query_id})
SELECT a.vec_id, round({dot} / ({na} * {nq}), 6) AS cos_sim
FROM b a, q
WHERE a.bucket = q.qb AND a.vec_id != {query_id}
ORDER BY cos_sim DESC, a.vec_id ASC
LIMIT {k}
"""


LSH_TOPK_SQL = _lsh_topk_sql()


# Coarse-quantizer training-sample cap for ivf_build_index: far above any
# test SF (so small corpora fit on every row, keeping oracle results
# identical) and ~256 points/cell at the 1024-cell cap.
IVF_FIT_SAMPLE_CAP = 262_144


def _ivf_index_path(sf_dir: str, n_cells: int) -> str:
    import hashlib
    import os

    slug = hashlib.sha256(f"{os.path.abspath(sf_dir)}|{n_cells}".encode()).hexdigest()[:16]
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "spark-warehouse", f"ivf_{slug}")


def ivf_build_index(spark: SparkSession, sf_dir: str, n_cells: int = 16) -> str:
    """INGEST-TIME step: fit the coarse quantizer once per corpus and
    materialize (a) the embeddings table widened with its `cell` column
    ("inverted lists") and (b) the tiny centroid table.  At 100 TB this is
    the write path — the cell is a narrow column on the stored table;
    queries never run KMeans.  Deterministic: fixed seed + init.
    """
    import os

    path = _ivf_index_path(sf_dir, n_cells)
    if os.path.exists(os.path.join(path, "assignments", "_SUCCESS")) and os.path.exists(
        os.path.join(path, "centroids", "_SUCCESS")
    ):
        return path
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_embeddings(spark, sf_dir)
    vecs = emb.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    # Fit the coarse quantizer on a bounded deterministic sample (standard
    # IVF practice: centroid quality needs ~100-1000 points per cell, not
    # the corpus).  Below the cap the sample IS the corpus, so test-SF
    # results are unchanged; above it the fit cost stays constant while
    # assignment remains one JVM-vectorized pass over all rows — measured
    # at 4M x 64-dim: full-corpus fit 810s vs sampled fit + full assign
    # (scripts/vol_ivf_4m.py, PERF.md).
    n = vecs.count()
    train = (
        vecs
        if n <= IVF_FIT_SAMPLE_CAP
        else vecs.sample(fraction=IVF_FIT_SAMPLE_CAP / n, seed=42)
    )
    km = KMeans(k=n_cells, seed=42, initMode="k-means||", maxIter=10)
    model = km.fit(train)
    assigned = (
        model.transform(vecs)
        .withColumnRenamed("prediction", "cell")
        .select("vec_id", "embedding", "label", "cell")
    )
    # partition the inverted lists BY cell: a probe reads only its cells'
    # directories (partition pruning), not row-group filters over the corpus
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "assignments")
    )
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    spark.createDataFrame(centers, "cell int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    return path


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbours.

    Query path only: read the stored cell assignments (ingest-time column,
    see `ivf_build_index`), pick the `n_probe` cells nearest the query
    vector from the centroid table (tiny — collected driver-side), filter
    the inverted lists to those cells, exact-cosine re-rank.  The query
    plan contains no KMeans stage and scans ~|corpus| * n_probe / n_cells
    vectors with the cell filter pushed to the parquet scan.
    """
    import os

    path = ivf_build_index(spark, sf_dir, n_cells)
    assigned = spark.read.parquet(os.path.join(path, "assignments"))
    # query-vector lookup against the base table (vec_id pushdown), not the
    # cell-partitioned index (which would touch every partition directory)
    q_row = (
        load_embeddings(spark, sf_dir)
        .filter(F.col("vec_id") == query_id)
        .select("embedding")
        .head()
    )
    q_emb = list(q_row["embedding"])
    q_arr = F.array(*[F.lit(float(x)) for x in q_emb])
    # probe selection as a plan over the stored centroid table: only the
    # n_probe winners cross to the driver (TakeOrderedAndProject), never
    # the centroid table itself — same shape as ivf_topk_deterministic
    probe_cells = [
        int(r["cell"])
        for r in spark.read.parquet(os.path.join(path, "centroids"))
        .select(
            "cell",
            F.aggregate(
                F.zip_with(
                    F.col("centroid"), q_arr, lambda x, y: (x - y) ** 2
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
        )
        .orderBy("d", "cell")
        .limit(n_probe)
        .collect()
    ]

    cands = assigned.filter(F.col("cell").isin(probe_cells)).filter(
        F.col("vec_id") != query_id
    )
    q_lit = "array(" + ",".join(f"{float(x)!r}D" for x in q_emb) + ")"
    sims = cands.select(
        "vec_id",
        "cell",
        F.round(
            _dot("embedding", q_lit)
            / (
                F.sqrt(_dot("embedding", "embedding"))
                * F.sqrt(_dot(q_lit, q_lit))
            ),
            6,
        ).alias("cos_sim"),
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


# Self-scaling cell count for the sampled-centroid operators: target a
# bounded per-cell occupancy so within-cell pair work grows ~n * OCCUPANCY
# instead of n^2/16 as the corpus grows (a fixed 16-cell default would
# degenerate toward all-pairs at scale).  The floor keeps small corpora at
# the oracle-stable 16 cells; the DuckDB oracles compute the SAME rule as
# a subquery, so both engines derive identical cells at every SF.
CELL_OCCUPANCY = 4096

# Cap on the self-scaled cell count.  Above the cap, per-cell occupancy
# grows instead (the SemDeDup / purity variants stay correct, just
# coarser), and the DuckDB oracle computes the identical capped rule.
# Past ~1k cells the deterministic sampled-centroid variant stops being
# the right tool regardless of kernel speed — the ingest-time
# fitted-KMeans index (`ivf_build_index`, JVM-vectorized Spark ML
# assignment + partition-pruned inverted lists) is the scale path, and
# at 1 B vectors the uncapped rule would want ~250 k cells whose
# centroid table no longer belongs in a task broadcast.
N_CELLS_CAP = 1024

# Dispatch threshold between the two bit-identical argmin kernels in
# `_assign_sampled_cells`: at or below this the pure-Catalyst fold runs
# (oracle-stable plan, pinned in test_plans); above it the Arrow
# per-dim-accumulation kernel runs (same IEEE operation sequence, ~80x
# the throughput — the Catalyst higher-order-function fold is
# interpreted, ~11 us core per row x cell at dim=64; measured in PERF.md
# rounds 7-8).
_ARGMIN_ARROW_THRESHOLD = 32


def _auto_n_cells(n: int) -> int:
    return min(N_CELLS_CAP, max(16, n // CELL_OCCUPANCY))


# SQL twin of `_auto_n_cells` (DuckDB `//` is integer division like Python)
_AUTO_N_CELLS_SQL = (
    f"(SELECT least({N_CELLS_CAP}, greatest(16, count(*) // {CELL_OCCUPANCY}))"
    " FROM embeddings)"
)


def _md5_plane_weight(i: int, p: int) -> float:
    """Weight for dimension `i` of plane `p` = md5("i:p") mapped to
    [-1, 1) — the Python replica of the oracle's SQL formula
    `(('0x' || substr(md5(i || ':' || p), 1, 15))::BIGINT % 2000 - 1000)
    / 1000.0` (values pinned equal by the LSH oracles)."""
    import hashlib

    h = int(hashlib.md5(f"{i}:{p}".encode()).hexdigest()[:15], 16)
    return (h % 2000 - 1000) / 1000.0


def _md5_lsh_bucket_col(vec, planes: int, dim: int = EMBEDDING_DIM):
    """Sign-bit LSH bucket id from md5-derived hyperplanes — fully
    deterministic, no stored model, and computable identically by the
    DuckDB oracles.

    The weights are CONSTANTS of (i, p): they are derived driver-side
    and embedded as literal arrays, so each bucket bit is `dim` fused
    multiply-adds in codegen.  (An earlier version derived the md5
    inside the expression tree, which re-hashed every element of every
    row — 384 md5 calls per row at 6 planes; at 100 TB the hashing,
    not the dot product, would have dominated the scan.)"""
    bits = []
    for p in range(planes):
        w = F.array(*[F.lit(_md5_plane_weight(i, p)) for i in range(dim)])
        dot = F.aggregate(
            F.zip_with(vec, w, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit(1)).otherwise(F.lit(0)) * (2**p))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def lsh_bucketed_topk(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10,
    planes: int = 6, dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Bucket key = sign bits of `planes` pseudo-random hyperplanes (weights
    derived from md5 of "dim:plane" — fully deterministic, no stored
    model, and computable identically by the DuckDB oracle,
    `LSH_TOPK_SQL`).  Candidates = vectors sharing the query's bucket;
    exact cosine re-rank inside the bucket.  At 100 TB the bucket join
    replaces the full scan per query.

    `dim` is part of the oracle contract: the paired SQL hardcodes the
    same value into its plane-weight arrays, so a non-64-dim corpus must
    pass the matching dim on BOTH sides (data-adaptive sizing here would
    silently diverge from the fixed SQL).
    """
    emb = load_embeddings(spark, sf_dir)
    with_b = emb.withColumn(
        "bucket", _md5_lsh_bucket_col(F.col("embedding"), planes, dim)
    )
    qb = with_b.filter(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("q_emb")
    )
    cands = with_b.filter(F.col("vec_id") != query_id).join(
        F.broadcast(qb), F.col("bucket") == F.col("qbucket")
    )
    sims = cands.select(
        "vec_id",
        F.round(
            _dot("embedding", "q_emb")
            / (
                F.sqrt(_dot("embedding", "embedding"))
                * F.sqrt(_dot("q_emb", "q_emb"))
            ),
            6,
        ).alias("cos_sim"),
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def _sampled_centroids(emb: DataFrame, n_cells: int) -> dict:
    """First `n_cells` corpus vectors as centroids (the IVF-flat sampled
    training shortcut): a pure function of the data, so every engine
    derives the identical cells.  Driver collect of `n_cells` rows —
    ONLY for constant-size codebooks (the PQ code table, ncodes<=16);
    corpus-scaled cell assignment goes through
    `_assign_sampled_cells`, which never round-trips the centroids
    through the driver."""
    return {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < n_cells).collect()
    }


def _assign_sampled_cells_arrow(emb: DataFrame, n_cells: int) -> DataFrame:
    """Arrow-batched twin of the Catalyst argmin in
    `_assign_sampled_cells` — BIT-IDENTICAL by construction, ~80x the
    throughput at large cell counts.

    The Catalyst fold computes, per (row, centroid), a strict
    left-to-right accumulation acc = acc + (x_d - c_d)^2 over dims in
    IEEE double; `array_min` over (d, cell) structs breaks ties to the
    lower cell id.  This kernel performs the SAME operation sequence
    with one vectorized numpy op per dim (each element-wise op rounds to
    double exactly like the scalar), and `argmin` returns the first
    minimum = the lowest cell id (centroids sorted by cell).  No
    algebraic rewrite (no ||x||^2 - 2x.c + ||c||^2 GEMM — that changes
    rounding and could flip near-ties vs the DuckDB oracles).

    The centroid fetch is a `collect()` of at most `N_CELLS_CAP` rows
    (bounded by `_auto_n_cells`), the same constant-size-codebook shape
    as `_sampled_centroids`; the rows ship to executors inside the
    serialized function closure, and the per-row work is row-local
    (mapInPandas — no shuffle, no join).  Catalyst lambdas do not
    whole-stage-codegen, so the interpreted fold costs ~11 us core per
    (row x cell) at dim=64 (PERF.md rounds 7-8); this kernel replaces it
    above `_ARGMIN_ARROW_THRESHOLD` cells.
    """
    import numpy as np
    from pyspark.sql.types import IntegerType, StructField, StructType

    cents = (
        emb.filter(F.col("vec_id") < n_cells)
        .select(
            F.col("vec_id").cast("int").alias("cell"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
        .collect()
    )
    cents.sort(key=lambda r: r["cell"])
    cent_mat = np.array([r["centroid"] for r in cents], dtype=np.float64)
    cell_ids = np.array([r["cell"] for r in cents], dtype=np.int64)
    dim = cent_mat.shape[1]

    out_schema = StructType(
        list(emb.schema.fields) + [StructField("cell", IntegerType(), False)]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            acc = np.zeros((len(pdf), len(cell_ids)))
            for d in range(dim):
                diff = x[:, d : d + 1] - cent_mat[None, :, d]
                acc += diff * diff
            pdf = pdf.copy()
            pdf["cell"] = cell_ids[acc.argmin(axis=1)].astype(np.int32)
            yield pdf

    return emb.mapInPandas(assign, out_schema)


def _assign_sampled_cells(emb: DataFrame, n_cells: int) -> DataFrame:
    """Adds `cell` = argmin centroid (squared L2, ties to the lower cell
    id) against the first `n_cells` corpus vectors.

    The centroids ride in as BROADCAST DATA — a one-row frame holding
    the (cell, centroid) array, cross-joined in (BroadcastNestedLoopJoin
    of a single row = a free per-partition variable) — and the argmin is
    one `transform` lambda over that runtime array.  An earlier version
    embedded every centroid as literal expression subtrees, which made
    the plan O(n_cells x dim) in SIZE: at the self-scaled cell count a
    1 M-vector corpus (244 cells) would have produced a ~15k-literal
    codegen unit and a multi-MB plan shipped with every task.  Data
    scales; plans must not.

    The carrier row itself is built JVM-side (filter + collect_list
    aggregate over the n_cells centroid rows) — no driver collect, no
    Python round-trip: at the 1 B-vector regime an uncapped cell count
    would be a ~250 k-row collect and a ~125 MB driver literal; here the
    centroid bytes only ever move executor->executor via the broadcast.
    (`_auto_n_cells` caps the count at `N_CELLS_CAP` anyway — see the
    measured crossover there.)

    Row-local end to end: no shuffle beyond the broadcast — the per-row
    work is n_cells x dim multiply-adds per row, and the fold order
    (elements left-to-right; argmin via array_min over (d, cell) structs
    is order-independent) is unchanged, so the DuckDB oracles' doubles
    match bit-for-bit.

    Above `_ARGMIN_ARROW_THRESHOLD` cells the bit-identical Arrow kernel
    (`_assign_sampled_cells_arrow`) runs instead — the Catalyst
    higher-order-function fold is interpreted and its per-(row x cell)
    cost dominates the pipeline at self-scaled cell counts.
    """
    if n_cells > _ARGMIN_ARROW_THRESHOLD:
        return _assign_sampled_cells_arrow(emb, n_cells)
    cent_df = (
        emb.filter(F.col("vec_id") < n_cells)
        .select(
            F.struct(
                F.col("vec_id").cast("int").alias("cell"),
                F.col("embedding").cast("array<double>").alias("centroid"),
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("_cents"))
    )
    d2 = lambda vec, cent: F.aggregate(  # noqa: E731
        F.zip_with(vec, cent, lambda x, y: (x.cast("double") - y) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                d2(F.col("embedding"), c["centroid"]).alias("d"),
                c["cell"].alias("c"),
            ),
        )
    )["c"]
    return (
        emb.crossJoin(F.broadcast(cent_df))
        .withColumn("cell", best)
        .drop("_cents")
    )


def ivf_topk_deterministic(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_cells: int | None = None,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN with SAMPLED centroids (the common IVF-flat training
    shortcut): centroids are the first `n_cells` corpus vectors, so cell
    assignment is a pure function of the data and the full pipeline has a
    value-level DuckDB oracle (`IVF_TOPK_DET_SQL`) — unlike the fitted
    KMeans variant (`ivf_topk`, rows-only).

    `n_cells=None` self-scales with the corpus (`_auto_n_cells`: bounded
    per-cell occupancy); the oracle computes the identical rule as a
    subquery, so both engines derive the same cells at every SF.

    Query path identical in shape to `ivf_topk`: nearest `n_probe` cells
    by centroid distance, scan only those cells' vectors, exact-cosine
    re-rank.  Assignment here is computed inline (n_cells x dim fused
    multiply-adds per row in codegen); at ingest it becomes the stored
    `cell` column exactly as in `ivf_build_index`.  Ties break to the
    lower cell id / lower vec_id in BOTH engines.
    """
    emb = load_embeddings(spark, sf_dir)
    if n_cells is None:
        n_cells = _auto_n_cells(emb.count())
    assigned = _assign_sampled_cells(emb, n_cells)

    # query vector: one-row pushdown lookup (vec_id filter reaches the scan)
    q_emb = list(
        emb.filter(F.col("vec_id") == query_id).head()["embedding"]
    )
    q_lit = "array(" + ",".join(f"{float(x)!r}D" for x in q_emb) + ")"
    # probe selection runs AS A PLAN over the n_cells centroid rows and
    # collects only the n_probe winners (TakeOrderedAndProject) — never
    # the centroid table itself, which is corpus-scaled.  Same
    # left-to-right double fold and (d, cell) tie-break as the oracle.
    qd = (
        emb.filter(F.col("vec_id") < n_cells)
        .select(
            F.col("vec_id").cast("int").alias("cell"),
            F.expr(_sqdist_sql("embedding", q_lit)).alias("d"),
        )
        .orderBy("d", "cell")
        .limit(n_probe)
    )
    probe_cells = [int(r["cell"]) for r in qd.collect()]
    sims = (
        assigned.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            "cell",
            F.round(
                _dot("embedding", q_lit)
                / (
                    F.sqrt(_dot("embedding", "embedding"))
                    * F.sqrt(_dot(q_lit, q_lit))
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(k)


def _ivf_topk_det_sql(
    query_id: int = 0,
    k: int = 10,
    n_cells: "int | str | None" = None,
    n_probe: int = 4,
    dim: int = EMBEDDING_DIM,
) -> str:
    """DuckDB oracle reproducing the deterministic IVF pipeline: same
    sampled centroids, same left-to-right double-fold distances (list_sum
    over list_transform matches the Spark `aggregate` fold order), same
    tie-breaking."""
    d2 = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) ** 2))"
    ).format(d=dim)
    dot = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))"
    ).format(d=dim)
    na = (
        "sqrt(list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))"
    ).format(d=dim)
    nq = (
        "sqrt(list_sum(list_transform(range(1, {d} + 1), "
        "i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))"
    ).format(d=dim)
    if n_cells is None:
        n_cells = _AUTO_N_CELLS_SQL  # same self-scaling rule as the engine
    return f"""
WITH cents AS (SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < {n_cells}),
dists AS (
  SELECT a.vec_id, c.cell, {d2.replace('c.embedding', 'c.embedding')} AS d
  FROM embeddings a, cents c
),
assigned AS (
  SELECT vec_id, min(cell) AS cell
  FROM (SELECT vec_id, cell, d, min(d) OVER (PARTITION BY vec_id) AS md FROM dists)
  WHERE d = md GROUP BY vec_id
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_id}),
qd AS (
  SELECT c.cell,
         list_sum(list_transform(range(1, {dim} + 1),
             i -> (CAST(q.qe[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) ** 2)) AS d
  FROM cents c, q
),
probes AS (SELECT cell FROM qd ORDER BY d, cell LIMIT {n_probe})
SELECT a.vec_id, s.cell, round({dot} / ({na} * {nq}), 6) AS cos_sim
FROM embeddings a
JOIN assigned s ON a.vec_id = s.vec_id
JOIN probes p ON s.cell = p.cell
CROSS JOIN q
WHERE a.vec_id != {query_id}
ORDER BY cos_sim DESC, a.vec_id ASC
LIMIT {k}
"""


IVF_TOPK_DET_SQL = _ivf_topk_det_sql()


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.35,
    n_cells: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space, then mark as duplicates the members of each
    cluster that sit within `threshold` cosine of a lower-id member.

    Clustering = the deterministic sampled-centroid assignment shared
    with `ivf_topk_deterministic`, so the full pipeline has a value-level
    DuckDB oracle.  Pair comparison happens ONLY within a cell (a cell
    equi-join, never a cartesian): at 100 TB the n_cells knob bounds the
    per-cell candidate set so total pair work stays ~n^2/n_cells, and the
    cell id doubles as the shuffle key — one exchange for the self-join,
    one broadcast-size distinct for the dup ids.

    Returns every vector with its cell and kept flag (kept = no lower-id
    semantic duplicate in the same cell).

    `n_cells=None` self-scales with the corpus (`_auto_n_cells`): the
    within-cell pair work is the published algorithm's quadratic shape,
    so the cell count must grow with n to keep per-cell occupancy (and
    the n^2/n_cells pair total) bounded.  The oracle computes the same
    rule as a subquery.
    """
    emb = load_embeddings(spark, sf_dir)
    if n_cells is None:
        n_cells = _auto_n_cells(emb.count())
    assigned = _assign_sampled_cells(emb, n_cells)
    # norms once per VECTOR, not once per pair: the pair join multiplies
    # precomputed scalars (bit-identical to sqrt-per-pair — same fold,
    # same doubles — but ~3x less pair work)
    with_n = assigned.withColumn(
        "nrm", F.sqrt(_dot("embedding", "embedding"))
    )
    a = with_n.select(
        F.col("vec_id").alias("id_a"),
        "cell",
        F.col("embedding").alias("e_a"),
        F.col("nrm").alias("n_a"),
    )
    b = with_n.select(
        F.col("vec_id").alias("id_b"),
        "cell",
        F.col("embedding").alias("e_b"),
        F.col("nrm").alias("n_b"),
    )
    cos = F.round(
        _dot("e_a", "e_b") / (F.col("n_a") * F.col("n_b")), 6
    )
    dups = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return assigned.select("vec_id", "cell").join(dups, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.when(F.col("is_dup").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("kept"),
    )


def _semantic_dedup_sql(
    threshold: float = 0.35, n_cells: "int | str | None" = None, dim: int = EMBEDDING_DIM
) -> str:
    d2 = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) ** 2))"
    ).format(d=dim)

    def dot(x: str, y: str) -> str:
        return (
            "list_sum(list_transform(range(1, {d} + 1), "
            "i -> CAST({x}.embedding[i] AS DOUBLE) * CAST({y}.embedding[i] AS DOUBLE)))"
        ).format(d=dim, x=x, y=y)

    if n_cells is None:
        n_cells = _AUTO_N_CELLS_SQL  # same self-scaling rule as the engine
    return f"""
WITH cents AS (SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < {n_cells}),
dists AS (SELECT a.vec_id, c.cell, {d2} AS d FROM embeddings a, cents c),
assigned AS (
  SELECT vec_id, min(cell) AS cell
  FROM (SELECT vec_id, cell, d, min(d) OVER (PARTITION BY vec_id) AS md FROM dists)
  WHERE d = md GROUP BY vec_id
),
dups AS (
  SELECT DISTINCT pb.vec_id AS vec_id
  FROM assigned pa JOIN assigned pb ON pa.cell = pb.cell AND pa.vec_id < pb.vec_id
  JOIN embeddings ea ON ea.vec_id = pa.vec_id
  JOIN embeddings eb ON eb.vec_id = pb.vec_id
  WHERE round({dot('ea', 'eb')} / (sqrt({dot('ea', 'ea')}) * sqrt({dot('eb', 'eb')})), 6)
        >= {threshold}
)
SELECT s.vec_id, s.cell,
       CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()


def knn_join(
    spark: SparkSession, sf_dir: str, k: int = 5, planes: int = 6, dim: int = EMBEDDING_DIM
) -> DataFrame:
    """Approximate k-NN self-join: every vector's top-k cosine neighbours
    among the vectors sharing its LSH bucket (the batch companion to the
    single-query `lsh_bucketed_topk`).

    The bucket equi-join replaces the n^2 all-pairs scan — pair work is
    sum over buckets of |bucket|^2, and `planes` tunes bucket size so the
    join stays sub-quadratic at 100 TB.  The per-vector top-k is a
    row_number window partitioned by vec_id, which reuses the join's
    hash partitioning; no global sort anywhere.

    `dim` must match the paired oracle SQL's hardcoded plane-weight dim
    (see `lsh_bucketed_topk`).
    """
    emb = load_embeddings(spark, sf_dir)
    with_b = emb.withColumn(
        "bucket", _md5_lsh_bucket_col(F.col("embedding"), planes, dim)
    ).withColumn("nrm", F.sqrt(_dot("embedding", "embedding")))
    a = with_b.select(
        "vec_id", "bucket", F.col("embedding").alias("e_a"), F.col("nrm").alias("n_a")
    )
    b = with_b.select(
        F.col("vec_id").alias("neighbor_id"),
        "bucket",
        F.col("embedding").alias("e_b"),
        F.col("nrm").alias("n_b"),
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            F.round(
                _dot("e_a", "e_b") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", "cos_sim")
    )


def _knn_join_sql(k: int = 5, planes: int = 6, dim: int = EMBEDDING_DIM) -> str:
    def weight(p: int) -> str:
        h = f"('0x' || substr(md5(CAST(i - 1 AS VARCHAR) || ':{p}'), 1, 15))::BIGINT"
        return f"(CAST({h} % 2000 AS DOUBLE) - 1000) / 1000.0"

    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST(embedding[i] AS DOUBLE) * {weight(p)})) > 0 THEN {2**p} ELSE 0 END)"
        for p in range(planes)
    )

    def dot(x: str, y: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim} + 1), "
            f"i -> CAST({x}.embedding[i] AS DOUBLE) * CAST({y}.embedding[i] AS DOUBLE)))"
        )

    return f"""
WITH b AS (SELECT vec_id, embedding, {bits} AS bucket FROM embeddings),
p AS (
  SELECT a.vec_id, x.vec_id AS neighbor_id,
         round({dot('a', 'x')} / (sqrt({dot('a', 'a')}) * sqrt({dot('x', 'x')})), 6)
             AS cos_sim
  FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id != x.vec_id
),
r AS (
  SELECT vec_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM p
)
SELECT vec_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
FROM r WHERE rank <= {k}
"""


KNN_JOIN_SQL = _knn_join_sql()


# Product quantization: M subspaces x K codebook entries per subspace.
# Codebooks are the sub-slices of the first K corpus vectors (the same
# sampled-training shortcut as `ivf_topk_deterministic`), so codes and
# ADC distances are pure functions of the data — fully value-oracled.
_PQ_M = 8  # subspaces (64-dim -> 8 dims each)
_PQ_K = 16  # codebook entries per subspace (4-bit codes)


def pq_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    m: int = _PQ_M,
    ncodes: int = _PQ_K,
    dim: int = EMBEDDING_DIM,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): compress each vector
    to `m` sub-codes (argmin sub-centroid per subspace), answer top-k by
    asymmetric distance — the query's per-subspace lookup table summed
    over each vector's codes.

    The 100 TB story is COMPRESSION: a 64-dim float vector (256 B)
    becomes m=8 4-bit codes (4 B), so the candidate scan reads 64x less
    and the per-vector distance is m table lookups instead of a dim-wide
    dot product.  Here codes are computed inline (at ingest they become a
    stored `codes` column exactly like `ivf_build_index`'s cell); the
    lookup tables are literal arrays (ncodes doubles per subspace)
    resolved in codegen, and the top-k is TakeOrderedAndProject.

    Ties break to the lower code / lower vec_id in both engines.
    """
    sub = dim // m
    emb = load_embeddings(spark, sf_dir)
    cents = _sampled_centroids(emb, ncodes)
    q_emb = cents.get(query_id) or list(
        emb.filter(F.col("vec_id") == query_id).head()["embedding"]
    )

    def sub_d2(vec, s: int, cent: list):
        """Squared L2 between vec[s*sub:(s+1)*sub] and the centroid slice
        (left-to-right fold, exact double parity with the oracle)."""
        sl = F.slice(vec, s * sub + 1, sub)
        carr = F.array(*[F.lit(float(x)) for x in cent[s * sub : (s + 1) * sub]])
        return F.aggregate(
            F.zip_with(sl, carr, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # Codes index POSITIONS in the sorted-id codebook (not raw vec_ids):
    # the LUT lookup is element_at by position, so the pairing stays
    # correct even if centroid ids are non-contiguous.  Position order ==
    # sorted id order, so the min-position tie-break matches the oracle's
    # min-id tie-break.
    cent_list = [cents[c] for c in sorted(cents)]

    def code_col(vec, s: int):
        return F.array_min(
            F.array(
                *[
                    F.struct(sub_d2(vec, s, cent).alias("d"), F.lit(i).alias("c"))
                    for i, cent in enumerate(cent_list)
                ]
            )
        )["c"]

    # query-side lookup tables: exact python replication of sub_d2 on the
    # literal query vector (same left-to-right double fold)
    def lut(s: int, cent: list) -> float:
        acc = 0.0
        for i in range(s * sub, (s + 1) * sub):
            acc = acc + (float(q_emb[i]) - float(cent[i])) ** 2
        return acc

    adc = F.lit(0.0)
    for s in range(m):
        lut_arr = F.array(*[F.lit(lut(s, cent)) for cent in cent_list])
        adc = adc + F.element_at(lut_arr, code_col(F.col("embedding"), s) + 1)

    return (
        emb.filter(F.col("vec_id") != query_id)
        .select("vec_id", F.round(adc, 6).alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
        .limit(k)
    )


def _pq_topk_sql(
    query_id: int = 0,
    k: int = 10,
    m: int = _PQ_M,
    ncodes: int = _PQ_K,
    dim: int = EMBEDDING_DIM,
) -> str:
    sub = dim // m
    d2 = (
        f"list_sum(list_transform(range(s.s * {sub} + 1, s.s * {sub} + {sub} + 1), "
        "i -> (CAST({x}.embedding[i] AS DOUBLE) - CAST({y}.embedding[i] AS DOUBLE)) ** 2))"
    )
    return f"""
WITH cents AS (SELECT vec_id AS c, embedding FROM embeddings WHERE vec_id < {ncodes}),
subs AS (SELECT unnest(range({m})) AS s),
cdist AS (
  SELECT a.vec_id, s.s, c.c, {d2.format(x='a', y='c')} AS d
  FROM embeddings a, subs s, cents c
),
codes AS (
  SELECT vec_id, s, min(c) AS c
  FROM (SELECT vec_id, s, c, d, min(d) OVER (PARTITION BY vec_id, s) AS md FROM cdist)
  WHERE d = md GROUP BY vec_id, s
),
q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_id}),
lut AS (
  SELECT s.s, c.c, {d2.format(x='q', y='c')} AS d
  FROM q, subs s, cents c
)
SELECT v.vec_id, round(sum(l.d), 6) AS approx_dist
FROM codes v JOIN lut l ON v.s = l.s AND v.c = l.c
WHERE v.vec_id != {query_id}
GROUP BY v.vec_id
ORDER BY approx_dist ASC, v.vec_id ASC
LIMIT {k}
"""


PQ_TOPK_SQL = _pq_topk_sql()


def pq_recall(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Recall@k of the PQ index against the exact L2 top-k — the index
    quality metric a pipeline tracks when tuning m/ncodes.  Joins two
    k-row frames (both TakeOrdered results); the exact side scans the
    corpus once with the same fold the oracle uses.
    """
    emb = load_embeddings(spark, sf_dir)
    q_emb = list(emb.filter(F.col("vec_id") == query_id).head()["embedding"])
    q_lit = "array(" + ",".join(f"{float(x)!r}D" for x in q_emb) + ")"
    d2 = F.expr(_sqdist_sql("embedding", q_lit))
    exact = (
        emb.filter(F.col("vec_id") != query_id)
        .select("vec_id", d2.alias("d2"))
        .orderBy(F.col("d2").asc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id")
    )
    approx = pq_topk(spark, sf_dir, query_id, k).select("vec_id")
    return approx.join(exact, "vec_id").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.round(F.count("*") / F.lit(float(k)), 6).alias("recall"),
    )


def _pq_recall_sql(query_id: int = 0, k: int = 10, dim: int = EMBEDDING_DIM) -> str:
    d2 = (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        "i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE)) ** 2))"
    )
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_hits,
       round(count(*) / CAST({k} AS DOUBLE), 6) AS recall
FROM ({_pq_topk_sql(query_id, k)}) ap
JOIN (
  SELECT a.vec_id
  FROM embeddings a, (SELECT embedding FROM embeddings WHERE vec_id = {query_id}) q
  WHERE a.vec_id != {query_id}
  ORDER BY {d2} ASC, a.vec_id ASC
  LIMIT {k}
) ex USING (vec_id)
"""


PQ_RECALL_SQL = _pq_recall_sql()


def ivf_recall(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    bound: float = 0.7,
) -> DataFrame:
    """Recall@k of the fitted-KMeans IVF index against the exact cosine
    top-k, thresholded against `bound` ENGINE-side.

    The fitted quantizer cannot be reproduced in SQL, so the driver
    oracle for this entry pins the PROPERTY instead of the rows: the
    index must recover >= bound of the true neighbours (the quality
    metric a pipeline tracks when tuning n_cells/n_probe — same role as
    `pq_recall`, whose deterministic index permits a full value oracle).
    The exact side uses cosine — the metric the IVF re-rank itself
    uses — so a miss means the probe skipped the right cells, not a
    metric mismatch.  At the driver's gate SF (0.01) measured recall is
    1.0; bound 0.7 leaves margin for KMeans partitioning jitter.
    (`IVF_RECALL_SQL` is the constant twin.)
    """
    exact = cosine_topk(spark, sf_dir, query_id, k).select("vec_id")
    approx = ivf_topk(spark, sf_dir, query_id=query_id, k=k).select("vec_id")
    return approx.join(exact, "vec_id").agg(
        F.lit(k).cast("int").alias("k"),
        (F.count("*") >= F.lit(bound) * F.lit(k)).cast("int").alias("recall_ge_bound"),
    )


IVF_RECALL_SQL = (
    "SELECT CAST(10 AS INT) AS k, CAST(1 AS INT) AS recall_ge_bound"
)


def random_projection(
    spark: SparkSession, sf_dir: str, out_dim: int = 16, dim: int = EMBEDDING_DIM
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: embed 64-dim vectors into
    `out_dim` dims with the md5-derived deterministic weight matrix the
    LSH family uses — the storage/compute reduction step before a
    downstream ANN or clustering pass (4x smaller vectors here).

    Pure projection: `out_dim` fused multiply-add folds per row in
    codegen, no shuffle, no stored model — any engine derives the same
    matrix, so the output is value-oracled.  Scaled by 1/sqrt(out_dim)
    to preserve expected norms (the JL convention).

    Output shape is one scalar column per projected dimension
    (`p0..p{out_dim-1}`) rather than a single `array<double>` column:
    downstream consumers (and the driver's hash canonicalizer) want
    flat columnar scalars, and Parquet stores them more compactly than
    a repeated group at 100 TB.
    """
    import math as _math

    emb = load_embeddings(spark, sf_dir)
    scale = 1.0 / _math.sqrt(out_dim)
    comps = []
    for p in range(out_dim):
        w = F.array(*[F.lit(_md5_plane_weight(i, p)) for i in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), w, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        comps.append(F.round(dot * F.lit(scale), 6).alias(f"p{p}"))
    return emb.select("vec_id", *comps)


def _random_projection_sql(out_dim: int = 16, dim: int = EMBEDDING_DIM) -> str:
    import math as _math

    scale = repr(1.0 / _math.sqrt(out_dim))

    def weight(p: int) -> str:
        h = f"('0x' || substr(md5(CAST(i - 1 AS VARCHAR) || ':{p}'), 1, 15))::BIGINT"
        return f"(CAST({h} % 2000 AS DOUBLE) - 1000) / 1000.0"

    comps = ", ".join(
        f"round(list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST(embedding[i] AS DOUBLE) * {weight(p)})) * {scale}, 6) AS p{p}"
        for p in range(out_dim)
    )
    return f"SELECT vec_id, {comps} FROM embeddings"


RANDOM_PROJECTION_SQL = _random_projection_sql()


def cluster_purity(
    spark: SparkSession, sf_dir: str, n_cells: int = 16
) -> DataFrame:
    """Clustering-quality report: per cell of the deterministic
    sampled-centroid clustering, the member count, the majority
    ground-truth label, and purity (majority share) — the metric a
    pipeline tracks when tuning n_cells for semantic dedup / IVF.

    One pass: assignment (codegen), a (cell, label) rollup, then a
    per-cell argmax window over the aggregate-sized frame.  Ties break
    to the lower label id in both engines.
    """
    from pyspark.sql.window import Window

    emb = load_embeddings(spark, sf_dir)
    assigned = _assign_sampled_cells(emb, n_cells)
    by_label = assigned.groupBy("cell", "label").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("cell").orderBy(F.col("n").desc(), F.col("label").asc())
    top = by_label.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    totals = assigned.groupBy("cell").agg(F.count("*").cast("long").alias("n_members"))
    return totals.join(top.select("cell", F.col("label").alias("majority_label"), "n"), "cell").select(
        "cell",
        "n_members",
        "majority_label",
        F.round(F.col("n") / F.col("n_members"), 6).alias("purity"),
    )


def _cluster_purity_sql(n_cells: int = 16, dim: int = EMBEDDING_DIM) -> str:
    d2 = (
        "list_sum(list_transform(range(1, {d} + 1), "
        "i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(c.embedding[i] AS DOUBLE)) ** 2))"
    ).format(d=dim)
    return f"""
WITH cents AS (SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < {n_cells}),
dists AS (SELECT a.vec_id, c.cell, {d2} AS d FROM embeddings a, cents c),
assigned AS (
  SELECT vec_id, min(cell) AS cell
  FROM (SELECT vec_id, cell, d, min(d) OVER (PARTITION BY vec_id) AS md FROM dists)
  WHERE d = md GROUP BY vec_id
),
lab AS (
  SELECT s.cell, e.label, count(*) AS n
  FROM assigned s JOIN embeddings e ON s.vec_id = e.vec_id
  GROUP BY s.cell, e.label
),
top AS (
  SELECT cell, label AS majority_label, n,
         row_number() OVER (PARTITION BY cell ORDER BY n DESC, label ASC) AS rk
  FROM lab
),
tot AS (SELECT cell, CAST(sum(n) AS BIGINT) AS n_members FROM lab GROUP BY cell)
SELECT t.cell, t.n_members, p.majority_label,
       round(p.n / t.n_members, 6) AS purity
FROM tot t JOIN top p ON t.cell = p.cell AND p.rk = 1
"""


CLUSTER_PURITY_SQL = _cluster_purity_sql()


def emb_outliers(
    spark: SparkSession, sf_dir: str, k: int = 20, dim: int = EMBEDDING_DIM
) -> DataFrame:
    """Embedding-quality outlier report: the k vectors farthest from
    their label's centroid — the standard "drop the weird embeddings"
    filter a curation pipeline runs before clustering/dedup.

    Centroids are ONE per label (a handful of rows): `dim` narrow `avg`
    aggregates per label computed in a single partial-aggregated pass,
    then broadcast back — the corpus scan never shuffles by anything but
    `label`, and the distance is a JVM-side `aggregate`/`zip_with` fold.
    Top-k reduces via TakeOrderedAndProject (no global sort); ties break
    on vec_id so the report is deterministic cross-engine."""
    emb = load_embeddings(spark, sf_dir)
    cent = emb.groupBy("label").agg(
        F.array(
            *[F.avg(F.col("embedding")[i].cast("double")) for i in range(dim)]
        ).alias("centroid")
    )
    dist = (
        emb.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            "embedding",
                            "centroid",
                            lambda x, y: (x.cast("double") - y) ** 2,
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                ),
                6,
            ).alias("dist"),
        )
    )
    return dist.orderBy(F.col("dist").desc(), F.col("vec_id").asc()).limit(k)


def _emb_outliers_sql(k: int = 20, dim: int = EMBEDDING_DIM) -> str:
    return f"""
WITH x AS (
  SELECT vec_id, label, CAST(embedding[t.i] AS DOUBLE) AS val, t.i AS idx
  FROM embeddings CROSS JOIN range(1, {dim} + 1) AS t(i)
),
c AS (SELECT label, idx, avg(val) AS m FROM x GROUP BY label, idx),
d AS (
  SELECT x.vec_id, x.label, round(sqrt(sum((x.val - c.m) * (x.val - c.m))), 6) AS dist
  FROM x JOIN c ON x.label = c.label AND x.idx = c.idx
  GROUP BY x.vec_id, x.label
)
SELECT vec_id, label, dist FROM d ORDER BY dist DESC, vec_id ASC LIMIT {k}
"""


EMB_OUTLIERS_SQL = _emb_outliers_sql()
