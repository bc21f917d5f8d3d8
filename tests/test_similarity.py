"""Similarity-search quality tests: approximate paths vs exact baseline."""

from __future__ import annotations

import pytest

from atlas_spark.operators.similarity import cosine_topk, ivf_topk, lsh_bucketed_topk


@pytest.fixture(scope="module")
def exact_ids(spark, sf_dir):
    return [r["vec_id"] for r in cosine_topk(spark, sf_dir, k=10).collect()]


def test_ivf_recall(spark, sf_dir, exact_ids):
    ivf_ids = [r["vec_id"] for r in ivf_topk(spark, sf_dir, k=10).collect()]
    recall = len(set(ivf_ids) & set(exact_ids)) / len(exact_ids)
    assert recall >= 0.8, f"IVF recall@10 {recall}"


def test_ivf_deterministic(spark, sf_dir):
    a = [tuple(r) for r in ivf_topk(spark, sf_dir, k=5).collect()]
    b = [tuple(r) for r in ivf_topk(spark, sf_dir, k=5).collect()]
    assert a == b


def test_lsh_results_subset_of_corpus(spark, sf_dir, exact_ids):
    rows = lsh_bucketed_topk(spark, sf_dir, k=10).collect()
    # LSH probes one bucket: results are valid similarities, ordered desc
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_sampled_cell_assignment_plan_size_invariant(spark, sf_dir):
    """The sampled-centroid cell assignment must carry centroids as
    broadcast DATA, not literal expression subtrees: at the self-scaled
    cell count a 1 M-vector corpus means ~244 cells, and a plan that is
    O(n_cells x dim) in size ships a multi-MB codegen unit with every
    task.  Pin: plan text size does not grow with n_cells, and the
    centroids arrive via a broadcast join."""
    from atlas_spark.operators.similarity import (
        _assign_sampled_cells,
        load_embeddings,
    )

    emb = load_embeddings(spark, sf_dir)
    p16 = _assign_sampled_cells(
        emb, 16
    )._jdf.queryExecution().executedPlan().toString()
    p32 = _assign_sampled_cells(
        emb, 32
    )._jdf.queryExecution().executedPlan().toString()
    assert len(p32) <= len(p16) * 1.2, (len(p16), len(p32))
    assert "Broadcast" in p16
    # the carrier is built JVM-side: no createDataFrame round-trip, so no
    # python-materialized ExistingRDD scan anywhere in the plan
    assert "ExistingRDD" not in p16, p16
    # above the dispatch threshold the Arrow kernel runs: row-local
    # mapInPandas, no exchange/join of any kind in the plan
    p128 = _assign_sampled_cells(
        emb, 128
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p128, p128
    assert "Exchange" not in p128 and "Join" not in p128, p128


def test_sampled_cell_assignment_kernels_bit_identical(spark, sf_dir):
    """The Arrow argmin kernel performs the same IEEE operation sequence
    as the Catalyst fold (per-dim subtract/square/accumulate in double,
    first-minimum tie-break), so cell assignments must agree EXACTLY —
    any drift here silently shifts every within-cell operator
    (semantic_dedup / knn_join / cluster_purity) off its DuckDB oracle
    at self-scaled cell counts."""
    import atlas_spark.operators.similarity as sim

    emb = sim.load_embeddings(spark, sf_dir)
    for n_cells in (64, 200):
        orig = sim._ARGMIN_ARROW_THRESHOLD
        sim._ARGMIN_ARROW_THRESHOLD = 1 << 30
        try:
            catalyst = {
                r["vec_id"]: r["cell"]
                for r in sim._assign_sampled_cells(emb, n_cells)
                .select("vec_id", "cell")
                .collect()
            }
        finally:
            sim._ARGMIN_ARROW_THRESHOLD = orig
        arrow = {
            r["vec_id"]: r["cell"]
            for r in sim._assign_sampled_cells_arrow(emb, n_cells)
            .select("vec_id", "cell")
            .collect()
        }
        assert catalyst == arrow, (
            n_cells,
            {k: (catalyst[k], arrow.get(k)) for k in catalyst if catalyst[k] != arrow.get(k)},
        )


def test_non64_dim_corpus_matches_oracles(spark, tmp_path):
    """One `dim` threads through the engine AND its oracle-SQL twin: a
    32-dim synthetic corpus must match DuckDB for every similarity
    operator family when both sides get dim=32 (guards against a
    hardcoded-64 weight matrix or fold bound silently diverging on a
    non-default corpus)."""
    import math

    import duckdb
    import pytest

    from atlas_spark.operators import similarity as sim

    DIM, N = 32, 120
    rows = []
    for v in range(N):
        rows.append(
            (
                v,
                [float(round(math.sin(v * 0.37 + i * 0.11), 6)) for i in range(DIM)],
                v % 4,
            )
        )
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    sf_dir = str(tmp_path)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet/*.parquet'"
    )

    cases = [
        (sim.cosine_topk(spark, sf_dir), sim.cosine_topk_sql(dim=DIM)),
        (
            sim.lsh_bucketed_topk(spark, sf_dir, dim=DIM),
            sim._lsh_topk_sql(dim=DIM),
        ),
        (sim.knn_join(spark, sf_dir, dim=DIM), sim._knn_join_sql(dim=DIM)),
        (
            sim.random_projection(spark, sf_dir, dim=DIM),
            sim._random_projection_sql(dim=DIM),
        ),
        (
            sim.ivf_topk_deterministic(spark, sf_dir),
            sim._ivf_topk_det_sql(dim=DIM),
        ),
        (
            sim.semantic_dedup(spark, sf_dir),
            sim._semantic_dedup_sql(dim=DIM),
        ),
        (sim.pq_topk(spark, sf_dir, dim=DIM), sim._pq_topk_sql(dim=DIM)),
        (
            sim.embedding_near_dup(spark, sf_dir, dim=DIM),
            sim.embedding_near_dup_sql(dim=DIM),
        ),
        (
            sim.cluster_purity(spark, sf_dir),
            sim._cluster_purity_sql(dim=DIM),
        ),
    ]
    for df, sql in cases:
        cols = sorted(df.columns)

        def canon(vals):
            out = []
            for v in vals:
                if isinstance(v, float):
                    v = round(v, 6)
                    v = 0.0 if v == 0 else v
                elif isinstance(v, list):
                    v = tuple(round(float(x), 6) for x in v)
                out.append(v)
            return tuple(out)

        s = sorted((canon(tuple(r[c] for c in cols)) for r in df.collect()), key=repr)
        cur = con.execute(sql)
        dcols = [c[0] for c in cur.description]
        d = sorted(
            (canon(tuple(row[dcols.index(c)] for c in cols)) for row in cur.fetchall()),
            key=repr,
        )
        if s != d:
            diff = [(a, b) for a, b in zip(s, d) if a != b][:2]
            pytest.fail(f"{sql[:60]}...: {len(s)} vs {len(d)} rows; diffs {diff}")
    con.close()
