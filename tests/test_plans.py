"""Physical-plan regression tests.

Correctness tests prove the numbers are right at test scale; these prove
the PLANS are the ones that survive a 1000x scale-up.  Each assertion
pins a scale property the engine was designed around:

- filters and column pruning reach the parquet scan (PushedFilters /
  ReadSchema) -> scan volume is bounded by predicate selectivity;
- plain top-k compiles to TakeOrderedAndProject (partial per-partition
  top-k + k-row merge), never a single-partition global sort;
- near-dup candidate generation is a bucket equi-join, never a
  cartesian / broadcast-nested-loop product;
- small dimension tables broadcast in the star-schema joins, so the
  fact table never shuffles for them.

A regression that flips one of these still passes value checks at
sf0.01 — only the plan shape betrays it, which is why they're pinned
here.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry


def _plan(df) -> str:
    """Physical plan text (pre-execution; AQE final plans only differ by
    runtime re-optimizations, the properties pinned here appear in the
    initial plan)."""
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_tag_filter_pushed_to_scan(spark, sf_dir, queries):
    """`name,click,:eq,:sum`: the tag predicate and the time-range bound
    must reach the parquet scan, not run post-scan."""
    plan = _plan(queries["q_eq_sum"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "IsNotNull" in pushed or "EqualTo" in pushed, pushed
    # time-range on the raw ts column is pushed as >= / <
    assert "GreaterThanOrEqual" in pushed or "EqualTo" in pushed, pushed


def test_scan_prunes_columns(spark, sf_dir, queries):
    """An aggregate touching (t, value, one tag) must not read the whole
    row — ReadSchema stays narrow."""
    plan = _plan(queries["q_eq_sum"](spark, sf_dir))
    assert "ReadSchema" in plan
    schema = plan.split("ReadSchema: ", 1)[1].split("\n", 1)[0]
    assert "text" not in schema  # no unrelated wide columns
    assert len(schema) < 200, schema


def test_topk_is_take_ordered(spark, sf_dir, queries):
    """`:topk` = orderBy(stat).limit(k): TakeOrderedAndProject does a
    per-partition partial top-k then merges k rows — no global sort on
    one task (the round-1 Window.orderBy-without-partitionBy bug)."""
    plan = _plan(queries["f_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_style_limit_is_take_ordered(spark, sf_dir, queries):
    plan = _plan(queries["style_limit"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_no_window_in_topk_others(spark, sf_dir, queries):
    """-others- ranks via TakeOrderedAndProject over the per-key stats and
    folds the remainder in one pass — there must be NO Window operator at
    all (the round-1 plan ranked with a global, single-task Window)."""
    plan = _plan(queries["f_topk_others"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan, plan


def test_near_dup_has_no_cartesian(spark, sf_dir, queries):
    """Embedding near-dup and ngram near-dup must generate candidates by
    bucket equi-join — a cartesian/nested-loop product is the O(n^2)
    anti-pattern the LSH design exists to avoid."""
    for name in ("op_emb_near_dup", "op_ngram_jaccard", "op_minhash_candidates"):
        plan = _plan(queries[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_star_schema_broadcasts_dims(spark, sf_dir, queries):
    """rel_revenue_by_nation joins lineitem->orders->customer->nation:
    the small dims must broadcast; the fact table must not shuffle for
    them."""
    plan = _plan(queries["rel_revenue_by_nation"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_cosine_topk_is_take_ordered(spark, sf_dir, queries):
    """Brute-force cosine top-k must reduce via TakeOrderedAndProject
    (partial top-k per partition), not a global sort."""
    plan = _plan(queries["op_cosine_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_datapoint_rollup_partial_agg(spark, sf_dir, queries):
    """data_by_sum folds raw datapoints with a partial/final hash
    aggregate pair — map-side combine before the shuffle."""
    plan = _plan(queries["data_by_sum"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, "expected partial+final agg"


def test_ivf_topk_has_no_fit_stage(spark, sf_dir, queries):
    """IVF cell assignment happens at ingest; the per-query plan is a
    probe-cell filter + rerank.  A KMeans fit in the query path would
    show as extra exchanges/collects — pin the optimized plan to a
    bounded number of joins and no aggregation over the full table."""
    from atlas_spark.operators.similarity import ivf_topk

    plan = _plan(ivf_topk(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the registry entry wraps ivf_topk in a recall@k comparison whose
    # EXACT arm is the brute-force cosine baseline — that arm carries the
    # one sanctioned broadcast-single-query-vector cross (similarity.py
    # cosine_topk), so only pin the stronger property on the wrapper:
    # nothing unbroadcast goes quadratic
    wrapped = _plan(queries["op_ivf_topk"](spark, sf_dir))
    assert "CartesianProduct" not in wrapped


def test_ivf_probe_prunes_partitions(spark, sf_dir):
    """The stored inverted lists are written partitionBy(cell); a probe's
    candidate scan must carry PartitionFilters on `cell` (directory-level
    pruning) rather than row-group filters over the corpus — the property
    that makes the fitted index the 1B-vector path (reference role: the
    index lookup in RoaringTagIndex.scala:259-281).  Volume row:
    scripts/vol_ivf_4m.py."""
    import os

    import pyspark.sql.functions as F

    from atlas_spark.operators.similarity import ivf_build_index

    path = ivf_build_index(spark, sf_dir, n_cells=16)
    assigned = spark.read.parquet(os.path.join(path, "assignments"))
    cand = assigned.filter(F.col("cell").isin([0, 1, 2, 3]))
    plan = _plan(cand)
    assert "PartitionFilters" in plan
    after = plan.split("PartitionFilters", 1)[1][:200]
    assert "cell" in after and ("IN" in after or "INSET" in after)
    # and no data filter over the full corpus for the cell predicate
    assert "PushedFilters: [In(cell" not in plan


def test_minhash_vocab_join_broadcasts(spark, sf_dir):
    """The md5-portable variant's shingle-vocabulary hash join (md5 once
    per distinct shingle) must broadcast the tiny vocab side at test
    scale — a shuffle join here would erase the point of hashing the
    vocabulary once.  (The registered op uses inline xxhash64 — no vocab
    join — so this pins the md5 unit-oracle path.)"""
    from atlas_spark.operators.dedup import minhash_lsh_candidates_md5

    plan = _plan(minhash_lsh_candidates_md5(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_minhash_md5_permutation_value_oracle(spark):
    """Value-level oracle for the permutation/band arithmetic: the
    md5-portable banding pipeline must produce the IDENTICAL candidate
    set in both engines (hash values cross engines here, unlike the
    registered set-level-oracled query)."""
    import duckdb

    from atlas_spark.operators.dedup import (
        MINHASH_PERM_ORACLE_SQL,
        minhash_lsh_candidates_md5,
    )

    d = "/root/testdata/sf0.001"
    eng = sorted(
        (r.id_a, r.id_b) for r in minhash_lsh_candidates_md5(spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    ora = sorted((a, b) for a, b in con.execute(MINHASH_PERM_ORACLE_SQL).fetchall())
    con.close()
    assert eng == ora


def test_strict_near_dup_prunes_candidates(spark, sf_dir):
    """The strict (8x16) banding must generate candidates ≪ n^2/2 — the
    pruning regime the LSH design argues for (the demo 2x24 banding at
    threshold 0.35 intentionally trades pruning for recall)."""
    from atlas_spark.operators.similarity import (
        STRICT_NEAR_DUP_BANDS,
        STRICT_NEAR_DUP_ROWS,
        load_embeddings,
        near_dup_candidates,
    )

    emb = load_embeddings(spark, sf_dir)
    n = emb.count()
    n_cand = near_dup_candidates(
        emb, rows=STRICT_NEAR_DUP_ROWS, bands=STRICT_NEAR_DUP_BANDS
    ).count()
    all_pairs = n * (n - 1) // 2
    assert n_cand < all_pairs / 4, (n_cand, all_pairs)


def test_strict_near_dup_recall_on_planted_dups(spark):
    """Plant near-duplicate vectors (small perturbations, cosine >= 0.95)
    in a random corpus: the strict banding must catch every planted pair
    (recall 1.0 in the regime it is tuned for) while pruning the random
    pairs."""
    import numpy as np

    from atlas_spark.operators.similarity import (
        STRICT_NEAR_DUP_BANDS,
        STRICT_NEAR_DUP_ROWS,
        near_dup_candidates,
    )

    rng = np.random.RandomState(123)
    base = rng.standard_normal((200, 64))
    vecs = {i: base[i] for i in range(200)}
    planted = []
    for j in range(20):
        src = j * 5
        dup_id = 200 + j
        noise = rng.standard_normal(64) * 0.05
        vecs[dup_id] = base[src] + noise
        a, b = sorted((src, dup_id))
        cos = float(
            np.dot(vecs[a], vecs[b])
            / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b]))
        )
        assert cos >= 0.95, cos
        planted.append((a, b))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    cands = {
        (r.id_a, r.id_b)
        for r in near_dup_candidates(
            emb, rows=STRICT_NEAR_DUP_ROWS, bands=STRICT_NEAR_DUP_BANDS
        ).collect()
    }
    missed = [p for p in planted if p not in cands]
    assert not missed, missed
    n = len(vecs)
    assert len(cands) < n * (n - 1) // 2 / 4, len(cands)


def test_decontaminate_broadcasts_bench_grams(spark, sf_dir, queries):
    """Decontamination joins training shingles against the benchmark's
    distinct n-gram set.  The benchmark side is always tiny relative to
    the training corpus, so it must BROADCAST — a shuffle join here would
    repartition the entire exploded training-shingle stream (the dominant
    volume at 100 TB) just to meet a few MB of benchmark grams.  And the
    rollup is per training doc: no train-x-bench pair fan-out, so no
    cartesian/nested-loop anywhere."""
    plan = _plan(queries["op_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_partitions_by_user(spark, sf_dir, queries):
    """Sessionization sorts events within a user only: every Window/Sort
    must be preceded by hashpartitioning on user_id, and nothing may
    collapse to a single partition (a global ORDER BY would serialize
    100 TB of events through one task)."""
    plan = _plan(queries["op_sessionize"](spark, sf_dir))
    assert "Window" in plan
    assert "hashpartitioning(user_id" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    # the session rollup reuses the user_id partitioning: exactly one
    # exchange in the whole plan (scan -> shuffle by user -> sort ->
    # windows -> partial/final agg without re-shuffle)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_stratified_sample_has_no_exchange(spark, sf_dir, queries):
    """Stratified sampling is a pure projection + content-hash filter:
    the keep/drop decision is a function of the row alone, so the plan
    must contain NO exchange of any kind — it runs map-side wherever the
    data already lives, at any scale."""
    plan = _plan(queries["op_stratified_sample"](spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_pii_and_repetition_have_no_exchange(spark, sf_dir, queries):
    """PII scrubbing and repetition ratio are pure per-row projections
    (regex / array ops that never leave the row): the plans must contain
    NO exchange — they run map-side wherever the data lives."""
    for name in ("op_pii_scrub", "op_repetition_ratio"):
        plan = _plan(queries[name](spark, sf_dir))
        assert "Exchange" not in plan, (name, plan)


def test_unigram_logprob_broadcasts_vocab(spark, sf_dir, queries):
    """The unigram LM score joins the token stream against the corpus
    vocabulary: the vocabulary (≪ corpus) must BROADCAST — shuffling the
    full token stream to meet it would dominate at 100 TB — and the word
    frequency rollup must have a map-side partial aggregate."""
    plan = _plan(queries["op_unigram_logprob"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    # (the corpus-total scalar attaches as a broadcast 1-row nested loop,
    # which is fine; an unbroadcast CartesianProduct is not)
    assert "CartesianProduct" not in plan, plan


def test_dedup_clusters_round_is_equi_join(spark, sf_dir):
    """One min-label propagation round = edges-to-labels equi-join on
    doc_id + per-src min + left equi-join back to labels.  Pin that both
    joins are hash/sort-merge equi-joins (never cartesian/nested-loop)
    and the aggregate has a map-side partial — the per-round cost at
    100 TB is two keyed shuffles, nothing quadratic.  (The registered
    query's returned frame is post-localCheckpoint, so the iteration
    plan must be pinned on a reconstructed round.)"""
    import pyspark.sql.functions as F

    from atlas_spark.operators.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(spark, sf_dir)
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"),
        F.col("id_b").cast("long").alias("dst"),
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    neighbor_min = (
        edges.join(labels, edges.dst == labels.doc_id)
        .groupBy("src")
        .agg(F.min("label").alias("nlabel"))
    )
    new_labels = labels.join(
        neighbor_min, labels.doc_id == neighbor_min.src, "left"
    ).select(
        "doc_id",
        F.least(
            F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
        ).alias("label"),
    )
    plan = _plan(new_labels)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan, plan


def test_minhash_recall_on_planted_dups(spark):
    """Plant textual near-duplicates (word substitutions, Jaccard >= ~0.7)
    in a random-word corpus: the registered 24x2 banding must recover every
    planted pair, since op_minhash_candidates' set-equality oracle rests on
    banding recall 1.0 (P[miss] = (1-j^2)^24 — empirical, corpus-dependent;
    see operators/registry.py).  A corpus or banding change that breaks the
    assumption fails here explicitly."""
    import random

    from atlas_spark.operators.dedup import minhash_lsh_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    docs, planted = [], []
    for i in range(120):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(40))))
    for j in range(15):
        src_id = j * 8
        words = docs[src_id][1].split(" ")
        # substitute 3 of 40 words -> shingle Jaccard ~0.7+
        for _ in range(3):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        docs.append((120 + j, " ".join(words)))
        planted.append((src_id, 120 + j))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df).collect()}
    # exact Jaccard per planted pair decides whether it must appear
    def jac(a, b):
        wa, wb = docs[a][1].split(" "), docs[b][1].split(" ")
        sa = {" ".join(wa[i : i + 3]) for i in range(len(wa) - 2)}
        sb = {" ".join(wb[i : i + 3]) for i in range(len(wb) - 2)}
        return len(sa & sb) / len(sa | sb)

    must = [p for p in planted if jac(*p) >= 0.5]
    assert len(must) >= 10, "corpus construction drifted: too few true pairs"
    missed = [p for p in must if p not in pairs]
    assert not missed, missed


def test_batch_lsh_has_no_signature_exchange(spark, sf_dir, queries):
    """The batch LSH pipelines compute MinHash signatures with a per-row
    fold over the shingle arrays (`_bands_from_shingle_arrays`), not the
    explode + min-aggregate: the aggregate shape paid an Exchange
    shipping one 48-minima row PER DOCUMENT — O(corpus) shuffle rows at
    scale for information the row already held.  Pin that no min
    aggregate survives anywhere in either query's plan (the only min()
    in these pipelines was the signature), while the candidate pipeline
    keeps its two legitimate keyed shuffles (bucket agg, pair distinct)."""
    for name in ("op_minhash_candidates", "op_ngram_jaccard"):
        plan = _plan(queries[name](spark, sf_dir))
        assert "partial_min" not in plan, name
        assert "functions=[min(" not in plan, name


def test_minhash_bands_map_equals_aggregate(spark, sf_dir):
    """The per-row (zero-shuffle, streaming-composable) signature of
    minhash_bands_map must emit the IDENTICAL (doc_id, band, bucket) set
    as the batch hash-aggregate `_minhash_bands` — same permutation
    constants, masking, and packing; and its plan has no exchange before
    the explode."""
    import pyspark.sql.functions as F

    from atlas_spark.operators.dedup import (
        _minhash_bands,
        minhash_bands_map,
        ngram_shingles,
    )
    from atlas_spark.operators.text import load_documents

    docs = load_documents(spark, sf_dir)
    sh = ngram_shingles(docs, 3, hash_fn=F.xxhash64)
    agg = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in _minhash_bands(
            sh.select("doc_id", F.explode("shingles").alias("s")), 48, 24
        ).collect()
    }
    mapped = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in minhash_bands_map(docs, 3, 48, 24).collect()
    }
    assert mapped == agg
    plan = _plan(minhash_bands_map(docs, 3, 48, 24))
    assert "Exchange" not in plan, plan


def test_bm25_topk_plan_shape(spark, sf_dir):
    """BM25 stays distributed: the term filter lands before the tf
    aggregate, the df side broadcasts, the corpus stats are a one-row
    broadcast cross join, and the final top-k is TakeOrdered — never a
    single-partition global sort."""
    from atlas_spark.operators.text import bm25_topk

    plan = _plan(bm25_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    # the ONLY single-partition exchange is the one-row corpus-stats
    # aggregate (N, avgdl) — the standard scalar-aggregate shape; the
    # top-k itself must never be a global sort
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0], plan
    assert "BroadcastHashJoin" in plan, plan


def test_quality_deciles_ntile_formula_uneven_sizes(spark, tmp_path):
    """The closed-form NTILE bucket formula must match true NTILE for
    language sizes that exercise BOTH branches — n < 10, n % 10 != 0
    (first-rem-buckets-get-one-extra), and n % 10 == 0 — sizes the
    driver corpora may not cover if their language counts happen to be
    divisible by 10."""
    import random

    rows = []
    rng = random.Random(3)
    sizes = {"l7": 7, "l13": 13, "l25": 25, "l30": 30, "l101": 101}
    for lang, n in sizes.items():
        for i in range(n):
            ntok = rng.randrange(1, 40)
            rows.append((len(rows), " ".join(["w"] * ntok), lang, "s", 0))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    from atlas_spark.operators.text import ROUND_EPS_TXT, quality_deciles

    got = {
        (r["lang"], r["decile"]): (r["n_docs"], r["min_tokens"], r["max_tokens"], r["avg_tokens"])
        for r in quality_deciles(spark, d).collect()
    }

    # python reference NTILE over the same deterministic order
    want = {}
    for lang, n in sizes.items():
        toks = sorted(
            (len(t.split(" ")), did) for did, t, lg, _, _ in rows if lg == lang
        )
        base, rem = divmod(n, 10)
        idx = 0
        for tile in range(1, 11):
            size = base + (1 if tile <= rem else 0)
            if size == 0:
                continue
            chunk = toks[idx : idx + size]
            idx += size
            vals = [c[0] for c in chunk]
            want[(lang, tile)] = (
                len(vals),
                min(vals),
                max(vals),
                round(sum(vals) / len(vals) + ROUND_EPS_TXT, 6),
            )
    assert got == want


def test_lsh_bucket_cap_skips_degenerate_buckets(spark):
    """Degenerate-bucket guard (r10 verdict #2): plant a boilerplate group
    of 9 IDENTICAL docs (identical signature -> every bucket containing
    one contains all 9) plus one genuine near-dup pair.  With
    max_bucket=5 the boilerplate pairs are dropped and counted via the
    Observation; pairs outside the capped buckets are unchanged; with
    the default cap (1000 >> 9) the boilerplate pairs come back."""
    import random

    from pyspark.sql import Observation

    from atlas_spark.operators.dedup import minhash_lsh_pairs

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(400)]
    docs = [(i, " ".join(rng.choice(vocab) for _ in range(40))) for i in range(30)]
    boiler = " ".join(rng.choice(vocab) for _ in range(40))
    docs += [(100 + i, boiler) for i in range(9)]  # the degenerate bucket
    near = docs[3][1].split(" ")
    near[5] = "zz"  # 1 of 40 words -> Jaccard ~0.85
    docs.append((200, " ".join(near)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    obs = Observation("lsh_skips")
    capped = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, max_bucket=5, skip_observation=obs).collect()
    }
    boiler_ids = {100 + i for i in range(9)}
    assert not [p for p in capped if p[0] in boiler_ids or p[1] in boiler_ids], capped
    assert (3, 200) in capped, capped
    m = obs.get
    assert m["skipped_buckets"] >= 1, m
    assert m["skipped_ids"] >= 9, m

    uncapped = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df).collect()}
    assert {(a, b) for a in sorted(boiler_ids) for b in sorted(boiler_ids) if a < b} <= uncapped
    assert capped <= uncapped
    # everything the cap removed involved the boilerplate group
    assert all(
        p[0] in boiler_ids or p[1] in boiler_ids for p in uncapped - capped
    ), uncapped - capped


def _assert_no_data_bnlj(plan: str) -> None:
    """Allow a BroadcastNestedLoopJoin ONLY when its build side is the
    single-row `_cents` centroid-carrier (the broadcast-data centroid
    assignment, similarity.py): an IdentityBroadcastMode exchange whose
    input is the one-row `_cents` collect_list aggregate.  Any other BNLJ
    is a data x data all-pairs product and a scale-killer."""
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    n_cents = len(
        re.findall(
            r"BroadcastExchange IdentityBroadcastMode[^\n]*\n"
            r"[^\n]*_cents",
            plan,
        )
    )
    assert n_bnlj == n_cents, plan


def _assert_no_data_single_partition(plan: str) -> None:
    """Allow an `Exchange SinglePartition` ONLY as the final step of the
    `_cents` centroid-carrier aggregate (a partial collect_list runs
    map-side, so only centroid-sized partial lists cross the exchange —
    never corpus rows).  Any other single-partition exchange funnels data
    through one task."""
    n_sp = plan.count("Exchange SinglePartition")
    n_cents = len(
        re.findall(
            r"output=\[_cents#\d+\]\)\n[^\n]*Exchange SinglePartition",
            plan,
        )
    )
    assert n_sp == n_cents, plan


def test_semantic_dedup_joins_within_cells(spark, sf_dir, queries):
    """Semantic dedup compares pairs ONLY within a cluster cell: the
    self-join must be a hash equi-join on `cell` — never a cartesian or
    data x data broadcast-nested-loop product — so total pair work stays
    ~n^2/n_cells and the shuffle key is the cell id.  The only permitted
    BNLJ is the one-row `_cents` centroid carrier."""
    plan = _plan(queries["op_semantic_dedup"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    _assert_no_data_bnlj(plan)
    assert "cell" in plan


def test_knn_join_is_bucketed_and_partitioned(spark, sf_dir, queries):
    """The k-NN self-join pairs vectors through the LSH `bucket` equi-join
    (sub-quadratic; no cartesian), and the per-vector top-k window must
    partition by vec_id — a single-partition global window would funnel
    every candidate pair through one task at 100 TB."""
    plan = _plan(queries["op_knn_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    _assert_no_data_bnlj(plan)
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan, plan


def test_ngram_topk_partial_agg_and_take_ordered(spark, sf_dir, queries):
    """Corpus top-k n-grams: the gram rollup must have a map-side partial
    aggregate (the explode fans out ~L grams/doc, combined before the
    shuffle) and the top-k must be TakeOrderedAndProject — only k rows
    cross to the driver, never a global sort."""
    plan = _plan(queries["op_ngram_topk"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_domain_mix_broadcasts_rates(spark, sf_dir, queries):
    """Domain-mix sampling joins the corpus scan against the per-source
    rate table (|sources| rows): the rate side must BROADCAST so the
    corpus is scanned once and never shuffled to meet it; the only keyed
    exchanges are the two aggregate-sized rollups."""
    plan = _plan(queries["op_domain_mix"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_new_tpch_shapes_join_strategy(spark, sf_dir, queries):
    """Q14/Q19 shapes broadcast the part dimension (the fact side never
    shuffles for a dim join); the Q12 shape's lineitem x orders fact-fact
    join must be a keyed equi-join with a single conditional-agg rollup —
    no cartesian anywhere, and the date filter pushes to the scan."""
    for name in ("rel_promo_share", "rel_bracket_revenue"):
        plan = _plan(queries[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)
    plan = _plan(queries["rel_priority_shipments"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "PushedFilters" in plan and "l_shipdate" in plan, plan


def test_pq_topk_is_pure_projection_take_ordered(spark, sf_dir, queries):
    """Product-quantization ANN: codes and the ADC distance are pure
    projections (sub-centroid argmins + literal lookup tables, all in
    codegen) — the plan must contain NO join and NO keyed exchange, and
    the top-k must be TakeOrderedAndProject.  This is the compressed-scan
    shape: per-vector work is m table lookups, nothing wider."""
    plan = _plan(queries["op_pq_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_asof_join_single_user_exchange(spark, sf_dir, queries):
    """The as-of join is one union + one per-user carry-forward window:
    exactly one keyed exchange (hashpartitioning on user_id), no range
    join, no per-row probe, and never a single-partition sort — the same
    scale shape as sessionize."""
    plan = _plan(queries["op_asof_join"](spark, sf_dir))
    assert "hashpartitioning(user_id" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_pq_recall_joins_two_topk(spark, sf_dir, queries):
    """PQ recall joins two k-row TakeOrdered frames: both sides must be
    TakeOrderedAndProject (never a global sort of the corpus) and the
    k-row join must not be a cartesian of anything scan-sized."""
    plan = _plan(queries["op_pq_recall"](spark, sf_dir))
    assert plan.count("TakeOrderedAndProject") == 2, plan
    assert "CartesianProduct" not in plan, plan


def test_text_normalize_has_no_exchange(spark, sf_dir, queries):
    """Text normalization is a pure per-row projection (regex + digest in
    codegen): NO exchange of any kind — it runs map-side wherever the
    data lives."""
    plan = _plan(queries["op_text_normalize"](spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_random_projection_has_no_exchange(spark, sf_dir, queries):
    """JL random projection is a pure per-row projection (out_dim literal
    weight folds in codegen): NO exchange of any kind."""
    plan = _plan(queries["op_random_projection"](spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_cluster_purity_aggregate_sized_window(spark, sf_dir, queries):
    """Cluster purity: the argmax window runs over the (cell, label)
    AGGREGATE (n_cells x labels rows), never the raw corpus, and the
    rollups have map-side partials — no cartesian, no single-partition
    funnel (the only permitted single-partition exchange is the
    centroid-sized `_cents` carrier aggregate)."""
    plan = _plan(queries["op_cluster_purity"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    _assert_no_data_single_partition(plan)
    assert plan.count("HashAggregate") >= 2, plan


def test_seq_pack_partitions_by_source(spark, sf_dir, queries):
    """Sequence packing: the running-total window partitions BY SOURCE —
    one keyed exchange, no single-partition global ordering (a
    corpus-wide running sum would funnel 100 TB through one task)."""
    plan = _plan(queries["op_seq_pack"](spark, sf_dir))
    assert "hashpartitioning(source" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_round6_tpch_shapes_join_strategy(spark, sf_dir, queries):
    """Round-6 TPC-H shapes: dims broadcast everywhere (the fact side
    shuffles only on join keys), Q10's returnflag/date predicates reach
    the fact scan, Q17's correlated average is a window over the
    partkey exchange (one fact shuffle, no aggregate self-join), and
    Q18's HAVING pre-aggregates before any join.  No cartesian products
    anywhere."""
    for name in (
        "rel_volume_shipping",
        "rel_market_share",
        "rel_returned_items",
        "rel_small_qty_revenue",
        "rel_large_orders",
        "rel_idle_customers",
    ):
        plan = _plan(queries[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)
        if name != "rel_idle_customers":
            # idle_customers legitimately BNLJs its ONE-ROW scalar
            # average-balance side (Q22's scalar subquery broadcast)
            assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
    plan = _plan(queries["rel_volume_shipping"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    plan = _plan(queries["rel_returned_items"](spark, sf_dir))
    assert "PushedFilters" in plan and "l_returnflag" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    plan = _plan(queries["rel_small_qty_revenue"](spark, sf_dir))
    assert "Window" in plan, plan


def test_corpus_profiling_ops_plan_shape(spark, sf_dir, queries):
    """tfidf: the raw token stream shuffles once (source,term agg); the
    df side joins BROADCAST; no cartesian.  length_histogram: scan ->
    hash agg -> window, no joins at all.  cross-split contamination
    inherits the banded near-dup path (no cartesian, no BNLJ)."""
    plan = _plan(queries["op_tfidf_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    plan = _plan(queries["op_length_histogram"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert "Window" in plan, plan
    plan = _plan(queries["op_cross_split_contamination"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_final_tpch_shapes_join_strategy(spark, sf_dir, queries):
    """The last four TPC-H shapes (Q15/Q9/Q16/Q21 adapted): Q15's max
    scalar is a one-row broadcast (never a global sort); Q9's part-name
    filter prunes the broadcast dim pre-join; Q16 reduces the fact to
    distinct (partkey, suppkey) pairs BEFORE the dim join; Q21 is one
    orderkey fact join + aggregate-sized follow-ups (no lineitem
    self-join).  No cartesians anywhere."""
    for name in (
        "rel_top_supplier",
        "rel_product_profit",
        "rel_supplier_part_counts",
        "rel_waiting_suppliers",
    ):
        plan = _plan(queries[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)
        if name != "rel_top_supplier":
            # top_supplier legitimately BNLJs its ONE-ROW max-revenue
            # side (Q15's scalar subquery broadcast)
            assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
        assert "BroadcastHashJoin" in plan, (name, plan)
    plan = _plan(queries["rel_product_profit"](spark, sf_dir))
    # the p_name filter must land on the part scan, not post-join
    assert "PushedFilters" in plan and "p_name" in plan, plan
    plan = _plan(queries["rel_waiting_suppliers"](spark, sf_dir))
    # the order-status predicate prunes the orders scan
    assert "o_orderstatus" in plan, plan


def test_adapted_partsupp_shapes_join_strategy(spark, sf_dir, queries):
    """Q2/Q11/Q20 adapted (no partsupp table in the testdata): every
    scalar threshold (Q11 nation total, Q20 average volume) is a
    one-row broadcast, Q2's per-part min-cost pick is a struct-min over
    the pair aggregate (no per-part re-probe, no global sort), and all
    dims broadcast.  The only non-broadcast exchanges are the fact
    aggregations."""
    for name in ("rel_min_cost_supplier", "rel_important_stock", "rel_excess_volume"):
        plan = _plan(queries[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastHashJoin" in plan, (name, plan)
        # no unpartitioned window / global sort anywhere in these
        assert "Exchange SinglePartition" not in plan or "BroadcastNested" in plan, (
            name,
            plan,
        )


def test_hash_split_is_zero_shuffle_pruned_projection(spark, sf_dir):
    """The split assignment must be a pure map pass: no exchange, and
    the scan reads only the two projected columns (at 100 TB this is
    the difference between a metadata-cheap stamp and a corpus sort)."""
    from atlas_spark.operators.text import hash_split

    plan = _plan(hash_split(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan, plan


def test_quality_deciles_distributed_rank(spark, sf_dir):
    """Scale-safe exact-NTILE shape (r10 verdict #1): the per-language
    single-task NTILE window is GONE.  The total order comes from a
    range-partitioned sort (skewed languages span many slices), the
    only full-data window is keyed by (slice pid, lang) — bounded by
    one range slice — the offsets frame broadcasts, and the final
    group-by partial-aggregates.  No single-partition exchange."""
    from atlas_spark.operators.text import quality_deciles

    plan = _plan(quality_deciles(spark, sf_dir, _materialize=False))
    assert "ntile" not in plan.lower(), plan
    assert "rangepartitioning(lang" in plan, plan
    # the per-row window is sliced by pid (lang-only windows exist only
    # over the constant-size counts frame, which is fine)
    assert "windowspecdefinition(pid" in plan, plan
    assert "row_number" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_no_orphaned_cache_blocks_after_registry_queries(spark, sf_dir):
    """Persist hygiene (r11 verdict #5): cache-using registry queries must
    not leak storage blocks across a long-lived session.  Load-bearing
    persists (quality_deciles' pid slice) release inside the operator;
    shared-computation caches (the shingle frames) are scoped — drained
    when the next registry query is built and completely by
    `release_scoped()` — so a driver sweep never accumulates blocks."""
    from atlas_spark.registry import all_queries
    from atlas_spark.util.caching import SHARED_MAX, _SHARED, release_scoped, release_shared

    jsc = spark.sparkContext._jsc.sc()
    before = {i.id() for i in jsc.getRDDStorageInfo()}

    qs = all_queries()
    for name in ("op_quality_deciles", "op_minhash_candidates", "op_ngram_jaccard"):
        qs[name](spark, sf_dir).collect()
    # the keyed tier intentionally survives between queries (the shingle
    # frame is shared by the minhash/jaccard pair) but stays bounded...
    assert len(_SHARED) <= SHARED_MAX
    # ...and the harness drain empties BOTH tiers completely
    release_scoped()
    release_shared()

    leaked = [
        (i.id(), i.name())
        for i in jsc.getRDDStorageInfo()
        if i.id() not in before and i.numCachedPartitions() > 0
    ]
    assert not leaked, leaked


def test_keep_best_is_single_struct_max_agg(spark, sf_dir, queries):
    """Survivor selection must collapse each cluster in ONE
    partial-aggregated groupBy riding a struct-max: no Window (a window
    would re-sort every cluster's members) and no cartesian — the only
    added cost over the cluster labels is one keyed exchange."""
    plan = _plan(queries["op_dedup_keep_best"](spark, sf_dir))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan or "SortAggregate" in plan, plan


def test_lsh_precision_no_cartesian_pairgen(spark, sf_dir, queries):
    """The precision report's candidate generation must stay the banded
    bucket shape (no cartesian/nested-loop pair products); the one
    sanctioned nested-loop is the final crossJoin of two ONE-ROW
    aggregates."""
    plan = _plan(queries["op_lsh_precision"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # 1-row x 1-row combine may compile to BroadcastNestedLoopJoin: allowed.


def test_emb_outliers_broadcasts_centroids(spark, sf_dir, queries):
    """Centroid-distance outliers: the per-label centroid frame (a
    handful of rows) must BROADCAST back to the corpus — shuffling the
    corpus to meet it would dominate at scale — and the top-k must
    reduce via TakeOrderedAndProject, never a global sort."""
    plan = _plan(queries["op_emb_outliers"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_source_overlap_no_cartesian(spark, sf_dir, queries):
    """The cross-source matrix rides the capped banding pass: both
    source joins are equi-joins on doc_id and the matrix fold has a
    map-side partial aggregate — nothing quadratic beyond the (already
    capped) candidate generation."""
    plan = _plan(queries["op_source_overlap"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_curation_funnel_single_conditional_aggregate(spark, sf_dir, queries):
    """The funnel's four stages fold in ONE conditional aggregate over
    the flagged train scan (adding a stage costs a column, not a pass):
    no cartesian products, the benchmark gram set broadcasts, and the
    stage rows come from a constant-size explode of the one-row
    aggregate."""
    plan = _plan(queries["op_curation_funnel"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_binary_join_salting_differential(spark):
    """Opt-in cell-space-skew salting for the generic grouped binary join
    (scripts/vol_skew_grouped.py finding B): with
    spark.atlas.binary.saltPartitions=K the superset side spreads a hot
    common key's cells over K sub-partitions keyed by its extra key
    columns and the subset side replicates K ways — values must be
    EXACTLY the unsalted result on a planted hot cell (one name owning
    97% of the aggregate cells), and the join keys must carry the salt."""
    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.plans.context import EvalContext
    from atlas_spark.sources.datapoints import DatapointSource
    from atlas_spark.stacklang.vocab import parse

    step = 3600
    start = 1704067200
    n_steps = 3
    rows = [
        ("hot", f"b{b}", start + s * step, float(b + s))
        for b in range(400)
        for s in range(n_steps)
    ] + [
        (f"n{i}", f"b{b}", start + s * step, float(i * b + s))
        for i in range(3)
        for b in range(4)
        for s in range(n_steps)
    ]
    df = spark.createDataFrame(
        rows, "k_name string, k_bucket string, t long, value double"
    )
    src = DatapointSource(
        df=df, step=step, colmap={"name": "k_name", "bucket": "k_bucket"}, sql_cte=""
    )
    # sum-vs-count sides force the GENERIC join (the same-aggregate
    # share-of-total shape takes the single-scan rollup rewrite instead)
    (se,) = parse(
        ":true,:sum,(,name,bucket,),:by,:true,:count,(,name,),:by,:div", step=step
    )
    ctx = EvalContext(start, start + n_steps * step, step)

    def run():
        rf = Evaluator(src, ctx).eval(se)
        out = rf.df
        return out, sorted(
            tuple(r) for r in out.collect() if r["value"] == r["value"]
        )

    try:
        spark.conf.unset("spark.atlas.binary.saltPartitions")
    except Exception:
        pass
    plain_df, plain = run()
    assert "_salt" not in _plan(plain_df)
    try:
        spark.conf.set("spark.atlas.binary.saltPartitions", "8")
        salted_df, salted = run()
        plan = _plan(salted_df)
        assert "_salt" in plan, plan
        # subset side replicated via explode, superset side hashed
        assert "explode" in plan.lower(), plan
        assert "xxhash64" in plan.lower(), plan
    finally:
        spark.conf.unset("spark.atlas.binary.saltPartitions")
    assert salted == plain and len(plain) == (400 + 12) * n_steps


def test_chunk_dedup_hot_chunk_safe_plan(spark, sf_dir, queries):
    """Chunk-level boilerplate removal never builds a per-chunk
    occurrence group on one reducer: the keeper is a partial-aggregated
    min-struct (map-side combine absorbs a hot boilerplate chunk), the
    survivor texts are rebuilt from the DISTINCT-chunk frame, and there
    is no window over chunk groups and no join back to the raw
    occurrence stream (the only join is the doc_id equi-join to the
    corpus scan)."""
    df = queries["op_chunk_dedup"](spark, sf_dir)
    plan = _plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # exactly one join: survivors back onto the docs scan by doc_id
    import re as _re

    joins = _re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)
    assert len(joins) == 1, plan


def test_span_dedup_semantics_planted(spark, tmp_path):
    """Sliding-span dedup on a planted corpus: a doc repeating an earlier
    doc's token run loses the whole overlapping span (marks union), the
    first occurrence survives untouched, sub-k docs are untouched, and a
    fully-covered doc gets NULL clean_text."""
    import pandas as pd

    from atlas_spark.operators.dedup import span_dedup

    a = " ".join(f"a{i}" for i in range(12))          # source of the span
    b = "x y z " + " ".join(f"a{i}" for i in range(10))  # repeats a 10-gram
    rows = [
        (0, a, "en", "s", len(a)),
        (1, b, "en", "s", len(b)),
        (2, "tiny doc", "en", "s", 8),                 # < k words
        (3, a[: len(a)], "en", "s", len(a)),           # exact dup of a
    ]
    d = tmp_path / "span"
    d.mkdir()
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(d / "documents.parquet"))
    out = {r["doc_id"]: r for r in span_dedup(spark, str(d), k=10).collect()}
    # doc 0: first occurrence of every gram -> untouched
    assert out[0]["n_removed"] == 0 and out[0]["clean_text"] == a
    # doc 1: its single 10-gram a0..a9 (pos 3) duplicates doc 0's pos-0
    # gram -> tokens 3..12 drop, the x y z prefix survives
    assert out[1]["n_removed"] == 10
    assert out[1]["clean_text"] == "x y z"
    # doc 2: shorter than k -> no grams, untouched
    assert out[2]["n_removed"] == 0 and out[2]["clean_text"] == "tiny doc"
    # doc 3: every gram duplicated, spans cover everything -> NULL
    assert out[3]["n_removed"] == 12 and out[3]["clean_text"] is None


def test_span_dedup_hot_gram_safe_plan(spark, sf_dir, queries):
    """The gram keeper is a partial-aggregated min-struct on the 64-bit
    gram hash (map-side combine absorbs hot boilerplate grams); no
    window over gram groups, no cartesian; marking duplicated
    occurrences is a fixed-width equi-join."""
    df = queries["op_span_dedup"](spark, sf_dir)
    plan = _plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_min" in plan or "partial" in plan.lower(), plan


def test_sketch_sources_fuse_ingest_rollup(spark, sf_dir, queries):
    """The pct / sketch sources roll raw events up per (name, bucket, t)
    series, but `:percentiles` (sum over value=1.0 rows == count) and
    `:approx-distinct` (max rho, idempotent) immediately merge the
    series across `name` — so the evaluator folds RAW rows straight to
    the consumer's coarser keys (`DatapointSource.raw_fold`), and the
    finest-granularity ingest exchange disappears from the plan.  Pin
    that no exchange in either plan is keyed by the source name column
    (the fused first exchange carries (bucket|register, t) partials)."""
    import re

    for name in ("pct_percentiles", "ad_distinct", "pct_median"):
        plan = _plan(queries[name](spark, sf_dir))
        for args in re.findall(r"hashpartitioning\(([^)]*)\)", plan):
            assert "k_name" not in args and "event_type" not in args, (
                name,
                args,
            )


def test_sketch_raw_fusion_differential(spark, sf_dir):
    """Raw-path fusion vs the generic per-series rollup path must be
    value-identical (count == sum of 1.0 rows exactly; max-of-max
    idempotent).  Drive the Evaluator directly, once with the source as
    registered (raw path) and once with raw_ranged stripped (generic
    path), and compare rounded rows — rounding to the registry's 6
    decimals absorbs hash-aggregate summation-order ulps in the
    estimator stages, same as the driver's oracle comparison."""
    from dataclasses import replace

    from atlas_spark.plans.builder import Evaluator
    from atlas_spark.registry import ASL_SPECS, SOURCES

    for name in (
        "pct_percentiles",
        "ad_distinct",
        "pct_sample_count",
        "data_gauge_day_max",
        "data_cf_avg_gauge",
        "f_consolidate_avg_gauge",
    ):
        spec = next(s for s in ASL_SPECS if s.name == name)
        src = SOURCES[spec.source].factory(spark, sf_dir)
        assert src.raw_ranged is not None, name
        ctx = spec._ctx()
        e = spec.expr()
        fused = Evaluator(src, ctx).eval(e).df
        generic = Evaluator(replace(src, raw_ranged=None), ctx).eval(e).df

        def norm(df):
            rows = df.collect()
            return sorted(
                tuple(
                    round(v, 6) if isinstance(v, float) else v for v in r
                )
                for r in rows
            )

        assert norm(fused) == norm(generic), name


def test_batch_lsh_single_fold_pass(spark, sf_dir, queries):
    """The MinHash signature is ONE aggregate fold over the shingle
    array with a num_hashes-wide running-min accumulator — not one
    transform + array_min traversal per permutation, and CollapseProject
    must not inline the fold into the 24 bucket expressions (that would
    re-run it 24x per row).  Pin exactly one fold per plan."""
    # Pin on a FRESH frame over an inline corpus: the registry frames
    # are session-memoized QueryExecutions whose plan rendering depends
    # on execution / cache-substitution state left by earlier tests
    # (final-plan sections, InMemoryRelation abbreviation), so an exact
    # occurrence count over them is order-dependent.  The property
    # belongs to the shared core both pipelines call.
    import pyspark.sql.functions as F

    from atlas_spark.operators.dedup import (
        _bands_from_shingle_arrays,
        ngram_shingles,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "b c d e f g")], "doc_id long, text string"
    )
    sh = ngram_shingles(docs, 3, hash_fn=F.xxhash64)
    plan = _optimized(_bands_from_shingle_arrays(sh))
    # `least(lambda` is the running-min merge unique to the fold: one
    # occurrence = the fold evaluates once; inlined into the 24 bucket
    # expressions it would appear 24x.  (Counting `aggregate(shingles`
    # was lineage-dependent: without a cache boundary the shingle
    # expression inlines into the fold and the attribute name vanishes.)
    assert plan.count("least(lambda") == 1, plan.count("least(lambda")
    assert "array_min(transform" not in plan
    # and both registry pipelines still run through the fold (single
    # evaluation pinned above on the shared core)
    for name in ("op_minhash_candidates", "op_ngram_jaccard"):
        qplan = _optimized(queries[name](spark, sf_dir))
        assert "array_min(transform" not in qplan, name


def test_sample_count_range_filter_stays_at_cell_level(spark, sf_dir, queries):
    """The sample-count bucket-range filter must act on aggregated
    cells, not be pushed through the rollup: pushed, it inlines the
    label format + parse (java.util.Formatter) per RAW event, twice —
    measured 4-5x the whole query.  Pin that no scan-level filter
    contains format_string."""
    for name in ("pct_sample_count", "pct_sample_count_inf"):
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # every Condition below the first exchange (i.e. in the scan
        # stage) must be free of the label round trip
        scan_stage = plan.split("hashpartitioning", 1)[0]
        for cond in re.findall(r"Condition : (.*)", scan_stage):
            assert "format_string" not in cond, (name, cond[:200])


def test_simhash_single_fold_pass(spark, sf_dir, queries):
    """The simhash bit votes accumulate in ONE pass over the per-doc
    hash list (bits-wide accumulator), not one inner aggregate per bit
    (60 traversals/doc), and the count column must not be inlined into
    the assembling lambdas (re-running the fold per bit).  Pin one fold
    per plan and no per-bit inner aggregate."""
    plan = _optimized(queries["op_simhash"](spark, sf_dir))
    assert plan.count("zip_with") == 1, plan.count("zip_with")
    assert not re.search(r"aggregate\(hs#\d+, 0", plan), "per-bit inner aggregate"


def test_word_arrays_staged_once(spark, sf_dir, queries):
    """Gram builders must stage the split word array in its own
    projection: an expression inlined into a lambda body re-evaluates
    once per ELEMENT, so `split(text)` inside a per-gram slice ran once
    per gram — O(words^2) per document (r17: op_repetition_ratio 2.27
    -> 0.46 s, op_ngram_topk 2.58 -> 0.43 s at sf0.1).  Pin one split
    per single-branch plan."""
    for name in ("op_repetition_ratio", "op_ngram_topk"):
        plan = _optimized(queries[name](spark, sf_dir))
        assert plan.count("split(") == 1, (name, plan.count("split("))
