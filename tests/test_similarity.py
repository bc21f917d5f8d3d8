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
