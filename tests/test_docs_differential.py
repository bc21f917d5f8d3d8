"""Randomized differential testing for the document-pipeline ops that
shipped with configurable parameters this round: random small corpora
(seeded, reproducible) written as real parquet documents tables, engine
result compared row-for-row against the DuckDB oracle SQL.

The adversarial complement to the fixed sf0.01/sf0.1 parity checks:
random word soups exercise the edges those corpora can't — single-word
documents, documents shorter than the chunk/gram size, every-chunk-
duplicated documents, unicode words, duplicate texts across sources."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

VOCAB = (
    ["w%d" % i for i in range(12)]
    + ["héllo", "año", "ツ", "naïve"]  # multi-byte characters
)


def _corpus(rng: random.Random, n_docs: int) -> pd.DataFrame:
    rows = []
    for i in range(n_docs):
        kind = rng.random()
        if kind < 0.1:
            words = [rng.choice(VOCAB)]  # single word < any gram size
        elif kind < 0.2 and rows:
            words = rows[rng.randrange(len(rows))][1].split(" ")  # exact dup
        else:
            words = [rng.choice(VOCAB) for _ in range(rng.randint(2, 30))]
        text = " ".join(words)
        rows.append(
            (
                i,
                text,
                rng.choice(["en", "fr"]),
                rng.choice(["src0", "src1", "src2"]),
                len(text),
            )
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def _run(spark, tmp_path, seed: int, op, sql: str):
    rng = random.Random(seed)
    d = tmp_path / f"c{seed}"
    d.mkdir()
    _corpus(rng, rng.randint(20, 60)).to_parquet(str(d / "documents.parquet"))
    got = sorted((tuple(r) for r in op(spark, str(d)).collect()), key=repr)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    want = sorted(con.execute(sql).fetchall(), key=repr)
    assert got == want, f"seed {seed}: {got[:3]} != {want[:3]}"


@pytest.mark.parametrize("seed", range(5))
def test_chunk_dedup_random_corpora(spark, tmp_path, seed):
    from atlas_spark.operators.dedup import CHUNK_DEDUP_SQL, chunk_dedup

    _run(spark, tmp_path, seed, chunk_dedup, CHUNK_DEDUP_SQL)


@pytest.mark.parametrize("seed", range(3))
def test_curation_funnel_random_corpora(spark, tmp_path, seed):
    from atlas_spark.operators.dedup import curation_funnel_sql
    from atlas_spark.operators.text import curation_funnel

    _run(spark, tmp_path, 100 + seed, curation_funnel, curation_funnel_sql())


@pytest.mark.parametrize("seed", range(3))
def test_ngram_jaccard_random_corpora(spark, tmp_path, seed):
    from atlas_spark.operators.dedup import NGRAM_JACCARD_SQL, ngram_jaccard_pairs

    _run(spark, tmp_path, 200 + seed, ngram_jaccard_pairs, NGRAM_JACCARD_SQL)


@pytest.mark.parametrize("seed", range(3))
def test_source_overlap_random_corpora(spark, tmp_path, seed):
    from atlas_spark.operators.dedup import SOURCE_OVERLAP_SQL, source_overlap

    _run(spark, tmp_path, 300 + seed, source_overlap, SOURCE_OVERLAP_SQL)


@pytest.mark.parametrize("seed", range(3))
def test_dedup_exact_random_corpora(spark, tmp_path, seed):
    from atlas_spark.operators.dedup import DEDUP_EXACT_SQL, dedup_exact

    _run(spark, tmp_path, 400 + seed, dedup_exact, DEDUP_EXACT_SQL)


@pytest.mark.parametrize("seed", range(3))
def test_span_dedup_random_corpora(spark, tmp_path, seed):
    # small vocab + 2-30-word docs make sliding 3-gram collisions dense,
    # exercising overlap-union and full-coverage (NULL clean_text) paths
    from functools import partial

    from atlas_spark.operators.dedup import span_dedup, span_dedup_sql

    _run(
        spark, tmp_path, 500 + seed,
        partial(span_dedup, k=3), span_dedup_sql(3),
    )
