"""Deduplication operators.

Scale design: exact dedup is a hash-groupBy (one shuffle on the content
hash, map-side partial agg).  Near-dup (MinHash / SimHash / n-gram
Jaccard) reduces the candidate space via banding so the join is on short
bucket keys, never an all-pairs cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import configure_existing
from ..util.caching import scoped_persist
from ..util.io import memo_factory as _memo_factory
from .text import load_documents

# Local-bench parallelism guard: the test corpus is a single small parquet
# file, so Spark scans it in ONE task and AQE size-coalesces the tiny (in
# bytes) but compute-heavy hash stages to one partition.  An explicit
# numbered repartition spreads signature computation; at cluster scale the
# many-file scan already provides this and the extra exchange of raw doc
# rows is noise.
_SPREAD = 32


def _spread(df: DataFrame) -> DataFrame:
    return df.repartition(_SPREAD, "doc_id")


@_memo_factory
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


def chunk_dedup(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Chunk-level exact dedup (boilerplate removal): split every document
    into consecutive `k`-word chunks; corpus-wide, each distinct chunk
    survives only at its FIRST occurrence (min (doc_id, chunk_idx)), and
    every later occurrence is removed from its document.  Emits one row
    per document: (doc_id, n_chunks, n_removed, clean_text) with
    clean_text the surviving chunks re-joined in order (NULL when every
    chunk was removed) — the pretraining-pipeline pass that strips
    repeated headers/footers/navigation without dropping whole documents.

    At 100 TB the classic failure mode is the HOT chunk (one boilerplate
    string occurring millions of times).  This plan never groups raw
    occurrences into one reducer for it: the keeper is a
    partial-aggregated `min(struct(doc_id, chunk_idx))` per chunk
    (map-side combine collapses a hot chunk to one row per mapper), and
    the survivor list is rebuilt from the DISTINCT-chunk keeper frame —
    one row per distinct chunk — regrouped by doc_id, never by joining
    keepers back to the raw occurrence stream.  Shuffles: one keyed on
    chunk text (combiner-bounded), one on doc_id (bounded by survivors),
    one doc_id equi-join back to the corpus scan."""
    docs = load_documents(spark, sf_dir)
    # word array staged in its own projection — inlined into the slice
    # lambda, the split re-ran once per chunk (see ngram_shingles, r17)
    d1 = docs.select("doc_id", F.split(F.col("text"), " ").alias("_w"))
    n_chunks = F.ceil(F.size("_w") / F.lit(k)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.concat_ws(" ", F.slice(F.col("_w"), (i - 1) * k + 1, k)).alias("chunk"),
        ),
    )
    occ = d1.select(
        "doc_id", F.explode(chunks).alias("c")
    ).select("doc_id", "c.chunk_idx", "c.chunk")
    keep = occ.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("first")
    )
    survivors = (
        keep.select(
            F.col("first.doc_id").alias("doc_id"),
            F.struct(
                F.col("first.chunk_idx").alias("chunk_idx"), "chunk"
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.concat_ws(
                " ", F.transform(F.array_sort(F.collect_list("s")), lambda s: s.chunk)
            ).alias("clean_text"),
        )
    )
    return (
        d1.select("doc_id", n_chunks.cast("long").alias("n_chunks"))
        .join(survivors, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.when(F.col("n_kept").isNotNull(), F.col("clean_text")).alias(
                "clean_text"
            ),
        )
    )


CHUNK_DEDUP_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
occ AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         array_to_string(words[(i-1)*10+1 : i*10], ' ') AS chunk
  FROM (
    SELECT doc_id, words,
           unnest(range(1, CAST(ceil(len(words) / 10.0) AS BIGINT) + 1)) AS i
    FROM w
  )
),
ranked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM occ
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed,
         string_agg(chunk, ' ' ORDER BY chunk_idx)
             FILTER (WHERE rn = 1) AS clean_text
  FROM ranked GROUP BY doc_id
)
SELECT doc_id, n_chunks, n_removed, clean_text FROM per_doc
"""


def span_dedup(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Exact-substring (sliding-span) dedup: every SLIDING `k`-word gram
    is tracked corpus-wide; a gram survives only at its first occurrence
    (min (doc_id, pos)), and every later occurrence marks its k-token
    span for removal.  Overlapping marked spans union, and each document
    re-emits with the covered tokens dropped: (doc_id, n_tokens,
    n_removed, clean_text), clean_text NULL when everything was covered.
    The sliding-window exact-substring pass of a pretraining pipeline
    (cf. "Deduplicating Training Data Makes Language Models Better" —
    public method); `chunk_dedup` above is its cheap non-overlapping
    approximation.

    Scale shape: the keeper per gram is a partial-aggregated
    min(struct) on the 64-bit gram hash (map-side combine absorbs hot
    boilerplate grams — one row per mapper, like chunk_dedup).  Marking
    non-keeper occurrences necessarily touches each duplicated
    occurrence once: a fixed-width (hash) equi-join of the occurrence
    stream against the distinct-gram keeper frame, AQE skew-split on
    hot grams.  The per-document rebuild folds the doc's OWN mark list
    with higher-order array expressions — cost O(tokens x marks) per
    doc, both bounded by document length, never a corpus-wide axis.
    xxhash64 gram ids shuffle 8-byte keys; the oracle compares raw-gram
    semantics at the text level, so hash values never cross engines
    (same contract as ngram_jaccard)."""
    docs = load_documents(spark, sf_dir)
    # STAGE the word array: inlined into the slice lambda, the split
    # re-ran once per gram — O(words^2) per document (same fix as
    # ngram_shingles, r17); `_w` is multiply referenced so
    # CollapseProject keeps the projection.
    d1 = docs.select("doc_id", "text", F.split(F.col("text"), " ").alias("_w"))
    grams = F.when(
        F.size("_w") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("_w") - k),
            lambda p: F.struct(
                p.cast("int").alias("pos"),
                F.xxhash64(
                    F.concat_ws(" ", F.slice(F.col("_w"), p + 1, k))
                ).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,g:long>>"))
    occ = d1.select("doc_id", F.explode(grams).alias("o")).select(
        "doc_id", "o.pos", "o.g"
    )
    keep = occ.groupBy("g").agg(F.min(F.struct("doc_id", "pos")).alias("first"))
    marks = (
        occ.join(keep, "g")
        .where(
            (F.col("doc_id") != F.col("first.doc_id"))
            | (F.col("pos") != F.col("first.pos"))
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("pos")).alias("ps"))
    )
    toks = F.transform(
        F.col("_w"), lambda w, i: F.struct(i.cast("int").alias("i"), w.alias("w"))
    )
    covered = lambda i: F.exists(  # noqa: E731
        F.col("ps"), lambda p: (p <= i) & (i < p + k)
    )
    # the kept-token rebuild is O(tokens x marks) per doc; STAGE it too —
    # it was referenced three times below and re-evaluated per reference
    kept = F.filter(toks, lambda t: ~covered(t.i))
    staged = d1.join(marks, "doc_id", "left").select(
        "doc_id",
        "text",
        "ps",
        F.size("_w").cast("long").alias("n_tokens"),
        kept.alias("_kept"),
    )
    out = staged.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("ps").isNull(), F.lit(0).cast("long"))
        .otherwise((F.col("n_tokens") - F.size("_kept")).cast("long"))
        .alias("n_removed"),
        F.when(
            F.col("ps").isNull(), F.col("text")
        )
        .when(
            F.size("_kept") > 0,
            F.concat_ws(" ", F.transform(F.col("_kept"), lambda t: t.w)),
        )
        .alias("clean_text"),
    )
    return out


def span_dedup_sql(k: int = 10) -> str:
    """DuckDB oracle: identical sliding-gram first-occurrence semantics
    over raw gram strings (the engine's xxhash64 ids never cross)."""
    return f"""
WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
),
occ AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         array_to_string(words[i : i + {k} - 1], ' ') AS gram
  FROM (
    SELECT doc_id, words, unnest(range(1, len(words) - {k} + 2)) AS i
    FROM w WHERE len(words) >= {k}
  )
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM occ
),
marks AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
tok AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS idx, words[i] AS tok
  FROM (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM w)
),
cover AS (
  SELECT t.doc_id, t.idx, t.tok,
         EXISTS(SELECT 1 FROM marks m
                WHERE m.doc_id = t.doc_id
                  AND m.pos <= t.idx AND t.idx < m.pos + {k}) AS cov
  FROM tok t
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(*) FILTER (WHERE cov) AS BIGINT) AS n_removed,
         string_agg(tok, ' ' ORDER BY idx) FILTER (WHERE NOT cov) AS clean_text
  FROM cover GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_removed, clean_text FROM per_doc
"""


SPAN_DEDUP_SQL = span_dedup_sql()


def _h60(col) -> "F.Column":
    """60-bit hash = top 15 hex digits of md5 — the engine-portable hash
    (DuckDB computes the identical value, so sketches built from it have
    full value-level oracles; see SIMHASH_SQL / MINHASH_CANDIDATES_SQL)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ngram_shingles(
    df: DataFrame, n: int = 3, hash_fn=None, extra_cols: tuple = ()
) -> DataFrame:
    """Word n-gram shingle set per doc, hashed to fixed-width ids (input
    for Jaccard / MinHash).  Hashing keeps shuffle keys and
    set-intersection elements fixed-width.

    `hash_fn` defaults to the engine-portable 60-bit md5 (`_h60`) so
    sketches built from the ids have value-level DuckDB oracles.  Callers
    whose oracle does not depend on the hash VALUES (e.g. exact Jaccard
    verification, which only needs set identity) should pass
    `F.xxhash64` — ~3x cheaper per shingle.  `extra_cols` carries
    additional columns through (e.g. the event time of a streaming
    corpus)."""
    h = hash_fn or _h60
    # STAGE the word array in its own projection: an expression inlined
    # into a lambda body re-evaluates once per ELEMENT, so `split(text)`
    # inside the per-gram slice ran once per gram — O(words^2) per
    # document (r17; the staged attribute reference is a per-element
    # pointer read).  `_w` is referenced three times (two sizes + the
    # slice), so CollapseProject keeps the projection.
    staged = df.select("doc_id", F.split(F.col("text"), " ").alias("_w"), *extra_cols)
    # guard: Spark sequence(0, k) with k<0 generates DESCENDING indexes —
    # docs shorter than n words must produce an empty shingle set
    idx = F.when(
        F.size("_w") >= n, F.sequence(F.lit(0), F.size("_w") - n)
    ).otherwise(F.array().cast("array<int>"))
    # distinct the shingle STRINGS before hashing: repeated shingles within
    # a doc are common and the hash is the expensive part
    strs = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws("\x1f", F.slice(F.col("_w"), i + 1, n)))
    )
    return staged.select(
        "doc_id", F.transform(strs, lambda s: h(s)).alias("shingles"), *extra_cols
    )


# Universal-hash permutations for MinHash: h_i(s) = (a_i * s28 + b_i) mod P
# over the LOW 28 BITS of the shingle id — the product stays below 2^59 so
# the arithmetic is exact 64-bit in BOTH engines (Spark longs and DuckDB
# BIGINT, which errors on overflow), giving cross-engine value parity at
# native arithmetic speed (an md5 per permutation was ~8x slower).
# P is the Mersenne prime 2^31-1: it must be SMALLER than the a*s products
# so the modulo actually wraps and permutes the order — with a larger P
# the hash is order-preserving in s and every permutation picks the same
# minimum shingle, collapsing the signature.
_PERM_P = (1 << 31) - 1
_MASK28 = (1 << 28) - 1


def _perm_consts(num_hashes: int, seed: int = 11) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31))
        for _ in range(num_hashes)
    ]


def _md5_feats(df: DataFrame, n: int = 3) -> DataFrame:
    """Exploded (doc_id, s) md5 shingle ids, computing the md5 once per
    DISTINCT shingle string corpus-wide.

    The md5+conv is the expensive part of the sketch and real corpora
    reuse shingles heavily (~10x on the test corpus), so hash the global
    vocabulary and join it back: the vocab side is tiny relative to
    occurrences and broadcasts; at cluster scale it degrades gracefully
    to a string-keyed shuffle join that still beats per-occurrence md5.
    """
    # word array staged in its own projection — inlined into the slice
    # lambda, the split re-ran once per gram (see ngram_shingles, r17)
    idx = F.when(
        F.size("_w") >= n, F.sequence(F.lit(0), F.size("_w") - n)
    ).otherwise(F.array().cast("array<int>"))
    strs = df.select(
        "doc_id", F.split(F.col("text"), " ").alias("_w")
    ).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    idx, lambda i: F.concat_ws("\x1f", F.slice(F.col("_w"), i + 1, n))
                )
            )
        ).alias("w"),
    )
    vocab = strs.select("w").distinct().select("w", _h60(F.col("w")).alias("s"))
    return strs.join(vocab, "w").select("doc_id", "s")


def _minhash_bands(feats: DataFrame, num_hashes: int = 32, bands: int = 16) -> DataFrame:
    """exploded (doc_id, s) -> (band, bucket) rows: minhash signature ->
    banded for LSH.

    All `num_hashes` permutation minima are computed in a single
    hash-aggregate (narrow agg expressions in whole-stage codegen) — the
    right shape when the input arrives as EXPLODED rows (the md5
    vocab-join paths).  When the shingles already sit in one array per
    doc, `_bands_from_shingle_arrays` computes the same signature per
    row with no aggregate and no exchange — the batch LSH pipelines use
    that since r16.  The band bucket packs the masked minima into one
    60-bit key.
    """
    rows_per_band = num_hashes // bands
    assert rows_per_band <= 2, "bucket packing holds at most two 31-bit minima"
    consts = _perm_consts(num_hashes)
    # expressions as single SQL strings, not per-op Column chains: each
    # Column operator is one py4j round-trip, and 48 permutations x ~6 ops
    # plus 24 band structs cost ~2.6 s of pure driver latency per build
    # (r16 profile).  One F.expr per aggregate keeps the identical plan.
    s28 = f"(s & {_MASK28}L)"
    sig = feats.groupBy("doc_id").agg(
        *[
            F.expr(f"min(({a}L * {s28} + {b}L) % {_PERM_P}L) AS h{i}")
            for i, (a, b) in enumerate(consts)
        ]
    )

    def bucket(b: int) -> str:
        # minima are < 2^31: two pack exactly into a 62-bit key
        out = "0L"
        for r in range(rows_per_band):
            out = f"({out} * {1 << 31}L + h{b * rows_per_band + r})"
        return out

    structs = ", ".join(
        f"named_struct('band', {b}, 'bucket', {bucket(b)})" for b in range(bands)
    )
    return sig.select(
        "doc_id", F.expr(f"explode(array({structs}))").alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")


# Degenerate-bucket guard (standard MinHash practice): a boilerplate
# bucket of B docs would emit C(B,2) candidate pairs — quadratic pair
# explosion is THE near-dup scale failure at 100 TB.  Buckets above the
# cap are dropped (and counted); truly identical docs are the exact-dedup
# pass's job (`dedup_exact`), so skipping their LSH bucket loses nothing a
# sane pipeline needs.  1000 is ~100x the largest genuine bucket observed
# at the oracle scales (max 12 at sf0.1), so the registered queries stay
# set-equal to the exact all-pairs oracles.
LSH_MAX_BUCKET = 1000


def _band_candidates(
    bands_df: DataFrame,
    max_bucket: int | None = LSH_MAX_BUCKET,
    skip_observation=None,
) -> DataFrame:
    """Candidate pairs = docs sharing a (band, bucket): ONE hash-aggregate
    collects each bucket's sorted doc list, then a two-stage generator
    chain emits the in-bucket pairs — `posexplode` one row per (element,
    bucket-array), then explode the element's tail slice.  Cross-band
    duplicates collapse in the final distinct.

    Memory shape is the point: per-row state is O(bucket), never
    O(bucket^2) — a degenerate 100k-id boilerplate bucket streams through
    row batches instead of materializing ~5e9 pair structs as ONE value
    (the rejected `flatten(transform(...))` formulation, which would
    single-task-OOM around ~10k ids), and there is no second shuffle side
    to sort-merge (the rejected self-join, measured slower AND
    shuffle-heavier).  Still strictly faster than the join shape at
    sf0.1 (1.12 s vs 1.14 s candidates, 1.06 s vs 1.28 s with verify);
    pair set pinned by the md5-banding value oracle.

    Buckets larger than `max_bucket` are dropped AFTER the aggregate
    (the transient collect_set state stays O(bucket) — same order as any
    group state, and the sort-fallback-capable ObjectHashAggregate holds
    it), so the quadratic pair stage never sees them.  When
    `skip_observation` (a `pyspark.sql.Observation`) is passed, the
    number of skipped buckets and their total member rows are published
    as query metrics (`skipped_buckets` / `skipped_ids`) at zero extra
    passes; `lsh_bucket_stats` is the driver-checked accounting query."""
    buckets = (
        bands_df.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        over = F.size("ids") > max_bucket
        if skip_observation is not None:
            buckets = buckets.observe(
                skip_observation,
                F.sum(over.cast("long")).alias("skipped_buckets"),
                F.sum(F.when(over, F.size("ids")).otherwise(0)).alias("skipped_ids"),
            )
        buckets = buckets.filter(~over)
    return (
        buckets.select(F.posexplode("ids").alias("i", "id_a"), "ids")
        .select(
            "id_a",
            F.explode(F.slice("ids", F.col("i") + 2, F.size("ids"))).alias("id_b"),
        )
        .distinct()
    )


def minhash_bands_map(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    extra_cols: tuple = (),
) -> DataFrame:
    """(doc_id, text, ...) -> exploded (doc_id, band, bucket) with the
    MinHash signature computed per ROW via array folds — ZERO shuffle,
    so it composes with Structured Streaming (no aggregation before the
    candidate join).  Produces the identical (band, bucket) keys as the
    batch `_minhash_bands` hash-aggregate (same permutation constants,
    same 28-bit masking, same two-minima packing) — pinned by a
    differential test.  Docs shorter than the shingle width emit no
    bands (the batch aggregate likewise never sees them)."""
    sh = ngram_shingles(df, n, hash_fn=F.xxhash64, extra_cols=extra_cols)
    return _bands_from_shingle_arrays(sh, num_hashes, bands, extra_cols)


def _bands_from_shingle_arrays(
    sh: DataFrame, num_hashes: int = 48, bands: int = 24, extra_cols: tuple = ()
) -> DataFrame:
    """(doc_id, shingles[], ...) -> exploded (doc_id, band, bucket) via
    per-row array folds — the shared core of `minhash_bands_map` and the
    batch LSH pipelines.

    The batch pipelines moved here from the `_minhash_bands` explode +
    hash-aggregate in r16 (guide §2.4 "remove shuffles outright"): the
    shingle frame already holds one complete array per doc, so grouping
    exploded rows back by doc_id only re-derived what the row had — at
    the price of one Exchange shipping a 48-minima signature row PER
    DOCUMENT (O(corpus) rows at 100 TB).  The fold computes the same
    signature without any shuffle; A/B at sf0.1 was cost-neutral
    (0.542 s vs 0.551 s full-pipeline warm min-of-5) and the emitted
    (doc_id, band, bucket) set is pinned identical on the real corpus
    (`test_minhash_bands_map_equals_aggregate`).  `_minhash_bands` stays
    for the md5 unit-oracle paths, whose input is exploded vocab-join
    rows rather than arrays."""
    rows_per_band = num_hashes // bands
    assert rows_per_band <= 2, "bucket packing holds at most two 31-bit minima"
    consts = _perm_consts(num_hashes)
    sh = sh.filter(F.size("shingles") > 0)

    # one F.expr SQL string, not per-op Column chains: each Column
    # operator is a py4j round-trip and the fold is ~300 ops (r16 build
    # batching, see _minhash_bands).  All literals L-suffixed: the
    # a*s28+b products stay below 2^59, exact in 64-bit.
    #
    # ONE pass over the shingle array with a num_hashes-wide running-min
    # accumulator, instead of one transform + array_min traversal per
    # permutation: per-row work drops from num_hashes array
    # materializations to a single fold (r17 micro A/B on the real
    # corpus, warm min-of-3: 0.176-0.255 s -> 0.145-0.17 s for the
    # signature stage), and the arithmetic per (shingle, permutation)
    # pair is unchanged, so the minima are bit-identical.  The signature
    # lands in its own projection; CollapseProject leaves non-cheap
    # higher-order functions un-inlined, so the fold runs once per row
    # (pinned by test_batch_lsh_single_fold_pass).
    a_arr = ", ".join(f"{a}L" for a, _ in consts)
    b_arr = ", ".join(f"{b}L" for _, b in consts)
    sig = (
        f"aggregate(shingles, array_repeat({_PERM_P}L, {num_hashes}), "
        f"(acc, s) -> zip_with(acc, "
        f"zip_with(array({a_arr}), array({b_arr}), "
        f"(a, b) -> (a * (s & {_MASK28}L) + b) % {_PERM_P}L), "
        f"(x, y) -> least(x, y)))"
    )

    def bucket(bi: int) -> str:
        out = "0L"
        for r in range(rows_per_band):
            # element_at is 1-based
            out = f"({out} * {1 << 31}L + element_at(_sig, {bi * rows_per_band + r + 1}))"
        return out

    structs = ", ".join(
        f"named_struct('band', {bi}, 'bucket', {bucket(bi)})" for bi in range(bands)
    )
    return (
        sh.select("doc_id", F.expr(sig).alias("_sig"), *extra_cols)
        .select(
            "doc_id", F.expr(f"explode(array({structs}))").alias("bb"), *extra_cols
        )
        .select("doc_id", "bb.band", "bb.bucket", *extra_cols)
    )


def _half_interval(within: str) -> str:
    """Half of an interval string, in seconds (slide='auto')."""
    import pandas as pd

    return f"{max(int(pd.Timedelta(within).total_seconds()) // 2, 1)} seconds"


def _window_buckets(
    docs_stream: DataFrame,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    within: str = "10 minutes",
    slide: str | None = "auto",
) -> DataFrame:
    """Windowed (band, bucket) membership aggregation over a document
    stream — the streaming twin of the batch `_band_candidates`
    hash-aggregate, evaluated inside each `within` event-time interval:
    per-row band signatures (`minhash_bands_map`, zero shuffle) feed a
    watermark-bounded window aggregation collecting each bucket's sorted
    doc list.  State per (window, band, bucket) key is O(bucket) and is
    evicted when the watermark passes the window — exactly the batch
    aggregate's memory shape, bounded by the horizon.

    The default `slide="auto"` (= half of `within`) overlaps windows so
    that ANY pair within `within/2` of each other is guaranteed detected
    (and pairs up to `within` apart usually are) at the cost of each
    band row living in two windows; the candidate stage keeps emission
    exactly-once by emitting each pair only in its EARLIEST common
    window.  `slide=None` gives tumbling intervals — half the
    aggregation state, but a pair straddling a boundary is missed unless
    a third co-bucketed arrival bridges it.  An explicit interval string
    tunes the trade directly (guarantee = within - slide).

    Members are (doc_id, ts) structs sorted by doc_id — each doc
    contributes exactly one row per band, and the per-member arrival
    time is what lets the pair stage pick the earliest common window."""
    bands_df = minhash_bands_map(
        docs_stream, n, num_hashes, bands, extra_cols=("ts",)
    ).withWatermark("ts", within)
    if slide == "auto":
        slide = _half_interval(within)
    win = F.window("ts", within, slide) if slide else F.window("ts", within)
    return (
        bands_df.groupBy(win.alias("window"), "band", "bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc_id"), F.col("ts")))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )


def minhash_candidate_stream(
    docs_stream: DataFrame,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    within: str = "10 minutes",
    slide: str | None = "auto",
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Continuous MinHash-LSH candidate pairs over a document stream —
    the streaming twin of the batch banding, with the SAME
    degenerate-bucket guard: per-interval bucket membership
    (`_window_buckets`), buckets above `max_bucket` dropped BEFORE pair
    generation, then the batch posexplode/slice pair chain (O(bucket)
    per row, never O(bucket^2) in one value) and a watermark-bounded
    pair dedup collapsing cross-band (and cross-slide) duplicates.

    The cap matters MORE here than in batch: an uncapped shape (e.g. a
    stream-stream self-join on (band, bucket)) turns a hot boilerplate
    bucket recurring at rate r into O((r*horizon)^2) join output and
    state — the quadratic blowup the batch `LSH_MAX_BUCKET` guard
    exists for.  Dropped buckets are observable via the companion
    `minhash_bucket_drops_stream` accounting stream (same aggregation,
    over-cap side), mirroring the reference's dropped-and-counted
    datapoint limits (AggrDatapoint.scala:94-159).

    Delivery is EXACTLY-ONCE even under overlapping windows: a pair is
    emitted only in its EARLIEST common window — the unique window whose
    last `slide` covers the pair's later arrival (`max(ts_a, ts_b) >=
    window.end - slide`; a window contains only events below its end, so
    the upper bound is implicit).  A later overlapping window sees the
    same pair and filters it out deterministically, with no reliance on
    cross-window dedup state; the watermark-bounded pair dedup that
    follows only collapses CROSS-BAND duplicates, which share one window
    and one event time (an earlier design leaned on the dedup across
    windows and re-emitted ~1.66x when the first window's state expired
    before the second closed — PERF.md r12).

    Candidates are emitted UNVERIFIED, like the reference banding — a
    real intake pipeline verifies them against the landed corpus with a
    stream-static jaccard join downstream (`minhash_verified_stream`).
    Expects columns [doc_id long, text string, ts timestamp]."""
    if slide == "auto":
        slide = _half_interval(within)
    buckets = _window_buckets(docs_stream, n, num_hashes, bands, within, slide)
    if max_bucket is not None:
        buckets = buckets.filter(F.size("members") <= max_bucket)
    # keep the window column through the pair explode: after the
    # aggregation it carries the event-time tag, which the pair
    # dedup needs for state expiry (dropping it would make the
    # dedup state unbounded)
    pairs = buckets.select(
        "window", F.posexplode("members").alias("i", "a"), "members"
    ).select(
        "window",
        F.col("a.doc_id").alias("id_a"),
        F.col("a.ts").alias("ts_a"),
        F.explode(F.slice("members", F.col("i") + 2, F.size("members"))).alias("b"),
    )
    if slide:  # earliest-common-window emission (exactly-once)
        pairs = pairs.filter(
            F.greatest(F.col("ts_a"), F.col("b.ts"))
            >= F.expr(f"window.end - INTERVAL {slide}")
        )
    return (
        pairs.select("window", "id_a", F.col("b.doc_id").alias("id_b"))
        .dropDuplicatesWithinWatermark(["id_a", "id_b"])
        .select("id_a", "id_b")
    )


def minhash_bucket_drops_stream(
    docs_stream: DataFrame,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    within: str = "10 minutes",
    slide: str | None = "auto",
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Accounting stream for the streaming LSH degenerate-bucket guard:
    one row per (interval, band, bucket) whose membership exceeded
    `max_bucket` and was therefore dropped by `minhash_candidate_stream`
    before pair generation — the streaming twin of the batch
    `skip_observation` counters (`lsh_bucket_stats`).  Emits
    (interval_start, band, bucket, bucket_size); a production intake
    pipeline runs it as a second query over the same source/topic and
    alarms on sustained drops."""
    return (
        _window_buckets(docs_stream, n, num_hashes, bands, within, slide)
        .filter(
            F.size("members") > (max_bucket if max_bucket is not None else _MASK28)
        )
        .select(
            F.col("window.start").alias("interval_start"),
            "band",
            "bucket",
            F.size("members").alias("bucket_size"),
        )
    )


def minhash_verified_stream(
    docs_stream: DataFrame,
    corpus_df: DataFrame,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    threshold: float = 0.5,
    within: str = "10 minutes",
    slide: str | None = "auto",
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """End-to-end streaming near-dup pairs: the watermarked (and
    degenerate-bucket-capped) LSH candidate stream
    (`minhash_candidate_stream`) verified by exact
    n-gram Jaccard against the LANDED corpus — two stream-static joins
    on doc_id pulling each side's shingle set from `corpus_df` (the
    bronze documents table a real intake pipeline maintains; at scale
    this is the same broadcast-or-shuffle verify join as batch, with
    the static side served by the lake).

    `corpus_df` is either the raw documents [doc_id, text] or a landed
    SHINGLE table [doc_id, shingles] (detected by column name).  Pass
    the latter in production: a stream-static join re-executes the
    static side's plan on EVERY micro-batch, so deriving shingles from
    text inside the join re-tokenizes the whole corpus per batch —
    shingling once at landing time and reading the array column back is
    the same rows with the per-batch work reduced to a parquet scan
    (measured 3.4x intake throughput at 200k docs, PERF.md r13).

    Emits (id_a, id_b, jaccard) for pairs at or above `threshold` —
    the batch `ngram_jaccard_pairs` rows for documents within the stream
    horizon, exactly once (the candidate feed emits each pair only in
    its earliest common window)."""
    if "shingles" in corpus_df.columns:
        sh = corpus_df
    else:
        sh = ngram_shingles(corpus_df, n, hash_fn=F.xxhash64)
    cand = minhash_candidate_stream(
        docs_stream, n, num_hashes, bands, within, slide, max_bucket=max_bucket
    )
    return _verified_pairs(sh, cand, threshold).select("id_a", "id_b", "jaccard")


def _verified_pairs(sh: DataFrame, cand: DataFrame, threshold: float) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs only: join the candidate
    list back to the shingle frame twice and intersect hashed shingle
    arrays.

    The CANDIDATE side is the explicit broadcast build side of both joins
    (r16): candidates are bounded by the banding + bucket cap while the
    corpus side is unbounded, and before the hint AQE size estimates
    chose BuildRight — broadcasting the whole corpus shingle table twice,
    which cannot survive a large corpus.  With the hint the corpus frame
    is never shuffled or broadcast: each join streams it once and probes
    the candidate-sized hash relation (the second join broadcasts the
    first's candidate-sized output, arrays included).  Local cost is
    neutral (1.01 s vs 1.02 s warm at sf0.1); the win is the scale shape."""
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    jac = F.round(inter / (F.size("sh_a") + F.size("sh_b") - inter), 6)
    if cand.isStreaming:
        # stream-static verify: the streaming side cannot be a broadcast
        # build side; keep the stream on the left and let the engine plan
        # the static lookups per micro-batch
        return (
            cand.join(a, on="id_a")
            .join(b, on="id_b")
            .withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    matched = a.join(F.broadcast(cand), on="id_a")  # [id_a, sh_a, id_b]
    return (
        b.join(F.broadcast(matched), on="id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_stream_candidates(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    threshold: float = 0.5,
) -> DataFrame:
    """Driver-visible surface for the STREAMING LSH twin: replays the
    documents table as a bounded file stream through the REAL
    `minhash_candidate_stream` pipeline (windowed capped banding +
    watermark-bounded pair dedup), materializes the emitted candidates
    via a memory sink, then applies the same exact-jaccard verification
    as the batch op — so the result is SET-EQUAL to
    `op_minhash_candidates`' exact all-pairs oracle
    (`MINHASH_CANDIDATES_SQL`) and the driver's value-hash gate covers
    the streaming code path end-to-end.

    Replay mechanics: every document gets one event time inside a single
    interval (matching the batch query's corpus-wide bucket scope); a
    far-future sentinel document with a disjoint vocabulary advances the
    watermark past the interval so the append-mode aggregation flushes —
    the role the next interval's arrivals play in a live pipeline."""
    stream, tmp = _replay_documents(spark, sf_dir, sentinel=True)
    cand = minhash_candidate_stream(stream, n, num_hashes, bands, within="10 minutes")
    # distinct = the landing-table write dedup (defense in depth; the
    # candidate stream itself is exactly-once via earliest-common-window
    # emission)
    materialized = _run_stream_to_table(
        spark, cand, "mh_stream", cleanup=tmp, twin="minhash_candidate_stream"
    ).distinct()

    docs = load_documents(spark, sf_dir)
    sh = ngram_shingles(docs, n, hash_fn=F.xxhash64)
    return _verified_pairs(sh, materialized, threshold).select("id_a", "id_b")


_REPLAY_SENTINEL_ID = 1 << 40


def _replay_documents(spark: SparkSession, sf_dir: str, sentinel: bool):
    """Stage the documents table as a bounded file-stream replay: every
    document gets one event time inside a single interval; when
    `sentinel` is set, a far-future disjoint-vocabulary document is added
    to advance the watermark past the interval (needed by windowed
    aggregations in append mode; immediate-emit operators like the
    stream dedup don't need it).  Returns (stream_df [doc_id, text, ts],
    staging_dir)."""
    import os
    import tempfile

    configure_existing(spark)
    docs_path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(docs_path).schema
    base = 1704067200  # interval-aligned; any fixed instant works

    # a FileStreamSource needs a directory: stage the corpus file as a
    # symlink (next to the sentinel file when one is requested)
    tmp = tempfile.mkdtemp(prefix="atlas_replay_")
    in_dir = f"{tmp}/input"
    os.makedirs(in_dir)
    src = os.path.abspath(docs_path)
    if os.path.isdir(src):  # directory-style table (e.g. a scaled corpus)
        for i, f in enumerate(sorted(os.listdir(src))):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(src, f), f"{in_dir}/corpus_{i}.parquet")
    else:
        os.symlink(src, f"{in_dir}/corpus.parquet")
    if sentinel:
        sentinel_text = " ".join(f"sentinelword{i}" for i in range(40))
        spark.createDataFrame(
            [tuple([_REPLAY_SENTINEL_ID, sentinel_text] + [None] * (len(schema) - 2))],
            schema,
        ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(in_dir).select(
        "doc_id",
        "text",
        F.timestamp_seconds(
            F.when(
                F.col("doc_id") == _REPLAY_SENTINEL_ID, F.lit(base + 10**6)
            ).otherwise(F.lit(base))
        ).alias("ts"),
    )
    return stream, tmp


# memory-sink tables from past replay invocations, oldest first.  The
# sink table IS the returned result (a caller may collect it lazily), so
# it cannot be dropped at the next invocation like a scoped cache —
# instead retention is bounded: anything older than the last
# _SINK_KEEP results is dropped, so a long-lived session (driver sweep,
# bench loop) holds at most a handful of driver-memory result sets.
_SINK_TABLES: list[str] = []
_SINK_KEEP = 8


def _run_stream_to_table(
    spark: SparkSession,
    out: DataFrame,
    prefix: str,
    cleanup: str | None = None,
    twin: str | None = None,
) -> DataFrame:
    """Run a bounded stream to completion into a memory sink and return
    the materialized table (the batch frame a driver can collect).
    `twin` selects the recommended state-store provider for the stream
    (streaming/rollup.py::scoped_state_store — RocksDB for
    content-scaled state, default provider for small fixed state; the
    conf is lock-scoped around the start and restored after, so
    concurrent twins with different regimes never race)."""
    import contextlib
    import shutil
    import uuid

    if twin is not None:
        from ..streaming.rollup import scoped_state_store

        provider_scope = scoped_state_store(spark, twin)
    else:
        provider_scope = contextlib.nullcontext()

    while len(_SINK_TABLES) >= _SINK_KEEP:
        stale = _SINK_TABLES.pop(0)
        try:
            spark.catalog.dropTempView(stale)
        except Exception:
            pass
    name = f"{prefix}_{uuid.uuid4().hex[:10]}"
    _SINK_TABLES.append(name)
    with provider_scope:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        if cleanup:
            shutil.rmtree(cleanup, ignore_errors=True)
    return spark.table(name)


def dedup_stream_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible surface for the STREAMING exact-dedup twin
    (`streaming/rollup.py::dedup_exact_stream`): replays the documents
    table as a bounded file stream through the real
    dropDuplicatesWithinWatermark pipeline and returns the SURVIVOR HASH
    SET.  Which copy of a duplicate text survives depends on arrival
    order (nondeterministic within a microbatch), but the surviving
    hashes are identical whichever copy wins — exactly one row per
    distinct text — so the hash set is the driver-checkable value
    (`DEDUP_STREAM_SQL`); survivor-assignment semantics are pinned by
    the ordered-chunk streaming test instead."""
    from ..streaming.rollup import dedup_exact_stream

    stream, tmp = _replay_documents(spark, sf_dir, sentinel=False)
    out = dedup_exact_stream(stream).select("h")
    return _run_stream_to_table(
        spark, out, "dedup_stream", cleanup=tmp, twin="dedup_exact_stream"
    )


DEDUP_STREAM_SQL = "SELECT DISTINCT sha256(text) AS h FROM documents"


def chunk_dedup_stream_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible surface for the STREAMING chunk-dedup twin
    (`streaming/rollup.py::chunk_dedup_stream`): replays the documents
    table as a bounded file stream through the real
    dropDuplicatesWithinWatermark pipeline and returns the SURVIVING
    CHUNK-HASH SET.  Which document's copy of a duplicated chunk
    survives depends on arrival order, but the surviving hash set is
    identical whichever copy wins — exactly one row per distinct chunk —
    so the hash set is the driver-checkable value (`CHUNK_STREAM_SQL`);
    keeper-assignment semantics are pinned by the batch op's oracle
    (`op_chunk_dedup`) instead."""
    from ..streaming.rollup import chunk_dedup_stream

    stream, tmp = _replay_documents(spark, sf_dir, sentinel=False)
    out = chunk_dedup_stream(stream).select("ch")
    return _run_stream_to_table(
        spark, out, "chunk_stream", cleanup=tmp, twin="chunk_dedup_stream"
    )


CHUNK_STREAM_SQL = """
SELECT DISTINCT sha256(array_to_string(words[(i-1)*10+1 : i*10], ' ')) AS ch
FROM (
  SELECT words, unnest(range(1, CAST(ceil(len(words) / 10.0) AS BIGINT) + 1)) AS i
  FROM (SELECT string_split(text, ' ') AS words FROM documents)
)
"""


def span_dedup_stream_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible surface for the STREAMING span-dedup twin
    (`streaming/rollup.py::span_dedup_stream`): replays the documents
    table as a bounded file stream through the real
    dropDuplicatesWithinWatermark pipeline over SLIDING gram hashes and
    returns the surviving GRAM-HASH SET — arrival-order-independent
    (exactly one row per distinct sliding gram), so it is the
    driver-checkable value (`SPAN_STREAM_SQL`); keeper-assignment and
    span-union semantics are pinned by the batch op's oracle
    (`op_span_dedup`)."""
    from ..streaming.rollup import span_dedup_stream

    stream, tmp = _replay_documents(spark, sf_dir, sentinel=False)
    out = span_dedup_stream(stream).select("gh")
    return _run_stream_to_table(
        spark, out, "span_stream", cleanup=tmp, twin="span_dedup_stream"
    )


SPAN_STREAM_SQL = """
SELECT DISTINCT sha256(array_to_string(words[i : i+9], ' ')) AS gh
FROM (
  SELECT words, unnest(range(1, len(words) - 10 + 2)) AS i
  FROM (SELECT string_split(text, ' ') AS words FROM documents)
)
"""


def minhash_verified_stream_pairs(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    threshold: float = 0.5,
) -> DataFrame:
    """Driver-visible surface for the VERIFIED streaming near-dup twin
    (`minhash_verified_stream`): lands the corpus shingle table to
    parquet first (the production shape — the stream-static verify
    join re-executes its static side per micro-batch, so shingling
    happens once at landing, not once per batch), replays the documents
    table as a bounded file stream through the real windowed-capped
    candidate pipeline + stream-static jaccard verify, and materializes
    the emitted (id_a, id_b, jaccard) rows.

    Oracle = `NGRAM_JACCARD_SQL`, the batch exact all-pairs SQL: with
    every replayed document in one interval the candidate scope is
    corpus-wide, banding recall is exact on this corpus (pinned by
    op_minhash_candidates/op_minhash_stream sharing the same oracle
    family), and verification removes banding false-positives — so the
    streamed rows are value-equal to the batch pairs, exactly once."""
    import shutil
    import tempfile

    stream, tmp = _replay_documents(spark, sf_dir, sentinel=True)
    sh_dir = tempfile.mkdtemp(prefix="atlas_shingles_")
    try:
        ngram_shingles(
            load_documents(spark, sf_dir), n, hash_fn=F.xxhash64
        ).write.mode("overwrite").parquet(sh_dir)
        out = minhash_verified_stream(
            stream,
            spark.read.parquet(sh_dir),
            n,
            num_hashes,
            bands,
            threshold,
            within="10 minutes",
        )
        # distinct = the landing-table write dedup (defense in depth; the
        # feed is exactly-once) — materialized eagerly by the memory sink,
        # so the staged shingle parquet can be removed on exit
        return (
            _run_stream_to_table(
                spark, out, "mh_verified", cleanup=tmp,
                twin="minhash_verified_stream",
            )
            .distinct()
        )
    finally:
        shutil.rmtree(sh_dir, ignore_errors=True)


def _shared_shingles(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Corpus shingle frame [doc_id, shingles] shared ACROSS registry
    queries: op_ngram_jaccard and op_minhash_candidates derive the
    identical frame from the same immutable corpus, and re-tokenizing it
    per query was the largest redundant computation in a bench/driver
    sweep (the streaming verified twin already lands this table once,
    dedup.py minhash_verified_stream).  Keyed by session + sf_dir + n so
    a frame never crosses sessions or corpora; bounded LRU in
    util/caching.py."""
    from ..util.caching import shared_persist

    key = f"{spark.sparkContext.applicationId}|{sf_dir}|shingles|{n}|xxh"
    return shared_persist(
        key,
        lambda: ngram_shingles(
            _spread(load_documents(spark, sf_dir)), n, hash_fn=F.xxhash64
        ),
    )


@_memo_factory
def minhash_lsh_candidates(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-duplicate pair set at Jaccard>=threshold.

    shingle-hash -> per-permutation min -> band signature -> bucket join
    -> exact verify on candidates only.  Docs only meet inside a bucket,
    never all-pairs; the band join shuffles fixed-width longs.  24 bands
    x 2 rows gives recall 1.0 at the oracle scales (deterministic hashes
    — verified, not just probable), and exact verification filters band
    false-positives, so the output is SET-EQUAL to the exact all-pairs
    oracle (`MINHASH_CANDIDATES_SQL`).  Hash values therefore never
    cross engines and the cheap in-engine xxhash64 replaces the r2
    portable-md5 path (~3x less per-shingle work; the permutation
    arithmetic keeps its own md5-valued oracle via
    `minhash_lsh_candidates_md5` / `MINHASH_PERM_ORACLE_SQL`).
    """
    return minhash_lsh_pairs(
        None, n, num_hashes, bands, threshold,
        sh=_shared_shingles(spark, sf_dir, n),
    )


def minhash_lsh_pairs(
    docs: DataFrame | None,
    n: int = 3,
    num_hashes: int = 48,
    bands: int = 24,
    threshold: float = 0.5,
    max_bucket: int | None = LSH_MAX_BUCKET,
    skip_observation=None,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Core MinHash+LSH pipeline over an arbitrary (doc_id, text) frame —
    split out so planted-duplicate recall tests can drive it with
    synthetic corpora (the recall-1.0 property the registered oracle
    depends on is empirical, so it must be pinned on adversarial data,
    not just the driver corpus).  `max_bucket` / `skip_observation`
    forward to `_band_candidates`' degenerate-bucket guard; `sh` injects
    a prebuilt (shared) shingle frame instead of deriving one here."""
    if sh is None:
        sh = scoped_persist(ngram_shingles(docs, n, hash_fn=F.xxhash64))
    # per-row fold over the shingle arrays, not explode + hash-aggregate:
    # removes the Exchange that shipped one signature row per document
    # (see _bands_from_shingle_arrays)
    cand = _band_candidates(
        _bands_from_shingle_arrays(sh, num_hashes, bands),
        max_bucket=max_bucket,
        skip_observation=skip_observation,
    )
    return _verified_pairs(sh, cand, threshold).select("id_a", "id_b")


MINHASH_CANDIDATES_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS shingles
  FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(shingles) AS n FROM sh)
SELECT p.id_a, p.id_b
FROM pairs p
JOIN sz sa ON p.id_a = sa.doc_id
JOIN sz sb ON p.id_b = sb.doc_id
WHERE round(CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared), 6) >= 0.5
"""


def minhash_lsh_candidates_md5(
    spark: SparkSession, sf_dir: str, n: int = 3, num_hashes: int = 32, bands: int = 16
) -> DataFrame:
    """Portable-hash MinHash banding candidates (UNverified — includes
    band false-positives).  The md5-derived shingle ids are reproducible
    in DuckDB, so `MINHASH_PERM_ORACLE_SQL` checks the permutation/band
    arithmetic VALUE-level (the thing the set-level oracle above cannot
    see).  Kept as a unit oracle; the registered query uses the cheap
    xxhash64 path."""
    docs = _spread(load_documents(spark, sf_dir))
    return _band_candidates(_minhash_bands(_md5_feats(docs, n), num_hashes, bands))


def _minhash_bb_cte(n: int = 3, num_hashes: int = 32, bands: int = 16) -> str:
    """Shared DuckDB CTE prefix reproducing the identical MinHash banding:
    md5-derived shingle ids + universal-hash permutations (exact 64-bit
    arithmetic), ending with `bb(doc_id, band, bucket)`."""
    rows_per_band = num_hashes // bands
    h60 = "('0x' || substr(md5({v}), 1, 15))::BIGINT"
    shingle = (
        "string_split(text, ' ')[i] || chr(31) || string_split(text, ' ')[i+1]"
        " || chr(31) || string_split(text, ' ')[i+2]"
    )
    consts = _perm_consts(num_hashes)
    mins = ", ".join(
        f"min(({a} * (s % {_MASK28 + 1}) + {b}) % {_PERM_P}) AS h{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + " + ".join(
            f"h{b * rows_per_band + r}" + (f" * {1 << 31}" if r == 0 and rows_per_band == 2 else "")
            for r in range(rows_per_band)
        )
        + " AS bucket FROM sig"
        for b in range(bands)
    )
    return f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
             i -> {h60.format(v=shingle)})) AS shingles
  FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
bb AS ({band_rows})"""


def _minhash_candidates_sql(n: int = 3, num_hashes: int = 32, bands: int = 16) -> str:
    return f"""{_minhash_bb_cte(n, num_hashes, bands)}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""


MINHASH_PERM_ORACLE_SQL = _minhash_candidates_sql()


def lsh_bucket_stats(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    max_bucket: int = 2,
) -> DataFrame:
    """One-row LSH bucket-population accounting over the portable md5
    banding: multi-doc bucket count, buckets over the degenerate-bucket
    cap, member rows those skipped buckets would have contributed, and
    the largest bucket observed — the drop-counter surface for the
    `LSH_MAX_BUCKET` guard in `_band_candidates` (r10 verdict #2).

    Registered with a deliberately LOW cap (2) so the over-cap branch is
    EXERCISED and value-checked by the DuckDB oracle at driver scale,
    not just dead-zero.  One partial-aggregated groupBy on fixed-width
    (band, bucket) keys then a one-row fold — no pair generation, so the
    accounting itself is immune to the quadratic blowup it measures."""
    sizes = (
        _minhash_bands(_md5_feats(_spread(load_documents(spark, sf_dir)), n),
                       num_hashes, bands)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    )
    over = F.col("c") > max_bucket
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(over.cast("long")).cast("long").alias("n_over_cap"),
        F.coalesce(F.sum(F.when(over, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("skipped_ids"),
        F.max("c").cast("long").alias("max_bucket_size"),
    )


def _lsh_bucket_stats_sql(
    n: int = 3, num_hashes: int = 32, bands: int = 16, max_bucket: int = 2
) -> str:
    return f"""{_minhash_bb_cte(n, num_hashes, bands)},
sz AS (
  SELECT band, bucket, count(*) AS c FROM bb GROUP BY 1, 2 HAVING count(*) > 1
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(CASE WHEN c > {max_bucket} THEN 1 ELSE 0 END) AS BIGINT) AS n_over_cap,
       CAST(coalesce(sum(CASE WHEN c > {max_bucket} THEN c END), 0) AS BIGINT) AS skipped_ids,
       CAST(max(c) AS BIGINT) AS max_bucket_size
FROM sz
"""


LSH_BUCKET_STATS_SQL = _lsh_bucket_stats_sql()


@_memo_factory
def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidates + exact n-gram Jaccard
    verification on the candidate pairs only.

    The standard scalable shape: candidate generation is sub-quadratic
    (band-bucket join), verification is an exact `array_intersect` over
    hashed shingle arrays for candidates only.  A shingle-explode
    self-join would pay k^2 rows for any shingle shared by k docs; here
    bucket membership is signature-bounded.
    """
    # the shingle frame feeds candidate generation AND both verify joins,
    # and is byte-identical to op_minhash_candidates' — shared via the
    # keyed session cache so the pair computes it once per sweep.
    # xxhash64 shingle ids: the oracle verifies raw-string shingle SETS,
    # so hash values never cross engines and the cheap hash is safe
    sh = _shared_shingles(spark, sf_dir, n)
    # 24 bands x 2 rows: P(miss) = (1 - J^2)^24 ~ 1e-3 at the 0.5
    # threshold; the hashes are deterministic, so recall 1.0 is VERIFIED
    # (not just probable) at the oracle scales: 25/25 at sf0.01, 256/256
    # at sf0.1.  Two-row bands keep the noise-pair candidate rate
    # quadratic in J (single-row bands flood verification).
    cand = _band_candidates(
        _bands_from_shingle_arrays(sh, 48, 24)
    )  # default LSH_MAX_BUCKET cap applies; zero-shuffle per-row signatures
    return _verified_pairs(sh, cand, threshold).select("id_a", "id_b", "jaccard")


# Exact all-pairs oracle (DuckDB): shared-shingle join -> jaccard.  The
# engine result must EQUAL this because the MinHash banding is tuned for
# recall 1.0 at the oracle scales (verified 25/25 at sf0.01, 256/256 at
# sf0.1) and verification is exact.  The oracle shingles are raw strings
# while the engine intersects 64-bit shingle hashes — identical sets
# barring xxhash64 collisions within one document pair (~1e-15 at these
# set sizes).
NGRAM_JACCARD_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS shingles
  FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(shingles) AS n FROM sh)
SELECT p.id_a, p.id_b,
       round(CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared), 6) AS jaccard
FROM pairs p
JOIN sz sa ON p.id_a = sa.doc_id
JOIN sz sb ON p.id_b = sb.doc_id
WHERE round(CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared), 6) >= 0.5
"""


@_memo_factory
def simhash(spark: SparkSession, sf_dir: str, bits: int = 60) -> DataFrame:
    """SimHash per document over word features.

    Classic Charikar sketch: sign-sum of per-feature hash bits.  The
    feature hash is the top 60 bits of md5 (`conv(substr(md5, 1, 15))`)
    rather than xxhash64 so the DuckDB oracle computes the IDENTICAL
    sketch (`SIMHASH_SQL`) — a full value-level oracle, which a cheaper
    in-engine hash would forfeit for no measured gain (the md5 is ~2% of
    query time; profiled md5-direct == xxhash64 at sf0.1).

    The bit votes fold inside constant-size higher-order `aggregate`
    expressions over the per-doc hash list instead of `bits` separate
    conditional-sum aggregate columns: a wide agg costs Catalyst
    analysis/optimization time proportional to the expression count on
    EVERY query build (~1.9s of the former 2.5s total), while the lambda
    tree is constant-size.  The per-doc list is bounded by the doc's
    distinct-word count, and SQL `shiftright` (unlike the PySpark
    wrapper) accepts the lambda index as its shift amount.

    The bit counts accumulate in ONE pass over the hash list with a
    `bits`-wide accumulator (r17; same one-pass rule as the MinHash
    signature fold): the former inner aggregate ran once per bit — 60
    traversals of the list per document.  The fingerprint is then
    assembled from the counts in two halves so the materialized count
    column is referenced twice: CollapseProject leaves multiply-
    referenced non-cheap expressions in their own projection, keeping
    the fold at one evaluation per row (a single reference would be
    inlined INTO the assembling lambda and re-run per bit).  Values are
    bit-identical (same per-(hash, bit) arithmetic; integer sums).
    """
    docs = _spread(load_documents(spark, sf_dir))
    strs = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("w"),
    )
    # md5 once per word occurrence: with per-doc distinct words in the
    # tens, hashing is far cheaper than the vocab-join detour (measured
    # 2.1s vs 4.0s at sf0.1 — the join's exchanges dominate its savings)
    feats = strs.select("doc_id", _h60(F.col("w")).alias("h"))
    hs = feats.groupBy("doc_id").agg(
        F.collect_list("h").alias("hs"), F.count("*").alias("n")
    )
    counts = F.expr(
        f"aggregate(hs, array_repeat(0L, {bits}), (acc, h) -> "
        f"zip_with(acc, sequence(0, {bits - 1}), "
        "(c, i) -> c + (shiftright(h, i) & 1)))"
    )
    half = bits // 2

    def assemble(lo: int, hi: int) -> F.Column:
        return F.expr(
            f"aggregate(sequence({lo}, {hi - 1}), 0L, (acc, i) -> "
            "acc | IF(element_at(_bc, i + 1) * 2 > n, shiftleft(1L, i), 0L))"
        )

    return (
        hs.select("doc_id", "n", counts.alias("_bc"))
        .select(
            "doc_id",
            assemble(0, half).alias("_lo"),
            assemble(half, bits).alias("_hi"),
        )
        .select("doc_id", F.expr("_lo | _hi").alias("simhash"))
    )


def _simhash_sql(bits: int = 60) -> str:
    """DuckDB oracle computing the identical md5-derived sketch."""
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    fold = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)" for i in range(bits)
    )
    return f"""
WITH f AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM documents)
),
v AS (SELECT doc_id, {votes} FROM f GROUP BY doc_id)
SELECT doc_id, CAST({fold} AS BIGINT) AS simhash FROM v
"""


SIMHASH_SQL = _simhash_sql()


def dedup_clusters(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """Transitive near-duplicate clusters: connected components over the
    verified near-dup pair graph, each doc mapped to its cluster's
    canonical (minimum) doc_id — the survivorship step that follows
    candidate generation in a dedup pipeline (A~B, B~C => one cluster
    even when A~C was never scored).

    Components via iterative min-label propagation entirely in DataFrame
    ops: each round joins labels across edges and keeps the elementwise
    minimum; rounds = O(component diameter), which for near-dup graphs is
    tiny (clusters are cliques-ish).  At 100 TB each round is one
    shuffle-join keyed on doc_id; convergence is checked with an
    aggregate, and the loop is bounded.  (The large-star/small-star
    variant halves round count at extreme diameters; unnecessary here.)
    """
    pairs = minhash_lsh_candidates(spark, sf_dir, threshold=threshold)
    edges = pairs.select(
        F.col("id_a").cast("long").alias("src"), F.col("id_b").cast("long").alias("dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    # nodes restricted to the pair graph: singleton docs are their own
    # canonical trivially and would dominate the output with noise
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    converged = False
    max_rounds = 16
    for rnd in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        # localCheckpoint truncates the lineage each round: without it,
        # iteration k re-derives all k-1 prior joins on every action and
        # the plan (and recomputation) grows with the iteration count
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        # Convergence probe every other round (and on the last): each probe
        # is a driver-synchronized job, so at 100 TB halving the probe count
        # halves the sequential job submissions on top of the per-round join.
        # Worst case this runs one extra (idempotent) propagation round.
        if rnd % 2 == 1 or rnd == max_rounds - 1:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            if changed == 0:
                labels.unpersist()
                labels = new_labels
                converged = True
                break
        labels.unpersist()
        labels = new_labels
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"dedup_clusters: label propagation did not converge within "
            f"{max_rounds} rounds — a component's diameter exceeds the bound; "
            f"raise max_rounds or switch to large-star/small-star"
        )
    return labels.select(
        "doc_id", F.col("label").cast("long").alias("canonical_id")
    )


# Oracle: transitive closure via recursive CTE — min reachable id per node
DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS shingles
  FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
edges AS (
  SELECT p.id_a AS src, p.id_b AS dst
  FROM p JOIN sz sa ON p.id_a = sa.doc_id JOIN sz sb ON p.id_b = sb.doc_id
  WHERE round(CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared), 6) >= 0.5
),
bi AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
reach AS (
  SELECT src AS doc_id, dst AS other FROM bi
  UNION
  SELECT r.doc_id, b.dst FROM reach r JOIN bi b ON r.other = b.src
)
SELECT doc_id, CAST(least(doc_id, min(other)) AS BIGINT) AS canonical_id
FROM reach
GROUP BY doc_id
"""


def dedup_reduction(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """One-row dedup effectiveness report: corpus size, docs caught in
    near-dup clusters, cluster count, docs removed by survivorship, and
    the reduction ratio — the number a pipeline owner actually tracks
    per dedup run.

    Composes the full chain (candidates -> exact verify -> transitive
    clusters) and collapses it to aggregate-sized frames; the final
    cross join combines two one-row aggregates.
    """
    labels = dedup_clusters(spark, sf_dir, threshold=threshold)
    stats = labels.agg(
        F.count("*").cast("long").alias("docs_in_clusters"),
        F.countDistinct("canonical_id").cast("long").alias("n_clusters"),
    )
    tot = load_documents(spark, sf_dir).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    return tot.crossJoin(stats).select(
        "n_docs",
        "docs_in_clusters",
        "n_clusters",
        (F.col("docs_in_clusters") - F.col("n_clusters")).alias("n_removed"),
        F.round(
            (F.col("docs_in_clusters") - F.col("n_clusters")) / F.col("n_docs"), 6
        ).alias("reduction"),
    )


DEDUP_REDUCTION_SQL = f"""
SELECT t.n_docs, c.docs_in_clusters, c.n_clusters,
       c.docs_in_clusters - c.n_clusters AS n_removed,
       round(CAST(c.docs_in_clusters - c.n_clusters AS DOUBLE) / t.n_docs, 6)
           AS reduction
FROM (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents) t
CROSS JOIN (
  SELECT CAST(count(*) AS BIGINT) AS docs_in_clusters,
         CAST(count(DISTINCT canonical_id) AS BIGINT) AS n_clusters
  FROM ({DEDUP_CLUSTERS_SQL}) cl
) c
"""


def dedup_keep_best(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    labels: DataFrame | None = None,
) -> DataFrame:
    """Per-cluster survivor selection — the decision a dedup pipeline
    actually writes out: within each near-dup cluster, keep the document
    with the most content (max n_chars, ties broken by min doc_id so the
    choice is deterministic engine-to-engine), report its id and the
    cluster's size.

    Composes the transitive clusters (`dedup_clusters`) with the
    documents table and collapses each cluster in ONE partial-aggregated
    groupBy: the argmax rides a struct-max (quality first, negated id
    second), so there is no window sort and no second pass — per-group
    state is constant-size, and at 100 TB the only added cost over the
    cluster labels is one shuffle keyed on canonical_id whose input is
    already restricted to docs caught in clusters (singletons never enter
    the label frame).  Callers that already hold the cluster labels pass
    them via `labels` so the propagation rounds run once (the curation
    funnel composes clusters AND survivors)."""
    if labels is None:
        labels = dedup_clusters(spark, sf_dir, threshold=threshold)
    joined = labels.join(
        load_documents(spark, sf_dir).select("doc_id", "n_chars"), "doc_id"
    )
    best = F.max(
        F.struct(F.col("n_chars").alias("q"), (-F.col("doc_id")).alias("nid"))
    ).alias("best")
    return (
        joined.groupBy("canonical_id")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"), best)
        .select(
            "canonical_id",
            (-F.col("best.nid")).cast("long").alias("survivor_id"),
            F.col("best.q").cast("long").alias("survivor_chars"),
            "cluster_size",
            (F.col("cluster_size") - 1).cast("long").alias("n_removed"),
        )
    )


DEDUP_KEEP_BEST_SQL = f"""
WITH cl AS ({DEDUP_CLUSTERS_SQL}),
j AS (
  SELECT cl.canonical_id, cl.doc_id, d.n_chars
  FROM cl JOIN documents d ON cl.doc_id = d.doc_id
),
r AS (
  SELECT canonical_id, doc_id, n_chars,
         count(*) OVER (PARTITION BY canonical_id) AS cluster_size,
         row_number() OVER (
             PARTITION BY canonical_id ORDER BY n_chars DESC, doc_id ASC
         ) AS rn
  FROM j
)
SELECT canonical_id,
       CAST(doc_id AS BIGINT) AS survivor_id,
       CAST(n_chars AS BIGINT) AS survivor_chars,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(cluster_size - 1 AS BIGINT) AS n_removed
FROM r WHERE rn = 1
"""


def lsh_precision(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """One-row banding-precision report: how many candidate pairs the
    LSH banding emits vs how many survive exact Jaccard verification —
    the false-positive rate a pipeline owner tunes (bands, rows) against,
    since every false candidate costs a verify-join row at 100 TB.
    (Recall is pinned separately by the planted-duplicate tests; measuring
    it here would need the exact all-pairs join the banding exists to
    avoid.)

    Uses the portable md5 banding so the DuckDB oracle reproduces the
    IDENTICAL candidate set — including the `max_bucket` degenerate-bucket
    cap, which the oracle applies as the same HAVING filter before its
    pair join so engine and oracle agree even on a corpus carrying a
    boilerplate bucket over the cap; verification reuses the
    candidates-only jaccard join (`_verified_pairs`), so the report
    itself stays sub-quadratic — no stage sees more than the banded
    pairs."""
    docs = _spread(load_documents(spark, sf_dir))
    sh = scoped_persist(ngram_shingles(docs, n, hash_fn=F.xxhash64))
    cand = scoped_persist(
        _band_candidates(
            _minhash_bands(_md5_feats(docs, n), num_hashes, bands),
            max_bucket=max_bucket,
        )
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_ver = _verified_pairs(sh, cand, threshold).agg(
        F.count(F.lit(1)).cast("long").alias("n_verified")
    )
    # precision is NULL when the cap (or an empty corpus) leaves zero
    # candidates — ANSI division would error, and 0/0 has no meaning here
    return n_cand.crossJoin(n_ver).select(
        "n_candidates",
        "n_verified",
        F.when(
            F.col("n_candidates") > 0,
            F.round(F.col("n_verified") / F.col("n_candidates"), 6),
        ).alias("precision"),
    )


def _lsh_precision_sql(
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = LSH_MAX_BUCKET,
) -> str:
    return f"""{_minhash_bb_cte(n, num_hashes, bands)},
keep AS (
  SELECT band, bucket FROM bb GROUP BY band, bucket
  HAVING count(*) <= {max_bucket}
),
bbk AS (
  SELECT bb.doc_id, bb.band, bb.bucket
  FROM bb JOIN keep ON bb.band = keep.band AND bb.bucket = keep.bucket
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bbk a JOIN bbk b ON a.band = b.band AND a.bucket = b.bucket
                        AND a.doc_id < b.doc_id
),
wsh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS shingles
  FROM documents
),
ver AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN wsh a ON c.id_a = a.doc_id
  JOIN wsh b ON c.id_b = b.doc_id
  WHERE round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / (len(a.shingles) + len(b.shingles)
                 - len(list_intersect(a.shingles, b.shingles))), 6)
        >= {threshold}
)
SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST((SELECT count(*) FROM ver) AS BIGINT) AS n_verified,
       CASE WHEN (SELECT count(*) FROM cand) > 0
            THEN round(CAST((SELECT count(*) FROM ver) AS DOUBLE)
                       / (SELECT count(*) FROM cand), 6)
       END AS precision
"""


LSH_PRECISION_SQL = _lsh_precision_sql()


def cross_split_contamination(
    spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Train/test split contamination report: training documents that
    near-duplicate a held-out document (n-gram Jaccard >= threshold) —
    the leakage check every eval pipeline runs before trusting scores.

    Split assignment is deterministic (doc_id % 10 == 0 -> test), so the
    check is reproducible and the oracle computes the identical split.
    The pair generation REUSES the MinHash-LSH candidate path
    (`ngram_jaccard_pairs`): sub-quadratic banding, exact verification on
    candidates only, then a cross-split filter — at 100 TB the cost is
    the near-dup pass, not an extra scan.  Output: one row per
    contaminated TRAIN doc with its worst-offending test doc.
    """
    pairs = ngram_jaccard_pairs(spark, sf_dir, n, threshold)
    is_test = lambda c: (c % 10) == 0  # noqa: E731
    a_test = is_test(F.col("id_a"))
    b_test = is_test(F.col("id_b"))
    cross = pairs.filter(a_test != b_test).select(
        F.when(a_test, F.col("id_b")).otherwise(F.col("id_a")).alias("train_doc"),
        F.when(a_test, F.col("id_a")).otherwise(F.col("id_b")).alias("test_doc"),
        "jaccard",
    )
    # worst offender per train doc: max similarity, ties to the lower
    # test id — one agg over the (tiny) verified-pair set
    return cross.groupBy("train_doc").agg(
        F.max("jaccard").alias("max_jaccard"),
        F.max_by("test_doc", F.struct(F.col("jaccard"), -F.col("test_doc"))).alias(
            "test_doc"
        ),
        F.count("*").cast("long").alias("n_test_matches"),
    ).select("train_doc", "test_doc", "max_jaccard", "n_test_matches")


CROSS_SPLIT_CONTAMINATION_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
             i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS shingles
  FROM documents
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
jac AS (
  SELECT p.id_a, p.id_b,
         round(CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared), 6) AS jaccard
  FROM pairs p
  JOIN sz sa ON p.id_a = sa.doc_id
  JOIN sz sb ON p.id_b = sb.doc_id
  WHERE round(CAST(p.shared AS DOUBLE) / (sa.n + sb.n - p.shared), 6) >= 0.5
),
cross_pairs AS (
  SELECT CASE WHEN id_a % 10 = 0 THEN id_b ELSE id_a END AS train_doc,
         CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS test_doc,
         jaccard
  FROM jac
  WHERE (id_a % 10 = 0) != (id_b % 10 = 0)
)
SELECT train_doc, test_doc, max_jaccard, n_test_matches FROM (
  SELECT train_doc, test_doc,
         max(jaccard) OVER (PARTITION BY train_doc) AS max_jaccard,
         CAST(count(*) OVER (PARTITION BY train_doc) AS BIGINT) AS n_test_matches,
         row_number() OVER (PARTITION BY train_doc
                            ORDER BY jaccard DESC, test_doc ASC) AS rn
  FROM cross_pairs
)
WHERE rn = 1
"""


def source_overlap(
    spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Cross-source near-duplicate matrix: for every (source_a, source_b)
    pair (unordered, a <= b), how many verified near-dup document pairs
    span them — the diagnostic a pipeline owner reads to see WHICH feeds
    copy from which before deciding what to crawl less of.

    Rides the capped-banding near-dup pass (`ngram_jaccard_pairs`), then
    two doc_id equi-joins pull each side's source and one
    partial-aggregated groupBy folds the matrix; sources-per-pair
    normalize with least/greatest so (a,b) and (b,a) collapse.  At 100 TB
    the cost is the near-dup pass — the matrix itself is
    source-cardinality-sized."""
    pairs = ngram_jaccard_pairs(spark, sf_dir, n, threshold)
    docs = load_documents(spark, sf_dir).select("doc_id", "source")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


SOURCE_OVERLAP_SQL = f"""
WITH pairs AS ({NGRAM_JACCARD_SQL}),
j AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM pairs p
  JOIN documents da ON p.id_a = da.doc_id
  JOIN documents db ON p.id_b = db.doc_id
)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM j GROUP BY source_a, source_b
"""


# Oracle for text.curation_funnel: composes the cluster/survivor CTEs with
# the n-gram contamination rollup and the word-shape gates — one row per
# pipeline stage.  Lives here (not text.py) because it embeds the dedup
# cluster SQL and dedup already imports text.  Generated so the
# contamination n-gram order / ratio threshold stay in lockstep with the
# engine's parameters (text.curation_funnel defaults).


def curation_funnel_sql(n: int = 3, threshold: float = 0.4) -> str:
    # i runs over 1-based n-gram start positions 1..len-n+1, matching the
    # engine's sequence(0, size-n) + slice(words, i+1, n)
    grams = (
        "list_distinct(list_transform(\n"
        f"      range(1, greatest(len(string_split(text, ' ')) - {n - 2}, 1)),\n"
        f"      i -> array_to_string(string_split(text, ' ')[i:i+{n - 1}], ' ')))"
    )
    return f"""
WITH cl AS ({DEDUP_CLUSTERS_SQL}),
kb AS ({DEDUP_KEEP_BEST_SQL}),
train AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_words,
         (len(text) - (len(string_split(text, ' ')) - 1))
             / len(string_split(text, ' ')) AS awl
  FROM documents WHERE source != 'src0'
),
bg AS (
  SELECT DISTINCT unnest({grams}) AS gram
  FROM documents WHERE source = 'src0'
),
contam AS (
  SELECT doc_id
  FROM (
    SELECT t.doc_id,
           avg(CASE WHEN bg.gram IS NOT NULL THEN 1.0 ELSE 0.0 END) AS ratio
    FROM (
      SELECT doc_id, unnest({grams}) AS gram
      FROM documents WHERE source != 'src0'
    ) t LEFT JOIN bg ON t.gram = bg.gram
    GROUP BY t.doc_id
  ) WHERE ratio > {threshold}
),
flags AS (
  SELECT tr.n_words AS tokens,
         (cl.doc_id IS NULL OR kb.survivor_id IS NOT NULL) AS p1,
         (c.doc_id IS NOT NULL) AS contam,
         (tr.n_words >= 16 AND tr.awl >= 4.0 AND tr.awl <= 5.0) AS q
  FROM train tr
  LEFT JOIN cl ON tr.doc_id = cl.doc_id
  LEFT JOIN kb ON tr.doc_id = kb.survivor_id
  LEFT JOIN contam c ON tr.doc_id = c.doc_id
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n0, CAST(sum(tokens) AS BIGINT) AS t0,
         CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN p1 THEN tokens ELSE 0 END) AS BIGINT) AS t1,
         CAST(sum(CASE WHEN p1 AND NOT contam THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN p1 AND NOT contam THEN tokens ELSE 0 END) AS BIGINT) AS t2,
         CAST(sum(CASE WHEN p1 AND NOT contam AND q THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(sum(CASE WHEN p1 AND NOT contam AND q THEN tokens ELSE 0 END) AS BIGINT) AS t3
  FROM flags
)
SELECT '1_input' AS stage, n0 AS n_docs, t0 AS n_tokens FROM agg
UNION ALL SELECT '2_near_dedup', n1, t1 FROM agg
UNION ALL SELECT '3_decontaminated', n2, t2 FROM agg
UNION ALL SELECT '4_quality', n3, t3 FROM agg
"""


CURATION_FUNNEL_SQL = curation_funnel_sql()
