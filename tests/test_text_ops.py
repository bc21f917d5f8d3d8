"""Text-operator unit tests on constructed inputs.

The synthetic documents table is pure lowercase words, so the BPE-ish
tokenizer degenerates to whitespace counting there (the oracle still
value-checks it, but the digit/punctuation branches never fire).  These
tests feed punctuation-rich texts through BOTH engines so the regex
equivalence is exercised where it matters.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from atlas_spark.operators.text import _BPE_PATTERN

TEXTS = [
    "Hello, world! it's 42 degrees (7.5% up)",
    "a1b2c3 --- x__y 100,000.99",
    "no punctuation just words",
    "!!!",
    "mixedCASE Words AND 99bottles",
]


def test_bpe_pattern_cross_engine(spark):
    sdf = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = [
        r["n"]
        for r in sdf.select(
            F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)).alias("n")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, _BPE_PATTERN]
        ).fetchone()[0]
        for t in TEXTS
    ]
    assert got == want
    # the pattern actually splits beyond whitespace on these inputs
    ws = [len(t.split(" ")) for t in TEXTS]
    assert any(g != w for g, w in zip(got, ws))


def test_bpe_token_classes(spark):
    """Letter runs, digit runs, and single marks tokenize separately."""
    sdf = spark.createDataFrame([("ab12!? cd",)], ["text"])
    toks = sdf.select(
        F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0).alias("t")
    ).collect()[0]["t"]
    assert toks == ["ab", "12", "!", "?", "cd"]


def test_resize_media_binary_roundtrip(spark, sf_dir):
    """Binary OUT through Arrow: payload is exactly width*height bytes,
    truncate/pad is deterministic, digest matches the payload."""
    import hashlib

    from atlas_spark.operators.multimodal import resize_media

    rows = resize_media(spark, sf_dir, width=4, height=4).limit(20).collect()
    assert rows
    for r in rows:
        b = bytes(r["payload"])
        assert len(b) == 16 and r["n_bytes"] == 16
        assert hashlib.sha256(b).hexdigest() == r["digest"]


def test_codec_capability_gate(spark):
    """The codec is capability-gated: with PIL installed the default
    decoder is the real one and round-trips a real PNG through the
    resize/decode pipelines; without it, the deterministic fake is
    selected and the PIL path stays untouched.  Green either way."""
    from atlas_spark.operators.multimodal import (
        FakeDecoder,
        PilDecoder,
        decode_features,
        default_decoder,
        resize_payloads,
    )

    if not PilDecoder.available():
        assert default_decoder() is FakeDecoder
        # fake fallback still drives the generic entry points
        media = spark.createDataFrame(
            [(1, b"hello world payload")], "doc_id long, payload binary"
        )
        feats = decode_features(media).collect()
        assert feats[0]["n_bytes"] == 19
        resized = resize_payloads(media, 4, 4).collect()
        assert len(bytes(resized[0]["payload"])) == 16
        return

    assert default_decoder() is PilDecoder
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 20), (200, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
    feats = decode_features(media, decoder=PilDecoder).collect()
    assert (feats[0]["width"], feats[0]["height"]) == (32, 20)
    resized = resize_payloads(media, 8, 8, decoder=PilDecoder).collect()
    with Image.open(io.BytesIO(bytes(resized[0]["payload"]))) as im:
        assert im.size == (8, 8)


def test_publish_decoder_edge_shapes(spark):
    """Decoder robustness: absent metrics, absent common tags, nulls."""
    import json

    from atlas_spark.streaming.norm import decode_publish_payloads

    payloads = [
        json.dumps({"tags": {"a": "b"}}),  # no metrics -> no rows
        json.dumps({"metrics": []}),  # empty metrics -> no rows
        "not json at all",  # unparseable -> no rows (from_json null)
        json.dumps({"metrics": [{"timestamp": 5, "value": 1.0}]}),  # no tags
    ]
    df = spark.createDataFrame([(p,) for p in payloads], ["payload"])
    rows = decode_publish_payloads(df).collect()
    assert len(rows) == 1
    assert rows[0]["tags"] == {} and rows[0]["timestamp"] == 5


def test_band_candidates_pairs_and_degenerate_bucket(spark):
    """The streamed generator chain emits exactly the in-bucket pairs
    (cross-band duplicates collapsed), including for a large degenerate
    bucket where the per-row state must stay O(bucket): 2000 ids in one
    bucket -> C(2000,2) pairs with no single O(b^2) value."""
    from atlas_spark.operators import dedup

    rows = (
        [(d, 0, 111) for d in range(5)]
        + [(7, 1, 222), (8, 1, 222)]
        + [(7, 2, 333), (8, 2, 333)]  # same pair via a second band
    )
    bands = spark.createDataFrame(rows, "doc_id long, band int, bucket long")
    want = {(a, b) for a in range(5) for b in range(a + 1, 5)} | {(7, 8)}
    got = {tuple(r) for r in dedup._band_candidates(bands).collect()}
    assert got == want
    big = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("band"), F.lit(9).alias("bucket")
    )
    # cap disabled: the generator chain must stream C(2000,2) pairs with
    # per-row state O(bucket) (the memory-shape property this pins)
    n = dedup._band_candidates(big, max_bucket=None).count()
    assert n == 2000 * 1999 // 2
    # default cap (LSH_MAX_BUCKET=1000): the degenerate bucket is dropped
    assert dedup._band_candidates(big).count() == 0


def test_dedup_keep_best_cross_op_invariants(spark, sf_dir):
    """keep_best is the per-cluster refinement of dedup_reduction's
    corpus-level accounting: its rows must tie out exactly — one row per
    cluster, member counts summing to docs_in_clusters, removals summing
    to n_removed — and every survivor must (a) belong to the cluster it
    survives and (b) carry that cluster's maximum n_chars (ties broken
    toward the smaller doc_id, so survivorship is deterministic)."""
    from atlas_spark.operators import dedup

    kb = dedup.dedup_keep_best(spark, sf_dir).collect()
    red = dedup.dedup_reduction(spark, sf_dir).collect()[0]
    assert len(kb) == red["n_clusters"]
    assert sum(r["cluster_size"] for r in kb) == red["docs_in_clusters"]
    assert sum(r["n_removed"] for r in kb) == red["n_removed"]

    labels = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup.dedup_clusters(spark, sf_dir).collect()
    }
    chars = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in kb:
        assert labels[r["survivor_id"]] == r["canonical_id"]
        members = [d for d, c in labels.items() if c == r["canonical_id"]]
        assert len(members) == r["cluster_size"]
        best = max(members, key=lambda d: (chars[d], -d))
        assert r["survivor_id"] == best
        assert r["survivor_chars"] == chars[best]


def test_lsh_precision_bounds(spark, sf_dir):
    """The banding-precision report: verified pairs are a subset of the
    banded candidates (verification only filters), so n_verified <=
    n_candidates and precision is their rounded ratio; the verified set
    must also be a subset of the exact-jaccard pair set from the
    registered near-dup query (banding can only LOSE pairs vs exact)."""
    from atlas_spark.operators import dedup

    row = dedup.lsh_precision(spark, sf_dir).collect()[0]
    assert 0 < row["n_verified"] <= row["n_candidates"]
    assert row["precision"] == round(row["n_verified"] / row["n_candidates"], 6)
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(spark, sf_dir).collect()
    }
    assert row["n_verified"] <= len(exact) or not exact


def test_lsh_precision_cap_engine_oracle_parity(spark, tmp_path):
    """The degenerate-bucket cap must be applied identically by the Spark
    op and its DuckDB oracle (a capped engine against an uncapped oracle
    would diverge on exactly the boilerplate corpus the cap exists for):
    40 identical docs with cap=10 drop every bucket — zero candidates and
    a NULL precision on BOTH engines — while the uncapped run emits all
    C(40,2) pairs."""
    import duckdb
    import pandas as pd

    from atlas_spark.operators import dedup

    hot = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": ["xx yy zz ww vv"] * 40,
            "lang": ["en"] * 40,
            "source": ["s"] * 40,
            "n_chars": [14] * 40,
        }
    )
    hot.to_parquet(f"{tmp_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    got = [tuple(r) for r in dedup.lsh_precision(spark, str(tmp_path), max_bucket=10).collect()]
    want = con.execute(dedup._lsh_precision_sql(max_bucket=10)).fetchall()
    assert got == want == [(0, 0, None)]
    got = [tuple(r) for r in dedup.lsh_precision(spark, str(tmp_path), max_bucket=None).collect()]
    want = con.execute(dedup._lsh_precision_sql(max_bucket=1 << 40)).fetchall()
    assert got == want == [(780, 780, 1.0)]


def test_curation_funnel_non_degenerate_at_bench_scale():
    """Every funnel stage stays non-zero and strictly decreasing at the
    BENCH scale (sf0.1), not just the driver's sf0.01: 2-gram
    contamination saturated there (the 31-word synthetic vocabulary
    covers virtually the whole 2-gram space, zeroing stages 3/4 —
    PERF.md r12), so the default moved to 3-grams at ratio 0.4, tuned in
    lockstep on the engine and the oracle (curation_funnel_sql).
    Oracle-side check (DuckDB) so bench scale stays cheap; engine==oracle
    value equality is covered by the sf0.01 parity sweep."""
    import duckdb

    from atlas_spark.operators.dedup import CURATION_FUNNEL_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.1/documents.parquet'"
    )
    rows = sorted(con.execute(CURATION_FUNNEL_SQL).fetchall())
    assert [r[0] for r in rows] == [
        "1_input", "2_near_dedup", "3_decontaminated", "4_quality"
    ]
    docs = [r[1] for r in rows]
    toks = [r[2] for r in rows]
    assert all(a > b > 0 for a, b in zip(docs, docs[1:])), docs
    assert all(a > b > 0 for a, b in zip(toks, toks[1:])), toks
