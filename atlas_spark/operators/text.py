"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in `pyspark.sql.functions` (JVM side, whole
stage codegen) — no Python UDFs.  Designed for 100 TB layouts: every op is
a narrow projection + optional aggregation; no collects, no driver loops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..util.io import read_parquet

    return read_parquet(spark, f"{sf_dir}/documents.parquet")


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


# a tiny function-word list: enough for a stopword-ratio quality signal
# without a language model; shared verbatim with the SQL oracle
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")


def _md5_uniform(col) -> "F.Column":
    """Engine-portable deterministic uniform in [0,1) from a column: the
    first 8 md5 hex digits over 2^32.  Shared by every sampling operator
    (stratified_sample, domain_mix) and mirrored EXACTLY by
    `_MD5_UNIFORM_SQL` — change both together or the samplers diverge."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / float(1 << 32)


# DuckDB twin of `_md5_uniform` ({col} is the column expression)
_MD5_UNIFORM_SQL = "('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0"


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / word-shape / punctuation / stopword quality features per
    document — the standard heuristic battery a pretraining filter
    thresholds on.  All built-in functions, one narrow projection."""
    docs = load_documents(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9 ]"), 0))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        n_words.cast("long").alias("n_words"),
        F.round((F.length("text") - (n_words - 1)) / n_words, 6).alias("avg_word_len"),
        F.round(
            F.size(F.split(F.col("text"), " ")) / F.length("text"), 6
        ).alias("word_density"),
        F.round(n_punct / F.length("text"), 6).alias("punct_ratio"),
        F.round(n_stop / n_words, 6).alias("stopword_ratio"),
    )


_SW_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

QUALITY_SCORE_SQL = f"""
SELECT doc_id,
       CAST(len(text) AS BIGINT) AS n_chars_m,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       round((len(text) - (len(string_split(text, ' ')) - 1)) / len(string_split(text, ' ')), 6) AS avg_word_len,
       round(len(string_split(text, ' ')) / len(text), 6) AS word_density,
       round(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) / len(text), 6) AS punct_ratio,
       round(len(list_filter(string_split(text, ' '), w -> w IN ({_SW_SQL}))) / len(string_split(text, ' ')), 6) AS stopword_ratio
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


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining cleaning pass: exact-dup survivorship plus
    quality gates, emitting keep/reject-with-reason per document.

    The canonical composition a training-data pipeline runs before
    tokenization: (1) exact dedup keeps each content group's lowest
    doc_id (one shuffle keyed on the 256-bit content hash — uniform, no
    skew); (2) word-shape gates drop boilerplate/garbage.  Reasons use
    first-failure precedence so the output is deterministic.  Everything
    is whole-stage-codegen projections + one hash-partitioned window.
    """
    from pyspark.sql import Window

    docs = load_documents(spark, sf_dir)
    n_words = F.size(F.split(F.col("text"), " "))
    awl = (F.length("text") - (n_words - 1)) / n_words
    sha = F.sha2(F.col("text").cast("binary"), 256)
    survivor = F.min("doc_id").over(Window.partitionBy(sha))
    reason = (
        F.when(F.col("doc_id") != survivor, F.lit("duplicate"))
        .when(n_words < 16, F.lit("too_short"))
        .when((awl < 4.0) | (awl > 5.0), F.lit("word_shape"))
        .otherwise(F.lit("ok"))
    )
    return docs.select(
        "doc_id",
        "lang",
        reason.alias("reason"),
        (reason == "ok").cast("long").alias("keep"),
    )


CORPUS_CLEAN_SQL = """
WITH scored AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_words,
         (len(text) - (len(string_split(text, ' ')) - 1))
             / len(string_split(text, ' ')) AS awl,
         min(doc_id) OVER (PARTITION BY sha256(text)) AS survivor
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN doc_id != survivor THEN 'duplicate'
            WHEN n_words < 16 THEN 'too_short'
            WHEN awl < 4.0 OR awl > 5.0 THEN 'word_shape'
            ELSE 'ok' END AS reason,
       CAST(CASE WHEN doc_id = survivor AND n_words >= 16
                  AND awl >= 4.0 AND awl <= 5.0
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM scored
"""


# BPE-ish pre-tokenization pattern (ASCII classes so Spark's Java regex
# and DuckDB's RE2 agree byte-for-byte): letter runs, digit runs, and
# single non-alphanumeric marks — the GPT-2 pre-tokenizer shape without
# the unicode category classes
_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish token count per document (BPE pre-tokenizer regex) and
    fertility vs whitespace words.

    A training-data budgeting primitive: regex runs in the JVM
    (whole-stage codegen), one narrow projection, no shuffle."""
    docs = load_documents(spark, sf_dir)
    n_tok = F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0))
    n_words = F.size(F.split(F.col("text"), " "))
    return docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens_bpe"),
        F.round(n_tok / n_words, 6).alias("fertility"),
    )


TOKEN_COUNT_BPE_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS n_tokens_bpe,
       round(len(regexp_extract_all(text, '{_BPE_PATTERN}'))
             / len(string_split(text, ' ')), 6) AS fertility
FROM documents
"""


def token_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget by (lang, source) with corpus share — the input a
    pretraining sampler turns into mixture weights.

    The per-group rollup is a partial+final agg; the corpus total joins
    back as a broadcast scalar (never a global window: the grouped frame
    is small but a one-partition window is a habit that doesn't survive
    high-cardinality mixes)."""
    docs = load_documents(spark, sf_dir)
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    per = docs.groupBy("lang", "source").agg(F.sum(n_tok).alias("n_tokens"))
    total = per.agg(F.sum("n_tokens").alias("_total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("_total"), 6).alias("share"),
        )
    )


TOKEN_MIX_SQL = """
WITH per AS (
  SELECT lang, source, sum(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY lang, source
)
SELECT lang, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_tokens / (SELECT sum(n_tokens) FROM per), 6) AS share
FROM per
"""


def decontaminate(spark: SparkSession, sf_dir: str, n: int = 2) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a held-out "benchmark" set (here: the `src0` source
    slice stands in for an eval benchmark; real pipelines use 8-13-gram
    overlap, but the synthetic corpus shares no n-gram longer than 2, so
    the registered demo runs at n=2 to exercise the join non-trivially).

    The standard pretraining hygiene pass (e.g. GPT-3 appendix C /
    PaLM-style 8-gram overlap): the benchmark set's DISTINCT n-grams form
    a small broadcastable set (benchmarks are tiny relative to training
    corpora — always); training docs join their exploded shingles against
    it and roll up per TRAINING DOC.  Output is O(train docs): (doc_id,
    contaminated-gram count, total grams, contamination ratio) — the
    filter/removal input.  Never a train-x-bench pair fan-out: on dense
    overlap (like this 31-word synthetic vocabulary at n=2) pair output
    is near-quadratic while this rollup stays linear.
    """
    docs = load_documents(spark, sf_dir)
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")

    def shingles(df: DataFrame) -> DataFrame:
        # word array staged in its own projection — inlined into the
        # slice lambda, the split re-ran per gram (see
        # dedup.ngram_shingles, r17)
        staged = df.select("doc_id", F.split(F.col("text"), " ").alias("_w"))
        idx = F.when(
            F.size("_w") >= n, F.sequence(F.lit(0), F.size("_w") - n)
        ).otherwise(F.array().cast("array<int>"))
        grams = F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i + 1, n)))
        )
        return staged.select("doc_id", F.explode(grams).alias("gram"))

    bench_grams = F.broadcast(shingles(bench).select("gram").distinct())
    tr = shingles(train)
    hits = (
        tr.join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    totals = tr.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            "n_grams",
            F.round(
                F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_grams"), 6
            ).alias("contamination"),
        )
    )


DECONTAMINATE_SQL = """
WITH sh AS (
  SELECT doc_id, source, unnest(list_distinct(list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 0, 1)),
      i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')))) AS gram
  FROM documents
),
bg AS (SELECT DISTINCT gram FROM sh WHERE source = 'src0'),
tr AS (SELECT doc_id, gram FROM sh WHERE source != 'src0'),
hits AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
  FROM tr t JOIN bg ON t.gram = bg.gram GROUP BY 1
),
totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM tr GROUP BY 1)
SELECT totals.doc_id,
       CAST(COALESCE(hits.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       totals.n_grams,
       round(COALESCE(hits.n_contaminated, 0) / CAST(totals.n_grams AS DOUBLE), 6)
         AS contamination
FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by (lang, source): each stratum
    gets its own keep-rate, applied via a content-hash threshold — the
    reproducible sampling a data-mix pipeline uses to hit a target token
    budget per stratum.

    `md5(doc_id)`-derived uniform in [0,1) keeps the decision engine-
    portable (value-level oracle) and independent of partitioning or
    row order — rerunning on a 1000-executor cluster keeps the SAME
    documents.  Pure projection + filter: no shuffle at all.
    """
    rates = {
        ("en", "src5"): 0.5,
        ("en", "src14"): 1.0,
        ("de", "src0"): 0.8,
    }
    docs = load_documents(spark, sf_dir)
    u = _md5_uniform(F.col("doc_id"))
    rate = F.lit(0.25)
    for (lang, source), r in rates.items():
        rate = F.when(
            (F.col("lang") == lang) & (F.col("source") == source), F.lit(r)
        ).otherwise(rate)
    return docs.select(
        "doc_id", "lang", "source", F.round(rate, 6).alias("keep_rate")
    ).filter(u < rate)


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source,
       round(CAST(CASE WHEN lang = 'en' AND source = 'src5' THEN 0.5
                  WHEN lang = 'en' AND source = 'src14' THEN 1.0
                  WHEN lang = 'de' AND source = 'src0' THEN 0.8
                  ELSE 0.25 END AS DOUBLE), 6) AS keep_rate
FROM documents
WHERE {_MD5_UNIFORM_SQL.format(col='doc_id')}
      < CASE WHEN lang = 'en' AND source = 'src5' THEN 0.5
             WHEN lang = 'en' AND source = 'src14' THEN 1.0
             WHEN lang = 'de' AND source = 'src0' THEN 0.8
             ELSE 0.25 END
"""


def hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) from a content
    hash of the document id — the canonical reproducible split a training
    pipeline fixes once and reuses across every downstream job.

    `_md5_uniform(doc_id)` makes the assignment engine-portable
    (value-level oracle) and independent of partitioning, row order, and
    cluster size: the same document lands in the same split on a laptop
    and on 1000 executors.  Pure projection, zero shuffle — at 100 TB
    this is a narrow column stamped during one map pass, prunable by
    anything reading a single split downstream."""
    docs = load_documents(spark, sf_dir)
    u = _md5_uniform(F.col("doc_id"))
    split = (
        F.when(u < 0.8, F.lit("train"))
        .when(u < 0.9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "lang", split.alias("split"))


_HS_U = _MD5_UNIFORM_SQL.format(col="doc_id")

HASH_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN {_HS_U} < 0.8 THEN 'train'
            WHEN {_HS_U} < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# identical dither as the ASL registry (registry.py ROUND_EPS): mean of
# integer token counts can land exactly on a rounding half-point.
# Interpolated into QUALITY_DECILES_SQL — single source for both engines.
ROUND_EPS_TXT = 1.2345e-9


def quality_deciles(
    spark: SparkSession, sf_dir: str, _materialize: bool = True
) -> DataFrame:
    """Per-language token-length deciles: exact NTILE(10) semantics over
    a deterministic total order (token count, then doc_id) with
    per-decile document count, token bounds, and mean — the
    length-distribution profile a curriculum / data-mix design reads
    before choosing cutoffs.

    Scale design — two-pass distributed exact rank, NOT a per-language
    window.  ``ntile(10) OVER (PARTITION BY lang ...)`` puts every row
    of a language in ONE task, which at 100 TB makes the dominant
    language a multi-TB single-partition sort.  Instead:

      1. Global range-partitioned sort on (lang, n_tokens, doc_id) —
         a skewed language is spread across MANY contiguous slices,
         each bounded by the range-partition size.  The slice id is
         stamped with ``spark_partition_id()``; the slice is persisted
         (3 narrow columns) so both downstream passes read the SAME
         materialized pid assignment.
      2. Per-(slice, lang) row counts → prefix offsets + language
         totals via windows over the COUNTS frame (≤ partitions×langs
         rows — constant-size, never the data).  Broadcast back.
      3. rank = prefix offset + local row_number within (slice, lang);
         every window group is bounded by one range slice, so no task
         ever sorts more than one slice regardless of language skew.
      4. decile = the closed-form NTILE bucket formula on
         (rank, language total): first ``n % 10`` buckets get
         ``n div 10 + 1`` rows, the rest ``n div 10``.

    Values are identical to the NTILE oracle (the doc_id tiebreak makes
    the total order, hence the bucketing, exact).

    The persisted slice is LOAD-BEARING (both passes must read the same
    materialized pid assignment), so the result — bounded at
    languages x 10 rows by construction — is computed EAGERLY and the
    cache released before returning; a lazy return would have to keep
    the corpus-sized slice pinned for the caller's lifetime."""
    docs = load_documents(spark, sf_dir)
    from pyspark.sql.window import Window

    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    slices = (
        docs.select("lang", n_tokens.alias("n_tokens"), "doc_id")
        .orderBy("lang", "n_tokens", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )

    counts = slices.groupBy("pid", "lang").agg(F.count(F.lit(1)).alias("c"))
    w_off = (
        Window.partitionBy("lang")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid",
        "lang",
        F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off"),
        F.sum("c").over(Window.partitionBy("lang")).alias("n_lang"),
    )

    w_local = Window.partitionBy("pid", "lang").orderBy("n_tokens", "doc_id")
    ranked = slices.withColumn("rn", F.row_number().over(w_local).cast("long"))
    j = ranked.join(F.broadcast(offsets), ["pid", "lang"])

    rank = F.col("off") + F.col("rn")
    n = F.col("n_lang")
    bsize = F.floor(n / 10).cast("long")
    rem = n % 10
    thr = rem * (bsize + 1)
    decile = (
        F.when(rank <= thr, F.floor((rank - 1) / (bsize + 1)) + 1)
        .otherwise(rem + F.floor((rank - thr - 1) / F.greatest(bsize, F.lit(1))) + 1)
    ).cast("int")

    result = (
        j.select("lang", "n_tokens", decile.alias("decile"))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.round(F.avg("n_tokens") + ROUND_EPS_TXT, 6).alias("avg_tokens"),
        )
    )
    if not _materialize:
        # plan-inspection path only: nothing executes, so the persist
        # marker materializes no blocks
        return result
    try:
        rows = result.collect()  # languages x 10 rows — always driver-small
    finally:
        slices.unpersist()  # release even when the collect fails
    return spark.createDataFrame(rows, schema=result.schema)


QUALITY_DECILES_SQL = f"""
WITH t AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ntile(10) OVER (PARTITION BY lang ORDER BY len(string_split(text, ' ')), doc_id) AS decile
  FROM documents
)
SELECT lang, decile, count(*) AS n_docs,
       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
       round(avg(n_tokens) + {ROUND_EPS_TXT!r}, 6) AS avg_tokens
FROM t GROUP BY lang, decile
"""


def sessionize(spark: SparkSession, sf_dir: str, gap: int = 1800) -> DataFrame:
    """Sessionize the event stream per user: a new session starts when
    the gap since the user's previous event exceeds `gap` seconds.
    Output: per-session (user, session start, event count, value sum,
    duration) — the classic behavioral-log rollup.

    Window functions partitioned BY USER: the shuffle key is user_id
    (high-cardinality, uniform), each partition sorts only its own
    users' events — the shape that scales linearly with executors.  The
    cumulative-sum-of-gap-flags trick assigns session ids without any
    iterative processing.
    """
    from pyspark.sql import Window

    from ..session import configure_existing
    from ..sources.datapoints import _epoch_sec

    # Pin the session zone to UTC so the NTZ->timestamp cast inside
    # _epoch_sec is zone-independent (matches the oracle's epoch_ns).
    configure_existing(spark)
    from ..util.io import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    sec = _epoch_sec(ev)
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    with_gap = ev.select("user_id", "event_id", "value", sec.alias("sec")).withColumn(
        "new_sess",
        F.when(
            (F.col("sec") - F.lag("sec").over(w)) > gap, 1
        ).otherwise(F.when(F.lag("sec").over(w).isNull(), 1).otherwise(0)),
    )
    sess = with_gap.withColumn(
        "session_no", F.sum("new_sess").over(w).cast("long")
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.min("sec").cast("long").alias("session_start"),
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("value_sum"),
        (F.max("sec") - F.min("sec")).cast("long").alias("duration_s"),
    )


SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, event_id, value, epoch_ns(ts) // 1000000000 AS sec
  FROM events
),
g AS (
  SELECT *, CASE WHEN lag(sec) OVER w IS NULL THEN 1
                 WHEN sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
),
s AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM g
)
SELECT user_id, session_no,
       CAST(min(sec) AS BIGINT) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS value_sum,
       CAST(max(sec) - min(sec) AS BIGINT) AS duration_s
FROM s
GROUP BY 1, 2
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction metrics: per document, count emails,
    IPv4 addresses, and long digit runs (phone-ish), and emit the md5 of
    the REDACTED text — the pre-training privacy pass (detect, replace
    with typed placeholders, keep counts for filtering/reporting).

    The synthetic corpus contains no PII, so the fixture deterministically
    plants some (doc_id-keyed email / IP / phone suffixes on a third of
    the docs) before scrubbing; the scrub logic itself is generic.  Pure
    JVM regex projections — no shuffle, no Python — and the patterns avoid
    lookarounds so the Java and RE2 engines agree (value-level oracle on
    counts AND the redacted-text digest).
    """
    docs = load_documents(spark, sf_dir)
    planted = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 or 555-01"),
            (F.col("doc_id") % 90 + 10).cast("string"),
        ),
    ).otherwise(F.col("text"))
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ipv4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
    phone = r"[0-9]{3}-[0-9]{4}"
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(planted, email, "<EMAIL>"), ipv4, "<IP>"
        ),
        phone,
        "<PHONE>",
    )
    return docs.select(
        "doc_id",
        F.regexp_count(planted, F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(planted, F.lit(ipv4)).cast("long").alias("n_ips"),
        F.regexp_count(
            F.regexp_replace(planted, ipv4, "<IP>"), F.lit(phone)
        ).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


PII_SCRUB_SQL = r"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN
           text || ' contact user' || doc_id || '@example.com at 10.0.'
                || CAST(doc_id % 256 AS VARCHAR) || '.7 or 555-01'
                || CAST(doc_id % 90 + 10 AS VARCHAR)
         ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(
           regexp_replace(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
           '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(
           t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
           '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
FROM planted
"""


def repetition_ratio(spark: SparkSession, sf_dir: str, n: int = 3) -> DataFrame:
    """Within-document repetition: 1 - distinct n-grams / total n-grams —
    the standard quality signal against degenerate repeated text (looping
    generations, boilerplate).  Pure JVM array ops per row: no shuffle,
    no explode — the n-gram list never leaves the row.

    The synthetic corpus is random words (near-zero natural repetition),
    so the fixture deterministically doubles every fifth document before
    measuring; the measurement itself is generic.
    """
    docs = load_documents(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat_ws(" ", "text", "text")
        ).otherwise(F.col("text")),
    )
    # STAGE the word and gram arrays in their own projections: inlining
    # `split(text)` into the per-gram slice lambda re-ran the split once
    # per gram (O(words^2) per document — measured 2.27 s vs 0.46 s at
    # sf0.1, values identical), and `grams` is referenced twice (total /
    # distinct).  Multiply-referenced non-cheap expressions keep their
    # own projection through CollapseProject, so each array
    # materializes once per row.
    d1 = docs.select("doc_id", F.split(F.col("text"), " ").alias("_w"))
    idx = F.when(
        F.size("_w") >= n, F.sequence(F.lit(0), F.size("_w") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i + 1, n))
    )
    d2 = d1.select("doc_id", grams.alias("_g"))
    total = F.size("_g")
    distinct = F.size(F.array_distinct("_g"))
    ratio = F.when(
        total > 0, F.round(1.0 - distinct / total.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return d2.select(
        "doc_id",
        total.cast("long").alias("n_grams"),
        distinct.cast("long").alias("n_distinct"),
        ratio.alias("repetition"),
    )


REPETITION_RATIO_SQL = """
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' ' || text ELSE text END AS text
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           list_transform(range(1, len(string_split(text, ' ')) - 1),
             i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))
         ELSE [] END AS grams
  FROM p
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
       CASE WHEN len(grams) > 0
            THEN round(1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 6)
            ELSE 0.0 END AS repetition
FROM g
"""


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram language-model score per document: mean ln p(word)
    under the corpus's own unigram distribution — the cheap perplexity
    proxy used to rank documents for quality filtering (CCNet-style LM
    filtering without the LM).

    Two-phase Spark shape that survives 100 TB: (1) word frequencies via
    one partial/final hash agg (vocabulary-sized output ≪ corpus), with
    the corpus total folded in a second tiny agg; (2) the vocabulary
    BROADCASTS back onto the token stream and a per-doc agg computes the
    mean log-prob — the token stream shuffles once, on doc_id, with
    map-side combine.
    """
    docs = load_documents(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count("*").cast("double").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    vocab = F.broadcast(freq.crossJoin(F.broadcast(total)))
    scored = tok.join(vocab, "w").select(
        "doc_id", F.log(F.col("c") / F.col("n")).alias("lp")
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.round(F.avg("lp"), 6).alias("mean_logprob"),
    )


UNIGRAM_LOGPROB_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
freq AS (SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w),
tot AS (SELECT sum(c) AS n FROM freq)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       round(avg(ln(freq.c / tot.n)), 6) AS mean_logprob
FROM tok JOIN freq USING (w) CROSS JOIN tot
GROUP BY doc_id
"""


def ngram_topk(spark: SparkSession, sf_dir: str, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-level top-k word n-grams (here bigrams) with counts — the
    basic corpus-statistics primitive behind contamination checks, boiler-
    plate detection, and n-gram LM estimation.

    Plan: in-row n-gram construction (`transform` over an index sequence,
    no self-join), explode, partial+final hash aggregation, then
    TakeOrderedAndProject for the top-k — at 100 TB the only shuffle is
    the gram rollup and only k rows ever reach the driver.  Ties break on
    the gram string so the result is fully deterministic.
    """
    docs = load_documents(spark, sf_dir)
    # word array staged in its own projection — inlined into the
    # element_at lambda, the split re-ran per (gram, position) (see
    # dedup.ngram_shingles, r17)
    staged = docs.select(F.split(F.col("text"), " ").alias("_w"))
    grams = F.when(
        F.size("_w") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_w") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(F.col("_w"), i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram").asc())
        .limit(k)
    )


NGRAM_TOPK_SQL = """
WITH g AS (
  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
                i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1]))
         AS gram
  FROM documents
)
SELECT gram, CAST(count(*) AS BIGINT) AS cnt
FROM g
GROUP BY gram
ORDER BY cnt DESC, gram ASC
LIMIT 20
"""


# Target mixture weights per source for `domain_mix`; unlisted sources get
# weight 0 (dropped).  Shared verbatim with the SQL oracle.
_MIX_WEIGHTS = {
    "src0": 0.35,
    "src1": 0.25,
    "src2": 0.2,
    "src3": 0.15,
    "src4": 0.05,
}
_MIX_BUDGET = 20000  # target token budget for the mixed corpus


def domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: hit a target token budget with a target
    weight per source (the data-mixing step of a pretraining pipeline,
    cf. DoReMi / The Pile's domain weights).

    Per-source keep-rate = min(1, weight * budget / source_tokens), then a
    deterministic md5(doc_id) threshold decides each document — the same
    portable-uniform trick as `stratified_sample`, so the selection is
    reproducible, partitioning-independent, and value-level oracled.

    Plan: one narrow agg for per-source token totals (aggregate-sized),
    broadcast the rates back onto the scan, filter, and a final partial+
    final rollup — the full corpus is scanned once and never reshuffled.
    """
    docs = load_documents(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    totals = toks.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    weight = F.lit(None).cast("double")
    for src, w in _MIX_WEIGHTS.items():
        weight = F.when(F.col("source") == src, F.lit(w)).otherwise(weight)
    rates = totals.select(
        "source",
        weight.alias("target_weight"),
        F.least(
            F.lit(1.0), weight * F.lit(float(_MIX_BUDGET)) / F.col("src_tokens")
        ).alias("rate"),
    ).filter(F.col("target_weight").isNotNull())
    u = _md5_uniform(F.col("doc_id"))
    kept = toks.withColumn("u", u).join(F.broadcast(rates), "source").filter(
        F.col("u") < F.col("rate")
    )
    return kept.groupBy("source", "target_weight").agg(
        F.round(F.first("rate"), 6).alias("keep_rate"),
        F.count("*").cast("long").alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )


def _domain_mix_sql() -> str:
    w_case = " ".join(
        f"WHEN source = '{s}' THEN CAST({w} AS DOUBLE)"
        for s, w in _MIX_WEIGHTS.items()
    )
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CASE {w_case} ELSE NULL END AS target_weight
  FROM documents
),
rates AS (
  SELECT source, target_weight,
         least(CAST(1.0 AS DOUBLE),
               target_weight * CAST({_MIX_BUDGET} AS DOUBLE) / sum(n_tokens))
             AS rate
  FROM toks
  WHERE target_weight IS NOT NULL
  GROUP BY source, target_weight
)
SELECT t.source, r.target_weight,
       round(r.rate, 6) AS keep_rate,
       CAST(count(*) AS BIGINT) AS docs_kept,
       CAST(sum(t.n_tokens) AS BIGINT) AS tokens_kept
FROM toks t JOIN rates r ON t.source = r.source
WHERE {_MD5_UNIFORM_SQL.format(col='t.doc_id')}
      < r.rate
GROUP BY t.source, r.target_weight, r.rate
"""


DOMAIN_MIX_SQL = _domain_mix_sql()


def asof_join(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
) -> DataFrame:
    """As-of join over the event stream: each `left_type` event carries
    the value of the user's most recent `right_type` event at-or-before
    its timestamp (NULL if none yet) — the point-in-time attribution
    join (conversion attribution, feature lookups) that Spark has no
    native operator for.

    Implementation: tag both sides, union, and carry the right-side
    value forward with `last(..., ignorenulls)` over a per-user ordered
    window — ONE user-keyed exchange and one within-partition sort, no
    range join and no per-left-row probe.  At equal timestamps the
    right side sorts first (the at-or-before contract), with event_id as
    the final deterministic tiebreak.  Scales exactly like sessionize:
    the shuffle key is the high-cardinality user id.
    """
    from pyspark.sql import Window

    from ..session import configure_existing
    from ..sources.datapoints import _epoch_sec

    configure_existing(spark)
    from ..util.io import read_parquet

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    e = ev.select(
        "event_id", "user_id", "event_type", "value", _epoch_sec(ev).alias("sec")
    )
    a = e.filter(F.col("event_type") == left_type).select(
        "event_id",
        "user_id",
        "sec",
        "value",
        F.lit(0).alias("is_b"),
        F.lit(None).cast("double").alias("bval"),
    )
    b = e.filter(F.col("event_type") == right_type).select(
        "event_id",
        "user_id",
        "sec",
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("is_b"),
        F.col("value").alias("bval"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("sec").asc(), F.col("is_b").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        a.unionByName(b)
        .withColumn("asof_value", F.last("bval", ignorenulls=True).over(w))
        .filter(F.col("is_b") == 0)
        .select("event_id", "user_id", F.col("sec").alias("t"), "value", "asof_value")
    )


ASOF_JOIN_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, value,
         epoch_ns(ts) // 1000000000 AS sec
  FROM events
),
u AS (
  SELECT event_id, user_id, sec, value, 0 AS is_b, CAST(NULL AS DOUBLE) AS bval
  FROM e WHERE event_type = 'click'
  UNION ALL
  SELECT event_id, user_id, sec, CAST(NULL AS DOUBLE), 1, value
  FROM e WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id, user_id, sec, value, is_b,
         last_value(bval IGNORE NULLS) OVER (
             PARTITION BY user_id
             ORDER BY sec ASC, is_b DESC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
  FROM u
)
SELECT event_id, user_id, sec AS t, value, asof_value
FROM c WHERE is_b = 0
"""


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization — the first pass of every cleaning
    pipeline: lowercase, strip ASCII control characters, collapse
    whitespace runs, trim.  Emits the normalized digest + shape deltas
    (rather than megabytes of normalized text) so the transform is
    verifiable row-by-row.

    Pure per-row projection (regex + hash in whole-stage codegen): zero
    shuffle, scales with the scan.
    """
    docs = load_documents(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[\x00-\x1f]", " "),
            r"  +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("norm_digest"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


TEXT_NORMALIZE_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1f]', ' ', 'g'),
                               '  +', ' ', 'g'))) AS norm_digest,
       CAST(len(text) AS BIGINT) AS n_chars_raw,
       CAST(len(trim(regexp_replace(regexp_replace(lower(text), '[\x00-\x1f]', ' ', 'g'),
                                    '  +', ' ', 'g'))) AS BIGINT) AS n_chars_norm
FROM documents
"""


def seq_pack(spark: SparkSession, sf_dir: str, context_len: int = 512) -> DataFrame:
    """Sequence packing for pretraining: concatenate each source's
    documents in doc_id order and chunk into `context_len`-token
    windows — every doc gets its chunk id and token offset (the
    concat-then-chunk packing most training stacks use).

    The running total is a window partitioned BY SOURCE (ordered by
    doc_id): the shuffle key is the source, each partition packs
    independently, and no global ordering exists anywhere — the shape
    that scales horizontally, unlike a corpus-wide running sum.  A doc
    spanning a boundary starts `spans_boundary=1` (the trainer splits it
    across chunks).
    """
    from pyspark.sql import Window

    docs = load_documents(spark, sf_dir)
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(n_tok).over(w)
    start = cum - n_tok
    return docs.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        F.floor(start / context_len).cast("long").alias("chunk_id"),
        (start % context_len).cast("long").alias("chunk_offset"),
        (
            F.floor(start / context_len) != F.floor((cum - 1) / context_len)
        ).cast("long").alias("spans_boundary"),
    )


SEQ_PACK_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         sum(CAST(len(string_split(text, ' ')) AS BIGINT))
             OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
)
SELECT doc_id, source, n_tokens,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS chunk_id,
       CAST((cum - n_tokens) % 512 AS BIGINT) AS chunk_offset,
       CAST(CASE WHEN (cum - n_tokens) // 512 != (cum - 1) // 512
            THEN 1 ELSE 0 END AS BIGINT) AS spans_boundary
FROM t
"""


def tfidf_topk(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k characteristic terms per SOURCE by smoothed TF-IDF — the
    corpus-profiling primitive behind domain descriptors and boilerplate
    drift checks (what does each slice of a 100 TB crawl talk about?).

    tf(source, term) = occurrences in the source's documents; df(term) =
    number of sources containing the term; idf = ln((S+1)/(df+1)) + 1
    (sklearn's smoothed variant); score = tf * idf.

    Plan: tokens explode once; one (source, term) partial/final hash agg
    (vocabulary x sources output, tiny vs the corpus); df derives from
    that same aggregate via a term-keyed second agg re-joined broadcast;
    the per-source top-k is a row_number window over the aggregate
    frame, reusing its partitioning — the raw token stream shuffles
    exactly once.  Ties break (score desc, term asc) so output is
    deterministic.  At open-web vocabulary sizes (10^8+ terms) swap the
    df broadcast for a plain shuffle join on `w` — both sides are
    already vocabulary-sized aggregates, so it stays sub-corpus; the
    source-cardinality `count()` is one tiny job at plan-build time.
    """
    from pyspark.sql import Window

    docs = load_documents(spark, sf_dir)
    tok = docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
    tf = tok.groupBy("source", "w").agg(F.count("*").cast("double").alias("tf"))
    n_sources = tf.select("source").distinct().count()
    df_ = tf.groupBy("w").agg(F.count("*").cast("double").alias("df"))
    scored = tf.join(F.broadcast(df_), "w").select(
        "source",
        F.col("w").alias("term"),
        F.round(
            F.col("tf")
            * (F.log((F.lit(float(n_sources)) + 1.0) / (F.col("df") + 1.0)) + 1.0),
            6,
        ).alias("tfidf"),
    )
    win = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("source", "term", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


TFIDF_TOPK_SQL = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (SELECT source, w, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2),
ns AS (SELECT CAST(count(DISTINCT source) AS DOUBLE) AS s FROM tf),
df AS (SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w),
scored AS (
  SELECT source, w AS term,
         round(tf * (ln((ns.s + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN df USING (w) CROSS JOIN ns
)
SELECT source, term, tfidf, rank FROM (
  SELECT source, term, tfidf,
         CAST(row_number() OVER (PARTITION BY source ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
  FROM scored
)
WHERE rank <= 10
"""


# Fixed retrieval query for the BM25 demo operator: mixed document
# frequencies ('dup' is rare in the synthetic corpus -> high idf).
BM25_TERMS = ("spark", "vector", "dup", "merge")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Top-k documents for a fixed term query under BM25 (Robertson
    idf ln(1 + (N - df + 0.5)/(df + 0.5)), k1=1.2, b=0.75) — the lexical
    retrieval primitive of a training-data curation stack (dataset
    search, targeted subset extraction, eval-set sourcing).

    Plan shape for 100 TB: ONE narrow scan explodes tokens carrying the
    doc length alongside, the term filter (literal IN over the query
    terms) drops everything but query-term occurrences BEFORE the
    shuffle, the (doc, term) tf aggregate is query-bounded, corpus stats
    (N, avgdl) are a one-row aggregate cross-joined in, per-term df is a
    |terms|-row broadcast, and the final top-k is orderBy+limit
    (TakeOrdered — distributed partial top-k per partition, never a
    single-partition global sort).  Scores are dither-rounded to 6
    decimals on BOTH engines so libm-vs-JVM ln ulp noise cannot flip the
    ordering; ties break by doc_id."""
    docs = load_documents(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    tok = docs.select(
        "doc_id",
        F.size(words).cast("double").alias("dl"),
        F.explode(words).alias("w"),
    ).filter(F.col("w").isin(*BM25_TERMS))
    tf = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("double").alias("tf"), F.min("dl").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg(F.size(F.split(F.col("text"), " "))).alias("avgdl"),
    )
    df_ = tf.groupBy("w").agg(F.countDistinct("doc_id").cast("double").alias("df"))
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_), "w")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score) + ROUND_EPS_TXT, 6).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


def _bm25_sql(k: int = 20) -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH tok AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
         unnest(string_split(text, ' ')) AS w
  FROM documents
),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
  FROM tok WHERE w IN ({terms}) GROUP BY 1, 2
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS avgdl
  FROM documents
),
df AS (SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY w),
sc AS (
  SELECT t.doc_id,
         round(sum(ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * t.tf * ({BM25_K1} + 1.0)
                   / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * t.dl / s.avgdl)))
               + {ROUND_EPS_TXT!r}, 6) AS score
  FROM tf t JOIN df d USING (w) CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


BM25_TOPK_SQL = _bm25_sql()


def length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: document counts and character mass per
    power-of-two length bucket, per language — the one-glance histogram
    every corpus intake pipeline reports (truncation cliffs, empty-doc
    spikes, language length skews).

    Pure projection + one aggregate: the bucket index is
    floor(log2(n_chars)) computed arithmetically, so the whole plan is
    scan -> partial/final hash agg, no shuffle beyond the rollup and no
    second pass for the shares (a window over the aggregate-sized
    frame)."""
    from pyspark.sql import Window

    docs = load_documents(spark, sf_dir)
    bucket = F.when(
        F.col("n_chars") <= 0, F.lit(-1)
    ).otherwise(F.floor(F.log2(F.col("n_chars").cast("double")))).cast("int")
    agg = (
        docs.select("lang", bucket.alias("bucket"), "n_chars")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    share = F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy("lang"))
    return agg.select(
        "lang", "bucket", "n_docs", "total_chars", F.round(share, 6).alias("doc_share")
    )


LENGTH_HISTOGRAM_SQL = """
WITH agg AS (
  SELECT lang,
         CAST(CASE WHEN n_chars <= 0 THEN -1
                   ELSE floor(log2(CAST(n_chars AS DOUBLE))) END AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents
  GROUP BY 1, 2
)
SELECT lang, bucket, n_docs, total_chars,
       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang), 6) AS doc_share
FROM agg
"""


def curation_funnel(
    spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.4
) -> DataFrame:
    """End-to-end curation funnel — the capstone composition a
    pretraining pipeline runs, as ONE query: starting from the training
    slice (everything outside the `src0` benchmark stand-in), count docs
    and whitespace tokens surviving each stage:

      input          -> all train docs
      near_dedup     -> cluster survivors only (transitive near-dup
                        clusters via the capped MinHash banding; the
                        max-content doc per cluster survives, unclustered
                        docs pass through)
      decontaminated -> near-dedup survivors whose `n`-gram overlap RATIO
                        with the benchmark slice is at most `threshold`
                        (the synthetic corpus's tiny vocabulary makes
                        every doc share SOME gram, so like a real
                        pipeline the gate thresholds the ratio, not
                        any-hit; n/threshold are tunable together with
                        the oracle — 2-grams saturate at bench scale,
                        where the 31-word vocabulary covers virtually
                        the whole 2-gram space, so the default is
                        3-grams at 0.4, non-degenerate from sf0.01
                        through sf0.1)
      quality        -> those also passing the word-shape gates
                        (>= 16 words, 4.0 <= avg word len <= 5.0)

    One row per stage.  Shape: the near-dup labels and survivor picks are
    cluster-sized frames left-joined onto the train scan; contamination
    is the linear per-doc rollup (never a train x bench fan-out); the
    funnel itself is a single four-way conditional aggregate — adding a
    stage costs one column, not one pass."""
    from .dedup import dedup_clusters, dedup_keep_best

    docs = load_documents(spark, sf_dir)
    train = docs.filter(F.col("source") != "src0")

    # ONE label-propagation pass feeds both the membership flags and the
    # survivor selection (dedup_keep_best reuses the labels frame)
    cluster_labels = dedup_clusters(spark, sf_dir)
    labels = cluster_labels.select("doc_id", F.lit(True).alias("clustered"))
    survivors = dedup_keep_best(spark, sf_dir, labels=cluster_labels).select(
        F.col("survivor_id").alias("doc_id"), F.lit(True).alias("survivor")
    )

    # word array staged per frame — inlined into the slice lambda, the
    # split re-ran per gram (see dedup.ngram_shingles, r17)
    idx = F.when(
        F.size("_w") >= n, F.sequence(F.lit(0), F.size("_w") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i + 1, n)))
    )
    bench_grams = F.broadcast(
        docs.filter(F.col("source") == "src0")
        .select(F.split(F.col("text"), " ").alias("_w"))
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    tr_grams = train.select(
        "doc_id", F.split(F.col("text"), " ").alias("_w")
    ).select("doc_id", F.explode(grams).alias("gram"))
    hits = (
        tr_grams.join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    contaminated = (
        tr_grams.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .join(hits, "doc_id", "left")
        .filter(F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_grams") > threshold)
        .select("doc_id", F.lit(True).alias("contaminated"))
    )

    n_words = F.size(F.split(F.col("text"), " "))
    awl = (F.length("text") - (n_words - 1)) / n_words
    flagged = (
        train.join(labels, "doc_id", "left")
        .join(survivors, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select(
            n_words.cast("long").alias("tokens"),
            (
                ~F.coalesce(F.col("clustered"), F.lit(False))
                | F.coalesce(F.col("survivor"), F.lit(False))
            ).alias("p1"),
            F.coalesce(F.col("contaminated"), F.lit(False)).alias("contam"),
            ((n_words >= 16) & (awl >= 4.0) & (awl <= 5.0)).alias("q"),
        )
        .select(
            "tokens",
            "p1",
            (F.col("p1") & ~F.col("contam")).alias("p2"),
            (F.col("p1") & ~F.col("contam") & F.col("q")).alias("p3"),
        )
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum("tokens").cast("long").alias("t0"),
        F.sum(F.col("p1").cast("long")).cast("long").alias("n1"),
        F.sum(F.when(F.col("p1"), F.col("tokens")).otherwise(0)).cast("long").alias("t1"),
        F.sum(F.col("p2").cast("long")).cast("long").alias("n2"),
        F.sum(F.when(F.col("p2"), F.col("tokens")).otherwise(0)).cast("long").alias("t2"),
        F.sum(F.col("p3").cast("long")).cast("long").alias("n3"),
        F.sum(F.when(F.col("p3"), F.col("tokens")).otherwise(0)).cast("long").alias("t3"),
    )
    stages = F.array(
        F.struct(F.lit("1_input").alias("stage"), F.col("n0").alias("n_docs"), F.col("t0").alias("n_tokens")),
        F.struct(F.lit("2_near_dedup").alias("stage"), F.col("n1").alias("n_docs"), F.col("t1").alias("n_tokens")),
        F.struct(F.lit("3_decontaminated").alias("stage"), F.col("n2").alias("n_docs"), F.col("t2").alias("n_tokens")),
        F.struct(F.lit("4_quality").alias("stage"), F.col("n3").alias("n_docs"), F.col("t3").alias("n_tokens")),
    )
    return agg.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.n_docs", "s.n_tokens"
    )
