"""Language identification — stopword-marker heuristic.

Classic lightweight lang-ID: score each candidate language by counting
marker-stopword hits in the token stream, predict the argmax with a fixed
tie-break order.  All JVM-side (`filter` over the token array); the DuckDB
oracle replicates the identical scoring, so the driver check is exact.

(The driver's synthetic corpus is English-jargon word soup for every lang
label, so scores — not label recovery — are the contract here; on real
text the same operator recovers the language.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .text import load_documents
from ..util.io import memo_factory as _memo_factory

MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("de5", "shi4", "le5", "he2", "zai4"),  # pinyin-romanized markers
}

LANG_ORDER = tuple(MARKERS)  # deterministic tie-break: first wins


@_memo_factory
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # expressions as SQL strings: each higher-order `F.filter(col, fn)`
    # construction costs ~20 ms of py4j round-trips, x5 languages x every
    # build (r16 profile) — one F.expr per output column emits the
    # identical plan (same size/filter/IN/CASE tree)
    docs = load_documents(spark, sf_dir)

    def score(markers: tuple[str, ...]) -> str:
        ms = ", ".join(f"'{m}'" for m in markers)
        return f"size(filter(split(text, ' '), t -> t IN ({ms})))"

    scores = {lang: score(markers) for lang, markers in MARKERS.items()}
    pred = f"'{LANG_ORDER[0]}'"
    best = scores[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        pred = f"CASE WHEN {scores[lang]} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest({best}, {scores[lang]})"
    out = docs.select(
        "doc_id",
        *[
            F.expr(f"CAST({scores[lang]} AS BIGINT) AS score_{lang}")
            for lang in LANG_ORDER
        ],
        F.expr(f"{pred} AS pred_lang"),
    )
    return out


def _score_sql(markers: tuple[str, ...]) -> str:
    ms = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({ms})))"


def lang_id_sql() -> str:
    scores = {lang: _score_sql(m) for lang, m in MARKERS.items()}
    cols = ", ".join(
        f"CAST({scores[lang]} AS BIGINT) AS score_{lang}" for lang in LANG_ORDER
    )
    # argmax with first-wins tie-break, identical to the Spark fold
    pred = f"'{LANG_ORDER[0]}'"
    best = scores[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        pred = f"CASE WHEN {scores[lang]} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest({best}, {scores[lang]})"
    return f"SELECT doc_id, {cols}, {pred} AS pred_lang FROM documents"


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-quality rollup for the lang-ID heuristic: per
    (labeled lang, predicted lang) document counts plus each cell's
    share of its labeled row — the confusion matrix a pipeline tracks
    when tuning marker lists.

    One scan (scoring is per-row codegen), one partial+final rollup, and
    a label-keyed window over the aggregate-sized matrix for row shares.
    """
    from pyspark.sql import Window

    preds = lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    docs = load_documents(spark, sf_dir).select("doc_id", "lang")
    cells = docs.join(preds, "doc_id").groupBy("lang", "pred_lang").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    row_tot = F.sum("n_docs").over(Window.partitionBy("lang"))
    return cells.select(
        "lang",
        "pred_lang",
        "n_docs",
        F.round(F.col("n_docs") / row_tot, 6).alias("row_share"),
    )


def lang_confusion_sql() -> str:
    return f"""
WITH p AS ({lang_id_sql()}),
cells AS (
  SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents d JOIN p ON d.doc_id = p.doc_id
  GROUP BY d.lang, p.pred_lang
)
SELECT lang, pred_lang, n_docs,
       round(n_docs / sum(n_docs) OVER (PARTITION BY lang), 6) AS row_share
FROM cells
"""
