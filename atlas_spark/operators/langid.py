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

MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("de5", "shi4", "le5", "he2", "zai4"),  # pinyin-romanized markers
}

LANG_ORDER = tuple(MARKERS)  # deterministic tie-break: first wins


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    tokens = F.split(F.col("text"), " ")

    def score(markers: tuple[str, ...]):
        def is_marker(t):
            return t.isin(*markers)

        return F.size(F.filter(tokens, is_marker))

    scores = {lang: score(markers) for lang, markers in MARKERS.items()}
    pred = F.lit(LANG_ORDER[0])
    best = scores[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        pred = F.when(scores[lang] > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, scores[lang])
    out = docs.select(
        "doc_id",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in LANG_ORDER],
        pred.alias("pred_lang"),
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
