"""Text-analysis operators for training-data pipelines.

Language ID (stopword-vote heuristic + CJK script check), built entirely
from JVM-side column expressions with a DuckDB oracle generated from the
same constants. Token counting / quality scoring / fingerprinting live in
``driver_queries.py``; the per-turn clinical analyzers are the extraction
UDF chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["LANG_STOPWORDS", "q_lang_id", "SQL_LANG_ID"]

# order = tie-break priority
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich", "mit", "für", "auf"],
    "es": ["el", "los", "las", "que", "y", "por", "con", "una", "del", "se"],
    "fr": ["le", "les", "et", "des", "pour", "dans", "est", "vous", "une", "au"],
}
_LANG_ORDER = list(LANG_STOPWORDS)
_CJK_PATTERN = f"[{chr(0x4E00)}-{chr(0x9FFF)}]"
_TOKEN_PATTERN = "[a-zà-ÿ]+"


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOKEN_PATTERN), 0)
    counts = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        counts[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    best = None
    for lang in _LANG_ORDER:
        best = counts[lang] if best is None else F.greatest(best, counts[lang])
    pick = None
    for lang in _LANG_ORDER:
        cond = counts[lang] == best
        pick = F.when(cond, F.lit(lang)) if pick is None else pick.when(cond, F.lit(lang))
    lang_col = (
        F.when(F.col("text").rlike(_CJK_PATTERN), F.lit("zh"))
        .when(best == 0, F.lit("unknown"))
        .otherwise(pick)
    )
    return docs.select("doc_id", lang_col.alias("predicted_lang"))


def _lang_sql() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    count_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x IN ({', '.join(q(w) for w in words)}))) AS c_{lang}"
        for lang, words in LANG_STOPWORDS.items()
    )
    best = "greatest(" + ", ".join(f"c_{l}" for l in _LANG_ORDER) + ")"
    pick = " ".join(f"WHEN c_{l} = best THEN '{l}'" for l in _LANG_ORDER)
    return f"""
WITH t AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), {q(_TOKEN_PATTERN)}) AS toks
  FROM documents
), c AS (
  SELECT doc_id, text,
         {count_cols}
  FROM t
), r AS (
  SELECT *, {best} AS best FROM c
)
SELECT doc_id,
       CASE WHEN regexp_matches(text, {q(_CJK_PATTERN)}) THEN 'zh'
            WHEN best = 0 THEN 'unknown'
            ELSE (CASE {pick} END) END AS predicted_lang
FROM r
"""


SQL_LANG_ID = _lang_sql()
