"""Text-analysis operators for training-data pipelines.

Language ID (stopword-vote heuristic + CJK script check), built entirely
from JVM-side column expressions with a DuckDB oracle generated from the
same constants. Token counting / quality scoring / fingerprinting live in
``driver_queries.py``; the per-turn clinical analyzers are the extraction
UDF chain.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

__all__ = [
    "LANG_STOPWORDS",
    "q_lang_id",
    "SQL_LANG_ID",
    "winnow_udf",
    "q_winnow_fingerprints",
    "q_winnow_overlap",
    "SQL_WINNOW",
    "SQL_WINNOW_OVERLAP",
]

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


# --------------------------------------------------------------------------
# Winnowing document fingerprints (rolling hash)
# --------------------------------------------------------------------------

WINNOW_K = 8   # char k-gram length
WINNOW_W = 6   # winnowing window
_WINNOW_BASE = 1000003          # rolling-hash base (shared with the oracle)
_WINNOW_MOD = 1 << 61           # hash modulus (mask to 61 bits in the UDF)

def _make_winnow_udf(k: int = WINNOW_K, w: int = WINNOW_W):
    """text → array<bigint> winnowed fingerprints.

    Classic winnowing (Schleimer/Wilkerson/Aiken): polynomial rolling hash
    over char k-grams, then the minimum hash of every w-length window
    (rightmost on ties), deduplicated. Vectorized with numpy sliding
    windows inside an Arrow batch — a rolling-hash fingerprint usable for
    plagiarism-style overlap detection at corpus scale (fingerprints →
    explode → inverted-index equi-join, same O(n·f) shape as MinHash).
    """
    import re

    base = np.uint64(_WINNOW_BASE)
    mod_mask = np.uint64(_WINNOW_MOD - 1)
    ws_re = re.compile(r"\s+")

    def fingerprints(text) -> list:
        if not isinstance(text, str):
            return []
        # drop non-ASCII before hashing: the oracle hashes codepoints
        # (ord), the UDF hashes bytes — stripping to ASCII on BOTH sides
        # makes them provably equal instead of assuming an ASCII corpus
        ascii_text = text.lower().encode("ascii", "ignore").decode("ascii")
        norm = ws_re.sub(" ", ascii_text).strip()
        if len(norm) < k:
            return []
        data = np.frombuffer(norm.encode("ascii"), dtype=np.uint8)
        n = len(data) - k + 1
        powers = np.array(
            [pow(int(base), k - 1 - i, int(mod_mask) + 1) for i in range(k)],
            dtype=np.uint64,
        )
        # hash of every k-gram via strided matmul (wraparound mod 2^64 is
        # deterministic; final mask to 61 bits keeps values positive int64)
        grams = np.lib.stride_tricks.sliding_window_view(data, k)[:n]
        hashes = (grams.astype(np.uint64) * powers).sum(axis=1) & mod_mask
        if n <= w:
            return [int(hashes.min())]
        windows = np.lib.stride_tricks.sliding_window_view(hashes, w)
        # rightmost minimum per window
        rev_argmin = w - 1 - np.argmin(windows[:, ::-1], axis=1)
        picks = windows[np.arange(len(windows)), rev_argmin]
        return sorted(set(int(x) for x in np.unique(picks)))

    @F.pandas_udf(ArrayType(LongType()))
    def winnow(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in texts:
            yield series.map(fingerprints)

    return winnow


winnow_udf = _make_winnow_udf()


def q_winnow_fingerprints(spark, sf_dir: str):
    """Rows-only driver query: winnowed fingerprints per document."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.explode(winnow_udf(F.col("text"))).alias("fingerprint"),
    )


def _winnow_ctes(k: int = WINNOW_K, w: int = WINNOW_W) -> str:
    """Shared CTE chain ending in ``fp(doc_id, fps)`` — the winnowed
    fingerprint sets, generated from the same k/w/base/modulus constants
    as the UDF.

    The UDF's k-gram hash is ``(Σ byte_i·p_i mod 2^64) & (2^61-1)`` with
    powers precomputed mod 2^61; since 2^61 divides 2^64, that equals
    ``Σ byte_i·p_i mod 2^61`` — computed here in HUGEINT (terms < 2^69,
    sum of k=8 terms < 2^72, well inside 128 bits). Both sides strip
    non-ASCII before hashing (UDF: ``encode('ascii','ignore')``; here:
    ``regexp_replace('[^\\x00-\\x7F]','')``) so ``ord(char) == byte`` is
    *enforced*, not assumed of the corpus. Rightmost-vs-leftmost window-min
    tie-break is value-identical (ties are equal values and the output is
    the deduplicated value set), so ``list_min`` per window suffices."""
    powers = [pow(_WINNOW_BASE, k - 1 - i, _WINNOW_MOD) for i in range(k)]
    terms = " + ".join(
        f"b[j+{i}]::HUGEINT * {p}::HUGEINT" for i, p in enumerate(powers)
    )
    return f"""n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^\\x00-\\x7F]', '', 'g'),
                             '\\s+', ' ', 'g')) AS s
  FROM documents
), b AS (
  SELECT doc_id,
         list_transform(range(1, length(s)+1), i -> ord(substr(s, i, 1))) AS b,
         length(s) - {k} + 1 AS n
  FROM n WHERE length(s) >= {k}
), h AS (
  SELECT doc_id, n,
         list_transform(range(1, n+1),
                        j -> CAST(({terms}) % {_WINNOW_MOD}::HUGEINT AS BIGINT)) AS hashes
  FROM b
), fp AS (
  SELECT doc_id,
         CASE WHEN n <= {w} THEN [list_min(hashes)]
              ELSE list_distinct(list_transform(range(1, n-{w}+2),
                                 t -> list_min(hashes[t : t+{w}-1]))) END AS fps
  FROM h
)"""


SQL_WINNOW = f"""
WITH {_winnow_ctes()}
SELECT doc_id, unnest(fps) AS fingerprint FROM fp
"""

WINNOW_MIN_COMMON = 5


def q_winnow_overlap(spark, sf_dir: str):
    """Driver query: fingerprint-overlap near-dup pairs (inverted-index
    equi-join over winnowed fingerprints)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnow_overlap_pairs(
        docs, "doc_id", "text", min_common=WINNOW_MIN_COMMON
    )


def _winnow_overlap_sql() -> str:
    """Oracle: the same inverted-index join over the shared winnow
    fingerprint CTE chain, pair counts + containment vs the smaller
    fingerprint set."""
    return f"""
WITH {_winnow_ctes()},
fpx AS (
  SELECT doc_id, unnest(fps) AS fp FROM fp
), sizes AS (
  SELECT doc_id, count(*) AS n FROM fpx GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
  FROM fpx a JOIN fpx b USING (fp)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {WINNOW_MIN_COMMON}
)
SELECT doc_a, doc_b, common,
       round(CAST(common AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
"""


SQL_WINNOW_OVERLAP = _winnow_overlap_sql()


def winnow_overlap_pairs(df: DataFrame, id_col: str, text_col: str,
                         min_common: int = 5) -> DataFrame:
    """Fingerprint-overlap near-dup pairs via inverted-index equi-join.

    Same candidate-generation shape as MinHash banding: explode winnowed
    fingerprints, equi-join on fingerprint (shuffle O(n·fingerprints), never
    O(n²)), count shared fingerprints per pair, keep pairs with
    >= ``min_common`` and report the containment ratio vs the smaller set.
    """
    fps = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(winnow_udf(F.col(text_col))).alias("fp"),
    )
    sizes = fps.groupBy("doc_id").agg(F.count("*").alias("n"))
    pairs = (
        fps.alias("a")
        .join(fps.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= min_common)
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn(
            "containment",
            F.round(F.col("common") / F.least(F.col("na"), F.col("nb")), 6),
        )
        .select("doc_a", "doc_b", "common", "containment")
    )
