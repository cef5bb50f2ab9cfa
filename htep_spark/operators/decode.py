"""Spark surfaces for the beam decoder (R9–R11) and block parser (T2–T6).

Both are Arrow-vectorized pandas UDFs over closure-captured broadcast
lexicons — per word/turn the work is embarrassingly parallel; the lexicon
signature buckets are the broadcast-hash-join build side (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.beam import LexiconBeamDecoder
from ..functions.parser import BlockTextParser

__all__ = [
    "make_beam_decode_udf",
    "make_parse_udf",
    "make_paragraph_decode_udf",
    "PARSE_RESULT_TYPE",
    "DECODE_RESULT_TYPE",
    "PARAGRAPH_RESULT_TYPE",
]

DECODE_RESULT_TYPE = StructType(
    [
        StructField("raw_word", StringType(), True),
        StructField("decoded_word", StringType(), True),
        StructField("lexicon_word", StringType(), True),
        StructField("distance", IntegerType(), True),
        StructField("raw_confidence", DoubleType(), True),
        StructField("replacement_applied", BooleanType(), True),
        StructField("replacement_reason", StringType(), True),
    ]
)

# input: per word, an array of per-position candidate lists
CANDIDATES_TYPE = ArrayType(
    ArrayType(
        StructType(
            [
                StructField("character", StringType(), True),
                StructField("confidence", DoubleType(), True),
            ]
        )
    )
)

PARSE_RESULT_TYPE = StructType(
    [
        StructField("corrected_text", StringType(), True),
        StructField(
            "corrections",
            ArrayType(
                StructType(
                    [
                        StructField("from", StringType(), True),
                        StructField("to", StringType(), True),
                        StructField("source", StringType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("dictionary_matches", ArrayType(StringType()), True),
        StructField("medical_matches", ArrayType(StringType()), True),
        StructField("english_matches", ArrayType(StringType()), True),
        StructField("backend", StringType(), True),
    ]
)


def make_beam_decode_udf(
    lexicon_terms: Sequence[str],
    primary_terms: Optional[Sequence[str]] = None,
    beam_width: int = 20,
):
    """candidates column → decode-result struct (decoder built once per
    Python worker via closure capture)."""
    lex = list(lexicon_terms)
    prim = list(primary_terms) if primary_terms else None

    @F.pandas_udf(DECODE_RESULT_TYPE)
    def decode(cands: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        decoder = LexiconBeamDecoder(lex, prim)
        for series in cands:
            rows = []
            for word_cands in series:
                if word_cands is None:
                    word_cands = []
                norm = [
                    [
                        {
                            "character": c["character"],
                            "confidence": c["confidence"],
                        }
                        for c in (pos or [])
                    ]
                    for pos in word_cands
                ]
                d = decoder.decode_word(norm, beam_width=beam_width)
                rows.append(
                    {
                        "raw_word": d["raw_word"],
                        "decoded_word": d["decoded_word"],
                        "lexicon_word": d["lexicon_word"],
                        "distance": d["distance"],
                        "raw_confidence": float(d["raw_confidence"]),
                        "replacement_applied": bool(d["replacement_applied"]),
                        "replacement_reason": d["replacement_reason"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_RESULT_TYPE])

    return decode


def make_parse_udf(
    dictionary_terms: Optional[Sequence[str]] = None,
    english_terms: Optional[Sequence[str]] = None,
):
    """text column → BlockTextParser result struct (T2–T6, regex backend)."""
    dterms = list(dictionary_terms) if dictionary_terms else None
    eterms = list(english_terms) if english_terms else None

    @F.pandas_udf(PARSE_RESULT_TYPE)
    def parse(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        parser = BlockTextParser(dterms, eterms)
        for series in texts:
            rows = []
            for text in series:
                r = parser.parse(text if isinstance(text, str) else "")
                rows.append(
                    {
                        "corrected_text": r["corrected_text"],
                        "corrections": r["corrections"],
                        "dictionary_matches": r["dictionary_matches"],
                        "medical_matches": r["dictionary_layers"]["medical"],
                        "english_matches": r["dictionary_layers"]["english"],
                        "backend": r["backend"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PARSE_RESULT_TYPE])

    return parse


PARAGRAPH_RESULT_TYPE = StructType(
    [
        StructField("text", StringType(), True),
        StructField("n_lines", IntegerType(), True),
    ]
)

def make_paragraph_decode_udf(
    lexicon_terms: Sequence[str],
    primary_terms: Optional[Sequence[str]] = None,
):
    """Paragraph candidate tensor (as a JSON string column — the 4-level
    nested array type defeats Spark's Arrow→pandas conversion, so the
    tensor travels serialized) → keep-best decoded text (the reference's
    three-strategy rich decoder, ``tests/test_paragraph_icr.py:265-311``)."""
    import json

    from ..functions.strategy import predict_paragraph_best

    lex = list(lexicon_terms)
    prim = list(primary_terms) if primary_terms else None

    @F.pandas_udf(PARAGRAPH_RESULT_TYPE)
    def decode(paragraphs: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        decoder = LexiconBeamDecoder(lex, prim)
        for series in paragraphs:
            rows = []
            for payload in series:
                lines = json.loads(payload) if payload else []
                text, n_lines = predict_paragraph_best(lines or [], decoder)
                rows.append({"text": text, "n_lines": n_lines})
            yield pd.DataFrame(rows, columns=[f.name for f in PARAGRAPH_RESULT_TYPE])

    return decode


def _word_candidates_col(word_col):
    """word string → per-position top-1 candidate list with a deterministic
    confidence in [0.35, 0.99] (shared by the beam and paragraph queries).

    The confidence hash is the md5 60-bit prefix (same cross-engine trick
    as the MinHash oracle mode) rather than xxhash64, so DuckDB can
    regenerate the exact candidate matrices — which makes the greedy
    decode slice of the beam kernel hash-checkable (`greedy_decode`)."""
    return F.transform(
        F.split(word_col, ""),
        lambda ch, i: F.array(
            F.struct(
                ch.alias("character"),
                (
                    0.35
                    + F.pmod(
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat_ws(
                                        "|", ch, word_col, i.cast("string")
                                    )
                                ),
                                1,
                                15,
                            ),
                            16,
                            10,
                        ).cast("long"),
                        F.lit(64),
                    ).cast("double")
                    / 100.0
                ).alias("confidence"),
            )
        ),
    )


def q_paragraph_decode(spark, sf_dir: str):
    """Rows-only driver query: per document, two synthetic candidate lines
    (three words each) through the three-strategy keep-best decoder."""
    from ..dictionaries import DISEASES_SINGLE, DRUGS_SINGLE

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.regexp_extract_all(F.upper(F.col("text")), F.lit("[A-Z]+"), 0)
    line = lambda start: F.transform(
        F.slice(toks, start, 3), lambda w: _word_candidates_col(w)
    )
    paragraph = F.to_json(F.array(line(1), line(4)))
    decode = make_paragraph_decode_udf(DRUGS_SINGLE + DISEASES_SINGLE, DRUGS_SINGLE)
    # materialize the JSON tensor behind an exchange before the UDF: in one
    # projection Catalyst re-inlines the to_json invoke-expression into the
    # Python-UDF argument, which intermittently fails codegen on repeated
    # plans (INTERNAL_ERROR "Cannot generate code for expression: decode(
    # invoke(StructsToJsonEvaluator...))", Spark 4.1) — the barrier keeps
    # the UDF input a plain attribute and spreads decode across cores
    staged = docs.select("doc_id", paragraph.alias("pjson")).repartition(
        spark.sparkContext.defaultParallelism
    )
    return staged.select("doc_id", decode(F.col("pjson")).alias("p")).select(
        "doc_id", F.col("p.text").alias("text"), F.col("p.n_lines").alias("n_lines")
    )


def q_beam_decode(spark, sf_dir: str):
    """Rows-only driver query: deterministic synthetic candidate matrices
    from document tokens (confidence = stable per-char hash), decoded
    against the drug lexicon with diseases as broad lexicon."""
    from ..dictionaries import DISEASES_SINGLE, DRUGS_SINGLE

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.slice(
        F.regexp_extract_all(F.upper(F.col("text")), F.lit("[A-Z]+"), 0), 1, 5
    )
    words = docs.select("doc_id", F.posexplode(toks).alias("word_idx", "word"))
    cands = _word_candidates_col(F.col("word"))
    decode = make_beam_decode_udf(DRUGS_SINGLE + DISEASES_SINGLE, DRUGS_SINGLE)
    return words.select(
        "doc_id", "word_idx", decode(cands).alias("decoded")
    ).select("doc_id", "word_idx", "decoded.*")


def q_parse(spark, sf_dir: str):
    """Rows-only driver query: block-parser correction over documents."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    parse = make_parse_udf()
    # driver-facing select: serialize array columns (the driver's pandas
    # canonicalizer can't hash list cells). Correction order is
    # deterministic parser output, so to_json/array_join are stable.
    return docs.select("doc_id", parse(F.col("text")).alias("parsed")).select(
        "doc_id",
        F.col("parsed.corrected_text").alias("corrected_text"),
        F.to_json("parsed.corrections").alias("corrections"),
        F.array_join("parsed.dictionary_matches", "|").alias("dictionary_matches"),
        F.array_join("parsed.medical_matches", "|").alias("medical_matches"),
        F.array_join("parsed.english_matches", "|").alias("english_matches"),
        F.col("parsed.backend").alias("backend"),
    )


def q_greedy_decode(spark, sf_dir: str):
    """HASH-CHECKED slice of the beam kernel: over top-1 candidate
    matrices the R9 decode is greedy — decoded_word is the argmax path and
    ``raw_confidence`` is exactly ``exp(mean(log(conf)))``. Those two
    outputs of the REAL beam decoder are reproduced in DuckDB from the
    shared md5 confidence hash (``SQL_GREEDY_DECODE``); the lexicon
    replacement columns (R10/R11, banded-Levenshtein residue) stay
    rows-only in `beam_decode`."""
    from ..dictionaries import DISEASES_SINGLE, DRUGS_SINGLE

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.slice(
        F.regexp_extract_all(F.upper(F.col("text")), F.lit("[A-Z]+"), 0), 1, 5
    )
    words = docs.select("doc_id", F.posexplode(toks).alias("word_idx", "word"))
    cands = _word_candidates_col(F.col("word"))
    decode = make_beam_decode_udf(DRUGS_SINGLE + DISEASES_SINGLE, DRUGS_SINGLE)
    return words.select(
        "doc_id",
        F.col("word_idx").cast("long").alias("word_idx"),
        decode(cands).alias("d"),
    ).select(
        "doc_id",
        "word_idx",
        F.col("d.decoded_word").alias("decoded_word"),
        F.round("d.raw_confidence", 6).alias("raw_confidence"),
    )


SQL_GREEDY_DECODE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(upper(text), '[A-Z]+')[1:5] AS ws
  FROM documents
), words AS (
  SELECT doc_id, i - 1 AS word_idx, ws[i] AS w
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS i FROM toks)
), confs AS (
  SELECT doc_id, word_idx, w,
         list_transform(
           range(1, length(w)+1),
           i -> 0.35 + (CAST(concat('0x',
                   substr(md5(substr(w, i, 1) || '|' || w || '|' ||
                              CAST(i - 1 AS VARCHAR)), 1, 15)) AS BIGINT)
                 % 64) / 100.0) AS cs
  FROM words
)
SELECT doc_id, CAST(word_idx AS BIGINT) AS word_idx, w AS decoded_word,
       round(exp(list_sum(list_transform(cs, c -> ln(c))) / len(cs)), 6)
         AS raw_confidence
FROM confs
"""
