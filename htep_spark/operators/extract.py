"""Arrow-vectorized extraction operators (the UDF surface).

Design (SURVEY.md §2.7 "UDF/UDAF/UDTF surface"): every per-turn operator is
a pandas UDF — the Arrow batch is the unit of vectorization, generalizing
the reference's own batching fix (``BlockICREngine._batch_predict_chars``,
``src/recognition/icr_block_engine.py:162-195``, which exists precisely
because per-item dispatch was too slow). No row-at-a-time Python UDF
anywhere (BASELINE.json ``input_hint``: "no per-row Python").

The full chain runs as ONE pandas UDF returning the whole result struct:
one Arrow round-trip per batch instead of one per stage, and the fuzzy-
lookup memo tables (module-level, per Python worker) amortize across every
batch the worker ever sees. Per-turn extraction is embarrassingly parallel
— the plan stays narrow (scan → project), no shuffle in the hot path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..reference import extract_turn
from ..schema import EXTRACTION_RESULT_TYPE

__all__ = [
    "extract_turn_udf",
    "extract_transcripts",
    "corrected_text_udf",
    "deid_udf",
    "DEID_RESULT_TYPE",
]


@F.pandas_udf(EXTRACTION_RESULT_TYPE)
def extract_turn_udf(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """text → full extraction-result struct, one Arrow batch at a time.

    Iterator form so per-worker init (dictionary lookups, regex compiles —
    the lazy-singleton pattern of ``app/api.py:56-104``) happens once per
    Python worker process, not per batch.
    """
    for series in texts:
        yield pd.DataFrame(
            [extract_turn(t if isinstance(t, str) else None) for t in series]
        )


@F.pandas_udf(StringType())
def corrected_text_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Narrow variant: text → corrected main-content text only (cheaper
    output schema when downstream needs just the text column)."""
    for series in texts:
        yield pd.Series(
            [
                extract_turn(t if isinstance(t, str) else None)["corrected_text"]
                for t in series
            ]
        )


def extract_transcripts(df: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → extraction
    output. Narrow projection — zero shuffle; Catalyst prunes unused input
    columns down to the parquet scan."""
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        extract_turn_udf(F.col("text")).alias("result"),
    )


DEID_RESULT_TYPE = StructType(
    [
        StructField("masked_text", StringType(), True),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("start_char", IntegerType(), True),
                        StructField("end_char", IntegerType(), True),
                        StructField("kind", StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


@F.pandas_udf(DEID_RESULT_TYPE)
def deid_udf(texts: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """text → (masked_text, PII spans) — north_star de-identification stage."""
    from ..functions.deid import deidentify

    for series in texts:
        yield pd.DataFrame(
            [deidentify(t if isinstance(t, str) else "") for t in series]
        )
