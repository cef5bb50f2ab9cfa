"""Per-conversation grouped-map rollup (``applyInPandas``).

The cross-turn operator of SURVEY.md §1.3 ("``applyInPandas`` grouped by
conv_id where cross-turn order matters"): assemble one clinical record per
conversation from its turns in ``turn_idx`` order — first non-null patient
fields win (earliest mention), drug/disease mentions union across turns,
urgency escalates to the maximum level seen.

Scale note: a grouped map must see the whole conversation on one task, so
this stage shuffles by ``conv_id`` (eliminated when the table is bucketed
by conv_id, see ``sources/io.write_bucketed_transcripts``). Output is one
small row per conversation; memory per task is bounded by the largest
conversation's *extracted fields*, not its full text — the projection below
drops text columns before the shuffle.
"""

from __future__ import annotations

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

__all__ = ["conversation_rollup", "CONVERSATION_RECORD_TYPE"]

CONVERSATION_RECORD_TYPE = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", IntegerType(), True),
        StructField("patient_name", StringType(), True),
        StructField("doctor_name", StringType(), True),
        StructField("hospital", StringType(), True),
        StructField("all_drugs", ArrayType(StringType()), True),
        StructField("all_diseases", ArrayType(StringType()), True),
        StructField("max_urgency", StringType(), True),
        StructField("document_types", ArrayType(StringType()), True),
    ]
)

_URGENCY_RANK = {"routine": 0, "high": 1, "urgent": 2}


def _rollup(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("turn_idx")
    first = lambda col: next((v for v in pdf[col] if isinstance(v, str) and v), None)
    # array columns arrive as numpy arrays — no truthiness, check None
    drugs = sorted(
        {t for lst in pdf["matched_drugs"] if lst is not None for t in lst}
    )
    diseases = sorted(
        {t for lst in pdf["matched_diseases"] if lst is not None for t in lst}
    )
    max_urg = max(pdf["urgency"], key=lambda u: _URGENCY_RANK.get(u, -1), default=None)
    return pd.DataFrame(
        [
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "n_turns": len(pdf),
                "patient_name": first("patient_name"),
                "doctor_name": first("doctor_name"),
                "hospital": first("hospital"),
                "all_drugs": drugs,
                "all_diseases": diseases,
                "max_urgency": max_urg,
                "document_types": sorted(set(pdf["document_type"])),
            }
        ],
        columns=[f.name for f in CONVERSATION_RECORD_TYPE],
    )


def conversation_rollup(extracted: DataFrame) -> DataFrame:
    """extraction output → one record per conversation (ordered grouped map).

    Projects to the light columns *before* the conv_id shuffle — the text
    payloads never move."""
    light = extracted.select(
        "conv_id",
        "turn_idx",
        F.col("result.extracted.patient_name").alias("patient_name"),
        F.col("result.extracted.doctor_name").alias("doctor_name"),
        F.col("result.extracted.hospital").alias("hospital"),
        F.col("result.matched_drugs").alias("matched_drugs"),
        F.col("result.matched_diseases").alias("matched_diseases"),
        F.col("result.urgency").alias("urgency"),
        F.col("result.document_type").alias("document_type"),
    )
    return light.groupBy("conv_id").applyInPandas(
        _rollup, schema=CONVERSATION_RECORD_TYPE
    )
